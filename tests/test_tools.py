"""Tool tests: htk2nc and nc-standardize round trips."""

import struct

import numpy as np
import pytest

from lstm_rnn_tpu.data.netcdf3 import NetCDF3File
from lstm_rnn_tpu.tools import htk2nc, nc_standardize


def write_htk_file(path, data, period=100000, kind=9):
    data = np.asarray(data, np.float32)
    with open(path, "wb") as f:
        f.write(struct.pack(">IIHH", data.shape[0], period, data.shape[1] * 4, kind))
        f.write(data.astype(">f4").tobytes())


def test_htk2nc_classification(tmp_path, rng):
    feats = [rng.randn(6, 3).astype(np.float32), rng.randn(4, 3).astype(np.float32)]
    labels = [["sil", "ah", "ah", "b", "sil", "sil"], ["b", "ah", "sil", "b"]]
    lines = []
    for i, (ft, lab) in enumerate(zip(feats, labels)):
        write_htk_file(tmp_path / f"s{i}.htk", ft)
        (tmp_path / f"s{i}.txt").write_text("\n".join(lab) + "\n")
        lines.append(f"seq{i} 1 {tmp_path}/s{i}.htk {tmp_path}/s{i}.txt")
    (tmp_path / "map.txt").write_text("\n".join(lines) + "\n")
    out = str(tmp_path / "out.nc")
    assert htk2nc.main(["--mapping_list", str(tmp_path / "map.txt"), "--nc", out]) == 0

    f = NetCDF3File(out)
    assert f.dimensions["numSeqs"] == 2
    assert f.dimensions["numTimesteps"] == 10
    assert f.dimensions["inputPattSize"] == 3
    assert f.dimensions["numLabels"] == 3  # ah, b, sil
    assert f.read_strings("labels") == ["ah", "b", "sil"]  # sorted (std::map)
    np.testing.assert_array_equal(f.read("seqLengths"), [6, 4])
    np.testing.assert_allclose(f.read("inputs"), np.concatenate(feats), rtol=1e-6)
    # labels mapped: sil->2 ah->0 b->1
    np.testing.assert_array_equal(f.read("targetClasses"),
                                  [2, 0, 0, 1, 2, 2, 1, 0, 2, 1])
    assert f.read_strings("seqTags") == ["seq0", "seq1"]


def test_htk2nc_numeric_labels_and_maxlen(tmp_path, rng):
    ft = rng.randn(25, 2).astype(np.float32)
    write_htk_file(tmp_path / "a.htk", ft)
    (tmp_path / "a.labels").write_text("\n".join(str(i % 5) for i in range(25)) + "\n")
    (tmp_path / "map.txt").write_text(f"tagA 1 {tmp_path}/a.htk {tmp_path}/a.labels\n")
    out = str(tmp_path / "o.nc")
    assert htk2nc.main(["--mapping_list", str(tmp_path / "map.txt"), "--nc", out,
                        "--no_label_map", "5", "--max_len", "10"]) == 0
    f = NetCDF3File(out)
    # 25/10 - 0.05 = 2.45 -> 3 pieces: 10, 10, 5
    np.testing.assert_array_equal(f.read("seqLengths"), [10, 10, 5])
    assert f.read_strings("seqTags") == ["tagA--1", "tagA--2", "tagA--3"]
    assert f.dimensions["numLabels"] == 5
    np.testing.assert_array_equal(f.read("targetClasses"),
                                  [i % 5 for i in range(25)])


def test_htk2nc_regression_concat(tmp_path, rng):
    """2 input files concatenated along features + 1 regression target."""
    in1 = rng.randn(5, 2).astype(np.float32)
    in2 = rng.randn(5, 3).astype(np.float32)
    tgt = rng.randn(5, 4).astype(np.float32)
    for name, d in (("i1", in1), ("i2", in2), ("t", tgt)):
        write_htk_file(tmp_path / f"{name}.htk", d)
    (tmp_path / "map.txt").write_text(
        f"s 2 {tmp_path}/i1.htk {tmp_path}/i2.htk {tmp_path}/t.htk\n")
    out = str(tmp_path / "o.nc")
    assert htk2nc.main(["--mapping_list", str(tmp_path / "map.txt"), "--nc", out]) == 0
    f = NetCDF3File(out)
    assert f.dimensions["inputPattSize"] == 5
    assert f.dimensions["targetPattSize"] == 4
    np.testing.assert_allclose(f.read("inputs"), np.concatenate([in1, in2], axis=1))
    np.testing.assert_allclose(f.read("targetPatterns"), tgt)


def _make_regression_nc(tmp_path, rng, n=20, insz=3, outsz=2):
    from lstm_rnn_tpu.data.netcdf3 import strings_to_chars, write_netcdf
    dims = {"numSeqs": 2, "numTimesteps": n, "inputPattSize": insz,
            "targetPattSize": outsz, "maxSeqTagLength": 8}
    inputs = (rng.randn(n, insz) * 3 + 5).astype(np.float32)
    targets = (rng.randn(n, outsz) * 0.5 - 1).astype(np.float32)
    path = str(tmp_path / "r.nc")
    write_netcdf(path, dims, [
        ("seqTags", ["numSeqs", "maxSeqTagLength"], strings_to_chars(["a", "b"], 8)),
        ("seqLengths", ["numSeqs"], np.asarray([n // 2, n - n // 2], np.int32)),
        ("inputs", ["numTimesteps", "inputPattSize"], inputs),
        ("targetPatterns", ["numTimesteps", "targetPattSize"], targets),
    ])
    return path, inputs, targets


def test_nc_standardize(tmp_path, rng):
    path, inputs, targets = _make_regression_nc(tmp_path, rng)
    assert nc_standardize.main([path, "-"]) == 0
    f = NetCDF3File(path)
    x = f.read("inputs")
    y = f.read("targetPatterns")
    np.testing.assert_allclose(x.mean(0), 0, atol=1e-5)
    np.testing.assert_allclose(x.std(0, ddof=1), 1, atol=1e-5)
    np.testing.assert_allclose(y.mean(0), 0, atol=1e-5)
    means = f.read("inputMeans")
    np.testing.assert_allclose(means, inputs.mean(0), atol=1e-4)


def test_nc_standardize_input_only(tmp_path, rng):
    path, inputs, targets = _make_regression_nc(tmp_path, rng)
    assert nc_standardize.main([path, "-", "--input-only"]) == 0
    f = NetCDF3File(path)
    np.testing.assert_allclose(f.read("inputs").mean(0), 0, atol=1e-5)
    np.testing.assert_array_equal(f.read("targetPatterns"), targets)  # untouched
    assert "outputMeans" not in f.variables


def test_nc_standardize_from_normdata(tmp_path, rng):
    path, inputs, targets = _make_regression_nc(tmp_path, rng)
    norm = str(tmp_path / "norm.nc")
    import shutil
    shutil.copy(path, norm)
    assert nc_standardize.main([norm, "-"]) == 0  # norm now has means/stdevs
    assert nc_standardize.main([path, norm]) == 0
    f = NetCDF3File(path)
    np.testing.assert_allclose(f.read("inputs").mean(0), 0, atol=1e-5)
