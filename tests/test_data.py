"""Data pipeline tests: NetCDF3 IO, fraction assembly, truncation, splicing."""

import os

import numpy as np
import pytest

from lstm_rnn_tpu.data.dataset import DataSet
from lstm_rnn_tpu.data.netcdf3 import NetCDF3File, strings_to_chars, write_netcdf
from lstm_rnn_tpu.ops.masking import PATTYPE_FIRST, PATTYPE_LAST, PATTYPE_NONE, PATTYPE_NORMAL

from .conftest import requires_reference

NC = "/root/reference/examples/speech_recognition_chime/val_1_speaker.nc"


@requires_reference
def test_read_reference_nc_matches_scipy():
    f = NetCDF3File(NC)
    assert f.dimensions["numSeqs"] == 102
    assert f.dimensions["inputPattSize"] == 39
    lens = f.read("seqLengths")
    assert lens.sum() == f.dimensions["numTimesteps"] == 13878
    from scipy.io import netcdf_file
    sp = netcdf_file(NC, "r", mmap=False)
    np.testing.assert_array_equal(lens, sp.variables["seqLengths"][:])
    np.testing.assert_array_equal(f.read("inputs"), sp.variables["inputs"][:])
    np.testing.assert_array_equal(f.read("targetClasses"),
                                  sp.variables["targetClasses"][:])
    # sliced read
    np.testing.assert_array_equal(f.read("inputs", 100, 50),
                                  sp.variables["inputs"][100:150])
    tags = f.read_strings("seqTags")
    assert len(tags) == 102 and all(tags)
    f.close()


def _write_classification_nc(path, lengths, in_size=4, num_labels=5, seed=0):
    rng = np.random.RandomState(seed)
    total = sum(lengths)
    dims = {
        "numSeqs": len(lengths), "numTimesteps": total,
        "inputPattSize": in_size, "numLabels": num_labels,
        "maxSeqTagLength": 16,
    }
    inputs = rng.randn(total, in_size).astype(np.float32)
    classes = rng.randint(0, num_labels, total).astype(np.int32)
    tags = strings_to_chars([f"seq{i}" for i in range(len(lengths))], 16)
    write_netcdf(path, dims, [
        ("seqTags", ["numSeqs", "maxSeqTagLength"], tags),
        ("seqLengths", ["numSeqs"], np.asarray(lengths, np.int32)),
        ("inputs", ["numTimesteps", "inputPattSize"], inputs),
        ("targetClasses", ["numTimesteps"], classes),
    ])
    return inputs, classes


def test_netcdf_write_read_roundtrip(tmp_path):
    path = str(tmp_path / "t.nc")
    inputs, classes = _write_classification_nc(path, [5, 3, 7])
    f = NetCDF3File(path)
    assert f.dimensions["numSeqs"] == 3
    np.testing.assert_array_equal(f.read("inputs"), inputs)
    np.testing.assert_array_equal(f.read("targetClasses"), classes)
    assert f.read_strings("seqTags") == ["seq0", "seq1", "seq2"]
    # scipy can read our files too
    from scipy.io import netcdf_file
    sp = netcdf_file(path, "r", mmap=False)
    np.testing.assert_array_equal(sp.variables["inputs"][:], inputs)


def test_fraction_assembly(tmp_path):
    path = str(tmp_path / "t.nc")
    inputs, classes = _write_classification_nc(path, [5, 3])
    ds = DataSet([path], parallel_sequences=2, prefetch=False)
    assert ds.is_classification and ds.output_pattern_size == 5
    fracs = list(ds.fractions())
    assert len(fracs) == 1
    fr = fracs[0]
    assert fr.inputs.shape == (5, 2, 4)
    # padding zeros + patTypes
    assert fr.pattypes[0, 0] == PATTYPE_FIRST
    assert fr.pattypes[4, 0] == PATTYPE_LAST
    assert fr.pattypes[2, 0] == PATTYPE_NORMAL
    assert fr.pattypes[3, 1] == PATTYPE_NONE and fr.pattypes[4, 1] == PATTYPE_NONE
    np.testing.assert_array_equal(fr.inputs[:5, 0], inputs[:5])
    np.testing.assert_array_equal(fr.inputs[:3, 1], inputs[5:8])
    assert (fr.inputs[3:, 1] == 0).all()
    np.testing.assert_array_equal(fr.targets[:5, 0], classes[:5])
    assert (fr.targets[3:, 1] == -1).all()


def test_truncation(tmp_path):
    path = str(tmp_path / "t.nc")
    _write_classification_nc(path, [100, 30])
    # 100 > 1.5*40 -> chunks 40, 60 (remainder 60 <= 1.5*40 stays whole)
    ds = DataSet([path], parallel_sequences=1, trunc_seq_length=40, prefetch=False)
    lens = [s.length for s in ds.sequences]
    assert lens == [40, 60, 30]
    assert [s.original_idx for s in ds.sequences] == [0, 1, 0]
    assert ds.total_timesteps == 130  # pre-truncation sum (DataSet.cpp:524)


def test_splicing_and_output_lag(tmp_path):
    path = str(tmp_path / "t.nc")
    inputs, classes = _write_classification_nc(path, [4])
    ds = DataSet([path], parallel_sequences=1, input_left_context=1,
                 input_right_context=2, output_time_lag=1, prefetch=False)
    fr = next(iter(ds.fractions()))
    assert fr.inputs.shape == (4, 1, 4 * 4)  # ctx_len = 1+1+2 = 4
    # t=0: left context duplicates frame 0; right context frames 1, 2
    expect = np.concatenate([inputs[0], inputs[0], inputs[1], inputs[2]])
    np.testing.assert_array_equal(fr.inputs[0, 0], expect)
    # t=3: right context duplicates the last frame
    expect = np.concatenate([inputs[2], inputs[3], inputs[3], inputs[3]])
    np.testing.assert_array_equal(fr.inputs[3, 0], expect)
    # output lag shifts targets; first `lag` frames get default class 0
    assert fr.targets[0, 0] == 0
    np.testing.assert_array_equal(fr.targets[1:4, 0], classes[:3])


def test_fraction_subsetting_and_sorting(tmp_path):
    path = str(tmp_path / "t.nc")
    _write_classification_nc(path, [9, 2, 7, 4])
    ds = DataSet([path], parallel_sequences=2, fraction=0.5, prefetch=False)
    assert ds.total_sequences == 2  # int(4*0.5)
    ds2 = DataSet([path], parallel_sequences=2, sort_by_length=True, prefetch=False)
    assert [s.length for s in ds2.sequences] == [2, 4, 7, 9]


def test_mixing_classification_and_regression_fails(tmp_path):
    p1 = str(tmp_path / "c.nc")
    _write_classification_nc(p1, [3])
    p2 = str(tmp_path / "r.nc")
    dims = {"numSeqs": 1, "numTimesteps": 3, "inputPattSize": 4,
            "targetPattSize": 2, "maxSeqTagLength": 8}
    write_netcdf(p2, dims, [
        ("seqTags", ["numSeqs", "maxSeqTagLength"], strings_to_chars(["a"], 8)),
        ("seqLengths", ["numSeqs"], np.asarray([3], np.int32)),
        ("inputs", ["numTimesteps", "inputPattSize"], np.zeros((3, 4), np.float32)),
        ("targetPatterns", ["numTimesteps", "targetPattSize"], np.ones((3, 2), np.float32)),
    ])
    with pytest.raises(ValueError):
        DataSet([p1, p2], prefetch=False)
    # regression file alone loads fine, means/stdevs default
    ds = DataSet([p2], prefetch=False)
    assert not ds.is_classification and ds.output_pattern_size == 2
    np.testing.assert_array_equal(ds.output_means, [0, 0])
    np.testing.assert_array_equal(ds.output_stdevs, [1, 1])


def test_binary_collapse(tmp_path):
    path = str(tmp_path / "b.nc")
    _write_classification_nc(path, [4], num_labels=2)
    ds = DataSet([path], prefetch=False)
    assert ds.output_pattern_size == 1  # numLabels==2 collapses (DataSet.cpp:493)


def test_disk_cache_equals_ram(tmp_path):
    path = str(tmp_path / "t.nc")
    _write_classification_nc(path, [5, 3, 7, 2])
    ds_ram = DataSet([path], parallel_sequences=2, prefetch=False)
    ds_disk = DataSet([path], parallel_sequences=2, prefetch=False,
                      cache_path=str(tmp_path))
    assert ds_disk._cache is not None and ds_ram._cache is None
    for fa, fb in zip(ds_ram.fractions(), ds_disk.fractions()):
        np.testing.assert_array_equal(fa.inputs, fb.inputs)
        np.testing.assert_array_equal(fa.targets, fb.targets)
        np.testing.assert_array_equal(fa.pattypes, fb.pattypes)
    # second epoch re-reads from the cache file
    for fb in ds_disk.fractions():
        assert fb.inputs.dtype == np.float32


def test_prefetch_equals_sync(tmp_path):
    path = str(tmp_path / "t.nc")
    _write_classification_nc(path, [5, 3, 7, 2])
    ds_a = DataSet([path], parallel_sequences=2, prefetch=False)
    ds_b = DataSet([path], parallel_sequences=2, prefetch=True)
    for fa, fb in zip(ds_a.fractions(), ds_b.fractions()):
        np.testing.assert_array_equal(fa.inputs, fb.inputs)
        np.testing.assert_array_equal(fa.targets, fb.targets)
        np.testing.assert_array_equal(fa.pattypes, fb.pattypes)


def test_netcdf_record_dimension(tmp_path):
    """Record (UNLIMITED) dimension files — legal CDF-1, producible by
    third-party HTK pipelines — must read correctly: record variables are
    interleaved per record slab, unlike fixed variables."""
    from scipy.io import netcdf_file

    p = str(tmp_path / "rec.nc")
    f = netcdf_file(p, "w")
    f.createDimension("time", None)
    f.createDimension("feat", 3)
    v1 = f.createVariable("inputs", "f4", ("time", "feat"))
    v2 = f.createVariable("labels", "i4", ("time",))
    data = np.arange(15, dtype=np.float32).reshape(5, 3)
    labels = np.asarray([3, 1, 4, 1, 5], np.int32)
    v1[:] = data
    v2[:] = labels
    f.close()

    g = NetCDF3File(p)
    assert g.dimensions["time"] == 5
    assert g.variables["inputs"].is_record
    np.testing.assert_array_equal(g.read("inputs"), data)
    np.testing.assert_array_equal(g.read("labels"), labels)
    np.testing.assert_array_equal(g.read("inputs", 1, 3), data[1:4])
    g.close()

    # single record variable: packed without per-record padding
    p2 = str(tmp_path / "rec1.nc")
    f = netcdf_file(p2, "w")
    f.createDimension("time", None)
    v = f.createVariable("x", "i2", ("time",))
    v[:] = np.arange(7, dtype=np.int16)
    f.close()
    with NetCDF3File(p2) as g2:
        np.testing.assert_array_equal(g2.read("x"), np.arange(7))
        assert g2.dimensions["time"] == 7


def test_mixed_ram_disk_cache_corpus(tmp_path, monkeypatch):
    """A later large file may create the disk cache AFTER a small file's
    sequences were loaded as raw arrays — both ref kinds must resolve
    (regression: _seq_arrays unconditionally dereferenced raw ndarrays as
    cache tuples and crashed the first epoch)."""
    p1 = str(tmp_path / "small.nc")
    p2 = str(tmp_path / "big.nc")
    _write_classification_nc(p1, [3, 4], seed=1)
    _write_classification_nc(p2, [50, 60], seed=2)
    # threshold between the two files' est_bytes = 4*T*(in+1): 140 vs 2200
    monkeypatch.setattr(DataSet, "CACHE_THRESHOLD_BYTES", 1000)
    ds = DataSet([p1, p2], parallel_sequences=2, prefetch=False)
    assert ds._cache is not None
    kinds = {type(s.inputs) for s in ds.sequences}
    assert np.ndarray in kinds and tuple in kinds  # genuinely mixed
    fracs = list(ds.fractions())
    assert sum(len(f.seq_info) for f in fracs) == 4
    # values round-trip: compare against an uncached load of the same corpus
    monkeypatch.setattr(DataSet, "CACHE_THRESHOLD_BYTES", 1 << 30)
    ds2 = DataSet([p1, p2], parallel_sequences=2, prefetch=False)
    for fa, fb in zip(fracs, ds2.fractions()):
        np.testing.assert_array_equal(fa.inputs, fb.inputs)
        np.testing.assert_array_equal(fa.targets, fb.targets)


def test_output_time_lag_exceeds_sequence_length(tmp_path):
    """lag >= L + 2 must fill the whole sequence with the default class
    instead of crashing the NumPy assembly path (native path already
    handled it)."""
    path = str(tmp_path / "t.nc")
    _, classes = _write_classification_nc(path, [4, 8])
    ds = DataSet([path], parallel_sequences=2, output_time_lag=6,
                 prefetch=False, use_native=False)
    fr = next(iter(ds.fractions()))
    # seq of length 4: every frame defaults to class 0
    np.testing.assert_array_equal(fr.targets[:4, 0], np.zeros(4, np.int32))
    # seq of length 8: frames [6, 8) get classes[:2] of its own sequence
    np.testing.assert_array_equal(fr.targets[:6, 1], np.zeros(6, np.int32))
    np.testing.assert_array_equal(fr.targets[6:8, 1], classes[4:6])
    # native path agrees
    ds_n = DataSet([path], parallel_sequences=2, output_time_lag=6,
                   prefetch=False, use_native=True)
    if ds_n._native is not None:
        fr_n = next(iter(ds_n.fractions()))
        np.testing.assert_array_equal(fr.targets, fr_n.targets)
        np.testing.assert_array_equal(fr.inputs, fr_n.inputs)


def test_padded_time_inventory(tmp_path):
    """The Trainer's eager VMEM probes compile at REAL fraction Ts
    (verdicts are keyed by chunk-grid size — ops/vmem_probe.py k3), so
    the inventory must enumerate exactly the padded lengths fractions can
    dispatch at: bucketized when buckets exist, the chunk-rounded
    sequence lengths otherwise."""
    from lstm_rnn_tpu.data.dataset import DataSet

    nc = str(tmp_path / "inv.nc")
    _write_classification_nc(nc, [5, 17, 30, 33, 100])

    # no buckets: every distinct length, rounded to the 16-frame granule
    ds = DataSet([nc], parallel_sequences=2, prefetch=False)
    assert ds.padded_time_inventory() == [16, 32, 48, 112]

    # single bucket: one shape at the corpus max
    ds1 = DataSet([nc], parallel_sequences=2, prefetch=False,
                  bucket_lengths="single")
    assert ds1.padded_time_inventory() == [112]

    # power-of-two inventory: lengths land on their buckets (16, 24, 32,
    # 48, 64, 96, 128 ... -> rounded to the granule)
    dsb = DataSet([nc], parallel_sequences=2, prefetch=False,
                  bucket_lengths=True)
    got = dsb.padded_time_inventory()
    assert got == sorted({-(-dsb._padded_length(l) // 16) * 16
                          for l in (5, 17, 30, 33, 100)})
    # every fraction's actual padded T is in the inventory, whatever the
    # epoch's shuffle groups together
    for ds_ in (ds, ds1, dsb):
        inv = set(ds_.padded_time_inventory())
        for fr in ds_.fractions():
            assert -(-fr.inputs.shape[0] // 16) * 16 in inv
