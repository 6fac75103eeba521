"""Ecosystem script tests: JSON surgery, checkpoint averaging, recipes."""

import json
import os
import struct
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(script, *args, cwd=None):
    return subprocess.run(
        [sys.executable, os.path.join(REPO, script), *args],
        capture_output=True, text=True, cwd=cwd)


def _toy_net(with_weights=True):
    doc = {
        "layers": [
            {"name": "input", "type": "input", "size": 2},
            {"name": "h1", "type": "feedforward_tanh", "size": 3, "bias": 1.0},
            {"name": "output", "type": "softmax", "size": 4, "bias": 1.0},
            {"name": "postoutput", "type": "multiclass_classification", "size": 4},
        ],
    }
    if with_weights:
        doc["weights"] = {
            "h1": {"input": [0.1] * 6, "bias": [0.2] * 3, "internal": []},
            "output": {"input": [0.3] * 12, "bias": [0.4] * 4, "internal": []},
        }
    return doc


def test_average_weights(tmp_path):
    a = _toy_net()
    b = _toy_net()
    b["weights"]["h1"]["input"] = [0.3] * 6
    pa, pb = tmp_path / "a.jsn", tmp_path / "b.jsn"
    pa.write_text(json.dumps(a))
    pb.write_text(json.dumps(b))
    out = tmp_path / "avg.jsn"
    r = _run("scripts/average_weights.py", str(pa), str(pb), str(out))
    assert r.returncode == 0, r.stderr
    avg = json.loads(out.read_text())
    np.testing.assert_allclose(avg["weights"]["h1"]["input"], [0.2] * 6)
    np.testing.assert_allclose(avg["weights"]["output"]["bias"], [0.4] * 4)


def test_add_layer(tmp_path):
    p = tmp_path / "in.jsn"
    p.write_text(json.dumps(_toy_net()))
    out = tmp_path / "out.jsn"
    r = _run("scripts/add_layer.py", str(p), str(out), "h2", "blstm", "6")
    assert r.returncode == 0, r.stderr
    doc = json.loads(out.read_text())
    names = [l["name"] for l in doc["layers"]]
    assert names == ["input", "h1", "h2", "output", "postoutput"]
    assert doc["layers"][2] == {"name": "h2", "type": "blstm", "size": 6, "bias": 1.0}
    assert "output" not in doc["weights"]  # output weights dropped to re-init
    assert "h1" in doc["weights"]


def test_act_maj_vote(tmp_path):
    # 2 classes, 3 frames: seq1 votes class 1
    line = "seq1" + ";0.4;0.6" * 3 + "\n"
    p = tmp_path / "acts.csv"
    p.write_text(line)
    r = _run("scripts/act_maj_vote.py", str(p), "2")
    assert r.returncode == 0, r.stderr
    assert r.stdout.strip() == "seq1 1"


def test_mkmap_and_mlf2label(tmp_path):
    scp = tmp_path / "feat.scp"
    scp.write_text("dr1/utt1.mfcc\n")
    r = _run("examples/phoneme_recognition_timit/mkmap.py", str(scp), "/feats")
    assert r.stdout.strip() == "dr1/utt1 1 /feats/dr1/utt1.mfcc dr1/utt1.txt"

    mlf = tmp_path / "a.mlf"
    mlf.write_text('#!MLF!#\n"dr1/utt1.lab"\n0 300000 s1\n300000 500000 s2\n.\n')
    r = _run("examples/phoneme_recognition_timit/mlf2label.py", "a.mlf",
             cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr
    labels = (tmp_path / "dr1/utt1.txt").read_text().split()
    assert labels == ["s1", "s1", "s1", "s2", "s2"]


def test_test_post_conv(tmp_path):
    # posterior HTK file with 3 classes, 2 frames
    data = np.array([[0.0, 1.0, 2.0], [3.0, 4.0, 5.0]], np.float32)
    os.makedirs(tmp_path / "d", exist_ok=True)
    with open(tmp_path / "d/u.htk", "wb") as f:
        f.write(struct.pack(">IIHH", 2, 100000, 12, 9))
        f.write(data.astype(">f4").tobytes())
    (tmp_path / "test.scp").write_text("d/u.htk\n")
    # map v:k -> out[k] = in[v]: out = [in2, in0, in1]
    (tmp_path / "state.map").write_text("2:0\n0:1\n1:2\n")
    r = _run("examples/phoneme_recognition_timit/test_post_conv.py",
             "test.scp", "state.map", "conv", cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr
    from lstm_rnn_tpu.writers import read_htk
    out, period, kind = read_htk(str(tmp_path / "conv/d/u.htk"))
    np.testing.assert_array_equal(out, data[:, [2, 0, 1]])


def test_discriminative_pretraining(tmp_path):
    """Greedy layer-wise pretraining end to end on a toy classification nc:
    stage files exist and load, and stage 2 starts from stage 1's hidden
    weights (scripts/discriminative_pretraining.pl semantics)."""
    from .test_data import _write_classification_nc

    nc = str(tmp_path / "train.nc")
    _write_classification_nc(nc, [6, 5, 4, 7], in_size=3, num_labels=4, seed=9)
    net = {
        "layers": [
            {"name": "input", "type": "input", "size": 3},
            {"name": "h1", "type": "lstm", "size": 4, "bias": 1.0},
            {"name": "h2", "type": "lstm", "size": 4, "bias": 1.0},
            {"name": "output", "type": "softmax", "size": 4, "bias": 1.0},
            {"name": "postoutput", "type": "multiclass_classification", "size": 4},
        ],
    }
    net_path = tmp_path / "full.jsn"
    net_path.write_text(json.dumps(net))
    cfg_path = tmp_path / "pre.cfg"
    cfg_path.write_text(
        "train = true\nstochastic = true\nparallel_sequences = 2\n"
        "random_seed = 5\ndevice = cpu\n")
    work = tmp_path / "work"

    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts/discriminative_pretraining.py"),
         str(net_path), str(cfg_path), str(work), nc, "-", "-",
         "2", "1e-3", "0.5"],
        capture_output=True, text=True, cwd=str(tmp_path), env=env)
    assert r.returncode == 0, r.stdout + r.stderr

    s1 = json.loads((work / "trained.1.jsn").read_text())
    s2 = json.loads((work / "trained.2.jsn").read_text())
    assert [l["name"] for l in s1["layers"]] == [
        "input", "hidden_layer_1", "output", "postoutput"]
    assert [l["name"] for l in s2["layers"]] == [
        "input", "hidden_layer_1", "hidden_layer_2", "output", "postoutput"]
    # stage-2's first hidden layer was seeded from stage 1 (then trained
    # further for 2 epochs with a tiny lr): weights close but not equal
    w1 = np.asarray(s1["weights"]["hidden_layer_1"]["input"])
    w2 = np.asarray(s2["weights"]["hidden_layer_1"]["input"])
    assert not np.array_equal(w1, w2)
    np.testing.assert_allclose(w1, w2, atol=5e-2)
    # stage 2's second hidden layer and output layer retrain from scratch
    assert "hidden_layer_2" in s2["weights"]
