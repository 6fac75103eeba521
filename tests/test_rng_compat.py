"""--init_rng currennt: replay of the reference's boost::mt19937 stream.

boost::mt19937 and std::mt19937 are the same standard generator with the
same single-word seeding, so the core stream is cross-validated against a
std::mt19937 program compiled on the fly with g++. The uniform_real
mapping implements boost's documented generate_uniform_real (float32
numerator / 2^32, retry at the bound); the layer draw order follows
TrainableLayer.cu:103-125 (one shared engine, flat [input|bias|internal]
order per layer, layers in construction order).
"""

import json
import os
import shutil
import subprocess
import sys

import numpy as np
import pytest

from lstm_rnn_tpu.utils.rng_compat import CurrenntInitStream, MT19937

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(shutil.which("g++") is None, reason="no g++")
def test_mt19937_matches_std_mt19937(tmp_path):
    src = tmp_path / "gen.cpp"
    src.write_text(r"""
#include <random>
#include <cstdio>
int main(int argc, char** argv) {
    std::mt19937 gen(std::stoul(argv[1]));
    for (int i = 0; i < 2000; ++i) std::printf("%u\n", gen());
    return 0;
}
""")
    exe = str(tmp_path / "gen")
    subprocess.run(["g++", "-O1", "-o", exe, str(src)], check=True)
    for seed in (1, 5489, 4711, 4294967295):
        out = subprocess.run([exe, str(seed)], capture_output=True,
                             text=True, check=True).stdout.split()
        expect = np.asarray([int(v) for v in out], dtype=np.uint32)
        got = MT19937(seed).raw(2000)
        np.testing.assert_array_equal(got, expect, err_msg=f"seed {seed}")


def test_mt19937_block_boundaries():
    """Draw counts crossing the 624-word twist boundary agree with a
    single big draw."""
    a = MT19937(7).raw(1500)
    g = MT19937(7)
    b = np.concatenate([g.raw(623), g.raw(2), g.raw(875)])
    np.testing.assert_array_equal(a, b)


def test_uniform_semantics():
    """v = float32(x)/2^32 * range + min, element-for-element."""
    s = CurrenntInitStream(42)
    vals = s.uniform(4096, -0.1, 0.1)
    raw = MT19937(42).raw(4096)
    rng = np.float32(0.1) - np.float32(-0.1)
    expect = (raw.astype(np.float32) / np.float32(4294967296.0) * rng
              + np.float32(-0.1))
    np.testing.assert_array_equal(vals, expect)
    assert vals.dtype == np.float32
    assert vals.min() >= -0.1 and vals.max() < 0.1


def test_network_init_draw_order():
    """Layers draw sequentially from ONE stream in flat storage order:
    re-assembling the flat vectors must reproduce the raw stream."""
    from lstm_rnn_tpu import io_currennt as ioc
    from lstm_rnn_tpu.network import Network

    layers = [
        {"name": "input", "type": "input", "size": 3},
        {"name": "l1", "type": "blstm", "size": 4, "bias": 1.0},
        {"name": "ff", "type": "feedforward_tanh", "size": 5, "bias": 1.0},
        {"name": "output", "type": "softmax", "size": 4, "bias": 1.0},
        {"name": "postoutput", "type": "multiclass_classification", "size": 4},
    ]
    net = Network(layers)
    net.init_params(99, init_rng="currennt")

    stream = CurrenntInitStream(99)
    # l1: blstm size 4, prev 3, els 2 -> 4*(4*(3+1) + 4*2+3) = 108 draws
    flat = stream.uniform(4 * (4 * 4 + 11), -0.1, 0.1)
    inp, bias, internal = ioc.lstm_to_flat(net.params["l1"])
    np.testing.assert_array_equal(np.concatenate([inp, bias, internal]), flat)
    # ff: 5*(3+1)... prev is l1's size 4 -> 5*(4+1) = 25 draws
    flat_ff = stream.uniform(5 * 5, -0.1, 0.1)
    inp, bias = ioc.ff_to_flat(net.params["ff"])[:2]
    np.testing.assert_array_equal(np.concatenate([inp, bias]), flat_ff)


def test_normal_rejected():
    from lstm_rnn_tpu.network import Network
    layers = [
        {"name": "input", "type": "input", "size": 2},
        {"name": "l1", "type": "lstm", "size": 2, "bias": 1.0},
        {"name": "output", "type": "softmax", "size": 2, "bias": 1.0},
        {"name": "postoutput", "type": "multiclass_classification", "size": 2},
    ]
    net = Network(layers)
    with pytest.raises(ValueError, match="uniform"):
        net.init_params(1, dist="normal", init_rng="currennt")


def test_cli_init_rng_deterministic(tmp_path, rng):
    """Same seed + --init_rng currennt -> byte-identical initial weights
    across runs (the reference's cross-toolkit comparability property)."""
    from .test_data import _write_classification_nc

    nc = str(tmp_path / "t.nc")
    _write_classification_nc(nc, [5, 4], in_size=3, num_labels=4, seed=1)
    netj = {"layers": [
        {"name": "input", "type": "input", "size": 3},
        {"name": "l1", "type": "lstm", "size": 4, "bias": 1.0},
        {"name": "output", "type": "softmax", "size": 4, "bias": 1.0},
        {"name": "postoutput", "type": "multiclass_classification", "size": 4},
    ]}
    (tmp_path / "net.jsn").write_text(json.dumps(netj))
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")

    outs = []
    for d in ("a", "b"):
        wd = tmp_path / d
        wd.mkdir()
        r = subprocess.run(
            [sys.executable, "-m", "lstm_rnn_tpu.cli",
             "--network", str(tmp_path / "net.jsn"), "--train", "true",
             "--train_file", nc, "--max_epochs", "1", "--random_seed", "77",
             "--init_rng", "currennt", "--learning_rate", "0",
             "--momentum", "0", "--device", "cpu"],
            capture_output=True, text=True, cwd=str(wd), env=env)
        assert r.returncode == 0, r.stdout + r.stderr
        outs.append((wd / "trained_network.jsn").read_bytes())
    assert outs[0] == outs[1]
