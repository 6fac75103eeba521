"""Smoke tests: example recipes parse/build; bfloat16 mode; get_outputs."""

import glob
import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from lstm_rnn_tpu.config import parse_config
from lstm_rnn_tpu.network import Network
from lstm_rnn_tpu.ops.masking import pattypes_from_lengths

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.parametrize("net_path", sorted(
    glob.glob(os.path.join(REPO, "examples", "**", "network.jsn"),
              recursive=True)))
def test_example_networks_build(net_path):
    net = Network.from_json_file(net_path)
    net.init_params(1)
    assert net.params


@pytest.mark.parametrize("cfg_path", sorted(
    glob.glob(os.path.join(REPO, "examples", "**", "*config.cfg"),
              recursive=True)))
def test_example_configs_parse(cfg_path):
    cfg = parse_config([cfg_path])
    assert cfg.parallel_sequences == 50


def test_bfloat16_mode_close_to_f32(rng):
    doc = {"layers": [
        {"name": "input", "type": "input", "size": 5},
        {"name": "b1", "type": "blstm", "size": 8, "bias": 1.0},
        {"name": "output", "type": "softmax", "size": 6, "bias": 1.0},
        {"name": "postoutput", "type": "multiclass_classification", "size": 6},
    ]}
    x = rng.randn(12, 3, 5).astype(np.float32)
    pt = pattypes_from_lengths([12, 9, 5], 12, 3)

    net32 = Network(doc["layers"], compute_dtype="float32")
    net32.init_params(3)
    y32 = np.asarray(net32.apply(net32.params, x, pt))

    net16 = Network(doc["layers"], compute_dtype="bfloat16")
    net16.params = net32.params
    y16 = np.asarray(net16.apply(net16.params, x, pt))

    assert np.isfinite(y16).all()
    # outputs are probabilities; bf16 rounding stays within ~1e-2
    assert np.abs(y16 - y32).max() < 2e-2
    np.testing.assert_allclose(y16.sum(-1), 1.0, atol=1e-5)


def test_get_outputs(rng):
    doc = {"layers": [
        {"name": "input", "type": "input", "size": 4},
        {"name": "ff", "type": "feedforward_tanh", "size": 3, "bias": 1.0},
        {"name": "po", "type": "sse", "size": 3},
    ]}
    net = Network(doc["layers"])
    net.init_params(1)
    y = rng.randn(6, 2, 3).astype(np.float32)
    seq_info = [{"tag": "a", "length": 6, "originalSeqIdx": 0},
                {"tag": "b", "length": 4, "originalSeqIdx": 0}]
    tags, outs = net.get_outputs(y, seq_info)
    assert tags == ["a", "b"]
    assert outs[0].shape == (6, 3) and outs[1].shape == (4, 3)
    np.testing.assert_array_equal(outs[1], y[:4, 1, :])


def _run_example(tmp_path, subdir):
    """Copy the examples tree to tmp, generate tiny synthetic data, and run
    the recipe's run.sh with 1-epoch overrides (CLI flags beat the options
    file, README:110-117)."""
    import shutil
    import subprocess
    import sys

    ex = tmp_path / "examples"
    shutil.copytree(os.path.join(REPO, "examples"), ex)
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    gen = subprocess.run(
        [sys.executable, str(ex / "make_example_data.py"),
         "--seqs", "6", "--len-scale", "0.1", "--overwrite"],
        capture_output=True, text=True, env=env)
    assert gen.returncode == 0, gen.stdout + gen.stderr
    r = subprocess.run(
        ["sh", "run.sh", "--max_epochs", "1", "--parallel_sequences", "2",
         "--device", "cpu", "--input_noise_sigma", "0"],
        capture_output=True, text=True, cwd=str(ex / subdir), env=env)
    assert r.returncode == 0, r.stdout + r.stderr
    assert (ex / subdir / "trained_network.jsn").exists()
    return r.stdout


@pytest.mark.parametrize("subdir", [
    "speech_recognition_chime/no_subsampling",
    "speech_recognition_chime/subsampling",
    "speech_autoencoding_chime",
    "lvcsr_physical_states",
])
def test_example_recipes_run(tmp_path, subdir):
    out = _run_example(tmp_path, subdir)
    assert "Storing the trained network" in out


def test_make_example_data_never_clobbers_existing(tmp_path):
    """run.sh regenerates when EITHER file of a pair is missing; an
    existing file (possibly REAL data from htk2nc) must survive untouched
    and only the missing one be generated."""
    import subprocess
    import sys

    gen = os.path.join(REPO, "examples", "make_example_data.py")
    out = tmp_path / "speech_recognition_chime"
    out.mkdir()
    real = out / "train_1_speaker.nc"
    real.write_bytes(b"REAL DATA, DO NOT TOUCH")
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    r = subprocess.run(
        [sys.executable, gen, "chime_recognition", "--seqs", "2",
         "--len-scale", "0.05", "--out-root", str(tmp_path)],
        capture_output=True, text=True, env=env)
    assert r.returncode == 0, r.stdout + r.stderr
    assert real.read_bytes() == b"REAL DATA, DO NOT TOUCH"
    assert (out / "val_1_speaker.nc").exists()  # the missing half appears
    assert "left untouched" in r.stdout
    # --overwrite restores the old regenerate-everything behavior
    r2 = subprocess.run(
        [sys.executable, gen, "chime_recognition", "--seqs", "2",
         "--len-scale", "0.05", "--out-root", str(tmp_path), "--overwrite"],
        capture_output=True, text=True, env=env)
    assert r2.returncode == 0, r2.stdout + r2.stderr
    assert real.read_bytes() != b"REAL DATA, DO NOT TOUCH"


def test_lvcsr_flagship_routes_wide_tail(monkeypatch):
    """The fork's LVCSR target (examples/lvcsr_physical_states, ~10k
    physical HMM states — reference README.md:12, htk2nc.cpp:215-243):
    the proj-fused tail is rejected at this width (analytically) and the
    Sp-blocked wide tail takes over with VMEM-fitting blocks. On the
    probed device kind the proj tail actually FITS at a 32-row block
    (shipped t1 verdict, tpu_tail2.log) — but fitting is not winning:
    restreaming the [P, Sp] W a thousand times per step loses to wide's
    measured 2.30M frames/s, so prefer_proj_tail (block-size rule:
    proj rows vs wide SB) still routes wide there, while the flagship
    (rows 1024 >= SB 1024) keeps the proj route."""
    from lstm_rnn_tpu.models.flagship import build_lvcsr_network
    from lstm_rnn_tpu.ops import vmem_probe as vp
    from lstm_rnn_tpu.ops.softmax_ce import (prefer_proj_tail,
                                             proj_tail_fits, wide_plan)

    net = build_lvcsr_network(seed=1)
    assert net.specs[-2].size == 10112
    # the REAL padded softmax fan-in: BLSTM(250) -> 125 cells/direction
    # -> hp 128 -> 2*128 = 256 (derive it, don't guess it)
    P = net.pad_params(net.params)["output"]["W"].shape[0]
    assert P == 256
    assert not proj_tail_fits(32000, P, 10240, jnp.bfloat16)
    spw, sb, rows = wide_plan(32000, P, 10112, jnp.bfloat16)
    assert spw >= 10112 and spw % sb == 0 and 32000 % rows == 0

    # with the shipped device verdicts in play (TPU_v5_lite keys):
    monkeypatch.setenv("LSTM_RNN_TPU_PROBE_CACHE", "/nonexistent/p.json")
    monkeypatch.setattr(vp, "_MEM", None)
    monkeypatch.setattr(vp, "_device_kind", lambda: "TPU_v5_lite")
    assert proj_tail_fits(32000, P, 10240, jnp.bfloat16)  # r32 verdict
    assert not prefer_proj_tail(32000, P, 10240, 10112, jnp.bfloat16)
    assert prefer_proj_tail(32000, P, 256, 183, jnp.bfloat16)
