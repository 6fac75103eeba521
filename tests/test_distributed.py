"""Multi-host (DCN) data parallelism: 2 processes x 2 virtual CPU devices.

The reference is a single process on one GPU (main.cpp:526-541); the TPU
framework spans hosts via jax.distributed (parallel/distributed.py). These
tests run REAL multi-process training: two subprocesses join through a
local coordinator, the mesh spans all 4 global devices, each host transfers
only its half of every fraction, and gradient psums cross the process
boundary (Gloo on CPU; ICI/DCN on a pod).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np

from .test_data import _write_classification_nc

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _cli_env(local_devices: int):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={local_devices}")
    env.pop("JAX_COORDINATOR_ADDRESS", None)
    return env


def _setup(tmp_path):
    nc = str(tmp_path / "train.nc")
    _write_classification_nc(nc, [6, 5, 4, 7, 8, 3], in_size=3, num_labels=4,
                             seed=7)
    net = {
        "layers": [
            {"name": "input", "type": "input", "size": 3},
            {"name": "l1", "type": "blstm", "size": 4, "bias": 1.0},
            {"name": "output", "type": "softmax", "size": 4, "bias": 1.0},
            {"name": "postoutput", "type": "multiclass_classification",
             "size": 4},
        ],
    }
    net_path = tmp_path / "net.jsn"
    net_path.write_text(json.dumps(net))
    return nc, str(net_path)


def _train_args(nc, net_path):
    # fuse_fractions exercises the fused fori_loop group path over the
    # multi-host mesh (device-stacked global arrays, cross-process psum
    # inside the loop body)
    return ["--network", net_path, "--train", "true", "--train_file", nc,
            "--stochastic", "true", "--learning_rate", "1e-3",
            "--parallel_sequences", "4", "--random_seed", "5",
            "--max_epochs", "2", "--device", "cpu",
            "--fuse_fractions", "4", "--bucket_lengths", "true"]


def test_two_process_cli_training_matches_single_process(tmp_path):
    """The full CLI on 2 processes (2 devices each, coordinator over
    loopback) must produce the same trained_network.jsn as one process with
    4 devices: same global mesh, per-host batch slices, cross-process
    gradient psum."""
    nc, net_path = _setup(tmp_path)

    d1 = tmp_path / "single"
    d1.mkdir()
    r = subprocess.run(
        [sys.executable, "-m", "lstm_rnn_tpu.cli", *_train_args(nc, net_path),
         "--num_devices", "4"],
        capture_output=True, text=True, cwd=str(d1), env=_cli_env(4),
        timeout=420)
    assert r.returncode == 0, r.stdout + r.stderr

    d2 = tmp_path / "multi"
    d2.mkdir()
    port = _free_port()
    procs = []
    for pid in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "lstm_rnn_tpu.cli",
             *_train_args(nc, net_path),
             "--coordinator_address", f"127.0.0.1:{port}",
             "--num_processes", "2", "--process_id", str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd=str(d2), env=_cli_env(2)))
    outs = [p.communicate(timeout=420)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out
    # coordinator prints the multi-host banner; secondary stays silent
    assert "over 2 hosts" in outs[0]
    assert "Data-parallel mesh" not in outs[1]

    w1 = json.loads((d1 / "trained_network.jsn").read_text())["weights"]
    w2 = json.loads((d2 / "trained_network.jsn").read_text())["weights"]
    for layer in w1:
        for sec in w1[layer]:
            np.testing.assert_allclose(
                w1[layer][sec], w2[layer][sec], rtol=1e-5, atol=1e-7,
                err_msg=f"{layer}.{sec}")


def test_host_local_slice_is_contiguous_block():
    """Each process owns a contiguous block of the global batch axis
    (process-major mesh order) — checked single-process (count=1 is a
    passthrough) plus the pure slicing arithmetic."""
    from lstm_rnn_tpu.parallel.distributed import host_local_slice

    a = np.arange(24).reshape(2, 12)
    out = host_local_slice(a, None, batch_axis=1)
    np.testing.assert_array_equal(out, a)  # single process: passthrough


def test_two_process_dp_x_sp_matches_single_device(tmp_path):
    """Multi-host composes with sequence parallelism: 2 processes x 2
    devices on a ('data', 'seq') mesh — data blocks align with hosts
    (process-major mesh rows), the wavefront's carry hops stay
    intra-host, and the trained network equals a plain single-device
    run."""
    nc, net_path = _setup(tmp_path)

    d1 = tmp_path / "single"
    d1.mkdir()
    r = subprocess.run(
        [sys.executable, "-m", "lstm_rnn_tpu.cli",
         *_train_args(nc, net_path)],
        capture_output=True, text=True, cwd=str(d1), env=_cli_env(1),
        timeout=420)
    assert r.returncode == 0, r.stdout + r.stderr

    d2 = tmp_path / "multi"
    d2.mkdir()
    port = _free_port()
    procs = []
    for pid in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "lstm_rnn_tpu.cli",
             *_train_args(nc, net_path), "--seq_devices", "2",
             "--coordinator_address", f"127.0.0.1:{port}",
             "--num_processes", "2", "--process_id", str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd=str(d2), env=_cli_env(2)))
    outs = [p.communicate(timeout=420)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out
    assert "DP x SP mesh" in outs[0]

    w1 = json.loads((d1 / "trained_network.jsn").read_text())["weights"]
    w2 = json.loads((d2 / "trained_network.jsn").read_text())["weights"]
    for layer in w1:
        for sec in w1[layer]:
            np.testing.assert_allclose(
                w1[layer][sec], w2[layer][sec], rtol=1e-5, atol=1e-7,
                err_msg=f"{layer}.{sec}")


def test_two_process_cli_forward_matches_single_process(tmp_path):
    """Multi-host DP serving: --train false on 2 processes (2 devices
    each) writes the same single_csv posteriors as one process — every
    host computes its batch shard, the replicated output is written by
    the coordinator only."""
    nc, net_path = _setup(tmp_path)

    # one trained net shared by both serving runs
    d0 = tmp_path / "trainer"
    d0.mkdir()
    r = subprocess.run(
        [sys.executable, "-m", "lstm_rnn_tpu.cli", *_train_args(nc, net_path),
         "--max_epochs", "1"],
        capture_output=True, text=True, cwd=str(d0), env=_cli_env(4),
        timeout=420)
    assert r.returncode == 0, r.stdout + r.stderr
    trained = str(d0 / "trained_network.jsn")

    fwd = ["--network", trained, "--train", "false", "--ff_input_file", nc,
           "--ff_output_format", "single_csv", "--parallel_sequences", "3",
           "--device", "cpu"]

    d1 = tmp_path / "single"
    d1.mkdir()
    r = subprocess.run(
        [sys.executable, "-m", "lstm_rnn_tpu.cli", *fwd,
         "--ff_output_file", "one.csv"],
        capture_output=True, text=True, cwd=str(d1), env=_cli_env(4),
        timeout=420)
    assert r.returncode == 0, r.stdout + r.stderr

    d2 = tmp_path / "multi"
    d2.mkdir()
    port = _free_port()
    procs = []
    for pid in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "lstm_rnn_tpu.cli", *fwd,
             "--ff_output_file", "two.csv",
             "--coordinator_address", f"127.0.0.1:{port}",
             "--num_processes", "2", "--process_id", str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd=str(d2), env=_cli_env(2)))
    outs = [p.communicate(timeout=420)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out
    assert "over 2 hosts" in outs[0]   # the serving-mesh banner
    # secondary computes but stays silent (stdout devnull'd after the
    # device banner; Gloo chatter goes to stderr)
    assert "Data-parallel serving mesh" not in outs[1]
    assert "Computing outputs" not in outs[1]

    a = (d1 / "one.csv").read_text().strip().split("\n")
    b = (d2 / "two.csv").read_text().strip().split("\n")
    assert len(a) == len(b)
    for la, lb in zip(a, b):
        ca, cb = la.split(";"), lb.split(";")
        assert ca[0] == cb[0]
        np.testing.assert_allclose([float(v) for v in ca[1:]],
                                   [float(v) for v in cb[1:]],
                                   rtol=1e-5, atol=1e-7)
