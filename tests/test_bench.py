"""bench.py plumbing: the --num_devices DP path on the virtual mesh and
the bounded-failure JSON line (VERDICT r3 items #1b and #7).

The real bench runs the flagship shapes on the TPU; here run_bench is
driven with tiny shapes + a tiny net on the 8-device CPU mesh to verify
the mesh/sharding path compiles and executes, and main()'s failure mode
is checked to always print ONE parseable JSON line.
"""

import json

import numpy as np
import pytest


def _tiny_net():
    from lstm_rnn_tpu.models.flagship import build_timit_network
    return build_timit_network(input_size=3, hidden=4, depth=1,
                               num_states=5, seed=1)


def test_run_bench_single_device_tiny():
    import bench
    fps = bench.run_bench(t=8, b=4, iters=2, num_devices=0, net=_tiny_net(),
                          states=5, input_size=3, compute_dtype="float32",
                          backend="pallas_interpret", warmup_iters=1, interpret=True)
    assert fps > 0


def test_run_bench_dp_on_virtual_mesh():
    import jax

    import bench
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    fps = bench.run_bench(t=8, b=4, iters=2, num_devices=8, net=_tiny_net(),
                          states=5, input_size=3, compute_dtype="float32",
                          backend="pallas_interpret", warmup_iters=1, interpret=True)
    assert fps > 0


def test_run_bench_dp_mesh_of_one():
    """num_devices=1 must still build the mesh and run the sharded program
    (on the real chip this is the device-level DP proof; here it executes
    the same code path on one CPU device)."""
    import bench
    fps = bench.run_bench(t=8, b=4, iters=2, num_devices=1, net=_tiny_net(),
                          states=5, input_size=3, compute_dtype="float32",
                          backend="pallas_interpret", warmup_iters=1,
                          interpret=True)
    assert fps > 0


def test_bench_failure_prints_parseable_json(monkeypatch, capsys):
    import bench
    from lstm_rnn_tpu.utils import device

    def boom(*a, **kw):
        raise RuntimeError("axon relay 127.0.0.1:10000 unreachable")

    monkeypatch.setattr(device, "ensure_backend", boom)
    bench.main([])
    line = capsys.readouterr().out.strip().splitlines()[-1]
    out = json.loads(line)
    assert out["metric"] == bench.METRIC
    assert out["value"] == 0.0
    assert out["vs_baseline"] == 0.0
    assert "unreachable" in out["error"]


def test_bench_num_devices_flag_reaches_run_bench(monkeypatch, capsys):
    import bench
    from lstm_rnn_tpu.utils import device

    monkeypatch.setattr(device, "ensure_backend", lambda *a, **kw: None)
    seen = {}

    def fake_run(**kw):
        seen.update(kw)
        return 1234.5

    monkeypatch.setattr(bench, "run_bench", fake_run)
    bench.main(["--num_devices", "8", "--iters", "7"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert seen["num_devices"] == 8 and seen["iters"] == 7
    assert out["value"] == 1234.5
    assert out["vs_baseline"] == pytest.approx(1234.5 / bench.BASELINE_FPS,
                                               abs=5e-4)


def test_bench_lvcsr_recipe_states(monkeypatch, capsys):
    import bench
    from lstm_rnn_tpu.utils import device

    monkeypatch.setattr(device, "ensure_backend", lambda *a, **kw: None)
    seen = {}
    monkeypatch.setattr(bench, "run_bench",
                        lambda **kw: seen.update(kw) or 10.0)
    bench.main(["--recipe", "lvcsr"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert seen["states"] == 10112
    assert out["metric"] == "lvcsr_dblstm_train_frames_per_sec"


def test_pad_fraction_lcm_batch_multiple():
    """num_devices > 1 must pad B to a multiple of lcm(16, n) so the bf16
    tiles AND the mesh data axis both divide the padded batch."""
    import math

    from lstm_rnn_tpu.trainer import Trainer
    x = np.zeros((4, 5, 3), np.float32)
    tc = np.zeros((4, 5), np.int32)
    pt = np.ones((4, 5), np.int8)
    for n in (1, 8, 24):
        bmul = math.lcm(16, n) if n > 1 else 16
        x2, _tc2, _pt2 = Trainer._pad_fraction(x, tc, pt, b_multiple=bmul)
        assert x2.shape[1] % 16 == 0 and x2.shape[1] % n == 0
