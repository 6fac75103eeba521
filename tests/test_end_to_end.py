"""End-to-end golden test: one training epoch on real CHiME data.

The reference's own golden fixture (tests/test1/expected_network.jsn) is
byte-identical to the initial network.jsn — vacuous, since real training
changes output-layer weights by ~4e-2 at lr=1e-5 (the fork committed a stale
fixture; its own binary could not pass the 1e-10 check either). The
meaningful equivalent: train the SAME pinned test1 network for one epoch
with the jax trainer (float32, TPU semantics) AND with the float64 NumPy
oracle implementing the reference math, and require the weight UPDATES to
agree to float32 round-off.
"""

import json

import numpy as np
import pytest

from lstm_rnn_tpu.data.dataset import DataSet
from lstm_rnn_tpu.network import Network
from lstm_rnn_tpu.trainer import Trainer

from . import oracle_net
from .conftest import requires_reference

NC = "/root/reference/examples/speech_recognition_chime/val_1_speaker.nc"
NET = "/root/reference/tests/test1/network.jsn"


@requires_reference
@pytest.mark.parametrize("stochastic", [True, False])
def test_one_epoch_matches_oracle(stochastic):
    # small subset: 20 sequences in fractions of 10 for speed
    ds = DataSet([NC], parallel_sequences=10, fraction=0.2,
                 sort_by_length=True, prefetch=False)
    assert ds.total_sequences == 20
    net = Network.from_json_file(NET)

    trainer = Trainer(net, ds, learning_rate=1e-5, momentum=0.9, max_epochs=1,
                      hybrid_online_batch=stochastic)
    trainer.train_epoch()

    fracs = [(f.inputs, f.targets, f.pattypes) for f in ds.fractions()]
    params0 = {k: {kk: np.asarray(vv, np.float64) for kk, vv in v.items()}
               for k, v in net.params.items()}
    p_ref, _, err_ref, correct_ref = oracle_net.train_epoch(
        net.specs, params0, fracs, lr=1e-5, momentum=0.9, stochastic=stochastic)

    # training error: sum over fractions / totalSequences (Optimizer.cu:100)
    err_jax = trainer.cur_training_error
    assert abs(err_jax - err_ref / ds.total_sequences) < 5e-3 * abs(err_jax)
    # classification error counting
    cls_ref = 1.0 - correct_ref / ds.total_timesteps
    assert abs(trainer.cur_training_class_error - cls_ref) < 1e-12

    # weight updates must match to float32 round-off
    import jax
    for name in p_ref:
        for kk in p_ref[name]:
            upd_ref = p_ref[name][kk] - params0[name][kk]
            upd_jax = np.asarray(trainer.params[name][kk], np.float64) - params0[name][kk]
            scale = np.abs(upd_ref).max() + 1e-12
            err = np.abs(upd_jax - upd_ref).max()
            # in float32 the deep layers' ~1e-8 updates carry ~1e-8
            # absolute round-off; the f64 bound is pinned separately by
            # test_one_epoch_f64_machine_epsilon below.
            assert err < 2e-3 * scale + 5e-8, (
                f"{name}.{kk}: max update err {err:.3e} vs scale {scale:.3e}")


@requires_reference
def test_one_epoch_f64_machine_epsilon():
    """The same epoch under jax_enable_x64 with float64 parameters: the
    trainer's math IS the oracle's math to f64 round-off. Measured
    residue (2026-08): weights within 3.5e-11 ABSOLUTE / ~4e-7 of the
    update scale — the recurrent layers' per-step math matches the
    oracle's op-for-op (tests/test_lstm_parity.py pins f64 machine
    epsilon per step); what remains is XLA-vs-BLAS matmul reduction
    order (~1e-16 relative per dot) amplified through the recurrence and
    two sequential fraction updates. Five orders of magnitude below the
    f32 test's tolerance, and the per-frame classification counts are
    IDENTICAL — this is the epoch-level ground-truth anchor."""
    import jax

    with jax.enable_x64():
        ds = DataSet([NC], parallel_sequences=10, fraction=0.2,
                     sort_by_length=True, prefetch=False)
        net = Network.from_json_file(NET)
        net.params = jax.tree_util.tree_map(
            lambda a: np.asarray(a, np.float64), net.params)
        params0 = jax.tree_util.tree_map(
            lambda a: np.array(a, np.float64), net.params)
        trainer = Trainer(net, ds, learning_rate=1e-5, momentum=0.9,
                          max_epochs=1, hybrid_online_batch=True)
        trainer.train_epoch()

        fracs = [(f.inputs, f.targets, f.pattypes) for f in ds.fractions()]
        p_ref, _, err_ref, correct_ref = oracle_net.train_epoch(
            net.specs, params0, fracs, lr=1e-5, momentum=0.9,
            stochastic=True)

        # loss and the integer correct-count agree at f64 resolution
        assert (abs(trainer.cur_training_error - err_ref / ds.total_sequences)
                < 1e-8 * abs(err_ref / ds.total_sequences))
        cls_ref = 1.0 - correct_ref / ds.total_timesteps
        assert trainer.cur_training_class_error == cls_ref
        for name in p_ref:
            for kk in p_ref[name]:
                upd_ref = p_ref[name][kk] - params0[name][kk]
                upd_jax = np.asarray(trainer.params[name][kk],
                                     np.float64) - params0[name][kk]
                err = np.abs(upd_jax - upd_ref).max()
                scale = np.abs(upd_ref).max()
                assert err <= max(1e-9, 1e-5 * scale), (
                    f"{name}.{kk}: f64 update err {err:.3e} "
                    f"vs scale {scale:.3e}")


@requires_reference
@pytest.mark.parametrize("stochastic", [True, False])
def test_weight_noise_epoch_matches_oracle(stochastic, monkeypatch):
    """Weight-noise training against the f64 oracle: gradients must be
    taken at the NOISY point and the update applied to the CLEAN weights
    (Optimizer.cu:58-84 injects into the weight buffer before the pass,
    TrainableLayer.cu:188-209 restores it before the update). The trainer's
    per-fraction noise draws are captured and injected into the oracle, so
    the comparison pins the composition itself, not just the noise=0
    path."""
    import jax

    ds = DataSet([NC], parallel_sequences=10, fraction=0.2,
                 sort_by_length=True, prefetch=False)
    net = Network.from_json_file(NET)
    trainer = Trainer(net, ds, learning_rate=1e-5, momentum=0.9,
                      max_epochs=1, hybrid_online_batch=stochastic,
                      weight_noise_sigma=0.05)
    drawn = []
    orig = trainer._draw_noise

    def capture():
        n = orig()
        drawn.append(jax.tree_util.tree_map(np.asarray, n))
        return n

    monkeypatch.setattr(trainer, "_draw_noise", capture)
    trainer.train_epoch()

    fracs = [(f.inputs, f.targets, f.pattypes) for f in ds.fractions()]
    assert len(drawn) == len(fracs)  # one independent draw per fraction
    params0 = {k: {kk: np.asarray(vv, np.float64) for kk, vv in v.items()}
               for k, v in net.params.items()}
    p_ref, _, err_ref, _ = oracle_net.train_epoch(
        net.specs, params0, fracs, lr=1e-5, momentum=0.9,
        stochastic=stochastic, noise=drawn)

    err_jax = trainer.cur_training_error
    assert abs(err_jax - err_ref / ds.total_sequences) < 5e-3 * abs(err_jax)
    for name in p_ref:
        for kk in p_ref[name]:
            upd_ref = p_ref[name][kk] - params0[name][kk]
            upd_jax = np.asarray(trainer.params[name][kk],
                                 np.float64) - params0[name][kk]
            scale = np.abs(upd_ref).max() + 1e-12
            err = np.abs(upd_jax - upd_ref).max()
            assert err < 2e-3 * scale + 5e-8, (
                f"{name}.{kk}: max update err {err:.3e} vs scale {scale:.3e}")


def test_weight_noise_padded_view_matches_oracle(monkeypatch, tmp_path):
    """Weight noise under the PADDED training view: the noise draw is
    masked by Network.pad_mask() (trainer.py _draw_noise), so padded
    entries stay EXACTLY zero through a noisy epoch, and the exact-layout
    updates (Trainer.exact_params) still match the f64 oracle fed the
    unpadded noise."""
    import jax

    from .test_data import _write_classification_nc

    nc = str(tmp_path / "t.nc")
    _write_classification_nc(nc, [5, 4, 6, 3], in_size=3, num_labels=4,
                             seed=3)
    layers = [
        {"name": "input", "type": "input", "size": 3},
        {"name": "l1", "type": "blstm", "size": 8, "bias": 1.0},
        {"name": "output", "type": "softmax", "size": 4, "bias": 1.0},
        {"name": "postoutput", "type": "multiclass_classification",
         "size": 4},
    ]
    net = Network(layers, backend="pallas_interpret")
    net.init_params(5)
    ds = DataSet([nc], parallel_sequences=2, prefetch=False)
    trainer = Trainer(net, ds, learning_rate=1e-3, momentum=0.9,
                      max_epochs=1, hybrid_online_batch=True,
                      weight_noise_sigma=0.05, device_cache=False)
    assert trainer.padded  # the padded view must actually be under test
    drawn = []
    orig = trainer._draw_noise

    def capture():
        n = orig()
        drawn.append(jax.tree_util.tree_map(np.asarray, n))
        return n

    monkeypatch.setattr(trainer, "_draw_noise", capture)
    trainer.train_epoch()

    # padded entries stayed exactly zero through the noisy epoch (the
    # pad_mask kills the noise there; zero weights + zero grads invariant)
    mask = net.pad_mask()
    n_padded = 0
    for name in mask:
        for kk in mask[name]:
            pad_vals = np.asarray(trainer.params[name][kk])[
                np.asarray(mask[name][kk]) == 0]
            n_padded += pad_vals.size
            assert np.all(pad_vals == 0.0), (
                f"{name}.{kk}: padded entries perturbed")
    assert n_padded > 0  # the padded view must have real padding under test

    # exact-layout updates match the oracle fed the UNPADDED noise
    fracs = [(f.inputs, f.targets, f.pattypes) for f in ds.fractions()]
    assert len(drawn) == len(fracs)
    exact_noise = [trainer.exact_params(n) for n in drawn]
    params0 = {k: {kk: np.asarray(vv, np.float64) for kk, vv in v.items()}
               for k, v in net.params.items()}
    p_ref, _, _, _ = oracle_net.train_epoch(
        net.specs, params0, fracs, lr=1e-3, momentum=0.9, stochastic=True,
        noise=exact_noise)
    got = trainer.exact_params()
    for name in p_ref:
        for kk in p_ref[name]:
            upd_ref = p_ref[name][kk] - params0[name][kk]
            upd_jax = np.asarray(got[name][kk], np.float64) - params0[name][kk]
            scale = np.abs(upd_ref).max() + 1e-12
            err = np.abs(upd_jax - upd_ref).max()
            assert err < 2e-3 * scale + 5e-8, (
                f"{name}.{kk}: max update err {err:.3e} vs scale {scale:.3e}")


@requires_reference
def test_regression_epoch_matches_oracle():
    """sse regression training (autoencoding the CHiME features) agrees with
    the float64 oracle — covers the regression-target fraction path, the
    feedforward_identity output layer and the sse loss end to end."""
    src = DataSet([NC], parallel_sequences=6, fraction=0.12,
                  sort_by_length=True, prefetch=False)
    # turn the classification fractions into regression ones (targets = a
    # linear function of inputs for a learnable signal)
    fracs = []
    for f in src.fractions():
        tgt = (f.inputs[..., :8] * 0.5 + 0.1).astype(np.float32)
        tgt[f.pattypes == 0] = 0.0
        fracs.append((f.inputs, tgt, f.pattypes))

    layers = [
        {"name": "input", "type": "input", "size": 39},
        {"name": "b1", "type": "blstm", "size": 10, "bias": 1.0},
        {"name": "output", "type": "feedforward_identity", "size": 8, "bias": 1.0},
        {"name": "postoutput", "type": "sse", "size": 8},
    ]
    net = Network(layers)
    net.init_params(11)
    params0 = {k: {kk: np.asarray(vv, np.float64) for kk, vv in v.items()}
               for k, v in net.params.items()}

    class _FixedDs:
        total_sequences = src.total_sequences
        total_timesteps = src.total_timesteps

        @staticmethod
        def fractions():
            return iter([type("F", (), {"inputs": x, "targets": t,
                                        "pattypes": p, "seq_info": []})()
                         for (x, t, p) in fracs])

    trainer = Trainer(net, _FixedDs(), learning_rate=1e-3, momentum=0.9,
                      max_epochs=1, hybrid_online_batch=True)
    trainer.train_epoch()

    p_ref, _, err_ref, _ = oracle_net.train_epoch(
        net.specs, params0, fracs, lr=1e-3, momentum=0.9, stochastic=True,
        loss="sse")
    assert abs(trainer.cur_training_error - err_ref / src.total_sequences) \
        < 1e-3 * abs(err_ref / src.total_sequences) + 1e-8
    for name in p_ref:
        for kk in p_ref[name]:
            upd_ref = p_ref[name][kk] - params0[name][kk]
            upd = np.asarray(trainer.params[name][kk], np.float64) - params0[name][kk]
            scale = np.abs(upd_ref).max() + 1e-12
            assert np.abs(upd - upd_ref).max() < 2e-3 * scale + 5e-8, (
                f"{name}.{kk}")


@requires_reference
def test_best_weights_survive_donation():
    """Early stopping restores the BEST weights, which may be several donated
    buffer generations old — snapshots must be copies (regression test for a
    'Array has been deleted' failure)."""
    ds = DataSet([NC], parallel_sequences=8, fraction=0.1,
                 sort_by_length=True, prefetch=False)
    net = Network.from_json_file(NET)
    # huge lr so validation error worsens and the best snapshot stays old
    t = Trainer(net, ds, validation_set=ds, learning_rate=5.0, momentum=0.9,
                max_epochs=3, hybrid_online_batch=True)
    while not t.train_epoch():
        pass
    assert t.cur_epoch == 3
    best = t.exact_params(t.best_params)
    # best == the epoch-1 weights, finite and loadable
    assert np.isfinite(best["blstm_level_0"]["W_in"]).all()
    # and the final params were restored from best (reference semantics)
    cur = t.exact_params()
    np.testing.assert_array_equal(cur["output"]["W"], best["output"]["W"])


@requires_reference
def test_max_epochs_no_best_early_stop():
    """Stop when no new lowest validation error within max_epochs_no_best
    epochs (Optimizer.cu:317-320), with best weights restored."""
    ds = DataSet([NC], parallel_sequences=8, fraction=0.1,
                 sort_by_length=True, prefetch=False)
    net = Network.from_json_file(NET)
    t = Trainer(net, ds, validation_set=ds, learning_rate=5.0, momentum=0.9,
                max_epochs=-1, max_epochs_no_best=2, validate_every=1,
                hybrid_online_batch=True)
    epochs = 0
    while not t.train_epoch():
        epochs += 1
        assert epochs < 50
    # lr=5.0 diverges, so no epoch improves (NaN < inf is false, matching the
    # reference's float comparison) -> stop as soon as since_lowest hits 2
    assert t.cur_epoch == 2
    assert t.epochs_since_lowest >= 2
    cur = t.exact_params()
    best = t.exact_params(t.best_params)
    np.testing.assert_array_equal(cur["output"]["W"], best["output"]["W"])


@requires_reference
def test_reference_fixture_is_vacuous():
    """Documents why we do not compare against expected_network.jsn."""
    exp = json.load(open("/root/reference/tests/test1/expected_network.jsn"))
    init = json.load(open(NET))
    for layer in exp["weights"]:
        for sec in exp["weights"][layer]:
            assert exp["weights"][layer][sec] == init["weights"][layer][sec]


@requires_reference
def test_f32_matmul_3x_epoch_drift_vs_oracle():
    """--f32_matmul 3x end-to-end safety bound (VERDICT r3 #4): one epoch
    of real CHiME data through the FUSED kernels in 3x mode must track the
    float64 oracle nearly as tightly as honest-f32 does — the published
    numbers in RESULTS.md ("f32 parity modes") come from this run. The
    epoch is truncated (truncate_seq) to keep interpret-mode tracing
    tractable; the per-matmul error model (~5e-7 relative) is T-dependent
    only through the recurrence, which this exercises on real data."""
    from lstm_rnn_tpu.ops import lstm_cell as lc

    def run_epoch(backend):
        ds = DataSet([NC], parallel_sequences=10, fraction=0.2,
                     trunc_seq_length=48, sort_by_length=True, prefetch=False)
        net = Network.from_json_file(NET)
        net.backend = backend
        tr = Trainer(net, ds, learning_rate=1e-5, momentum=0.9,
                     max_epochs=1, hybrid_online_batch=True,
                     device_cache=False)
        tr.train_epoch()
        return net, ds, tr

    # f64 oracle ground truth on the SAME fractions
    ds = DataSet([NC], parallel_sequences=10, fraction=0.2,
                 trunc_seq_length=48, sort_by_length=True, prefetch=False)
    fracs = [(f.inputs, f.targets, f.pattypes) for f in ds.fractions()]
    net0 = Network.from_json_file(NET)
    params0 = {k: {kk: np.asarray(vv, np.float64) for kk, vv in v.items()}
               for k, v in net0.params.items()}
    from . import oracle_net as _on
    p_ref, _, err_ref, _ = _on.train_epoch(
        net0.specs, params0, fracs, lr=1e-5, momentum=0.9, stochastic=True)

    def drift(trainer):
        worst = 0.0
        for name in p_ref:
            for kk in p_ref[name]:
                upd_ref = p_ref[name][kk] - params0[name][kk]
                upd = np.asarray(trainer.exact_params()[name][kk],
                                 np.float64) - params0[name][kk]
                scale = np.abs(upd_ref).max() + 1e-12
                worst = max(worst, float(np.abs(upd - upd_ref).max()
                                         / (scale + 5e-8 / 2e-3)))
        return worst

    _, _, tr_f32 = run_epoch("scan")          # honest-f32 parity mode
    d_f32 = drift(tr_f32)
    e_f32 = tr_f32.cur_training_error

    old = lc.F32_MATMUL_3X
    lc.F32_MATMUL_3X = True
    try:
        _, _, tr_3x = run_epoch("pallas_interpret")  # the 3x kernels
    finally:
        lc.F32_MATMUL_3X = old
    d_3x = drift(tr_3x)
    e_3x = tr_3x.cur_training_error

    print(f"\n[f32 3x drift] honest-f32 vs oracle: {d_f32:.3e}; "
          f"3x vs oracle: {d_3x:.3e}; "
          f"loss f32 {e_f32:.6f} vs 3x {e_3x:.6f} "
          f"(rel {abs(e_3x - e_f32) / abs(e_f32):.2e})")
    # honest-f32 stays inside the established end-to-end bound
    assert d_f32 < 2e-3
    # 3x mode: the published safety bound — within 5x of honest-f32's
    # drift and never beyond 1% of the oracle update scale
    assert d_3x < max(5 * d_f32, 1e-3) and d_3x < 1e-2
    # loss trajectories agree to ~1e-4 relative after a full epoch
    assert abs(e_3x - e_f32) < 1e-3 * abs(e_f32)
