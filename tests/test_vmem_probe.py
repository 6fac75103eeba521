"""Automated VMEM probe: verdict table + pick_chunk integration.

The real probe AOT-compiles the Mosaic kernels on a TPU (unavailable here),
so the compile step is faked; everything around it — candidate order, disk
persistence, pick_chunk preferring device-validated verdicts over the
analytic model — is exercised for real.
"""

import jax.numpy as jnp

from lstm_rnn_tpu.ops import lstm_cell as lc
from lstm_rnn_tpu.ops import vmem_probe as vp


def _fresh(tmp_path, monkeypatch, accept, tail_accept=lambda rows: False,
           wide_accept=lambda sb, rows: False):
    monkeypatch.setenv("LSTM_RNN_TPU_PROBE_CACHE", str(tmp_path / "probe.json"))
    monkeypatch.setattr(vp, "_MEM", None)
    monkeypatch.setattr(vp, "_device_kind", lambda: "fake_tpu")
    calls = []

    def fake_probe(hp, pp, bp, ch, dt, carry=False, T=0):
        calls.append(ch)
        return accept(ch)

    tail_calls = []

    def fake_tail_probe(P, Sp, rows, dt, proj):
        tail_calls.append((P, Sp, rows, proj))
        return tail_accept(rows)

    wide_calls = []

    def fake_wide_probe(P, sb, rows, dt):
        wide_calls.append((P, sb, rows))
        return wide_accept(sb, rows)

    monkeypatch.setattr(vp, "_probe_compile", fake_probe)
    monkeypatch.setattr(vp, "_tail_probe_compile", fake_tail_probe)
    monkeypatch.setattr(vp, "_wide_probe_compile", fake_wide_probe)
    return calls, tail_calls, wide_calls


def test_ensure_validated_descends_and_persists(tmp_path, monkeypatch):
    calls, _, _w = _fresh(tmp_path, monkeypatch, lambda ch: ch <= 8)
    # H=512 f32: a point with NO manual anchor — the round-2 pick_chunk
    # could only guess here (VERDICT weak #7). Validated AT T=512: k3
    # verdicts are per chunk-grid size.
    ch = vp.ensure_validated(512, 512, 128, 8, jnp.float32, verbose=False)
    assert ch == 8 and calls == [16, 8]

    # pick_chunk now auto-selects the validated chunk for this (shape, T)
    assert lc.pick_chunk(512, 512, 128, 8, jnp.float32) == 8

    # persisted on disk: a fresh in-memory table still sees the verdicts
    monkeypatch.setattr(vp, "_MEM", None)
    assert vp.lookup_chunk(512, 512, 128, 8, jnp.float32) == 8

    # re-validating compiles nothing (verdicts cached)
    calls.clear()
    assert vp.ensure_validated(512, 512, 128, 8, jnp.float32,
                               verbose=False) == 8
    assert calls == []


def test_verdicts_do_not_cross_time_lengths(tmp_path, monkeypatch):
    """The k3 contract: a chunk verdict is evidence ONLY at the grid size
    it compiled at. Round 5's device sweep measured the f32 backward
    kernel's scoped-VMEM stack GROWING with the chunk count (c16 at
    (h128,p128,b56): fits at NC<=16, overflows 17.68M at NC=32 and
    16.98M at NC=47 — non-monotonic past the knee), so a True probed at a
    short T must not bless a long-T program (the k2 failure that killed
    the TIMIT f32 epoch run at device compile, tpu_r5_epoch_cold.log)."""
    calls, _, _w = _fresh(tmp_path, monkeypatch,
                          lambda ch: True)  # probe accepts everything
    assert vp.ensure_validated(32, 128, 128, 56, jnp.float32,
                               verbose=False) == 16
    # the T=32 verdict must NOT apply at T=752: unprobed -> None, and
    # pick_chunk falls back to the conservative analytic model (4 for f32)
    assert vp.lookup_chunk(752, 128, 128, 56, jnp.float32) is None
    assert lc.pick_chunk(752, 128, 128, 56, jnp.float32) == 4
    # probing at the real T records its own point (fresh compiles)
    calls.clear()
    assert vp.ensure_validated(752, 128, 128, 56, jnp.float32,
                               verbose=False) == 16
    assert calls == [16]
    assert vp.lookup_chunk(752, 128, 128, 56, jnp.float32) == 16
    # and the probe compiled AT the caller's T, not a fixed short one
    seen_T = []
    monkeypatch.setattr(
        vp, "_probe_compile",
        lambda hp, pp, bp, ch, dt, carry=False, T=0:
            seen_T.append(T) or True)
    vp.ensure_validated(1504, 128, 128, 56, jnp.float32, verbose=False)
    assert seen_T == [1504]


def test_ensure_validated_total_overflow_returns_zero(tmp_path, monkeypatch):
    calls, _, _w = _fresh(tmp_path, monkeypatch, lambda ch: False)
    assert vp.ensure_validated(16, 2048, 2048, 64, jnp.float32,
                               verbose=False) == 0
    assert calls == [16, 8, 4, 2, 1]
    # no positive verdict -> pick_chunk falls back to the analytic model
    assert vp.lookup_chunk(16, 2048, 2048, 64, jnp.float32) is None


def test_chunk_override_forces_pick(monkeypatch):
    monkeypatch.setattr(lc, "_chunk_override", 4)
    assert lc.pick_chunk(64, 128, 128, 8, jnp.bfloat16) == 4


def test_pick_chunk_analytic_unchanged_without_verdicts(tmp_path, monkeypatch):
    _fresh(tmp_path, monkeypatch, lambda ch: True)
    # without device verdicts the analytic model decides (conservative:
    # smaller chunks than the device-validated optima — the probe exists
    # precisely to recover the difference on real hardware)
    assert lc.pick_chunk(512, 256, 128, 64, jnp.bfloat16) == 8
    assert lc.pick_chunk(512, 256, 128, 56, jnp.float32) == 1
    # a device verdict (at this T's grid size) overrides the model upward
    vp._load()[vp._key(256, 128, 64, 16, jnp.bfloat16,
                       nc=512 // 16)] = True
    assert lc.pick_chunk(512, 256, 128, 64, jnp.bfloat16) == 16


def test_known_unfit_reflects_recorded_total_overflow(tmp_path, monkeypatch):
    _fresh(tmp_path, monkeypatch, lambda ch: False)
    # unprobed point: not known-unfit (analytic model keeps deciding)
    assert not vp.known_unfit(16, 2048, 2048, 64, jnp.float32)
    vp.ensure_validated(16, 2048, 2048, 64, jnp.float32, verbose=False)
    assert vp.known_unfit(16, 2048, 2048, 64, jnp.float32)
    # the verdict is per-T: another T stays unprobed
    assert not vp.known_unfit(512, 2048, 2048, 64, jnp.float32)


def test_known_unfit_false_when_some_chunk_fits(tmp_path, monkeypatch):
    _fresh(tmp_path, monkeypatch, lambda ch: ch <= 4)
    vp.ensure_validated(16, 512, 128, 8, jnp.float32, verbose=False)
    assert not vp.known_unfit(16, 512, 128, 8, jnp.float32)


def test_auto_backend_honors_negative_device_verdict(tmp_path, monkeypatch):
    """A recorded no-chunk-fits verdict must route lstm_forward's auto path
    to lax.scan even when the analytic model says the kernel fits — on a
    real device the analytic optimism ends in an opaque Mosaic scoped-vmem
    compile error (VERDICT r2 'probe exists for this' case)."""
    import numpy as np

    import jax

    from lstm_rnn_tpu.models.lstm import lstm_forward
    from lstm_rnn_tpu.ops.masking import pattypes_from_lengths

    _fresh(tmp_path, monkeypatch, lambda ch: False)
    T, B, P, h = 9, 3, 5, 10
    g = np.random.default_rng(0)
    params = {
        "W_in": jnp.asarray(g.uniform(-1, 1, (1, P, 4, h)), jnp.float32),
        "W_rec": jnp.asarray(g.uniform(-1, 1, (1, h, 4, h)), jnp.float32),
        "b": jnp.asarray(g.uniform(-1, 1, (1, 4, h)), jnp.float32),
        "peep": jnp.asarray(g.uniform(-1, 1, (1, 3, h)), jnp.float32),
    }
    x = jnp.asarray(g.uniform(-1, 1, (T, B, P)), jnp.float32)
    pt = jnp.asarray(pattypes_from_lengths([9, 4, 7], T, B))
    y_scan = lstm_forward(params, x, pt, 1.0, False, backend="scan")

    # the auto path's key for this layer: hp=128, pp=128, bp=8, tp=16 (f32)
    vp.ensure_validated(16, 128, 128, 8, jnp.float32, verbose=False)
    assert vp.known_unfit(16, 128, 128, 8, jnp.float32)
    # pretend we're on a TPU: without the verdict check, auto would pick
    # the real (non-interpret) pallas kernel, which cannot lower on CPU
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    y_auto = lstm_forward(params, x, pt, 1.0, False, backend="auto")
    np.testing.assert_allclose(np.asarray(y_auto), np.asarray(y_scan),
                               rtol=0, atol=0)


def test_shipped_defaults_match_current_key_format(monkeypatch):
    """The packaged verdicts must be keyed for the CURRENT kernel version —
    stale keys silently never match and every fresh machine re-pays the
    probe compiles (minutes each on the single-client tunnel). A
    KERNEL_VERSION bump must come with regenerated defaults."""
    import json
    import os

    path = os.path.join(os.path.dirname(vp.__file__),
                        "vmem_probe_defaults.json")
    table = json.load(open(path))
    assert table, "defaults file must not be empty"
    # chunk/carry keys: "|k3|"; mask keys: "|k3m1|mask|"; tail-family
    # keys (tail/tailproj/tailwide): "|t1|"
    assert all(f"|{vp.KERNEL_VERSION}|" in k
               or f"|{vp.KERNEL_VERSION}{vp.MASK_VERSION}|" in k
               or f"|{vp.TAIL_VERSION}|" in k
               for k in table), (
        "every shipped verdict must carry its family's current version")
    # the flagship shape points must resolve through _key on the device
    # kind they were probed on
    monkeypatch.setattr(vp, "_device_kind", lambda: "TPU_v5_lite")
    monkeypatch.setattr(vp, "_MEM", None)
    monkeypatch.setenv("LSTM_RNN_TPU_PROBE_CACHE", "/nonexistent/probe.json")
    # bench bf16 point (T=512 -> nc=32): device-measured c16
    assert vp.lookup_chunk(512, 128, 128, 64, jnp.bfloat16) == 16
    # the TIMIT f32 corpus point (T=752): c16 overflows at nc=47 (the k2
    # regression), c8 validated
    assert vp.lookup_chunk(752, 128, 128, 56, jnp.float32) == 8
    # carry family (SP block scans): the corpus split 2 ways (T=384)
    assert vp.lookup_chunk(384, 128, 128, 64, jnp.bfloat16, carry=True) == 16
    # tail families: flagship proj rows are DTYPE-specific on device
    # (bf16 r1024; f32 r1024 overflowed, r512 validated), the LVCSR proj
    # point records the full False ladder (forcing the wide route with
    # no first-use probes), and the wide (SB, rows) point is validated
    assert vp.lookup_tail_rows(2048, 512, 256, jnp.bfloat16,
                               proj=True) == 1024
    assert vp.lookup_tail_rows(2048, 512, 256, jnp.float32,
                               proj=True) == 512
    assert vp.tail_known_unfit(512, 10240, jnp.bfloat16, proj=True)
    assert vp.lookup_wide_blocks(512, jnp.bfloat16) == (1024, 256)
    # the REAL recipe fan-in is P=256 (BLSTM(250) pads per direction):
    # flagship proj r1024 in every mode; LVCSR proj FITS at r32 in bf16
    # (prefer_proj_tail routes wide anyway — fitting is not winning) and
    # is unfit in f32; wide validated at (1024, 256)
    assert vp.lookup_tail_rows(2048, 256, 256, jnp.bfloat16,
                               proj=True) == 1024
    assert vp.lookup_tail_rows(2048, 256, 256, jnp.float32,
                               proj=True) == 1024
    assert vp.lookup_tail_rows(2048, 256, 10240, jnp.bfloat16,
                               proj=True) == 32
    assert vp.tail_known_unfit(256, 10240, jnp.float32, proj=True)
    assert vp.lookup_wide_blocks(256, jnp.bfloat16) == (1024, 256)
    # masked streaming: the raw carry_t=50 variant has its own verdict,
    # and the unidirectional serving width (h=250 -> 256) is covered
    assert vp._load().get(vp._mask_key(128, 128, 64, 16, jnp.bfloat16,
                                       nc=4, carry_t=50)) is True
    assert vp._load().get(vp._mask_key(256, 256, 64, 8, jnp.bfloat16,
                                       nc=8, carry_t=50)) is True


def test_trainer_probe_failure_seeds_unpadded_keys(tmp_path, monkeypatch):
    """When the padded-plan probe proves a layer unfit, Trainer init also
    records verdicts at the UNPADDED path's exact-width keys so
    lstm_forward's auto backend honors the device instead of the
    optimistic analytic model (the two key families differ: padded plans
    carry d*hp inter-layer widths, the exact path round_up(d*h, 128))."""
    import unittest.mock as um

    import jax

    from lstm_rnn_tpu.data.dataset import DataSet
    from lstm_rnn_tpu.network import Network
    from lstm_rnn_tpu.trainer import Trainer

    from .test_data import _write_classification_nc

    _fresh(tmp_path, monkeypatch, lambda ch: False)
    nc = str(tmp_path / "t.nc")
    _write_classification_nc(nc, [4, 4], in_size=3, num_labels=4, seed=1)
    layers = [
        {"name": "input", "type": "input", "size": 3},
        # h=150: padded inter-layer width 512 (2*hp), exact 384
        {"name": "l1", "type": "blstm", "size": 300, "bias": 1.0},
        {"name": "l2", "type": "blstm", "size": 300, "bias": 1.0},
        {"name": "output", "type": "softmax", "size": 4, "bias": 1.0},
        {"name": "postoutput", "type": "multiclass_classification",
         "size": 4},
    ]
    net = Network(layers)
    net.init_params(3)
    ds = DataSet([nc], parallel_sequences=2, prefetch=False)
    with um.patch.object(jax, "default_backend", lambda: "tpu"):
        tr = Trainer(net, ds, device_cache=False)
    assert tr.padded is False
    # the toy corpus's padded-time inventory is [16]
    assert vp.known_unfit(16, 256, 128, 8, jnp.float32)  # padded-plan key
    assert vp.known_unfit(16, 256, 384, 8, jnp.float32)  # exact-path key


def test_trainer_probes_val_test_time_points(tmp_path, monkeypatch):
    """Trainer init must device-validate the validation/test sets'
    heaviest (batch, T) points too — their fractions dispatch the same
    fused kernels, and k3 verdicts are per-T — while a val-only
    rejection must NOT demote the padded view (the val pass is
    forward-only; only train-point rejections carry fwd+bwd weight)."""
    import unittest.mock as um

    import jax

    from lstm_rnn_tpu.data.dataset import DataSet
    from lstm_rnn_tpu.network import Network
    from lstm_rnn_tpu.trainer import Trainer

    from .test_data import _write_classification_nc

    _fresh(tmp_path, monkeypatch, lambda ch: True)
    probed = []

    def fake_probe(hp, pp, bp, ch, dt, carry=False, T=0):
        probed.append((T, bp, ch))
        return T < 48 or ch < 16  # reject c16 at the val-only T=48

    monkeypatch.setattr(vp, "_probe_compile", fake_probe)

    nc_tr = str(tmp_path / "tr.nc")
    nc_va = str(tmp_path / "va.nc")
    _write_classification_nc(nc_tr, [4, 4], in_size=3, num_labels=4, seed=1)
    _write_classification_nc(nc_va, [40, 40], in_size=3, num_labels=4,
                             seed=2)
    layers = [
        {"name": "input", "type": "input", "size": 3},
        {"name": "l1", "type": "blstm", "size": 300, "bias": 1.0},
        {"name": "output", "type": "softmax", "size": 4, "bias": 1.0},
        {"name": "postoutput", "type": "multiclass_classification",
         "size": 4},
    ]
    net = Network(layers)
    net.init_params(3)
    tr_ds = DataSet([nc_tr], parallel_sequences=2, prefetch=False)
    va_ds = DataSet([nc_va], parallel_sequences=2, prefetch=False)
    with um.patch.object(jax, "default_backend", lambda: "tpu"):
        tr = Trainer(net, tr_ds, va_ds, device_cache=False)
    # the train point (T=16) validated; the val rejection did not demote
    assert tr.padded is True
    assert vp.lookup_chunk(16, 256, 128, 8, jnp.float32) == 16
    # the val set's heaviest T (40 -> padded 48) was probed at its own
    # keys: c16 rejected, c8 validated — dispatch at T=48 now rides the
    # device verdict instead of the analytic model
    assert any(t == 48 for (t, _b, _c) in probed)
    assert vp.lookup_chunk(48, 256, 128, 8, jnp.float32) == 8


def test_tail_probe_descends_persists_and_overrides_rows(tmp_path,
                                                         monkeypatch):
    """ensure_tail_validated walks row candidates largest-first, persists
    verdicts, and the tail kernels' row pickers prefer the device verdict
    over the analytic cap — including upward (claw back grid overhead)."""
    from lstm_rnn_tpu.ops import softmax_ce as sc

    _, tail_calls, _w = _fresh(tmp_path, monkeypatch, lambda ch: True,
                           tail_accept=lambda rows: rows <= 512)
    # Sp=1536: analytic cap is 256 -> the walk starts at 4x that (1024)
    assert sc._row_block(32768, 1536, analytic_only=True) == 256
    rows = vp.ensure_tail_validated(0, 1536, jnp.float32, proj=False,
                                    verbose=False)
    assert rows == 512
    assert [r for (_p, _s, r, _pr) in tail_calls] == [1024, 512]

    # the row picker now returns the validated 512 instead of analytic 256
    assert sc._row_block(32768, 1536, store_dtype=jnp.float32) == 512
    # and shrinks it to divide N (monotone: smaller blocks always fit)
    assert sc._row_block(256 * 3, 1536, store_dtype=jnp.float32) == 256

    # persisted: a fresh in-memory table still sees it
    monkeypatch.setattr(vp, "_MEM", None)
    assert vp.lookup_tail_rows(32768, 0, 1536, jnp.float32,
                               proj=False) == 512


def test_tail_unfit_verdict_forces_proj_fallback(tmp_path, monkeypatch):
    """A recorded no-rows-fit verdict for the proj tail must flip
    proj_tail_fits to False even where the analytic model says it fits."""
    from lstm_rnn_tpu.ops import softmax_ce as sc

    _, tail_calls, _w = _fresh(tmp_path, monkeypatch, lambda ch: True,
                           tail_accept=lambda rows: False)
    # flagship point: analytic says fits
    assert sc.proj_tail_fits(32000, 512, 256, jnp.bfloat16)
    assert vp.ensure_tail_validated(512, 256, jnp.bfloat16, proj=True,
                                    verbose=False) == 0
    # the walk ended at rows=8, so the verdict is actionable
    assert tail_calls[-1][2] == 8
    assert vp.tail_known_unfit(512, 256, jnp.bfloat16, proj=True)
    assert not sc.proj_tail_fits(32000, 512, 256, jnp.bfloat16)


def test_compiles_overflow_classification():
    """Only a positively-identified Mosaic scoped-VMEM overflow may become
    a (persisted!) False verdict; a transient RPC error whose message
    merely contains 'exceeded' must re-raise instead of permanently
    forcing the fallback path on this machine (ADVICE r3)."""
    import pytest

    def raising(msg):
        def f():
            raise RuntimeError(msg)
        return f

    assert vp._compiles(
        raising("Mosaic failed: Scoped allocation of 20.5M exceeded "
                "the scoped vmem limit"), ()) is False
    assert vp._compiles(raising("program exceeds available VMEM"), ()) is False
    with pytest.raises(Exception, match="DEADLINE"):
        vp._compiles(raising("DEADLINE_EXCEEDED: rpc quota exceeded"), ())
    with pytest.raises(Exception, match="UNAVAILABLE"):
        vp._compiles(raising("UNAVAILABLE: connection reset"), ())


def test_trainer_eagerly_probes_fused_tail(tmp_path, monkeypatch):
    """Trainer init on a (faked) TPU with the fused tail engaged must
    record tail verdicts before the first step compiles: the proj point
    first, the plain tail only if proj came back unfit."""
    import unittest.mock as um

    import jax

    from lstm_rnn_tpu.data.dataset import DataSet
    from lstm_rnn_tpu.network import Network
    from lstm_rnn_tpu.trainer import Trainer

    from .test_data import _write_classification_nc

    _, tail_calls, _w = _fresh(tmp_path, monkeypatch, lambda ch: True,
                           tail_accept=lambda rows: False)
    nc = str(tmp_path / "t.nc")
    _write_classification_nc(nc, [4, 4], in_size=3, num_labels=4, seed=1)
    layers = [
        {"name": "input", "type": "input", "size": 3},
        {"name": "l1", "type": "blstm", "size": 8, "bias": 1.0},
        {"name": "output", "type": "softmax", "size": 4, "bias": 1.0},
        {"name": "postoutput", "type": "multiclass_classification",
         "size": 4},
    ]
    net = Network(layers)
    net.init_params(3)
    ds = DataSet([nc], parallel_sequences=2, prefetch=False)
    with um.patch.object(jax, "default_backend", lambda: "tpu"):
        Trainer(net, ds, device_cache=False)
    # padded plan: blstm h=4 -> hp=128, softmax fan-in 256; Sp=128
    proj_points = [(p, s) for (p, s, _r, pr) in tail_calls if pr]
    plain_points = [(p, s) for (p, s, _r, pr) in tail_calls if not pr]
    assert (256, 128) in proj_points
    assert (0, 128) in plain_points  # proj unfit -> plain tail probed


def test_wide_probe_descends_and_gates_wide_plan(tmp_path, monkeypatch):
    """ensure_wide_validated walks (SB, rows) candidates best-first
    (analytic pick, a clawback step above, then the descending ladder),
    persists verdicts, and wide_plan prefers the device verdict; a total
    failure flips wide_known_unfit so wide_plan raises (the network then
    falls back to materialized logits + the plain tail)."""
    import jax.numpy as jnp

    from lstm_rnn_tpu.ops import softmax_ce as sc

    _, _, wide_calls = _fresh(tmp_path, monkeypatch, lambda ch: True,
                              wide_accept=lambda sb, rows: sb <= 512)
    # P=512 f32: analytic pick
    sb0, rows0 = sc._wide_analytic(512, jnp.float32)
    got = vp.ensure_wide_validated(512, jnp.float32, verbose=False)
    assert got[0] <= 512
    assert wide_calls[0][1] in (sb0, sb0)  # probing starts at the pick/claw
    # wide_plan now returns the validated blocks
    spw, sb, rows = sc.wide_plan(32768, 512, 10112, jnp.float32)
    assert (sb, rows) == got and spw % sb == 0

    # persisted: a fresh in-memory table still sees it
    monkeypatch.setattr(vp, "_MEM", None)
    assert vp.lookup_wide_blocks(512, jnp.float32) == got

    # a recorded FORWARD total-unfit at the wide padded width Spw gates
    # routing too: the wide forward is the plain row-blocked tail at Spw,
    # so a probe that proved no row block fits there must stop wide_plan
    # from routing wide even though the backward (SB, rows) verdict is
    # positive (trainer.py's wide_ok demotion relies on this)
    import pytest
    assert vp.ensure_tail_validated(0, spw, jnp.float32, proj=False,
                                    verbose=False) == 0
    assert vp.tail_known_unfit(0, spw, jnp.float32, proj=False)
    with pytest.raises(ValueError, match="forward row block"):
        sc.wide_plan(32768, 512, 10112, jnp.float32)

    # a total-failure point records unfit and wide_plan raises
    _, _, wide_calls = _fresh(tmp_path, monkeypatch, lambda ch: True,
                              wide_accept=lambda sb, rows: False)
    assert vp.ensure_wide_validated(768, jnp.float32, verbose=False) is None
    assert wide_calls[-1] == (768, 128, 8)
    assert vp.wide_known_unfit(768, jnp.float32)
    with pytest.raises(ValueError, match="wide softmax tail"):
        sc.wide_plan(32768, 768, 10112, jnp.float32)


def test_trainer_probes_wide_point_when_proj_unfit(tmp_path, monkeypatch):
    """Trainer init on a (faked) TPU with a wide softmax must validate the
    wide tail's (SB, rows) point when the proj probe came back unfit."""
    import unittest.mock as um

    import jax

    from lstm_rnn_tpu.data.dataset import DataSet
    from lstm_rnn_tpu.network import Network
    from lstm_rnn_tpu.trainer import Trainer

    from .test_data import _write_classification_nc

    _, tail_calls, wide_calls = _fresh(
        tmp_path, monkeypatch, lambda ch: True,
        tail_accept=lambda rows: False,
        wide_accept=lambda sb, rows: True)
    nc = str(tmp_path / "t.nc")
    _write_classification_nc(nc, [4, 4], in_size=3, num_labels=4, seed=1)
    layers = [
        {"name": "input", "type": "input", "size": 3},
        {"name": "l1", "type": "blstm", "size": 8, "bias": 1.0},
        {"name": "output", "type": "softmax", "size": 4, "bias": 1.0},
        {"name": "postoutput", "type": "multiclass_classification",
         "size": 4},
    ]
    net = Network(layers)
    net.init_params(3)
    ds = DataSet([nc], parallel_sequences=2, prefetch=False)
    with um.patch.object(jax, "default_backend", lambda: "tpu"):
        Trainer(net, ds, device_cache=False)
        # RERUN with the forward total-unfit already recorded: wide_plan
        # now raises at the spw computation — Trainer must demote to the
        # unfused tail, not die in __init__
        Trainer(net, ds, device_cache=False)
    # padded plan: softmax fan-in 256; proj unfit -> wide point probed
    assert any(p == 256 for (p, _s, _r) in wide_calls)
    # wide validated -> the PLAIN tail (the wide forward) is probed at the
    # wide plan's padded width so its row cap gets the device clawback.
    # (wide_plan itself now RAISES here — the all-rejecting tail probe
    # recorded a forward total-unfit at spw, which correctly gates wide
    # routing — so derive spw from the recorded wide verdict instead.)
    sb = vp.lookup_wide_blocks(256, jnp.float32)[0]
    spw = -(-4 // sb) * sb
    assert any(s == spw for (_p, s, _r, pr) in tail_calls if not pr)


def test_mask_probe_accepts_streaming_layout_via_tpu_lowering(tmp_path,
                                                              monkeypatch):
    """The REAL mask probe (no fakes): cross-platform lowering runs the
    full Pallas->Mosaic TPU lowering pass on a CPU host, so the (8,128)
    tile/lane layout rules — the check round 4's device run died on with
    an unpadded (B, CH) mask block — are enforced for real. The shipped
    lane-padded (NC, B, CHP) layout must pass them at both chunk sizes the
    serving path picks."""
    monkeypatch.setenv("LSTM_RNN_TPU_PROBE_CACHE", str(tmp_path / "p.json"))
    monkeypatch.setattr(vp, "_MEM", None)
    assert vp._mask_probe_compile(128, 128, 8, 16, jnp.float32)
    assert vp._mask_probe_compile(128, 128, 16, 16, jnp.bfloat16)


def test_mask_compiles_rejects_lane_misaligned_block():
    """The probe's classifier must turn the round-4 failure class — a
    block whose minor dim is neither a 128-multiple nor the full array
    dim, rejected by the Pallas TPU lowering pass — into a False verdict
    (routing streaming to the scan backend) instead of re-raising it as a
    transient error."""
    import jax
    from jax.experimental import pallas as pl

    def kern(x_ref, o_ref):
        o_ref[...] = x_ref[...] * 2.0

    def f(x):
        # round 4's shape: block (B=64, CH=16) over a (B, T=64) array
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((64, 64), jnp.float32),
            grid=(4,),
            in_specs=[pl.BlockSpec((64, 16), lambda i: (0, i))],
            out_specs=pl.BlockSpec((64, 16), lambda i: (0, i)),
        )(x)

    shapes = (jax.ShapeDtypeStruct((64, 64), jnp.float32),)
    assert vp._mask_compiles(f, shapes) is False


def test_mask_unfit_verdict_routes_streaming_to_scan(tmp_path, monkeypatch):
    """A recorded mask-probe rejection must route apply_streaming's auto
    path to the scan backend (numerics identical) and make an explicit
    pallas request raise — mirroring _resolve_fused's own guards."""
    import numpy as np

    import jax

    from lstm_rnn_tpu.models.lstm import lstm_forward_streaming
    from lstm_rnn_tpu.ops.masking import pattypes_from_lengths

    monkeypatch.setenv("LSTM_RNN_TPU_PROBE_CACHE", str(tmp_path / "p.json"))
    monkeypatch.setattr(vp, "_MEM", None)
    monkeypatch.setattr(vp, "_device_kind", lambda: "fake_tpu")
    monkeypatch.setattr(vp, "_mask_probe_compile",
                        lambda hp, pp, bp, ch, dt, T=0, carry_t=0: False)

    T, B, P, h = 9, 3, 5, 10
    g = np.random.default_rng(0)
    params = {
        "W_in": jnp.asarray(g.uniform(-1, 1, (1, P, 4, h)), jnp.float32),
        "W_rec": jnp.asarray(g.uniform(-1, 1, (1, h, 4, h)), jnp.float32),
        "b": jnp.asarray(g.uniform(-1, 1, (1, 4, h)), jnp.float32),
        "peep": jnp.asarray(g.uniform(-1, 1, (1, 3, h)), jnp.float32),
    }
    x = jnp.asarray(g.uniform(-1, 1, (T, B, P)), jnp.float32)
    pt = jnp.asarray(pattypes_from_lengths([9, 4, 7], T, B))
    carry = (jnp.zeros((1, B, h)), jnp.zeros((1, B, h)))
    y_scan, c_scan = lstm_forward_streaming(params, x, pt, 1.0, carry,
                                            backend="scan")

    # the serving point: hp=128, pp=128, bp=8 (f32), tp=16
    from lstm_rnn_tpu.ops.lstm_cell import DEFAULT_CHUNK, pick_chunk
    tp = -(-T // DEFAULT_CHUNK) * DEFAULT_CHUNK
    ch = pick_chunk(tp, 128, 128, 8, jnp.float32, with_mask=True)
    # carry_t = the RAW chunk length (9 != tp=16): the eager gate must
    # record the verdict at the same carry_t-variant key the dispatch
    # gate reads (lstm_forward_streaming passes carry_t=x.shape[0])
    assert vp.ensure_mask_validated(tp, 128, 128, 8, jnp.float32,
                                    verbose=False, carry_t=T) == 0
    assert vp.mask_known_unfit(tp, 128, 128, 8, ch, jnp.float32,
                               carry_t=T)

    # pretend we're on a TPU: without the verdict check, auto would pick
    # the real (non-interpret) masked kernel, which cannot lower on CPU
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    y_auto, c_auto = lstm_forward_streaming(params, x, pt, 1.0, carry,
                                            backend="auto")
    np.testing.assert_allclose(np.asarray(y_auto), np.asarray(y_scan),
                               rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(c_auto[0]), np.asarray(c_scan[0]),
                               rtol=0, atol=0)

    import pytest
    with pytest.raises(ValueError, match="REJECTED by the device probe"):
        lstm_forward_streaming(params, x, pt, 1.0, carry, backend="pallas")


def test_mask_carry_t_variant_has_own_key(tmp_path, monkeypatch):
    """A --stream_chunk that is not a 16-multiple dispatches the masked
    kernel with carry_t = the RAW chunk length — a different static
    program than the carry_t == T variant. Verdicts must not leak
    between the two, and carry_t == T must collapse to the suffix-free
    key so the shipped k3m1 defaults keep matching."""
    import jax.numpy as jnp

    from lstm_rnn_tpu.ops.lstm_cell import pick_chunk

    monkeypatch.setenv("LSTM_RNN_TPU_PROBE_CACHE", str(tmp_path / "p.json"))
    monkeypatch.setattr(vp, "_MEM", None)
    monkeypatch.setattr(vp, "_device_kind", lambda: "fake_tpu")
    seen = []

    def fake(hp, pp, bp, ch, dt, T=0, carry_t=0):
        seen.append(carry_t)
        return carry_t != 9  # reject only the raw-9 variant

    monkeypatch.setattr(vp, "_mask_probe_compile", fake)
    ch = pick_chunk(16, 128, 128, 8, jnp.float32, with_mask=True)
    # carry_t == T normalizes to the suffix-free key (probe sees 0)
    assert vp.ensure_mask_validated(16, 128, 128, 8, jnp.float32,
                                    verbose=False, carry_t=16) == ch
    assert seen == [0]
    # the raw-9 variant is its own point: unprobed (False), then its own
    # probe records the rejection — without poisoning the T-variant
    assert not vp.mask_known_unfit(16, 128, 128, 8, ch, jnp.float32,
                                   carry_t=9)
    assert vp.ensure_mask_validated(16, 128, 128, 8, jnp.float32,
                                    verbose=False, carry_t=9) == 0
    assert vp.mask_known_unfit(16, 128, 128, 8, ch, jnp.float32,
                               carry_t=9)
    assert not vp.mask_known_unfit(16, 128, 128, 8, ch, jnp.float32,
                                   carry_t=16)
    assert seen == [0, 9]


def test_carry_family_keys_are_separate(tmp_path, monkeypatch):
    """The carry-kernel gradient (sequence-parallel training) has a larger
    backward footprint than the plain kernels — its verdicts live in their
    own key family. A carry-less verdict at the VMEM edge must NOT be
    reused for carry picks, and vice versa (VERDICT r3 follow-up: the SP
    wavefront differentiates lstm_scan_fused_carry)."""
    import jax.numpy as jnp

    from lstm_rnn_tpu.ops.lstm_cell import fused_vmem_bytes, pick_chunk

    monkeypatch.setenv("LSTM_RNN_TPU_PROBE_CACHE", str(tmp_path / "p.json"))
    monkeypatch.setattr(vp, "_MEM", None)
    monkeypatch.setattr(vp, "_device_kind", lambda: "fake_tpu")
    seen = []

    def fake_probe(hp, pp, bp, ch, dt, carry=False, T=0):
        seen.append((ch, carry))
        return not carry and ch <= 8  # plain fits at 8; carry never fits

    monkeypatch.setattr(vp, "_probe_compile", fake_probe)

    assert vp.ensure_validated(16, 256, 128, 16, jnp.float32) == 8
    assert (16, False) in seen and (8, False) in seen
    # the plain verdict must not leak into the carry family
    assert vp.lookup_chunk(16, 256, 128, 16, jnp.float32, carry=True) is None
    assert vp.ensure_validated(16, 256, 128, 16, jnp.float32,
                               carry=True) == 0
    assert (1, True) in seen
    assert vp.known_unfit(16, 256, 128, 16, jnp.float32, carry=True)
    assert not vp.known_unfit(16, 256, 128, 16, jnp.float32)  # plain ok
    # pick_chunk(carry=True) sees no carry verdict -> analytic model with
    # the extra carry blocks (strictly larger estimate)
    assert fused_vmem_bytes(256, 128, 16, jnp.float32, 4, carry=True) > \
        fused_vmem_bytes(256, 128, 16, jnp.float32, 4)
    assert pick_chunk(16, 256, 128, 16, jnp.float32) == 8  # plain verdict
