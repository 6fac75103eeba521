"""Fused multi-fraction training must equal per-fraction training exactly."""

import numpy as np
import pytest

from lstm_rnn_tpu.data.dataset import DataSet
from lstm_rnn_tpu.network import Network
from lstm_rnn_tpu.trainer import Trainer

from .conftest import requires_reference

NC = "/root/reference/examples/speech_recognition_chime/val_1_speaker.nc"
NET = "/root/reference/tests/test1/network.jsn"


@requires_reference
def test_fused_equals_unfused():
    # bucketing makes fraction shapes repeat so groups actually form
    ds = DataSet([NC], parallel_sequences=8, fraction=0.3,
                 sort_by_length=True, prefetch=False, bucket_lengths=True)
    net1 = Network.from_json_file(NET)
    t1 = Trainer(net1, ds, learning_rate=1e-5, momentum=0.9, max_epochs=2,
                 hybrid_online_batch=True)
    while not t1.train_epoch():
        pass

    net2 = Network.from_json_file(NET)
    t2 = Trainer(net2, ds, learning_rate=1e-5, momentum=0.9, max_epochs=2,
                 hybrid_online_batch=True, fuse_fractions=4)
    while not t2.train_epoch():
        pass

    assert t1.cur_training_error == pytest.approx(t2.cur_training_error, rel=1e-6)
    assert t1.cur_training_class_error == t2.cur_training_class_error
    for name in t1.params:
        for kk in t1.params[name]:
            np.testing.assert_allclose(
                np.asarray(t1.params[name][kk]), np.asarray(t2.params[name][kk]),
                rtol=1e-6, atol=1e-8, err_msg=f"{name}.{kk}")


@requires_reference
def test_weight_noise_training():
    """Weight noise: gradients at the noisy point, update applied to clean
    weights; in the padded pipeline the noise must be masked so padded
    entries stay exactly zero."""
    ds = DataSet([NC], parallel_sequences=4, fraction=0.08,
                 sort_by_length=True, prefetch=False)
    net = Network.from_json_file(NET)
    net.backend = "pallas_interpret"
    t = Trainer(net, ds, learning_rate=1e-4, momentum=0.9, max_epochs=1,
                hybrid_online_batch=True, weight_noise_sigma=0.05,
                padded_pipeline=True, seed=3)
    assert t.padded and t._pad_mask is not None
    t.train_epoch()
    p = t.exact_params()
    assert all(np.isfinite(v).all() for lay in p.values() for v in lay.values())
    # padded entries still exactly zero despite the injected noise
    w_rec = np.asarray(t.params["blstm_level_0"]["W_rec"])
    assert float(np.abs(w_rec[:, 5:, :, :]).max()) == 0.0
    assert float(np.abs(w_rec[:, :, :, 5:]).max()) == 0.0
    # noise-free run differs (noise actually applied)
    net2 = Network.from_json_file(NET)
    net2.backend = "pallas_interpret"
    t2 = Trainer(net2, ds, learning_rate=1e-4, momentum=0.9, max_epochs=1,
                 hybrid_online_batch=True, padded_pipeline=True, seed=3)
    t2.train_epoch()
    p2 = t2.exact_params()
    diff = max(float(np.abs(p[k][kk] - p2[k][kk]).max())
               for k in p for kk in p[k])
    assert diff > 1e-7


@requires_reference
def test_padded_pipeline_equals_exact():
    """Training on the padded parameter view (pallas kernels, interpret mode
    on CPU) must match the exact-layout scan training."""
    ds = DataSet([NC], parallel_sequences=4, fraction=0.08,
                 sort_by_length=True, prefetch=False)
    net1 = Network.from_json_file(NET, clip_gradients=True)
    net1.backend = "scan"
    t1 = Trainer(net1, ds, learning_rate=1e-5, momentum=0.9, max_epochs=1,
                 hybrid_online_batch=True, padded_pipeline=False)
    t1.train_epoch()

    net2 = Network.from_json_file(NET, clip_gradients=True)
    net2.backend = "pallas_interpret"
    t2 = Trainer(net2, ds, learning_rate=1e-5, momentum=0.9, max_epochs=1,
                 hybrid_online_batch=True, padded_pipeline=True)
    assert t2.padded
    t2.train_epoch()

    assert t1.cur_training_error == pytest.approx(t2.cur_training_error, rel=1e-4)
    assert t1.cur_training_class_error == t2.cur_training_class_error
    p1 = t1.exact_params()
    p2 = t2.exact_params()
    for name in p1:
        for kk in p1[name]:
            np.testing.assert_allclose(
                p2[name][kk], p1[name][kk], rtol=1e-4, atol=1e-6,
                err_msg=f"{name}.{kk}")
    # padded entries must be exactly zero after the update
    for name, leafs in t2.params.items():
        for kk, v in leafs.items():
            if kk == "W_rec":
                assert float(np.abs(np.asarray(v)[:, 5:, :, :]).max()) == 0.0


@requires_reference
def test_device_cache_equals_uncached():
    """The device-resident fraction cache must be numerically invisible:
    2 epochs (with fraction shuffling re-ordering the cached fractions)
    produce identical results, and epoch 2 hits the cache only."""
    ds = DataSet([NC], parallel_sequences=6, fraction=0.2,
                 sort_by_length=True, prefetch=False, fraction_shuffling=True,
                 seed=7)
    net1 = Network.from_json_file(NET)
    t1 = Trainer(net1, ds, learning_rate=1e-4, momentum=0.9, max_epochs=2,
                 hybrid_online_batch=True, device_cache=False)
    while not t1.train_epoch():
        pass

    ds2 = DataSet([NC], parallel_sequences=6, fraction=0.2,
                  sort_by_length=True, prefetch=False, fraction_shuffling=True,
                  seed=7)
    net2 = Network.from_json_file(NET)
    t2 = Trainer(net2, ds2, learning_rate=1e-4, momentum=0.9, max_epochs=2,
                 hybrid_online_batch=True, device_cache=True)
    t2.train_epoch()
    n_entries = len(t2._dev_cache)
    assert n_entries > 0 and t2._dev_cache_bytes > 0
    t2.train_epoch()
    assert len(t2._dev_cache) == n_entries  # epoch 2: pure cache hits

    assert t1.cur_training_error == pytest.approx(t2.cur_training_error,
                                                  rel=1e-6)
    for name in t1.params:
        for kk in t1.params[name]:
            np.testing.assert_allclose(
                np.asarray(t1.params[name][kk]), np.asarray(t2.params[name][kk]),
                rtol=1e-6, atol=1e-8, err_msg=f"{name}.{kk}")


@requires_reference
def test_device_cache_fused_and_noise_gate():
    """Cache + fuse_fractions compose (device-side stacking); input-noise
    datasets are never cached (fractions differ per epoch)."""
    ds = DataSet([NC], parallel_sequences=6, fraction=0.2,
                 sort_by_length=True, prefetch=False, bucket_lengths=True)
    net1 = Network.from_json_file(NET)
    t1 = Trainer(net1, ds, learning_rate=1e-4, momentum=0.9, max_epochs=1,
                 hybrid_online_batch=True, device_cache=False)
    t1.train_epoch()

    net2 = Network.from_json_file(NET)
    t2 = Trainer(net2, ds, learning_rate=1e-4, momentum=0.9, max_epochs=1,
                 hybrid_online_batch=True, device_cache=True, fuse_fractions=2)
    t2.train_epoch()
    assert len(t2._dev_cache) > 0
    assert t1.cur_training_error == pytest.approx(t2.cur_training_error,
                                                  rel=1e-6)
    for name in t1.params:
        for kk in t1.params[name]:
            np.testing.assert_allclose(
                np.asarray(t1.params[name][kk]), np.asarray(t2.params[name][kk]),
                rtol=1e-6, atol=1e-8, err_msg=f"{name}.{kk}")

    dsn = DataSet([NC], parallel_sequences=6, fraction=0.1,
                  sort_by_length=True, prefetch=False, noise_deviation=0.1)
    net3 = Network.from_json_file(NET)
    t3 = Trainer(net3, dsn, learning_rate=1e-4, momentum=0.9, max_epochs=1,
                 hybrid_online_batch=True, device_cache=True)
    t3.train_epoch()
    assert len(t3._dev_cache) == 0  # noise-augmented data never cached


def test_stacked_epoch_with_shuffled_perm_matches_unfused(tmp_path):
    """Single-shape cacheable corpus + fuse >= fraction count: the whole
    pass runs as ONE fori_loop over an epoch-resident stacked corpus, with
    per-epoch fraction shuffling replayed through the permutation vector —
    results must equal per-fraction training exactly."""
    from .test_data import _write_classification_nc

    tr = str(tmp_path / "tr.nc")
    _write_classification_nc(tr, [8] * 12, in_size=3, num_labels=4, seed=2)
    layers = [
        {"name": "input", "type": "input", "size": 3},
        {"name": "l1", "type": "blstm", "size": 4, "bias": 1.0},
        {"name": "output", "type": "softmax", "size": 4, "bias": 1.0},
        {"name": "postoutput", "type": "multiclass_classification", "size": 4},
    ]

    def make(fuse, cache):
        ds = DataSet([tr], parallel_sequences=3, sort_by_length=True,
                     prefetch=False, fraction_shuffling=True, seed=11)
        net = Network(layers)
        net.init_params(5)
        return Trainer(net, ds, learning_rate=1e-3, momentum=0.9,
                       max_epochs=3, hybrid_online_batch=True,
                       fuse_fractions=fuse, device_cache=cache)

    t1 = make(1, False)
    while not t1.train_epoch():
        pass

    t2 = make(8, True)
    while not t2.train_epoch():
        pass
    assert len(t2._stacked) == 1  # the epoch-resident stack engaged
    st = t2.device_cache_stats()
    assert st["hits"] == 4 and st["misses"] == 0  # the last epoch replayed
    # the stack via the perm vector only (stats reset per epoch)
    assert len(t2._dev_cache) == 0  # per-fraction entries superseded

    assert t1.cur_training_error == pytest.approx(t2.cur_training_error,
                                                  rel=1e-6)
    assert t1.cur_training_class_error == t2.cur_training_class_error
    for name in t1.params:
        for kk in t1.params[name]:
            np.testing.assert_allclose(
                np.asarray(t1.params[name][kk]),
                np.asarray(t2.params[name][kk]),
                rtol=1e-6, atol=1e-8, err_msg=f"{name}.{kk}")


def test_stacked_epoch_multi_bucket_matches_unfused(tmp_path, monkeypatch):
    """Multi-bucket corpus with a PARTIAL last fraction: per-shape resident
    stacks engage (one fori_loop per bucket run, bucket-major shuffle makes
    one run per bucket) and match per-fraction training exactly. The partial
    fraction used to break this entirely: fraction_meta reported its true
    sequence count as the batch dim while the materialized fraction always
    has parallel_sequences columns, so the lazy shape set was never
    uniform."""
    from .test_data import _write_classification_nc

    tr = str(tmp_path / "tr.nc")
    # lengths span two buckets (16 and 24); 11 seqs / 3 per fraction ->
    # 4 fractions, the last with 2 sequences
    _write_classification_nc(tr, [8] * 5 + [20] * 6, in_size=3, num_labels=4,
                             seed=2)
    layers = [
        {"name": "input", "type": "input", "size": 3},
        {"name": "l1", "type": "blstm", "size": 4, "bias": 1.0},
        {"name": "output", "type": "softmax", "size": 4, "bias": 1.0},
        {"name": "postoutput", "type": "multiclass_classification", "size": 4},
    ]

    def make(fuse, cache):
        ds = DataSet([tr], parallel_sequences=3, sort_by_length=True,
                     prefetch=False, fraction_shuffling=True, seed=11,
                     bucket_lengths=True)
        net = Network(layers)
        net.init_params(5)
        return Trainer(net, ds, learning_rate=1e-3, momentum=0.9,
                       max_epochs=3, hybrid_online_batch=True,
                       fuse_fractions=fuse, device_cache=cache)

    t1 = make(1, False)
    while not t1.train_epoch():
        pass

    # deterministic accounting: compile synchronously at first dispatch
    # (the background-compile decline path has its own test,
    # test_stacked_nonblocking_warm_compile)
    monkeypatch.setattr(Trainer, "_spawn_warm_compile",
                        lambda self, stacks, update: None)
    t2 = make(8, True)
    while not t2.train_epoch():
        pass
    assert len(t2._stacked) == 1
    entry = next(iter(t2._stacked.values()))
    assert len(entry["shapes"]) == 2  # one resident stack per bucket
    st = t2.device_cache_stats()
    assert st["hits"] == 4 and st["misses"] == 0
    assert len(t2._dev_cache) == 0  # per-fraction entries superseded

    assert t1.cur_training_error == pytest.approx(t2.cur_training_error,
                                                  rel=1e-6)
    assert t1.cur_training_class_error == t2.cur_training_class_error
    for name in t1.params:
        for kk in t1.params[name]:
            np.testing.assert_allclose(
                np.asarray(t1.params[name][kk]),
                np.asarray(t2.params[name][kk]),
                rtol=1e-6, atol=1e-8, err_msg=f"{name}.{kk}")


def test_grouped_stack_byte_cap_matches_unfused(tmp_path, monkeypatch):
    """MAX_GROUP_STACK_BYTES caps the on-device stack width of the
    grouped-flush path (the remote-TPU runtime kills any single program
    whose operands + output cross ~1 GiB with RESOURCE_EXHAUSTED): with a
    shrunk cap, groups flush at the capped pow2 width and results still
    equal per-fraction training exactly."""
    from .test_data import _write_classification_nc

    tr = str(tmp_path / "tr.nc")
    _write_classification_nc(tr, [8] * 12, in_size=3, num_labels=4, seed=2)
    layers = [
        {"name": "input", "type": "input", "size": 3},
        {"name": "l1", "type": "blstm", "size": 4, "bias": 1.0},
        {"name": "output", "type": "softmax", "size": 4, "bias": 1.0},
        {"name": "postoutput", "type": "multiclass_classification", "size": 4},
    ]

    def make(fuse):
        ds = DataSet([tr], parallel_sequences=3, sort_by_length=True,
                     prefetch=False, seed=11)
        net = Network(layers)
        net.init_params(5)
        # device_cache=False disqualifies the epoch-resident stacked path,
        # forcing the grouped-flush path the cap protects
        return Trainer(net, ds, learning_rate=1e-3, momentum=0.9,
                       max_epochs=2, hybrid_online_batch=True,
                       fuse_fractions=fuse, device_cache=False)

    t1 = make(1)
    while not t1.train_epoch():
        pass

    # per-fraction bytes as SHIPPED (_pad_fraction rounds T up to the
    # 16-step kernel chunk; inputs f32 + int32 class target + pattype
    # byte): Tpad=16 x Bpad=8 x (3*4 + 4 + 1) = 2176; cap the stack at
    # 2x2176 so group_width clamps 8 -> 2
    monkeypatch.setattr(Trainer, "MAX_GROUP_STACK_BYTES", 2 * 2176)
    widths = []
    orig = Trainer._stack_parts

    def spy(self, parts):
        widths.append(len(parts))
        return orig(self, parts)

    monkeypatch.setattr(Trainer, "_stack_parts", spy)
    t2 = make(8)
    while not t2.train_epoch():
        pass
    assert widths and set(widths) == {2}  # every stack built at the cap

    assert t1.cur_training_error == pytest.approx(t2.cur_training_error,
                                                  rel=1e-6)
    assert t1.cur_training_class_error == t2.cur_training_class_error
    for name in t1.params:
        for kk in t1.params[name]:
            np.testing.assert_allclose(
                np.asarray(t1.params[name][kk]),
                np.asarray(t2.params[name][kk]),
                rtol=1e-6, atol=1e-8, err_msg=f"{name}.{kk}")


def test_stacked_epoch_builds_on_host(tmp_path, monkeypatch):
    """Single-process epoch-resident stacks must be built on the HOST and
    shipped as one device_put per stack (_put_stacked) — never via an
    on-device stack over the whole corpus (_stack_parts), whose single
    program crosses the remote-TPU runtime's per-program resource cliff
    at production corpus sizes (128 x 11.3 MB fractions = RESOURCE_EXHAUSTED
    on device, while the same bytes device_put'd stream fine)."""
    from .test_data import _write_classification_nc

    tr = str(tmp_path / "tr.nc")
    _write_classification_nc(tr, [8] * 12, in_size=3, num_labels=4, seed=2)
    layers = [
        {"name": "input", "type": "input", "size": 3},
        {"name": "l1", "type": "blstm", "size": 4, "bias": 1.0},
        {"name": "output", "type": "softmax", "size": 4, "bias": 1.0},
        {"name": "postoutput", "type": "multiclass_classification", "size": 4},
    ]
    ds = DataSet([tr], parallel_sequences=3, sort_by_length=True,
                 prefetch=False, seed=11)
    net = Network(layers)
    net.init_params(5)
    t = Trainer(net, ds, learning_rate=1e-3, momentum=0.9, max_epochs=2,
                hybrid_online_batch=True, fuse_fractions=8, device_cache=True)

    # deterministic: compile synchronously at first dispatch so epoch 1
    # never mixes in grouped flushes (whose byte-capped on-device group
    # stacks legitimately call _stack_parts)
    monkeypatch.setattr(Trainer, "_spawn_warm_compile",
                        lambda self, stacks, update: None)
    puts, stacks = [], []
    orig_put = Trainer._put_stacked
    orig_stack = Trainer._stack_parts
    monkeypatch.setattr(Trainer, "_put_stacked",
                        lambda self, a: puts.append(a.shape) or orig_put(self, a))
    monkeypatch.setattr(Trainer, "_stack_parts",
                        lambda self, p: stacks.append(len(p)) or orig_stack(self, p))
    while not t.train_epoch():
        pass
    assert len(t._stacked) == 1  # the epoch-resident path engaged
    assert len(puts) == 3 and all(s[0] == 4 for s in puts)  # x/t/p, width 4
    assert stacks == []  # no on-device corpus stack program


def test_explicit_bucket_inventory(tmp_path):
    """An explicit --bucket_lengths inventory pads each fraction up to the
    next bucket; fractions above the largest bucket pad to exact length."""
    from .test_data import _write_classification_nc

    tr = str(tmp_path / "tr.nc")
    _write_classification_nc(tr, [8, 8, 8, 20, 20, 20, 40, 40, 40],
                             in_size=3, num_labels=4, seed=4)
    ds = DataSet([tr], parallel_sequences=3, sort_by_length=True,
                 prefetch=False, bucket_lengths=(12, 24))
    tps = sorted(f.shape[0] for f in ds.lazy_fractions())
    assert tps == [12, 24, 40]


def test_bucket_major_shuffle_order(tmp_path):
    """bucket_major_shuffle: emission order is a permutation of all
    fractions, shuffled within buckets, buckets contiguous."""
    from .test_data import _write_classification_nc

    tr = str(tmp_path / "tr.nc")
    _write_classification_nc(tr, [8] * 9 + [20] * 9, in_size=3, num_labels=4,
                             seed=4)
    ds = DataSet([tr], parallel_sequences=3, sort_by_length=True,
                 prefetch=False, fraction_shuffling=True, seed=11,
                 bucket_lengths=True)
    for _ in range(4):  # several epochs of re-shuffles
        shapes = [f.shape for f in ds.lazy_fractions()]
        assert len(shapes) == 6
        # contiguous runs == distinct shapes (buckets never interleave)
        runs = 1 + sum(1 for a, b in zip(shapes, shapes[1:]) if a != b)
        assert runs == len(set(shapes)) == 2
    # the order is genuinely shuffled within buckets across epochs
    orders = {tuple(f.key for f in ds.lazy_fractions()) for _ in range(6)}
    assert len(orders) > 1


def test_device_cache_budget_pins_prefix_and_reports_stats(tmp_path):
    """A corpus ~1.5x the cache budget: the admitted prefix stays pinned
    (cyclic epoch scans would thrash a plain LRU to 0%), steady-state hit
    rate ~= budget/corpus > 60%, and the hit/miss counters report it."""
    from .test_data import _write_classification_nc

    tr = str(tmp_path / "tr.nc")
    _write_classification_nc(tr, [8] * 12, in_size=3, num_labels=4, seed=1)
    layers = [
        {"name": "input", "type": "input", "size": 3},
        {"name": "l1", "type": "lstm", "size": 4, "bias": 1.0},
        {"name": "output", "type": "softmax", "size": 4, "bias": 1.0},
        {"name": "postoutput", "type": "multiclass_classification", "size": 4},
    ]
    ds = DataSet([tr], parallel_sequences=2, sort_by_length=True,
                 prefetch=False)

    # measure the full-corpus cache footprint first
    net = Network(layers)
    net.init_params(3)
    t_full = Trainer(net, ds, learning_rate=1e-3, max_epochs=1,
                     hybrid_online_batch=True, device_cache=True)
    t_full.train_epoch()
    full_bytes = t_full._dev_cache_bytes
    assert len(t_full._dev_cache) == 6

    net2 = Network(layers)
    net2.init_params(3)
    t = Trainer(net2, ds, learning_rate=1e-3, max_epochs=4,
                hybrid_online_batch=True, device_cache=True,
                device_cache_bytes=int(full_bytes / 1.5) + 1)
    t.train_epoch()  # epoch 1: all misses, prefix admitted
    st1 = t.device_cache_stats()
    assert st1["misses"] == 6 and st1["hits"] == 0
    assert 3 <= st1["entries"] < 6
    n_pinned = st1["entries"]
    t.train_epoch()  # epoch 2: pinned prefix hits, nothing evicted
    st2 = t.device_cache_stats()
    assert st2["entries"] == n_pinned  # no thrash: same entries survive
    assert st2["hits"] == n_pinned and st2["hits"] / 6 > 0.6
    t.train_epoch()
    st3 = t.device_cache_stats()
    assert st3["hits"] == n_pinned and st3["entries"] == n_pinned
    assert st3["bytes"] <= int(full_bytes / 1.5) + 1

    # staleness eviction: a key unused for >= 2 epochs gives up its bytes
    dead = ("dead-token", 0)
    t._dev_cache[dead] = [t._dev_cache[next(iter(t._dev_cache))][0],
                          full_bytes, t.cur_epoch - 2]
    t._dev_cache_bytes += full_bytes
    t.train_epoch()  # over budget now -> the stale entry is evicted
    assert dead not in t._dev_cache
    assert t._dev_cache_bytes <= int(full_bytes / 1.5) + 1


def test_device_cache_keys_not_shared_across_datasets(tmp_path):
    """Regression: Fraction keys are namespaced per DataSet — with a shared
    Trainer cache, a validation fraction must never hit the TRAIN fraction
    cached under the same uid tuple (this silently evaluated validation on
    training data and corrupted best-weight tracking)."""
    from .test_data import _write_classification_nc

    tr = str(tmp_path / "tr.nc")
    va = str(tmp_path / "va.nc")
    _write_classification_nc(tr, [6, 5, 4, 7], in_size=3, num_labels=4, seed=1)
    _write_classification_nc(va, [5, 6, 7, 4], in_size=3, num_labels=4, seed=99)
    layers = [
        {"name": "input", "type": "input", "size": 3},
        {"name": "l1", "type": "lstm", "size": 4, "bias": 1.0},
        {"name": "output", "type": "softmax", "size": 4, "bias": 1.0},
        {"name": "postoutput", "type": "multiclass_classification", "size": 4},
    ]
    ds_tr = DataSet([tr], parallel_sequences=2, sort_by_length=True,
                    prefetch=False)
    ds_va = DataSet([va], parallel_sequences=2, sort_by_length=True,
                    prefetch=False)

    net1 = Network(layers)
    net1.init_params(3)
    t1 = Trainer(net1, ds_tr, validation_set=ds_va, learning_rate=1e-3,
                 momentum=0.9, max_epochs=2, hybrid_online_batch=True,
                 device_cache=False)
    while not t1.train_epoch():
        pass

    net2 = Network(layers)
    net2.init_params(3)
    t2 = Trainer(net2, ds_tr, validation_set=ds_va, learning_rate=1e-3,
                 momentum=0.9, max_epochs=2, hybrid_online_batch=True,
                 device_cache=True)
    while not t2.train_epoch():
        pass
    # train and validation fractions cached under distinct namespaces
    assert len(t2._dev_cache) == 4
    assert t2.cur_validation_error == pytest.approx(t1.cur_validation_error,
                                                    rel=1e-6)
    assert t2.cur_training_error == pytest.approx(t1.cur_training_error,
                                                  rel=1e-6)


def test_stacked_decline_reason_is_printed_once(tmp_path, capsys):
    """When the epoch-resident fast path declines, ONE line names the
    gate that failed (fuse count, shape count, budget) — the epoch then
    runs ~6x slower on grouped flushes and the reason used to be invisible
    (VERDICT r3 #5). Repeats of the same reason stay silent."""
    from .test_data import _write_classification_nc

    tr = str(tmp_path / "tr.nc")
    _write_classification_nc(tr, [8] * 12, in_size=3, num_labels=4, seed=2)
    layers = [
        {"name": "input", "type": "input", "size": 3},
        {"name": "l1", "type": "blstm", "size": 4, "bias": 1.0},
        {"name": "output", "type": "softmax", "size": 4, "bias": 1.0},
        {"name": "postoutput", "type": "multiclass_classification", "size": 4},
    ]

    # fuse too small for the 4 fractions -> named decline
    ds = DataSet([tr], parallel_sequences=3, sort_by_length=True,
                 prefetch=False)
    net = Network(layers)
    net.init_params(5)
    t = Trainer(net, ds, learning_rate=1e-3, momentum=0.9, max_epochs=2,
                hybrid_online_batch=True, fuse_fractions=2,
                device_cache=True)
    while not t.train_epoch():
        pass
    out = capsys.readouterr().out
    assert out.count("Epoch-resident fast path declined") == 1
    assert "fuse_fractions=2 < " in out

    # budget too small -> named decline with the GiB numbers
    ds2 = DataSet([tr], parallel_sequences=3, sort_by_length=True,
                  prefetch=False)
    net2 = Network(layers)
    net2.init_params(5)
    t2 = Trainer(net2, ds2, learning_rate=1e-3, momentum=0.9, max_epochs=1,
                 hybrid_online_batch=True, fuse_fractions=8,
                 device_cache=True, device_cache_bytes=16)
    while not t2.train_epoch():
        pass
    out = capsys.readouterr().out
    assert "device_cache_bytes" in out and "GiB" in out


def test_auto_cache_bytes_uses_memory_stats(monkeypatch):
    """The device-cache budget follows the device's actual memory limit
    (40% of HBM) and falls back to 6 GiB when stats are unavailable."""
    import unittest.mock as um

    import jax

    with um.patch.object(jax, "default_backend", lambda: "tpu"):
        class Dev:
            def memory_stats(self):
                return {"bytes_limit": 16 * 1024**3}

        with um.patch.object(jax, "local_devices", lambda: [Dev()]):
            assert Trainer._auto_cache_bytes() == int(16 * 1024**3 * 0.4)

        class NoStats:
            def memory_stats(self):
                return None

        with um.patch.object(jax, "local_devices", lambda: [NoStats()]):
            assert Trainer._auto_cache_bytes() == 6 * 1024**3
    assert Trainer._auto_cache_bytes() == 6 * 1024**3  # CPU fallback


def test_stacked_nonblocking_warm_compile(tmp_path, capsys, monkeypatch):
    """Cold-start epochs must not idle behind the whole-epoch XLA compile:
    while the warm-compile thread is alive past its 2 s grace, the pass
    runs grouped flushes (named decline, printed once), and the stacked
    path takes over once the compile lands — results identical to the
    always-grouped trainer."""
    import threading

    from .test_data import _write_classification_nc

    tr = str(tmp_path / "tr.nc")
    _write_classification_nc(tr, [8] * 12, in_size=3, num_labels=4, seed=3)
    layers = [
        {"name": "input", "type": "input", "size": 3},
        {"name": "l1", "type": "blstm", "size": 4, "bias": 1.0},
        {"name": "output", "type": "softmax", "size": 4, "bias": 1.0},
        {"name": "postoutput", "type": "multiclass_classification", "size": 4},
    ]

    def make(seed):
        ds = DataSet([tr], parallel_sequences=3, sort_by_length=True,
                     prefetch=False)
        net = Network(layers)
        net.init_params(seed)
        return net, ds

    # reference: the always-grouped path (device_cache off)
    net1, ds1 = make(5)
    t1 = Trainer(net1, ds1, learning_rate=1e-3, momentum=0.9, max_epochs=3,
                 hybrid_online_batch=True, fuse_fractions=8,
                 device_cache=False)
    while not t1.train_epoch():
        pass

    # an event-gated fake "compile": alive through epoch 1 (which must
    # decline and run grouped), released before epoch 2 (which must
    # dispatch stacked) — no wall-clock coupling, cannot flake under load
    ev = threading.Event()

    def slow_warm(self, stacks, update):
        th = threading.Thread(target=ev.wait, daemon=True)
        th.start()
        return th

    monkeypatch.setattr(Trainer, "_spawn_warm_compile", slow_warm)
    net2, ds2 = make(5)
    t2 = Trainer(net2, ds2, learning_rate=1e-3, momentum=0.9, max_epochs=3,
                 hybrid_online_batch=True, fuse_fractions=8,
                 device_cache=True)
    done = t2.train_epoch()  # epoch 1: the warm thread is alive -> grouped
    ev.set()
    while not done:
        done = t2.train_epoch()
    out = capsys.readouterr().out
    assert out.count("still compiling") == 1
    assert t2.cur_training_error == pytest.approx(t1.cur_training_error,
                                                  rel=1e-6)
    # the compile landed and the stacked path took over
    assert all(e.get("warm") is None for e in t2._stacked.values())
