"""Training loop: momentum SGD, epoch driver, best-weight tracking, autosave.

Reproduces `currennt_lib/src/optimizers/`:

- SteepestDescentOptimizer (SteepestDescentOptimizer.cu:39-94):
  delta <- momentum*delta - lr*grad;  w <- w + delta, with the per-layer
  `learningRate` JSON override (>= 0 replaces the global lr);
- epoch driver (Optimizer.cu:284-324): train pass with updates -> validation
  every `validate_every` (track lowest, snapshot best weights) -> test every
  `test_every` -> stop on max_epochs_no_best/max_epochs, restoring the best
  weights at the end; when no validation set exists the reference snapshots
  best weights every epoch (Optimizer.cu:306-309);
- _processDataSet (Optimizer.cu:38-104): per-fraction forward + error sum;
  classification-error counting; optional Gaussian weight noise injected
  before the backward pass and restored after (gradients taken at the noisy
  point, update applied to the clean weights); stochastic
  (hybrid_online_batch) mode updates after every fraction, batch mode
  accumulates gradients across fractions and updates once per epoch;
  epoch error = sum of fraction errors / totalSequences; classification
  error = 1 - correct/totalTimesteps.

TPU design: the whole fraction step (forward, loss, backward, SGD update) is
ONE jitted function with donated params/velocity buffers — no host round
trips inside an epoch except the scalar error accumulators. Data parallelism
shards the fraction's batch axis over a jax Mesh (see parallel/).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from lstm_rnn_tpu.data.dataset import DataSet, Fraction
from lstm_rnn_tpu.network import Network


def tree_zeros_like(tree):
    return jax.tree_util.tree_map(jnp.zeros_like, tree)


# Jitted helpers shared by all Trainer instances. Multi-host runs hold
# global (non-fully-addressable) arrays, on which EAGER jnp ops raise —
# every op touching params/metrics must go through jit (outputs inherit /
# replicate shardings). Single-process behavior is identical.
_ZEROS_JIT = jax.jit(tree_zeros_like)
_COPY_JIT = jax.jit(lambda tree: jax.tree_util.tree_map(jnp.copy, tree))
_SUM_JIT = jax.jit(lambda xs: jnp.sum(jnp.stack(xs)))


class Trainer:
    def __init__(self, net: Network, train_set: DataSet,
                 validation_set: Optional[DataSet] = None,
                 test_set: Optional[DataSet] = None, *,
                 learning_rate: float = 1e-5, momentum: float = 0.9,
                 max_epochs: int = -1, max_epochs_no_best: int = 20,
                 validate_every: int = 1, test_every: int = 1,
                 hybrid_online_batch: bool = False,
                 weight_noise_sigma: float = 0.0,
                 seed: int = 1, mesh=None, pipe_mesh=None, seq_mesh=None,
                 pipeline_microbatches: int = 0,
                 fuse_fractions: int = 1,
                 padded_pipeline: Optional[bool] = None,
                 device_cache: Optional[bool] = None,
                 device_cache_bytes: Optional[int] = None):
        self.net = net
        self.train_set = train_set
        self.validation_set = validation_set
        self.test_set = test_set
        self.learning_rate = learning_rate
        self.momentum = momentum
        self.max_epochs = max_epochs
        self.max_epochs_no_best = max_epochs_no_best
        self.validate_every = validate_every
        self.test_every = test_every
        self.hybrid_online_batch = hybrid_online_batch
        self.weight_noise_sigma = weight_noise_sigma
        self.mesh = mesh
        self.pipe_mesh = pipe_mesh
        self.seq_mesh = seq_mesh
        self.pipeline_microbatches = pipeline_microbatches
        # fuse_fractions > 1: stochastic-mode updates for K same-shape
        # fractions run as ONE jitted lax.scan — identical sequential
        # updates, 1/K the dispatch overhead (and one big host->device
        # transfer instead of K small ones)
        self.fuse_fractions = max(1, fuse_fractions)
        self._noise_rng = np.random.RandomState(seed & 0x7FFFFFFF)

        # Device-resident fraction cache (TPU-native replacement for the
        # reference's per-epoch disk-cache re-reads, DataSet.cpp:550-566):
        # assembled fractions that are epoch-invariant (Fraction.key set)
        # stay in HBM after their first transfer, so epochs 2+ stream no
        # input data from the host at all. Bounded by device_cache_bytes.
        if device_cache is None:
            device_cache = jax.default_backend() == "tpu"
        self.device_cache = device_cache
        # key -> [triple, nbytes, last_used_epoch]. Eviction is
        # staleness-based, NOT plain LRU: entries unused for >= 2 epochs are
        # dead (e.g. shuffle_sequences regenerates keys every epoch) and get
        # evicted; entries hit in the current/previous epoch are pinned.
        # Plain LRU would thrash to a 0% hit rate on a cyclic epoch scan
        # over a corpus just above budget — pinning the admitted prefix
        # keeps hit rate ~= budget/corpus there instead.
        self._dev_cache: Dict[Any, list] = {}
        # per-DataSet epoch-resident stacked corpora (_try_stacked_epoch)
        self._stacked: Dict[Any, dict] = {}
        # jitted unpad for exact_params (see its docstring), created ONCE
        # here: wrapper creation is free (compiles lazily on first call)
        # and a lazy check-then-set would race the autosave worker thread
        # against the main thread's --autosave_best export, compiling the
        # program twice and discarding one wrapper's cache
        self._unpad_jit = jax.jit(net.unpad_params)
        if device_cache_bytes is None:
            device_cache_bytes = self._auto_cache_bytes()
        self._dev_cache_budget = device_cache_bytes
        self._dev_cache_bytes = 0
        # one-line legibility when the epoch-resident fast path declines
        # (it is ~6x faster than grouped flushes; a silent decline used to
        # cost users the diagnosis) — printed once per distinct reason
        # (a SET: train/val/test passes declining for different reasons
        # must not re-trigger each other's line every epoch)
        self._stacked_decline_reasons: set = set()
        # per-epoch observability (cli prints them in the epoch row)
        self.cache_hits = 0
        self.cache_misses = 0

        # per-layer learning rates (>=0 overrides global,
        # SteepestDescentOptimizer.cu:78-80)
        self.layer_lr: Dict[str, float] = {
            s.name: (s.learning_rate if s.learning_rate >= 0 else learning_rate)
            for s in net.trainable_specs()
        }

        # tensor parallelism (2-D mesh with a "model" axis): LSTM layers
        # route through parallel/tensor.py's sharded scan cell — the padded
        # fused-kernel view does not apply
        self.tensor_parallel = (mesh is not None
                                and "model" in mesh.axis_names
                                and int(mesh.shape["model"]) > 1)
        if self.tensor_parallel:
            net.mesh = mesh
            net.validate_tp()
            padded_pipeline = False

        # pipeline parallelism (a "pipe" mesh, parallel/pipeline.py):
        # composes with the padded fused-kernel view (stages route through
        # apply_padded_layer_range), so padded_pipeline stays as decided
        if pipe_mesh is not None:
            from lstm_rnn_tpu.parallel.pipeline import stage_ranges
            stage_ranges(len(net.specs) - 2, int(pipe_mesh.shape["pipe"]))

        # sequence parallelism (a "seq" mesh, parallel/sequence.py): runs
        # on the EXACT layout (the fused wavefront pads widths on the fly
        # per block via lstm_scan_fused_carry), so the padded fused-kernel
        # view does not apply
        if seq_mesh is not None:
            padded_pipeline = False
            if (jax.default_backend() == "tpu"
                    and net.backend in ("auto", "pallas")):
                # eagerly device-validate the CARRY-kernel gradient family
                # for each LSTM layer's wavefront point (the SP block scan
                # differentiates lstm_scan_fused_carry, whose backward adds
                # explicit-state blocks — a carry-less verdict at the VMEM
                # edge is not evidence it fits). Keys mirror
                # _fused_wavefront's rounding; probed once per machine.
                from lstm_rnn_tpu import io_currennt as ioc_sp
                from lstm_rnn_tpu.ops.lstm_cell import fused_padded_dims
                from lstm_rnn_tpu.ops.vmem_probe import ensure_validated
                from lstm_rnn_tpu.parallel.mesh import data_axis_size
                bsz_sp = max(1, getattr(train_set, "parallel_sequences", 8))
                # per-device wavefront block length for the corpus' LARGEST
                # fraction T (the bucketized padded length, exactly what
                # fractions assemble at, then _pad_time(granule=16) over
                # seq devices) — verdicts are keyed by chunk-grid size
                # (vmem_probe k3), so the probe compiles at the real block
                # T; other block lengths fall back to the analytic chunk
                # at dispatch
                n_seq = data_axis_size(seq_mesh, "seq")
                max_t = max(getattr(train_set, "max_seq_length", 16), 16)
                if hasattr(train_set, "_padded_length"):
                    max_t = max(train_set._padded_length(max_t), 16)
                t_dev = max(16, -(-max_t // (n_seq * 16)) * 16)
                prev = net.specs[0].size
                for s2 in net.specs[1:-1]:
                    if s2.type in ioc_sp.LSTM_TYPES:
                        d2 = 2 if ioc_sp.LSTM_TYPES[s2.type] else 1
                        # the padding contract, from its one home
                        # (fused_padded_dims — t_dev is already a
                        # 16-multiple, so tp == t_dev)
                        hp_sp, pp_sp, bp_sp, tp_sp = fused_padded_dims(
                            s2.size // d2, prev, bsz_sp, t_dev,
                            net.compute_dtype)
                        ensure_validated(tp_sp, hp_sp, pp_sp, bp_sp,
                                         net.compute_dtype, carry=True)
                    prev = s2.size

        # remat_blocks shrinks the SCAN path's residuals (models/lstm.py):
        # force the exact layout so lstm_forward's auto branch picks the
        # scan backend instead of the padded fused-kernel view silently
        # ignoring the flag
        if getattr(net, "remat_blocks", 0):
            padded_pipeline = False

        # padded training view (see Network.pad_params): default on when the
        # fused TPU kernels will run and the net has LSTM layers
        if padded_pipeline is None:
            has_lstm = any(s.type in ("lstm", "blstm") for s in net.specs)
            padded_pipeline = has_lstm and (
                net.backend in ("pallas", "pallas_interpret")
                or (net.backend == "auto" and jax.default_backend() == "tpu"))
            if padded_pipeline:
                # VMEM guard: very wide cells would not fit the fused
                # kernels' resident blocks (weights, dW accumulators and
                # double-buffered streams); fall back to the exact layout
                # (lstm_forward's own guard then picks lax.scan).
                # On a REAL TPU each distinct (width, dtype, batch) point is
                # validated by an eager AOT compile probe recorded on disk
                # (ops/vmem_probe.py) — the analytic model is only the
                # CPU/interpret fallback, since interpret-mode tests cannot
                # catch device scoped-vmem overflows.
                from lstm_rnn_tpu.ops.lstm_cell import (batch_granule,
                                                        fused_fits, round_up)
                on_tpu = (jax.default_backend() == "tpu"
                          and net.backend in ("auto", "pallas"))
                import math
                bgran = batch_granule(net.compute_dtype)
                if mesh is not None:
                    from lstm_rnn_tpu.parallel.mesh import data_axis_size
                    nd = data_axis_size(mesh)
                    bgran = bgran * nd // math.gcd(bgran, nd)
                bp = round_up(
                    max(1, getattr(train_set, "parallel_sequences", 8)), bgran)
                # probe at REAL fraction time lengths: verdicts are keyed
                # by chunk-grid size (the backward kernel's scoped-VMEM
                # stack grows with NC — vmem_probe k3). Probe the largest
                # few Ts (the heaviest fractions; the largest decides
                # padded_pipeline); fractions at unprobed Ts fall back to
                # the conservative analytic chunk at dispatch.
                probe_ts = [16]
                if hasattr(train_set, "padded_time_inventory"):
                    inv = train_set.padded_time_inventory()
                    if inv:
                        probe_ts = inv[-4:]
                # validation/test fractions dispatch the same fused
                # kernels at THEIR heaviest (batch, T) points — probe
                # those too (verdicts are per-T, k3): a validated point
                # serves fused, a total rejection routes just that T to
                # scan via known_unfit at dispatch. Neither outcome
                # demotes the padded view: the val/test pass is
                # forward-only, so a train-grade fwd+bwd rejection at a
                # longer val T must not cost training the fused path.
                aux_pts = []
                for ds_aux in (validation_set, test_set):
                    if (ds_aux is None
                            or not hasattr(ds_aux, "padded_time_inventory")):
                        continue
                    inv_aux = ds_aux.padded_time_inventory()
                    b_aux = round_up(
                        max(1, getattr(ds_aux, "parallel_sequences", 8)),
                        bgran)
                    for t_aux in inv_aux[-2:]:
                        pt = (b_aux, t_aux)
                        if (pt not in aux_pts
                                and not (b_aux == bp and t_aux in probe_ts)):
                            aux_pts.append(pt)
                for spec, (kind, _idx, prev_w, hp) in zip(
                        net.specs[1:-1], net._pad_plan()):
                    if kind != "lstm":
                        continue
                    pp = round_up(prev_w, 128)
                    if on_tpu:
                        from lstm_rnn_tpu.ops.vmem_probe import ensure_validated
                        ok = all(ensure_validated(t, hp, pp, bp,
                                                  net.compute_dtype) > 0
                                 for t in probe_ts)
                        for b_aux, t_aux in aux_pts:
                            ensure_validated(t_aux, hp, pp, b_aux,
                                             net.compute_dtype)
                    else:
                        ok = fused_fits(hp, pp, bp, net.compute_dtype)
                    if not ok:
                        padded_pipeline = False
                        if on_tpu:
                            # the net now runs UNPADDED, where lstm_forward's
                            # auto path keys the probe table by the EXACT
                            # layer widths (round_up(d*h, 128) can be smaller
                            # than the padded plan's d*hp). Seed verdicts at
                            # those keys so the auto path honors the device
                            # instead of the optimistic analytic model.
                            prev = net.specs[0].size
                            for s2 in net.specs[1:-1]:
                                from lstm_rnn_tpu import io_currennt as ioc2
                                if s2.type in ioc2.LSTM_TYPES:
                                    d2 = 2 if ioc2.LSTM_TYPES[s2.type] else 1
                                    h2 = s2.size // d2
                                    for t in probe_ts:
                                        ensure_validated(
                                            t, round_up(h2, 128),
                                            round_up(prev, 128), bp,
                                            net.compute_dtype)
                                    for b_aux, t_aux in aux_pts:
                                        ensure_validated(
                                            t_aux, round_up(h2, 128),
                                            round_up(prev, 128), b_aux,
                                            net.compute_dtype)
                                prev = s2.size
                            # backstop: verdicts are per-T (k3), and only
                            # probe_ts were seeded — a fraction at any
                            # OTHER T would pass known_unfit unprobed and
                            # could die at Mosaic device compile
                            # mid-epoch. A device rejection at the
                            # heaviest Ts is width-driven evidence; route
                            # the whole net's auto path to lax.scan.
                            if net.backend == "auto":
                                print("vmem_probe: device rejected the "
                                      "fused kernels at the heaviest "
                                      "fraction shapes; lstm_backend auto "
                                      "-> scan for this net")
                                net.backend = "scan"
                        break
        self.padded = padded_pipeline
        self._pad_mask = None
        if self.padded:
            self.params = jax.tree_util.tree_map(
                jnp.asarray, net.pad_params(net.params))
            if weight_noise_sigma > 0:
                self._pad_mask = jax.tree_util.tree_map(
                    np.asarray, net.pad_mask())
        else:
            self.params = jax.tree_util.tree_map(jnp.asarray, net.params)
        if mesh is not None:
            from lstm_rnn_tpu.parallel.mesh import replicate
            self.params = replicate(mesh, self.params)
            if self.tensor_parallel:
                # LSTM weights live SHARDED on the model axis (their cell
                # columns) so the TP scan never re-shards them per step
                from lstm_rnn_tpu import io_currennt as ioc
                from lstm_rnn_tpu.parallel.tensor import shard_lstm_params
                for s in net.specs[1:-1]:
                    if s.type in ioc.LSTM_TYPES:
                        self.params[s.name] = shard_lstm_params(
                            mesh, self.params[s.name])
        self.velocity = _ZEROS_JIT(self.params)
        # snapshots must COPY: self.params buffers are donated into the next
        # jitted step, which deletes aliased references
        self.best_params = self._snapshot(self.params)

        # pipelined-autosave support: dispatch_epoch also snapshots the
        # epoch-end velocity (the CLI sets this under --autosave)
        self.snapshot_velocity = False

        # optimizer state (Optimizer.cu ctor)
        self.finished = False
        self.cur_epoch = 0
        self.epochs_since_lowest = 0
        self.lowest_validation_error = float("inf")
        self.cur_training_error = float("inf")
        self.cur_validation_error = float("inf")
        self.cur_test_error = float("inf")
        self.cur_training_class_error = 0.0
        self.cur_validation_class_error = 0.0
        self.cur_test_class_error = 0.0

        self._build_steps()

    # ----------------------------------------------------------------- jitted
    def _build_steps(self):
        net = self.net
        lrs = self.layer_lr
        momentum = self.momentum

        padded = self.padded

        # fused classification tail (softmax + CE + counter as one Pallas
        # kernel pair): engaged whenever the Pallas kernels are in play —
        # same CURRENNT numerics, the [T,B,S] probability tensor stays in
        # VMEM (one residual write) instead of several XLA HBM passes
        fused_tail = (net.supports_fused_tail()
                      and not self.tensor_parallel
                      and self.pipe_mesh is None
                      and self.seq_mesh is None
                      and (net.backend == "pallas_interpret"
                           or (jax.default_backend() == "tpu"
                               and net.backend in ("auto", "pallas"))))
        tail_interp = (net.backend == "pallas_interpret"
                       or jax.default_backend() != "tpu")

        if fused_tail and not tail_interp:
            # eagerly device-validate the tail kernels' row blocks for this
            # net's (P, Sp, dtype) point (AOT compile probes, never inside
            # a trace — ops/vmem_probe.py): wide softmax layers get their
            # proj-path verdict recorded BEFORE the first training step
            # compiles, and the row pickers read the table at trace time.
            from lstm_rnn_tpu.ops.lstm_cell import round_up
            from lstm_rnn_tpu.ops.vmem_probe import ensure_tail_validated
            sp = round_up(net.specs[-2].size, 128)
            if self.padded:
                p_dim = net._pad_plan()[-1][2]  # softmax's padded fan-in
            else:
                p_dim = net.specs[-3].size
            proj_ok = wide_ok = False
            if p_dim % 128 == 0:
                proj_ok = ensure_tail_validated(p_dim, sp, net.compute_dtype,
                                                proj=True) > 0
                if proj_ok:
                    # fitting is not winning: a wide-scale proj verdict
                    # with a tiny row block routes WIDE at trace time
                    # (softmax_ce.prefer_proj_tail) — validate the wide
                    # point eagerly in that case
                    from lstm_rnn_tpu.ops.softmax_ce import prefer_proj_tail
                    if not prefer_proj_tail(1 << 20, p_dim, sp,
                                            net.specs[-2].size,
                                            net.compute_dtype):
                        proj_ok = False
                if not proj_ok:
                    # LVCSR-scale route: validate the wide tail's (SB,
                    # rows) point for this fan-in before the step compiles
                    from lstm_rnn_tpu.ops.vmem_probe import (
                        ensure_tail_validated as _etv, ensure_wide_validated)
                    wide_ok = ensure_wide_validated(
                        p_dim, net.compute_dtype) is not None
                    if wide_ok:
                        # the wide FORWARD is the plain row-blocked tail at
                        # the wide plan's padded width — claw back its row
                        # cap on device too (the analytic cap is tiny at
                        # LVCSR widths: more grid steps than needed)
                        from lstm_rnn_tpu.ops.softmax_ce import wide_plan
                        try:
                            spw = wide_plan(1 << 20, p_dim,
                                            net.specs[-2].size,
                                            net.compute_dtype)[0]
                        except ValueError:
                            # a PRIOR run already recorded the forward
                            # total-unfit at spw — wide_plan gates on it
                            spw = None
                        if spw is None or _etv(0, spw, net.compute_dtype,
                                               proj=False) == 0:
                            # even the smallest row block overflows at the
                            # wide padded width: the wide tail's FORWARD
                            # cannot run (wide_plan refuses to route wide,
                            # ops/softmax_ce.py) — fall through to the
                            # plain-tail check below (which will demote to
                            # the unfused XLA tail for the same reason)
                            wide_ok = False
            if not proj_ok and not wide_ok:
                # loss_and_count_fused will route through the plain tail;
                # if even its smallest row block overflows (recorded
                # verdict), run the unfused XLA tail instead of dying at
                # the first training step's Mosaic compile
                if ensure_tail_validated(0, sp, net.compute_dtype,
                                         proj=False) == 0:
                    fused_tail = False

        def loss_and_metrics(params, inputs, targets, pattypes):
            if self.pipe_mesh is not None:
                from lstm_rnn_tpu.parallel.pipeline import (
                    loss_and_count_pipelined)
                return loss_and_count_pipelined(
                    net, params, inputs, targets, pattypes, self.pipe_mesh,
                    padded=padded,
                    microbatches=self.pipeline_microbatches)
            if self.seq_mesh is not None:
                from lstm_rnn_tpu.parallel.sequence import loss_and_count_seq
                return loss_and_count_seq(
                    net, params, inputs, targets, pattypes, self.seq_mesh)
            if fused_tail:
                return net.loss_and_count_fused(
                    params, inputs, targets, pattypes, padded=padded,
                    interpret=tail_interp)
            if padded:
                y = net.apply_padded(params, inputs, pattypes)
            else:
                y = net.apply(params, inputs, pattypes)
            err = net.loss_fn(y, targets, pattypes)
            correct = net.correct_count(y, targets, pattypes)
            return err, correct

        def grad_fraction(params, inputs, targets, pattypes):
            (err, correct), grads = jax.value_and_grad(
                lambda p: loss_and_metrics(p, inputs, targets, pattypes),
                has_aux=True)(params)
            return err, correct, grads

        def sgd_update(params, velocity, grads):
            new_v = {}
            new_p = {}
            for name, g in grads.items():
                lr = lrs[name]
                new_v[name] = jax.tree_util.tree_map(
                    lambda v, gg: momentum * v - lr * gg, velocity[name], g)
                new_p[name] = jax.tree_util.tree_map(
                    lambda p, v: p + v, params[name], new_v[name])
            return new_p, new_v

        def train_step(params, velocity, inputs, targets, pattypes):
            """Stochastic-mode fused step: grads at `params`, update applied."""
            err, correct, grads = grad_fraction(params, inputs, targets, pattypes)
            params, velocity = sgd_update(params, velocity, grads)
            return params, velocity, err, correct

        def train_step_noisy(params, velocity, noise, inputs, targets, pattypes):
            """Weight noise: gradient at params+noise, update applied to the
            clean params (Optimizer.cu:58-84)."""
            noisy = jax.tree_util.tree_map(lambda p, n: p + n, params, noise)
            err, correct, grads = grad_fraction(noisy, inputs, targets, pattypes)
            params, velocity = sgd_update(params, velocity, grads)
            return params, velocity, err, correct

        def eval_step(params, inputs, targets, pattypes):
            return loss_and_metrics(params, inputs, targets, pattypes)

        def accum_step(params, grad_acc, noise, inputs, targets, pattypes):
            """Batch-mode step: accumulate gradients, no update."""
            noisy = jax.tree_util.tree_map(lambda p, n: p + n, params, noise)
            err, correct, grads = grad_fraction(noisy, inputs, targets, pattypes)
            grad_acc = jax.tree_util.tree_map(jnp.add, grad_acc, grads)
            return grad_acc, err, correct

        def train_scan(params, velocity, inputs_k, targets_k, pattypes_k,
                       perm, n):
            """Up to K stacked same-shape fractions, sequential updates in
            one jit. The trip count `n` is a DEVICE scalar: one compiled
            program per shape serves every group size with zero dummy
            compute (iterations past n never run), so a whole epoch of
            same-shape fractions is a single dispatch. `perm` [K] maps the
            iteration order onto stack rows — an epoch-resident stacked
            corpus then replays any per-epoch fraction shuffle by sending
            one small index vector instead of restacking."""
            def body(i, carry):
                p, v, e, c = carry
                j = perm[i]
                err, correct, grads = grad_fraction(
                    p, inputs_k[j], targets_k[j], pattypes_k[j])
                p, v = sgd_update(p, v, grads)
                return (p, v, e + err, c + correct)

            params, velocity, e, c = jax.lax.fori_loop(
                0, n, body,
                (params, velocity, jnp.zeros((), jnp.float32),
                 jnp.zeros((), jnp.int32)))
            return params, velocity, e, c

        def eval_scan(params, inputs_k, targets_k, pattypes_k, perm, n):
            """Dynamic-count evaluation twin of train_scan (no carry —
            grouping changes nothing but dispatch count)."""
            def body(i, carry):
                e, c = carry
                j = perm[i]
                err, correct = loss_and_metrics(
                    params, inputs_k[j], targets_k[j], pattypes_k[j])
                return (e + err, c + correct)

            return jax.lax.fori_loop(
                0, n, body,
                (jnp.zeros((), jnp.float32), jnp.zeros((), jnp.int32)))

        donate = dict(donate_argnums=(0, 1))
        self._train_scan = jax.jit(train_scan, **donate)
        self._train_step = jax.jit(train_step, **donate)
        self._train_step_noisy = jax.jit(train_step_noisy, **donate)
        self._eval_step = jax.jit(eval_step)
        self._eval_scan = jax.jit(eval_scan)
        self._accum_step = jax.jit(accum_step, donate_argnums=(1,))
        self._sgd_update = jax.jit(sgd_update, **donate)

    # ------------------------------------------------------------------ noise
    def _draw_noise(self):
        sig = self.weight_noise_sigma
        if self._pad_mask is not None:
            # mask noise at padded positions so they stay exactly zero
            tree = jax.tree_util.tree_map(
                lambda p, m: (self._noise_rng.normal(0.0, sig, p.shape) * m
                              ).astype(np.float32),
                self.params, self._pad_mask)
        else:
            tree = jax.tree_util.tree_map(
                lambda p: self._noise_rng.normal(
                    0.0, sig, p.shape).astype(np.float32), self.params)
        if self.mesh is not None:
            # replicated placement (required under multi-process: every
            # jit input must be a global array; the host RNG streams are
            # identical across processes, so the values agree)
            from lstm_rnn_tpu.parallel.mesh import replicate
            return replicate(self.mesh, tree)
        return jax.tree_util.tree_map(jnp.asarray, tree)

    # ------------------------------------------------------------------ epoch
    @staticmethod
    def _pad_fraction(inputs, targets, pattypes, b_multiple: int = 8):
        """Pad T to a chunk multiple and B to a sublane multiple on the host
        (pure PATTYPE_NONE padding — numerically inert) so the device step
        never pads or slices."""
        from lstm_rnn_tpu.ops.lstm_cell import DEFAULT_CHUNK
        T, B = pattypes.shape
        tp = -(-T // DEFAULT_CHUNK) * DEFAULT_CHUNK
        bp = -(-B // b_multiple) * b_multiple
        if tp == T and bp == B:
            return inputs, targets, pattypes
        dt, db = tp - T, bp - B
        inputs = np.pad(inputs, ((0, dt), (0, db), (0, 0)))
        pattypes = np.pad(pattypes, ((0, dt), (0, db)))
        if targets.ndim == 2:  # classification: dummy = -1
            targets = np.pad(targets, ((0, dt), (0, db)),
                             constant_values=-1)
        else:
            targets = np.pad(targets, ((0, dt), (0, db), (0, 0)))
        return inputs, targets, pattypes

    def _b_multiple(self) -> int:
        """Batch padding granule: lcm(sublane granule, mesh size) so every
        fraction — including the short last one — shards evenly. The fused
        kernels store bf16 streams in bf16 mode, whose TPU tile needs 16
        batch rows (vs 8 for float32)."""
        base = 16 if self._transfer_itemsize() == 2 else 8
        if self.mesh is None:
            return base
        import math
        from lstm_rnn_tpu.parallel.mesh import data_axis_size
        n = data_axis_size(self.mesh)
        return base * n // math.gcd(base, n)

    def _transfer_itemsize(self) -> int:
        """Input itemsize as SHIPPED to the device: 2 when the padded
        pipeline feeds bf16 (host-side cast), else 4. The single source for
        every byte estimate — the stack-program caps must agree with the
        actual transfer dtype or the per-program resource cliff re-opens."""
        if self.padded and self.net.compute_dtype == jnp.dtype(jnp.bfloat16):
            return 2
        return 4

    def _frame_bytes(self, w: int) -> int:
        """Device bytes per padded frame of a shipped fraction: inputs at
        the transfer itemsize, targets (sparse int32 class or dense f32
        rows), one pattype byte."""
        tw = (1 if "classification" in self.net.specs[-1].type
              else self.net.target_size)
        return w * self._transfer_itemsize() + tw * 4 + 1

    def _transfer_dtype(self, inputs):
        """In bf16 mode, cast inputs on the HOST so the device transfer
        moves half the bytes (the first LSTM layer casts to the compute
        dtype anyway). Matters doubly on remote-TPU tunnels."""
        if self._transfer_itemsize() == 2:
            import ml_dtypes
            return inputs.astype(ml_dtypes.bfloat16)
        return inputs

    def _cache_evict_stale(self, need: int) -> None:
        """Evict entries unused for >= 2 epochs until `need` bytes fit (or
        nothing stale remains). Entries hit this or last epoch stay pinned —
        see the policy note in __init__."""
        if self._dev_cache_bytes + need <= self._dev_cache_budget:
            return
        horizon = self.cur_epoch - 1
        for key in [k for k, e in self._dev_cache.items() if e[2] < horizon]:
            entry = self._dev_cache.pop(key)
            self._dev_cache_bytes -= entry[1]
            if self._dev_cache_bytes + need <= self._dev_cache_budget:
                return

    def _device_batch(self, frac: Fraction):
        """Place a fraction on device, batch axis sharded over the mesh;
        epoch-invariant fractions stay cached in HBM."""
        key = getattr(frac, "key", None)
        if self.device_cache and key is not None:
            hit = self._dev_cache.get(key)
            if hit is not None:
                hit[2] = self.cur_epoch
                self.cache_hits += 1
                return hit[0]
            self.cache_misses += 1
        inputs, targets, pattypes = self._pad_fraction(
            frac.inputs, frac.targets, frac.pattypes, self._b_multiple())
        inputs = self._transfer_dtype(inputs)
        if self.mesh is not None:
            from lstm_rnn_tpu.parallel.mesh import shard_fraction
            triple = shard_fraction(self.mesh, inputs, targets, pattypes)
        elif self.device_cache and key is not None:
            triple = (jnp.asarray(inputs), jnp.asarray(targets),
                      jnp.asarray(pattypes))
        else:
            return inputs, targets, pattypes
        if self.device_cache and key is not None:
            nbytes = sum(int(a.nbytes) for a in triple)
            self._cache_evict_stale(nbytes)
            if self._dev_cache_bytes + nbytes <= self._dev_cache_budget:
                self._dev_cache[key] = [triple, nbytes, self.cur_epoch]
                self._dev_cache_bytes += nbytes
        return triple

    def _host_batch(self, frac: Fraction):
        """Pad + dtype-convert a fraction on the HOST, no device transfer.
        Used by the epoch-resident stack build, which ships each per-shape
        corpus stack as ONE device_put instead of an on-device jnp.stack:
        a stack program over O(100) resident arrays is a single XLA
        program whose operands + fresh output cross the remote-TPU
        runtime's per-program resource cliff (device-probed: programs
        <=1.03 GiB pass, >=1.37 GiB die with RESOURCE_EXHAUSTED even with
        HBM to spare), while an equally-sized device_put streams fine."""
        inputs, targets, pattypes = self._pad_fraction(
            frac.inputs, frac.targets, frac.pattypes, self._b_multiple())
        return self._transfer_dtype(inputs), targets, pattypes

    def _put_stacked(self, arr: np.ndarray):
        """One-transfer device placement of a host-built [K, T, B, ...]
        stack, batch axis (axis 2) sharded over the mesh."""
        if self.mesh is None:
            return jnp.asarray(arr)
        from jax.sharding import NamedSharding, PartitionSpec as P
        spec = [None] * arr.ndim
        spec[2] = "data"
        return jax.device_put(arr, NamedSharding(self.mesh, P(*spec)))

    def _stack_parts(self, parts):
        """Stack K per-fraction [T, B, ...] arrays into [K, T, B, ...] with
        the batch axis (now axis 2) still sharded over the mesh. Multi-host
        meshes must stack under jit (eager ops on non-fully-addressable
        arrays raise) with an explicit output sharding."""
        if self.mesh is None:
            stack = jnp.stack if isinstance(parts[0], jax.Array) else np.stack
            return stack(parts)
        from jax.sharding import NamedSharding, PartitionSpec as P
        spec = [None] * (parts[0].ndim + 1)
        spec[2] = "data"
        sh = NamedSharding(self.mesh, P(*spec))
        if jax.process_count() == 1:
            return jax.device_put(jnp.stack(parts), sh)
        return jax.jit(lambda xs: jnp.stack(xs), out_shardings=sh)(list(parts))

    def _put_perm(self, perm: np.ndarray, n: int):
        """Device placement for the iteration-order vector + trip count."""
        nk = np.int32(n)
        if self.mesh is not None:
            from lstm_rnn_tpu.parallel.mesh import replicate
            return replicate(self.mesh, perm), replicate(self.mesh, nk)
        return jnp.asarray(perm), nk

    @staticmethod
    def _auto_cache_bytes(fraction: float = 0.4,
                          fallback: int = 6 * 1024**3) -> int:
        """Device-cache budget from the device's ACTUAL memory limit (40%
        of HBM — the rest stays free for params, optimizer state and the
        step's activations/residuals); the old fixed 6 GiB only as the
        fallback when memory_stats is unavailable (CPU, some plugins)."""
        try:
            if jax.default_backend() != "tpu":
                return fallback
            stats = jax.local_devices()[0].memory_stats() or {}
            limit = stats.get("bytes_limit") or stats.get(
                "bytes_reservable_limit")
            if limit:
                return int(limit * fraction)
        except Exception:  # noqa: BLE001 — stats are best-effort
            pass
        return fallback

    def _note_stacked_decline(self, reason: str) -> None:
        """Name WHY _try_stacked_epoch declined (once per distinct reason):
        the epoch then quietly runs ~6x slower on grouped flushes, and the
        reason is the single most useful diagnostic (VERDICT r3 #5)."""
        if reason not in self._stacked_decline_reasons:
            self._stacked_decline_reasons.add(reason)
            print(f"Epoch-resident fast path declined: {reason}", flush=True)
        return None

    # distinct fraction shapes above which the epoch-resident path declines:
    # each shape compiles its own whole-epoch scan program (minutes on the
    # flagship), so an unbucketed corpus with per-fraction exact lengths
    # must fall back to the grouped-flush path
    STACKED_MAX_SHAPES = 8

    # cap on a single on-device stack program's input bytes (grouped-flush
    # path): the remote-TPU runtime kills any one program whose operands +
    # fresh output cross ~1-1.4 GiB with RESOURCE_EXHAUSTED regardless of
    # free HBM (device-probed cliff); 384 MiB of inputs keeps the stack
    # program (inputs + equal-sized output) under 800 MiB
    MAX_GROUP_STACK_BYTES = 384 << 20

    def _try_stacked_epoch(self, fracs, update: bool, fuse: int):
        """EPOCH-RESIDENT stacked corpus: when a whole pass is cacheable,
        fits the device budget, and spans few distinct shapes (a bucket
        inventory), the fractions live stacked PER SHAPE in HBM permanently
        (superseding the per-fraction cache entries). Each epoch then
        dispatches one fori_loop per consecutive same-shape run, whose
        iteration order is a small permutation vector — per-epoch fraction
        shuffling costs a handful of index-vector transfers instead of
        restacking, and with the DataSet's bucket-major shuffle the run
        count equals the bucket count. Returns (err, corr) device scalars,
        or None when the pass doesn't qualify (the grouped-flush path then
        runs)."""
        if not fracs:
            return None
        if not self.device_cache:
            return self._note_stacked_decline("device cache is off")
        if len(fracs) > fuse:
            return self._note_stacked_decline(
                f"fuse_fractions={fuse} < {len(fracs)} fractions — raise "
                "--fuse_fractions to cover the whole pass")
        keys = [getattr(f, "key", None) for f in fracs]
        if any(k is None for k in keys):
            return self._note_stacked_decline(
                "fractions are not epoch-invariant (input noise or "
                "per-epoch sequence shuffling)")
        shapes = [f.shape for f in fracs]
        if len(set(shapes)) > self.STACKED_MAX_SHAPES:
            return self._note_stacked_decline(
                f"{len(set(shapes))} distinct fraction shapes > "
                f"{self.STACKED_MAX_SHAPES} (one whole-epoch compile each) "
                "— use --bucket_lengths single/pow2")
        token = keys[0][0]  # the DataSet's cache namespace
        entry = self._stacked.get(token)
        hits = 0  # credited only once the pass actually dispatches stacked
        if entry is None:
            by_shape: Dict[Any, list] = {}
            for f, k, s in zip(fracs, keys, shapes):
                by_shape.setdefault(s, []).append((f, k))

            def width_of(n: int) -> int:
                # next power of two: the compiled scan program is keyed by
                # (shape, stack width), so pow2 widths keep the persistent
                # compile cache warm across corpus-size tweaks
                w = 4
                while w < n:
                    w *= 2
                return w

            # budget check up front (stay within the cache budget like any
            # other resident data): per fraction, inputs [T,Bp,w] at the
            # transfer itemsize + targets/pattypes ~2 x [T,Bp] int32/int8
            bm = self._b_multiple()
            from lstm_rnn_tpu.ops.lstm_cell import DEFAULT_CHUNK
            est = 0
            for s, items in by_shape.items():
                t, b, w = s
                # _pad_fraction rounds T up to the kernel chunk and B to
                # the batch granule — estimate the bytes actually shipped
                tp = -(-t // DEFAULT_CHUNK) * DEFAULT_CHUNK
                bp = -(-b // bm) * bm
                est += (width_of(len(items)) * tp * bp
                        * self._frame_bytes(w))
            # per-fraction entries covered by this pass are reclaimable —
            # the stack supersedes them (popped at stacked dispatch)
            covered = [k for k in keys if k in self._dev_cache]
            reclaim = sum(self._dev_cache[k][1] for k in covered)
            if self._dev_cache_bytes - reclaim + est > self._dev_cache_budget:
                free = (self._dev_cache_budget
                        - (self._dev_cache_bytes - reclaim))
                return self._note_stacked_decline(
                    f"stacked corpus needs ~{est / 2**30:.2f} GiB but only "
                    f"{max(free, 0) / 2**30:.2f} GiB of device_cache_bytes "
                    f"remain (budget {self._dev_cache_budget / 2**30:.2f} "
                    "GiB)")
            if self._dev_cache_bytes + est > self._dev_cache_budget:
                # stack + per-fraction copies don't BOTH fit: supersede now.
                # Otherwise keep the per-fraction entries so grouped passes
                # during the background-compile window reuse them instead
                # of re-assembling the corpus every epoch.
                for k in covered:
                    old = self._dev_cache.pop(k)
                    self._dev_cache_bytes -= old[1]
            entry = {"shapes": {}, "bytes": 0, "pos": {}}
            warm = None
            for s, items in by_shape.items():
                if jax.process_count() == 1:
                    # build each stack on HOST and ship it as ONE transfer:
                    # an on-device stack of O(100) fractions is a single
                    # program over the runtime's per-program resource cliff
                    # (see _host_batch) — the resident stack itself is fine
                    # as a scan operand, only its construction program dies
                    hosts = [self._host_batch(f) for f, _ in items]
                    base = hosts + [hosts[-1]] * (
                        width_of(len(hosts)) - len(hosts))
                    stacks = tuple(
                        self._put_stacked(np.stack([p[i] for p in base]))
                        for i in range(3))
                    self.cache_misses += len(items)
                else:
                    # multi-process: per-shard host arrays can't np.stack
                    # into a global array; keep the jitted device stack
                    # (dryrun-scale shapes only — no cliff risk)
                    devs = [self._device_batch(f) for f, _ in items]
                    base = devs + [devs[-1]] * (
                        width_of(len(devs)) - len(devs))
                    stacks = (self._stack_parts([p[0] for p in base]),
                              self._stack_parts([p[1] for p in base]),
                              self._stack_parts([p[2] for p in base]))
                nbytes = sum(int(a.nbytes) for a in stacks
                             if hasattr(a, "nbytes"))
                self._dev_cache_bytes += nbytes
                entry["bytes"] += nbytes
                entry["shapes"][s] = stacks
                for i, (_, k) in enumerate(items):
                    entry["pos"][k] = i
                if warm is None and jax.process_count() == 1:
                    # epoch-1 compile tax: start the whole-epoch scan's XLA
                    # compile NOW (worker thread, zero-iteration call) so it
                    # overlaps the remaining shapes' host stacking/transfers
                    # instead of serializing after them
                    warm = self._spawn_warm_compile(stacks, update)
            entry["warm"] = warm
            self._stacked[token] = entry
        else:
            pos = entry["pos"]
            if any(k not in pos for k in keys) or any(
                    s not in entry["shapes"] for s in shapes):
                # corpus membership changed (e.g. different subset) — drop
                self._dev_cache_bytes -= entry["bytes"]
                del self._stacked[token]
                return self._try_stacked_epoch(fracs, update, fuse)
            hits = len(keys)
        warm = entry.get("warm")
        if warm is not None:
            # cold-start: don't idle behind the whole-epoch XLA compile —
            # give fast compiles (persistent cache, test shapes) a short
            # grace, then run THIS pass on grouped flushes while the
            # compile finishes in the background. Numerically identical
            # (grouped == stacked is a tested invariant); the stacked path
            # takes over the first pass after the compile lands.
            warm.join(timeout=2.0)
            if warm.is_alive():
                return self._note_stacked_decline(
                    "whole-epoch program still compiling in the background "
                    "— running grouped flushes meanwhile")
            entry["warm"] = None
        self.cache_hits += hits
        # the resident stack supersedes per-fraction cache entries — pop any
        # that grouped epochs re-added while the whole-epoch program was
        # still compiling (build-time popping alone leaves duplicates)
        for k in keys:
            old = self._dev_cache.pop(k, None)
            if old is not None:
                self._dev_cache_bytes -= old[1]
        pos = entry["pos"]
        errs, corrs = [], []
        i, n = 0, len(fracs)
        while i < n:  # one dispatch per consecutive same-shape run
            j = i
            while j < n and shapes[j] == shapes[i]:
                j += 1
            xk, tk, pk = entry["shapes"][shapes[i]]
            perm = np.zeros((int(xk.shape[0]),), np.int32)
            perm[:j - i] = [pos[k] for k in keys[i:j]]
            perm_d, nk = self._put_perm(perm, j - i)
            if update:
                self.params, self.velocity, err, corr = self._train_scan(
                    self.params, self.velocity, xk, tk, pk, perm_d, nk)
            else:
                err, corr = self._eval_scan(self.params, xk, tk, pk,
                                            perm_d, nk)
            errs.append(err)
            corrs.append(corr)
            i = j
        return self._sum_metrics(errs, corrs)

    def _spawn_warm_compile(self, stacks, update: bool):
        """Compile the whole-epoch scan for the first stacked shape on a
        worker thread: an n=0 call runs ZERO fori_loop iterations (the trip
        count is a device scalar, so it is the SAME compiled program every
        group size uses) and leaves params/velocity numerically untouched
        while populating the jit cache. The main thread keeps building the
        remaining shapes' stacks meanwhile (VERDICT r3 #5; single-shape
        corpora have nothing left to overlap and gain ~0)."""
        import threading
        xk, tk, pk = stacks
        perm0 = np.zeros((int(xk.shape[0]),), np.int32)
        perm_d, n0 = self._put_perm(perm0, 0)
        # _train_scan DONATES its params/velocity arguments: feed it COPIES
        # so a warm call that fails mid-execution (transient tunnel/device
        # error) cannot leave self.params pointing at deleted buffers — the
        # live state must never be donated to a best-effort dispatch whose
        # errors are swallowed
        params = jax.tree_util.tree_map(jnp.copy, self.params)
        velocity = (jax.tree_util.tree_map(jnp.copy, self.velocity)
                    if update else None)

        def work():
            try:
                if update:
                    self._train_scan(params, velocity, xk, tk, pk, perm_d,
                                     n0)
                else:
                    self._eval_scan(params, xk, tk, pk, perm_d, n0)
            except Exception:  # noqa: BLE001
                pass  # the real dispatch recompiles and surfaces the error

        th = threading.Thread(target=work, daemon=True)
        th.start()
        return th

    def _lazy_ok(self, ds: DataSet) -> bool:
        """Whether lazy fraction handles (assembly deferred to cache miss)
        are usable for this dataset."""
        return (self.device_cache
                and getattr(ds, "noise_deviation", 1.0) == 0.0
                and not getattr(ds, "sequence_shuffling", False)
                and hasattr(ds, "lazy_fractions"))

    def _fractions(self, ds: DataSet):
        """Lazy handles when the device cache will absorb repeats (host
        assembly is then skipped on every hit — it dominated steady-state
        epoch time); the eager prefetching iterator otherwise."""
        if self._lazy_ok(ds):
            return ds.lazy_fractions()
        return ds.fractions()

    def _process_dataset(self, ds: DataSet, update: bool):
        use_noise = update and self.weight_noise_sigma > 0
        grad_acc = None
        zero_noise = None
        if update and not self.hybrid_online_batch:
            grad_acc = _ZEROS_JIT(self.params)

        # error/accuracy accumulate as DEVICE scalars and are fetched once at
        # the end of the epoch: a per-fraction float(err) would force a host
        # sync every step and serialize the dispatch pipeline (the remote-TPU
        # tunnel adds ~25ms per sync; chained async steps hide it entirely)
        errs = []
        corrs = []

        # fused paths: group runs of same-shape fractions and run each group
        # as one jitted scan — sequential updates in stochastic mode
        # (identical results) or carry-free evaluation. PARTIAL groups pad
        # to the full fuse count by repeating the last fraction's (already
        # device-resident) arrays with valid=0 — the masked scan skips their
        # update and metrics exactly, so every group runs the ONE compiled
        # scan per shape (a K-specialized compile per distinct partial size
        # would cost minutes each on the flagship; K single steps per
        # partial group cost dispatch round trips on the remote tunnel).
        fuse = (self.fuse_fractions
                if ((update and self.hybrid_online_batch and not use_noise)
                    or not update) else 1)
        if fuse > 1:
            fracs = self._fractions(ds)
            if self._lazy_ok(ds):
                # lazy handles are cheap to hold (no arrays until a cache
                # miss) — materialize for the stacked-epoch attempt. The
                # eager iterator stays a STREAM: list()ing it would pin the
                # whole corpus' padded arrays in host RAM at once, and the
                # stacked path needs cache keys the eager Fractions lack.
                fracs = list(fracs)
                res = self._try_stacked_epoch(fracs, update, fuse)
                if res is not None:
                    errs.append(res[0])
                    corrs.append(res[1])
                    return self._sum_metrics(errs, corrs)

            def group_width(frac) -> int:
                """Stack width for this fraction's shape: fuse, byte-capped
                (largest pow2) so the on-device stack program's inputs stay
                under MAX_GROUP_STACK_BYTES — the same per-program resource
                cliff the epoch-resident path routes around in _host_batch.
                Pow2 halving keeps the compiled-program key count low."""
                from lstm_rnn_tpu.ops.lstm_cell import DEFAULT_CHUNK
                t, b, w = frac.shape
                tp = -(-t // DEFAULT_CHUNK) * DEFAULT_CHUNK
                bp = -(-b // self._b_multiple()) * self._b_multiple()
                # total stack bytes (inputs + targets + pattypes): the
                # targets stack is its OWN XLA program in stack_group, and
                # a dense-regression target stack can outweigh the inputs
                per = max(1, tp * bp * self._frame_bytes(w))
                cap = 1
                while (cap * 2 * per <= self.MAX_GROUP_STACK_BYTES
                       and cap * 2 <= fuse):
                    cap *= 2
                return cap

            def stack_group(pending, kf):
                """Per-fraction device batches (cache-aware), stacked ON
                DEVICE — cached fractions transfer nothing. The stack is
                always kf wide (one compiled program per shape): short
                groups repeat the last fraction's arrays, which the dynamic
                trip count never reads."""
                devs = [self._device_batch(f) for f in pending]
                n = len(devs)
                devs = devs + [devs[-1]] * (kf - n)
                xk = self._stack_parts([p[0] for p in devs])
                tk = self._stack_parts([p[1] for p in devs])
                pk = self._stack_parts([p[2] for p in devs])
                perm, nk = self._put_perm(np.arange(kf, dtype=np.int32), n)
                return xk, tk, pk, perm, nk

            pending = []

            def flush():
                if not pending:
                    return
                xk, tk, pk, perm, nk = stack_group(
                    pending, group_width(pending[0]))
                if update:
                    self.params, self.velocity, err, corr = self._train_scan(
                        self.params, self.velocity, xk, tk, pk, perm, nk)
                else:
                    err, corr = self._eval_scan(self.params, xk, tk, pk,
                                                perm, nk)
                errs.append(err)
                corrs.append(corr)
                pending.clear()

            last_shape = None
            for frac in fracs:
                shape = frac.shape
                if pending and (shape != last_shape
                                or len(pending) >= group_width(pending[0])):
                    flush()
                pending.append(frac)
                last_shape = shape
            flush()
            return self._sum_metrics(errs, corrs)

        for frac in self._fractions(ds):
            inputs, targets, pattypes = self._device_batch(frac)
            if not update:
                err, corr = self._eval_step(self.params, inputs, targets, pattypes)
            elif self.hybrid_online_batch:
                if use_noise:
                    noise = self._draw_noise()
                    self.params, self.velocity, err, corr = self._train_step_noisy(
                        self.params, self.velocity, noise, inputs, targets, pattypes)
                else:
                    self.params, self.velocity, err, corr = self._train_step(
                        self.params, self.velocity, inputs, targets, pattypes)
            else:
                if use_noise:
                    noise = self._draw_noise()
                elif zero_noise is None:
                    # one reusable zeros tree (not donated by _accum_step):
                    # a fresh full-parameter allocation per fraction is
                    # pure wasted HBM traffic on the batch-mode hot path
                    zero_noise = noise = _ZEROS_JIT(self.params)
                else:
                    noise = zero_noise
                grad_acc, err, corr = self._accum_step(
                    self.params, grad_acc, noise, inputs, targets, pattypes)
            errs.append(err)
            corrs.append(corr)

        if update and not self.hybrid_online_batch:
            self.params, self.velocity = self._sgd_update(
                self.params, self.velocity, grad_acc)

        return self._sum_metrics(errs, corrs)

    @staticmethod
    def _sum_metrics(errs, corrs):
        """Reduce per-flush metrics to two DEVICE scalars — nothing is
        fetched here. train_epoch dispatches the validation/test passes
        BEFORE converting these to floats, so their dispatch round trips
        overlap the training tail instead of serializing after it."""
        if not errs:
            return None, None
        return _SUM_JIT(list(errs)), _SUM_JIT(list(corrs))

    @staticmethod
    def _fetch_metrics(ds: DataSet, err_dev, corr_dev):
        total_err = float(err_dev) if err_dev is not None else 0.0
        correct = int(corr_dev) if corr_dev is not None else 0
        total_err /= ds.total_sequences
        class_err = 1.0 - correct / ds.total_timesteps
        return total_err, class_err

    def device_cache_stats(self) -> Dict[str, int]:
        """Last epoch's device-cache observability counters."""
        return {"hits": self.cache_hits, "misses": self.cache_misses,
                "entries": len(self._dev_cache),
                "bytes": self._dev_cache_bytes}

    def dispatch_epoch(self) -> Dict[str, Any]:
        """Dispatch one epoch's device work (train + due val/test passes)
        WITHOUT fetching any scalar, and snapshot the end-of-epoch params
        (a device copy — it must happen before a subsequent epoch's
        dispatch consumes the donated buffers). Returns a handle for
        finish_epoch. Callers may dispatch epoch N+1 before finishing N:
        N+1's updates depend only on device state, so the scalar fetch
        latency and host-side dispatch of consecutive epochs overlap."""
        self.cur_epoch += 1
        self.cache_hits = 0
        self.cache_misses = 0

        train_res = self._process_dataset(self.train_set, update=True)
        snap = self._snapshot(self.params)
        # epoch-end velocity copy for pipelined autosave (export_state):
        # the next epoch's dispatch DONATES self.velocity, so the autosave
        # writer needs its own buffers. Off by default — a full extra
        # parameter-tree copy per epoch buys nothing without --autosave.
        snap_v = (self._snapshot(self.velocity)
                  if self.snapshot_velocity else None)

        has_val = (self.validation_set is not None
                   and not self.validation_set.empty)
        do_val = has_val and self.cur_epoch % self.validate_every == 0
        val_res = (self._process_dataset(self.validation_set, update=False)
                   if do_val else None)
        has_test = self.test_set is not None and not self.test_set.empty
        do_test = has_test and self.cur_epoch % self.test_every == 0
        test_res = (self._process_dataset(self.test_set, update=False)
                    if do_test else None)
        return {"epoch": self.cur_epoch, "train": train_res, "snap": snap,
                "snap_v": snap_v,
                "has_val": has_val, "do_val": do_val, "val": val_res,
                "do_test": do_test, "test": test_res,
                "cache": (self.cache_hits, self.cache_misses)}

    def finish_epoch(self, h: Dict[str, Any]) -> bool:
        """Fetch a dispatched epoch's metrics and apply best-tracking /
        stop logic (Optimizer::train, Optimizer.cu:284-324). Returns True
        when training is finished."""
        # report THIS epoch's cache counters even if a later epoch's
        # dispatch already reset them (pipelined callers)
        self.cache_hits, self.cache_misses = h["cache"]
        self.cur_training_error, self.cur_training_class_error = \
            self._fetch_metrics(self.train_set, *h["train"])
        if h["do_val"]:
            self.cur_validation_error, self.cur_validation_class_error = \
                self._fetch_metrics(self.validation_set, *h["val"])
            if self.cur_validation_error < self.lowest_validation_error:
                self.lowest_validation_error = self.cur_validation_error
                self.epochs_since_lowest = 0
                self.best_params = h["snap"]
            else:
                self.epochs_since_lowest += self.validate_every
        elif not h["has_val"]:
            self.epochs_since_lowest = 0
            self.best_params = h["snap"]

        if h["do_test"]:
            self.cur_test_error, self.cur_test_class_error = \
                self._fetch_metrics(self.test_set, *h["test"])

        if (self.epochs_since_lowest >= self.max_epochs_no_best
                or (self.max_epochs >= 0
                    and h["epoch"] >= self.max_epochs)):
            self.params = self.best_params
            self.finished = True
            self.cur_epoch = h["epoch"]  # ignore any over-dispatched epoch
        return self.finished

    def train_epoch(self) -> bool:
        """One epoch; returns True when training is finished
        (Optimizer::train, Optimizer.cu:284-324)."""
        if self.finished:
            return True
        return self.finish_epoch(self.dispatch_epoch())

    # ------------------------------------------------------ state (autosave)
    def _params_to_layer_arrays(self, params) -> List[List[float]]:
        """Reference autosave layout for optimizer weight vectors: one flat
        [input|bias|internal] array per layer position; empty arrays for the
        input and post-output layers (Optimizer.cu:326-341 exports
        m_bestWeights indexed by layer)."""
        from lstm_rnn_tpu import io_currennt as ioc
        out: List[List[float]] = []
        for s in self.specs_all():
            if s.name not in params:
                out.append([])
                continue
            p = jax.tree_util.tree_map(np.asarray, params[s.name])
            if s.type in ioc.LSTM_TYPES:
                inp, bias, internal = ioc.lstm_to_flat(p)
            else:
                inp, bias, internal = ioc.ff_to_flat(p)
            # float64 ARRAY, not a list: io_currennt.dump_doc_json formats
            # large arrays natively; import_state's np.asarray reads both
            out.append(np.concatenate([inp, bias, internal]).astype(np.float64))
        return out

    def _params_from_layer_arrays(self, arrays: List[List[float]]):
        from lstm_rnn_tpu import io_currennt as ioc
        params = {}
        prev = None
        for s, arr in zip(self.specs_all(), arrays):
            if s.type == "input" or s.type in ioc.POSTOUTPUT_TYPES:
                prev = s.size
                continue
            flat = np.asarray(arr, dtype=np.float32)
            if s.type in ioc.LSTM_TYPES:
                n_in = 4 * s.size * prev
                n_b = 4 * s.size
                params[s.name] = ioc.lstm_from_flat(
                    flat[:n_in], flat[n_in:n_in + n_b], flat[n_in + n_b:],
                    prev, s.size, ioc.LSTM_TYPES[s.type])
            else:
                n_in = s.size * prev
                params[s.name] = ioc.ff_from_flat(
                    flat[:n_in], flat[n_in:n_in + s.size], prev, s.size)
            prev = s.size
        return params

    def specs_all(self):
        return self.net.specs

    @staticmethod
    def _snapshot(tree):
        return _COPY_JIT(tree)

    def exact_params(self, tree=None):
        """Current (or given) parameter tree in the exact CURRENNT layout,
        stripping the padded training view if active.

        The unpad runs as ONE jitted program (memoized — a fresh jax.jit
        wrapper per call would recompile every time) and the fetch as one
        device_get: eager slicing dispatched hundreds of individual ops,
        each a ~25 ms round trip on the remote tunnel, which made every
        autosave export seconds long (tpu_r5_epoch_autosave2.log)."""
        tree = self.params if tree is None else tree
        if self.padded:
            tree = self._unpad_jit(tree)
        return jax.device_get(tree)

    def export_state(self, cur_epoch: int = None,
                     velocity=None) -> Dict[str, Any]:
        """Optimizer state for the autosave JSON (Optimizer.cu:326-341,
        SteepestDescentOptimizer.cu:118-123), format-compatible with
        reference autosave files.

        cur_epoch / velocity: epoch-end overrides for PIPELINED autosave —
        once the next epoch is dispatched, self.cur_epoch is one ahead and
        self.velocity already belongs to it (donated buffers); the caller
        passes the finished epoch's number and its dispatch handle's
        velocity snapshot (dispatch_epoch "snap_v") instead."""
        vel = self.velocity if velocity is None else velocity
        out = self.export_state_meta(cur_epoch)
        out.update(self.export_state_arrays(self.best_params, vel))
        return out

    def export_state_meta(self, cur_epoch: int = None) -> Dict[str, Any]:
        """The host-scalar half of export_state — cheap; pipelined autosave
        captures it on the CALLING thread (epoch N+1's finish overwrites
        these attributes while the dump worker runs)."""
        return {
            "optimizer_finished": self.finished,
            "optimizer_cur_epoch": (self.cur_epoch if cur_epoch is None
                                    else cur_epoch),
            "optimizer_epochs_since_lowest_error": self.epochs_since_lowest,
            "optimizer_lowest_validation_error": self.lowest_validation_error,
            "optimizer_cur_training_error": self.cur_training_error,
            "optimizer_cur_validation_error": self.cur_validation_error,
            "optimizer_cur_test_error": self.cur_test_error,
            "optimizer_cur_training_class_error": self.cur_training_class_error,
            "optimizer_cur_validation_class_error": self.cur_validation_class_error,
            "optimizer_cur_test_class_error": self.cur_test_class_error,
        }

    def export_state_arrays(self, best_params, velocity) -> Dict[str, Any]:
        """The device-fetch half of export_state: best weights + momentum
        deltas in the reference layer-array layout. Single-process callers
        may run this on a worker thread (the unpad dispatches + host
        transfers cost ~seconds over a remote tunnel at flagship scale);
        multi-host MUST call it on the main thread — jitted unpad on
        global arrays runs on every process and a worker-thread dispatch
        could interleave with the main stream's collectives."""
        return {
            "optimizer_best_weights":
                self._params_to_layer_arrays(self.exact_params(best_params)),
            "steepest_descent_optimizer_weight_deltas":
                self._params_to_layer_arrays(self.exact_params(velocity)),
        }

    def import_state(self, doc: Dict[str, Any]) -> None:
        self.finished = bool(doc["optimizer_finished"])
        self.cur_epoch = int(doc["optimizer_cur_epoch"])
        self.epochs_since_lowest = int(doc["optimizer_epochs_since_lowest_error"])
        self.lowest_validation_error = float(doc["optimizer_lowest_validation_error"])
        self.cur_training_error = float(doc["optimizer_cur_training_error"])
        self.cur_validation_error = float(doc["optimizer_cur_validation_error"])
        self.cur_test_error = float(doc["optimizer_cur_test_error"])
        self.cur_training_class_error = float(doc["optimizer_cur_training_class_error"])
        self.cur_validation_class_error = float(doc["optimizer_cur_validation_class_error"])
        self.cur_test_class_error = float(doc["optimizer_cur_test_class_error"])
        bw = self._params_from_layer_arrays(doc["optimizer_best_weights"])
        vd = self._params_from_layer_arrays(
            doc["steepest_descent_optimizer_weight_deltas"])
        if self.padded:
            bw = self.net.pad_params(bw)
            vd = self.net.pad_params(vd)
        if self.mesh is not None:
            from lstm_rnn_tpu.parallel.mesh import replicate
            bw = replicate(self.mesh, jax.tree_util.tree_map(np.asarray, bw))
            vd = replicate(self.mesh, jax.tree_util.tree_map(np.asarray, vd))
        self.best_params = jax.tree_util.tree_map(jnp.asarray, bw)
        self.velocity = jax.tree_util.tree_map(jnp.asarray, vd)
