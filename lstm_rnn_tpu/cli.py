"""CLI driver: `python -m lstm_rnn_tpu.cli [options] [options-file]`.

Reproduces the `currennt` binary's behavior (`currennt/src/main.cpp`):
train mode with the epoch table, autosave/continue, best-network saving and
final trained-network export; forward-pass mode with single_csv / csv / htk
writers. Device selection replaces CUDA device picking: jax backend chosen
by --device (auto = TPU when available).
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback
from typing import List, Optional

import numpy as np

from lstm_rnn_tpu import io_currennt as ioc
from lstm_rnn_tpu.config import Config, parse_config
from lstm_rnn_tpu.data.dataset import DataSet
from lstm_rnn_tpu.network import Network
from lstm_rnn_tpu.trainer import Trainer
from lstm_rnn_tpu import writers


def _select_device(cfg: Config):
    import jax
    if cfg.compilation_cache_dir:
        # persistent XLA executable cache: repeat runs (same shapes) skip
        # the first-epoch compiles entirely
        os.makedirs(cfg.compilation_cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir",
                          cfg.compilation_cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    # multi-host wiring must run BEFORE the first backend query: it extends
    # device discovery to every process in the job (parallel/distributed.py)
    from lstm_rnn_tpu.parallel.distributed import maybe_initialize
    if cfg.device == "cpu" or (cfg.device == "auto" and not cfg.cuda):
        jax.config.update("jax_platforms", "cpu")
        maybe_initialize(cfg.coordinator_address, cfg.num_processes,
                         cfg.process_id)
        devs = jax.devices()
    else:
        maybe_initialize(cfg.coordinator_address, cfg.num_processes,
                         cfg.process_id)
        # accelerator init can fail transiently on single-client tunnels;
        # ensure_backend retries by re-exec'ing the process
        from lstm_rnn_tpu.utils.device import ensure_backend
        devs = ensure_backend()
    n_proc = jax.process_count()
    host = f" on {n_proc} hosts" if n_proc > 1 else ""
    print(f"Using device #0 ({devs[0].device_kind}), {len(devs)} "
          f"available{host}")
    return devs


def _load_dataset(cfg: Config, which: str) -> Optional[DataSet]:
    if which == "train":
        files, frac = cfg.training_files, cfg.train_fraction
        frac_shuf, seq_shuf = cfg.shuffle_fractions, cfg.shuffle_sequences
        noise, trunc, sort = cfg.input_noise_sigma, cfg.truncate_seq, True
    elif which == "val":
        files, frac = cfg.validation_files, cfg.val_fraction
        frac_shuf = seq_shuf = False
        noise, trunc, sort = 0.0, 0, True
    elif which == "test":
        files, frac = cfg.test_files, cfg.test_fraction
        frac_shuf = seq_shuf = False
        noise, trunc, sort = 0.0, 0, True
    else:  # feedforward; input noise applies if sigma > 0 (README:169-171)
        files, frac = cfg.feedforward_input_files, 1.0
        frac_shuf = seq_shuf = False
        noise, trunc, sort = cfg.input_noise_sigma, 0, False
    if not files:
        return None
    # forward mode always buckets fraction lengths: with unsorted sequences
    # every distinct max length is a fresh XLA compile (minutes each on the
    # flagship — hours for a corpus); padding is numerically inert and
    # get_outputs slices by true length, so bucketing never changes output
    bucket = cfg.bucket_lengths or which == "ff"
    print(f"Loading {which} set " + " ".join(f"'{f}'" for f in files) + " ...")
    ds = DataSet(files, parallel_sequences=cfg.parallel_sequences, fraction=frac,
                 trunc_seq_length=trunc, fraction_shuffling=frac_shuf,
                 sequence_shuffling=seq_shuf, noise_deviation=noise,
                 input_left_context=cfg.input_left_context,
                 input_right_context=cfg.input_right_context,
                 output_time_lag=cfg.output_time_lag, sort_by_length=sort,
                 seed=cfg.random_seed, bucket_lengths=bucket,
                 bucket_major_shuffle=cfg.bucket_major_shuffle,
                 cache_path=cfg.cache_path)
    print(f"Loaded fraction:  {int(frac*100)}%")
    print(f"Sequences:        {ds.total_sequences}")
    print(f"Sequence lengths: {ds.min_seq_length}..{ds.max_seq_length}")
    print(f"Total timesteps:  {ds.total_timesteps}")
    print()
    return ds


def _print_layers(net: Network):
    print("Layers:")
    total = 0
    for i, s in enumerate(net.specs):
        n_weights = 0
        if s.name in net.params:
            import jax
            n_weights = sum(int(np.prod(p.shape))
                            for p in jax.tree_util.tree_leaves(net.params[s.name]))
        line = f"({i}) {s.type} [size: {s.size}"
        if s.name in net.params:
            line += f", bias: {s.bias:.1f}, weights: {n_weights}"
        print(line + "]")
        total += n_weights
    print(f"Total weights: {total}\n")


def _is_coordinator() -> bool:
    import jax
    return jax.process_index() == 0


def _save_autosave(cfg: Config, net: Network, trainer: Trainer,
                   info_rows: str, h=None):
    """Export + dump one epoch's autosave. Returns the worker thread doing
    the JSON dump + file write (None off-coordinator); the caller joins it
    before the next save and before exiting (one write in flight — the
    host serialization, ~0.8 s at LVCSR scale with the native formatter,
    then overlaps the next epoch's device work instead of serializing the
    epoch table).

    h: the finished epoch's dispatch handle (pipelined callers): once the
    next epoch is dispatched, trainer.params/velocity/cur_epoch already
    belong to IT, so the epoch-end weights/deltas/number are read from the
    handle's donation-safe snapshots instead. Single-process, the state
    export and device fetches run on the worker thread too (scalars
    captured by value first); under multi-host they stay on the CALLING
    thread — jitted exports run on global arrays on every process, and
    collectives from a worker thread could interleave with the main
    dispatch stream — so only the pure-host dump moves to the thread.

    The TERMINAL epoch's autosave stores the RESTORED best weights, not
    the stop epoch's end-of-epoch snapshot: the reference restores inside
    Optimizer::train (Optimizer.cu:318) before main.cpp:276-277 saves
    state, so a --continue from a finished autosave resumes on the best
    weights — finish_epoch has already set trainer.params = best_params
    when trainer.finished is True."""
    import threading

    extra = {
        "configuration": cfg.serialized_options,
        "info_rows": info_rows.replace("\n", ";;;"),
    }
    epoch = trainer.cur_epoch if h is None else h["epoch"]
    prefix = cfg.autosave_prefix
    name = (prefix + "_" if prefix else "") + f"epoch{epoch:03d}.autosave"
    snap = None if (h is None or trainer.finished) else h["snap"]
    vel = (trainer.velocity if (h is None or h["snap_v"] is None)
           else h["snap_v"])
    holder = []  # worker exception, re-raised by _join_saver

    import jax
    if jax.process_count() > 1 or h is None:
        # multi-host: the export's jitted unpad runs on global arrays on
        # EVERY process and must stay on the calling thread (a worker
        # dispatch could interleave with the main stream's collectives);
        # only the pure-host dump threads off, on the coordinator.
        # h is None (non-pipelined caller): same synchronous contract —
        # without a handle there are no donation-safe snapshots, so a
        # caller that dispatched another epoch before joining would have
        # the worker read donated trainer.params/velocity buffers
        extra.update(trainer.export_state_meta(
            cur_epoch=None if h is None else h["epoch"]))
        extra.update(trainer.export_state_arrays(trainer.best_params, vel))
        net.params = trainer.exact_params(snap)
        if not _is_coordinator():
            return None
        params_np = net.params  # captured: the loop reassigns net.params

        def dump():
            try:
                ioc.save_network_json(name, net.layers_json(), params_np,
                                      extra=extra)
            except BaseException as e:  # noqa: BLE001 — re-raised at join
                holder.append(e)
    else:
        # single process, pipelined (h given): the device fetches move to
        # the worker too — measured on the TPU tunnel
        # (tpu_r5_epoch_autosave.log), the main-thread export cost
        # ~3.6 s/epoch against 0.15 s stacked epochs, dwarfing the dump
        # it was supposed to overlap. Capture epoch-N state NOW: scalars
        # by VALUE (epoch N+1's finish overwrites the attributes), trees
        # by REFERENCE (finish replaces the attributes with fresh trees;
        # the captured ones are donation-safe snapshots or never-donated
        # copies).
        meta = trainer.export_state_meta(cur_epoch=h["epoch"])
        best_ref = trainer.best_params
        params_ref = trainer.params if snap is None else snap
        layers = net.layers_json()

        def dump():
            try:
                extra.update(meta)
                extra.update(trainer.export_state_arrays(best_ref, vel))
                ioc.save_network_json(name, layers,
                                      trainer.exact_params(params_ref),
                                      extra=extra)
            except BaseException as e:  # noqa: BLE001 — re-raised at join
                holder.append(e)

    t = threading.Thread(target=dump, name="autosave-dump")
    t.holder = holder
    t.start()
    return t


def _join_saver(t):
    """Join an autosave dump thread, re-raising any exception it hit: a
    failed checkpoint write (disk full, permissions) must abort the run
    loudly, exactly as the old on-main-thread save did — not silently
    train on for days with no autosaves landing."""
    t.join()
    if t.holder:
        raise t.holder[0]


def _auto_model_devices(net: Network, parallel_sequences: int,
                        n_devices: int) -> int:
    """--model_devices 0: smallest TP shard count (a divisor of the device
    count dividing every LSTM layer's cells) that brings each cell back
    inside the single-chip fused-kernel VMEM budget. Heuristic: the TP path
    runs the sharded lax.scan cell, so "fits the fused kernel" is a proxy
    for "narrow enough per chip"; returns 1 when nothing is too wide (or no
    valid shard count exists — lstm_forward then falls back to lax.scan)."""
    if n_devices <= 1:
        return 1
    import jax
    from lstm_rnn_tpu import io_currennt as ioc
    from lstm_rnn_tpu.ops.lstm_cell import (batch_granule, fused_fits,
                                            round_up)
    if jax.default_backend() != "tpu" or net.backend == "scan":
        return 1
    bp = round_up(max(1, parallel_sequences), batch_granule(net.compute_dtype))
    lstm_layers = []  # (h, pp) per LSTM layer
    for spec, (kind, _idx, prev_w, _hp) in zip(net.specs[1:-1],
                                               net._pad_plan()):
        if kind != "lstm":
            continue
        d = 2 if ioc.LSTM_TYPES[spec.type] else 1
        lstm_layers.append((spec.size // d, round_up(prev_w, 128)))
    if not lstm_layers:
        return 1
    # one shard count serves the whole net (validate_tp requires it to
    # divide EVERY layer's per-direction cells), so candidates are the
    # device-count divisors dividing all h — smallest-first
    valid = [k for k in range(1, n_devices + 1)
             if n_devices % k == 0
             and all(h % k == 0 for h, _ in lstm_layers)]
    need = 1
    for h, pp in lstm_layers:
        m = next((k for k in valid
                  if fused_fits(round_up(-(-h // k), 128), pp, bp,
                                net.compute_dtype)), None)
        if m is None:
            return 1  # no valid shard count fits this layer: lax.scan
        need = max(need, m)
    return need


def train_mode(cfg: Config) -> int:
    network_file = cfg.continue_file or cfg.network
    print(f"Reading network from '{network_file}'... ", end="")
    net_doc = ioc.load_network_json(network_file)
    print("done.\n")

    train_set = _load_dataset(cfg, "train")
    if train_set is None:
        raise RuntimeError("no train_file given")
    val_set = _load_dataset(cfg, "val")
    test_set = _load_dataset(cfg, "test")

    if cfg.f32_matmul == "3x":
        from lstm_rnn_tpu.ops import lstm_cell
        lstm_cell.F32_MATMUL_3X = True
    net = Network(net_doc["layers"], net_doc.get("weights"),
                  input_size_override=train_set.input_pattern_size,
                  backend=cfg.lstm_backend,
                  compute_dtype=cfg.compute_dtype)
    net.remat_blocks = cfg.remat_blocks
    if train_set.output_pattern_size != net.target_size:
        raise RuntimeError("Post output layer size != target pattern size of the training set")
    net.init_params(cfg.random_seed, dist=cfg.weights_dist,
                    uniform_min=cfg.weights_uniform_min,
                    uniform_max=cfg.weights_uniform_max,
                    normal_mean=cfg.weights_normal_mean,
                    normal_sigma=cfg.weights_normal_sigma,
                    init_rng=cfg.init_rng)
    _print_layers(net)

    if cfg.optimizer != "steepest_descent":
        raise RuntimeError("Unknown optimizer type")

    # multi-chip parallelism (replaces the reference's single-GPU
    # selection, main.cpp:507-541): shard the fraction batch axis over a
    # jax Mesh ("data"); --model_devices adds a second mesh axis sharding
    # LSTM cells Megatron-style (parallel/tensor.py). --num_devices 0 =
    # all available, 1 (default) = no mesh. Multi-host jobs always span
    # every process's devices (collectives need all participants), riding
    # ICI in-host and DCN across hosts.
    import jax
    mesh = None
    multihost = jax.process_count() > 1
    n_avail = len(jax.devices())
    n = cfg.num_devices if cfg.num_devices > 0 else n_avail
    if multihost:
        n = n_avail
    if n > n_avail:
        raise RuntimeError(
            f"num_devices={n} but only {n_avail} devices available")
    if cfg.num_devices == 1 and not multihost:
        n = 1
    model_devices = cfg.model_devices
    if model_devices == 0:
        # an explicit pipeline/sequence request wins over the TP
        # auto-heuristic
        model_devices = (1 if cfg.pipeline_devices > 1
                         or cfg.seq_devices > 1 else
                         _auto_model_devices(net, cfg.parallel_sequences, n))
        if model_devices > 1:
            print(f"Tensor parallelism auto-engaged: model_devices="
                  f"{model_devices} (an LSTM layer exceeds the single-chip "
                  "fused-kernel VMEM budget)")
    pp = cfg.pipeline_devices
    sp = cfg.seq_devices
    pipe_mesh = None
    seq_mesh = None
    if pp > 1 and model_devices > 1:
        raise RuntimeError(
            "pipeline_devices > 1 does not combine with model_devices")
    if sp > 1 and (model_devices > 1 or pp > 1):
        raise RuntimeError(
            "seq_devices > 1 does not combine with model_devices or "
            "pipeline_devices")
    if sp > 1:
        # composed DP x SP when num_devices (the TOTAL count) exceeds sp:
        # B shards over 'data', T over 'seq' within each data shard
        from lstm_rnn_tpu.parallel.mesh import composed_mesh
        seq_mesh, composed = composed_mesh(n, sp, "seq", "seq_devices")
        if composed:
            mesh = seq_mesh
            print(f"DP x SP mesh: {dict(mesh.shape)}")
        else:
            print(f"Sequence-parallel mesh: {dict(seq_mesh.shape)} "
                  "(time axis sharded)")
    elif model_devices > 1:
        if n <= 1:
            raise RuntimeError("model_devices > 1 requires num_devices > 1")
        from lstm_rnn_tpu.parallel.mesh import make_mesh_2d
        mesh = make_mesh_2d(n, model_devices)
        print(f"DP x TP mesh: {dict(mesh.shape)}")
    elif pp > 1:
        # composed DP x PP: stages pipeline within each data shard
        from lstm_rnn_tpu.parallel.mesh import composed_mesh
        pipe_mesh, composed = composed_mesh(n, pp, "pipe",
                                            "pipeline_devices")
        if composed:
            mesh = pipe_mesh
            print(f"DP x PP mesh: {dict(mesh.shape)}")
        else:
            print(f"Pipeline mesh: {dict(pipe_mesh.shape)} "
                  f"({len(net.specs) - 2} hidden layers over {pp} stages)")
    elif n > 1:
        from lstm_rnn_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(n)
        hosts = (f" over {jax.process_count()} hosts"
                 if multihost else "")
        print(f"Data-parallel mesh: {dict(mesh.shape)}{hosts}")

    max_epochs = cfg.max_epochs if cfg.max_epochs != 2**32 - 1 else -1
    trainer = Trainer(
        net, train_set, val_set, test_set,
        learning_rate=cfg.learning_rate, momentum=cfg.momentum,
        max_epochs=max_epochs, max_epochs_no_best=cfg.max_epochs_no_best,
        validate_every=cfg.validate_every, test_every=cfg.test_every,
        hybrid_online_batch=cfg.hybrid_online_batch,
        weight_noise_sigma=cfg.weight_noise_sigma, seed=cfg.random_seed,
        fuse_fractions=cfg.fuse_fractions, mesh=mesh, pipe_mesh=pipe_mesh,
        seq_mesh=seq_mesh,
        pipeline_microbatches=cfg.pipeline_microbatches,
        device_cache=cfg.device_cache)

    info_rows = ""
    if cfg.continue_file:
        print(f"Restoring state from '{cfg.continue_file}'...")
        doc = json.load(open(cfg.continue_file))
        info_rows = doc.get("info_rows", "").replace(";;;", "\n")
        trainer.import_state(doc)

    classification = net.is_classification
    print("Starting training...\n")
    print(" Epoch | Duration |  Training error  | Validation error |    Test error    | New best | Throughput")
    print("-------+----------+------------------+------------------+------------------+----------+-----------")
    sys.stdout.write(info_rows)

    err_space = "                  |"

    def fmt_err(err, cls_err):
        if classification:
            return f"{cls_err*100:6.2f}%{err:10.3f} |"
        return f"{err:17.3f} |"

    # pipelined epochs: epoch N+1's device work is dispatched BEFORE epoch
    # N's scalar metrics are fetched, so the fetch sync and the host-side
    # dispatch of consecutive epochs overlap device compute. An early stop
    # may have over-dispatched one epoch — finish_epoch restores the best
    # weights, so the saved network is identical either way. --autosave
    # stays pipelined (round 5): each epoch's weight/velocity snapshots
    # ride its dispatch handle (donation-safe copies) and the JSON dump
    # runs on a worker thread, so serialization overlaps the next epoch's
    # device work instead of serializing the table.
    pipeline = True
    trainer.snapshot_velocity = bool(cfg.autosave)
    saver = None  # in-flight autosave dump (at most one write in flight)
    finished = trainer.finished  # a restored autosave may already be done
    pending = None
    t0 = time.time()
    while not finished:
        if pending is None:
            if cfg.profile_dir and trainer.cur_epoch == 0:
                import jax
                with jax.profiler.trace(cfg.profile_dir):
                    pending = trainer.dispatch_epoch()
            else:
                pending = trainer.dispatch_epoch()
        nxt = None
        if pipeline and not (max_epochs >= 0
                             and pending["epoch"] >= max_epochs):
            nxt = trainer.dispatch_epoch()
        finished = trainer.finish_epoch(pending)
        duration = time.time() - t0
        t0 = time.time()
        row = f" {pending['epoch']:5d} | "
        row += f"{duration:8.1f} |"
        row += fmt_err(trainer.cur_training_error, trainer.cur_training_class_error)

        # empty validation/test sets print blank columns (main.cpp:251),
        # not a stale error value (dispatch_epoch gates on ds.empty)
        did_val = pending["do_val"]
        row += (fmt_err(trainer.cur_validation_error, trainer.cur_validation_class_error)
                if did_val else err_space)
        did_test = pending["do_test"]
        row += (fmt_err(trainer.cur_test_error, trainer.cur_test_class_error)
                if did_test else err_space)
        done = pending  # the finished epoch's handle (autosave snapshots)
        pending = nxt

        fps = train_set.total_timesteps / max(duration, 1e-9)
        if did_val:
            if trainer.epochs_since_lowest == 0:
                row += "  yes   "
                if cfg.autosave_best:
                    base = cfg.autosave_prefix or os.path.splitext(cfg.network)[0]
                    net.params = trainer.exact_params(trainer.best_params)
                    if _is_coordinator():
                        net.save(base + ".best.jsn")
            else:
                row += "  no    "
        else:
            row += "        "
        row += f"| {fps:,.0f} fr/s"
        if trainer.device_cache:
            st = trainer.device_cache_stats()
            lookups = st["hits"] + st["misses"]
            if lookups:
                row += (f"  [cache {st['hits']}/{lookups} hit, "
                        f"{st['bytes'] / 2**20:.0f} MiB]")
        row += "\n"
        sys.stdout.write(row)
        sys.stdout.flush()
        info_rows += row

        if cfg.autosave:
            if saver is not None:
                _join_saver(saver)  # serialize writes: one dump in flight
            saver = _save_autosave(cfg, net, trainer, info_rows, h=done)

    if saver is not None:
        _join_saver(saver)  # the last autosave lands before the final save
    print()
    if trainer.epochs_since_lowest >= cfg.max_epochs_no_best:
        print(f"No new lowest error since {cfg.max_epochs_no_best} epochs. Training stopped.")
    else:
        print("Maximum number of training epochs reached. Training stopped.")
    if val_set is not None and not val_set.empty:
        print(f"Lowest validation error: {trainer.lowest_validation_error}")
    else:
        print(f"Final training set error: {trainer.cur_training_error}")
    print()
    print(f"Storing the trained network in '{cfg.save_network}'... ", end="")
    net.params = trainer.exact_params()
    if _is_coordinator():
        net.save(cfg.save_network)
    print("done.")
    return 0


def _serving_devices(cfg: Config) -> int:
    """Resolve the device count for forward-mode serving meshes (the DP,
    streaming-DP, pipeline and seq branches all share this).

    Multi-host jobs always span every process's devices (the same rule as
    train_mode: every process participates in every collective, so
    --num_devices cannot shrink a global mesh); single-host runs honor the
    flag, validated against what is actually available.

    NOTE: --num_devices defaults to 1, so an explicit `--num_devices 1` is
    indistinguishable from "unset" — multi-host runs treat 1 as unset and
    expand to all devices WITHOUT the override notice below (a notice on
    the default value would print on every default multi-host run)."""
    import jax
    n_avail = len(jax.devices())
    if jax.process_count() > 1:
        if cfg.num_devices not in (0, 1, n_avail):
            print(f"Multi-host forward pass spans all {n_avail} global "
                  "devices (--num_devices ignored: every process must "
                  "participate)")
        return n_avail
    n = cfg.num_devices if cfg.num_devices != 0 else n_avail
    if n > n_avail:
        raise RuntimeError(
            f"num_devices={n} but only {n_avail} devices available")
    return n


def forward_mode(cfg: Config) -> int:
    import jax
    if jax.process_count() > 1 and (cfg.pipeline_devices > 1
                                    or cfg.seq_devices > 1
                                    or cfg.stream_chunk > 0):
        # only plain data-parallel serving is multi-host capable: the
        # pipeline/seq meshes ignore the process layout and streaming
        # carries per-host state; run those single-host
        raise RuntimeError(
            "pipeline/seq/streaming serving is single-host; multi-host "
            "forward passes run plain data-parallel serving (every host "
            "computes its batch shard, the coordinator writes)")
    print(f"Reading network from '{cfg.network}'... ", end="")
    net_doc = ioc.load_network_json(cfg.network)
    print("done.\n")
    ff_set = _load_dataset(cfg, "ff")
    if ff_set is None:
        raise RuntimeError("no ff_input_file given")
    net = Network(net_doc["layers"], net_doc.get("weights"),
                  input_size_override=ff_set.input_pattern_size,
                  backend=cfg.lstm_backend,
                  compute_dtype=cfg.compute_dtype)
    # --remat_blocks is a TRAINING memory lever (backward residuals);
    # forward mode has no backward pass, so it is deliberately not applied
    net.init_params(cfg.random_seed)
    _print_layers(net)

    import jax
    use_padded = (any(s.type in ("lstm", "blstm") for s in net.specs)
                  and jax.default_backend() == "tpu"
                  and cfg.lstm_backend in ("auto", "pallas")
                  # the seq/streaming paths serve the exact layout — don't
                  # build and transfer a padded parameter view they would
                  # discard
                  and cfg.seq_devices <= 1 and cfg.stream_chunk <= 0)
    # device-convert ONCE: leaving a numpy pytree here would re-upload the
    # full weight tree on every jitted call (per fraction — and per CHUNK
    # in streaming mode), which dominates on the ~25 ms/call remote tunnel
    fwd_params = jax.tree_util.tree_map(
        jax.numpy.asarray,
        net.pad_params(net.params) if use_padded else net.params)
    if cfg.pipeline_devices > 1 and cfg.seq_devices > 1:
        raise RuntimeError(
            "seq_devices > 1 does not combine with pipeline_devices")
    if cfg.stream_chunk > 0 and (cfg.pipeline_devices > 1
                                 or cfg.seq_devices > 1):
        # must fire BEFORE the dispatch chain below: the pipeline/seq
        # branches would otherwise win and silently ignore --stream_chunk
        raise RuntimeError(
            "stream_chunk does not combine with pipeline_devices or "
            "seq_devices")
    if cfg.pipeline_devices > 1:
        # pipeline-parallel serving: stages over a 'pipe' mesh, composed
        # with data parallelism when --num_devices > pipeline_devices
        # (mirrors train_mode's mesh construction)
        pp = cfg.pipeline_devices
        from lstm_rnn_tpu.parallel.pipeline import (apply_pipelined,
                                                    stage_ranges)
        stage_ranges(len(net.specs) - 2, pp)  # fail early, not mid-trace
        n = _serving_devices(cfg)
        from lstm_rnn_tpu.parallel.mesh import composed_mesh
        pipe_mesh, composed = composed_mesh(n, pp, "pipe",
                                            "pipeline_devices")
        print(("DP x PP" if composed else "Pipeline")
              + f" mesh: {dict(pipe_mesh.shape)}")
        apply_fn = jax.jit(lambda p, xx, pp_: apply_pipelined(
            net, p, xx, pp_, pipe_mesh, padded=use_padded,
            microbatches=cfg.pipeline_microbatches))
    elif cfg.seq_devices > 1:
        # sequence-parallel serving: the time axis shards over a 'seq'
        # mesh, composed with data parallelism when --num_devices exceeds
        # it (mirrors train_mode's mesh construction). Blocks run the
        # carry-capable fused kernel on TPU (scan elsewhere); weights pad
        # per block, so the padded fused-kernel VIEW does not apply.
        sp = cfg.seq_devices
        from lstm_rnn_tpu.parallel.sequence import apply_seq
        n = _serving_devices(cfg)
        from lstm_rnn_tpu.parallel.mesh import composed_mesh
        seq_mesh, composed = composed_mesh(n, sp, "seq", "seq_devices")
        print(("DP x SP" if composed else "Sequence-parallel")
              + f" mesh: {dict(seq_mesh.shape)}")
        apply_fn = jax.jit(
            lambda p, xx, pp_: apply_seq(net, p, xx, pp_, seq_mesh))
    elif cfg.stream_chunk > 0:
        # chunked serving: each fraction's sequences stream through the
        # net in --stream_chunk-frame slices with carried LSTM state —
        # output equal to the whole-sequence scan-backend forward (the
        # online serving mode; unidirectional nets only, validated up
        # front). Chunks follow --lstm_backend like any forward: on TPU
        # (auto/pallas) each chunk runs the carry-capable fused kernel
        # with a per-step validity mask, so the scan and kernel serving
        # paths agree to float rounding, not byte-for-byte.
        net.init_stream_state(1)  # rejects bidirectional nets early
        chunk = cfg.stream_chunk
        nd = _serving_devices(cfg)
        # every fraction serves at ONE batch width (the full
        # parallel_sequences, mesh-divisible): a smaller trailing fraction
        # would otherwise dispatch the masked kernel at an UNPROBED bp —
        # sidestepping the eager device validation below — and cost a
        # fresh XLA compile of the chunk program per distinct batch size
        btgt = max(1, cfg.parallel_sequences)
        if nd > 1:
            btgt += -btgt % nd
        if (jax.default_backend() == "tpu"
                and net.backend in ("auto", "pallas")):
            # eagerly device-validate the MASKED carry-kernel forward at
            # each LSTM layer's serving shape before the first chunk
            # dispatches: round 4 proved interpret tests cannot catch
            # Mosaic tile/lane layout errors, and a rejection recorded
            # here routes lstm_forward_streaming to the scan backend
            # (mask_known_unfit) instead of dying mid-stream
            from lstm_rnn_tpu import io_currennt as _ioc
            from lstm_rnn_tpu.ops.lstm_cell import fused_padded_dims
            from lstm_rnn_tpu.ops.vmem_probe import ensure_mask_validated
            prev = net.specs[0].size
            for s in net.specs[1:-1]:
                if s.type in _ioc.LSTM_TYPES:
                    # btgt/chunk are the exact width/length apply_fn
                    # serves at — same padding rules as the kernel's
                    hp, pp, bp, tp = fused_padded_dims(
                        s.size, prev, btgt, chunk, net.compute_dtype)
                    # serving dispatches carry_t = the raw --stream_chunk;
                    # probe that exact variant (carry_t == tp when the
                    # chunk is a 16-multiple — the suffix-free key)
                    ok = ensure_mask_validated(tp, hp, pp, bp,
                                               net.compute_dtype,
                                               carry_t=chunk)
                    if not ok:
                        print(f"Streaming: layer '{s.name}' rejected by "
                              "the masked-kernel device probe; chunks run "
                              "the scan backend")
                prev = s.size
        step = jax.jit(net.apply_streaming)
        import jax.numpy as jnp
        mesh = None
        if nd > 1:
            # data-parallel streaming: the batch of concurrent streams
            # shards over the 'data' mesh; the carried per-layer (h, c)
            # states shard on the same axis and stay sharded across chunks
            from lstm_rnn_tpu.parallel.mesh import (make_mesh, replicate,
                                                    shard_batch)
            mesh = make_mesh(nd)
            print(f"Data-parallel streaming mesh: {dict(mesh.shape)}")
            fwd_params = replicate(mesh, fwd_params)

        def apply_fn(p, xx, pp_):
            t, b = xx.shape[0], xx.shape[1]
            xx = jnp.asarray(xx)
            pp_ = jnp.asarray(pp_)
            bpad = max(btgt, b) - b  # fixed batch width, see btgt above
            if bpad:  # NONE columns up to the width, sliced back below
                xx = jnp.pad(xx, ((0, 0), (0, bpad), (0, 0)))
                pp_ = jnp.pad(pp_, ((0, 0), (0, bpad)))
            # pad T up to a chunk multiple with PATTYPE_NONE frames so
            # every slice compiles to ONE (chunk, B) program — otherwise
            # each distinct T%chunk remainder costs a fresh XLA compile
            # (dominant on the remote tunnel). The mask zeroes padded
            # steps; the tail is stripped below.
            pad = -t % chunk
            if pad:
                xx = jnp.pad(xx, ((0, pad), (0, 0), (0, 0)))
                pp_ = jnp.pad(pp_, ((0, pad), (0, 0)))
            state = net.init_stream_state(b + bpad)
            if mesh is not None:
                xx = shard_batch(mesh, xx, 1)
                pp_ = shard_batch(mesh, pp_, 1)
                state = jax.tree_util.tree_map(
                    lambda a: shard_batch(mesh, a, 1), state)
            outs = []
            for lo in range(0, t + pad, chunk):
                y, state = step(p, xx[lo:lo + chunk], pp_[lo:lo + chunk],
                                state)
                outs.append(y)
            return jnp.concatenate(outs, axis=0)[:t, :b]
        print(f"Streaming forward: {chunk}-frame chunks, carried LSTM "
              "state")
    else:
        base = jax.jit(net.apply_padded if use_padded else net.apply)
        nd = _serving_devices(cfg)
        if nd > 1:
            # data-parallel serving: each fraction's batch axis shards
            # over a 'data' mesh (the same axis train mode uses); batches
            # pad up to the mesh size with NONE columns and the output
            # slices back, so any parallel_sequences works
            import jax.numpy as jnp

            from lstm_rnn_tpu.parallel.mesh import (make_mesh, replicate,
                                                    shard_batch)
            mesh = make_mesh(nd)
            hosts = (f" over {jax.process_count()} hosts"
                     if jax.process_count() > 1 else "")
            print(f"Data-parallel serving mesh: {dict(mesh.shape)}{hosts}")
            fwd_params = replicate(mesh, fwd_params)
            if jax.process_count() > 1:
                # every host computes its batch shard; the posterior
                # tensor comes back REPLICATED so the coordinator can read
                # all sequences for writing (host reads of a B-sharded
                # global array would need the other hosts' shards)
                from jax.sharding import NamedSharding, PartitionSpec
                base = jax.jit(net.apply_padded if use_padded
                               else net.apply,
                               out_shardings=NamedSharding(
                                   mesh, PartitionSpec()))

            def apply_fn(p, xx, pp_):
                b = xx.shape[1]
                pad = -b % nd
                xx = jnp.asarray(xx)
                pp_ = jnp.asarray(pp_)
                if pad:
                    xx = jnp.pad(xx, ((0, 0), (0, pad), (0, 0)))
                    pp_ = jnp.pad(pp_, ((0, 0), (0, pad)))
                xs = shard_batch(mesh, xx, 1)
                ps = shard_batch(mesh, pp_, 1)
                return base(p, xs, ps)[:, :b]
        else:
            apply_fn = base

    means = stdevs = None
    if (cfg.revert_std and not ff_set.is_classification
            and ff_set.has_output_standardization):
        if ff_set.output_pattern_size != net.output_size:
            # silently broadcasting a mismatched mean/stdev vector over the
            # outputs would corrupt every written value
            raise RuntimeError(
                f"revert_std: the data's target size "
                f"({ff_set.output_pattern_size}) does not match the "
                f"network's output size ({net.output_size}); pass "
                "--revert_std false for dummy-target inference data")
        means, stdevs = ff_set.output_means, ff_set.output_stdevs
        print("Outputs will be scaled by mean and standard deviation specified in NC file.")

    lag = cfg.output_time_lag
    fmt = cfg.ff_output_format
    first = True
    frac_idx = 0
    for frac in ff_set.fractions():
        frac_idx += 1
        print(f"Computing outputs for data fraction {frac_idx}...", end="", flush=True)
        y = apply_fn(fwd_params, frac.inputs, frac.pattypes)
        if _is_coordinator():
            tags, outs = net.get_outputs(y, frac.seq_info)
            if fmt == "single_csv":
                writers.write_single_csv(cfg.ff_output_file, tags, outs, lag,
                                         means, stdevs, append=not first)
            elif fmt == "csv":
                writers.write_csv(cfg.ff_output_file, tags, outs, lag,
                                  means, stdevs)
            else:
                writers.write_htk(cfg.ff_output_file, tags, outs, lag,
                                  means, stdevs,
                                  feature_period=cfg.feature_period,
                                  kind=cfg.ff_output_kind)
        first = False
        print(" done.")
    return 0


def _echo_settings(cfg: Config):
    """Startup echo of the effective settings (Configuration.cpp:312-369)."""
    if cfg.train:
        mode = "hybrid online/batch" if cfg.hybrid_online_batch else "batch"
        print(f"Started in {mode} training mode.")
        if cfg.shuffle_fractions:
            print(f"Mini-batches ({cfg.parallel_sequences} sequences each) "
                  "will be shuffled during training.")
        if cfg.shuffle_sequences:
            print("Sequences will be shuffled within and across mini-batches "
                  "during training.")
        if cfg.input_noise_sigma:
            print("Using input noise with a standard deviation of "
                  f"{cfg.input_noise_sigma}.")
        print(f"The trained network will be written to '{cfg.save_network}'.")
        if os.path.exists(cfg.save_network):
            print(f"WARNING: The output file '{cfg.save_network}' already "
                  "exists. It will be overwritten!")
        if cfg.validation_files:
            print(f"Validation error will be calculated every "
                  f"{cfg.validate_every} epochs.")
        if cfg.test_files:
            print(f"Test error will be calculated every {cfg.test_every} epochs.")
        stop = "Training will be stopped"
        if cfg.max_epochs != 2**32 - 1:
            stop += f" after {cfg.max_epochs} epochs or"
        print(stop + " if there is no new lowest validation error within "
              f"{cfg.max_epochs_no_best} epochs.")
        if cfg.autosave:
            print("Autosave after EVERY EPOCH enabled.")
        if cfg.autosave_best:
            print("Autosave on BEST VALIDATION ERROR enabled.")
        dist = ("Normal distribution with mean=" f"{cfg.weights_normal_mean}"
                f" and sigma={cfg.weights_normal_sigma}"
                if cfg.weights_dist == "normal" else
                f"Uniform distribution with range [{cfg.weights_uniform_min}, "
                f"{cfg.weights_uniform_max}]")
        print(f"{dist}. Random seed: {cfg.random_seed}")
    else:
        print("Started in forward pass mode.")
        print("The forward pass output will be written to "
              f"'{cfg.ff_output_file}'.")
    print()


def main(argv: Optional[List[str]] = None) -> int:
    cfg = parse_config(argv)
    if cfg.list_devices:
        import jax
        devs = jax.devices()
        print(f"{len(devs)} devices found")
        for i, d in enumerate(devs):
            print(f"{i}: {d.device_kind}")
        return 0
    _select_device(cfg)
    import jax
    if jax.process_count() > 1 and jax.process_index() != 0:
        # secondary hosts participate in every computation but stay silent;
        # file writes are separately gated on the coordinator
        sys.stdout = open(os.devnull, "w")
    _echo_settings(cfg)
    try:
        if cfg.train:
            return train_mode(cfg)
        return forward_mode(cfg)
    except Exception as e:
        print(f"FAILED: {e}")
        traceback.print_exc(file=sys.stderr)
        return 2


if __name__ == "__main__":
    sys.exit(main())
