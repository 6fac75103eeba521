"""On-device VMEM validation for the fused LSTM kernel chunk size.

Mosaic's scoped-vmem stack usage is scheduler-dependent and the analytic
model in ops/lstm_cell.py admittedly underestimates it (its budgets are
anchored on hand-run device measurements — VMEM_BUDGET). Rather than trust
the model for NEW (width, dtype, chunk) points, this module AOT-compiles
the actual forward+backward kernels at a candidate chunk size and records
the verdict (compiled cleanly vs "Scoped allocation ... exceeded") in a
small on-disk table keyed by device kind. `pick_chunk` consults the table
first, so a shape point probed once auto-selects its chunk forever —
including points the analytic model would get wrong in either direction.

Probing happens EAGERLY (Trainer init / CLI setup), never inside a trace:
an AOT `.lower().compile()` per candidate, nothing executed — safe on a
single-client TPU tunnel. Each verdict costs one extra kernel compile,
once per machine lifetime.
"""

from __future__ import annotations

import json
import os
import threading
from typing import Dict, Optional

_LOCK = threading.Lock()
_MEM: Optional[Dict[str, bool]] = None

_CANDIDATES = (16, 8, 4, 2, 1)  # descending powers of two <= DEFAULT_CHUNK


def _cache_path() -> str:
    return os.environ.get(
        "LSTM_RNN_TPU_PROBE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "lstm_rnn_tpu",
                     "vmem_probe.json"))


def _load() -> Dict[str, bool]:
    global _MEM
    if _MEM is None:
        # packaged defaults: verdicts probed on known device kinds ship with
        # the framework (vmem_probe_defaults.json), so fresh machines get
        # the validated flagship chunks without paying the probe compiles;
        # the user cache overrides/extends them
        _MEM = {}
        defaults = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "vmem_probe_defaults.json")
        for path in (defaults, _cache_path()):
            try:
                with open(path) as f:
                    _MEM.update({k: bool(v) for k, v in json.load(f).items()})
            except (OSError, ValueError):
                pass
    return _MEM


def _save() -> None:
    path = _cache_path()
    try:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + f".tmp{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(_MEM, f, indent=0, sort_keys=True)
        os.replace(tmp, path)
    except OSError:
        pass  # cache is an optimization; never fail the run for it


def _device_kind() -> str:
    import jax
    return jax.devices()[0].device_kind.replace(" ", "_")


# Bump whenever the fused kernels' VMEM footprint changes shape — stale
# verdicts for an older kernel must not leak into the new one.
# k3: verdicts gained a chunk-count (nc) component. The backward kernel's
# scoped-VMEM stack GROWS with the time-chunk grid size before saturating
# (measured round 5: f32 c16 at (h128,p128,b56) compiles at NC<=16 but
# overflows at NC=32 with 17.68M and NC=47 with 16.98M — non-monotonic
# past the knee), so a verdict is only evidence at the grid size it
# compiled at. k2's shape-only keys let a True probed at the old 2-chunk
# probe T bless a 47-chunk production program that died at device compile
# (tpu_r5_epoch_cold.log).
KERNEL_VERSION = "k3"


def _key(hp: int, pp: int, bp: int, ch: int, compute_dtype,
         carry: bool = False, nc: int = 0) -> str:
    from lstm_rnn_tpu.ops.lstm_cell import _storage, _use3
    mode = "x3" if _use3(compute_dtype) else ""
    # the carry-capable kernel's GRADIENT has a larger backward footprint
    # (explicit-state blocks) — its verdicts must not be confused with the
    # plain kernels' (fused_vmem_bytes carry note)
    fam = "|cr" if carry else ""
    return (f"{_device_kind()}|{KERNEL_VERSION}|h{hp}|p{pp}|b{bp}|c{ch}|"
            f"n{nc}|{_storage(compute_dtype).name}{mode}{fam}")


def lookup_chunk(T: int, hp: int, pp: int, bp: int,
                 compute_dtype, carry: bool = False) -> Optional[int]:
    """Largest device-VALIDATED chunk dividing T — validated AT T's grid
    size (nc = T/ch): NC-dependence means a verdict recorded for another
    T is not evidence for this one. None if this exact point has no
    positive verdict (pick_chunk then falls back to the analytic model,
    whose budgets are anchored at saturated-NC device observations and
    stay conservative at small NC). Reads the table only — never
    compiles."""
    table = _load()
    for ch in _CANDIDATES:
        if T % ch:
            continue
        if table.get(_key(hp, pp, bp, ch, compute_dtype, carry,
                          nc=T // ch)):
            return ch
    return None


def known_unfit(T: int, hp: int, pp: int, bp: int, compute_dtype,
                carry: bool = False) -> bool:
    """True when the on-device probe has RECORDED that no chunk fits this
    (shape, T) point: an explicit False verdict at chunk=1
    (ensure_validated walks candidates largest-first and only reaches 1
    after every larger chunk failed). Table read only — never compiles;
    False when unprobed, so callers keep their analytic fallback for
    unseen points."""
    return _load().get(_key(hp, pp, bp, 1, compute_dtype, carry,
                            nc=T)) is False


def _probe_compile(hp: int, pp: int, bp: int, ch: int, compute_dtype,
                   carry: bool = False, T: int = 0) -> bool:
    """AOT-compile fwd+bwd fused kernels at chunk=ch and time length T
    (the CALLER'S real padded T — the scoped-VMEM stack depends on the
    chunk-grid size, see KERNEL_VERSION k3 note); True iff Mosaic accepts
    the footprint. Nothing is executed.

    carry=True compiles the carry-capable kernel's gradient instead (D=1,
    grads flowing to h0/c0 and through the final state — sequence
    parallelism's block-scan footprint, which adds explicit-state blocks
    to the backward)."""
    import jax
    import jax.numpy as jnp

    from lstm_rnn_tpu.ops import lstm_cell as lc

    if not T:
        T = 2 * ch
    D = 1 if carry else 2
    sdt = lc._storage(compute_dtype)

    # the production program runs BOTH backward variants — interior
    # layers with dx (preceding-layer error) and the first layer with
    # need_dx=False — and Mosaic's scoped-VMEM scheduling is variant-
    # dependent, so a verdict must mean "both compile" (the k2 crash was
    # a need_dx=False first-layer kernel blessed by a dx=True probe at
    # the wrong grid size)
    def make_grad(need_dx):
        if carry:
            def loss(x, w_in, w_rec, peep, bias, lengths, h0, c0, dh):
                h, (hf, cf) = lc.lstm_scan_fused_carry(
                    x, w_in, w_rec, peep, bias, lengths, h0, c0, 1.0,
                    True, False, jnp.dtype(compute_dtype), need_dx)
                return (jnp.sum(h.astype(jnp.float32) * dh)
                        + jnp.sum(hf) + jnp.sum(cf))

            nums = (0, 1, 2, 3, 4, 6, 7) if need_dx else (1, 2, 3, 4, 6, 7)
            return jax.grad(loss, argnums=nums)

        def loss(x, w_in, w_rec, peep, bias, lengths, dh):
            h = lc.lstm_scan_fused(x, w_in, w_rec, peep, bias, lengths,
                                   1.0, True, False,
                                   jnp.dtype(compute_dtype), need_dx)
            return jnp.sum(h.astype(jnp.float32) * dh)

        nums = (0, 1, 2, 3, 4) if need_dx else (1, 2, 3, 4)
        return jax.grad(loss, argnums=nums)
    shapes = (
        jax.ShapeDtypeStruct((T, bp, pp), jnp.float32),
        jax.ShapeDtypeStruct((D, pp, 4 * hp), jnp.float32),
        jax.ShapeDtypeStruct((D, hp, 4 * hp), jnp.float32),
        jax.ShapeDtypeStruct((D, 3, hp), jnp.float32),
        jax.ShapeDtypeStruct((D, 4 * hp), jnp.float32),
        jax.ShapeDtypeStruct((bp,), jnp.int32),
    ) + ((
        jax.ShapeDtypeStruct((D, bp, hp), jnp.float32),
        jax.ShapeDtypeStruct((D, bp, hp), jnp.float32),
    ) if carry else ()) + (
        jax.ShapeDtypeStruct((T, bp, D * hp), jnp.float32),
    )
    old = lc._chunk_override
    lc._chunk_override = ch
    try:
        return (_compiles(make_grad(True), shapes)
                and _compiles(make_grad(False), shapes))
    finally:
        lc._chunk_override = old


# ---------------------------------------------------------------- tail probe
# Same machinery for the fused softmax+CE tail kernels (ops/softmax_ce.py):
# their analytic row caps (_row_block/_proj_rows) are conservative stream
# counts, so a device verdict — when one has been recorded — takes priority
# in both directions: a probed LARGER row block claws back grid overhead,
# and a probed "no rows fit" verdict forces the materialized-logits
# fallback before a Mosaic compile failure can surface mid-training.

# Bump whenever the tail kernels' VMEM footprint changes shape.
TAIL_VERSION = "t1"


def _tail_key(P: int, Sp: int, rows: int, compute_dtype, proj: bool) -> str:
    from lstm_rnn_tpu.ops.lstm_cell import _storage, _use3
    if proj:
        # the x3 (hi/lo f32 matmul) mode changes the proj kernels' _kdot
        # temporaries; the plain tail has no matmul, so its footprint is
        # mode-independent and the suffix would only orphan verdicts
        mode = "x3" if _use3(compute_dtype) else ""
        fam = f"tailproj|P{P}"
    else:
        mode = ""
        fam = "tail"
    return (f"{_device_kind()}|{TAIL_VERSION}|{fam}|S{Sp}|r{rows}|"
            f"{_storage(compute_dtype).name}{mode}")


def _tail_candidates(P: int, Sp: int, compute_dtype, proj: bool):
    """Descending row candidates down to the sublane granularity. The walk
    STARTS a couple of steps above the analytic cap (the conservative
    stream-count model usually underestimates what Mosaic accepts, so a
    probed larger block claws back grid overhead) but not at the static
    maximum — starting at 2048 for a wide Sp would burn several guaranteed
    overflow compiles before the first plausible candidate."""
    from lstm_rnn_tpu.ops import softmax_ce as sc
    base = sc._PROJ_ROWS if proj else sc._ROWS
    if proj:
        floor = sc._proj_rows(base, P, Sp, compute_dtype, analytic_only=True)
    else:
        floor = sc._row_block(base, Sp, analytic_only=True)
    rows = min(base, max(8, 4 * floor))
    out = []
    while rows >= 8:
        out.append(rows)
        rows //= 2
    return out


def lookup_tail_rows(N: int, P: int, Sp: int, compute_dtype,
                     proj: bool) -> Optional[int]:
    """Largest device-VALIDATED row block for this tail shape point,
    shrunk to divide N (smaller blocks than a validated one always fit —
    the row-independent VMEM residents dominate the failure modes), or
    None when unprobed (callers fall back to the analytic cap). Table
    read only — never compiles."""
    table = _load()
    rows = 2048
    while rows >= 8:
        if table.get(_tail_key(P, Sp, rows, compute_dtype, proj)):
            while N % rows:
                rows //= 2
            return rows
        rows //= 2
    return None


def tail_known_unfit(P: int, Sp: int, compute_dtype, proj: bool) -> bool:
    """True when the device probe RECORDED that even the smallest candidate
    row block (8, the sublane granularity — ensure_tail_validated always
    walks down to it on total failure) overflows for this tail point
    (proj_tail_fits then forces the materialized-logits fallback). False
    when unprobed."""
    table = _load()
    if table.get(_tail_key(P, Sp, 8, compute_dtype, proj)) is not False:
        return False
    rows = 2048
    while rows >= 8:
        if table.get(_tail_key(P, Sp, rows, compute_dtype, proj)):
            return False
        rows //= 2
    return True


def _compiles(fn, shapes) -> bool:
    """AOT-compile fn at the given avals; True iff Mosaic accepts the
    scoped-VMEM footprint (overflows surface as XlaRuntimeError carrying a
    'scoped allocation ... exceeded' message). Nothing is executed. Shared
    by the LSTM-chunk and tail-rows probes so the overflow-vs-real-error
    classification stays in one place."""
    import jax
    try:
        jax.jit(fn).lower(*shapes).compile()
        return True
    except Exception as e:
        msg = str(e).lower()
        # Only a positively-identified Mosaic VMEM overflow may persist a
        # False verdict (observed forms: "Scoped allocation of ... exceeded"
        # and "... exceeds available vmem"). A transient tunnel/RPC error
        # whose message merely contains "exceeded" (resource-limit RPCs)
        # must NOT poison the on-disk table — re-raise it instead.
        if "exceed" in msg and ("scoped" in msg or "vmem" in msg):
            return False
        raise


def _tail_probe_compile(P: int, Sp: int, rows: int, compute_dtype,
                        proj: bool) -> bool:
    """AOT-compile the fused tail fwd+bwd at a forced row block; True iff
    Mosaic accepts the scoped-VMEM footprint. Nothing is executed."""
    import jax
    import jax.numpy as jnp

    from lstm_rnn_tpu.ops import softmax_ce as sc

    N = 2 * rows  # two grid steps: exercises the revisited accumulators
    tc = jax.ShapeDtypeStruct((N, 1), jnp.int32)
    old = sc._rows_override
    sc._rows_override = rows
    try:
        if proj:
            def loss(h, W, b, tc):
                return sc.softmax_ce_proj_fused(
                    h, W, b, tc, Sp - 1, 1.0, False,
                    jnp.dtype(compute_dtype))[0]

            g = jax.grad(loss, argnums=(0, 1, 2))
            shapes = (jax.ShapeDtypeStruct((N, P), jnp.float32),
                      jax.ShapeDtypeStruct((P, Sp), jnp.float32),
                      jax.ShapeDtypeStruct((Sp,), jnp.float32), tc)
        else:
            from lstm_rnn_tpu.ops.lstm_cell import _storage

            def loss(a, tc):
                return sc.softmax_ce_fused(a, tc, Sp - 1, False,
                                           _storage(compute_dtype))[0]

            g = jax.grad(loss)
            shapes = (jax.ShapeDtypeStruct((N, Sp), jnp.float32), tc)
        return _compiles(g, shapes)
    finally:
        sc._rows_override = old


# ---------------------------------------------------------------- wide tail
# The LVCSR-scale wide tail's backward kernel (softmax_ce_wide_fused) is
# blocked in BOTH grid axes; its VMEM footprint depends on (P, SB, rows,
# dtype) but NOT on the total state count, so one probed verdict per
# (P, dtype) covers every wide net on this machine.

def _wide_key(P: int, sb: int, rows: int, compute_dtype) -> str:
    from lstm_rnn_tpu.ops.lstm_cell import _storage, _use3
    mode = "x3" if _use3(compute_dtype) else ""
    return (f"{_device_kind()}|{TAIL_VERSION}|tailwide|P{P}|S{sb}|r{rows}|"
            f"{_storage(compute_dtype).name}{mode}")


def _wide_candidates(P: int, compute_dtype):
    """(SB, rows) candidates, best-first: the analytic pick, one clawback
    step above it, then the descending ladder below it."""
    from lstm_rnn_tpu.ops import softmax_ce as sc
    pick = sc._wide_analytic(P, compute_dtype)
    if pick is None:
        pick = (128, 8)
    sb0, rows0 = pick
    out = []
    if rows0 * 2 <= sc._WIDE_ROWS:
        out.append((sb0, rows0 * 2))  # claw back grid overhead if it fits
    sb, rows = sb0, rows0
    while True:
        out.append((sb, rows))
        if rows > 8:
            rows //= 2
        elif sb > 128:
            sb //= 2
            rows = rows0
        else:
            return out


def lookup_wide_blocks(P: int, compute_dtype):
    """Largest device-VALIDATED (SB, rows) for the wide backward kernel at
    this (P, dtype), or None when unprobed. Table read only."""
    table = _load()
    for sb, rows in _wide_candidates(P, compute_dtype):
        if table.get(_wide_key(P, sb, rows, compute_dtype)):
            return sb, rows
    return None


def wide_known_unfit(P: int, compute_dtype) -> bool:
    """True when the probe RECORDED that even the smallest (128, 8) block
    overflows for this (P, dtype). False when unprobed."""
    table = _load()
    if table.get(_wide_key(P, 128, 8, compute_dtype)) is not False:
        return False
    return lookup_wide_blocks(P, compute_dtype) is None


def _wide_probe_compile(P: int, sb: int, rows: int, compute_dtype) -> bool:
    """AOT-compile the wide tail fwd+bwd at forced (SB, rows); True iff
    Mosaic accepts the scoped-VMEM footprint. Nothing is executed."""
    import jax
    import jax.numpy as jnp

    from lstm_rnn_tpu.ops import softmax_ce as sc

    N = 2 * rows
    spw = 2 * sb  # two column blocks: exercises the revisited dW blocks
    # only the BACKWARD blocks are forced: the forward's row block keeps
    # its own analytic cap (_row_block), shared with the plain tail
    old_wide = sc._wide_override
    sc._wide_override = (sb, rows)
    try:
        def loss(h, W, b, tc):
            return sc.softmax_ce_wide_fused(
                h, W, b, tc, spw - 1, 1.0, False,
                jnp.dtype(compute_dtype))[0]

        g = jax.grad(loss, argnums=(0, 1, 2))
        shapes = (jax.ShapeDtypeStruct((N, P), jnp.float32),
                  jax.ShapeDtypeStruct((P, spw), jnp.float32),
                  jax.ShapeDtypeStruct((spw,), jnp.float32),
                  jax.ShapeDtypeStruct((N, 1), jnp.int32))
        return _compiles(g, shapes)
    finally:
        sc._wide_override = old_wide


# ---------------------------------------------------------------- mask probe
# The streaming step_mask rides the INFERENCE-ONLY forward, so maskless
# VMEM verdicts remain valid fit evidence (fused_vmem_bytes' with_mask
# note) — but round 4 proved fit is not the only device failure mode: the
# mask block's LAYOUT must satisfy Mosaic's (8,128) tile rule, checked in
# the Pallas TPU lowering pass, and neither interpret-mode tests nor the
# maskless probe families ever build the mask operand. This family
# AOT-compiles the masked carry-kernel forward (the exact serving program,
# primal only — gradients with step_mask raise by design) at the chunk
# serving will pick; a tile/lane lowering rejection is recorded like an
# overflow, so streaming routes to the scan backend instead of dying at
# first dispatch. Off-TPU the probe still runs the full Pallas->Mosaic
# LOWERING pass via cross-platform lowering (lowering_platforms=("tpu",))
# — the layout checks are host-independent — which is how the CPU suite
# regression-tests the round-4 failure class for real.

# Bump when the masked forward's operand layout changes shape.
MASK_VERSION = "m1"


def _mask_key(hp: int, pp: int, bp: int, ch: int, compute_dtype,
              nc: int = 0, carry_t: int = 0) -> str:
    from lstm_rnn_tpu.ops.lstm_cell import _storage, _use3
    mode = "x3" if _use3(compute_dtype) else ""
    # carry_t: the RAW serving chunk length when it differs from the
    # 16-padded T — a different static argument to the kernel, hence a
    # different Mosaic program needing its own verdict. Suffix only when
    # set, so the (common) carry_t == T case keeps the shipped keys.
    ct = f"|ct{carry_t}" if carry_t else ""
    return (f"{_device_kind()}|{KERNEL_VERSION}{MASK_VERSION}|mask|h{hp}|"
            f"p{pp}|b{bp}|c{ch}|n{nc}|{_storage(compute_dtype).name}"
            f"{mode}{ct}")


def _mask_compiles(fn, shapes) -> bool:
    """Like _compiles, but (a) off-TPU it cross-platform-lowers for the
    TPU target — the Pallas TPU lowering pass (where Mosaic's tile/lane
    layout rules are enforced) runs on any host; only the scoped-VMEM
    check needs the real device — and (b) a positively-identified layout
    rejection persists a False verdict like an overflow does. Anything
    else re-raises (transient errors must not poison the table)."""
    import jax
    try:
        traced = jax.jit(fn).trace(*shapes)
        if jax.default_backend() == "tpu":
            traced.lower().compile()
        else:
            traced.lower(lowering_platforms=("tpu",))
        return True
    except Exception as e:
        msg = str(e).lower()
        if "exceed" in msg and ("scoped" in msg or "vmem" in msg):
            return False  # device scoped-VMEM overflow
        if "pallas tpu lowering" in msg and "block shape" in msg:
            return False  # Mosaic tile/lane layout rejection (round-4 class)
        raise


def _mask_probe_compile(hp: int, pp: int, bp: int, ch: int,
                        compute_dtype, T: int = 0,
                        carry_t: int = 0) -> bool:
    """AOT-build the masked carry-kernel inference forward at chunk=ch
    and the caller's real padded T — the exact program
    Network.apply_streaming dispatches (D=1, explicit (h0, c0), [B, T]
    step mask, carry captured at carry_t: the RAW serving chunk length,
    which differs from T when --stream_chunk is not a multiple of 16).
    Nothing is executed."""
    import jax
    import jax.numpy as jnp

    from lstm_rnn_tpu.ops import lstm_cell as lc

    if not T:
        T = 2 * ch  # two chunks: exercises the mask block's index map
    if not carry_t:
        carry_t = T
    h4 = 4 * hp

    def fwd(x, w_in, w_rec, peep, bias, lengths, h0, c0, m):
        return lc.lstm_scan_fused_carry(
            x, w_in, w_rec, peep, bias, lengths, h0, c0, 1.0, True, False,
            jnp.dtype(compute_dtype), True, carry_t, 0, m)

    shapes = (
        jax.ShapeDtypeStruct((T, bp, pp), jnp.float32),
        jax.ShapeDtypeStruct((1, pp, h4), jnp.float32),
        jax.ShapeDtypeStruct((1, hp, h4), jnp.float32),
        jax.ShapeDtypeStruct((1, 3, hp), jnp.float32),
        jax.ShapeDtypeStruct((1, h4), jnp.float32),
        jax.ShapeDtypeStruct((bp,), jnp.int32),
        jax.ShapeDtypeStruct((1, bp, hp), jnp.float32),
        jax.ShapeDtypeStruct((1, bp, hp), jnp.float32),
        jax.ShapeDtypeStruct((bp, T), jnp.float32),
    )
    old = lc._chunk_override
    lc._chunk_override = ch
    try:
        return _mask_compiles(fwd, shapes)
    finally:
        lc._chunk_override = old


def mask_known_unfit(T: int, hp: int, pp: int, bp: int, ch: int,
                     compute_dtype, carry_t: int = 0) -> bool:
    """True when the mask probe RECORDED a rejection (layout or overflow)
    for the masked streaming forward at exactly this (shape, chunk, T,
    carry_t) point. False when unprobed — lstm_forward_streaming's fused
    route then proceeds, and ensure_mask_validated is the eager gate that
    probes before first dispatch. Table read only — never compiles."""
    if carry_t == T:
        carry_t = 0
    return _load().get(_mask_key(hp, pp, bp, ch, compute_dtype,
                                 nc=T // ch, carry_t=carry_t)) is False


def ensure_mask_validated(T: int, hp: int, pp: int, bp: int, compute_dtype,
                          verbose: bool = True, carry_t: int = 0) -> int:
    """Validate the masked carry-kernel forward at THE chunk streaming
    serving will pick for this shape — compiled at the serving T itself.
    No downward walk: serving must run the chunk the probe blessed, so a
    rejection routes it to the scan backend (mask_known_unfit) rather
    than silently serving an unprobed smaller chunk. Records the verdict;
    returns the validated chunk, or 0 on rejection. Call EAGERLY (CLI
    streaming setup) — never inside a trace.

    carry_t: the RAW serving chunk length when --stream_chunk is not a
    16-multiple — a different static kernel argument than carry_t == T,
    so the probe must compile (and key) that exact variant."""
    from lstm_rnn_tpu.ops.lstm_cell import pick_chunk
    if carry_t == T:
        carry_t = 0
    with _LOCK:
        ch = pick_chunk(T, hp, pp, bp, compute_dtype, with_mask=True)
        table = _load()
        key = _mask_key(hp, pp, bp, ch, compute_dtype, nc=T // ch,
                        carry_t=carry_t)
        verdict = table.get(key)
        if verdict is None:
            if verbose:
                ct = f", carry_t={carry_t}" if carry_t else ""
                print(f"vmem_probe: compiling masked streaming forward "
                      f"(h={hp}, p={pp}, b={bp}, chunk={ch}, T={T}{ct}) "
                      "...", flush=True)
            verdict = _mask_probe_compile(hp, pp, bp, ch, compute_dtype,
                                          T=T, carry_t=carry_t)
            table[key] = verdict
            _save()
        return ch if verdict else 0


def ensure_wide_validated(P: int, compute_dtype, verbose: bool = True):
    """Probe (SB, rows) candidates (best-first) for the wide tail at this
    (P, dtype) point; record every verdict on disk. Returns the validated
    (SB, rows), or None when even (128, 8) overflows. Call EAGERLY on the
    target backend — never inside a trace."""
    with _LOCK:
        table = _load()
        for sb, rows in _wide_candidates(P, compute_dtype):
            key = _wide_key(P, sb, rows, compute_dtype)
            verdict = table.get(key)
            if verdict is None:
                if verbose:
                    print(f"vmem_probe: compiling wide tail (P={P}, "
                          f"SB={sb}, rows={rows}) ...", flush=True)
                verdict = _wide_probe_compile(P, sb, rows, compute_dtype)
                table[key] = verdict
                _save()
            if verdict:
                return sb, rows
        return None


def ensure_tail_validated(P: int, Sp: int, compute_dtype, proj: bool,
                          verbose: bool = True) -> int:
    """Probe candidate row blocks (largest first) for the fused tail at
    this (P, Sp, dtype) point; record every verdict on disk. Returns the
    validated rows, or 0 when even the smallest candidate overflows.
    Call EAGERLY on the target backend — never inside a trace."""
    with _LOCK:
        table = _load()
        for rows in _tail_candidates(P, Sp, compute_dtype, proj):
            key = _tail_key(P, Sp, rows, compute_dtype, proj)
            verdict = table.get(key)
            if verdict is None:
                if verbose:
                    fam = "proj tail" if proj else "tail"
                    print(f"vmem_probe: compiling {fam} (P={P}, Sp={Sp}, "
                          f"rows={rows}) ...", flush=True)
                verdict = _tail_probe_compile(P, Sp, rows, compute_dtype,
                                              proj)
                table[key] = verdict
                _save()
            if verdict:
                return rows
        return 0


def ensure_validated(T: int, hp: int, pp: int, bp: int, compute_dtype,
                     verbose: bool = True, carry: bool = False) -> int:
    """Probe candidate chunks (largest first) until one compiles on this
    device AT TIME LENGTH T — the real padded T the caller will dispatch,
    since the backward kernel's scoped-VMEM stack depends on the
    chunk-grid size (k3 note); record every verdict on disk keyed by
    (shape, chunk, nc). Returns the validated chunk, or 0 when even
    chunk=1 overflows (caller falls back to lax.scan / TP). Call EAGERLY
    on the target backend — never inside a trace. carry=True probes the
    carry-kernel gradient family ("|cr" keys — sequence-parallel
    training)."""
    with _LOCK:
        table = _load()
        for ch in _CANDIDATES:
            if T % ch:
                continue
            key = _key(hp, pp, bp, ch, compute_dtype, carry, nc=T // ch)
            verdict = table.get(key)
            if verdict is None:
                if verbose:
                    from lstm_rnn_tpu.ops.lstm_cell import fused_vmem_bytes
                    est = fused_vmem_bytes(hp, pp, bp, compute_dtype, ch,
                                           carry=carry)
                    fam = "carry " if carry else ""
                    print(f"vmem_probe: compiling {fam}(h={hp}, p={pp}, "
                          f"b={bp}, chunk={ch}, T={T}) [model estimate "
                          f"{est / 2**20:.1f} MiB] ...", flush=True)
                verdict = _probe_compile(hp, pp, bp, ch, compute_dtype,
                                         carry, T=T)
                table[key] = verdict
                _save()
            if verdict:
                return ch
        return 0
