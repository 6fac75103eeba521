"""Multi-host (DCN) process wiring for pod-slice training.

The reference is a single process on a single GPU (`main.cpp:526-541`);
TPU pod slices beyond one host (v5e-16 and up) are multi-PROCESS: each host
runs one process owning its local chips, and `jax.distributed.initialize`
joins them into one global device set. Collectives then ride ICI within a
host/slice and DCN across hosts — XLA picks the fabric, the framework only
lays out shardings (SURVEY.md §2.7 consequence).

Design: every process loads the SAME DataSet (deterministic order — the
shuffling RNGs are seeded identically), so the fraction stream is globally
consistent without any metadata exchange; each host then TRANSFERS only its
own B/num_processes slice of every fraction to its local devices
(`host_local_slice` + `jax.make_array_from_process_local_data`). Replicated
state (params, optimizer velocity) is built with
`multihost_utils.host_local_array_to_global_array` semantics via
`make_array_from_callback`, which transfers one copy per local device.

Used by the CLI via --coordinator_address/--num_processes/--process_id
(or auto-detected from standard cluster env vars by
`jax.distributed.initialize`'s cluster-environment probing).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np


def maybe_initialize(coordinator_address: str = "",
                     num_processes: int = 0,
                     process_id: int = -1,
                     local_device_ids: Optional[str] = "") -> bool:
    """Join the global process group when multi-process flags/env are set.

    Returns True when running multi-process (after initialize), False for
    plain single-process runs. Explicit flags win; otherwise standard
    cluster env vars (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    JAX_PROCESS_ID, or a TPU pod's metadata) are auto-detected by
    `jax.distributed.initialize()` itself.
    """
    env_coord = os.environ.get("JAX_COORDINATOR_ADDRESS", "")
    if not coordinator_address and not env_coord:
        return False
    kwargs = {}
    if coordinator_address:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes > 0:
        kwargs["num_processes"] = num_processes
    if process_id >= 0:
        kwargs["process_id"] = process_id
    if local_device_ids:
        kwargs["local_device_ids"] = [
            int(i) for i in str(local_device_ids).split(",") if i != ""]
    jax.distributed.initialize(**kwargs)
    return True


def process_index() -> int:
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()


def is_coordinator() -> bool:
    """True on the process that should write checkpoints / print tables."""
    return jax.process_index() == 0


def host_local_slice(array: np.ndarray, mesh, batch_axis: int = 1,
                     axis: str = "data"):
    """This host's slice of a globally-consistent [.., B, ..] host array.

    The global batch axis is sharded over the mesh's `axis`; with the mesh's
    data-axis devices laid out process-major (make_mesh keeps jax.devices()
    order, which enumerates process 0's devices first), each process owns a
    contiguous B/num_processes block.
    """
    n_proc = jax.process_count()
    if n_proc == 1:
        return array
    b = array.shape[batch_axis]
    if b % n_proc:
        raise ValueError(
            f"global batch {b} must be divisible by the process count "
            f"{n_proc}")
    per = b // n_proc
    start = jax.process_index() * per
    idx = [slice(None)] * array.ndim
    idx[batch_axis] = slice(start, start + per)
    return array[tuple(idx)]
