"""Multi-chip data parallelism over a jax device mesh.

The reference is strictly single-GPU (`main.cpp:526-541`; SURVEY.md section
2.7): its only parallelism is computing `parallel_sequences` sequences in
lock-step on one device. The TPU-native framework makes the fraction's batch
axis a FIRST-CLASS sharded axis: a 1-D `Mesh(("data",))` over all chips, the
[T, B, ...] fraction arrays sharded on B, parameters and optimizer state
replicated. Under `jax.jit` the gradient reduction becomes an XLA `psum`
over ICI — numerically the same sum over patterns the reference computes on
one chip, so single-chip and N-chip training produce identical updates (up
to float reduction order).

Multi-HOST pod slices (one jax process per host, joined by
`jax.distributed.initialize` — see parallel/distributed.py) use the same
mesh spanning every process's devices: the mesh device order is
process-major, so each host owns a contiguous block of the batch axis and
`shard_batch` transfers only that block from the host
(`jax.make_array_from_process_local_data`); the gradient psum then rides
ICI within a host and DCN across hosts, laid out by XLA.

No NCCL/MPI analogue exists or is needed: XLA emits the collectives.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def global_devices():
    """All devices across processes, PROCESS-MAJOR (each process's devices
    contiguous) — required so a host's addressable batch rows form one
    contiguous block of the global batch axis."""
    return sorted(jax.devices(), key=lambda d: (d.process_index, d.id))


def make_mesh(num_devices: int = 0, axis: str = "data") -> Mesh:
    """1-D data-parallel mesh over the first `num_devices` devices (0 = all).

    Multi-process runs must use all devices (every process participates in
    every collective), so num_devices is validated against the global count.
    """
    devs = global_devices()
    if num_devices and num_devices > 0:
        if num_devices > len(devs):
            raise ValueError(
                f"num_devices={num_devices} but only {len(devs)} devices "
                "available")
        if jax.process_count() > 1 and num_devices != len(devs):
            raise ValueError(
                f"multi-process runs must span all {len(devs)} global "
                f"devices (got num_devices={num_devices})")
        devs = devs[:num_devices]
    return Mesh(np.asarray(devs), (axis,))


def make_mesh_2d(num_devices: int = 0, model_devices: int = 1,
                 data_axis: str = "data", model_axis: str = "model") -> Mesh:
    """2-D DP x TP mesh: batch shards over `data`, LSTM cells over `model`
    (parallel/tensor.py). Adjacent devices share the model axis so the
    per-timestep all_gather rides the fastest links."""
    devs = global_devices()
    n = num_devices if num_devices and num_devices > 0 else len(devs)
    if n > len(devs):
        raise ValueError(
            f"num_devices={n} but only {len(devs)} devices available")
    if n % model_devices:
        raise ValueError(
            f"model_devices={model_devices} must divide num_devices={n}")
    devs = devs[:n]
    grid = np.asarray(devs).reshape(n // model_devices, model_devices)
    return Mesh(grid, (data_axis, model_axis))


def composed_mesh(num_devices: int, k: int, model_axis: str, flag: str):
    """Mesh for a k-way pipeline/sequence request, composed with data
    parallelism when the requested device total exceeds k.

    Returns (mesh, composed): a 2-D ('data', model_axis) mesh with B
    sharding over 'data' when num_devices > k (composed=True), else a
    1-D model_axis mesh over k devices. `flag` names the CLI option in
    the divisibility error. Shared by train and forward mode for both
    --pipeline_devices and --seq_devices so their mesh rules cannot
    drift.
    """
    if num_devices > 1 and num_devices != k:
        if num_devices % k:
            raise ValueError(
                f"{flag}={k} must divide num_devices={num_devices}")
        return make_mesh_2d(num_devices, k, data_axis="data",
                            model_axis=model_axis), True
    return make_mesh(k, axis=model_axis), False


def data_axis_size(mesh: Mesh, axis: str = "data") -> int:
    """Devices along the batch-sharding axis (the full mesh for 1-D)."""
    return int(mesh.shape.get(axis, mesh.devices.size))


def _multiprocess(mesh: Mesh) -> bool:
    return jax.process_count() > 1


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params / optimizer state) across the mesh.

    Multi-process: every process holds the same host values (deterministic
    seeded init / identical checkpoint reads), so each builds the global
    replicated array from its local copy."""
    sh = NamedSharding(mesh, P())
    if not _multiprocess(mesh):
        return jax.device_put(tree, sh)
    return jax.tree_util.tree_map(
        lambda a: jax.make_array_from_callback(
            np.shape(a), sh, lambda idx, _a=np.asarray(a): _a[idx]), tree)


def shard_batch(mesh: Mesh, array, batch_axis: int = 1, axis: str = "data"):
    """Shard one array along its batch axis (default: axis 1 of [T, B, ...]).

    Multi-process: `array` is the globally-consistent HOST array (every
    process assembles the same fraction stream); only this host's
    contiguous batch block is actually transferred to its devices."""
    spec = [None] * array.ndim
    spec[batch_axis] = axis
    sh = NamedSharding(mesh, P(*spec))
    if not _multiprocess(mesh):
        return jax.device_put(array, sh)
    from lstm_rnn_tpu.parallel.distributed import host_local_slice
    local = host_local_slice(np.asarray(array), mesh, batch_axis, axis)
    return jax.make_array_from_process_local_data(sh, local, np.shape(array))


def shard_fraction(mesh: Mesh, inputs, targets, pattypes, axis: str = "data"):
    """Place a fraction's [T, B, ...] arrays with B sharded over the mesh.

    B must be divisible by the mesh size; the DataSet's parallel_sequences
    should be chosen as a multiple of the chip count.
    """
    n = data_axis_size(mesh, axis)
    b = inputs.shape[1]
    if b % n != 0:
        raise ValueError(
            f"parallel_sequences ({b}) must be divisible by the mesh's "
            f"'{axis}' axis ({n})")
    return (
        shard_batch(mesh, inputs, 1, axis),
        shard_batch(mesh, targets, 1, axis),
        shard_batch(mesh, pattypes, 1, axis),
    )
