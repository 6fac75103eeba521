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

No NCCL/MPI analogue exists or is needed: XLA emits the collectives.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: int = 0, axis: str = "data") -> Mesh:
    """1-D data-parallel mesh over the first `num_devices` devices (0 = all)."""
    devs = jax.devices()
    if num_devices and num_devices > 0:
        if num_devices > len(devs):
            raise ValueError(
                f"num_devices={num_devices} but only {len(devs)} devices "
                "available")
        devs = devs[:num_devices]
    return Mesh(np.asarray(devs), (axis,))


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params / optimizer state) across the mesh."""
    sh = NamedSharding(mesh, P())
    return jax.device_put(tree, sh)


def shard_batch(mesh: Mesh, array, batch_axis: int = 1, axis: str = "data"):
    """Shard one array along its batch axis (default: axis 1 of [T, B, ...])."""
    spec = [None] * array.ndim
    spec[batch_axis] = axis
    return jax.device_put(array, NamedSharding(mesh, P(*spec)))


def shard_fraction(mesh: Mesh, inputs, targets, pattypes, axis: str = "data"):
    """Place a fraction's [T, B, ...] arrays with B sharded over the mesh.

    B must be divisible by the mesh size; the DataSet's parallel_sequences
    should be chosen as a multiple of the chip count.
    """
    n = mesh.devices.size
    b = inputs.shape[1]
    if b % n != 0:
        raise ValueError(
            f"parallel_sequences ({b}) must be divisible by mesh size ({n})")
    return (
        shard_batch(mesh, inputs, 1, axis),
        shard_batch(mesh, targets, 1, axis),
        shard_batch(mesh, pattypes, 1, axis),
    )
