"""Debug helpers (the reference's helpers/printVector.hpp equivalent)."""

from __future__ import annotations

import numpy as np


def print_vector(name: str, arr, max_elems: int = 16) -> None:
    """Dump a (device or host) array like the reference's printVector: name,
    shape, and the first elements."""
    a = np.asarray(arr)
    flat = a.reshape(-1)
    head = ";".join(f"{v:g}" for v in flat[:max_elems])
    more = "..." if flat.size > max_elems else ""
    print(f"{name} shape={a.shape} [{head}{more}]")


def tree_stats(name: str, tree) -> None:
    """Per-leaf min/max/absmean of a parameter pytree (for divergence hunts)."""
    import jax

    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        a = np.asarray(leaf)
        key = name + jax.tree_util.keystr(path)
        print(f"{key}: shape={a.shape} min={a.min():.4g} max={a.max():.4g} "
              f"absmean={np.abs(a).mean():.4g}")
