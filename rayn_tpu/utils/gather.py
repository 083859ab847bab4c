"""Small-table gathers as one-hot contractions.

TPU lowers `table[idx]` gathers poorly: a 5-row gather over a 1M-ray
wavefront measured ~15 ms (vs ~0.1 ms of actual bandwidth). For small
tables (scene objects, lights, materials — single digits of rows) a
one-hot matmul is a dense VPU/MXU-friendly contraction and runs at
bandwidth speed. Used by every per-ray scene-parameter lookup.
"""

from __future__ import annotations

import jax.numpy as jnp


def small_gather(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """table [R, ...] gathered at idx [N] -> [N, ...] via one-hot matmul.

    R must be small (O(10)); the one-hot intermediate is [N, R].
    """
    r = table.shape[0]
    if r == 1:
        return jnp.broadcast_to(table[0], idx.shape + table.shape[1:])
    onehot = (idx[:, None] == jnp.arange(r, dtype=idx.dtype)[None, :])
    flat = table.reshape(r, -1)
    out = jnp.dot(onehot.astype(table.dtype), flat,
                  preferred_element_type=table.dtype)
    return out.reshape(idx.shape + table.shape[1:])
