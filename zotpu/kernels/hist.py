"""k-mer frequency spectrum on device.

Reference analog: zotmer/commands/hist.py count-of-counts loop
(SURVEY.md section 3.4). One scatter-add over the counts array; the tail
accumulates in the last bin. On a mesh the per-shard histograms are psum'd.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("max_count",))
def spectrum(counts: jax.Array, max_count: int = 1024) -> jax.Array:
    """u32 counts (0 = padding) -> int32 histogram of length max_count+1."""
    c = jnp.minimum(counts, jnp.uint32(max_count)).astype(jnp.int32)
    w = (counts > 0).astype(jnp.int32)
    return jnp.zeros(max_count + 1, jnp.int32).at[c].add(w, mode="drop")
