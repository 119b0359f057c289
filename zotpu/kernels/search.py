"""Two-word vectorized binary search over sorted (hi, lo) key arrays.

Reference analog: zotmer's sparse rank/binary-search membership queries
(SURVEY.md section 3.5) -- the device half of the rank/select sparse-set
capability (zotpu/sparse.py is the host half).

STATUS: correct and tested, but NOT on the scan hot path since round 2 --
each bisection step is an XLA gather (~0.03 Gelem/s on TPU), which measured
~2 Mkmer/s end to end; production membership is the gather-free sort-merge
join (kernels/join.py). Use this for SMALL query sets where a sort would
dominate, or on CPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from zotpu.kernels.pack import SENT32


def _less2(ahi, alo, bhi, blo):
    return (ahi < bhi) | ((ahi == bhi) & (alo < blo))


@jax.jit
def searchsorted2(uhi: jax.Array, ulo: jax.Array, qhi: jax.Array, qlo: jax.Array):
    """First index where key >= query (lower bound), per query."""
    n = uhi.shape[0]
    nq = qhi.shape[0]
    lo_i = jnp.zeros(nq, jnp.int32)
    hi_i = jnp.full(nq, n, jnp.int32)
    steps = max(n.bit_length(), 1)
    for _ in range(steps):
        done = lo_i >= hi_i
        mid = jnp.minimum((lo_i + hi_i) >> 1, n - 1)
        khi = uhi[mid]
        klo = ulo[mid]
        less = _less2(khi, klo, qhi, qlo)
        lo_i = jnp.where(~done & less, mid + 1, lo_i)
        hi_i = jnp.where(~done & ~less, mid, hi_i)
    return lo_i


@jax.jit
def member2(uhi, ulo, qhi, qlo):
    """Membership mask of queries in the sorted sentinel-padded key array."""
    n = uhi.shape[0]
    idx = searchsorted2(uhi, ulo, qhi, qlo)
    safe = jnp.minimum(idx, n - 1)
    hit = (idx < n) & (uhi[safe] == qhi) & (ulo[safe] == qlo)
    # never report the sentinel itself as a hit (padded queries)
    return hit & ~((qhi == SENT32) & (qlo == SENT32))
