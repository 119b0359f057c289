"""Merge-path set algebra: streaming Pallas merge of two ALREADY-SORTED sets.

Reference analog: zotmer's two-pointer sorted-merge sweeps (SURVEY.md
sections 3.2-3.3) -- which never re-sort. Round-1's ``kernels/setops.set_op``
did: it concatenates and runs a full 4-operand ``lax.sort`` (O(n log^2 n)
compare-exchanges), which measured ~1 GB/s. Both CLI set-op inputs and
accumulator levels are already sorted, so this front-end replaces the re-sort
with ONE streaming bitonic-merge pass (``sort_pallas.stream_merge_pass_pallas``:
per output tile, the XLA-side merge-path partition finds the exact input
windows; the kernel DMAs them, forms a bitonic sequence, and cleans it in
log(2T) stages) -- O(n log T) work, T = 32K tile.

Requires DENSE inputs: a sorted unique prefix, sentinel padding strictly at
the tail (the container/compacted form). Sentinel-MARKED runs must keep using
the sort-based ``setops.set_op``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from zotpu.kernels.setops import SENT32, _combine_sorted, _compact_kept
from zotpu.kernels.sort_pallas import TILE_E, stream_merge_pair_pallas


def _next_pow2(x: int) -> int:
    return 1 << max(x - 1, 0).bit_length()


@functools.partial(jax.jit, static_argnames=("op", "interpret"))
def set_op_merge_path(hi_a, lo_a, c_a, hi_b, lo_b, c_b, op: str = "merge",
                      interpret: bool = False):
    """set_op over two DENSE sorted unique sentinel-padded arrays.

    Same contract/outputs as ``setops.set_op`` (hi, lo, counts, n_out) except
    the output capacity is next_pow2(|A|) + next_pow2(|B|) (tile-clamped)
    rather than |A|+|B|; rows past n_out are sentinel/0 either way.
    """
    MA = max(_next_pow2(hi_a.shape[0]), TILE_E)
    MB = max(_next_pow2(hi_b.shape[0]), TILE_E)

    def padk(x, M):
        return jnp.concatenate(
            [x, jnp.full(M - x.shape[0], SENT32, jnp.uint32)])

    def padc(x, M):
        return jnp.concatenate(
            [x.astype(jnp.uint32), jnp.zeros(M - x.shape[0], jnp.uint32)])

    hi = jnp.concatenate([padk(hi_a, MA), padk(hi_b, MB)])
    lo = jnp.concatenate([padk(lo_a, MA), padk(lo_b, MB)])
    ca = jnp.concatenate([padc(c_a, MA), jnp.zeros(MB, jnp.uint32)])
    cb = jnp.concatenate([jnp.zeros(MA, jnp.uint32), padc(c_b, MB)])
    hi, lo, ca, cb = stream_merge_pair_pallas(
        hi, lo, (ca, cb), nA=MA, interpret=interpret)
    keep_first, cnt = _combine_sorted(hi, lo, ca, cb, op)
    return _compact_kept(hi, lo, cnt, keep_first)


def use_merge_path(n_a: int, n_b: int) -> bool:
    """Merge-path pays off once either side reaches a tile; below that the
    sort-based path is cheaper and avoids extra compiles. CPU tests exercise
    the kernel via interpret=True only (see kernels/dispatch.py)."""
    from zotpu.kernels.dispatch import use_pallas
    return use_pallas() and max(n_a, n_b) >= TILE_E


def set_op_auto(hi_a, lo_a, c_a, hi_b, lo_b, c_b, op: str = "merge",
                n_a=None, n_b=None):
    """Dispatch: FUSED merge+combine+compact Pallas kernel on TPU for
    tile-sized dense inputs (kernels/merge_fused.py), sort-based XLA
    otherwise. Inputs must be dense (compacted). ``n_a``/``n_b`` (traced
    valid-prefix lengths, round 5) let the fused kernel skip pure-padding
    tiles -- a real win for pow2-padded sets and skewed shard rows; the
    sort-based fallback ignores them (byte-identical either way)."""
    from zotpu.kernels import setops as K
    if use_merge_path(hi_a.shape[0], hi_b.shape[0]):
        from zotpu.kernels.merge_fused import set_op_fused
        return set_op_fused(hi_a, lo_a, c_a, hi_b, lo_b, c_b, op=op,
                            n_a=n_a, n_b=n_b)
    return K.set_op(hi_a, lo_a, c_a, hi_b, lo_b, c_b, op=op)
