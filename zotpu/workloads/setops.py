"""Set-algebra workload wrappers (BASELINE config 3).

Reference analog: zotmer's set-algebra commands (SURVEY.md section 3.3).
Device path pads both sorted sets to power-of-two capacity (bounded compile
count) and runs the neighbour-combine kernel; counts follow semantics.py.
"""

from __future__ import annotations

import numpy as np

from zotpu import semantics as S
from zotpu.kernels import setops as K


def _pad_pow2(keys, counts):
    n = len(keys)
    cap = max(1 << (max(n, 1) - 1).bit_length(), 8)
    hi = np.full(cap, 0xFFFFFFFF, np.uint32)
    lo = np.full(cap, 0xFFFFFFFF, np.uint32)
    c = np.zeros(cap, np.uint32)
    hi[:n], lo[:n] = S.split_hi_lo(np.asarray(keys, np.uint64))
    c[:n] = counts
    return hi, lo, c


def set_op(a: tuple[np.ndarray, np.ndarray], b: tuple[np.ndarray, np.ndarray],
           op: str) -> tuple[np.ndarray, np.ndarray]:
    """Device set op between two sorted unique (keys u64, counts u32) pairs.

    Container inputs are dense, so this dispatches to the merge-path Pallas
    front-end on TPU (kernels/setops_merge.py) and the sort-based kernel
    elsewhere -- byte-identical outputs (tests/test_setops_merge.py)."""
    from zotpu.kernels.setops_merge import set_op_auto
    ahi, alo, ac = _pad_pow2(*a)
    bhi, blo, bc = _pad_pow2(*b)
    hi, lo, c, n = set_op_auto(ahi, alo, ac, bhi, blo, bc, op=op)
    n = int(n)
    keys = S.join_hi_lo(np.asarray(hi[:n]), np.asarray(lo[:n]))
    return keys, np.asarray(c[:n])


def merge_tree_device(runs: list[tuple[np.ndarray, np.ndarray]]
                      ) -> tuple[np.ndarray, np.ndarray]:
    """Pairwise device merge tree over sorted runs (counts saturate)."""
    if not runs:
        return np.empty(0, np.uint64), np.empty(0, S.COUNT_DTYPE)
    runs = list(runs)
    while len(runs) > 1:
        nxt = []
        for i in range(0, len(runs) - 1, 2):
            nxt.append(set_op(runs[i], runs[i + 1], op="merge"))
        if len(runs) % 2:
            nxt.append(runs[-1])
        runs = nxt
    return runs[0]


def jaccard(a_keys: np.ndarray, b_keys: np.ndarray) -> dict:
    """Similarity statistics from device cardinalities."""
    ahi, alo, _ = _pad_pow2(a_keys, np.ones(len(a_keys), np.uint32))
    bhi, blo, _ = _pad_pow2(b_keys, np.ones(len(b_keys), np.uint32))
    na, nb, ni, nu = (int(x) for x in K.cardinalities(ahi, alo, bhi, blo))
    return {"a": na, "b": nb, "intersect": ni, "union": nu,
            "jaccard": ni / nu if nu else 0.0}


# ---------------------------------------------------------------------------
# sharded set ops (BASELINE multi-host blueprint: "pairwise set-op
# cardinalities are psum'd"; VERDICT round 3 item 5). Both inputs are sorted,
# so key-prefix sharding is a contiguous SLICE per shard: shard d combines
# the two slices independently (keys meet only inside their own shard), the
# per-shard outputs concatenate already globally sorted, and |A|, |B|, n_out
# are psum'd on the mesh -- the set data never has to fit one chip's HBM.


def _partition_sorted_prefix(keys, counts, k: int, n_shards: int):
    """Split one sorted set into (D, cap) sentinel-padded shard rows by key
    prefix (searchsorted on the D prefix boundaries -- contiguous slices)."""
    from zotpu.dist.mesh import shard_bits

    p = shard_bits(n_shards)
    keys = np.asarray(keys, np.uint64)
    edges = (np.arange(1, n_shards, dtype=np.uint64)
             << np.uint64(2 * k - p)) if p else np.empty(0, np.uint64)
    bounds = np.concatenate([[0], np.searchsorted(keys, edges), [len(keys)]]
                            ).astype(np.int64)
    sizes = np.diff(bounds)
    cap = max(1 << (max(int(sizes.max()) if len(sizes) else 1, 1) - 1)
              .bit_length(), 8)
    hi = np.full((n_shards, cap), 0xFFFFFFFF, np.uint32)
    lo = np.full((n_shards, cap), 0xFFFFFFFF, np.uint32)
    c = np.zeros((n_shards, cap), np.uint32)
    for d in range(n_shards):
        seg = slice(bounds[d], bounds[d + 1])
        m = bounds[d + 1] - bounds[d]
        hi[d, :m], lo[d, :m] = S.split_hi_lo(keys[seg])
        c[d, :m] = counts[seg]
    return hi, lo, c


_SETOP_FN_CACHE: dict = {}


def _sharded_setop_fn(op: str, n_shards: int):
    """Jitted shard_map program: per-shard fused set_op + psum'd counts.

    Cached by (op, n_shards) -- a fresh jax.jit object per call would
    RETRACE (and on this rig's remote compile service, recompile for
    MINUTES) on every pair of an N-way jaccard matrix even at identical
    shapes; one cached callable lets jit's own shape cache do its job."""
    key = (op, n_shards)
    hit = _SETOP_FN_CACHE.get(key)
    if hit is not None:
        return hit

    import jax
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from zotpu.dist import mesh as M
    from zotpu.dist.mesh import AXIS
    from zotpu.kernels.setops_merge import set_op_auto

    mesh = M.make_mesh(n_shards)
    SENT = np.uint32(0xFFFFFFFF)

    def local(ahi, alo, ac, bhi, blo, bc):
        ahi, alo, ac = ahi[0], alo[0], ac[0]
        bhi, blo, bc = bhi[0], blo[0], bc[0]
        hi, lo, c, n = set_op_auto(ahi, alo, ac, bhi, blo, bc, op=op)
        na = jnp.sum((~((ahi == SENT) & (alo == SENT))).astype(jnp.int32))
        nb = jnp.sum((~((bhi == SENT) & (blo == SENT))).astype(jnp.int32))
        tot = jax.lax.psum(jnp.stack([na, nb, n.astype(jnp.int32)]), AXIS)
        return hi[None], lo[None], c[None], n[None].astype(jnp.int32), tot

    fn = shard_map(local, mesh=mesh,
                   in_specs=(P(AXIS, None),) * 6,
                   out_specs=(P(AXIS, None), P(AXIS, None), P(AXIS, None),
                              P(AXIS), P()),
                   check_vma=False)  # see dist/shuffle.make_kmerize_step
    fn = jax.jit(fn)
    _SETOP_FN_CACHE[key] = fn
    return fn


def set_op_sharded(a: tuple[np.ndarray, np.ndarray],
                   b: tuple[np.ndarray, np.ndarray], op: str, k: int,
                   n_shards: int, gather: bool = True
                   ) -> tuple[np.ndarray, np.ndarray, dict]:
    """Key-prefix-sharded set op across ``n_shards`` devices.

    Each shard runs the fused merge+combine+compact kernel on its slice of
    both sets; outputs concatenate already globally sorted (disjoint prefix
    ranges) and are byte-identical to the single-chip ``set_op`` (tested).
    Returns (keys, counts, cards) with cards = the psum'd {a, b, intersect,
    union} cardinalities, derived from the op's own output size (no second
    kernel): n_out = |A|+|B|-|A^B| for union/merge, |A^B| for intersect,
    |A|-|A^B| for diff.

    ``gather=False`` skips the full (D, cap) result transfer and the host
    reconstruction entirely and returns (None, None, cards) -- the right
    form for cardinality-only queries (jaccard), where the D2H of a
    multi-GB result set would be pure waste."""
    import jax.numpy as jnp

    ahi, alo, ac = _partition_sorted_prefix(a[0], a[1], k, n_shards)
    bhi, blo, bc = _partition_sorted_prefix(b[0], b[1], k, n_shards)
    fn = _sharded_setop_fn(op, n_shards)
    hi, lo, c, n, tot = fn(jnp.asarray(ahi), jnp.asarray(alo),
                           jnp.asarray(ac), jnp.asarray(bhi),
                           jnp.asarray(blo), jnp.asarray(bc))
    na, nb, n_out = (int(x) for x in np.asarray(tot))
    n_int = {"merge": na + nb - n_out, "union": na + nb - n_out,
             "intersect": n_out, "diff": na - n_out}[op]
    cards = {"a": na, "b": nb, "intersect": n_int,
             "union": na + nb - n_int,
             "jaccard": n_int / (na + nb - n_int) if na + nb - n_int else 0.0}
    if not gather:
        return None, None, cards
    hi, lo = np.asarray(hi), np.asarray(lo)
    c, n = np.asarray(c), np.asarray(n)
    keys_out, cnt_out = [], []
    for d in range(n_shards):
        m = int(n[d])
        keys_out.append(S.join_hi_lo(hi[d, :m], lo[d, :m]))
        cnt_out.append(c[d, :m].astype(S.COUNT_DTYPE))
    keys = (np.concatenate(keys_out) if keys_out
            else np.empty(0, np.uint64))
    counts = (np.concatenate(cnt_out) if cnt_out
              else np.empty(0, S.COUNT_DTYPE))
    return keys, counts, cards


def jaccard_sharded(a_keys: np.ndarray, b_keys: np.ndarray, k: int,
                    n_shards: int) -> dict:
    """Similarity from psum'd per-shard cardinalities: gather=False means
    only the three psum'd totals leave the mesh (no result-set D2H)."""
    ones_a = np.ones(len(a_keys), np.uint32)
    ones_b = np.ones(len(b_keys), np.uint32)
    _, _, cards = set_op_sharded((a_keys, ones_a), (b_keys, ones_b),
                                 "intersect", k, n_shards, gather=False)
    return cards
