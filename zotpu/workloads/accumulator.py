"""Device-resident merge accumulator for streaming kmerize.

Why: per-batch host transfers dominate end-to-end time on tunneled/remote
TPUs (measured: 130 Mbase/s device step vs 2 Mbase/s E2E when every batch's
variable-length result round-trips to the host -- each distinct valid-length
slice even triggers its own tiny compile). This keeps per-batch sorted runs in
HBM and merges them there, log-structured-merge style:

level i holds at most one run of capacity ``base_cap * 2**i`` (clamped to
``max_cap``). A new batch enters level 0; while a level is occupied, the two
runs merge (device set_op, counts saturate) and carry to the next level.
Each element is merged O(log B) times over B batches, every merge is ONE
jitted program per level shape (pad + merge + truncate + overflow check
fused -- a remote TPU pays ~tens of ms latency per eager dispatch), and
NOTHING synchronizes with the host until ``result()``: capacity overflow is
accumulated as a device flag and raised at the end (the run must then be
redone with a larger --merge-capacity; detection is deferred by design to
keep the pipeline asynchronous).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from zotpu import semantics as S
from zotpu.io import wire_result
from zotpu.kernels import setops


class CapacityError(ValueError):
    pass


def _tile_round(x: int) -> int:
    """Level-capacity rounding: the next TILE_E multiple once a run spans
    tiles (the fused merge kernel's cost is linear in PADDED candidates, so
    pow2 rounding cost ~10% extra merge volume at batch shapes), next pow2
    below that (sub-tile capacities -- tests, tiny CPU runs -- keep their
    exact overflow semantics; set_op_fused pads internally either way)."""
    from zotpu.kernels.sort_pallas import TILE_E
    if x <= TILE_E:
        return 1 << max(x - 1, 0).bit_length()
    return -(-x // TILE_E) * TILE_E


@functools.partial(jax.jit, static_argnames=("cap",))
def _pad_to(hi, lo, cnt, cap: int):
    n = hi.shape[0]
    if n >= cap:
        return hi[:cap], lo[:cap], cnt[:cap]
    padk = jnp.full(cap - n, 0xFFFFFFFF, jnp.uint32)
    padc = jnp.zeros(cap - n, jnp.uint32)
    return (jnp.concatenate([hi, padk]), jnp.concatenate([lo, padk]),
            jnp.concatenate([cnt, padc]))


@functools.partial(jax.jit, static_argnames=("out_cap",))
def _merge_fused(ahi, alo, ac, bhi, blo, bc, ov, out_cap: int):
    """One fused dispatch: merge two sorted runs, truncate to out_cap,
    accumulate the overflow flag (max excess valid count seen so far)."""
    hi, lo, cnt, n = setops.set_op(ahi, alo, ac, bhi, blo, bc, op="merge")
    ov = jnp.maximum(ov, n - out_cap)
    return hi[:out_cap], lo[:out_cap], cnt[:out_cap], n, ov


@functools.partial(jax.jit, static_argnames=("out_cap", "trunc"))
def _merge_fused_mp(ahi, alo, ac, bhi, blo, bc, ov, out_cap: int,
                    trunc: bool = True, na=None, nb=None):
    """_merge_fused via the FUSED Pallas merge+combine+compact kernel --
    DENSE operands only (every set_op output is dense, so levels >= 1
    qualify). ``trunc=False`` (round 4) keeps the kernel's natural output
    length -- a [:out_cap] slice is a full-array XLA copy (~3-10 ms at
    batch shapes) bought only for shape hygiene; the accumulator keeps
    per-level shapes deterministic without it and truncates ONLY when the
    semantic capacity is clamped by max_cap (HBM bound). ``out_cap``
    stays the OVERFLOW threshold either way. ``na``/``nb`` (traced valid
    counts, round 5) let the kernel skip pure-padding tiles -- at upper
    LSM levels the caps grow 2^level while the valid prefix saturates, so
    most tiles are dead there; output is byte-identical either way."""
    from zotpu.kernels.merge_fused import set_op_fused
    hi, lo, cnt, n = set_op_fused(ahi, alo, ac, bhi, blo, bc, op="merge",
                                  n_a=na, n_b=nb)
    ov = jnp.maximum(ov, n - out_cap)
    if trunc:
        return hi[:out_cap], lo[:out_cap], cnt[:out_cap], n, ov
    return hi, lo, cnt, n, ov


def _make_sharded_fused_merge(mesh, out_cap: int, interpret: bool,
                              trunc: bool = True):
    """Per-shard streaming fused merge over (D, cap) sharded level arrays:
    shard_map of kernels/merge_fused.set_op_fused -- each shard merges its
    own key range in ONE Pallas pass (8.4 GB/s) instead of the vmapped
    4-operand re-sort. DENSE operands only (the round-3 dense dedup step
    output and every merge output qualify). ``trunc=False`` keeps the
    kernel's natural output length (see _merge_fused_mp): the slice/pad to
    out_cap is a full-array copy bought only for shape hygiene, skipped
    until the semantic capacity is clamped by max_cap."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from zotpu.dist.mesh import AXIS
    from zotpu.kernels.merge_fused import set_op_fused

    SENTX = jnp.uint32(0xFFFFFFFF)

    def local(ahi, alo, ac, na, bhi, blo, bc, nb, ov):
        hi, lo, cnt, n = set_op_fused(ahi[0], alo[0], ac[0],
                                      bhi[0], blo[0], bc[0], op="merge",
                                      interpret=interpret,
                                      n_a=na[0], n_b=nb[0])
        if trunc:
            m = hi.shape[0]
            if m >= out_cap:
                hi, lo, cnt = hi[:out_cap], lo[:out_cap], cnt[:out_cap]
            else:
                padk = jnp.full(out_cap - m, SENTX, jnp.uint32)
                padc = jnp.zeros(out_cap - m, jnp.uint32)
                hi = jnp.concatenate([hi, padk])
                lo = jnp.concatenate([lo, padk])
                cnt = jnp.concatenate([cnt, padc])
        ov = jnp.maximum(ov, n - out_cap)
        return (hi[None], lo[None], cnt[None], n[None].astype(jnp.int32),
                ov)

    fn = shard_map(local, mesh=mesh,
                   in_specs=(P(AXIS, None),) * 3 + (P(AXIS),)
                            + (P(AXIS, None),) * 3 + (P(AXIS), P(AXIS)),
                   out_specs=(P(AXIS, None),) * 3 + (P(AXIS), P(AXIS)),
                   check_vma=False)
    return jax.jit(fn)


@functools.partial(jax.jit, static_argnames=("out_cap",))
def _merge_fused_batched(ahi, alo, ac, bhi, blo, bc, ov, out_cap: int):
    """vmapped _merge_fused over a leading shard axis (D, cap).

    With the leading axis sharded over the mesh (the kmerize step's output
    layout), XLA runs each shard's sort/merge locally -- a per-shard device-
    resident merge with NO collectives and NO host round trips."""
    def one(ahi, alo, ac, bhi, blo, bc, ov):
        hi, lo, cnt, n = setops.set_op(ahi, alo, ac, bhi, blo, bc, op="merge")
        return (hi[:out_cap], lo[:out_cap], cnt[:out_cap], n,
                jnp.maximum(ov, n - out_cap))
    return jax.vmap(one)(ahi, alo, ac, bhi, blo, bc, ov)


class DeviceAccumulator:
    def __init__(self, batch_capacity: int, max_cap: int = 1 << 26):
        # TILE_E-rounded, not pow2 (round 4): level arrays feed the
        # streaming fused merge whose cost is linear in PADDED candidates;
        # pow2 rounding cost ~10% extra merge volume at batch shapes.
        self.base_cap = _tile_round(batch_capacity)
        self.max_cap = max(max_cap, self.base_cap)
        self.overflow = jnp.zeros((), jnp.int32)
        # levels[i] = (hi, lo, cnt, n_device) at cap(i), or None
        self.levels: list = []

    def _cap(self, i: int) -> int:
        return min(self.base_cap << i, self.max_cap)

    def add(self, hi, lo, cnt, n, dense: bool = False) -> None:
        """Insert one run of unique keys (device arrays). No host
        synchronization happens here. Runs may be sentinel-MARKED rather than
        compacted (kernels/sortdedup.dedup_mark_sorted): the merge's set_op
        re-sorts its concatenated input, so interspersed sentinel rows are
        equivalent to trailing padding. ``dense=True`` declares a DENSE
        sorted-unique-prefix run (the TPU dedup-compact pass emits these,
        kernels/dedup_pallas): its level-0 merges then take the streaming
        fused merge kernel instead of the re-sort -- the round-3 fix for the
        dominant sustained per-batch cost (docs/PERF_NOTES.md)."""
        if hi.shape[0] > self._cap(0):
            raise ValueError(
                f"run capacity {hi.shape[0]} exceeds the accumulator's level-0 "
                f"capacity {self._cap(0)}; construct DeviceAccumulator with "
                f"batch_capacity >= the largest run (silent truncation would "
                f"lose k-mers)")
        entry = (*_pad_to(hi, lo, cnt, cap=self._cap(0)), n, dense)
        i = 0
        while True:
            if len(self.levels) <= i:
                self.levels.append(None)
            if self.levels[i] is None:
                self.levels[i] = entry
                return
            other = self.levels[i]
            self.levels[i] = None
            entry = self._merge(entry, other, self._cap(i + 1))
            i += 1

    def _merge(self, a, b, out_cap: int):
        """Merge two entries (hi, lo, cnt, n, dense). Level-0 entries are
        sentinel-MARKED (not dense) and take the sort-based set_op; dense
        operands (every merge output) take the merge-path Pallas front-end on
        TPU -- one streaming bitonic-merge pass instead of a full re-sort.
        The fused path truncates the output array only when out_cap is
        clamped by max_cap (the HBM bound); below that, level shapes stay
        deterministic without the [:out_cap] copy and out_cap is just the
        deferred-overflow threshold."""
        from zotpu.kernels.setops_merge import use_merge_path
        both_dense = a[4] and b[4]
        if both_dense and use_merge_path(a[0].shape[0], b[0].shape[0]):
            hi, lo, cnt, n, self.overflow = _merge_fused_mp(
                a[0], a[1], a[2], b[0], b[1], b[2], self.overflow,
                out_cap=out_cap, trunc=out_cap >= self.max_cap,
                na=a[3], nb=b[3])
        else:
            hi, lo, cnt, n, self.overflow = _merge_fused(
                a[0], a[1], a[2], b[0], b[1], b[2], self.overflow,
                out_cap=out_cap)
        return hi, lo, cnt, n, True

    def result(self) -> tuple[np.ndarray, np.ndarray]:
        """Merge remaining levels, check deferred overflow, transfer ONLY the
        valid prefix (the single host sync of the whole accumulation)."""
        entry = None
        cap_final = self._cap(len(self.levels))
        for lvl in self.levels:
            if lvl is None:
                continue
            entry = lvl if entry is None else self._merge(entry, lvl, cap_final)
        if entry is None:
            return np.empty(0, np.uint64), np.empty(0, S.COUNT_DTYPE)
        if int(self.overflow) > 0:
            raise CapacityError(
                f"accumulator overflowed its unique-key capacity by "
                f"{int(self.overflow)}; rerun with a larger --merge-capacity "
                f"or use --spill-dir (host merging)")
        hi, lo, cnt, n = entry[:4]
        if not entry[4]:
            # A single-batch run may never pass through set_op, leaving the
            # entry sentinel-marked rather than compacted; one final
            # compaction (a one-off dispatch) makes [:n] dense.
            from zotpu.kernels.sortdedup import compact_sorted
            hi, lo, cnt = compact_sorted(hi, lo, cnt)
        # delta+u16 wire transfer, 6 B/key instead of 12 (D2H of the final
        # set is the largest single tail item on slow links), with the plain
        # fallback and 1M-grid slicing handled inside.
        return wire_result.transfer_sorted_set(hi, lo, cnt, int(n))


class ShardedAccumulator:
    """Per-shard LSM accumulator for the multi-chip kmerize path.

    Same log-structured-merge design as DeviceAccumulator, but every level is
    a (D, cap) array whose leading axis is sharded over the mesh (the layout
    ``dist.shuffle.make_kmerize_step`` emits). Merging is the vmapped fused
    set_op, which XLA partitions along the sharded axis -- each shard merges
    its own key range locally, runs never leave HBM, and nothing synchronizes
    with the host until ``result()`` (VERDICT round 1 item 3: the sharded
    path previously gathered every batch to the host)."""

    def __init__(self, n_shards: int, batch_capacity: int,
                 max_cap: int = 1 << 26, mesh=None, interpret: bool = False):
        self.n_shards = n_shards
        self.base_cap = _tile_round(batch_capacity)  # see DeviceAccumulator
        # max_cap is the GLOBAL unique-key capacity; each shard gets its slice
        self.max_cap = max(max_cap // n_shards, self.base_cap)
        # With a mesh, state arrays carry explicit shard-axis shardings so the
        # same SPMD program runs under multi-controller (each process owns its
        # shards' rows); without one, XLA's propagation handles it.
        self.mesh = mesh
        self.interpret = interpret
        self._fused_cache: dict = {}
        self.overflow = self._shard1(np.zeros(n_shards, np.int32))
        self.levels: list = []

    def _shard1(self, x):
        if self.mesh is None:
            return jnp.asarray(x)
        from jax.sharding import NamedSharding, PartitionSpec as P
        from zotpu.dist.mesh import AXIS
        return jax.device_put(x, NamedSharding(self.mesh, P(AXIS)))

    def _shard2(self, x):
        if self.mesh is None:
            return jnp.asarray(x)
        from jax.sharding import NamedSharding, PartitionSpec as P
        from zotpu.dist.mesh import AXIS
        return jax.device_put(x, NamedSharding(self.mesh, P(AXIS, None)))

    def _cap(self, i: int) -> int:
        return min(self.base_cap << i, self.max_cap)

    def add(self, uhi, ulo, counts, n, dense: bool = False) -> None:
        """Insert per-shard runs: (D, cap) arrays + (D,) valid counts.
        Runs may be sentinel-marked (uncompacted), or DENSE unique prefixes
        (dense=True, the round-3 fused dedup-compact step output) -- dense
        level merges stream through the fused Pallas merge per shard
        instead of the vmapped re-sort. No host sync."""
        if uhi.shape[1] > self._cap(0):
            raise ValueError(
                f"per-shard run capacity {uhi.shape[1]} exceeds level-0 "
                f"capacity {self._cap(0)}")
        pad = self._cap(0) - uhi.shape[1]
        if pad:
            padk = self._shard2(np.full((self.n_shards, pad), 0xFFFFFFFF,
                                        np.uint32))
            padc = self._shard2(np.zeros((self.n_shards, pad), np.uint32))
            uhi = jnp.concatenate([uhi, padk], axis=1)
            ulo = jnp.concatenate([ulo, padk], axis=1)
            counts = jnp.concatenate([counts, padc], axis=1)
        entry = (uhi, ulo, counts, n, dense)
        i = 0
        while True:
            if len(self.levels) <= i:
                self.levels.append(None)
            if self.levels[i] is None:
                self.levels[i] = entry
                return
            other = self.levels[i]
            self.levels[i] = None
            entry = self._merge(entry, other, self._cap(i + 1))
            i += 1

    def _merge(self, a, b, out_cap: int):
        from zotpu.kernels.dispatch import use_pallas
        both_dense = a[4] and b[4]
        if both_dense and self.mesh is not None and (use_pallas()
                                                     or self.interpret):
            trunc = out_cap >= self.max_cap
            key = (a[0].shape[1], b[0].shape[1], out_cap, trunc)
            fn = self._fused_cache.get(key)
            if fn is None:
                fn = _make_sharded_fused_merge(self.mesh, out_cap,
                                               self.interpret, trunc=trunc)
                self._fused_cache[key] = fn
            hi, lo, cnt, n, self.overflow = fn(
                a[0], a[1], a[2], a[3], b[0], b[1], b[2], b[3],
                self.overflow)
            return hi, lo, cnt, n, True
        hi, lo, cnt, n, self.overflow = _merge_fused_batched(
            a[0], a[1], a[2], b[0], b[1], b[2], self.overflow, out_cap=out_cap)
        return hi, lo, cnt, n, True

    def result(self):
        """Merge remaining levels, check deferred overflow, compact each
        shard, and transfer the per-shard arrays (the single host sync).
        Returns numpy (uhi, ulo, counts, n_unique) in the gather_global
        layout: (D, cap) + (D,). Under multi-controller the transfer is a
        process_allgather, so every host returns the full global result."""
        from zotpu.kernels.sortdedup import compact_sorted
        entry = None
        cap_final = self._cap(len(self.levels))
        for lvl in self.levels:
            if lvl is None:
                continue
            entry = lvl if entry is None else self._merge(entry, lvl, cap_final)
        if entry is None:
            z = np.zeros((self.n_shards, 0), np.uint32)
            return z, z, z, np.zeros(self.n_shards, np.int32)
        hi, lo, cnt, n = entry[:4]
        if not entry[4]:
            hi, lo, cnt = jax.vmap(compact_sorted)(hi, lo, cnt)
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils as mh
            hi, lo, cnt, n, ov = (
                mh.process_allgather(x, tiled=True)
                for x in (hi, lo, cnt, n, self.overflow))
        else:
            hi, lo, cnt, n, ov = (np.asarray(x)
                                  for x in (hi, lo, cnt, n, self.overflow))
        if int(ov.max(initial=0)) > 0:
            raise CapacityError(
                f"sharded accumulator overflowed its per-shard unique-key "
                f"capacity by {int(ov.max())} (shard {int(ov.argmax())}); "
                f"rerun with a larger --merge-capacity")
        return hi, lo, cnt, np.asarray(n).astype(np.int32)
