"""Dense dedup-compact streaming kernels: sorted-with-duplicates -> unique.

Reference analog: zotmer kmerize's dedup -> (kmer, count) step (SURVEY.md
section 3.1), emitted DENSE.

Why this exists (round 3): the accumulator's level-0 merges were the hidden
dominant per-batch device cost. Per-batch runs came out of the step
sentinel-MARKED (duplicates blanked in place -- round 2's trick to skip the
compaction re-sort), but marked arrays are NOT sorted (interspersed
sentinels), so every level-0 LSM merge had to re-sort 2x the padded batch
capacity with the 4-operand ``setops.set_op`` (~200 ms amortized per batch
at 16M keys -- the measured 450 ms/batch steady state vs the 152 ms step,
docs/PERF_NOTES.md round 1). A DENSE unique run instead flows through the
streaming fused merge kernel (kernels/merge_fused.py, 8.4 GB/s) at every
level.

Dedup here is a single VPU-cheap pass (no merge network): per tile of the
sorted stream,

- segment firsts come from a one-element backward roll (SMEM carry across
  tiles), segment lasts from a one-element forward roll whose tile-final
  element compares against the NEXT tile's first key (a scalar-prefetch row
  computed on the XLA side -- for a single input it is just
  ``key[(t+1)*TILE]``);
- the keeper is each segment's LAST element with count = pos - seg_start + 1
  (seg_start latches forward: flat cummax + SMEM carry, the join's pattern);
- keepers butterfly-pack to the tile front (kernels/merge_fused._butterfly_pack)
  and append at a running SMEM element cursor with garbage-overwrite window
  DMA + a carried partial row -- merge_fused's proven append machinery, so
  the output is dense with a sentinel tail and NO XLA post-pass.

Entry points: ``dedup_compact_pallas`` (single sorted input -> dense
unique+counts; the TPU dispatch for kernels/sortdedup.dedup_count_sorted)
and ``merged_dedup_compact_{pass,pair}`` (a streaming merge pass/pair with
the dedup-compact epilogue FUSED in -- the sharded receive tree's final
level, dist/shuffle.merge_received_runs(dedup=True)). A sentinel-MARKED
fused variant was prototyped during round 3 but never shipped; the dense
compact here replaced it because dense runs keep every LSM level on the
streaming fused merge kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from zotpu.kernels.merge_fused import OUT_R, _butterfly_pack
from zotpu.kernels.sort_pallas import (LANES, LOAD_R, TILE_E, TILE_R,
                                       _alt_pass_scalars, _pair_alt_scalars,
                                       _compact_merged_tile, _extract_u32,
                                       _flat_cummax_i32, _less_eq2,
                                       _pad_chan_front)

SENT = 0xFFFFFFFF


def _row_lane(shape):
    row = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    return row, lane


def _dedup_flags(hi_o, lo_o, t, ckey, cstart, nxt_hi, nxt_lo):
    """Shared epilogue: (keep, cnt) for a (TILE_R, LANES) tile of the
    sorted stream, with SMEM carries ckey (prev element key) and cstart
    (open segment's start position). Keeper = segment LAST; count =
    extent. Callers init ckey=(SENT, 0) and cstart=0 at t == 0."""
    S32 = jnp.uint32(SENT)
    row, lane = _row_lane(hi_o.shape)
    pos = t * TILE_E + row * LANES + lane

    def prev_elem(v, fill0):
        a = pltpu.roll(v, shift=1, axis=1)
        b = pltpu.roll(a, shift=1, axis=0)
        p = jnp.where(lane == 0, b, a)
        return jnp.where((row == 0) & (lane == 0), fill0, p)

    def next_elem(v, fill_last):
        a = pltpu.roll(v, shift=LANES - 1, axis=1)
        b = pltpu.roll(a, shift=TILE_R - 1, axis=0)
        p = jnp.where(lane == LANES - 1, b, a)
        return jnp.where((row == TILE_R - 1) & (lane == LANES - 1),
                         fill_last, p)

    phi_ = prev_elem(hi_o, ckey[0])
    plo_ = prev_elem(lo_o, ckey[1])
    first = (hi_o != phi_) | (lo_o != plo_)
    seg0 = jnp.maximum(_flat_cummax_i32(jnp.where(first, pos, -1)),
                       cstart[0])
    nhi_ = next_elem(hi_o, nxt_hi)
    nlo_ = next_elem(lo_o, nxt_lo)
    last = (hi_o != nhi_) | (lo_o != nlo_)
    valid = ~((hi_o == S32) & (lo_o == S32))
    keep = last & valid
    cnt = (pos - seg0 + 1).astype(jnp.uint32)

    lastm = (row == TILE_R - 1) & (lane == LANES - 1)
    ckey[0] = _extract_u32(lastm, hi_o)
    ckey[1] = _extract_u32(lastm, lo_o)
    cstart[0] = jnp.max(seg0)
    return keep, cnt


def _append_packed(t, is_flush, chans, keep, outs, obuf, pend_buf, pkbuf,
                   osem, st):
    """Butterfly-pack keepers and append at the running element cursor
    (merge_fused's append, without its deferred-element overlay).

    chans = (hi, lo, cnt) register tiles; st SMEM (4,) i32 =
    [cursor_row, pend, total_out, unused]. The flush step (candidates all
    masked) writes the carried partial row and n_out.

    Round 4 fast paths (same as merge_fused's fused kernel): the butterfly
    pack is the identity whenever the kept rows form a prefix of the tile
    (all shift distances 0) -- the dominant case when duplicates are rare
    (unique-heavy batches) and for sentinel-tail tiles -- and the pend
    rotation is a no-op while the cursor stays row-aligned (it does, as
    long as every tile keeps a LANES-multiple: in the all-keep steady
    state pend stays 0). Both are pl.when-gated off a VMEM staging
    buffer so the skipped vector work never executes."""
    S32 = jnp.uint32(SENT)
    m = jnp.sum(keep.astype(jnp.int32))
    row, lane = _row_lane(chans[0].shape)
    pos = row * LANES + lane
    lastk = jnp.max(jnp.where(keep, pos, jnp.int32(-1)))
    firstd = jnp.min(jnp.where(keep, jnp.int32(pos.shape[0] * LANES), pos))
    prefix_ok = firstd > lastk

    pkbuf[0] = chans[0]
    pkbuf[1] = chans[1]
    pkbuf[2] = chans[2]

    @pl.when(~prefix_ok)
    def _pack():
        a, b, c = _butterfly_pack((pkbuf[0], pkbuf[1], pkbuf[2]), keep)
        pkbuf[0] = a
        pkbuf[1] = b
        pkbuf[2] = c

    pend = st[1]
    total = pend + m
    cur = st[0]

    @pl.when(t > 0)
    def _wait_prev_store():
        for ch in range(3):
            pltpu.make_async_copy(
                obuf.at[ch], outs[ch].at[pl.ds(0, OUT_R), :],
                osem.at[ch]).wait()

    fills = (S32, S32, jnp.uint32(0))
    ext = tuple(jnp.full((1, LANES), f, jnp.uint32) for f in fills)
    orow, olane = _row_lane((OUT_R, LANES))
    opos = orow * LANES + olane
    in_pend = opos < pend
    garbage = opos >= total
    p_rows = (pend_buf[0, 0:1, :], pend_buf[1, 0:1, :], pend_buf[2, 0:1, :])

    def _finish(rotfn):
        buf = tuple(jnp.concatenate([pkbuf[ch], ext[ch]], axis=0)
                    for ch in range(3))
        buf = rotfn(buf)
        for ch in range(3):
            obuf[ch] = jnp.where(garbage, fills[ch],
                                 jnp.where(in_pend, p_rows[ch], buf[ch]))

    @pl.when(pend == 0)
    def _rot_none():
        _finish(lambda b: b)

    @pl.when(pend > 0)
    def _rot_dyn():
        from zotpu.kernels.merge_fused import _rot_right_dyn
        _finish(lambda b: _rot_right_dyn(b, pend))

    full = total // LANES
    new_pend = jax.lax.rem(total, LANES)
    for ch in range(3):
        pend_buf[ch, 0:1, :] = obuf[ch, pl.ds(full, 1), :]
    for ch in range(3):
        pltpu.make_async_copy(
            obuf.at[ch], outs[ch].at[pl.ds(cur, OUT_R), :],
            osem.at[ch]).start()
    st[0] = cur + full
    st[1] = new_pend
    st[2] = st[2] + m


def _make_dedup_compact_kernel(ntiles: int):
    """Single sorted input (BlockSpec tiles) -> dense unique + counts."""

    def kernel(scal, hi_blk, lo_blk, pre_hi, pre_lo, pre_c,
               out_hi, out_lo, out_c, n_out,
               obuf, pend_buf, pkbuf, osem, ckey, cstart, st):
        del pre_hi, pre_lo, pre_c          # aliased sentinel prefill
        t = pl.program_id(0)
        S32 = jnp.uint32(SENT)
        outs = (out_hi, out_lo, out_c)

        @pl.when(t == 0)
        def _init():
            ckey[0] = S32
            ckey[1] = jnp.uint32(0)
            cstart[0] = jnp.int32(0)
            st[0] = 0
            st[1] = 0
            st[2] = 0

        is_flush = t == ntiles
        hi_o = jnp.where(is_flush, S32, hi_blk[:])
        lo_o = jnp.where(is_flush, S32, lo_blk[:])
        nxt_hi = scal[0, t].astype(jnp.uint32)
        nxt_lo = scal[1, t].astype(jnp.uint32)
        keep, cnt = _dedup_flags(hi_o, lo_o, t, ckey, cstart, nxt_hi,
                                 nxt_lo)
        _append_packed(t, is_flush, (hi_o, lo_o, cnt), keep, outs, obuf,
                       pend_buf, pkbuf, osem, st)

        @pl.when(is_flush)
        def _finish():
            for ch in range(3):
                pltpu.make_async_copy(
                    obuf.at[ch], outs[ch].at[pl.ds(0, OUT_R), :],
                    osem.at[ch]).wait()
            n_out[0] = st[2]

    return kernel


def dedup_out_cap(n: int) -> int:
    """Output capacity (elements) of the dense dedup kernels for an
    n-element input (n a TILE_E multiple): n + append slack, rounded so
    the output is itself a TILE_E multiple (round 4: batch runs then enter
    the accumulator's TILE-rounded level 0 with NO repadding copy)."""
    return n + 2 * TILE_E


@functools.partial(jax.jit, static_argnames=("interpret",))
def dedup_compact_pallas(hi, lo, interpret: bool = False):
    """Sorted (hi, lo) with duplicates + sentinel padding (len a TILE_E
    multiple) -> DENSE (uhi, ulo, counts, n_unique): unique keys up front
    with segment counts, sentinel/0 beyond. One streaming pass, no sort.

    Byte-compatible with kernels/sortdedup.dedup_count_sorted, which costs
    a full-width stable compaction sort; this is the TPU dispatch for it."""
    n = hi.shape[0]
    ntiles = n // TILE_E
    # scal row t = first key of tile t+1 (the tile-final lookahead)
    starts = jnp.minimum((jnp.arange(ntiles + 1, dtype=jnp.int32) + 1)
                         * TILE_E, n - 1)
    nxt_hi = jnp.where(jnp.arange(ntiles + 1) < ntiles - 1, hi[starts],
                       jnp.uint32(SENT))
    nxt_lo = jnp.where(jnp.arange(ntiles + 1) < ntiles - 1, lo[starts],
                       jnp.uint32(SENT))
    scal = jnp.stack([jax.lax.bitcast_convert_type(nxt_hi, jnp.int32),
                      jax.lax.bitcast_convert_type(nxt_lo, jnp.int32)])

    cap_rows = dedup_out_cap(n) // LANES
    prefill_k = jnp.full((cap_rows, LANES), jnp.uint32(SENT))
    prefill_c = jnp.zeros((cap_rows, LANES), jnp.uint32)

    ntc = ntiles  # captured for the clamped index map

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ntiles + 1,),
        in_specs=[pl.BlockSpec((TILE_R, LANES),
                               lambda t, s: (jnp.minimum(t, ntc - 1), 0),
                               memory_space=pltpu.VMEM)] * 2 +
                 [pl.BlockSpec(memory_space=pl.ANY)] * 3,
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3 +
                  [pl.BlockSpec(memory_space=pltpu.SMEM)],
        scratch_shapes=[
            pltpu.VMEM((3, OUT_R, LANES), jnp.uint32),
            pltpu.VMEM((3, 8, LANES), jnp.uint32),
            pltpu.VMEM((3, TILE_R, LANES), jnp.uint32),
            pltpu.SemaphoreType.DMA((3,)),
            pltpu.SMEM((2,), jnp.uint32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SMEM((4,), jnp.int32),
        ],
    )
    out_hi, out_lo, out_c, n_out = pl.pallas_call(
        _make_dedup_compact_kernel(ntiles),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((cap_rows, LANES), jnp.uint32)] * 3 +
                  [jax.ShapeDtypeStruct((1,), jnp.int32)],
        input_output_aliases={3: 0, 4: 1, 5: 2},
        interpret=interpret,
    )(scal, hi.reshape(-1, LANES), lo.reshape(-1, LANES),
      prefill_k, prefill_k, prefill_c)
    return (out_hi.reshape(-1), out_lo.reshape(-1), out_c.reshape(-1),
            n_out[0])


# ---------------------------------------------------------------------------
# DENSE dedup-compact merge twins: the sharded receive tree's FINAL level
# merges one pair of runs AND emits the dense unique set. Round 4: the
# merge front is the COMPACT alternating-direction formulation
# (sort_pallas._compact_merged_tile) -- the B run arrives stored DESCENDING
# (the tree's alternating-run convention), so one T-length [A asc | B desc]
# buffer is bitonic with no padded slack: 15 network stages over HALF the
# rows of the old padded-2T _merged_tile form, with double-buffered window
# DMAs. Scal layout: rows 0-6 = sort_pallas._alt_pass_scalars, rows 7-8 =
# the next tile's first merged key (the dedup lookahead), + flush column.
# ---------------------------------------------------------------------------


def _make_merged_dedup_kernel(ntiles: int):
    def kernel(scal_ref, *refs):
        ins = refs[:2]
        pre = refs[2:5]
        del pre                       # aliased sentinel prefill
        outs = refs[5:8]
        n_out = refs[8]
        win = refs[9]
        sems = refs[10]
        obuf, pend_buf, pkbuf, osem, ckey, cstart, st = refs[-7:]
        t = pl.program_id(0)
        S32 = jnp.uint32(SENT)

        @pl.when(t == 0)
        def _init():
            ckey[0] = S32
            ckey[1] = jnp.uint32(0)
            cstart[0] = jnp.int32(0)
            st[0] = 0
            st[1] = 0
            st[2] = 0

        is_flush = t == ntiles
        cand = _compact_merged_tile(scal_ref, t, ins, win, sems, ntiles)
        hi_o = jnp.where(is_flush, S32, cand[0])
        lo_o = jnp.where(is_flush, S32, cand[1])
        nxt_hi = scal_ref[7, t].astype(jnp.uint32)
        nxt_lo = scal_ref[8, t].astype(jnp.uint32)
        keep, cnt = _dedup_flags(hi_o, lo_o, t, ckey, cstart, nxt_hi,
                                 nxt_lo)
        _append_packed(t, is_flush, (hi_o, lo_o, cnt), keep, outs, obuf,
                       pend_buf, pkbuf, osem, st)

        @pl.when(is_flush)
        def _finish():
            for ch in range(3):
                pltpu.make_async_copy(
                    obuf.at[ch], outs[ch].at[pl.ds(0, OUT_R), :],
                    osem.at[ch]).wait()
            n_out[0] = st[2]

    return kernel


def _call_merged_dedup(scal, hi, lo, ntiles, interpret):
    """scal must have ntiles+1 columns (the flush column's windows load
    safe front-pad rows)."""
    n = hi.shape[0]
    chans = [_pad_chan_front(hi, jnp.uint32(SENT)),
             _pad_chan_front(lo, jnp.uint32(SENT))]
    cap_rows = dedup_out_cap(n) // LANES
    prefill_k = jnp.full((cap_rows, LANES), jnp.uint32(SENT))
    prefill_c = jnp.zeros((cap_rows, LANES), jnp.uint32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ntiles + 1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 5,
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3 +
                  [pl.BlockSpec(memory_space=pltpu.SMEM)],
        scratch_shapes=[
            pltpu.VMEM((2, 4, LOAD_R, LANES), jnp.uint32),
            pltpu.SemaphoreType.DMA((2, 4)),
            pltpu.VMEM((3, OUT_R, LANES), jnp.uint32),
            pltpu.VMEM((3, 8, LANES), jnp.uint32),
            pltpu.VMEM((3, TILE_R, LANES), jnp.uint32),
            pltpu.SemaphoreType.DMA((3,)),
            pltpu.SMEM((2,), jnp.uint32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SMEM((4,), jnp.int32)],
    )
    out_hi, out_lo, out_c, n_out = pl.pallas_call(
        _make_merged_dedup_kernel(ntiles),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((cap_rows, LANES), jnp.uint32)] * 3 +
                  [jax.ShapeDtypeStruct((1,), jnp.int32)],
        input_output_aliases={3: 0, 4: 1, 5: 2},
        interpret=interpret,
    )(scal, *chans, prefill_k, prefill_k, prefill_c)
    return (out_hi.reshape(-1), out_lo.reshape(-1), out_c.reshape(-1),
            n_out[0])


def _flush_col(scal):
    """Append one safe column for the flush grid step: windows load row 0
    (front padding) with zero counts (masked to sentinel in-kernel)."""
    return jnp.concatenate([scal, jnp.zeros((scal.shape[0], 1), jnp.int32)],
                           axis=1)


def _alt_lookahead_rows(hi, lo, scal, ga_first, gb_first):
    """Two extra scal rows: each NEXT tile's first merged key (sentinel
    after the last tile). The first merged element of a tile is
    min(A[ga_first], B_fwd[b0]) over its window (A wins ties); the B side's
    first FORWARD element lives at stored index ``gb_first`` (descending
    storage). Indices are unpadded globals."""
    n = hi.shape[0]
    S = jnp.uint32(SENT)
    a_cnt = scal[4]
    b_cnt = scal[5]
    sa = jnp.clip(ga_first, 0, n - 1)
    sb = jnp.clip(gb_first, 0, n - 1)
    ahi = jnp.where(a_cnt > 0, hi[sa], S)
    alo = jnp.where(a_cnt > 0, lo[sa], S)
    bhi = jnp.where(b_cnt > 0, hi[sb], S)
    blo = jnp.where(b_cnt > 0, lo[sb], S)
    a_le = _less_eq2(ahi, alo, bhi, blo)
    fhi = jnp.where(a_le, ahi, bhi)
    flo = jnp.where(a_le, alo, blo)
    nxt_hi = jnp.concatenate([fhi[1:], jnp.full((1,), S, jnp.uint32)])
    nxt_lo = jnp.concatenate([flo[1:], jnp.full((1,), S, jnp.uint32)])
    return jnp.concatenate([
        scal.astype(jnp.int32),
        jax.lax.bitcast_convert_type(nxt_hi, jnp.int32)[None],
        jax.lax.bitcast_convert_type(nxt_lo, jnp.int32)[None]])


@functools.partial(jax.jit, static_argnames=("interpret",))
def merged_dedup_compact_pass(hi, lo, run, interpret: bool = False):
    """ONE pair of equal runs of traced length ``run`` -- A = [:run]
    ascending, B = [run:] stored DESCENDING (the tree convention) --
    streaming-merged with the DENSE dedup-compact epilogue fused in.
    Returns dense (uhi, ulo, counts, n_unique)."""
    n = hi.shape[0]
    ntiles = n // TILE_E
    scal, (a0, b0, base) = _alt_pass_scalars(hi, lo, run, 0)
    gbf = base + 2 * run - 1 - b0
    scal = _flush_col(_alt_lookahead_rows(hi, lo, scal, base + a0, gbf))
    return _call_merged_dedup(scal, hi, lo, ntiles, interpret)


@functools.partial(jax.jit, static_argnames=("nA", "interpret"))
def merged_dedup_compact_pair(hi, lo, nA: int, interpret: bool = False):
    """Unequal-pair streaming merge + DENSE dedup-compact epilogue:
    A = [:nA] ascending, B = [nA:] stored DESCENDING (both TILE_E
    multiples; nB may be 0 for a single-run dedup through the same
    kernel)."""
    n = hi.shape[0]
    ntiles = n // TILE_E
    scal, (a0, b0, _) = _pair_alt_scalars(hi, lo, nA)
    gbf = n - 1 - b0
    scal = _flush_col(_alt_lookahead_rows(hi, lo, scal, a0, gbf))
    return _call_merged_dedup(scal, hi, lo, ntiles, interpret)
