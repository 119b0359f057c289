"""Fused streaming set-op kernel: merge + combine + compact in ONE Pallas pass.

Reference analog: zotmer's two-pointer sorted set-op sweeps (SURVEY.md
sections 3.2-3.3), which produce the combined, dense result in one pass.
Round-2's merge-path front-end (kernels/setops_merge.py) replaced the full
re-sort with a streaming Pallas merge, but still paid an XLA combine +
stable-flag-sort compaction tail; measured on TPU v5e the three parts cost
~33 + ~0 + ~14 ms at 2x2M keys. This kernel fuses all three:

  per output tile (sequential TPU grid):
    1. DMA the exact merge-path input windows (A ascending; B loaded from a
       globally PRE-REVERSED copy, so the bitonic "descending half" needs no
       in-kernel 15-stage flip), double-buffered across tiles;
    2. lane-level alignment rotations only (A's live run left-aligned, B's
       right-aligned; row alignment is absorbed into the window row offset);
    3. one bitonic-merge network over 2T candidates -- THREE channels
       (hi, lo, count): one count channel serves every op because a
       2-member key segment always has one member per side (inputs are
       per-side unique), so side membership follows from segment size;
    4. combine neighbours in-register (segment size <= 2) with a carried
       "deferred last element" resolving segments that straddle tiles;
    5. compact kept elements in-register via BUTTERFLY PACKING: the
       exclusive cumsum of drops gives each kept element its left-shift
       distance; LSB-first power-of-two pull stages route every element to
       its packed slot conflict-free (monotone concentrator routing) --
       ~30 cheap stages instead of a 120-stage bitonic flag sort;
    6. append to the output at a running element cursor (SMEM) with
       garbage-overwrite window DMA: only whole 128-lane rows advance the
       cursor; the partial tail row is carried in VMEM and re-emitted by
       the next tile. Rows never written keep their sentinel prefill
       (input/output aliasing), so the result is dense with a sentinel
       tail and NO XLA post-pass.

Contract matches kernels/setops.set_op: DENSE sorted unique sentinel-padded
inputs -> (hi, lo, counts, n_out) dense; counts saturate at u32 max
(zotpu/semantics.py policy).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from zotpu.kernels.pack import SENT32
from zotpu.kernels.sort_pallas import (LANES, TILE_E, TILE_R,
                                       _bitonic_merge_block, _pair_partition)

LOAD_R = TILE_R + 8          # input window rows (alignment slack, 8-aligned)
OUT_R = TILE_R + 1           # output buffer rows (tile + carried partial row)


def _row_lane(shape):
    row = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    return row, lane


def _flat_pos(shape):
    row, lane = _row_lane(shape)
    return row * LANES + lane


def _rot_left_const(v, r):
    """w[i] = v[(i + r) mod N] over row-major flat order, 0 < r < 128."""
    rows = v.shape[0]
    vl = pltpu.roll(v, shift=LANES - r, axis=1)
    vlu = pltpu.roll(pltpu.roll(v, shift=rows - 1, axis=0),
                     shift=LANES - r, axis=1)
    _, lane = _row_lane(v.shape)
    return jnp.where(lane < LANES - r, vl, vlu)


def _rot_right_const(v, r):
    """w[i] = v[(i - r) mod N] over row-major flat order, 0 < r < 128."""
    vr = pltpu.roll(v, shift=r, axis=1)
    vrd = pltpu.roll(pltpu.roll(v, shift=1, axis=0), shift=r, axis=1)
    _, lane = _row_lane(v.shape)
    return jnp.where(lane >= r, vr, vrd)


def _rot_left_dyn(chans, rot):
    """Dynamic flat rotate-left by rot in [0, 128): w[i] = v[(i+rot) mod N].

    Round 4: ONE dynamic lane roll per channel (pltpu.roll lowers a traced
    shift to the VPU's dynamic rotate) + a constant row roll + one select,
    replacing the old 7-stage conditional const-rotate cascade (~28 vector
    ops -> ~5 per channel; the input-window rotations were ~1/3 of the
    fused kernel's per-tile vector work)."""
    s = jax.lax.rem(jnp.int32(LANES) - rot, jnp.int32(LANES))

    def one(v):
        vl = pltpu.roll(v, shift=s, axis=1)
        vlu = pltpu.roll(vl, shift=v.shape[0] - 1, axis=0)
        _, lane = _row_lane(v.shape)
        return jnp.where(lane < LANES - rot, vl, vlu)

    return tuple(one(c) for c in chans)


def _rot_right_dyn(chans, rot):
    """Dynamic flat rotate-right by rot in [0, 128]: one conditional row
    roll (the 128 case) + ONE dynamic lane roll + a constant row roll +
    one select per channel (see _rot_left_dyn)."""
    row128 = (rot & 128) != 0
    r = rot & 127

    def one(v):
        v = jnp.where(row128, pltpu.roll(v, shift=1, axis=0), v)
        vr = pltpu.roll(v, shift=r, axis=1)
        vrd = pltpu.roll(vr, shift=1, axis=0)
        _, lane = _row_lane(v.shape)
        return jnp.where(lane >= r, vr, vrd)

    return tuple(one(c) for c in chans)


def _shift_right_flat(v, s, fill):
    """w[i] = v[i - s] where i >= s, else fill; s a power of two."""
    pos = _flat_pos(v.shape)
    if s < LANES:
        w = _rot_right_const(v, s)
    else:
        w = pltpu.roll(v, shift=s // LANES, axis=0)
    return jnp.where(pos >= s, w, fill)


def _shift_left_flat(v, s, fill):
    """w[i] = v[i + s] where i + s < N, else fill; s a power of two."""
    n = v.shape[0] * LANES
    pos = _flat_pos(v.shape)
    if s < LANES:
        w = _rot_left_const(v, s)
    else:
        w = pltpu.roll(v, shift=v.shape[0] - s // LANES, axis=0)
    return jnp.where(pos < n - s, w, fill)


def _extract(mask, v):
    """Scalar value of v at the single True position of mask (else 0).

    Mosaic has no unsigned reductions: bitcast to i32, sum (exact -- at most
    one non-zero term), bitcast back."""
    masked = jnp.where(mask, v, jnp.zeros_like(v))
    s = jnp.sum(jax.lax.bitcast_convert_type(masked, jnp.int32),
                dtype=jnp.int32)
    # same-width int conversion wraps modulo 2^32 == bit reinterpretation
    # (tpu.bitcast is vector-only, so no scalar bitcast here)
    return s.astype(jnp.uint32)


def _sat_add(a, b):
    s = a + b
    return jnp.where(s < a, jnp.uint32(0xFFFFFFFF), s)


def _combine_policy(op, first, same_next, valid, c, next_c):
    """keep mask + combined count for each segment-FIRST element.

    Inputs are per-side unique, so a segment has <= 2 members; a 2-member
    segment has exactly one member per side. For "diff" the caller zeroes
    the B-side count channel, so presence-in-A == (c > 0)."""
    if op in ("merge", "union"):
        keep = first & valid
        cnt = _sat_add(c, jnp.where(same_next, next_c, jnp.uint32(0)))
    elif op == "intersect":
        keep = first & valid & same_next
        cnt = _sat_add(c, jnp.where(same_next, next_c, jnp.uint32(0)))
    elif op == "diff":
        keep = first & valid & ~same_next & (c > jnp.uint32(0))
        cnt = c
    else:
        raise ValueError(f"unknown set op {op!r}")
    return keep, cnt


def _deferred_policy(op, live, match0, d_c, c0):
    """The combine policy in scalar form for the carried deferred element;
    match0 means this tile's first element continues the deferred segment."""
    if op in ("merge", "union"):
        emit = live
        cnt = _sat_add(d_c, jnp.where(match0, c0, jnp.uint32(0)))
    elif op == "intersect":
        emit = live & match0
        cnt = _sat_add(d_c, jnp.where(match0, c0, jnp.uint32(0)))
    elif op == "diff":
        emit = live & ~match0 & (d_c > jnp.uint32(0))
        cnt = d_c
    else:
        raise ValueError(f"unknown set op {op!r}")
    return emit, cnt


def _butterfly_pack(chans, keep):
    """Stable in-register compaction: kept elements move to the front in
    order; the tail becomes garbage (caller masks it). Monotone concentrator
    routing: d[i] = dropped-before-i (exclusive cumsum) is kept element i's
    total left shift; pulling in LSB-first power-of-two stages is
    conflict-free for monotone distances (tests/test_merge_fused.py checks
    this against brute force)."""
    shape = chans[0].shape
    n = shape[0] * LANES
    drop = jnp.where(keep, jnp.uint32(0), jnp.uint32(1))
    incl = drop
    s = 1
    while s < n:
        incl = incl + _shift_right_flat(incl, s, jnp.uint32(0))
        s *= 2
    r = incl - drop              # exclusive cumsum = shift distance
    s = 1
    while s < n:
        r_right = _shift_left_flat(r, s, jnp.uint32(0))
        pull = (r_right & jnp.uint32(s)) != 0
        chans = tuple(
            jnp.where(pull, _shift_left_flat(c, s, jnp.uint32(0)), c)
            for c in chans)
        r = jnp.where(pull, r_right - jnp.uint32(s), r)
        s *= 2
    return chans


def _make_fused_kernel(op: str, ntiles: int):
    """Sequential-grid kernel: ntiles data tiles + 1 flush step."""

    def kernel(scal, ahi, alo, ac, bhi, blo, bc, pre_hi, pre_lo, pre_c,
               out_hi, out_lo, out_c, n_out,
               win, obuf, pend_buf, pkbuf, sems, osem, st, dk):
        # scratch:
        #  win (2, 6, LOAD_R, 128) u32: [slot][side*3+ch] input windows
        #  obuf (3, OUT_R, 128) u32: output assembly buffer
        #  pend_buf (3, 8, 128) u32: carried partial row (row 0 used)
        #  pkbuf (3, TILE_R, 128) u32: pack staging (drop-free fast path)
        #  sems (2, 6) DMA in; osem (3,) DMA out
        #  st SMEM (8,) i32: [cursor_row, pend, total_out, d_live]
        #  dk SMEM (4,) u32: deferred [hi, lo, count]
        del pre_hi, pre_lo, pre_c   # aliased to out_*; sentinel prefill
        t = pl.program_id(0)
        SENT = jnp.uint32(0xFFFFFFFF)
        ins = (ahi, alo, ac, bhi, blo, bc)
        outs = (out_hi, out_lo, out_c)

        @pl.when(t == 0)
        def _init():
            st[0] = 0
            st[1] = 0
            st[2] = 0
            st[3] = 0
            st[4] = 0        # an output store is outstanding (un-waited)

        def dma_in(tt, slot, ch):
            src = ins[ch]
            row = scal[0, tt] if ch < 3 else scal[1, tt]
            return pltpu.make_async_copy(
                src.at[pl.ds(row, LOAD_R), :], win.at[slot, ch],
                sems.at[slot, ch])

        def issue(tt):
            slot = jax.lax.rem(tt, 2)
            for ch in range(6):
                dma_in(tt, slot, ch).start()

        # Live-tile gate (round 5): merge-path offsets are monotone in t,
        # so tiles past BOTH valid prefixes form a contiguous DEAD suffix
        # whose candidates are all sentinel padding. Dead tiles skip the
        # input-window DMAs, the rotations + merge network, the output
        # assembly and the store -- at the LSM accumulator's level shapes
        # the caps grow 2^level while the valid prefix saturates, so MOST
        # tiles of upper-level merges are dead. The flush step (t ==
        # ntiles) rides the same dead branch: its scal column is zeroed by
        # the wrapper. Dead tiles still run the (cheap) combine/deferred
        # logic below, so the deferred element from the last live tile is
        # emitted exactly as before (the first dead tile stores it).
        is_flush = t == ntiles
        live = scal[6, t] != 0

        # double-buffered input windows: tile t's loads were issued at t-1
        # (t=0 issues its own); issue and wait are BOTH gated on the target
        # tile's live flag, so every issued window is waited exactly once
        # and dead tiles pay no DMA traffic at all.
        @pl.when((t == 0) & live)
        def _first():
            issue(0)

        tnext = jnp.minimum(t + 1, ntiles)   # clamp: scal column must exist
        @pl.when((t + 1 <= ntiles) & (scal[6, tnext] != 0))
        def _next():
            issue(tnext)

        slot = jax.lax.rem(t, 2)

        @pl.when(live)
        def _wait_in():
            for ch in range(6):
                dma_in(t, slot, ch).wait()

        # Deferred-element scalars: read BEFORE the branches update dk/st
        # (the emitted deferred element is the one carried INTO this tile).
        d_live = st[3] != 0
        d_hi = jnp.where(d_live, dk[0], SENT)
        d_lo = jnp.where(d_live, dk[1], SENT)
        d_c = dk[2]

        # ALL per-tile vector work lives in the live branch; a dead tile's
        # candidates are pure sentinel, so its combine outcome is known in
        # scalar form: nothing kept (m = 0), the carried deferred element
        # resolves against a sentinel first element (match0 = False), and
        # no new element is deferred (st[3] = 0). The branches communicate
        # through SMEM (st[5] = m, st[6] = d_emit, dk[3] = d_cnt) because
        # pl.when returns no values; pkbuf content is irrelevant for dead
        # tiles (a dead store's positions are fully covered by the pend/
        # deferred/garbage overlays in the assembly below).
        @pl.when(live)
        def _compute_tile():
            # The partition is exact: a_cnt + b_cnt == TILE_E. Compose ONE
            # T-length bitonic buffer with NO padding: A's live run left-
            # aligned ascending at [0, a_cnt), B's live run (from the
            # globally REVERSED copy, so already descending; its window
            # alignment puts the run end on the row-(TILE_R+1) boundary
            # after a right-rotation by b_rot) right-aligned at [a_cnt, T).
            # [asc | desc] is bitonic; the merge network is log2(T) stages
            # over T candidates -- HALF the vector work of the padded-2T
            # formulation.
            a = tuple(win[slot, ch] for ch in range(3))
            a = _rot_left_dyn(a, scal[2, t])
            b = tuple(win[slot, ch + 3] for ch in range(3))
            b = _rot_right_dyn(b, scal[3, t])
            pos = _flat_pos((TILE_R, LANES))
            in_a = pos < scal[4, t]
            cand = tuple(jnp.where(in_a, x[:TILE_R], y[1:TILE_R + 1])
                         for x, y in zip(a, b))
            vhi, vlo, vc = _bitonic_merge_block(cand, TILE_E)

            elem0 = pos == 0
            last = pos == TILE_E - 1
            valid = ~((vhi == SENT) & (vlo == SENT))

            # stream neighbours; element 0's predecessor is the deferred
            # key (SENT when not live => first=True unless elem 0 is
            # sentinel).
            phi = _shift_right_flat(vhi, 1, d_hi)
            plo = _shift_right_flat(vlo, 1, d_lo)
            nhi = _shift_left_flat(vhi, 1, SENT)
            nlo = _shift_left_flat(vlo, 1, SENT)
            nc = _shift_left_flat(vc, 1, jnp.uint32(0))
            first = (vhi != phi) | (vlo != plo)
            same_next = (vhi == nhi) & (vlo == nlo) & ~last & valid
            keep, cnt = _combine_policy(op, first, same_next, valid, vc, nc)

            # resolve the deferred element against this tile's first elem
            v0_hi = _extract(elem0, vhi)
            v0_lo = _extract(elem0, vlo)
            v0_c = _extract(elem0, vc)
            match0 = d_live & (v0_hi == d_hi) & (v0_lo == d_lo) & \
                ~((v0_hi == SENT) & (v0_lo == SENT))
            d_emit, d_cnt = _deferred_policy(op, d_live, match0, d_c, v0_c)

            # defer this tile's LAST element (its same_next is unknowable);
            # if it is not a segment FIRST its segment was already resolved
            nd_live = jnp.sum(jnp.where(last,
                                        (first & valid).astype(jnp.int32),
                                        0), dtype=jnp.int32)
            dk[0] = _extract(last, vhi)
            dk[1] = _extract(last, vlo)
            dk[2] = _extract(last, vc)
            st[3] = nd_live
            keep = keep & ~last
            st[5] = jnp.sum(keep.astype(jnp.int32))
            st[6] = d_emit.astype(jnp.int32)
            dk[3] = d_cnt

            # Drop-free fast path (round 4): the butterfly pack is ~1/3 of
            # the kernel's vector work but is the IDENTITY whenever the
            # kept rows already form a prefix of the tile (every shift
            # distance is then 0) -- the dominant case for merges of
            # mostly-disjoint sets and for sentinel-tail tiles. Stage the
            # channels in VMEM and pack only when a kept row follows a
            # dropped one.
            lastk = jnp.max(jnp.where(keep, pos, jnp.int32(-1)))
            firstd = jnp.min(jnp.where(keep, jnp.int32(TILE_E), pos))
            prefix_ok = firstd > lastk

            pkbuf[0] = vhi
            pkbuf[1] = vlo
            pkbuf[2] = cnt

            @pl.when(~prefix_ok)
            def _pack():
                a3, b3, c3 = _butterfly_pack(
                    (pkbuf[0], pkbuf[1], pkbuf[2]), keep)
                pkbuf[0] = a3
                pkbuf[1] = b3
                pkbuf[2] = c3

        @pl.when(~live)
        def _dead_tile():
            d_emit, d_cnt = _deferred_policy(op, d_live, jnp.bool_(False),
                                             d_c, jnp.uint32(0))
            st[3] = 0
            st[5] = 0
            st[6] = d_emit.astype(jnp.int32)
            dk[3] = d_cnt

        m = st[5]
        d_emit = st[6] != 0
        d_cnt = dk[3]

        # Store gate (round 5): a dead tile that emits nothing (no deferred
        # element landing) would re-assemble and re-store the SAME obuf
        # content at the SAME cursor -- skip the assembly, the carry and
        # the store entirely. ``live`` tiles always store; the first dead
        # tile stores iff the deferred element emits into it. st[4] tracks
        # whether a store is outstanding (started, not yet waited): every
        # new store waits the previous one first, so at most one is ever in
        # flight and the flush step drains the last (semaphore pairing
        # stays exact under the gating).
        pend = st[1]
        d_emit_i = d_emit.astype(jnp.int32)
        rot = pend + d_emit_i
        total = pend + d_emit_i + m
        cur = st[0]
        store_now = live | d_emit

        # the previous tile's store reads obuf and overlaps this tile's
        # window rows: wait for it before overwriting/starting ours.
        @pl.when(store_now & (st[4] != 0))
        def _wait_prev_store():
            for ch in range(3):
                pltpu.make_async_copy(
                    obuf.at[ch], outs[ch].at[pl.ds(0, OUT_R), :],
                    osem.at[ch]).wait()

        # assemble the output window: [pending | deferred? | packed tile],
        # sentinel-masked beyond; positions vacated by the right-rotation
        # are exactly the pending/deferred overlay region. The rotation
        # amount is pend + d_emit; in the steady drop-free state it is
        # exactly 1 (pend stays 0, the deferred element re-emits), so the
        # dynamic 8-stage rotation specializes to one constant rotate --
        # each branch runs register-resident off the staged pack buffer.
        opos = _flat_pos((OUT_R, LANES))
        at_def = (opos == pend) & d_emit
        in_pend = opos < pend
        garbage = opos >= total
        p_rows = (pend_buf[0, 0:1, :], pend_buf[1, 0:1, :],
                  pend_buf[2, 0:1, :])
        d_vals = (d_hi, d_lo, d_cnt)
        fills = (SENT, SENT, jnp.uint32(0))
        ext = (jnp.full((1, LANES), SENT, jnp.uint32),) * 2 + \
            (jnp.zeros((1, LANES), jnp.uint32),)

        def _finish(rotfn):
            buf = tuple(jnp.concatenate([pkbuf[ch], ext[ch]], axis=0)
                        for ch in range(3))
            buf = rotfn(buf)
            for ch in range(3):
                obuf[ch] = jnp.where(
                    garbage, fills[ch],
                    jnp.where(at_def, d_vals[ch],
                              jnp.where(in_pend, p_rows[ch], buf[ch])))

        @pl.when(store_now & (rot == 0))
        def _rot_none():
            _finish(lambda b: b)

        @pl.when(store_now & (rot == 1))
        def _rot_one():
            _finish(lambda b: tuple(_rot_right_const(c, 1) for c in b))

        @pl.when(store_now & (rot > 1))
        def _rot_dyn():
            _finish(lambda b: _rot_right_dyn(b, rot))

        full = total // LANES
        new_pend = jax.lax.rem(total, LANES)

        @pl.when(store_now)
        def _carry_and_store():
            # carry the new partial row (the first not-fully-emitted row)
            for ch in range(3):
                pend_buf[ch, 0:1, :] = obuf[ch, pl.ds(full, 1), :]
            for ch in range(3):
                pltpu.make_async_copy(
                    obuf.at[ch], outs[ch].at[pl.ds(cur, OUT_R), :],
                    osem.at[ch]).start()

        # scalar state: for a skipped (dead, non-emitting) tile full == 0
        # and new_pend == pend, so these are no-ops there by construction
        st[0] = cur + full
        st[1] = new_pend
        st[2] = st[2] + d_emit_i + m
        st[4] = jnp.where(store_now, 1, st[4])

        @pl.when(is_flush)
        def _emit_n():
            n_out[0] = st[2]

        @pl.when(is_flush & ((st[4] != 0) | store_now))
        def _drain_last_store():
            for ch in range(3):
                pltpu.make_async_copy(
                    obuf.at[ch], outs[ch].at[pl.ds(0, OUT_R), :],
                    osem.at[ch]).wait()

    return kernel


@functools.partial(jax.jit, static_argnames=("op", "interpret"))
def set_op_fused(hi_a, lo_a, c_a, hi_b, lo_b, c_b, op: str = "merge",
                 interpret: bool = False, n_a=None, n_b=None):
    """Fused set_op over DENSE sorted unique sentinel-padded inputs.

    Same contract/outputs as ``setops.set_op`` (hi, lo, counts, n_out):
    dense sorted unique prefix, sentinel/0 beyond, output capacity
    TILE-rounded |A| + |B| + one spill tile. (Round 4: inputs pad to the
    next TILE_E multiple, not the next power of two -- pow2 padding cost
    ~10% extra candidates at the accumulator's level shapes.)

    ``n_a``/``n_b`` (optional TRACED scalars): the valid-prefix lengths.
    When given, tiles past both prefixes skip the merge network in-kernel
    (round 5) -- at LSM level shapes (caps grow 2^level, valid saturates)
    this is most of the candidates. Byte-identical output either way."""
    MA = max(-(-hi_a.shape[0] // TILE_E) * TILE_E, TILE_E)
    MB = max(-(-hi_b.shape[0] // TILE_E) * TILE_E, TILE_E)
    n = MA + MB
    ntiles = n // TILE_E

    def padk(x, M):
        return jnp.concatenate([x, jnp.full(M - x.shape[0], SENT32,
                                            jnp.uint32)])

    def padc(x, M):
        return jnp.concatenate([x.astype(jnp.uint32),
                                jnp.zeros(M - x.shape[0], jnp.uint32)])

    ahi, alo = padk(hi_a, MA), padk(lo_a, MA)
    bhi, blo = padk(hi_b, MB), padk(lo_b, MB)
    ac = padc(c_a, MA)
    # for diff, B-side counts are zeroed: presence-in-A == (count > 0)
    bc = padc(c_b, MB) if op != "diff" else jnp.zeros(MB, jnp.uint32)

    # exact merge-path partition over the forward concatenation
    a0 = _pair_partition(jnp.concatenate([ahi, bhi]),
                         jnp.concatenate([alo, blo]), MA, MB)
    a1 = jnp.concatenate([a0[1:], jnp.full((1,), MA, a0.dtype)])
    d = jnp.arange(ntiles, dtype=jnp.int32) * TILE_E
    b0 = d - a0
    b1 = (d + TILE_E) - a1

    # A windows: row-aligned start, live run at flat offset a0 % 128.
    # B is passed REVERSED: forward range [b0, b1) lives at reversed
    # positions [MB - b1, MB - b0), descending. Choose the window start and
    # right-rotation so the run's END lands exactly on the row-(TILE_R + 1)
    # boundary of the rotated window (kernel slices rows [1, TILE_R + 1)).
    bend = MB - b0
    bend_row = (bend + LANES - 1) // LANES
    b_rot = (LANES - bend % LANES) % LANES
    b_row = bend_row - TILE_R - 1 + LOAD_R    # + front-pad offset

    # Live-tile flags (round 5): a tile is dead when BOTH input windows
    # start beyond their side's valid prefix -- everything it would merge
    # is sentinel padding, so the kernel skips the merge network for it.
    # Callers that track valid counts (the LSM accumulator, the receive
    # tree) pass n_a/n_b as traced scalars; the default (full lengths)
    # keeps every tile live, which is exactly the old behavior.
    na = jnp.asarray(MA if n_a is None else n_a, jnp.int32)
    nb = jnp.asarray(MB if n_b is None else n_b, jnp.int32)
    live = ((a0 < na) | (b0 < nb)).astype(jnp.int32)
    scal = jnp.stack([a0 // LANES, b_row, a0 % LANES, b_rot,
                      a1 - a0, b1 - b0, live]).astype(jnp.int32)
    # one extra zero column = the flush step's scalars (live = 0: it rides
    # the dead branch, emitting only the carried pend/deferred remainder)
    scal = jnp.concatenate([scal, jnp.zeros((7, 1), jnp.int32)], axis=1)

    def rows(x, front, back, fill):
        return jnp.concatenate([
            jnp.full((front * LANES,), fill, x.dtype), x,
            jnp.full((back * LANES,), fill, x.dtype)]).reshape(-1, LANES)

    in_arrs = [rows(ahi, 0, LOAD_R, jnp.uint32(SENT32)),
               rows(alo, 0, LOAD_R, jnp.uint32(SENT32)),
               rows(ac, 0, LOAD_R, jnp.uint32(0)),
               rows(bhi[::-1], LOAD_R, LOAD_R, jnp.uint32(SENT32)),
               rows(blo[::-1], LOAD_R, LOAD_R, jnp.uint32(SENT32)),
               rows(bc[::-1], LOAD_R, LOAD_R, jnp.uint32(0))]

    cap_rows = n // LANES + OUT_R + 8
    prefill_k = jnp.full((cap_rows, LANES), SENT32, jnp.uint32)
    prefill_c = jnp.zeros((cap_rows, LANES), jnp.uint32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ntiles + 1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 9,
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3 +
                  [pl.BlockSpec(memory_space=pltpu.SMEM)],
        scratch_shapes=[
            pltpu.VMEM((2, 6, LOAD_R, LANES), jnp.uint32),
            pltpu.VMEM((3, OUT_R, LANES), jnp.uint32),
            pltpu.VMEM((3, 8, LANES), jnp.uint32),
            pltpu.VMEM((3, TILE_R, LANES), jnp.uint32),
            pltpu.SemaphoreType.DMA((2, 6)),
            pltpu.SemaphoreType.DMA((3,)),
            pltpu.SMEM((8,), jnp.int32),
            pltpu.SMEM((4,), jnp.uint32),
        ],
    )
    out_hi, out_lo, out_c, n_out = pl.pallas_call(
        _make_fused_kernel(op, ntiles),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((cap_rows, LANES), jnp.uint32)] * 3 +
                  [jax.ShapeDtypeStruct((1,), jnp.int32)],
        input_output_aliases={7: 0, 8: 1, 9: 2},
        interpret=interpret,
    )(scal, *in_arrs, prefill_k, prefill_k, prefill_c)
    return (out_hi.reshape(-1), out_lo.reshape(-1), out_c.reshape(-1),
            n_out[0])
