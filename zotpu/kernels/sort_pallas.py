"""Pallas TPU sort engine: in-VMEM bitonic block sort + merge passes.

Replaces ``jax.lax.sort`` on the hot path. XLA's TPU sort streams ~log2(n/B)
pairwise merge passes over HBM on top of block sorts; this engine does the
same algorithm but fused: blocks sort entirely in VMEM (bitonic network built
from lane/sublane XOR-shuffles = two rolls + select per stage), and merge
passes bitonic-merge two sorted tiles per grid step.

Keys are (hi, lo) u32 pairs compared lexicographically; an optional third
u32 payload channel rides along (used for counts / sample ids).

Element layout inside a block: row-major over a (R, 128) u32 tile, index
i = r * 128 + c. XOR-partner shuffles at stride s:
  s < 128   -> lane-axis rolls by +/-s, select by lane bit
  s >= 128  -> sublane-axis rolls by +/-(s/128), select by row bit
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _xor_shuffle(v, s):
    """partner values: out[i] = v[i ^ s] for power-of-two stride s."""
    if s < LANES:
        fwd = pltpu.roll(v, shift=LANES - s, axis=1)   # out[i] = v[i+s]
        bwd = pltpu.roll(v, shift=s, axis=1)           # out[i] = v[i-s]
        lane = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
        return jnp.where((lane & s) == 0, fwd, bwd)
    sr = s // LANES
    fwd = pltpu.roll(v, shift=v.shape[0] - sr, axis=0)
    bwd = pltpu.roll(v, shift=sr, axis=0)
    row = jax.lax.broadcasted_iota(jnp.int32, v.shape, 0)
    return jnp.where((row & sr) == 0, fwd, bwd)


def _flip_all(v):
    """Full reversal over the row-major flat order: out[i] = v[n-1-i].

    Mosaic has no `rev` lowering, so reversal is composed from single-bit
    XOR shuffles (they commute): XOR with n-1 flips every index bit.
    """
    n = v.shape[0] * LANES
    bit = 1
    while bit < n:
        v = _xor_shuffle(v, bit)
        bit *= 2
    return v


def _index_bit(shape, bit):
    """(i & bit) != 0 as a bool array over the (R, 128) layout."""
    if bit < LANES:
        lane = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        return (lane & bit) != 0
    row = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    return (row & (bit // LANES)) != 0


def _compare_exchange(hi, lo, pay, s, ascending_mask):
    """One bitonic stage: exchange with partner i^s according to direction."""
    phi = _xor_shuffle(hi, s)
    plo = _xor_shuffle(lo, s)
    ppay = _xor_shuffle(pay, s) if pay is not None else None
    # partner < self in lexicographic (hi, lo) order?
    p_less = (phi < hi) | ((phi == hi) & (plo < lo))
    p_greater = (phi > hi) | ((phi == hi) & (plo > lo))
    i_is_low = ~_index_bit(hi.shape, s)   # i < i^s
    # ascending & low slot -> keep min; descending & low slot -> keep max.
    # (no jnp.where on bool operands: Mosaic can't truncate i8 vectors to i1)
    want_min = ~(ascending_mask ^ i_is_low)
    take_partner = (want_min & p_less) | (~want_min & p_greater)
    nhi = jnp.where(take_partner, phi, hi)
    nlo = jnp.where(take_partner, plo, lo)
    npay = jnp.where(take_partner, ppay, pay) if pay is not None else None
    return nhi, nlo, npay


def _bitonic_sort_block(hi, lo, pay, n):
    """Full bitonic sort of n = R*128 elements living in (R, 128) arrays."""
    kk = 2
    while kk <= n:
        asc = ~_index_bit(hi.shape, kk) if kk < n else jnp.ones(hi.shape, bool)
        s = kk // 2
        while s >= 1:
            hi, lo, pay = _compare_exchange(hi, lo, pay, s, asc)
            s //= 2
        kk *= 2
    return hi, lo, pay


def _bitonic_merge_block(hi, lo, pay, n):
    """Merge step only: input is two sorted halves, second half DESCENDING
    overall bitonic; cleans into fully ascending order."""
    s = n // 2
    asc = jnp.ones(hi.shape, bool)
    while s >= 1:
        hi, lo, pay = _compare_exchange(hi, lo, pay, s, asc)
        s //= 2
    return hi, lo, pay


def _sort_block_kernel(hi_ref, lo_ref, pay_ref, ohi_ref, olo_ref, opay_ref,
                       *, n):
    hi, lo, pay = _bitonic_sort_block(hi_ref[:], lo_ref[:], pay_ref[:], n)
    ohi_ref[:] = hi
    olo_ref[:] = lo
    opay_ref[:] = pay


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def sort_blocks_pallas(hi, lo, pay=None, block: int = 1 << 15,
                       interpret: bool = False):
    """Sort each consecutive ``block`` elements (flat u32 arrays).

    Returns blockwise-sorted (hi, lo, pay). n must be a multiple of block;
    callers pad with sentinel keys.
    """
    n = hi.shape[0]
    assert n % block == 0 and block % LANES == 0, (n, block)
    rows = block // LANES
    nb = n // block
    if pay is None:
        pay = jnp.zeros_like(hi)
    shape2 = (n // LANES, LANES)
    args = [x.reshape(shape2) for x in (hi, lo, pay)]
    spec = pl.BlockSpec((rows, LANES), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_sort_block_kernel, n=block),
        grid=(nb,),
        in_specs=[spec] * 3,
        out_specs=[spec] * 3,
        out_shape=[jax.ShapeDtypeStruct(shape2, jnp.uint32)] * 3,
        interpret=interpret,
    )(*args)
    return tuple(x.reshape(-1) for x in out)


def _merge_pass_kernel(ahi_ref, alo_ref, apay_ref, ohi_ref, olo_ref, opay_ref,
                       *, n):
    """Merge two sorted length-n/2 runs laid out contiguously in one block.

    The second run is reversed on load to form a bitonic sequence, then the
    standard merge network cleans it. Reversal of the second half uses the
    row-major layout: element j of half 2 sits at flat index n/2 + j.
    """
    hi = ahi_ref[:]
    lo = alo_ref[:]
    pay = apay_ref[:]
    R = hi.shape[0]

    # reverse the second half of the block (roll-based flip; no `rev` in Mosaic)
    def rev_half(v):
        top = v[: R // 2]
        bot = _flip_all(v[R // 2:])
        return jnp.concatenate([top, bot], axis=0)

    hi, lo, pay = rev_half(hi), rev_half(lo), rev_half(pay)
    hi, lo, pay = _bitonic_merge_block(hi, lo, pay, n)
    ohi_ref[:] = hi
    olo_ref[:] = lo
    opay_ref[:] = pay


@functools.partial(jax.jit, static_argnames=("run", "interpret"))
def merge_pass_pallas(hi, lo, pay, run: int, interpret: bool = False):
    """One merge pass: pairs of adjacent sorted runs (length ``run``) -> sorted
    runs of length 2*run. Both runs of a pair must fit in VMEM."""
    n = hi.shape[0]
    assert n % (2 * run) == 0
    rows = 2 * run // LANES
    nb = n // (2 * run)
    shape2 = (n // LANES, LANES)
    spec = pl.BlockSpec((rows, LANES), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_merge_pass_kernel, n=2 * run),
        grid=(nb,),
        in_specs=[spec] * 3,
        out_specs=[spec] * 3,
        out_shape=[jax.ShapeDtypeStruct(shape2, jnp.uint32)] * 3,
        interpret=interpret,
    )(hi.reshape(shape2), lo.reshape(shape2), pay.reshape(shape2))
    return tuple(x.reshape(-1) for x in out)


# ---------------------------------------------------------------------------
# Streaming merge-path pass: merge pairs of sorted runs of ANY length with
# VMEM-tile working sets. Per output tile of T = TILE_E elements, the XLA-side
# merge-path partition (A-first-on-ties) gives the exact input ranges
# A[a0:a1], B[b0:b1] with (a1-a0) + (b1-b0) = T; the kernel DMA-loads a
# row-aligned window per side, rotates it element-aligned, masks outside
# [0, cnt) to sentinel, reverses the B side and runs one bitonic merge
# network. Because ranges are exact, the output is multiset-exact even with
# duplicate keys (no tie-breaking hazards).
# ---------------------------------------------------------------------------

TILE_E = 1 << 15              # output tile elements
TILE_R = TILE_E // LANES      # 256 rows
LOAD_R = TILE_R + 8           # window rows (rotation slack, 8-row aligned)


def _less_eq2(ahi, alo, bhi, blo):
    return (ahi < bhi) | ((ahi == bhi) & (alo <= blo))


def _merge_partition(hi, lo, run, n):
    """a0 for every output tile boundary (vectorized merge-path search).

    run is a traced scalar; 26 fixed binary-search iterations cover any
    run <= 2^26 elements per side... actually any run: the search space per
    boundary is at most 2*TILE-bounded? No: a0 in [max(0,d-run), min(d,run)]
    spans up to run, so iterations must cover log2(run); 31 covers all i32.
    """
    t = jnp.arange(n // TILE_E, dtype=jnp.int32)
    pair = t // jnp.maximum(2 * run // TILE_E, 1)
    base = pair * 2 * run
    d = t * TILE_E - base               # offset within the pair
    nA = run
    lo_b = jnp.maximum(0, d - nA)
    hi_b = jnp.minimum(d, nA)

    def a_le_b(a_idx, b_idx):
        """A[a_idx] <= B[b_idx] with A-first ties; indices are pair-local."""
        ga = jnp.clip(base + a_idx, 0, n - 1)
        gb = jnp.clip(base + run + b_idx, 0, n - 1)
        le = _less_eq2(hi[ga], lo[ga], hi[gb], lo[gb])
        le = jnp.where(a_idx < 0, True, le)       # A[-1] = -inf
        le = jnp.where(b_idx >= nA, True, le)     # B[>=nB] = +inf
        le = jnp.where(b_idx < 0, False, le)
        return le

    def body(_, carry):
        lo_c, hi_c = carry
        mid = (lo_c + hi_c + 1) >> 1
        ok = a_le_b(mid - 1, d - mid)
        lo_c = jnp.where(ok, mid, lo_c)
        hi_c = jnp.where(ok, hi_c, mid - 1)
        return lo_c, hi_c

    lo_b, hi_b = jax.lax.fori_loop(0, 31, body, (lo_b, hi_b))
    return lo_b  # a0 per tile (pair-local)


def _flat_rot_const(v, r):
    """w[i] = v[i + r] over the row-major flat index, constant r in [0,128)."""
    if r == 0:
        return v
    rows = v.shape[0]
    vl = pltpu.roll(v, shift=LANES - r, axis=1)
    vup = pltpu.roll(v, shift=rows - 1, axis=0)
    vlu = pltpu.roll(vup, shift=LANES - r, axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
    return jnp.where(lane < LANES - r, vl, vlu)


def _flat_rot_dyn(v, rot):
    """Dynamic flat rotation by rot in [0, 128): 7 conditional const-rotates."""
    for bit in (64, 32, 16, 8, 4, 2, 1):
        v = jax.tree_util.tree_map(
            lambda x: jnp.where((rot & bit) != 0, _flat_rot_const(x, bit), x), v)
    return v


def _stream_merge_kernel(scal_ref, hi_hbm, lo_hbm, pay_hbm,
                         ohi_ref, olo_ref, opay_ref,
                         awin_hi, awin_lo, awin_pay,
                         bwin_hi, bwin_lo, bwin_pay, sems):
    t = pl.program_id(0)
    SENT = jnp.uint32(0xFFFFFFFF)
    a_row0 = scal_ref[0, t]
    b_row0 = scal_ref[1, t]
    a_rot = scal_ref[2, t]
    b_rot = scal_ref[3, t]
    a_cnt = scal_ref[4, t]
    b_cnt = scal_ref[5, t]

    copies = []
    for i, (src, dst) in enumerate((
            (hi_hbm, awin_hi), (lo_hbm, awin_lo), (pay_hbm, awin_pay))):
        c = pltpu.make_async_copy(src.at[pl.ds(a_row0, LOAD_R), :], dst,
                                  sems.at[i])
        c.start()
        copies.append(c)
    for i, (src, dst) in enumerate((
            (hi_hbm, bwin_hi), (lo_hbm, bwin_lo), (pay_hbm, bwin_pay))):
        c = pltpu.make_async_copy(src.at[pl.ds(b_row0, LOAD_R), :], dst,
                                  sems.at[3 + i])
        c.start()
        copies.append(c)
    for c in copies:
        c.wait()

    def prep(whi, wlo, wpay, rot, cnt, reverse):
        whi, wlo, wpay = _flat_rot_dyn((whi, wlo, wpay), rot)
        whi = whi[:TILE_R]
        wlo = wlo[:TILE_R]
        wpay = wpay[:TILE_R]
        row = jax.lax.broadcasted_iota(jnp.int32, whi.shape, 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, whi.shape, 1)
        flat = row * LANES + lane
        live = flat < cnt
        whi = jnp.where(live, whi, SENT)
        wlo = jnp.where(live, wlo, SENT)
        if reverse:
            whi, wlo, wpay = (_flip_all(x) for x in (whi, wlo, wpay))
        return whi, wlo, wpay

    ahi, alo, apay = prep(awin_hi[:], awin_lo[:], awin_pay[:],
                          a_rot, a_cnt, False)
    bhi, blo, bpay = prep(bwin_hi[:], bwin_lo[:], bwin_pay[:],
                          b_rot, b_cnt, True)
    chi = jnp.concatenate([ahi, bhi], axis=0)
    clo = jnp.concatenate([alo, blo], axis=0)
    cpay = jnp.concatenate([apay, bpay], axis=0)
    chi, clo, cpay = _bitonic_merge_block(chi, clo, cpay, 2 * TILE_E)
    ohi_ref[:] = chi[:TILE_R]
    olo_ref[:] = clo[:TILE_R]
    opay_ref[:] = cpay[:TILE_R]


@functools.partial(jax.jit, static_argnames=("interpret",))
def stream_merge_pass_pallas(hi, lo, pay, run, interpret: bool = False):
    """One streaming pass: sorted runs of (traced) length ``run`` -> 2*run.

    n must be a multiple of 2*run and of TILE_E. One compile serves every
    pass size (run is data, not shape).
    """
    n = hi.shape[0]
    ntiles = n // TILE_E
    a0 = _merge_partition(hi, lo, run, n)
    t = jnp.arange(ntiles, dtype=jnp.int32)
    pair = t // jnp.maximum(2 * run // TILE_E, 1)
    base = pair * 2 * run
    d = t * TILE_E - base
    # a1 = a0 of the next tile in the same pair; last tile of a pair ends at
    # the pair's d+TILE which by construction consumes the rest.
    next_a0 = jnp.concatenate([a0[1:], jnp.zeros((1,), a0.dtype)])
    next_pair = jnp.concatenate([pair[1:], jnp.full((1,), -1, pair.dtype)])
    a1 = jnp.where(next_pair == pair, next_a0,
                   jnp.minimum(run, d + TILE_E))
    b0 = d - a0
    b1 = (d + TILE_E) - a1
    ga0 = base + a0
    gb0 = base + run + b0
    scal = jnp.stack([
        ga0 // LANES,                    # a_row0
        gb0 // LANES,                    # b_row0
        ga0 % LANES,                     # a_rot
        gb0 % LANES,                     # b_rot
        a1 - a0,                         # a_cnt
        b1 - b0,                         # b_cnt
    ]).astype(jnp.int32)

    # pad inputs so window loads never run off the end
    pad_rows = LOAD_R
    def pad(x, fill):
        return jnp.concatenate(
            [x.reshape(-1, LANES),
             jnp.full((pad_rows, LANES), fill, x.dtype)])
    hi2, lo2 = pad(hi, jnp.uint32(0xFFFFFFFF)), pad(lo, jnp.uint32(0xFFFFFFFF))
    pay2 = pad(pay, jnp.uint32(0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((TILE_R, LANES), lambda t, s: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_R, LANES), lambda t, s: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_R, LANES), lambda t, s: (t, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((LOAD_R, LANES), jnp.uint32) for _ in range(6)
        ] + [pltpu.SemaphoreType.DMA((6,))],
    )
    out = pl.pallas_call(
        _stream_merge_kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((n // LANES, LANES), jnp.uint32)] * 3,
        interpret=interpret,
    )(scal, hi2, lo2, pay2)
    return tuple(x.reshape(-1) for x in out)


def _next_pow2(x: int) -> int:
    return 1 << max(x - 1, 0).bit_length()


def sort_pallas(hi, lo, pay=None, block: int = 1 << 15,
                max_vmem_run: int = 1 << 17, interpret: bool = False):
    """Full sort of flat (hi, lo[, pay]) u32 arrays, ascending lexicographic.

    Phase 1 block-sorts in VMEM; phase 2 merges pairwise in VMEM while run
    pairs fit; phase 3 streams merge-path passes for arbitrarily large runs.
    Input is padded to a power of two with sentinel keys and sliced back.
    """
    n0 = hi.shape[0]
    had_pay = pay is not None
    if pay is None:
        pay = jnp.zeros_like(hi)
    if n0 < 2 * LANES:   # tiny: not worth a kernel
        out = jax.lax.sort((hi, lo, pay), num_keys=2)
        return out if had_pay else out[:2]
    n = max(_next_pow2(n0), LANES * 2)
    if n > n0:
        padk = jnp.full(n - n0, 0xFFFFFFFF, jnp.uint32)
        hi = jnp.concatenate([hi, padk])
        lo = jnp.concatenate([lo, padk])
        pay = jnp.concatenate([pay, jnp.zeros(n - n0, jnp.uint32)])
    block = min(block, n)
    hi, lo, pay = sort_blocks_pallas(hi, lo, pay, block=block,
                                     interpret=interpret)
    run = block
    while run < n and 2 * run <= max_vmem_run:
        hi, lo, pay = merge_pass_pallas(hi, lo, pay, run=run,
                                        interpret=interpret)
        run *= 2
    while run < n:
        hi, lo, pay = stream_merge_pass_pallas(
            hi, lo, pay, jnp.int32(run), interpret=interpret)
        run *= 2
    hi, lo, pay = hi[:n0], lo[:n0], pay[:n0]
    return (hi, lo, pay) if had_pay else (hi, lo)
