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
    # ascending & low slot -> keep min; descending & low slot -> keep max
    want_min = jnp.logical_not(jnp.logical_xor(ascending_mask, i_is_low))
    take_partner = jnp.where(want_min, p_less, p_greater)
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

    # reverse the second half of the block (rows R/2.. reversed, lanes flipped)
    def rev_half(v):
        top = v[: R // 2]
        bot = v[R // 2:][::-1, ::-1]
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


def sort_pallas(hi, lo, pay=None, block: int = 1 << 15,
                max_vmem_run: int = 1 << 17, interpret: bool = False):
    """Full sort of flat (hi, lo[, pay]) u32 arrays, ascending lexicographic.

    Phase 1 block-sorts; phase 2 merges pairwise while run pairs fit in VMEM.
    For n beyond max_vmem_run the tail merging falls back to jax.lax.sort of
    run boundaries... (not yet: callers cap n at max_vmem_run or use lax.sort;
    the streaming merge-path pass lands next).
    """
    n = hi.shape[0]
    had_pay = pay is not None
    if pay is None:
        pay = jnp.zeros_like(hi)
    block = min(block, n) if n >= LANES else n
    hi, lo, pay = sort_blocks_pallas(hi, lo, pay, block=block,
                                     interpret=interpret)
    run = block
    while run < n and 2 * run <= max_vmem_run:
        hi, lo, pay = merge_pass_pallas(hi, lo, pay, run=run,
                                        interpret=interpret)
        run *= 2
    if run < n:
        # remaining huge runs: delegate to lax.sort for now (streaming
        # merge-path pass is the planned replacement)
        hi, lo, pay = jax.lax.sort((hi, lo, pay), num_keys=2)
    return (hi, lo, pay) if had_pay else (hi, lo)
