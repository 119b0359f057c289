"""Pallas TPU kernel: fused tokenize -> pack -> canonicalize.

Same semantics as kernels/pack.py (the XLA reference path), but computed
entirely in VMEM: XLA materializes the ~100 intermediate arrays of the
unrolled shift chain in HBM (measured ~0.66 Gkmer/s, i.e. ~27GB of traffic at
32M kmers), while this kernel reads codes once and writes (hi, lo, w) once
(~0.3GB) with the shift chain living in registers/VMEM.

Layout: grid over row tiles of TR=32 reads (u8 min sublane tile); each program
computes the full read length L in one block. Column windows that would cross
the row end or contain a non-ACGT code are sentinel/weight-0, exactly like the
reference path; output width is padded to L and the wrapper slices [:, :m].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from zotpu import semantics as S

TR = 64  # row tile (multiple of the u8 min sublane 32)


def _roll_left(x, j):
    """x[:, i] <- x[:, i + j] (wrap-around; wrapped cols are masked later).

    pltpu.roll only accepts non-negative shifts, so a left roll by j is a
    right roll by L - j."""
    if j == 0:
        return x
    return pltpu.roll(x, shift=x.shape[1] - j, axis=1)


def _shl64(hi, lo, t: int):
    """(hi, lo) << t for static t in [0, 64)."""
    if t == 0:
        return hi, lo
    if t < 32:
        return (hi << jnp.uint32(t)) | (lo >> jnp.uint32(32 - t)), lo << jnp.uint32(t)
    if t == 32:
        return lo, jnp.zeros_like(lo)
    return lo << jnp.uint32(t - 32), jnp.zeros_like(lo)


def _pack_core(c, lengths, hi_ref, lo_ref, *, k: int):
    """Window build + canonicalize + validity from u32 codes in registers."""
    SENT32 = jnp.uint32(0xFFFFFFFF)
    L = c.shape[1]

    # Log-doubling window build: O(log k) roll+or steps instead of O(k).
    # fw[s][i] = bases [i, i+s) packed big-endian (first base most
    # significant): fw[2s][i] = fw[s][i] << 2s | fw[s][i+s].
    # rw[s][i] = complemented bases [i, i+s) packed little-endian (base i+j
    # has weight 4^j): rw[2s][i] = rw[s][i] | rw[s][i+s] << 2s.
    # Both fit u32 while s <= 16; k's binary decomposition stitches the
    # windows into the (hi, lo) u64 pair.
    s_max = 1
    while s_max * 2 <= min(k, 16):
        s_max *= 2
    fw = {1: c & jnp.uint32(3)}
    rw = {1: (c & jnp.uint32(3)) ^ jnp.uint32(3)}
    s = 1
    while s < s_max:
        nxt = _roll_left(fw[s], s)
        fw[2 * s] = (fw[s] << jnp.uint32(2 * s)) | nxt
        nxtr = _roll_left(rw[s], s)
        rw[2 * s] = rw[s] | (nxtr << jnp.uint32(2 * s))
        s *= 2

    # forward: consume k's binary parts MSB-first, shifting the accumulator
    # left by 2*part before or-ing the next part (which sits at bit 0).
    fhi = jnp.zeros_like(c)
    flo = jnp.zeros_like(c)
    pos = 0
    for b in range(4, -1, -1):
        part = 1 << b
        if k & part:
            fhi, flo = _shl64(fhi, flo, 2 * part)
            flo = flo | _roll_left(fw[part], pos)
            pos += part

    # reverse complement: part covering offsets [pos, pos+part) contributes
    # rw[part][i+pos] << 2*pos (may straddle the 32-bit boundary).
    rhi = jnp.zeros_like(c)
    rlo = jnp.zeros_like(c)
    pos = 0
    for b in range(0, 5):
        part = 1 << b
        if k & part:
            v = _roll_left(rw[part], pos)
            t = 2 * pos
            if t < 32:
                rlo = rlo | (v << jnp.uint32(t))
                if t + 2 * part > 32 and t > 0:
                    rhi = rhi | (v >> jnp.uint32(32 - t))
            else:
                rhi = rhi | (v << jnp.uint32(t - 32)) if t > 32 else rhi | v
            pos += part

    fwd_le = (fhi < rhi) | ((fhi == rhi) & (flo <= rlo))
    chi = jnp.where(fwd_le, fhi, rhi)
    clo = jnp.where(fwd_le, flo, rlo)

    # last_bad[i] = max position j <= i with codes[j] invalid, else -1.
    col = jax.lax.broadcasted_iota(jnp.int32, c.shape, 1)
    lb = jnp.where(c >= jnp.uint32(S.INVALID_CODE), col, -1)
    s = 1
    while s < L:
        prev = pltpu.roll(lb, shift=s, axis=1)
        prev = jnp.where(col >= s, prev, -1)
        lb = jnp.maximum(lb, prev)
        s *= 2
    # window [i, i+k) clean  <=>  last_bad[i + k - 1] < i
    lb_end = _roll_left(lb, k - 1)
    window_clean = lb_end < col
    in_read = col + k <= lengths  # lengths: (TR, 1) int32
    in_tile = col < L - k + 1
    valid = window_clean & in_read & in_tile

    hi_ref[:] = jnp.where(valid, chi, SENT32)
    lo_ref[:] = jnp.where(valid, clo, SENT32)


def _pack_kernel(codes_ref, lengths_ref, hi_ref, lo_ref, *, k: int):
    # u8 codes path (tests / non-wire producers). NOTE the astype is the
    # expensive part on TPU (~28 ms per 30.4M-kmer batch: u8 arrays retile);
    # the production wire path avoids u8 entirely (_pack_wire_kernel).
    _pack_core(codes_ref[:].astype(jnp.uint32), lengths_ref[:],
               hi_ref, lo_ref, k=k)


def _pack_wire_kernel(packed_ref, mask_ref, lengths_ref, hi_ref, lo_ref,
                      *, k: int):
    """Unpack the STRIPED 2-bit wire form (io/wire.py v2) in registers.

    t = tile(packed, 16) puts word (i mod W) at lane i, which holds base i
    in bit field 2*(i // W) -- one pltpu.repeat + a lane-indexed shift, no
    u8 arrays and no cross-lane permutation. Same for the invalid mask at
    32 bits/word."""
    pw = packed_ref[:]                       # (TR, W) u32
    mw = mask_ref[:]                         # (TR, M) u32
    W = pw.shape[1]
    M = mw.shape[1]
    L = W * 16
    lane = jax.lax.broadcasted_iota(jnp.int32, (pw.shape[0], L), 1)
    t = pltpu.repeat(pw, 16, axis=1)
    c = (t >> ((lane // W) * 2).astype(jnp.uint32)) & jnp.uint32(3)
    tm = pltpu.repeat(mw, 32, axis=1)
    inv = (tm >> (lane // M).astype(jnp.uint32)) & jnp.uint32(1)
    c = jnp.where(inv != 0, jnp.uint32(S.INVALID_CODE), c)
    _pack_core(c, lengths_ref[:], hi_ref, lo_ref, k=k)


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def pack_canonical_pallas(codes: jax.Array, lengths: jax.Array, k: int,
                          interpret: bool = False):
    """Drop-in replacement for kernels.pack.pack_canonical (same outputs)."""
    R, L = codes.shape
    m = L - k + 1
    pad = (-R) % TR
    if pad:
        codes = jnp.pad(codes, ((0, pad), (0, 0)),
                        constant_values=S.INVALID_CODE)
        lengths = jnp.pad(lengths, (0, pad))
    Rp = R + pad
    lengths2d = lengths.astype(jnp.int32).reshape(Rp, 1)
    grid = (Rp // TR,)
    out = pl.pallas_call(
        functools.partial(_pack_kernel, k=k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TR, L), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TR, L), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, L), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Rp, L), jnp.uint32),
            jax.ShapeDtypeStruct((Rp, L), jnp.uint32),
        ],
        interpret=interpret,
    )(codes, lengths2d)
    hi, lo = out
    hi = hi[:R, :m].reshape(-1)
    lo = lo[:R, :m].reshape(-1)
    # validity is fully encoded in the sentinel key (valid canonical keys
    # have hi < 2^31), so the weight channel is DERIVED, not a third kernel
    # output -- every consumer either ignores w or re-derives validity, and
    # XLA dead-code-eliminates this when unused (the kernel itself saved a
    # third HBM write channel).
    w = (hi != jnp.uint32(0xFFFFFFFF)).astype(jnp.uint32)
    return hi, lo, w


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def pack_canonical_wire_pallas(packed: jax.Array, mask: jax.Array,
                               lengths: jax.Array, k: int,
                               interpret: bool = False):
    """pack_canonical over the striped 2-bit wire form (io/wire.py):
    (R, L/16) u32 packed + (R, L/32) u32 mask -> same (hi, lo, w) contract
    as pack_canonical_pallas. The wire words stay u32 end to end -- no u8
    code array is ever materialized (that conversion alone costs as much as
    the rest of the kernel)."""
    R, W = packed.shape
    L = W * 16
    m = L - k + 1
    pad = (-R) % TR
    if pad:
        packed = jnp.pad(packed, ((0, pad), (0, 0)))
        mask = jnp.pad(mask, ((0, pad), (0, 0)),
                       constant_values=jnp.uint32(0xFFFFFFFF))  # all-invalid
        lengths = jnp.pad(lengths, (0, pad))
    Rp = R + pad
    lengths2d = lengths.astype(jnp.int32).reshape(Rp, 1)
    out = pl.pallas_call(
        functools.partial(_pack_wire_kernel, k=k),
        grid=(Rp // TR,),
        in_specs=[
            pl.BlockSpec((TR, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, W // 2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TR, L), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, L), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Rp, L), jnp.uint32),
            jax.ShapeDtypeStruct((Rp, L), jnp.uint32),
        ],
        interpret=interpret,
    )(packed, mask, lengths2d)
    hi, lo = out
    hi = hi[:R, :m].reshape(-1)
    lo = lo[:R, :m].reshape(-1)
    w = (hi != jnp.uint32(0xFFFFFFFF)).astype(jnp.uint32)
    return hi, lo, w
