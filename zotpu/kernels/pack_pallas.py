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

TR = 32  # row tile (u8 min sublane)


def _roll_left(x, j):
    """x[:, i] <- x[:, i + j] (wrap-around; wrapped cols are masked later).

    pltpu.roll only accepts non-negative shifts, so a left roll by j is a
    right roll by L - j."""
    if j == 0:
        return x
    return pltpu.roll(x, shift=x.shape[1] - j, axis=1)


def _pack_kernel(codes_ref, lengths_ref, hi_ref, lo_ref, w_ref, *, k: int):
    SENT32 = jnp.uint32(0xFFFFFFFF)
    c = codes_ref[:].astype(jnp.uint32)
    L = c.shape[1]
    two = jnp.uint32(2)
    thirty = jnp.uint32(30)

    fhi = jnp.zeros_like(c)
    flo = jnp.zeros_like(c)
    for j in range(k):
        cj = _roll_left(c, j) & jnp.uint32(3)
        fhi = (fhi << two) | (flo >> thirty)
        flo = (flo << two) | cj

    rhi = jnp.zeros_like(c)
    rlo = jnp.zeros_like(c)
    for j in range(k - 1, -1, -1):
        cj = (_roll_left(c, j) & jnp.uint32(3)) ^ jnp.uint32(3)
        rhi = (rhi << two) | (rlo >> thirty)
        rlo = (rlo << two) | cj

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
    lengths = lengths_ref[:]  # (TR, 1) int32
    in_read = col + k <= lengths
    in_tile = col < L - k + 1
    valid = window_clean & in_read & in_tile

    hi_ref[:] = jnp.where(valid, chi, SENT32)
    lo_ref[:] = jnp.where(valid, clo, SENT32)
    w_ref[:] = valid.astype(jnp.uint32)


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
            pl.BlockSpec((TR, L), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Rp, L), jnp.uint32),
            jax.ShapeDtypeStruct((Rp, L), jnp.uint32),
            jax.ShapeDtypeStruct((Rp, L), jnp.uint32),
        ],
        interpret=interpret,
    )(codes, lengths2d)
    hi, lo, w = out
    hi = hi[:R, :m].reshape(-1)
    lo = lo[:R, :m].reshape(-1)
    w = w[:R, :m].reshape(-1)
    return hi, lo, w
