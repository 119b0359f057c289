"""Host<->device wire format: 2-bit packed base codes + validity bitmask.

The kmerize/scan pipelines ship read batches to the device as u8 code arrays
(1 byte/base).  On hosts where the H2D link is the end-to-end bottleneck
(remote-tunneled TPUs at ~40-60 MB/s; PCIe hosts at high aggregate rates)
that byte is 8x wider than the information it carries.  This module packs a
code batch into 0.375 B/base on the host -- 4 codes/byte plus a 1-bit/base
invalid mask -- and unpacks it on-device with elementwise shifts that XLA
fuses into the consuming program.  Reference analog: none (zotmer is
single-process; SURVEY.md section 2b "Pipeline (PP analog)" row covers the
host->device input pipeline this belongs to).

Wire layout (transport only -- no output byte depends on it, so it lives
outside semantics.py):
- packed[r, j] byte holds codes for bases 4j..4j+3, base (4j+i) at bit 2i
  (little-endian nibble order).
- mask[r, j] byte holds invalid flags for bases 8j..8j+7, base (8j+i) at
  bit i (numpy ``packbits(..., bitorder="little")``); 1 = invalid.
- Invalid bases are packed as code 0; the mask restores INVALID_CODE on
  device, so sentinel-reset semantics are preserved exactly.
- Row length must be a multiple of 8 (batch buffers are padded anyway).
"""

from __future__ import annotations

import numpy as np

from zotpu import semantics as S


def pack_codes(codes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Pack a (rows, L) u8 code batch -> ((rows, L/4) u8, (rows, L/8) u8).

    Single-pass C++ when the native library is available (the numpy version
    below is ~190 Mbase/s -- slower than the device step it feeds); numpy
    otherwise. Runs in the prefetch thread so it overlaps device compute.
    L must be a multiple of 8.
    """
    rows, L = codes.shape
    if L % 8:
        raise ValueError(f"row length {L} not a multiple of 8")
    from zotpu.io import native
    out = native.pack_wire(codes)
    if out is not None:
        return out
    invalid = codes >= 4
    c = np.where(invalid, 0, codes).astype(np.uint8)
    q = c.reshape(rows, L // 4, 4)
    packed = (q[:, :, 0] | (q[:, :, 1] << 2) | (q[:, :, 2] << 4)
              | (q[:, :, 3] << 6))
    mask = np.packbits(invalid, axis=1, bitorder="little")
    return np.ascontiguousarray(packed), np.ascontiguousarray(mask)


def unpack_codes(packed, mask):
    """Device-side inverse of pack_codes: -> (rows, L) u8 codes.

    Pure elementwise jnp (broadcast shifts + where); call it inside the same
    jit as the consumer so XLA fuses the unpack into the batch step.
    """
    import jax.numpy as jnp

    rows, p4 = packed.shape
    shifts = jnp.arange(4, dtype=jnp.uint8) * jnp.uint8(2)
    c = (packed[:, :, None] >> shifts[None, None, :]) & jnp.uint8(3)
    c = c.reshape(rows, p4 * 4)
    bshifts = jnp.arange(8, dtype=jnp.uint8)
    m = (mask[:, :, None] >> bshifts[None, None, :]) & jnp.uint8(1)
    m = m.reshape(rows, p4 * 4)
    return jnp.where(m != 0, jnp.uint8(S.INVALID_CODE), c)
