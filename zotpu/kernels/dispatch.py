"""Backend dispatch: Pallas kernels on TPU, XLA reference path elsewhere.

ZOTPU_PALLAS=1 forces Pallas, =0 forces the XLA path, unset/auto uses Pallas
only on TPU-class backends (CPU always takes the XLA path -- compiled Pallas
TPU kernels don't run there; tests exercise Pallas via interpret=True).
"""

from __future__ import annotations

import os

import jax

from zotpu.kernels import pack as _pack_xla
from zotpu.kernels import pack_pallas as _pack_pl


def use_pallas() -> bool:
    env = os.environ.get("ZOTPU_PALLAS", "auto")
    if env == "0":
        return False
    if env == "1":
        return True
    return jax.default_backend() not in ("cpu",)


def pack_canonical(codes, lengths, k: int):
    if use_pallas():
        return _pack_pl.pack_canonical_pallas(codes, lengths, k)
    return _pack_xla.pack_canonical(codes, lengths, k)


def pack_canonical_wire(packed, mask, lengths, k: int):
    """pack_canonical over the striped 2-bit wire form (io/wire.py).

    On TPU the Pallas kernel consumes the u32 wire words directly (no u8
    code array is ever materialized -- that conversion alone costs as much
    as the window build); elsewhere unpack + the XLA reference path."""
    if use_pallas():
        return _pack_pl.pack_canonical_wire_pallas(packed, mask, lengths, k)
    from zotpu.io import wire as _wire
    return _pack_xla.pack_canonical(_wire.unpack_codes(packed, mask),
                                    lengths, k)
