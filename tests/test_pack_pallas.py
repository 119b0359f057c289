"""Pallas pack kernel (interpret mode) vs the XLA reference path — byte equal."""

import numpy as np
import pytest

from zotpu.kernels import pack
from zotpu.kernels.pack_pallas import pack_canonical_pallas
from tests.test_kernels import make_batch


@pytest.mark.parametrize("k", [1, 15, 16, 25, 31])
def test_pallas_pack_matches_reference(k):
    rng = np.random.default_rng(k * 7 + 1)
    seqs, codes, lengths = make_batch(rng, 37, 128, alphabet="ACGTN")
    want = pack.pack_canonical(codes, lengths, k)
    got = pack_canonical_pallas(codes, lengths, k, interpret=True)
    for g, w in zip(got, want):
        assert np.array_equal(np.asarray(g), np.asarray(w)), k


def test_pallas_pack_row_padding():
    """R not a multiple of the 32-row tile."""
    rng = np.random.default_rng(5)
    seqs, codes, lengths = make_batch(rng, 7, 64, alphabet="ACGT")
    want = pack.pack_canonical(codes, lengths, 21)
    got = pack_canonical_pallas(codes, lengths, 21, interpret=True)
    for g, w in zip(got, want):
        assert np.array_equal(np.asarray(g), np.asarray(w))


def test_pack_wire_interpret_matches_xla():
    """The wire-input kernel (striped u32 in-register unpack) is byte-equal
    to unpack + the XLA pack path."""
    import jax.numpy as jnp

    from zotpu.io import wire
    from zotpu.kernels import pack as PX
    from zotpu.kernels import pack_pallas as PP

    rng = np.random.default_rng(21)
    R, L, k = 37, 96, 25
    codes = rng.integers(0, 6, size=(R, L)).astype(np.uint8)
    lengths = rng.integers(k, L + 1, size=R).astype(np.int32)
    packed, mask = wire.pack_codes(codes)
    ghi, glo, gw = PX.pack_canonical(
        np.asarray(wire.unpack_codes(jnp.asarray(packed),
                                     jnp.asarray(mask))), lengths, k)
    hi, lo, w = PP.pack_canonical_wire_pallas(jnp.asarray(packed),
                                              jnp.asarray(mask),
                                              jnp.asarray(lengths), k,
                                              interpret=True)
    np.testing.assert_array_equal(np.asarray(hi), np.asarray(ghi))
    np.testing.assert_array_equal(np.asarray(lo), np.asarray(glo))
    np.testing.assert_array_equal(np.asarray(w), np.asarray(gw))
