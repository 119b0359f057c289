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
