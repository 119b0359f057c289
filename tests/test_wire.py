"""io/wire.py: the 2-bit H2D wire format round-trips exactly."""

import numpy as np
import pytest

from zotpu import semantics as S
from zotpu.io import wire


def _norm(codes):
    # parse emits codes in {0..3, INVALID_CODE}; the wire form canonicalizes
    # every invalid value to INVALID_CODE
    return np.where(codes >= 4, S.INVALID_CODE, codes).astype(np.uint8)


@pytest.mark.parametrize("rows,L", [(1, 32), (7, 64), (33, 256), (5, 96)])
def test_roundtrip(rows, L):
    rng = np.random.default_rng(rows * 1000 + L)
    codes = rng.integers(0, 6, size=(rows, L)).astype(np.uint8)  # some >=4
    packed, mask = wire.pack_codes(codes)
    assert packed.shape == (rows, L // 16) and packed.dtype == np.uint32
    assert mask.shape == (rows, L // 32) and mask.dtype == np.uint32
    out = np.asarray(wire.unpack_codes(packed, mask))
    np.testing.assert_array_equal(out, _norm(codes))


@pytest.mark.parametrize("rows,L", [(1, 32), (7, 64), (33, 256)])
def test_numpy_matches_native(rows, L):
    """The numpy fallback and the C++ single-pass pack agree bit for bit."""
    from zotpu.io import native
    rng = np.random.default_rng(rows + L)
    codes = rng.integers(0, 6, size=(rows, L)).astype(np.uint8)
    got = native.pack_wire(np.ascontiguousarray(codes))
    if got is None:
        pytest.skip("native library unavailable")
    import unittest.mock as mock
    with mock.patch.object(native, "pack_wire", lambda c: None):
        want = wire.pack_codes(codes)
    np.testing.assert_array_equal(got[0], want[0])
    np.testing.assert_array_equal(got[1], want[1])


def test_all_valid_and_all_invalid():
    codes = np.zeros((2, 32), np.uint8)
    codes[1, :] = S.INVALID_CODE
    packed, mask = wire.pack_codes(codes)
    assert mask[0, 0] == 0 and mask[1, 0] == 0xFFFFFFFF
    out = np.asarray(wire.unpack_codes(packed, mask))
    np.testing.assert_array_equal(out, codes)


def test_rejects_unaligned_rows():
    with pytest.raises(ValueError):
        wire.pack_codes(np.zeros((2, 40), np.uint8))


def test_kmerize_wire_path_matches_golden(tmp_path):
    # end-to-end through kmerize_paths (wire form is the default for 8|L)
    from zotpu.reference_impl import golden as G
    from zotpu.workloads import kmerize as W

    rng = np.random.default_rng(7)
    lut = np.frombuffer(b"ACGTN", np.uint8)
    seqs = ["".join(chr(c) for c in lut[rng.integers(0, 5, size=n)])
            for n in rng.integers(30, 90, size=50)]
    p = tmp_path / "r.fasta"
    p.write_text("".join(f">s{i}\n{s}\n" for i, s in enumerate(seqs)))
    k = 13
    keys, counts = W.kmerize_paths([str(p)], k, batch_reads=16, max_len=96)
    gk, gc = G.kmerize(k, seqs)
    np.testing.assert_array_equal(keys, gk)
    np.testing.assert_array_equal(counts, gc)
