"""Pallas bitonic sort engine (interpret mode) vs numpy — exact order."""

import numpy as np
import jax.numpy as jnp
import pytest

from zotpu.kernels import sort_pallas as SP


def _np_sort_pairs(hi, lo, pay=None):
    key = (hi.astype(np.uint64) << np.uint64(32)) | lo.astype(np.uint64)
    order = np.argsort(key, kind="stable")
    out = (hi[order], lo[order])
    return out + ((pay[order],) if pay is not None else ())


def _rand(n, seed, hi_bits=18):
    rng = np.random.default_rng(seed)
    hi = rng.integers(0, 1 << hi_bits, n).astype(np.uint32)
    lo = rng.integers(0, 1 << 32, n, dtype=np.uint64).astype(np.uint32)
    pay = rng.integers(0, 1 << 32, n, dtype=np.uint64).astype(np.uint32)
    return hi, lo, pay


def test_stream_merge_pass_small(monkeypatch):
    """Streaming merge-path pass on shrunken tiles (monkeypatched constants)."""
    monkeypatch.setattr(SP, "TILE_E", 1024)
    monkeypatch.setattr(SP, "TILE_R", 1024 // 128)
    monkeypatch.setattr(SP, "LOAD_R", 1024 // 128 + 8)
    n, run = 8192, 2048
    hi, lo, pay = _rand(n, 17)
    for b in range(n // run):
        sl = slice(b * run, (b + 1) * run)
        hi[sl], lo[sl], pay[sl] = _np_sort_pairs(hi[sl], lo[sl], pay[sl])
    mhi, mlo, mpay = SP.stream_merge_pass_pallas(
        jnp.asarray(hi), jnp.asarray(lo), jnp.asarray(pay),
        jnp.int32(run), interpret=True)
    mhi, mlo = np.asarray(mhi), np.asarray(mlo)
    for b in range(n // (2 * run)):
        sl = slice(b * 2 * run, (b + 1) * 2 * run)
        whi, wlo = _np_sort_pairs(hi[sl], lo[sl])
        assert np.array_equal(mhi[sl], whi)
        assert np.array_equal(mlo[sl], wlo)


def test_stream_merge_with_duplicates_and_payload(monkeypatch):
    """Duplicate keys across the merge boundary: multiset of (key, payload)
    pairs must be exactly preserved (merge-path exactness)."""
    monkeypatch.setattr(SP, "TILE_E", 1024)
    monkeypatch.setattr(SP, "TILE_R", 8)
    monkeypatch.setattr(SP, "LOAD_R", 16)
    rng = np.random.default_rng(23)
    n, run = 4096, 2048
    hi = np.zeros(n, np.uint32)
    lo = rng.integers(0, 50, n).astype(np.uint32)  # heavy duplication
    pay = np.arange(n, dtype=np.uint32)
    for b in range(2):
        sl = slice(b * run, (b + 1) * run)
        hi[sl], lo[sl], pay[sl] = _np_sort_pairs(hi[sl], lo[sl], pay[sl])
    mhi, mlo, mpay = SP.stream_merge_pass_pallas(
        jnp.asarray(hi), jnp.asarray(lo), jnp.asarray(pay),
        jnp.int32(run), interpret=True)
    mlo, mpay = np.asarray(mlo), np.asarray(mpay)
    assert np.array_equal(mlo, np.sort(lo))
    got = sorted(zip(mlo.tolist(), mpay.tolist()))
    want = sorted(zip(lo.tolist(), pay.tolist()))
    assert got == want


def test_stream_merge_pair_unequal(monkeypatch):
    """One pair of unequal sorted runs (the join/set-op shape), incl. a
    sentinel-padded short side."""
    NA, NB = SP.TILE_E, 2 * SP.TILE_E
    rng = np.random.default_rng(11)
    A = np.sort(rng.integers(0, 1 << 40, NA // 4).astype(np.uint64))
    A = np.concatenate([A, np.full(NA - len(A), 0xFFFFFFFFFFFFFFFF,
                                   np.uint64)])
    B = np.sort(rng.integers(0, 1 << 40, NB).astype(np.uint64))
    hi = np.concatenate([(A >> np.uint64(32)).astype(np.uint32),
                         (B >> np.uint64(32)).astype(np.uint32)])
    lo = np.concatenate([(A & np.uint64(0xFFFFFFFF)).astype(np.uint32),
                         (B & np.uint64(0xFFFFFFFF)).astype(np.uint32)])
    pay = np.arange(NA + NB, dtype=np.uint32)
    ohi, olo, opay = SP.stream_merge_pair_pallas(
        jnp.asarray(hi), jnp.asarray(lo), jnp.asarray(pay), nA=NA,
        interpret=True)
    got = (np.asarray(ohi).astype(np.uint64) << np.uint64(32)) | np.asarray(olo)
    want = np.sort(np.concatenate([A, B]))
    assert np.array_equal(got, want)
    # payload permuted consistently with the key order (multiset check)
    key_of_pay = ((hi.astype(np.uint64) << np.uint64(32)) | lo)[np.asarray(opay)]
    assert np.array_equal(key_of_pay, got)
