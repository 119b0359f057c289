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


@pytest.mark.parametrize("n,block", [(256, 256), (1024, 1024), (4096, 4096)])
def test_block_sort_single_block(n, block):
    hi, lo, pay = _rand(n, n)
    shi, slo, spay = SP.sort_blocks_pallas(hi, lo, pay, block=block,
                                           interpret=True)
    whi, wlo, _ = _np_sort_pairs(hi, lo, pay)
    assert np.array_equal(np.asarray(shi), whi)
    assert np.array_equal(np.asarray(slo), wlo)


def test_block_sort_payload_follows_keys():
    n = 1024
    hi = np.zeros(n, np.uint32)
    lo = np.arange(n, dtype=np.uint32)[::-1].copy()
    pay = np.arange(n, dtype=np.uint32)[::-1].copy()
    _, slo, spay = SP.sort_blocks_pallas(hi, lo, pay, block=n, interpret=True)
    assert np.array_equal(np.asarray(slo), np.arange(n, dtype=np.uint32))
    assert np.array_equal(np.asarray(spay), np.arange(n, dtype=np.uint32))


def test_block_sort_multiple_blocks():
    n, block = 2048, 512
    hi, lo, pay = _rand(n, 3)
    shi, slo, _ = SP.sort_blocks_pallas(hi, lo, pay, block=block,
                                        interpret=True)
    shi, slo = np.asarray(shi), np.asarray(slo)
    for b in range(n // block):
        whi, wlo = _np_sort_pairs(hi[b * block:(b + 1) * block],
                                  lo[b * block:(b + 1) * block])
        assert np.array_equal(shi[b * block:(b + 1) * block], whi)
        assert np.array_equal(slo[b * block:(b + 1) * block], wlo)


def test_merge_pass():
    n, run = 2048, 512
    hi, lo, pay = _rand(n, 7)
    # pre-sort runs
    for b in range(n // run):
        sl = slice(b * run, (b + 1) * run)
        hi[sl], lo[sl], pay[sl] = _np_sort_pairs(hi[sl], lo[sl], pay[sl])
    mhi, mlo, _ = SP.merge_pass_pallas(hi, lo, pay, run=run, interpret=True)
    mhi, mlo = np.asarray(mhi), np.asarray(mlo)
    for b in range(n // (2 * run)):
        sl = slice(b * 2 * run, (b + 1) * 2 * run)
        whi, wlo = _np_sort_pairs(hi[sl], lo[sl])
        assert np.array_equal(mhi[sl], whi)
        assert np.array_equal(mlo[sl], wlo)


@pytest.mark.parametrize("n,block", [(4096, 512), (8192, 1024)])
def test_full_sort_pallas(n, block):
    hi, lo, pay = _rand(n, n + 1)
    shi, slo, spay = SP.sort_pallas(hi, lo, pay, block=block,
                                    max_vmem_run=n, interpret=True)
    whi, wlo, _ = _np_sort_pairs(hi, lo, pay)
    assert np.array_equal(np.asarray(shi), whi)
    assert np.array_equal(np.asarray(slo), wlo)


def test_full_sort_with_sentinels():
    n, block = 2048, 512
    hi, lo, pay = _rand(n, 9)
    hi[100:300] = 0xFFFFFFFF
    lo[100:300] = 0xFFFFFFFF
    shi, slo = SP.sort_pallas(hi, lo, block=block, max_vmem_run=n,
                              interpret=True)
    whi, wlo = _np_sort_pairs(hi, lo)
    assert np.array_equal(np.asarray(shi), whi)
    assert np.array_equal(np.asarray(slo), wlo)


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


def test_full_sort_pallas_streaming(monkeypatch):
    """End-to-end sort_pallas exercising all three phases + pow2 padding."""
    monkeypatch.setattr(SP, "TILE_E", 1024)
    monkeypatch.setattr(SP, "TILE_R", 8)
    monkeypatch.setattr(SP, "LOAD_R", 16)
    n = 7000  # not a power of two
    hi, lo, pay = _rand(n, 31)
    shi, slo, spay = SP.sort_pallas(
        jnp.asarray(hi), jnp.asarray(lo), jnp.asarray(pay),
        block=512, max_vmem_run=1024, interpret=True)
    whi, wlo, _ = _np_sort_pairs(hi, lo, pay)
    assert np.array_equal(np.asarray(shi), whi)
    assert np.array_equal(np.asarray(slo), wlo)
    assert shi.shape[0] == n


def test_full_sort_no_payload_streaming(monkeypatch):
    """2-channel (no payload) path through all three phases."""
    monkeypatch.setattr(SP, "TILE_E", 1024)
    monkeypatch.setattr(SP, "TILE_R", 8)
    monkeypatch.setattr(SP, "LOAD_R", 16)
    n = 9000
    hi, lo, _ = _rand(n, 55)
    shi, slo = SP.sort_pallas(jnp.asarray(hi), jnp.asarray(lo),
                              block=512, max_vmem_run=1024, interpret=True)
    whi, wlo = _np_sort_pairs(hi, lo)
    assert np.array_equal(np.asarray(shi), whi)
    assert np.array_equal(np.asarray(slo), wlo)
