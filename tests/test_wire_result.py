"""io/wire_result.py: the D2H delta+u8 result codec round-trips exactly."""

import numpy as np
import pytest

from zotpu import semantics as S
from zotpu.io import wire_result as WR


def _encode_decode(keys: np.ndarray, counts: np.ndarray, exc_cap=WR.EXC_CAP):
    hi = (keys >> np.uint64(32)).astype(np.uint32)
    lo = (keys & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    d32, c8, ep, ehi, elo, ecnt, n_exc = WR.encode_device(
        hi, lo, counts.astype(np.uint32), exc_cap=exc_cap)
    n_exc = int(n_exc)
    assert n_exc <= exc_cap, "test input overflowed the exception table"
    return WR.decode_host(np.asarray(d32), np.asarray(c8), np.asarray(ep),
                          np.asarray(ehi), np.asarray(elo), np.asarray(ecnt),
                          n_exc, len(keys)), n_exc


@pytest.mark.parametrize("n,hi_bits", [(1000, 50), (5000, 62), (1, 40)])
def test_roundtrip_random(n, hi_bits):
    rng = np.random.default_rng(n)
    keys = np.unique(rng.integers(0, 1 << hi_bits, size=n, dtype=np.uint64)
                     .astype(np.uint64))
    counts = rng.integers(1, 1000, size=len(keys)).astype(np.uint32)
    (k2, c2), n_exc = _encode_decode(keys, counts)
    np.testing.assert_array_equal(k2, keys)
    np.testing.assert_array_equal(c2, counts)
    assert n_exc >= 1  # first row is always a big-delta exception


def test_dense_small_gaps_few_exceptions():
    # consecutive keys + small counts: only the first row is an exception
    keys = (np.arange(10_000, dtype=np.uint64) * 7) + np.uint64(1 << 40)
    counts = np.full(len(keys), 3, np.uint32)
    (k2, c2), n_exc = _encode_decode(keys, counts)
    np.testing.assert_array_equal(k2, keys)
    np.testing.assert_array_equal(c2, counts)
    assert n_exc == 1


def test_big_gaps_and_big_counts():
    # every row a key exception; interleave count exceptions
    rng = np.random.default_rng(0)
    keys = np.cumsum(rng.integers(1 << 33, 1 << 35, size=200)
                     .astype(np.uint64)).astype(np.uint64)
    counts = rng.integers(1, 5, size=200).astype(np.uint32)
    counts[::7] = 1_000_000  # > u8
    (k2, c2), n_exc = _encode_decode(keys, counts)
    np.testing.assert_array_equal(k2, keys)
    np.testing.assert_array_equal(c2, counts)
    assert n_exc >= 200


def test_count_only_exception_mid_stream():
    keys = np.arange(1, 101, dtype=np.uint64)
    counts = np.full(100, 2, np.uint32)
    counts[50] = 70_000  # count exception (> u16) where the key delta is fine
    (k2, c2), _ = _encode_decode(keys, counts)
    np.testing.assert_array_equal(k2, keys)
    np.testing.assert_array_equal(c2, counts)


def test_accumulator_uses_wire_result(monkeypatch):
    """The device accumulator path must produce byte-identical results with
    the wire transfer engaged (threshold forced to 0)."""
    import jax.numpy as jnp

    from zotpu.workloads.accumulator import DeviceAccumulator

    monkeypatch.setattr(WR, "MIN_KEYS", 0)
    rng = np.random.default_rng(3)
    runs = []
    for _ in range(3):
        keys = np.unique(rng.integers(0, 1 << 50, size=500, dtype=np.uint64)
                         .astype(np.uint64))
        cnts = rng.integers(1, 300, size=len(keys)).astype(np.uint32)
        runs.append((keys, cnts))
    cap = 1024
    acc = DeviceAccumulator(cap)
    from zotpu.reference_impl import golden as G
    for keys, cnts in runs:
        hi = np.full(cap, 0xFFFFFFFF, np.uint32)
        lo = np.full(cap, 0xFFFFFFFF, np.uint32)
        cc = np.zeros(cap, np.uint32)
        hi[:len(keys)] = (keys >> np.uint64(32)).astype(np.uint32)
        lo[:len(keys)] = (keys & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        cc[:len(keys)] = cnts
        acc.add(jnp.asarray(hi), jnp.asarray(lo), jnp.asarray(cc),
                jnp.asarray(len(keys), jnp.int32))
    keys, counts = acc.result()
    gk, gc = G.merge(runs)
    np.testing.assert_array_equal(keys, gk)
    np.testing.assert_array_equal(counts, gc)


# ---- shared host delta codec core (io/delta.py) ----

from hypothesis import given, settings, strategies as st


@settings(max_examples=60, deadline=None)
@given(st.data())
def test_delta_core_roundtrip_property(data):
    """encode/decode (io/delta.py) is exact for ANY sorted unique u64 set +
    u32 counts -- dense, sparse (all-exception), and mixed densities."""
    from zotpu.io import delta as D

    n = data.draw(st.integers(0, 300))
    bits = data.draw(st.integers(1, 62))
    rng = np.random.default_rng(data.draw(st.integers(0, 2**31)))
    keys = np.unique(rng.integers(0, 1 << bits, size=n, dtype=np.uint64))
    counts = rng.integers(1, 1 << 31, size=len(keys), dtype=np.uint32)
    has_counts = data.draw(st.booleans())
    d32, c16, ep, ek, ec = D.encode(keys, counts if has_counts else None)
    back_k, back_c = D.decode(d32, c16, ep, ek, ec, len(keys))
    assert np.array_equal(back_k, keys)
    if has_counts:
        assert np.array_equal(back_c, counts)
    else:
        assert back_c is None
