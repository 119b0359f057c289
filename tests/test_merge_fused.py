"""Fused merge+combine+compact kernel (interpret mode) vs the sort-based
kernel and golden -- byte equality across ops, sizes, and overlap patterns,
plus a brute-force check of the butterfly-packing compaction primitive."""

import numpy as np
import pytest

from zotpu import semantics as S
from zotpu.kernels import setops as K
from zotpu.kernels.merge_fused import _butterfly_pack, set_op_fused
from zotpu.reference_impl import golden as G


def _dense(keys, counts, cap):
    hi = np.full(cap, 0xFFFFFFFF, np.uint32)
    lo = np.full(cap, 0xFFFFFFFF, np.uint32)
    c = np.zeros(cap, np.uint32)
    hi[:len(keys)], lo[:len(keys)] = S.split_hi_lo(np.asarray(keys, np.uint64))
    c[:len(keys)] = counts
    return hi, lo, c


def _rand_set(rng, n, key_space=1 << 50):
    keys = np.unique(rng.integers(0, key_space, n).astype(np.uint64))
    counts = rng.integers(1, 1000, len(keys)).astype(np.uint32)
    return keys, counts


def test_butterfly_pack_brute_force():
    # pltpu.roll only evaluates inside a pallas context: wrap in a tiny
    # interpret-mode kernel.
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    rows = 4                      # 512-element flat tiles

    def kernel(v_ref, k_ref, o_ref):
        (out,) = _butterfly_pack((v_ref[:],), k_ref[:] != 0)
        o_ref[:] = out

    @jax.jit
    def pack(v, k):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.uint32),
            interpret=True)(v, k)

    rng = np.random.default_rng(0)
    for frac in (0.0, 0.1, 0.5, 0.9, 1.0):
        for trial in range(8):
            keep = rng.random(rows * 128) < frac
            v = rng.integers(0, 1 << 32, rows * 128,
                             dtype=np.uint64).astype(np.uint32)
            out = pack(jnp.asarray(v.reshape(rows, 128)),
                       jnp.asarray(keep.reshape(rows, 128).astype(np.uint32)))
            m = int(keep.sum())
            got = np.asarray(out).reshape(-1)[:m]
            assert np.array_equal(got, v[keep]), (frac, trial)


@pytest.mark.parametrize("op", ["merge", "union", "intersect", "diff"])
@pytest.mark.parametrize("na,nb,cap_a,cap_b", [
    (500, 300, 1024, 512),          # sub-tile sizes and capacities
    (0, 700, 8, 1024),              # one side empty
    (1, 1, 8, 8),                   # tiny
    (40000, 50000, 65536, 65536),   # multi-tile with tile-straddling keys
])
def test_fused_matches_sort_based(op, na, nb, cap_a, cap_b):
    rng = np.random.default_rng(na * 7 + nb + len(op))
    ka, ca = _rand_set(rng, na) if na else (np.empty(0, np.uint64),
                                            np.empty(0, np.uint32))
    kb, cb = _rand_set(rng, nb) if nb else (np.empty(0, np.uint64),
                                            np.empty(0, np.uint32))
    # force key overlap so intersect/diff and segment-straddles are exercised
    if na and nb:
        kb = np.unique(np.concatenate([kb[: nb // 2], ka[: na // 3]]))
        cb = rng.integers(1, 1000, len(kb)).astype(np.uint32)
    A = _dense(ka, ca, cap_a)
    B = _dense(kb, cb, cap_b)
    want = K.set_op(*A, *B, op=op)
    got = set_op_fused(*A, *B, op=op, interpret=True)
    n = int(want[3])
    assert int(got[3]) == n
    for w, g in zip(want[:3], got[:3]):
        assert np.array_equal(np.asarray(w)[:n], np.asarray(g)[:n])
    # the sentinel tail must hold through the FULL output capacity (the
    # kernel's garbage-overwrite windows + aliased sentinel prefill)
    assert np.all(np.asarray(got[0])[n:] == 0xFFFFFFFF)
    assert np.all(np.asarray(got[1])[n:] == 0xFFFFFFFF)
    assert np.all(np.asarray(got[2])[n:] == 0)


def test_fused_matches_golden_merge():
    rng = np.random.default_rng(0)
    ka, ca = _rand_set(rng, 3000)
    kb, cb = _rand_set(rng, 1500)
    A = _dense(ka, ca, 4096)
    B = _dense(kb, cb, 2048)
    hi, lo, c, n = set_op_fused(*A, *B, op="merge", interpret=True)
    n = int(n)
    keys = S.join_hi_lo(np.asarray(hi)[:n], np.asarray(lo)[:n])
    want_k, want_c = G.merge([(ka, ca), (kb, cb)])
    assert np.array_equal(keys, want_k)
    assert np.array_equal(np.asarray(c)[:n], want_c)


def test_fused_count_saturation():
    k = np.array([5], np.uint64)
    A = _dense(k, np.array([0xFFFFFFF0], np.uint32), 8)
    B = _dense(k, np.array([0x20], np.uint32), 8)
    _, _, c, n = set_op_fused(*A, *B, op="merge", interpret=True)
    assert int(n) == 1 and int(np.asarray(c)[0]) == 0xFFFFFFFF


def test_fused_dense_identical_sides():
    """A == B: every key is a 2-member segment (maximal combine load)."""
    rng = np.random.default_rng(7)
    ka, ca = _rand_set(rng, 5000)
    A = _dense(ka, ca, 8192)
    B = _dense(ka, ca, 8192)
    for op in ("merge", "intersect", "diff"):
        want = K.set_op(*A, *B, op=op)
        got = set_op_fused(*A, *B, op=op, interpret=True)
        n = int(want[3])
        assert int(got[3]) == n
        for w, g in zip(want[:3], got[:3]):
            assert np.array_equal(np.asarray(w)[:n], np.asarray(g)[:n])


@pytest.mark.parametrize("na,nb,tiles_a,tiles_b", [
    (100, 200, 2, 4),      # both sides mostly padding -> dead upper tiles
    (0, 50, 1, 1),         # one side empty
    (0, 0, 1, 1),          # both empty: every tile dead, n_out == 0
])
def test_fused_live_gate_byte_equal(na, nb, tiles_a, tiles_b):
    """The round-5 live-tile gate (n_a/n_b valid counts let the kernel
    skip pure-sentinel tiles) must be byte-identical to the ungated path
    for every op -- including tails (sentinel/zero beyond n_out)."""
    import jax.numpy as jnp

    from zotpu.kernels.sort_pallas import TILE_E
    rng = np.random.default_rng(11)
    ka, ca = (_rand_set(rng, na) if na else
              (np.empty(0, np.uint64), np.empty(0, np.uint32)))
    kb, cb = (_rand_set(rng, nb) if nb else
              (np.empty(0, np.uint64), np.empty(0, np.uint32)))
    A = _dense(ka, ca, tiles_a * TILE_E)
    B = _dense(kb, cb, tiles_b * TILE_E)
    for op in ("merge", "intersect", "diff"):
        r0 = set_op_fused(*A, *B, op=op, interpret=True)
        r1 = set_op_fused(*A, *B, op=op, interpret=True,
                          n_a=jnp.int32(len(ka)), n_b=jnp.int32(len(kb)))
        assert int(r0[3]) == int(r1[3])
        n = int(r0[3])
        for w, g in zip(r0[:3], r1[:3]):
            assert np.array_equal(np.asarray(w), np.asarray(g))
        assert np.all(np.asarray(r1[0])[n:] == 0xFFFFFFFF)
        assert np.all(np.asarray(r1[2])[n:] == 0)
