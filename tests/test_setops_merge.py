"""Merge-path set algebra (interpret mode) vs the sort-based kernel and
golden — byte equality across ops, sizes, and duplicate patterns."""

import numpy as np
import pytest

from zotpu import semantics as S
from zotpu.kernels import setops as K
from zotpu.kernels.setops_merge import set_op_merge_path
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


@pytest.mark.parametrize("op", ["merge", "intersect", "diff"])
@pytest.mark.parametrize("na,nb,cap_a,cap_b", [
    (500, 300, 1024, 512),          # uneven sizes and capacities
    (2000, 2000, 2048, 2048),
    (0, 700, 8, 1024),              # one side empty
    (1, 1, 8, 8),                   # tiny
])
def test_merge_path_matches_sort_based(op, na, nb, cap_a, cap_b):
    rng = np.random.default_rng(na * 7 + nb + len(op))
    ka, ca = _rand_set(rng, na) if na else (np.empty(0, np.uint64),
                                            np.empty(0, np.uint32))
    kb, cb = _rand_set(rng, nb) if nb else (np.empty(0, np.uint64),
                                            np.empty(0, np.uint32))
    # force key overlap so intersect/diff are non-trivial
    if na and nb:
        kb = np.unique(np.concatenate([kb[: nb // 2], ka[: na // 3]]))
        cb = rng.integers(1, 1000, len(kb)).astype(np.uint32)
    A = _dense(ka, ca, cap_a)
    B = _dense(kb, cb, cap_b)
    want = K.set_op(*A, *B, op=op)
    got = set_op_merge_path(*A, *B, op=op, interpret=True)
    n = int(want[3])
    assert int(got[3]) == n
    for w, g in zip(want[:3], got[:3]):
        assert np.array_equal(np.asarray(w)[:n], np.asarray(g)[:n])
    # padding beyond n_out is sentinel/0 in both
    assert np.all(np.asarray(got[0])[n:] == 0xFFFFFFFF)
    assert np.all(np.asarray(got[2])[n:] == 0)


def test_merge_path_matches_golden_merge():
    rng = np.random.default_rng(0)
    ka, ca = _rand_set(rng, 3000)
    kb, cb = _rand_set(rng, 1500)
    A = _dense(ka, ca, 4096)
    B = _dense(kb, cb, 2048)
    hi, lo, c, n = set_op_merge_path(*A, *B, op="merge", interpret=True)
    n = int(n)
    keys = S.join_hi_lo(np.asarray(hi)[:n], np.asarray(lo)[:n])
    want_k, want_c = G.merge([(ka, ca), (kb, cb)])
    assert np.array_equal(keys, want_k)
    assert np.array_equal(np.asarray(c)[:n], want_c)


def test_merge_path_count_saturation():
    k = np.array([5], np.uint64)
    A = _dense(k, np.array([0xFFFFFFF0], np.uint32), 8)
    B = _dense(k, np.array([0x20], np.uint32), 8)
    _, _, c, n = set_op_merge_path(*A, *B, op="merge", interpret=True)
    assert int(n) == 1 and int(np.asarray(c)[0]) == 0xFFFFFFFF
