"""Dense dedup-compact kernels vs the XLA dedup (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zotpu.kernels import dedup_pallas as DP
from zotpu.kernels.sort_pallas import TILE_E
from zotpu.kernels.sortdedup import dedup_count_sorted


def _sorted_with_dups(rng, n, n_valid, key_space):
    key = rng.integers(0, key_space, size=n).astype(np.uint64)
    key.sort()
    key[n_valid:] = np.uint64(0xFFFFFFFFFFFFFFFF)
    return ((key >> np.uint64(32)).astype(np.uint32),
            key.astype(np.uint32))


def _dense(hi, lo, cnt, n):
    hi, lo, cnt, n = (np.asarray(x) for x in (hi, lo, cnt, n))
    keys = (hi.astype(np.uint64) << np.uint64(32)) | lo
    return keys[:int(n)], cnt[:int(n)]


@pytest.mark.parametrize("ntiles,valid_frac,key_space", [
    (1, 1.0, 300),         # heavy duplication, full tile
    (2, 0.6, 1 << 20),     # sparse dup, sentinel tail inside tile 2
    (3, 0.0, 300),         # all-sentinel input -> n == 0
    (4, 1.0, 1 << 45),     # mostly unique, segments crossing tiles rarely
])
def test_dedup_compact_matches_xla(rng, ntiles, valid_frac, key_space):
    n = ntiles * TILE_E
    hi, lo = _sorted_with_dups(rng, n, int(n * valid_frac), key_space)
    got = DP.dedup_compact_pallas(jnp.asarray(hi), jnp.asarray(lo),
                                  interpret=True)
    want = dedup_count_sorted(jnp.asarray(hi), jnp.asarray(lo))
    gk, gc = _dense(*got)
    wk, wc = _dense(*want)
    assert np.array_equal(gk, wk)
    assert np.array_equal(gc, wc)
    # sentinel/0 beyond n
    n_out = int(np.asarray(got[3]))
    tail_k = np.asarray(got[0])[n_out:]
    assert np.all(tail_k == np.uint32(0xFFFFFFFF))
    assert np.all(np.asarray(got[2])[n_out:] == 0)


def test_dedup_compact_single_segment_spanning_tiles(rng):
    # one giant segment across 2 tiles: count = 2*TILE_E - pad
    n = 2 * TILE_E
    n_valid = n - 100
    hi = np.zeros(n, np.uint32)
    lo = np.full(n, 7, np.uint32)
    hi[n_valid:] = 0xFFFFFFFF
    lo[n_valid:] = 0xFFFFFFFF
    got = DP.dedup_compact_pallas(jnp.asarray(hi), jnp.asarray(lo),
                                  interpret=True)
    gk, gc = _dense(*got)
    assert len(gk) == 1 and gk[0] == np.uint64(7) and gc[0] == n_valid


@pytest.mark.parametrize("nA_tiles,nB_tiles", [(1, 1), (2, 2), (3, 1),
                                               (2, 0)])
def test_merged_dedup_pair_matches_xla(rng, nA_tiles, nB_tiles):
    # round 4: the B side arrives stored DESCENDING (the tree convention)
    nA, nB = nA_tiles * TILE_E, nB_tiles * TILE_E
    ahi, alo = _sorted_with_dups(rng, nA, int(nA * 0.9), 500)
    parts = [np.stack([ahi, alo])]
    if nB:
        bhi, blo = _sorted_with_dups(rng, nB, int(nB * 0.7), 500)
        parts.append(np.stack([bhi[::-1], blo[::-1]]))
    hi = np.concatenate([p[0] for p in parts])
    lo = np.concatenate([p[1] for p in parts])
    got = DP.merged_dedup_compact_pair(jnp.asarray(hi), jnp.asarray(lo),
                                       nA=nA, interpret=True)
    shi, slo = jax.lax.sort((jnp.asarray(hi), jnp.asarray(lo)), num_keys=2)
    want = dedup_count_sorted(shi, slo)
    gk, gc = _dense(*got)
    wk, wc = _dense(*want)
    assert np.array_equal(gk, wk), (nA_tiles, nB_tiles)
    assert np.array_equal(gc, wc)


def test_merged_dedup_pass_matches_xla(rng):
    # one pair of equal runs: even run ascending, odd run DESCENDING
    D, cap = 2, TILE_E
    runs = [_sorted_with_dups(rng, cap, int(rng.integers(cap // 2, cap + 1)),
                              400) for _ in range(D)]
    hi = jnp.asarray(np.concatenate([runs[0][0], runs[1][0][::-1]]))
    lo = jnp.asarray(np.concatenate([runs[0][1], runs[1][1][::-1]]))
    got = DP.merged_dedup_compact_pass(hi, lo, jnp.int32(cap),
                                       interpret=True)
    shi, slo = jax.lax.sort(
        (jnp.asarray(np.concatenate([r[0] for r in runs])),
         jnp.asarray(np.concatenate([r[1] for r in runs]))), num_keys=2)
    want = dedup_count_sorted(shi, slo)
    gk, gc = _dense(*got)
    wk, wc = _dense(*want)
    assert np.array_equal(gk, wk)
    assert np.array_equal(gc, wc)


def test_tree_merge_pass_alt_alternating(rng):
    """The compact alternating pass: 4 runs (even asc, odd desc) -> 2
    output runs with the odd one DESCENDING; chaining a second pass plus
    the fused dedup yields the global sorted unique set."""
    from zotpu.kernels.sort_pallas import tree_merge_pass_alt

    cap = TILE_E
    runs = [_sorted_with_dups(rng, cap, int(rng.integers(cap // 2, cap + 1)),
                              1 << 30) for _ in range(4)]
    hi = np.concatenate([r[0] if i % 2 == 0 else r[0][::-1]
                         for i, r in enumerate(runs)])
    lo = np.concatenate([r[1] if i % 2 == 0 else r[1][::-1]
                         for i, r in enumerate(runs)])
    h1, l1 = tree_merge_pass_alt(jnp.asarray(hi), jnp.asarray(lo),
                                 jnp.int32(cap), interpret=True)
    h1, l1 = np.asarray(h1), np.asarray(l1)
    k_all = ((np.concatenate([r[0] for r in runs]).astype(np.uint64) << 32)
             | np.concatenate([r[1] for r in runs]))
    want01 = np.sort(k_all[:2 * cap])
    want23 = np.sort(k_all[2 * cap:])
    got01 = (h1[:2 * cap].astype(np.uint64) << 32) | l1[:2 * cap]
    got23 = (h1[2 * cap:].astype(np.uint64) << 32) | l1[2 * cap:]
    assert np.array_equal(got01, want01)            # even run ascending
    assert np.array_equal(got23, want23[::-1])      # odd run descending
    # chain: final fused-dedup pass over the (asc, desc) pair
    got = DP.merged_dedup_compact_pass(jnp.asarray(h1), jnp.asarray(l1),
                                       jnp.int32(2 * cap), interpret=True)
    shi = jnp.asarray((np.sort(k_all) >> np.uint64(32)).astype(np.uint32))
    slo = jnp.asarray(np.sort(k_all).astype(np.uint32))
    want = dedup_count_sorted(shi, slo)
    gk, gc = _dense(*got)
    wk, wc = _dense(*want)
    assert np.array_equal(gk, wk)
    assert np.array_equal(gc, wc)


def test_tree_merge_pass_alt_parity_and_pair(rng):
    """parity=1 emits the single merged run DESCENDING (the second-round
    subtree's last pass), and tree_merge_pair_alt merges an unequal
    (asc, desc) pair ascending."""
    from zotpu.kernels.sort_pallas import (tree_merge_pair_alt,
                                           tree_merge_pass_alt)

    cap = TILE_E
    runs = [_sorted_with_dups(rng, cap, int(rng.integers(cap // 2, cap + 1)),
                              1 << 30) for _ in range(2)]
    hi = np.concatenate([runs[0][0], runs[1][0][::-1]])
    lo = np.concatenate([runs[0][1], runs[1][1][::-1]])
    h2, l2 = tree_merge_pass_alt(jnp.asarray(hi), jnp.asarray(lo),
                                 jnp.int32(cap), parity=1, interpret=True)
    h2, l2 = np.asarray(h2), np.asarray(l2)
    k_all = ((np.concatenate([r[0] for r in runs]).astype(np.uint64) << 32)
             | np.concatenate([r[1] for r in runs]))
    want = np.sort(k_all)[::-1]
    got = (h2.astype(np.uint64) << 32) | l2
    assert np.array_equal(got, want)
    # unequal pair: 2-tile ascending A + the descending run above
    ahi, alo = _sorted_with_dups(rng, 2 * cap, 2 * cap - 77, 1 << 30)
    ph, plo_ = tree_merge_pair_alt(
        jnp.asarray(np.concatenate([ahi, h2])),
        jnp.asarray(np.concatenate([alo, l2])), nA=2 * cap, interpret=True)
    ka = (ahi.astype(np.uint64) << 32) | alo
    wantp = np.sort(np.concatenate([ka, k_all]))
    gotp = (np.asarray(ph).astype(np.uint64) << 32) | np.asarray(plo_)
    assert np.array_equal(gotp, wantp)
