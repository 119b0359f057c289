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
    nA, nB = nA_tiles * TILE_E, nB_tiles * TILE_E
    ahi, alo = _sorted_with_dups(rng, nA, int(nA * 0.9), 500)
    parts = [np.stack([ahi, alo])]
    if nB:
        bhi, blo = _sorted_with_dups(rng, nB, int(nB * 0.7), 500)
        parts.append(np.stack([bhi, blo]))
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
    # 4 equal runs -> two pass levels; the final level is the dense kernel
    D, cap = 2, TILE_E
    runs = [_sorted_with_dups(rng, cap, int(rng.integers(cap // 2, cap + 1)),
                              400) for _ in range(D)]
    hi = jnp.asarray(np.concatenate([r[0] for r in runs]))
    lo = jnp.asarray(np.concatenate([r[1] for r in runs]))
    got = DP.merged_dedup_compact_pass(hi, lo, jnp.int32(cap),
                                       interpret=True)
    shi, slo = jax.lax.sort((hi, lo), num_keys=2)
    want = dedup_count_sorted(shi, slo)
    gk, gc = _dense(*got)
    wk, wc = _dense(*want)
    assert np.array_equal(gk, wk)
    assert np.array_equal(gc, wc)
