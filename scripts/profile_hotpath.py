"""Break down the kmerize step + set-op costs on the current device.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python -u scripts/profile_hotpath.py
Every timed program ends in a host transfer of a dependent scalar
(block_until_ready lies for Pallas programs on this PJRT backend).
"""
from __future__ import annotations

import time

import numpy as np

from zotpu import runtime
runtime.setup()

import jax
import jax.numpy as jnp

from zotpu.kernels import dispatch, sortdedup, setops
from zotpu.kernels.setops_merge import set_op_merge_path

K = 25
READS, RLEN = 131072, 256          # == bench.py headline shape (1<<25 bases)


def timeit(name, fn, repeats=3):
    fn()  # compile + warmup
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    print(f"{name:42s} {dt*1e3:9.1f} ms")
    return dt


def main():
    print(f"device: {jax.devices()[0]}")
    rng = np.random.default_rng(0)
    codes = jnp.asarray(rng.integers(0, 4, size=(READS, RLEN)).astype(np.uint8))
    lengths = jnp.full(READS, RLEN, jnp.int32)

    @jax.jit
    def pack_only(c, l):
        hi, lo, w = dispatch.pack_canonical(c, l, K)
        return jnp.sum(hi, dtype=jnp.uint32).astype(jnp.int32)

    @jax.jit
    def pack_sort(c, l):
        hi, lo, w = dispatch.pack_canonical(c, l, K)
        hi, lo = jax.lax.sort((hi, lo), num_keys=2)
        return jnp.sum(hi, dtype=jnp.uint32).astype(jnp.int32)

    @jax.jit
    def full_step(c, l):
        hi, lo, w = dispatch.pack_canonical(c, l, K)
        uhi, ulo, counts, n = sortdedup.kmer_sort_dedup(hi, lo, w,
                                                        compact=False)
        return n + jnp.sum(counts, dtype=jnp.uint32).astype(jnp.int32)

    def run(f):
        return lambda: int(np.asarray(f(codes, lengths)))

    t_pack = timeit("pack only", run(pack_only))
    t_ps = timeit("pack + lax.sort(hi,lo)", run(pack_sort))
    t_full = timeit("pack + sort + dedup_mark (bench step)", run(full_step))
    nk = READS * (RLEN - K + 1)
    print(f"  -> sort ~{(t_ps-t_pack)*1e3:.0f} ms, dedup_mark ~"
          f"{(t_full-t_ps)*1e3:.0f} ms over {nk/1e6:.1f}M kmers")
    print(f"  -> step rate {READS*RLEN/t_full/1e6:.1f} Mbase/s")

    # ---- set ops at the bench size (n = 1<<21 per side) ----
    n = 1 << 21
    def mk(seed):
        r = np.random.default_rng(seed)
        keys = np.unique(np.sort(
            r.integers(0, 1 << 50, size=n).astype(np.uint64)))
        hi = np.full(n, 0xFFFFFFFF, np.uint32)
        lo = np.full(n, 0xFFFFFFFF, np.uint32)
        c = np.zeros(n, np.uint32)
        hi[:len(keys)] = (keys >> np.uint64(32)).astype(np.uint32)
        lo[:len(keys)] = (keys & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        c[:len(keys)] = 1
        return jnp.asarray(hi), jnp.asarray(lo), jnp.asarray(c)
    ahi, alo, ac = mk(1)
    bhi, blo, bc = mk(2)

    def s_run(fn):
        def go():
            hi, lo, c, n_out = fn(ahi, alo, ac, bhi, blo, bc, op="merge")
            return int(np.asarray(n_out + jnp.sum(c, dtype=jnp.uint32)
                                  .astype(jnp.int32)))
        return go

    t_mp = timeit("set_op merge-path (production)", s_run(set_op_merge_path))
    t_sort = timeit("set_op sort-based (round 1)", s_run(setops.set_op))
    gb = 2 * n * 12 / 1e9
    print(f"  -> merge-path {gb/t_mp:.2f} GB/s, sort-based {gb/t_sort:.2f} GB/s")

    # merge-path WITHOUT the combine+compact tail: how much is the tail?
    from zotpu.kernels.sort_pallas import stream_merge_pair_pallas, TILE_E
    M = n  # already a power of two, multiple of TILE_E
    hi2 = jnp.concatenate([ahi, bhi]); lo2 = jnp.concatenate([alo, blo])
    ca2 = jnp.concatenate([ac, jnp.zeros(n, jnp.uint32)])
    cb2 = jnp.concatenate([jnp.zeros(n, jnp.uint32), bc])

    @jax.jit
    def merge_only(hi, lo, ca, cb):
        h, l, a, b = stream_merge_pair_pallas(hi, lo, (ca, cb), nA=M)
        return jnp.sum(a, dtype=jnp.uint32).astype(jnp.int32)

    @jax.jit
    def merge_combine(hi, lo, ca, cb):
        h, l, a, b = stream_merge_pair_pallas(hi, lo, (ca, cb), nA=M)
        keep, cnt = setops._combine_sorted(h, l, a, b, "merge")
        return jnp.sum(cnt, dtype=jnp.uint32).astype(jnp.int32)

    def m_run(f):
        return lambda: int(np.asarray(f(hi2, lo2, ca2, cb2)))
    t_m = timeit("stream merge pass only", m_run(merge_only))
    t_mc = timeit("stream merge + combine scans", m_run(merge_combine))
    print(f"  -> combine tail ~{(t_mc-t_m)*1e3:.0f} ms, "
          f"compact tail ~{(t_mp-t_mc)*1e3:.0f} ms")


if __name__ == "__main__":
    main()
