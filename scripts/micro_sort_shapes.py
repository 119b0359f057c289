"""Does lax.sort cost scale with the SORTED-AXIS length (n log^2 n passes)
or only with total bytes?  Flat 32M vs batched (B, n/B) 2-channel sorts.

If batched sorts are much cheaper per element, a hybrid
[batched sort -> K-way streaming Pallas merge] can beat the flat sort.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python -u scripts/micro_sort_shapes.py
"""
from __future__ import annotations

import time

import numpy as np

from zotpu import runtime
runtime.setup()

import jax
import jax.numpy as jnp

N = 1 << 25


def timeit(name, fn, repeats=3):
    fn()
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    print(f"{name:38s} {dt*1e3:9.1f} ms  {N/dt/1e9:5.2f} Gkeys/s", flush=True)
    return dt


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    rng = np.random.default_rng(0)
    hi = jnp.asarray(rng.integers(0, 1 << 18, N).astype(np.uint32))
    lo = jnp.asarray(rng.integers(0, 1 << 32, N, dtype=np.uint64)
                     .astype(np.uint32))

    @jax.jit
    def flat(hi, lo):
        h, l = jax.lax.sort((hi, lo), num_keys=2)
        return jnp.sum(h, dtype=jnp.uint32).astype(jnp.int32)

    def batched(b):
        @jax.jit
        def f(hi, lo):
            h, l = jax.lax.sort((hi.reshape(b, -1), lo.reshape(b, -1)),
                                dimension=1, num_keys=2)
            return jnp.sum(h, dtype=jnp.uint32).astype(jnp.int32)
        return f

    @jax.jit
    def flat1(lo):
        (l,) = jax.lax.sort((lo,), num_keys=1)
        return jnp.sum(l, dtype=jnp.uint32).astype(jnp.int32)

    def run(f, *a):
        return lambda: int(np.asarray(f(*a)))

    timeit("flat 32M (hi,lo)", run(flat, hi, lo))
    for b in (8, 64, 512, 4096, 16384):
        timeit(f"batched ({b}, {N//b}) (hi,lo)", run(batched(b), hi, lo))
    timeit("flat 32M keys-only u32", run(flat1, lo))


if __name__ == "__main__":
    main()
