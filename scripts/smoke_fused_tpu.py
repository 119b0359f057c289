"""Compile + correctness + perf of the fused set-op kernel on the device.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python -u scripts/smoke_fused_tpu.py
"""
from __future__ import annotations

import time

import numpy as np

from zotpu import runtime
runtime.setup()

import jax
import jax.numpy as jnp

from zotpu import semantics as S
from zotpu.kernels import setops as K
from zotpu.kernels.merge_fused import set_op_fused


def _dense(keys, counts, cap):
    hi = np.full(cap, 0xFFFFFFFF, np.uint32)
    lo = np.full(cap, 0xFFFFFFFF, np.uint32)
    c = np.zeros(cap, np.uint32)
    hi[:len(keys)], lo[:len(keys)] = S.split_hi_lo(np.asarray(keys, np.uint64))
    c[:len(keys)] = counts
    return hi, lo, c


def mk(rng, n, cap):
    keys = np.unique(rng.integers(0, 1 << 50, n).astype(np.uint64))
    counts = rng.integers(1, 1000, len(keys)).astype(np.uint32)
    return _dense(keys, counts, cap), (keys, counts)


def check(op, n=40000, cap=1 << 16, seed=0):
    rng = np.random.default_rng(seed)
    A, _ = mk(rng, n, cap)
    B, _ = mk(rng, n + 1234, cap)
    t0 = time.perf_counter()
    got = set_op_fused(*A, *B, op=op)
    g = [np.asarray(x) for x in got[:3]] + [int(got[3])]
    print(f"{op}: compile+run {time.perf_counter()-t0:.1f}s", flush=True)
    want = K.set_op(*A, *B, op=op)
    n_out = int(want[3])
    assert g[3] == n_out, (g[3], n_out)
    for i, (w, x) in enumerate(zip(want[:3], g[:3])):
        w = np.asarray(w)
        if not np.array_equal(w[:n_out], x[:n_out]):
            bad = np.nonzero(w[:n_out] != x[:n_out])[0]
            raise AssertionError(f"{op} ch{i}: {len(bad)} mismatches, "
                                 f"first at {bad[:5]}: want "
                                 f"{w[bad[:5]]} got {x[bad[:5]]}")
    assert np.all(g[0][n_out:] == 0xFFFFFFFF), "tail not sentinel"
    assert np.all(g[2][n_out:] == 0), "tail counts not zero"
    print(f"{op}: OK n_out={n_out}", flush=True)


def bench(n=1 << 21, repeats=3):
    rng = np.random.default_rng(1)
    A, _ = mk(rng, n, n)
    B, _ = mk(rng, n, n)
    A = tuple(jnp.asarray(x) for x in A)
    B = tuple(jnp.asarray(x) for x in B)

    def step():
        hi, lo, c, n_out = set_op_fused(*A, *B, op="merge")
        return int(np.asarray(n_out + jnp.sum(c, dtype=jnp.uint32)
                              .astype(jnp.int32)))

    t0 = time.perf_counter()
    step()
    print(f"bench compile {time.perf_counter()-t0:.1f}s", flush=True)
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        step()
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    gb = 2 * n * 12 / 1e9
    print(f"fused merge 2x{n}: {dt*1e3:.1f} ms = {gb/dt:.2f} GB/s "
          f"({2*n/dt/1e9:.2f} Gkeys/s)", flush=True)


if __name__ == "__main__":
    print(f"device: {jax.devices()[0]}", flush=True)
    for op in ("merge", "intersect", "diff"):
        check(op)
    bench()
