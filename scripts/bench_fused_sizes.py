"""A/B fused vs sort-based set_op at sizes that amortize dispatch latency."""
import time
import numpy as np
from zotpu import runtime
runtime.setup()
import jax, jax.numpy as jnp
from zotpu import semantics as S
from zotpu.kernels import setops as K
from zotpu.kernels.merge_fused import set_op_fused
from zotpu.kernels.setops_merge import set_op_merge_path

def mk(rng, n):
    keys = np.unique(rng.integers(0, 1 << 50, n).astype(np.uint64))
    hi = np.full(n, 0xFFFFFFFF, np.uint32); lo = hi.copy()
    c = np.zeros(n, np.uint32)
    hi[:len(keys)] = (keys >> np.uint64(32)).astype(np.uint32)
    lo[:len(keys)] = (keys & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    c[:len(keys)] = 1
    return tuple(jnp.asarray(x) for x in (hi, lo, c))

def run(fn, A, B, label, n):
    def step():
        hi, lo, c, n_out = fn(*A, *B, op="merge")
        return int(np.asarray(n_out + jnp.sum(c, dtype=jnp.uint32).astype(jnp.int32)))
    t0 = time.perf_counter(); step()
    print(f"{label} n={2*n}: compile {time.perf_counter()-t0:.1f}s", flush=True)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter(); step(); ts.append(time.perf_counter()-t0)
    dt = min(ts)
    gb = 2*n*12/1e9
    print(f"{label} n={2*n}: {dt*1e3:8.1f} ms  {gb/dt:6.2f} GB/s  "
          f"{2*n/dt/1e9:5.2f} Gkeys/s  (all: {[round(t*1e3) for t in ts]})", flush=True)

print(f"device: {jax.devices()[0]}", flush=True)
rng = np.random.default_rng(1)
for nexp in (21, 23, 24):
    n = 1 << nexp
    A, B = mk(rng, n), mk(rng, n)
    run(set_op_fused, A, B, "fused", n)
    run(set_op_merge_path, A, B, "mpath", n)
    run(K.set_op, A, B, "sort ", n)
