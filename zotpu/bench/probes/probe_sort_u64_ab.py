"""A/B on real TPU with x64 ENABLED: 2-key (u32,u32) sort vs true u64 sort,
including the pack/unpack shifts the production path would pay."""
import jax
jax.config.update("jax_enable_x64", True)
from zotpu import runtime; runtime.setup()
import time, json
import jax.numpy as jnp, numpy as np

n = 30408704
rng = np.random.default_rng(0)
k = rng.integers(0, 1 << 53, size=n, dtype=np.uint64)
hi = jnp.asarray((k >> np.uint64(32)).astype(np.uint32))
lo = jnp.asarray(k.astype(np.uint32))
k64 = jnp.asarray(k)

def slope(dispatch, fence, reps=3, nrep=3):
    def t_of(m):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            r = None
            for _ in range(m):
                r = dispatch()
            fence(r)
            ts.append(time.perf_counter() - t0)
        return min(ts)
    t1 = t_of(1); tn = t_of(nrep)
    return (tn - t1) / (nrep - 1)

@jax.jit
def s2(hi, lo):
    a, b = jax.lax.sort((hi, lo), num_keys=2)
    return a[0] + b[-1]

s = slope(lambda: s2(hi, lo), lambda r: int(np.asarray(r)))
print(json.dumps({"sort_2key_u32_slope_x64on": s}), flush=True)

@jax.jit
def s64(k64):
    a = jax.lax.sort(k64)
    return (a[0] + a[-1]).astype(jnp.uint32)

s = slope(lambda: s64(k64), lambda r: int(np.asarray(r)))
print(json.dumps({"sort_u64_true_slope": s}), flush=True)

@jax.jit
def s64_packed(hi, lo):
    # production form: pack 2xu32 -> u64, sort, unpack
    kk = (hi.astype(jnp.uint64) << 32) | lo.astype(jnp.uint64)
    a = jax.lax.sort(kk)
    h = (a >> 32).astype(jnp.uint32)
    l = a.astype(jnp.uint32)
    return h[0] + l[-1]

s = slope(lambda: s64_packed(hi, lo), lambda r: int(np.asarray(r)))
print(json.dumps({"sort_u64_pack_unpack_slope": s}), flush=True)

# 3-channel form the scan join uses: 2 keys + 1 payload vs u64 key + payload
tag = jnp.asarray(rng.integers(0, 1 << 31, size=n, dtype=np.int64).astype(np.uint32))

@jax.jit
def s3(hi, lo, tag):
    a, b, c = jax.lax.sort((hi, lo, tag), num_keys=3)
    return a[0] + b[-1] + c[0]

s = slope(lambda: s3(hi, lo, tag), lambda r: int(np.asarray(r)))
print(json.dumps({"sort_3key_u32_slope": s}), flush=True)

@jax.jit
def s64p(hi, lo, tag):
    kk = (hi.astype(jnp.uint64) << 32) | lo.astype(jnp.uint64)
    a, c = jax.lax.sort((kk, tag), num_keys=2)
    h = (a >> 32).astype(jnp.uint32)
    return h[0] + a.astype(jnp.uint32)[-1] + c[0]

s = slope(lambda: s64p(hi, lo, tag), lambda r: int(np.asarray(r)))
print(json.dumps({"sort_u64key_payload_slope": s}), flush=True)
