"""Round-4 micro-profile: tree pass pieces + acc merge overheads (slope-timed)."""
from zotpu import runtime; runtime.setup()
import time, json
import jax, jax.numpy as jnp, numpy as np
from zotpu.kernels.sort_pallas import TILE_E, tree_merge_pass_alt
from zotpu.kernels.dedup_pallas import merged_dedup_compact_pass

def slope(dispatch, fence, reps=3, n=4):
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
    t1 = t_of(1); tn = t_of(n)
    return (tn - t1) / (n - 1), t1

kmers = 30408704
D = 8
cap8 = -(-kmers // D // TILE_E) * TILE_E
n = D * cap8
rng = np.random.default_rng(3)
h = np.sort(rng.integers(0, 1 << 50, size=n).astype(np.uint64)).reshape(D, -1)
rng.shuffle(h.reshape(-1))
h = np.sort(h.reshape(D, -1), axis=1)
hi = (h >> np.uint64(32)).astype(np.uint32)
lo = h.astype(np.uint32)
hi[1::2] = hi[1::2, ::-1]
lo[1::2] = lo[1::2, ::-1]
hi = jnp.asarray(hi.reshape(-1)); lo = jnp.asarray(lo.reshape(-1))

# 1. one alternating pass at tree L1 shape (8 runs of cap8)
s, t1 = slope(lambda: tree_merge_pass_alt(hi, lo, jnp.int32(cap8)),
              lambda r: int(np.asarray(r[0][0] + r[1][-1])))
print(json.dumps({"alt_pass_L1_slope": s, "single": t1,
                  "gelem_per_s": n / s / 1e9}), flush=True)

# 2. chain to L2 inputs, then the L2 pass
h2, l2 = tree_merge_pass_alt(hi, lo, jnp.int32(cap8))
s, _ = slope(lambda: tree_merge_pass_alt(h2, l2, jnp.int32(2 * cap8)),
             lambda r: int(np.asarray(r[0][0] + r[1][-1])))
print(json.dumps({"alt_pass_L2_slope": s, "gelem_per_s": n / s / 1e9}), flush=True)

# 3. final fused dedup pass at L3 shape
h3, l3 = tree_merge_pass_alt(h2, l2, jnp.int32(2 * cap8))
s, _ = slope(lambda: merged_dedup_compact_pass(h3, l3, jnp.int32(n // 2)),
             lambda r: int(np.asarray(r[3])))
print(json.dumps({"merged_dedup_L3_slope": s, "gelem_per_s": n / s / 1e9}), flush=True)

# 4. acc merge: raw set_op_fused vs the _merge_fused_mp wrapper (pad/truncate)
from zotpu.kernels.merge_fused import set_op_fused
from zotpu.workloads.accumulator import _merge_fused_mp, _tile_round
CAP = _tile_round(kmers + TILE_E)
def mk(seed):
    r = np.random.default_rng(seed)
    keys = np.unique(r.integers(0, 1 << 50, size=kmers).astype(np.uint64))
    hi = np.full(CAP, 0xFFFFFFFF, np.uint32); lo = np.full(CAP, 0xFFFFFFFF, np.uint32)
    c = np.zeros(CAP, np.uint32)
    hi[:len(keys)] = (keys >> np.uint64(32)).astype(np.uint32)
    lo[:len(keys)] = (keys & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    c[:len(keys)] = 1
    return jnp.asarray(hi), jnp.asarray(lo), jnp.asarray(c)
A = mk(1); B = mk(2)
s, _ = slope(lambda: set_op_fused(*A, *B, op="merge"),
             lambda r: int(np.asarray(r[3])))
print(json.dumps({"set_op_fused_raw_slope": s, "cands": 2 * CAP,
                  "ns_per_cand": s / (2 * CAP) * 1e9}), flush=True)

ov = jnp.zeros((), jnp.int32)
s, _ = slope(lambda: _merge_fused_mp(*A, *B, ov, out_cap=2 * CAP),
             lambda r: int(np.asarray(r[3])))
print(json.dumps({"merge_fused_mp_slope": s}), flush=True)
