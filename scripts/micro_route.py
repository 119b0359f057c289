"""Micro-bench: where do the ~33 ms of D=1 sharded-step overhead go?

Times the full D=1 sharded kmerize step (as bench --workload shard-model
does) against ablated variants that drop parts of dist/shuffle._route, all
at the same shapes so the comparison isolates the route machinery:

  full    : pack -> sort -> _route (fill + all_to_all) -> dedup_mark
  nofill  : pack -> sort -> dedup_mark  (route replaced by identity; the
            D=1 bucket is the sender's whole sorted array)
  noa2a   : pack -> sort -> fill (concat/slice/where) -> dedup_mark
            (all_to_all dropped; isolates the collective's cost)

Usage: PYTHONPATH=... python -u scripts/micro_route.py [total_bases_log2]
"""

import sys
import time

from zotpu import runtime

runtime.setup()

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P
from jax import shard_map

from zotpu.bench.harness import _synth_codes
from zotpu.dist import mesh as M
from zotpu.dist import shuffle
from zotpu.io import wire
from zotpu.kernels.dispatch import pack_canonical_wire
from zotpu.kernels.pack import SENT32
from zotpu.kernels.sortdedup import dedup_mark_sorted
from zotpu.dist.mesh import AXIS


def bench(fn, args, fence, repeats=5):
    fence(fn(*args))
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        fence(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    lg = int(sys.argv[1]) if len(sys.argv) > 1 else 25
    total_bases = 1 << lg
    k, read_len = 25, 256
    reads = total_bases // read_len
    rng = np.random.default_rng(0)
    codes = _synth_codes(rng, reads, read_len)
    lengths = jnp.asarray(np.full(reads, read_len, np.int32))
    pw, mw = wire.pack_codes(codes)
    pw, mw = jnp.asarray(pw), jnp.asarray(mw)
    mesh = M.make_mesh(1)
    m_local = reads * (read_len - k + 1)
    cap = int(np.ceil(m_local * 1.03))

    def fence6(out):
        return int(np.asarray(out[3]).sum())

    # --- full: the production step (warm from the shard-model bench cache)
    step, _ = shuffle.make_kmerize_step(mesh, k, reads, read_len,
                                        capacity_factor=1.03, compact=False,
                                        wire=True)
    t_full = bench(step, (pw, mw, lengths), fence6)
    print(f"full    {t_full*1e3:8.1f} ms  {total_bases/t_full/1e6:7.1f} Mbase/s",
          flush=True)

    # --- variants share this skeleton
    def make(variant):
        def body(packed, mask, lg_):
            hi, lo, w = pack_canonical_wire(packed, mask, lg_, k)
            hi, lo = jax.lax.sort((hi, lo), num_keys=2)
            if variant == "nofill":
                rhi, rlo = hi, lo
            else:
                valid = ~((hi == SENT32) & (lo == SENT32))
                mloc = hi.shape[0]
                live = (jnp.arange(cap, dtype=jnp.int32)[None, :]
                        < jnp.sum(valid.astype(jnp.int32)))

                def fill(x, fillv):
                    xp = jnp.concatenate([x, jnp.full(cap, fillv, x.dtype)])
                    buf = jnp.stack([jax.lax.dynamic_slice(xp, (0,), (cap,))])
                    return jnp.where(live, buf, fillv)

                send = [fill(hi, SENT32), fill(lo, SENT32)]
                if variant == "noa2a":
                    rhi, rlo = send[0].reshape(-1), send[1].reshape(-1)
                else:
                    rhi, rlo = [jax.lax.all_to_all(
                        b, AXIS, split_axis=0, concat_axis=0,
                        tiled=True).reshape(-1) for b in send]
            uhi, ulo, cnt, n = dedup_mark_sorted(rhi, rlo)
            return (uhi[None], ulo[None], cnt[None], n[None].astype(jnp.int32))

        fn = shard_map(body, mesh=mesh,
                       in_specs=(P(AXIS, None), P(AXIS, None), P(AXIS)),
                       out_specs=(P(AXIS, None),) * 3 + (P(AXIS),),
                       check_vma=False)
        return jax.jit(fn)

    for variant in ("nofill", "noa2a", "a2a"):
        fn = make(variant)
        t = bench(fn, (pw, mw, lengths), fence6)
        print(f"{variant:7s} {t*1e3:8.1f} ms  (+{(t - 0)*1e3:.1f})", flush=True)


if __name__ == "__main__":
    main()
