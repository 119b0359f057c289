"""Isolate the sharded step's bucket-fill+route cost at D=1 (slope timing):
step(full) vs pack+ownersort only. Also times the fill WITHOUT the live-mask
where and without the all_to_all to apportion blame."""
from zotpu import runtime; runtime.setup()
import time, json
import jax, jax.numpy as jnp, numpy as np

from zotpu.dist import mesh as M
from zotpu.dist import shuffle
from zotpu.io import wire
from zotpu.bench.harness import _synth_codes, _amortized_time

k, read_len = 25, 256
total_bases = 1 << 25
reads = total_bases // read_len
rng = np.random.default_rng(0)
codes = _synth_codes(rng, reads, read_len)
lengths = jnp.asarray(np.full(reads, read_len, np.int32))
pw, mw = wire.pack_codes(codes)
pw, mw = jnp.asarray(pw), jnp.asarray(mw)
mesh = M.make_mesh(1)

step, _ = shuffle.make_kmerize_step(mesh, k, reads, read_len,
                                    capacity_factor=1.03, compact=False,
                                    wire=True, _bench_no_dedup=True)

def fence(o):
    return int(np.asarray(o[3]).sum()) + int(np.asarray(o[4]).sum())

fence(step(pw, mw, lengths))
t_step, _ = _amortized_time(lambda: step(pw, mw, lengths), fence)
print(json.dumps({"t_step_full": t_step}), flush=True)

# pack + owner sort only (mirror of shuffle's front): owner-embedded keys
from zotpu.kernels.dispatch import pack_canonical_wire
from zotpu.dist.shuffle import shard_bits

@jax.jit
def front(pw, mw, l):
    hi, lo, w = pack_canonical_wire(pw, mw, l, k)
    hi2, lo2 = jax.lax.sort((hi, lo), num_keys=2)
    return hi2[0] + lo2[-1]

def f_fence(r):
    return int(np.asarray(r))

f_fence(front(pw, mw, lengths))
t_front, _ = _amortized_time(lambda: front(pw, mw, lengths), f_fence)
print(json.dumps({"t_pack_sort": t_front, "t_fill_route": t_step - t_front}),
      flush=True)
