"""Isolate: dynamic-shift pltpu.roll + the _rot_*_dyn helpers on real TPU.

Runs a tiny Pallas kernel that applies _rot_left_dyn/_rot_right_dyn with a
traced rotation from SMEM, compares against the numpy flat-rotation oracle.
"""
from zotpu import runtime; runtime.setup()
import functools
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from zotpu.kernels.merge_fused import _rot_left_dyn, _rot_right_dyn
from zotpu.kernels.sort_pallas import LANES

ROWS = 8  # one vreg tile worth of rows x 128 lanes

def kernel(scal_ref, x_ref, l_ref, r_ref):
    rot = scal_ref[0]
    (l,) = _rot_left_dyn((x_ref[...],), rot)
    (r,) = _rot_right_dyn((x_ref[...],), rot)
    l_ref[...] = l
    r_ref[...] = r

@jax.jit
def run(x, rot):
    scal = jnp.asarray([rot], jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(1,),
        in_specs=[pl.BlockSpec((ROWS, LANES), lambda i, s: (0, 0))],
        out_specs=[pl.BlockSpec((ROWS, LANES), lambda i, s: (0, 0))] * 2)
    return pl.pallas_call(
        kernel, grid_spec=grid_spec, interpret=bool(__import__("os").environ.get("ROLL_INTERP")),
        out_shape=[jax.ShapeDtypeStruct((ROWS, LANES), jnp.uint32)] * 2,
    )(scal, x)

rng = np.random.default_rng(0)
xnp = rng.integers(0, 1 << 32, size=(ROWS, LANES), dtype=np.uint64).astype(np.uint32)
x = jnp.asarray(xnp)
flat = xnp.reshape(-1)
ok = True
for rot in [0, 1, 5, 63, 64, 127, 128]:
    l, r = run(x, rot)
    l, r = np.asarray(l).reshape(-1), np.asarray(r).reshape(-1)
    wl = np.roll(flat, -(rot % 128))           # left-rot by rot in [0,128)
    wr = np.roll(flat, rot)                    # right-rot by rot in [0,128]
    if rot < 128 and not np.array_equal(l, wl):
        ok = False; print(f"LEFT MISMATCH rot={rot}", flush=True)
    if not np.array_equal(r, wr):
        ok = False; print(f"RIGHT MISMATCH rot={rot}", flush=True)
print("ROLL PROBE:", "ok" if ok else "FAILED", flush=True)
