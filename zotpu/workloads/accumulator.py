"""Device-resident merge accumulator for streaming kmerize.

Why: per-batch host transfers dominate end-to-end time on tunneled/remote
TPUs (measured: 130 Mbase/s device step vs 2 Mbase/s E2E when every batch's
variable-length result round-trips to the host -- each distinct valid-length
slice even triggers its own tiny compile). This keeps per-batch sorted runs in
HBM and merges them there, log-structured-merge style:

level i holds at most one run of capacity ``base_cap * 2**i`` (clamped to
``max_cap``). A new batch enters level 0; while a level is occupied, the two
runs merge (device set_op, counts saturate) and carry to the next level.
Each element is merged O(log B) times over B batches, every merge is ONE
jitted program per level shape (pad + merge + truncate + overflow check
fused -- a remote TPU pays ~tens of ms latency per eager dispatch), and
NOTHING synchronizes with the host until ``result()``: capacity overflow is
accumulated as a device flag and raised at the end (the run must then be
redone with a larger --merge-capacity; detection is deferred by design to
keep the pipeline asynchronous).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from zotpu import semantics as S
from zotpu.kernels import setops


class CapacityError(ValueError):
    pass


def _next_pow2(x: int) -> int:
    return 1 << max(x - 1, 0).bit_length()


@functools.partial(jax.jit, static_argnames=("cap",))
def _pad_to(hi, lo, cnt, cap: int):
    n = hi.shape[0]
    if n >= cap:
        return hi[:cap], lo[:cap], cnt[:cap]
    padk = jnp.full(cap - n, 0xFFFFFFFF, jnp.uint32)
    padc = jnp.zeros(cap - n, jnp.uint32)
    return (jnp.concatenate([hi, padk]), jnp.concatenate([lo, padk]),
            jnp.concatenate([cnt, padc]))


@functools.partial(jax.jit, static_argnames=("out_cap",))
def _merge_fused(ahi, alo, ac, bhi, blo, bc, ov, out_cap: int):
    """One fused dispatch: merge two sorted runs, truncate to out_cap,
    accumulate the overflow flag (max excess valid count seen so far)."""
    hi, lo, cnt, n = setops.set_op(ahi, alo, ac, bhi, blo, bc, op="merge")
    ov = jnp.maximum(ov, n - out_cap)
    return hi[:out_cap], lo[:out_cap], cnt[:out_cap], n, ov


class DeviceAccumulator:
    def __init__(self, batch_capacity: int, max_cap: int = 1 << 26):
        self.base_cap = _next_pow2(batch_capacity)
        self.max_cap = max(max_cap, self.base_cap)
        self.overflow = jnp.zeros((), jnp.int32)
        # levels[i] = (hi, lo, cnt, n_device) at cap(i), or None
        self.levels: list = []

    def _cap(self, i: int) -> int:
        return min(self.base_cap << i, self.max_cap)

    def add(self, hi, lo, cnt, n) -> None:
        """Insert one sorted sentinel-padded run (device arrays). No host
        synchronization happens here."""
        if hi.shape[0] > self._cap(0):
            raise ValueError(
                f"run capacity {hi.shape[0]} exceeds the accumulator's level-0 "
                f"capacity {self._cap(0)}; construct DeviceAccumulator with "
                f"batch_capacity >= the largest run (silent truncation would "
                f"lose k-mers)")
        entry = (*_pad_to(hi, lo, cnt, cap=self._cap(0)), n)
        i = 0
        while True:
            if len(self.levels) <= i:
                self.levels.append(None)
            if self.levels[i] is None:
                self.levels[i] = entry
                return
            other = self.levels[i]
            self.levels[i] = None
            entry = self._merge(entry, other, self._cap(i + 1))
            i += 1

    def _merge(self, a, b, out_cap: int):
        hi, lo, cnt, n, self.overflow = _merge_fused(
            a[0], a[1], a[2], b[0], b[1], b[2], self.overflow,
            out_cap=out_cap)
        return hi, lo, cnt, n

    def result(self) -> tuple[np.ndarray, np.ndarray]:
        """Merge remaining levels, check deferred overflow, transfer ONLY the
        valid prefix (the single host sync of the whole accumulation)."""
        entry = None
        cap_final = self._cap(len(self.levels))
        for lvl in self.levels:
            if lvl is None:
                continue
            entry = lvl if entry is None else self._merge(entry, lvl, cap_final)
        if entry is None:
            return np.empty(0, np.uint64), np.empty(0, S.COUNT_DTYPE)
        if int(self.overflow) > 0:
            raise CapacityError(
                f"accumulator overflowed its unique-key capacity by "
                f"{int(self.overflow)}; rerun with a larger --merge-capacity "
                f"or use --spill-dir (host merging)")
        hi, lo, cnt, n = entry
        n = int(n)
        keys = S.join_hi_lo(np.asarray(hi[:n]), np.asarray(lo[:n]))
        return keys, np.asarray(cnt[:n]).astype(S.COUNT_DTYPE)
