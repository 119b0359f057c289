"""Panel pulldown / scan workload (BASELINE config 5).

Reference analog: zotmer/commands/scan.py (SURVEY.md section 3.5): screen reads
against a sorted reference k-mer panel via binary search per k-mer.

TPU-native shape: the panel lives on-device as a sorted sentinel-padded
(hi, lo) pair; each read batch is packed by the fused kernel and every window
probes the panel through the vectorized two-word binary search; hits reduce
per read on the VPU. On a mesh the panel is sharded by the same key prefix as
kmerize and k-mers are routed to their owner shard (dist/shuffle.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from zotpu import semantics as S
from zotpu.io import fastq
from zotpu.kernels import dispatch, search


@functools.partial(jax.jit, static_argnames=("k",))
def scan_batch(codes, lengths, panel_hi, panel_lo, k: int):
    """(R, L) codes vs sorted panel -> (R,) per-read hit counts (int32)."""
    R, L = codes.shape
    m = L - k + 1
    hi, lo, w = dispatch.pack_canonical(codes, lengths, k)
    hit = search.member2(panel_hi, panel_lo, hi, lo)
    return jnp.sum(hit.reshape(R, m).astype(jnp.int32), axis=1)


def panel_to_device(keys: np.ndarray, capacity: int | None = None):
    """Sorted u64 panel -> sentinel-padded (hi, lo) device arrays."""
    n = len(keys)
    if capacity is not None:
        cap = capacity
    else:
        cap = max(1 << (n - 1).bit_length(), 8) if n else 8
    hi = np.full(cap, 0xFFFFFFFF, np.uint32)
    lo = np.full(cap, 0xFFFFFFFF, np.uint32)
    hi[:n], lo[:n] = S.split_hi_lo(keys)
    return jnp.asarray(hi), jnp.asarray(lo)


def pulldown_paths(panel_keys: np.ndarray, sample_paths: list[str], k: int,
                   batch_reads: int = 4096, max_len: int = 256):
    """Per-sample (total_hits, reads_with_hits, per_read_hits list).

    Rows are re-aggregated by ``CodeBatch.record_ids`` before any per-read
    statistic: overlong records are halo-chunked into several rows (possibly
    spanning batch boundaries), and counting rows would overstate
    reads_with_hits / misalign per-read output (ADVICE round 1). Chunk halos
    never duplicate a k-mer start position, so summing row hits per record is
    exact.
    """
    phi, plo = panel_to_device(panel_keys)
    results = []
    for path in sample_paths:
        per_read: list[int] = []
        last_id = -1
        for batch in fastq.parse_batches(path, batch_reads, max_len, halo=k - 1):
            hits = np.asarray(scan_batch(batch.codes, batch.lengths, phi, plo, k))
            n = batch.n_reads
            hits = hits[:n]
            rids = batch.record_ids[:n]
            # rids are non-decreasing; reduce rows -> records within the batch
            uniq, inv = np.unique(rids, return_inverse=True)
            sums = np.bincount(inv, weights=hits).astype(np.int64)
            for rid, hsum in zip(uniq, sums):
                if per_read and rid == last_id:
                    per_read[-1] += int(hsum)  # record continued across batches
                else:
                    per_read.append(int(hsum))
                    last_id = int(rid)
        total = sum(per_read)
        reads_hit = sum(1 for h in per_read if h > 0)
        results.append((total, reads_hit, per_read))
    return results
