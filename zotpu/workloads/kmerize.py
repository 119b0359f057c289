"""kmerize workload: FASTQ/FASTA -> sorted canonical k-mer set + counts.

Reference analog: zotmer/commands/kmerize.py (SURVEY.md section 3.1): stream
reads, emit canonical k-mers, sort+dedup+count with memory-bounded batching and
a final merge of per-batch sorted runs (external-sort structure).

TPU-native shape (BASELINE config 1): the host parses fixed-shape code batches
(numpy-vectorized) and double-buffers them to the device; the device runs the
fused pack->sort->dedup program per batch; per-batch sorted runs are merged in
a tree. Per-batch runs can be spilled as ZKF files (the checkpoint/resume
story, SURVEY.md section 5: a crashed run resumes from completed runs + merge).
"""

from __future__ import annotations

import dataclasses
import os

import jax

import numpy as np

from zotpu import semantics as S
from zotpu.io import container, fastq
from zotpu.kernels import sortdedup
from zotpu.reference_impl import golden as G


@dataclasses.dataclass
class Stats:
    reads: int = 0
    bases: int = 0
    kmers: int = 0
    batches: int = 0
    unique: int = 0

    def as_dict(self):
        return dataclasses.asdict(self)


def _device_batch(codes, lengths, k):
    from zotpu.kernels import dispatch
    hi, lo, w = dispatch.pack_canonical(codes, lengths, k)
    return sortdedup.kmer_sort_dedup(hi, lo, w)


DEVICE_MERGE_THRESHOLD = 1 << 20  # total keys above which the device tree wins


def merge_runs(runs: list[tuple[np.ndarray, np.ndarray]],
               force_host: bool = False) -> tuple[np.ndarray, np.ndarray]:
    """Tree-merge sorted (keys, counts) runs, summing counts (saturating).

    Small totals merge on the host (numpy oracle, no compile cost); large
    totals use the pairwise device merge tree (~10x faster at scale).
    ``force_host=True`` pins the golden numpy path regardless of size (the
    --host cross-check must never silently use device kernels)."""
    if not runs:
        return np.empty(0, np.uint64), np.empty(0, S.COUNT_DTYPE)
    total = sum(len(r[0]) for r in runs)
    if not force_host and total >= DEVICE_MERGE_THRESHOLD:
        from zotpu.workloads.setops import merge_tree_device
        return merge_tree_device(runs)
    while len(runs) > 1:
        nxt = []
        for i in range(0, len(runs) - 1, 2):
            nxt.append(G.merge([runs[i], runs[i + 1]]))
        if len(runs) % 2:
            nxt.append(runs[-1])
        runs = nxt
    return runs[0]


class Interrupted(RuntimeError):
    """Raised by the fault-injection hook to simulate a mid-run crash."""


def _iter_batches(paths, batch_reads, max_len, k, stats):
    """Shared prefetched batch stream; updates stats per batch."""
    from zotpu.io.prefetch import prefetch

    def all_batches():
        for path in paths:
            yield from fastq.parse_batches(path, batch_reads, max_len,
                                           halo=k - 1)

    for batch in prefetch(all_batches(), depth=2):
        stats.batches += 1
        stats.reads += batch.n_reads
        stats.bases += batch.bases
        yield batch


def kmerize_paths(paths: list[str], k: int, batch_reads: int = 4096,
                  max_len: int = 256, spill_dir: str | None = None,
                  stats: Stats | None = None, resume: bool = False,
                  fail_after_batches: int | None = None,
                  merge_capacity: int = 1 << 26
                  ) -> tuple[np.ndarray, np.ndarray]:
    """Kmerize files into one sorted unique (keys u64, counts u32) pair.

    Default (no spill_dir): per-batch runs stay ON DEVICE and merge through a
    log-structured device accumulator -- only the final set is transferred
    (per-batch host round trips dominate E2E time on remote TPUs; measured
    2 Mbase/s with host merging vs the 130 Mbase/s device step).
    ``merge_capacity`` bounds the unique-key capacity of the accumulator.

    With ``spill_dir`` each batch's sorted run is written as a ZKF file, which
    is the checkpoint granularity: ``resume=True`` re-reads completed runs
    instead of recomputing them, so a crashed run redoes at most one batch
    (SURVEY.md section 5, failure detection / batch-granular restartability).
    ``fail_after_batches`` is the fault-injection hook used by tests.
    """
    from zotpu.workloads.accumulator import DeviceAccumulator

    S.check_k(k)
    stats = stats if stats is not None else Stats()
    use_acc = spill_dir is None
    acc: DeviceAccumulator | None = None
    runs: list[tuple[np.ndarray, np.ndarray]] = []
    batch_no = 0
    pending = None  # (device outputs, batch_no, run_path) awaiting host sync

    def consume(p):
        nonlocal acc
        (uhi, ulo, counts, n), bno, run_path = p
        if use_acc:
            if acc is None:
                acc = DeviceAccumulator(uhi.shape[0], max_cap=merge_capacity)
            acc.add(uhi, ulo, counts, n)  # no host sync: pipeline stays async
            return
        n = int(n)
        keys = S.join_hi_lo(np.asarray(uhi[:n]), np.asarray(ulo[:n]))
        cnts = np.asarray(counts[:n])
        if run_path is not None:
            container.write(run_path, container.KmerSet(
                k=k, keys=keys, counts=cnts, meta={"run": bno}))
        stats.kmers += int(cnts.sum(dtype=np.uint64))
        runs.append((keys, cnts))

    # The prefetch thread overlaps parsing (gzip/encode, GIL-released) with
    # device compute and host merging of the previous batch.
    for batch in _iter_batches(paths, batch_reads, max_len, k, stats):
        batch_no += 1
        run_path = (os.path.join(spill_dir, f"run{batch_no:06d}.zkf")
                    if spill_dir is not None else None)
        if resume and run_path and os.path.exists(run_path):
            if pending is not None:
                consume(pending)
                pending = None
            ks = container.read(run_path)
            stats.kmers += int(ks.counts.sum(dtype=np.uint64))
            runs.append((ks.keys, ks.counts))
            continue
        if fail_after_batches is not None and batch_no > fail_after_batches:
            if pending is not None:
                consume(pending)
            raise Interrupted(f"injected failure before batch {batch_no}")
        # Software pipelining (SURVEY.md section 2b "PP analog"): start the
        # async H2D upload first, do the previous batch's host/merge work
        # while it flies, then dispatch compute on device-resident inputs.

        codes_d = jax.device_put(batch.codes)
        lengths_d = jax.device_put(batch.lengths)
        if pending is not None:
            consume(pending)
        out = _device_batch(codes_d, lengths_d, k)
        pending = (out, batch_no, run_path)
    if pending is not None:
        consume(pending)
    if use_acc:
        keys, counts = (acc.result() if acc is not None
                        else (np.empty(0, np.uint64),
                              np.empty(0, S.COUNT_DTYPE)))
        # total instances = sum of merged counts (saturation is astronomically
        # far at these scales); avoids a per-batch device sync
        stats.kmers = int(counts.sum(dtype=np.uint64))
    else:
        keys, counts = merge_runs(runs)
    stats.unique = len(keys)
    return keys, counts


def resume_from_spills(spill_dir: str) -> tuple[np.ndarray, np.ndarray]:
    """Rebuild the merged set from previously written per-batch runs."""
    runs = []
    for name in sorted(os.listdir(spill_dir)):
        if name.endswith(".zkf"):
            ks = container.read(os.path.join(spill_dir, name))
            runs.append((ks.keys, ks.counts))
    return merge_runs(runs)


def kmerize_paths_sharded(paths: list[str], k: int, n_shards: int,
                          batch_reads: int = 4096, max_len: int = 256,
                          stats: Stats | None = None,
                          capacity_factor: float = 4.0
                          ) -> tuple[np.ndarray, np.ndarray]:
    """Multi-chip kmerize through the shard_map pipeline (BASELINE config 1
    at scale): each batch is split across the mesh, k-mers are all-to-all
    routed to their key-prefix owner shard, per-shard runs are gathered and
    merged. n_shards must be a power of two <= len(jax.devices()).

    v1 gathers per-batch shard runs to the host (the device-accumulator
    treatment for the sharded path is future work); correctness is identical
    to the single-chip path by the shard-count invariance tests.
    """
    from zotpu.dist import mesh as M
    from zotpu.dist import shuffle

    S.check_k(k)
    stats = stats if stats is not None else Stats()
    n_dev = len(jax.devices())
    if n_shards > n_dev:
        raise ValueError(
            f"--shards {n_shards} exceeds the {n_dev} available device(s)")
    mesh = M.make_mesh(n_shards)
    reads_per_chip = max(batch_reads // n_shards, 1)
    rtot = reads_per_chip * n_shards
    step, _ = shuffle.make_kmerize_step(mesh, k, reads_per_chip, max_len,
                                        capacity_factor=capacity_factor)
    runs: list[tuple[np.ndarray, np.ndarray]] = []
    for batch in _iter_batches(paths, rtot, max_len, k, stats):
        uhi, ulo, counts, n_unique, overflow = step(batch.codes, batch.lengths)
        if int(np.asarray(overflow).sum()) > 0:
            raise ValueError(
                "all-to-all bucket overflow: raise capacity_factor")
        keys, cnts = shuffle.gather_global(
            np.asarray(uhi).reshape(n_shards, -1),
            np.asarray(ulo).reshape(n_shards, -1),
            np.asarray(counts).reshape(n_shards, -1),
            np.asarray(n_unique))
        stats.kmers += int(cnts.sum(dtype=np.uint64))
        runs.append((keys, cnts))
    keys, counts = merge_runs(runs)
    stats.unique = len(keys)
    return keys, counts
