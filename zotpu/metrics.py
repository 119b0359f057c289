"""Structured metrics / logging / observability.

Reference analog: zotmer prints ad-hoc stats to stdout (SURVEY.md section 5).
Build requirement: per-stage counters (reads, bases, k-mers emitted, k-mers
routed per shard, dedup ratio, bytes merged) logged as JSONL per host and
aggregated on host 0 -- these feed the BASELINE metrics (k-mers/s/chip, GB/s,
scaling efficiency). Also wraps ``jax.profiler`` tracing around workload steps.
"""

from __future__ import annotations

import contextlib
import json
import os
import sys
import time


class MetricsLogger:
    """JSONL event logger; one file per host (or stderr)."""

    def __init__(self, path: str | None = None, host_id: int = 0):
        self.host_id = host_id
        self._fh = open(path, "a") if path else None

    def log(self, event: str, **fields) -> dict:
        rec = {"ts": time.time(), "host": self.host_id, "event": event, **fields}
        line = json.dumps(rec)
        if self._fh:
            self._fh.write(line + "\n")
            self._fh.flush()
        else:
            print(line, file=sys.stderr)
        return rec

    def close(self):
        if self._fh:
            self._fh.close()
            self._fh = None


@contextlib.contextmanager
def timed(logger: MetricsLogger | None, event: str, **fields):
    """Wall-clock a stage; caller must block_until_ready inside for device work."""
    t0 = time.perf_counter()
    yield
    dt = time.perf_counter() - t0
    if logger is not None:
        logger.log(event, seconds=dt, **fields)


@contextlib.contextmanager
def profiled(trace_dir: str | None):
    """jax.profiler trace around a workload step (TensorBoard/Perfetto)."""
    if not trace_dir:
        yield
        return
    import jax
    os.makedirs(trace_dir, exist_ok=True)
    with jax.profiler.trace(trace_dir):
        yield


def kmerize_stage_metrics(stats, wall_seconds: float, n_chips: int = 1) -> dict:
    """Derive the BASELINE headline numbers from kmerize Stats."""
    out = {
        "bases_per_s": stats.bases / wall_seconds if wall_seconds else 0.0,
        "kmers_per_s_per_chip": (stats.kmers / wall_seconds / n_chips
                                 if wall_seconds else 0.0),
        "dedup_ratio": stats.unique / stats.kmers if stats.kmers else 0.0,
        "reads": stats.reads, "bases": stats.bases,
        "kmers": stats.kmers, "unique": stats.unique,
        "n_chips": n_chips,
    }
    routed = getattr(stats, "routed_per_shard", None)
    if routed:
        mean = sum(routed) / len(routed)
        out["routed_per_shard"] = routed
        out["routing_skew"] = max(routed) / mean if mean else 0.0
    return out
