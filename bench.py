"""Driver benchmark: one JSON line per BASELINE metric, headline LAST.

Artifact-indestructibility contract (VERDICT round 3 item 1 -- round 3's
driver run timed out and the old print-at-end buffering lost every
already-measured number):

- Every record is STREAMED to stdout the moment its workload completes,
  and the current headline is RE-PRINTED after it, so the last complete
  JSON line on stdout is the best available headline at ANY kill point.
- A global wall budget (``ZOTPU_BENCH_BUDGET`` seconds, default 870)
  skips remaining workloads once exceeded; each child's timeout is
  clamped to the remaining budget.
- SIGTERM/SIGALRM handlers flush the ordered block + headline before
  exiting, so a parent-level ``timeout`` still yields a parsed artifact.
- The headline-feeding workloads (kmerize -> shard-model) run FIRST;
  everything after them only adds secondary lines.
- ``zotpu selftest`` gates the run (VERDICT round 3 item 6): an explicit
  check failure aborts with rc=1 and a record saying why (silicon
  corruption must not produce a "passing" perf artifact); a gate TIMEOUT
  is tunnel weather and is logged + skipped, not fatal. The gate also
  pre-warms the compile cache for the shared kernel shapes. Disable with
  ``ZOTPU_BENCH_GATE=0``.

At the very end the ordered block re-prints least-important-first with the
headline LAST (the driver parses the final JSON line): the measured-term
8-chip HOST projection of kmerize throughput (k=25) vs BASELINE's 1e9
bases/s/HOST target, per-chip rate carried inside the record. Other lines
cover the remaining BASELINE metrics. Progress goes to stderr.

Each workload runs in its OWN subprocess with a hard timeout: this rig's TPU
rides a shared remote tunnel whose weather can stall a single transfer for
many minutes (docs/PERF_NOTES.md), and a stalled tail workload must not cost
the driver the already-measured lines. The parent never initializes the TPU
(only one process may hold the chip); children share the persistent compile
cache, so the per-child cost is ~20 s of process init.
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import time

MARKER = "ZOTPU_BENCH_RESULT "

# least-important-first print order for the final block; the headline is
# appended after these. Unknown metrics print first (never crash at the very
# end and discard every measured line -- ADVICE round 2).
ORDER = ["kmerize_sharded_second_round_overhead",
         "host_parse_gz_bases_per_s", "kmerize_e2e_bases_per_s",
         "scan_kmers_per_s", "setops_merge_gb_per_s",
         "kmerize_sustained_bases_per_s_chip",
         "kmerize_bases_per_s_chip"]

_records: list[dict] = []
_headline: dict | None = None
_t0 = time.monotonic()
_budget = int(os.environ.get("ZOTPU_BENCH_BUDGET", 870))


def _log(msg):
    print(f"bench: {msg}", file=sys.stderr, flush=True)


def _remaining() -> float:
    return _budget - (time.monotonic() - _t0)


def _stream(rec):
    """Print a record immediately, then re-print the headline so the LAST
    stdout line is always the best available headline at any kill point."""
    _records.append(rec)
    print(json.dumps(rec), flush=True)
    if _headline is not None:
        print(json.dumps(_headline), flush=True)


def _set_headline(rec):
    global _headline
    _headline = rec
    print(json.dumps(rec), flush=True)


def _final_block():
    """The ordered least-important-first block, headline last."""
    recs = sorted(_records, key=lambda r: (ORDER.index(r["metric"])
                                           if r.get("metric") in ORDER
                                           else -1))
    for rec in recs:
        print(json.dumps(rec), flush=True)
    if _headline is not None:
        print(json.dumps(_headline), flush=True)


def _on_signal(signum, frame):
    _log(f"signal {signum}: flushing banked records + headline")
    _final_block()
    _log("done (signal flush)")
    os._exit(0)


def run_workload(label: str, body: str, timeout_s: int):
    """Run one bench workload in a child process; return its result dict.

    ``body`` is python source computing a dict ``r``; the child prints it
    behind MARKER. Returns None on timeout/crash/insufficient budget
    (logged, never raised -- a failed secondary metric must not eat the
    rest of the artifact). The child timeout is clamped to the remaining
    global budget.
    """
    rem = _remaining()
    if rem < 45:
        _log(f"{label}: skipped (global budget exhausted, {rem:.0f}s left)")
        return None
    timeout_s = max(30, min(timeout_s, int(rem - 20)))
    code = (
        "import json\n"
        "from zotpu import runtime\n"
        "runtime.setup()\n"
        "import jax\n"
        "from zotpu.bench import harness\n"
        + body +
        f"\nr['device'] = str(jax.devices()[0])\n"
        f"print({MARKER!r} + json.dumps(r), flush=True)\n"
    )
    try:
        p = subprocess.run([sys.executable, "-u", "-c", code],
                           capture_output=True, text=True, timeout=timeout_s)
    except subprocess.TimeoutExpired:
        _log(f"{label}: timed out after {timeout_s}s; skipped")
        return None
    for line in p.stdout.splitlines():
        if line.startswith(MARKER):
            return json.loads(line[len(MARKER):])
    tail = (p.stderr or "").strip().splitlines()[-3:]
    _log(f"{label}: no result (rc={p.returncode}); stderr tail: {tail}")
    return None


def run_gate() -> bool:
    """Pre-bench selftest gate (VERDICT round 3 item 6). Returns False only
    on an EXPLICIT check failure (byte-inequality on silicon); a timeout is
    tunnel weather: logged, bench proceeds. Also pre-warms the compile
    cache for the kernel shapes selftest shares with the bench."""
    if os.environ.get("ZOTPU_BENCH_GATE", "1") == "0":
        _log("gate: disabled via ZOTPU_BENCH_GATE=0")
        return True
    tmo = max(60, min(int(os.environ.get("ZOTPU_BENCH_GATE_TIMEOUT", 480)),
                      int(_remaining() / 3)))
    _log(f"gate: zotpu selftest (timeout {tmo}s)")
    code = ("from zotpu import runtime\n"
            "runtime.setup()\n"
            "from zotpu.selftest import run_selftest\n"
            "import sys\n"
            "sys.exit(run_selftest())\n")
    t0 = time.monotonic()
    try:
        p = subprocess.run([sys.executable, "-u", "-c", code],
                           capture_output=True, text=True, timeout=tmo)
    except subprocess.TimeoutExpired:
        _log(f"gate: selftest timed out after {tmo}s (tunnel weather); "
             "proceeding without the gate")
        return True
    dt = time.monotonic() - t0
    if p.returncode == 0:
        _log(f"gate: selftest ok in {dt:.0f}s")
        return True
    failed = [ln for ln in p.stdout.splitlines()
              if '"ok": false' in ln or '"ok": False' in ln]
    _log(f"gate: selftest FAILED (rc={p.returncode}) in {dt:.0f}s")
    _stream({
        "metric": "selftest_failed",
        "value": 0,
        "unit": ("zotpu selftest found device-vs-golden byte inequality; "
                 "perf lines suppressed. failing checks: "
                 + "; ".join(failed[:4])),
        "vs_baseline": 0,
    })
    return False


def main():
    global _headline
    signal.signal(signal.SIGTERM, _on_signal)
    signal.signal(signal.SIGALRM, _on_signal)
    signal.alarm(_budget + 25)          # backstop: flush even if a child wedges

    total_bases = int(os.environ.get("ZOTPU_BENCH_BASES", 1 << 25))
    k = int(os.environ.get("ZOTPU_BENCH_K", 25))
    tmo = int(os.environ.get("ZOTPU_BENCH_TIMEOUT", 600))

    if not run_gate():
        _final_block()
        sys.exit(1)

    # --- headline feeders first (VERDICT round 3 item 1) ---
    _log(f"kmerize {total_bases} bases k={k}")
    r = run_workload("kmerize", f"r = harness.bench_kmerize({total_bases}, "
                     f"k={k}, read_len=256, repeats=3)", tmo)
    if r:
        _log(f"kmerize {r['seconds']:.3f}s on {r['device']}")
        _stream({
            "metric": "kmerize_bases_per_s_chip",
            "value": r["bases_per_s"],
            "unit": ("bases/s/chip (single-chip device step, dispatch-"
                     "amortized: slope of N-dispatch/1-fence timing -- the "
                     "production pipeline dispatches async and syncs once "
                     "per RUN, so the ~20-25 ms tunnel sync latency is not "
                     "a per-batch cost; single-sync time in "
                     "seconds_single_sync. BASELINE's 1 Gbase/s target is "
                     "per HOST = 8 of these chips -- the headline line "
                     "carries that comparison)"),
            "vs_baseline": r["bases_per_s"] / 1e9,
        })
        # provisional headline so a kill during shard-model still parses
        _set_headline({
            "metric": "kmerize_bases_per_s_host",
            "value": r["bases_per_s"] * 8 * 0.8,
            "unit": ("bases/s/host vs the 1e9 BASELINE north star "
                     "(fallback: 1-chip rate x 8 chips x 0.8 scaling)"),
            "per_chip_bases_per_s": r["bases_per_s"],
            "vs_baseline": r["bases_per_s"] * 8 * 0.8 / 1e9,
        })

    # HEADLINE (the driver parses the LAST stdout line): BASELINE's kmerize
    # target is per HOST; a v5e host has 8 chips and this rig exposes 1.
    # The projection comes from the shard-model workload: every term is
    # measured on this chip -- the FULL sharded program at D=1 (pack, owner
    # sort, bucket fill, route; dedup rides the tree since round 3), the
    # D=8 receive-side merge tree with the fused dedup-compact final pass,
    # AND the amortized per-batch LSM accumulator merges at D=8 shard
    # shapes (VERDICT round 3 item 3) -- times 8 chips at a conservative
    # 0.8 weak-scaling floor (the same model says 0.8 needs only ~4
    # GB/s/chip of ICI, far under v5e ICI, so the floor is pessimistic).
    _log("shard-model...")
    sm = run_workload("shard-model", f"r = harness.bench_shard_model("
                      f"total_bases={total_bases}, k={k}, repeats=3)", tmo)
    if sm and "host8_bases_per_s_at_0.8_eff" in sm:
        acc_note = ""
        if "t_acc_amortized8_s" in sm:
            acc_note = (" + %.1f ms amortized D=8 accumulator merges"
                        % (1e3 * sm["t_acc_amortized8_s"]))
        _set_headline({
            "metric": "kmerize_bases_per_s_host",
            "value": sm["host8_bases_per_s_at_0.8_eff"],
            "unit": ("bases/s/host vs the 1e9 BASELINE north star (8 x "
                     "measured sharded chip step + measured receive merge "
                     "tree w/ fused dedup" + acc_note +
                     ", 0.8 efficiency floor; needs "
                     f"{sm['ici_gbps_needed_for_0.8_eff']:.1f} GB/s/chip "
                     "ICI)"),
            "per_chip_bases_per_s": r["bases_per_s"] if r else None,
            "vs_baseline": sm["host8_bases_per_s_at_0.8_eff"] / 1e9,
        })

    # Sustained single-chip rate: step + ALL LSM accumulator merging over 8
    # batches (the step-only line excludes amortized merging; round 3's
    # dense dedup + fused streaming level merges are what make these close)
    _log("sustained...")
    su = run_workload("sustained", f"r = harness.bench_sustained("
                      f"total_bases={total_bases}, k={k})", tmo)
    if su:
        _stream({
            "metric": "kmerize_sustained_bases_per_s_chip",
            "value": su["bases_per_s"],
            "unit": (f"bases/s/chip SUSTAINED over {su['batches']} batches "
                     "incl. every LSM accumulator merge (dense dedup-compact "
                     "step output + fused streaming level merges; transfers "
                     "excluded)"),
            "vs_baseline": su["bases_per_s"] / 1e9,
        })

    # --- secondary lines ---
    # Model sensitivity (replaces the vacuous t(1)/t(1) weak-scaling line,
    # VERDICT round 2 item 7): the D=1 step with the overflow second round
    # force-taken, and a per-chip-load sweep of the sharded step.
    _log("shard-sensitivity...")
    ss = run_workload("shard-sensitivity",
                      f"r = harness.bench_shard_sensitivity("
                      f"total_bases={total_bases}, k={k}, repeats=3)", tmo)
    if ss:
        sweep = "; ".join(f"{row['bases'] >> 20} Mbase -> "
                          f"{row['bases_per_s'] / 1e6:.0f} Mbase/s"
                          for row in ss["load_sweep"])
        _stream({
            "metric": "kmerize_sharded_second_round_overhead",
            "value": ss["second_round_overhead"],
            "unit": ("x the gated-off step when the overflow round is "
                     "force-taken at D=1 (skew-path upper bound); "
                     f"per-chip-load sweep: {sweep}"),
            "vs_baseline": 1.0,
        })

    _log("setops...")
    # 16M keys/side: a small genome's unique-kmer set; below ~8M/side the
    # ~25 ms tunnel dispatch latency halves the reported rate
    s = run_workload("setops", "r = harness.bench_setops(n=1 << 24, "
                     "repeats=3)", tmo)
    if s:
        _stream({
            "metric": "setops_merge_gb_per_s",
            "value": s["gb_per_s"],
            "unit": "GB/s",
            "vs_baseline": s["gb_per_s"] / 0.98,  # round-1 measured rate
        })

    _log("scan...")
    sc = run_workload("scan", f"r = harness.bench_scan(repeats=3, k={k})", tmo)
    if sc:
        _stream({
            "metric": "scan_kmers_per_s",
            "value": sc["kmers_per_s"],
            "unit": ("kmers/s (sort-floor-bound: the fwd 3-operand probe "
                     "sort alone runs at ~0.2 Gkeys/s on one chip -- "
                     "docs/PERF_NOTES.md; scales across chips via "
                     "scan --shards)"),
            "vs_baseline": sc["kmers_per_s"] / 5e8,  # VERDICT target 0.5 G/s
        })

    # NOTE: the old weak_scaling_efficiency line is gone (VERDICT round 2
    # item 7): with one real chip it was trivially t(1)/t(1) = 1.0, and an
    # 8-fake-device CPU mesh was tried and REJECTED as a stand-in (fake
    # devices share the host's cores, so it measures host parallelism
    # artifacts, not device scaling). BASELINE metric 3 stands unmeasured
    # on this rig, not failed; the shard-sensitivity line above carries the
    # ground truth one chip can still yield. `zotpu bench --workload
    # scaling` remains for multi-chip rigs.

    # Host input pipeline on .gz fixtures (VERDICT round 2 item 4): per-file
    # inflate workers + chunk-pipelined inflate; no device work.
    _log("parse...")
    pr = run_workload("parse", f"r = harness.bench_parse(total_bases="
                      f"{4 * total_bases}, k={k})", tmo)
    if pr:
        _stream({
            "metric": "host_parse_gz_bases_per_s",
            "value": pr["bases_per_s"],
            "unit": ("bases/s uncompressed-equivalent host parse "
                     f"({pr['files']} .gz files, {pr['workers']} workers on "
                     f"{pr['cores']} cores, "
                     f"{pr['parallel_speedup']:.2f}x over 1 worker; a "
                     "single gzip stream is serial to inflate, so this "
                     "scales with host cores)"),
            "vs_baseline": pr["bases_per_s"] / 1e9,
        })

    _log("e2e...")
    # 8x the device-step size (~268 Mbase at defaults, a small bacterial WGS
    # run -- BASELINE config 4): the pipeline has a fixed ~4 s finalization
    # tail (accumulator level merges + final compaction + one D2H of the
    # result set) that a short run mistakes for throughput; 2 passes take the
    # best one -- identical warm runs vary minutes on this shared tunnel
    # (docs/PERF_NOTES.md "treat E2E wall-clock here as weather").
    e2e = run_workload("e2e", f"r = harness.bench_e2e(total_bases="
                       f"{8 * total_bases}, k={k}, repeats=2)",
                       int(os.environ.get("ZOTPU_BENCH_E2E_TIMEOUT", 900)))
    if e2e:
        unit = "bases/s"
        if "fraction_of_link_ceiling" in e2e:
            unit = ("bases/s (H2D link measured %.0f MB/s -> %.0f Mbase/s "
                    "ceiling at 0.375 B/base; e2e runs at %.0f%% of the "
                    "link ceiling -- tunnel-limited, not pipeline-limited)"
                    % (e2e["h2d_link_bytes_per_s"] / 1e6,
                       e2e["link_bases_per_s_ceiling"] / 1e6,
                       100 * e2e["fraction_of_link_ceiling"]))
        _stream({
            "metric": "kmerize_e2e_bases_per_s",
            "value": e2e["bases_per_s"],
            "unit": unit,
            "vs_baseline": e2e["bases_per_s"] / 1e9,
        })

    signal.alarm(0)
    _final_block()
    _log(f"done in {time.monotonic() - _t0:.0f}s "
         f"(budget {_budget}s)")


if __name__ == "__main__":
    main()
