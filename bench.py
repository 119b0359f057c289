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
- The headline feeder (shard-model, which internally measures the plain
  chip step, the sharded step, the receive tree, and the sustained/
  accumulator term) runs FIRST as ONE child that streams a partial result
  after each stage; a child timeout harvests the last partial, and
  children get SIGTERM + grace instead of SIGKILL (a hard kill mid-TPU-
  program can wedge the shared chip). Everything after it only adds
  secondary lines.
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

Self-describing-artifact notes: the e2e record's ``marginal_bases_per_s``
field is CONDITIONAL -- it is dropped (not zeroed) when tunnel weather
makes the half-size run slower than the full run, so its absence means
"weather", not "zero" (VERDICT round 4 weak item 7). A
``selftest_gate_partial`` record appears when the gate passed on a
partial (budget-clipped) selftest, carrying how many checks ran.

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
ORDER = ["fixture_delta_diagnostics",
         "kmerize_sharded_second_round_overhead",
         "host_parse_gz_bases_per_s", "kmerize_e2e_bases_per_s",
         "scan_kmers_per_s", "scan_kmers_per_s_host",
         "setops_merge_gb_per_s", "setops_gb_per_s_host",
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
    else:
        # The driver parses the LAST stdout line as the headline: without
        # an explicit sentinel, a run whose headline child produced nothing
        # would end on whatever secondary metric printed last and be
        # silently misread as the kmerize host rate.
        print(json.dumps({
            "metric": "kmerize_bases_per_s_host", "value": 0,
            "unit": ("NO MEASUREMENT: the headline workload produced no "
                     "result (child crashed or timed out before its first "
                     "stage partial; see bench stderr)"),
            "vs_baseline": 0,
        }), flush=True)


def _on_signal(signum, frame):
    _log(f"signal {signum}: flushing banked records + headline")
    _final_block()
    _log("done (signal flush)")
    os._exit(0)


def _run_child(code: str, timeout_s: int):
    """Run child source; return (stdout, returncode, timed_out).

    On timeout the child gets SIGTERM + a short grace before SIGKILL: a
    hard kill mid-TPU-program can wedge the shared chip for MINUTES of
    FailedPrecondition/hangs on subsequent processes (observed round 4),
    and the grace also lets a progress-streaming child flush its last
    partial line.
    """
    p = subprocess.Popen([sys.executable, "-u", "-c", code],
                         stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                         text=True)
    try:
        so, se = p.communicate(timeout=timeout_s)
        return so, p.returncode, False, se
    except subprocess.TimeoutExpired:
        p.terminate()
        try:
            so, se = p.communicate(timeout=15)
        except subprocess.TimeoutExpired:
            p.kill()
            so, se = p.communicate()
        return so or "", p.returncode, True, se or ""


def run_workload(label: str, body: str, timeout_s: int):
    """Run one bench workload in a child process; return its result dict.

    ``body`` is python source computing a dict ``r``; the child prints it
    behind MARKER. Long workloads may print PARTIAL results behind the
    same MARKER as stages complete (harness progress callbacks); the LAST
    marker line wins, so a timeout harvests every stage that finished.
    Returns None on crash/insufficient budget with no marker line (logged,
    never raised -- a failed secondary metric must not eat the rest of the
    artifact). The child timeout is clamped to the remaining global budget.
    """
    rem = _remaining()
    if rem < 45:
        _log(f"{label}: skipped (global budget exhausted, {rem:.0f}s left)")
        return None
    timeout_s = max(30, min(timeout_s, int(rem - 20)))
    code = (
        "import json\n"
        "import signal, sys\n"
        "signal.signal(signal.SIGTERM, lambda s, f: sys.exit(143))\n"
        "from zotpu import runtime\n"
        "runtime.setup()\n"
        "import jax\n"
        "from zotpu.bench import harness\n"
        f"def _partial(d):\n"
        f"    d['device'] = str(jax.devices()[0])\n"
        f"    print({MARKER!r} + json.dumps(d), flush=True)\n"
        + body +
        f"\nr['device'] = str(jax.devices()[0])\n"
        f"print({MARKER!r} + json.dumps(r), flush=True)\n"
    )
    so, rc, timed_out, se = _run_child(code, timeout_s)
    result = None
    for line in so.splitlines():
        if line.startswith(MARKER):
            result = json.loads(line[len(MARKER):])
    if timed_out:
        _log(f"{label}: timed out after {timeout_s}s"
             + ("; using last partial result" if result else "; skipped"))
        return result
    if result is None:
        tail = se.strip().splitlines()[-3:]
        _log(f"{label}: no result (rc={rc}); stderr tail: {tail}")
    return result


def run_gate() -> bool:
    """Pre-bench selftest gate (VERDICT round 3 item 6). Returns False only
    on an EXPLICIT check failure (byte-inequality on silicon); a timeout is
    tunnel weather: logged, bench proceeds. Also pre-warms the compile
    cache for the kernel shapes selftest shares with the bench."""
    if os.environ.get("ZOTPU_BENCH_GATE", "1") == "0":
        _log("gate: disabled via ZOTPU_BENCH_GATE=0")
        return True
    # cap at a QUARTER of the remaining budget: on a slow-tunnel day even a
    # warm selftest can overrun, and the budget it eats comes straight out
    # of the headline workload's share (round-4 rehearsal: a 289 s gate
    # timeout left the shard-model child too little to finish)
    tmo = max(60, min(int(os.environ.get("ZOTPU_BENCH_GATE_TIMEOUT", 300)),
                      int(_remaining() / 4)))
    # The subprocess wall is a backstop with slack for a check already in
    # flight (killing the child mid-TPU-op can wedge the shared chip for
    # minutes -- observed round 4), but it is ALSO clamped so the gate can
    # never eat past the headline workload's reserve on a short remaining
    # budget (ADVICE round 4: tmo + 120 with tmo = remaining/4 could burn
    # well past the quarter share the cap was added to protect).
    backstop = max(90, min(tmo + 120, int(_remaining()) - 300))
    inproc = max(30, min(tmo - 30, backstop - 60))
    _log(f"gate: zotpu selftest (in-process budget {inproc}s, "
         f"backstop {backstop}s)")
    # The selftest gets an IN-PROCESS budget: it skips remaining checks and
    # exits CLEANLY between device ops when over (partial pass).
    code = ("import os, signal, sys\n"
            "signal.signal(signal.SIGTERM, lambda s, f: sys.exit(143))\n"
            f"os.environ['ZOTPU_SELFTEST_BUDGET'] = '{inproc}'\n"
            "from zotpu import runtime\n"
            "runtime.setup()\n"
            "from zotpu.selftest import run_selftest\n"
            "sys.exit(run_selftest())\n")
    t0 = time.monotonic()
    so, rc, timed_out, _se = _run_child(code, backstop)
    dt = time.monotonic() - t0
    if timed_out:
        _log(f"gate: selftest timed out after {backstop}s (tunnel "
             "weather); proceeding without the gate")
        return True
    if rc == 0:
        summary = None
        for ln in so.splitlines():
            if '"command": "selftest"' in ln:
                try:
                    summary = json.loads(ln)
                except ValueError:
                    pass
        partial = bool(summary and summary.get("partial"))
        _log(f"gate: selftest ok in {dt:.0f}s"
             + (" (partial -- budget hit, every run check passed)"
                if partial else ""))
        if partial:
            # The partial flag must reach the streamed artifact, not just
            # stderr: the driver cannot otherwise distinguish a full-
            # coverage gate pass from a single-check one (ADVICE round 4).
            _stream({
                "metric": "selftest_gate_partial",
                "value": summary.get("checks", 0),
                "unit": ("checks RUN before the gate budget expired (all "
                         "passed; remaining checks skipped cleanly -- "
                         "partial gate coverage, not a failure)"),
                "vs_baseline": 1.0,
            })
        return True
    failed = [ln for ln in so.splitlines()
              if '"ok": false' in ln or '"ok": False' in ln]
    _log(f"gate: selftest FAILED (rc={rc}) in {dt:.0f}s")
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
    # headline workload shape (round 5, VERDICT items 1+2): the
    # E. coli-shaped coverage fixture -- reads from one deterministic
    # genome sized for ~30x over an acc_batches-long run, 0.5% errors --
    # with the run length DECLARED in the metric line. "uniform" restores
    # the round-1..4 i.i.d.-random fixture for A/B.
    fixture = os.environ.get("ZOTPU_BENCH_FIXTURE", "coverage")
    acc_b = int(os.environ.get("ZOTPU_BENCH_ACC_BATCHES", 16))

    if not run_gate():
        _final_block()
        sys.exit(1)

    # --- the headline feeder runs FIRST, as ONE child (round 4): ---
    # bench_shard_model measures the plain chip step, the D=1 sharded step,
    # the D=8 receive tree, AND the sustained/accumulator term in one
    # process (one set of warmups, no re-measuring kmerize/sustained in
    # separate children), streaming a partial result after each stage so a
    # timeout harvests whatever finished.
    #
    # HEADLINE (the driver parses the LAST stdout line): BASELINE's kmerize
    # target is per HOST; a v5e host has 8 chips and this rig exposes 1.
    # Every model term is measured on this chip -- the FULL sharded program
    # at D=1 (pack, owner sort, bucket fill, route; dedup rides the tree
    # since round 3), the D=8 receive-side merge tree with the fused
    # dedup-compact final pass, AND the amortized per-batch LSM accumulator
    # merges at D=8 shard shapes (VERDICT round 3 item 3) -- times 8 chips
    # at a conservative 0.8 weak-scaling floor (the same model says 0.8
    # needs only ~5 GB/s/chip of ICI, far under v5e ICI, so the floor is
    # pessimistic).
    _log(f"shard-model (plain step + D=1 sharded step + D=8 tree + "
         f"sustained B={acc_b}) {total_bases} bases k={k} "
         f"fixture={fixture}")
    sm = run_workload("shard-model", f"r = harness.bench_shard_model("
                      f"total_bases={total_bases}, k={k}, repeats=3, "
                      f"progress=_partial, fixture={fixture!r}, "
                      f"acc_batches={acc_b})",
                      int(os.environ.get("ZOTPU_BENCH_HEADLINE_TIMEOUT",
                                         600)))
    fix_note = (f"{fixture} fixture"
                + (f" (~30x genome, 0.5% err), B={acc_b}-batch amortized "
                   "accumulator" if fixture == "coverage"
                   else f", B={acc_b}-batch amortized accumulator"))
    chip_rate = None
    if sm and "plain_bases_per_s" in sm:
        chip_rate = sm["plain_bases_per_s"]
        _log(f"plain step {sm['t_plain_s']:.3f}s on {sm['device']}")
        _stream({
            "metric": "kmerize_bases_per_s_chip",
            "value": chip_rate,
            "unit": ("bases/s/chip (single-chip device step, dispatch-"
                     "amortized: slope of N-dispatch/1-fence timing -- the "
                     "production pipeline dispatches async and syncs once "
                     "per RUN, so the ~20-25 ms tunnel sync latency is not "
                     f"a per-batch cost; {fixture} fixture; single-sync "
                     "time in plain_seconds_single_sync. BASELINE's "
                     "1 Gbase/s target is per HOST = 8 of these chips -- "
                     "the headline line carries that comparison)"),
            "vs_baseline": chip_rate / 1e9,
        })
        # provisional headline in case the model terms didn't finish
        _set_headline({
            "metric": "kmerize_bases_per_s_host",
            "value": chip_rate * 8 * 0.8,
            "unit": ("bases/s/host vs the 1e9 BASELINE north star "
                     "(fallback: 1-chip rate x 8 chips x 0.8 scaling; "
                     + fix_note + ")"),
            "per_chip_bases_per_s": chip_rate,
            "vs_baseline": chip_rate * 8 * 0.8 / 1e9,
        })
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
                     ", 0.8 efficiency floor; " + fix_note + "; needs "
                     f"{sm['ici_gbps_needed_for_0.8_eff']:.1f} GB/s/chip "
                     "ICI)"),
            "per_chip_bases_per_s": chip_rate,
            "vs_baseline": sm["host8_bases_per_s_at_0.8_eff"] / 1e9,
        })
    if sm and "sustained_bases_per_s" in sm:
        # Sustained single-chip rate: step + ALL LSM accumulator merging
        # (the step-only line excludes amortized merging; round 3's dense
        # dedup + fused streaming level merges are what make these close)
        _stream({
            "metric": "kmerize_sustained_bases_per_s_chip",
            "value": sm["sustained_bases_per_s"],
            "unit": (f"bases/s/chip SUSTAINED over {acc_b} batches incl. "
                     "every LSM accumulator merge (dense dedup-compact "
                     "step output + fused streaming level merges; "
                     f"transfers excluded; {fix_note})"),
            "vs_baseline": sm["sustained_bases_per_s"] / 1e9,
        })

    # --- secondary lines, BASELINE metrics first (round 4: on a slow-
    # tunnel day the budget runs out mid-secondaries, so the lines that
    # map to BASELINE metrics -- setops GB/s, scan kmers/s -- must land
    # before the sensitivity diagnostics) ---
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

    # Host-scale lines for BASELINE configs 5 and 3 (VERDICT round 4
    # missing item 2): same composition rule as the kmerize headline --
    # the FULL sharded per-chip program measured at D=1 on this chip,
    # times 8 chips at the 0.8 efficiency floor.
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

    _log("scan-shard-model...")
    ssm = run_workload("scan-shard-model",
                       f"r = harness.bench_scan_shard_model(repeats=3, "
                       f"k={k})", tmo)
    if ssm:
        _stream({
            "metric": "scan_kmers_per_s_host",
            "value": ssm["host8_kmers_per_s_at_0.8_eff"],
            "unit": ("kmers/s/HOST (8 x the measured per-chip sharded "
                     "pulldown -- D=1 step: panel partition, k-mer routing "
                     "w/ read-row ids, streaming merge-path join, psum'd "
                     "hits; PLUS the D=8-shape payload merge tree measured "
                     "on this chip, the receive cost D=1 cannot see -- at "
                     "a 0.8 efficiency floor; needs "
                     f"{ssm['ici_gbps_needed_for_0.8_eff']:.1f} GB/s/chip "
                     "ICI; per-chip D=1 rate in kmers_per_s_chip)"),
            "kmers_per_s_chip": ssm["kmers_per_s_chip"],
            "vs_baseline": ssm["host8_kmers_per_s_at_0.8_eff"] / 5e8,
        })

    _log("setops-shard-model...")
    ssp = run_workload("setops-shard-model",
                       "r = harness.bench_setops_shard_model(repeats=3)",
                       tmo)
    if ssp:
        _stream({
            "metric": "setops_gb_per_s_host",
            "value": ssp["host8_gb_per_s_at_0.8_eff"],
            "unit": ("GB/s/HOST sharded set ops (8 x the measured D=1 "
                     "shard_map program -- per-shard fused merge kernel at "
                     "2x16M keys/shard + psum'd cardinalities -- at a 0.8 "
                     "floor that is extremely conservative here: key-"
                     "prefix shard slices exchange NOTHING but 3 psum "
                     "scalars; per-shard rate in gb_per_s_shard)"),
            "gb_per_s_shard": ssp["gb_per_s_shard"],
            "vs_baseline": ssp["host8_gb_per_s_at_0.8_eff"] / 0.98 / 8,
        })

    # NOTE: the old weak_scaling_efficiency line is gone (VERDICT round 2
    # item 7): with one real chip it was trivially t(1)/t(1) = 1.0, and an
    # 8-fake-device CPU mesh was tried and REJECTED as a stand-in (fake
    # devices share the host's cores, so it measures host parallelism
    # artifacts, not device scaling). BASELINE metric 3 stands unmeasured
    # on this rig, not failed; the shard-sensitivity line below carries the
    # ground truth one chip can still yield. `zotpu bench --workload
    # scaling` remains for multi-chip rigs.

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

    # Model sensitivity (replaces the vacuous t(1)/t(1) weak-scaling line,
    # VERDICT round 2 item 7): the D=1 step with the overflow second round
    # force-taken, and a per-chip-load sweep of the sharded step. Runs
    # AFTER the BASELINE-metric lines (round-5 rehearsal: its cold compiles
    # at the 67/134 Mbase shapes burned the remaining budget and dropped
    # parse + e2e); streams per-point partials so a timeout harvests every
    # measured point.
    _log("shard-sensitivity...")
    ss = run_workload("shard-sensitivity",
                      f"r = harness.bench_shard_sensitivity("
                      f"total_bases={total_bases}, k={k}, repeats=3, "
                      f"progress=_partial)", tmo)
    if ss and "second_round_overhead" in ss:
        sweep = "; ".join(
            f"{row['bases'] >> 20} Mbase -> "
            + (f"{row['bases_per_s'] / 1e6:.0f} Mbase/s"
               if "bases_per_s" in row else f"error: {row['error'][:60]}")
            for row in ss["load_sweep"])
        _stream({
            "metric": "kmerize_sharded_second_round_overhead",
            "value": ss["second_round_overhead"],
            "unit": ("x the gated-off step when the overflow round is "
                     "force-taken at D=1 (skew-path upper bound); "
                     f"per-chip-load sweep: {sweep}"),
            "vs_baseline": 1.0,
        })

    # Fixture + run-length deltas (VERDICT round 4 missing item 1 "nobody
    # knows which way the headline moves"): the uniform-random step and
    # B-batch accumulator next to the coverage headline's terms, plus the
    # coverage acc term at B=8 so the log-B trend is on the record. Runs
    # LAST -- pure diagnostics, first to be dropped on a short budget.
    _log("fixture-delta...")
    fd = run_workload(
        "fixture-delta",
        "r = {'workload': 'fixture_delta'}\n"
        f"u = harness.bench_kmerize({total_bases}, k={k}, repeats=2, "
        f"fixture='uniform')\n"
        "r['uniform_step_s'] = u['seconds']\n"
        "r['uniform_bases_per_s'] = u['bases_per_s']\n"
        "_partial(r)\n"
        f"su = harness.bench_sustained(total_bases={total_bases}, k={k}, "
        f"batches={acc_b}, fixture='uniform')\n"
        "r['uniform_sustained_per_batch_s'] = su['per_batch_s']\n"
        "_partial(r)\n"
        f"s8 = harness.bench_sustained(total_bases={total_bases}, k={k}, "
        f"batches=8, fixture={fixture!r})\n"
        f"r['{fixture}_b8_sustained_per_batch_s'] = s8['per_batch_s']",
        tmo)
    if fd:
        _stream({
            "metric": "fixture_delta_diagnostics",
            "value": fd.get("uniform_bases_per_s", 0),
            "unit": ("uniform-fixture single-chip step bases/s, for the "
                     f"delta vs the {fixture} headline terms; fields: "
                     + ", ".join(sorted(set(fd) - {"workload", "device"}))),
            **{kk: vv for kk, vv in fd.items()
               if kk not in ("workload", "device")},
            "vs_baseline": fd.get("uniform_bases_per_s", 0) / 1e9,
        })

    signal.alarm(0)
    _final_block()
    _log(f"done in {time.monotonic() - _t0:.0f}s "
         f"(budget {_budget}s)")


if __name__ == "__main__":
    main()
