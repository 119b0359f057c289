"""Driver benchmark: prints ONE JSON line with the headline metric.

Headline: kmerize throughput (k=25) in bases/s on the current device
(BASELINE north-star target: 1e9 bases/s/host => vs_baseline is the ratio to
that target). Extra metrics go to stderr so stdout stays a single JSON line.
"""

from __future__ import annotations

import json
import os
import sys



def main():
    import jax

    from zotpu import runtime
    runtime.setup()
    from zotpu.bench import harness

    total_bases = int(os.environ.get("ZOTPU_BENCH_BASES", 1 << 25))
    k = int(os.environ.get("ZOTPU_BENCH_K", 25))
    print(f"bench: kmerize {total_bases} bases k={k} on {jax.devices()[0]}",
          file=sys.stderr, flush=True)
    r = harness.bench_kmerize(total_bases, k=k, read_len=256, repeats=3)
    print(f"bench: kmerize done in {r['seconds']:.3f}s; setops...",
          file=sys.stderr, flush=True)
    s = harness.bench_setops(n=1 << 21, repeats=3)
    print(json.dumps({"extra": s, "device": str(jax.devices()[0])}),
          file=sys.stderr)
    print(json.dumps({
        "metric": "kmerize_bases_per_s",
        "value": r["bases_per_s"],
        "unit": "bases/s",
        "vs_baseline": r["bases_per_s"] / 1e9,
    }))


if __name__ == "__main__":
    main()
