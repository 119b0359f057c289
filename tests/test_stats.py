"""Tests for the stats helpers and sparse rank/select."""

import math

import numpy as np

from zotpu import sparse, stats


def test_log_gamma_against_math():
    for x in [0.1, 0.5, 1.0, 2.0, 5.5, 30.0, 171.0]:
        assert abs(stats.log_gamma(x) - math.lgamma(x)) < 1e-9 * max(1, abs(math.lgamma(x)))


def test_log_fac_choose():
    assert abs(stats.log_fac(10) - math.log(math.factorial(10))) < 1e-9
    assert abs(stats.log_choose(10, 3) - math.log(120)) < 1e-9


def test_log_add_sum():
    a, b = math.log(3.0), math.log(4.0)
    assert abs(stats.log_add(a, b) - math.log(7.0)) < 1e-12
    assert stats.log_add(-np.inf, -np.inf) == -np.inf
    xs = np.log(np.array([1.0, 2.0, 3.0]))
    assert abs(stats.log_sum(xs) - math.log(6.0)) < 1e-12


def test_poisson():
    lam = 3.5
    pdf = [stats.poisson_pdf(lam, k) for k in range(50)]
    assert abs(sum(pdf) - 1.0) < 1e-9
    assert abs(stats.poisson_cdf(lam, 49) - 1.0) < 1e-9
    # pdf peak at floor(lam)
    assert max(range(50), key=lambda k: pdf[k]) == 3


def test_gamma_pdf_integrates():
    xs = np.linspace(0.001, 60, 200000)
    pdf = np.exp(stats.log_gamma_pdf(2.0, 0.5, xs))
    assert abs(np.trapezoid(pdf, xs) - 1.0) < 1e-3


def test_ks_distance():
    a = np.array([0.1, 0.5, 1.0])
    b = np.array([0.2, 0.4, 1.0])
    assert abs(stats.ks_distance(a, b) - 0.1) < 1e-15


def test_spectrum_mixture_fit():
    # error peak at 1, genomic peak at 20, ~1000 genomic k-mers
    h = np.zeros(64)
    h[1], h[2] = 500, 100
    for f in range(10, 31):
        h[f] = 1000 * math.exp(-0.5 * ((f - 20) / 4) ** 2)
    cut, lam_g, gsize = stats.spectrum_mixture_fit(h)
    assert 2 < cut < 10
    assert abs(lam_g - 20) < 0.5
    total_genomic = sum(h[f] * f for f in range(cut, 64))
    assert abs(gsize - total_genomic / lam_g) < 2


def test_spectrum_em_recovers_poisson_truth():
    # exact zero-truncated Poisson mixture -> EM must recover the
    # generating parameters (and KS ~ 0)
    lam_e, lam_g = 0.8, 25.0
    f = np.arange(1, 128, dtype=np.float64)
    h = np.zeros(128)
    h[1:] = (3e5 * stats.poisson_pdf(lam_e, f) / -np.expm1(-lam_e)
             + 5e4 * stats.poisson_pdf(lam_g, f)
             + 5e3 * stats.poisson_pdf(2 * lam_g, f))
    d = stats.spectrum_mixture_fit_detail(h, max_cov=128)
    assert abs(d["lam_e"] - lam_e) < 0.01
    assert abs(d["lam_g"] - lam_g) < 0.05
    assert abs(d["weights"][0] - 0.845) < 0.01    # 3e5 of 3.55e5
    assert d["ks"] < 1e-3
    # genomic instances = 5e4*25 + 5e3*50; / per-copy rate 25
    assert abs(d["genome_size_estimate"] - 60000) < 600


def test_sparse_rank_select_access():
    keys = np.array([2, 5, 9, 100], np.uint64)
    s = sparse.SparseSet(keys)
    assert len(s) == 4
    assert s.rank(5) == 1 and s.rank(6) == 2 and s.rank(0) == 0
    assert s.select(2) == 9
    assert list(s.access(np.array([2, 3, 100], np.uint64))) == [True, False, True]
    assert s.count_range(3, 100) == 2
    empty = sparse.SparseSet(np.empty(0, np.uint64))
    assert list(empty.access(np.array([1], np.uint64))) == [False]


def test_metrics_logger_and_timed(tmp_path):
    import json

    from zotpu import metrics
    path = str(tmp_path / "m.jsonl")
    log = metrics.MetricsLogger(path, host_id=3)
    with metrics.timed(log, "stage", items=5):
        pass
    log.log("done", total=1)
    log.close()
    lines = [json.loads(l) for l in open(path)]
    assert lines[0]["event"] == "stage" and lines[0]["items"] == 5
    assert lines[0]["seconds"] >= 0 and lines[0]["host"] == 3
    assert lines[1]["event"] == "done"


def test_profiled_trace_writes(tmp_path):
    import os

    import jax.numpy as jnp

    from zotpu import metrics
    d = str(tmp_path / "trace")
    with metrics.profiled(d):
        jnp.arange(4).sum().block_until_ready()
    assert os.path.isdir(d) and any(os.scandir(d))


def test_bench_cli_small(capsys):
    import json as _json

    from types import SimpleNamespace

    from zotpu.bench import harness
    args = SimpleNamespace(workload="all", bases=1 << 16, k=15, repeats=1,
                           setops_n=1 << 12, scan_reads=1 << 8,
                           scan_panel=1 << 10)
    assert harness.run(args) == 0
    lines = capsys.readouterr().out.strip().splitlines()
    recs = [_json.loads(l) for l in lines]
    names = {r["workload"] for r in recs}
    assert {"kmerize", "setops_merge", "kmerize_scaling",
            "kmerize_shard_model", "kmerize_shard_sensitivity",
            "kmerize_sustained", "host_parse_gz", "kmerize_e2e",
            "scan_shard_model", "setops_shard_model"} <= names
    sens = next(r for r in recs
                if r["workload"] == "kmerize_shard_sensitivity")
    assert sens["second_round_overhead"] > 0
    assert len(sens["load_sweep"]) == 5      # round 5: 4x 2x 1x 1/2 1/4
    e2e = next(r for r in recs if r["workload"] == "kmerize_e2e")
    assert e2e["bases"] > 0 and e2e["unique"] > 0
