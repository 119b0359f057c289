"""The five BASELINE.json workload configs, each as an explicit end-to-end
test against the golden reference (SURVEY.md section 0: BASELINE is the
contract; these tests are the contract's executable form).

1. kmerize k=25 on E. coli-like FASTQ -> sorted hashed k-mer set + counts
   (CPU-runnable ref = reference_impl/golden.py)
2. merge per-batch sorted k-mer files into one global sorted count array
3. pairwise set ops between two sample k-mer sets
4. k-mer frequency spectrum with error-peak cutoff over a full run
5. multi-sample pulldown: 16 read sets vs a reference panel, hash-sharded
"""

import json

import numpy as np
import pytest

from zotpu import cli
from zotpu import semantics as S
from zotpu.io import container
from zotpu.reference_impl import golden as G
from tests.test_cli import run_cli, write_fastq


@pytest.fixture(scope="module")
def ecoli_like(tmp_path_factory):
    """A 50kb genome sampled at ~20x with 1% error, written as FASTQ."""
    rng = np.random.default_rng(2026)
    genome = "".join(rng.choice(list("ACGT"), size=50_000))
    reads = []
    for _ in range(10_000):
        off = rng.integers(0, len(genome) - 100)
        r = list(genome[off:off + 100])
        for pos in np.nonzero(rng.random(100) < 0.01)[0]:
            r[pos] = rng.choice(list("ACGTN"))
        reads.append("".join(r))
    d = tmp_path_factory.mktemp("baseline")
    fq = d / "reads.fastq"
    write_fastq(str(fq), reads)
    return d, str(fq), reads, genome


def test_config1_kmerize(ecoli_like):
    d, fq, reads, genome = ecoli_like
    out = d / "c1.zkf"
    assert run_cli("kmerize", "-k", 25, "--batch-reads", 2048,
                   "--max-len", 128, out, fq) == 0
    ks = container.read(str(out))
    want_k, want_c = G.kmerize(25, reads)  # the CPU-runnable reference
    assert np.array_equal(ks.keys, want_k)
    assert np.array_equal(ks.counts, want_c)


def test_config2_merge_batch_files(ecoli_like, tmp_path):
    d, fq, reads, genome = ecoli_like
    # per-batch sorted k-mer files (the external-sort spill structure)
    parts = [reads[i::4] for i in range(4)]
    paths = []
    for i, part in enumerate(parts):
        keys, counts = G.kmerize(25, part)
        p = tmp_path / f"batch{i}.zkf"
        container.write(str(p), container.KmerSet(k=25, keys=keys,
                                                  counts=counts))
        paths.append(p)
    out = tmp_path / "global.zkf"
    assert run_cli("merge", out, *paths) == 0
    ks = container.read(str(out))
    want_k, want_c = G.kmerize(25, reads)
    assert np.array_equal(ks.keys, want_k)
    assert np.array_equal(ks.counts, want_c)


def test_config3_pairwise_set_ops(ecoli_like, tmp_path):
    d, fq, reads, genome = ecoli_like
    a = G.kmerize(21, reads[:5000])
    b = G.kmerize(21, reads[5000:])
    pa, pb = tmp_path / "a.zkf", tmp_path / "b.zkf"
    container.write(str(pa), container.KmerSet(k=21, keys=a[0], counts=a[1]))
    container.write(str(pb), container.KmerSet(k=21, keys=b[0], counts=b[1]))
    for op, gold in (("intersect", G.intersect), ("union", G.union),
                     ("diff", G.difference)):
        out = tmp_path / f"{op}.zkf"
        assert run_cli(op, out, pa, pb) == 0
        ks = container.read(str(out))
        want_k, want_c = gold(a, b)
        assert np.array_equal(ks.keys, want_k)
        assert np.array_equal(ks.counts, want_c)


def test_config4_spectrum_cutoff_full_run(ecoli_like, capsys):
    d, fq, reads, genome = ecoli_like
    out = d / "c4.zkf"
    assert run_cli("kmerize", "-k", 25, "--batch-reads", 2048,
                   "--max-len", 128, out, fq) == 0
    capsys.readouterr()
    assert run_cli("hist", out, "--cutoff") == 0
    lines = capsys.readouterr().out.strip().splitlines()
    fit = json.loads(lines[-1])
    # ~20x coverage genome with 1% error: error peak at 1, coverage peak well
    # above the cutoff; the EM mixture fit lands within 0.1% of the true
    # genome size on this fixture (49,971 / 50,000) -- hold it to 10%
    assert 1 < fit["cutoff"] < fit["coverage_peak"]
    assert 45_000 < fit["genome_size_estimate"] < 55_000
    # filtering at the cutoff keeps mostly-genomic k-mers
    solid = d / "solid.zkf"
    assert run_cli("filter", solid, out, "--auto") == 0
    ks = container.read(str(solid))
    genomic = G.kmerize(25, [genome])[0]
    frac_genomic = np.isin(ks.keys, genomic).mean()
    assert frac_genomic > 0.95


def test_config5_sixteen_sample_pulldown(ecoli_like, tmp_path, capsys):
    d, fq, reads, genome = ecoli_like
    panel_k, _ = G.kmerize(25, [genome[:5000]])
    pp = tmp_path / "panel.zkf"
    container.write(str(pp), container.KmerSet(k=25, keys=panel_k))
    rng = np.random.default_rng(7)
    samples = []
    for i in range(16):
        p = tmp_path / f"s{i}.fastq"
        write_fastq(str(p), reads[i * 200:(i + 1) * 200])
        samples.append(p)
    assert run_cli("scan", pp, *samples, "--batch-reads", 256,
                   "--max-len", 128) == 0
    out_lines = capsys.readouterr().out.strip().splitlines()
    assert len(out_lines) == 16
    for i, line in enumerate(out_lines):
        rec = json.loads(line)
        want = G.scan_panel(25, panel_k, reads[i * 200:(i + 1) * 200])
        assert rec["total_hits"] == int(want.sum())
        assert rec["reads_with_hits"] == int((want > 0).sum())
    # the hash-sharded multi-chip variant of this config is covered by
    # tests/test_dist.py::test_pulldown_sixteen_samples
