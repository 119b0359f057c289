"""Clinical/variant family: parsing, probes, evidence, spike-in roundtrip."""

import json

import numpy as np
import pytest

from zotpu import variants as V
from zotpu.io import container
from zotpu.reference_impl import golden as G
from tests.test_cli import run_cli


@pytest.fixture
def ref(tmp_path, rng):
    seq = "".join(rng.choice(list("ACGT"), size=600))
    p = tmp_path / "ref.fa"
    with open(p, "w") as f:
        f.write(">chr1\n")
        for i in range(0, len(seq), 60):
            f.write(seq[i:i + 60] + "\n")
    return str(p), seq


def test_parse_variants():
    v = V.parse_variant("chr1:g.123A>G")
    assert (v.seq_name, v.start, v.end, v.ref, v.alt) == ("chr1", 122, 123,
                                                          "A", "G")
    v = V.parse_variant("chrX:g.10_12del")
    assert (v.start, v.end, v.alt) == (9, 12, "")
    v = V.parse_variant("c:g.10_11insTTG")
    assert (v.start, v.end, v.ref, v.alt) == (10, 10, "", "TTG")
    v = V.parse_variant("c:g.10_12delinsGG")
    assert (v.start, v.end, v.alt) == (9, 12, "GG")
    v = V.parse_variant("c:g.10_12inv")
    assert (v.start, v.end, v.alt, v.op) == (9, 12, None, "inv")
    for bad in ("nonsense", "c:g.5_3del", "c:g.10_15insAA", "c:g.10insA",
                "c:g.5_6A>G", "c:g.10_12delAA", "c:g.3_4delins",
                "c:g.10_12invAA"):
        with pytest.raises(ValueError):
            V.parse_variant(bad)


def test_resolve_checks_reference(ref):
    path, seq = ref
    refs = V.load_reference(path)
    base = seq[99]
    other = "A" if base != "A" else "C"
    v = V.resolve_variant(V.parse_variant(f"chr1:g.100{base}>{other}"), refs)
    assert v.ref == base and v.alt == other
    with pytest.raises(ValueError):  # wrong ref allele
        V.resolve_variant(V.parse_variant(f"chr1:g.100{other}>{base}"), refs)
    with pytest.raises(ValueError):  # unknown sequence
        V.resolve_variant(V.parse_variant(f"chr9:g.100{base}>{other}"), refs)
    with pytest.raises(ValueError):  # beyond end
        V.resolve_variant(V.parse_variant("chr1:g.100000A>G"), refs)
    dup = V.resolve_variant(V.parse_variant("chr1:g.100_102dup"), refs)
    assert dup.alt == seq[99:102] * 2
    inv = V.resolve_variant(V.parse_variant("chr1:g.100_120inv"), refs)
    span = seq[99:120].upper()
    assert inv.ref == span
    assert inv.alt == span.translate(str.maketrans("ACGT", "TGCA"))[::-1]
    assert len(V.apply_variant(seq, inv)) == len(seq)


def test_inversion_probes_are_junction_kmers(ref):
    # An inverted span's interior k-mers CANONICALIZE to the reference's own
    # (revcomp is identity under min(fwd, rc)), so the discriminating alt
    # probes must come from the breakpoint junctions only -- and exist.
    path, seq = ref
    refs = V.load_reference(path)
    k = 15
    v = V.resolve_variant(V.parse_variant("chr1:g.200_260inv"), refs)
    ref_p, alt_p = V.probe_kmers(v, refs, k)
    assert len(alt_p) >= 1
    alt_genome = V.apply_variant(seq, v)
    alt_all = np.unique(G.kmerize_seq(k, alt_genome))
    ref_all = np.unique(G.kmerize_seq(k, seq))
    assert np.all(np.isin(alt_p, alt_all))
    assert not np.any(np.isin(alt_p, ref_all))
    # interior k-mers (fully inside the inverted span, away from junctions)
    # are shared with the reference: check one
    interior = np.unique(G.kmerize_seq(k, seq[220:240]))
    assert np.all(np.isin(interior, alt_all))


def test_probe_kmers_cover_the_edit(ref):
    path, seq = ref
    refs = V.load_reference(path)
    k = 15
    base = seq[299]
    other = "A" if base != "A" else "C"
    v = V.resolve_variant(V.parse_variant(f"chr1:g.300{base}>{other}"), refs)
    ref_p, alt_p = V.probe_kmers(v, refs, k)
    # ref probes = exactly the k-mers of the (2k-1)-window around the SNV
    want_ref = np.unique(G.kmerize_seq(k, seq[299 - k + 1:299 + k]))
    assert np.array_equal(ref_p, want_ref)
    # alt probes all occur in the edited genome, none in the ref locus
    alt_genome = V.apply_variant(seq, v)
    alt_all = np.unique(G.kmerize_seq(k, alt_genome))
    assert np.all(np.isin(alt_p, alt_all))
    assert not np.any(np.isin(alt_p, ref_p))
    assert len(alt_p) >= 1


def test_spikein_evidence_roundtrip(tmp_path, ref, capsys):
    path, seq = ref
    base = seq[249]
    other = "G" if base != "G" else "T"
    spec = f"chr1:g.250{base}>{other}"
    panel = tmp_path / "panel.zkf"
    assert run_cli("probes", "-k", 15, path, panel, spec) == 0
    capsys.readouterr()

    # alt sample at vaf 0.5
    fq = tmp_path / "alt.fastq"
    assert run_cli("spikein", path, fq, spec, "--vaf", "0.5",
                   "--coverage", "40", "--seed", "3") == 0
    capsys.readouterr()
    assert run_cli("evidence", panel, fq, "--host") == 0
    row = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert row["variant"] == spec
    assert row["alt"]["probes_hit"] == row["alt"]["probes"]
    assert row["ref"]["probes_hit"] == row["ref"]["probes"]
    assert 0.2 < row["vaf_estimate"] < 0.8

    # pure reference sample: zero alt evidence
    fq0 = tmp_path / "ref_only.fastq"
    assert run_cli("spikein", path, fq0, spec, "--vaf", "0.0",
                   "--coverage", "40", "--seed", "4") == 0
    capsys.readouterr()
    assert run_cli("evidence", panel, fq0, "--host") == 0
    row0 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert row0["alt"]["total"] == 0
    assert row0["vaf_estimate"] == 0.0
    assert row0["ref"]["support"] > 0


def test_evidence_device_matches_host(tmp_path, ref, capsys):
    path, seq = ref
    spec = f"chr1:g.150_152del"
    panel = tmp_path / "p.zkf"
    assert run_cli("probes", "-k", 13, path, panel, spec) == 0
    fq = tmp_path / "s.fastq"
    assert run_cli("spikein", path, fq, spec, "--vaf", "0.7",
                   "--coverage", "25", "--seed", "9",
                   "--error-rate", "0.002") == 0
    capsys.readouterr()
    assert run_cli("evidence", panel, fq, "--host",
                   "--out-reads", tmp_path / "h") == 0
    host = capsys.readouterr().out
    assert run_cli("evidence", panel, fq, "--batch-reads", 32,
                   "--max-len", 128, "--out-reads", tmp_path / "d") == 0
    dev = capsys.readouterr().out
    assert host.replace("/h\"", "/d\"") == dev.replace("/d\"", "/d\"")
    hf = sorted(p.name for p in (tmp_path / "h").iterdir())
    df = sorted(p.name for p in (tmp_path / "d").iterdir())
    assert hf == df
    for name in hf:
        assert ((tmp_path / "h" / name).read_text()
                == (tmp_path / "d" / name).read_text())


def test_inversion_spikein_evidence_roundtrip(tmp_path, ref, capsys):
    # Inversions only discriminate at the breakpoint junctions
    # (test_inversion_probes_are_junction_kmers); the full
    # probes -> spikein -> evidence loop must still see them.
    path, seq = ref
    spec = "chr1:g.300_360inv"
    panel = tmp_path / "panel.zkf"
    assert run_cli("probes", "-k", 15, path, panel, spec) == 0
    capsys.readouterr()
    fq = tmp_path / "inv.fastq"
    assert run_cli("spikein", path, fq, spec, "--vaf", "0.5",
                   "--coverage", "50", "--seed", "7") == 0
    capsys.readouterr()
    assert run_cli("evidence", panel, fq, "--host") == 0
    row = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert row["variant"] == spec
    assert row["alt"]["support"] > 0
    assert 0.15 < row["vaf_estimate"] < 0.85


def test_evidence_out_reads_pulldown(tmp_path, ref, capsys):
    path, seq = ref
    base = seq[249]
    other = "G" if base != "G" else "T"
    spec = f"chr1:g.250{base}>{other}"
    panel = tmp_path / "panel.zkf"
    assert run_cli("probes", "-k", 15, path, panel, spec) == 0
    fq = tmp_path / "alt.fastq"
    assert run_cli("spikein", path, fq, spec, "--vaf", "0.5",
                   "--coverage", "40", "--seed", "3") == 0
    capsys.readouterr()
    outdir = tmp_path / "support"
    assert run_cli("evidence", panel, fq, "--host",
                   "--out-reads", outdir) == 0
    lines = capsys.readouterr().out.strip().splitlines()
    summary = json.loads(lines[-1])
    n_sup = summary["supporting_reads"][spec]
    assert n_sup > 0
    files = list(outdir.iterdir())
    assert len(files) == 1 and files[0].suffix == ".fastq"
    recs = files[0].read_text().strip().splitlines()
    assert len(recs) == 4 * n_sup
    # every pulled read must actually contain an alt-probe k-mer
    hdr = container.read(str(panel))
    alt = np.asarray([int(x, 16)
                      for x in hdr.meta["variants"][0]["alt_probes"]],
                     np.uint64)
    for s in recs[1::4]:
        assert np.isin(np.unique(G.kmerize_seq(15, s)), alt).any()
    # pure-reference sample pulls nothing
    fq0 = tmp_path / "ref0.fastq"
    assert run_cli("spikein", path, fq0, spec, "--vaf", "0.0",
                   "--coverage", "40", "--seed", "4") == 0
    out0 = tmp_path / "support0"
    assert run_cli("evidence", panel, fq0, "--host",
                   "--out-reads", out0) == 0
    s0 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert s0["supporting_reads"][spec] == 0


def test_variant_specs_from_file(tmp_path, ref, capsys):
    path, seq = ref
    b1 = seq[49]
    s1 = f"chr1:g.50{b1}>{'A' if b1 != 'A' else 'C'}"
    s2 = "chr1:g.400_402del"
    lst = tmp_path / "vars.txt"
    lst.write_text(f"# panel\n{s1}\n\n{s2}  # trailing comment\n")
    p_file = tmp_path / "pf.zkf"
    p_argv = tmp_path / "pa.zkf"
    assert run_cli("probes", "-k", 13, path, p_file, f"@{lst}") == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["variants"] == 2
    assert run_cli("probes", "-k", 13, path, p_argv, s1, s2) == 0
    capsys.readouterr()
    a, b = container.read(str(p_file)), container.read(str(p_argv))
    np.testing.assert_array_equal(a.keys, b.keys)
    assert a.meta["variants"] == b.meta["variants"]


def test_probes_invisible_edit_errors(tmp_path, capsys):
    p = tmp_path / "r.fa"
    with open(p, "w") as f:  # duplication inside a homopolymer: no new k-mers
        f.write(">c\n" + "A" * 200 + "\n")
    assert run_cli("probes", "-k", 9, p, tmp_path / "x.zkf",
                   "c:g.50_52dup") == 1
    assert "invisible" in capsys.readouterr().err
