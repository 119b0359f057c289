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
                "c:g.10_12invAA",
                # positions are 1-based: 0 would wrap start to -1 and
                # slice from the END of the reference (round 4)
                "c:g.0A>G", "c:g.0_5del"):
        with pytest.raises(ValueError):
            V.parse_variant(bad)


def test_load_transcripts_empty_strand_rejected(tmp_path):
    # '' in "+-" is True: a double-tab strand field used to load a
    # transcript whose coordinate math and allele flipping silently
    # disagreed (round 4)
    p = tmp_path / "empty_strand.tsv"
    p.write_text("TXA\tchr1\t\t100\t260\t120\t240\t2\t100,200,\t160,260,\n")
    with pytest.raises(ValueError, match="bad strand"):
        V.load_transcripts(str(p))


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


# --- transcript (c./n.) coordinates ------------------------------------------

TXP = ("TXP", "chr1", "+", ((100, 160), (200, 260), (300, 360)), 130, 320)
TXM = ("TXM", "chr1", "-", ((100, 160), (200, 260)), 120, 240)


@pytest.fixture
def transcripts(tmp_path):
    """refGene-style table: TXP 3-exon '+' CDS [130,320); TXM 2-exon '-'
    CDS [120,240); TXN noncoding (cdsStart == cdsEnd)."""
    rows = [
        # UCSC form WITH the leading bin column
        "9\tTXP\tchr1\t+\t100\t360\t130\t320\t3\t100,200,300,\t160,260,360,",
        # plain form without it
        "TXM\tchr1\t-\t100\t260\t120\t240\t2\t100,200,\t160,260,",
        "TXN\tchr1\t+\t100\t260\t100\t100\t2\t100,200,\t160,260,",
        "# comment line",
    ]
    p = tmp_path / "tx.tsv"
    p.write_text("\n".join(rows) + "\n")
    return str(p)


def test_load_transcripts(transcripts):
    txs = V.load_transcripts(transcripts)
    assert set(txs) == {"TXP", "TXM", "TXN"}
    assert (txs["TXP"].strand, txs["TXP"].exons, txs["TXP"].cds_start,
            txs["TXP"].cds_end) == ("+", ((100, 160), (200, 260),
                                          (300, 360)), 130, 320)
    assert txs["TXM"].strand == "-"
    assert txs["TXN"].cds_start is None  # noncoding
    assert txs["TXP"].spliced_len() == 180


def test_load_transcripts_duplicate_name_rejected(tmp_path):
    # refGene dumps repeat accessions at multiple loci; last-row-wins would
    # resolve c. variants against the wrong locus (ADVICE round 2)
    p = tmp_path / "dup.tsv"
    p.write_text(
        "TXA\tchr1\t+\t100\t260\t120\t240\t2\t100,200,\t160,260,\n"
        "TXA\tchr2\t+\t500\t660\t520\t640\t2\t500,600,\t560,660,\n")
    with pytest.raises(ValueError, match="duplicate transcript"):
        V.load_transcripts(str(p))


def _g(spec, transcripts):
    v = V.parse_tx_variant(spec, V.load_transcripts(transcripts))
    return v.start, v.end, v.ref, v.alt


def test_tx_coordinate_mapping_plus(transcripts):
    # c.1 = first CDS base = genomic 130 (0-based)
    assert _g("TXP:c.1A>G", transcripts)[:2] == (130, 131)
    # c.31 crosses into exon 2 (30 CDS bases in exon 1)
    assert _g("TXP:c.31A>G", transcripts)[:2] == (200, 201)
    # 5' UTR: c.-5 is 5 bases before the CDS in the spliced transcript
    assert _g("TXP:c.-5A>G", transcripts)[:2] == (125, 126)
    # 3' UTR: *1 is the first base after the CDS (genomic 320)
    assert _g("TXP:c.*1del", transcripts)[:2] == (320, 321)
    # intron offsets off exon-1/exon-2 boundaries
    assert _g("TXP:c.30+2A>G", transcripts)[:2] == (161, 162)
    assert _g("TXP:c.31-2A>G", transcripts)[:2] == (198, 199)
    # deepest valid offsets: the 40-base intron's last/first base
    assert _g("TXP:c.30+40A>G", transcripts)[:2] == (199, 200)
    assert _g("TXP:c.31-40A>G", transcripts)[:2] == (160, 161)


def test_tx_coordinate_mapping_minus(transcripts):
    # transcript runs genomically backwards: c.1 = genomic 239
    assert _g("TXM:c.1A>G", transcripts)[:2] == (239, 240)
    assert _g("TXM:c.2A>G", transcripts)[:2] == (238, 239)
    assert _g("TXM:c.-1A>G", transcripts)[:2] == (240, 241)
    assert _g("TXM:c.*1del", transcripts)[:2] == (119, 120)
    # span in transcript order maps to the reversed genomic interval
    assert _g("TXM:c.2_4del", transcripts)[:2] == (236, 239)
    # intronic: c.60 is the last base of transcript exon 1 (genomic 200);
    # +2 walks genomically DOWN on '-'
    assert _g("TXM:c.40+2A>G", transcripts)[:2] == (198, 199)


def test_tx_minus_strand_alleles_revcomp(transcripts):
    txs = V.load_transcripts(transcripts)
    v = V.parse_tx_variant("TXM:c.2A>G", txs)
    assert (v.ref, v.alt) == ("T", "C")  # transcript A>G = genomic T>C
    vi = V.parse_tx_variant("TXM:c.2_3insAAG", txs)
    assert (vi.start, vi.end, vi.alt) == (238, 238, "CTT")
    vd = V.parse_tx_variant("TXM:c.2_4delinsAAG", txs)
    assert (vd.start, vd.end, vd.alt) == (236, 239, "CTT")


def test_tx_probes_match_equivalent_genomic(ref, transcripts):
    path, seq = ref
    refs = V.load_reference(path)
    txs = V.load_transcripts(transcripts)
    def other(b):
        return "G" if b != "G" else "T"

    cases = [
        # same edit described in c. and in g. coordinates, both strands
        (f"TXP:c.31{seq[200]}>{other(seq[200])}",
         f"chr1:g.201{seq[200]}>{other(seq[200])}"),
        ("TXP:c.1_3del", "chr1:g.131_133del"),
        ("TXP:c.*1_*3dup", "chr1:g.321_323dup"),
        (f"TXP:c.30+2{seq[161]}>{other(seq[161])}",
         f"chr1:g.162{seq[161]}>{other(seq[161])}"),
        ("TXM:c.2_4del", "chr1:g.237_239del"),
        ("TXM:c.1_6inv", "chr1:g.235_240inv"),
    ]
    for tx_spec, g_spec in cases:
        vt = V.resolve_variant(V.parse_tx_variant(tx_spec, txs), refs)
        vg = V.resolve_variant(V.parse_variant(g_spec), refs)
        assert (vt.start, vt.end, vt.ref, vt.alt) == (
            vg.start, vg.end, vg.ref, vg.alt), (tx_spec, g_spec)
        pt = V.probe_kmers(vt, refs, 15)
        pg = V.probe_kmers(vg, refs, 15)
        assert np.array_equal(pt[0], pg[0]) and np.array_equal(pt[1], pg[1])


def test_tx_parse_errors(transcripts):
    txs = V.load_transcripts(transcripts)
    for bad in (
        "NOPE:c.1A>G",          # unknown transcript
        "TXP:c.0A>G",           # c.0 does not exist
        "TXP:c.30_31del",       # span crosses the intron (different exons)
        "TXP:c.29+2A>G",        # offset anchor not on the exon boundary
        "TXP:c.30+200A>G",      # offset walks out of the transcript span
        "TXP:c.30+60A>G",       # offset lands inside the next exon
        "TXP:c.30+110A>G",      # offset overshoots intron 1 (40 bases) into
                                # intron 2 (ADVICE round 2: was silently
                                # accepted at the wrong genomic coordinate)
        "TXP:c.31-45A>G",       # -M overshoots intron 1 going 5'
        "TXM:c.40+45A>G",       # '-' strand: +M overshoots the intron
        "TXP:c.500A>G",         # past the spliced transcript
        "TXP:c.-40A>G",         # before the spliced transcript
        "TXN:c.1A>G",           # noncoding model has no c. coordinates
        "TXM:c.4_2del",         # end before start in transcript order
        "TXP:n.0del",           # n. is 1-based
        "TXP:c.*0del",          # *N starts at *1
    ):
        with pytest.raises(ValueError):
            V.parse_tx_variant(bad, txs)
    # n. works on both coding and noncoding models: n.1 = transcript start
    assert V.parse_tx_variant("TXN:n.1_3del", txs).start == 100
    assert V.parse_tx_variant("TXP:n.1_3del", txs).start == 100
    # parse_any_variant without a table rejects c. cleanly
    with pytest.raises(ValueError):
        V.parse_any_variant("TXP:c.1A>G", None)


def test_tx_cli_roundtrip(tmp_path, ref, transcripts, capsys):
    """probes/spikein/evidence through the CLI with a c. spec on the '-'
    strand transcript."""
    path, seq = ref
    # TXM:c.2 -> genomic 0-based 238; transcript allele = rc(genomic)
    t_ref = {"A": "T", "C": "G", "G": "C", "T": "A"}[seq[238]]
    t_alt = "A" if t_ref != "A" else "C"
    spec = f"TXM:c.2{t_ref}>{t_alt}"
    panel = tmp_path / "panel.zkf"
    assert run_cli("probes", "-k", 15, path, panel, spec,
                   "--transcripts", transcripts) == 0
    capsys.readouterr()
    fq = tmp_path / "alt.fastq"
    assert run_cli("spikein", path, fq, spec, "--vaf", "0.5",
                   "--coverage", "40", "--seed", "3",
                   "--transcripts", transcripts) == 0
    capsys.readouterr()
    assert run_cli("evidence", panel, fq, "--host") == 0
    row = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert row["variant"] == spec
    assert row["alt"]["probes_hit"] == row["alt"]["probes"] > 0
    assert 0.2 < row["vaf_estimate"] < 0.8


def test_tx_spliced_genomic_roundtrip_property():
    """Hypothesis: genomic<->spliced mapping is a bijection on exonic bases
    for random exon structures on both strands."""
    from hypothesis import given, settings, strategies as st

    @st.composite
    def tx(draw):
        n_ex = draw(st.integers(1, 5))
        cuts = sorted(draw(st.lists(
            st.integers(0, 500), min_size=2 * n_ex, max_size=2 * n_ex,
            unique=True)))
        exons = tuple((cuts[2 * i], cuts[2 * i + 1]) for i in range(n_ex))
        strand = draw(st.sampled_from("+-"))
        return V.Transcript("T", "chr1", strand, exons, None, None)

    @given(tx(), st.data())
    @settings(max_examples=60, deadline=None)
    def check(t, data):
        L = t.spliced_len()
        i = data.draw(st.integers(0, L - 1))
        g = V._genomic_of_spliced(t, i)
        assert any(s <= g < e for s, e in t.exons)
        assert V._spliced_index(t, g) == i
        # transcript order: spliced i+1 is the next exonic base in strand
        # direction
        if i + 1 < L:
            g2 = V._genomic_of_spliced(t, i + 1)
            assert (g2 > g) == (t.strand == "+")

    check()


def test_evidence_out_reads_min_hits_zero_streams_all(tmp_path, ref, capsys):
    """ADVICE round 4: --min-hits 0 qualifies every read for every variant,
    so the writer streams ONE parse pass into all variant files instead of
    buffering the sample in RAM; each file must hold the whole sample."""
    path, seq = ref
    base = seq[249]
    other = "G" if base != "G" else "T"
    spec = f"chr1:g.250{base}>{other}"
    panel = tmp_path / "panel.zkf"
    assert run_cli("probes", "-k", 15, path, panel, spec) == 0
    fq = tmp_path / "alt.fastq"
    assert run_cli("spikein", path, fq, spec, "--vaf", "0.5",
                   "--coverage", "20", "--seed", "5") == 0
    capsys.readouterr()
    n_reads = sum(1 for ln in open(fq) if ln.startswith("@"))
    outdir = tmp_path / "allreads"
    assert run_cli("evidence", panel, fq, "--host", "--min-hits", 0,
                   "--out-reads", outdir) == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["supporting_reads"][spec] == n_reads
    files = list(outdir.iterdir())
    assert len(files) == 1
    assert len(files[0].read_text().strip().splitlines()) == 4 * n_reads
