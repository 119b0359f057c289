"""Clinical/variant toolkit: HGVS-style probes, evidence, spike-in.

Reference analog: zotmer's clinical-genomics command family (SURVEY.md
section 2a "HGVS/clinical tools": generate variant k-mer probes from HGVS
descriptions, find evidence for variants in raw reads, spike simulated
variant reads). The reference mount was empty, so the exact HGVS dialect
could not be verified; this module implements the standard genomic-HGVS
core -- substitution, deletion, insertion, duplication, delins, inversion --
against a
user-supplied reference FASTA, which covers the documented capability
(probe generation -> read evidence -> simulation) end to end.

Supported variant syntax (g. coordinates, 1-based, on a named reference
sequence):

    SEQ:g.123A>G            substitution
    SEQ:g.123_125del        deletion (also g.123del)
    SEQ:g.123_124insTTG     insertion between 123 and 124
    SEQ:g.123_125dup        duplication (also g.123dup)
    SEQ:g.123_125delinsGGC  deletion-insertion
    SEQ:g.123_125inv        inversion (span replaced by its reverse complement)

Probe model: the k-mers whose windows OVERLAP the edited bases -- k-1 bases
of flanking context on each side -- computed on the reference allele (ref
probes) and on the edited sequence (alt probes); alt probes that also occur
among the locus's ref probes are dropped (they carry no signal). Evidence =
per-probe counts in the sample's k-mer set (device kmerize; panels are tiny
so per-variant attribution happens on the host).
"""

from __future__ import annotations

import dataclasses
import re

import numpy as np

from zotpu import semantics as S
from zotpu.reference_impl import golden as G

_VAR_RE = re.compile(
    r"^(?P<seq>[^:]+):g\.(?P<a>\d+)(?:_(?P<b>\d+))?"
    r"(?:(?P<sub>[ACGTacgt])>(?P<alt>[ACGTacgt])"
    r"|(?P<op>del|dup|ins|delins|inv)(?P<arg>[ACGTacgt]*))$")

_RC = str.maketrans("ACGT", "TGCA")


@dataclasses.dataclass(frozen=True)
class Variant:
    spec: str          # the original description (output key)
    seq_name: str
    start: int         # 0-based inclusive start of the affected ref span
    end: int           # 0-based exclusive end of the affected ref span
    ref: str           # replaced reference bases ("" for pure insertion)
    alt: str           # replacement bases ("" for pure deletion); None until
                       # resolve for ops derived from the ref span (dup, inv)
    op: str = ""       # which ref-span-derived op fills alt ("dup" | "inv")


def parse_variant(spec: str) -> Variant:
    """Parse one HGVS-style genomic variant description."""
    m = _VAR_RE.match(spec.strip())
    if not m:
        raise ValueError(
            f"cannot parse variant {spec!r} (expected SEQ:g.<pos><REF>><ALT>,"
            f" SEQ:g.<a>_<b>del|dup|inv|delins<SEQ>, or SEQ:g.<a>_<b>ins<SEQ>)")
    seq_name = m.group("seq")
    a = int(m.group("a"))
    b = int(m.group("b")) if m.group("b") else a
    if b < a:
        raise ValueError(f"{spec!r}: end {b} before start {a}")
    if m.group("sub"):
        if m.group("b"):
            raise ValueError(f"{spec!r}: substitutions take one position")
        return Variant(spec, seq_name, a - 1, a, m.group("sub").upper(),
                       m.group("alt").upper())
    op = m.group("op")
    arg = (m.group("arg") or "").upper()
    if op == "ins":
        if not m.group("b") or b != a + 1:
            raise ValueError(
                f"{spec!r}: insertion positions must be adjacent (a_a+1)")
        if not arg:
            raise ValueError(f"{spec!r}: ins needs the inserted sequence")
        return Variant(spec, seq_name, a, a, "", arg)  # between a and a+1
    if op == "del":
        if arg:
            raise ValueError(f"{spec!r}: del takes no sequence argument")
        return Variant(spec, seq_name, a - 1, b, "", "")
    if op in ("dup", "inv"):
        if arg:
            raise ValueError(f"{spec!r}: {op} takes no sequence argument")
        return Variant(spec, seq_name, a - 1, b, "", None, op=op)  # alt at resolve
    if op == "delins":
        if not arg:
            raise ValueError(f"{spec!r}: delins needs the new sequence")
        return Variant(spec, seq_name, a - 1, b, "", arg)
    raise AssertionError(op)


def resolve_variant(v: Variant, ref_seqs: dict[str, str]) -> Variant:
    """Validate against the reference and fill ref/alt alleles."""
    if v.seq_name not in ref_seqs:
        raise ValueError(f"{v.spec!r}: sequence {v.seq_name!r} not in the "
                         f"reference (has {sorted(ref_seqs)[:5]}...)")
    seq = ref_seqs[v.seq_name].upper()
    if v.end > len(seq):
        raise ValueError(f"{v.spec!r}: position {v.end} beyond sequence "
                         f"length {len(seq)}")
    span = seq[v.start:v.end]
    if v.ref and span != v.ref:
        raise ValueError(f"{v.spec!r}: reference has {span!r} at that "
                         f"position, not {v.ref!r}")
    alt = v.alt
    if alt is None:  # derived from the ref span
        alt = span + span if v.op == "dup" else span.translate(_RC)[::-1]
    return dataclasses.replace(v, ref=span, alt=alt)


def apply_variant(seq: str, v: Variant) -> str:
    """The full edited sequence (v must be resolved)."""
    return seq[:v.start] + v.alt + seq[v.end:]


def probe_kmers(v: Variant, ref_seqs: dict[str, str], k: int
                ) -> tuple[np.ndarray, np.ndarray]:
    """(ref_probes, alt_probes): sorted unique canonical k-mers whose windows
    overlap the edited span, on each allele. Alt probes also present among
    the locus's ref probes are dropped (no discriminating power)."""
    seq = ref_seqs[v.seq_name].upper()
    lo = max(v.start - (k - 1), 0)
    ref_hi = min(v.end + (k - 1), len(seq))
    ref_ctx = seq[lo:ref_hi]
    alt_seq = apply_variant(seq, v)
    alt_hi = min(v.start + len(v.alt) + (k - 1), len(alt_seq))
    alt_ctx = alt_seq[lo:alt_hi]
    ref_probes = np.unique(G.kmerize_seq(k, ref_ctx))
    alt_probes = np.unique(G.kmerize_seq(k, alt_ctx))
    alt_probes = np.setdiff1d(alt_probes, ref_probes, assume_unique=True)
    return ref_probes, alt_probes


def load_reference(path: str) -> dict[str, str]:
    from zotpu.io import fastq
    with fastq.open_file(path, "rb") as f:
        return {name: seq for name, seq in fastq.read_fasta(f)}


def build_panel(specs: list[str], ref_path: str, k: int):
    """All variants' probes + the per-variant attribution metadata.

    Returns (keys, meta): keys = sorted unique union of every probe; meta
    maps each variant spec to its ref/alt probe lists (hex) for host-side
    attribution in `evidence`.
    """
    S.check_k(k)
    ref_seqs = load_reference(ref_path)
    meta = []
    all_keys = []
    for spec in specs:
        v = resolve_variant(parse_variant(spec), ref_seqs)
        ref_p, alt_p = probe_kmers(v, ref_seqs, k)
        if len(alt_p) == 0:
            raise ValueError(
                f"{spec!r}: no discriminating alt probes at k={k} (edit is "
                f"invisible -- try a larger k)")
        meta.append({
            "spec": spec,
            "ref_probes": [f"{x:016x}" for x in ref_p],
            "alt_probes": [f"{x:016x}" for x in alt_p],
        })
        all_keys.append(ref_p)
        all_keys.append(alt_p)
    keys = np.unique(np.concatenate(all_keys)) if all_keys else np.empty(
        0, np.uint64)
    return keys, {"variants": meta, "k": k, "reference": ref_path}


def evidence_from_counts(meta: dict, keys: np.ndarray, counts: np.ndarray
                         ) -> list[dict]:
    """Per-variant support from a sample's sorted k-mer set (host side;
    probe panels are tiny)."""
    out = []
    for m in meta["variants"]:
        rows = {}
        for allele in ("ref", "alt"):
            probes = np.asarray([int(x, 16) for x in m[f"{allele}_probes"]],
                                np.uint64)
            if len(keys) == 0:
                ok = np.zeros(len(probes), bool)
                c = np.zeros(len(probes), np.int64)
            else:
                idx = np.searchsorted(keys, probes)
                ok = (idx < len(keys)) & (keys[np.minimum(idx, len(keys) - 1)]
                                          == probes)
                c = np.where(ok, counts[np.minimum(idx, len(counts) - 1)], 0)
            rows[allele] = {
                "probes": int(len(probes)),
                "probes_hit": int(ok.sum()),
                "support": int(np.median(c[ok])) if ok.any() else 0,
                "total": int(c.sum()),
            }
        a, r = rows["alt"]["support"], rows["ref"]["support"]
        out.append({
            "variant": m["spec"],
            "ref": rows["ref"], "alt": rows["alt"],
            "vaf_estimate": a / (a + r) if (a + r) else 0.0,
        })
    return out


def spike_reads(ref_path: str, specs: list[str], out_path: str, *,
                coverage: float = 30.0, vaf: float = 0.5,
                read_len: int = 100, error_rate: float = 0.0,
                seed: int = 0) -> dict:
    """Simulate reads from the reference with variants applied on a fraction
    ``vaf`` of them -- the test harness for the evidence pipeline."""
    rng = np.random.default_rng(seed)
    ref_seqs = load_reference(ref_path)
    variants = [resolve_variant(parse_variant(s), ref_seqs) for s in specs]
    alt_seqs = dict(ref_seqs)
    for v in variants:
        alt_seqs[v.seq_name] = apply_variant(alt_seqs[v.seq_name], v)
        # NOTE: multiple variants on one sequence apply left-to-right on the
        # progressively edited sequence; coordinates are per the ORIGINAL
        # reference, so callers should keep per-sequence variants disjoint
        # and ordered (sufficient for test spiking).
    lut = np.frombuffer(b"ACGT", np.uint8)
    n_written = 0
    from zotpu.io.fastq import open_file
    with open_file(out_path, "wb") as f:
        for name, seq in ref_seqs.items():
            n_reads = max(int(len(seq) * coverage / read_len), 1)
            for i in range(n_reads):
                use_alt = rng.random() < vaf
                src = alt_seqs[name] if use_alt else seq
                if len(src) < read_len:
                    continue
                off = int(rng.integers(0, len(src) - read_len + 1))
                read = np.frombuffer(src[off:off + read_len].encode(),
                                     np.uint8).copy()
                if error_rate > 0:
                    errs = np.where(rng.random(read_len) < error_rate)[0]
                    read[errs] = lut[rng.integers(0, 4, len(errs))]
                rid = f"@sim{n_written} {name}:{off} {'alt' if use_alt else 'ref'}"
                f.write((rid + "\n").encode())
                f.write(read.tobytes() + b"\n+\n" + b"I" * read_len + b"\n")
                n_written += 1
    return {"reads": n_written, "vaf": vaf, "coverage": coverage}
