"""Device kernels vs the golden numpy reference — byte equality (SURVEY.md §4)."""

import numpy as np
import pytest

from zotpu import semantics as S
from zotpu.kernels import hist as khist
from zotpu.kernels import pack, setops, sortdedup
from zotpu.reference_impl import golden as G


def make_batch(rng, n_reads, max_len, alphabet="ACGTN", min_len=1):
    seqs = ["".join(rng.choice(list(alphabet), size=rng.integers(min_len, max_len + 1)))
            for _ in range(n_reads)]
    codes = np.full((n_reads, max_len), S.INVALID_CODE, np.uint8)
    lengths = np.zeros(n_reads, np.int32)
    for i, s in enumerate(seqs):
        codes[i, :len(s)] = G.encode(s)
        lengths[i] = len(s)
    return seqs, codes, lengths


def device_kmerize(codes, lengths, k):
    hi, lo, w = pack.pack_canonical(codes, lengths, k)
    uhi, ulo, counts, n = sortdedup.kmer_sort_dedup(hi, lo, w)
    n = int(n)
    keys = S.join_hi_lo(np.asarray(uhi)[:n], np.asarray(ulo)[:n])
    return keys, np.asarray(counts)[:n], np.asarray(uhi), np.asarray(ulo), np.asarray(counts)


@pytest.mark.parametrize("k", [1, 4, 15, 16, 17, 25, 31])
def test_pack_canonical_matches_golden(k):
    rng = np.random.default_rng(k)
    seqs, codes, lengths = make_batch(rng, 17, 70)
    hi, lo, w = pack.pack_canonical(codes, lengths, k)
    got = S.join_hi_lo(np.asarray(hi), np.asarray(lo))[np.asarray(w) == 1]
    want = np.concatenate([G.kmerize_seq(k, s) for s in seqs]) if seqs else np.empty(0, np.uint64)
    # pack emits in row-major window order; golden per-seq in read order
    assert np.array_equal(np.sort(got), np.sort(want))
    # invalid slots are sentinel
    hj = S.join_hi_lo(np.asarray(hi), np.asarray(lo))
    assert np.all(hj[np.asarray(w) == 0] == S.SENTINEL_KEY)


@pytest.mark.parametrize("k", [5, 25])
def test_sort_dedup_byte_equal(k):
    rng = np.random.default_rng(42 + k)
    seqs, codes, lengths = make_batch(rng, 33, 90)
    keys, counts, *_ = device_kmerize(codes, lengths, k)
    want_k, want_c = G.kmerize(k, seqs)
    assert np.array_equal(keys, want_k)
    assert np.array_equal(counts, want_c)


def test_sort_dedup_empty():
    codes = np.full((4, 30), S.INVALID_CODE, np.uint8)
    lengths = np.zeros(4, np.int32)
    keys, counts, *_ = device_kmerize(codes, lengths, 25)
    assert len(keys) == 0


@pytest.mark.parametrize("k", [5, 25])
def test_dedup_marked_equals_compacted(k):
    """The hot-path marked (uncompacted) dedup must carry exactly the same
    unique keys/counts as the compacted form, and compact_sorted(marked)
    must be byte-equal to dedup_count_sorted."""
    rng = np.random.default_rng(7 + k)
    seqs, codes, lengths = make_batch(rng, 29, 80)
    hi, lo, w = pack.pack_canonical(codes, lengths, k)
    mhi, mlo, mcnt, mn = sortdedup.kmer_sort_dedup(hi, lo, w, compact=False)
    chi, clo, ccnt, cn = sortdedup.kmer_sort_dedup(hi, lo, w, compact=True)
    assert int(mn) == int(cn)
    # compacting the marked form reproduces the compacted form byte-for-byte
    rhi, rlo, rcnt = sortdedup.compact_sorted(mhi, mlo, mcnt)
    assert np.array_equal(np.asarray(rhi), np.asarray(chi))
    assert np.array_equal(np.asarray(rlo), np.asarray(clo))
    assert np.array_equal(np.asarray(rcnt), np.asarray(ccnt))
    # valid rows of the marked form: same multiset of (key, count)
    mk = S.join_hi_lo(np.asarray(mhi), np.asarray(mlo))
    valid = mk != S.SENTINEL_KEY
    assert np.array_equal(np.sort(mk[valid]),
                          S.join_hi_lo(np.asarray(chi), np.asarray(clo))[:int(cn)])
    # marked duplicates carry count 0
    assert np.all(np.asarray(mcnt)[~valid] == 0)


def test_set_op_accepts_marked_inputs():
    """set_op must merge sentinel-MARKED (uncompacted) runs identically to
    compacted runs -- the contract the accumulator hot path relies on."""
    rng = np.random.default_rng(3)
    seqs_a, codes_a, len_a = make_batch(rng, 21, 60)
    seqs_b, codes_b, len_b = make_batch(rng, 21, 60)
    k = 11
    outs = []
    for compact in (True, False):
        runs = []
        for codes, lengths in ((codes_a, len_a), (codes_b, len_b)):
            hi, lo, w = pack.pack_canonical(codes, lengths, k)
            runs.append(sortdedup.kmer_sort_dedup(hi, lo, w, compact=compact))
        (ahi, alo, ac, _), (bhi, blo, bc, _) = runs
        hi, lo, c, n = setops.set_op(ahi, alo, ac, bhi, blo, bc, op="merge")
        n = int(n)
        outs.append((S.join_hi_lo(np.asarray(hi), np.asarray(lo))[:n],
                     np.asarray(c)[:n]))
    assert np.array_equal(outs[0][0], outs[1][0])
    assert np.array_equal(outs[0][1], outs[1][1])
    want_k, want_c = G.merge([G.kmerize(k, seqs_a), G.kmerize(k, seqs_b)])
    assert np.array_equal(outs[0][0], want_k)
    assert np.array_equal(outs[0][1], want_c)


def _to_dev(keys, counts, cap):
    hi, lo = S.split_hi_lo(keys)
    out_hi = np.full(cap, 0xFFFFFFFF, np.uint32)
    out_lo = np.full(cap, 0xFFFFFFFF, np.uint32)
    out_c = np.zeros(cap, np.uint32)
    out_hi[:len(keys)] = hi
    out_lo[:len(keys)] = lo
    out_c[:len(keys)] = counts
    return out_hi, out_lo, out_c


@pytest.mark.parametrize("op,gold", [("merge", G.merge)])
def test_merge_pair(op, gold):
    rng = np.random.default_rng(5)
    a = G.kmerize(9, ["".join(rng.choice(list("ACGT"), size=200))])
    b = G.kmerize(9, ["".join(rng.choice(list("ACGT"), size=180))])
    ahi, alo, ac = _to_dev(*a, cap=256)
    bhi, blo, bc = _to_dev(*b, cap=224)
    hi, lo, c, n = setops.set_op(ahi, alo, ac, bhi, blo, bc, op="merge")
    n = int(n)
    keys = S.join_hi_lo(np.asarray(hi)[:n], np.asarray(lo)[:n])
    want_k, want_c = gold([a, b])
    assert np.array_equal(keys, want_k)
    assert np.array_equal(np.asarray(c)[:n], want_c)


@pytest.mark.parametrize("op,gold", [
    ("union", G.union), ("intersect", G.intersect), ("diff", G.difference)])
def test_set_ops(op, gold):
    rng = np.random.default_rng(11)
    a = G.kmerize(13, ["".join(rng.choice(list("ACGT"), size=300))])
    common = "".join(rng.choice(list("ACGT"), size=120))
    b = G.kmerize(13, ["".join(rng.choice(list("ACGT"), size=150)), common])
    a = G.merge([a, G.kmerize(13, [common])])
    ahi, alo, ac = _to_dev(*a, cap=512)
    bhi, blo, bc = _to_dev(*b, cap=512)
    hi, lo, c, n = setops.set_op(ahi, alo, ac, bhi, blo, bc, op=op)
    n = int(n)
    keys = S.join_hi_lo(np.asarray(hi)[:n], np.asarray(lo)[:n])
    want_k, want_c = gold(a, b)
    assert np.array_equal(keys, want_k)
    assert np.array_equal(np.asarray(c)[:n], want_c)


def test_count_saturation_on_merge():
    keys = np.array([7], np.uint64)
    big = np.array([0xFFFFFFF0], np.uint32)
    ahi, alo, ac = _to_dev(keys, big, 8)
    bhi, blo, bc = _to_dev(keys, np.array([0x100], np.uint32), 8)
    _, _, c, n = setops.set_op(ahi, alo, ac, bhi, blo, bc, op="merge")
    assert int(n) == 1 and np.asarray(c)[0] == 0xFFFFFFFF


def test_cardinalities():
    a_keys = np.array([1, 2, 3, 10], np.uint64)
    b_keys = np.array([2, 3, 4, 5, 10, 20], np.uint64)
    ahi, alo, _ = _to_dev(a_keys, np.ones(4, np.uint32), 8)
    bhi, blo, _ = _to_dev(b_keys, np.ones(6, np.uint32), 8)
    na, nb, ni, nu = setops.cardinalities(ahi, alo, bhi, blo)
    assert (int(na), int(nb), int(ni), int(nu)) == (4, 6, 3, 7)


def test_spectrum_matches_golden():
    rng = np.random.default_rng(2)
    counts = rng.integers(1, 50, size=500).astype(np.uint32)
    padded = np.concatenate([counts, np.zeros(12, np.uint32)])
    got = np.asarray(khist.spectrum(padded, max_count=64))
    want = G.spectrum(counts, max_count=64)
    want[0] = 0  # device ignores padding; golden has no zero-count entries anyway
    assert np.array_equal(got, want.astype(np.int32))


