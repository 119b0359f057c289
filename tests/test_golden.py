"""Property tests of the golden reference semantics (SURVEY.md section 4 item 2)."""

import numpy as np
from hypothesis import given, settings, strategies as st

from zotpu import semantics as S
from zotpu.reference_impl import golden as G

dna = st.text(alphabet="ACGT", min_size=0, max_size=200)
dna_with_n = st.text(alphabet="ACGTN", min_size=0, max_size=200)
ks = st.integers(min_value=1, max_value=31)


def brute_kmers(k, seq):
    """Dumbest possible canonical kmerize for cross-checking."""
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    out = []
    for i in range(len(seq) - k + 1):
        w = seq[i:i + k]
        if any(c not in "ACGT" for c in w):
            continue
        rc = "".join(comp[c] for c in reversed(w))
        canon = min(w, rc)  # string order == packed integer order for A<C<G<T
        out.append(sum({"A": 0, "C": 1, "G": 2, "T": 3}[c] << (2 * (k - 1 - j))
                       for j, c in enumerate(canon)))
    return np.array(sorted(out), dtype=np.uint64)


@given(ks, st.data())
@settings(max_examples=60, deadline=None)
def test_rc_involution(k, data):
    xs = data.draw(st.lists(st.integers(0, (1 << (2 * k)) - 1), max_size=50))
    x = np.array(xs, dtype=np.uint64)
    assert np.array_equal(S.rc_u64(k, S.rc_u64(k, x)), x)


@given(ks, st.data())
@settings(max_examples=60, deadline=None)
def test_canonical_strand_invariant_and_idempotent(k, data):
    xs = data.draw(st.lists(st.integers(0, (1 << (2 * k)) - 1), max_size=50))
    x = np.array(xs, dtype=np.uint64)
    c = S.canonical_u64(k, x)
    assert np.array_equal(c, S.canonical_u64(k, S.rc_u64(k, x)))
    assert np.array_equal(c, S.canonical_u64(k, c))


@given(st.integers(1, 8), dna_with_n)
@settings(max_examples=100, deadline=None)
def test_kmerize_seq_matches_brute_force(k, seq):
    got = np.sort(G.kmerize_seq(k, seq))
    want = brute_kmers(k, seq)
    assert np.array_equal(got, want)


@given(st.lists(dna, max_size=8), st.integers(1, 12))
@settings(max_examples=60, deadline=None)
def test_kmerize_count_totals(seqs, k):
    keys, counts = G.kmerize(k, seqs)
    total = sum(max(len(s) - k + 1, 0) for s in seqs)
    assert int(counts.sum()) == total
    assert np.all(keys[1:] > keys[:-1]) if len(keys) > 1 else True


@given(st.data())
@settings(max_examples=60, deadline=None)
def test_set_identities(data):
    k = 6
    a_keys = np.unique(np.array(
        data.draw(st.lists(st.integers(0, 4**6 - 1), max_size=40)), dtype=np.uint64))
    b_keys = np.unique(np.array(
        data.draw(st.lists(st.integers(0, 4**6 - 1), max_size=40)), dtype=np.uint64))
    a = (a_keys, np.ones(len(a_keys), np.uint32))
    b = (b_keys, np.ones(len(b_keys), np.uint32))
    u = G.union(a, b)[0]
    i = G.intersect(a, b)[0]
    d_ab = G.difference(a, b)[0]
    d_ba = G.difference(b, a)[0]
    assert np.array_equal(u, np.union1d(a_keys, b_keys))
    assert np.array_equal(i, np.intersect1d(a_keys, b_keys))
    assert len(u) == len(i) + len(d_ab) + len(d_ba)


def test_merge_associative_commutative(rng):
    sets = []
    for _ in range(3):
        keys = np.unique(rng.integers(0, 4**10, size=100).astype(np.uint64))
        counts = rng.integers(1, 100, size=len(keys)).astype(np.uint32)
        sets.append((keys, counts))
    m1 = G.merge(sets)
    m2 = G.merge([G.merge(sets[:2]), sets[2]])
    m3 = G.merge([sets[2], sets[0], sets[1]])
    for a, b in [(m1, m2), (m1, m3)]:
        assert np.array_equal(a[0], b[0])
        assert np.array_equal(a[1], b[1])


def test_count_saturation():
    keys = np.zeros(2, dtype=np.uint64)
    counts = np.full(2, 0xFFFFFFFF, dtype=np.uint32)
    u, c = G.sort_dedup(keys, counts)
    assert len(u) == 1 and c[0] == S.COUNT_MAX


def test_decode_roundtrip():
    k = 25
    key = int(G.kmerize_seq(k, "ACGTACGTACGTACGTACGTACGTA")[0])
    s = G.decode_kmer(k, key)
    assert G.kmerize_seq(k, s)[0] == np.uint64(key)


def test_spectrum_and_cutoff():
    counts = np.array([1] * 100 + [2] * 30 + [5] * 5 + [20] * 50 + [21] * 40)
    h = G.spectrum(counts, max_count=64)
    assert h[1] == 100 and h[20] == 50
    cut = G.error_peak_cutoff(h)
    assert 2 < cut <= 20


def test_scan_panel():
    k = 5
    panel, _ = G.kmerize(k, ["ACGTACGTA"])
    hits = G.scan_panel(k, panel, ["ACGTA", "TTTTT", "TACGT"])
    assert hits[0] == 1
    assert hits[1] == 0
    assert hits[2] == 1  # TACGT rc = ACGTA -> canonical matches panel


def test_ham_lcp_popcnt_brute():
    """SWAR bit utilities vs per-base string brute force."""
    rng = np.random.default_rng(9)
    for k in (3, 11, 25, 31):
        n = 300
        a = rng.integers(0, 1 << (2 * k), n).astype(np.uint64)
        b = a.copy()
        # mutate a random subset of bases in b
        for i in range(n):
            for _ in range(int(rng.integers(0, 4))):
                pos = int(rng.integers(0, k))
                code = np.uint64(rng.integers(0, 4))
                sh = np.uint64(2 * (k - 1 - pos))
                b[i] = (b[i] & ~(np.uint64(3) << sh)) | (code << sh)
        sa = [G.decode_kmer(k, int(x)) for x in a]
        sb = [G.decode_kmer(k, int(x)) for x in b]
        want_ham = np.array([sum(c1 != c2 for c1, c2 in zip(x, y))
                             for x, y in zip(sa, sb)])
        got_ham = S.ham_u64(a, b)
        assert np.array_equal(got_ham, want_ham)

        def lcp_str(x, y):
            for i, (c1, c2) in enumerate(zip(x, y)):
                if c1 != c2:
                    return i
            return k
        want_lcp = np.array([lcp_str(x, y) for x, y in zip(sa, sb)])
        assert np.array_equal(S.lcp_u64(k, a, b), want_lcp)
    x = rng.integers(0, 1 << 63, 500).astype(np.uint64)
    assert np.array_equal(S.popcnt_u64(x),
                          [bin(int(v)).count("1") for v in x])
