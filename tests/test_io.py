"""I/O tests: FASTA/FASTQ batch parsing and the ZKF container."""

import gzip

import numpy as np

from zotpu import semantics as S
from zotpu.io import container, fastq
from zotpu.reference_impl import golden as G


def _write_fastq(path, reads, gz=False):
    op = gzip.open if gz else open
    with op(path, "wt") as f:
        for i, r in enumerate(reads):
            f.write(f"@r{i}\n{r}\n+\n{'I' * len(r)}\n")


def test_fastq_generator(tmp_path):
    reads = ["ACGT", "GGGTTTNAC", "A"]
    p = str(tmp_path / "x.fastq")
    _write_fastq(p, reads)
    with fastq.open_file(p) as f:
        got = [s for _, s, _ in fastq.read_fastq(f)]
    assert got == reads


def test_fastq_batches_match_generator(tmp_path):
    rng = np.random.default_rng(7)
    reads = ["".join(rng.choice(list("ACGTN"), size=rng.integers(1, 60)))
             for _ in range(23)]
    p = str(tmp_path / "x.fastq.gz")
    _write_fastq(p, reads, gz=True)
    batches = list(fastq.parse_batches(p, max_reads=10, max_len=64))
    assert sum(b.n_reads for b in batches) == len(reads)
    i = 0
    for b in batches:
        for r in range(b.n_reads):
            want = S.ENCODE_LUT[np.frombuffer(reads[i].encode(), np.uint8)]
            got = b.codes[r, :b.lengths[r]]
            assert np.array_equal(got, want)
            assert np.all(b.codes[r, b.lengths[r]:] == S.INVALID_CODE)
            i += 1


def test_fasta_batches(tmp_path):
    p = str(tmp_path / "x.fa")
    with open(p, "w") as f:
        f.write(">chr1 desc\nACGTACGT\nGGGG\n>chr2\nTTTT\n")
    batches = list(fastq.parse_batches(p, max_reads=4, max_len=32))
    seqs = []
    for b in batches:
        for r in range(b.n_reads):
            row = b.codes[r]
            seqs.append(bytes(S.DECODE_LUT[row[row < 4]]).decode())
    assert seqs == ["ACGTACGTGGGG", "TTTT"]


def test_chunk_with_halo_loses_no_kmers():
    rng = np.random.default_rng(3)
    k = 7
    seq = "".join(rng.choice(list("ACGT"), size=300))
    codes = G.encode(seq)
    rows = fastq.chunk_with_halo(codes, k=k, chunk_len=50)
    chunked = np.concatenate([G.kmerize_seq(k, row) for row in rows])
    want, wc = G.sort_dedup(G.kmerize_seq(k, seq))
    got, gc = G.sort_dedup(chunked)
    assert np.array_equal(want, got)
    assert np.array_equal(wc, gc)


def test_container_roundtrip(tmp_path):
    keys, counts = G.kmerize(11, ["ACGTACGTACGTAAACCCGGTT", "TTGGAACC"])
    ks = container.KmerSet(k=11, keys=keys, counts=counts, meta={"source": "test"})
    p = str(tmp_path / "a.zkf")
    container.write(p, ks)
    back = container.read(p)
    assert back.k == 11 and back.meta["source"] == "test"
    assert np.array_equal(back.keys, keys)
    assert np.array_equal(back.counts, counts)
    hdr = container.read_header(p)
    assert hdr["n"] == len(keys)


def test_container_kset_no_counts(tmp_path):
    keys = np.array([1, 5, 9], dtype=np.uint64)
    p = str(tmp_path / "b.zkf")
    container.write(p, container.KmerSet(k=5, keys=keys))
    back = container.read(p)
    assert back.counts is None and np.array_equal(back.keys, keys)


def test_container_zlib_codec(tmp_path):
    keys, counts = G.kmerize(13, ["ACGTACGTACGTACGTTTTGGGCCAA" * 4])
    p = str(tmp_path / "c.zkf")
    container.write(p, container.KmerSet(k=13, keys=keys, counts=counts),
                    codec="zlib")
    back = container.read(p)
    assert np.array_equal(back.keys, keys)
    assert np.array_equal(back.counts, counts)
    hdr = container.read_header(p)
    assert hdr["codec"] == "zlib"
