"""Native C++ FASTQ parser vs the numpy path — identical batches."""

import gzip

import numpy as np
import pytest

from zotpu import semantics as S
from zotpu.io import fastq, native


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native library unavailable (no g++?)")
    return lib


def _write_fastq(path, reads, gz=False):
    op = gzip.open if gz else open
    with op(path, "wt") as f:
        for i, r in enumerate(reads):
            f.write(f"@r{i} extra meta\n{r}\n+\n{'I' * len(r)}\n")


def test_native_matches_numpy_path(tmp_path, lib):
    rng = np.random.default_rng(13)
    reads = ["".join(rng.choice(list("ACGTNacgtn"), size=rng.integers(1, 100)))
             for _ in range(57)]
    p = str(tmp_path / "x.fastq")
    _write_fastq(p, reads)
    nat = list(fastq.parse_batches(p, 16, 128))
    assert sum(b.n_reads for b in nat) == len(reads)
    i = 0
    for b in nat:
        for r in range(b.n_reads):
            want = S.ENCODE_LUT[np.frombuffer(reads[i].encode(), np.uint8)]
            assert np.array_equal(b.codes[r, :b.lengths[r]], want)
            assert np.all(b.codes[r, b.lengths[r]:] == S.INVALID_CODE)
            i += 1


def test_native_is_default_fastq_path(tmp_path, lib, monkeypatch):
    reads = ["ACGTACGT"] * 5
    p = str(tmp_path / "y.fastq.gz")
    _write_fastq(p, reads, gz=True)
    called = {"n": 0}
    orig = native.parse_fastq_buffer

    def spy(*a, **kw):
        called["n"] += 1
        return orig(*a, **kw)

    monkeypatch.setattr(native, "parse_fastq_buffer", spy)
    batches = list(fastq.parse_batches(p, 8, 32))
    assert called["n"] >= 1
    assert sum(b.n_reads for b in batches) == 5


def test_native_overlong_falls_back(tmp_path, lib):
    reads = ["A" * 300, "ACGT"]
    p = str(tmp_path / "z.fastq")
    _write_fastq(p, reads)
    # chunks containing overlong reads take the halo-chunking slow path
    batches = list(fastq.parse_batches(p, 8, 64, halo=24))
    total = sum(b.n_reads for b in batches)
    assert total >= 2


def test_native_crlf(tmp_path, lib):
    p = str(tmp_path / "crlf.fastq")
    with open(p, "wb") as f:
        f.write(b"@r0\r\nACGT\r\n+\r\nIIII\r\n")
    batches = list(fastq.parse_batches(p, 4, 8))
    assert batches[0].n_reads == 1
    assert batches[0].lengths[0] == 4
    assert np.array_equal(batches[0].codes[0, :4], [0, 1, 2, 3])


def test_native_truncated_record(tmp_path, lib):
    p = str(tmp_path / "trunc.fastq")
    with open(p, "w") as f:
        f.write("@r0\nACGT\n+\nIIII\n@r1\nACGT\n")  # second record incomplete
    batches = list(fastq.parse_batches(p, 4, 8))
    assert sum(b.n_reads for b in batches) == 1
