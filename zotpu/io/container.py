"""On-disk container for k-mer sets (ZKF format).

Reference analog: zotmer/library/container/ kset/kfset read/write with JSON
metadata including K (unverified -- reference mount empty, SURVEY.md section 0).

Layout (little-endian):
    bytes 0..4   magic  b"ZKF1"
    bytes 4..8   u32 header JSON length H
    bytes 8..8+H JSON header: {"k", "n", "has_counts", "codec", "meta": {...}}
    then         keys blob:   n * u64 sorted canonical k-mers
    then         counts blob: n * u32 (iff has_counts)

codec is "raw" (default), "zlib" (each blob deflate-compressed and
length-prefixed with a u64), or "delta" -- the analog of the reference's
compressed int-vector encodings: keys are stored as zlib'd u32 deltas and
counts as zlib'd u16, plus a small exception table for u32-overflowing
gaps / u16-overflowing counts (exact reconstruction; io/delta.py, the same
scheme as the D2H wire codec). On real k-mer sets "delta" is both smaller
and faster to write than "zlib" (it deflates 6 B/key of low-entropy deltas
instead of 12 B/key of high-entropy raw keys). Caveat: "delta" suits DENSE
sets (mean key gap < 2^32 -- any real WGS-scale set); a tiny set spread
over the full key space turns every row into a 20 B exception and comes
out larger than raw. Decoding is exact in every regime.

The file doubles as the checkpoint format: per-batch sorted runs written with
``write`` can be resumed/merged at any time (SURVEY.md section 5,
checkpoint/resume philosophy of the reference: output files ARE checkpoints).
"""

from __future__ import annotations

import json
import zlib
import os
from dataclasses import dataclass, field

import numpy as np

from zotpu import semantics as S

MAGIC = b"ZKF1"


@dataclass
class KmerSet:
    k: int
    keys: np.ndarray                      # (n,) u64 sorted unique
    counts: np.ndarray | None = None      # (n,) u32 or None for a bare kset
    meta: dict = field(default_factory=dict)

    @property
    def n(self) -> int:
        return len(self.keys)

    def validate(self) -> None:
        S.check_k(self.k)
        if self.n and not np.all(self.keys[1:] > self.keys[:-1]):
            raise ValueError("keys not strictly sorted")
        if self.n and int(self.keys[-1]) > int(S.key_mask(self.k)):
            raise ValueError("key exceeds 2k bits")
        if self.counts is not None and len(self.counts) != self.n:
            raise ValueError("counts length mismatch")


def _write_zblob(f, blob: bytes) -> None:
    z = zlib.compress(blob, level=1)
    f.write(np.uint64(len(z)).tobytes())
    f.write(z)


def write(path: str, ks: KmerSet, codec: str = "raw") -> None:
    ks.validate()
    if codec not in ("raw", "zlib", "delta"):
        raise ValueError(f"unknown codec {codec!r}")
    hdr = json.dumps({
        "k": ks.k, "n": int(ks.n),
        "has_counts": ks.counts is not None,
        "codec": codec,
        "meta": ks.meta,
    }).encode("utf-8")
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(MAGIC)
        f.write(np.uint32(len(hdr)).tobytes())
        f.write(hdr)
        if codec == "delta":
            from zotpu.io import delta as D
            d32, c16, exc_pos, exc_key, exc_cnt = D.encode(ks.keys, ks.counts)
            _write_zblob(f, np.ascontiguousarray(d32, "<u4").tobytes())
            if c16 is not None:
                _write_zblob(f, np.ascontiguousarray(c16, "<u2").tobytes())
            f.write(np.uint32(len(exc_pos)).tobytes())
            f.write(np.ascontiguousarray(exc_pos, "<u8").tobytes())
            f.write(np.ascontiguousarray(exc_key, "<u8").tobytes())
            f.write(np.ascontiguousarray(exc_cnt, "<u4").tobytes())
        else:
            blobs = [np.ascontiguousarray(ks.keys, dtype="<u8").tobytes()]
            if ks.counts is not None:
                blobs.append(np.ascontiguousarray(ks.counts, dtype="<u4").tobytes())
            for blob in blobs:
                if codec == "zlib":
                    _write_zblob(f, blob)
                else:
                    f.write(blob)
    os.replace(tmp, path)


def read_header(path: str) -> dict:
    with open(path, "rb") as f:
        if f.read(4) != MAGIC:
            raise ValueError(f"{path}: not a ZKF file")
        (hlen,) = np.frombuffer(f.read(4), dtype="<u4")
        return json.loads(f.read(int(hlen)).decode("utf-8"))


def read(path: str) -> KmerSet:
    with open(path, "rb") as f:
        if f.read(4) != MAGIC:
            raise ValueError(f"{path}: not a ZKF file")
        (hlen,) = np.frombuffer(f.read(4), dtype="<u4")
        hdr = json.loads(f.read(int(hlen)).decode("utf-8"))
        n = int(hdr["n"])
        codec = hdr.get("codec", "raw")

        def zblob(dtype):
            (zlen,) = np.frombuffer(f.read(8), dtype="<u8")
            return np.frombuffer(zlib.decompress(f.read(int(zlen))),
                                 dtype=dtype)

        def blob(dtype):
            if codec == "zlib":
                return zblob(dtype)
            return np.fromfile(f, dtype=dtype, count=n)

        if codec == "delta":
            from zotpu.io import delta as D
            d32 = zblob("<u4")
            c16 = zblob("<u2") if hdr["has_counts"] else None
            (n_exc,) = np.frombuffer(f.read(4), dtype="<u4")
            n_exc = int(n_exc)
            exc_pos = np.fromfile(f, dtype="<u8", count=n_exc)
            exc_key = np.fromfile(f, dtype="<u8", count=n_exc)
            exc_cnt = np.fromfile(f, dtype="<u4", count=n_exc)
            if len(d32) != n or len(exc_cnt) != n_exc:
                raise ValueError(f"{path}: truncated container "
                                 f"(expected {n} entries, got {len(d32)})")
            keys, counts = D.decode(d32, c16, exc_pos, exc_key, exc_cnt, n)
        else:
            keys = blob("<u8")
            counts = blob("<u4") if hdr["has_counts"] else None
    if len(keys) != n or (counts is not None and len(counts) != n):
        raise ValueError(f"{path}: truncated container "
                         f"(expected {n} entries, got {len(keys)})")
    return KmerSet(k=int(hdr["k"]), keys=keys.copy(), counts=None if counts is None else counts.copy(),
                   meta=hdr.get("meta", {}))
