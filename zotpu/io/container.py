"""On-disk container for k-mer sets (ZKF format).

Reference analog: zotmer/library/container/ kset/kfset read/write with JSON
metadata including K (unverified -- reference mount empty, SURVEY.md section 0).

Layout (little-endian):
    bytes 0..4   magic  b"ZKF1"
    bytes 4..8   u32 header JSON length H
    bytes 8..8+H JSON header: {"k", "n", "has_counts", "meta": {...}}
    then         n * u64 keys (sorted canonical k-mers)
    then         n * u32 counts (iff has_counts)

The file doubles as the checkpoint format: per-batch sorted runs written with
``write`` can be resumed/merged at any time (SURVEY.md section 5,
checkpoint/resume philosophy of the reference: output files ARE checkpoints).
"""

from __future__ import annotations

import json
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


def write(path: str, ks: KmerSet) -> None:
    ks.validate()
    hdr = json.dumps({
        "k": ks.k, "n": int(ks.n),
        "has_counts": ks.counts is not None,
        "meta": ks.meta,
    }).encode("utf-8")
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(MAGIC)
        f.write(np.uint32(len(hdr)).tobytes())
        f.write(hdr)
        np.ascontiguousarray(ks.keys, dtype="<u8").tofile(f)
        if ks.counts is not None:
            np.ascontiguousarray(ks.counts, dtype="<u4").tofile(f)
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
        keys = np.fromfile(f, dtype="<u8", count=n)
        counts = np.fromfile(f, dtype="<u4", count=n) if hdr["has_counts"] else None
    return KmerSet(k=int(hdr["k"]), keys=keys, counts=counts, meta=hdr.get("meta", {}))
