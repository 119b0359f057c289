"""Set-algebra workload wrappers (BASELINE config 3).

Reference analog: zotmer's set-algebra commands (SURVEY.md section 3.3).
Device path pads both sorted sets to power-of-two capacity (bounded compile
count) and runs the neighbour-combine kernel; counts follow semantics.py.
"""

from __future__ import annotations

import numpy as np

from zotpu import semantics as S
from zotpu.kernels import setops as K


def _pad_pow2(keys, counts):
    n = len(keys)
    cap = max(1 << (max(n, 1) - 1).bit_length(), 8)
    hi = np.full(cap, 0xFFFFFFFF, np.uint32)
    lo = np.full(cap, 0xFFFFFFFF, np.uint32)
    c = np.zeros(cap, np.uint32)
    hi[:n], lo[:n] = S.split_hi_lo(np.asarray(keys, np.uint64))
    c[:n] = counts
    return hi, lo, c


def set_op(a: tuple[np.ndarray, np.ndarray], b: tuple[np.ndarray, np.ndarray],
           op: str) -> tuple[np.ndarray, np.ndarray]:
    """Device set op between two sorted unique (keys u64, counts u32) pairs.

    Container inputs are dense, so this dispatches to the merge-path Pallas
    front-end on TPU (kernels/setops_merge.py) and the sort-based kernel
    elsewhere -- byte-identical outputs (tests/test_setops_merge.py)."""
    from zotpu.kernels.setops_merge import set_op_auto
    ahi, alo, ac = _pad_pow2(*a)
    bhi, blo, bc = _pad_pow2(*b)
    hi, lo, c, n = set_op_auto(ahi, alo, ac, bhi, blo, bc, op=op)
    n = int(n)
    keys = S.join_hi_lo(np.asarray(hi[:n]), np.asarray(lo[:n]))
    return keys, np.asarray(c[:n])


def merge_tree_device(runs: list[tuple[np.ndarray, np.ndarray]]
                      ) -> tuple[np.ndarray, np.ndarray]:
    """Pairwise device merge tree over sorted runs (counts saturate)."""
    if not runs:
        return np.empty(0, np.uint64), np.empty(0, S.COUNT_DTYPE)
    runs = list(runs)
    while len(runs) > 1:
        nxt = []
        for i in range(0, len(runs) - 1, 2):
            nxt.append(set_op(runs[i], runs[i + 1], op="merge"))
        if len(runs) % 2:
            nxt.append(runs[-1])
        runs = nxt
    return runs[0]


def jaccard(a_keys: np.ndarray, b_keys: np.ndarray) -> dict:
    """Similarity statistics from device cardinalities."""
    ahi, alo, _ = _pad_pow2(a_keys, np.ones(len(a_keys), np.uint32))
    bhi, blo, _ = _pad_pow2(b_keys, np.ones(len(b_keys), np.uint32))
    na, nb, ni, nu = (int(x) for x in K.cardinalities(ahi, alo, bhi, blo))
    return {"a": na, "b": nb, "intersect": ni, "union": nu,
            "jaccard": ni / nu if nu else 0.0}
