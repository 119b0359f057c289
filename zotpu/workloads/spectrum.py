"""Spectrum workload (BASELINE config 4): k-mer frequency histogram with
error-peak cutoff and genome-size estimate over a full run.

Reference analog: zot hist + stats-model consumers (SURVEY.md section 3.4).
"""

from __future__ import annotations

import numpy as np

from zotpu import stats as ST
from zotpu.kernels import hist as K


def spectrum(counts: np.ndarray, max_count: int = 1024) -> np.ndarray:
    """Device count-of-counts histogram (tail accumulates in the last bin)."""
    padded = np.zeros(max(len(counts), 8), np.uint32)
    padded[:len(counts)] = counts
    return np.asarray(K.spectrum(padded, max_count=max_count))


def spectrum_with_cutoff(counts: np.ndarray, max_count: int = 1024) -> dict:
    h = spectrum(counts, max_count=max_count)
    cut, lam_g, gsize = ST.spectrum_mixture_fit(h.astype(np.float64))
    return {"hist": h, "cutoff": int(cut), "coverage_peak": float(lam_g),
            "genome_size_estimate": int(gsize),
            "solid_kmers": int(h[int(cut):].sum())}
