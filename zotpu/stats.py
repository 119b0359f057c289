"""Log-space statistical helpers for spectrum modelling.

Reference analog: zotmer/library/stats.py (SURVEY.md section 2a "stats"):
log-gamma/factorial/choose, log-space addition, Poisson and Gamma pdfs/cdfs,
and a Kolmogorov-Smirnov distance -- the machinery zotmer's histogram/model
commands use to fit k-mer frequency spectra (error peak vs genomic coverage
peaks).

Implemented with numpy in float64 on host (these run over histogram-sized
arrays, ~1e3 entries, so device offload would be pure overhead; the heavy
count aggregation they consume IS device-side, kernels/hist.py).
"""

from __future__ import annotations

import numpy as np

_LANCZOS_G = 7
_LANCZOS_COEF = np.array([
    0.99999999999980993, 676.5203681218851, -1259.1392167224028,
    771.32342877765313, -176.61502916214059, 12.507343278686905,
    -0.13857109526572012, 9.9843695780195716e-6, 1.5056327351493116e-7,
])


def log_gamma(x):
    """log Gamma(x) for x > 0 (Lanczos approximation, vectorized)."""
    x = np.asarray(x, dtype=np.float64)
    small = x < 0.5
    # reflection for x < 0.5: Gamma(x) Gamma(1-x) = pi / sin(pi x)
    xr = np.where(small, 1.0 - x, x) - 1.0
    a = np.full_like(xr, _LANCZOS_COEF[0])
    for i in range(1, _LANCZOS_G + 2):
        a = a + _LANCZOS_COEF[i] / (xr + i)
    t = xr + _LANCZOS_G + 0.5
    y = 0.5 * np.log(2 * np.pi) + (xr + 0.5) * np.log(t) - t + np.log(a)
    with np.errstate(divide="ignore", invalid="ignore"):
        refl = np.log(np.pi / np.abs(np.sin(np.pi * x))) - y
    return np.where(small, refl, y)


def log_fac(n):
    """log n!"""
    return log_gamma(np.asarray(n, np.float64) + 1.0)


def log_choose(n, k):
    """log C(n, k)."""
    return log_fac(n) - log_fac(k) - log_fac(np.asarray(n, np.float64) - k)


def log_add(a, b):
    """log(exp(a) + exp(b)), overflow-safe, -inf neutral."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    hi = np.maximum(a, b)
    lo = np.minimum(a, b)
    with np.errstate(invalid="ignore"):
        out = hi + np.log1p(np.exp(lo - hi))
    return np.where(np.isneginf(hi), hi, out)


def log_sum(xs):
    """log-space sum over the last axis."""
    xs = np.asarray(xs, np.float64)
    hi = np.max(xs, axis=-1, keepdims=True)
    out = hi[..., 0] + np.log(np.sum(np.exp(xs - hi), axis=-1))
    return np.where(np.isneginf(hi[..., 0]), hi[..., 0], out)


def log_poisson_pdf(lam, k):
    """log P[X = k], X ~ Poisson(lam)."""
    k = np.asarray(k, np.float64)
    return k * np.log(lam) - lam - log_fac(k)


def poisson_pdf(lam, k):
    return np.exp(log_poisson_pdf(lam, k))


def poisson_cdf(lam, k):
    """P[X <= k] by direct log-space summation (k small in spectra)."""
    k = int(k)
    terms = log_poisson_pdf(lam, np.arange(k + 1, dtype=np.float64))
    return float(np.exp(log_sum(terms)))


def log_gamma_pdf(shape_a, rate_b, x):
    """log pdf of Gamma(a, rate b) at x."""
    a = np.asarray(shape_a, np.float64)
    b = np.asarray(rate_b, np.float64)
    x = np.asarray(x, np.float64)
    return a * np.log(b) - log_gamma(a) + (a - 1.0) * np.log(x) - b * x


def ks_distance(cdf_a, cdf_b):
    """Kolmogorov-Smirnov distance between two discrete CDF arrays."""
    return float(np.max(np.abs(np.asarray(cdf_a, np.float64)
                               - np.asarray(cdf_b, np.float64))))


def spectrum_mixture_fit(hist, max_cov=100):
    """Crude error/genomic two-component fit of a k-mer spectrum.

    Models freq-1..3 mass as an error Poisson(lam_e ~ <=1) and the main peak
    as Poisson(lam_g) around the spectrum's mode beyond the cutoff. Returns
    (cutoff, lam_g, genome_size_estimate) -- the BASELINE config-4 statistic.
    """
    h = np.asarray(hist, np.float64)
    from zotpu.reference_impl.golden import error_peak_cutoff
    cut = error_peak_cutoff(h.astype(np.int64))
    if len(h) <= cut + 1:
        return cut, 0.0, 0
    mode = int(np.argmax(h[cut:min(len(h), max_cov)]) + cut)
    lam_g = float(mode)
    genomic = h[cut:]
    genome_size = int(np.sum(genomic * np.arange(cut, len(h))) / max(lam_g, 1.0))
    return cut, lam_g, genome_size
