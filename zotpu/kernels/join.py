"""Sort-merge membership join: packed query k-mers vs a sorted panel.

Reference analog: zotmer's scan binary-searches each k-mer in the panel
(SURVEY.md section 3.5). The round-1 device translation
(``kernels/search.member2``) kept that shape -- ~log2(n) panel GATHERS per
query -- but XLA:TPU lowers gather to ~0.03 Gelem/s (docs/PERF_NOTES.md), so
scan measured ~2 Mkmer/s. TPU has no vector-gather unit; the gather-free
formulation is a SORT-MERGE JOIN:

1. sort queries by key, carrying a tag payload (row id + 1; 0 = panel);
2. ONE streaming merge pass against the sorted panel (panel-first on ties);
3. per equal-key segment, "does it start with a panel row?" via a single
   cummax over ``2*pos + is_panel_start`` (no gather, no scatter);
4. per-row counts: sort hit bits back by tag and segment-sum per row.

Everything is sorts, scans, and one Pallas merge pass -- the primitives this
codebase already runs at full VPU rate.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from zotpu.kernels.pack import SENT32


def _hits_from_merged(hi, lo, tag):
    """Post-merge: per-row hit bits. Rows sorted by (hi, lo); tag==0 marks
    panel rows, tag>0 query rows. A query hits iff its equal-key segment
    CONTAINS a panel row -- checked in both directions because bitonic merge
    networks are NOT stable, so a tie's panel row may land anywhere in the
    segment. All scans, no gather/scatter."""
    n = hi.shape[0]
    neq = (hi[1:] != hi[:-1]) | (lo[1:] != lo[:-1])
    first = jnp.concatenate([jnp.ones((1,), bool), neq])
    last = jnp.concatenate([neq, jnp.ones((1,), bool)])
    pos = jnp.arange(n, dtype=jnp.int32)
    is_panel = tag == 0
    seg_start = jax.lax.cummax(jnp.where(first, pos, -1), axis=0)
    prev_panel = jax.lax.cummax(jnp.where(is_panel, pos, -1), axis=0)
    seg_end = jax.lax.cummin(jnp.where(last, pos, n), axis=0, reverse=True)
    next_panel = jax.lax.cummin(jnp.where(is_panel, pos, n), axis=0,
                                reverse=True)
    in_segment = (prev_panel >= seg_start) | (next_panel <= seg_end)
    valid = ~((hi == SENT32) & (lo == SENT32))
    return (tag > 0) & in_segment & valid


@functools.partial(jax.jit, static_argnames=("interpret",))
def _join_pallas(phi, plo, qhi, qlo, qtag, interpret: bool = False):
    """TPU path: one streaming bitonic-merge pass over [panel | queries]
    (unequal-run pair merge; panel first on ties), then the segment scan."""
    from zotpu.kernels.setops_merge import _next_pow2
    from zotpu.kernels.sort_pallas import TILE_E, stream_merge_pair_pallas

    MA = max(_next_pow2(phi.shape[0]), TILE_E)
    MB = max(_next_pow2(qhi.shape[0]), TILE_E)

    def padk(x, M):
        return jnp.concatenate([x, jnp.full(M - x.shape[0], SENT32,
                                            jnp.uint32)])

    def padt(x, M):
        # pad tags with 0 (panel id): padded rows are sentinel-keyed and
        # masked by `valid` in _hits_from_merged either way
        return jnp.concatenate([x, jnp.zeros(M - x.shape[0], jnp.uint32)])

    hi = jnp.concatenate([padk(phi, MA), padk(qhi, MB)])
    lo = jnp.concatenate([padk(plo, MA), padk(qlo, MB)])
    tag = jnp.concatenate([jnp.zeros(MA, jnp.uint32), padt(qtag, MB)])
    hi, lo, tag = stream_merge_pair_pallas(hi, lo, tag, nA=MA,
                                           interpret=interpret)
    return _hits_from_merged(hi, lo, tag), tag


@jax.jit
def _join_xla(phi, plo, qhi, qlo, qtag):
    """Portable path: concat + lax.sort with panel-first tie order (panel
    tag 0 < query tags; 3-key sort makes ties deterministic)."""
    hi = jnp.concatenate([phi, qhi])
    lo = jnp.concatenate([plo, qlo])
    tag = jnp.concatenate([jnp.zeros(phi.shape[0], jnp.uint32),
                           qtag.astype(jnp.uint32)])
    hi, lo, tag = jax.lax.sort((hi, lo, tag), num_keys=3)
    return _hits_from_merged(hi, lo, tag), tag


def row_hits_sorted_join(phi, plo, qhi, qlo, n_rows: int, m_per_row: int):
    """Per-row panel-hit counts for a packed (row-major) query batch.

    phi/plo: DENSE sorted unique sentinel-padded panel. qhi/qlo: pack output
    in window order (n_rows * m_per_row,). Returns (n_rows,) int32.
    """
    from zotpu.kernels.dispatch import use_pallas

    m = qhi.shape[0]
    # tag = row id + 1 (0 is reserved for panel rows)
    tag = (jax.lax.broadcasted_iota(jnp.uint32, (n_rows, m_per_row), 0)
           + 1).reshape(-1)
    if use_pallas() and m >= (1 << 15):
        # pre-sort queries (the dominant cost), then ONE streaming merge
        qhi, qlo, tag = jax.lax.sort((qhi, qlo, tag), num_keys=2)
        hit, tag = _join_pallas(phi, plo, qhi, qlo, tag)
    else:
        hit, tag = _join_xla(phi, plo, qhi, qlo, tag)  # sorts the concat
    return _rowsum_by_tag(hit, tag, n_rows)


@functools.partial(jax.jit, static_argnames=("n_rows",))
def _rowsum_by_tag(hit, tag, n_rows: int):
    """Group hit bits by row tag: sort by tag, then segment-sum via scans.

    Tags are DENSE by construction (tag 0 = all panel+padding rows; tag r+1
    occurs exactly m_per_row times for every row r), so the runs of the
    tag-sorted stream are exactly [0, 1, ..., n_rows] in order and run i+1
    IS row i -- no scatter anywhere."""
    tag, hitv = jax.lax.sort((tag, hit.astype(jnp.uint32)), num_keys=1)
    csum = jnp.cumsum(hitv, dtype=jnp.uint32)
    last = jnp.concatenate([tag[1:] != tag[:-1], jnp.ones((1,), bool)])
    ends = jnp.where(last, csum, jnp.uint32(0))
    # stable flag-sort compacts run-end prefix sums to the front in tag order
    flag = (~last).astype(jnp.uint32)
    _, ends_sorted = jax.lax.sort((flag, ends), num_keys=1, is_stable=True)
    runs = ends_sorted[:n_rows + 1]
    prev = jnp.concatenate([jnp.zeros(1, jnp.uint32), runs[:-1]])
    return (runs - prev)[1:].astype(jnp.int32)
