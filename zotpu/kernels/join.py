"""Sort-merge membership join: packed query k-mers vs a sorted panel.

Reference analog: zotmer's scan binary-searches each k-mer in the panel
(SURVEY.md section 3.5). The round-1 device translation
(``kernels/search.member2``) kept that shape -- ~log2(n) panel GATHERS per
query -- but XLA:TPU lowers gather to ~0.03 Gelem/s (docs/PERF_NOTES.md), so
scan measured ~2 Mkmer/s. TPU has no vector-gather unit; the gather-free
formulation is a SORT-MERGE JOIN. Round-2 restructure (the round-2.0 shape
paid FOUR full-width lax.sorts per batch; profiled 53 Mkmer/s):

1. transform keys to key* = key*2 + is_probe (51 bits still fit the
   (hi, lo) u32 pair since hi < 2^31): the tie-break rides INSIDE the key,
   so even an unstable bitonic merge lands the panel row FIRST in its
   equal-key segment -- no bidirectional segment scans needed;
2. sort queries by key*, carrying the flat probe index as payload;
3. ONE streaming merge pass against the sorted (transformed) panel;
4. hit bits via two cummax scans (previous-panel-position vs segment
   start);
5. per-row counts: ONE keys-only u32 sort of ``idx*2 + hit`` restores
   probe order (panel rows carry idx = n_probes and sink to the tail),
   then a reshape row-sum -- replacing the round-2.0 tag-sort +
   flag-sort-compaction pair of full-width sorts.

Everything is sorts, scans, and one Pallas merge pass -- the primitives this
codebase already runs at full VPU rate.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from zotpu.kernels.pack import SENT32


def _transform_keys(hi, lo, is_probe: bool):
    """key -> key* = key*2 + is_probe, still two u32 words (51 bits max:
    valid canonical keys have hi < 2^31). Monotone in (key, is_probe), so a
    2-channel sort/merge of key* is a 3-key (hi, lo, side) sort with panel
    rows (side 0) FIRST in every equal-key segment. Probe-side sentinel
    rows (0xFFFF.., 0xFFFF..) map to themselves; panel-side pads map to
    (0xFFFF.., 0xFFFF..FE) -- both have hi* >= 2^31 and are masked as
    invalid downstream."""
    b = jnp.uint32(1) if is_probe else jnp.uint32(0)
    return (hi << 1) | (lo >> 31), (lo << 1) | b


def _hits_from_merged_star(hi_s, lo_s, idx, n_probes: int):
    """Per-element hit bits from a key*-merged stream.

    A panel row is the FIRST element of its segment by construction (panel
    keys are unique and key* makes the side bit the lowest key bit), so
    hit(probe) = "my segment's first element is a panel row" -- ONE cummax
    propagating (pos*2 + is_panel) from segment firsts. Returns (hit, bkey)
    where bkey = min(idx, n_probes)*2 + hit is the backward-sort key."""
    n = hi_s.shape[0]
    is_probe = (lo_s & 1) == 1
    klo = lo_s >> 1                      # key equality = (hi_s, lo_s >> 1)
    neq = (hi_s[1:] != hi_s[:-1]) | (klo[1:] != klo[:-1])
    first = jnp.concatenate([jnp.ones((1,), bool), neq])
    pos = jnp.arange(n, dtype=jnp.int32)
    lead = jnp.where(first, pos * 2 + (~is_probe).astype(jnp.int32), -1)
    lead = jax.lax.cummax(lead, axis=0)
    valid = hi_s < jnp.uint32(0x80000000)   # real keys only (see transform)
    hit = is_probe & ((lead & 1) == 1) & valid
    bkey = (jnp.minimum(idx, jnp.uint32(n_probes)) << 1) | hit.astype(
        jnp.uint32)
    return hit, bkey


@functools.partial(jax.jit, static_argnames=("n_rows", "m_per_row"))
def _rowsum_by_idx(bkey, n_rows: int, m_per_row: int):
    """One keys-only u32 sort of idx*2+hit: probes (idx < n_probes, each idx
    exactly once) come back in original order with their hit bit in the LSB;
    panel/pad rows (idx == n_probes) sink to the tail. Then a reshape
    row-sum. Replaces two full-width payload sorts (round-2.0 shape)."""
    m = n_rows * m_per_row
    (bkey,) = jax.lax.sort((bkey,), num_keys=1)
    hits = (bkey[:m] & jnp.uint32(1)).astype(jnp.int32)
    return hits.reshape(n_rows, m_per_row).sum(axis=1, dtype=jnp.int32)


def _hits_from_merged(hi, lo, tag):
    """Post-merge: per-row hit bits (TAG-contract path, used by the sharded
    pulldown in dist/shuffle.py). Rows sorted by (hi, lo); tag==0 marks
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


@functools.partial(jax.jit, static_argnames=("n_probes", "interpret"))
def _join_pallas_star(phi_s, plo_s, qhi_s, qlo_s, idx, n_probes: int,
                      interpret: bool = False):
    """TPU path: one streaming bitonic-merge pass over the key*-transformed
    [panel | queries] (no cross-side ties by construction) with the hit bit
    computed in the kernel epilogue (sort_pallas.stream_join_pair_pallas) --
    no separate XLA hit-scan pass and one output channel instead of three.
    Inputs already transformed; queries sorted by key* with idx payload.
    Returns bkey (see _hits_from_merged_star, the XLA formulation of the
    same rule).

    The merge comparator is 3-key (key*, idx): sentinel-KEY probe rows
    (invalid pack windows) carry meaningful idx, and with a 2-key network
    they tie with sentinel-masked window slack -- the network may emit a
    slack row in their place, duplicating one idx and losing another
    (observed: 40% sentinel probes at 3 tiles corrupted 40% of idx
    coverage). Both sides are (key*, idx)-sorted: the panel's tag is
    constant and the probe fwd sort is lax.sort's default STABLE sort over
    ascending idx."""
    from zotpu.kernels.setops_merge import _next_pow2
    from zotpu.kernels.sort_pallas import TILE_E, stream_join_pair_pallas

    MA = max(_next_pow2(phi_s.shape[0]), TILE_E)
    MB = max(_next_pow2(qhi_s.shape[0]), TILE_E)

    def pad(x, M, fill):
        return jnp.concatenate([x, jnp.full(M - x.shape[0], fill,
                                            jnp.uint32)])

    # pads keep each side sorted: hi* = SENT32 > any valid hi* (< 2^31);
    # panel pads keep the panel side bit (lo* even), probe pads idx=n_probes
    hi = jnp.concatenate([pad(phi_s, MA, SENT32), pad(qhi_s, MB, SENT32)])
    lo = jnp.concatenate([pad(plo_s, MA, 0xFFFFFFFE),
                          pad(qlo_s, MB, SENT32)])
    tag = jnp.concatenate([jnp.full(MA, n_probes, jnp.uint32),
                           pad(idx, MB, n_probes)])
    return stream_join_pair_pallas(hi, lo, tag, nA=MA, n_probes=n_probes,
                                   interpret=interpret)


@functools.partial(jax.jit, static_argnames=("n_probes",))
def _join_xla_star(phi_s, plo_s, qhi_s, qlo_s, idx, n_probes: int):
    """Portable path: concat + 2-key lax.sort of the key*-transformed rows
    (the side bit lives in the key, so no third sort channel is needed)."""
    hi = jnp.concatenate([phi_s, qhi_s])
    lo = jnp.concatenate([plo_s, qlo_s])
    tag = jnp.concatenate([jnp.full(phi_s.shape[0], n_probes, jnp.uint32),
                           idx])
    hi, lo, tag = jax.lax.sort((hi, lo, tag), num_keys=2)
    _, bkey = _hits_from_merged_star(hi, lo, tag, n_probes)
    return bkey


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
    if n_rows * m_per_row != m:
        raise ValueError(f"query length {m} != {n_rows} x {m_per_row}")
    if m >= 1 << 30:
        raise ValueError(f"batch of {m} probes exceeds the 2^30 idx*2+hit "
                         f"key budget; split the batch")
    phi_s, plo_s = _transform_keys(phi, plo, is_probe=False)
    qhi_s, qlo_s = _transform_keys(qhi, qlo, is_probe=True)
    idx = jnp.arange(m, dtype=jnp.uint32)
    if use_pallas() and m >= (1 << 15):
        # pre-sort queries (the dominant cost), then ONE streaming merge.
        # STABILITY is load-bearing: _join_pallas_star's 3-key network needs
        # the probe side sorted by (key*, idx), which the stable sort of
        # ascending idx provides for free.
        qhi_s, qlo_s, idx = jax.lax.sort((qhi_s, qlo_s, idx), num_keys=2,
                                         is_stable=True)
        bkey = _join_pallas_star(phi_s, plo_s, qhi_s, qlo_s, idx, m)
    else:
        bkey = _join_xla_star(phi_s, plo_s, qhi_s, qlo_s, idx, m)
    return _rowsum_by_idx(bkey, n_rows, m_per_row)
