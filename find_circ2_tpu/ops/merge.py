"""On-device junction dedup/merge: sort + segment-combine over junction
keys (BASELINE.json:5/10 "per-shard candidate junctions are merged and
deduplicated via collectives"; SURVEY.md §3.5 aggregation).

`merge_junctions` collapses a detect_batch result into a per-junction
table on device; `merge_tables` re-merges already-merged tables (e.g.
after an all_gather across data shards) — merging is associative and
commutative over integer fields (SURVEY §5 checkpoint row), so any merge
tree yields bit-identical totals regardless of device count or order.

The host Aggregator remains the system of record for sequence-identity
fields (`n_uniq` needs the read strings); this op serves the streaming/
throughput path and the multi-chip collective merge, and its totals are
asserted against the host aggregation in tests.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from find_circ2_tpu.config import Config, ST_JUNCTION

BIGDEF = np.int32(2 ** 30)  # np, not jnp: see ops/anchor_align.py

KEY_FIELDS = ("kind", "chrom", "start", "end", "sense")
SUM_FIELDS = ("n_reads", "uniq_bridges", "n_strand_match")
MAX_FIELDS = ("best_qual_left", "best_qual_right")
MIN_FIELDS = ("edits", "overlap", "n_bp")
ALL_FIELDS = ("valid",) + KEY_FIELDS + SUM_FIELDS + MAX_FIELDS + MIN_FIELDS


def _sort_combine(t: dict) -> dict:
    """Sort a junction table by key, combine rows with equal keys.

    `t` maps ALL_FIELDS to [N] int32 arrays (valid: bool). Output has the
    same schema: distinct junctions packed at the front in key order.
    """
    N = t["valid"].shape[0]
    live = t["valid"]
    k_hi = jnp.where(live, t["kind"] * (1 << 16) + t["chrom"],
                     jnp.int32(1 << 24))
    # start/end are uint32 global positions (up to ~4.29e9): they get
    # their own lexsort keys (packing end*4+sense would overflow).
    k_start = jnp.where(live, t["start"], jnp.uint32(0))
    k_end = jnp.where(live, t["end"], jnp.uint32(0))
    k_sense = jnp.where(live, t["sense"], 0)
    order = jnp.lexsort((k_sense, k_end, k_start, k_hi))

    s = {name: jnp.take(t[name], order, axis=0) for name in ALL_FIELDS}
    s_live = s["valid"]

    same = jnp.ones(N, bool)
    for name in KEY_FIELDS:
        same = same.at[1:].set(same[1:]
                               & (s[name][1:] == s[name][:-1]))
    same = same.at[0].set(False)
    same = same & s_live & jnp.roll(s_live, 1)
    head = s_live & ~same
    seg = jnp.cumsum(head.astype(jnp.int32)) - 1
    seg = jnp.where(s_live, seg, N - 1)

    def seg_sum(x):
        return jax.ops.segment_sum(
            jnp.where(s_live, x, 0).astype(jnp.int32), seg,
            num_segments=N)

    def seg_min(x):
        return jax.ops.segment_min(
            jnp.where(s_live, x, BIGDEF).astype(jnp.int32), seg,
            num_segments=N)

    def seg_max(x):
        return jax.ops.segment_max(
            jnp.where(s_live, x, 0).astype(jnp.int32), seg,
            num_segments=N)

    n_heads = jnp.sum(head.astype(jnp.int32))
    out_valid = jnp.arange(N, dtype=jnp.int32) < n_heads
    head_idx = jnp.nonzero(head, size=N, fill_value=N - 1)[0]

    out = {"valid": out_valid}
    for name in KEY_FIELDS:
        out[name] = jnp.take(s[name], head_idx, axis=0)
    for name in SUM_FIELDS:
        out[name] = seg_sum(s[name])
    for name in MAX_FIELDS:
        out[name] = seg_max(s[name])
    for name in MIN_FIELDS:
        out[name] = seg_min(s[name])
    return out


@partial(jax.jit, static_argnames=("cfg",))
def merge_junctions(res: dict, lens: jnp.ndarray, cfg: Config) -> dict:
    """detect_batch result -> deduplicated per-junction table [B].

    Multi-hit-flagged rows (SPEC §2b) are excluded when present: their
    single-best junction is provisional; the host slow path re-calls and
    re-adds them."""
    live = (res["status"] == ST_JUNCTION) & (lens > 0)
    if "multi" in res:
        live = live & (res["multi"] == 0)
    uniq = ((res["qual_left"] >= cfg.min_uniq_qual)
            & (res["qual_right"] >= cfg.min_uniq_qual) & live)
    t = dict(
        valid=live,
        kind=res["kind"], chrom=res["chrom"], start=res["start"],
        end=res["end"], sense=res["sense"],
        n_reads=jnp.where(live, 1, 0),
        uniq_bridges=jnp.where(uniq, 1, 0),
        n_strand_match=jnp.where(
            (res["align_strand"] == res["sense"]) & live, 1, 0),
        best_qual_left=res["qual_left"],
        best_qual_right=res["qual_right"],
        edits=res["edits"], overlap=res["overlap"], n_bp=res["n_bp"],
    )
    return _sort_combine(t)


@jax.jit
def merge_tables(tables: dict) -> dict:
    """Re-merge a stack of merged tables (fields shaped [K, N] after an
    all_gather across data shards) into one table of length K*N."""
    flat = {name: tables[name].reshape(-1) for name in ALL_FIELDS}
    return _sort_combine(flat)
