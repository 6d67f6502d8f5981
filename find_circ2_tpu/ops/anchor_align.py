"""K1: batched anchor alignment against the direct-addressed seed index —
the TPU-native replacement for the reference's bowtie2 anchor pass
(SURVEY.md §3.4; SPEC.md §2 fixes the exact contract).

Per anchor, 4 seed queries (2 strands x 2 half-seeds) hit the bucket
table; up to `max_bucket` candidates per query are Hamming-verified in one
vectorized gather+compare; best/second-best/uniqueness statistics follow
the frozen lexicographic orders. Static shapes throughout: the candidate
axis is padded to 4*max_bucket slots and masked.

Positions are int32 here (single-shard genomes < 2^31; the sharded path
in parallel/ keeps per-shard local coordinates).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from find_circ2_tpu.config import Config

LARGE_MM = jnp.int32(255)
LARGE_POS = jnp.int32(2 ** 31 - 1)


class AnchorHits(NamedTuple):
    aligned: jnp.ndarray    # bool [B]
    pos: jnp.ndarray        # int32 [B] global anchor start of best hit
    strand: jnp.ndarray     # int32 [B] 0/1
    mm: jnp.ndarray         # int32 [B]
    n_best: jnp.ndarray     # int32 [B]
    second_mm: jnp.ndarray  # int32 [B]
    qual: jnp.ndarray       # int32 [B]


def _kmers(q: jnp.ndarray, k: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Big-endian base-4 values of q[:, :k] and q[:, k:2k] + validity."""
    weights = (4 ** jnp.arange(k - 1, -1, -1, dtype=jnp.int32))

    def one(h):
        v = jnp.sum(jnp.where(h < 4, h, 0).astype(jnp.int32) * weights,
                    axis=-1)
        ok = jnp.all(h < 4, axis=-1)
        return v, ok

    v0, ok0 = one(q[:, :k])
    v1, ok1 = one(q[:, k:2 * k])
    return jnp.stack([v0, v1], 1), jnp.stack([ok0, ok1], 1)


@partial(jax.jit, static_argnames=("cfg",))
def align_anchors(
    genome: jnp.ndarray,      # uint8 [G]
    offsets: jnp.ndarray,     # int32/uint32 [4^k + 1] bucket offsets
    positions: jnp.ndarray,   # int32 [P] window starts grouped by k-mer
    anchors: jnp.ndarray,     # uint8 [B, a]
    cfg: Config,
) -> AnchorHits:
    """SPEC.md §2 anchor alignment for a batch of anchors."""
    B, a = anchors.shape
    k = cfg.seed_len
    mb = cfg.max_bucket
    P = positions.shape[0]
    G = genome.shape[0]

    anc = anchors.astype(jnp.int32)
    anc_rc = jnp.where(anc[:, ::-1] < 4, 3 - anc[:, ::-1], anc[:, ::-1])

    # Queries: [B, 2 strands, a]
    queries = jnp.stack([anc, anc_rc], axis=1)

    # Seed k-mers: [B, 2, 2] (strand, seed), validity same shape.
    kv_p, ok_p = _kmers(anc, k)
    kv_m, ok_m = _kmers(anc_rc, k)
    kmers = jnp.stack([kv_p, kv_m], axis=1)
    kok = jnp.stack([ok_p, ok_m], axis=1)

    offs = offsets.astype(jnp.int32)
    bucket_lo = jnp.take(offs, kmers, axis=0)
    bucket_n = jnp.take(offs, kmers + 1, axis=0) - bucket_lo
    # Repetitive-seed guard + invalid k-mers [FROZEN].
    usable = kok & (bucket_n <= mb)
    bucket_n = jnp.where(usable, bucket_n, 0)

    # Candidate positions: [B, 2, 2, mb]
    slot = jnp.arange(mb, dtype=jnp.int32)
    cand_idx = bucket_lo[..., None] + slot
    cand_valid = slot < bucket_n[..., None]
    cand_idx = jnp.clip(cand_idx, 0, P - 1)
    wstart = jnp.take(positions, cand_idx, axis=0).astype(jnp.int32)
    seed_off = jnp.array([0, k], dtype=jnp.int32)[None, None, :, None]
    astart = wstart - seed_off                       # anchor start

    # Verify: gather [B, 2, 2, mb, a] windows and compare to the query.
    astart_c = jnp.clip(astart, 0, G - a)
    win = jnp.take(genome, astart_c[..., None]
                   + jnp.arange(a, dtype=jnp.int32), axis=0).astype(jnp.int32)
    q = queries[:, :, None, None, :]                 # [B, 2, 1, 1, a]
    neq = win != q
    window_clean = jnp.all(win < 4, axis=-1)         # [FROZEN] no N/gap
    mm_lo = jnp.sum(neq[..., :k], axis=-1)
    mm = mm_lo + jnp.sum(neq[..., k:], axis=-1)

    # Dedup rule [FROZEN]: seed1 candidates only count if mm_lo > 0.
    seed1 = jnp.arange(2)[None, None, :, None] == 1
    valid = (cand_valid & window_clean
             & ((~seed1) | (mm_lo > 0))
             & (astart == astart_c))                 # drop clamped slots
    mm = jnp.where(valid, mm, LARGE_MM)

    # Flatten candidate axes: [B, C] with C = 2*2*mb.
    C = 4 * mb
    mm_f = mm.reshape(B, C)
    pos_f = astart_c.reshape(B, C)
    strand_f = jnp.broadcast_to(
        jnp.arange(2, dtype=jnp.int32)[None, :, None, None],
        (B, 2, 2, mb)).reshape(B, C)
    valid_f = valid.reshape(B, C)

    # Lexicographic best (mm, strand, pos) [FROZEN].
    m0 = jnp.min(mm_f, axis=1)
    at_m0 = valid_f & (mm_f == m0[:, None])
    strand_best = jnp.min(jnp.where(at_m0, strand_f, 2), axis=1)
    pos_best = jnp.min(
        jnp.where(at_m0 & (strand_f == strand_best[:, None]),
                  pos_f, LARGE_POS), axis=1)
    n_best = jnp.sum(at_m0, axis=1).astype(jnp.int32)

    is_best_slot = (at_m0 & (strand_f == strand_best[:, None])
                    & (pos_f == pos_best[:, None]))
    second_mm = jnp.min(jnp.where(valid_f & ~is_best_slot, mm_f, a + 1),
                        axis=1)

    qual = jnp.where(n_best > 1, 0,
                     jnp.minimum(40, 10 * (second_mm - m0)))
    aligned = (m0 <= cfg.max_anchor_mm)
    return AnchorHits(aligned=aligned, pos=pos_best,
                      strand=strand_best, mm=m0, n_best=n_best,
                      second_mm=second_mm, qual=qual)
