"""K2 as a Pallas TPU kernel: the banded breakpoint scan of SURVEY.md
§3.3 / BASELINE.json:5, computed in VMEM with the prefix sums on the MXU.

Division of labor: XLA performs the two genome window gathers (GA, GBw —
random HBM access is the compiler's job); the kernel consumes the
windows and produces every per-read junction field in one fused pass:

  * mismatch indicators (VPU compares),
  * mmL/mmR for every split via a triangular-ones matmul — an [Lp x Lp]
    f32 contraction on the systolic array replaces the serial cumsum
    (counts <= Lp < 2^24 so f32 is exact),
  * canonical GT/AG signal tests for every split from the same windows,
  * the frozen lexicographic tie-break (score, canon+, canon-, k) as one
    integer argmin.

Bit-identical to ops/breakpoint.breakpoint_search (asserted in
tests/test_pallas.py, which runs the kernel in interpreter mode on CPU);
the jnp path remains the fallback for non-TPU backends.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from find_circ2_tpu.config import (
    Config,
    KIND_CIRCULAR,
    SENSE_MINUS,
    SENSE_PLUS,
)

_A, _C, _G, _T = 0, 1, 2, 3
BIG = 1 << 20
BLOCK = 256  # batch rows per kernel instance


def _kernel(reads_ref, lens_ref, pA_ref, endB_ref, kind_ref, strand_ref,
            ga_ref, gbw_ref,
            start_ref, end_ref, sense_ref, edits_ref, nbp_ref,
            overlap_ref, signal_ref, nojunc_ref, bestk_ref,
            *, cfg: Config, Lp: int):
    a = cfg.anchor_len
    R = reads_ref[...].astype(jnp.int32)            # [B, Lp]
    lens = lens_ref[...][:, 0]                      # [B, 1] -> [B]
    # Positions are uint32 bit patterns carried in int32 refs; convert
    # back (signed->unsigned wraps mod 2^32 = bitcast) and do all
    # position arithmetic unsigned.
    pA = pA_ref[...][:, 0].astype(jnp.uint32)
    endB = endB_ref[...][:, 0].astype(jnp.uint32)
    lens_u = lens.astype(jnp.uint32)
    kind = kind_ref[...][:, 0]
    align_strand = strand_ref[...][:, 0]
    GA = ga_ref[...].astype(jnp.int32)              # [B, Lp+2]
    GBw = gbw_ref[...].astype(jnp.int32)

    B = R.shape[0]
    pos = jax.lax.broadcasted_iota(jnp.int32, (B, Lp), 1)
    in_read = pos < lens[:, None]

    GA_r = GA[:, :Lp]
    GB_r = GBw[:, 2:]
    neqA = ((R != GA_r) | (R >= 4) | (GA_r >= 4)) & in_read
    neqB = ((R != GB_r) | (R >= 4) | (GB_r >= 4)) & in_read

    # Prefix sums on the MXU: pref[:, k] = sum_{i <= k} neq[:, i].
    tri = (jax.lax.broadcasted_iota(jnp.int32, (Lp, Lp), 0)
           <= jax.lax.broadcasted_iota(jnp.int32, (Lp, Lp), 1)
           ).astype(jnp.float32)
    prefA = jnp.dot(neqA.astype(jnp.float32), tri,
                    preferred_element_type=jnp.float32).astype(jnp.int32)
    prefB = jnp.dot(neqB.astype(jnp.float32), tri,
                    preferred_element_type=jnp.float32).astype(jnp.int32)
    # Mosaic has no general take_along_axis: totB is just the row sum.
    totB = jnp.sum(neqB.astype(jnp.int32), axis=1, keepdims=True)

    # score(k) for k in [0, Lp]: mmL(k) + totB - mmR_prefix(k).
    k_ax = jax.lax.broadcasted_iota(jnp.int32, (B, Lp + 1), 1)
    zcol = jnp.zeros((B, 1), jnp.int32)
    prefA_x = jnp.concatenate([zcol, prefA], axis=1)
    prefB_x = jnp.concatenate([zcol, prefB], axis=1)
    score = prefA_x + (totB - prefB_x)
    k_valid = (k_ax >= a) & (k_ax <= lens[:, None] - a)
    score = jnp.where(k_valid, score, BIG)

    edits = jnp.min(score, axis=1)
    n_bp = jnp.sum((score == edits[:, None]) & k_valid,
                   axis=1).astype(jnp.int32)

    k_u = k_ax.astype(jnp.uint32)
    donor = pA[:, None] + k_u
    acceptor = endB[:, None] + k_u - lens_u[:, None]
    is_circ = (kind == KIND_CIRCULAR)[:, None]
    j_start = jnp.where(is_circ, acceptor, donor)
    j_end = jnp.where(is_circ, donor, acceptor)

    # Dinucleotides at every split are static shifts of the windows.
    d0 = GA[:, 0:Lp + 1]
    d1 = GA[:, 1:Lp + 2]
    a0 = GBw[:, 0:Lp + 1]
    a1 = GBw[:, 1:Lp + 2]
    canon_p = (d0 == _G) & (d1 == _T) & (a0 == _A) & (a1 == _G)
    canon_m = (d0 == _C) & (d1 == _T) & (a0 == _A) & (a1 == _C)

    key = (score * 8 + jnp.where(canon_p, 0, 4)
           + jnp.where(canon_m, 0, 2)) * (Lp + 2) + k_ax
    key = jnp.where(k_valid, key, jnp.int32(2 ** 30))
    # argmin + per-row selection via one-hot masked reductions (Mosaic
    # supports reduces, not row-indexed gathers). Keys are distinct per
    # row (k is the low field), so the one-hot picks exactly one slot.
    best_key = jnp.min(key, axis=1)
    onehot = key == best_key[:, None]
    best_k = jnp.sum(jnp.where(onehot, k_ax, 0), axis=1)

    def sel(arr):
        return jnp.sum(jnp.where(onehot, arr.astype(jnp.int32), 0),
                       axis=1)

    def sel_u(arr):
        # One slot per row is nonzero, so the uint32 sum never wraps.
        return jnp.sum(jnp.where(onehot, arr, jnp.uint32(0)), axis=1)

    b_start_u = sel_u(j_start)
    b_end_u = sel_u(j_end)
    b_cp = sel(canon_p)
    b_cm = sel(canon_m)
    b_d0, b_d1, b_a0, b_a1 = sel(d0), sel(d1), sel(a0), sel(a1)

    sense = jnp.where(b_cp, SENSE_PLUS,
                      jnp.where(b_cm, SENSE_MINUS,
                                align_strand)).astype(jnp.int32)

    def comp(x):
        return jnp.where(x < 4, 3 - x, x)

    sig_p = jnp.stack([b_d0, b_d1, b_a0, b_a1], axis=1)
    sig_m = jnp.stack([comp(b_a1), comp(b_a0), comp(b_d1), comp(b_d0)],
                      axis=1)
    signal = jnp.where((sense == SENSE_MINUS)[:, None], sig_m, sig_p)

    best_k_u = best_k.astype(jnp.uint32)
    seg2_s = endB + best_k_u - lens_u
    min_e = jnp.minimum(pA + best_k_u, endB)
    max_s = jnp.maximum(pA, seg2_s)
    overlap = jnp.where(min_e > max_s, min_e - max_s,
                        jnp.uint32(0)).astype(jnp.int32)
    no_junction = (kind != KIND_CIRCULAR) & (b_end_u <= b_start_u)

    # Outputs carry the uint32 bit pattern in int32 refs.
    start_ref[...] = b_start_u.astype(jnp.int32)[:, None]
    end_ref[...] = b_end_u.astype(jnp.int32)[:, None]
    sense_ref[...] = sense[:, None]
    edits_ref[...] = edits[:, None]
    nbp_ref[...] = n_bp[:, None]
    overlap_ref[...] = overlap[:, None]
    signal_ref[...] = signal
    nojunc_ref[...] = no_junction.astype(jnp.int32)[:, None]
    bestk_ref[...] = best_k[:, None]


@partial(jax.jit,
         static_argnames=("cfg", "nbases", "interpret"))
def breakpoint_search_pallas(
    gpacked: jnp.ndarray,
    nbases: int,
    reads: jnp.ndarray,
    lens: jnp.ndarray,
    pA: jnp.ndarray,
    endB: jnp.ndarray,
    kind: jnp.ndarray,
    align_strand: jnp.ndarray,
    cfg: Config,
    interpret: bool = False,
):
    """Drop-in replacement for ops.breakpoint.breakpoint_search."""
    from find_circ2_tpu.ops.packed import gather_window

    B, Lp = reads.shape
    # Window gathers stay in XLA (same as the jnp path). Position math in
    # uint32 (see ops/breakpoint.py).
    startA = jnp.clip(pA, 0, nbases - (Lp + 2))
    GA = gather_window(gpacked, startA, Lp + 2)
    startB = jnp.clip(endB - lens.astype(jnp.uint32) - 2, 0,
                      nbases - (Lp + 2))
    GBw = gather_window(gpacked, startB, Lp + 2)

    pad = (-B) % BLOCK
    if pad:
        def p2(x):
            return jnp.pad(x, ((0, pad), (0, 0)))

        def p1(x):
            return jnp.pad(x, (0, pad))
        reads, GA, GBw = p2(reads), p2(GA), p2(GBw)
        lens, pA, endB = p1(lens), p1(pA), p1(endB)
        kind, align_strand = p1(kind), p1(align_strand)
    Bp = B + pad

    grid = (Bp // BLOCK,)

    # All per-row vectors travel as [B, 1] — Mosaic wants >= 2-D operands.
    def row_spec(width=1):
        return pl.BlockSpec((BLOCK, width), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    def col(x):
        return x.astype(jnp.int32)[:, None]

    out_shapes = dict(
        start=jax.ShapeDtypeStruct((Bp, 1), jnp.int32),
        end=jax.ShapeDtypeStruct((Bp, 1), jnp.int32),
        sense=jax.ShapeDtypeStruct((Bp, 1), jnp.int32),
        edits=jax.ShapeDtypeStruct((Bp, 1), jnp.int32),
        n_bp=jax.ShapeDtypeStruct((Bp, 1), jnp.int32),
        overlap=jax.ShapeDtypeStruct((Bp, 1), jnp.int32),
        signal=jax.ShapeDtypeStruct((Bp, 4), jnp.int32),
        no_junction=jax.ShapeDtypeStruct((Bp, 1), jnp.int32),
        best_k=jax.ShapeDtypeStruct((Bp, 1), jnp.int32),
    )
    names = list(out_shapes)
    outs = pl.pallas_call(
        partial(_kernel, cfg=cfg, Lp=Lp),
        grid=grid,
        in_specs=[
            row_spec(Lp),            # reads
            row_spec(), row_spec(), row_spec(), row_spec(), row_spec(),
            row_spec(Lp + 2),        # GA
            row_spec(Lp + 2),        # GBw
        ],
        out_specs=[row_spec(4) if n == "signal" else row_spec()
                   for n in names],
        out_shape=[out_shapes[n] for n in names],
        interpret=interpret,
    )(reads, col(lens), col(pA), col(endB), col(kind),
      col(align_strand), GA, GBw)
    res = {}
    for n, v in zip(names, outs):
        v = v[:B]
        if n == "signal":
            res[n] = v
        elif n == "no_junction":
            res[n] = v[:, 0].astype(jnp.bool_)
        elif n in ("start", "end"):
            # int32 bit pattern -> uint32 global position.
            res[n] = v[:, 0].astype(jnp.uint32)
        else:
            res[n] = v[:, 0]
    return res
