"""Vectorized host multi-hit path (SPEC.md §2b), bit-identical to
`models.oracle.call_read`.

The device flags reads whose anchors tie at the best mismatch level
(`multi`, models/pipeline.detect_core); those route to a host pair
exploration. Round-2 measurement: the per-candidate oracle costs ~32 ms
per multi read (repeat-rich libraries are ~15-20% multi), dominating
end-to-end throughput. This module reimplements the same frozen
semantics with numpy vectorization over variants (anchor statistics),
candidates (prefilter extensions) and pairs×splits (breakpoint search,
prefix sums exactly like ops/breakpoint.py) — ~20x faster per read. The
oracle stays the per-candidate ground truth; tests/test_multihit.py
asserts field-level equality on repeat-heavy libraries.
"""

from __future__ import annotations

import numpy as np

from find_circ2_tpu.config import (
    Config,
    KIND_CIRCULAR,
    KIND_LINEAR,
    SENSE_MINUS,
    SENSE_PLUS,
    ST_ANCHOR_OVERLAP,
    ST_DIFF_CHROM,
    ST_DIFF_STRAND,
    ST_JUNCTION,
    ST_NO_JUNCTION,
    ST_PREFILTERED,
    ST_TOO_LONG,
    ST_TOO_SHORT,
    ST_UNALIGNED_A,
    ST_UNALIGNED_B,
)
from find_circ2_tpu.index.build import SeedIndex
from find_circ2_tpu.io.genome import Genome
from find_circ2_tpu.io.twobit import REVCOMP_LUT, seq_to_codes
from find_circ2_tpu.models.oracle import AnchorHit, ReadCall, _sense_signal

_G, _T, _A, _C = 2, 3, 0, 1


def _variant_keys(q: np.ndarray, pk: int, ball: int = 1
                  ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(p12, s8, mm) int64 [V] for the exact query + all variants within
    Hamming distance `ball`, in the oracle's enumeration order
    (1-mm: position-major, r=1..3; 2-mm: (j1, j2, r1, r2) nested loops
    exactly as oracle.anchor_candidates)."""
    a = q.size
    V = 1 + 3 * a
    u = np.tile(q.astype(np.int64), (V, 1))
    js = np.repeat(np.arange(a), 3)
    r = np.tile(np.arange(1, 4), a)
    u[1:][np.arange(3 * a), js] = (q[js].astype(np.int64) + r) % 4
    mm = np.concatenate([[0], np.ones(3 * a, np.int64)])
    if ball >= 2:
        j1, j2 = np.triu_indices(a, k=1)
        P = j1.size                                # a*(a-1)/2 pairs
        j1 = np.repeat(j1, 9)
        j2 = np.repeat(j2, 9)
        r1 = np.tile(np.repeat(np.arange(1, 4), 3), P)
        r2 = np.tile(np.tile(np.arange(1, 4), 3), P)
        u2 = np.tile(q.astype(np.int64), (9 * P, 1))
        rows = np.arange(9 * P)
        u2[rows, j1] = (q[j1].astype(np.int64) + r1) % 4
        u2[rows, j2] = (q[j2].astype(np.int64) + r2) % 4
        u = np.concatenate([u, u2])
        mm = np.concatenate([mm, np.full(9 * P, 2, np.int64)])
    pw_p = 4 ** np.arange(pk - 1, -1, -1, dtype=np.int64)
    pw_s = 4 ** np.arange(a - pk - 1, -1, -1, dtype=np.int64)
    return u[:, :pk] @ pw_p, u[:, pk:] @ pw_s, mm


def anchor_candidates_fast(genome: Genome, index: SeedIndex,
                           anchor: np.ndarray, cfg: Config, ball: int = 1
                           ) -> tuple[AnchorHit, list[tuple[int, int]]]:
    """Drop-in equivalent of oracle.anchor_candidates (SPEC §2/§2b,
    incl. the [FROZEN v4] ball=2 rescue enumeration)."""
    a, pk = cfg.anchor_len, cfg.prefix_len
    if np.any(anchor >= 4):
        return AnchorHit(aligned=False), []
    rc = REVCOMP_LUT[anchor[::-1]]
    p12s, s8s, mms = [], [], []
    for q in (anchor, rc):
        p12, s8, mm1 = _variant_keys(q, pk, ball)
        p12s.append(p12)
        s8s.append(s8)
        mms.append(mm1)
    p12 = np.concatenate(p12s)          # [2V]: '+' variants then '-'
    s8 = np.concatenate(s8s)
    mm = np.concatenate(mms)
    V = p12s[0].size
    strand = np.repeat(np.arange(2, dtype=np.int64), V)

    offs = index.offsets          # uint32 [4^pk + 1]; never copy (16M+)
    sv = index.suffix_vals
    lo_b = offs[p12].astype(np.int64)
    hi_b = offs[p12 + 1].astype(np.int64)
    lo = np.empty(2 * V, np.int64)
    hi = np.empty(2 * V, np.int64)
    for i in range(2 * V):
        l, h = lo_b[i], hi_b[i]
        if l == h:
            lo[i] = hi[i] = l
        else:
            lo[i] = l + np.searchsorted(sv[l:h], s8[i], "left")
            hi[i] = l + np.searchsorted(sv[l:h], s8[i], "right")
    count = hi - lo
    # Empty or repetitive-20-mer guard [FROZEN]: contributes nothing.
    valid = (count > 0) & (count <= cfg.max_bucket)
    if not valid.any():
        return AnchorHit(aligned=False), []
    first = np.where(valid, index.positions[np.minimum(
        lo, index.positions.size - 1)].astype(np.int64), 0)
    # Best variant: lexicographic min of (mm, strand, first_pos) over
    # valid variants (variant position sets are disjoint, so ties below
    # the position level cannot occur).
    key = ((mm * 2 + strand) << np.int64(33)) | first
    key = np.where(valid, key, np.int64(1) << 62)
    b = int(np.argmin(key))
    best_mm = int(mm[b])
    n_best = int(count[valid & (mm == best_mm)].sum())
    if n_best > 1:
        second_mm = best_mm
    else:
        others = valid.copy()
        others[b] = False
        second_mm = int(mm[others].min()) if others.any() else a + 1
    qual = 0 if n_best > 1 else min(40, 10 * (second_mm - best_mm))
    hit = AnchorHit(aligned=best_mm <= max(cfg.max_anchor_mm, ball),
                    pos=int(first[b]), strand=int(strand[b]), mm=best_mm,
                    n_best=n_best, second_mm=second_mm, qual=qual)
    at_best = np.flatnonzero(valid & (mm == best_mm))
    pairs = sorted((int(strand[i]), int(p))
                   for i in at_best
                   for p in index.positions[lo[i]:hi[i]])
    return hit, pairs[:cfg.max_pair_hits]


def _window_mm(G: np.ndarray, starts: np.ndarray, query: np.ndarray
               ) -> np.ndarray:
    """Hamming(query, G[start:start+l]) per start (codes >=4 mismatch)."""
    l = query.size
    win = G[starts[:, None] + np.arange(l)[None, :]]
    q = query[None, :]
    return ((q != win) | (q >= 4) | (win >= 4)).sum(axis=1)


def _prefiltered(genome: Genome, codes, codes_rc, candsA, candsB,
                 cfg: Config) -> bool:
    """SPEC §2b prefilter: ANY candidate extends contiguously (§6)."""
    G = genome.codes
    l, a = codes.size, cfg.anchor_len
    for cands, side in ((candsA, "A"), (candsB, "B")):
        if not cands:
            continue
        s = np.asarray([c[0] for c in cands], np.int64)
        p = np.asarray([c[1] for c in cands], np.int64)
        # §6 geometries: A+: G[p:p+l] vs R; A-: G[p+a-l:p+a] vs R';
        # B+: G[p+a-l:p+a] vs R; B-: G[p:p+l] vs R'.
        plus_at_p = (side == "A")
        starts = np.where((s == 0) == plus_at_p, p, p + a - l)
        for st in (0, 1):
            m = s == st
            if not m.any():
                continue
            q = codes if st == 0 else codes_rc
            if (_window_mm(G, starts[m], q) <= cfg.prefilter_mm).any():
                return True
    return False


def _explore_pairs(genome: Genome, codes, codes_rc, candsA, candsB,
                   hitA: AnchorHit, hitB: AnchorHit, cfg: Config):
    """SPEC §2b pair exploration, vectorized over pairs x splits.

    Returns (align_strand, pA, pB, qual_left, qual_right,
    (kind, start, end, edits, n_bp, best_bp)) of the winning pair, or
    None. Matches oracle.call_read's loop exactly: winning pair =
    lexicographic min of (edits, !canon+, !canon-, pA, pB) [FROZEN]."""
    G = genome.codes
    l, a = codes.size, cfg.anchor_len
    wins = []
    for st in (0, 1):
        pa_list = [p for s, p in (candsA if st == 0 else candsB)
                   if s == st]
        pb_list = [p for s, p in (candsB if st == 0 else candsA)
                   if s == st]
        if not pa_list or not pb_list:
            continue
        # Strand canonicalization [FROZEN] SPEC §3: '-' pairs swap roles.
        R = codes if st == 0 else codes_rc
        quals = ((hitA.qual, hitB.qual) if st == 0
                 else (hitB.qual, hitA.qual))
        pA = np.repeat(np.asarray(pa_list, np.int64), len(pb_list))
        pB = np.tile(np.asarray(pb_list, np.int64), len(pa_list))
        ok = np.asarray(genome.chrom_of(pA)) == \
            np.asarray(genome.chrom_of(pB))
        endB = pB + a
        linear = pA + a <= pB
        circular = endB <= pA
        ok &= linear | circular
        if not ok.any():
            continue
        pA, pB, endB = pA[ok], pB[ok], endB[ok]
        kind = np.where(endB <= pA, KIND_CIRCULAR, KIND_LINEAR)
        P = pA.size
        # Windows of l+2: left piece + donor dinuc, right piece + acceptor
        # dinuc (gap padding >= max_read_len+2 keeps these in-bounds).
        GA = G[pA[:, None] + np.arange(l + 2)[None, :]].astype(np.int64)
        GB = G[(endB - l - 2)[:, None]
               + np.arange(l + 2)[None, :]].astype(np.int64)
        Rq = R[None, :].astype(np.int64)
        neqA = (Rq != GA[:, :l]) | (Rq >= 4) | (GA[:, :l] >= 4)
        neqB = (Rq != GB[:, 2:]) | (Rq >= 4) | (GB[:, 2:] >= 4)
        prefA = np.zeros((P, l + 1), np.int64)
        prefB = np.zeros((P, l + 1), np.int64)
        np.cumsum(neqA, axis=1, out=prefA[:, 1:])
        np.cumsum(neqB, axis=1, out=prefB[:, 1:])
        score = prefA + (prefB[:, l:l + 1] - prefB)     # [P, l+1] at k
        k = np.arange(l + 1)[None, :]
        k_valid = (k >= a) & (k <= l - a)
        BIG = np.int64(1 << 40)
        score = np.where(k_valid, score, BIG)
        edits = score.min(axis=1)
        n_bp = ((score == edits[:, None]) & k_valid).sum(axis=1)
        # Signal dinucs per split, exactly as ops/breakpoint.py: donor
        # dinuc = GA[k:k+2], acceptor dinuc = GB[k:k+2].
        d0, d1 = GA[:, :l + 1], GA[:, 1:l + 2]
        a0, a1 = GB[:, :l + 1], GB[:, 1:l + 2]
        canon_p = (d0 == _G) & (d1 == _T) & (a0 == _A) & (a1 == _G)
        canon_m = (d0 == _C) & (d1 == _T) & (a0 == _A) & (a1 == _C)
        # Frozen split tie-break: (score, !canon+, !canon-, k).
        tkey = ((score * 2 + ~canon_p) * 2 + ~canon_m) * (l + 2) + k
        tkey = np.where(k_valid, tkey, BIG * (l + 2))
        best_k = tkey.argmin(axis=1)
        rows = np.arange(P)
        donor = pA + best_k
        acceptor = endB - (l - best_k)
        start = np.where(kind == KIND_CIRCULAR, acceptor, donor)
        end = np.where(kind == KIND_CIRCULAR, donor, acceptor)
        viable = ~((kind == KIND_LINEAR) & (end <= start))
        cp = canon_p[rows, best_k]
        cm = canon_m[rows, best_k]
        for i in np.flatnonzero(viable):
            wins.append(((int(edits[i]), not cp[i], not cm[i],
                          int(pA[i]), int(pB[i])),
                         (st, int(pA[i]), int(pB[i]), quals[0], quals[1],
                          (int(kind[i]), int(start[i]), int(end[i]),
                           int(edits[i]), int(n_bp[i]),
                           int(best_k[i])))))
    if not wins:
        return None
    win = min(wins, key=lambda w: w[0])[1]
    if cfg.pair_rescue and (hitA.n_best > 1 or hitB.n_best > 1):
        # Pair-margin bridge rescue [FROZEN v4], exactly as
        # oracle.call_read: margin vs the best explored pair at a
        # different (kind, start, end).
        kind, start, end, w_edits = win[5][0], win[5][1], win[5][2], \
            win[5][3]
        alts = [w[5][3] for _, w in wins
                if (w[5][0], w[5][1], w[5][2]) != (kind, start, end)]
        margin = (min(alts) - w_edits) if alts else (a + 1)
        if margin > 0:
            rq = min(40, 10 * margin)
            win = (win[0], win[1], win[2], max(win[3], rq),
                   max(win[4], rq), win[5])
    return win


def call_read_multi(genome: Genome, index: SeedIndex, name: str,
                    seq: str, cfg: Config,
                    prefilter: bool = True) -> ReadCall:
    """Vectorized twin of oracle.call_read (SPEC §2-§4 + §2b)."""
    l = len(seq)
    a = cfg.anchor_len
    if l < 2 * a:
        return ReadCall(name, seq, ST_TOO_SHORT)
    if l > cfg.max_read_len:
        return ReadCall(name, seq, ST_TOO_LONG)
    codes = seq_to_codes(seq)
    codes_rc = REVCOMP_LUT[codes[::-1]]
    hitA, candsA = anchor_candidates_fast(genome, index, codes[:a], cfg)
    hitB, candsB = anchor_candidates_fast(genome, index, codes[-a:], cfg)
    # §2 2-mm anchor rescue [FROZEN v4], gated exactly as
    # oracle.call_read (mate must align at <=1 mm).
    if cfg.rescue_anchor_mm >= 2:
        if not hitA.aligned and hitB.aligned:
            hitA, candsA = anchor_candidates_fast(genome, index,
                                                  codes[:a], cfg, ball=2)
        elif not hitB.aligned and hitA.aligned:
            hitB, candsB = anchor_candidates_fast(genome, index,
                                                  codes[-a:], cfg,
                                                  ball=2)
    if prefilter and _prefiltered(genome, codes, codes_rc, candsA,
                                  candsB, cfg):
        return ReadCall(name, seq, ST_PREFILTERED)
    if not hitA.aligned:
        return ReadCall(name, seq, ST_UNALIGNED_A)
    if not hitB.aligned:
        return ReadCall(name, seq, ST_UNALIGNED_B)

    best = _explore_pairs(genome, codes, codes_rc, candsA, candsB,
                          hitA, hitB, cfg)
    if best is not None:
        s, pA, pB, qual_left, qual_right, pj = best
        kind, start, end, edits, n_bp, best_bp = pj
        endB = pB + a
        sense, signal = _sense_signal(genome.codes, kind, start, end, s)
        seg1 = (pA, pA + best_bp)
        seg2 = (endB - (l - best_bp), endB)
        overlap = max(0, min(seg1[1], seg2[1]) - max(seg1[0], seg2[0]))
        return ReadCall(
            name=name, seq=seq, status=ST_JUNCTION, kind=kind,
            chrom_idx=int(genome.chrom_of(pA)), start=start, end=end,
            sense=sense, align_strand=s, edits=edits, n_bp=n_bp,
            overlap=overlap, qual_left=qual_left, qual_right=qual_right,
            signal=signal,
        )

    # Fallback [FROZEN]: v2 single-best status chain.
    if hitA.strand != hitB.strand:
        return ReadCall(name, seq, ST_DIFF_STRAND)
    if int(genome.chrom_of(hitA.pos)) != int(genome.chrom_of(hitB.pos)):
        return ReadCall(name, seq, ST_DIFF_CHROM)
    s = hitA.strand
    pA, pB = ((hitA.pos, hitB.pos) if s == 0 else (hitB.pos, hitA.pos))
    endB = pB + a
    if pA + a <= pB or endB <= pA:
        return ReadCall(name, seq, ST_NO_JUNCTION)
    return ReadCall(name, seq, ST_ANCHOR_OVERLAP)
