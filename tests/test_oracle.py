"""CPU-oracle tests: anchor alignment, breakpoint search, end-to-end calls
on simulated data with known truth (SURVEY.md §4 test strategy)."""

import numpy as np

from find_circ2_tpu.config import (Config, KIND_CIRCULAR, KIND_LINEAR,
                                   SENSE_MINUS, SENSE_PLUS, ST_JUNCTION,
                                   ST_PREFILTERED, ST_TOO_SHORT)
from find_circ2_tpu.index.build import build_index
from find_circ2_tpu.io.genome import Genome
from find_circ2_tpu.io.twobit import codes_to_seq, revcomp_seq, seq_to_codes
from find_circ2_tpu.models.aggregate import Aggregator
from find_circ2_tpu.models.oracle import align_anchor, call_read
from find_circ2_tpu.utils.simulate import simulate

CFG = Config()


def _mk_genome(seed=0, n=20000):
    rng = np.random.default_rng(seed)
    seq = rng.integers(0, 4, size=n, dtype=np.uint8)
    g = Genome.from_records([("c1", seq)], CFG)
    return g, seq


def test_align_exact_and_minus():
    g, seq = _mk_genome()
    idx = build_index(g, CFG)
    p = 1234
    anchor = seq[p:p + 20]
    hit = align_anchor(g, idx, anchor, CFG)
    assert hit.aligned and hit.strand == 0 and hit.mm == 0
    assert int(g.chrom_of(hit.pos)) == 0
    assert hit.pos == p + int(g.chrom_offsets[0])
    # Same anchor reverse-complemented: minus-strand hit at same position.
    rc = seq_to_codes(revcomp_seq(codes_to_seq(anchor)))
    hit2 = align_anchor(g, idx, rc, CFG)
    assert hit2.aligned and hit2.strand == 1 and hit2.pos == hit.pos


def test_align_one_mismatch_each_half():
    g, seq = _mk_genome(seed=1)
    idx = build_index(g, CFG)
    p = 5000 + int(g.chrom_offsets[0])
    for mut_pos in (3, 15):  # one per seed half: pigeonhole must find both
        anchor = g.codes[p:p + 20].copy()
        anchor[mut_pos] = (anchor[mut_pos] + 2) % 4
        hit = align_anchor(g, idx, anchor, CFG)
        assert hit.aligned and hit.mm == 1 and hit.pos == p
        assert hit.qual > 0


def test_align_unique_qual_vs_multimap():
    rng = np.random.default_rng(3)
    seq = rng.integers(0, 4, size=30000, dtype=np.uint8)
    # Duplicate a 20-mer at two loci -> multimapping anchor.
    seq[10000:10020] = seq[20000:20020]
    g = Genome.from_records([("c1", seq)], CFG)
    idx = build_index(g, CFG)
    hit = align_anchor(g, idx, seq[20000:20020], CFG)
    assert hit.aligned and hit.n_best == 2 and hit.qual == 0
    # Unique anchors get positive qual.
    hit2 = align_anchor(g, idx, seq[500:520], CFG)
    assert hit2.n_best == 1 and hit2.qual >= CFG.min_uniq_qual


def test_align_repetitive_bucket_skipped():
    # A 10-mer repeated > max_bucket times is skipped entirely.
    unit = seq_to_codes("ACGTACGTAC")
    rng = np.random.default_rng(4)
    seq = np.concatenate([rng.integers(0, 4, size=2000, dtype=np.uint8),
                          np.tile(unit, CFG.max_bucket + 40)])
    g = Genome.from_records([("c1", seq)], CFG)
    idx = build_index(g, CFG)
    anchor = np.tile(unit, 2)
    hit = align_anchor(g, idx, anchor, CFG)
    # Both halves hit the overflowing bucket -> no candidates at all
    # (or only stray sub-threshold ones); the anchor must not be "aligned
    # uniquely" anywhere.
    assert (not hit.aligned) or hit.qual == 0


def test_call_read_statuses():
    g, seq = _mk_genome(seed=5)
    idx = build_index(g, CFG)
    assert call_read(g, idx, "s", "ACGT" * 9, CFG).status == ST_TOO_SHORT
    # Contiguous read -> prefiltered; without prefilter it has overlapping
    # anchors geometry (pB - pA = l - a < a is false here: l=100 -> pB-pA=80
    # >= a) -> becomes a "linear" candidate with end<=start -> NO_JUNCTION.
    p = 3000
    contig = codes_to_seq(seq[p:p + 100])
    assert call_read(g, idx, "c", contig, CFG).status == ST_PREFILTERED
    got = call_read(g, idx, "c", contig, CFG, prefilter=False)
    assert got.status != ST_JUNCTION or got.kind == KIND_LINEAR


def test_call_read_circular_plus_and_minus():
    g, seq = _mk_genome(seed=6)
    off = int(g.chrom_offsets[0])
    start, end = 4000, 5000
    seq2 = seq.copy()
    seq2[start - 2:start] = seq_to_codes("AG")
    seq2[end:end + 2] = seq_to_codes("GT")
    g = Genome.from_records([("c1", seq2)], CFG)
    idx = build_index(g, CFG)
    bp = 40
    read = np.concatenate([seq2[end - bp:end], seq2[start:start + 60]])
    rs = codes_to_seq(read)
    for strand, s in ((SENSE_PLUS, rs), (SENSE_MINUS, revcomp_seq(rs))):
        call = call_read(g, idx, "r", s, CFG)
        assert call.status == ST_JUNCTION, call
        assert call.kind == KIND_CIRCULAR
        assert call.start == start + off and call.end == end + off
        assert call.sense == SENSE_PLUS  # canonical + signal planted
        assert call.align_strand == strand
        assert call.signal == "GTAG"
        assert call.edits == 0
        assert call.qual_left >= CFG.min_uniq_qual


def test_call_read_linear():
    g, seq = _mk_genome(seed=7)
    off = int(g.chrom_offsets[0])
    donor, acceptor = 2000, 9000
    seq2 = seq.copy()
    seq2[donor:donor + 2] = seq_to_codes("GT")
    seq2[acceptor - 2:acceptor] = seq_to_codes("AG")
    g = Genome.from_records([("c1", seq2)], CFG)
    idx = build_index(g, CFG)
    bp = 55
    read = np.concatenate([seq2[donor - bp:donor],
                           seq2[acceptor:acceptor + (100 - bp)]])
    call = call_read(g, idx, "r", codes_to_seq(read), CFG)
    assert call.status == ST_JUNCTION and call.kind == KIND_LINEAR
    assert call.start == donor + off and call.end == acceptor + off
    assert call.signal == "GTAG" and call.sense == SENSE_PLUS


def test_simulated_end_to_end_truth_recovery():
    sim = simulate(seed=11, n_circ=6, n_linear=4, reads_per_junction=4,
                   n_contiguous=10, n_random=5, err_rate=0.25)
    idx = build_index(sim.genome, CFG)
    agg = Aggregator(sim.genome, CFG)
    for name, s in sim.reads:
        agg.add(call_read(sim.genome, idx, name, s, CFG))
    rows = agg.rows(sample_name="sim")
    called = {(r.chrom, r.start, r.end,
               "circular" if "CIRCULAR" in r.category else "linear"): r
              for r in rows}
    found = 0
    for tj in sim.truths:
        key = (tj.chrom, tj.start, tj.end, tj.kind)
        if key in called:
            found += 1
            row = called[key]
            assert row.strand == "+"
            assert row.signal == "GTAG"
            assert "CANONICAL" in row.category
    # Allow a couple of junctions to be perturbed by simulated errors.
    assert found >= len(sim.truths) - 2, (found, len(sim.truths))
    # Contiguous reads must have been prefiltered, not called.
    assert agg.stats.counts.get("prefiltered_contiguous", 0) >= 8
    # Stats are consistent.
    assert agg.stats.counts["reads_total"] == len(sim.reads)


def test_call_read_minus_sense_junction():
    """A circular junction on the '-' strand: genome shows AC..CT
    (revcomp of the AG..GT pattern); sense must be '-' with signal
    reported as GTAG in splice orientation (SPEC.md §4)."""
    g, seq = _mk_genome(seed=8)
    off = int(g.chrom_offsets[0])
    start, end = 6000, 7000
    seq2 = seq.copy()
    # '-' sense circular: G[start-2:start] == AC, G[end:end+2] == CT.
    seq2[start - 2:start] = seq_to_codes("AC")
    seq2[end:end + 2] = seq_to_codes("CT")
    # Make sure no accidental '+' signal outranks it at the same split.
    g = Genome.from_records([("c1", seq2)], CFG)
    idx = build_index(g, CFG)
    # A '-'-sense circRNA read: the transcript is the revcomp of the
    # genome circle, so a read crossing its backsplice equals
    # revcomp(seq[end-bp:end] + seq[start:start+L-bp]).
    bp = 45
    fwd = np.concatenate([seq2[end - bp:end], seq2[start:start + 55]])
    rs = revcomp_seq(codes_to_seq(fwd))
    call = call_read(g, idx, "r", rs, CFG)
    assert call.status == ST_JUNCTION and call.kind == KIND_CIRCULAR
    assert call.start == start + off and call.end == end + off
    assert call.sense == SENSE_MINUS
    assert call.signal == "GTAG"
    assert call.align_strand == SENSE_MINUS
    # The forward-orientation read supports the same '-' junction.
    call2 = call_read(g, idx, "r2", codes_to_seq(fwd), CFG)
    assert call2.status == ST_JUNCTION
    assert (call2.start, call2.end, call2.sense) == \
        (call.start, call.end, call.sense)
    assert call2.align_strand == SENSE_PLUS


def test_call_read_noncanonical_junction():
    """No splice signal at all: sense falls back to the alignment strand
    and the junction is not CANONICAL."""
    g, seq = _mk_genome(seed=9)
    off = int(g.chrom_offsets[0])
    start, end = 4000, 5200
    seq2 = seq.copy()
    # Destroy any canonical dinucleotides at the planted boundary.
    seq2[start - 2:start] = seq_to_codes("TT")
    seq2[end:end + 2] = seq_to_codes("TT")
    g = Genome.from_records([("c1", seq2)], CFG)
    idx = build_index(g, CFG)
    bp = 50
    read = np.concatenate([seq2[end - bp:end], seq2[start:start + 50]])
    call = call_read(g, idx, "nc", codes_to_seq(read), CFG)
    assert call.status == ST_JUNCTION and call.kind == KIND_CIRCULAR
    assert call.sense == SENSE_PLUS  # alignment strand fallback
    assert call.signal != "GTAG"
