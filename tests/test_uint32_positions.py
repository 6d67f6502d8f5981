"""Whole-genome-scale position handling: global positions are uint32
(up to ~4.29 Gbp, BASELINE configs[4]); these tests pin the unsigned
semantics above the old int32/2^31 cap without building a >2 GB genome.

K1 (ops/anchor_align) touches no genome sequence — only the hash table's
position lanes — so shifting a real table's stored positions past 2^31
exercises the exact device lookup + unsigned-min path the whole-genome
index uses. The K2/gather side at real >2^31 offsets is covered by the
big-genome demo (scripts/big_genome.py)."""

import numpy as np

import jax.numpy as jnp

from find_circ2_tpu.config import Config, ST_JUNCTION
from find_circ2_tpu.index.build import build_index
from find_circ2_tpu.index.hashtable import LANES, build_query_table
from find_circ2_tpu.io.genome import Genome
from find_circ2_tpu.io.twobit import seq_to_codes
from find_circ2_tpu.ops.anchor_align import align_anchors
from find_circ2_tpu.ops.merge import merge_junctions

CFG = Config()
OFFSET = np.uint32(3_000_000_000)
SENT = np.uint32(0xFFFFFFFF)


def _shifted_table(qt):
    """Copy of a query table with every stored position shifted +OFFSET
    (sentinel LARGE_POS lanes left untouched)."""
    t = qt.table.reshape(-1, LANES).copy()
    live = t[:, 0] >= 0
    for lane in (2, 3):
        vals = t[live, lane].view(np.uint32).copy()
        m = vals != SENT
        vals[m] = vals[m] + OFFSET
        t[live, lane] = vals.view(np.int32)
    return t.reshape(qt.table.shape)


def test_align_anchors_positions_above_2gb():
    rng = np.random.default_rng(11)
    seq = rng.integers(0, 4, size=30000, dtype=np.uint8)
    genome = Genome.from_records([("c", seq)], CFG)
    index = build_index(genome, CFG)
    qt = build_query_table(index, CFG)

    a = CFG.anchor_len
    starts = rng.integers(CFG.chrom_gap, CFG.chrom_gap + 30000 - a,
                          size=64)
    anchors = np.stack([genome.codes[s:s + a] for s in starts])

    base = align_anchors(jnp.asarray(qt.table), jnp.asarray(qt.meta),
                         jnp.asarray(anchors), CFG)
    shifted = align_anchors(jnp.asarray(_shifted_table(qt)),
                            jnp.asarray(qt.meta), jnp.asarray(anchors),
                            CFG)
    base_pos = np.asarray(base.pos)
    got_pos = np.asarray(shifted.pos)
    assert got_pos.dtype == np.uint32
    aligned = np.asarray(base.aligned)
    assert aligned.any()
    # Statistics are position-translation-invariant; positions shift.
    assert np.array_equal(np.asarray(base.aligned),
                          np.asarray(shifted.aligned))
    assert np.array_equal(np.asarray(base.mm), np.asarray(shifted.mm))
    assert np.array_equal(np.asarray(base.n_best),
                          np.asarray(shifted.n_best))
    assert np.array_equal(np.asarray(base.qual), np.asarray(shifted.qual))
    want = (base_pos.astype(np.uint64) + np.uint64(OFFSET)) % (1 << 32)
    assert np.array_equal(got_pos[aligned].astype(np.uint64),
                          want[aligned])
    assert (got_pos[aligned] > np.uint32(2 ** 31)).all()


def test_merge_sorts_unsigned_above_2gb():
    B = 8
    mk = lambda v, dt=np.int32: jnp.asarray(np.asarray(v, dt))
    lo, hi = np.uint32(100), np.uint32(2 ** 31 + 5)
    res = dict(
        status=mk([ST_JUNCTION] * 4 + [1] * 4),
        kind=mk([1] * B), chrom=mk([0] * B),
        start=mk([hi, lo, hi, lo] + [0] * 4, np.uint32),
        end=mk([hi + np.uint32(50), lo + np.uint32(50)] * 2 + [0] * 4,
               np.uint32),
        sense=mk([0] * B), align_strand=mk([0] * B),
        edits=mk([1, 2, 3, 4] + [0] * 4),
        overlap=mk([0] * B), n_bp=mk([1] * B),
        qual_left=mk([40] * B), qual_right=mk([40] * B),
    )
    out = merge_junctions(res, mk([100] * B), CFG)
    valid = np.asarray(out["valid"])
    assert valid.sum() == 2
    starts = np.asarray(out["start"])[:2]
    n_reads = np.asarray(out["n_reads"])[:2]
    edits = np.asarray(out["edits"])[:2]
    # Unsigned order: the small-position junction sorts first.
    assert starts[0] == lo and starts[1] == hi
    assert n_reads.tolist() == [2, 2]
    assert edits.tolist() == [2, 1]
