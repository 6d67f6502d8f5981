"""Device-side SPEC §2b multi-hit exploration (ops/explore.py) must be
bit-identical to the oracle's pair exploration — the whole point of the
module is replacing the host slow path (97% of round-2 end-to-end wall
time on repeat libraries) without changing a single output byte."""

import numpy as np
import jax.numpy as jnp
import pytest

from find_circ2_tpu.config import RPAD_CODE, Config, ST_JUNCTION
from find_circ2_tpu.index.build import build_index
from find_circ2_tpu.io.twobit import codes_to_seq, seq_to_codes
from find_circ2_tpu.models.oracle import ReadCall, anchor_candidates, call_read
from find_circ2_tpu.models.pipeline import DeviceIndex, unpack_results
from find_circ2_tpu.ops.explore import explore_batch_packed, merged_candidates
from find_circ2_tpu.utils.simulate import rnase_r_library

CFG = Config()


def _explore_calls(dindex, reads, cfg, prefilter=True):
    """Run explore_batch_packed over (name, seq) pairs -> ReadCalls."""
    B = max(8, len(reads))
    Lp = cfg.max_read_len
    arr = np.full((B, Lp), RPAD_CODE, np.uint8)
    lens = np.zeros(B, np.int32)
    for i, (_, seq) in enumerate(reads):
        codes = seq_to_codes(seq)
        arr[i, :codes.size] = codes
        lens[i] = codes.size
    packed = explore_batch_packed(
        dindex.gpacked, dindex.nbases, dindex.table, dindex.meta,
        dindex.ext, dindex.ext_id, dindex.chrom_offsets,
        jnp.asarray(arr), jnp.asarray(lens), cfg, prefilter)
    res = unpack_results(np.asarray(packed))
    out = []
    for i, (name, seq) in enumerate(reads):
        status = int(res["status"][i])
        if status != ST_JUNCTION:
            out.append(ReadCall(name, seq, status))
            continue
        out.append(ReadCall(
            name=name, seq=seq, status=status,
            kind=int(res["kind"][i]), chrom_idx=int(res["chrom"][i]),
            start=int(res["start"][i]), end=int(res["end"][i]),
            sense=int(res["sense"][i]),
            align_strand=int(res["align_strand"][i]),
            edits=int(res["edits"][i]), n_bp=int(res["n_bp"][i]),
            overlap=int(res["overlap"][i]),
            qual_left=int(res["qual_left"][i]),
            qual_right=int(res["qual_right"][i]),
            signal=codes_to_seq(res["signal"][i])))
    return out


def test_merged_candidates_equal_oracle_lists():
    """The device first-K candidate list (table extras + sort/compact)
    equals oracle.anchor_candidates' capped (strand, pos) list for every
    anchor of a repeat-rich library — the §2b frozen order, including
    MAX_BUCKET-guarded variants and sub-K lists."""
    from find_circ2_tpu.ops.anchor_align import (candidate_stats,
                                                 finalize_hits,
                                                 read_anchors)

    sim = rnase_r_library(seed=17, chrom_lengths={"chrR": 300_000},
                          n_circ=30, n_linear=6, depth_mean=3.0,
                          repeat_frac=0.4, cfg=CFG)
    index = build_index(sim.genome, CFG)
    dindex = DeviceIndex.build(sim.genome, index, CFG)
    assert dindex.ext is not None and dindex.ext_id is not None

    reads = [r for r in sim.reads if 2 * CFG.anchor_len <= len(r[1])
             <= CFG.max_read_len][:256]
    B = len(reads)
    Lp = CFG.max_read_len
    arr = np.full((B, Lp), RPAD_CODE, np.uint8)
    lens = np.zeros(B, np.int32)
    for i, (_, seq) in enumerate(reads):
        codes = seq_to_codes(seq)
        arr[i, :codes.size] = codes
        lens[i] = codes.size
    anchors_a, anchors_b = read_anchors(jnp.asarray(arr),
                                        jnp.asarray(lens), CFG)
    n_multi = 0
    for anchors, side in ((anchors_a, 0), (anchors_b, 1)):
        ca, fa, mm_v, strand_v, xa = candidate_stats(
            dindex.table, dindex.meta, anchors, CFG, dindex.ext,
            dindex.ext_id)
        hits = finalize_hits(ca, fa, mm_v, strand_v, CFG)
        pos, strand, valid = merged_candidates(ca, fa, xa, mm_v, hits.mm,
                                               CFG)
        pos, strand, valid = map(np.asarray, (pos, strand, valid))
        for i, (_, seq) in enumerate(reads):
            codes = seq_to_codes(seq)
            anchor = codes[:CFG.anchor_len] if side == 0 \
                else codes[-CFG.anchor_len:]
            _, pairs = anchor_candidates(sim.genome, index, anchor, CFG)
            got = [(int(strand[i, k]), int(pos[i, k]))
                   for k in range(CFG.max_pair_hits) if valid[i, k]]
            assert got == pairs, (i, side, got, pairs)
            n_multi += len(pairs) > 1
    assert n_multi >= 30, f"library too tame: {n_multi} multi anchors"


def test_explore_batch_equals_oracle_repeat_library():
    """Field-level ReadCall equality vs the oracle on every valid-length
    read of a repeat-rich RNase-R library — junctions, prefilter chains,
    unaligned statuses and v2 fallbacks all covered."""
    sim = rnase_r_library(seed=13, chrom_lengths={"chrR": 500_000},
                          n_circ=40, n_linear=8, depth_mean=4.0,
                          repeat_frac=0.35, cfg=CFG)
    index = build_index(sim.genome, CFG)
    dindex = DeviceIndex.build(sim.genome, index, CFG)
    reads = [r for r in sim.reads if 2 * CFG.anchor_len <= len(r[1])
             <= CFG.max_read_len]
    got = _explore_calls(dindex, reads, CFG)
    n_multi = 0
    # The explore program's contract is the <=1-mm world: production
    # routes device-unaligned reads to the host BEFORE explore, so the
    # §2 [FROZEN v4] 2-mm rescue never runs on it — compare against the
    # oracle with rescue off. (run_reads-level equality WITH rescue is
    # covered by tests/test_pipeline_vs_oracle.py.)
    import dataclasses
    cfg_1mm = dataclasses.replace(CFG, rescue_anchor_mm=1)
    for (name, seq), g in zip(reads, got):
        o = call_read(sim.genome, index, name, seq, cfg_1mm)
        assert o == g, (name, o, g)
        c = seq_to_codes(seq)
        hA, _ = anchor_candidates(sim.genome, index, c[:20], CFG)
        hB, _ = anchor_candidates(sim.genome, index, c[-20:], CFG)
        n_multi += int(hA.n_best > 1 or hB.n_best > 1)
    assert n_multi >= 20, f"library must exercise multi reads: {n_multi}"


@pytest.mark.parametrize("prefilter", [True, False])
def test_explore_prefilter_flag(prefilter):
    """The §2b prefilter toggle matches the oracle in both settings."""
    sim = rnase_r_library(seed=5, chrom_lengths={"chrR": 200_000},
                          n_circ=15, n_linear=4, depth_mean=3.0,
                          contiguous_frac=0.4, repeat_frac=0.3, cfg=CFG)
    index = build_index(sim.genome, CFG)
    dindex = DeviceIndex.build(sim.genome, index, CFG)
    reads = [r for r in sim.reads if 2 * CFG.anchor_len <= len(r[1])
             <= CFG.max_read_len][:200]
    got = _explore_calls(dindex, reads, CFG, prefilter)
    for (name, seq), g in zip(reads, got):
        o = call_read(sim.genome, index, name, seq, CFG, prefilter)
        assert o == g, (name, o, g)


def test_explore_on_decoy_case():
    """The planted decoy scenario (test_multihit._setup) resolves to the
    true junction on the device explore path."""
    from tests.test_multihit import _setup, TRUE_S, TRUE_E

    genome, index, read_seq = _setup()
    dindex = DeviceIndex.build(genome, index, CFG)
    oracle = call_read(genome, index, "r", read_seq, CFG)
    [got] = _explore_calls(dindex, [("r", read_seq)], CFG)
    assert got == oracle
    gap = CFG.chrom_gap
    assert (got.start - gap, got.end - gap) == (TRUE_S, TRUE_E)
