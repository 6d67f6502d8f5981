"""The central contract: the device (JAX) pipeline must reproduce the CPU
oracle bit-for-bit — per-read records AND final BED bytes (SURVEY.md §7
step 3; BASELINE.json configs[0]/[1])."""

import io

import numpy as np
import pytest

from find_circ2_tpu.config import Config, ST_JUNCTION
from find_circ2_tpu.index.build import build_index
from find_circ2_tpu.models.aggregate import Aggregator
from find_circ2_tpu.models.oracle import call_read
from find_circ2_tpu.models.pipeline import DeviceIndex, run_reads
from find_circ2_tpu.io.bed import write_bed
from find_circ2_tpu.utils.simulate import simulate

CFG = Config(batch_size=256)


def _bed_bytes(genome, calls, cfg):
    agg = Aggregator(genome, cfg)
    for c in calls:
        agg.add(c)
    buf = io.StringIO()
    write_bed(buf, agg.rows(sample_name="t"))
    return buf.getvalue(), agg.stats.counts


def _assert_calls_equal(oracle_calls, device_calls):
    assert len(oracle_calls) == len(device_calls)
    for oc, dc in zip(oracle_calls, device_calls):
        assert oc.name == dc.name
        assert oc.status == dc.status, (oc.name, oc.status, dc.status)
        if oc.status == ST_JUNCTION:
            for f in ("kind", "chrom_idx", "start", "end", "sense",
                      "align_strand", "edits", "n_bp", "overlap",
                      "qual_left", "qual_right", "signal"):
                assert getattr(oc, f) == getattr(dc, f), (oc.name, f, oc, dc)


@pytest.mark.parametrize("prefilter", [True, False])
@pytest.mark.parametrize("seed", [0, 7])
def test_pipeline_matches_oracle(seed, prefilter):
    sim = simulate(seed=seed, n_circ=8, n_linear=6, reads_per_junction=3,
                   n_contiguous=20, n_random=10, err_rate=0.35)
    idx = build_index(sim.genome, CFG)
    oracle_calls = [call_read(sim.genome, idx, n, s, CFG, prefilter)
                    for n, s in sim.reads]
    dindex = DeviceIndex.build(sim.genome, idx, CFG)
    device_calls = run_reads(dindex, sim.reads, CFG, prefilter)
    _assert_calls_equal(oracle_calls, device_calls)
    bed_o, stats_o = _bed_bytes(sim.genome, oracle_calls, CFG)
    bed_d, stats_d = _bed_bytes(sim.genome, device_calls, CFG)
    assert bed_o == bed_d          # byte-identical junction tables
    assert stats_o == stats_d


def test_pipeline_matches_oracle_adversarial():
    """Reads engineered to stress tie-breaks and edge cases."""
    rng = np.random.default_rng(99)
    sim = simulate(seed=3, n_circ=2, n_linear=1, reads_per_junction=1,
                   n_contiguous=2, n_random=2)
    g = sim.genome
    idx = build_index(g, CFG)
    reads = list(sim.reads)
    seq0 = g.codes[g.chrom_offsets[0]:g.chrom_offsets[0]
                   + g.chrom_lengths[0]]
    from find_circ2_tpu.io.twobit import codes_to_seq, revcomp_seq

    # Ambiguous breakpoints: read stitched from two genome pieces whose
    # junction-adjacent bases coincide.
    for i in range(20):
        p1 = 1000 + 137 * i
        p2 = 30000 + 211 * i
        piece = np.concatenate([seq0[p1:p1 + 50], seq0[p2:p2 + 50]])
        reads.append((f"adv{i}", codes_to_seq(piece)))
        reads.append((f"advrc{i}", revcomp_seq(codes_to_seq(piece))))
    # Reads with Ns sprinkled in.
    for i in range(5):
        p1 = 2000 + 97 * i
        s = codes_to_seq(seq0[p1:p1 + 100])
        s = s[:30] + "N" + s[31:60] + "NN" + s[62:]
        reads.append((f"advN{i}", s))
    # Head-to-tail from nearby loci (small circles) incl. overlap edge.
    for i, span in enumerate((40, 45, 60, 90, 120)):
        p = 5000 + 500 * i
        piece = np.concatenate([seq0[p + span - 60:p + span],
                                seq0[p:p + 40]])
        reads.append((f"advc{i}", codes_to_seq(piece)))

    oracle_calls = [call_read(g, idx, n, s, CFG) for n, s in reads]
    dindex = DeviceIndex.build(g, idx, CFG)
    device_calls = run_reads(dindex, reads, CFG)
    _assert_calls_equal(oracle_calls, device_calls)
    bed_o, _ = _bed_bytes(g, oracle_calls, CFG)
    bed_d, _ = _bed_bytes(g, device_calls, CFG)
    assert bed_o == bed_d
