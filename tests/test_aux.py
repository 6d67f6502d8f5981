"""Auxiliary subsystems: resume journal, index save/load, profiling,
packed-genome codec (SURVEY.md §5)."""

import numpy as np
import pytest

from find_circ2_tpu.config import Config
from find_circ2_tpu.index.build import build_index, load_index, save_index
from find_circ2_tpu.models.aggregate import Aggregator
from find_circ2_tpu.models.pipeline import DeviceIndex, run_reads
from find_circ2_tpu.utils.journal import RunJournal
from find_circ2_tpu.utils.profiling import StageTimes
from find_circ2_tpu.utils.simulate import simulate

CFG = Config(batch_size=32)


def test_packed_gather_window_matches_bytes():
    import jax.numpy as jnp
    from find_circ2_tpu.ops.packed import gather_window, pack_nibbles
    rng = np.random.default_rng(5)
    codes = rng.integers(0, 7, size=1000).astype(np.uint8)
    packed = jnp.asarray(pack_nibbles(codes))
    starts = rng.integers(0, 1000 - 170, size=64).astype(np.int32)
    for width in (20, 162):
        got = np.asarray(gather_window(packed, jnp.asarray(starts), width))
        want = np.stack([codes[s:s + width] for s in starts]).astype(np.int32)
        assert np.array_equal(got, want)


def test_index_save_load_roundtrip(tmp_path):
    sim = simulate(seed=51, n_circ=2, n_linear=1)
    idx = build_index(sim.genome, CFG)
    path = tmp_path / "g.idx.npz"
    save_index(path, sim.genome, idx)
    g2, idx2 = load_index(path)
    assert g2.chrom_names == sim.genome.chrom_names
    assert np.array_equal(g2.codes, sim.genome.codes)
    assert np.array_equal(idx2.positions, idx.positions)
    assert np.array_equal(idx2.suffix_vals, idx.suffix_vals)
    assert np.array_equal(idx2.offsets, idx.offsets)
    assert (idx2.anchor_len, idx2.prefix_len, idx2.bsearch_iters) == \
        (idx.anchor_len, idx.prefix_len, idx.bsearch_iters)


def test_journal_resume(tmp_path):
    sim = simulate(seed=53, n_circ=4, n_linear=2, reads_per_junction=5,
                   n_contiguous=40, n_random=5)
    idx = build_index(sim.genome, CFG)
    dindex = DeviceIndex.build(sim.genome, idx, CFG)
    jpath = tmp_path / "run.journal"

    # First (full) run with journal.
    j1 = RunJournal(jpath)
    calls1 = run_reads(dindex, sim.reads, CFG, journal=j1)
    n_batches = len(j1.completed_batches())
    assert n_batches >= 2

    # Truncate the journal to simulate a crash after the first batch.
    lines = jpath.read_text().splitlines()
    jpath.write_text(lines[0] + "\n" + lines[1][: len(lines[1]) // 2])

    times = StageTimes()
    j2 = RunJournal(jpath)
    calls2 = run_reads(dindex, sim.reads, CFG, journal=j2, times=times)
    assert [c.__dict__ for c in calls2] == [c.__dict__ for c in calls1]
    # The journal is healed: all batches complete now.
    assert len(j2.completed_batches()) == n_batches
    # Device ran for the non-replayed batches and stages were timed.
    assert times.n_reads > 0
    assert "device_detect" in times.totals

    # A third run replays everything: identical output, no device work.
    calls3 = run_reads(dindex, sim.reads, CFG, journal=RunJournal(jpath))
    assert [c.__dict__ for c in calls3] == [c.__dict__ for c in calls1]

    # Aggregated BED equal between runs.
    def bed(calls):
        agg = Aggregator(sim.genome, CFG)
        for c in calls:
            agg.add(c)
        return [r.to_line() for r in agg.rows("s")]
    assert bed(calls1) == bed(calls3)


def test_journal_detects_changed_input(tmp_path):
    sim = simulate(seed=54, n_circ=2, n_linear=1, n_contiguous=40)
    idx = build_index(sim.genome, CFG)
    dindex = DeviceIndex.build(sim.genome, idx, CFG)
    jpath = tmp_path / "run.journal"
    run_reads(dindex, sim.reads, CFG, journal=RunJournal(jpath))
    with pytest.raises(ValueError, match="input changed"):
        run_reads(dindex, sim.reads[: len(sim.reads) // 2], CFG,
                  journal=RunJournal(jpath))
