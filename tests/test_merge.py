"""On-device junction merge tests: totals must agree with the host
Aggregator, and the sharded collective merge must be bit-identical to the
single-device merge (SURVEY.md §5 deterministic-merge property tests)."""

import numpy as np

import jax.numpy as jnp

from find_circ2_tpu.config import (Config, KIND_CIRCULAR, SENSE_CHARS,
                                   ST_JUNCTION)
from find_circ2_tpu.index.build import build_index
from find_circ2_tpu.models.aggregate import Aggregator
from find_circ2_tpu.models.pipeline import DeviceIndex, detect_batch, run_reads
from find_circ2_tpu.ops.merge import merge_junctions
from find_circ2_tpu.parallel.mesh import make_mesh
from find_circ2_tpu.parallel.sharded import ShardedEngine
from find_circ2_tpu.utils.simulate import simulate
from tests.test_sharded import _batchify

CFG = Config(batch_size=128)


def _host_table(sim, cfg):
    idx = build_index(sim.genome, cfg)
    dindex = DeviceIndex.build(sim.genome, idx, cfg)
    calls = run_reads(dindex, sim.reads, cfg)
    agg = Aggregator(sim.genome, cfg)
    for c in calls:
        agg.add(c)
    return idx, dindex, agg


def test_device_merge_matches_host_aggregation():
    sim = simulate(seed=41, n_circ=5, n_linear=3, reads_per_junction=4,
                   n_contiguous=8, n_random=4, err_rate=0.3)
    idx, dindex, agg = _host_table(sim, CFG)
    reads, lens = _batchify(sim.reads, CFG, 128)
    res = detect_batch(dindex.gpacked, dindex.nbases, dindex.table,
                       dindex.meta, dindex.chrom_offsets, reads, lens,
                       CFG, True)
    table = {k: np.asarray(v) for k, v in
             merge_junctions(res, jnp.asarray(lens), CFG).items()}
    n_valid = int(table["valid"].sum())
    assert n_valid == len(agg.junctions)
    # Compare each junction's aggregates against the host Aggregator.
    by_key = {}
    for i in range(n_valid):
        key = (int(table["kind"][i]), int(table["chrom"][i]),
               int(table["start"][i]), int(table["end"][i]),
               int(table["sense"][i]))
        by_key[key] = i
    assert set(by_key) == set(agg.junctions)
    for key, ja in agg.junctions.items():
        i = by_key[key]
        assert int(table["n_reads"][i]) == ja.n_reads
        assert int(table["uniq_bridges"][i]) == ja.uniq_bridges
        assert int(table["best_qual_left"][i]) == ja.best_qual_left
        assert int(table["best_qual_right"][i]) == ja.best_qual_right
        assert int(table["edits"][i]) == ja.edits
        assert int(table["overlap"][i]) == ja.overlap
        assert int(table["n_bp"][i]) == ja.n_bp
        assert int(table["n_strand_match"][i]) == ja.n_strand_match
    # Table is sorted by key.
    keys = sorted(by_key, key=lambda k: by_key[k])
    assert keys == sorted(keys)


def test_sharded_collective_merge_matches_single_device():
    sim = simulate(seed=43, n_circ=6, n_linear=2, reads_per_junction=4,
                   n_contiguous=6, n_random=4, err_rate=0.2)
    idx = build_index(sim.genome, CFG)
    dindex = DeviceIndex.build(sim.genome, idx, CFG)
    reads, lens = _batchify(sim.reads, CFG, 64)

    res = detect_batch(dindex.gpacked, dindex.nbases, dindex.table,
                       dindex.meta, dindex.chrom_offsets, reads, lens,
                       CFG, True)
    single = {k: np.asarray(v) for k, v in
              merge_junctions(res, jnp.asarray(lens), CFG).items()}
    nv = int(single["valid"].sum())

    for shape in ((2, 4), (4, 2)):
        mesh = make_mesh(8, shape=shape)
        eng = ShardedEngine(sim.genome, idx, mesh, CFG)
        merged = eng.detect_merged(reads, lens)
        assert int(merged["valid"].sum()) == nv
        for name in single:
            a = single[name][:nv]
            b = merged[name][:nv]
            assert np.array_equal(a, b), (shape, name, a, b)
