"""Sharded path tests on the 8-virtual-CPU-device mesh (conftest.py):
bit-identical results vs the single-chip step, across mesh shapes —
SURVEY.md §4 "multi-host tests without a real cluster"."""

import numpy as np
import pytest

import jax

from find_circ2_tpu.config import RPAD_CODE, Config
from find_circ2_tpu.index.build import build_index
from find_circ2_tpu.models.pipeline import DeviceIndex, detect_batch
from find_circ2_tpu.parallel.mesh import make_mesh
from find_circ2_tpu.parallel.sharded import ShardedEngine
from find_circ2_tpu.io.twobit import seq_to_codes
from find_circ2_tpu.utils.simulate import simulate

CFG = Config(batch_size=64)


def _batchify(reads, cfg, bs):
    arr = np.full((bs, cfg.max_read_len), RPAD_CODE, np.uint8)
    lens = np.zeros(bs, np.int32)
    kept = [(n, s) for n, s in reads
            if 2 * cfg.anchor_len <= len(s) <= cfg.max_read_len][:bs]
    for i, (_, s) in enumerate(kept):
        codes = seq_to_codes(s)
        arr[i, :codes.size] = codes
        lens[i] = codes.size
    return arr, lens


@pytest.mark.parametrize("shape", [(1, 8), (2, 4), (8, 1), (4, 2)])
def test_sharded_matches_single_chip(shape):
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    sim = simulate(seed=33, n_circ=5, n_linear=3, reads_per_junction=3,
                   n_contiguous=10, n_random=6, err_rate=0.3)
    idx = build_index(sim.genome, CFG)
    reads, lens = _batchify(sim.reads, CFG, 64)

    dindex = DeviceIndex.build(sim.genome, idx, CFG)
    ref = detect_batch(dindex.gpacked, dindex.nbases, dindex.table,
                       dindex.meta, dindex.chrom_offsets, reads, lens,
                       CFG, True)
    ref = {k: np.asarray(v) for k, v in ref.items()}

    mesh = make_mesh(8, shape=shape)
    eng = ShardedEngine(sim.genome, idx, mesh, CFG, prefilter=True)
    got = eng.detect(reads, lens)

    live = lens > 0
    for key in ref:
        r, g = ref[key], got[key]
        if key == "signal":
            mask = live[:, None]
        else:
            mask = live
        assert np.array_equal(np.where(mask, r, 0), np.where(mask, g, 0)), \
            (key, shape, r[live][:10], g[live][:10])


def test_distributed_helpers():
    from find_circ2_tpu.parallel.distributed import (global_mesh,
                                                     host_read_slice)
    mesh = global_mesh()
    assert set(mesh.axis_names) == {"data", "index"}
    assert mesh.devices.size == len(jax.devices())
    mesh2 = global_mesh(index_parallel=2)
    assert mesh2.shape["index"] == 2
    # Contiguous, covering, near-even host split.
    slices = [host_read_slice(103, h, 4) for h in range(4)]
    assert slices[0][0] == 0 and slices[-1][1] == 103
    for (a0, a1), (b0, b1) in zip(slices, slices[1:]):
        assert a1 == b0


def test_hierarchical_merge_matches_flat():
    """(dhost, data, index) hierarchical merge (ICI then DCN stages) must
    be bit-identical to the flat (data, index) merge and to the
    single-device merge of the same batch."""
    from find_circ2_tpu.ops.merge import merge_junctions
    from find_circ2_tpu.parallel.mesh import make_hier_mesh
    import jax.numpy as jnp

    sim = simulate(seed=34, n_circ=6, n_linear=3, reads_per_junction=4,
                   n_contiguous=8, n_random=4, err_rate=0.3)
    idx = build_index(sim.genome, CFG)
    reads, lens = _batchify(sim.reads, CFG, 64)

    flat = ShardedEngine(sim.genome, idx, make_mesh(8, shape=(4, 2)),
                         CFG).detect_merged(reads, lens)
    hier = ShardedEngine(sim.genome, idx, make_hier_mesh(2, 2, 2),
                         CFG).detect_merged(reads, lens)

    dindex = DeviceIndex.build(sim.genome, idx, CFG)
    res = detect_batch(dindex.gpacked, dindex.nbases, dindex.table,
                       dindex.meta, dindex.chrom_offsets, reads, lens,
                       CFG, True)
    single = {k: np.asarray(v) for k, v in
              merge_junctions(res, jnp.asarray(lens), CFG).items()}

    n = int(single["valid"].sum())
    assert n > 0
    for k in single:
        s = single[k][:n]
        assert np.array_equal(flat[k][:n], s), (k, "flat")
        assert np.array_equal(hier[k][:n], s), (k, "hier")
    assert int(flat["valid"].sum()) == n
    assert int(hier["valid"].sum()) == n


def test_sharded_cli_byte_identical(tmp_path):
    """find_circ --mesh 2x4 must produce byte-identical BED + stats to
    the single-chip CLI run (BASELINE configs[3] as a *run*)."""
    from find_circ2_tpu.cli import main as cli_main
    from find_circ2_tpu.io.fasta import write_fasta
    from find_circ2_tpu.io.fastq import FastqRecord, write_fastq
    from find_circ2_tpu.io.twobit import codes_to_seq

    sim = simulate(seed=35, n_circ=4, n_linear=2, reads_per_junction=3,
                   n_contiguous=8, n_random=4, err_rate=0.3)
    fa = tmp_path / "g.fa"
    write_fasta(fa, [(n, codes_to_seq(
        sim.genome.codes[sim.genome.chrom_offsets[i]:
                         sim.genome.chrom_offsets[i]
                         + sim.genome.chrom_lengths[i]]))
        for i, n in enumerate(sim.genome.chrom_names)])
    fq = tmp_path / "r.fastq"
    with open(fq, "wt") as fh:
        for name, seq in sim.reads:
            write_fastq(fh, FastqRecord(name, seq, "I" * len(seq)))

    def run(tag, extra):
        bed = tmp_path / f"{tag}.bed"
        st = tmp_path / f"{tag}.stats"
        rc = cli_main.main(["find_circ", str(fq), "-G", str(fa),
                            "--reads-format", "fastq", "-o", str(bed),
                            "-s", str(st), "--batch-size", "64"] + extra)
        assert rc == 0
        return bed.read_text(), st.read_text()

    single = run("single", [])
    sharded = run("sharded", ["--mesh", "2x4"])
    assert sharded == single
    assert "circ_" in single[0]
