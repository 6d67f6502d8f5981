"""K1 v4 exact-first fast path (ops/anchor_align.exact_anchor_stats +
the in-program enumeration fallback) must be bit-identical to the
classic 122-row enumeration on every AnchorHits field, and the
fallback-overflow escape hatch must transparently redo batches on the
classic program (docs/DESIGN.md "exact-first K1")."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from find_circ2_tpu.config import Config
from find_circ2_tpu.index.build import build_index
from find_circ2_tpu.index.hashtable import (build_neighbor_table,
                                            build_query_table)
from find_circ2_tpu.io.genome import Genome
from find_circ2_tpu.models.oracle import call_read
from find_circ2_tpu.models.pipeline import DeviceIndex, run_reads
from find_circ2_tpu.ops.anchor_align import (align_anchor_pair,
                                             align_anchor_pair_fast)
from find_circ2_tpu.utils.simulate import (plant_repeats, random_genome,
                                           rnase_r_library)

CFG = Config()


def _mixed_anchors(genome, rng, n):
    """Present / 1-error / random-absent / N-containing anchors."""
    G = genome.codes
    anc = np.empty((n, CFG.anchor_len), np.uint8)
    for i in range(n):
        p = int(rng.integers(600, len(genome) - 600))
        w = np.asarray(G[p:p + CFG.anchor_len]).copy()
        kind = i % 4
        if kind == 1:
            j = int(rng.integers(CFG.anchor_len))
            w[j] = (w[j] + 1 + int(rng.integers(3))) % 4
        elif kind == 2:
            w = rng.integers(0, 4, CFG.anchor_len, dtype=np.uint8)
        elif kind == 3 and i % 8 == 3:
            w[3] = 4
        anc[i] = w
    return anc


def test_fast_align_equals_enumeration():
    rng = np.random.default_rng(11)
    genome, seqs = random_genome(rng, {"c": 400_000}, CFG)
    plant_repeats(rng, seqs["c"], 0.4)
    genome = Genome.from_records(list(seqs.items()), CFG)
    index = build_index(genome, CFG)
    index.qtable = build_query_table(index, CFG, extras=False)
    nt = build_neighbor_table(index, CFG)
    table = jnp.asarray(index.qtable.table)
    ntable = jnp.asarray(nt)
    meta = jnp.asarray(index.qtable.meta)

    anc = _mixed_anchors(genome, rng, 512)
    A, B = jnp.asarray(anc[:256]), jnp.asarray(anc[256:])
    ra, rb = align_anchor_pair(table, meta, A, B, CFG)
    fa, fb, ovf = align_anchor_pair_fast(table, ntable, meta, A, B, CFG)
    assert not bool(ovf)
    for ref, fast in ((ra, fa), (rb, fb)):
        for field in ref._fields:
            assert np.array_equal(np.asarray(getattr(ref, field)),
                                  np.asarray(getattr(fast, field))), field


def test_overflow_redo_keeps_oracle_equality():
    """With a fallback slice far too small for the library's error
    anchors, the overflow bit must trigger the classic redo and keep
    run_reads oracle-identical."""
    cfg = dataclasses.replace(CFG, exact_fallback_slots=2)
    sim = rnase_r_library(seed=17, chrom_lengths={"chrT": 200_000},
                          n_circ=20, n_linear=5, depth_mean=3.0,
                          repeat_frac=0.3, cfg=cfg)
    index = build_index(sim.genome, cfg)
    dindex = DeviceIndex.build(sim.genome, index, cfg)
    assert dindex.ntable is not None
    calls = run_reads(dindex, sim.reads, cfg,
                      slowpath=(sim.genome, index), explore=False)
    for (name, seq), dc in zip(sim.reads, calls):
        oc = call_read(sim.genome, index, name, seq, cfg)
        assert dc == oc, (name, oc, dc)


def test_devindex_auto_builds_ntable():
    rng = np.random.default_rng(5)
    genome, seqs = random_genome(rng, {"c": 50_000}, CFG)
    genome = Genome.from_records(list(seqs.items()), CFG)
    dindex = DeviceIndex.build(genome, cfg=CFG)
    assert dindex.ntable is not None
    assert dindex.ntable.shape[0] == dindex.table.shape[0]


def test_sharded_fast_equals_classic():
    """ShardedEngine with exact_first on/off must produce identical
    result dicts (the K1 v4 psum/pmin combine vs classic enumeration),
    on a library with errors (fallback slice active)."""
    from find_circ2_tpu.parallel.mesh import make_mesh
    from find_circ2_tpu.parallel.sharded import ShardedEngine

    cfg = CFG
    sim = rnase_r_library(seed=23, chrom_lengths={"chrS": 150_000},
                          n_circ=15, n_linear=4, depth_mean=3.0,
                          repeat_frac=0.3, cfg=cfg)
    index = build_index(sim.genome, cfg)
    mesh = make_mesh(8)
    fast = ShardedEngine(sim.genome, index, mesh, cfg, exact_first=True)
    classic = ShardedEngine(sim.genome, index, mesh, cfg,
                            exact_first=False)
    assert fast.fast and not classic.fast
    from find_circ2_tpu.config import RPAD_CODE
    from find_circ2_tpu.io.twobit import seq_to_codes
    kept = [s for _, s in sim.reads
            if 2 * cfg.anchor_len <= len(s) <= cfg.max_read_len]
    B = 64
    reads = np.full((B, cfg.max_read_len), RPAD_CODE, np.uint8)
    lens = np.zeros(B, np.int32)
    for i in range(B):
        codes = seq_to_codes(kept[i % len(kept)])
        reads[i, :codes.size] = codes
        lens[i] = codes.size
    rf = fast.detect(reads, lens)
    rc = classic.detect(reads, lens)
    for k in rc:
        if k == "multi":
            # bit 3 (overflow flag) is fast-path-only metadata.
            assert np.array_equal(rf[k] & 7, rc[k] & 7), k
            continue
        assert np.array_equal(rf[k], rc[k]), k
