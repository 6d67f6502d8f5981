"""Sharded multi-chip detection step: shard_map over the (data, index)
mesh.

Reads stream data-parallel; the seed index is k-mer-range sharded
tensor-parallel (index/shard.py); anchor-hit statistics combine across
index shards with integer pmin/psum collectives (ops/anchor_align
.finalize_hits), which keeps results bit-identical to the single-chip
path — the property tests/test_sharded.py asserts. Genome codes and the
breakpoint stage are replicated across "index" (K2's inputs are already
globally reduced), so only K1's tiny per-anchor statistics cross chips:
the collective payload is O(batch) int32s, riding ICI.

This realizes BASELINE.json:5/10/11's mandated parallelism; multi-host
execution only changes how the mesh is constructed (jax.distributed),
not this code.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from find_circ2_tpu.config import Config
from find_circ2_tpu.index.build import SeedIndex
from find_circ2_tpu.index.hashtable import shard_query_table
from find_circ2_tpu.io.genome import Genome
from find_circ2_tpu.models.pipeline import detect_core, read_anchors
from find_circ2_tpu.ops.anchor_align import align_anchors
from find_circ2_tpu.ops.merge import merge_junctions, merge_tables
from find_circ2_tpu.ops.packed import pack_nibbles


def sharded_detect_fn(mesh: Mesh, cfg: Config, nbases: int,
                      prefilter: bool = True):
    """Build the jitted sharded detect step over `mesh`.

    Signature of the returned fn:
        fn(gpacked[W], tables[nI, T, SLOTS*LANES], metas[nI, 3],
           chrom_offsets[C], reads[B, Lp], lens[B])
        -> dict of [B] arrays
    B must divide evenly by the mesh's "data" size.
    """

    def step(gpacked, tables, metas, chrom_offsets, reads, lens):
        # Leading shard axes arrive with size 1 inside shard_map.
        table_l = tables[0]
        meta_l = metas[0]
        anchors_a, anchors_b = read_anchors(reads, lens, cfg)
        hits_a = align_anchors(table_l, meta_l, anchors_a, cfg,
                               axis_name="index")
        hits_b = align_anchors(table_l, meta_l, anchors_b, cfg,
                               axis_name="index")
        # hits_* are replicated across "index" after the collectives; the
        # rest of the pipeline (prefilter, pairing, K2) runs data-parallel.
        return detect_core(gpacked, nbases, chrom_offsets, reads, lens,
                           hits_a, hits_b, cfg, prefilter)

    smapped = jax.shard_map(
        step,
        mesh=mesh,
        in_specs=(P(), P("index"), P("index"), P(),
                  P("data"), P("data")),
        out_specs=P("data"),
        check_vma=False,
    )
    return jax.jit(smapped)


def sharded_detect_merge_fn(mesh: Mesh, cfg: Config, nbases: int,
                            prefilter: bool = True):
    """Like sharded_detect_fn, but additionally performs the collective
    junction dedup/merge on device (BASELINE.json:5/10): each data shard
    collapses its per-read records with a sort+segment combine, the
    per-shard tables are all_gather'd over the "data" axis, and the
    gathered stack is re-merged — returning one replicated junction
    table. Merging is associative/commutative on integers, so the result
    is bit-identical to a single-device merge."""

    def step(gpacked, tables, metas, chrom_offsets, reads, lens):
        table_l = tables[0]
        meta_l = metas[0]
        anchors_a, anchors_b = read_anchors(reads, lens, cfg)
        hits_a = align_anchors(table_l, meta_l, anchors_a, cfg,
                               axis_name="index")
        hits_b = align_anchors(table_l, meta_l, anchors_b, cfg,
                               axis_name="index")
        res = detect_core(gpacked, nbases, chrom_offsets, reads, lens,
                          hits_a, hits_b, cfg, prefilter)
        local = merge_junctions(res, lens, cfg)
        gathered = {k: jax.lax.all_gather(v, "data") for k, v in
                    local.items()}
        return merge_tables(gathered)

    smapped = jax.shard_map(
        step,
        mesh=mesh,
        in_specs=(P(), P("index"), P("index"), P(),
                  P("data"), P("data")),
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(smapped)


class ShardedEngine:
    """Host-side wrapper: builds device arrays with the right shardings
    and runs batches through the sharded step."""

    def __init__(self, genome: Genome, index: SeedIndex, mesh: Mesh,
                 cfg: Config = Config(), prefilter: bool = True) -> None:
        self.cfg = cfg
        self.mesh = mesh
        n_index = mesh.shape["index"]
        self.n_data = mesh.shape["data"]
        tables, metas = shard_query_table(index, n_index, cfg)
        self.fn = sharded_detect_fn(mesh, cfg, len(genome), prefilter)
        self.merge_fn = sharded_detect_merge_fn(mesh, cfg, len(genome),
                                                prefilter)

        def put(x, spec):
            return jax.device_put(x, NamedSharding(mesh, spec))

        self.gpacked = put(pack_nibbles(genome.codes), P())
        self.tables = put(tables, P("index"))
        self.metas = put(metas, P("index"))
        self.chrom_offsets = put(
            genome.chrom_offsets.astype(np.uint32), P())

    def detect(self, reads: np.ndarray, lens: np.ndarray):
        """reads uint8 [B, Lp], lens int32 [B]; B % n_data == 0."""
        reads_d = jax.device_put(
            reads, NamedSharding(self.mesh, P("data")))
        lens_d = jax.device_put(
            lens, NamedSharding(self.mesh, P("data")))
        out = self.fn(self.gpacked, self.tables, self.metas,
                      self.chrom_offsets, reads_d, lens_d)
        return {k: np.asarray(v) for k, v in out.items()}

    def detect_merged(self, reads: np.ndarray, lens: np.ndarray):
        """Full sharded detect + on-device collective junction merge."""
        reads_d = jax.device_put(
            reads, NamedSharding(self.mesh, P("data")))
        lens_d = jax.device_put(
            lens, NamedSharding(self.mesh, P("data")))
        out = self.merge_fn(self.gpacked, self.tables, self.metas,
                            self.chrom_offsets, reads_d, lens_d)
        return {k: np.asarray(v) for k, v in out.items()}
