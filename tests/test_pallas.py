"""Pallas K2 kernel vs the jnp reference path: bit-identical outputs
(interpreter mode on the CPU test backend)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from find_circ2_tpu.config import (Config, KIND_CIRCULAR, KIND_LINEAR,
                                   RPAD_CODE)
from find_circ2_tpu.index.build import build_index
from find_circ2_tpu.models.pipeline import DeviceIndex
from find_circ2_tpu.ops.breakpoint import breakpoint_search
from find_circ2_tpu.ops.pallas_breakpoint import breakpoint_search_pallas
from find_circ2_tpu.io.twobit import seq_to_codes
from find_circ2_tpu.utils.simulate import simulate

CFG = Config()


def test_pallas_breakpoint_matches_jnp():
    sim = simulate(seed=81, n_circ=4, n_linear=3, reads_per_junction=3,
                   n_contiguous=4, n_random=2, err_rate=0.4)
    dindex = DeviceIndex.build(sim.genome, build_index(sim.genome, CFG),
                               CFG)
    rng = np.random.default_rng(0)
    B = 300  # deliberately not a multiple of the kernel block
    Lp = CFG.max_read_len
    reads = np.full((B, Lp), RPAD_CODE, np.uint8)
    lens = np.zeros(B, np.int32)
    eligible = [s for _, s in sim.reads
                if 2 * CFG.anchor_len <= len(s) <= Lp]
    G = dindex.nbases
    pA = rng.integers(2000, G - 2000, size=B).astype(np.uint32)
    endB = (pA.astype(np.int64)
            + rng.integers(-1500, 1500, size=B)).astype(np.uint32)
    endB = np.clip(endB, 600, G - 600)
    kinds = rng.integers(0, 2, size=B).astype(np.int32)
    strands = rng.integers(0, 2, size=B).astype(np.int32)
    for i in range(B):
        s = eligible[i % len(eligible)]
        codes = seq_to_codes(s)
        reads[i, :codes.size] = codes
        lens[i] = codes.size

    args = (dindex.gpacked, dindex.nbases, jnp.asarray(reads),
            jnp.asarray(lens), jnp.asarray(pA), jnp.asarray(endB),
            jnp.asarray(kinds), jnp.asarray(strands), CFG)
    ref = breakpoint_search(*args)
    got = breakpoint_search_pallas(*args, interpret=True)
    for key in ref:
        r = np.asarray(ref[key])
        g = np.asarray(got[key])
        assert np.array_equal(r, g), (key, r[:8], g[:8])


def test_pipeline_with_pallas_k2_matches_default():
    """Full pipeline with cfg.pallas_k2 must be bit-identical."""
    from find_circ2_tpu.models.pipeline import run_reads
    sim = simulate(seed=83, n_circ=4, n_linear=2, reads_per_junction=3,
                   n_contiguous=8, n_random=4, err_rate=0.3)
    base = Config(batch_size=128)
    pall = Config(batch_size=128, pallas_k2=True)
    idx = build_index(sim.genome, base)
    d1 = DeviceIndex.build(sim.genome, idx, base)
    calls1 = run_reads(d1, sim.reads, base)
    calls2 = run_reads(d1, sim.reads, pall)
    assert [c.__dict__ for c in calls1] == [c.__dict__ for c in calls2]


def test_pallas_k1_gather_rows_matches_take():
    """ops/pallas_k1 row-DMA gather == jnp.take (interpret mode on CPU)."""
    import jax.numpy as jnp
    import numpy as np
    from find_circ2_tpu.ops.pallas_k1 import CHUNK, gather_rows_pallas

    rng = np.random.default_rng(5)
    table = jnp.asarray(rng.integers(-100, 100, size=(500, 8),
                                     dtype=np.int64).astype(np.int32))
    idx = jnp.asarray(rng.integers(0, 500, size=2 * CHUNK,
                                   dtype=np.int64).astype(np.int32))
    got = gather_rows_pallas(table, idx, interpret=True)
    want = jnp.take(table, idx, axis=0)
    assert (np.asarray(got) == np.asarray(want)).all()
