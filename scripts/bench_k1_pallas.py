"""Microbench: K1's bucket-row gather, three ways (VERDICT r1 task 8).

Implementations of `table[idx]` for a K1-shaped workload (1M random 32 B
rows over a chr20-scale table):

  xla     — jnp.take(table, idx, axis=0), the production path
  sorted  — sort idx, take, unsort (locality probe: wins only when the
            index density makes neighboring rows share HBM row buffers)
  xla512  — jnp.take over 512 B tiles (128 int32 lanes): per-ELEMENT cost
  pallas  — ops/pallas_k1.gather_rows_pallas: explicit DEPTH-deep row
            DMAs (one descriptor per row from the scalar core)

Timing honesty: on the tunneled `axon` platform `block_until_ready`
returns before execution finishes (measured: 32 chained 1M-row gathers
"complete" in 80 us), so naive timing reports dispatch cost, not device
time. Each engine is therefore timed as K dependent applications chained
inside ONE jitted program whose tiny output is fetched to the host
(np.asarray cannot lie); the tunnel's readback floor is measured on a
trivial program and subtracted.

Usage: python scripts/bench_k1_pallas.py [--rows N] [--buckets T]
Prints ns/row for each implementation; results recorded in
docs/DESIGN.md "Pallas K1 verdict".
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

# Repo import without PYTHONPATH (setting PYTHONPATH breaks the axon
# TPU plugin's helper processes).
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

CHAIN = 8   # dependent applications per timed program


def timed_readback(fn, *args, iters=3):
    """min wall time of np.asarray(fn(*args)) — output must be tiny."""
    out = np.asarray(fn(*args))              # compile + first run
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = np.asarray(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best, out


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_000_448,
                    help="rows to gather (K1 does ~1M per 4096 reads)")
    ap.add_argument("--buckets", type=int, default=31_000_000,
                    help="table rows (chr20-scale query table ~31M)")
    ap.add_argument("--lanes", type=int, default=8)
    ap.add_argument("--skip-pallas", action="store_true")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from find_circ2_tpu.ops.pallas_k1 import CHUNK, gather_rows_pallas

    n = (args.rows // CHUNK) * CHUNK
    T = args.buckets
    rng = np.random.default_rng(0)
    table = jnp.asarray(
        rng.integers(-2**31, 2**31, size=(T, args.lanes),
                     dtype=np.int64).astype(np.int32))
    idx = jnp.asarray(rng.integers(0, T, size=n,
                                   dtype=np.int64).astype(np.int32))
    print(f"bench_k1: device={jax.devices()[0].device_kind}, "
          f"{n} rows over {T} x {args.lanes} int32 "
          f"({T * args.lanes * 4 / 1e9:.2f} GB table), "
          f"chain depth {CHAIN}", file=sys.stderr)

    # Tunnel readback floor (same tiny output shape as the real probes).
    floor, _ = timed_readback(jax.jit(lambda i: i[:8] + 1), idx)
    print(f"bench_k1: readback floor {floor * 1e3:6.2f} ms",
          file=sys.stderr)

    def report(name, t, rows, note=""):
        dt = max(1e-9, t - floor)
        print(f"bench_k1: {name:7s} {dt * 1e9 / rows:7.1f} ns/row "
              f"({rows / dt / 1e6:6.1f}M rows/s{note})", file=sys.stderr)

    def chain_take(t, i):
        for _ in range(CHAIN):
            g = jnp.take(t, i, axis=0)
            i = ((i + g[:, 0].astype(jnp.int32)) & 0x7fffffff) % t.shape[0]
        return i[:8]

    t_xla, _ = timed_readback(jax.jit(chain_take), table, idx)
    report("xla", t_xla, CHAIN * n)

    def chain_sorted(t, i):
        for _ in range(CHAIN):
            order = jnp.argsort(i)
            g = jnp.take(t, i[order], axis=0)
            inv = jnp.zeros_like(order).at[order].set(
                jnp.arange(order.shape[0], dtype=order.dtype))
            g = jnp.take(g, inv, axis=0)
            i = ((i + g[:, 0].astype(jnp.int32)) & 0x7fffffff) % t.shape[0]
        return i[:8]

    t_sort, _ = timed_readback(jax.jit(chain_sorted), table, idx)
    report("sorted", t_sort, CHAIN * n)

    # 512 B tiles: Mosaic DMA slices must be 128-lane aligned, so the
    # Pallas engine fetches the 512 B tile containing each bucket row —
    # view the table as (T//k, 128), k = 128 // lanes buckets per tile.
    # XLA gathers the same tiles so both engines move identical bytes.
    k = 128 // args.lanes
    n_tiles = T // k
    del table
    tiles = jnp.asarray(
        rng.integers(-2**31, 2**31, size=(n_tiles, 128),
                     dtype=np.int64).astype(np.int32))
    nt = (n // 8 // CHUNK) * CHUNK   # 16x bytes/row; keep HBM sane
    tile_idx = (idx[:nt] % n_tiles).astype(jnp.int32)

    def chain_take_t(t, i):
        for _ in range(CHAIN):
            g = jnp.take(t, i, axis=0)
            i = ((i + g[:, 0].astype(jnp.int32)) & 0x7fffffff) % t.shape[0]
        return i[:8]

    t_xt, _ = timed_readback(jax.jit(chain_take_t), tiles, tile_idx)
    report("xla512", t_xt, CHAIN * nt, ", 512 B tiles")

    if not args.skip_pallas:
        # Correctness once (un-timed), then the timed dependent chain.
        ref = np.asarray(jax.jit(lambda t, i: jnp.take(t, i, axis=0))(
            tiles, tile_idx[:CHUNK * 4]))
        got = np.asarray(gather_rows_pallas(tiles, tile_idx[:CHUNK * 4]))
        assert (got == ref).all(), "pallas gather != XLA gather"

        @jax.jit
        def chain_pallas(t, i):
            for _ in range(CHAIN):
                g = gather_rows_pallas(t, i)
                i = ((i + g[:, 0].astype(jnp.int32))
                     & 0x7fffffff) % t.shape[0]
            return i[:8]

        t_pl, _ = timed_readback(chain_pallas, tiles, tile_idx, iters=2)
        report("pallas", t_pl, CHAIN * nt, ", 512 B tiles")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
