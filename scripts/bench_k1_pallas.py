"""Microbench: K1's bucket-row gather, three ways (VERDICT r1 task 8).

Implementations of `table[idx]` for a K1-shaped workload (1M random 32 B
rows over a chr20-scale table):

  xla     — jnp.take(table, idx, axis=0), the production path
  sorted  — sort idx, take, unsort (locality probe: wins only when the
            index density makes neighboring rows share HBM row buffers)
  pallas  — ops/pallas_k1.gather_rows_pallas: explicit DEPTH-deep row
            DMAs (one descriptor per row from the scalar core)

Usage: python scripts/bench_k1_pallas.py [--rows N] [--buckets T]
Prints ns/row for each implementation; results recorded in
docs/DESIGN.md "Pallas K1 verdict".
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def timeit(fn, *args, iters=5):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)          # compile
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
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
    rng = np.random.default_rng(0)
    table = jnp.asarray(
        rng.integers(-2**31, 2**31, size=(args.buckets, args.lanes),
                     dtype=np.int64).astype(np.int32))
    idx = jnp.asarray(rng.integers(0, args.buckets, size=n,
                                   dtype=np.int64).astype(np.int32))
    print(f"bench_k1: device={jax.devices()[0].device_kind}, "
          f"{n} rows over {args.buckets} x {args.lanes} int32 "
          f"({args.buckets * args.lanes * 4 / 1e9:.2f} GB table)",
          file=sys.stderr)

    xla = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
    t_xla, ref = timeit(xla, table, idx)
    print(f"bench_k1: xla     {t_xla * 1e9 / n:7.1f} ns/row "
          f"({n / t_xla / 1e6:.1f}M rows/s)", file=sys.stderr)

    def sorted_take(t, i):
        order = jnp.argsort(i)
        g = jnp.take(t, i[order], axis=0)
        inv = jnp.zeros_like(order).at[order].set(
            jnp.arange(order.shape[0], dtype=order.dtype))
        return jnp.take(g, inv, axis=0)

    t_sort, out = timeit(jax.jit(sorted_take), table, idx)
    assert (np.asarray(out) == np.asarray(ref)).all()
    print(f"bench_k1: sorted  {t_sort * 1e9 / n:7.1f} ns/row "
          f"({n / t_sort / 1e6:.1f}M rows/s)", file=sys.stderr)

    if not args.skip_pallas:
        t_pl, out = timeit(gather_rows_pallas, table, idx, iters=2)
        assert (np.asarray(out) == np.asarray(ref)).all()
        print(f"bench_k1: pallas  {t_pl * 1e9 / n:7.1f} ns/row "
              f"({n / t_pl / 1e6:.1f}M rows/s)", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
