"""Worker for tests/test_distributed.py: one process of a real
2-process jax.distributed CPU job (SURVEY.md §4 "multi-host tests
without a real cluster").

Each process owns 4 virtual CPU devices; the global (data=2, index=4)
mesh spans both, so the "data" axis is genuinely cross-process (DCN-like
via Gloo) and the "index" collectives stay process-local. The worker
runs the sharded detect+merge on its local read slice and dumps the
replicated merged table + the psum'd stats vector as JSON for the test
driver to compare against a single-process run.

Usage: nproc_worker.py <pid> <nproc> <port> <outdir> [hier]
"""

import json
import os
import sys


def main():
    pid, nproc = int(sys.argv[1]), int(sys.argv[2])
    port, outdir = sys.argv[3], sys.argv[4]
    hier = len(sys.argv) > 5 and sys.argv[5] == "hier"
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=4"
                               ).strip()
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(f"localhost:{port}", nproc, pid)
    assert jax.process_count() == nproc

    import numpy as np
    from find_circ2_tpu.config import RPAD_CODE, Config
    from find_circ2_tpu.index.build import build_index
    from find_circ2_tpu.io.twobit import seq_to_codes
    from find_circ2_tpu.parallel.distributed import (allreduce_counts,
                                                     global_mesh,
                                                     host_read_slice)
    from find_circ2_tpu.parallel.mesh import make_hier_mesh
    from find_circ2_tpu.parallel.sharded import ShardedEngine
    from find_circ2_tpu.utils.simulate import simulate

    cfg = Config()
    sim = simulate(seed=77, n_circ=5, n_linear=3, reads_per_junction=4,
                   n_contiguous=8, n_random=4, err_rate=0.3)
    idx = build_index(sim.genome, cfg)

    B = 64
    reads = np.full((B, cfg.max_read_len), RPAD_CODE, np.uint8)
    lens = np.zeros(B, np.int32)
    kept = [(n, s) for n, s in sim.reads
            if 2 * cfg.anchor_len <= len(s) <= cfg.max_read_len][:B]
    for i, (_, s) in enumerate(kept):
        codes = seq_to_codes(s)
        reads[i, :codes.size] = codes
        lens[i] = codes.size

    if hier:
        # dhost spans the processes; data/index stay process-local.
        mesh = make_hier_mesh(nproc, 2, 2)
    else:
        mesh = global_mesh()          # (data=nproc, index=4)
    eng = ShardedEngine(sim.genome, idx, mesh, cfg)

    # This process's local slice of the global batch (host-major order
    # matches the mesh's data axis layout).
    lo, hi = host_read_slice(B, pid, nproc)
    merged = eng.detect_merged(reads[lo:hi], lens[lo:hi])
    n = int(merged["valid"].sum())
    table = {k: np.asarray(v)[:n].tolist() for k, v in merged.items()}

    # Cross-process stats aggregation: per-host counters -> global.
    local_counts = np.asarray([hi - lo, n], np.int64)
    global_counts = allreduce_counts(local_counts)

    with open(os.path.join(outdir, f"out_{pid}.json"), "w") as fh:
        json.dump({"mesh": dict(mesh.shape), "n": n, "table": table,
                   "counts": global_counts.tolist()}, fh)
    print(f"worker {pid}: mesh={dict(mesh.shape)} n={n}", flush=True)


if __name__ == "__main__":
    main()
