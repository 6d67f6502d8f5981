"""Multi-host CLI plumbing (SURVEY.md §7 step 6, VERDICT r2 missing #6):
a REAL 2-OS-process `find_circ --nproc` run — jax.distributed init,
round-robin read sharding, per-process local detection, file-based
junction merge on process 0, psum'd stats — must produce byte-identical
BED + stats to a single-process run."""

import os
import socket
import subprocess
import sys

from find_circ2_tpu.utils.simulate import simulate

CLI = [sys.executable, "-m", "find_circ2_tpu.cli.main", "find_circ"]


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _write_inputs(tmp_path):
    from find_circ2_tpu.io.fasta import write_fasta
    from find_circ2_tpu.io.fastq import FastqRecord, write_fastq
    from find_circ2_tpu.io.twobit import codes_to_seq

    sim = simulate(seed=91, n_circ=4, n_linear=2, reads_per_junction=3,
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
    return fa, fq


def _env():
    env = dict(os.environ)
    env["PYTHONPATH"] = ("/root/repo" + os.pathsep
                         + env.get("PYTHONPATH", ""))
    env["JAX_PLATFORMS"] = "cpu"
    # The workers form their own tiny distributed job; drop the test
    # session's virtual-device forcing so each process is 1 CPU device.
    env.pop("XLA_FLAGS", None)
    return env


def test_nproc2_cli_byte_identical(tmp_path):
    fa, fq = _write_inputs(tmp_path)
    base = ["--reads-format", "fastq", "-G", str(fa), "-s", None,
            "-o", None, "--batch-size", "32"]

    def args_for(tag):
        a = list(base)
        a[a.index(None)] = str(tmp_path / f"{tag}.stats")
        a[a.index(None)] = str(tmp_path / f"{tag}.bed")
        return CLI + [str(fq)] + a

    # Single-process reference run.
    out = subprocess.run(args_for("single"), env=_env(), timeout=420,
                         capture_output=True, text=True)
    assert out.returncode == 0, out.stderr[-2000:]

    # 2-process run: same inputs, one merged output from process 0.
    port = _free_port()
    procs = []
    for pid in range(2):
        procs.append(subprocess.Popen(
            args_for("nproc") + ["--nproc", "2", "--proc-id", str(pid),
                                 "--coordinator", f"localhost:{port}"],
            env=_env(), stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True))
    outs = [p.communicate(timeout=420)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, "\n====\n".join(o[-2000:] for o in outs)

    single_bed = (tmp_path / "single.bed").read_text()
    assert (tmp_path / "nproc.bed").read_text() == single_bed
    assert (tmp_path / "nproc.stats").read_text() == \
        (tmp_path / "single.stats").read_text()
    assert "circ_" in single_bed
    # Part files were cleaned up after the merge.
    assert not list(tmp_path.glob("nproc.bed.part*"))
