"""SAM text input + paired-end mate semantics (SPEC.md §7).

The reference pipeline feeds `bowtie2 | samtools view -hbf 4` into
unmapped2anchors (SURVEY.md §3.1); these tests pin our SAM front end to
that selection and the --pe mate-2 orientation transform.
"""

import numpy as np

from find_circ2_tpu.cli import main as cli_main
from find_circ2_tpu.config import Config
from find_circ2_tpu.io.bed import read_bed
from find_circ2_tpu.io.fasta import write_fasta
from find_circ2_tpu.io.fastq import FastqRecord, write_fastq
from find_circ2_tpu.io.sam import reads_from_sam
from find_circ2_tpu.io.twobit import codes_to_seq, revcomp_seq
from find_circ2_tpu.utils.simulate import simulate

CFG = Config(batch_size=256)


def test_sam_reader_selection_and_orientation(tmp_path):
    sam = tmp_path / "in.sam"
    sam.write_text("\n".join([
        "@HD\tVN:1.6",
        "@SQ\tSN:chr1\tLN:1000",
        # mapped primary: excluded by unmapped_only
        "mapped\t0\tchr1\t10\t42\t8M\t*\t0\t0\tACGTACGT\tIIIIIIII",
        # unmapped forward
        "u_fwd\t4\t*\t0\t0\t*\t*\t0\t0\tAACCGGTT\tIIIIIIII",
        # unmapped, reverse flag: stored seq is rc of the original read
        "u_rev\t20\t*\t0\t0\t*\t*\t0\t0\tAACCGGTT\tIIIIIIII",
        # secondary (0x100) unmapped: skipped (duplicates a primary)
        "sec\t260\t*\t0\t0\t*\t*\t0\t0\tACGTACGT\tIIIIIIII",
        # supplementary (0x800): skipped
        "sup\t2052\t*\t0\t0\t*\t*\t0\t0\tACGTACGT\tIIIIIIII",
        # star sequence: skipped
        "star\t4\t*\t0\t0\t*\t*\t0\t0\t*\t*",
        # paired unmapped mates: names get /1 and /2, mate2 flagged
        "pair\t77\t*\t0\t0\t*\t*\t0\t0\tACGTAAAA\tIIIIIIII",
        "pair\t141\t*\t0\t0\t*\t*\t0\t0\tTTTTACGT\tIIIIIIII",
    ]) + "\n")
    got = [(n, s, m) for n, s, _q, m in reads_from_sam(sam)]
    assert got == [
        ("u_fwd", "AACCGGTT", False),
        ("u_rev", revcomp_seq("AACCGGTT"), False),
        ("pair/1", "ACGTAAAA", False),
        ("pair/2", "TTTTACGT", True),
    ]
    # Reverse-flagged records restore the qual orientation too.
    quals = {n: q for n, _s, q, _m in reads_from_sam(sam)}
    assert quals["u_rev"] == "IIIIIIII"[::-1]
    # unmapped_only=False keeps the mapped primary too.
    all_reads = list(reads_from_sam(sam, unmapped_only=False))
    assert all_reads[0] == ("mapped", "ACGTACGT", "IIIIIIII", False)
    assert len(all_reads) == 5


def _write_genome(tmp_path, sim):
    fa = tmp_path / "genome.fa"
    write_fasta(fa, [(n, codes_to_seq(
        sim.genome.codes[sim.genome.chrom_offsets[i]:
                         sim.genome.chrom_offsets[i]
                         + sim.genome.chrom_lengths[i]]))
        for i, n in enumerate(sim.genome.chrom_names)])
    return fa


def _write_sam(path, reads, flags=None):
    with open(path, "wt") as fh:
        fh.write("@HD\tVN:1.6\n")
        for i, (name, seq) in enumerate(reads):
            flag = 4 if flags is None else flags[i]
            stored = revcomp_seq(seq) if flag & 0x10 else seq
            fh.write(f"{name}\t{flag}\t*\t0\t0\t*\t*\t0\t0\t{stored}\t"
                     f"{'I' * len(stored)}\n")


def test_sam_input_equals_fastq(tmp_path):
    """find_circ on SAM text (half the records reverse-flagged) is
    byte-identical to the same reads as FASTQ."""
    sim = simulate(seed=33, n_circ=4, n_linear=2, reads_per_junction=3,
                   n_contiguous=4, n_random=2)
    fa = _write_genome(tmp_path, sim)
    fq = tmp_path / "reads.fastq"
    with open(fq, "wt") as fh:
        for name, seq in sim.reads:
            write_fastq(fh, FastqRecord(name, seq, "I" * len(seq)))
    sam = tmp_path / "reads.sam"
    flags = [4 | (0x10 if i % 2 else 0) for i in range(len(sim.reads))]
    _write_sam(sam, sim.reads, flags)
    out_fq, out_sam = tmp_path / "fq.bed", tmp_path / "sam.bed"
    base = ["find_circ", "--backend", "oracle", "-G", str(fa), "-n", "s"]
    assert cli_main.main(base[:1] + [str(fq)] + base[1:]
                         + ["--reads-format", "fastq",
                            "-o", str(out_fq)]) == 0
    assert cli_main.main(base[:1] + [str(sam)] + base[1:]
                         + ["--reads-format", "sam",
                            "-o", str(out_sam)]) == 0
    assert out_fq.read_text() == out_sam.read_text()


def test_unmapped2anchors_sam(tmp_path):
    sim = simulate(seed=34, n_circ=2, n_linear=1, reads_per_junction=2,
                   n_contiguous=2, n_random=1)
    fq = tmp_path / "r.fastq"
    with open(fq, "wt") as fh:
        for name, seq in sim.reads:
            write_fastq(fh, FastqRecord(name, seq, "I" * len(seq)))
    sam = tmp_path / "r.sam"
    _write_sam(sam, sim.reads)
    a_fq, a_sam = tmp_path / "a_fq.fastq", tmp_path / "a_sam.fastq"
    assert cli_main.main(["unmapped2anchors", str(fq),
                          "-o", str(a_fq)]) == 0
    assert cli_main.main(["unmapped2anchors", str(sam), "--format", "sam",
                          "-o", str(a_sam)]) == 0
    # Same anchors; SAM lost the original quals (written as I by both
    # since the FASTQ sim uses all-I quals).
    assert a_fq.read_text() == a_sam.read_text()


def _pe_files(tmp_path, sim):
    """Split reads into R1 (even) / R2 (odd, reverse-complemented) —
    a stranded paired-end library in standard FR orientation."""
    r1, r2 = tmp_path / "r1.fastq", tmp_path / "r2.fastq"
    with open(r1, "wt") as f1, open(r2, "wt") as f2:
        for i, (name, seq) in enumerate(sim.reads):
            if i % 2:
                write_fastq(f2, FastqRecord(name + "/2", revcomp_seq(seq),
                                            "I" * len(seq)))
            else:
                write_fastq(f1, FastqRecord(name + "/1", seq,
                                            "I" * len(seq)))
    return r1, r2


def test_pe_mate_flip_restores_strandmatch(tmp_path):
    """--pe reverse-complements mate-2 back to protocol orientation: a
    stranded FR library yields MATCH strandmatch with --pe and PARTIAL
    without, and --pe junction calls equal the unpaired original-reads
    run byte for byte (names/tissues aside)."""
    sim = simulate(seed=35, n_circ=4, n_linear=2, reads_per_junction=4,
                   n_contiguous=4, n_random=2, minus_fraction=0.0)
    fa = _write_genome(tmp_path, sim)
    fq = tmp_path / "orig.fastq"
    with open(fq, "wt") as fh:
        for i, (name, seq) in enumerate(sim.reads):
            write_fastq(fh, FastqRecord(f"{name}/{2 if i % 2 else 1}",
                                        seq, "I" * len(seq)))
    r1, r2 = _pe_files(tmp_path, sim)
    base = ["find_circ", "--reads-format", "fastq", "--backend", "oracle",
            "-G", str(fa), "-n", "s", "--stranded"]
    plain, pe, nope = (tmp_path / f"{n}.bed" for n in
                       ("plain", "pe", "nope"))
    assert cli_main.main(base[:1] + [str(fq)] + base[1:]
                         + ["-o", str(plain)]) == 0
    assert cli_main.main(base[:1] + [str(r1), str(r2)] + base[1:]
                         + ["--pe", "-o", str(pe)]) == 0
    assert cli_main.main(base[:1] + [str(r1), str(r2)] + base[1:]
                         + ["-o", str(nope)]) == 0
    assert pe.read_text() == plain.read_text()
    prow = {r.key(): r for r in read_bed(pe)}
    nrow = {r.key(): r for r in read_bed(nope)}
    assert all(r.strandmatch == "MATCH" for r in prow.values())
    mixed = [k for k, r in nrow.items()
             if r.strandmatch == "PARTIAL" and r.n_reads > 1]
    assert mixed, "raw mate-2 reads must break strandmatch"


def test_pe_device_fast_path_equals_oracle(tmp_path):
    """The native fast path's vectorized mate-2 reverse complement
    (models/stream.run_fastq revcomp=True) matches the oracle --pe run."""
    sim = simulate(seed=36, n_circ=3, n_linear=1, reads_per_junction=4,
                   n_contiguous=3, n_random=1, minus_fraction=0.3)
    fa = _write_genome(tmp_path, sim)
    r1, r2 = _pe_files(tmp_path, sim)
    base = ["find_circ", str(r1), str(r2), "--reads-format", "fastq",
            "--pe", "--stranded", "-G", str(fa), "-n", "s",
            "--batch-size", "64"]
    dev, orc = tmp_path / "dev.bed", tmp_path / "orc.bed"
    assert cli_main.main(base + ["--backend", "device",
                                 "-o", str(dev)]) == 0
    assert cli_main.main(base + ["--backend", "oracle",
                                 "-o", str(orc)]) == 0
    assert dev.read_text() == orc.read_text()
