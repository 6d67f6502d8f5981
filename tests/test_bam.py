"""Binary BAM input (io/bam.py) — completes the samtools replacement:
the reference pipeline pipes `samtools view -hbf 4` BAM into
unmapped2anchors (SURVEY.md §3.1, §2.2 samtools row).

The writer here is the test oracle for the reader: spec-conformant BGZF
(BC extra subfield, EOF sentinel) + BAM record layout, round-tripped and
cross-checked against the SAM text path (both share
io.sam.original_reads, so selection semantics cannot diverge).
"""

import gzip
import struct

from find_circ2_tpu.cli import main as cli_main
from find_circ2_tpu.io.bam import (BGZF_EOF, read_bam, reads_from_bam,
                                   sniff_format, write_bam)
from find_circ2_tpu.io.fastq import FastqRecord, write_fastq
from find_circ2_tpu.io.sam import SamRecord, reads_from_sam
from find_circ2_tpu.utils.simulate import simulate

RECS = [
    SamRecord("mapped", 0, "ACGTACGT", "IIIIIIII"),
    SamRecord("u_fwd", 4, "AACCGGTT", "IIIIHHHH"),
    SamRecord("u_rev", 20, "AACCGGTTA", "IIIIIHHHB"),   # odd length
    SamRecord("sec", 260, "ACGTACGT", "IIIIIIII"),
    SamRecord("sup", 2052, "ACGTACGT", "IIIIIIII"),
    SamRecord("star", 4, "*", ""),
    SamRecord("noqual", 4, "ACGTN", ""),
    SamRecord("pair", 77, "ACGTAAAA", "IIIIIIII"),
    SamRecord("pair", 141, "TTTTACGT", "IIIIIIII"),
]


def _sam_text(recs):
    lines = ["@HD\tVN:1.6", "@SQ\tSN:chr1\tLN:1000"]
    for r in recs:
        lines.append(f"{r.name}\t{r.flag}\t*\t0\t0\t*\t*\t0\t0\t"
                     f"{r.seq}\t{r.qual or '*'}")
    return "\n".join(lines) + "\n"


def test_bam_roundtrip(tmp_path):
    bam = tmp_path / "t.bam"
    assert write_bam(bam, RECS, refs=[("chr1", 1000)],
                     header_text="@HD\tVN:1.6\n") == len(RECS)
    got = list(read_bam(bam))
    assert got == RECS


def test_bam_bgzf_conformance(tmp_path):
    bam = tmp_path / "t.bam"
    write_bam(bam, RECS)
    raw = bam.read_bytes()
    assert raw.endswith(BGZF_EOF)
    # Every member must carry the BC extra subfield with a BSIZE that
    # chains exactly to the next member (this is what samtools checks).
    off = 0
    while off < len(raw):
        assert raw[off:off + 4] == b"\x1f\x8b\x08\x04"
        (xlen,) = struct.unpack_from("<H", raw, off + 10)
        assert raw[off + 12:off + 14] == b"BC"
        (bsize,) = struct.unpack_from("<H", raw, off + 16)
        off += bsize + 1
    assert off == len(raw)


def test_bam_selection_equals_sam(tmp_path):
    sam, bam = tmp_path / "t.sam", tmp_path / "t.bam"
    sam.write_text(_sam_text(RECS))
    write_bam(bam, RECS)
    assert list(reads_from_bam(bam)) == list(reads_from_sam(sam))
    assert (list(reads_from_bam(bam, unmapped_only=False))
            == list(reads_from_sam(sam, unmapped_only=False)))


def test_bam_multiblock(tmp_path):
    """>64 KB of records forces several BGZF members; gzip-member
    chaining and record framing must survive block boundaries."""
    recs = [SamRecord(f"r{i:05d}", 4, "ACGT" * 30, "I" * 120)
            for i in range(2000)]
    bam = tmp_path / "big.bam"
    write_bam(bam, recs)
    members = bam.read_bytes().count(b"\x1f\x8b\x08\x04")
    assert members > 2
    assert list(read_bam(bam)) == recs


def test_sniff_format(tmp_path):
    bam, sam, fq = tmp_path / "a.bam", tmp_path / "a.sam", tmp_path / "a.fq"
    write_bam(bam, RECS)
    sam.write_text(_sam_text(RECS))
    with open(fq, "wt") as fh:
        write_fastq(fh, FastqRecord("read1", "ACGT", "IIII"))
    assert sniff_format(bam) == "bam"
    assert sniff_format(sam) == "sam"
    assert sniff_format(fq) == "fastq"
    # gzipped text variants
    samgz, fqgz = tmp_path / "a.sam.gz", tmp_path / "a.fq.gz"
    samgz.write_bytes(gzip.compress(sam.read_bytes()))
    fqgz.write_bytes(gzip.compress(fq.read_bytes()))
    assert sniff_format(samgz) == "sam"
    assert sniff_format(fqgz) == "fastq"
    # headerless SAM still sniffs as sam (11+ tab-separated fields)
    hless = tmp_path / "h.sam"
    hless.write_text(_sam_text(RECS).split("\n", 2)[2])
    assert sniff_format(hless) == "sam"


def test_unmapped2anchors_bam_auto(tmp_path):
    """unmapped2anchors with --format auto on BAM == SAM run."""
    sim = simulate(seed=37, n_circ=2, n_linear=1, reads_per_junction=2,
                   n_contiguous=2, n_random=1)
    recs = [SamRecord(name, 4, seq, "I" * len(seq))
            for name, seq in sim.reads]
    sam, bam = tmp_path / "r.sam", tmp_path / "r.bam"
    sam.write_text(_sam_text(recs))
    write_bam(bam, recs)
    a_sam, a_bam = tmp_path / "a_sam.fastq", tmp_path / "a_bam.fastq"
    assert cli_main.main(["unmapped2anchors", str(sam),
                          "-o", str(a_sam)]) == 0       # auto -> sam
    assert cli_main.main(["unmapped2anchors", str(bam),
                          "-o", str(a_bam)]) == 0       # auto -> bam
    assert a_sam.read_text() == a_bam.read_text()
    assert a_sam.read_text()                  # non-empty: anchors emitted


def test_find_circ_bam_equals_sam(tmp_path):
    """find_circ --reads-format bam is byte-identical to sam input."""
    from find_circ2_tpu.io.fasta import write_fasta
    from find_circ2_tpu.io.twobit import codes_to_seq, revcomp_seq
    sim = simulate(seed=38, n_circ=3, n_linear=2, reads_per_junction=3,
                   n_contiguous=3, n_random=2)
    fa = tmp_path / "genome.fa"
    write_fasta(fa, [(n, codes_to_seq(
        sim.genome.codes[sim.genome.chrom_offsets[i]:
                         sim.genome.chrom_offsets[i]
                         + sim.genome.chrom_lengths[i]]))
        for i, n in enumerate(sim.genome.chrom_names)])
    recs = []
    for i, (name, seq) in enumerate(sim.reads):
        flag = 4 | (0x10 if i % 2 else 0)
        recs.append(SamRecord(name, flag,
                              revcomp_seq(seq) if flag & 0x10 else seq,
                              "I" * len(seq)))
    sam, bam = tmp_path / "r.sam", tmp_path / "r.bam"
    sam.write_text(_sam_text(recs))
    write_bam(bam, recs)
    out_sam, out_bam = tmp_path / "sam.bed", tmp_path / "bam.bed"
    base = ["--backend", "oracle", "-G", str(fa), "-n", "s"]
    assert cli_main.main(["find_circ", str(sam), "--reads-format", "sam",
                          "-o", str(out_sam)] + base) == 0
    assert cli_main.main(["find_circ", str(bam), "--reads-format", "bam",
                          "-o", str(out_bam)] + base) == 0
    assert out_sam.read_text() == out_bam.read_text()
    assert out_sam.read_text().count("\n") > 1
