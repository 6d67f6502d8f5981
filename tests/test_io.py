"""I/O layer unit tests: parsers, codec, 2-bit packing, BED contract.

Mirrors the reference's implicit contracts (SURVEY.md §2.1, §3.2) —
bit-exactness lives or dies in this layer (SURVEY.md §7 step 1).
"""

import gzip

import numpy as np
import pytest

from find_circ2_tpu.config import Config, N
from find_circ2_tpu.io.bed import HEADER, JunctionRow, read_bed, renumber, write_bed
from find_circ2_tpu.io.fasta import read_fasta, write_fasta
from find_circ2_tpu.io.fastq import (FastqRecord, anchors_for_read,
                                     decode_anchor_name, encode_anchor_name,
                                     read_fastq, write_fastq)
from find_circ2_tpu.io.genome import Genome
from find_circ2_tpu.io.twobit import (codes_to_seq, pack_2bit, revcomp_seq,
                                      seq_to_codes, unpack_2bit)


def test_codes_roundtrip():
    s = "ACGTNacgtn"
    codes = seq_to_codes(s)
    assert list(codes) == [0, 1, 2, 3, 4, 0, 1, 2, 3, 4]
    assert codes_to_seq(codes) == "ACGTNACGTN"


def test_revcomp():
    assert revcomp_seq("ACGT") == "ACGT"
    assert revcomp_seq("AACGTN") == "NACGTT"
    assert revcomp_seq("GT") == "AC"
    assert revcomp_seq("AG") == "CT"


def test_pack_2bit_roundtrip():
    rng = np.random.default_rng(0)
    for n in (0, 1, 7, 8, 9, 100, 1023):
        codes = rng.integers(0, 5, size=n).astype(np.uint8)  # includes N
        packed, nmask = pack_2bit(codes)
        out = unpack_2bit(packed, nmask, n)
        assert np.array_equal(out, codes)
        assert packed.nbytes <= n // 4 + 1


def test_fasta_roundtrip(tmp_path):
    recs = [("chr1", "ACGT" * 30), ("chr2 extra description".split()[0], "TTTT")]
    p = tmp_path / "g.fa"
    write_fasta(p, recs, width=7)
    assert list(read_fasta(p)) == recs


def test_fasta_gzip(tmp_path):
    p = tmp_path / "g.fa.gz"
    with gzip.open(p, "wt") as fh:
        fh.write(">c1 desc here\nACGT\nACGT\n>c2\nGGGG\n")
    assert list(read_fasta(p)) == [("c1", "ACGTACGT"), ("c2", "GGGG")]


def test_fastq_roundtrip(tmp_path):
    p = tmp_path / "r.fq"
    recs = [FastqRecord("r1", "ACGT", "IIII"), FastqRecord("r2", "GGTT", "!!__")]
    with open(p, "wt") as fh:
        for r in recs:
            write_fastq(fh, r)
    assert list(read_fastq(p)) == recs


def test_anchor_codec_roundtrip():
    # Quality strings may contain '_' and even '__' (SPEC-adjacent fix).
    for qual in ("IIII" * 10, "_" * 40, "ab__cd" + "I" * 34, ""):
        enc = encode_anchor_name("read/1", "ACGT" * 10, qual, "B")
        assert decode_anchor_name(enc) == ("read/1", "ACGT" * 10, qual, "B")
    with pytest.raises(ValueError):
        encode_anchor_name("bad__name", "ACGT", "IIII", "A")


def test_anchors_for_read():
    cfg = Config()
    short = FastqRecord("s", "A" * 39, "I" * 39)
    assert list(anchors_for_read(short, cfg.anchor_len)) == []
    seq = "A" * 20 + "C" * 30 + "G" * 20
    rec = FastqRecord("r", seq, "I" * 70)
    a, b = anchors_for_read(rec, cfg.anchor_len)
    assert a.seq == "A" * 20 and b.seq == "G" * 20
    name, full, qual, side = decode_anchor_name(a.name)
    assert (name, full, side) == ("r", seq, "A")
    assert decode_anchor_name(b.name)[3] == "B"


def test_genome_layout():
    cfg = Config()
    g = Genome.from_records([("c1", "ACGT" * 100), ("c2", "TTAA" * 50)], cfg)
    assert g.n_chroms == 2
    assert int(g.chrom_offsets[0]) == cfg.chrom_gap
    assert int(g.chrom_offsets[1]) == 2 * cfg.chrom_gap + 400
    assert len(g) == 3 * cfg.chrom_gap + 400 + 200
    # gap sentinel between and around chromosomes
    assert g.codes[0] == 5 and g.codes[cfg.chrom_gap - 1] == 5
    assert codes_to_seq(g.codes[cfg.chrom_gap:cfg.chrom_gap + 4]) == "ACGT"
    # coordinate conversions
    idx, lpos = g.to_local([cfg.chrom_gap, 2 * cfg.chrom_gap + 400 + 3])
    assert list(idx) == [0, 1] and list(lpos) == [0, 3]
    assert int(g.chrom_of(5)) == -1  # inside a gap
    assert int(g.to_global(1, 3)) == 2 * cfg.chrom_gap + 400 + 3


def test_bed_roundtrip(tmp_path):
    row = JunctionRow("chr1", 10, 200, "x", 5, "+", 4, 3, 40, 40,
                      "s1", "5", 1, 0, 1, "GTAG", "NA",
                      "CIRCULAR,UNAMBIGUOUS_BP,ANCHOR_UNIQUE,CANONICAL")
    p = tmp_path / "j.bed"
    write_bed(p, [row])
    text = p.read_text().splitlines()
    assert text[0] == HEADER
    assert list(read_bed(p)) == [row]


def test_renumber_ordering():
    def mk(chrom, start, end, strand, cat):
        return JunctionRow(chrom, start, end, "", 1, strand, 1, 1, 40, 40,
                           "s", "1", 0, 0, 1, "GTAG", "NA", cat)
    rows = [mk("chr2", 5, 50, "+", "CIRCULAR"),
            mk("chr1", 9, 90, "-", "LINEAR"),
            mk("chr1", 3, 30, "+", "CIRCULAR")]
    out = renumber(rows, "T_")
    assert [r.chrom for r in out] == ["chr1", "chr1", "chr2"]
    assert out[0].name == "T_circ_000001"
    assert out[1].name == "T_norm_000001"
    assert out[2].name == "T_circ_000002"
