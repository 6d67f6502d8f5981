"""Generate the frozen on-disk test fixtures (SURVEY.md §4 implication
(1): bundled chr-subset genome + reads + golden BED/stats).

Run ONCE; the outputs under test_data/ are committed and reviewed. A
semantics change that alters the pipeline's output fails
tests/test_golden.py WITHOUT regenerating — regenerating goldens is a
deliberate, reviewed act (rerun this script and inspect the diff).

The read set covers every status class: junction reads (circular +
linear, with sequencing errors), contiguous reads (prefilter), random
reads (unaligned), too-short/too-long reads, and a planted repeat-decoy
multi-hit read (SPEC §2b pair exploration).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from find_circ2_tpu.config import Config
from find_circ2_tpu.index.build import build_index
from find_circ2_tpu.io.bed import write_bed
from find_circ2_tpu.io.fasta import write_fasta
from find_circ2_tpu.io.fastq import FastqRecord, write_fastq
from find_circ2_tpu.io.twobit import codes_to_seq
from find_circ2_tpu.models.aggregate import Aggregator
from find_circ2_tpu.models.oracle import call_read
from find_circ2_tpu.utils.simulate import simulate

OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "test_data")


def main():
    cfg = Config()
    sim = simulate(seed=20260818, n_circ=8, n_linear=5,
                   reads_per_junction=4, n_contiguous=20, n_random=8,
                   err_rate=0.4,
                   chrom_lengths={"chr20s": 120_000, "chr21s": 60_000})
    reads = list(sim.reads)
    # Pathological lengths.
    reads.append(("len_too_short", "ACGTACGTAC"))
    reads.append(("len_too_long", "ACGT" * 100))
    # Multi-hit decoy (mirrors tests/test_multihit.py): duplicate the
    # right piece of a circular junction at a lower position with one
    # inner mutation; the true pair wins on edits.
    g = sim.genome
    seq0 = np.array(g.codes[g.chrom_offsets[0]:
                            g.chrom_offsets[0] + g.chrom_lengths[0]])
    S, E, BP, L, D = 90_000, 91_000, 50, 100, 40_000
    seq0[S - 1], seq0[E - 1], seq0[S], seq0[E] = 2, 3, 0, 1
    seq0[D:D + BP] = seq0[S:S + BP]
    seq0[D + 5] = (seq0[D + 5] + 1) % 4
    from find_circ2_tpu.io.genome import Genome
    genome = Genome.from_records(
        [("chr20s", seq0),
         ("chr21s", g.codes[g.chrom_offsets[1]:
                            g.chrom_offsets[1] + g.chrom_lengths[1]])],
        cfg)
    mh_read = codes_to_seq(np.concatenate(
        [seq0[E - BP:E], seq0[S:S + (L - BP)]]))
    reads.append(("multihit_decoy", mh_read))

    os.makedirs(OUT, exist_ok=True)
    write_fasta(os.path.join(OUT, "genome.fa"),
                [(n, codes_to_seq(genome.codes[o:o + ln]))
                 for n, o, ln in zip(genome.chrom_names,
                                     genome.chrom_offsets,
                                     genome.chrom_lengths)])
    with open(os.path.join(OUT, "reads.fastq"), "wt") as fh:
        for name, seq in reads:
            write_fastq(fh, FastqRecord(name, seq, "I" * len(seq)))

    index = build_index(genome, cfg)
    agg = Aggregator(genome, cfg)
    for name, seq in reads:
        agg.add(call_read(genome, index, name, seq, cfg))
    write_bed(os.path.join(OUT, "splice_sites.bed"),
              agg.rows(sample_name="golden"))
    with open(os.path.join(OUT, "stats.txt"), "wt") as fh:
        fh.write("\n".join(agg.stats.lines()) + "\n")
    from find_circ2_tpu.io.bed import passes_filter
    rows = [r for r in agg.rows(sample_name="golden")
            if passes_filter(r, cfg.max_span, cfg.min_support,
                             cfg.filter_max_edits)]
    write_bed(os.path.join(OUT, "circ_candidates.bed"), rows)
    print(f"wrote {len(reads)} reads, "
          f"{len(agg.junctions)} junctions -> {OUT}")


if __name__ == "__main__":
    main()
