"""Synthetic genome / read simulator with known ground-truth junctions.

Stands in for the reference's bundled test dataset (SURVEY.md §4): the
mount being empty, golden fixtures are generated here with fixed seeds and
validated against the CPU oracle. Used by tests and bench.py.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from find_circ2_tpu.config import Config
from find_circ2_tpu.io.genome import Genome
from find_circ2_tpu.io.twobit import codes_to_seq, revcomp_seq, seq_to_codes


@dataclass
class TrueJunction:
    kind: str          # "circular" | "linear"
    chrom: str
    start: int         # per-chromosome coords, SPEC.md §4 conventions
    end: int
    reads: list = field(default_factory=list)


@dataclass
class SimData:
    genome: Genome
    reads: list          # list[(name, seq)]
    truths: list         # list[TrueJunction]


def random_genome(rng: np.random.Generator, chrom_lengths: dict[str, int],
                  cfg: Config = Config()) -> tuple[Genome, dict[str, np.ndarray]]:
    seqs = {name: rng.integers(0, 4, size=n, dtype=np.uint8)
            for name, n in chrom_lengths.items()}
    genome = Genome.from_records(list(seqs.items()), cfg)
    return genome, seqs


def _plant(seq: np.ndarray, pos: int, bases: str) -> None:
    seq[pos:pos + len(bases)] = seq_to_codes(bases)


def _mutate(rng: np.random.Generator, read: np.ndarray, n_err: int) -> None:
    for _ in range(n_err):
        i = int(rng.integers(0, read.size))
        read[i] = (read[i] + 1 + rng.integers(0, 3)) % 4


def simulate(seed: int = 0,
             chrom_lengths: dict[str, int] | None = None,
             n_circ: int = 12,
             n_linear: int = 8,
             reads_per_junction: int = 4,
             read_len: int = 100,
             n_contiguous: int = 30,
             n_random: int = 10,
             err_rate: float = 0.2,
             minus_fraction: float = 0.5,
             cfg: Config = Config()) -> SimData:
    """Build a genome with planted canonical junctions and supporting reads.

    Planted circular junctions follow SPEC.md §4 circular geometry
    (AG immediately before `start`, GT at `end`); linear junctions have GT
    at `start` and AG immediately before `end`. Reads crossing each
    junction are emitted on both strands with 0-2 sequencing errors.
    """
    rng = np.random.default_rng(seed)
    if chrom_lengths is None:
        chrom_lengths = {"chrS1": 120_000, "chrS2": 80_000}
    genome_tmp, seqs = random_genome(rng, chrom_lengths, cfg)
    del genome_tmp
    a = cfg.anchor_len
    truths: list[TrueJunction] = []
    reads: list[tuple[str, str]] = []
    names = list(chrom_lengths)

    def rand_chrom():
        return names[int(rng.integers(0, len(names)))]

    used: list[tuple[str, int, int]] = []

    def spaced(chrom: str, lo: int, hi: int, width: int) -> int:
        """Pick a start so [start, start+width) avoids previous features."""
        for _ in range(200):
            s = int(rng.integers(lo, hi))
            if all(c != chrom or s + width < u0 or s > u1
                   for c, u0, u1 in used):
                used.append((chrom, s, s + width))
                return s
        raise RuntimeError("could not place feature; enlarge genome")

    # Circular junctions: circle [start, end); AG before start, GT at end.
    for ci in range(n_circ):
        chrom = rand_chrom()
        seq = seqs[chrom]
        span = int(rng.integers(read_len, 3000))
        start = spaced(chrom, 500, len(seq) - span - 500, span)
        end = start + span
        _plant(seq, start - 2, "AG")
        _plant(seq, end, "GT")
        tj = TrueJunction("circular", chrom, start, end)
        for ri in range(reads_per_junction):
            bp = int(rng.integers(a, read_len - a + 1))
            read = np.concatenate([seq[end - bp:end],
                                   seq[start:start + (read_len - bp)]])
            n_err = int(rng.random() < err_rate)
            _mutate(rng, read, n_err)
            s = codes_to_seq(read)
            if rng.random() < minus_fraction:
                s = revcomp_seq(s)
            name = f"circ{ci}_r{ri}"
            reads.append((name, s))
            tj.reads.append(name)
        truths.append(tj)

    # Linear splice junctions: GT at start(donor), AG before end(acceptor).
    for li in range(n_linear):
        chrom = rand_chrom()
        seq = seqs[chrom]
        intron = int(rng.integers(200, 5000))
        donor = spaced(chrom, 500, len(seq) - intron - read_len - 500,
                       intron + read_len)
        acceptor = donor + intron
        _plant(seq, donor, "GT")
        _plant(seq, acceptor - 2, "AG")
        tj = TrueJunction("linear", chrom, donor, acceptor)
        for ri in range(reads_per_junction):
            bp = int(rng.integers(a, read_len - a + 1))
            read = np.concatenate([seq[donor - bp:donor],
                                   seq[acceptor:acceptor + (read_len - bp)]])
            n_err = int(rng.random() < err_rate)
            _mutate(rng, read, n_err)
            s = codes_to_seq(read)
            if rng.random() < minus_fraction:
                s = revcomp_seq(s)
            name = f"lin{li}_r{ri}"
            reads.append((name, s))
            tj.reads.append(name)
        truths.append(tj)

    # Contiguously-mapping reads (prefilter fodder) and unmappable noise.
    for i in range(n_contiguous):
        chrom = rand_chrom()
        seq = seqs[chrom]
        p = int(rng.integers(0, len(seq) - read_len))
        read = seq[p:p + read_len].copy()
        _mutate(rng, read, int(rng.random() < err_rate))
        reads.append((f"cont{i}", codes_to_seq(read)))
    for i in range(n_random):
        read = rng.integers(0, 4, size=read_len, dtype=np.uint8)
        reads.append((f"rand{i}", codes_to_seq(read)))

    # Rebuild the genome AFTER planting signals.
    genome = Genome.from_records([(n, seqs[n]) for n in names], cfg)
    return SimData(genome=genome, reads=reads, truths=truths)
