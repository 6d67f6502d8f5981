"""Genome seed index: the TPU-native replacement for bowtie2-build's
FM-index (SURVEY.md §2.2, L0 in §1).

Instead of a BWT, we use a direct-addressed k-mer table (4^k buckets,
k=10 by default => 1M buckets) over the sentinel-padded concatenated
genome: dense arrays, O(1) lookup, trivially shardable by k-mer range
across chips (find_circ2_tpu/index/shard.py). Semantics in SPEC.md §1-§2.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from find_circ2_tpu.config import Config
from find_circ2_tpu.io.genome import Genome


@dataclass
class SeedIndex:
    """Direct-addressed k-mer index over a concatenated genome.

    positions: uint32 global window starts, grouped by k-mer, position
        ascending within a bucket (SPEC.md §1).
    offsets:   uint32[4^k + 1] bucket start offsets into `positions`.
    """
    seed_len: int
    positions: np.ndarray
    offsets: np.ndarray

    @property
    def n_buckets(self) -> int:
        return 4 ** self.seed_len

    def bucket(self, kmer: int) -> np.ndarray:
        lo, hi = int(self.offsets[kmer]), int(self.offsets[kmer + 1])
        return self.positions[lo:hi]


def kmer_values(codes: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized rolling k-mers.

    Returns (kmers, valid) of length len(codes)-k+1. kmers[p] is the
    big-endian base-4 value of codes[p:p+k] (SPEC.md §1); valid[p] is False
    if any base in the window has code >= 4 (N or sentinel).
    """
    codes = np.asarray(codes, dtype=np.uint8)
    n = codes.size - k + 1
    if n <= 0:
        return (np.zeros(0, np.uint32), np.zeros(0, bool))
    vals = np.zeros(n, dtype=np.uint32)
    for j in range(k):
        vals = vals * 4 + np.where(codes[j:j + n] < 4, codes[j:j + n], 0)
    bad = (codes >= 4).astype(np.int64)
    cbad = np.concatenate([[0], np.cumsum(bad)])
    valid = (cbad[k:] - cbad[:-k]) == 0
    return vals, valid


def build_index(genome: Genome, cfg: Config = Config()) -> SeedIndex:
    """Build the seed index over the full concatenated genome."""
    k = cfg.seed_len
    kmers, valid = kmer_values(genome.codes, k)
    pos = np.nonzero(valid)[0].astype(np.uint32)
    kv = kmers[pos]
    # Stable sort by k-mer keeps positions ascending within each bucket.
    order = np.argsort(kv, kind="stable")
    positions = pos[order]
    counts = np.bincount(kv, minlength=4 ** k)
    offsets = np.zeros(4 ** k + 1, dtype=np.uint32)
    offsets[1:] = np.cumsum(counts, dtype=np.uint64).astype(np.uint32)
    return SeedIndex(seed_len=k, positions=positions, offsets=offsets)
