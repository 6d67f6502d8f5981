"""Seed index unit tests (SPEC.md §1)."""

import numpy as np

from find_circ2_tpu.config import Config
from find_circ2_tpu.index.build import build_index, kmer_values
from find_circ2_tpu.io.genome import Genome
from find_circ2_tpu.io.twobit import seq_to_codes


def _naive_kmer(codes, k):
    out, valid = [], []
    for p in range(len(codes) - k + 1):
        w = codes[p:p + k]
        ok = bool(np.all(w < 4))
        v = 0
        for c in w:
            v = v * 4 + (int(c) if c < 4 else 0)
        out.append(v)
        valid.append(ok)
    return np.array(out, np.uint32), np.array(valid, bool)


def test_kmer_values_vs_naive():
    rng = np.random.default_rng(1)
    codes = rng.integers(0, 6, size=300).astype(np.uint8)  # includes N/gap
    for k in (3, 10):
        got_v, got_ok = kmer_values(codes, k)
        want_v, want_ok = _naive_kmer(codes, k)
        assert np.array_equal(got_ok, want_ok)
        assert np.array_equal(got_v[got_ok], want_v[want_ok])


def test_kmer_encoding_endianness():
    # "ACGT...": first base most significant (SPEC.md §1).
    codes = seq_to_codes("ACG")
    v, ok = kmer_values(codes, 3)
    assert ok[0] and v[0] == 0 * 16 + 1 * 4 + 2


def test_build_index_buckets():
    cfg = Config(seed_len=10)
    rng = np.random.default_rng(2)
    seq = rng.integers(0, 4, size=5000, dtype=np.uint8)
    g = Genome.from_records([("c", seq)], cfg)
    idx = build_index(g, cfg)
    # Every valid window is present in exactly one bucket, sorted by pos.
    kmers, valid = kmer_values(g.codes, 10)
    n_valid = int(valid.sum())
    assert idx.positions.size == n_valid
    probe = np.random.default_rng(3).integers(0, n_valid, size=50)
    starts = np.nonzero(valid)[0]
    for p in starts[probe]:
        kv = int(kmers[p])
        bucket = idx.bucket(kv)
        assert p in bucket
        assert np.all(np.diff(bucket.astype(np.int64)) > 0)  # pos ascending
    # Offsets cover all positions.
    assert int(idx.offsets[-1]) == n_valid
    # Windows overlapping the sentinel gaps are not indexed.
    assert not valid[:cfg.chrom_gap - 9].any()
