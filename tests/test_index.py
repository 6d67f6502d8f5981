"""Seed index v2 unit tests (SPEC.md §1): two-level exact-20-mer index."""

import numpy as np

from find_circ2_tpu.config import Config
from find_circ2_tpu.index.build import build_index, kmer_values
from find_circ2_tpu.index.shard import shard_index
from find_circ2_tpu.io.genome import Genome
from find_circ2_tpu.io.twobit import seq_to_codes

CFG = Config()


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
    for k in (3, 10, 12):
        got_v, got_ok = kmer_values(codes, k)
        want_v, want_ok = _naive_kmer(codes, k)
        assert np.array_equal(got_ok, want_ok)
        assert np.array_equal(got_v[got_ok], want_v[want_ok])


def test_kmer_encoding_endianness():
    # "ACG": first base most significant (SPEC.md §1).
    codes = seq_to_codes("ACG")
    v, ok = kmer_values(codes, 3)
    assert ok[0] and v[0] == 0 * 16 + 1 * 4 + 2


def _kval(codes):
    v = 0
    for c in codes:
        v = v * 4 + int(c)
    return v


def test_build_index_lookup_exact():
    rng = np.random.default_rng(2)
    seq = rng.integers(0, 4, size=20000, dtype=np.uint8)
    # Sprinkle Ns to exercise validity.
    seq[5000:5003] = 4
    g = Genome.from_records([("c", seq)], CFG)
    idx = build_index(g, CFG)
    a, pk = CFG.anchor_len, CFG.prefix_len
    # Probe: every sampled valid window must be findable via lookup; its
    # range must contain exactly the positions with that 20-mer.
    probe = rng.integers(0, len(g.codes) - a, size=300)
    naive = {}
    for p in range(len(g.codes) - a):
        w = g.codes[p:p + a]
        if np.all(w < 4):
            naive.setdefault(bytes(w), []).append(p)
    for p in probe:
        w = g.codes[p:p + a]
        if not np.all(w < 4):
            continue
        hits = idx.lookup(_kval(w[:pk]), _kval(w[pk:]))
        assert list(hits) == naive[bytes(w)]
    # Windows with N are not indexed.
    total = sum(len(v) for v in naive.values())
    assert idx.positions.size == total
    # Ranges are position-sorted: first element is the min.
    some = next(v for v in naive.values() if len(v) >= 1)
    w = g.codes[some[0]:some[0] + a]
    hits = idx.lookup(_kval(w[:pk]), _kval(w[pk:]))
    assert list(hits) == sorted(hits)


def test_shard_index_partition():
    rng = np.random.default_rng(3)
    seq = rng.integers(0, 4, size=30000, dtype=np.uint8)
    g = Genome.from_records([("c", seq)], CFG)
    idx = build_index(g, CFG)
    for n in (1, 2, 4, 3):
        sh = shard_index(idx, n)
        parts, sufs = [], []
        for i in range(n):
            cnt = int(sh.offsets[i, -1])
            parts.append(sh.positions[i, :cnt])
            sufs.append(sh.suffix_vals[i, :cnt])
        assert np.array_equal(np.concatenate(parts),
                              idx.positions.astype(np.uint32))
        assert np.array_equal(np.concatenate(sufs),
                              idx.suffix_vals.astype(np.int32))
        # Local offsets consistent per-bucket.
        S = sh.kmers_per_shard
        probe = np.random.default_rng(0).integers(0, idx.n_buckets, size=100)
        offs = idx.offsets.astype(np.int64)
        for kv in probe:
            i, lk = divmod(int(kv), S)
            lo, hi = sh.offsets[i, lk], sh.offsets[i, lk + 1]
            want = idx.positions[offs[kv]:offs[kv + 1]]
            assert np.array_equal(sh.positions[i, lo:hi],
                                  want.astype(np.uint32))


def test_chunked_build_bit_identical():
    """build_index_chunked == build_index for any chunking (the whole-
    genome path must be bit-identical to the monolithic sort)."""
    from find_circ2_tpu.index.build import build_index_chunked
    rng = np.random.default_rng(9)
    seq = rng.integers(0, 4, size=50000, dtype=np.uint8)
    seq[1234:1239] = 4  # N block
    # Repeats so buckets have multi-entry (suffix, pos) groups.
    seq[30000:32000] = seq[5000:7000]
    g = Genome.from_records([("c1", seq[:33000]), ("c2", seq[33000:])], CFG)
    ref = build_index(g, CFG)
    for chunk in (1 << 12, 1 << 14, 1 << 20):
        got = build_index_chunked(g, CFG, chunk=chunk)
        assert np.array_equal(got.positions, ref.positions), chunk
        assert np.array_equal(got.suffix_vals, ref.suffix_vals), chunk
        assert np.array_equal(got.offsets, ref.offsets), chunk
        assert got.bsearch_iters == ref.bsearch_iters
        assert got.positions.dtype == np.uint32
