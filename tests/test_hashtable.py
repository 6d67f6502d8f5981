"""Query-table (index/hashtable.py) unit tests: exact-lookup equivalence
with the sorted SeedIndex, cuckoo build invariants, shard partitioning."""

import numpy as np
import pytest

from find_circ2_tpu.config import Config
from find_circ2_tpu.index.build import build_index
from find_circ2_tpu.index.hashtable import (LANES, SLOTS, build_query_table,
    distinct_kmers, mix_hash, shard_query_table)
from find_circ2_tpu.io.genome import Genome

CFG = Config()


def _genome(seed, n=30000, with_n=True):
    rng = np.random.default_rng(seed)
    seq = rng.integers(0, 4, size=n, dtype=np.uint8)
    if with_n:
        seq[n // 3:n // 3 + 5] = 4
    return Genome.from_records([("c", seq)], CFG)


def _host_lookup(qt, p12, s8):
    """Reference lookup against the table arrays (numpy)."""
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
    m = (g[:, 0] == p12) & (g[:, 1] == s8)
    if not m.any():
        return 0, None
    assert m.sum() == 1, "key stored more than once"
    return int(g[m, 2][0]), int(g[m, 3][0])


def test_distinct_kmers_aggregation():
    g = _genome(0)
    idx = build_index(g, CFG)
    p12, s8, cnt, fpos = distinct_kmers(idx)
    assert int(cnt.sum()) == idx.positions.size
    # Spot-check groups against SeedIndex.lookup.
    rng = np.random.default_rng(1)
    for i in rng.integers(0, p12.size, 200):
        hits = idx.lookup(int(p12[i]), int(s8[i]))
        assert hits.size == cnt[i]
        assert int(hits[0]) == fpos[i]
    # Keys are unique and sorted.
    keys = p12.astype(np.int64) * (1 << 16) + s8
    assert np.all(np.diff(keys) > 0)


def test_query_table_exact_equivalence():
    g = _genome(2)
    idx = build_index(g, CFG)
    qt = build_query_table(idx, CFG)
    p12, s8, cnt, fpos = distinct_kmers(idx)
    rng = np.random.default_rng(3)
    # All present keys resolve to the aggregated stats.
    for i in rng.integers(0, p12.size, 300):
        c, fp = _host_lookup(qt, int(p12[i]), int(s8[i]))
        assert c == cnt[i] and fp == fpos[i]
    # Absent keys resolve to zero.
    present = set(zip(p12.tolist(), s8.tolist()))
    misses = 0
    while misses < 100:
        k = (int(rng.integers(0, 4 ** CFG.prefix_len)),
             int(rng.integers(0, 4 ** (CFG.anchor_len - CFG.prefix_len))))
        if k in present:
            continue
        c, _ = _host_lookup(qt, *k)
        assert c == 0
        misses += 1
    # Every key is stored exactly once and the slot count matches D.
    stored = qt.table.reshape(-1, LANES)
    assert int((stored[:, 0] >= 0).sum()) == p12.size


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
    p12, s8, cnt, fpos = distinct_kmers(idx)
    nb = idx.n_buckets
    S = -(-nb // n_shards)
    # Union of shard contents == distinct kmers, each on its range shard.
    total_stored = 0
    for i in range(n_shards):
        stored = tables[i].reshape(-1, LANES)
        live = stored[stored[:, 0] >= 0]
        total_stored += live.shape[0]
        if live.size:
            assert np.all(live[:, 0] // S == i)
    assert total_stored == p12.size
    # Spot-check lookups route to the owning shard with correct stats.
    from find_circ2_tpu.index.hashtable import QueryTable
    rng = np.random.default_rng(6)
    for i in rng.integers(0, p12.size, 100):
        owner = int(p12[i]) // S
        qt = QueryTable(table=tables[owner], meta=metas[owner])
        c, fp = _host_lookup(qt, int(p12[i]), int(s8[i]))
        assert c == cnt[i] and fp == fpos[i]
        for other in range(n_shards):
            if other == owner:
                continue
            qo = QueryTable(table=tables[other], meta=metas[other])
            c, _ = _host_lookup(qo, int(p12[i]), int(s8[i]))
            assert c == 0
