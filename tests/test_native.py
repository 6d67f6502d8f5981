"""Native data-loader tests: the C FASTQ scanner/encoder must agree with
the pure-Python path byte for byte."""

import gzip

import numpy as np
import pytest

from find_circ2_tpu.config import RPAD_CODE
from find_circ2_tpu.io.fastq import FastqRecord, read_fastq, write_fastq
from find_circ2_tpu.io.twobit import _CODE_LUT, seq_to_codes
from find_circ2_tpu import native


@pytest.fixture(scope="module")
def lib_ok():
    if not native.available():
        pytest.skip("no C compiler available for the native loader")


def _fastq_bytes(recs):
    import io
    buf = io.StringIO()
    for r in recs:
        write_fastq(buf, r)
    return buf.getvalue().encode()


def test_parse_fastq_matches_python(lib_ok, tmp_path):
    rng = np.random.default_rng(7)
    recs = []
    for i in range(200):
        n = int(rng.integers(30, 150))
        seq = "".join("ACGTN"[j] for j in rng.integers(0, 5, n))
        recs.append(FastqRecord(f"read{i}/1", seq, "I" * n))
    data = _fastq_bytes(recs)
    spans, resume = native.parse_fastq(data)
    assert spans.shape[0] == len(recs)
    assert resume == len(data)
    for i, r in enumerate(recs):
        ns, ne, ss, se, qs, qe = spans[i]
        assert data[ns:ne].decode() == r.name
        assert data[ss:se].decode() == r.seq
        assert data[qs:qe].decode() == r.qual


def test_parse_fastq_partial_tail(lib_ok):
    recs = [FastqRecord(f"r{i}", "ACGT" * 20, "I" * 80) for i in range(5)]
    data = _fastq_bytes(recs)
    cut = data[: len(data) - 37]  # tear the last record
    spans, resume = native.parse_fastq(cut)
    assert spans.shape[0] == 4
    # resume points at the start of the torn record: refilling from there
    # re-parses it whole.
    spans2, resume2 = native.parse_fastq(cut[resume:] + data[len(cut):])
    assert spans2.shape[0] == 1


def test_parse_fastq_malformed(lib_ok):
    with pytest.raises(ValueError):
        native.parse_fastq(b"not a fastq\nat all\n+\nxx\n")


def test_encode_reads_matches_python(lib_ok):
    rng = np.random.default_rng(8)
    recs = []
    for i in range(64):
        n = int(rng.integers(40, 200))  # some exceed Lp=160
        seq = "".join("ACGTNacgtn"[j] for j in rng.integers(0, 10, n))
        recs.append(FastqRecord(f"r{i}", seq, "I" * n))
    data = _fastq_bytes(recs)
    spans, _ = native.parse_fastq(data)
    Lp = 160
    out = np.full((len(recs), Lp), RPAD_CODE, np.uint8)
    lens = np.zeros(len(recs), np.int32)
    native.encode_reads(data, spans[:, 2], spans[:, 3], out, lens,
                        _CODE_LUT)
    for i, r in enumerate(recs):
        if len(r.seq) > Lp:
            assert lens[i] == -len(r.seq)
        else:
            assert lens[i] == len(r.seq)
            codes = seq_to_codes(r.seq)
            assert np.array_equal(out[i, :lens[i]], codes)
            assert (out[i, lens[i]:] == RPAD_CODE).all()


def test_run_fastq_stream_matches_run_reads(lib_ok, tmp_path):
    """The native streaming path must produce byte-identical BED + stats
    to the pure-Python run_reads path."""
    import io as _io
    from find_circ2_tpu.config import Config
    from find_circ2_tpu.index.build import build_index
    from find_circ2_tpu.io.bed import write_bed
    from find_circ2_tpu.models.aggregate import Aggregator
    from find_circ2_tpu.models.pipeline import DeviceIndex, run_reads
    from find_circ2_tpu.models.stream import run_fastq
    from find_circ2_tpu.utils.simulate import simulate

    cfg = Config(batch_size=64)
    sim = simulate(seed=61, n_circ=5, n_linear=3, reads_per_junction=4,
                   n_contiguous=30, n_random=10, err_rate=0.3)
    # Add pathological lengths: too short and too long.
    reads = list(sim.reads) + [("tiny", "ACGT" * 8),
                               ("huge", "ACGT" * 50)]
    fq = tmp_path / "r.fastq"
    with open(fq, "wt") as fh:
        for name, seq in reads:
            write_fastq(fh, FastqRecord(name, seq, "I" * len(seq)))
    idx = build_index(sim.genome, cfg)
    dindex = DeviceIndex.build(sim.genome, idx, cfg)

    agg1 = Aggregator(sim.genome, cfg)
    for c in run_reads(dindex, reads, cfg):
        agg1.add(c)
    agg2 = Aggregator(sim.genome, cfg)
    run_fastq(dindex, fq, agg2, cfg)

    def render(agg):
        buf = _io.StringIO()
        write_bed(buf, agg.rows("s"))
        return buf.getvalue(), sorted(agg.stats.counts.items())

    bed1, stats1 = render(agg1)
    bed2, stats2 = render(agg2)
    assert bed1 == bed2
    assert stats1 == stats2


def test_run_fastq_array_explore_matches_run_reads(lib_ok, tmp_path):
    """The streaming loop's array-mode explore aggregation (r5:
    DeviceExplorer.dispatch_arrays + Aggregator.add_batch, no per-read
    ReadCall/seq_hash) must be byte-identical to run_reads' per-read
    path on a repeat-heavy library that routes reads through §2b."""
    import io as _io
    from find_circ2_tpu.config import Config
    from find_circ2_tpu.index.build import build_index
    from find_circ2_tpu.io.bed import write_bed
    from find_circ2_tpu.models.aggregate import Aggregator
    from find_circ2_tpu.models.pipeline import DeviceIndex, run_reads
    from find_circ2_tpu.models.stream import run_fastq
    from find_circ2_tpu.utils.simulate import rnase_r_library

    cfg = Config(batch_size=256)
    sim = rnase_r_library(seed=13, chrom_lengths={"chrE": 400_000},
                          n_circ=60, n_linear=10, depth_mean=6.0,
                          cfg=cfg)
    idx = build_index(sim.genome, cfg)
    dindex = DeviceIndex.build(sim.genome, idx, cfg)
    assert dindex.ext is not None
    slow = (sim.genome, idx)

    fq = tmp_path / "lib.fastq"
    with open(fq, "wt") as fh:
        for name, seq in sim.reads:
            write_fastq(fh, FastqRecord(name, seq, "I" * len(seq)))

    agg1 = Aggregator(sim.genome, cfg)
    for c in run_reads(dindex, sim.reads, cfg, slowpath=slow):
        agg1.add(c)
    agg2 = Aggregator(sim.genome, cfg)
    run_fastq(dindex, fq, agg2, cfg, slowpath=slow)

    def render(agg):
        buf = _io.StringIO()
        write_bed(buf, agg.rows("s"))
        return buf.getvalue(), sorted(agg.stats.counts.items())

    bed1, stats1 = render(agg1)
    bed2, stats2 = render(agg2)
    assert bed1 == bed2
    assert stats1 == stats2


def test_rescue_pool_timeout_falls_back_inline(lib_ok):
    """A hung/slow rescue worker must not corrupt results: fetch times
    out, kills the pool, recomputes inline, and the pool stays disabled
    for the rest of the run — outputs identical to the sync path."""
    from find_circ2_tpu.config import Config
    from find_circ2_tpu.index.build import build_index
    from find_circ2_tpu.models.multihit import call_reads_multi_batch
    from find_circ2_tpu.models.stream import _RescuePool
    from find_circ2_tpu.utils.simulate import simulate

    cfg = Config()
    sim = simulate(seed=61, n_circ=5, n_linear=3, reads_per_junction=4,
                   n_contiguous=5, n_random=5, err_rate=0.3)
    idx = build_index(sim.genome, cfg)
    items = [(n, s) for n, s in sim.reads
             if 2 * cfg.anchor_len <= len(s) <= cfg.max_read_len][:20]
    want = call_reads_multi_batch(sim.genome, idx, items, cfg, True)

    pool = _RescuePool(sim.genome, idx, cfg, True)
    try:
        # The worker path itself first (sanity).
        if pool.pool is not None:
            assert pool.fetch(pool.submit_tagged(items)) == want

        class HungHandle:                    # deterministic "hung worker"
            _fc2_items = items

            def get(self, timeout=None):
                raise TimeoutError

        got = pool.fetch(HungHandle())
        assert pool.pool is None            # permanently disabled
        assert got == want                  # recomputed inline
        # Subsequent submits run inline and stay correct.
        h2 = pool.submit_tagged(items)
        assert isinstance(h2, list)
        assert pool.fetch(h2) == want
    finally:
        pool.close()


def test_run_fastq_journal_resume_and_gzip(lib_ok, tmp_path):
    """Fast-path resume (SPEC journal on the native path) + gzip input:
    a run killed mid-stream and rerun from its journal must produce
    byte-identical BED + stats, and .gz input must match plain."""
    import io as _io
    from find_circ2_tpu.config import Config
    from find_circ2_tpu.index.build import build_index
    from find_circ2_tpu.io.bed import write_bed
    from find_circ2_tpu.models.aggregate import Aggregator
    from find_circ2_tpu.models.pipeline import DeviceIndex
    from find_circ2_tpu.models.stream import run_fastq
    from find_circ2_tpu.utils.journal import RunJournal
    from find_circ2_tpu.utils.simulate import simulate

    cfg = Config(batch_size=32)
    sim = simulate(seed=62, n_circ=4, n_linear=2, reads_per_junction=4,
                   n_contiguous=20, n_random=6, err_rate=0.3)
    fq = tmp_path / "r.fastq"
    with open(fq, "wt") as fh:
        for name, seq in sim.reads:
            write_fastq(fh, FastqRecord(name, seq, "I" * len(seq)))
    fqgz = tmp_path / "r.fastq.gz"
    with gzip.open(fqgz, "wb") as fh:
        fh.write(open(fq, "rb").read())
    idx = build_index(sim.genome, cfg)
    dindex = DeviceIndex.build(sim.genome, idx, cfg)
    slow = (sim.genome, idx)

    def render(agg):
        buf = _io.StringIO()
        write_bed(buf, agg.rows("s"))
        return buf.getvalue(), sorted(agg.stats.counts.items())

    jpath = tmp_path / "fast.journal"
    agg1 = Aggregator(sim.genome, cfg)
    run_fastq(dindex, fq, agg1, cfg, slowpath=slow,
              journal=RunJournal(jpath))
    want = render(agg1)
    n_lines = len(open(jpath).readlines())
    assert n_lines >= 2

    # Simulate a crash: keep only the first journaled batch (plus a torn
    # tail) and rerun.
    lines = open(jpath, "rb").read().split(b"\n")
    with open(jpath, "wb") as fh:
        fh.write(lines[0] + b"\n" + lines[1][:17])
    agg2 = Aggregator(sim.genome, cfg)
    run_fastq(dindex, fq, agg2, cfg, slowpath=slow,
              journal=RunJournal(jpath))
    assert render(agg2) == want
    assert len(open(jpath).readlines()) == n_lines

    # Full replay (no device work left) is still identical.
    agg3 = Aggregator(sim.genome, cfg)
    run_fastq(dindex, fq, agg3, cfg, slowpath=slow,
              journal=RunJournal(jpath))
    assert render(agg3) == want

    # gzip input, no journal: identical as well.
    agg4 = Aggregator(sim.genome, cfg)
    run_fastq(dindex, fqgz, agg4, cfg, slowpath=slow)
    assert render(agg4) == want
