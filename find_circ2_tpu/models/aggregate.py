"""Junction aggregation, category flags, and BED table construction.

Host-side, shared verbatim by the CPU oracle and the TPU device path —
per-read `ReadCall` records flow in, `JunctionRow`s flow out. Semantics:
SPEC.md §5 / SURVEY.md §3.5 (single pass over a junction dict at EOF).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from find_circ2_tpu.config import (
    Config,
    KIND_CIRCULAR,
    SENSE_CHARS,
    ST_JUNCTION,
    STATUS_NAMES,
)
from find_circ2_tpu.io.bed import JunctionRow, renumber
from find_circ2_tpu.io.genome import Genome
from find_circ2_tpu.models.oracle import ReadCall


def category_flags(circular: bool, breakpoints: int, uniq_bridges: int,
                   signal: str, strandmatch: str) -> str:
    """Frozen category derivation from junction evidence (SPEC.md §5).

    The single source of truth for the `category` column: the Aggregator
    builds fresh rows through it, and `merge_bed` re-derives categories
    from merged evidence through the same call — evidence-dependent flags
    (UNAMBIGUOUS_BP / ANCHOR_UNIQUE / NO_UNIQ_BRIDGES / STRANDMATCH) can
    never diverge between the two paths.
    """
    flags = ["CIRCULAR" if circular else "LINEAR"]
    if breakpoints == 1:
        flags.append("UNAMBIGUOUS_BP")
    if uniq_bridges >= 1:
        flags.append("ANCHOR_UNIQUE")
    else:
        flags.append("NO_UNIQ_BRIDGES")
    if signal == "GTAG":
        flags.append("CANONICAL")
    if strandmatch == "MATCH":
        flags.append("STRANDMATCH")
    return ",".join(flags)


@dataclass
class JunctionAgg:
    kind: int
    chrom_idx: int
    start: int                # global coordinate
    end: int
    sense: int
    signal: str
    n_reads: int = 0
    seqs: set = field(default_factory=set)
    uniq_bridges: int = 0
    best_qual_left: int = 0
    best_qual_right: int = 0
    edits: int = 1 << 30
    overlap: int = 1 << 30
    n_bp: int = 1 << 30
    n_strand_match: int = 0   # reads whose alignment strand == sense


@dataclass
class Stats:
    """Per-run counters (reference's `-s` stats file, SURVEY §2.1)."""
    counts: dict = field(default_factory=dict)

    def add_status(self, status: int, n: int = 1) -> None:
        name = STATUS_NAMES[status]
        self.counts[name] = self.counts.get(name, 0) + n

    def add(self, name: str, n: int = 1) -> None:
        self.counts[name] = self.counts.get(name, 0) + n

    def lines(self) -> list[str]:
        order = ["reads_total", *STATUS_NAMES.values(),
                 "circular_reads", "linear_reads",
                 "circular_junctions", "linear_junctions"]
        seen = [k for k in order if k in self.counts]
        extra = sorted(k for k in self.counts if k not in order)
        return [f"{k}\t{self.counts[k]}" for k in seen + extra]


class Aggregator:
    """Accumulates ReadCalls into the junction dictionary."""

    def __init__(self, genome: Genome, cfg: Config = Config()) -> None:
        self.genome = genome
        self.cfg = cfg
        self.junctions: dict[tuple, JunctionAgg] = {}
        self.stats = Stats()

    def add(self, call: ReadCall) -> None:
        self.stats.add("reads_total")
        self.stats.add_status(call.status)
        if call.status != ST_JUNCTION:
            return
        self.stats.add("circular_reads" if call.kind == KIND_CIRCULAR
                       else "linear_reads")
        key = (call.kind, call.chrom_idx, call.start, call.end, call.sense)
        agg = self.junctions.get(key)
        if agg is None:
            agg = JunctionAgg(kind=call.kind, chrom_idx=call.chrom_idx,
                              start=call.start, end=call.end,
                              sense=call.sense, signal=call.signal)
            self.junctions[key] = agg
        agg.n_reads += 1
        agg.seqs.add(call.seq)
        uniq = self.cfg.min_uniq_qual
        if call.qual_left >= uniq and call.qual_right >= uniq:
            agg.uniq_bridges += 1
        agg.best_qual_left = max(agg.best_qual_left, call.qual_left)
        agg.best_qual_right = max(agg.best_qual_right, call.qual_right)
        agg.edits = min(agg.edits, call.edits)
        agg.overlap = min(agg.overlap, call.overlap)
        agg.n_bp = min(agg.n_bp, call.n_bp)
        if call.align_strand == call.sense:
            agg.n_strand_match += 1

    def add_batch(self, res: dict, idx, seqs) -> None:
        """Vectorized twin of `add` for unpacked device result rows.

        `res` is pipeline.unpack_results output, `idx` the row indices
        to aggregate (all must have status == ST_JUNCTION), `seqs` the
        processed read sequence per row (aligned with `idx`; the only
        per-read Python object this path touches). Junction keys are
        grouped with np.unique and every accumulator updates once per
        distinct junction instead of once per read — bit-identical to
        looping `add` (all accumulators are commutative ints/sets;
        tests/test_native.py pins BED equality)."""
        import numpy as np

        n = len(idx)
        if n == 0:
            return
        self.stats.add("reads_total", n)
        self.stats.add_status(ST_JUNCTION, n)
        kind = res["kind"][idx]
        chrom = res["chrom"][idx]
        start = res["start"][idx].astype(np.int64)
        end = res["end"][idx].astype(np.int64)
        sense = res["sense"][idx]
        ql = res["qual_left"][idx]
        qr = res["qual_right"][idx]
        n_circ = int((kind == KIND_CIRCULAR).sum())
        if n_circ:
            self.stats.add("circular_reads", n_circ)
        if n - n_circ:
            self.stats.add("linear_reads", n - n_circ)

        keys = np.stack([kind.astype(np.int64), chrom.astype(np.int64),
                         start, end, sense.astype(np.int64)], axis=1)
        uk, inv = np.unique(keys, axis=0, return_inverse=True)
        U = uk.shape[0]
        nb = np.bincount(inv, minlength=U)
        uniq = self.cfg.min_uniq_qual
        bridges = np.bincount(inv, weights=(ql >= uniq) & (qr >= uniq),
                              minlength=U).astype(np.int64)
        smatch = np.bincount(inv, weights=sense == res["align_strand"][idx],
                             minlength=U).astype(np.int64)
        ql_max = np.zeros(U, np.int64)
        qr_max = np.zeros(U, np.int64)
        np.maximum.at(ql_max, inv, ql)
        np.maximum.at(qr_max, inv, qr)
        e_min = np.full(U, 1 << 30)
        o_min = np.full(U, 1 << 30)
        b_min = np.full(U, 1 << 30)
        np.minimum.at(e_min, inv, res["edits"][idx])
        np.minimum.at(o_min, inv, res["overlap"][idx])
        np.minimum.at(b_min, inv, res["n_bp"][idx])
        order = np.argsort(inv, kind="stable")
        bounds = np.searchsorted(inv[order], np.arange(U + 1))
        from find_circ2_tpu.io.twobit import codes_to_seq
        for u in range(U):
            key = (int(uk[u, 0]), int(uk[u, 1]), int(uk[u, 2]),
                   int(uk[u, 3]), int(uk[u, 4]))
            agg = self.junctions.get(key)
            if agg is None:
                first = int(idx[order[bounds[u]]])
                agg = JunctionAgg(
                    kind=key[0], chrom_idx=key[1], start=key[2],
                    end=key[3], sense=key[4],
                    signal=codes_to_seq(res["signal"][first]))
                self.junctions[key] = agg
            agg.n_reads += int(nb[u])
            agg.seqs.update(seqs[j] for j in order[bounds[u]:bounds[u + 1]])
            agg.uniq_bridges += int(bridges[u])
            agg.best_qual_left = max(agg.best_qual_left, int(ql_max[u]))
            agg.best_qual_right = max(agg.best_qual_right, int(qr_max[u]))
            agg.edits = min(agg.edits, int(e_min[u]))
            agg.overlap = min(agg.overlap, int(o_min[u]))
            agg.n_bp = min(agg.n_bp, int(b_min[u]))
            agg.n_strand_match += int(smatch[u])

    def merge_from(self, junctions: dict) -> None:
        """Fold another process's junction dict into this one — the
        final cross-host merge of a multi-process run (SURVEY.md §2.4
        DP row; all accumulators are commutative, so the result equals
        a joint single-process run bit for bit, including n_uniq:
        sequence SETS union rather than summing partial counts)."""
        for key, o in junctions.items():
            a = self.junctions.get(key)
            if a is None:
                self.junctions[key] = o
                continue
            a.n_reads += o.n_reads
            a.seqs |= o.seqs
            a.uniq_bridges += o.uniq_bridges
            a.best_qual_left = max(a.best_qual_left, o.best_qual_left)
            a.best_qual_right = max(a.best_qual_right, o.best_qual_right)
            a.edits = min(a.edits, o.edits)
            a.overlap = min(a.overlap, o.overlap)
            a.n_bp = min(a.n_bp, o.n_bp)
            a.n_strand_match += o.n_strand_match

    def _strandmatch(self, agg: JunctionAgg) -> str:
        if not self.cfg.stranded:
            return "NA"
        if agg.n_strand_match == agg.n_reads:
            return "MATCH"
        if agg.n_strand_match == 0:
            return "MISMATCH"
        return "PARTIAL"

    def _category(self, agg: JunctionAgg, strandmatch: str) -> str:
        return category_flags(agg.kind == KIND_CIRCULAR, agg.n_bp,
                              agg.uniq_bridges, agg.signal, strandmatch)

    def rows(self, sample_name: str = "sample", prefix: str = "") -> list[JunctionRow]:
        out = []
        for agg in self.junctions.values():
            chrom = self.genome.chrom_names[agg.chrom_idx]
            offset = int(self.genome.chrom_offsets[agg.chrom_idx])
            strandmatch = self._strandmatch(agg)
            out.append(JunctionRow(
                chrom=chrom,
                start=agg.start - offset,
                end=agg.end - offset,
                name="",  # assigned by renumber()
                n_reads=agg.n_reads,
                strand=SENSE_CHARS[agg.sense],
                n_uniq=len(agg.seqs),
                uniq_bridges=agg.uniq_bridges,
                best_qual_left=agg.best_qual_left,
                best_qual_right=agg.best_qual_right,
                tissues=sample_name,
                tiss_counts=str(agg.n_reads),
                edits=agg.edits,
                anchor_overlap=agg.overlap,
                breakpoints=agg.n_bp,
                signal=agg.signal,
                strandmatch=strandmatch,
                category=self._category(agg, strandmatch),
            ))
        self.stats.counts["circular_junctions"] = sum(
            1 for a in self.junctions.values() if a.kind == KIND_CIRCULAR)
        self.stats.counts["linear_junctions"] = sum(
            1 for a in self.junctions.values() if a.kind != KIND_CIRCULAR)
        return renumber(out, prefix)
