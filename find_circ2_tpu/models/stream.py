"""Production streaming path: FASTQ file -> device batches with the
native C loader, bypassing per-read Python objects.

`run_fastq` produces results identical to pipeline.run_reads (the tests
assert BED-level equality) but parses and encodes whole chunks natively
(find_circ2_tpu/native): the host-side analog of the reference's
C-backed I/O chain (SURVEY.md §3.1 bowtie2|samtools pipes). Python-level
record handling happens only for junction-supporting reads (a small
fraction of a typical library).
"""

from __future__ import annotations

import gzip
import os

import jax.numpy as jnp
import numpy as np

from find_circ2_tpu.config import (RPAD_CODE, Config, ST_JUNCTION,
                                   ST_TOO_LONG, ST_TOO_SHORT)
from find_circ2_tpu.io.twobit import _CODE_LUT, codes_to_seq
from find_circ2_tpu.models.aggregate import Aggregator
from find_circ2_tpu.models.oracle import ReadCall
from find_circ2_tpu.models.pipeline import (DeviceIndex,
    detect_batch_packed, unpack_results)
from find_circ2_tpu import native

CHUNK = 16 << 20  # bytes per read(2) chunk


def _iter_records(path):
    """Yield (buffer, spans) chunks via the native FASTQ scanner."""
    opener = gzip.open if os.fspath(path).endswith(".gz") else open
    with opener(path, "rb") as fh:
        pending = b""
        while True:
            chunk = fh.read(CHUNK)
            buf = pending + chunk
            if not buf:
                return
            spans, resume = native.parse_fastq(buf)
            if spans.shape[0] == 0 and not chunk:
                if resume < len(buf):
                    raise ValueError("trailing partial FASTQ record")
                return
            yield buf, spans
            pending = buf[resume:]
            if not chunk and not pending:
                return
            if not chunk and pending:
                raise ValueError("trailing partial FASTQ record")


def run_fastq(dindex: DeviceIndex, path, agg: Aggregator,
              cfg: Config = Config(), prefilter: bool = True,
              batch_size: int | None = None, times=None,
              pipeline_depth: int = 2) -> None:
    """Stream a FASTQ(.gz) file through the device pipeline into `agg`.

    Dispatch is pipelined `pipeline_depth` batches deep with packed
    single-array readback (pipeline.detect_batch_packed), so the ~28 ms
    tunnel round trip per batch overlaps device compute. Aggregation is
    order-insensitive (the junction merge is associative/commutative),
    so consumption order does not affect output."""
    import contextlib
    from collections import deque

    assert native.available(), "native loader unavailable; use run_reads"
    bs = batch_size or cfg.batch_size
    Lp = cfg.max_read_len
    a2 = 2 * cfg.anchor_len
    inflight: deque = deque()   # (buf, spans, sel, packed device array)

    def timed(name):
        return times.stage(name) if times is not None \
            else contextlib.nullcontext()

    def consume() -> None:
        buf, spans, sel, packed = inflight.popleft()
        with timed("device_detect"):
            res = unpack_results(np.asarray(packed))
        with timed("aggregate"):
            status = res["status"][:sel.size]
            non_junc = status != ST_JUNCTION
            if non_junc.any():
                agg.stats.add("reads_total", int(non_junc.sum()))
            for st in np.unique(status[non_junc]):
                agg.stats.add_status(int(st), int((status == st).sum()))
            # Junction rows go through Aggregator.add (which counts
            # reads_total/junction_reads itself).
            for i in np.nonzero(~non_junc)[0]:
                k = sel[i]
                name = buf[spans[k, 0]:spans[k, 1]].decode("ascii")
                seq = buf[spans[k, 2]:spans[k, 3]].decode("ascii")
                agg.add(ReadCall(
                    name=name, seq=seq, status=ST_JUNCTION,
                    kind=int(res["kind"][i]),
                    chrom_idx=int(res["chrom"][i]),
                    start=int(res["start"][i]),
                    end=int(res["end"][i]),
                    sense=int(res["sense"][i]),
                    align_strand=int(res["align_strand"][i]),
                    edits=int(res["edits"][i]),
                    n_bp=int(res["n_bp"][i]),
                    overlap=int(res["overlap"][i]),
                    qual_left=int(res["qual_left"][i]),
                    qual_right=int(res["qual_right"][i]),
                    signal=codes_to_seq(res["signal"][i]),
                ))
        if times is not None:
            times.add_reads(int(sel.size))

    def process(buf: bytes, spans: np.ndarray) -> None:
        with timed("encode"):
            lens_all = (spans[:, 3] - spans[:, 2]).astype(np.int64)
            short = lens_all < a2
            long_ = lens_all > Lp
            ok_idx = np.nonzero(~short & ~long_)[0]
        for st, mask in ((ST_TOO_SHORT, short), (ST_TOO_LONG, long_)):
            cnt = int(mask.sum())
            if cnt:
                agg.stats.add("reads_total", cnt)
                agg.stats.add_status(st, cnt)
        for lo in range(0, ok_idx.size, bs):
            sel = ok_idx[lo:lo + bs]
            arr = np.full((bs, Lp), RPAD_CODE, np.uint8)
            lens = np.zeros(bs, np.int32)
            with timed("encode"):
                native.encode_reads(buf, spans[sel, 2], spans[sel, 3],
                                    arr[:sel.size], lens[:sel.size],
                                    _CODE_LUT)
            with timed("device_dispatch"):
                packed = detect_batch_packed(
                    dindex.gpacked, dindex.nbases, dindex.table,
                    dindex.meta, dindex.chrom_offsets, jnp.asarray(arr),
                    jnp.asarray(lens), cfg, prefilter)
                try:
                    packed.copy_to_host_async()
                except AttributeError:
                    pass
            inflight.append((buf, spans, sel, packed))
            if len(inflight) > pipeline_depth:
                consume()

    for buf, spans in _iter_records(path):
        process(buf, spans)
    while inflight:
        consume()
