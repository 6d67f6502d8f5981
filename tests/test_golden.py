"""Frozen golden fixtures (SURVEY.md §4, BASELINE configs[0]): the full
CLI runs against the committed test_data/ inputs and must reproduce the
committed BED + stats byte for byte — on BOTH backends. A semantics
change fails here without regenerating goldens (a deliberate act:
scripts/make_test_data.py)."""

import os

import pytest

from find_circ2_tpu.cli import main as cli_main

DATA = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "test_data")


def _read(path):
    with open(path) as fh:
        return fh.read()


@pytest.mark.parametrize("backend", ["oracle", "device"])
def test_cli_reproduces_golden(tmp_path, backend):
    bed = tmp_path / "out.bed"
    stats = tmp_path / "out.stats"
    rc = cli_main.main([
        "find_circ", os.path.join(DATA, "reads.fastq"),
        "-G", os.path.join(DATA, "genome.fa"),
        "--reads-format", "fastq", "--backend", backend,
        "-n", "golden", "-o", str(bed), "-s", str(stats),
        "--batch-size", "64",
    ])
    assert rc == 0
    assert _read(bed) == _read(os.path.join(DATA, "splice_sites.bed"))
    assert _read(stats) == _read(os.path.join(DATA, "stats.txt"))


def test_cli_filter_reproduces_golden_candidates(tmp_path):
    bed = tmp_path / "cand.bed"
    rc = cli_main.main([
        "find_circ", os.path.join(DATA, "reads.fastq"),
        "-G", os.path.join(DATA, "genome.fa"),
        "--reads-format", "fastq", "--backend", "oracle",
        "-n", "golden", "-o", str(bed), "--filter",
    ])
    assert rc == 0
    assert _read(bed) == _read(os.path.join(DATA, "circ_candidates.bed"))


def test_golden_files_unchanged_hashes():
    """Pin the exact fixture bytes so an accidental regeneration (or a
    simulator drift) is caught even if both CLI paths drift with it."""
    import hashlib
    want = {
        "genome.fa": "7a4af9ebc3f275122dd03d2ce6f1925673113b4c",
        "reads.fastq": "32bb945c56a6a03dc0f880e5efd9f541bdf21719",
        "splice_sites.bed": "7e79b698e5fee69386b34c6aad9a22b1ebb33dc4",
        "stats.txt": "24be97fb6a75410046ba59eecb82dd88868361ed",
        "circ_candidates.bed": "f88e7e80a372a13606bacffccf353d91a80e3412",
    }
    for name, h in want.items():
        got = hashlib.sha1(
            open(os.path.join(DATA, name), "rb").read()).hexdigest()
        assert got == h, (name, got)
