"""North-rule scaling-determinism evidence: the same crawl at two
parallelism levels (local[2] vs local[8], standing in for N and 4N
executors) produces the exact same fetch ordering and seen set."""

import os
import subprocess
import sys

import pandas as pd

HERE = os.path.dirname(os.path.abspath(__file__))


def _run(master, tmp_path, tag, mode="plain"):
    out = str(tmp_path / tag)
    subprocess.run(
        [
            sys.executable,
            os.path.join(HERE, "_crawl_once.py"),
            master,
            str(tmp_path / f"wd_{tag}"),
            out,
            mode,
        ],
        check=True,
        capture_output=True,
        timeout=900,
    )
    return (
        pd.read_csv(out + ".log.csv"),
        pd.read_csv(out + ".seen.csv"),
    )


def test_same_output_at_two_parallelism_levels(tmp_path):
    log2, seen2 = _run("local[2]", tmp_path, "n2")
    log8, seen8 = _run("local[8]", tmp_path, "n8")
    assert len(log2) > 0
    pd.testing.assert_frame_equal(log2, log8)
    pd.testing.assert_frame_equal(seen2, seen8)


def test_reprioritized_crawl_deterministic_across_parallelism(tmp_path):
    """PageRank-reprioritized crawls (float ranks → priorities) must be
    just as bit-identical across parallelism levels as the hash-priority
    path — the round-6 rank quantization plus the sub-quantum hash
    tiebreak is what makes this hold."""
    log2, seen2 = _run("local[2]", tmp_path, "r2", mode="reprioritize")
    log8, seen8 = _run("local[8]", tmp_path, "r8", mode="reprioritize")
    assert len(log2) > 0
    pd.testing.assert_frame_equal(log2, log8)
    pd.testing.assert_frame_equal(seen2, seen8)
