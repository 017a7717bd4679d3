"""Shared test helpers."""

from __future__ import annotations

import json
import os


def read_manifests(eng) -> list[dict]:
    """All committed round manifests of a CrawlEngine, in round order."""
    out = []
    for f in sorted(os.listdir(eng.state_dir)):
        if f.startswith("round-") and f.endswith(".json"):
            with open(os.path.join(eng.state_dir, f)) as fh:
                out.append(json.load(fh))
    return out


def host_budgets_at(spark, eng, manifest) -> dict[str, int]:
    """AIMD-learned budgets as of a committed round: the host_state
    table read AT that round's manifest snapshot (requires the engine
    to run with snapshot_gc=False when reading non-HEAD history)."""
    return {
        r["host"]: int(r["budget"])
        for r in eng.host_state.read(
            spark, manifest["snapshots"]["host_state"]
        ).collect()
        if r["budget"] is not None
    }
