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
