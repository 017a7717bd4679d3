"""A/B: fixed recrawl TTL vs adaptive per-URL intervals on a drifting
corpus. Same seeds, same politeness, same horizon; the corpus drifts
via SynthConfig.change_period (a deterministic third of URLs changes
every p(url) rounds, the rest never change).

Reported per mode:
* fetches        — total fetch volume over the horizon (cost)
* wasted         — refetches that returned UNCHANGED content (pure
                   cost: the crawl learned nothing)
* changes        — ground-truth content changes inside the horizon
                   (version = round // p flips at multiples of p,
                   p known per URL — computable exactly)
* captured / lag — changes eventually observed by a refetch, and the
                   mean rounds from change to the observing fetch
* missed         — changes superseded by a NEWER change before any
                   refetch saw them (staleness the schedule never
                   repaired)

Usage: python tools/bench_recrawl.py [n_seeds] [rounds]
Appends one JSON line per mode to BENCH/HISTORY_RECRAWL.jsonl.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

import pandas as pd

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from crawlspark.engine import CrawlEngine  # noqa: E402
from crawlspark.hashing import py_h60  # noqa: E402
from crawlspark.session import get_spark  # noqa: E402
from crawlspark.synth import SynthConfig, gen_seeds, host_name  # noqa: E402

CHANGE_PERIOD = 6
MIN_TTL, MAX_TTL = 2, 16
FIXED_TTL = 2  # matches adaptive's floor: same best-case freshness


def _period(url: str) -> int | None:
    """Ground-truth drift of one URL (mirrors engine version SQL):
    None = static, else content version = round // p."""
    if py_h60(url + "|vol") % 3 != 0:
        return None
    return 1 + py_h60(url + "|per") % CHANGE_PERIOD


def _metrics(img: pd.DataFrame, horizon: int) -> dict:
    fetches = len(img)
    img = img.sort_values(["url", "round_id"])
    # nullable Int64 keeps the 64-bit phash exact through shift()
    # (int64→float64 would round past 2^53 and could alias values)
    ph = img.phash.astype("Int64")
    prev_ph = ph.groupby(img.url).shift()
    wasted = int((ph == prev_ph).fillna(False).sum())  # first fetch never counts
    changes = captured = missed = 0
    lag_sum = 0
    for url, g in img.groupby("url"):
        p = _period(url)
        if p is None:
            continue
        fetch_rounds = sorted(int(r) for r in g.round_id)
        first = fetch_rounds[0]
        # content versions flip at rounds k*p inside (first, horizon)
        change_rounds = [r for r in range(first + 1, horizon) if r % p == 0]
        changes += len(change_rounds)
        for i, cr in enumerate(change_rounds):
            nxt_change = (
                change_rounds[i + 1] if i + 1 < len(change_rounds) else horizon
            )
            obs = [fr for fr in fetch_rounds if cr <= fr < nxt_change]
            if obs:
                captured += 1
                lag_sum += obs[0] - cr
            else:
                missed += 1
    return {
        "fetches": fetches,
        "wasted_refetches": wasted,
        "wasted_frac": round(wasted / max(1, fetches), 4),
        "gt_changes": changes,
        "captured": captured,
        "missed": missed,
        "missed_frac": round(missed / max(1, changes), 4),
        "mean_capture_lag_rounds": round(lag_sum / max(1, captured), 3),
    }


def run_mode(spark, mode: str, cfg, seeds, pol, horizon: int) -> dict:
    wd = tempfile.mkdtemp(prefix=f"recrawl_ab_{mode.replace('+', '_')}_")
    base, _, cond = mode.partition("+")
    kw = (
        {"recrawl_after": FIXED_TTL}
        if base == "fixed"
        else {"recrawl_adaptive": (MIN_TTL, MAX_TTL)}
    )
    if cond:
        # conditional revalidation: unchanged refetches return 304 —
        # a header-only exchange, no body/image append
        kw["conditional_fetch"] = True
    eng = CrawlEngine(
        spark, wd, cfg, politeness_pdf=pol, use_cuckoo=False, cuckoo_pg=8, **kw
    )
    eng.add_seeds(spark.createDataFrame(seeds))
    t0 = time.time()
    eng.run(max_rounds=horizon)
    wall = round(time.time() - t0, 1)
    img = eng.images.read(spark).select("url", "round_id", "phash").toPandas()
    sc = {
        int(r["status"]): int(r["count"])
        for r in eng.fetch_log.read(spark).groupBy("status").count().collect()
    }
    shutil.rmtree(wd, ignore_errors=True)
    # every logged exchange is a request (200/304 today since the A/B
    # corpus is fault-free; 504/301/404 rows would count too)
    requests = sum(sc.values())
    m = _metrics(img, horizon)
    # in conditional modes the schedule's "wasted" refetches still
    # happen as requests — they just cost a header, not a body
    m.update(
        {
            "mode": mode,
            "wall_s": wall,
            "requests": requests,
            "bodies": len(img),
            "revalidated_304": sc.get(304, 0),
            "body_saved_frac": round(1 - len(img) / max(1, requests), 4),
        }
    )
    return m


def main() -> None:
    n_seeds = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    horizon = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    cfg = SynthConfig(
        n_seeds=n_seeds,
        n_hosts=10,
        max_depth=0,
        fault_free=True,
        change_period=CHANGE_PERIOD,
    )
    seeds = gen_seeds(cfg)
    pol = pd.DataFrame(
        {
            "host": [host_name(i) for i in range(1, 11)],
            "budget": [10 ** 9] * 10,
        }
    )
    spark = get_spark("local[8]", shuffle_partitions=8, app_name="recrawl-ab")
    out_path = os.path.join(_REPO, "BENCH", "HISTORY_RECRAWL.jsonl")
    rows = {}
    for mode in ("fixed", "fixed+cond", "adaptive", "adaptive+cond"):
        rec = run_mode(spark, mode, cfg, seeds, pol, horizon)
        rec.update({"ts": int(time.time()), "n_seeds": n_seeds, "rounds": horizon})
        rows[mode] = rec
        with open(out_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)
    fx, ad = rows["fixed"], rows["adaptive"]
    print(
        f"\nadaptive vs fixed(ttl={FIXED_TTL}): "
        f"{ad['fetches'] / max(1, fx['fetches']):.2f}x fetch volume, "
        f"wasted {fx['wasted_frac']:.1%} -> {ad['wasted_frac']:.1%}, "
        f"lag {fx['mean_capture_lag_rounds']} -> "
        f"{ad['mean_capture_lag_rounds']} rounds, "
        f"missed {fx['missed_frac']:.1%} -> {ad['missed_frac']:.1%}"
    )
    for base in ("fixed", "adaptive"):
        pl, cd = rows[base], rows[base + "+cond"]
        print(
            f"{base}+cond vs {base}: requests {pl['requests']} -> "
            f"{cd['requests']}, bodies {pl['bodies']} -> {cd['bodies']} "
            f"({cd['body_saved_frac']:.1%} of requests header-only), "
            f"lag {pl['mean_capture_lag_rounds']} -> "
            f"{cd['mean_capture_lag_rounds']} rounds"
        )
    spark.stop()


if __name__ == "__main__":
    main()
