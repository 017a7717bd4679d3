"""A/B: incremental vs full image near-dup publish (O(delta) claim).

CrawlEngine.publish_dedup(incremental=True) bands only the rows
appended since the previous publish against the full signature table
and folds the new pairs into the stored keeper state; the full path
re-bands the whole table. Both produce the identical product
(tests/test_image_dedup_publish.py::test_publish_dedup_incremental_equals_full);
this tool measures the wall-time gap the incremental path buys on a
crawl-sized table, the number that matters when a 10^10-image corpus
re-publishes after one bounded round.

Protocol (one in-process local[32] session, tmpfs workdir):
  phase 1  crawl n_seeds URLs (plus a mirror slice so real near-dup
           pairs exist), publish — full by construction, and the code
           warm-up for both timed runs
  phase 2  crawl a small delta (~delta_pct of n_seeds, half mirrors of
           phase-1 URLs so the delta creates cross-phase pairs)
  timed    publish_dedup() — MUST report mode=incremental
  timed    publish_dedup(incremental=False) — full re-band of the same
           final table (merge then finds nothing new to write)

Usage: python tools/bench_incr_publish.py [n_seeds=60000] [delta_pct=2]
   or: python tools/bench_incr_publish.py --sig n_rows delta_rows
Prints one JSON line and appends it to BENCH/HISTORY_INCR_PUBLISH.jsonl.

--sig isolates the asymptotic claim from crawl/publish fixed costs:
random 64-bit signatures (plus a 2% near-twin slice so pairs exist),
time pairs(full × full) vs pairs(delta × full) alone at million-row
scale — the part of the publish that is O(n²/2^w) vs O(delta·n/2^w).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

os.environ.setdefault("CRAWLSPARK_IMG_SCALE", "1")  # publish reads phash, not pixels

import pandas as pd

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from crawlspark.engine import CrawlEngine  # noqa: E402
from crawlspark.session import get_spark  # noqa: E402
from crawlspark.synth import SynthConfig, gen_seeds, host_name  # noqa: E402


def sig_only(n_rows: int, delta_rows: int) -> None:
    """Pairs-stage timing on synthetic signatures (no crawl, no merge)."""
    from pyspark.sql import functions as F

    from crawlspark.ops.dedup import (
        hamming_near_dup,
        hamming_near_dup_delta,
        split_phash64,
    )

    extra = {"spark.sql.adaptive.enabled": "false"}
    if os.path.isdir("/dev/shm"):
        os.makedirs("/dev/shm/crawlspark-scratch", exist_ok=True)
        extra["spark.local.dir"] = "/dev/shm/crawlspark-scratch"
    spark = get_spark(
        "local[32]", shuffle_partitions=32, app_name="bench-incr-sig", extra_conf=extra
    )
    # uniform random 64-bit signatures + a 2% twin slice 1-3 bit-flips
    # away (xor with a sparse mask) so real pairs exist at tau=7
    base = spark.range(n_rows).select(
        F.col("id").alias("image_id"),
        F.xxhash64(F.col("id"), F.lit("sig")).alias("phash"),
    )
    twins = spark.range(n_rows // 50).select(
        (F.col("id") + n_rows).alias("image_id"),
        F.expr(
            "xxhash64((id * 50) % {n}, 'sig') ^ "
            "shiftleft(1L, cast(pmod(xxhash64(id), 64) as int))".format(n=n_rows)
        ).alias("phash"),
    )
    full = split_phash64(base.unionByName(twins), "phash").cache()
    n_full = full.count()  # materialize before timing
    delta = split_phash64(
        spark.range(delta_rows).select(
            (F.col("id") + 2 * n_rows).alias("image_id"),
            F.when(
                F.col("id") % 2 == 0,
                F.xxhash64((F.col("id") * 977) % n_rows, F.lit("sig")),
            )
            .otherwise(F.xxhash64(F.col("id"), F.lit("fresh")))
            .alias("phash"),
        ),
        "phash",
    ).cache()
    n_delta = delta.count()
    t0 = time.time()
    pairs_full = hamming_near_dup(
        full, "image_id", "phash_lo", "phash_hi", tau=7
    ).count()
    full_wall = time.time() - t0
    t0 = time.time()
    pairs_delta = hamming_near_dup_delta(
        delta, full.unionByName(delta), "image_id", "phash_lo", "phash_hi", tau=7
    ).count()
    delta_wall = time.time() - t0
    out = {
        "sig_only": True,
        "n_rows": int(n_full),
        "delta_rows": int(n_delta),
        "pairs_full": int(pairs_full),
        "pairs_delta": int(pairs_delta),
        "pairs_full_sec": round(full_wall, 2),
        "pairs_delta_sec": round(delta_wall, 2),
        "speedup": round(full_wall / delta_wall, 2) if delta_wall > 0 else None,
    }
    spark.stop()
    with open(os.path.join(_REPO, "BENCH", "HISTORY_INCR_PUBLISH.jsonl"), "a") as f:
        f.write(json.dumps(out) + "\n")
    print("BENCH_INCR_PUBLISH " + json.dumps(out))


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--sig":
        sig_only(int(sys.argv[2]), int(sys.argv[3]))
        return
    n_seeds = int(sys.argv[1]) if len(sys.argv) > 1 else 60000
    delta_pct = float(sys.argv[2]) if len(sys.argv) > 2 else 2.0
    n_hosts = max(50, n_seeds // 300)
    cfg = SynthConfig(
        n_seeds=n_seeds,
        n_hosts=n_hosts,
        max_depth=0,  # publish scaling is about image-table size, not link depth
        retry_backoff_step=0,
        fault_free=True,
    )
    seeds = gen_seeds(cfg)
    pol = pd.DataFrame(
        {
            "host": [host_name(i) for i in range(1, n_hosts + 1)],
            "budget": [max(2000, 2 * n_seeds // i) for i in range(1, n_hosts + 1)],
        }
    )
    extra = {"spark.sql.adaptive.enabled": "false", "spark.locality.wait": "0"}
    if os.path.isdir("/dev/shm"):
        os.makedirs("/dev/shm/crawlspark-scratch", exist_ok=True)
        extra["spark.local.dir"] = "/dev/shm/crawlspark-scratch"
    spark = get_spark(
        "local[32]",
        shuffle_partitions=16,
        app_name="bench-incr-publish",
        extra_conf=extra,
        fair_jobs=True,
    )
    wd = tempfile.mkdtemp(
        prefix="bench_incr_", dir="/dev/shm" if os.path.isdir("/dev/shm") else None
    )
    eng = CrawlEngine(
        spark, os.path.join(wd, "wd"), cfg, politeness_pdf=pol, use_cuckoo="auto"
    )

    # phase 1: the base corpus + a 1% mirror slice (real pairs exist)
    m1 = [f"https://mirror.{u.split('://', 1)[1]}" for u in seeds["url"][:: 100]]
    eng.add_seeds(
        spark.createDataFrame(
            pd.concat(
                [seeds, pd.DataFrame({"url": m1, "depth": [0] * len(m1)})],
                ignore_index=True,
            )
        )
    )
    t0 = time.time()
    eng.run(max_rounds=40)
    crawl1_wall = time.time() - t0
    base_rows = eng.images.read(spark).count()
    t0 = time.time()
    res0 = eng.publish_dedup()  # warm-up + records the base snapshot
    publish0_wall = time.time() - t0
    assert res0["mode"] == "full", res0

    # phase 2: a bounded delta, half of it mirrors of phase-1 URLs
    nd = max(100, int(n_seeds * delta_pct / 100))
    half = nd // 2
    d_m = [
        f"https://mirror.{u.split('://', 1)[1]}"
        for u in seeds["url"][1 :: max(2, 2 * len(seeds) // max(1, half))][:half]
    ]
    d_new = [
        f"https://{host_name(1 + i % n_hosts)}/img/delta/{i}" for i in range(nd - len(d_m))
    ]
    eng.add_seeds(
        spark.createDataFrame(
            pd.DataFrame({"url": d_m + d_new, "depth": [0] * (len(d_m) + len(d_new))})
        )
    )
    t0 = time.time()
    eng.run(max_rounds=80)
    crawl2_wall = time.time() - t0
    total_rows = eng.images.read(spark).count()

    t0 = time.time()
    res_inc = eng.publish_dedup()
    inc_wall = time.time() - t0
    assert res_inc["mode"] == "incremental", res_inc

    t0 = time.time()
    res_full = eng.publish_dedup(incremental=False)
    full_wall = time.time() - t0
    assert res_full["mode"] == "full", res_full
    assert (res_full["rows"], res_full["dup_images"]) == (
        res_inc["rows"],
        res_inc["dup_images"],
    ), (res_inc, res_full)

    out = {
        "n_seeds": n_seeds,
        "base_rows": int(base_rows),
        "delta_rows": int(total_rows - base_rows),
        "total_rows": int(total_rows),
        "dup_images": res_inc["dup_images"],
        "crawl1_wall_sec": round(crawl1_wall, 2),
        "crawl2_wall_sec": round(crawl2_wall, 2),
        "publish_full_base_sec": round(publish0_wall, 2),
        "publish_incremental_sec": round(inc_wall, 2),
        "publish_full_sec": round(full_wall, 2),
        "speedup": round(full_wall / inc_wall, 2) if inc_wall > 0 else None,
    }
    import shutil

    shutil.rmtree(wd, ignore_errors=True)
    spark.stop()
    with open(os.path.join(_REPO, "BENCH", "HISTORY_INCR_PUBLISH.jsonl"), "a") as f:
        f.write(json.dumps(out) + "\n")
    print("BENCH_INCR_PUBLISH " + json.dumps(out))


if __name__ == "__main__":
    main()
