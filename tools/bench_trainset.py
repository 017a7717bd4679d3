"""Bench: training-set release throughput at crawl scale.

CrawlEngine.export_training_set materializes one release — keeper-only
(+ optionally quality-curated) image+caption rows in exact fixed-row
shards. This tool measures what that costs on a crawl-sized corpus,
separating the two export modes:

  timed A  export with no thresholds   — zero pixel decode; the cost is
           the rank shuffle + parquet write of the image bytes
  timed B  export with quality thresholds — adds exactly one Arrow
           decode pass (behind the DISK_ONLY persist)
  timed C  delta release after a ~2% follow-up crawl — the O(delta)
           path: only the new rows shuffle/write, plus the thin
           released-id scan for cross-release dedup; reported against
           a full re-release of the same final corpus (timed D)

Both modes report rows/s and MB/s over the bytes column actually
shipped, plus the manifest attestation check (counts + checksums match
a recount of the written files). The corpus includes a 1% mirror slice
so the keeper anti-join does real work.

Usage: python tools/bench_trainset.py [n_seeds=60000] [shard_rows=10000]
Prints one JSON line and appends it to BENCH/HISTORY_TRAINSET.jsonl.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

os.environ.setdefault("CRAWLSPARK_IMG_SCALE", "2")  # match bench_cluster bytes

import pandas as pd

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from crawlspark import trainset  # noqa: E402
from crawlspark.engine import CrawlEngine  # noqa: E402
from crawlspark.session import get_spark  # noqa: E402
from crawlspark.synth import SynthConfig, gen_seeds, host_name  # noqa: E402


def main() -> None:
    n_seeds = int(sys.argv[1]) if len(sys.argv) > 1 else 60000
    shard_rows = int(sys.argv[2]) if len(sys.argv) > 2 else 10000
    n_hosts = max(50, n_seeds // 300)
    cfg = SynthConfig(
        n_seeds=n_seeds,
        n_hosts=n_hosts,
        max_depth=0,
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
    extra = {"spark.locality.wait": "0"}
    if os.path.isdir("/dev/shm"):
        os.makedirs("/dev/shm/crawlspark-scratch", exist_ok=True)
        extra["spark.local.dir"] = "/dev/shm/crawlspark-scratch"
    spark = get_spark(
        "local[32]",
        shuffle_partitions=32,
        app_name="bench-trainset",
        extra_conf=extra,
        fair_jobs=True,
    )
    wd = tempfile.mkdtemp(
        prefix="bench_ts_", dir="/dev/shm" if os.path.isdir("/dev/shm") else None
    )
    try:
        eng = CrawlEngine(
            spark, os.path.join(wd, "wd"), cfg, politeness_pdf=pol, use_cuckoo="auto"
        )
        m1 = [f"https://mirror.{u.split('://', 1)[1]}" for u in seeds["url"][::100]]
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
        crawl_wall = time.time() - t0
        from pyspark.sql import functions as F

        agg = eng.images.read(spark).agg(
            F.count("*").alias("n"), F.sum(F.length("bytes")).alias("b")
        ).collect()[0]
        n_images, total_mb = int(agg["n"]), int(agg["b"]) / 1e6
        t0 = time.time()
        eng.publish_dedup()  # keeper map current before the timed exports
        publish_wall = time.time() - t0

        out_a = os.path.join(wd, "rel_plain")
        t0 = time.time()
        man_a = eng.export_training_set(out_a, shard_rows=shard_rows)
        wall_a = time.time() - t0

        out_b = os.path.join(wd, "rel_curated")
        t0 = time.time()
        man_b = eng.export_training_set(
            out_b, shard_rows=shard_rows, min_entropy=1.0, min_lap_var=25.0
        )
        wall_b = time.time() - t0

        # attestation check on mode A: recount what landed
        rel = trainset.read_training_set(spark, out_a)
        back = {
            int(r["shard"]): {
                "rows": int(r["rows"]),
                "checksum": int(r["checksum"]),
            }
            for r in rel.groupBy("shard")
            .agg(
                F.count("*").alias("rows"),
                F.bit_xor(F.xxhash64("image_id")).alias("checksum"),
            )
            .collect()
        }
        assert back == {int(k): v for k, v in man_a["shards"].items()}

        # phase E: mixed release — the data-mixing policy (per-fmt
        # uniform weights, 60% budget) on top of the plain path; the
        # added cost is one counts agg + the prefiltered O(quota)
        # ranking window + the flag join-back
        out_e = os.path.join(wd, "rel_mixed")
        fmts = [
            r[0] for r in eng.latest_images().select("fmt").distinct().collect()
        ]
        mix = {
            "stratum_col": "fmt",
            "weights": {s: 1.0 for s in fmts},
            "total": int(man_a["n_rows"] * 0.6),
            "salt": "bench",
        }
        t0 = time.time()
        man_e = eng.export_training_set(out_e, shard_rows=shard_rows, mix=mix)
        wall_e = time.time() - t0
        # budget below availability => water-filling seats it exactly
        assert man_e["n_rows"] == mix["total"], (man_e["n_rows"], mix["total"])
        assert sum(man_e["filters"]["mix"]["quotas"].values()) == mix["total"]

        # phase C/D: O(delta) release vs full re-release of the final corpus
        nd = max(100, n_seeds // 50)
        d_urls = [
            f"https://{host_name(1 + i % n_hosts)}/img/delta/{i}" for i in range(nd)
        ]
        eng.add_seeds(
            spark.createDataFrame(
                pd.DataFrame({"url": d_urls, "depth": [0] * nd})
            )
        )
        eng.run(max_rounds=80)
        eng.publish_dedup()  # keeper map current: time the RELEASE path only
        t0 = time.time()
        man_c = eng.export_training_delta(out_a)
        wall_c = time.time() - t0
        delta_rows = man_c["n_rows"] - man_a["n_rows"]
        t0 = time.time()
        man_d = eng.export_training_set(out_a, shard_rows=shard_rows)
        wall_d = time.time() - t0
        # The compaction (full re-release) re-materializes the CURRENT
        # keeper set; the delta series by design never revokes released
        # rows, so when a delta image chance-collides (pHash<=tau) with
        # released rows the two releases legitimately differ: series
        # keeps the released member, compaction swaps in the cluster
        # keeper, and a delta image bridging TWO released rows drops
        # one net row. Assert the exact oracle for each, not equality.
        ded = eng.image_dedup.read(spark).select("image_id", "is_dup")
        n_keepers = (
            eng.latest_images()
            .join(ded, "image_id", "left")
            .filter(~F.coalesce(F.col("is_dup"), F.lit(False)))
            .count()
        )
        assert man_d["n_rows"] == n_keepers, (man_d["n_rows"], n_keepers)
        assert man_d["n_rows"] <= man_c["n_rows"]

        out = {
            "n_seeds": n_seeds,
            "n_images": n_images,
            "corpus_mb": round(total_mb, 1),
            "crawl_sec": round(crawl_wall, 1),
            "publish_dedup_sec": round(publish_wall, 1),
            "shard_rows": shard_rows,
            "plain": {
                "rows": man_a["n_rows"],
                "shards": man_a["n_shards"],
                "sec": round(wall_a, 1),
                "rows_per_sec": round(man_a["n_rows"] / wall_a, 1),
                "mb_per_sec": round(
                    total_mb * man_a["n_rows"] / max(1, n_images) / wall_a, 1
                ),
            },
            "curated": {
                "rows": man_b["n_rows"],
                "shards": man_b["n_shards"],
                "sec": round(wall_b, 1),
                "rows_per_sec": round(man_b["n_rows"] / wall_b, 1),
            },
            "decode_overhead_x": round(wall_b / wall_a, 2) if wall_a > 0 else None,
            "mixed": {
                "rows": man_e["n_rows"],
                "sec": round(wall_e, 1),
                "rows_per_sec": round(man_e["n_rows"] / wall_e, 1),
                "overhead_vs_plain_x": (
                    round(wall_e / wall_a, 2) if wall_a > 0 else None
                ),
            },
            "delta": {
                "delta_rows": delta_rows,
                "sec": round(wall_c, 1),
                "full_rerelease_sec": round(wall_d, 1),
                "speedup_x": round(wall_d / wall_c, 2) if wall_c > 0 else None,
            },
        }
        with open(os.path.join(_REPO, "BENCH", "HISTORY_TRAINSET.jsonl"), "a") as f:
            f.write(json.dumps(out) + "\n")
        print("BENCH_TRAINSET " + json.dumps(out))
    finally:
        spark.stop()
        shutil.rmtree(wd, ignore_errors=True)


if __name__ == "__main__":
    main()
