"""Crawl throughput benchmark worker (run as a subprocess per master).

Runs the full engine — frontier scan, seen anti-join, robots,
politeness rank, vectorized fetch, atomic commits — over a Zipfian
seed list, and reports wall time + throughput as one JSON line.

Used by bench.py at two parallelism levels (local[N] vs local[4N]) to
evidence the north_rule's N→4N scaling-efficiency criterion. Shuffle
partitioning is FIXED across levels so only executor-thread count
varies — the same property a real N vs 4N executor cluster would have.

Usage: python -m crawlspark.bench_crawl <master> <workdir> <n_seeds> <out_json>
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

# Realistic image payloads for the bench: IMG_SCALE=2 puts synthetic
# images at ~12 KB (scale 1's ~3 KB is far below any real thumbnail),
# which also makes the per-row fetch work dominate per-row fixed
# serialization costs — the regime a real image crawl runs in. Must be
# set BEFORE the JVM starts so executor Python workers inherit it.
os.environ.setdefault("CRAWLSPARK_IMG_SCALE", "2")

import pandas as pd

from .engine import CrawlEngine
from .session import get_spark
from .synth import SynthConfig, gen_seeds, host_name


def run(master: str, workdir: str, n_seeds: int, out_json: str) -> dict:
    n_hosts = max(50, n_seeds // 300)
    # retry next round (backoff step 0): at crawl-round granularity a
    # transient 5xx is retryable immediately; the default step-1 linear
    # backoff spreads a ~2% retry tail over 2x the rounds, all fixed
    # per-round latency (the golden/ordering tests exercise step 1)
    #
    # fault_free (default ON for the scaling bench): a FINITE workload
    # with injected 504s drains through tiny retry-only tail rounds —
    # pure fixed per-round latency, identical at every cluster size, an
    # Amdahl term a CONTINUOUS crawl never pays (in steady state retries
    # ride inside full-volume rounds). Measuring the pair fault-free is
    # the steady-state throughput; set CRAWLSPARK_BENCH_FAULT_FREE=0 to
    # measure the drain-mode workload (golden equivalence covers both:
    # tests/test_property.py::fault_free).
    fault_free = os.environ.get("CRAWLSPARK_BENCH_FAULT_FREE", "1") == "1"
    cfg = SynthConfig(
        n_seeds=n_seeds,
        n_hosts=n_hosts,
        max_depth=1,
        retry_backoff_step=0,
        fault_free=fault_free,
    )
    seeds = gen_seeds(cfg)
    # benchmark politeness: hot hosts get big budgets (still ranked /
    # salted — the full window machinery runs), cold hosts unbounded
    pol = pd.DataFrame(
        {
            "host": [host_name(i) for i in range(1, n_hosts + 1)],
            "budget": [
                max(2000, 2 * n_seeds // i) for i in range(1, n_hosts + 1)
            ],
        }
    )
    extra = {
        # AQE off: round plans are already partition-bounded; AQE's
        # per-stage jobs add fixed latency per round (see tests)
        "spark.sql.adaptive.enabled": "false",
        "spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version": "2",
        "spark.locality.wait": "0",
        # the r2 driver bench died with anonymous 'Python worker exited
        # unexpectedly (crashed)' errors — make any future worker crash
        # name itself in the executor log
        "spark.python.worker.faulthandler.enabled": "true",
        "spark.sql.execution.pyspark.udf.faulthandler.enabled": "true",
    }
    # this sandbox shares ONE cloud disk whose IOPS throttle under
    # sustained load (and punish the higher-concurrency level more);
    # a real cluster has per-node disks, so shuffle scratch goes to
    # tmpfs to keep the N-vs-4N comparison about compute, not one
    # throttled device
    if os.path.isdir("/dev/shm"):
        os.makedirs("/dev/shm/crawlspark-scratch", exist_ok=True)
        extra["spark.local.dir"] = "/dev/shm/crawlspark-scratch"
    # shuffle partitioning FIXED across levels (identical topology at N
    # and 4N); 16 keeps big shuffles parallel while halving the number
    # of tasks each of the many small per-round stages must launch
    spark = get_spark(
        master,
        shuffle_partitions=int(os.environ.get("CRAWLSPARK_BENCH_SHUFFLE", "16")),
        app_name=f"bench-crawl-{master}",
        extra_conf=extra,
        fair_jobs=True,
    )
    shutil.rmtree(workdir, ignore_errors=True)
    # CRAWLSPARK_BENCH_CUCKOO: 1 forces the cuckoo URL-seen pre-filter
    # on, 0 forces it off, auto (default) = the engine's scale threshold
    # (A/B knob; correctness is unaffected either way — the filter only
    # routes rows between the exact anti-join and the recent-slice join)
    _ck = os.environ.get("CRAWLSPARK_BENCH_CUCKOO", "auto")
    eng = CrawlEngine(
        spark,
        workdir,
        cfg,
        politeness_pdf=pol,
        use_cuckoo="auto" if _ck == "auto" else _ck == "1",
    )
    eng.add_seeds(spark.createDataFrame(seeds))
    t0 = time.time()
    results = eng.run(max_rounds=40)
    wall = time.time() - t0
    selected = sum(r["selected"] for r in results)
    fetched = sum(r["fetched"] for r in results)
    # isolate the compute stage (fetch+encode+phash — the part that is
    # decode-bound on a real image crawl): same session, noop sink
    from .fetch import fetch_images

    n_fetch = min(100_000, n_seeds)
    urls = (
        spark.range(n_fetch)
        .selectExpr(
            "concat('https://bench.example.com/img/', cast(id as string)) as url"
        )
        .repartition(spark.sparkContext.defaultParallelism * 2)
        .cache()
    )
    urls.count()
    t0 = time.time()
    fetch_images(urls).write.format("noop").mode("overwrite").save()
    fetch_wall = time.time() - t0

    out = {
        "master": master,
        "fault_free": fault_free,
        "n_seeds": n_seeds,
        "rounds": len(results),
        "wall_sec": round(wall, 2),
        # dirty-bucket evidence: frontier rows actually rewritten vs the
        # ripe pending rows each round (what a full overwrite would have
        # rewritten at minimum, every round)
        "frontier_rows_written_total": sum(
            r.get("frontier_rows_written", 0) for r in results
        ),
        "frontier_ripe_pending_total": sum(r.get("pending", 0) for r in results),
        "frontier_urls_processed": selected,
        "rows_fetched": fetched,
        "frontier_urls_per_sec": round(selected / wall, 1),
        "fetch_rows_per_sec": round(fetched / wall, 1),
        "fetch_stage_rows_per_sec": round(n_fetch / fetch_wall, 1),
    }
    with open(out_json, "w") as f:
        json.dump(out, f)
    spark.stop()
    return out


if __name__ == "__main__":
    r = run(sys.argv[1], sys.argv[2], int(sys.argv[3]), sys.argv[4])
    print(json.dumps(r))
