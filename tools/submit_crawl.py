"""spark-submit driver: run a full crawl on a real multi-executor master
and golden-check the result.

The north rule requires the job to run via ``spark-submit --py-files``
on a multi-executor cluster. This script is that driver: it imports
``crawlspark`` ONLY from the ``--py-files`` zip (it lives in tools/, so
the repo root is not on sys.path when spark-submit launches it), runs
the engine end-to-end — frontier scan, cuckoo/seen anti-join, robots,
politeness ranking, vectorized fetch, atomic snapshot commits — on
whatever master spark-submit provides (``local-cluster[N,cores,mem]``
gives real separate executor JVMs in this sandbox), then replays the
same config through the pure-Python golden simulator on the driver and
asserts exact crawl ordering + final URL-seen set.

Usage (via tools/submit.sh, which builds the zip):
    tools/submit.sh 'local-cluster[2,2,1024]' /tmp/wd 300

Prints one JSON line prefixed CRAWLSPARK_SUBMIT_RESULT; exit 0 iff the
crawl matches the golden simulator.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("workdir")
    ap.add_argument("n_seeds", type=int)
    ap.add_argument("--n-hosts", type=int, default=10)
    ap.add_argument("--max-depth", type=int, default=1)
    ap.add_argument("--backoff-step", type=int, default=0)
    ap.add_argument(
        "--budget",
        type=int,
        default=0,
        help="uniform per-host politeness budget (0 = the default "
        "per-host budget_for_hostid schedule); a generous uniform "
        "budget collapses the round count for smoke runs while still "
        "exercising the full salted ranking window",
    )
    ap.add_argument("--skip-golden", action="store_true")
    ap.add_argument(
        "--bench",
        action="store_true",
        help="throughput mode: bench_crawl's config (n_hosts scaled to "
        "seeds, generous budgets, shuffle=16, tmpfs scratch, "
        "IMG_SCALE=2) and no golden replay — for measuring fetch "
        "rows/s at two cluster sizes via spark-submit",
    )
    args = ap.parse_args()

    # These imports resolve from the --py-files zip, not the repo tree.
    import pandas as pd

    from crawlspark.engine import CrawlEngine
    from crawlspark.golden import simulate
    from crawlspark.session import get_spark
    from crawlspark.synth import SynthConfig, gen_seeds, host_name

    extra_conf = {
        "spark.sql.adaptive.enabled": "false",
        "spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version": "2",
    }
    if args.bench:
        extra_conf["spark.locality.wait"] = "0"
        if os.path.isdir("/dev/shm"):
            os.makedirs("/dev/shm/crawlspark-scratch", exist_ok=True)
            extra_conf["spark.local.dir"] = "/dev/shm/crawlspark-scratch"
    spark = get_spark(
        master="ambient",
        app_name="crawlspark-submit",
        shuffle_partitions=16 if args.bench else 8,
        extra_conf=extra_conf,
        fair_jobs=True,
    )
    master = spark.sparkContext.master
    n_hosts = max(50, args.n_seeds // 300) if args.bench else args.n_hosts
    # bench mode measures steady-state throughput fault-free by default:
    # drain-mode retry-tail rounds are pure fixed latency a continuous
    # crawl never pays (see crawlspark/bench_crawl.py for the full note)
    fault_free = args.bench and (
        os.environ.get("CRAWLSPARK_BENCH_FAULT_FREE", "1") == "1"
    )
    cfg = SynthConfig(
        n_seeds=args.n_seeds,
        n_hosts=n_hosts,
        max_depth=args.max_depth,
        retry_backoff_step=args.backoff_step,
        fault_free=fault_free,
    )
    seeds = gen_seeds(cfg)
    pol = None
    budget_fn = None
    if args.bench:
        pol = pd.DataFrame(
            {
                "host": [host_name(i) for i in range(1, n_hosts + 1)],
                "budget": [
                    max(2000, 2 * args.n_seeds // i) for i in range(1, n_hosts + 1)
                ],
            }
        )
        args.skip_golden = True
    elif args.budget > 0:
        pol = pd.DataFrame(
            {
                "host": [host_name(i) for i in range(1, cfg.n_hosts + 1)],
                "budget": [args.budget] * cfg.n_hosts,
            }
        )
        budget_fn = lambda hostid: args.budget  # noqa: E731
    shutil.rmtree(args.workdir, ignore_errors=True)
    # CRAWLSPARK_BENCH_CUCKOO: 1 forces the cuckoo URL-seen pre-filter
    # on, 0 forces it off, auto (default) = the engine's scale threshold
    # (A/B knob, same contract as crawlspark/bench_crawl.py; correctness
    # is unaffected either way — golden equivalence holds in both modes)
    _ck = os.environ.get("CRAWLSPARK_BENCH_CUCKOO", "auto")
    use_cuckoo = "auto" if _ck == "auto" else _ck == "1"
    eng = CrawlEngine(
        spark, args.workdir, cfg, politeness_pdf=pol, use_cuckoo=use_cuckoo
    )
    eng.add_seeds(spark.createDataFrame(seeds))
    t0 = time.time()
    rounds = eng.run(max_rounds=40)
    wall = time.time() - t0
    fetched = sum(r["fetched"] for r in rounds)

    # record the codec scale as seen by EXECUTOR python workers (env
    # must travel via spark-submit's JVM env, not driver os.environ)
    exec_scale = (
        spark.sparkContext.parallelize([0], 1)
        .map(lambda _: __import__("os").environ.get("CRAWLSPARK_IMG_SCALE", "1"))
        .collect()[0]
    )
    out = {
        "master": master,
        "fault_free": fault_free,
        "use_cuckoo": use_cuckoo,
        "executor_img_scale": exec_scale,
        "executors": spark.sparkContext.defaultParallelism,
        "n_seeds": args.n_seeds,
        "rounds": len(rounds),
        "wall_sec": round(wall, 2),
        "rows_fetched": fetched,
        "fetch_rows_per_sec": round(fetched / wall, 1),
    }
    ok = True
    if not args.skip_golden:
        golden = simulate(list(seeds["url"]), cfg, budget_fn=budget_fn)
        log = (
            eng.fetch_log.read(spark)
            .toPandas()
            .sort_values(["round_id", "host", "rank"])
            .reset_index(drop=True)
        )
        go = golden.fetch_order.sort_values(
            ["round_id", "host", "rank"]
        ).reset_index(drop=True)
        cast = {"round_id": "int64", "rank": "int64", "status": "int64", "retry_count": "int64"}
        try:
            pd.testing.assert_frame_equal(
                log[list(go.columns)].astype(cast), go.astype(cast)
            )
            order_ok = True
        except AssertionError:
            order_ok = False
        seen = (
            eng.seen.read(spark)
            .toPandas()
            .sort_values("url")
            .reset_index(drop=True)
        )
        gs = golden.url_seen.sort_values("url").reset_index(drop=True)
        scast = {"status": "int64", "round_id": "int64", "url_hash": "int64"}
        try:
            pd.testing.assert_frame_equal(seen.astype(scast), gs.astype(scast))
            seen_ok = True
        except AssertionError:
            seen_ok = False
        out["golden_order_match"] = order_ok
        out["golden_seen_match"] = seen_ok
        out["golden_rows"] = int(len(go))
        ok = order_ok and seen_ok
    print("CRAWLSPARK_SUBMIT_RESULT " + json.dumps(out), flush=True)
    spark.stop()
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
