"""Round-6 optimization harness (bench.py stays FROZEN for the driver).

Times each headline query exactly like bench.py's query phase (build the
DataFrame once, one warm noop write, then timed noop writes) but with
N repeats (min + samples), optional per-query selection, and
``.explain("formatted")`` capture into plans/<tag>/.

Usage:
  python bench_extra.py [--sf /root/testdata/sf1.0] [--repeats 3]
                        [--plans plans/r06 --tag before] [--only q3_top_orders,...]
Prints one JSON line {"sf":..., "queries": {...min...}, "samples": {...}}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.environ.setdefault("CRAWLSPARK_IMG_SCALE", "2")

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)

from bench import HEADLINE  # noqa: E402  (frozen list, read-only import)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0"))
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--plans", default="")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--only", default="")
    args = ap.parse_args()

    import __spark_entry__ as E
    from crawlspark.session import get_spark

    spark = get_spark(
        f"local[{args.cpus}]", shuffle_partitions=32, app_name="bench-extra"
    )
    qs = E.queries()
    names = [n for n in HEADLINE if not args.only or n in args.only.split(",")]
    out: dict = {"sf": args.sf, "queries": {}, "samples": {}}
    for name in names:
        spark.sparkContext.setJobDescription(f"bench_extra: {name}")
        fn = qs[name]
        df = fn(spark, args.sf)
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            with open(os.path.join(args.plans, f"{name}_{args.tag}.txt"), "w") as f:
                f.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                        "formatted"
                    )
                ))
        if args.repeats == 0:  # plans-only mode
            continue
        df.write.format("noop").mode("overwrite").save()  # warm
        samples = []
        for _ in range(args.repeats):
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            samples.append(round(time.time() - t0, 3))
        out["queries"][name] = min(samples)
        out["samples"][name] = samples
        print(f"# {name}: {samples}", file=sys.stderr)
    out["value"] = round(sum(out["queries"].values()), 3)
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
