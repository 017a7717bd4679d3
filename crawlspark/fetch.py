"""Vectorized fetch stage (S8) + fault model (T2) + outlink expansion.

The reference fetches pages synchronously one at a time
(mendeley/MendeleyPager.java:85-131) and downloads binary assets with
skip-if-exists (contentful/backup/ContentfulBackup.java:147-208). Here
a whole fetch batch is one DataFrame:

* HTTP status is a *pure function* of (url, retry_count) computed with
  built-in SQL expressions — so retries replay identically on resume
  (reference analogue: 504 + linear backoff,
  mendeley/MendeleyDocumentCrawler.java:72-87).
* Payload synthesis (the stand-in for the network fetch + image decode)
  runs in ``mapInPandas`` — Arrow-batched, zero per-row Python in the
  plan. On a real crawl this is where an async HTTP client would live;
  the batch shape, schema and partitioning are the real thing.
* Outlink expansion is pure built-in SQL (explode + md5 arithmetic),
  matching synth.py_outlinks bit-for-bit.
"""

from __future__ import annotations

import os
import sys
import uuid
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .hashing import h60_sql

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

FETCHED_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("image_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), False),
        T.StructField("w", T.IntegerType(), False),
        T.StructField("h", T.IntegerType(), False),
        T.StructField("fmt", T.StringType(), False),
        T.StructField("caption", T.StringType(), False),
        T.StructField("phash", T.LongType(), False),
        T.StructField("part_id", T.IntegerType(), False),
    ]
)


def warm_workers(spark) -> None:
    """Spawn + warm the executor Python-worker pool: one trivial Arrow
    task per core imports the fetch codec (numpy + zlib + the DCT
    tables) and synthesizes one image. With spark.python.worker.reuse
    (Spark default) the warmed workers then serve every later
    mapInPandas stage, so the first fetch round measures fetching, not
    interpreter start + numpy import. A continuous crawl amortizes this
    to zero anyway; calling it at seed-load time makes the first round
    behave like every other round. Cost: one ~second-scale job per
    session (later calls reuse the live pool and return quickly)."""

    def _warm(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if _REPO_ROOT not in sys.path:
            sys.path.insert(0, _REPO_ROOT)
        from crawlspark.codec import synth_image

        synth_image("https://warm.invalid/0")
        for pdf in batches:
            yield pdf

    n = spark.sparkContext.defaultParallelism
    (
        spark.range(n)
        .repartition(n)
        .mapInPandas(_warm, "id long")
        .write.format("noop")
        .mode("overwrite")
        .save()
    )


def with_status(
    selected: DataFrame,
    fault_free: bool = False,
    redirect_permille: int = 0,
    gone_permille: int = 0,
    throttle: tuple[int, int] | None = None,
) -> DataFrame:
    """status = f(url, retry_count): ~2% of URLs 504 for fail_times
    attempts; fail_times==4 exceeds max retries → permanent failure.
    ``fault_free`` mirrors SynthConfig.fault_free (steady-state bench
    workloads): every fetch returns 200. ``throttle=(permille,
    round_id)`` 429s a deterministic fraction of (url, round) attempts
    (transient — the coin re-flips each round); ``gone_permille`` > 0
    404s a fraction permanently (no retry, unlike 504);
    ``redirect_permille`` > 0 301s a fraction (highest precedence —
    a 3xx IS a completed HTTP exchange). Matches synth.py_is_throttled
    / py_is_gone / py_is_redirect bit-for-bit."""
    if fault_free:
        df = selected.withColumn("status", F.lit(200).cast("int"))
    else:
        h = h60_sql("concat(url, '|fault')")
        fail_times = (
            f"CASE WHEN pmod({h}, 1000) = 0 THEN 4 "
            f"WHEN pmod({h}, 1000) < 20 THEN 1 + pmod(shiftright({h}, 8), 3) "
            f"ELSE 0 END"
        )
        df = selected.withColumn(
            "status",
            F.expr(
                f"CASE WHEN retry_count < ({fail_times}) THEN 504 ELSE 200 END"
            ).cast("int"),
        )
    if throttle is not None and throttle[0] > 0:
        permille, round_id = throttle
        ht = h60_sql(f"concat(url, '|thr{int(round_id)}')")
        df = df.withColumn(
            "status",
            F.when(F.expr(f"pmod({ht}, 1000) < {int(permille)}"), F.lit(429))
            .otherwise(F.col("status"))
            .cast("int"),
        )
    if gone_permille > 0:
        hg = h60_sql("concat(url, '|gone')")
        df = df.withColumn(
            "status",
            F.when(
                F.expr(f"pmod({hg}, 1000) < {int(gone_permille)}"), F.lit(404)
            )
            .otherwise(F.col("status"))
            .cast("int"),
        )
    if redirect_permille > 0:
        hr = h60_sql("concat(url, '|redir')")
        df = df.withColumn(
            "status",
            F.when(
                F.expr(f"pmod({hr}, 1000) < {int(redirect_permille)}"), F.lit(301)
            )
            .otherwise(F.col("status"))
            .cast("int"),
        )
    return df


def retry_after_col():
    """Retry-After header of a 429 row, in rounds (1-3) — the Spark
    mirror of synth.py_retry_after."""
    return (1 + F.pmod(F.expr(h60_sql("concat(url, '|ra')")), F.lit(3))).cast(
        "int"
    )


def _other_host_col(hash_expr: str, n_hosts: int):
    """Cross-host target: h{1 + hash % n_hosts}.example.com — the Spark
    mirror of synth.host_name over a hash coin."""
    return F.concat(
        F.lit("h"),
        (F.expr(f"pmod({hash_expr}, {n_hosts})") + 1).cast("string"),
        F.lit(".example.com"),
    )


def _target_url_col(dst_host, k):
    """THE synthetic target-URL shape (Spark side) — single source of
    truth shared by outlink expansion and redirect Locations; mirrors
    synth.target_url bit-for-bit."""
    return F.concat(
        F.lit("https://"),
        dst_host,
        F.lit("/img/"),
        k.cast("string"),
        F.lit("?p="),
        F.pmod(k, F.lit(13)).cast("string"),
        F.lit("&s="),
        F.pmod(k, F.lit(7)).cast("string"),
    )


def redirect_target(n_hosts: int, target_space: int):
    """Spark Column: the deterministic Location for a 301 row (expects
    `url` and `host` columns). Bit-identical to synth.py_redirect_target
    — same md5 arithmetic as the outlink generator."""
    h_same = h60_sql("concat(url, '|rh')")
    h_tgt = h60_sql("concat(url, '|rt')")
    same = F.expr(f"pmod({h_same}, 10) < 5")
    dst_host = F.when(same, F.col("host")).otherwise(
        _other_host_col(h60_sql("concat(url, '|rd')"), n_hosts)
    )
    k = F.expr(f"pmod({h_tgt}, {target_space})")
    return _target_url_col(dst_host, k)


def fetch_images(ok_urls: DataFrame, lineage_acc=None) -> DataFrame:
    """Arrow-batched synthetic fetch+decode for status-200 URLs.

    Input: DataFrame with a `url` column (plus an optional int
    `version` column — content drift for adaptive-recrawl runs; absent
    means version 0 for every row). Output: FETCHED_SCHEMA rows,
    including `part_id` (the executing partition). If ``lineage_acc``
    (a dict accumulator) is given, per-partition row counts are
    accumulated for free with whatever action consumes this DataFrame —
    no separate counting job.

    NOTE: the accumulator updates inside a TRANSFORMATION, so Spark
    only guarantees exactly-once counts in local mode / non-speculative
    single-attempt runs; on a cluster with task retries or speculation
    the counters are ADVISORY. The authoritative per-partition lineage
    is derivable from the written images table itself
    (groupBy(part_id).count() over the round's append) — the engine
    treats the accumulator as a zero-cost advisory copy of that.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # executor-side import; repo root is pinned so spark-submit
        # --py-files and bare local mode both resolve the package
        if _REPO_ROOT not in sys.path:
            sys.path.insert(0, _REPO_ROOT)
        from pyspark import TaskContext

        from crawlspark.codec import synth_image

        pid = TaskContext.get().partitionId() if TaskContext.get() else -1
        for pdf in batches:
            if pdf.empty:
                continue
            urls = pdf["url"].tolist()
            versions = (
                pdf["version"].tolist() if "version" in pdf.columns else [0] * len(urls)
            )
            cols = {
                "url": urls,
                "image_id": [str(uuid.uuid5(uuid.NAMESPACE_URL, u)) for u in urls],
                "bytes": [],
                "w": [],
                "h": [],
                "fmt": [],
                "caption": [],
                "phash": [],
                "part_id": [pid] * len(urls),
            }
            for u, v in zip(urls, versions):
                img = synth_image(u, int(v))
                cols["bytes"].append(img["bytes"])
                cols["w"].append(img["w"])
                cols["h"].append(img["h"])
                cols["fmt"].append(img["fmt"])
                cols["caption"].append(img["caption"])
                cols["phash"].append(img["phash"])
            if lineage_acc is not None:
                lineage_acc.add({pid: len(urls)})
            yield pd.DataFrame(cols, columns=[f.name for f in FETCHED_SCHEMA.fields])

    cols = ["url"] + (["version"] if "version" in ok_urls.columns else [])
    return ok_urls.select(*cols).mapInPandas(run, FETCHED_SCHEMA)


def expand_outlinks(
    fetched: DataFrame,
    n_hosts: int,
    target_space: int,
    max_depth: int,
    keep_src: bool = False,
) -> DataFrame:
    """0-3 outlinks per fetched page (same-host biased), depth-bounded.
    Pure built-in SQL; bit-identical to synth.py_outlinks.
    ``keep_src`` additionally returns the linking page as ``src_url``
    (the crawl's edge relation, consumed by linkrank.pagerank)."""
    h_links = h60_sql("concat(url, '|links')")
    h_same = h60_sql("concat(url, '|l', cast(_i as string))")
    h_host = h60_sql("concat(url, '|h', cast(_i as string))")
    h_tgt = h60_sql("concat(url, '|t', cast(_i as string))")
    df = (
        fetched.filter(F.col("depth") < max_depth)
        .withColumn("_n", F.expr(f"pmod({h_links}, 4)"))
        .filter(F.col("_n") > 0)
        .withColumn("_i", F.explode(F.sequence(F.lit(0), F.col("_n") - 1)))
    )
    same = F.expr(f"pmod({h_same}, 10) < 8")
    dst_host = F.when(same, F.col("host")).otherwise(
        _other_host_col(h_host, n_hosts)
    )
    k = F.expr(f"pmod({h_tgt}, {target_space})")
    dst = _target_url_col(dst_host, k)
    cols = [dst.alias("dst_url"), (F.col("depth") + 1).alias("depth")]
    if keep_src:
        cols.insert(0, F.col("url").alias("src_url"))
    return df.select(*cols)
