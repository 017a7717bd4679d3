"""SparkSession factory tuned for the crawl workload.

Local mode stands in for a multi-executor cluster; partitioning choices
(shuffle partitions, salted politeness ranking, bucketed seen-set) are
made as if executors were remote, so the same code runs unchanged via
``spark-submit --py-files`` on a real cluster.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def _fair_allocation_file() -> str:
    """Write (once) an allocation file making the default pool FAIR.

    Spark's FAIR scheduler mode alone only arbitrates BETWEEN pools;
    jobs inside the default pool still run FIFO unless the pool itself
    is declared FAIR. The crawl round fans out one long fetch job plus
    several small maintenance jobs (frontier rewrite, seen/log appends,
    counts) from concurrent threads — under FIFO the small jobs' tasks
    queue behind the fetch stage and finish 4-9 s AFTER it (a per-round
    serial tail, measured in BENCH/NOTES.md); under a FAIR default pool
    their tasks interleave and the round's critical path collapses to
    the fetch stage itself. Scheduling changes task timing only, never
    results — golden-ordering equivalence is asserted over this exact
    configuration by tests/test_spark_submit.py.
    """
    import tempfile

    path = os.path.join(tempfile.gettempdir(), f"crawlspark-fair-{os.getpid()}.xml")
    if not os.path.exists(path):
        with open(path, "w") as f:
            f.write(
                '<?xml version="1.0"?>\n<allocations>\n'
                '  <pool name="default">\n'
                "    <schedulingMode>FAIR</schedulingMode>\n"
                "    <weight>1</weight>\n    <minShare>0</minShare>\n"
                "  </pool>\n</allocations>\n"
            )
    return path


def get_spark(
    master: str | None = None,
    app_name: str = "crawlspark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
    fair_jobs: bool = False,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``shuffle_partitions`` is intentionally fixed independent of core
    count so that local[8] and local[32] runs produce identical shuffle
    topology — required for the bit-identical-ordering contract.

    ``fair_jobs`` enables FAIR task scheduling across the engine's
    concurrent per-round jobs (see _fair_allocation_file).
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    sp = shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS
    builder = SparkSession.builder
    if master != "ambient":
        # "ambient" = inherit the master chosen by spark-submit
        # (--master local-cluster[...] / yarn / k8s); anything else is
        # an explicit in-process master for tests and benches.
        builder = builder.master(master)
    builder = (
        builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(sp))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # prefer shuffled-hash over sort-merge when one side of a
        # shuffle join is modestly sized (optimization guide §3.1/§9):
        # skips both sort passes; AQE additionally rewrites planned
        # sort-merge joins whose post-shuffle partitions are small.
        # Size conditions keep this adaptive at every scale — a side
        # too big for a per-partition hash map still sort-merges.
        .config("spark.sql.join.preferSortMergeJoin", "false")
        .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "64m")
        # AQE re-plans shuffle joins from ACTUAL runtime sizes; let it
        # broadcast up to 64 MB (executors are sized in GB — the 10 MB
        # default predates that). Static estimates keep the 10 MB
        # default, so only measured-small sides convert: a relation
        # that is genuinely corpus-sized at 100 TB never broadcasts.
        .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "64m")
        .config("spark.sql.session.timeZone", "UTC")
        # concurrent round jobs (fan-out appends) queue tiny broadcast
        # builds behind long fetch stages; the 300s default times the
        # broadcast out on a saturated cluster — not a plan problem,
        # just queueing, so wait instead of failing the round
        .config("spark.sql.broadcastTimeout", "1800")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # binary image rows are large; cap Arrow batch size so a batch of
        # (bytes,w,h) rows stays well under executor memory at 100TB scale
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        # checksum hygiene for a bytes-heavy workload: Hadoop's default
        # LocalFileSystem wraps every write in a ChecksumFileSystem that
        # streams ALL bytes through CRC32 and writes .crc sidecars, and
        # parquet adds its own page-level CRCs — measured 10% of the
        # 16-core fetch+append stage on the ~37KB/row image payload
        # (BENCH/NOTES.md round 5: parquet sink scaling 0.74 -> 0.89
        # once removed). The engine's durability story is snapshot
        # manifests + atomic commits, not per-page CRCs; on a real
        # cluster HDFS/S3 do integrity end-to-end anyway.
        .config(
            "spark.hadoop.fs.file.impl",
            "org.apache.hadoop.fs.RawLocalFileSystem",
        )
        .config("spark.hadoop.parquet.page.write-checksum.enabled", "false")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("CRAWLSPARK_DRIVER_MEM", "48g"))
    )
    if fair_jobs:
        builder = builder.config("spark.scheduler.mode", "FAIR").config(
            "spark.scheduler.allocation.file", _fair_allocation_file()
        )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
