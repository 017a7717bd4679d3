"""Plan audit: print `.explain("formatted")` for key queries and grep
for the properties that matter at 100 TB:

* parquet scans show PushedFilters / narrow ReadSchema (pruning)
* small dims join as BroadcastHashJoin
* aggregations have partial (map-side) phases
* no Python row-at-a-time UDFs anywhere (only ArrowEvalPython /
  MapInPandas for the codec stages)

Usage: python tools/explain_audit.py [name ...]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

AUDITED = [
    "q1_pricing_summary",
    "q3_top_orders",
    "q5_revenue_by_nation",
    "url_seen_antijoin",
    "politeness_topk_salted",
    "tag_dispatch_accumulate",
    "doi_citation_enrich",
    "minhash_lsh_buckets",
    "ngram_jaccard_pairs",
    "phash_hamming_near_dup",
    "image_ann_topk",
    "cosine_topk",
    "lsh_ann_topk",
    "ivf_ann_topk",
    "taxonomy_enrich",
    "nested_rename",
    "batch_grouping",
    "nested_author_filter",
    "geo_bbox_filter",
    "embedding_near_dup",
    "recrawl_priority",
    "spider_trap_templates",
    "mirror_host_pairs",
]

CHECKS = {
    "broadcast_join": re.compile(r"Broadcast(Hash|NestedLoop)Join"),
    "partial_agg": re.compile(r"partial_"),
    "pushed_filters": re.compile(r"PushedFilters: \[[^\]]"),
    "row_python_udf": re.compile(r"BatchEvalPython"),  # must NOT appear
}


def main() -> None:
    import __spark_entry__ as E
    from crawlspark.session import get_spark

    names = sys.argv[1:] or AUDITED
    spark = get_spark("local[4]", shuffle_partitions=4)
    qs = E.queries()

    def _trainset_shard_plan(spark, sf):
        # the training-set release's pre-write plan (rank shuffle +
        # broadcast offsets over quality-annotated rows) — audited like
        # a gate query even though the full op writes files
        from pyspark.sql import functions as F

        from crawlspark import trainset

        docs = spark.read.parquet(os.path.join(sf, "documents.parquet"))
        rows = docs.select(
            F.md5(F.col("doc_id").cast("string")).alias("image_id"),
            F.col("text").cast("binary").alias("bytes"),
        )
        return trainset.shard_by_rank(rows, "image_id", 100)

    def _stratified_quota_plan(spark, sf):
        from crawlspark.ops.sampling import stratified_quota

        docs = spark.read.parquet(os.path.join(sf, "documents.parquet"))
        return stratified_quota(
            docs, "lang", {"en": 40, "de": 25}, "doc_id", "audit"
        )

    def _decontaminate_plan(spark, sf):
        from crawlspark.ops.sampling import sample_by_rate
        from crawlspark.ops.text import decontaminate

        docs = spark.read.parquet(os.path.join(sf, "documents.parquet"))
        return decontaminate(docs, sample_by_rate(docs, "doc_id", 0.03, "a"))

    def _repetition_plan(spark, sf):
        from crawlspark.ops.text import repetition_stats

        docs = spark.read.parquet(os.path.join(sf, "documents.parquet"))
        return repetition_stats(docs)

    def _pagerank_plan(spark, sf):
        from crawlspark.ops.linkrank import link_pagerank

        return link_pagerank(spark, sf)

    def _packing_plan(spark, sf):
        from crawlspark.ops.packing import pack_training_sequences

        return pack_training_sequences(spark, sf)

    def _quantize_plan(spark, sf):
        from crawlspark.ops.quantize import quantized_codes

        return quantized_codes(spark, sf)

    qs = dict(
        qs,
        trainset_shard_by_rank=_trainset_shard_plan,
        sampling_stratified_quota=_stratified_quota_plan,
        text_decontaminate=_decontaminate_plan,
        text_repetition_stats=_repetition_plan,
        link_pagerank=_pagerank_plan,
        pack_training_sequences=_packing_plan,
        quantized_codes=_quantize_plan,
    )
    if not sys.argv[1:]:
        names = names + [
            "trainset_shard_by_rank",
            "sampling_stratified_quota",
            "text_decontaminate",
            "text_repetition_stats",
            "link_pagerank",
            "pack_training_sequences",
            "quantized_codes",
        ]
    sf = "/root/testdata/sf0.001"
    for name in names:
        df = qs[name](spark, sf)
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        flags = {k: bool(p.search(plan)) for k, p in CHECKS.items()}
        print(f"== {name}: {flags}")
        if os.environ.get("EXPLAIN_FULL") == "1":
            print(plan)
        assert not flags["row_python_udf"], f"{name} uses row-at-a-time Python!"
    spark.stop()


if __name__ == "__main__":
    main()
