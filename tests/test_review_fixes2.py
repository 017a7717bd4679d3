"""Regression tests for the second round-4 code review:

1. publish_dedup with a DIFFERENT tau must not extend keeper state
   stored at the old threshold — a tau change forces the full
   recompute, and the result equals a from-scratch keeper map at the
   new tau.
2. export_training_set over zero surviving rows publishes an honest
   EMPTY release (no AnalysisException from the attestation read-back
   of a file-less partitionBy write); read_training_set returns a
   correctly-typed empty frame and the series continues normally.
3. publish_ann_index under recrawl: a recrawled id whose CONTENT
   changed (different phash) forces the full re-embed — the stale
   embedding is replaced with the latest fetch's, not kept forever.
4. IvfIndex.search on a never-built index returns an empty result
   (same contract as built-over-empty), not a KeyError.
5. synth_image accepts schemeless URLs (canonicalize passes them
   through), including the mirror prefix on them.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from crawlspark import trainset
from crawlspark.codec import synth_image
from crawlspark.engine import CrawlEngine
from crawlspark.ops.ivf_index import IvfIndex
from crawlspark.synth import SynthConfig, gen_seeds, host_name


def _twin_engine(spark, tmp_path, name, recrawl_after=None):
    hosts = [f"h{i}.example.com" for i in range(1, 4)]
    base = [f"https://{hosts[i % 3]}/img/{i}" for i in range(24)]
    mirrors = [f"https://mirror.{u.split('://', 1)[1]}" for u in base[::3]]
    pol = pd.DataFrame(
        {"host": hosts + [f"mirror.{h}" for h in hosts], "budget": [1000] * 6}
    )
    cfg = SynthConfig(n_seeds=10, n_hosts=3, max_depth=0, fault_free=True)
    eng = CrawlEngine(
        spark,
        str(tmp_path / name),
        cfg,
        politeness_pdf=pol,
        use_cuckoo=False,
        recrawl_after=recrawl_after,
    )
    eng.add_seeds(
        spark.createDataFrame(
            pd.DataFrame(
                {"url": base + mirrors, "depth": [0] * (len(base) + len(mirrors))}
            )
        )
    )
    return eng, base, mirrors


def _keeper_pdf(eng, spark):
    return (
        eng.image_dedup.read(spark)
        .toPandas()
        .sort_values("image_id")
        .reset_index(drop=True)
    )


def test_publish_dedup_tau_change_forces_full(spark, tmp_path):
    eng, base, mirrors = _twin_engine(spark, tmp_path, "tau")
    eng.run(max_rounds=3)
    r1 = eng.publish_dedup(tau=7)
    assert r1["mode"] == "full"
    # crawl nothing new; republish at a TIGHTER tau: incremental would
    # keep the tau=7 pairs (mirror twins >2 bits apart) alive
    r2 = eng.publish_dedup(tau=2)
    assert r2["mode"] == "full", "tau change must force the full recompute"
    got = _keeper_pdf(eng, spark)
    # fresh engine, same crawl, straight to tau=2 — must match exactly
    eng2, _, _ = _twin_engine(spark, tmp_path, "tau_fresh")
    eng2.run(max_rounds=3)
    eng2.publish_dedup(tau=2)
    want = _keeper_pdf(eng2, spark)
    pd.testing.assert_frame_equal(got, want)
    # and the stored meta records the tau it was computed at
    meta = eng.image_dedup.current_manifest()["meta"]
    assert meta["tau"] == 2
    # same-tau republish with no new images takes the incremental path
    r3 = eng.publish_dedup(tau=2)
    assert r3["mode"] == "incremental"


def test_export_training_set_empty_release(spark, tmp_path):
    eng, base, mirrors = _twin_engine(spark, tmp_path, "empty_rel")
    eng.run(max_rounds=3)
    out = str(tmp_path / "rel")
    # impossible threshold: every decoded image has entropy far below
    m1 = eng.export_training_set(out, shard_rows=5, min_entropy=1e9)
    assert m1["n_rows"] == 0 and m1["n_shards"] == 0 and m1["data_dirs"] == []
    back = trainset.read_training_set(spark, out)
    assert back.count() == 0
    assert "shard" in back.columns and "image_id" in back.columns
    # the series continues: a later full export over the same root
    # (no thresholds now) replaces the empty release normally
    m2 = eng.export_training_set(out, shard_rows=5)
    assert m2["version"] == 2 and m2["n_rows"] > 0
    assert trainset.read_training_set(spark, out).count() == m2["n_rows"]


def test_ann_publish_reembeds_changed_content(spark, tmp_path):
    eng, base, mirrors = _twin_engine(spark, tmp_path, "ann_chg", recrawl_after=2)
    eng.run(max_rounds=3)
    r1 = eng.publish_ann_index()
    assert r1["mode"] == "full" and r1["vectors"] > 0
    # simulate a recrawl that came back with DIFFERENT content: append
    # a doctored copy of one image row (new phash + new bytes source)
    imgs = eng.images.read(spark)
    one = imgs.orderBy("image_id").limit(1)
    doctored = one.withColumn("phash", F.col("phash") + F.lit(1)).withColumn(
        "round_id", F.col("round_id") + F.lit(100)
    )
    eng.images.append(doctored.select(*imgs.columns))
    r2 = eng.publish_ann_index()
    assert r2["mode"] == "full", "changed content must force the re-embed"
    # the emb table holds exactly one vector per id (the latest view)
    emb = eng.image_emb.read(spark)
    n_ids = emb.select("vec_id").distinct().count()
    assert emb.count() == n_ids == r2["vectors"]


def test_ann_publish_unchanged_recrawl_stays_incremental(spark, tmp_path):
    eng, base, mirrors = _twin_engine(spark, tmp_path, "ann_ok", recrawl_after=2)
    eng.run(max_rounds=3)
    r1 = eng.publish_ann_index()
    assert r1["mode"] == "full"
    # more rounds under recrawl: same urls re-fetched, content identical
    eng.run(max_rounds=6)
    r2 = eng.publish_ann_index()
    assert r2["mode"] == "incremental", "unchanged recrawl must stay O(delta)"


def test_ivf_search_on_never_built_index(spark, tmp_path):
    idx = IvfIndex(str(tmp_path / "ivf"), n_cells=4)
    queries = spark.createDataFrame(
        [("q1", [1.0, 0.0]), ("q2", [0.0, 1.0])], "qid string, embedding array<double>"
    )
    out = idx.search(spark, queries, n_probe=2, top_k=3)
    assert out.columns == ["qid", "rank", "nid", "cosine"]
    assert out.count() == 0


def test_synth_image_schemeless_url():
    d = synth_image("h1.example.com/img/1")
    assert d["bytes"] and d["w"] > 0 and d["caption"]
    # deterministic — same url, same image
    assert synth_image("h1.example.com/img/1")["phash"] == d["phash"]
    # mirror prefix on a schemeless url is a near-dup of the base
    m = synth_image("mirror.h1.example.com/img/1")
    x = d["phash"] ^ m["phash"]
    assert bin(x & ((1 << 64) - 1)).count("1") <= 7
