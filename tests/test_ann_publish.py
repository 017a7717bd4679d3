"""CrawlEngine.publish_ann_index: post-crawl persisted ANN index over
the crawled images — full build on first publish, O(delta) incremental
embed+update afterwards, and a search that finds a mirror twin's base
image as its nearest neighbor (the embedding is codec-noise robust)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from crawlspark.canon import py_canonicalize
from crawlspark.engine import CrawlEngine
from crawlspark.synth import SynthConfig


def _engine(spark, tmp_path):
    hosts = [f"h{i}.example.com" for i in range(1, 4)]
    pol = pd.DataFrame(
        {
            "host": hosts + [f"mirror.{h}" for h in hosts],
            "budget": [1000] * 6,
        }
    )
    cfg = SynthConfig(n_seeds=10, n_hosts=3, max_depth=0, fault_free=True)
    eng = CrawlEngine(
        spark, str(tmp_path / "wd"), cfg, politeness_pdf=pol, use_cuckoo=False
    )
    return eng, hosts


def _seed(eng, spark, urls):
    eng.add_seeds(
        spark.createDataFrame(pd.DataFrame({"url": urls, "depth": [0] * len(urls)}))
    )
    eng.run(max_rounds=8)


def test_publish_ann_index_incremental_and_search(spark, tmp_path):
    eng, hosts = _engine(spark, tmp_path)
    base = [f"https://{hosts[i % 3]}/img/{i}" for i in range(20)]
    _seed(eng, spark, base)

    r1 = eng.publish_ann_index()
    assert (r1["mode"], r1["index"]) == ("full", "build")
    n1 = eng.images.read(spark).count()
    assert r1["vectors"] == n1 == eng.image_emb.read(spark).count()

    # phase 2: mirror twins of some bases — only THESE get embedded
    mirrors = [f"https://mirror.{u.split('://', 1)[1]}" for u in base[:6]]
    _seed(eng, spark, mirrors)
    r2 = eng.publish_ann_index()
    assert (r2["mode"], r2["index"]) == ("incremental", "update")
    n2 = eng.images.read(spark).count()
    assert r2["vectors"] == n2 == eng.image_emb.read(spark).count() == n1 + 6

    # search: each mirror's nearest neighbor must be its base image
    # (embedding robust to the mirror's ±2 pixel noise)
    imgs = eng.images.read(spark).select("image_id", "url").toPandas()
    id_by_url = dict(zip(imgs["url"], imgs["image_id"]))
    mids = [id_by_url[py_canonicalize(u)] for u in mirrors]
    queries = (
        eng.image_emb.read(spark)
        .filter(F.col("vec_id").isin(mids))
        .selectExpr("vec_id as qid", "embedding")
    )
    got = eng.ann_index.search(spark, queries, n_probe=3, top_k=1).toPandas()
    top1 = dict(zip(got["qid"], got["nid"]))
    for mu in mirrors:
        mid = id_by_url[py_canonicalize(mu)]
        bid = id_by_url[py_canonicalize("https://" + mu.split("://mirror.", 1)[1])]
        assert top1[mid] == bid, mu

    # no-change republish: meta-only advance, index untouched
    r3 = eng.publish_ann_index()
    assert (r3["mode"], r3["index"]) == ("incremental", "update")
    assert r3["vectors"] == n2


def test_publish_ann_index_survives_crash_resume(spark, tmp_path):
    """Publish mid-crawl, crash with partial image writes, resume and
    finish, publish again: the second publish must still take the
    incremental path (resume's rollback lands exactly on the recorded
    base snapshot, discarding the junk) and its assignments must equal
    a from-scratch build under the same centroids."""
    eng, hosts = _engine(spark, tmp_path)
    base = [f"https://{hosts[i % 3]}/img/{i}" for i in range(18)]
    eng.add_seeds(
        spark.createDataFrame(pd.DataFrame({"url": base, "depth": [0] * len(base)}))
    )
    eng.run(max_rounds=8, stop_after=1)
    r1 = eng.publish_ann_index()
    assert r1["index"] == "build"

    # crash: a partial images append lands, no round manifest
    import numpy as np  # noqa: F401

    eng.images.append(
        spark.createDataFrame(
            [("junk-id", "https://junk.example.com/x", b"\x00", 1, 1, "png", "j", 0, 99)],
            eng.images.schema(),
        )
    )

    from crawlspark.engine import CrawlEngine
    from crawlspark.synth import SynthConfig

    cfg = SynthConfig(n_seeds=10, n_hosts=3, max_depth=0, fault_free=True)
    pol = pd.DataFrame(
        {
            "host": hosts + [f"mirror.{h}" for h in hosts],
            "budget": [1000] * 6,
        }
    )
    resumed = CrawlEngine(
        spark, str(tmp_path / "wd"), cfg, politeness_pdf=pol, use_cuckoo=False
    )
    mirrors = [f"https://mirror.{u.split('://', 1)[1]}" for u in base[:4]]
    resumed.add_seeds(
        spark.createDataFrame(
            pd.DataFrame({"url": mirrors, "depth": [0] * len(mirrors)})
        )
    )
    resumed.run(max_rounds=8)
    imgs = resumed.images.read(spark)
    assert imgs.filter("image_id = 'junk-id'").count() == 0  # junk discarded

    r2 = resumed.publish_ann_index()
    assert (r2["mode"], r2["index"]) == ("incremental", "update")
    assert r2["vectors"] == imgs.count()

    # assignments equal a from-scratch build under the SAME centroids
    from crawlspark.ops.ivf_index import IvfIndex

    ref = IvfIndex(str(tmp_path / "ivf_ref"), n_cells=resumed.ann_index.n_cells)
    ref.build(spark, resumed.image_emb, centroids=resumed.ann_index.centroids_df(spark))
    a = (
        resumed.ann_index.table.read(spark)
        .select("vec_id", "cell")
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    b = (
        ref.table.read(spark)
        .select("vec_id", "cell")
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_publish_ann_index_quantized(spark, tmp_path):
    """quantize=True on the first publish stores int8 posting rows; the
    incremental re-publish inherits the form and the mirror-twin top-1
    retrieval still holds on dequantized candidates."""
    eng, hosts = _engine(spark, tmp_path)
    base = [f"https://{hosts[i % 3]}/img/{i}" for i in range(20)]
    _seed(eng, spark, base)

    r1 = eng.publish_ann_index(quantize=True)
    assert (r1["mode"], r1["index"]) == ("full", "build")
    stored = eng.ann_index.table.read_buckets(
        spark, list(range(eng.ann_index.n_cells))
    )
    assert set(stored.columns) == {"vec_id", "cell", "q", "scale"}
    assert dict(stored.dtypes)["q"] == "array<tinyint>"

    mirrors = [f"https://mirror.{u.split('://', 1)[1]}" for u in base[:6]]
    _seed(eng, spark, mirrors)
    r2 = eng.publish_ann_index()  # no flag: form is sticky
    assert (r2["mode"], r2["index"]) == ("incremental", "update")
    stored = eng.ann_index.table.read_buckets(
        spark, list(range(eng.ann_index.n_cells))
    )
    assert set(stored.columns) == {"vec_id", "cell", "q", "scale"}

    imgs = eng.images.read(spark).select("image_id", "url").toPandas()
    id_by_url = dict(zip(imgs["url"], imgs["image_id"]))
    mids = [id_by_url[py_canonicalize(u)] for u in mirrors]
    queries = (
        eng.image_emb.read(spark)
        .filter(F.col("vec_id").isin(mids))
        .selectExpr("vec_id as qid", "embedding")
    )
    got = eng.ann_index.search(spark, queries, n_probe=3, top_k=1).toPandas()
    top1 = dict(zip(got["qid"], got["nid"]))
    for mu in mirrors:
        mid = id_by_url[py_canonicalize(mu)]
        bid = id_by_url[py_canonicalize("https://" + mu.split("://mirror.", 1)[1])]
        assert top1[mid] == bid, mu
