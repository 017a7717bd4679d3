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
