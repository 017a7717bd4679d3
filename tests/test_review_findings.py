"""Regression tests for the round-4 incremental-maintenance review:

1. add_seeds after a mid-round crash merges against the COMMITTED
   state (a partial frontier/seen HEAD must not be blessed) — the
   restart-with-new-seeds flow stays bit-identical to a clean run.
2. publish_dedup under recrawl mode: re-appended image_ids must not
   re-fold already-counted pairs (n_dups would inflate every TTL
   cycle); incremental == from-scratch full recompute.
3. publish_ann_index under recrawl mode: no duplicate vec_id rows in
   image_emb or the persisted IVF postings.
4. Incremental backups pin their base snapshot so the engine's
   per-round snapshot GC cannot degrade every export to a full
   generation roll.
5. restore_backup_incremental replays only the dirs STATE.json claims
   — a crashed export's orphan delta dir is never restored.
6. IvfIndex.build/update on an empty source is a clean no-op, not an
   IndexError inside the k-means sampler.
"""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import functions as F

from crawlspark.backup import backup_table_incremental, restore_backup_incremental
from crawlspark.engine import CrawlEngine
from crawlspark.ops.ivf_index import IvfIndex
from crawlspark.snaptable import SnapTable
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


def test_recrawl_dedup_publish_does_not_inflate(spark, tmp_path):
    """TTL re-appends of existing image_ids must not re-fold their
    pairs: publish → recrawl cycles (+ one genuinely NEW cross-phase
    twin) → publish must equal a from-scratch full recompute."""
    eng, base, mirrors = _twin_engine(spark, tmp_path, "rcdp", recrawl_after=2)
    eng.run(max_rounds=2)
    r1 = eng.publish_dedup()
    assert r1["mode"] == "full" and r1["dup_images"] == len(mirrors)

    # recrawl cycles re-append every fetched id; also add ONE new twin
    # (mirror of base[1], which base[::3] left unmirrored) so the next
    # incremental delta mixes recrawled ids with a genuinely new id
    new_twin = f"https://mirror.{base[1].split('://', 1)[1]}"
    eng.add_seeds(
        spark.createDataFrame(pd.DataFrame({"url": [new_twin], "depth": [0]}))
    )
    eng.run(max_rounds=8)
    imgs = eng.images.read(spark).select("image_id").toPandas()
    assert len(imgs) > imgs.image_id.nunique(), "recrawl should append dup ids"

    r2 = eng.publish_dedup()
    assert r2["mode"] == "incremental"
    # one more pair: its non-keeper twin is flagged (keeper is not)
    assert r2["dup_images"] == len(mirrors) + 1
    assert r2["rows"] == 2 * (len(mirrors) + 1)
    inc = (
        eng.image_dedup.read(spark)
        .toPandas()
        .sort_values("image_id")
        .reset_index(drop=True)
    )
    # re-publish with nothing new: counts frozen (the inflation bug
    # added one n_dups per recrawl cycle per pair)
    eng.run(max_rounds=11)
    r3 = eng.publish_dedup()
    assert {k: r3[k] for k in ("rows", "dup_images")} == {
        k: r2[k] for k in ("rows", "dup_images")
    }
    # from-scratch full recompute (latest-row-per-id + table replace)
    # must produce exactly the incrementally-maintained table
    r4 = eng.publish_dedup(incremental=False)
    assert r4["mode"] == "full"
    full = (
        eng.image_dedup.read(spark)
        .toPandas()
        .sort_values("image_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(inc, full, check_like=True)
    assert (full.n_dups == 1).all(), "every twin pair has exactly one neighbor"


def test_recrawl_ann_publish_no_duplicate_vectors(spark, tmp_path):
    """Recrawl re-appends must not re-embed: vec_id stays unique in
    image_emb AND in the persisted IVF postings, and the vector count
    equals the distinct image count."""
    eng, base, mirrors = _twin_engine(spark, tmp_path, "rcann", recrawl_after=2)
    eng.run(max_rounds=2)
    r1 = eng.publish_ann_index()
    assert r1["vectors"] == len(base) + len(mirrors)

    eng.run(max_rounds=8)
    r2 = eng.publish_ann_index()
    assert r2["mode"] == "incremental"
    assert r2["vectors"] == len(base) + len(mirrors), "recrawls re-embedded"
    emb = eng.image_emb.read(spark).select("vec_id").toPandas()
    assert emb.vec_id.nunique() == len(emb) == r2["vectors"]
    idx = eng.ann_index.table.read(spark).select("vec_id").toPandas()
    assert idx.vec_id.nunique() == len(idx) == r2["vectors"]


def test_add_seeds_after_crash_is_bit_identical(spark, tmp_path):
    """Crash mid-round (partial frontier replace + seen append, no
    round manifest), then the documented restart flow add_seeds(extra)
    → run(): must equal a clean run that added the same seeds at the
    same round boundary. The buggy version merged the crashed round's
    partial frontier into the manifest (losing that round's URLs) and
    anti-joined the new seeds against about-to-be-rolled-back seen rows."""
    cfg = SynthConfig(n_seeds=40, n_hosts=4, max_depth=1)
    seeds = gen_seeds(cfg)
    extra = pd.DataFrame(
        {
            "url": [f"https://{host_name(1)}/extra/{i}" for i in range(5)],
            "depth": [0] * 5,
        }
    )
    pol = pd.DataFrame(
        {"host": [host_name(i) for i in range(1, 5)], "budget": [40] * 4}
    )

    def mk(name):
        e = CrawlEngine(
            spark, str(tmp_path / name), cfg, politeness_pdf=pol, use_cuckoo=False
        )
        e.add_seeds(spark.createDataFrame(seeds))
        return e

    clean = mk("clean")
    clean.run(max_rounds=20, stop_after=4)
    clean.add_seeds(spark.createDataFrame(extra))
    clean.run(max_rounds=20)

    broken = mk("broken")
    broken.run(max_rounds=20, stop_after=4)
    # partial round-5 writes: a frontier append + a seen append that
    # resume() must discard and add_seeds must not merge against
    broken.frontier.append(
        spark.createDataFrame(
            [("https://junk.example.com/x", 0, 99, 0, 0, -1, "junk.example.com", 0.5)],
            "url string, retry_count int, not_before int, depth int, hops int, "
            "etag_round int, host string, priority double",
        )
    )
    broken.seen.append(
        spark.createDataFrame(
            [(extra.url[0], 1, 200, 4)],
            "url string, url_hash long, status int, round_id int",
        )
    )
    broken.add_seeds(spark.createDataFrame(extra))
    broken.run(max_rounds=20)

    for attr in ("images", "seen", "fetch_log", "frontier"):
        a = getattr(clean, attr).read(spark)
        b = getattr(broken, attr).read(spark)
        cols = [c for c in a.columns if c != "bytes"]
        pa = a.select(cols).toPandas().sort_values(cols).reset_index(drop=True)
        pb = b.select(cols).toPandas().sort_values(cols).reset_index(drop=True)
        pd.testing.assert_frame_equal(pa, pb)
    urls = set(r["url"] for r in clean.seen.read(spark).select("url").collect())
    assert set(extra.url) <= urls, "extra seeds must actually be crawled"
    assert "https://junk.example.com/x" not in urls


def test_backup_pin_survives_engine_gc(spark, tmp_path):
    """Without the pin, the engine's per-round expire() reclaims the
    backup's recorded base snapshot and every incremental export rolls
    a full generation; with it, the second export is a delta."""
    cfg = SynthConfig(n_seeds=30, n_hosts=3, max_depth=1)
    pol = pd.DataFrame(
        {"host": [host_name(i) for i in range(1, 4)], "budget": [30] * 3}
    )
    eng = CrawlEngine(
        spark, str(tmp_path / "wd"), cfg, politeness_pdf=pol, use_cuckoo=False
    )
    eng.add_seeds(spark.createDataFrame(gen_seeds(cfg)))
    eng.run(max_rounds=3)
    out = str(tmp_path / "bk")
    b1 = backup_table_incremental(eng.images, spark, out)
    assert b1["mode"] == "full"
    eng.run(max_rounds=8)  # several GC'd round commits in between
    b2 = backup_table_incremental(eng.images, spark, out)
    assert b2["mode"] == "delta", "base snapshot was expired despite the pin"
    assert b2["generation"] == b1["generation"]
    # pin compacted to the newest base only
    pins = eng.images._read_pins()[f"backup:{b2['root']}"]
    assert pins == [b2["snapshot"]]
    # restored copy matches the source exactly
    dst = SnapTable(str(tmp_path / "restored"), "images_r")
    dst.commit_empty(eng.images.schema())
    restore_backup_incremental(dst, spark, b2["root"], "image_id")
    a = eng.images.read(spark).selectExpr("image_id", "md5(bytes) h").toPandas()
    b = dst.read(spark).selectExpr("image_id", "md5(bytes) h").toPandas()
    pd.testing.assert_frame_equal(
        a.sort_values("image_id").reset_index(drop=True),
        b.sort_values("image_id").reset_index(drop=True),
    )


def test_restore_skips_orphan_delta_dir(spark, tmp_path):
    """A crashed export leaves a delta dir that STATE.json does not
    claim; restore must replay base + claimed deltas only."""
    src = SnapTable(str(tmp_path / "src"), "t")
    src.append(spark.createDataFrame([("a", 1), ("b", 2)], "id string, v int"))
    out = str(tmp_path / "bk")
    b1 = backup_table_incremental(src, spark, out)
    src.append(spark.createDataFrame([("c", 3)], "id string, v int"))
    b2 = backup_table_incremental(src, spark, out)
    assert b2["mode"] == "delta"
    # orphan: a crashed export wrote delta-1 but died before the STATE
    # replace (STATE still says next_delta=1)
    orphan = os.path.join(b2["root"], f"gen-{b2['generation']}", "delta-1")
    spark.createDataFrame([("orphan", 99)], "id string, v int").write.json(orphan)

    dst = SnapTable(str(tmp_path / "dst"), "t2")
    dst.commit_empty(src.schema())
    n = restore_backup_incremental(dst, spark, b2["root"], "id")
    got = dst.read(spark).toPandas().sort_values("id").reset_index(drop=True)
    assert n == 3 and list(got.id) == ["a", "b", "c"]


def test_ivf_build_on_empty_source(spark, tmp_path):
    """Empty source: build commits an empty index (search → 0 rows);
    the first real data then triggers a normal full train."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("vec_id", T.StringType(), False),
            T.StructField("embedding", T.ArrayType(T.FloatType()), False),
        ]
    )
    src = SnapTable(str(tmp_path / "emb"), "emb")
    src.commit_empty(schema)
    idx = IvfIndex(str(tmp_path / "ivf"), n_cells=4)
    r = idx.build(spark, src)
    assert r.get("empty") is True
    q = spark.createDataFrame(
        [("q0", [1.0] * 8)], "qid string, embedding array<float>"
    )
    assert idx.search(spark, q).count() == 0
    # update() on the empty-built index retrains once data arrives
    vecs = [(f"v{i}", [float(i == j) for j in range(8)]) for i in range(8)]
    src.append(spark.createDataFrame(vecs, schema))
    r2 = idx.update(spark, src)
    assert r2["mode"] == "build" and not r2.get("empty")
    hits = idx.search(spark, q, n_probe=4, top_k=3)
    assert hits.count() == 3
