"""Persisted IVF index (ops/ivf_index.IvfIndex): bucket-per-cell
physical inverted file, incremental O(delta) maintenance, search that
opens only probed cells' directories."""

from __future__ import annotations

import numpy as np
import pandas as pd

from crawlspark.ops.ivf_index import IvfIndex
from crawlspark.snaptable import SnapTable

SCHEMA = "vec_id long, embedding array<double>"


def _clustered(rng, n_clusters=8, per_cluster=40, dim=16):
    centers = rng.normal(size=(n_clusters, dim)) * 3.0
    pts = np.concatenate(
        [c + rng.normal(size=(per_cluster, dim)) * 0.15 for c in centers]
    )
    return pts[np.argsort(rng.random(len(pts)))]


def _emb_df(spark, pts, start=0):
    return spark.createDataFrame(
        [(start + i, [float(v) for v in row]) for i, row in enumerate(pts)],
        schema=SCHEMA,
    )


def _truth_topk(pts, qid, k=3):
    x = pts.astype(np.float64)
    xn = x / np.sqrt((x * x).sum(axis=1, keepdims=True))
    cos = np.round(xn @ xn[qid], 4)
    cos[qid] = -2.0
    order_q = np.lexsort((np.arange(len(cos)), -cos))
    return set(order_q[:k].tolist())


def test_build_search_recall_and_physical_pruning(spark, tmp_path):
    rng = np.random.default_rng(11)
    pts = _clustered(rng)
    src = SnapTable(str(tmp_path / "emb"))
    src.append(_emb_df(spark, pts))

    idx = IvfIndex(str(tmp_path / "ivf"), n_cells=8)
    idx.build(spark, src)
    # the stored table IS the inverted file: every bucket holds exactly
    # one cell's vectors
    for b in range(8):
        cells = {
            r["cell"] for r in idx.table.read_buckets(spark, [b]).select("cell").distinct().collect()
        }
        assert cells <= {b}

    queries = _emb_df(spark, pts[:5]).selectExpr("vec_id as qid", "embedding")
    got = idx.search(spark, queries, n_probe=2, top_k=3).toPandas()
    hits = total = 0
    for q in range(5):
        truth = _truth_topk(pts, q)
        hits += len(truth & set(got[got.qid == q].nid.tolist()))
        total += 3
    assert hits / total >= 0.9, f"recall {hits/total:.2f}"


def test_incremental_update_equals_full_build(spark, tmp_path):
    """With frozen centroids, build(part) + update(rest) must equal
    build(full) row-for-row — the exactness claim behind the O(delta)
    maintenance path."""
    rng = np.random.default_rng(13)
    pts = _clustered(rng)
    cut = len(pts) * 2 // 3
    src = SnapTable(str(tmp_path / "emb"))
    src.append(_emb_df(spark, pts[:cut]))

    inc = IvfIndex(str(tmp_path / "ivf_inc"), n_cells=8)
    inc.build(spark, src)
    cents = inc.centroids_df(spark)
    src.append(_emb_df(spark, pts[cut:], start=cut))
    r = inc.update(spark, src)
    assert r["mode"] == "update"

    full = IvfIndex(str(tmp_path / "ivf_full"), n_cells=8)
    full.build(spark, src, centroids=cents)

    a = inc.table.read(spark).toPandas().sort_values("vec_id").reset_index(drop=True)
    b = full.table.read(spark).toPandas().sort_values("vec_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a[["vec_id", "cell"]], b[["vec_id", "cell"]])
    assert len(a) == len(pts)

    # identical search results too
    queries = _emb_df(spark, pts[:4]).selectExpr("vec_id as qid", "embedding")
    ga = inc.search(spark, queries, n_probe=3).toPandas().sort_values(["qid", "rank"])
    gb = full.search(spark, queries, n_probe=3).toPandas().sort_values(["qid", "rank"])
    pd.testing.assert_frame_equal(ga.reset_index(drop=True), gb.reset_index(drop=True))

    # no-change update is a meta no-op that still advances the base
    r2 = inc.update(spark, src)
    assert r2["mode"] == "update"
    assert inc.table.read(spark).count() == len(pts)


def test_update_falls_back_to_rebuild_on_rewrite(spark, tmp_path):
    rng = np.random.default_rng(17)
    pts = _clustered(rng, n_clusters=4, per_cluster=20)
    src = SnapTable(str(tmp_path / "emb"))
    src.append(_emb_df(spark, pts))
    idx = IvfIndex(str(tmp_path / "ivf"), n_cells=4)
    idx.build(spark, src)
    # overwrite breaks the append-diff chain → update must rebuild
    keep = _emb_df(spark, pts[:40])
    src.overwrite(keep)
    r = idx.update(spark, src)
    assert r["mode"] == "build"
    assert idx.table.read(spark).count() == 40


def test_quantized_index_recall_and_storage(spark, tmp_path):
    """quantize=True stores int8 codes + scale instead of fp32 vectors;
    search dequantizes probed candidates and recall matches the fp32
    index; incremental updates inherit the storage form."""
    rng = np.random.default_rng(17)
    pts = _clustered(rng)
    cut = len(pts) * 2 // 3
    src = SnapTable(str(tmp_path / "emb"))
    src.append(_emb_df(spark, pts[:cut]))

    idx = IvfIndex(str(tmp_path / "ivf_q"), n_cells=8)
    idx.build(spark, src, quantize=True)
    stored = idx.table.read_buckets(spark, list(range(8)))
    assert set(stored.columns) == {"vec_id", "cell", "q", "scale"}
    assert dict(stored.dtypes)["q"] == "array<tinyint>"

    # updates keep the quantized form (sticky via manifest meta)
    src.append(_emb_df(spark, pts[cut:], start=cut))
    r = idx.update(spark, src)
    assert r["mode"] == "update"
    stored = idx.table.read_buckets(spark, list(range(8)))
    assert stored.count() == len(pts)
    assert set(stored.columns) == {"vec_id", "cell", "q", "scale"}

    queries = _emb_df(spark, pts[:5]).selectExpr("vec_id as qid", "embedding")
    got = idx.search(spark, queries, n_probe=2, top_k=3).toPandas()
    hits = total = 0
    for q in range(5):
        truth = _truth_topk(pts, q)
        hits += len(truth & set(got[got.qid == q].nid.tolist()))
        total += 3
    assert hits / total >= 0.9, f"quantized recall {hits/total:.2f}"
