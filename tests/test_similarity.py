"""ANN quality gate: the banded multi-probe LSH (4 tables x 6 bits,
Hamming-1 probes) must recover >=90% of the exact brute-force top-k
neighbors for the query slice. This pins the recall that the LSH
parameterization buys — the scale path is only useful if it finds what
brute force finds.
"""

import os

SF = os.environ.get("CRAWLSPARK_TEST_SF", "/root/testdata/sf0.01")


def test_lsh_recall_at_k(spark):
    from crawlspark.ops.similarity import _N_QUERIES, cosine_topk, lsh_ann_topk

    exact = cosine_topk(spark, SF).toPandas()  # qid < _N_QUERIES, exact
    ann = lsh_ann_topk(spark, SF).toPandas()
    ann = ann[ann.qid < _N_QUERIES]

    hits = total = 0
    for qid, grp in exact.groupby("qid"):
        truth = set(grp.nid)
        got = set(ann[ann.qid == qid].nid)
        hits += len(truth & got)
        total += len(truth)
    recall = hits / total
    assert recall >= 0.9, f"recall@k {recall:.2f} < 0.9 ({hits}/{total})"


def test_ivf_kmeans_recall_on_clustered_corpus(spark):
    """Production IVF seeding (k-means over a bounded sample) must keep
    recall@3 >= 0.9 on a CLUSTERED corpus — the case where first-k
    seeding degrades (several of the first k vectors land in the same
    cluster, leaving other clusters unrepresented and n_probe probing
    the wrong cells)."""
    import numpy as np

    from crawlspark.ops.similarity import ivf_kmeans_centroids, ivf_topk

    rng = np.random.default_rng(7)
    n_clusters, per_cluster, dim = 8, 50, 16
    centers = rng.normal(size=(n_clusters, dim)) * 3.0
    pts = np.concatenate(
        [c + rng.normal(size=(per_cluster, dim)) * 0.15 for c in centers]
    )
    # interleave clusters in id order so "first k ids" spans few clusters
    order = np.argsort(rng.random(len(pts)))
    pts = pts[order]
    emb = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(pts)],
        schema="vec_id long, embedding array<float>",
    ).cache()

    n_queries = 5
    cents = ivf_kmeans_centroids(spark, emb, n_cells=8, iters=2, sample_per_cell=32)
    got = ivf_topk(emb, cents, n_queries=n_queries, n_probe=2).toPandas()

    # numpy brute-force truth under the SAME scoring contract as the
    # engine and cosine_topk: cosine rounded to 4 dp (so float summation
    # order can't flip ranks), ties broken by nid ascending
    x = pts.astype(np.float32).astype(np.float64)
    xn = x / np.sqrt((x * x).sum(axis=1, keepdims=True))
    hits = total = 0
    for q in range(n_queries):
        cos = np.round(xn @ xn[q], 4)
        cos[q] = -2.0
        order_q = np.lexsort((np.arange(len(cos)), -cos))
        truth = set(order_q[:3].tolist())
        mine = set(got[got.qid == q].nid.tolist())
        hits += len(truth & mine)
        total += 3
    emb.unpersist()
    recall = hits / total
    assert recall >= 0.9, f"kmeans-IVF recall@3 {recall:.2f} < 0.9"
