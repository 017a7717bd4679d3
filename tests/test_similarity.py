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
