"""Focused tests for the round-6 optimization internals.

Each optimization claims bit-identical results through a changed
computation; these tests pin the equivalences directly (the oracle
sweep pins them end-to-end).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------- codec
@pytest.mark.parametrize("scale_urls", [range(0, 60)])
def test_synth_phash_matches_decoded_roundtrip(scale_urls):
    """synth_image's sjpg phash shortcut (algebraic dequantization, no
    zlib round trip) must equal phash over the actually decoded bytes
    for every format."""
    from crawlspark.codec import decode, phash, synth_image

    for i in scale_urls:
        url = f"https://h{i % 7 + 1}.example.com/img/{i}?p={i % 13}"
        img = synth_image(url)
        assert img["phash"] == phash(decode(img["bytes"], img["fmt"])), url


def test_sjpg_dequant_clamp_never_fires():
    """The uint8 dequantization path is exact because q*Q + Q//2 <= 254:
    verify against the definitional int64+clamp form on dense input."""
    from crawlspark.codec import _LOSSY_Q

    q = np.arange(256 // _LOSSY_Q, dtype=np.uint8)  # every possible code
    fast = q * np.uint8(_LOSSY_Q) + np.uint8(_LOSSY_Q // 2)
    slow = np.minimum(q.astype(np.int64) * _LOSSY_Q + _LOSSY_Q // 2, 255).astype(
        np.uint8
    )
    assert np.array_equal(fast, slow)


# ------------------------------------------- hamming first-band emission
def _brute_pairs(sig_rows, tau):
    out = set()
    for i, (ai, alo, ahi) in enumerate(sig_rows):
        for aj, blo, bhi in sig_rows[i + 1 :]:
            ham = bin((alo ^ blo) & 0xFFFFFFFF).count("1") + bin(
                (ahi ^ bhi) & 0xFFFFFFFF
            ).count("1")
            if ham <= tau:
                out.add((min(ai, aj), max(ai, aj), ham))
    return out


@pytest.mark.parametrize("tau,n_bands", [(3, None), (2, None), (3, 8), (7, 8)])
def test_hamming_near_dup_unique_and_exact(spark, tau, n_bands):
    """First-band emission must (a) produce every pair exactly once —
    the former output .distinct() was dropped on that argument — and
    (b) match the brute-force pair set, on a corpus with heavy
    duplicate clusters (many sigs agreeing on every band)."""
    from crawlspark.ops.dedup import hamming_near_dup

    rng = np.random.default_rng(7)
    rows = []
    base = [int(rng.integers(0, 1 << 32)) for _ in range(6)], [
        int(rng.integers(0, 1 << 32)) for _ in range(6)
    ]
    rid = 0
    for c in range(6):  # 6 clusters, sizes 1..12, near-identical members
        size = 1 + 2 * c
        lo0, hi0 = base[0][c], base[1][c]
        for m in range(size):
            lo, hi = lo0, hi0
            for _ in range(int(rng.integers(0, 3))):  # flip 0-2 bits
                b = int(rng.integers(0, 64))
                if b < 32:
                    lo ^= 1 << b
                else:
                    hi ^= 1 << (b - 32)
            rows.append((rid, lo, hi))
            rid += 1
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "lo", "hi"]),
        schema="doc_id long, lo long, hi long",
    )
    got = hamming_near_dup(df, "doc_id", "lo", "hi", tau=tau, n_bands=n_bands)
    pdf = got.toPandas()
    # (a) exactly-once emission: no duplicate (left,right) rows at all
    assert not pdf.duplicated(subset=["left_id", "right_id"]).any()
    # (b) exact pair set vs brute force
    got_set = {
        (int(r.left_id), int(r.right_id), int(r.hamming)) for r in pdf.itertuples()
    }
    assert got_set == _brute_pairs(rows, tau)


# ------------------------------------------------- token_stats identity
def test_avg_token_len_identity_edge_cases(spark):
    """length(text) - (n_tokens - 1) == sum(length(token)) for split on
    a single space — including empty strings, leading/trailing and
    consecutive separators."""
    texts = ["", "a", "a b", "a  b", " a b ", "ab  ", "  ", "x y z w"]
    df = spark.createDataFrame([(t,) for t in texts], schema="text string")
    w = F.split("text", " ")
    out = df.select(
        F.aggregate(w, F.lit(0).cast("double"), lambda acc, x: acc + F.length(x)).alias(
            "fold"
        ),
        (F.length("text") - F.size(w) + F.lit(1)).cast("double").alias("identity"),
    ).toPandas()
    assert (out["fold"] == out["identity"]).all()


# ------------------------------------- minhash distinct-drop equivalence
def test_minhash_min_duplicate_insensitive(spark):
    """min(md5(i|shingle)) over a multiset equals min over the distinct
    set — the argument for dropping the (doc_id, shingle) distinct."""
    rows = [(1, "a b c"), (1, "a b c"), (1, "z z z"), (2, "a b c")]
    df = spark.createDataFrame(rows, schema="doc_id long, shingle string")
    with_dups = df.groupBy("doc_id").agg(
        F.min(F.md5(F.concat(F.lit("0|"), "shingle"))).alias("mh")
    )
    no_dups = (
        df.distinct()
        .groupBy("doc_id")
        .agg(F.min(F.md5(F.concat(F.lit("0|"), "shingle"))).alias("mh"))
    )
    a = {(r.doc_id, r.mh) for r in with_dups.collect()}
    b = {(r.doc_id, r.mh) for r in no_dups.collect()}
    assert a == b
