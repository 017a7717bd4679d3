"""Caption-image alignment scoring — dual-encoder curation for
image+caption training pairs.

A web-scale image-caption corpus (the engine's images table:
image_id, bytes, fmt, caption — BASELINE input_hint shape) is curated
by scoring how well each caption describes its image and dropping
low-scoring pairs (the CLIP-score filter of public LAION-style
pipelines). The real scorer is a trained dual encoder; no ML runtime
exists in this container, so the two towers are CLEARLY-MARKED
deterministic stand-ins with the production Spark shape kept real:

* image tower — :func:`crawlspark.ops.imageops.embed_pixels` (dim-64
  block-mean grid), decoding the STORED bytes,
* text tower — :func:`embed_caption_hashed`: signed feature hashing of
  character 3-grams into the same dim-64 space (Weinberger et al.'s
  hashing trick), L2-normalized.

Both towers are injectable (``image_encoder=`` / ``caption_encoder=``)
so a real model drops in without touching the plan, and the tests
inject a perfect encoder to prove the filter separates matched from
mismatched pairs end-to-end.

Scale shape: ONE Arrow ``mapInPandas`` stage — decode + both towers +
cosine per batch, no shuffle at all; the optional threshold filter is
a codegen comparison on the score column. At 10^10 rows this is
embarrassingly parallel and I/O-bound on the bytes column, exactly
like a GPU-backed scorer would be (swap the batch fn, keep the plan).
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

from .imageops import _ensure_repo_path, embed_pixels

_DIM = 64


def embed_caption_hashed(captions: "pd.Series") -> np.ndarray:
    """Deterministic text tower stand-in: signed char-3-gram feature
    hashing into dim-64, L2-normalized float32 — (n, 64) for a batch.

    md5 (stable across processes/platforms, unlike Python's seeded
    ``hash``) picks the bucket from the low bytes and the sign from the
    next bit. Empty/degenerate captions map to a fixed basis vector,
    mirroring embed_pixels' solid-image guard."""
    out = np.zeros((len(captions), _DIM), dtype=np.float64)
    for i, cap in enumerate(captions):
        s = (cap or "").lower()
        for j in range(max(0, len(s) - 2)):
            d = hashlib.md5(s[j : j + 3].encode()).digest()
            bucket = d[0] % _DIM
            sign = 1.0 if d[1] & 1 else -1.0
            out[i, bucket] += sign
        n = float(np.sqrt((out[i] * out[i]).sum()))
        if n > 0:
            out[i] /= n
        else:
            out[i, 0] = 1.0
    return out.astype(np.float32)


ALIGN_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("caption", T.StringType(), False),
        T.StructField("score", T.FloatType(), False),
    ]
)


def caption_image_alignment(
    images_df: DataFrame,
    caption_encoder: Callable[[pd.Series], np.ndarray] = embed_caption_hashed,
    image_encoder=None,
) -> DataFrame:
    """Score (image, caption) pairs: cosine(text tower, image tower).

    ``images_df`` needs (image_id, bytes, fmt, caption) — the engine's
    images table schema. Returns (image_id, caption, score); compose
    with ``.filter(F.col("score") >= tau)`` for the curation cut (the
    filter stays JVM-side on the materialized score column).
    """
    img_enc = image_encoder

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        _ensure_repo_path()
        from crawlspark.codec import decode

        for pdf in batches:
            if pdf.empty:
                continue
            if img_enc is None:
                img = np.stack(
                    [
                        embed_pixels(decode(b, f))
                        for b, f in zip(pdf["bytes"], pdf["fmt"])
                    ]
                )
            else:
                img = img_enc(pdf)
            txt = caption_encoder(pdf["caption"])
            # both towers emit unit vectors -> cosine is the row dot
            score = (img.astype(np.float64) * txt.astype(np.float64)).sum(axis=1)
            yield pd.DataFrame(
                {
                    "image_id": pdf["image_id"].astype(str),
                    "caption": pdf["caption"],
                    "score": np.clip(score, -1.0, 1.0).astype(np.float32),
                }
            )

    return images_df.select("image_id", "bytes", "fmt", "caption").mapInPandas(
        run, ALIGN_SCHEMA
    )


def alignment_stats(scored: DataFrame, tau: float) -> DataFrame:
    """One-pass corpus curation report: count, kept-at-tau, mean and
    decile scores — partial-aggregated, single reduce to one row."""
    return scored.agg(
        F.count("*").alias("n_pairs"),
        F.sum((F.col("score") >= tau).cast("long")).alias("n_kept"),
        F.round(F.avg("score"), 6).alias("mean_score"),
        F.round(F.expr("percentile_approx(score, 0.1)"), 6).alias("p10"),
        F.round(F.expr("percentile_approx(score, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile_approx(score, 0.9)"), 6).alias("p90"),
    )


def caption_alignment(spark, sf) -> DataFrame:
    """Gate (rows-only; codec + hash towers are not SQL-expressible):
    score the synthetic image+caption pairs derived from `documents`,
    exactly the images_from_documents fixture."""
    from .imageops import _doc_urls

    def synth_pairs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        _ensure_repo_path()
        from crawlspark.codec import synth_image

        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for doc_id, url in zip(pdf["doc_id"], pdf["url"]):
                img = synth_image(url)
                rows.append(
                    {
                        "image_id": str(doc_id),
                        "bytes": img["bytes"],
                        "fmt": img["fmt"],
                        "caption": img["caption"],
                    }
                )
            yield pd.DataFrame(rows, columns=["image_id", "bytes", "fmt", "caption"])

    pairs_schema = T.StructType(
        [
            T.StructField("image_id", T.StringType(), False),
            T.StructField("bytes", T.BinaryType(), False),
            T.StructField("fmt", T.StringType(), False),
            T.StructField("caption", T.StringType(), False),
        ]
    )
    pairs = _doc_urls(spark, sf).mapInPandas(synth_pairs, pairs_schema)
    return caption_image_alignment(pairs).select(
        "image_id", "caption", F.round("score", 4).alias("score")
    )


QUERIES = {"caption_alignment": caption_alignment}
ORACLES: dict[str, str] = {}
