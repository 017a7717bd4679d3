"""Multimodal (binary image column) operators — the Spark-side plumbing
is real (schema, Arrow batching, partitioning); the codec is the
deterministic synthetic one from codec.py (no image libs in this
environment — a real deployment swaps in PIL/libvips inside the same
mapInPandas stage).

No DuckDB oracles (binary + codec are not SQL-expressible): the driver
records rows-only checks; pixel-level invariants are asserted by
tests/test_engine_golden.py::test_image_row_invariants.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import load_spread

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("image_id", T.StringType(), False),
        T.StructField("w", T.IntegerType(), False),
        T.StructField("h", T.IntegerType(), False),
        T.StructField("fmt", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("phash", T.LongType(), False),
        T.StructField("caption", T.StringType(), False),
    ]
)

CHECK_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("fmt", T.StringType(), False),
        T.StructField("psnr_ok", T.BooleanType(), False),
        T.StructField("caption_ok", T.BooleanType(), False),
    ]
)


def _doc_urls(spark, sf):
    return load_spread(spark, sf, "documents").select(
        "doc_id",
        F.concat(
            F.lit("https://"), F.col("source"), F.lit(".example.com/img/"), F.col("doc_id")
        ).alias("url"),
    )


def images_from_documents(spark, sf):
    """Synthesize the input_hint `images` table (image_id, bytes, w, h,
    fmt, caption, phash) from document-derived URLs; return metadata
    columns (bytes withheld from the comparison output)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if _REPO_ROOT not in sys.path:
            sys.path.insert(0, _REPO_ROOT)
        import uuid

        from crawlspark.codec import synth_image

        for pdf in batches:
            if pdf.empty:
                continue
            # column-wise batch assembly (same shape as fetch.py):
            # building one dict per row and letting pandas infer the
            # frame from 1.5k dicts costs more than the codec's own
            # bookkeeping — lists-per-column is the cheap path.
            urls = pdf["url"].tolist()
            cols: dict = {
                "doc_id": pdf["doc_id"].astype("int64"),
                "image_id": [str(uuid.uuid5(uuid.NAMESPACE_URL, u)) for u in urls],
                "w": [],
                "h": [],
                "fmt": [],
                "n_bytes": [],
                "phash": [],
                "caption": [],
            }
            for url in urls:
                img = synth_image(url)
                cols["w"].append(img["w"])
                cols["h"].append(img["h"])
                cols["fmt"].append(img["fmt"])
                cols["n_bytes"].append(len(img["bytes"]))
                cols["phash"].append(img["phash"])
                cols["caption"].append(img["caption"])
            yield pd.DataFrame(cols, columns=[f.name for f in META_SCHEMA.fields])

    return _doc_urls(spark, sf).mapInPandas(run, META_SCHEMA)


def images_decode_check(spark, sf):
    """Decode round-trip check: encode -> decode -> PSNR >= 40 dB (lossy)
    or exact (lossless), caption equality. One Arrow-batched stage."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if _REPO_ROOT not in sys.path:
            sys.path.insert(0, _REPO_ROOT)
        from crawlspark.codec import decode, psnr, synth_image
        from crawlspark.hashing import py_h60
        from crawlspark.codec import dims_for, pixels_for

        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for doc_id, url in zip(pdf["doc_id"], pdf["url"]):
                img = synth_image(url)
                key = py_h60(url)
                w, h, fmt = dims_for(key)
                original = pixels_for(key, w, h)
                decoded = decode(img["bytes"], img["fmt"])
                p = psnr(original, decoded)
                rows.append(
                    {
                        "doc_id": int(doc_id),
                        "fmt": img["fmt"],
                        "psnr_ok": bool(p >= 40.0 or p == float("inf")),
                        "caption_ok": img["caption"].startswith("synthetic image "),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in CHECK_SCHEMA.fields])

    return _doc_urls(spark, sf).mapInPandas(run, CHECK_SCHEMA)


QUERIES = {
    "images_from_documents": images_from_documents,
    "images_decode_check": images_decode_check,
}

ORACLES: dict[str, str] = {}  # rows-only: codec not SQL-expressible
