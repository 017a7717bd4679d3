"""Image transformation operators over the binary image column: resize /
thumbnail, feature-extraction into the ANN embedding space, and
frame-sampling of multi-frame (video stand-in) blobs.

These complete the multimodal surface next to ops/multimodal.py's
synth/decode-check: the reference stores fetched assets as opaque bytes
(contentful/backup/ContentfulBackup.java:147-208) and leaves all pixel
work to consumers; a training-data pipeline needs the consumer side
too. All pixel math is numpy-vectorized per image inside Arrow-batched
``mapInPandas`` stages (never per-row Python in a plan), and every
stage is embarrassingly parallel over rows — at 10^10 images each task
decodes only its own Arrow batches, there is no shuffle at all until an
(optional) downstream agg/join, so the ops scale linearly with
executors.

No DuckDB oracles (codecs are not SQL-expressible): the driver records
rows-only checks; pixel-level semantics are pinned by
tests/test_imageops.py against direct numpy references.
"""

from __future__ import annotations

import os
import struct
import sys
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import load_spread

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_THUMB = 32  # thumbnail side; 32 keeps codec.phash's 32x32 block-mean exact
_EMBED_GRID = 8  # 8x8 grayscale grid -> dim-64 embeddings (same dim as
# the embeddings table, so the hyperplane-LSH/IVF ops apply unchanged)
_FRAME_STRIDE = 2
_FRAME_SIDE = 32
_N_QUERIES = 5


def _ensure_repo_path() -> None:
    if _REPO_ROOT not in sys.path:
        sys.path.insert(0, _REPO_ROOT)


def _doc_urls(spark, sf):
    return load_spread(spark, sf, "documents").select(
        "doc_id",
        F.concat(
            F.lit("https://"), F.col("source"), F.lit(".example.com/img/"), F.col("doc_id")
        ).alias("url"),
    )


# ------------------------------------------------------------------ resize
def resize_area(px, tw: int, th: int):
    """Vectorized resize of an (h, w, 3) or (h, w) uint8 image to the
    target size (channel axis preserved).

    Exact block-mean (area average) when the source divides the target
    evenly — the common thumbnail path for this codec's 32/64/128-px
    sizes — else separable bilinear with edge clamping. Pure numpy; no
    Python loops over pixels.
    """
    import numpy as np

    flat = px.ndim == 2
    if flat:
        px = px[:, :, None]
    h, w, ch = px.shape
    if h == th and w == tw:
        out = px.copy()
        return out[:, :, 0] if flat else out
    if h % th == 0 and w % tw == 0:
        small = px.reshape(th, h // th, tw, w // tw, ch).mean(axis=(1, 3))
        out = np.clip(np.rint(small), 0, 255).astype(np.uint8)
        return out[:, :, 0] if flat else out
    # bilinear: sample centers mapped into source coordinates
    ys = (np.arange(th) + 0.5) * (h / th) - 0.5
    xs = (np.arange(tw) + 0.5) * (w / tw) - 0.5
    y0 = np.clip(np.floor(ys).astype(np.int64), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(np.int64), 0, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = np.clip(ys - y0, 0.0, 1.0)[:, None, None]
    wx = np.clip(xs - x0, 0.0, 1.0)[None, :, None]
    p = px.astype(np.float64)
    top = p[y0][:, x0] * (1 - wx) + p[y0][:, x1] * wx
    bot = p[y1][:, x0] * (1 - wx) + p[y1][:, x1] * wx
    out = np.clip(np.rint(top * (1 - wy) + bot * wy), 0, 255).astype(np.uint8)
    return out[:, :, 0] if flat else out


THUMB_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("src_w", T.IntegerType(), False),
        T.StructField("src_h", T.IntegerType(), False),
        T.StructField("thumb_w", T.IntegerType(), False),
        T.StructField("thumb_h", T.IntegerType(), False),
        T.StructField("thumb_n_bytes", T.IntegerType(), False),
        T.StructField("thumb_phash", T.LongType(), False),
    ]
)


def images_thumbnail(spark, sf):
    """Decode -> area-resize to 32x32 -> re-encode (png) -> thumbnail
    phash. One Arrow-batched stage, no shuffle; the thumbnail table is
    the standard input to the Hamming near-dup join (dedup.py
    hamming_near_dup via split_phash64)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        _ensure_repo_path()
        from crawlspark.codec import decode, encode_png, phash, synth_image

        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for doc_id, url in zip(pdf["doc_id"], pdf["url"]):
                img = synth_image(url)
                px = decode(img["bytes"], img["fmt"])
                thumb = resize_area(px, _THUMB, _THUMB)
                data = encode_png(thumb)
                rows.append(
                    {
                        "doc_id": int(doc_id),
                        "src_w": img["w"],
                        "src_h": img["h"],
                        "thumb_w": _THUMB,
                        "thumb_h": _THUMB,
                        "thumb_n_bytes": len(data),
                        "thumb_phash": phash(thumb),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in THUMB_SCHEMA.fields])

    return _doc_urls(spark, sf).mapInPandas(run, THUMB_SCHEMA)


# ----------------------------------------------------------- feature embed
def embed_pixels(px):
    """Dim-64 image embedding: 8x8 block-mean grayscale grid, centered
    and L2-normalized (float32). Deterministic, vectorized, and robust
    to the codec's lossy quantization — a stand-in for a CNN/CLIP
    encoder with the same Spark-side shape (binary -> array<float>)."""
    import numpy as np

    gray = np.clip(np.rint(px.astype(np.float64).mean(axis=-1)), 0, 255).astype(np.uint8)
    grid = resize_area(gray, _EMBED_GRID, _EMBED_GRID).astype(np.float64)
    v = grid.flatten()
    v = v - v.mean()
    n = float(np.sqrt((v * v).sum()))
    if n > 0:
        v = v / n
    else:
        # solid-color image: zero vector would make every cosine 0/0
        # (NaN scores, nondeterministic ranks downstream) — map all
        # solids to a fixed basis direction instead.
        v = np.zeros(_EMBED_GRID * _EMBED_GRID)
        v[0] = 1.0
    return v.astype(np.float32)


EMBED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("embedding", T.ArrayType(T.FloatType(), False), False),
    ]
)


def _image_embeddings(spark, sf):
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        _ensure_repo_path()
        from crawlspark.codec import decode, synth_image

        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for doc_id, url in zip(pdf["doc_id"], pdf["url"]):
                img = synth_image(url)
                px = decode(img["bytes"], img["fmt"])
                rows.append({"doc_id": int(doc_id), "embedding": embed_pixels(px).tolist()})
            yield pd.DataFrame(rows, columns=["doc_id", "embedding"])

    return _doc_urls(spark, sf).mapInPandas(run, EMBED_SCHEMA)


ENGINE_EMBED_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.StringType(), False),
        T.StructField("embedding", T.ArrayType(T.FloatType(), False), False),
    ]
)


def embed_images(images_df):
    """Embed CRAWLED images (the engine's images table: image_id string,
    bytes, fmt) into the shared dim-64 ANN space — decode the STORED
    bytes (no re-fetch) and run embed_pixels per image. Shuffle-free
    Arrow stage; CrawlEngine.publish_ann_index feeds the result to the
    persisted IvfIndex, typically over only the round's delta rows."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        _ensure_repo_path()
        from crawlspark.codec import decode

        for pdf in batches:
            if pdf.empty:
                continue
            rows = [
                {
                    "vec_id": i,
                    "embedding": embed_pixels(decode(b, f)).tolist(),
                }
                for i, b, f in zip(pdf["image_id"], pdf["bytes"], pdf["fmt"])
            ]
            yield pd.DataFrame(rows, columns=["vec_id", "embedding"])

    return images_df.select("image_id", "bytes", "fmt").mapInPandas(
        run, ENGINE_EMBED_SCHEMA
    )


def image_embed(spark, sf):
    """Gate view of the embedding extractor: array serialized to a
    rounded CSV string so the driver's sort-based compare can handle it
    (arrays in gate outputs are a hard failure, check_oracles.py:31)."""
    emb = _image_embeddings(spark, sf)
    return emb.select(
        "doc_id",
        F.array_join(
            # format_string, NOT format_number: the latter inserts
            # thousands-separator commas for |x|>=1000 — the same char
            # as the join delimiter (safe today only because embeddings
            # are unit-normalized; don't rely on it).
            F.transform("embedding", lambda x: F.format_string("%.4f", x.cast("double"))), ","
        ).alias("emb_csv"),
    )


def image_ann_topk(spark, sf):
    """Cosine top-k over IMAGE embeddings ("most visually similar
    images"): the feature-extraction front-end bolted onto the same
    broadcast-queries x candidates top-k shape as similarity.cosine_topk.
    At scale the LSH/IVF bucketed variants apply unchanged — the
    embedding column has the same (array<float>, dim 64) type as the
    embeddings table, which is the point of the shared dimension."""
    from .similarity import _score_topk

    emb = _image_embeddings(spark, sf).cache()  # read twice: queries + candidates
    q = emb.filter(F.col("doc_id") < _N_QUERIES).select(
        F.col("doc_id").alias("qid"), F.col("embedding").alias("qv")
    )
    c = emb.select(F.col("doc_id").alias("nid"), F.col("embedding").alias("nv"))
    pairs = F.broadcast(q).crossJoin(c).filter(F.col("qid") != F.col("nid"))
    return _score_topk(pairs)


# --------------------------------------------------- image near-dup keepers
_TWIN_EVERY = 10
# high-bit offset so twin ids can never collide with real doc_ids (doc
# counts scale with sf — 1e6 would overlap once the corpus passes 1e6
# rows); thumb_signatures asserts doc_id < _TWIN_OFFSET per batch.
_TWIN_OFFSET = 1 << 40

SIG_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("thumb_phash", T.LongType(), False),
    ]
)


def thumb_signatures(spark, sf, twin_every: int = 0):
    """(doc_id, thumb_phash) per image: decode -> 32x32 area thumbnail
    -> pHash, one shuffle-free Arrow stage. With twin_every > 0, every
    twin_every-th doc also emits a NEAR-DUPLICATE twin (deterministic
    ±2 pixel noise, id + _TWIN_OFFSET) — the lossy-recompression copy a
    real crawl encounters, so the dedup gate exercises non-empty
    clusters on otherwise all-distinct synthetic images."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        _ensure_repo_path()
        import numpy as np

        from crawlspark.codec import decode, phash, synth_image

        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for doc_id, url in zip(pdf["doc_id"], pdf["url"]):
                assert int(doc_id) < _TWIN_OFFSET, "doc_id overlaps twin-id space"
                img = synth_image(url)
                px = decode(img["bytes"], img["fmt"])
                rows.append(
                    {"doc_id": int(doc_id), "thumb_phash": phash(resize_area(px, _THUMB, _THUMB))}
                )
                if twin_every and int(doc_id) % twin_every == 0:
                    rng = np.random.default_rng(int(doc_id))
                    near = np.clip(
                        px.astype(np.int32) + rng.integers(-2, 3, size=px.shape), 0, 255
                    ).astype(np.uint8)
                    rows.append(
                        {
                            "doc_id": int(doc_id) + _TWIN_OFFSET,
                            "thumb_phash": phash(resize_area(near, _THUMB, _THUMB)),
                        }
                    )
            yield pd.DataFrame(rows, columns=["doc_id", "thumb_phash"])

    return _doc_urls(spark, sf).mapInPandas(run, SIG_SCHEMA)


def images_near_dup_keepers(spark, sf):
    """End-to-end image dedup: thumbnail pHash -> banded Hamming
    near-dup join (tau=2: after a 32x32 area resize, lossy-codec noise
    moves the DCT hash by at most a bit or two while distinct images
    stay ~32 bits apart) -> one-agg keeper map, the same reduction as
    embedding_near_dup (no iterative connected components: v keeps
    min(v, min neighbor), which at crawl scale collapses the dominant
    duplicate pattern — exact/near-copies of one original — in a
    single shuffle). Every 10th image carries an injected perturbed
    twin so the gate's clusters are non-empty (see thumb_signatures)."""
    from .dedup import hamming_near_dup, split_phash64

    thumbs = thumb_signatures(spark, sf, twin_every=_TWIN_EVERY).cache()
    sig = split_phash64(thumbs, "thumb_phash")
    pairs = hamming_near_dup(sig, "doc_id", "phash_lo", "phash_hi", tau=2)
    return keeper_map(pairs, "doc_id")


def keeper_map(pairs, id_col: str):
    """One-agg keeper reduction over (left_id, right_id) duplicate
    pairs: each id keeps min(self, min neighbor). Output one row per id
    that HAS a duplicate: (id_col, keeper_id, n_dups)."""
    edges = pairs.select(F.col("left_id").alias("v"), F.col("right_id").alias("o")).unionByName(
        pairs.select(F.col("right_id").alias("v"), F.col("left_id").alias("o"))
    )
    return (
        edges.groupBy("v")
        .agg(F.min("o").alias("mo"), F.count("*").alias("n_dups"))
        .select(
            F.col("v").alias(id_col),
            F.least(F.col("mo"), F.col("v")).alias("keeper_id"),
            "n_dups",
        )
    )


# ------------------------------------------------------------ image quality
def quality_stats(px) -> dict:
    """Training-data curation stats for one decoded image, all
    vectorized: Shannon entropy of the gray histogram (bits), Laplacian
    variance (the classic sharpness/blur score), RMS contrast. A solid
    color scores 0 on all three."""
    import numpy as np

    gray = px.astype(np.float64).mean(axis=-1)
    hist = np.bincount(
        np.clip(np.rint(gray), 0, 255).astype(np.int64).ravel(), minlength=256
    )
    p = hist[hist > 0] / gray.size
    entropy = float(-(p * np.log2(p)).sum())
    lap = (
        -4.0 * gray[1:-1, 1:-1]
        + gray[:-2, 1:-1]
        + gray[2:, 1:-1]
        + gray[1:-1, :-2]
        + gray[1:-1, 2:]
    )
    return {
        "entropy": round(entropy, 4),
        "laplacian_var": round(float(lap.var()), 4),
        "contrast": round(float(gray.std()), 4),
    }


QUALITY_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("entropy", T.DoubleType(), False),
        T.StructField("laplacian_var", T.DoubleType(), False),
        T.StructField("contrast", T.DoubleType(), False),
        T.StructField("is_lowq", T.BooleanType(), False),
    ]
)

_MIN_ENTROPY = 1.0  # near-solid / synthetic filler
_MIN_LAP_VAR = 25.0  # blur: Laplacian variance below this = soft image


def image_quality(spark, sf):
    """Per-image curation scores + the low-quality flag a 100 TB
    pipeline filters on before paying for captioning/embedding. One
    shuffle-free Arrow stage; thresholds are the standard
    entropy/blur-variance heuristics (public Laplacian-variance focus
    measure), applied identically everywhere so the flag is
    deterministic."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        _ensure_repo_path()
        from crawlspark.codec import decode, synth_image

        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for doc_id, url in zip(pdf["doc_id"], pdf["url"]):
                img = synth_image(url)
                q = quality_stats(decode(img["bytes"], img["fmt"]))
                rows.append(
                    {
                        "doc_id": int(doc_id),
                        **q,
                        "is_lowq": q["entropy"] < _MIN_ENTROPY
                        or q["laplacian_var"] < _MIN_LAP_VAR,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in QUALITY_SCHEMA.fields])

    return _doc_urls(spark, sf).mapInPandas(run, QUALITY_SCHEMA)


# ------------------------------------------------------------ frame sample
def synth_video(key: int) -> bytes:
    """Deterministic multi-frame blob (video stand-in): ``SVID`` magic +
    frame count + length-prefixed encoded PNG frames. Frame f's pixels
    derive from key + f * 0x9E3779B9 so frames differ but are exactly
    reproducible for the parity test."""
    _ensure_repo_path()
    from crawlspark.codec import encode_png, pixels_for

    n_frames = 4 + key % 5
    parts = [b"SVID", struct.pack(">I", n_frames)]
    for f in range(n_frames):
        data = encode_png(pixels_for((key + f * 0x9E3779B9) & ((1 << 60) - 1), _FRAME_SIDE, _FRAME_SIDE))
        parts.append(struct.pack(">I", len(data)))
        parts.append(data)
    return b"".join(parts)


def iter_frames(blob: bytes):
    """Yield (frame_idx, encoded_png_bytes) from a SVID container."""
    assert blob[:4] == b"SVID", "not an SVID blob"
    (n_frames,) = struct.unpack(">I", blob[4:8])
    pos = 8
    for f in range(n_frames):
        (length,) = struct.unpack(">I", blob[pos : pos + 4])
        yield f, blob[pos + 4 : pos + 4 + length]
        pos += 4 + length


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("n_frames", T.IntegerType(), False),
        T.StructField("frame_phash", T.LongType(), False),
        T.StructField("mean_luma", T.DoubleType(), False),
    ]
)


def frames_sample(spark, sf):
    """Sample every ``_FRAME_STRIDE``-th frame of each document's video
    blob and decode only the sampled frames (the skip is free: frames
    are length-prefixed, so unsampled ones are never decompressed —
    exactly how a real container/codec keyframe sampler saves work).
    Output is one row per sampled frame; downstream dedup/ANN treat
    frames as images."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        _ensure_repo_path()
        import numpy as np

        from crawlspark.codec import decode_png, phash
        from crawlspark.hashing import py_h60

        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for doc_id, url in zip(pdf["doc_id"], pdf["url"]):
                blob = synth_video(py_h60(url))
                (n_frames,) = struct.unpack(">I", blob[4:8])
                for f, data in iter_frames(blob):
                    if f % _FRAME_STRIDE != 0:
                        continue
                    px = decode_png(data)
                    rows.append(
                        {
                            "doc_id": int(doc_id),
                            "frame_idx": f,
                            "n_frames": n_frames,
                            "frame_phash": phash(px),
                            "mean_luma": round(float(np.mean(px)), 4),
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in FRAME_SCHEMA.fields])

    return _doc_urls(spark, sf).mapInPandas(run, FRAME_SCHEMA)


QUERIES = {
    "images_thumbnail": images_thumbnail,
    "image_embed": image_embed,
    "image_ann_topk": image_ann_topk,
    "images_near_dup_keepers": images_near_dup_keepers,
    "image_quality": image_quality,
    "frames_sample": frames_sample,
}

ORACLES: dict[str, str] = {}  # rows-only: codec not SQL-expressible
