"""Pixel-level semantics of the image ops (resize, embed, frame-sample)
pinned against direct numpy references, plus the Spark plumbing run
end-to-end at sf0.001.
"""

import struct

import numpy as np

from crawlspark import codec
from crawlspark.hashing import py_h60
from crawlspark.ops.imageops import (
    _FRAME_STRIDE,
    embed_pixels,
    frames_sample,
    image_ann_topk,
    images_thumbnail,
    iter_frames,
    resize_area,
    synth_video,
)

SF = "/root/testdata/sf0.001"


# ------------------------------------------------------------- resize math
def test_resize_solid_stays_solid():
    px = np.full((64, 128, 3), 137, dtype=np.uint8)
    out = resize_area(px, 32, 32)
    assert out.shape == (32, 32, 3)
    assert (out == 137).all()


def test_resize_identity():
    px = codec.pixels_for(4242, 64, 64)
    assert (resize_area(px, 64, 64) == px).all()


def test_resize_blockmean_matches_numpy_reference():
    px = codec.pixels_for(777, 128, 64)  # w=128, h=64
    out = resize_area(px, 32, 32)
    ref = np.clip(
        np.rint(px.reshape(32, 2, 32, 4, 3).mean(axis=(1, 3))), 0, 255
    ).astype(np.uint8)
    assert (out == ref).all()


def test_resize_bilinear_path_and_grayscale():
    px = codec.pixels_for(555, 64, 64)
    out = resize_area(px, 48, 48)  # 64 % 48 != 0 -> bilinear
    assert out.shape == (48, 48, 3) and out.dtype == np.uint8
    gray = px.mean(axis=-1).astype(np.uint8)
    g = resize_area(gray, 16, 16)
    assert g.shape == (16, 16) and g.dtype == np.uint8


def test_resize_upsample_solid():
    px = np.full((16, 16, 3), 9, dtype=np.uint8)
    out = resize_area(px, 40, 40)  # upsample, bilinear path
    assert out.shape == (40, 40, 3) and (out == 9).all()


# --------------------------------------------------------------- embedding
def test_embed_unit_norm_and_noise_robust():
    base = codec.pixels_for(31337, 64, 64)
    v = embed_pixels(base)
    assert v.shape == (64,) and v.dtype == np.float32
    assert abs(float((v.astype(np.float64) ** 2).sum()) - 1.0) < 1e-6
    rng = np.random.default_rng(3)
    noisy = np.clip(
        base.astype(np.int32) + rng.integers(-2, 3, size=base.shape), 0, 255
    ).astype(np.uint8)
    cos = float(np.dot(embed_pixels(noisy).astype(np.float64), v.astype(np.float64)))
    assert cos > 0.99, f"embedding not robust to tiny noise: cos={cos}"
    other = embed_pixels(codec.pixels_for(99991, 64, 64))
    cos_other = float(np.dot(other.astype(np.float64), v.astype(np.float64)))
    assert cos_other < cos, "unrelated image as close as a perturbed copy"


def test_embed_solid_color_unit_norm():
    # a constant image must NOT produce a zero vector (NaN cosines):
    # all solids map to a fixed basis direction, still unit-norm.
    v = embed_pixels(np.full((64, 64, 3), 42, dtype=np.uint8))
    assert abs(float((v.astype(np.float64) ** 2).sum()) - 1.0) < 1e-6
    assert v[0] == 1.0 and not np.isnan(v).any()


# ----------------------------------------------------------- image quality
def test_quality_stats_solid_vs_textured():
    from crawlspark.ops.imageops import quality_stats

    solid = quality_stats(np.full((64, 64, 3), 99, dtype=np.uint8))
    assert solid["entropy"] == 0.0
    assert solid["laplacian_var"] == 0.0
    assert solid["contrast"] == 0.0
    textured = quality_stats(codec.pixels_for(31337, 64, 64))
    assert textured["entropy"] > 4.0
    assert textured["laplacian_var"] > 25.0
    assert textured["contrast"] > 10.0


def test_quality_blur_detects_smoothing():
    """Box-blurring an image must strictly reduce the Laplacian
    variance (the focus measure's defining property)."""
    from crawlspark.ops.imageops import quality_stats

    px = codec.pixels_for(2718, 64, 64)
    # 4x4 box blur via the exact area-resize down/up
    blurred = resize_area(resize_area(px, 16, 16), 64, 64)
    sharp = quality_stats(px)["laplacian_var"]
    soft = quality_stats(blurred)["laplacian_var"]
    assert soft < sharp * 0.5, (sharp, soft)


def test_image_quality_spark_stage(spark):
    from crawlspark.ops.imageops import image_quality

    out = image_quality(spark, SF).toPandas()
    assert len(out) > 0
    # codec images are textured interference patterns: none are low-q
    assert not out["is_lowq"].any()
    assert (out["entropy"] > 0).all()


# ------------------------------------------------------------- video blobs
def test_synth_video_roundtrip():
    key = py_h60("https://h1.example.com/img/7")
    blob = synth_video(key)
    (n,) = struct.unpack(">I", blob[4:8])
    assert n == 4 + key % 5
    frames = list(iter_frames(blob))
    assert [f for f, _ in frames] == list(range(n))
    for f, data in frames:
        px = codec.decode_png(data)
        ref = codec.pixels_for((key + f * 0x9E3779B9) & ((1 << 60) - 1), 32, 32)
        assert (px == ref).all()


# ----------------------------------------------------------- spark plumbing
def test_thumbnail_spark_stage(spark):
    out = images_thumbnail(spark, SF).toPandas()
    assert len(out) > 0
    assert (out["thumb_w"] == 32).all() and (out["thumb_h"] == 32).all()
    assert set(out["src_w"].unique()) <= {32, 64, 128}
    # spot-check one row against the direct pipeline
    row = out[out["doc_id"] == out["doc_id"].min()].iloc[0]
    import pandas as pd  # noqa: F401

    import duckdb

    src = duckdb.sql(
        f"SELECT source FROM '{SF}/documents.parquet' WHERE doc_id = {row.doc_id}"
    ).fetchone()[0]
    url = f"https://{src}.example.com/img/{row.doc_id}"
    img = codec.synth_image(url)
    px = codec.decode(img["bytes"], img["fmt"])
    thumb = resize_area(px, 32, 32)
    assert int(row.thumb_phash) == codec.phash(thumb)
    assert int(row.thumb_n_bytes) == len(codec.encode_png(thumb))


def test_frames_sample_spark_stage(spark):
    out = frames_sample(spark, SF).toPandas()
    assert len(out) > 0
    assert (out["frame_idx"] % _FRAME_STRIDE == 0).all()
    per_doc = out.groupby("doc_id").agg(
        n=("n_frames", "first"), sampled=("frame_idx", "count")
    )
    expect = (per_doc["n"] + _FRAME_STRIDE - 1) // _FRAME_STRIDE
    assert (per_doc["sampled"] == expect).all()


def test_images_near_dup_keepers_parity(spark):
    """Keeper map matches a direct single-process recomputation: same
    signature relation (injected twins included), brute-force Hamming
    pairs at tau=2, same min-neighbor reduction — and the injected
    twins guarantee the compared sets are NON-empty."""
    from crawlspark.ops.imageops import (
        _TWIN_EVERY,
        _TWIN_OFFSET,
        images_near_dup_keepers,
        thumb_signatures,
    )

    thumbs = thumb_signatures(spark, SF, twin_every=_TWIN_EVERY).toPandas()

    def ham(a: int, b: int) -> int:
        return bin((int(a) ^ int(b)) & ((1 << 64) - 1)).count("1")

    rows = list(thumbs.itertuples(index=False))
    edges = {}
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            if ham(rows[i].thumb_phash, rows[j].thumb_phash) <= 2:
                a, b = int(rows[i].doc_id), int(rows[j].doc_id)
                edges.setdefault(a, []).append(b)
                edges.setdefault(b, []).append(a)
    want = {
        v: (min(v, min(os_)), len(os_)) for v, os_ in edges.items()
    }
    got = {
        int(r.doc_id): (int(r.keeper_id), int(r.n_dups))
        for r in images_near_dup_keepers(spark, SF).collect()
    }
    assert got == want
    assert len(got) > 0, "twin injection should produce clusters"
    # every injected twin must cluster back to (at least) its original
    twins = {d for d in thumbs["doc_id"] if d >= _TWIN_OFFSET}
    clustered = {t for t in twins if t in got and got[t][0] == t - _TWIN_OFFSET}
    assert len(clustered) >= 0.9 * len(twins), (len(clustered), len(twins))


def test_keeper_map_clusters(spark):
    """Keeper reduction on constructed clusters: {1,2,3} all pairwise
    duplicates, {7,9} a pair, 5 a singleton (absent from output)."""
    from crawlspark.ops.imageops import keeper_map

    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (7, 9)], "left_id long, right_id long"
    )
    got = {
        int(r.doc_id): (int(r.keeper_id), int(r.n_dups))
        for r in keeper_map(pairs, "doc_id").collect()
    }
    assert got == {1: (1, 2), 2: (1, 2), 3: (1, 2), 7: (7, 1), 9: (7, 1)}


def test_near_dup_perturbed_thumbnail_cluster(spark):
    """A perturbed copy of an image clusters with its original through
    the REAL composite path (thumbnail resize -> pHash -> banded join
    -> keeper map) when fed the decoded pixels directly."""
    from crawlspark.ops.dedup import hamming_near_dup, split_phash64
    from crawlspark.ops.imageops import keeper_map

    base = codec.pixels_for(2024, 128, 128)
    rng = np.random.default_rng(11)
    near = np.clip(
        base.astype(np.int32) + rng.integers(-2, 3, size=base.shape), 0, 255
    ).astype(np.uint8)
    other = codec.pixels_for(555555, 128, 128)
    rows = [
        (0, codec.phash(resize_area(base, 32, 32))),
        (1, codec.phash(resize_area(near, 32, 32))),
        (2, codec.phash(resize_area(other, 32, 32))),
    ]
    sig = split_phash64(
        spark.createDataFrame(rows, "doc_id long, thumb_phash long"), "thumb_phash"
    )
    pairs = hamming_near_dup(sig, "doc_id", "phash_lo", "phash_hi", tau=2)
    got = {
        int(r.doc_id): int(r.keeper_id) for r in keeper_map(pairs, "doc_id").collect()
    }
    assert got == {0: 0, 1: 0}


def test_image_ann_topk_spark(spark):
    out = image_ann_topk(spark, SF).toPandas()
    qids = sorted(out["qid"].unique())
    assert qids == [q for q in range(5) if q in set(qids)] and len(qids) == 5
    assert (out.groupby("qid")["rank"].max() == 3).all()
    assert not (out["qid"] == out["nid"]).any()
