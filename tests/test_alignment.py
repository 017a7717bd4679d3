"""Caption-image alignment: determinism, encoder properties, and the
end-to-end separation contract (a perfect injected encoder must score
matched pairs at ~1.0 and shuffled captions strictly lower — the
filter plumbing is what ships; the towers are swappable stubs)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from crawlspark.codec import decode, synth_image
from crawlspark.ops.alignment import (
    alignment_stats,
    caption_alignment,
    caption_image_alignment,
    embed_caption_hashed,
)
from crawlspark.ops.imageops import embed_pixels

SF_DIR = "/root/testdata/sf0.001"


def test_hashed_encoder_properties():
    caps = pd.Series(["synthetic image 7 from h1.example.com", "", "ab"])
    e = embed_caption_hashed(caps)
    assert e.shape == (3, 64) and e.dtype == np.float32
    norms = np.sqrt((e.astype(np.float64) ** 2).sum(axis=1))
    assert np.allclose(norms, 1.0, atol=1e-6)
    # degenerate captions (no 3-gram) hit the fixed basis vector
    assert e[1, 0] == 1.0 and e[2, 0] == 1.0
    # determinism across calls
    assert np.array_equal(e, embed_caption_hashed(caps))


def _pairs(n=12, shuffle=False):
    urls = [f"https://h{i % 5}.example.com/img/{i * 37}" for i in range(n)]
    imgs = [synth_image(u) for u in urls]
    caps = [im["caption"] for im in imgs]
    assert len(set(caps)) == n, "fixture captions must be unique"
    if shuffle:
        caps = caps[1:] + caps[:1]  # derangement by rotation
    return pd.DataFrame(
        {
            "image_id": [str(i) for i in range(n)],
            "bytes": [im["bytes"] for im in imgs],
            "fmt": [im["fmt"] for im in imgs],
            "caption": caps,
        }
    ), {im["caption"]: embed_pixels(decode(im["bytes"], im["fmt"])) for im in imgs}


def test_perfect_encoder_separates(spark):
    matched, lookup = _pairs()
    mismatched, _ = _pairs(shuffle=True)

    def perfect(caps: pd.Series) -> np.ndarray:
        return np.stack([lookup[c] for c in caps])

    def score(pdf):
        df = caption_image_alignment(
            spark.createDataFrame(pdf), caption_encoder=perfect
        )
        return df.toPandas().sort_values("image_id")["score"].to_numpy()

    s_match = score(matched)
    s_mis = score(mismatched)
    # float32 towers: cosine of a vector with itself is 1 within 1e-5
    assert (s_match > 0.9999).all()
    assert (s_mis < s_match - 0.01).all(), "shuffled captions must score lower"
    # the curation cut keeps exactly the matched pairs
    both = pd.concat([matched, mismatched.assign(image_id=lambda d: "m" + d["image_id"])])
    scored = caption_image_alignment(
        spark.createDataFrame(both), caption_encoder=perfect
    )
    kept = scored.filter("score >= 0.999").toPandas()
    assert set(kept["image_id"]) == set(matched["image_id"])


def test_gate_deterministic(spark):
    a = caption_alignment(spark, SF_DIR).toPandas().sort_values("image_id")
    b = caption_alignment(spark, SF_DIR).toPandas().sort_values("image_id")
    assert len(a) == 500
    assert a["score"].between(-1.0, 1.0).all()
    pd.testing.assert_frame_equal(
        a.reset_index(drop=True), b.reset_index(drop=True)
    )


def test_alignment_stats(spark):
    scored = caption_alignment(spark, SF_DIR)
    pdf = scored.toPandas()
    tau = float(pdf["score"].median())
    row = alignment_stats(scored, tau).collect()[0]
    assert row["n_pairs"] == len(pdf)
    assert row["n_kept"] == int((pdf["score"] >= tau).sum())
    assert row["mean_score"] == pytest.approx(pdf["score"].mean(), abs=1e-5)
