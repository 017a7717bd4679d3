"""Codec invariants (BASELINE.json input_hint): decoded-pixel allclose,
PSNR >= 40 dB for lossy, deterministic phash."""

import numpy as np

from crawlspark.codec import (
    decode,
    dims_for,
    encode,
    phash,
    pixels_for,
    psnr,
    synth_image,
)


def test_png_lossless_roundtrip():
    px = pixels_for(123456789, 64, 32)
    out = decode(encode(px, "png"), "png")
    assert np.array_equal(px, out)


def test_sjpg_lossy_psnr_over_40db():
    for key in (7, 987654321, 2**59 + 11):
        w, h, _ = dims_for(key)
        px = pixels_for(key, w, h)
        out = decode(encode(px, "sjpg"), "sjpg")
        assert psnr(px, out) >= 40.0
        # re-encode of decoded pixels is stable (phash verification relies on it)
        assert np.array_equal(decode(encode(out, "sjpg"), "sjpg"), out)


def test_dims_and_fmt_deterministic():
    assert dims_for(4242) == dims_for(4242)
    w, h, fmt = dims_for(4242)
    assert w in (32, 64, 128) and h in (32, 64, 128) and fmt in ("png", "sjpg")


def test_phash_deterministic_and_sensitive():
    px1 = pixels_for(1, 64, 64)
    px2 = pixels_for(2, 64, 64)
    assert phash(px1) == phash(px1)
    assert phash(px1) != phash(px2)


def test_synth_image_full():
    img = synth_image("https://h3.example.com/img/5?p=2&s=5")
    assert img["fmt"] in ("png", "sjpg")
    px = decode(img["bytes"], img["fmt"])
    assert px.shape == (img["h"], img["w"], 3)
    assert img["caption"].startswith("synthetic image ")
    assert "h3.example.com" in img["caption"]
