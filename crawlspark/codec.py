"""Deterministic synthetic image codec + perceptual hash.

The reference's binary payload is asset files downloaded over HTTP
(contentful/backup/ContentfulBackup.java:147-208). No real network or
image libraries exist in this environment, so fetching is modeled by a
**deterministic codec**: pixel content is a pure function of the URL
hash, encoded either as

* ``png``  — a real, spec-compliant PNG (zlib + stdlib struct; lossless), or
* ``sjpg`` — a SYNTHETIC lossy stand-in for JPEG (uniform quantization
  step 4 + zlib). This is a clearly-marked deterministic fake for the
  missing JPEG library; its reconstruction error is uniform in
  {-2..+1} per sample → PSNR ≈ 46.4 dB, satisfying the ≥40 dB per-row
  invariant for lossy formats.

Everything here is numpy-vectorized per image and is only ever invoked
from Arrow-batched ``mapInPandas`` stages — never per-row Python in a
Spark plan.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

import os

from .hashing import py_h60

# CRAWLSPARK_IMG_SCALE multiplies image dimensions (default 1 → 32-128px,
# ~3KB payloads). The bench sets it higher so payload weight matches a
# real image crawl (decode-bound). Read once per process; in local mode
# driver and workers share the environment, keeping fetch deterministic.
IMG_SCALE = max(1, int(os.environ.get("CRAWLSPARK_IMG_SCALE", "1")))
SIZES = tuple(s * IMG_SCALE for s in (32, 64, 128))
_LOSSY_Q = 4


# ---------------------------------------------------------------- pixels
def pixels_for(key: int, w: int, h: int) -> np.ndarray:
    """Deterministic (h, w, 3) uint8 image from a 60-bit key.

    Smooth-ish gradients + key-dependent interference pattern: cheap,
    fully vectorized, and compresses reasonably (exercises zlib).
    int32 arithmetic throughout — the fetch stage runs 32-wide and is
    memory-bandwidth sensitive (int64 halved its throughput).
    """
    a = (key & 0xFF) or 1
    b = ((key >> 8) & 0xFF) or 3
    c = ((key >> 16) & 0xFF) or 7
    xx = np.arange(w, dtype=np.int32)[None, :]
    yy = np.arange(h, dtype=np.int32)[:, None]
    k0 = np.int32(key & 0xFFFF)
    k1 = np.int32((key >> 16) & 0xFFFF)
    k2 = np.int32((key >> 32) & 0xFFFF)
    # every operand is non-negative int32, so `x & 255` == `x % 256`
    # bit-for-bit; & skips the hardware divide. Writing channels into a
    # preallocated (h, w, 3) buffer replaces np.stack's gather+copy.
    out = np.empty((h, w, 3), dtype=np.uint8)
    out[:, :, 0] = (a * xx + b * yy + k0) & 255
    out[:, :, 1] = (b * xx + c * yy + k1) & 255
    out[:, :, 2] = (c * xx + a * yy + ((xx * yy) >> 3) + k2) & 255
    return out


def dims_for(key: int) -> tuple[int, int, str]:
    """Deterministic (w, h, fmt) for a key."""
    w = SIZES[key % 3]
    h = SIZES[(key >> 4) % 3]
    fmt = "png" if (key >> 8) % 2 == 0 else "sjpg"
    return w, h, fmt


def caption_for(url: str, key: int) -> str:
    host = url.split("://", 1)[-1].split("/", 1)[0]
    return f"synthetic image {key % 100000} from {host}"


# ------------------------------------------------------------------ PNG
def _png_chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(px: np.ndarray) -> bytes:
    """Minimal spec-compliant truecolor 8-bit PNG, filter type 0."""
    h, w, _ = px.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), px.reshape(h, w * 3)], axis=1
    ).tobytes()
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 1))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    assert data[:8] == b"\x89PNG\r\n\x1a\n", "not a PNG"
    pos, idat, w, h = 8, b"", 0, 0
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            w, h, bits, ctype = struct.unpack(">IIBB", payload[:10])
            assert bits == 8 and ctype == 2, "only 8-bit RGB supported"
        elif tag == b"IDAT":
            idat += payload
        pos += 12 + length
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8).reshape(h, w * 3 + 1)
    assert (raw[:, 0] == 0).all(), "only filter 0 supported (own encoder)"
    return raw[:, 1:].reshape(h, w, 3).copy()


# ----------------------------------------------------------- lossy sjpg
def encode_sjpg(px: np.ndarray) -> bytes:
    """SYNTHETIC lossy codec (JPEG stand-in): quantize step 4 + zlib."""
    h, w, _ = px.shape
    q = (px // _LOSSY_Q).astype(np.uint8)
    return b"SJPG" + struct.pack(">II", w, h) + zlib.compress(q.tobytes(), 1)


def decode_sjpg(data: bytes) -> np.ndarray:
    assert data[:4] == b"SJPG", "not an sjpg"
    w, h = struct.unpack(">II", data[4:12])
    q = np.frombuffer(zlib.decompress(data[12:]), dtype=np.uint8).reshape(h, w, 3)
    # q <= 255 // _LOSSY_Q = 63, so q*4 + 2 <= 254: the 255 clamp of the
    # definition never fires and the whole dequantization stays uint8
    # (bit-identical to min(q.astype(int64)*Q + Q//2, 255).astype(uint8)).
    return (q * np.uint8(_LOSSY_Q) + np.uint8(_LOSSY_Q // 2)).astype(np.uint8)


def encode(px: np.ndarray, fmt: str) -> bytes:
    return encode_png(px) if fmt == "png" else encode_sjpg(px)


def decode(data: bytes, fmt: str) -> np.ndarray:
    return decode_png(data) if fmt == "png" else decode_sjpg(data)


# -------------------------------------------------------------- metrics
def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0.0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)


_DCT32 = None


def _dct_matrix(n: int = 32) -> np.ndarray:
    global _DCT32
    if _DCT32 is None:
        k = np.arange(n).reshape(-1, 1)
        i = np.arange(n).reshape(1, -1)
        m = np.cos(np.pi / n * (i + 0.5) * k) * np.sqrt(2.0 / n)
        m[0, :] = np.sqrt(1.0 / n)
        _DCT32 = m
    return _DCT32


def phash(px: np.ndarray) -> int:
    """64-bit DCT perceptual hash (public pHash algorithm shape).

    Grayscale -> 32x32 block-mean resize -> 2-D DCT-II -> top-left 8x8
    minus DC -> bits = coefficient > median -> signed int64.
    """
    # channel-sum grayscale: same float64 conversion and the same
    # ((r + g) + b) / 3 left-fold as astype(float64).mean(axis=-1)
    # (bit-identical, checked exhaustively), without materializing the
    # 3x float64 copy of the full image — 6x faster at 256x256.
    gray = (px[:, :, 0].astype(np.float64) + px[:, :, 1] + px[:, :, 2]) / 3.0
    h, w = gray.shape
    small = gray.reshape(32, h // 32, 32, w // 32).mean(axis=(1, 3))
    m = _dct_matrix(32)
    d = m @ small @ m.T
    block = d[:8, :8].flatten()[1:]  # drop DC
    med = np.median(block)
    bits = block > med
    val = 0
    for bit in bits:
        val = (val << 1) | int(bit)
    # pack into signed int64 range
    if val >= 1 << 63:
        val -= 1 << 64
    return val


# ------------------------------------------------- one-call synth fetch
_MIRROR_PREFIX = "mirror."


def synth_image(url: str, version: int = 0) -> dict:
    """Full deterministic 'fetch' of one URL (used by the golden oracle
    and by the vectorized fetch stage, which calls it per Arrow batch).

    ``version`` models content drift for adaptive-recrawl runs
    (SynthConfig.change_period): version v > 0 re-keys the synthesis to
    ``h60(base_url|v<v>)`` — a refetch of a changed page returns new
    pixels/dims/caption, still a pure function of (url, version) so
    resume replays bit-identically. version 0 (the default everywhere
    else) is byte-for-byte today's static corpus.

    Mirror hosts model the near-duplicates a real crawl encounters when
    an asset is re-hosted/re-encoded by a mirror or CDN:
    ``https://mirror.<host>/<path>`` serves a deterministic ±2-per-pixel
    perturbation of the primary host's image (same dims, same format) —
    the image its DCT pHash lands within a bit or two of, which is
    exactly what CrawlEngine.publish_dedup flags. Non-mirror URLs are
    bit-for-bit unaffected. Stacked prefixes (``mirror.mirror.<host>``
    — a CDN re-hosting another CDN's copy) strip all the way down: every
    mirror in a chain serves its OWN ±2 perturbation of the same
    primary image, so all chain members are mutual near-dups of the
    primary, not of each other's noise."""
    base_url = url
    # schemeless URLs (canonicalize passes them through unchanged) are
    # hashed whole; the mirror prefix then applies to the full string
    scheme, sep, rest = url.partition("://")
    if not sep:
        scheme, rest = "", url
    is_mirror = rest.startswith(_MIRROR_PREFIX)
    while rest.startswith(_MIRROR_PREFIX):
        rest = rest[len(_MIRROR_PREFIX):]
    if is_mirror:
        base_url = scheme + sep + rest
    key = py_h60(base_url if not version else f"{base_url}|v{int(version)}")
    w, h, fmt = dims_for(key)
    px = pixels_for(key, w, h)
    if is_mirror:
        rng = np.random.default_rng(py_h60(url) & 0xFFFFFFFF)
        px = np.clip(
            px.astype(np.int16)
            + rng.integers(-2, 3, size=px.shape, dtype=np.int16),
            0,
            255,
        ).astype(np.uint8)
    data = encode(px, fmt)
    # phash over DECODED pixels so lossy round-trips verify equal. For
    # sjpg the decoded image is algebraically (px // Q) * Q + Q // 2 with
    # no clamp ever firing (max 254) — computing that directly skips the
    # zlib decompress round-trip while staying bit-identical to
    # decode(data, "sjpg") (asserted by tests/test_imageops.py &
    # test_codec parity).
    if fmt == "png":
        hash_px = px
    else:
        hash_px = (px & np.uint8(0xFF ^ (_LOSSY_Q - 1))) + np.uint8(_LOSSY_Q // 2)
    return {
        "bytes": data,
        "w": w,
        "h": h,
        "fmt": fmt,
        "caption": caption_for(url, key),
        "phash": phash(hash_px),
    }
