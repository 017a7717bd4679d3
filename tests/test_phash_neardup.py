"""Hamming near-dup over REAL image pHashes (codec.phash, the engine's
images.phash column): a slightly-perturbed copy of an image must land
within the banded near-dup join's tau, an unrelated image must not.
This wires the same hamming_near_dup used by the phash_hamming_near_dup
gate to the actual 64-bit DCT pHash int domain via split_phash64.
"""

import numpy as np

from crawlspark import codec
from crawlspark.ops.dedup import hamming_near_dup, split_phash64


def _perturb(px: np.ndarray, seed: int, amp: int = 2) -> np.ndarray:
    """A lossy-recompression stand-in: tiny uniform noise, clipped."""
    rng = np.random.default_rng(seed)
    noise = rng.integers(-amp, amp + 1, size=px.shape)
    return np.clip(px.astype(np.int32) + noise, 0, 255).astype(np.uint8)


def test_real_phash_near_dup_pairs(spark):
    base = codec.pixels_for(12345, 64, 64)
    near = _perturb(base, seed=7)
    other = codec.pixels_for(99999, 64, 64)

    h_base = codec.phash(base)
    h_near = codec.phash(near)
    h_other = codec.phash(other)

    # sanity on the raw ints before Spark gets involved
    def ham(a: int, b: int) -> int:
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    assert ham(h_base, h_near) <= 3, "perturbation moved pHash too far"
    assert ham(h_base, h_other) > 3, "unrelated images collide"

    df = spark.createDataFrame(
        [(0, h_base), (1, h_near), (2, h_other)], "image_id int, phash long"
    )
    sig = split_phash64(df, "phash")
    pairs = hamming_near_dup(sig, "image_id", "phash_lo", "phash_hi", tau=3)
    got = {(r.left_id, r.right_id) for r in pairs.collect()}
    assert (0, 1) in got
    assert (0, 2) not in got and (1, 2) not in got


def test_hamming_banding_exact_vs_bruteforce(spark):
    """Pigeonhole exactness for every supported band count: banded
    candidates must recover EXACTLY the brute-force pair set whenever
    tau <= n_bands - 1, over adversarial hashes clustered near each
    other (many pairs straddle the threshold)."""
    rng = np.random.default_rng(42)
    base = int(rng.integers(0, 1 << 63))
    vals = []
    for i in range(60):
        v = base
        for bit in rng.choice(64, size=int(rng.integers(0, 10)), replace=False):
            v ^= 1 << int(bit)
        vals.append((i, v - (1 << 64) if v >= 1 << 63 else v))
    df = split_phash64(
        spark.createDataFrame(vals, "image_id int, phash long"), "phash"
    )

    def ham(a: int, b: int) -> int:
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    for tau, n_bands in [(3, None), (7, None), (7, 16), (12, 16), (15, None)]:
        got = {
            (r.left_id, r.right_id, r.hamming)
            for r in hamming_near_dup(
                df, "image_id", "phash_lo", "phash_hi", tau=tau, n_bands=n_bands
            ).collect()
        }
        want = {
            (i, j, ham(a, b))
            for i, a in vals
            for j, b in vals
            if i < j and ham(a, b) <= tau
        }
        assert got == want, f"tau={tau} n_bands={n_bands}: {len(got)} vs {len(want)}"


def test_split_phash64_roundtrip(spark):
    vals = [0, -1, 1, -(1 << 63), (1 << 63) - 1, 0x0123456789ABCDEF, -0x0123456789ABCDEF]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "i int, phash long")
    out = split_phash64(df, "phash").collect()
    for row in out:
        lo, hi = row.phash_lo, row.phash_hi
        assert 0 <= lo < (1 << 32) and 0 <= hi < (1 << 32)
        recon = (hi << 32) | lo
        if recon >= 1 << 63:
            recon -= 1 << 64
        assert recon == row.phash


def test_delta_pairs_equal_full_minus_old(spark):
    """Incremental identity behind publish_dedup(incremental=True):
    over a random signature corpus split old/delta,
    hamming_near_dup_delta(delta, full) must equal
    pairs(full) - pairs(old) exactly — every pair with a delta
    endpoint once, no old-old pair, across tau/band layouts."""
    import random

    from crawlspark.ops.dedup import hamming_near_dup_delta

    rng = random.Random(42)
    seeds = [rng.getrandbits(64) for _ in range(40)]
    rows = []
    for i, s in enumerate(seeds):
        rows.append((i * 10, _signed(s)))
        # clustered copies a few bit-flips away → plenty of pairs,
        # including delta-delta and delta-old ones
        for j in range(rng.randrange(3)):
            flipped = s
            for _ in range(rng.randrange(1, 5)):
                flipped ^= 1 << rng.randrange(64)
            rows.append((i * 10 + j + 1, _signed(flipped)))
    rng.shuffle(rows)
    cut = len(rows) * 2 // 3
    old_rows, delta_rows = rows[:cut], rows[cut:]

    for tau in (1, 3, 7):
        full_df = spark.createDataFrame(rows, "image_id long, phash long")
        old_df = spark.createDataFrame(old_rows, "image_id long, phash long")
        delta_df = spark.createDataFrame(delta_rows, "image_id long, phash long")
        s_full = split_phash64(full_df, "phash")
        pairs_full = {
            (r.left_id, r.right_id)
            for r in hamming_near_dup(
                s_full, "image_id", "phash_lo", "phash_hi", tau=tau
            ).collect()
        }
        pairs_old = {
            (r.left_id, r.right_id)
            for r in hamming_near_dup(
                split_phash64(old_df, "phash"),
                "image_id",
                "phash_lo",
                "phash_hi",
                tau=tau,
            ).collect()
        }
        got = [
            (r.left_id, r.right_id)
            for r in hamming_near_dup_delta(
                split_phash64(delta_df, "phash"),
                s_full,
                "image_id",
                "phash_lo",
                "phash_hi",
                tau=tau,
            ).collect()
        ]
        assert len(got) == len(set(got)), "delta pair emitted twice"
        assert set(got) == pairs_full - pairs_old, f"tau={tau}"
        assert pairs_old <= pairs_full


def _signed(u: int) -> int:
    """64-bit unsigned → Spark LongType two's-complement."""
    return u - (1 << 64) if u >= 1 << 63 else u
