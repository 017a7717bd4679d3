"""End-to-end engine dedup publish: perturbed-twin images fetched by a
real crawl are flagged in the image_dedup keeper table (r3 VERDICT
"Next round" #5).

Twins come from the codec's mirror-host convention
(``https://mirror.<host>/<path>`` serves a deterministic ±2-per-pixel
perturbation of the primary host's image — the re-hosted/re-encoded
copy a real crawl encounters), so the whole path is the production
one: frontier → politeness → vectorized fetch (which computes the DCT
pHash) → images append → publish_dedup's banded Hamming keeper map →
bucketed MERGE.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from crawlspark.canon import py_canonicalize
from crawlspark.codec import decode, phash, synth_image
from crawlspark.engine import CrawlEngine
from crawlspark.synth import SynthConfig


def _hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def test_codec_mirror_twin_is_near_duplicate():
    base = "https://h3.example.com/img/77"
    mirror = "https://mirror.h3.example.com/img/77"
    b, m = synth_image(base), synth_image(mirror)
    assert (b["w"], b["h"], b["fmt"]) == (m["w"], m["h"], m["fmt"])
    pb = decode(b["bytes"], b["fmt"]).astype(np.int32)
    pm = decode(m["bytes"], m["fmt"]).astype(np.int32)
    assert np.abs(pb - pm).max() <= 8, "mirror should differ only slightly"
    assert (pb != pm).any(), "mirror must not be byte-identical"
    # lossy re-encode + noise flips median-adjacent DCT bits: twins sit
    # within ~6 bits (measured max over 300 pairs); publish_dedup's
    # default tau=7 covers them with exact 8-band pigeonhole banding
    assert _hamming64(b["phash"], m["phash"]) <= 7
    # determinism: the same mirror URL always produces the same bytes
    assert synth_image(mirror)["bytes"] == m["bytes"]
    # an unrelated image stays far away in hash space
    other = synth_image("https://h4.example.com/img/123456")
    assert _hamming64(b["phash"], other["phash"]) > 10


def test_publish_dedup_flags_mirror_twins(spark, tmp_path):
    hosts = [f"h{i}.example.com" for i in range(1, 6)]
    base = [f"https://{hosts[i % 5]}/img/{i}" for i in range(60)]
    mirrors = [f"https://mirror.{u.split('://', 1)[1]}" for u in base[::3]]
    seeds = pd.DataFrame(
        {"url": base + mirrors, "depth": [0] * (len(base) + len(mirrors))}
    )
    pol = pd.DataFrame(
        {
            "host": hosts + [f"mirror.{h}" for h in hosts],
            "budget": [1000] * 10,
        }
    )
    cfg = SynthConfig(n_seeds=10, n_hosts=5, max_depth=0, fault_free=True)
    eng = CrawlEngine(
        spark, str(tmp_path / "wd"), cfg, politeness_pdf=pol, use_cuckoo=False
    )
    eng.add_seeds(spark.createDataFrame(seeds))
    eng.run(max_rounds=5)
    res = eng.publish_dedup()
    assert res["rows"] > 0 and res["dup_images"] == len(mirrors)

    prod = eng.image_dedup.read(spark).toPandas().set_index("image_id")
    imgs = eng.images.read(spark).select("image_id", "url").toPandas()
    id_by_url = dict(zip(imgs["url"], imgs["image_id"]))
    assert len(id_by_url) == len(base) + len(mirrors)

    expected_flagged = set()
    for mu in mirrors:
        bu = "https://" + mu.split("://mirror.", 1)[1]
        mid = id_by_url[py_canonicalize(mu)]
        bid = id_by_url[py_canonicalize(bu)]
        expected_flagged |= {mid, bid}
        assert mid in prod.index and bid in prod.index, (mu, bu)
        # the pair shares one keeper (one of the two ids); exactly the
        # non-keeper is flagged is_dup
        km, kb = prod.loc[mid], prod.loc[bid]
        assert km["keeper_id"] == kb["keeper_id"] == min(mid, bid)
        assert bool(km["is_dup"]) == (mid != km["keeper_id"])
        assert bool(kb["is_dup"]) == (bid != kb["keeper_id"])
        assert km["n_dups"] >= 1 and kb["n_dups"] >= 1
    # no false positives: only twin-pair members appear in the product
    assert set(prod.index) == expected_flagged

    # re-publish is idempotent (A5 upsert semantics): same table content.
    # The second publish takes the incremental path (base snapshot was
    # recorded by the first) and sees an empty delta.
    res2 = eng.publish_dedup()
    assert res2["mode"] == "incremental" and res["mode"] == "full"
    assert {k: res2[k] for k in ("rows", "dup_images")} == {
        k: res[k] for k in ("rows", "dup_images")
    }
    prod2 = eng.image_dedup.read(spark).toPandas().set_index("image_id")
    pd.testing.assert_frame_equal(
        prod.sort_index(), prod2.sort_index(), check_like=True
    )


def test_publish_dedup_incremental_equals_full(spark, tmp_path):
    """Two-phase crawl: publish after phase 1 (full), crawl more twins —
    including a cross-phase twin of a phase-1 image and a second
    near-dup of an already-flagged image — publish again. The second
    publish must take the O(delta) incremental path (delta × full
    banded join folded into stored keeper state) and produce EXACTLY
    the table a from-scratch full recompute produces."""
    hosts = [f"h{i}.example.com" for i in range(1, 4)]
    base = [f"https://{hosts[i % 3]}/img/{i}" for i in range(24)]
    m1 = [f"https://mirror.{u.split('://', 1)[1]}" for u in base[::4]]
    pol = pd.DataFrame(
        {
            "host": hosts
            + [f"mirror.{h}" for h in hosts]
            + [f"mirror.mirror.{h}" for h in hosts],
            "budget": [1000] * 9,
        }
    )
    cfg = SynthConfig(n_seeds=10, n_hosts=3, max_depth=0, fault_free=True)
    eng = CrawlEngine(
        spark, str(tmp_path / "wd"), cfg, politeness_pdf=pol, use_cuckoo=False
    )
    # phase 1: bases + some mirrors; publish (full — no base recorded)
    eng.add_seeds(
        spark.createDataFrame(
            pd.DataFrame({"url": base + m1, "depth": [0] * (len(base) + len(m1))})
        )
    )
    eng.run(max_rounds=4)
    assert eng.publish_dedup()["mode"] == "full"

    # phase 2: cross-phase twins of phase-1-only bases (old id gains its
    # first neighbor) + mirror-of-mirror copies (already-flagged id
    # gains a SECOND neighbor — exercises the n_dups/keeper fold)
    m2 = [f"https://mirror.{u.split('://', 1)[1]}" for u in base[1::4]]
    mm = [f"https://mirror.{u.split('://', 1)[1]}" for u in m1[:3]]
    eng.add_seeds(
        spark.createDataFrame(
            pd.DataFrame({"url": m2 + mm, "depth": [0] * (len(m2) + len(mm))})
        )
    )
    eng.run(max_rounds=4)
    res_inc = eng.publish_dedup()
    assert res_inc["mode"] == "incremental"
    inc = eng.image_dedup.read(spark).toPandas().set_index("image_id").sort_index()

    # ground truth: a from-scratch full keeper map over the final
    # images table, computed OUTSIDE the product (a merge-based full
    # republish could not reveal spurious extra rows)
    from crawlspark.ops.dedup import hamming_near_dup, split_phash64
    from crawlspark.ops.imageops import keeper_map

    sig = split_phash64(
        eng.images.read(spark).select("image_id", "phash"), "phash"
    )
    full = (
        keeper_map(
            hamming_near_dup(sig, "image_id", "phash_lo", "phash_hi", tau=7),
            "image_id",
        )
        .withColumn("is_dup", F.col("image_id") != F.col("keeper_id"))
        .toPandas()
        .set_index("image_id")
        .sort_index()
    )
    pd.testing.assert_frame_equal(inc, full, check_like=True, check_dtype=False)
    # the cross-phase twin really is flagged
    imgs = eng.images.read(spark).select("image_id", "url").toPandas()
    id_by_url = dict(zip(imgs["url"], imgs["image_id"]))
    for mu in m2:
        assert id_by_url[py_canonicalize(mu)] in inc.index
    # the double-mirrored ids carry >= 2 duplicates after the fold
    for mu in mm:
        mid = id_by_url[py_canonicalize(mu)]
        assert mid in inc.index
        base_of = "https://" + mu.split("://mirror.", 1)[1]
        assert inc.loc[id_by_url[py_canonicalize(base_of)], "n_dups"] >= 2


def test_publish_dedup_full_fallback_after_compaction(spark, tmp_path):
    """Compacting the images table (maybe_compact rewrites data dirs)
    breaks the append-diff chain on purpose; the next publish must
    detect it, fall back to the full re-band, and still produce the
    exact from-scratch product."""
    hosts = [f"h{i}.example.com" for i in range(1, 4)]
    base = [f"https://{hosts[i % 3]}/img/{i}" for i in range(12)]
    m1 = [f"https://mirror.{u.split('://', 1)[1]}" for u in base[::3]]
    pol = pd.DataFrame(
        {"host": hosts + [f"mirror.{h}" for h in hosts], "budget": [1000] * 6}
    )
    cfg = SynthConfig(n_seeds=10, n_hosts=3, max_depth=0, fault_free=True)
    eng = CrawlEngine(
        spark, str(tmp_path / "wd"), cfg, politeness_pdf=pol, use_cuckoo=False
    )
    eng.add_seeds(
        spark.createDataFrame(
            pd.DataFrame({"url": base + m1, "depth": [0] * (len(base) + len(m1))})
        )
    )
    eng.run(max_rounds=4)
    assert eng.publish_dedup()["mode"] == "full"

    m2 = [f"https://mirror.{u.split('://', 1)[1]}" for u in base[1::3]]
    eng.add_seeds(
        spark.createDataFrame(pd.DataFrame({"url": m2, "depth": [0] * len(m2)}))
    )
    eng.run(max_rounds=8)
    # compact AFTER the crawl: a mid-crawl compaction would be rolled
    # back by the next run()'s resume (it is not in the round manifest —
    # itself a correctness property: resume cannot lose crawl data to a
    # maintenance commit). Compacting here rewrites every data dir.
    assert eng.images.maybe_compact(spark, max_dirs=0)
    res = eng.publish_dedup()
    assert res["mode"] == "full"  # chain broken -> fallback, not a wrong delta

    from crawlspark.ops.dedup import hamming_near_dup, split_phash64
    from crawlspark.ops.imageops import keeper_map

    sig = split_phash64(eng.images.read(spark).select("image_id", "phash"), "phash")
    truth = (
        keeper_map(
            hamming_near_dup(sig, "image_id", "phash_lo", "phash_hi", tau=7),
            "image_id",
        )
        .withColumn("is_dup", F.col("image_id") != F.col("keeper_id"))
        .toPandas()
        .set_index("image_id")
        .sort_index()
    )
    got = eng.image_dedup.read(spark).toPandas().set_index("image_id").sort_index()
    pd.testing.assert_frame_equal(got, truth, check_like=True, check_dtype=False)
