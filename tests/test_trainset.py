"""Training-set export (crawlspark/trainset.py + engine wiring):

- shard_by_rank equals a DuckDB global row_number oracle on random
  hex string keys (the two-phase rank introduces no global sort).
- Engine export: near-dup twins are excluded (keepers kept), shard
  sizes are exact, the manifest attests the written rows, a repeat
  export is byte-deterministic, and releases version atomically with
  GC of unreferenced data dirs.
- Quality thresholds drop exactly the rows below them and are recorded
  in the manifest.
- A crashed export's orphan data dir is invisible to readers and
  cleaned by expire_exports.
"""

from __future__ import annotations

import os
import random

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from crawlspark import trainset
from crawlspark.engine import CrawlEngine
from crawlspark.synth import SynthConfig


def test_shard_by_rank_matches_duckdb(spark):
    random.seed(11)
    keys = [f"{random.getrandbits(128):032x}" for _ in range(1373)]
    df = spark.createDataFrame(pd.DataFrame({"image_id": keys}))
    got = (
        trainset.shard_by_rank(df, "image_id", 100)
        .select("image_id", "shard")
        .toPandas()
    )
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"image_id": keys}))
    want = con.execute(
        "SELECT image_id, CAST(floor((row_number() OVER (ORDER BY image_id) - 1)"
        " / 100) AS INT) AS shard FROM t"
    ).df()
    m = got.merge(want, on="image_id", suffixes=("_g", "_w"))
    assert len(m) == len(keys) and (m.shard_g == m.shard_w).all()


def test_shard_by_rank_fuzz_key_shapes(spark):
    """Exact-rank property across adversarial key corpora: shared long
    prefixes (prefix ranges collapse into few groups), mixed lengths
    (keys shorter than coarse_chars), unicode, tiny/large shard_rows,
    coarse_chars 1-4 — each vs the DuckDB row_number oracle. The prefix
    range respects lexicographic order for ANY strings, so the global
    rank must be exact everywhere, not just for uuid hex."""
    rng = random.Random(23)
    corpora = {
        "shared_prefix": [
            "img/common/prefix/" + f"{rng.getrandbits(24):06x}" for _ in range(400)
        ],
        "mixed_len": [
            f"{rng.getrandbits(rng.choice([4, 16, 40, 80])):x}" for _ in range(400)
        ],
        "unicode": [
            rng.choice(["ä", "z", "Z", "0", "~", "é"]) + f"{i:05d}"
            for i, _ in enumerate(range(300))
        ],
    }
    con = duckdb.connect()
    for name, keys in corpora.items():
        keys = sorted(set(keys))
        rng.shuffle(keys)
        for shard_rows, coarse in [(1, 2), (7, 1), (50, 3), (10_000, 4)]:
            df = spark.createDataFrame(pd.DataFrame({"image_id": keys}))
            got = (
                trainset.shard_by_rank(df, "image_id", shard_rows, coarse_chars=coarse)
                .select("image_id", "shard")
                .toPandas()
            )
            con.register("t", pd.DataFrame({"image_id": keys}))
            want = con.execute(
                "SELECT image_id, CAST(floor((row_number() OVER (ORDER BY image_id)"
                f" - 1) / {shard_rows}) AS INT) AS shard FROM t"
            ).df()
            m = got.merge(want, on="image_id", suffixes=("_g", "_w"))
            assert len(m) == len(keys) and (m.shard_g == m.shard_w).all(), (
                name,
                shard_rows,
                coarse,
            )


def _twin_engine(spark, tmp_path):
    hosts = [f"h{i}.example.com" for i in range(1, 4)]
    base = [f"https://{hosts[i % 3]}/img/{i}" for i in range(24)]
    mirrors = [f"https://mirror.{u.split('://', 1)[1]}" for u in base[::3]]
    pol = pd.DataFrame(
        {"host": hosts + [f"mirror.{h}" for h in hosts], "budget": [1000] * 6}
    )
    cfg = SynthConfig(n_seeds=10, n_hosts=3, max_depth=0, fault_free=True)
    eng = CrawlEngine(
        spark, str(tmp_path / "wd"), cfg, politeness_pdf=pol, use_cuckoo=False
    )
    eng.add_seeds(
        spark.createDataFrame(
            pd.DataFrame(
                {"url": base + mirrors, "depth": [0] * (len(base) + len(mirrors))}
            )
        )
    )
    eng.run(max_rounds=2)
    return eng, base, mirrors


def test_engine_export_dedup_shards_manifest(spark, tmp_path):
    eng, base, mirrors = _twin_engine(spark, tmp_path)
    out = str(tmp_path / "rel")
    man = eng.export_training_set(out, shard_rows=10)

    # dedup: one row per twin pair is dropped, keepers + unpaired stay
    assert man["version"] == 1
    assert man["n_rows"] == len(base) + len(mirrors) - len(mirrors)
    dup_ids = {
        r["image_id"]
        for r in eng.image_dedup.read(spark).filter("is_dup").collect()
    }
    rel = trainset.read_training_set(spark, out)
    got_ids = {r["image_id"] for r in rel.select("image_id").collect()}
    assert got_ids.isdisjoint(dup_ids)
    keepers = {
        r["keeper_id"] for r in eng.image_dedup.read(spark).collect()
    }
    assert keepers <= got_ids, "every keeper must survive the export"

    # exact shard sizes: all but the last hold exactly shard_rows, and
    # the manifest's per-shard attestation matches a recount
    sizes = {int(k): v["rows"] for k, v in man["shards"].items()}
    assert sorted(sizes) == list(range(man["n_shards"]))
    assert all(sizes[s] == 10 for s in sorted(sizes)[:-1])
    assert sum(sizes.values()) == man["n_rows"]
    back = (
        rel.groupBy("shard")
        .agg(
            F.count("*").alias("rows"),
            F.bit_xor(F.xxhash64("image_id")).alias("checksum"),
        )
        .collect()
    )
    for r in back:
        rec = man["shards"][str(r["shard"])]
        assert rec == {"rows": r["rows"], "checksum": r["checksum"]}

    # determinism + versioning: a second export produces identical
    # shard contents under a new version, and GC drops the v1 data dir
    # only after it stops being the previous release
    man2 = eng.export_training_set(out, shard_rows=10)
    assert man2["version"] == 2 and man2["shards"] == man["shards"]
    assert man2["previous_data_dirs"] == [man["data_dir"]]
    assert os.path.isdir(os.path.join(out, man["data_dir"]))  # kept: previous
    man3 = eng.export_training_set(out, shard_rows=10)
    assert man3["shards"] == man["shards"]
    assert not os.path.isdir(os.path.join(out, man["data_dir"]))  # GC'd


def test_export_quality_thresholds(spark, tmp_path):
    eng, base, mirrors = _twin_engine(spark, tmp_path)
    out_all = str(tmp_path / "rel_all")
    man_all = eng.export_training_set(out_all, shard_rows=10)
    # pick a threshold at the median observed entropy so the filter
    # provably drops part of the corpus, whatever the synth stats are
    stats = (
        trainset.with_quality(eng.latest_images())
        .select("image_id", "entropy")
        .toPandas()
    )
    thr = float(stats.entropy.median())
    out = str(tmp_path / "rel_q")
    man = eng.export_training_set(out, shard_rows=10, min_entropy=thr)
    assert man["filters"] == {"min_entropy": thr}
    assert 0 < man["n_rows"] < man_all["n_rows"]
    rel = trainset.read_training_set(spark, out).toPandas()
    assert (rel.entropy >= thr).all()
    # quality columns recorded only on curated exports
    assert "entropy" not in trainset.read_training_set(spark, out_all).columns
    # survivor set = dedup-kept rows meeting the threshold, exactly
    dup_ids = {
        r["image_id"]
        for r in eng.image_dedup.read(spark).filter("is_dup").collect()
    }
    want = set(stats[stats.entropy >= thr].image_id) - dup_ids
    assert set(rel.image_id) == want


def test_delta_release_series(spark, tmp_path):
    """Full release → crawl more (mix: fresh images, a twin of a
    RELEASED image, a fresh twin PAIR inside the delta) → delta release:

    - only genuinely-new corpus members ship, in shards numbered after
      the existing ones; released shards' attestation is unchanged
    - a delta row pairing with a released image is dropped even when it
      would be the cluster keeper (the cluster is already represented)
    - a twin pair fully inside the delta ships exactly its keeper
    - the union read equals released ∪ shipped-delta with no id overlap
    - an empty delta advances sources without a new data dir
    """
    eng, base, mirrors = _twin_engine(spark, tmp_path)
    out = str(tmp_path / "rel")
    man1 = eng.export_training_set(out, shard_rows=10)
    released_ids = {
        r["image_id"]
        for r in trainset.read_training_set(spark, out).select("image_id").collect()
    }
    v1_ids = {
        r["image_id"] for r in eng.latest_images().select("image_id").collect()
    }

    # delta: 5 fresh, 1 twin-of-released (base[1] was never mirrored by
    # base[::3]), 2 fresh images that twin EACH OTHER (f0 + its mirror)
    fresh = [f"https://h1.example.com/img/new/{i}" for i in range(5)]
    twin_of_released = f"https://mirror.{base[1].split('://', 1)[1]}"
    pair_in_delta = f"https://mirror.h1.example.com/img/new/0"
    urls = fresh + [twin_of_released, pair_in_delta]
    eng.add_seeds(
        spark.createDataFrame(pd.DataFrame({"url": urls, "depth": [0] * len(urls)}))
    )
    eng.run(max_rounds=8)
    man2 = eng.export_training_delta(out)
    assert man2["version"] == man1["version"] + 1
    assert len(man2["data_dirs"]) == 2
    # shipped: 5 fresh (one of them keeper of the in-delta pair) — the
    # released-cluster twin and the in-delta non-keeper are dropped
    assert man2["n_rows"] == man1["n_rows"] + 5
    for k, v in man1["shards"].items():
        assert man2["shards"][k] == v, "released shards must be immutable"
    new_shards = {k for k in man2["shards"] if k not in man1["shards"]}
    assert min(int(k) for k in new_shards) == man1["n_shards"]

    rel = trainset.read_training_set(spark, out).select("image_id").toPandas()
    assert rel.image_id.nunique() == len(rel) == man2["n_rows"]
    got = set(rel.image_id)
    assert released_ids <= got
    new_ids = got - released_ids
    assert len(new_ids) == 5
    # the dropped delta rows are exactly the two twin members
    all_imgs = {
        r["image_id"] for r in eng.latest_images().select("image_id").collect()
    }
    dropped = (all_imgs - v1_ids) - got
    assert len(dropped) == 2  # released-cluster twin + in-delta non-keeper
    ded = eng.image_dedup.read(spark).toPandas().set_index("image_id")
    for d in dropped:
        assert d in ded.index, "every dropped id must be in a near-dup cluster"

    # delta with nothing new: manifest advances, no new dir
    man3 = eng.export_training_delta(out)
    assert man3["version"] == man2["version"] + 1
    assert man3["data_dirs"] == man2["data_dirs"]
    assert man3["n_rows"] == man2["n_rows"]

    # a full export over the series compacts it to one dir holding the
    # exact CURRENT keeper set — which may swap a cluster representative
    # vs the append-only series: base[1] was released before its twin
    # arrived, and if the twin's id sorts lower the full recompute picks
    # the twin as keeper (the documented delta-vs-compaction semantics)
    man4 = eng.export_training_set(out, shard_rows=10)
    assert len(man4["data_dirs"]) == 1
    rel4 = trainset.read_training_set(spark, out).select("image_id").toPandas()
    cur_dups = set(ded[ded.is_dup].index)
    assert set(rel4.image_id) == all_imgs - cur_dups
    swapped = got ^ set(rel4.image_id)
    assert all(d in ded.index for d in swapped), (
        "series and compaction may differ only within near-dup clusters"
    )


def test_delta_falls_back_to_full_on_broken_history(spark, tmp_path):
    """A series whose recorded base snapshot was GC'd (or any non-append
    history) must compact via the full path, not fail or ship wrong
    deltas."""
    eng, base, mirrors = _twin_engine(spark, tmp_path)
    out = str(tmp_path / "rel")
    man1 = eng.export_training_set(out, shard_rows=10)
    # force a non-append history: expire everything but HEAD after more
    # crawling, so read_incremental(base) raises
    urls = [f"https://h1.example.com/img/x/{i}" for i in range(3)]
    eng.add_seeds(
        spark.createDataFrame(pd.DataFrame({"url": urls, "depth": [0] * 3}))
    )
    eng.run(max_rounds=8)
    eng.images.expire()
    man2 = eng.export_training_delta(out)
    assert len(man2["data_dirs"]) == 1, "fallback must be a compaction release"
    assert man2["n_rows"] == man1["n_rows"] + 3
    rel = trainset.read_training_set(spark, out)
    assert rel.select("image_id").distinct().count() == man2["n_rows"]


def test_orphan_data_dir_invisible_and_gcd(spark, tmp_path):
    eng, base, mirrors = _twin_engine(spark, tmp_path)
    out = str(tmp_path / "rel")
    man = eng.export_training_set(out, shard_rows=10)
    # a concurrent export that crashed after writing data but before
    # the manifest replace leaves an orphan dir
    orphan = os.path.join(out, "v000099-deadbeef")
    eng.latest_images().limit(3).withColumn(
        "shard", F.lit(0)
    ).write.partitionBy("shard").parquet(orphan)
    rel = trainset.read_training_set(spark, out)
    assert rel.count() == man["n_rows"]  # reader follows the manifest
    man2 = eng.export_training_set(out, shard_rows=10)
    assert man2["shards"] == man["shards"]
    assert not os.path.isdir(orphan), "expire_exports must drop orphans"


def test_mixed_export_quotas_and_determinism(spark, tmp_path):
    """Data-mixing policy on the engine release path: the manifest
    records water-filled quotas, the shipped release realizes them
    exactly, membership is hash-deterministic across re-exports, and a
    delta on a mixed series becomes a full re-mix compaction."""
    import pytest

    eng, base, mirrors = _twin_engine(spark, tmp_path)
    out = str(tmp_path / "rel")
    eng.publish_dedup()  # bring the keeper map current before counting
    # strata = image format; weights deliberately unfillable for one
    # stratum so water-filling redistributes
    shippable = eng.latest_images().join(
        eng.image_dedup.read(spark).filter("is_dup").select("image_id"),
        "image_id",
        "left_anti",
    )
    counts = {r[0]: r[1] for r in shippable.groupBy("fmt").count().collect()}
    assert len(counts) >= 2, "synth corpus must span formats"
    rare = min(counts, key=counts.get)
    mix = {
        "stratum_col": "fmt",
        "weights": {s: (10.0 if s == rare else 1.0) for s in counts},
        "total": sum(counts.values()) - 3,
        "salt": "mix-test",
    }
    man = eng.export_training_set(out, shard_rows=10, mix=mix)
    rec = man["filters"]["mix"]
    assert sum(rec["quotas"].values()) == man["n_rows"] == mix["total"]
    assert rec["quotas"][rare] == counts[rare], "short stratum ships fully"
    rel = trainset.read_training_set(spark, out)
    got = {r[0]: r[1] for r in rel.groupBy("fmt").count().collect()}
    assert got == {s: q for s, q in rec["quotas"].items()}

    # hash-determinism: a re-export ships the identical row set
    ids1 = {r[0] for r in rel.select("image_id").collect()}
    man2 = eng.export_training_set(out, shard_rows=10, mix=mix)
    assert man2["shards"] == man["shards"]

    # delta on a mixed series = full re-mix (raw API refuses, engine
    # routes to compaction with the same policy)
    with pytest.raises(ValueError, match="mix policy"):
        trainset.export_training_delta(spark, eng.latest_images(), out)
    man3 = eng.export_training_delta(out)
    assert man3["version"] == man2["version"] + 1
    assert man3["filters"]["mix"]["quotas"] == rec["quotas"]
    ids3 = {
        r[0]
        for r in trainset.read_training_set(spark, out)
        .select("image_id")
        .collect()
    }
    assert ids3 == ids1


def test_redact_captions_series(spark, tmp_path):
    """Caption PII hygiene as a series policy: the full release ships
    scrubbed captions, records the policy in the manifest, and deltas
    inherit it without being asked."""
    out = str(tmp_path / "rel_pii")

    def img_rows(ids_caps):
        return spark.createDataFrame(
            pd.DataFrame(
                {
                    "image_id": [i for i, _ in ids_caps],
                    "bytes": [b"\x89PNG" + i.encode() for i, _ in ids_caps],
                    "fmt": ["png"] * len(ids_caps),
                    "caption": [c for _, c in ids_caps],
                }
            )
        )

    base = img_rows(
        [
            ("a1", "cat photo by alice@example.com"),
            ("a2", "clean caption with no pii"),
            ("a3", "server 10.0.0.7 screenshot"),
        ]
    )
    man = trainset.export_training_set(
        spark, base, out, shard_rows=2, redact_captions=True
    )
    assert man["filters"]["redact_captions"] is True
    caps = {
        r["image_id"]: r["caption"]
        for r in trainset.read_training_set(spark, out).collect()
    }
    assert caps["a1"] == "cat photo by <EMAIL>"
    assert caps["a2"] == "clean caption with no pii"
    assert caps["a3"] == "server <IP> screenshot"

    delta = img_rows([("b1", "dial +1 (555) 123-4567 for prints")])
    man2 = trainset.export_training_delta(spark, delta, out)
    assert man2["filters"]["redact_captions"] is True
    caps2 = {
        r["image_id"]: r["caption"]
        for r in trainset.read_training_set(spark, out).collect()
    }
    assert caps2["b1"] == "dial <PHONE> for prints"
    assert len(caps2) == 4


def test_decontaminate_series(spark, tmp_path):
    """Benchmark decontamination as a series policy: the full release
    drops rows sharing an n-gram with the benchmark, attests the count
    in its manifest, pins the policy in filters — and a delta must
    re-supply the benchmark (inheriting n), dropping its own leaks."""
    out = str(tmp_path / "rel_decon")

    def img_rows(ids_caps):
        return spark.createDataFrame(
            pd.DataFrame(
                {
                    "image_id": [i for i, _ in ids_caps],
                    "bytes": [b"\x89PNG" + i.encode() for i, _ in ids_caps],
                    "fmt": ["png"] * len(ids_caps),
                    "caption": [c for _, c in ids_caps],
                }
            )
        )

    leak = "what is the capital of the republic of san marino exactly"
    bench = spark.createDataFrame(
        pd.DataFrame({"caption": [f"Q: {leak}? A: the city of san marino"]})
    )
    base = img_rows(
        [
            ("a1", f"trivia card: {leak} printed"),  # leaked benchmark text
            ("a2", "an unrelated clean caption about a bridge at dusk"),
            ("a3", "another clean caption with plenty of ordinary words"),
        ]
    )
    man = trainset.export_training_set(
        spark,
        base,
        out,
        shard_rows=2,
        decontaminate_df=bench,
        decontaminate_n=8,
    )
    assert man["filters"]["decontaminate"] == {"n": 8}
    assert man["decontamination"] == {"dropped": 1}
    shipped = {
        r["image_id"] for r in trainset.read_training_set(spark, out).collect()
    }
    assert shipped == {"a2", "a3"}

    # delta without the benchmark: policy violation, hard error
    delta = img_rows(
        [
            ("b1", f"poster with {leak} in small type"),
            ("b2", "a clean delta caption showing a harbor in the rain"),
        ]
    )
    try:
        trainset.export_training_delta(spark, delta, out)
        raise AssertionError("delta must demand the series benchmark")
    except ValueError:
        pass
    man2 = trainset.export_training_delta(
        spark, delta, out, decontaminate_df=bench
    )
    assert man2["decontamination"] == {"dropped": 1}
    shipped2 = {
        r["image_id"] for r in trainset.read_training_set(spark, out).collect()
    }
    assert shipped2 == {"a2", "a3", "b2"}


def test_mix_by_derived_host_stratum(spark, tmp_path):
    """Mix by a DERIVED stratum (the URL's host via stratum_expr): the
    column is materialized for the quota machinery only — quotas are
    per-host, hosts without weights ship nothing, and the shipped
    schema does not carry the scratch column."""
    eng, base, mirrors = _twin_engine(spark, tmp_path)
    eng.publish_dedup()
    out = str(tmp_path / "rel_host")
    hosts = [f"h{i}.example.com" for i in range(1, 4)]
    mix = {
        "stratum_col": "host",
        "stratum_expr": "parse_url(url, 'HOST')",
        "weights": {h: 1.0 for h in hosts},
        "total": 12,
        "salt": "hm",
    }
    man = eng.export_training_set(out, shard_rows=5, mix=mix)
    rec = man["filters"]["mix"]
    assert rec["stratum_expr"] == mix["stratum_expr"]
    assert set(rec["quotas"]) <= set(hosts) and sum(rec["quotas"].values()) == 12
    rel = trainset.read_training_set(spark, out)
    assert "host" not in rel.columns
    got = {
        r[0]: r[1]
        for r in rel.selectExpr("parse_url(url, 'HOST') AS h")
        .groupBy("h")
        .count()
        .collect()
    }
    assert got == rec["quotas"], "mirror hosts (no weight) ship nothing"


def test_gate_oracle_parity(spark):
    """Driver-tail gate (trainset_shard_by_rank): this test IS its hard
    oracle evidence — the driver's 50-row window never records it
    (registry contract in __spark_entry__.py)."""
    from crawlspark.ops import trainsetops as T

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
    )
    for name, fn in T.QUERIES.items():
        mine = fn(spark, sf).toPandas()
        ref = con.execute(T.ORACLES[name]).df()
        mine = mine[sorted(mine.columns)].astype(str)
        ref = ref[sorted(ref.columns)].astype(str)
        mine = mine.sort_values(list(mine.columns)).reset_index(drop=True)
        ref = ref.sort_values(list(ref.columns)).reset_index(drop=True)
        assert len(mine) > 0, name
        pd.testing.assert_frame_equal(mine, ref, obj=name)
