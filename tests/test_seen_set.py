"""URL-seen set at scale — port of the reference's randomized contract.

``Abot.Tests.Unit/Core/CrawledUrlRepositoryTest.cs:60-89``: 10,000 random
GUID URLs added to the compact (hashed) repository must produce ZERO false
negatives — a URL marked seen must always test as known afterward; false
positives (hash collisions) are tolerated by design (:9-11).

Our seen-set key is ``xxhash64(canonical_url)`` with bucketed appends; the
membership test is the same left-join used by ``schedule_wave``.
"""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F


def test_no_false_negatives_10k(spark):
    rng_urls = [f"http://x{uuid.uuid4().hex[:8]}.example.com/{uuid.uuid4().hex}"
                for _ in range(10_000)]
    urls = spark.createDataFrame([(u,) for u in rng_urls], "url string")
    seen = urls.select(F.xxhash64("url").alias("url_hash"),
                       (F.pmod(F.xxhash64("url"), F.lit(64))).alias("bucket"))
    # membership probe: every inserted URL must be found (anti-join empty)
    probe = urls.select(F.xxhash64("url").alias("url_hash"))
    missing = probe.join(seen.select("url_hash"), "url_hash", "left_anti")
    assert missing.count() == 0
    # bucketing is total and stable
    assert seen.filter(F.col("bucket").isNull()).count() == 0
    assert seen.select("bucket").distinct().count() <= 64


def test_unseen_urls_probe_negative(spark):
    a = spark.range(5000).select(
        F.concat(F.lit("http://a.example.com/p/"), "id").alias("url"))
    b = spark.range(5000, 10000).select(
        F.concat(F.lit("http://a.example.com/p/"), "id").alias("url"))
    seen = a.select(F.xxhash64("url").alias("url_hash"))
    hits = b.select(F.xxhash64("url").alias("url_hash")) \
        .join(seen, "url_hash", "inner")
    # disjoint URL sets: collisions allowed in principle, none expected here
    assert hits.count() == 0


def _fake_seen(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.concat(F.lit("http://c.example.com/p/"), "id").alias("url")
    ).select(F.xxhash64("url").alias("url_hash"), "url")


def test_seen_compaction_preserves_set_and_prunes(spark, tmp_path):
    """compact_seen = Iceberg rewrite_data_files + expire_snapshots on the
    parquet stand-in: one bucketed snapshot replaces the per-wave appends,
    read_all is unchanged, crash leftovers are swept by recovery."""
    import os

    from abot_spark.store import CrawlStore

    store = CrawlStore(spark, str(tmp_path))
    for w in range(4):
        store.write_wave("seen", w, _fake_seen(spark, w * 100, (w + 1) * 100))
    before = {r["url_hash"] for r in store.read_all("seen", 3).collect()}

    store.compact_seen(2, num_buckets=4)
    # waves 0..2 collapsed into one snapshot; wave 3 delta still unioned in
    assert store.latest_compact("seen", 3) == 2
    assert not any(os.path.exists(store.wave_path("seen", w)) for w in range(3))
    assert os.path.exists(store.wave_path("seen", 3))
    assert {r["url_hash"]
            for r in store.read_all("seen", 3).collect()} == before
    # a second compaction supersedes (and expires) the first
    store.compact_seen(3, num_buckets=4)
    assert store.latest_compact("seen", 99) == 3
    assert not os.path.exists(store.compact_path("seen", 2))
    assert {r["url_hash"]
            for r in store.read_all("seen", 3).collect()} == before

    # crash recovery: a half-written .tmp and a snapshot covering waves
    # newer than the committed manifest are both partial work -> removed
    os.makedirs(store.compact_path("seen", 9) + ".tmp")
    os.makedirs(store.compact_path("seen", 9))
    store.drop_waves_after(3)  # committed wave 3 -> seen valid through 4
    assert not os.path.exists(store.compact_path("seen", 9))
    assert not os.path.exists(store.compact_path("seen", 9) + ".tmp")
    assert os.path.exists(store.compact_path("seen", 3))


def test_bucketed_seen_antijoin_has_no_exchange(spark, tmp_path):
    """Plan guard for the SURVEY §4 storage-partitioned seen probe
    (VERDICT r3 #4): when the accumulated seen table and the wave's
    candidate hashes are bucketed identically on url_hash, the LEFT ANTI
    membership probe plans with ZERO Exchange operators — bucket i
    anti-joins bucket i file-locally, nothing shuffles at any scale.
    tools/explain_bucketed_antijoin.py is the at-volume witness."""
    from pyspark.sql import functions as F

    prev_wh = spark.conf.get("spark.sql.warehouse.dir", None)
    prev_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        seen = spark.range(500).select(
            F.xxhash64(F.col("id").cast("string")).alias("url_hash"))
        cand = spark.range(200).select(
            F.xxhash64((F.col("id") + 400).cast("string")).alias("url_hash"))
        spark.sql("DROP TABLE IF EXISTS _t_seen_b")
        spark.sql("DROP TABLE IF EXISTS _t_cand_b")
        seen.write.bucketBy(4, "url_hash").sortBy("url_hash") \
            .mode("overwrite").saveAsTable("_t_seen_b")
        cand.write.bucketBy(4, "url_hash").sortBy("url_hash") \
            .mode("overwrite").saveAsTable("_t_cand_b")
        anti = spark.table("_t_cand_b").join(
            spark.table("_t_seen_b"), "url_hash", "left_anti")
        plan = anti._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert plan.count("Bucketed: true") == 2, plan
        # and it computes the right thing: ids 400..499 are in both
        assert anti.count() == 100
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bc)
        spark.sql("DROP TABLE IF EXISTS _t_seen_b")
        spark.sql("DROP TABLE IF EXISTS _t_cand_b")
