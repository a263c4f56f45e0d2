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
