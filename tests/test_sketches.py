"""Seen-set sketch layer: Bloom + cuckoo filters.

Port of the reference's seen-set contract — no false negatives, false
positives tolerated (``Abot.Tests.Unit/Core/CrawledUrlRepositoryTest.cs:
60-89``, ``NoFalseNegativesTest`` over 10,000 random URLs) — at 10^4 and
10^7 keys, plus the Spark integration: the distributed bloom build, the
wave-level bloom fast path (crawl parity with the filter forced on vs
off), resume rebuild, and the per-bucket cuckoo sidecar probe/delete.
"""

from __future__ import annotations

import tempfile

import numpy as np
import pytest

from abot_spark.functions.sketches import BloomFilter, CuckooFilter


def _keys(n: int, seed: int = 7) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return np.unique(rng.integers(-2**63, 2**63 - 1, n, dtype=np.int64))


def _absent(keys: np.ndarray, n: int, seed: int = 11) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return np.setdiff1d(
        rng.integers(-2**63, 2**63 - 1, n, dtype=np.int64), keys)


# -- kernel: bloom ----------------------------------------------------------

@pytest.mark.parametrize("n", [10_000, 10_000_000])
def test_bloom_no_false_negatives(n):
    keys = _keys(n)
    bf = BloomFilter(len(keys), 0.01)
    bf.add_many(keys)
    assert not (~bf.contains_many(keys)).any()


def test_bloom_fpr_within_spec():
    keys = _keys(100_000)
    bf = BloomFilter(len(keys), 0.01)
    bf.add_many(keys)
    fpr = bf.contains_many(_absent(keys, 100_000)).mean()
    assert fpr < 0.02      # target 1%; pow2-rounded m only lowers it


def test_bloom_roundtrip_and_merge():
    a, b = _keys(5_000, 1), _keys(5_000, 2)
    bf1 = BloomFilter(20_000, 0.01)
    bf1.add_many(a)
    bf2 = BloomFilter(20_000, 0.01)
    bf2.add_many(b)
    bf1.merge_bytes(bf2.to_bytes())
    assert not (~bf1.contains_many(np.concatenate([a, b]))).any()
    back = BloomFilter.from_bytes(bf1.to_bytes(), 20_000, 0.01)
    assert not (~back.contains_many(a)).any()
    with pytest.raises(ValueError):
        BloomFilter.from_bytes(bf1.to_bytes(), 999, 0.01)


def test_bloom_empty_and_unseeded():
    bf = BloomFilter(1000, 0.01)
    bf.add_many(np.array([], dtype=np.int64))
    assert not bf.contains_many(_keys(1000)).any()   # empty filter: all new


# -- kernel: cuckoo ---------------------------------------------------------

def test_cuckoo_no_false_negatives_10k():
    keys = _keys(10_000)
    cf = CuckooFilter(20_000)
    assert cf.add_many(keys) == len(keys)
    assert not (~cf.contains_many(keys)).any()
    assert cf.contains_many(_absent(keys, 100_000)).mean() < 0.01


def test_cuckoo_delete_then_reinsert():
    keys = _keys(8_000)
    cf = CuckooFilter(16_000)
    cf.add_many(keys)
    gone, kept = keys[:2_000], keys[2_000:]
    cf.delete_many(gone)
    # deletion never breaks the remaining keys' no-false-negative contract
    assert not (~cf.contains_many(kept)).any()
    cf.add_many(gone)
    assert not (~cf.contains_many(keys)).any()


def test_cuckoo_roundtrip():
    keys = _keys(4_000)
    cf = CuckooFilter(8_000)
    cf.add_many(keys)
    back = CuckooFilter.from_bytes(cf.to_bytes(), 8_000)
    assert not (~back.contains_many(keys)).any()
    assert back.n_items == cf.n_items


# -- spark: distributed build == local build --------------------------------

def test_bloom_from_df_matches_local(spark):
    from abot_spark.functions.udfs import bloom_from_df

    keys = _keys(50_000)
    df = spark.createDataFrame(
        [(int(k),) for k in keys], "url_hash long").repartition(8)
    dist = bloom_from_df(df, "url_hash", 100_000, 0.01)
    local = BloomFilter(100_000, 0.01)
    local.add_many(keys)
    assert dist.to_bytes() == local.to_bytes()
    assert dist.n_added == len(keys)


def test_bloom_absorb_into_matches_local(spark):
    """Distributed per-bucket absorb == local add_many, and the driver
    transfer is plane-bounded (the scale contract of the wave absorb)."""
    from abot_spark.functions.udfs import absorb_into_bloom

    keys = _keys(30_000)
    # duplicate rows in the delta (seen_add skips the distinct by design)
    rows = [(int(k),) for k in keys] + [(int(k),) for k in keys[:500]]
    df = spark.createDataFrame(rows, "url_hash long").repartition(8)
    dist = BloomFilter(100_000, 0.01)
    absorb_into_bloom(df, "url_hash", dist)
    local = BloomFilter(100_000, 0.01)
    local.add_many(keys)
    assert dist.to_bytes() == local.to_bytes()
    assert dist.n_added == len(keys)      # np.unique inside partial_planes


def test_bloom_partial_planes_bucket_locality():
    """Every probe position of a key lands inside its bucket's slice, so
    merging a bucket's plane can never touch another bucket's bits."""
    bf = BloomFilter(10_000, 0.01)
    keys = _keys(2_000)
    for b, packed, n in bf.partial_planes(keys):
        bf.merge_bucket(b, packed)
    ref = BloomFilter(10_000, 0.01)
    ref.add_many(keys)
    assert bf.to_bytes() == ref.to_bytes()
    # bucket id is the signed low bits — matches JVM `url_hash & (B-1)`
    assert (bf.bucket_of(np.array([-3], dtype=np.int64))[0]
            == (-3) % bf.n_buckets)


def test_bloom_maybe_col(spark):
    from pyspark.sql import functions as F

    from abot_spark.functions.udfs import bloom_maybe_col

    keys = _keys(20_000)
    absent = _absent(keys, 20_000)
    bf = BloomFilter(50_000, 0.01)
    bf.add_many(keys)
    bc = spark.sparkContext.broadcast(bf.to_bytes())
    df = spark.createDataFrame(
        [(int(k), True) for k in keys[:5_000]]
        + [(int(k), False) for k in absent[:5_000]],
        "url_hash long, expected boolean")
    got = df.withColumn(
        "maybe", bloom_maybe_col(bc, 50_000, 0.01, F.col("url_hash")))
    # all inserted keys must probe True; absent keys may rarely FP
    assert got.filter("expected AND NOT maybe").count() == 0
    fp = got.filter("NOT expected AND maybe").count()
    assert fp < 5_000 * 0.05


# -- spark: cuckoo sidecars -------------------------------------------------

def test_cuckoo_sidecars_probe_and_delete(spark):
    from abot_spark.store import CuckooSeenSidecars

    keys = _keys(30_000)
    absent = _absent(keys, 30_000)
    seen = spark.createDataFrame([(int(k),) for k in keys], "url_hash long")
    side = CuckooSeenSidecars(
        spark, tempfile.mkdtemp(prefix="abot-cuckoo-"),
        n_buckets=16, capacity_per_bucket=8_000)
    assert side.rebuild(seen) == 0      # nothing overflow-dropped

    probe = spark.createDataFrame(
        [(int(k), True) for k in keys[:3_000]]
        + [(int(k), False) for k in absent[:3_000]],
        "url_hash long, expected boolean")
    got = side.probe(probe)
    assert got.filter("expected AND NOT maybe_seen").count() == 0
    assert got.filter("NOT expected AND maybe_seen").count() < 3_000 * 0.02

    # recrawl retraction: deleted marks probe False again
    side.delete(seen.limit(0).unionAll(
        spark.createDataFrame([(int(k),) for k in keys[:1_000]],
                              "url_hash long")))
    got2 = side.probe(spark.createDataFrame(
        [(int(k),) for k in keys[:1_000]], "url_hash long"))
    # fingerprints are 16-bit: a deleted key stays "maybe" only if another
    # live key shares its (bucket, fingerprint) — rare
    assert got2.filter("maybe_seen").count() < 1_000 * 0.02


# -- wave integration: bloom fast path is invisible to semantics ------------

def test_crawl_parity_bloom_on_vs_off(spark):
    from abot_spark.config import CrawlConfig
    from abot_spark.crawler import WaveCrawler
    from abot_spark.sources.synthetic_web import generate_web, write_parquet

    fx = generate_web(n_domains=2, sections=2, leaves=2)
    tmp = tempfile.mkdtemp(prefix="abot-bloomweb-")
    paths = write_parquet(fx, tmp)
    pages = spark.read.parquet(paths["pages"])
    robots = spark.read.parquet(paths["robots"])

    def run(cfg):
        wdir = tempfile.mkdtemp(prefix="abot-bloomcrawl-")
        c = WaveCrawler(spark, cfg, wdir, pages, robots)
        state = c.crawl(["http://d0.example.com/"], max_waves=30)
        fetched = c.store.read_all("fetched", state.wave)
        order = [r["url"] for r in fetched.orderBy("seq").collect()]
        seen = {r["url_hash"]
                for r in c.store.read_all("seen", state.wave + 1).collect()}
        return order, seen, c, state

    base = CrawlConfig(is_respect_robots_dot_text_enabled=True)
    # min_rows=0 forces the bloom path from wave 0 even on a tiny crawl
    on = base.with_(use_seen_bloom=True, seen_bloom_min_rows=0)
    off = base.with_(use_seen_bloom=False)
    order_on, seen_on, c_on, state_on = run(on)
    order_off, seen_off, _, _ = run(off)
    assert order_on == order_off
    assert seen_on == seen_off

    # the sidecar snapshot matches the table it indexes (resume path)
    loaded = c_on.store.load_bloom(state_on.wave + 1)
    assert loaded is not None
    bf = loaded[0]
    hashes = np.array(sorted(seen_on), dtype=np.int64)
    assert not (~bf.contains_many(hashes)).any()
    assert bf.n_added == len(hashes)
