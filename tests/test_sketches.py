"""Seen-set sketch layer: Bloom + cuckoo filters.

Port of the reference's seen-set contract — no false negatives, false
positives tolerated (``Abot.Tests.Unit/Core/CrawledUrlRepositoryTest.cs:
60-89``, ``NoFalseNegativesTest`` over 10,000 random URLs) — at 10^4 and
10^7 keys, plus the Spark integration: the sharded per-bucket
bloom sidecar (absorb/probe/recovery), the wave-level bloom fast path
(crawl parity with the filter forced on vs off), and the per-bucket
cuckoo sidecar probe/delete.
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


def test_bloom_roundtrip():
    a = _keys(5_000, 1)
    bf1 = BloomFilter(20_000, 0.01)
    bf1.add_many(a)
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


# -- spark: sharded bloom sidecars ------------------------------------------

def test_bloom_shards_no_false_negatives_10m(spark):
    """The seen-set contract (CrawledUrlRepositoryTest.cs:60-89) at 10^7
    keys against the SHARDED sidecar: absorb distributed, probe bucket-
    locally, zero false negatives; FPR on absent keys within spec."""
    from pyspark.sql import functions as F

    from abot_spark.store import BloomSeenShards

    shards = BloomSeenShards(
        tempfile.mkdtemp(prefix="abot-bshards-"), n_shards=64,
        expected_items=10_000_000, fpp=0.01)
    present = spark.range(10_000_000).select(
        F.xxhash64("id").alias("url_hash"))
    shards.absorb(present, "url_hash", wave=0)
    assert shards.absorbed_through(0) == 0

    got = shards.prober(0).probe(present, num_partitions=32)
    assert got.filter("NOT maybe_seen").count() == 0   # no false negatives

    absent = spark.range(10_000_000, 10_200_000).select(
        F.xxhash64("id").alias("url_hash"))
    fp = shards.prober(0).probe(absent).filter("maybe_seen").count()
    assert fp < 200_000 * 0.02   # target 1%; pow2-rounded m only lowers it


def test_bloom_shards_incremental_waves_and_recovery(spark):
    """Wave-incremental absorbs accumulate; drop_after rolls partially-
    absorbed waves back so an older marker never over-claims coverage."""
    from abot_spark.store import BloomSeenShards

    a, b = _keys(20_000, 1), _keys(20_000, 2)
    base = tempfile.mkdtemp(prefix="abot-bshards-")
    shards = BloomSeenShards(base, n_shards=16,
                             expected_items=100_000, fpp=0.01)
    df_a = spark.createDataFrame([(int(k),) for k in a], "url_hash long")
    df_b = spark.createDataFrame([(int(k),) for k in b], "url_hash long")
    shards.absorb(df_a, "url_hash", wave=0)
    shards.absorb(df_b, "url_hash", wave=1)
    assert shards.absorbed_through(5) == 1

    both = spark.createDataFrame(
        [(int(k),) for k in np.concatenate([a, b])], "url_hash long")
    assert shards.prober(1).probe(both).filter("NOT maybe_seen").count() == 0

    # crash recovery: drop wave 1 -> marker and files gone, wave-0 state
    # intact (b keys mostly unknown again, a keys all still present)
    BloomSeenShards.drop_after(base, keep_through=0)
    assert shards.absorbed_through(5) == 0
    p0 = shards.prober(0)
    assert p0.probe(df_a).filter("NOT maybe_seen").count() == 0
    assert p0.probe(df_b).filter("maybe_seen").count() < len(b) * 0.05


def test_bloom_shards_rebuild_replaces_stale(spark):
    """rebuild() discards whatever was on disk — the resume path for a
    lost/stale sidecar under an engaged-size seen table."""
    from abot_spark.store import BloomSeenShards

    stale, live = _keys(5_000, 3), _keys(5_000, 4)
    base = tempfile.mkdtemp(prefix="abot-bshards-")
    shards = BloomSeenShards(base, n_shards=8,
                             expected_items=50_000, fpp=0.01)
    shards.absorb(spark.createDataFrame(
        [(int(k),) for k in stale], "url_hash long"), "url_hash", wave=0)
    shards.rebuild(spark.createDataFrame(
        [(int(k),) for k in live], "url_hash long"), "url_hash", wave=3)
    assert shards.absorbed_through(3) == 3
    p = shards.prober(3)
    assert p.probe(spark.createDataFrame(
        [(int(k),) for k in live], "url_hash long")) \
        .filter("NOT maybe_seen").count() == 0
    assert p.probe(spark.createDataFrame(
        [(int(k),) for k in np.setdiff1d(stale, live)], "url_hash long")) \
        .filter("maybe_seen").count() < 5_000 * 0.05


def test_bloom_shards_layout_change_drops_sidecar(spark):
    """ADVICE r2: changing bloom_n_shards between runs remaps pmod
    buckets — old shard files probed under the new mapping would yield
    false negatives even though each file's own header still validates.
    The persisted layout meta must detect the mismatch and drop the
    sidecar (markers included) so the caller rebuilds or runs without
    the fast path; a same-layout reopen must keep everything."""
    import os

    from abot_spark.store import BloomSeenShards

    keys = _keys(10_000, 7)
    base = tempfile.mkdtemp(prefix="abot-bshards-")
    df = spark.createDataFrame([(int(k),) for k in keys], "url_hash long")
    shards = BloomSeenShards(base, n_shards=8,
                             expected_items=40_000, fpp=0.01)
    shards.absorb(df, "url_hash", wave=0)
    assert shards.absorbed_through(0) == 0

    # same layout -> sidecar intact across reopen
    again = BloomSeenShards(base, n_shards=8,
                            expected_items=40_000, fpp=0.01)
    assert again.absorbed_through(0) == 0
    assert again.prober(0).probe(df).filter("NOT maybe_seen").count() == 0

    # n_shards doubled with expected_items scaled proportionally: the
    # per-shard geometry is unchanged (the trap in the advice), but the
    # bucket mapping is not — the constructor must wipe the sidecar
    changed = BloomSeenShards(base, n_shards=16,
                              expected_items=80_000, fpp=0.01)
    assert changed.absorbed_through(0) is None
    assert not any(n.startswith("bucket=") for n in os.listdir(base))


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

    # the shard sidecar matches the table it indexes (resume path): the
    # marker proves coverage through wave+1 and every seen hash probes True
    shards = c_on._seen_shards
    assert shards.absorbed_through(state_on.wave + 1) == state_on.wave + 1
    probe = spark.createDataFrame(
        [(int(h),) for h in sorted(seen_on)], "url_hash long")
    got = shards.prober(state_on.wave + 1).probe(probe)
    assert got.filter("NOT maybe_seen").count() == 0


def test_crawl_resume_with_bloom_forced_on(spark):
    """Kill-and-resume with the sharded sidecar live from wave 0: the
    resumed crawl must equal the uninterrupted one (shard files + wave
    markers are the recovered state) and end with a marker proving
    coverage through the final wave."""
    import tempfile

    from abot_spark.config import CrawlConfig
    from abot_spark.crawler import WaveCrawler
    from abot_spark.sources.synthetic_web import generate_web, write_parquet

    fx = generate_web(n_domains=2, sections=2, leaves=2)
    paths = write_parquet(fx, tempfile.mkdtemp(prefix="abot-bres-"))
    pages = spark.read.parquet(paths["pages"])
    robots = spark.read.parquet(paths["robots"])
    cfg = CrawlConfig(is_respect_robots_dot_text_enabled=True,
                      use_seen_bloom=True, seen_bloom_min_rows=0,
                      bloom_n_shards=8)
    seed = "http://d0.example.com/"

    full = WaveCrawler(spark, cfg, tempfile.mkdtemp(prefix="abot-bresf-"),
                       pages, robots)
    st_full = full.crawl([seed], max_waves=30)
    want = [r["url"] for r in full.store.read_all(
        "fetched", st_full.wave).orderBy("seq").collect()]

    wdir = tempfile.mkdtemp(prefix="abot-bresi-")
    c1 = WaveCrawler(spark, cfg, wdir, pages, robots)
    c1.crawl([seed], max_waves=2)   # interrupt after wave 1
    c2 = WaveCrawler(spark, cfg, wdir, pages, robots)
    c2._seed_auths = ("d0.example.com",)
    st2 = c2.resume()
    got = [r["url"] for r in c2.store.read_all(
        "fetched", st2.wave).orderBy("seq").collect()]
    assert got == want
    assert c2._seen_shards.absorbed_through(st2.wave + 1) == st2.wave + 1
