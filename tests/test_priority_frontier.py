"""Priority-frontier GetNext order (``CrawlConfig.frontier_order``).

The reference's queue is strict FIFO
(``Abot/Core/Repositories/QueueOfPagesToCrawlRepository.cs:15-55``); the
scheduler interface is documented as "managing the priority of what pages
need to be crawled" (``Abot/Core/Repositories/IScheduler.cs:8``).  Our
priority variant orders GetNext-under-quota by ``(depth asc, crawl_delay
asc, seq)`` instead of ``seq`` — shallow pages first when politeness
truncates a domain's wave.  The BFS wave loop is already depth-priority
globally; heterogeneous depths inside one wave come from deferred, retry,
and redirect rows.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import types as T

from abot_spark.config import CrawlConfig
from abot_spark.crawler import WaveCrawler

SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("seq", T.LongType()),
    T.StructField("depth", T.IntegerType()),
    T.StructField("domain", T.StringType()),
    T.StructField("not_before_ms", T.LongType()),
    T.StructField("is_retry", T.BooleanType()),
])

# one domain, mixed depths, enqueue order (seq) anti-correlated with depth:
# a deferred shallow row (depth 0) carries a HIGHER seq than deep rows
ROWS = [
    ("http://d/a", 1, 2, "d", 0, False),
    ("http://d/b", 2, 1, "d", 0, False),
    ("http://d/c", 3, 0, "d", 0, False),
    ("http://d/e", 4, 1, "e", 0, False),
]


def _due(spark, cfg):
    crawler = WaveCrawler(spark, cfg, tempfile.mkdtemp(prefix="abot-prio-"),
                          spark.createDataFrame([], "url string, html binary"))
    frontier = spark.createDataFrame(ROWS, SCHEMA)
    due, deferred, _ = crawler._politeness_split(frontier, {}, wave_ts=0)
    return ({r["url"] for r in due.collect()},
            {r["url"] for r in deferred.collect()} if deferred is not None
            else set())


def test_fifo_quota_pops_lowest_seq(spark):
    # 60 s horizon / 60 s delay => quota 1 per domain per wave
    cfg = CrawlConfig(min_crawl_delay_per_domain_milli_seconds=60_000)
    due, deferred = _due(spark, cfg)
    assert due == {"http://d/a", "http://d/e"}
    assert deferred == {"http://d/b", "http://d/c"}


def test_priority_quota_pops_shallowest(spark):
    cfg = CrawlConfig(min_crawl_delay_per_domain_milli_seconds=60_000,
                      frontier_order="priority")
    due, deferred = _due(spark, cfg)
    assert due == {"http://d/c", "http://d/e"}  # depth 0 wins despite seq 3
    assert deferred == {"http://d/a", "http://d/b"}


def test_priority_tie_breaks_by_seq(spark):
    cfg = CrawlConfig(min_crawl_delay_per_domain_milli_seconds=30_000,
                      frontier_order="priority")
    due, _ = _due(spark, cfg)  # quota 2: depth 0 then the depth-1 lower seq
    assert due == {"http://d/c", "http://d/b", "http://d/e"}


def test_priority_without_quota_is_all_due(spark):
    cfg = CrawlConfig(frontier_order="priority")
    due, deferred = _due(spark, cfg)
    assert due == {r[0] for r in ROWS} and deferred == set()


def test_bucketed_rank_matches_plain_window(spark):
    """The two-phase domain_quota_rank (scale path for hot-domain skew)
    must reproduce the plain per-domain window's due/deferred split
    exactly — differential over a skewed random frontier, both order
    modes, several delay settings."""
    import random

    rng = random.Random(7)
    rows, seq = [], 0
    for _ in range(400):
        dom = f"d{min(int(rng.expovariate(0.9)), 5)}"  # Zipf-ish skew
        depth = rng.randrange(4)
        nb = 0 if rng.random() < 0.9 else 10_000  # some not-yet-due rows
        rows.append((f"http://{dom}/p{seq}", seq, depth, dom, nb,
                     rng.random() < 0.1))
        seq += 1
    frontier = spark.createDataFrame(rows, SCHEMA)
    delays = {"d0": 5_000, "d1": 20_000}
    empty_pages = spark.createDataFrame([], "url string, html binary")

    def split(cfg, scale):
        c = WaveCrawler(spark, cfg, tempfile.mkdtemp(prefix="abot-rank-"),
                        empty_pages)
        kw = dict(n_frontier=len(rows), seq_hi=seq) if scale else {}
        due, deferred, stats = c._politeness_split(
            frontier, delays, wave_ts=0, **kw)
        s = {r["_due"]: (r["n"], r["n_retry"], r["elapsed_ms"])
             for r in stats.collect()}
        return ({r["url"] for r in due.collect()},
                ({r["url"] for r in deferred.collect()}
                 if deferred is not None else set()),
                s)

    for order in ("fifo", "priority"):
        for base in (0, 3_000, 60_000):
            plain = split(CrawlConfig(
                min_crawl_delay_per_domain_milli_seconds=base,
                frontier_order=order, politeness_rank_scale_rows=0),
                scale=False)
            scaled = split(CrawlConfig(
                min_crawl_delay_per_domain_milli_seconds=base,
                frontier_order=order, politeness_rank_scale_rows=1),
                scale=True)
            assert scaled == plain, (order, base)


def test_bucketed_rank_plan_has_no_single_partition_exchange(spark):
    """Plan guard (VERDICT r1 #9): above politeness_rank_scale_rows the
    quota rank must run the two-phase bucketed plan — no Exchange
    SinglePartition anywhere in the due split's physical plan, and the
    rank window keyed by the seq bucket, so one hot Zipf domain can
    never become a single giant window partition."""
    rows = [(f"http://hot/p{i}", i, 0, "hot", 0, False) for i in range(50)]
    frontier = spark.createDataFrame(rows, SCHEMA)
    empty_pages = spark.createDataFrame([], "url string, html binary")
    for order in ("fifo", "priority"):
        cfg = CrawlConfig(min_crawl_delay_per_domain_milli_seconds=1_000,
                          frontier_order=order,
                          politeness_rank_scale_rows=1)
        c = WaveCrawler(spark, cfg, tempfile.mkdtemp(prefix="abot-rank-"),
                        empty_pages)
        due, _, _ = c._politeness_split(frontier, {}, wave_ts=0,
                                        n_frontier=len(rows), seq_hi=50)
        plan = due._jdf.queryExecution().executedPlan().toString()
        assert "SinglePartition" not in plan, (order, plan)
        assert "_bkt" in plan, (order, "bucketed window missing")
