"""Named ports of the reference's scheduler / queue / rate-limiter suites.

The reference splits these contracts across
``Abot.Tests.Unit/Core/SchedulerTest.cs`` (AddIfNew gating, retry and
recrawl bypasses, GetNext delegation),
``Abot.Tests.Unit/Core/FifoPagesToCrawlRepositoryTest.cs`` (strict FIFO
Add/GetNext order) and
``Abot.Tests.Unit/Core/DomainRateLimiterTest.cs`` +
``Abot.Tests.Unit/Util/RateLimiterTest.cs`` (per-domain delay
resolution and pacing).  In this engine the Scheduler is not an object:
``plans.wave.schedule_wave`` is the set-algebra equivalent of
``Scheduler.Add`` (dedup + enqueue) and ``WaveCrawler._politeness_split``
of ``GetNext`` + ``DomainRateLimiter.RateLimit``.  Each test below names
the reference test it re-expresses.
"""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

import abot_spark.plans.wave as W
from abot_spark.config import CrawlConfig
from abot_spark.crawler import CrawlState, WaveCrawler

CAND_FIELDS = [
    ("url", T.StringType()),
    ("domain", T.StringType()),
    ("path", T.StringType()),
    ("parent_seq", T.LongType()),
    ("parent_url", T.StringType()),
    ("depth", T.IntegerType()),
    ("pos", T.IntegerType()),
    ("kind", T.IntegerType()),
    ("is_retry", T.BooleanType()),
    ("retry_count", T.IntegerType()),
    ("redirected_from", T.StringType()),
    ("redirect_position", T.IntegerType()),
]
CAND_SCHEMA = T.StructType([T.StructField(n, t) for n, t in CAND_FIELDS])

ROOT = ("a.com", "a.com")


def _link(url, parent_seq=0, pos=0, kind=1, depth=1):
    dom = url.split("/")[2]
    path = "/" + url.split("/", 3)[3] if url.count("/") >= 3 else "/"
    return (url, dom, path, parent_seq, f"http://{dom}/", depth, pos, kind,
            False, 0, None, 0)


def _schedule(spark, cfg, cand_rows, seen_urls=(), retries=None, **kw):
    cand = spark.createDataFrame(cand_rows, CAND_SCHEMA)
    seen = None
    if seen_urls:
        seen = spark.createDataFrame(
            [(u,) for u in seen_urls], "url string"
        ).select(F.xxhash64("url").alias("url_hash"))
    events = spark.createDataFrame(
        [], "seq long, domain string, is_retry boolean")
    args = dict(budget_used=0, next_seq=1, latched=False,
                root_authorities=ROOT, wave_ts_ms=0, num_partitions=4)
    args.update(kw)
    return W.schedule_wave(cand, retries, events, seen, None, None, cfg,
                           **args)


# ---------------------------------------------------------------------------
# SchedulerTest.cs — Scheduler.Add semantics
# ---------------------------------------------------------------------------

def test_add_new_url_added_to_both_repos(spark):
    """``Add_UriRecrawlingDisabled_UrlHasNotBeenCrawled_AddsToBothRepos``:
    a novel link is enqueued (admitted) AND recorded in the seen set."""
    cfg = CrawlConfig()
    out = _schedule(spark, cfg, [_link("http://a.com/x")],
                    seen_urls=["http://a.com/"])
    assert [r["url"] for r in out["admitted"].collect()] == ["http://a.com/x"]
    assert {r["url"] for r in out["seen_add"].collect()} == {"http://a.com/x"}


def test_add_known_url_not_queued(spark):
    """``Add_UriRecrawlingDisabled_UrlHasBeenCrawled_DoesNotAddToPages
    ToCrawlRepo``: a known URL is neither enqueued nor re-appended."""
    cfg = CrawlConfig()
    out = _schedule(spark, cfg, [_link("http://a.com/x")],
                    seen_urls=["http://a.com/", "http://a.com/x"])
    assert out["admitted"].count() == 0
    assert out["seen_add"].count() == 0


def test_retry_bypasses_addifnew(spark):
    """``Add_UriRecrawlingDisabled_UrlHasBeenCrawled_IsRetry_AddsToBoth
    Repos``: a retry re-enters the queue without touching the seen set
    (``Scheduler.cs:78-86`` skips AddIfNew when ``IsRetry``)."""
    cfg = CrawlConfig(max_retry_count=1)
    url = "http://a.com/x"
    retries = spark.createDataFrame(
        [(url, "a.com", "/x", None, 0, 1, 1, 1, True, 1, None, 0, True,
          0, False)],
        "url string, domain string, path string, parent_url string, "
        "parent_seq long, depth int, kind int, pos int, is_retry boolean, "
        "retry_count int, redirected_from string, redirect_position int, "
        "is_internal boolean, not_before_ms long, is_root boolean")
    out = _schedule(spark, cfg, [], seen_urls=[url], retries=retries)
    assert [r["url"] for r in out["admitted"].collect()] == [url]
    assert out["seen_add"].count() == 0


def test_recrawl_enabled_direct_add_requeued_links_still_deduped(spark):
    """``Add_UriRecrawlingEnabled_AddsToPagesToCrawlRepo``: with
    ``AllowUriRecrawling`` the direct ``Scheduler.Add`` path (redirect
    children, kind 0) bypasses AddIfNew — but parsed links still hit the
    ``IsUriKnown`` pre-check in ``SchedulePageLinks``
    (``WebCrawler.cs:1113-1117``), so a known kind-1 link stays deduped."""
    cfg = CrawlConfig(is_uri_recrawling_enabled=True)
    known = "http://a.com/x"
    out = _schedule(
        spark, cfg,
        [_link(known, kind=0), _link(known, parent_seq=1, kind=1)],
        seen_urls=[known])
    got = [(r["url"], r["kind"]) for r in out["admitted"].collect()]
    assert got == [(known, 0)]


def test_getnext_fifo_order(spark):
    """``FifoPagesToCrawlRepositoryTest`` / the commented ``GetNext``
    matrix in SchedulerTest: pages come back in strict Add order.  Our
    Add order is (parent_seq, kind, pos); assigned ``seq`` must rank the
    admitted set exactly in that order regardless of input row order."""
    cfg = CrawlConfig()
    rows = [_link("http://a.com/c", parent_seq=2, pos=0),
            _link("http://a.com/b", parent_seq=1, pos=1),
            _link("http://a.com/a", parent_seq=1, pos=0),
            _link("http://a.com/r", parent_seq=1, pos=0, kind=0)]
    out = _schedule(spark, cfg, rows, seen_urls=["http://a.com/"])
    got = [r["url"] for r in out["admitted"].orderBy("seq").collect()]
    # kind 0 (direct Add from redirect handling) precedes links at the
    # same parent, mirroring ProcessRedirect running before ParsePageLinks
    assert got == ["http://a.com/r", "http://a.com/a", "http://a.com/b",
                   "http://a.com/c"]


def test_duplicate_in_wave_enqueued_once(spark):
    """``CrawledUrlRepositoryTest`` AddIfNew contract applied in-wave: the
    same URL offered twice in one wave is enqueued exactly once (first
    occurrence in Add order wins)."""
    cfg = CrawlConfig()
    rows = [_link("http://a.com/x", parent_seq=1, pos=0),
            _link("http://a.com/x", parent_seq=1, pos=1)]
    out = _schedule(spark, cfg, rows, seen_urls=["http://a.com/"])
    adm = out["admitted"].collect()
    assert [(r["url"], r["pos"]) for r in adm] == [("http://a.com/x", 0)]


# ---------------------------------------------------------------------------
# DomainRateLimiterTest.cs / RateLimiterTest.cs — delay resolution + pacing
# ---------------------------------------------------------------------------

def _scale_mode_delays(c):
    """Effective per-domain robots delays in per_domain (scale) mode: the
    Crawl-delay slice of the distributed rules table (crawler._prepare),
    which replaced the driver-side _robots_delay_ms dict there."""
    if c._robots_delays_df is not None:
        return {r["domain"]: r["_robots_delay_ms"]
                for r in c._robots_delays_df.collect()}
    return c._effective_delays()


def _crawler_with_robots(spark, cfg, robots_rows):
    robots = spark.createDataFrame(robots_rows,
                                   "domain string, robots_txt string")
    pages = spark.createDataFrame(
        [], "url string, status_code int, content_type string, "
            "html binary, retry_after string, x_robots_tag string, "
            "error string, location string")
    c = WaveCrawler(spark, cfg, tempfile.mkdtemp(prefix="abot-rl-"),
                    pages, robots)
    c.per_domain_robots = True
    state = CrawlState()
    state.root_authority = "a.com"
    c._prepare(state)
    return c


def test_robots_delay_below_config_uses_config(spark):
    """``AddDomain_ParamLessThanDefault_UsesDefault``: a robots
    Crawl-delay smaller than the config minimum does not lower the
    effective delay (``PoliteWebCrawler.cs:146-167`` registers robots
    delay only when larger)."""
    cfg = CrawlConfig(is_respect_robots_dot_text_enabled=True,
                      min_crawl_delay_per_domain_milli_seconds=5000)
    c = _crawler_with_robots(
        spark, cfg, [("a.com", "User-agent: *\nCrawl-delay: 2\n")])
    assert _scale_mode_delays(c) == {}  # falls back to the 5000ms config


def test_robots_delay_above_config_overrides(spark):
    """``AddDomain_ParamGreaterThanDefault_UsesParam``: a larger robots
    Crawl-delay overrides the config minimum for that domain only."""
    cfg = CrawlConfig(is_respect_robots_dot_text_enabled=True,
                      min_crawl_delay_per_domain_milli_seconds=1000,
                      max_robots_dot_text_crawl_delay_in_seconds=10)
    c = _crawler_with_robots(
        spark, cfg, [("a.com", "User-agent: *\nCrawl-delay: 7\n"),
                     ("b.com", "User-agent: *\n")])
    assert _scale_mode_delays(c) == {"a.com": 7000}


def test_robots_delay_capped_by_config_max(spark):
    """``PoliteWebCrawler.cs:146-157``: robots Crawl-delay is capped at
    ``MaxRobotsDotTextCrawlDelayInSeconds`` before comparison."""
    cfg = CrawlConfig(is_respect_robots_dot_text_enabled=True,
                      min_crawl_delay_per_domain_milli_seconds=1000,
                      max_robots_dot_text_crawl_delay_in_seconds=3)
    c = _crawler_with_robots(
        spark, cfg, [("a.com", "User-agent: *\nCrawl-delay: 9999\n")])
    assert _scale_mode_delays(c) == {"a.com": 3000}


def test_rate_limit_same_domain_waits_between_requests(spark):
    """``RateLimiterTest`` token semantics on the simulated clock: with
    delay d, one wave admits at most ``floor(wave_ms / d)`` same-domain
    fetches and charges ``n_due * d`` of simulated politeness time —
    i.e. 3 pages at 1000 ms cost >= 2000 ms of clock, the assertion of
    ``RateLimit_SameDomain_WaitsBetweenRequests`` /
    ``CrawlSiteSimulator.cs:144-164``."""
    cfg = CrawlConfig(min_crawl_delay_per_domain_milli_seconds=30_000)
    pages = spark.createDataFrame([], "url string, html binary")
    c = WaveCrawler(spark, cfg, tempfile.mkdtemp(prefix="abot-rl2-"), pages)
    frontier = spark.createDataFrame(
        [(f"http://a.com/{i}", i, 0, "a.com", 0, False) for i in range(3)],
        "url string, seq long, depth int, domain string, "
        "not_before_ms long, is_retry boolean")
    due, deferred, stats = c._politeness_split(frontier, {}, wave_ts=0)
    rows = {r["_due"]: r for r in stats.collect()}
    assert rows[True]["n"] == 2          # floor(60s / 30s) = 2 per wave
    assert rows[False]["n"] == 1         # third defers to the next wave
    assert rows[True]["elapsed_ms"] == 60_000  # 2 fetches x 30s charged


def test_rate_limit_different_domains_do_not_wait(spark):
    """``RateLimit_DifferentDomain_DoesNotWaitsBetweenRequests``: domains
    pace independently — one page each on two domains all run in wave 0."""
    cfg = CrawlConfig(min_crawl_delay_per_domain_milli_seconds=30_000)
    pages = spark.createDataFrame([], "url string, html binary")
    c = WaveCrawler(spark, cfg, tempfile.mkdtemp(prefix="abot-rl3-"), pages)
    frontier = spark.createDataFrame(
        [("http://a.com/", 0, 0, "a.com", 0, False),
         ("http://b.com/", 1, 0, "b.com", 0, False)],
        "url string, seq long, depth int, domain string, "
        "not_before_ms long, is_retry boolean")
    due, deferred, stats = c._politeness_split(frontier, {}, wave_ts=0)
    assert due.count() == 2 and (deferred is None or deferred.count() == 0)


def test_zero_delay_does_not_wait(spark):
    """``RateLimit_ZeroAsDefault_SameDomain_DoesNotWaitsBetweenRequests``:
    no configured delay -> the whole frontier is due in one wave."""
    cfg = CrawlConfig(min_crawl_delay_per_domain_milli_seconds=0)
    pages = spark.createDataFrame([], "url string, html binary")
    c = WaveCrawler(spark, cfg, tempfile.mkdtemp(prefix="abot-rl4-"), pages)
    frontier = spark.createDataFrame(
        [(f"http://a.com/{i}", i, 0, "a.com", 0, False) for i in range(50)],
        "url string, seq long, depth int, domain string, "
        "not_before_ms long, is_retry boolean")
    due, deferred, _ = c._politeness_split(frontier, {}, wave_ts=0)
    assert due.count() == 50 and deferred is None
