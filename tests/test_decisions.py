"""Port of Abot.Tests.Unit/Core/CrawlDecisionMakerTest.cs (:33-852) against
the pure decision layer, plus pure-vs-Column equivalence on Spark."""

from __future__ import annotations

import pytest

from abot_spark.config import CrawlConfig
from abot_spark.operators.decisions import (
    ContextView,
    PageView,
    decide_should_crawl_page,
    decide_should_crawl_page_links,
    decide_should_download_page_content,
    decide_should_recrawl_page,
)

CFG = CrawlConfig()


def ctx(**kw):
    return ContextView(**kw)


# -- ShouldCrawlPage --------------------------------------------------------

def test_null_page_and_context():  # :33-49
    assert decide_should_crawl_page(None, ctx(), CFG).reason == "Null page to crawl"
    assert decide_should_crawl_page(PageView(), None, CFG).reason == "Null crawl context"


def test_allowed_page_empty_reason():  # :53-67
    d = decide_should_crawl_page(PageView(url="http://a.com/", domain="a.com"), ctx(), CFG)
    assert d.allow and d.reason == ""


@pytest.mark.parametrize("scheme", ["file", "mailto", "tel", "callto", "ftp"])
def test_non_http_scheme_denied(scheme):  # :71-102
    d = decide_should_crawl_page(PageView(scheme=scheme), ctx(), CFG)
    assert not d.allow and d.reason == "Scheme does not begin with http"


def test_https_and_httpish_schemes_allowed():
    # C# check is Scheme.StartsWith("http") — "https" passes
    assert decide_should_crawl_page(PageView(scheme="https"), ctx(), CFG).allow


def test_max_pages_crawled_count():  # :106-116
    cfg = CFG.with_(max_pages_to_crawl=100)
    d = decide_should_crawl_page(PageView(), ctx(crawled_count=100), cfg)
    assert d.reason == "MaxPagesToCrawl limit of [100] has been reached"


def test_max_pages_includes_scheduled():  # :120-132
    cfg = CFG.with_(max_pages_to_crawl=100)
    d = decide_should_crawl_page(PageView(), ctx(crawled_count=50, scheduled_count=50), cfg)
    assert d.reason == "MaxPagesToCrawl limit of [100] has been reached"
    # one slot left -> allowed (crawled + scheduled + 1 == limit)
    d2 = decide_should_crawl_page(PageView(), ctx(crawled_count=50, scheduled_count=49), cfg)
    assert d2.allow


def test_max_pages_zero_disables():
    d = decide_should_crawl_page(
        PageView(), ctx(crawled_count=10_000), CFG.with_(max_pages_to_crawl=0)
    )
    assert d.allow


def test_retry_bypasses_budget():  # IsRetry guard at CrawlDecisionMaker.cs:58
    cfg = CFG.with_(max_pages_to_crawl=100)
    d = decide_should_crawl_page(PageView(is_retry=True), ctx(crawled_count=100), cfg)
    assert d.allow


def test_max_pages_per_domain():  # :228-249
    cfg = CFG.with_(max_pages_to_crawl_per_domain=100)
    page = PageView(domain="a.com")
    d = decide_should_crawl_page(page, ctx(crawl_count_by_domain={"a.com": 100}), cfg)
    assert d.reason == "MaxPagesToCrawlPerDomain limit of [100] has been reached for domain [a.com]"
    assert decide_should_crawl_page(page, ctx(crawl_count_by_domain={"a.com": 99}), cfg).allow
    assert decide_should_crawl_page(page, ctx(), cfg).allow  # no counts yet
    # retry bypasses (IsRetry guard at :70)
    d2 = decide_should_crawl_page(
        PageView(domain="a.com", is_retry=True), ctx(crawl_count_by_domain={"a.com": 100}), cfg
    )
    assert d2.allow


def test_crawl_depth():  # :282-323
    cfg = CFG.with_(max_crawl_depth=2)
    assert decide_should_crawl_page(PageView(crawl_depth=3), ctx(), cfg).reason == "Crawl depth is above max"
    assert decide_should_crawl_page(PageView(crawl_depth=2), ctx(), cfg).allow  # == max ok in F1


def test_redirect_chain_cap():  # :327-363
    d = decide_should_crawl_page(
        PageView(redirected_from="http://x.com/", redirect_position=8), ctx(), CFG
    )
    assert d.reason == "HttpRequestMaxAutoRedirects limit of [7] has been reached"
    assert decide_should_crawl_page(
        PageView(redirected_from="http://x.com/", redirect_position=7), ctx(), CFG
    ).allow
    # not redirected -> position ignored
    assert decide_should_crawl_page(PageView(redirect_position=99), ctx(), CFG).allow


def test_external_link():  # :145-167, :170-186
    d = decide_should_crawl_page(PageView(is_internal=False), ctx(), CFG)
    assert d.reason == "Link is external"
    cfg = CFG.with_(is_external_page_crawling_enabled=True)
    assert decide_should_crawl_page(PageView(is_internal=False), ctx(), cfg).allow


# -- ShouldCrawlPageLinks -----------------------------------------------------

def test_links_null_checks():  # :391-412
    assert decide_should_crawl_page_links(None, ctx(), CFG).reason == "Null crawled page"
    assert decide_should_crawl_page_links(PageView(), None, CFG).reason == "Null crawl context"


@pytest.mark.parametrize("text", ["", "   ", None])
def test_links_no_content(text):  # :416-463
    d = decide_should_crawl_page_links(PageView(text=text), ctx(), CFG)
    assert d.reason == "Page has no content"


def test_links_external():  # :467-541
    d = decide_should_crawl_page_links(PageView(text="hi", is_internal=False), ctx(), CFG)
    assert d.reason == "Link is external"
    cfg = CFG.with_(is_external_page_links_crawling_enabled=True)
    assert decide_should_crawl_page_links(PageView(text="hi", is_internal=False), ctx(), cfg).allow


def test_links_depth_uses_gte():  # :545-609
    cfg = CFG.with_(max_crawl_depth=2)
    assert (
        decide_should_crawl_page_links(PageView(text="hi", crawl_depth=2), ctx(), cfg).reason
        == "Crawl depth is above max"
    )
    assert decide_should_crawl_page_links(PageView(text="hi", crawl_depth=1), ctx(), cfg).allow


# -- ShouldDownloadPageContent ------------------------------------------------

def test_download_null_response():  # :613-648
    assert decide_should_download_page_content(None, ctx(), CFG).reason == "Null crawled page"
    assert decide_should_download_page_content(PageView(), None, CFG).reason == "Null crawl context"
    d = decide_should_download_page_content(PageView(has_response=False), ctx(), CFG)
    assert d.reason == "Null HttpWebResponse"


def test_download_non_200():  # :651-661 (fork message format)
    d = decide_should_download_page_content(PageView(status_code=404), ctx(), CFG)
    assert d.reason == "Status code NotFound"
    d = decide_should_download_page_content(PageView(status_code=500), ctx(), CFG)
    assert d.reason == "Status code InternalServerError"
    d = decide_should_download_page_content(PageView(status_code=299), ctx(), CFG)
    assert d.reason == "Status code 299"


def test_download_content_type():  # :664-707
    d = decide_should_download_page_content(PageView(content_type="image/png"), ctx(), CFG)
    assert d.reason == "Content type is not any of the following: text/html"
    cfg = CFG.with_(downloadable_content_types="text/hmtl,application/pdf")
    d = decide_should_download_page_content(PageView(content_type="text/html"), ctx(), cfg)
    assert d.reason == "Content type is not any of the following: text/hmtl,application/pdf"
    # containment is substring-based and whitespace-tolerant
    cfg2 = CFG.with_(downloadable_content_types="text/html, application/pdf, ")
    assert decide_should_download_page_content(
        PageView(content_type="text/html; charset=utf-8"), ctx(), cfg2
    ).allow


def test_download_size_gate():  # :711-728
    cfg = CFG.with_(max_page_size_in_bytes=5)
    d = decide_should_download_page_content(PageView(content_length=1298), ctx(), cfg)
    assert d.reason == "Page size of [1298] bytes is above the max allowable of [5] bytes"
    assert decide_should_download_page_content(PageView(content_length=5), ctx(), cfg).allow
    # 0 disables
    assert decide_should_download_page_content(PageView(content_length=10**9), ctx(), CFG).allow


# -- ShouldRecrawlPage ---------------------------------------------------------

def test_recrawl_contract():  # :756-848
    ok = PageView(has_web_exception=True, retry_count=0)
    assert decide_should_recrawl_page(ok, ctx(), CFG.with_(max_retry_count=5)).allow
    assert decide_should_recrawl_page(None, ctx(), CFG).reason == "Null crawled page"
    assert decide_should_recrawl_page(ok, None, CFG).reason == "Null crawl context"
    no_exc = PageView(has_web_exception=False)
    assert decide_should_recrawl_page(no_exc, ctx(), CFG.with_(max_retry_count=5)).reason == "WebException did not occur"
    assert decide_should_recrawl_page(ok, ctx(), CFG.with_(max_retry_count=0)).reason == "MaxRetryCount is less than 1"
    maxed = PageView(has_web_exception=True, retry_count=5)
    assert decide_should_recrawl_page(maxed, ctx(), CFG.with_(max_retry_count=5)).reason == "MaxRetryCount has been reached"


# -- Column builders match the pure layer -------------------------------------

def test_column_builders_match_pure(spark):
    from pyspark.sql import functions as F

    from abot_spark.operators.decisions import (
        reason_should_crawl_page,
        reason_should_crawl_page_links,
        reason_should_download_page_content,
    )

    cfg = CFG.with_(max_pages_to_crawl_per_domain=2, max_crawl_depth=3,
                    max_page_size_in_bytes=100)
    rows = [
        # url, redirected_from, redirect_position, depth, is_retry, is_internal,
        # domain, budget_exceeded, domain_cap_exceeded, text, status_code,
        # content_type, content_length
        ("http://a.com/", None, 0, 0, False, True, "a.com", False, False, "hi", 200, "text/html", 10),
        ("ftp://a.com/", None, 0, 0, False, True, "a.com", False, False, "hi", 200, "text/html", 10),
        ("http://a.com/deep", None, 0, 9, False, True, "a.com", False, False, "hi", 200, "text/html", 10),
        ("http://a.com/r", "http://b.com/", 8, 0, False, True, "a.com", False, False, "hi", 200, "text/html", 10),
        ("http://a.com/b", None, 0, 0, False, True, "a.com", True, False, "hi", 200, "text/html", 10),
        ("http://a.com/d", None, 0, 0, False, True, "a.com", False, True, "hi", 200, "text/html", 10),
        ("http://ext.com/", None, 0, 0, False, False, "ext.com", False, False, "hi", 200, "text/html", 10),
        ("http://a.com/404", None, 0, 0, False, True, "a.com", False, False, "", 404, "text/html", 10),
        ("http://a.com/png", None, 0, 0, False, True, "a.com", False, False, "x", 200, "image/png", 10),
        ("http://a.com/big", None, 0, 0, False, True, "a.com", False, False, "x", 200, "text/html", 101),
    ]
    df = spark.createDataFrame(
        rows,
        "url string, redirected_from string, redirect_position int, depth int, "
        "is_retry boolean, is_internal boolean, domain string, budget_exceeded boolean, "
        "domain_cap_exceeded boolean, text string, status_code int, content_type string, "
        "content_length long",
    )
    out = df.select(
        "url",
        reason_should_crawl_page(
            cfg,
            budget_exceeded=F.col("budget_exceeded"),
            domain_cap_exceeded=F.col("domain_cap_exceeded"),
        ).alias("crawl_reason"),
        reason_should_crawl_page_links(cfg).alias("links_reason"),
        reason_should_download_page_content(cfg).alias("dl_reason"),
    ).collect()
    by_url = {r.url: r for r in out}
    assert by_url["http://a.com/"].crawl_reason is None
    assert by_url["ftp://a.com/"].crawl_reason == "Scheme does not begin with http"
    assert by_url["http://a.com/deep"].crawl_reason == "Crawl depth is above max"
    assert by_url["http://a.com/r"].crawl_reason == "HttpRequestMaxAutoRedirects limit of [7] has been reached"
    assert by_url["http://a.com/b"].crawl_reason == "MaxPagesToCrawl limit of [1000] has been reached"
    assert by_url["http://a.com/d"].crawl_reason == "MaxPagesToCrawlPerDomain limit of [2] has been reached for domain [a.com]"
    assert by_url["http://ext.com/"].crawl_reason == "Link is external"
    assert by_url["http://a.com/404"].links_reason == "Page has no content"
    assert by_url["http://a.com/404"].dl_reason == "Status code NotFound"
    assert by_url["http://a.com/png"].dl_reason == "Content type is not any of the following: text/html"
    assert by_url["http://a.com/big"].dl_reason == "Page size of [101] bytes is above the max allowable of [100] bytes"
    assert by_url["http://a.com/"].dl_reason is None
