"""S2 sitemap source: parsing contract + GoogleWebCrawler-style seeding."""

from __future__ import annotations

import tempfile

import pytest

from abot_spark.config import CrawlConfig
from abot_spark.crawler import WaveCrawler
from abot_spark.functions.sitemaps import parse_sitemap, resolve_sitemaps
from abot_spark.sources.synthetic_web import generate_web, write_parquet

URLSET = (
    '<?xml version="1.0"?>'
    '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
    "<url><loc>http://x/a</loc></url><url><loc> http://x/b </loc></url>"
    "</urlset>"
)
INDEX = (
    '<?xml version="1.0"?>'
    '<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
    "<sitemap><loc>http://x/child.xml</loc></sitemap></sitemapindex>"
)


def test_parse_urlset():
    items, children = parse_sitemap(URLSET)
    assert items == ["http://x/a", "http://x/b"]  # loc text is trimmed
    assert children == []


def test_parse_index():
    items, children = parse_sitemap(INDEX)
    assert items == []
    assert children == ["http://x/child.xml"]


@pytest.mark.parametrize("bad", ["", "   ", "<not-xml", "<root><loc/></root>"])
def test_parse_malformed(bad):
    assert parse_sitemap(bad) == ([], [])


def test_resolve_recursion_and_dedup():
    docs = {"http://x/s.xml": INDEX, "http://x/child.xml": URLSET}
    items = resolve_sitemaps(["http://x/s.xml", "http://x/s.xml"], docs.get)
    assert items == ["http://x/a", "http://x/b"]


def test_resolve_cycle_bounded():
    cyc = ('<sitemapindex><sitemap><loc>http://x/s.xml</loc></sitemap>'
           "</sitemapindex>")
    items = resolve_sitemaps(["http://x/s.xml"], {"http://x/s.xml": cyc}.get)
    assert items == []


def test_sitemap_seeded_crawl_reaches_orphan(spark):
    """The /orphan page is reachable only via the sitemap; a sitemap-seeded
    crawl fetches it at depth 0 (GoogleWebCrawler.cs:128-135), a plain
    crawl never sees it."""
    fx = generate_web(n_domains=1, sections=1, leaves=1)
    tmp = tempfile.mkdtemp(prefix="abot-smweb-")
    paths = write_parquet(fx, tmp)
    pages = spark.read.parquet(paths["pages"])
    robots = spark.read.parquet(paths["robots"])
    cfg = CrawlConfig(is_respect_robots_dot_text_enabled=True)

    plain = WaveCrawler(spark, cfg, tempfile.mkdtemp(), pages, robots)
    st = plain.crawl(["http://d0.example.com/"], max_waves=10)
    plain_urls = {r["url"] for r in
                  plain.store.read_all("fetched", st.wave).collect()}
    assert "http://d0.example.com/orphan" not in plain_urls

    seeded = WaveCrawler(spark, cfg, tempfile.mkdtemp(), pages, robots)
    seeded.use_sitemaps = True
    st2 = seeded.crawl(["http://d0.example.com/"], max_waves=10)
    rows = {r["url"]: r for r in
            seeded.store.read_all("fetched", st2.wave).collect()}
    assert "http://d0.example.com/orphan" in rows
    assert rows["http://d0.example.com/orphan"]["depth"] == 0
