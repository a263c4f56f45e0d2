"""End-to-end parity: the distributed wave engine vs the serial oracle.

Ports of the reference's integration contract
(``Abot.Tests.Integration/CrawlSiteSimulator.cs``):

- golden crawl: exact (url, status) set *and* exact order in
  single-logical-thread mode (our serial order == (wave, seq) order)
- MaxPagesToCrawl ∈ {5, 25} ⇒ exactly 5 / 25 crawled (:30-63)
- retry behavior (:167-176)
- politeness floor: 3 same-domain pages ≥ 2000 simulated ms at 1000 ms
  delay (:144-164)
- resumability (north_rule): kill after wave 1, resume, equal outcome
"""

from __future__ import annotations

import tempfile

import pytest

from abot_spark.config import CrawlConfig
from abot_spark.crawler import WaveCrawler
from abot_spark.oracle.serial import SerialCrawler
from abot_spark.sources.synthetic_web import generate_web, write_parquet

BASE_CFG = CrawlConfig(
    is_respect_robots_dot_text_enabled=True,
    is_respect_meta_robots_no_follow_enabled=True,
    is_respect_anchor_rel_no_follow_enabled=True,
)
SEED = "http://d0.example.com/"


@pytest.fixture(scope="module")
def web(spark):
    fx = generate_web(n_domains=2, sections=2, leaves=2)
    tmp = tempfile.mkdtemp(prefix="abot-web-")
    paths = write_parquet(fx, tmp)
    return {
        "fx": fx,
        "pages": spark.read.parquet(paths["pages"]),
        "robots": spark.read.parquet(paths["robots"]),
    }


def run_spark_crawl(spark, web, cfg, max_waves=30):
    wdir = tempfile.mkdtemp(prefix="abot-crawl-")
    crawler = WaveCrawler(spark, cfg, wdir, web["pages"], web["robots"])
    state = crawler.crawl([SEED], max_waves=max_waves)
    fetched = crawler.store.read_all("fetched", state.wave)
    rows = (fetched.orderBy("seq").collect() if fetched is not None else [])
    return crawler, state, rows


@pytest.fixture(scope="module")
def base_crawl(spark, web):
    """One shared BASE_CFG crawl — several tests assert different facets
    of the same run (order/status, text bytes, robots audit, resume
    baseline)."""
    return run_spark_crawl(spark, web, BASE_CFG)


def test_golden_crawl_set_and_order(spark, web, base_crawl):
    serial = SerialCrawler(web["fx"], BASE_CFG).crawl(SEED)
    _, state, rows = base_crawl
    assert [r["url"] for r in rows] == serial.crawl_order
    assert state.crawled_count == serial.crawled_count
    # status parity (the integration oracle is a (url,status) set)
    serial_status = {e.url: e.status_code for e in serial.crawled}
    for r in rows:
        assert serial_status[r["url"]] == r["status_code"]


def test_extracted_text_byte_identical(spark, web, base_crawl):
    """north_rule invariant: byte-identical extracted text per url."""
    ground = {p.url: p.text for p in web["fx"].pages}
    _, state, rows = base_crawl
    checked = 0
    for r in rows:
        if r["status_code"] == 200 and r["text"] is not None:
            # redirected fetches carry the landing page's content
            assert r["text"] == ground[r["response_url"]], r["url"]
            checked += 1
    assert checked >= 10  # incl. shift_jis + cp1251 fixtures


@pytest.mark.parametrize("max_pages", [5, 25])
def test_max_pages_exactness(spark, web, max_pages):
    cfg = BASE_CFG.with_(max_pages_to_crawl=max_pages)
    serial = SerialCrawler(web["fx"], cfg).crawl(SEED)
    _, state, rows = run_spark_crawl(spark, web, cfg)
    assert [r["url"] for r in rows] == serial.crawl_order
    assert len(rows) == min(max_pages, 18)
    assert state.latched == (max_pages == 5)


def test_retry_order_parity(spark, web):
    cfg = BASE_CFG.with_(max_retry_count=2)
    serial = SerialCrawler(web["fx"], cfg).crawl(SEED)
    _, state, rows = run_spark_crawl(spark, web, cfg)
    assert [r["url"] for r in rows] == serial.crawl_order
    assert state.retried_count > 0
    # retries bump retry_count, never crawled_count (WebCrawler.cs:1084-1094)
    assert state.crawled_count == serial.crawled_count


def test_page_bag_carry_retry_and_children(spark, web):
    """PageBag (``PageToCrawl.cs:111-115``): seed bags ride the frontier
    into the fetched audit (T7 ``CombinePageBags``, ``WebCrawler.cs:1055,
    :1067-1078`` — the fresh CrawledPage bag is empty so the merge is a
    carry-through), survive retries (the same page object re-enters the
    queue, ``ProcessPage`` :729-733), and are NOT inherited by link or
    redirect children (a new PageToCrawl starts with a fresh bag)."""
    cfg = BASE_CFG.with_(max_retry_count=2)
    wdir = tempfile.mkdtemp(prefix="abot-crawl-")
    crawler = WaveCrawler(spark, cfg, wdir, web["pages"], web["robots"])
    err = "http://d0.example.com/err"   # 503 + WebException -> retried
    state = crawler.crawl(
        [SEED, err],
        seed_page_bags={SEED: {"who": "root"},
                        err: {"who": "err", "k": "v"}})
    rows = crawler.store.read_all("fetched", state.wave).collect()
    err_rows = [r for r in rows if r["url"] == err]
    assert any(r["is_retry"] for r in err_rows)   # the retry actually ran
    for r in err_rows:   # initial attempt AND every retry keep the bag
        assert dict(r["page_bag"]) == {"who": "err", "k": "v"}
    for r in rows:
        if r["url"] == SEED:
            assert dict(r["page_bag"]) == {"who": "root"}
        elif r["url"] != err:   # children: fresh (empty) bag
            assert not r["page_bag"]


def test_max_depth(spark, web):
    cfg = BASE_CFG.with_(max_crawl_depth=1)
    serial = SerialCrawler(web["fx"], cfg).crawl(SEED)
    _, _, rows = run_spark_crawl(spark, web, cfg)
    assert [r["url"] for r in rows] == serial.crawl_order
    assert all(r["depth"] <= 1 for r in rows)


def test_robots_disallow_evented(spark, web, base_crawl):
    crawler, state, rows = base_crawl
    dis = crawler.store.read_all("disallowed", state.wave + 1).collect()
    reasons = {r["url"]: r["reason"] for r in dis}
    assert "http://d0.example.com/private/secret" in reasons
    assert reasons["http://d0.example.com/private/secret"] == (
        "Page [http://d0.example.com/private/secret] not crawled, "
        "[Disallowed by robots.txt file], set IsRespectRobotsDotText=false "
        "in config file if you would like to ignore robots.txt files."
    )
    assert all("/private/" not in r["url"] for r in rows)


def test_resume_equals_uninterrupted(spark, web, base_crawl):
    wdir = tempfile.mkdtemp(prefix="abot-resume-")
    c1 = WaveCrawler(spark, BASE_CFG, wdir, web["pages"], web["robots"])
    c1.crawl([SEED], max_waves=2)  # interrupt after wave 1
    c2 = WaveCrawler(spark, BASE_CFG, wdir, web["pages"], web["robots"])
    c2._seed_auths = ("d0.example.com",)
    st2 = c2.resume()
    resumed = [r["url"] for r in
               c2.store.read_all("fetched", st2.wave).orderBy("seq").collect()]
    _, st3, rows = base_crawl
    assert resumed == [r["url"] for r in rows]
    assert (st2.crawled_count, st2.next_seq) == (st3.crawled_count, st3.next_seq)


def test_resume_after_midwave_crash(spark, web, base_crawl):
    """A crash MID-wave leaves partial parquet for the uncommitted wave
    (some appends written, no manifest).  resume() must drop exactly the
    partial data — wave+1 frontier/seen/disallowed are part of the
    committed wave's output and stay; anything newer goes — and finish
    with the uninterrupted outcome (store.drop_waves_after contract)."""
    import os
    import shutil

    wdir = tempfile.mkdtemp(prefix="abot-crash-")
    c1 = WaveCrawler(spark, BASE_CFG, wdir, web["pages"], web["robots"])
    c1.crawl([SEED], max_waves=2)  # manifest committed through wave 1

    # simulate the crash: wave 2 was in flight — its audit append and the
    # wave-3 frontier landed (bogus subsets), the manifest did not
    committed_frontier2 = c1.store.wave_path("frontier", 2)
    for partial in (c1.store.wave_path("fetched", 2),
                    c1.store.wave_path("frontier", 3),
                    c1.store.wave_path("seen", 3)):
        shutil.copytree(committed_frontier2, partial)
    with open(os.path.join(wdir, "state_2.json.tmp"), "w") as f:
        f.write("{garbage")

    c2 = WaveCrawler(spark, BASE_CFG, wdir, web["pages"], web["robots"])
    c2._seed_auths = ("d0.example.com",)
    st2 = c2.resume()
    # the partial junk is gone, not merged into the crawl
    assert not os.path.exists(os.path.join(wdir, "state_2.json.tmp"))
    resumed = [r["url"] for r in
               c2.store.read_all("fetched", st2.wave).orderBy("seq").collect()]
    _, st3, rows = base_crawl
    assert resumed == [r["url"] for r in rows]
    assert (st2.crawled_count, st2.next_seq) == (st3.crawled_count, st3.next_seq)


def test_politeness_floor_simulated(spark, web):
    """3+ same-domain pages at 1000 ms/domain ≥ 2000 simulated ms
    (CrawlSiteSimulator.cs:144-164) — the simulated clock stands in for
    wall time, same bound."""
    cfg = BASE_CFG.with_(min_crawl_delay_per_domain_milli_seconds=1000,
                         max_pages_to_crawl=3)
    _, state, rows = run_spark_crawl(spark, web, cfg)
    assert len(rows) == 3
    assert state.sim_clock_ms >= 2000


def test_garbage_seed(spark, web):
    wdir = tempfile.mkdtemp(prefix="abot-garbage-")
    crawler = WaveCrawler(spark, BASE_CFG, wdir, web["pages"], web["robots"])
    state = crawler.crawl(["http://////"], max_waves=5)
    assert state.crawled_count == 0


def test_stop_sentinel_and_resume(spark, web, base_crawl):
    """A5 Stop: the STOP sentinel halts at the next wave boundary with
    committed state; removing it and resuming completes the crawl."""
    import os
    wdir = tempfile.mkdtemp(prefix="abot-stop-")
    c1 = WaveCrawler(spark, BASE_CFG, wdir, web["pages"], web["robots"])
    open(os.path.join(wdir, "STOP"), "w").close()
    st1 = c1.crawl([SEED], max_waves=30)
    assert st1.stop_requested and st1.crawled_count == 0
    os.remove(os.path.join(wdir, "STOP"))
    c2 = WaveCrawler(spark, BASE_CFG, wdir, web["pages"], web["robots"])
    c2._seed_auths = ("d0.example.com",)
    st2 = c2.resume()
    _, st3, rows = base_crawl
    resumed = [r["url"] for r in
               c2.store.read_all("fetched", st2.wave).orderBy("seq").collect()]
    assert resumed == [r["url"] for r in rows]


def test_max_links_per_page_parity(spark, web):
    """T4: the per-page cap counts *scheduled* links and breaks the loop
    (WebCrawler.cs:1138-1166); order parity vs the serial oracle."""
    cfg = BASE_CFG.with_(max_links_per_page=2)
    serial = SerialCrawler(web["fx"], cfg).crawl(SEED)
    _, state, rows = run_spark_crawl(spark, web, cfg)
    assert [r["url"] for r in rows] == serial.crawl_order


def test_per_domain_robots_scale_mode(spark, web):
    """Scale generalization: every domain's robots rules gate its own
    URLs (the reference only loads the root's robots)."""
    cfg = BASE_CFG.with_(is_external_page_crawling_enabled=True,
                         is_external_page_links_crawling_enabled=True)
    wdir = tempfile.mkdtemp(prefix="abot-pdrobots-")
    crawler = WaveCrawler(spark, cfg, wdir, web["pages"], web["robots"])
    crawler.per_domain_robots = True
    state = crawler.crawl([SEED], max_waves=30)
    urls = {r["url"] for r in
            crawler.store.read_all("fetched", state.wave).collect()}
    assert any(u.startswith("http://d1.example.com/") for u in urls)
    assert not any("/private/" in u for u in urls)


def _fixture_parity(spark, fx, cfg, max_waves=40):
    """Crawl a hand-built WebFixture on both engines; return orders."""
    from abot_spark.sources.synthetic_web import write_parquet

    serial = SerialCrawler(fx, cfg).crawl("http://c.corner.com/")
    tmp = tempfile.mkdtemp(prefix="abot-corner-web-")
    paths = write_parquet(fx, tmp)
    crawler = WaveCrawler(
        spark, cfg, tempfile.mkdtemp(prefix="abot-corner-"),
        spark.read.parquet(paths["pages"]),
        spark.read.parquet(paths["robots"]) if fx.robots else None)
    state = crawler.crawl(["http://c.corner.com/"], max_waves=max_waves)
    fetched = crawler.store.read_all("fetched", state.wave)
    rows = fetched.orderBy("seq").collect() if fetched is not None else []
    return serial, [r["url"] for r in rows]


def test_denied_redirect_child_does_not_suppress_samewave_link(spark):
    """Round-1 deviation corner, now closed: a redirect child denied by
    the redirect cap marks NOTHING in the serial loop, so a later
    same-wave link to the same URL is decided fresh and crawled.  The
    marking-aware dedup must reproduce that instead of suppressing the
    second occurrence."""
    from abot_spark.sources.synthetic_web import WebFixture, _page, PageRec

    root = "http://c.corner.com"
    fx = WebFixture()
    fx.pages.append(_page(root + "/", ["/c1", "/a"], "root"))
    fx.pages.append(PageRec(url=root + "/c1", html=b"", text="",
                            status_code=301, location=root + "/c2"))
    fx.pages.append(PageRec(url=root + "/c2", html=b"", text="",
                            status_code=301, location=root + "/t"))
    fx.pages.append(_page(root + "/a", ["/b"], "a"))
    fx.pages.append(_page(root + "/b", ["/t"], "b"))
    fx.pages.append(_page(root + "/t", [], "target"))

    cfg = CrawlConfig(is_http_request_auto_redirects_enabled=False,
                      http_request_max_auto_redirects=1)
    serial, got = _fixture_parity(spark, fx, cfg)
    assert got == serial.crawl_order
    # the corner actually bit: T's redirect-child occurrence was denied
    # (position 2 > cap 1) yet B's link still got it crawled
    assert root + "/t" in got


def test_recrawl_cap_breaker_samewave_duplicate_schedules_twice(spark):
    """Round-1 deviation corner, now closed: under AllowUriRecrawling the
    MaxLinksPerPage cap-breaker is scheduled but never marked known, so a
    later same-wave link to the same URL schedules AGAIN — the serial
    loop crawls it twice and so must the wave engine (link-cap
    refinement pass of the marking-aware dedup)."""
    from abot_spark.sources.synthetic_web import WebFixture, _page

    root = "http://c.corner.com"
    fx = WebFixture()
    fx.pages.append(_page(root + "/", ["/p", "/q"], "root"))
    fx.pages.append(_page(root + "/p", ["/x1", "/t"], "p"))  # /t = breaker
    fx.pages.append(_page(root + "/q", ["/t"], "q"))
    fx.pages.append(_page(root + "/x1", [], "x1"))
    fx.pages.append(_page(root + "/t", [], "t"))

    cfg = CrawlConfig(is_uri_recrawling_enabled=True,
                      max_links_per_page=2, max_pages_to_crawl=25)
    serial, got = _fixture_parity(spark, fx, cfg)
    assert got == serial.crawl_order
    assert got.count(root + "/t") == 2, "breaker dup must crawl twice"


def _hooked_parity(spark, web, cfg, serial_hooks, spark_hooks,
                   check_disallowed=False):
    """Run serial + wave with the same user delegate and compare."""
    from pyspark.sql import functions as F  # noqa: F401 (hooks build Columns)

    serial = SerialCrawler(web["fx"], cfg)
    for name, fn in serial_hooks.items():
        setattr(serial, name, fn)
    report = serial.crawl(SEED)

    wdir = tempfile.mkdtemp(prefix="abot-hook-")
    crawler = WaveCrawler(spark, cfg, wdir, web["pages"], web["robots"])
    for name, col in spark_hooks.items():
        setattr(crawler, name, col)
    state = crawler.crawl([SEED], max_waves=40)
    fetched = crawler.store.read_all("fetched", state.wave)
    rows = fetched.orderBy("seq").collect() if fetched is not None else []
    assert [r["url"] for r in rows] == report.crawl_order
    if check_disallowed:
        dis = crawler.store.read_all("disallowed", state.wave + 1)
        got = {(r["url"], r["reason"]) for r in dis.collect()} \
            if dis is not None else set()
        assert got == set(report.disallowed)
    return report, rows


def test_user_should_crawl_page_delegate_parity(spark, web):
    """ShouldCrawlPageDecisionMaker (WebCrawler.cs:917-925): user denial
    skips the page, consumes no budget, and fires PageCrawlDisallowed —
    order AND disallowed-audit parity vs the serial oracle."""
    from pyspark.sql import functions as F

    report, rows = _hooked_parity(
        spark, web, BASE_CFG,
        {"user_should_crawl_page": lambda v: "/s/1" not in v.url},
        {"user_page_predicate": ~F.col("url").contains("/s/1")},
        check_disallowed=True)
    assert rows, "crawl must not be empty"
    assert not any("/s1" in r["url"] for r in rows)
    assert any(reason == "User decision" for _, reason in report.disallowed)


def test_user_should_schedule_link_delegate_parity(spark, web):
    """ShouldScheduleLinkDecisionMaker (F9, :1117-1118): silent veto
    before the decision pipeline; no disallowed events for vetoed links."""
    from pyspark.sql import functions as F

    report, rows = _hooked_parity(
        spark, web, BASE_CFG,
        {"user_should_schedule_link": lambda p: "/s/0" not in p.url},
        {"user_link_predicate": ~F.col("url").contains("/s/0")},
        check_disallowed=True)
    assert rows and not any("/s0" in r["url"] for r in rows)


def test_user_should_download_content_delegate_parity(spark, web):
    """ShouldDownloadPageContentDecisionMaker (:1175-1180): denial skips
    the content download, so the page has no text and no links — the
    crawl shrinks identically in both engines."""
    from pyspark.sql import functions as F

    base = SerialCrawler(web["fx"], BASE_CFG).crawl(SEED)
    report, rows = _hooked_parity(
        spark, web, BASE_CFG,
        {"user_should_download_content": lambda v: v.crawl_depth < 1},
        {"user_download_predicate": F.col("depth") < 1})
    assert len(rows) < len(base.crawl_order)   # depth>=1 pages spawn nothing


def test_user_should_crawl_page_links_delegate_parity(spark, web):
    """ShouldCrawlPageLinksDecisionMaker (:867-880): denial stops link
    crawling for the page and is evented via links_reason."""
    from pyspark.sql import functions as F

    report, rows = _hooked_parity(
        spark, web, BASE_CFG,
        {"user_should_crawl_page_links": lambda v: "/s/0/" not in v.url},
        {"user_links_predicate": ~F.col("url").contains("/s/0/")})
    assert any(("User decision" == reason)
               for _, reason in report.links_disallowed)


def test_user_should_recrawl_page_delegate_parity(spark, web):
    """ShouldRecrawlPageDecisionMaker (:955-959): denial silently drops
    the retry the built-in decision would have scheduled."""
    from pyspark.sql import functions as F

    cfg = BASE_CFG.with_(max_retry_count=2)
    base = SerialCrawler(web["fx"], cfg).crawl(SEED)
    report, rows = _hooked_parity(
        spark, web, cfg,
        {"user_should_recrawl_page": lambda v: False},
        {"user_recrawl_predicate": F.lit(False)})
    assert not any(r["is_retry"] for r in rows)
    assert any(e.is_retry for e in base.crawled), \
        "fixture must contain retryable failures for this test to bite"


def test_per_domain_robots_crawl_delay_pacing(spark, web):
    """Scale mode applies EVERY domain's robots Crawl-delay through the
    politeness quota via the distributed rules table (no driver map):
    d1 declares Crawl-delay: 2, so at wave_seconds=2 its quota is 1
    fetch/wave.  Parity mode only loads the root's robots, so d1's
    delay is ignored there — the differential pins the scale path."""
    cfg = BASE_CFG.with_(is_external_page_crawling_enabled=True,
                         is_external_page_links_crawling_enabled=True,
                         wave_seconds=2.0)

    def run(per_domain):
        wdir = tempfile.mkdtemp(prefix="abot-pdpace-")
        c = WaveCrawler(spark, cfg, wdir, web["pages"], web["robots"])
        c.per_domain_robots = per_domain
        state = c.crawl([SEED], max_waves=40)
        rows = c.store.read_all("fetched", state.wave).collect()
        waves = {}
        for r in rows:
            if r["url"].startswith("http://d1.example.com/"):
                waves.setdefault(r["wave"], 0)
                waves[r["wave"]] += 1
        return waves

    scale_waves = run(True)
    assert scale_waves, "fixture must reach d1"
    assert max(scale_waves.values()) == 1, (
        f"d1 quota must be 1/wave under its Crawl-delay: {scale_waves}")
    parity_waves = run(False)
    assert max(parity_waves.values()) > 1, (
        "parity mode ignores non-root robots delay; fixture too small "
        "to differentiate" )


def test_manual_redirect_parity(spark, web):
    """T6 manual-redirect op (auto-redirects disabled): 3xx rows spawn
    same-depth children via the Location header (ProcessRedirect,
    WebCrawler.cs:754-789); order parity vs the serial oracle."""
    cfg = BASE_CFG.with_(is_http_request_auto_redirects_enabled=False)
    serial = SerialCrawler(web["fx"], cfg).crawl(SEED)
    _, state, rows = run_spark_crawl(spark, web, cfg)
    assert [r["url"] for r in rows] == serial.crawl_order
    # the whole chain is visited page-by-page in manual mode
    for u in ("http://d0.example.com/redir/2", "http://d0.example.com/redir/1",
              "http://d0.example.com/redir/0"):
        assert u in serial.crawl_order


def test_seen_compaction_crawl_parity(spark, web, base_crawl):
    """A crawl with periodic seen-set compaction (rewrite + expire of the
    per-wave appends) fetches the same pages in the same order, and the
    accumulated seen-set is unchanged."""
    import os

    cfg = BASE_CFG.with_(seen_compact_every_waves=2)
    c, st, rows = run_spark_crawl(spark, web, cfg)
    c0, st0, rows0 = base_crawl
    assert [r["url"] for r in rows] == [r["url"] for r in rows0]
    want_seen = {r["url_hash"] for r in
                 c0.store.read_all("seen", st0.wave + 1).collect()}
    got_seen = {r["url_hash"] for r in
                c.store.read_all("seen", st.wave + 1).collect()}
    assert got_seen == want_seen
    k = c.store.latest_compact("seen", st.wave + 1)
    assert k is not None and k >= 2
    assert not any(os.path.exists(c.store.wave_path("seen", w))
                   for w in range(k + 1))


def test_resume_after_compaction(spark, web, base_crawl):
    """Interrupt right after a compaction boundary; the resumed crawl must
    probe the snapshot (the per-wave dirs are gone) and still converge to
    the uninterrupted result."""
    cfg = BASE_CFG.with_(seen_compact_every_waves=1)
    wdir = tempfile.mkdtemp(prefix="abot-compact-resume-")
    c1 = WaveCrawler(spark, cfg, wdir, web["pages"], web["robots"])
    c1.crawl([SEED], max_waves=2)  # waves 0..1 done, snapshot committed
    assert c1.store.latest_compact("seen", 99) is not None
    c2 = WaveCrawler(spark, cfg, wdir, web["pages"], web["robots"])
    c2._seed_auths = ("d0.example.com",)
    st2 = c2.resume()
    resumed = [r["url"] for r in
               c2.store.read_all("fetched", st2.wave).orderBy("seq").collect()]
    _, st3, rows = base_crawl
    assert resumed == [r["url"] for r in rows]
    assert (st2.crawled_count, st2.next_seq) == (st3.crawled_count, st3.next_seq)


def test_robots_root_disallow_escape_hatch(spark, web):
    """F6 escape hatch (PoliteWebCrawler.cs:191-227): when robots disallow
    the root (or everything under it), IsIgnoreRobotsDotTextIfRoot-
    DisallowedEnabled drops robots entirely; without the flag the crawl
    fetches nothing.  Parity with the serial oracle both ways."""
    import copy

    from abot_spark.sources.synthetic_web import WebFixture

    fx = copy.copy(web["fx"])
    fx = WebFixture(pages=fx.pages,
                    robots=[("d0.example.com", "User-agent: *\nDisallow: /\n")],
                    seeds=fx.seeds)
    tmp = tempfile.mkdtemp(prefix="abot-roblock-")
    paths = write_parquet(fx, tmp)
    blocked_web = {"fx": fx,
                   "pages": spark.read.parquet(paths["pages"]),
                   "robots": spark.read.parquet(paths["robots"])}

    for ignore in (False, True):
        cfg = CrawlConfig(
            is_respect_robots_dot_text_enabled=True,
            is_ignore_robots_dot_text_if_root_disallowed_enabled=ignore)
        serial = SerialCrawler(fx, cfg).crawl(SEED)
        _, state, rows = run_spark_crawl(spark, blocked_web, cfg)
        assert [r["url"] for r in rows] == serial.crawl_order, f"ignore={ignore}"
    # sanity on the fixture itself: the flag actually changes the outcome
    assert len(SerialCrawler(fx, CrawlConfig(
        is_respect_robots_dot_text_enabled=True,
        is_ignore_robots_dot_text_if_root_disallowed_enabled=True,
    )).crawl(SEED).crawled) > 0


def test_fetch_missing_broadcast_gated_on_wave_size(spark):
    """Plan guard (VERDICT r2 #2): the corpus-miss anti-join must
    broadcast the wave's fetched-url set only while the due wave is
    below the configured threshold.  Above it, no hint is planted —
    with auto-broadcast disabled the plan must choose a non-broadcast
    anti-join (at production scale AQE sees the true build size)."""
    from abot_spark.plans import wave as W

    frontier = spark.createDataFrame(
        [(f"http://d/{i}",) for i in range(20)], "url string")
    fetched = spark.createDataFrame(
        [(f"http://d/{i}",) for i in range(10)], "url string")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        small = W.fetch_missing(frontier, fetched, n_wave=10,
                                broadcast_rows=1_000)
        plan_small = small._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan_small, plan_small
        large = W.fetch_missing(frontier, fetched, n_wave=5_000,
                                broadcast_rows=1_000)
        plan_large = large._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan_large, plan_large
        # both plans compute the same misses
        assert ({r["url"] for r in small.select("url").collect()}
                == {r["url"] for r in large.select("url").collect()}
                == {f"http://d/{i}" for i in range(10, 20)})
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_schedule_broadcasts_gated_on_wave_and_domain_size(spark):
    """Plan guard (VERDICT r3 #1/#3): the link-cap ``break_pos`` map and the
    domain-cap ``prior_counts`` snapshot are wave-/crawl-proportional
    aggregates — forced broadcasts only below the configured row hints.
    Above the gate no hint is planted; with auto-broadcast disabled the
    executed plan must contain no BroadcastHashJoin at all (at production
    scale AQE sees the true build sizes against the session's 256 MB
    threshold).  Both plans must admit the identical URL set."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    import abot_spark.plans.wave as W

    cand_schema = T.StructType([
        T.StructField(n, t) for n, t in [
            ("url", T.StringType()), ("domain", T.StringType()),
            ("path", T.StringType()), ("parent_seq", T.LongType()),
            ("parent_url", T.StringType()), ("depth", T.IntegerType()),
            ("pos", T.IntegerType()), ("kind", T.IntegerType()),
            ("is_retry", T.BooleanType()), ("retry_count", T.IntegerType()),
            ("redirected_from", T.StringType()),
            ("redirect_position", T.IntegerType()),
        ]])
    rows = []
    for d in range(3):
        for i in range(6):
            rows.append((f"http://d{d}.com/p{i}", f"d{d}.com", f"/p{i}",
                         0, f"http://d{d}.com/", 1, d * 6 + i, 1,
                         False, 0, None, 0))
    cand = spark.createDataFrame(rows, cand_schema)
    events = spark.createDataFrame(
        [], "seq long, domain string, is_retry boolean")
    prior = spark.createDataFrame(
        [("d0.com", 1), ("d1.com", 1)], "domain string, cnt long")
    cfg = CrawlConfig(max_links_per_page=3,
                      max_pages_to_crawl_per_domain=4)

    def _plan(n_wave_hint, n_domains_hint):
        out = W.schedule_wave(
            cand, None, events, None, prior, None, cfg,
            budget_used=0, next_seq=1, latched=False,
            root_authorities=("d0.com", "d0.com"), wave_ts_ms=0,
            num_partitions=4, n_wave_hint=n_wave_hint,
            n_domains_hint=n_domains_hint)
        plan = (out["cand_cache"]._jdf.queryExecution()
                .executedPlan().toString())
        urls = sorted(r["url"]
                      for r in out["cand_cache"].filter("admitted").collect())
        out["cand_cache"].unpersist()
        return plan, urls

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan_small, urls_small = _plan(n_wave_hint=10, n_domains_hint=10)
        assert plan_small.count("BroadcastHashJoin") >= 2, plan_small
        big = cfg.link_cap_broadcast_rows + 1
        plan_large, urls_large = _plan(n_wave_hint=big, n_domains_hint=big)
        assert "BroadcastHashJoin" not in plan_large, plan_large
        # unknown hints (None) must also leave the strategy to Catalyst
        plan_none, urls_none = _plan(None, None)
        assert "BroadcastHashJoin" not in plan_none, plan_none
        assert urls_small == urls_large == urls_none and urls_small
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_refinement_fixpoint_replans_until_stable(spark):
    """The dedup-refinement fixpoint loop (round-4): a genuine 3-deep
    same-wave chain — A's cap-BREAKER t marks nothing (recrawl), so P's
    t is wrongly suppressed by the row-local pass-1 marks; un-suppressing
    it in pass 2 moves P's cap break position EARLIER, changing which of
    P's links are iterated — so pass-2 marks differ from pass-1 marks,
    the stability bit fires, the wave re-plans with a third pass, and the
    fixpoint equals the serial order (t crawled twice, z never).  A
    config with no refinement trigger must never re-plan."""
    from abot_spark.sources.synthetic_web import (WebFixture, _page,
                                                  write_parquet)

    root = "http://c.corner.com"
    fx = WebFixture()
    fx.pages.append(_page(root + "/", ["/A", "/P"], "root"))
    fx.pages.append(_page(root + "/A", ["/x", "/t"], "A"))  # t = A's breaker
    fx.pages.append(_page(root + "/P", ["/t", "/y", "/z"], "P"))
    for leaf in ("/x", "/t", "/y", "/z"):
        fx.pages.append(_page(root + leaf, [], leaf))
    paths = write_parquet(fx, tempfile.mkdtemp(prefix="abot-fixp-web-"))
    pages = spark.read.parquet(paths["pages"])

    cfg = CrawlConfig(is_uri_recrawling_enabled=True,
                      max_links_per_page=2, max_pages_to_crawl=25)
    serial = SerialCrawler(fx, cfg).crawl(root + "/")
    crawler = WaveCrawler(spark, cfg,
                          tempfile.mkdtemp(prefix="abot-fixp-"), pages, None)
    state = crawler.crawl([root + "/"], max_waves=40)
    got = [r["url"] for r in crawler.store.read_all("fetched", state.wave)
           .orderBy("seq").collect()]
    assert got == serial.crawl_order
    # the chain was really 3-deep: t crawled twice, z cut by the moved break
    assert got.count(root + "/t") == 2
    assert root + "/z" not in got
    assert crawler.refine_replans >= 1, \
        "pass-2 marks/iteration changed: the fixpoint loop must re-plan"

    plain = WaveCrawler(spark, CrawlConfig(),
                        tempfile.mkdtemp(prefix="abot-fixp2-"), pages, None)
    plain.crawl([root + "/"], max_waves=40)
    assert plain.refine_replans == 0, "no refinement config: no re-plans"
