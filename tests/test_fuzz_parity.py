"""Randomized cross-engine parity: the distributed wave engine must match
the serial oracle on arbitrary graphs and config mixes, not just the
hand-built fixtures.

Each case is a pure function of its seed (graph shape, link mix, status
mutations, robots, config knobs all come from one ``random.Random(seed)``),
so failures replay exactly.  This is the property-style analogue of the
reference's set-based integration oracle
(``Abot.Tests.Integration/CrawlTestBase.cs:81-125``) with our stronger
contract: exact (url, status) SET and exact (wave, seq) ORDER.
"""

from __future__ import annotations

import random
import tempfile

import pytest

from abot_spark.config import CrawlConfig
from abot_spark.crawler import WaveCrawler
from abot_spark.oracle.serial import SerialCrawler
from abot_spark.sources.synthetic_web import WebFixture, _page, write_parquet
from abot_spark.urls import authority


def _random_fixture(rng: random.Random) -> tuple[WebFixture, list[str]]:
    fx = WebFixture()
    n_domains = rng.randint(1, 3)
    doms = [f"http://r{i}.fuzz.com" for i in range(n_domains)]
    urls: list[str] = []
    for d in doms:
        n_pages = rng.randint(2, 8)
        urls += [d + "/"] + [f"{d}/p{k}" for k in range(1, n_pages)]

    for url in urls:
        links: list[str] = []
        for _ in range(rng.randint(0, 6)):
            r = rng.random()
            if r < 0.42:
                links.append(rng.choice(urls))            # absolute, exists
            elif r < 0.58:
                links.append(f"/p{rng.randint(0, 9)}")    # relative, may 404
            elif r < 0.68:
                links.append(rng.choice(urls) + "#frag")  # fragment dup
            elif r < 0.76:
                links.append(f"http://x{rng.randint(0, 2)}.other.com/")
            elif r < 0.82:
                links.append(url)                         # self link
            # gnarly href shapes: canonical collisions + odd resolutions
            # (the class where the absolutize fast paths live)
            elif r < 0.86:
                # whitespace exposed by fragment stripping ("/p1 #x")
                links.append(f"/p{rng.randint(0, 3)} #x")
            elif r < 0.90:
                links.append(f"./p{rng.randint(0, 3)}")   # dot segment
            elif r < 0.94:
                links.append(f"../p{rng.randint(0, 3)}")  # parent segment
            elif r < 0.97:
                links.append(f"?q={rng.randint(0, 2)}")   # query-only
            else:
                # protocol-relative to a fixture domain
                host = rng.choice(doms).split("//", 1)[1]
                links.append(f"//{host}/p{rng.randint(0, 3)}")
        extra = ""
        if rng.random() < 0.25:
            extra += f'<a href="/nf{rng.randint(0, 9)}" rel="nofollow">n</a>'
        if rng.random() < 0.15:
            extra += '<meta name="robots" content="nofollow" />'
        if rng.random() < 0.15:
            extra += f'<a href="{rng.choice(urls)}#x">f</a>'
        p = _page(url, links, f"t {url}", ts_off=rng.randint(0, 100),
                  extra=extra)
        s = rng.random()
        if s < 0.08:
            p.status_code = 404
        elif s < 0.14:
            p.status_code = 503
            p.retry_after = str(rng.randint(1, 3))
        elif s < 0.20:
            p.status_code = 301
            p.location = rng.choice(urls)
        fx.pages.append(p)

    if rng.random() < 0.5:
        fx.robots.append((authority(doms[0] + "/"),
                          "User-agent: *\nDisallow: /p1\n"))

    # Second-pass decorations draw from a DERIVED rng so the primary
    # stream above is untouched — committed regression seeds keep
    # generating byte-identical cases as coverage widens here.  Seeding
    # from a snapshot of the internal state (not getrandbits!) consumes
    # nothing from the primary stream — the config draws that follow in
    # the caller stay exactly as they were.
    rng2 = random.Random(rng.getstate()[1][0] * 2654435761 % (1 << 32))
    if not fx.robots and rng2.random() < 0.3:
        # richer robots: named group + wildcard group (non-inheritance),
        # Allow carve-out, sometimes a root disallow (the F6 escape-hatch
        # trigger when paired with the ignore-if-root-disallowed knob)
        body = rng2.choice([
            "User-agent: abot\nDisallow: /p2\n\n"
            "User-agent: *\nDisallow: /p3\n",
            "User-agent: *\nAllow: /p1\nDisallow: /p\n",
            "User-agent: *\nDisallow: /\n",
        ])
        fx.robots.append((authority(doms[0] + "/"), body))
    for p in fx.pages:
        if p.url.endswith(".com/"):
            continue  # never decorate roots: a gutted root degenerates
                      # the whole case to a 1-page crawl
        if p.status_code == 200 and rng2.random() < 0.1:
            p.x_robots_tag = rng2.choice(["nofollow", "none"])
        elif p.status_code == 200 and rng2.random() < 0.06:
            p.content_type = "text/plain"   # F3: not downloadable
    return fx, doms


def _random_config(rng: random.Random) -> CrawlConfig:
    max_pages = rng.choice([0, 4, 9, 25])
    return CrawlConfig(
        max_pages_to_crawl=max_pages,
        # recrawling + unbounded budget never terminates on a cyclic graph
        # (in the reference too) — only draw it under a finite budget
        is_uri_recrawling_enabled=max_pages > 0 and rng.random() < 0.2,
        max_crawl_depth=rng.choice([1, 2, 100]),
        max_retry_count=rng.choice([0, 1, 2]),
        min_retry_delay_in_milliseconds=rng.choice([0, 200]),
        is_external_page_crawling_enabled=rng.random() < 0.5,
        is_external_page_links_crawling_enabled=rng.random() < 0.5,
        is_respect_robots_dot_text_enabled=rng.random() < 0.5,
        min_crawl_delay_per_domain_milli_seconds=rng.choice([0, 500]),
        max_pages_to_crawl_per_domain=rng.choice([0, 3]),
        max_links_per_page=rng.choice([0, 3]),
        is_respect_anchor_rel_no_follow_enabled=rng.random() < 0.5,
        is_respect_meta_robots_no_follow_enabled=rng.random() < 0.5,
        is_http_request_auto_redirects_enabled=rng.random() < 0.7,
        http_request_max_auto_redirects=rng.choice([1, 7]),
        is_respect_url_named_anchor_or_hashbang_enabled=rng.random() < 0.3,
        # F4 post-download size gate (WebCrawler.cs:841-858): fixture pages
        # are a few hundred bytes, so 600 drops a real subset
        max_page_size_in_bytes=rng.choice([0, 0, 600]),
        # drawn AFTER every existing knob: extending the tail keeps the
        # prefix of the rng stream — and so every committed seed — stable
        is_ignore_robots_dot_text_if_root_disallowed_enabled=(
            rng.random() < 0.3),
    )


@pytest.mark.parametrize(
    "seed", [101, 202, 303, 404, 505, 606, 707, 808, 909, 1010, 1111, 1212,
             # found by a wider sweep: 5000 = recrawling × MaxLinksPerPage
             # cap-breaker seen-marking (breaker/seeds must stay unknown);
             # 5003 = Retry-After longer than the inter-wave gap must wait
             # in place, not defer (serial order would be leapfrogged)
             5000, 5003])
def test_fuzz_graph_and_config_parity(spark, seed):
    rng = random.Random(seed)
    fx, doms = _random_fixture(rng)
    cfg = _random_config(rng)
    seeds = [doms[0] + "/"]
    serial = SerialCrawler(fx, cfg).crawl(seeds[0])

    tmp = tempfile.mkdtemp(prefix="abot-fuzz-web-")
    paths = write_parquet(fx, tmp)
    crawler = WaveCrawler(
        spark, cfg, tempfile.mkdtemp(prefix="abot-fuzz-crawl-"),
        spark.read.parquet(paths["pages"]),
        spark.read.parquet(paths["robots"]) if fx.robots else None)
    state = crawler.crawl(seeds, max_waves=40)
    fetched = crawler.store.read_all("fetched", state.wave)
    rows = fetched.orderBy("seq").collect() if fetched is not None else []

    got_order = [r["url"] for r in rows]
    got_status = {(r["url"], r["status_code"]) for r in rows}
    want_status = {(e.url, e.status_code) for e in serial.crawled}

    assert got_order == serial.crawl_order, (
        f"seed={seed} cfg={cfg} order mismatch: "
        f"got {got_order} want {serial.crawl_order}")
    assert got_status == want_status, f"seed={seed} status-set mismatch"


@pytest.mark.parametrize("seed", [101, 303, 505, 5000, 5003])
def test_fuzz_parity_with_bloom_forced_on(spark, seed):
    """Same parity property with the sharded bloom sidecar FORCED live
    from wave 0 (min_rows=0): the probe/fork fast path must be invisible
    to crawl order and status set on arbitrary graph x config draws."""
    rng = random.Random(seed)
    fx, doms = _random_fixture(rng)
    cfg = _random_config(rng).with_(
        use_seen_bloom=True, seen_bloom_min_rows=0, bloom_n_shards=8)
    seeds = [doms[0] + "/"]
    serial = SerialCrawler(fx, cfg).crawl(seeds[0])

    tmp = tempfile.mkdtemp(prefix="abot-fuzzb-web-")
    paths = write_parquet(fx, tmp)
    crawler = WaveCrawler(
        spark, cfg, tempfile.mkdtemp(prefix="abot-fuzzb-crawl-"),
        spark.read.parquet(paths["pages"]),
        spark.read.parquet(paths["robots"]) if fx.robots else None)
    state = crawler.crawl(seeds, max_waves=40)
    fetched = crawler.store.read_all("fetched", state.wave)
    rows = fetched.orderBy("seq").collect() if fetched is not None else []

    assert [r["url"] for r in rows] == serial.crawl_order, (
        f"seed={seed} bloom-on order mismatch")
    assert {(r["url"], r["status_code"]) for r in rows} == {
        (e.url, e.status_code) for e in serial.crawled}


def _shaped_collision_fixture(rng: random.Random):
    """Adversarial shape for the dedup-marking corners (VERDICT r2 #5/#7):
    redirect pages and direct links to the SAME small target set collide
    repeatedly within one wave (2-4 deep), under tight budgets / domain
    caps / link caps — exactly where a window-denied redirect child must
    NOT suppress a later same-wave occurrence."""
    fx = WebFixture()
    d = "http://shape.fuzz.com"
    targets = [f"{d}/t{k}" for k in range(4)]
    redirs = [f"{d}/r{k}" for k in range(rng.randint(2, 5))]
    extras = [f"{d}/x{k}" for k in range(3)]

    root_links: list[str] = []
    for _ in range(rng.randint(6, 14)):
        r = rng.random()
        if r < 0.4:
            root_links.append(rng.choice(redirs))     # collision via 301
        elif r < 0.85:
            root_links.append(rng.choice(targets))    # direct collision
        else:
            root_links.append(rng.choice(extras))
    fx.pages.append(_page(d + "/", root_links, "root"))
    for q in redirs:
        p = _page(q, [], f"r {q}")
        p.status_code = 301
        p.location = rng.choice(targets)
        fx.pages.append(p)
    for t in targets:
        fx.pages.append(_page(
            t, [rng.choice(targets), rng.choice(redirs),
                rng.choice(targets)], f"t {t}"))
    for x in extras:
        fx.pages.append(_page(x, [rng.choice(targets)], f"x {x}"))
    return fx, [d]


def _shaped_config(rng: random.Random) -> CrawlConfig:
    return CrawlConfig(
        max_pages_to_crawl=rng.choice([3, 4, 6, 9]),
        max_links_per_page=rng.choice([0, 1, 1, 2, 3]),
        max_pages_to_crawl_per_domain=rng.choice([0, 0, 2, 4]),
        is_uri_recrawling_enabled=rng.random() < 0.25,
        max_retry_count=0,
        is_http_request_auto_redirects_enabled=rng.random() < 0.8,
        http_request_max_auto_redirects=rng.choice([1, 7]),
    )


@pytest.mark.parametrize("seed", [11, 22, 33, 44, 55, 66, 77, 88, 99, 110])
def test_shaped_collision_parity(spark, seed):
    """Budget/cap-tight redirect-collision graphs must match the serial
    oracle exactly — these shapes hunt the marking-refinement corners
    (window-denied redirect children; >=3-deep same-wave collisions;
    link cap + budget both tight in one wave)."""
    rng = random.Random(seed)
    fx, doms = _shaped_collision_fixture(rng)
    cfg = _shaped_config(rng)
    serial = SerialCrawler(fx, cfg).crawl(doms[0] + "/")

    tmp = tempfile.mkdtemp(prefix="abot-shape-web-")
    paths = write_parquet(fx, tmp)
    crawler = WaveCrawler(
        spark, cfg, tempfile.mkdtemp(prefix="abot-shape-crawl-"),
        spark.read.parquet(paths["pages"]), None)
    state = crawler.crawl([doms[0] + "/"], max_waves=40)
    fetched = crawler.store.read_all("fetched", state.wave)
    rows = fetched.orderBy("seq").collect() if fetched is not None else []

    assert [r["url"] for r in rows] == serial.crawl_order, (
        f"seed={seed} cfg={cfg} order mismatch")
    assert {(r["url"], r["status_code"]) for r in rows} == {
        (e.url, e.status_code) for e in serial.crawled}, f"seed={seed}"


def test_organic_fixpoint_replan_parity(spark):
    """Shaped seed 219 — found by the round-4 100-seed offline sweep — is
    the ORGANIC specimen of the >=3-deep same-wave interaction chain: the
    default 2-pass refinement comes out unstable, the wave loop's
    stability bit (``_refine_changed``) triggers exactly one fixpoint
    re-plan, and the re-planned wave matches the serial oracle's order
    and set exactly.  Complements ``test_refinement_fixpoint_replans_
    until_stable`` (a hand-built chain) with a generator-found one, and
    pins that the re-plan path stays LIVE under the default config —
    if a future change makes marks spuriously 'stable' at 2 passes, the
    replans assertion below fails before the parity one can go silent."""
    rng = random.Random(219)
    fx, doms = _shaped_collision_fixture(rng)
    cfg = _shaped_config(rng)
    serial = SerialCrawler(fx, cfg).crawl(doms[0] + "/")

    paths = write_parquet(fx, tempfile.mkdtemp(prefix="abot-s219-web-"))
    crawler = WaveCrawler(
        spark, cfg, tempfile.mkdtemp(prefix="abot-s219-crawl-"),
        spark.read.parquet(paths["pages"]), None)
    state = crawler.crawl([doms[0] + "/"], max_waves=40)
    fetched = crawler.store.read_all("fetched", state.wave)
    rows = fetched.orderBy("seq").collect() if fetched is not None else []

    assert crawler.refine_replans >= 1, (
        "seed 219 must exercise the fixpoint re-plan path (it did in the "
        "round-4 sweep); 0 re-plans means the instability detector went "
        "dead, not that the corner disappeared")
    assert [r["url"] for r in rows] == serial.crawl_order
    assert {(r["url"], r["status_code"]) for r in rows} == {
        (e.url, e.status_code) for e in serial.crawled}


def test_refinement_passes_knob(spark):
    """``dedup_refinement_passes`` controls the marking-refinement depth:
    1 reproduces the pre-refinement corner (shaped seed 66: a capped
    page's cut links spuriously consume budget and latch the crawl one
    wave early), while 2 and 3 both match the serial oracle exactly
    (the shaped sweeps found no case needing more than 2)."""
    rng = random.Random(66)
    fx, doms = _shaped_collision_fixture(rng)
    base_cfg = _shaped_config(rng)
    serial = SerialCrawler(fx, base_cfg).crawl(doms[0] + "/")
    paths = write_parquet(fx, tempfile.mkdtemp(prefix="abot-knob-web-"))
    pages = spark.read.parquet(paths["pages"])

    def run(passes):
        c = WaveCrawler(spark,
                        base_cfg.with_(dedup_refinement_passes=passes),
                        tempfile.mkdtemp(prefix="abot-knob-crawl-"),
                        pages, None)
        st = c.crawl([doms[0] + "/"], max_waves=40)
        f = c.store.read_all("fetched", st.wave)
        return [r["url"] for r in f.orderBy("seq").collect()] \
            if f is not None else []

    assert run(1) != serial.crawl_order   # corner reproduced
    assert run(2) == serial.crawl_order
    assert run(3) == serial.crawl_order   # extra pass is a no-op here
