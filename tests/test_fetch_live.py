"""Live-fetch stage (plans/fetch_live.py): salted domain bucketing,
politeness pacing, and a real localhost HTTP round-trip mirroring
``PageRequester.cs`` (user-agent/accept/gzip/timeout/redirect switch)."""

import gzip
import http.server
import threading

import pytest
from pyspark.sql import functions as F

from abot_spark.config import CrawlConfig
from abot_spark.plans.fetch_live import (
    HttpFetcher,
    corpus_fetcher,
    salted_fetch,
)
from abot_spark.sources.synthetic_web import generate_web


def _frontier(spark, urls):
    from abot_spark.urls import split_authority_path
    rows = []
    for i, u in enumerate(urls):
        dom, path = split_authority_path(u)
        rows.append((u, dom, path, i))
    return spark.createDataFrame(
        rows, "url string, domain string, path string, seq long")


def test_salted_fetch_corpus_parity(spark):
    fx = generate_web(n_domains=2, sections=2, leaves=2)
    cfg = CrawlConfig(domain_salt=4)
    urls = sorted(fx.page_map())[:40] + ["http://nowhere.example.com/x"]
    out = salted_fetch(_frontier(spark, urls), cfg,
                       corpus_fetcher(fx.page_map())).collect()
    assert len(out) == len(urls)
    by_url = {r["url"]: r for r in out}
    for u in urls[:-1]:
        p = fx.page_map()[u]
        r = by_url[u]
        assert r["status_code"] == p.status_code
        assert r["html"] == p.html
        assert r["content_type"] == p.content_type
    miss = by_url["http://nowhere.example.com/x"]
    assert miss["status_code"] == 404 and miss["error"] == "WebException"
    assert miss["has_web_exception"]


def test_pacing_per_bucket_rate(spark):
    """Each (domain, bucket) paces at delay*salt -> the aggregate domain
    rate equals the politeness delay; within a bucket fetches are FIFO by
    seq with exact spacing."""
    salt = 4
    cfg = CrawlConfig(domain_salt=salt,
                      min_crawl_delay_per_domain_milli_seconds=250)
    urls = [f"http://hot.example.com/p{i}" for i in range(64)]
    fetch = corpus_fetcher({})  # all 404 — pacing is what we measure
    out = salted_fetch(_frontier(spark, urls), cfg, fetch,
                       wave_ts_ms=1_000_000)
    rows = (out.withColumn("bucket", F.pmod(F.xxhash64("url"), F.lit(salt)))
               .select("bucket", "seq", "fetch_ts_ms").collect())
    per_bucket: dict[int, list] = {}
    for r in rows:
        per_bucket.setdefault(r["bucket"], []).append(r)
    assert len(per_bucket) > 1   # the hot domain actually spread out
    for _, rs in per_bucket.items():
        rs.sort(key=lambda r: r["seq"])
        ts = [r["fetch_ts_ms"] for r in rs]
        assert ts[0] == 1_000_000
        for a, b in zip(ts, ts[1:]):
            assert b - a == 250 * salt   # bucket-local spacing
        assert ts == sorted(ts)          # FIFO by seq within the bucket


def test_pacing_honors_robots_delay_column(spark):
    """Scale mode ships per-domain robots Crawl-delays as a
    _robots_delay_ms COLUMN on the due rows (a driver dict cannot hold
    millions of domains); the in-partition pacing must take
    max(column, config base), per domain."""
    salt = 2
    cfg = CrawlConfig(domain_salt=salt,
                      min_crawl_delay_per_domain_milli_seconds=100)
    fr = _frontier(spark, [f"http://slow.example.com/p{i}" for i in range(8)]
                   + [f"http://fast.example.com/p{i}" for i in range(8)])
    fr = fr.withColumn(
        "_robots_delay_ms",
        F.when(F.col("domain") == "slow.example.com", F.lit(500))
        .otherwise(F.lit(None).cast("long")))
    out = salted_fetch(fr, cfg, corpus_fetcher({}), wave_ts_ms=0)
    rows = (out.withColumn("bucket", F.pmod(F.xxhash64("url"), F.lit(salt)))
            .select("domain", "bucket", "seq", "fetch_ts_ms").collect())
    per = {}
    for r in rows:
        per.setdefault((r["domain"], r["bucket"]), []).append(r)
    for (dom, _), rs in per.items():
        rs.sort(key=lambda r: r["seq"])
        expect = (500 if dom == "slow.example.com" else 100) * salt
        for a, b in zip(rs, rs[1:]):
            assert b["fetch_ts_ms"] - a["fetch_ts_ms"] == expect, dom


def test_salted_colocation_and_spread(spark):
    """The salt key hash-colocates each (domain,bucket) in one partition
    while a hot domain spans multiple buckets (the skew defeat)."""
    salt = 8
    urls = [f"http://hot.example.com/p{i}" for i in range(200)] + \
           [f"http://d{i}.example.com/" for i in range(20)]
    fr = _frontier(spark, urls).repartition(
        16, F.concat_ws("#", F.col("domain"),
                        F.pmod(F.xxhash64("url"), F.lit(salt))))
    got = (fr.withColumn("pid", F.spark_partition_id())
             .withColumn("bucket", F.pmod(F.xxhash64("url"), F.lit(salt)))
             .groupBy("domain", "bucket")
             .agg(F.countDistinct("pid").alias("npid"))
             .collect())
    assert all(r["npid"] == 1 for r in got)          # co-located
    hot_buckets = {r["bucket"] for r in got
                   if r["domain"] == "hot.example.com"}
    assert len(hot_buckets) >= salt // 2              # actually spread


class _Handler(http.server.BaseHTTPRequestHandler):
    pages = {}
    requests: list = []   # (path, headers) of every request, for asserts

    def log_message(self, *a):  # quiet
        pass

    def do_GET(self):
        _Handler.requests.append((self.path, dict(self.headers)))
        p = self.pages.get(self.path)
        if p is None:
            self.send_response(404)
            self.end_headers()
            return
        status, headers, body = p
        headers = dict(headers)
        self.send_response(status)
        if "gzip" in (self.headers.get("Accept-Encoding") or "") \
                and headers.pop("X-Gzip", None):
            body = gzip.compress(body)
            headers["Content-Encoding"] = "gzip"
        for k, v in headers.items():
            self.send_header(k, v)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)


@pytest.fixture(scope="module")
def http_srv():
    _Handler.pages = {
        "/": (200, {"Content-Type": "text/html; charset=utf-8"},
              b"<html><a href='/a'>a</a></html>"),
        "/a": (200, {"Content-Type": "text/html", "X-Gzip": "1",
                     "X-Robots-Tag": "nofollow"},
               b"<html>compressed page body</html>"),
        "/r": (301, {"Location": "/a", "Content-Type": "text/html"}, b""),
        "/503": (503, {"Retry-After": "7", "Content-Type": "text/html"},
                 b"busy"),
        "/setc": (200, {"Content-Type": "text/html",
                        "Set-Cookie": "sid=42; Path=/"}, b"<html>c</html>"),
    }
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_http_fetcher_live(http_srv):
    f = HttpFetcher(CrawlConfig())
    r = f(f"{http_srv}/")
    assert r["status_code"] == 200
    assert r["html"] == b"<html><a href='/a'>a</a></html>"
    assert "utf-8" in r["content_type"]
    # transparent gzip decode + header carry-through
    r = f(f"{http_srv}/a")
    assert r["html"] == b"<html>compressed page body</html>"
    assert r["x_robots_tag"] == "nofollow"
    # auto-redirect lands on the target, response_url rewritten (issue 82)
    r = f(f"{http_srv}/r")
    assert r["status_code"] == 200
    assert r["response_url"].endswith("/a")
    # manual mode surfaces the 3xx + Location
    fm = HttpFetcher(CrawlConfig(is_http_request_auto_redirects_enabled=False))
    r = fm(f"{http_srv}/r")
    assert r["status_code"] == 301 and r["location"] == "/a"
    # Retry-After surfaces for F5
    r = f(f"{http_srv}/503")
    assert r["status_code"] == 503 and r["retry_after"] == "7"
    # connection failure -> the fetch_wave no-response synth
    r = f("http://127.0.0.1:9/never")
    assert r["status_code"] == 404 and r["error"] == "WebException"


def test_http_fetcher_basic_auth_header(http_srv):
    """IsAlwaysLogin sends Authorization: Basic base64(ascii(user:pass))
    on every request — byte-identical to PageRequester.cs:209-216."""
    import base64

    f = HttpFetcher(CrawlConfig(is_always_login=True, login_user="bob",
                                login_password="s3cret"))
    assert f(f"{http_srv}/")["status_code"] == 200
    sent = _Handler.requests[-1][1]
    assert sent.get("Authorization") == (
        "Basic " + base64.b64encode(b"bob:s3cret").decode("ascii"))
    # off by default: no Authorization header leaves the fetcher
    HttpFetcher(CrawlConfig())(f"{http_srv}/")
    assert "Authorization" not in _Handler.requests[-1][1]


def test_http_fetcher_cookie_jar(http_srv):
    """IsSendCookiesEnabled: Set-Cookie responses populate a per-fetcher
    jar replayed on later requests (the reference's CookieContainer,
    PageRequester.cs:200-201 + ProcessResponseObject); disabled mode
    never echoes cookies back."""
    jar_on = HttpFetcher(CrawlConfig(is_send_cookies_enabled=True))
    assert jar_on(f"{http_srv}/setc")["status_code"] == 200
    assert jar_on(f"{http_srv}/")["status_code"] == 200
    assert "sid=42" in (_Handler.requests[-1][1].get("Cookie") or "")

    jar_off = HttpFetcher(CrawlConfig())
    jar_off(f"{http_srv}/setc")
    jar_off(f"{http_srv}/")
    assert "Cookie" not in _Handler.requests[-1][1]

    # pickling for the executor closure never ships the live jar (the
    # CookieJar's RLock doesn't pickle) — but the deserialized clone in
    # this same process resolves the SAME jar via the module registry,
    # so cookies persist across task re-pickles and waves (ADVICE r2)
    import pickle

    from abot_spark.plans.fetch_live import _COOKIE_JARS
    clone = pickle.loads(pickle.dumps(jar_on))
    assert clone.send_cookies and clone._jar_key == jar_on._jar_key
    clone(f"{http_srv}/")
    assert "sid=42" in (_Handler.requests[-1][1].get("Cookie") or "")
    assert _COOKIE_JARS[clone._jar_key] is _COOKIE_JARS[jar_on._jar_key]


def test_http_fetcher_non_ascii_credentials():
    """Encoding.ASCII parity (PageRequester.cs:209-216): non-ASCII
    credential characters substitute '?' instead of raising."""
    import base64

    f = HttpFetcher(CrawlConfig(is_always_login=True,
                                login_user="usér", login_password="pässwörd"))
    val = f.extra_headers["Authorization"]
    assert val.startswith("Basic ")
    decoded = base64.b64decode(val[6:]).decode("ascii")
    assert decoded == "us?r:p?ssw?rd"


def test_salted_fetch_live_http(spark, http_srv):
    """The full Spark stage against the live server: executor-side
    fetches, gzip decode, redirect resolution, extract-ready rows."""
    cfg = CrawlConfig(domain_salt=2)
    urls = [f"{http_srv}/", f"{http_srv}/a", f"{http_srv}/r",
            f"{http_srv}/missing"]
    out = salted_fetch(_frontier(spark, urls), cfg, HttpFetcher(cfg))
    by_path = {r["url"].rsplit("/", 1)[-1]: r for r in out.collect()}
    assert by_path[""]["html"] == b"<html><a href='/a'>a</a></html>"
    assert by_path["a"]["html"] == b"<html>compressed page body</html>"
    assert by_path["r"]["response_url"].endswith("/a")
    assert by_path["missing"]["status_code"] == 404
    assert by_path["missing"]["has_web_exception"]


def test_wave_engine_over_live_fetch_parity(spark, tmp_path):
    """The full wave engine with fetcher= (no corpus join) must match the
    serial reference oracle exactly — same order, same seen set."""
    from abot_spark.crawler import WaveCrawler
    from abot_spark.oracle.serial import SerialCrawler

    fx = generate_web(n_domains=2, sections=2, leaves=2)
    cfg = CrawlConfig(is_respect_robots_dot_text_enabled=False)
    serial = SerialCrawler(fx, cfg).crawl("http://d0.example.com/")
    c = WaveCrawler(spark, cfg, str(tmp_path / "crawl"), None,
                    fetcher=corpus_fetcher(fx.page_map()))
    st = c.crawl(["http://d0.example.com/"])
    order = [r["url"] for r in
             c.store.read_all("fetched", st.wave).orderBy("seq").collect()]
    assert order == serial.crawl_order


def test_wave_engine_live_http_crawl(spark, tmp_path, http_srv):
    """A real end-to-end HTTP crawl: seed the localhost server, follow
    its links through the decision pipeline, store extracted text."""
    from abot_spark.crawler import WaveCrawler
    from abot_spark.plans.fetch_live import HttpFetcher

    cfg = CrawlConfig(is_respect_robots_dot_text_enabled=False)
    c = WaveCrawler(spark, cfg, str(tmp_path / "live"), None,
                    fetcher=HttpFetcher(cfg))
    st = c.crawl([f"{http_srv}/"])
    rows = {r["url"]: r for r in
            c.store.read_all("fetched", st.wave).collect()}
    assert f"{http_srv}/" in rows
    # "/" links to /a -> fetched in wave 1 (gzip-decoded, text extracted)
    assert f"{http_srv}/a" in rows
    assert "compressed page body" in rows[f"{http_srv}/a"]["text"]
