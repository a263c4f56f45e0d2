"""S3 at deployment scale — the live-HTTP fetch stage.

The wave engine's default fetch is a corpus join (``plans/wave.py
fetch_wave`` — the simulated web).  This module is the stage that replaces
it in a real deployment: a ``mapInPandas`` fetcher over the due frontier,
**salted-repartitioned by domain** so one hot host cannot pin a single
task (the reference serializes per-host via ``DomainRateLimiter`` —
``Abot/Core/Limiters/DomainRateLimiter.cs:41-49`` — which maps to
partition-local pacing here, not to a global lock).

Partitioning contract (the skew story at 10^10-URL scale):

- partition key = ``concat(domain, '#', pmod(xxhash64(url), salt))`` with
  ``salt = cfg.domain_salt``.  A domain's due rows land in at most
  ``salt`` buckets; each bucket paces itself at ``delay * salt`` so the
  *aggregate* per-domain request rate still honors the politeness delay
  (``max(robots crawl-delay capped, config min)`` — same effective-delay
  rule as the wave loop, ``PoliteWebCrawler.cs:146-167``).
- within a bucket, fetches run FIFO by ``seq`` — the reference's
  per-domain ordering (``RateLimiter`` admits waiters in arrival order).
- pacing is a **simulated clock** by default (``fetch_ts_ms`` column
  records when each request would have fired — deterministic, testable);
  ``pace_sleep=True`` makes the stage actually sleep the residual, which
  is what a production crawl runs.

Fetchers are plain callables ``url -> dict`` (see :class:`HttpFetcher`
for the live stdlib implementation mirroring ``PageRequester.cs:183-219``:
user-agent, ``Accept: */*``, gzip/deflate, timeout, optional
auto-redirects) so tests can inject a dict-backed fake.  The output schema
is exactly what ``extract_wave`` consumes — the stage is a drop-in for
``fetch_wave`` + the corpus-prep redirect columns.
"""

from __future__ import annotations

import time
from collections import OrderedDict
from typing import Callable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType, IntegerType, LongType, StringType, StructField, StructType,
)

from abot_spark.config import CrawlConfig
from abot_spark.urls import canonicalize, split_authority_path

FETCH_COLS = StructType([
    StructField("status_code", IntegerType()),
    StructField("content_type", StringType()),
    StructField("html", BinaryType()),
    StructField("retry_after", StringType()),
    StructField("x_robots_tag", StringType()),
    StructField("error", StringType()),
    StructField("location_canon", StringType()),
    StructField("location_domain", StringType()),
    StructField("location_path", StringType()),
    StructField("response_url", StringType()),
    StructField("fetch_ts_ms", LongType()),
])

#: columns a fetcher callable must return (location may be None)
FETCHER_FIELDS = ("status_code", "content_type", "html", "retry_after",
                  "x_robots_tag", "error", "location", "response_url")

#: per-worker-process cookie jars, keyed by HttpFetcher._jar_key — the
#: jar itself never pickles (CookieJar holds an RLock); each worker
#: process that deserializes a fetcher lazily materializes its own jar
#: here and keeps it across tasks and waves (see HttpFetcher docstring).
#: LRU-bounded: every HttpFetcher ever constructed mints a fresh key, so
#: an unbounded dict leaks one jar per fetcher in long-lived reused
#: workers (multiple crawls/sessions per process).  One crawl uses one
#: fetcher, so the cap only ever evicts jars of finished crawls; an
#: evicted-but-live jar just restarts that fetcher's session — the same
#: fresh-session semantics as a worker restart.
_COOKIE_JARS: OrderedDict = OrderedDict()
_COOKIE_JARS_MAX = 64


def _cookie_jar(key: str):
    jar = _COOKIE_JARS.get(key)
    if jar is None:
        from http.cookiejar import CookieJar
        jar = _COOKIE_JARS.setdefault(key, CookieJar())
    _COOKIE_JARS.move_to_end(key)
    while len(_COOKIE_JARS) > _COOKIE_JARS_MAX:
        _COOKIE_JARS.popitem(last=False)
    return jar


class HttpFetcher:
    """Live fetch via stdlib urllib — the ``HttpWebRequest`` surface of
    ``PageRequester.BuildRequestObject`` (``Abot/Core/Requests/
    PageRequester.cs:183-219``): user-agent, ``Accept: */*``,
    gzip/deflate ``Accept-Encoding``, request timeout, the auto-redirect
    switch, HTTP Basic auth when ``is_always_login``
    (``Authorization: Basic base64(ascii(user:password))`` — byte-for-byte
    the reference's header, ``PageRequester.cs:209-216``, including the
    ``Encoding.ASCII`` behavior of substituting ``?`` for non-ASCII
    credential characters), and a cookie jar when
    ``is_send_cookies_enabled`` (the reference's per-requester
    ``CookieContainer``, ``:200-201`` + ``ProcessResponseObject``).

    Cookie scope vs the reference: the reference's jar spans the whole
    single-process crawl.  Here the fetcher closure is re-pickled per
    Spark task, so the jar lives in a module-level registry keyed by
    the fetcher's identity — one jar per (Python worker process,
    fetcher), surviving task boundaries and waves while Spark reuses
    workers (``spark.python.worker.reuse``, default on).  Combined with
    the sticky salted-domain partitioning a domain's fetches keep
    hitting the same worker and hence the same session cookies; a
    domain rescheduled onto a different worker starts a fresh session —
    the honest delta from the reference's process-global jar.  Further
    headers a deployment needs ride in ``extra_headers``."""

    def __init__(self, cfg: CrawlConfig, extra_headers: dict | None = None):
        import uuid
        self.user_agent = cfg.user_agent_string
        self.timeout_s = max(cfg.http_request_timeout_in_seconds, 1)
        self.auto_redirect = cfg.is_http_request_auto_redirects_enabled
        self.max_redirects = cfg.http_request_max_auto_redirects
        self.extra_headers = dict(extra_headers or {})
        if cfg.is_always_login:
            import base64
            # errors='replace' = '?' for non-ASCII, matching .NET's
            # Encoding.ASCII instead of raising UnicodeEncodeError
            cred = base64.b64encode(
                f"{cfg.login_user}:{cfg.login_password}"
                .encode("ascii", errors="replace")
            ).decode("ascii")
            self.extra_headers.setdefault("Authorization", "Basic " + cred)
        self.send_cookies = cfg.is_send_cookies_enabled
        # stable across pickling: every deserialized copy of this fetcher
        # resolves to the same per-worker jar in _COOKIE_JARS
        self._jar_key = uuid.uuid4().hex

    def _handlers(self):
        import urllib.request

        class _NoRedirect(urllib.request.HTTPRedirectHandler):
            def redirect_request(self, req, fp, code, msg, headers, newurl):
                return None

        handlers = [] if self.auto_redirect else [_NoRedirect()]
        if self.send_cookies:
            handlers.append(
                urllib.request.HTTPCookieProcessor(_cookie_jar(self._jar_key)))
        return handlers

    def __call__(self, url: str) -> dict:
        import gzip
        import io
        import urllib.error
        import urllib.request
        import zlib

        opener = urllib.request.build_opener(*self._handlers())
        if self.auto_redirect:
            # HTTPRedirectHandler caps via .max_redirections on the handler
            for h in opener.handlers:
                if isinstance(h, urllib.request.HTTPRedirectHandler):
                    h.max_redirections = max(self.max_redirects, 1)
        headers = {"User-Agent": self.user_agent, "Accept": "*/*",
                   "Accept-Encoding": "gzip, deflate", **self.extra_headers}
        req = urllib.request.Request(url, headers=headers)
        out = dict.fromkeys(FETCHER_FIELDS)
        out["response_url"] = url
        try:
            resp = opener.open(req, timeout=self.timeout_s)
            body, hdrs, status, rurl = resp.read(), resp.headers, \
                resp.status, resp.geturl()
        except urllib.error.HTTPError as e:
            # 3xx in manual mode and 4xx/5xx both land here with a
            # response attached (the .NET WebException-with-Response path,
            # PageRequester.cs:120-135)
            body, hdrs, status, rurl = e.read(), e.headers, e.code, url
        except Exception:
            out["error"] = "WebException"
            out["status_code"] = 404   # fetch_wave's no-response synth
            return out
        enc = (hdrs.get("Content-Encoding") or "").lower()
        if enc == "gzip":
            body = gzip.GzipFile(fileobj=io.BytesIO(body)).read()
        elif enc == "deflate":
            body = zlib.decompress(body, -zlib.MAX_WBITS)
        out.update(
            status_code=int(status), html=bytes(body),
            content_type=hdrs.get("Content-Type"),
            retry_after=hdrs.get("Retry-After"),
            x_robots_tag=hdrs.get("X-Robots-Tag"),
            location=hdrs.get("Location"),
            response_url=canonicalize(rurl) or rurl,
        )
        return out


def corpus_fetcher(page_map: dict) -> Callable[[str], dict]:
    """Dict-backed fetcher for tests/simulation: ``page_map`` maps url ->
    object with the synthetic-web fields (``sources/synthetic_web.py``)."""

    def fetch(url: str) -> dict:
        p = page_map.get(url)
        out = dict.fromkeys(FETCHER_FIELDS)
        out["response_url"] = url
        if p is None:
            out["status_code"], out["error"] = 404, "WebException"
            return out
        out.update(status_code=p.status_code, content_type=p.content_type,
                   html=p.html, retry_after=p.retry_after,
                   x_robots_tag=p.x_robots_tag, error=p.error,
                   location=p.location)
        return out

    return fetch


def salted_fetch(frontier: DataFrame, cfg: CrawlConfig,
                 fetcher: Callable[[str], dict],
                 delays_ms: dict[str, int] | None = None,
                 *, wave_ts_ms: int = 0, pace_sleep: bool = False,
                 num_partitions: int | None = None) -> DataFrame:
    """The live-fetch stage: due frontier rows → salted domain buckets →
    paced per-bucket FIFO fetch → ``extract_wave``-ready rows.

    ``delays_ms`` is the per-domain effective delay (the wave loop's
    ``_effective_delays()``); absent domains use
    ``cfg.min_crawl_delay_per_domain_milli_seconds``.
    """
    salt = max(cfg.domain_salt, 1)
    base_delay = cfg.min_crawl_delay_per_domain_milli_seconds
    delays = dict(delays_ms or {})
    nparts = num_partitions or cfg.shuffle_partitions or 32

    # the bucket travels as a column so pacing can key on (domain, bucket)
    # even when hash-partitioning packs several buckets into one task
    frontier = frontier.withColumn(
        "_salt_bucket", F.pmod(F.xxhash64("url"), F.lit(salt)))
    in_schema = frontier.schema
    out_schema = StructType(list(in_schema) + list(FETCH_COLS))
    in_cols = [f.name for f in in_schema]

    def run(batches):
        rows = [pdf for pdf in batches]
        if not rows:
            return
        pdf = pd.concat(rows, ignore_index=True)
        order = pdf.sort_values(["domain", "_salt_bucket", "seq"]).index \
            if "seq" in pdf.columns \
            else pdf.sort_values(["domain", "_salt_bucket"]).index
        last_ts: dict[tuple, int] = {}
        out_rows: list[dict] = []
        t_base = wave_ts_ms if not pace_sleep else int(time.time() * 1000)
        has_col_delay = "_robots_delay_ms" in pdf.columns
        for i in order:
            row = pdf.loc[i]
            dom = row["domain"]
            # per-bucket pacing at delay*salt keeps the aggregate domain
            # rate at the politeness delay even with `salt` buckets firing
            # independently.  Per-domain robots Crawl-delays arrive either
            # via the delays dict (parity mode) or as the _robots_delay_ms
            # column the scale mode's politeness join left on the due rows
            # (millions of domains never fit a driver dict).
            col_delay = 0
            if has_col_delay and pd.notna(row["_robots_delay_ms"]):
                col_delay = int(row["_robots_delay_ms"])
            delay = max(delays.get(dom, 0), col_delay, base_delay) * salt
            key = (dom, row["_salt_bucket"])
            prev = last_ts.get(key)
            due = t_base if prev is None else prev + delay
            if pace_sleep:
                wait_s = (due - int(time.time() * 1000)) / 1000
                if wait_s > 0:
                    time.sleep(wait_s)
                due = int(time.time() * 1000)
            last_ts[key] = due
            r = fetcher(row["url"])
            loc = canonicalize(r.get("location")) if r.get("location") else None
            ldom, lpath = split_authority_path(loc) if loc else (None, None)
            rec = {c: row[c] for c in in_cols}
            rec.update(
                status_code=r["status_code"], content_type=r["content_type"],
                html=r["html"], retry_after=r["retry_after"],
                x_robots_tag=r["x_robots_tag"], error=r["error"],
                location_canon=loc, location_domain=ldom,
                location_path=lpath,
                response_url=r["response_url"] or row["url"],
                fetch_ts_ms=due,
            )
            out_rows.append(rec)
            if len(out_rows) >= 64:   # bound html accumulation per chunk
                yield pd.DataFrame(out_rows)
                out_rows = []
        if out_rows:
            yield pd.DataFrame(out_rows)

    salted = frontier.repartition(
        nparts, F.concat_ws("#", F.col("domain"), F.col("_salt_bucket")))
    fetched = salted.mapInPandas(run, out_schema)
    return (
        fetched
        .drop("_salt_bucket")
        .withColumn("status_code",
                    F.coalesce(F.col("status_code"), F.lit(404)))
        .withColumn(
            "has_web_exception",
            F.col("error").isNotNull() | (F.col("status_code") >= 400),
        )
    )
