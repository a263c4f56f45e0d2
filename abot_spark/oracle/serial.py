"""Serial reference crawler — the parity oracle for the Spark wave engine.

A faithful single-threaded re-enactment of the reference's crawl loop over
the simulated corpus (:mod:`abot_spark.sources.synthetic_web`).  With one
thread, Abot's FIFO queue makes the crawl order total and deterministic
(``Abot/Utils/Threads/QueueTask.cs`` order == enqueue order), which is
exactly the ``(wave, seq)`` order the distributed engine must reproduce in
single-partition mode.

Loop shape per ``Abot/Crawler/WebCrawler.cs``:

- ``StartCrawlRootPage`` (:480-495): root gated by ``ShouldSchedulePageLink``.
- ``ProcessPage`` (:687-748): ``AddPageToContext`` (retries bump RetryCount
  only, :1084-1094) → fetch → root-redirect validation (:1277-1291) →
  manual-redirect op when auto-redirects off (:754-789) → size gate
  (:841-858) → F2 → parse links → ``SchedulePageLinks`` (:1109-1155) →
  completed → F5 retry re-enqueue (:729-733).
- ``SchedulePageLinks``: per link in first-seen order: skip if known; else
  build child (depth+1) → ``ShouldSchedulePageLink`` = (internal or
  external-crawling) and robots gate (``PoliteWebCrawler.cs:181-242``) and
  F1 with the MaxPages latch (:908-944, silent once latched); admitted →
  enqueue; per-page cap breaks the loop **without** marking the remaining
  links known; every *iterated* link is marked known (:1153).
- ``Scheduler.Add`` (:73-99): retries/recrawl bypass the AddIfNew gate.

The "HTTP" layer is the corpus lookup: auto-redirect mode follows 3xx
``location`` chains up to ``HttpRequestMaxAutoRedirects`` like
``HttpWebRequest`` would; missing URLs are 404 + WebException (the .NET
behavior for non-success codes).
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass, field
from urllib.parse import urlsplit

from abot_spark.config import CrawlConfig
from abot_spark.functions.link_extract import get_links
from abot_spark.functions.robots import RobotsDotText
from abot_spark.functions.text_extract import extract_text
from abot_spark.operators.decisions import (
    ContextView,
    PageView,
    decide_should_crawl_page,
    decide_should_crawl_page_links,
    decide_should_download_page_content,
    decide_should_recrawl_page,
)
from abot_spark.sources.synthetic_web import PageRec, WebFixture
from abot_spark.urls import authority, canonicalize


@dataclass
class QueuedPage:
    url: str
    parent_url: str | None
    depth: int
    is_root: bool = False
    is_internal: bool = True
    is_retry: bool = False
    retry_count: int = 0
    redirected_from: str | None = None
    redirect_position: int = 0


@dataclass
class CrawlEvent:
    url: str
    status_code: int
    depth: int
    parent_url: str | None
    text: str
    is_retry: bool


@dataclass
class SerialReport:
    crawled: list[CrawlEvent] = field(default_factory=list)
    disallowed: list[tuple[str, str]] = field(default_factory=list)
    links_disallowed: list[tuple[str, str]] = field(default_factory=list)
    seen: set[str] = field(default_factory=set)
    crawled_count: int = 0
    count_by_domain: dict[str, int] = field(default_factory=dict)

    @property
    def crawl_order(self) -> list[str]:
        return [e.url for e in self.crawled]


USER_DENY_REASON = "User decision"   # see plans/wave.py USER_DENY_REASON


class SerialCrawler:
    # user decision delegates (WebCrawler.cs:108-112): python callables
    # over the stage's PageView, consulted only where the built-in
    # decision allowed (the reference's composition); the Spark engine
    # exposes the same five as Column predicates on WaveCrawler.
    user_should_crawl_page = None        # PageView -> bool (evented deny)
    user_should_schedule_link = None     # PageView -> bool (silent deny)
    user_should_download_content = None  # PageView -> bool
    user_should_crawl_page_links = None  # PageView -> bool (evented deny)
    user_should_recrawl_page = None      # PageView -> bool (silent deny)

    def __init__(self, fixture: WebFixture, cfg: CrawlConfig):
        self.pages = fixture.page_map()
        self.robots_txt = fixture.robots_map()
        self.cfg = cfg

    # -- corpus "HTTP" ------------------------------------------------------

    def _fetch(self, url: str) -> tuple[PageRec, str, bool]:
        """Return (record, response_uri, has_web_exception).

        Auto-redirect mode follows location chains (HttpWebRequest
        semantics); the returned record is the landing page and
        ``response_uri`` differs from ``url`` when a redirect happened.
        """
        rec = self.pages.get(url)
        if rec is None:
            rec = PageRec(url=url, html=b"", text="", status_code=404,
                          error="WebException")
            return rec, url, True
        response_uri = url
        if self.cfg.is_http_request_auto_redirects_enabled:
            hops = 0
            while (
                rec is not None
                and 300 <= rec.status_code <= 399
                and rec.location
                and hops < self.cfg.http_request_max_auto_redirects
            ):
                target = canonicalize(rec.location)
                if target is None:
                    break
                response_uri = target
                nxt = self.pages.get(target)
                if nxt is None:
                    rec = PageRec(url=target, html=b"", text="",
                                  status_code=404, error="WebException")
                    return rec, response_uri, True
                rec = nxt
                hops += 1
        has_exc = rec.error is not None or rec.status_code >= 400
        return rec, response_uri, has_exc

    # -- crawl --------------------------------------------------------------

    def crawl(self, root_url: str) -> SerialReport:
        cfg = self.cfg
        report = SerialReport()
        root_url = canonicalize(root_url)
        self.root_authority = authority(root_url)
        self.original_root_authority = self.root_authority

        robots: RobotsDotText | None = None
        if cfg.is_respect_robots_dot_text_enabled:
            txt = self.robots_txt.get(self.root_authority)
            if txt is not None:
                robots = RobotsDotText(root_url, txt)
        self._robots = robots
        self._latched = False

        queue: deque[QueuedPage] = deque()
        seen = report.seen
        ctx = ContextView()

        def is_internal(url: str) -> bool:
            return authority(url) in (self.root_authority,
                                      self.original_root_authority)

        def should_schedule(page: QueuedPage, *, fire_events: bool) -> bool:
            # Scheduler.Count is read live by the budget check
            ctx.scheduled_count = len(queue)
            # PoliteWebCrawler.ShouldCrawlPage robots gate first
            if self._robots is not None:
                allowed = self._robots.is_url_allowed(
                    page.url, cfg.robots_dot_text_user_agent_string)
                if cfg.is_ignore_robots_dot_text_if_root_disallowed_enabled and page.is_root:
                    probe = page.url + ("aaaaa" if page.url.endswith("/")
                                        else "/aaaaa")
                    below_ok = self._robots.is_url_allowed(
                        probe, cfg.robots_dot_text_user_agent_string)
                    if not allowed or not below_ok:
                        self._robots = None
                elif not allowed:
                    if fire_events:
                        report.disallowed.append(
                            (page.url,
                             f"Page [{page.url}] not crawled, [Disallowed by "
                             "robots.txt file], set IsRespectRobotsDotText="
                             "false in config file if you would like to "
                             "ignore robots.txt files."))
                    return False
            # WebCrawler.ShouldCrawlPage: latch is silent
            if self._latched:
                return False
            view = PageView(
                url=page.url,
                scheme=urlsplit(page.url).scheme,
                is_retry=page.is_retry,
                is_internal=page.is_internal,
                crawl_depth=page.depth,
                redirected_from=page.redirected_from,
                redirect_position=page.redirect_position,
                retry_count=page.retry_count,
                domain=authority(page.url),
            )
            decision = decide_should_crawl_page(view, ctx, cfg)
            if not decision.allow and "MaxPagesToCrawl limit of" in decision.reason:
                self._latched = True
                return False
            if not decision.allow:
                if fire_events:
                    report.disallowed.append((page.url, decision.reason))
                return False
            # user ShouldCrawlPage (WebCrawler.cs:917-925): after the
            # built-in allowed; denial fires PageCrawlDisallowed
            if (self.user_should_crawl_page is not None
                    and not self.user_should_crawl_page(view)):
                if fire_events:
                    report.disallowed.append((page.url, USER_DENY_REASON))
                return False
            return True

        def scheduler_add(page: QueuedPage) -> None:
            if cfg.is_uri_recrawling_enabled or page.is_retry:
                queue.append(page)
            elif page.url not in seen:
                seen.add(page.url)
                queue.append(page)

        # StartCrawlRootPage
        root = QueuedPage(url=root_url, parent_url=root_url, depth=0,
                          is_root=True, is_internal=True)
        if (root.is_internal or cfg.is_external_page_crawling_enabled) and \
                should_schedule(root, fire_events=True):
            scheduler_add(root)

        while queue:
            page = queue.popleft()
            # AddPageToContext
            if page.is_retry:
                page.retry_count += 1
            else:
                ctx.crawled_count += 1
                dom = authority(page.url)
                ctx.crawl_count_by_domain[dom] = \
                    ctx.crawl_count_by_domain.get(dom, 0) + 1
            ctx.scheduled_count = len(queue)

            rec, response_uri, has_exc = self._fetch(page.url)

            # ValidateRootUriForRedirection (WebCrawler.cs:1277-1291)
            if page.is_root and response_uri != page.url:
                self.root_authority = authority(response_uri)

            # manual-redirect op (auto off)
            if (not cfg.is_http_request_auto_redirects_enabled
                    and 300 <= rec.status_code <= 399):
                target = canonicalize(rec.location) if rec.location else None
                if target is not None:
                    child = QueuedPage(
                        url=target, parent_url=page.parent_url,
                        depth=page.depth, is_internal=is_internal(target),
                        redirected_from=page.url,
                        redirect_position=page.redirect_position + 1,
                    )
                    if (child.is_internal or cfg.is_external_page_crawling_enabled) and \
                            should_schedule(child, fire_events=True):
                        scheduler_add(child)

            # F3 gates content download; then actual-size gate F4
            view = PageView(
                url=page.url, is_retry=page.is_retry,
                is_internal=page.is_internal, crawl_depth=page.depth,
                domain=authority(page.url), has_response=True,
                status_code=rec.status_code,
                content_type=rec.content_type,
                content_length=len(rec.html) if rec.html else -1,
                has_web_exception=has_exc,
            )
            download = decide_should_download_page_content(view, ctx, cfg)
            allow_download = download.allow and (
                self.user_should_download_content is None
                or self.user_should_download_content(view))
            charset, text = (None, "")
            if allow_download:
                charset, text = extract_text(rec.html, rec.content_type)
            if (cfg.max_page_size_active and rec.html
                    and len(rec.html) > cfg.max_page_size_in_bytes):
                continue  # PageSizeIsAboveMax: no events, no links, no retry
            view.text = text

            links_dec = decide_should_crawl_page_links(view, ctx, cfg)
            links_reason = None if links_dec.allow else links_dec.reason
            if links_reason is None and (
                    self.user_should_crawl_page_links is not None
                    and not self.user_should_crawl_page_links(view)):
                links_reason = USER_DENY_REASON   # WebCrawler.cs:870-880
            if links_reason is None:
                base_url = response_uri  # issue 82: responded address
                links = get_links(text, base_url, cfg, rec.x_robots_tag)
                self._schedule_links(page, links, ctx, seen, queue, report,
                                     should_schedule, scheduler_add,
                                     is_internal)
            else:
                report.links_disallowed.append((page.url, links_reason))

            report.crawled.append(CrawlEvent(
                url=page.url, status_code=rec.status_code, depth=page.depth,
                parent_url=page.parent_url, text=text, is_retry=page.is_retry,
            ))

            # F5 retry
            view.retry_count = page.retry_count
            if decide_should_recrawl_page(view, ctx, cfg).allow and (
                    self.user_should_recrawl_page is None
                    or self.user_should_recrawl_page(view)):
                retry = QueuedPage(
                    url=page.url, parent_url=page.parent_url,
                    depth=page.depth, is_internal=page.is_internal,
                    is_retry=True, retry_count=page.retry_count,
                )
                scheduler_add(retry)

        report.crawled_count = ctx.crawled_count
        report.count_by_domain = dict(ctx.crawl_count_by_domain)
        return report

    def _schedule_links(self, page, links, ctx, seen, queue, report,
                        should_schedule, scheduler_add, is_internal) -> None:
        cfg = self.cfg
        links_scheduled = 0
        for link in links:
            if link not in seen:
                child = QueuedPage(
                    url=link, parent_url=page.url, depth=page.depth + 1,
                    is_internal=is_internal(link),
                )
                # F9 user delegate (:1117-1118): silent veto BEFORE the
                # decision pipeline — no events, link still marked known
                if (child.is_internal or cfg.is_external_page_crawling_enabled) and \
                        (self.user_should_schedule_link is None
                         or self.user_should_schedule_link(child)) and \
                        should_schedule(child, fire_events=True):
                    scheduler_add(child)
                    links_scheduled += 1
                if (cfg.max_links_per_page_active
                        and links_scheduled >= cfg.max_links_per_page):
                    break  # remaining links NOT marked known
            seen.add(link)  # AddKnownUri for every iterated link
            ctx.scheduled_count = len(queue)
