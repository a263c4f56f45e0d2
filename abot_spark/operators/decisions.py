"""The crawl decision pipeline (F1-F5) — ``Abot/Core/Decisions/
CrawlDecisionMaker.cs`` re-expressed twice:

1. pure-Python (``decide_*``) — row-semantics parity oracle, unit-tested
   against the CrawlDecisionMakerTest matrix (reason strings are
   byte-identical to the fork's live code).
2. Spark Column builders (``reason_*``) — the same predicate chains as a
   single ``when/otherwise`` expression over a wave's candidate rows, fed by
   deterministic window columns for the global/per-domain budgets (the
   serial ``CrawledCount + Scheduler.Count + 1`` check at
   CrawlDecisionMaker.cs:58-68 becomes an admission cutoff computed by
   ``row_number`` in plans/wave.py; the bool lands here as
   ``budget_exceeded`` / ``domain_cap_exceeded``).

First failing reason wins; allowed rows get reason NULL (Spark) / ""
(pure, matching ``CrawlDecision.Reason``'s default).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F

from abot_spark.config import CrawlConfig, is_pay_attention

# .NET HttpStatusCode enum names as interpolated by the fork's
# $"Status code {StatusCode}" (CrawlDecisionMaker.cs:134).
DOTNET_STATUS_NAMES = {
    100: "Continue", 101: "SwitchingProtocols", 200: "OK", 201: "Created",
    202: "Accepted", 203: "NonAuthoritativeInformation", 204: "NoContent",
    205: "ResetContent", 206: "PartialContent", 300: "MultipleChoices",
    301: "MovedPermanently", 302: "Found", 303: "SeeOther", 304: "NotModified",
    305: "UseProxy", 307: "TemporaryRedirect", 308: "PermanentRedirect",
    400: "BadRequest", 401: "Unauthorized", 402: "PaymentRequired",
    403: "Forbidden", 404: "NotFound", 405: "MethodNotAllowed",
    406: "NotAcceptable", 407: "ProxyAuthenticationRequired",
    408: "RequestTimeout", 409: "Conflict", 410: "Gone",
    429: "TooManyRequests", 500: "InternalServerError", 501: "NotImplemented",
    502: "BadGateway", 503: "ServiceUnavailable", 504: "GatewayTimeout",
}


def dotnet_status_name(code: int) -> str:
    return DOTNET_STATUS_NAMES.get(code, str(code))


@dataclass
class CrawlDecision:
    """``Abot/Poco/CrawlDecision.cs:29-46``."""

    allow: bool = False
    reason: str = ""
    should_stop_crawl: bool = False
    should_hard_stop_crawl: bool = False


def _clean_content_types(downloadable_content_types: str) -> list[str]:
    """IsDownloadableByContentType (:189-201): comma-split, trimmed,
    empties dropped."""
    return [t.strip() for t in downloadable_content_types.split(",") if t.strip()]


# ---------------------------------------------------------------------------
# pure-Python parity layer (oracle for tests; also used by serial_oracle.py)
# ---------------------------------------------------------------------------

@dataclass
class PageView:
    """The fields of PageToCrawl/CrawledPage consumed by decisions."""

    url: str = ""
    scheme: str = "http"
    is_retry: bool = False
    is_internal: bool = True
    crawl_depth: int = 0
    redirected_from: str | None = None
    redirect_position: int = 0
    retry_count: int = 0
    domain: str = ""
    # CrawledPage extras
    has_response: bool = True
    status_code: int = 200
    content_type: str = "text/html"
    content_length: int = -1     # header-reported
    text: str = ""
    has_web_exception: bool = False


@dataclass
class ContextView:
    """CrawlContext counters consumed by decisions."""

    crawled_count: int = 0
    scheduled_count: int = 0
    crawl_count_by_domain: dict[str, int] = field(default_factory=dict)


def decide_should_crawl_page(
    page: PageView | None, ctx: ContextView | None, cfg: CrawlConfig
) -> CrawlDecision:
    """ShouldCrawlPage (CrawlDecisionMaker.cs:33-87)."""
    if page is None:
        return CrawlDecision(False, "Null page to crawl")
    if ctx is None:
        return CrawlDecision(False, "Null crawl context")
    if (
        page.redirected_from is not None
        and page.redirect_position > cfg.http_request_max_auto_redirects
    ):
        return CrawlDecision(
            False,
            f"HttpRequestMaxAutoRedirects limit of "
            f"[{cfg.http_request_max_auto_redirects}] has been reached",
        )
    if page.crawl_depth > cfg.max_crawl_depth:
        return CrawlDecision(False, "Crawl depth is above max")
    if not page.scheme.startswith("http"):
        return CrawlDecision(False, "Scheme does not begin with http")
    if (
        not page.is_retry
        and cfg.max_pages_active
        and ctx.crawled_count + ctx.scheduled_count + 1 > cfg.max_pages_to_crawl
    ):
        return CrawlDecision(
            False,
            f"MaxPagesToCrawl limit of [{cfg.max_pages_to_crawl}] has been reached",
        )
    domain_count = ctx.crawl_count_by_domain.get(page.domain, 0)
    if (
        not page.is_retry
        and cfg.max_pages_per_domain_active
        and is_pay_attention(domain_count)
        and domain_count >= cfg.max_pages_to_crawl_per_domain
    ):
        return CrawlDecision(
            False,
            f"MaxPagesToCrawlPerDomain limit of [{cfg.max_pages_to_crawl_per_domain}] "
            f"has been reached for domain [{page.domain}]",
        )
    if not page.is_internal and not cfg.is_external_page_crawling_enabled:
        return CrawlDecision(False, "Link is external")
    return CrawlDecision(True)


def decide_should_crawl_page_links(
    page: PageView | None, ctx: ContextView | None, cfg: CrawlConfig
) -> CrawlDecision:
    """ShouldCrawlPageLinks (CrawlDecisionMaker.cs:95-114). Note the
    depth check is ``>=`` here vs ``>`` in ShouldCrawlPage."""
    if page is None:
        return CrawlDecision(False, "Null crawled page")
    if ctx is None:
        return CrawlDecision(False, "Null crawl context")
    if page.text is None or page.text.strip() == "":
        return CrawlDecision(False, "Page has no content")
    if not cfg.is_external_page_links_crawling_enabled and not page.is_internal:
        return CrawlDecision(False, "Link is external")
    if page.crawl_depth >= cfg.max_crawl_depth:
        return CrawlDecision(False, "Crawl depth is above max")
    return CrawlDecision(True)


def decide_should_download_page_content(
    page: PageView | None, ctx: ContextView | None, cfg: CrawlConfig
) -> CrawlDecision:
    """ShouldDownloadPageContent (CrawlDecisionMaker.cs:122-150)."""
    if page is None:
        return CrawlDecision(False, "Null crawled page")
    if ctx is None:
        return CrawlDecision(False, "Null crawl context")
    if not page.has_response:
        return CrawlDecision(False, "Null HttpWebResponse")
    if page.status_code != 200:
        return CrawlDecision(False, f"Status code {dotnet_status_name(page.status_code)}")
    clean = _clean_content_types(cfg.downloadable_content_types)
    page_ct = page.content_type.lower().strip()
    if not any(ct.lower().strip() in page_ct for ct in clean):
        return CrawlDecision(
            False, "Content type is not any of the following: " + ",".join(clean)
        )
    if cfg.max_page_size_active and page.content_length > cfg.max_page_size_in_bytes:
        return CrawlDecision(
            False,
            f"Page size of [{page.content_length}] bytes is above the max allowable of "
            f"[{cfg.max_page_size_in_bytes}] bytes",
        )
    return CrawlDecision(True)


def decide_should_recrawl_page(
    page: PageView | None, ctx: ContextView | None, cfg: CrawlConfig
) -> CrawlDecision:
    """ShouldRecrawlPage per the reference *test contract*
    (CrawlDecisionMakerTest.cs:756-848): deny when MaxRetryCount < 1.

    NOTE: the fork's live code at CrawlDecisionMaker.cs:169-170 has the
    condition inverted (``IsPayAttention(MaxRetryCount)`` -> deny), which
    makes retries unreachable and contradicts its own test matrix and
    WebCrawler's retry wiring (WebCrawler.cs:951-994, 729-733); we
    implement the intent the tests pin.
    """
    if page is None:
        return CrawlDecision(False, "Null crawled page")
    if ctx is None:
        return CrawlDecision(False, "Null crawl context")
    if not page.has_web_exception:
        return CrawlDecision(False, "WebException did not occur")
    if not is_pay_attention(cfg.max_retry_count):
        return CrawlDecision(False, "MaxRetryCount is less than 1")
    if page.retry_count >= cfg.max_retry_count:
        return CrawlDecision(False, "MaxRetryCount has been reached")
    return CrawlDecision(True)


# ---------------------------------------------------------------------------
# Spark Column builders — same chains, vectorized (whole-stage codegen'able)
# ---------------------------------------------------------------------------

def scheme_col(url: Any = "url") -> Column:
    url = F.col(url) if isinstance(url, str) else url
    return F.lower(F.substring_index(url, "://", 1))


def reason_should_crawl_page(
    cfg: CrawlConfig,
    *,
    redirected_from: Column | None = None,
    redirect_position: Column | None = None,
    depth: Column | None = None,
    scheme: Column | None = None,
    is_retry: Column | None = None,
    is_internal: Column | None = None,
    budget_exceeded: Column | None = None,
    domain_cap_exceeded: Column | None = None,
    domain: Column | None = None,
) -> Column:
    """ShouldCrawlPage as one Column: first failing reason, else NULL.

    ``budget_exceeded``/``domain_cap_exceeded`` are the deterministic
    window cutoffs computed in plans/wave.py (serial-counter parity).
    """
    redirected_from = redirected_from if redirected_from is not None else F.col("redirected_from")
    redirect_position = redirect_position if redirect_position is not None else F.col("redirect_position")
    depth = depth if depth is not None else F.col("depth")
    scheme = scheme if scheme is not None else scheme_col()
    is_retry = is_retry if is_retry is not None else F.col("is_retry")
    is_internal = is_internal if is_internal is not None else F.col("is_internal")
    domain = domain if domain is not None else F.col("domain")
    not_retry = ~F.coalesce(is_retry, F.lit(False))

    chain = F.when(
        redirected_from.isNotNull()
        & (redirect_position > F.lit(cfg.http_request_max_auto_redirects)),
        F.lit(
            f"HttpRequestMaxAutoRedirects limit of "
            f"[{cfg.http_request_max_auto_redirects}] has been reached"
        ),
    ).when(
        depth > F.lit(cfg.max_crawl_depth), F.lit("Crawl depth is above max")
    ).when(
        ~scheme.startswith("http"), F.lit("Scheme does not begin with http")
    )
    if cfg.max_pages_active and budget_exceeded is not None:
        chain = chain.when(
            not_retry & budget_exceeded,
            F.lit(f"MaxPagesToCrawl limit of [{cfg.max_pages_to_crawl}] has been reached"),
        )
    if cfg.max_pages_per_domain_active and domain_cap_exceeded is not None:
        chain = chain.when(
            not_retry & domain_cap_exceeded,
            F.concat(
                F.lit(
                    f"MaxPagesToCrawlPerDomain limit of "
                    f"[{cfg.max_pages_to_crawl_per_domain}] has been reached for domain ["
                ),
                domain,
                F.lit("]"),
            ),
        )
    if not cfg.is_external_page_crawling_enabled:
        chain = chain.when(~is_internal, F.lit("Link is external"))
    return chain.otherwise(F.lit(None).cast("string"))


def reason_should_crawl_page_links(
    cfg: CrawlConfig,
    *,
    text: Column | None = None,
    is_internal: Column | None = None,
    depth: Column | None = None,
) -> Column:
    """ShouldCrawlPageLinks as one Column (note ``>=`` depth check)."""
    text = text if text is not None else F.col("text")
    is_internal = is_internal if is_internal is not None else F.col("is_internal")
    depth = depth if depth is not None else F.col("depth")
    chain = F.when(
        text.isNull() | (F.trim(text) == ""), F.lit("Page has no content")
    )
    if not cfg.is_external_page_links_crawling_enabled:
        chain = chain.when(~is_internal, F.lit("Link is external"))
    return chain.when(
        depth >= F.lit(cfg.max_crawl_depth), F.lit("Crawl depth is above max")
    ).otherwise(F.lit(None).cast("string"))


def reason_should_download_page_content(
    cfg: CrawlConfig,
    *,
    has_response: Column | None = None,
    status_code: Column | None = None,
    content_type: Column | None = None,
    content_length: Column | None = None,
) -> Column:
    """ShouldDownloadPageContent as one Column.

    The content-type containment test is
    ``exists(split(conf, ','), t -> contains(page_ct, trim(t)))`` — all
    JVM-side builtins, no UDF."""
    has_response = has_response if has_response is not None else F.col("status_code").isNotNull()
    status_code = status_code if status_code is not None else F.col("status_code")
    content_type = content_type if content_type is not None else F.col("content_type")
    content_length = content_length if content_length is not None else F.col("content_length")

    clean = _clean_content_types(cfg.downloadable_content_types)
    page_ct = F.lower(F.trim(F.coalesce(content_type, F.lit(""))))
    ct_ok = F.lit(False)
    for token in clean:
        ct_ok = ct_ok | page_ct.contains(token.lower().strip())

    status_name = F.lit(None).cast("string")
    mapping = F.create_map(
        *[F.lit(x) for kv in DOTNET_STATUS_NAMES.items() for x in kv]
    )
    status_name = F.coalesce(
        mapping.getItem(status_code), status_code.cast("string")
    )

    chain = F.when(~has_response, F.lit("Null HttpWebResponse")).when(
        status_code != 200, F.concat(F.lit("Status code "), status_name)
    ).when(
        ~ct_ok,
        F.lit("Content type is not any of the following: " + ",".join(clean)),
    )
    if cfg.max_page_size_active:
        chain = chain.when(
            content_length > F.lit(cfg.max_page_size_in_bytes),
            F.concat(
                F.lit("Page size of ["),
                content_length.cast("string"),
                F.lit(
                    f"] bytes is above the max allowable of "
                    f"[{cfg.max_page_size_in_bytes}] bytes"
                ),
            ),
        )
    return chain.otherwise(F.lit(None).cast("string"))


def reason_should_recrawl_page(
    cfg: CrawlConfig,
    *,
    has_web_exception: Column | None = None,
    retry_count: Column | None = None,
) -> Column:
    """ShouldRecrawlPage (test-contract semantics, see decide_ docstring)."""
    has_web_exception = (
        has_web_exception if has_web_exception is not None else F.col("error").isNotNull()
    )
    retry_count = retry_count if retry_count is not None else F.col("retry_count")
    chain = F.when(~has_web_exception, F.lit("WebException did not occur"))
    if not is_pay_attention(cfg.max_retry_count):
        chain = chain.when(F.lit(True), F.lit("MaxRetryCount is less than 1"))
    else:
        chain = chain.when(
            retry_count >= F.lit(cfg.max_retry_count),
            F.lit("MaxRetryCount has been reached"),
        )
    return chain.otherwise(F.lit(None).cast("string"))
