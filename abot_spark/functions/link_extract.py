"""Hyperlink extraction — port of the HAP-backed parser semantics.

Reference:

- node selection ``//a[@href]``, ``//area[@href]``,
  ``//link[@rel='canonical'][@href]``, first ``<base>``, first
  ``<meta name=robots>`` (``Abot/Core/Parsers/HapHyperLinkParser.cs:29-33,
  92-144``).  Collection order: all <a>, then all <area>, then canonical
  <link>s (GetHrefValues :99-109).
- links inside comments / <script> / <style> are never extracted
  (HyperlinkParserTest ``GetLinks_LinksInComments/Script/StyleTag``).
- ``rel=nofollow`` anchors skipped when IsRespectAnchorRelNoFollowEnabled
  (HasRelNoFollow :155-161 — case-insensitive, trimmed, exact match).
- page-level nofollow: X-Robots-Tag header or <meta name=robots> content
  containing ``nofollow``/``none`` -> no links at all
  (``HyperLinkParser.cs:219-248``).
- href values are HTML-entity-decoded (DeEntitize :197-211).
- absolutization + <base href> override + fragment stripping + first-seen
  in-page dedup per ``HyperLinkParser.GetUris`` (:156-212) — see
  :mod:`abot_spark.urls`.

Implementation is stdlib-only (html.parser handles comment and
script/style CDATA exclusion natively) so it runs inside executor pandas
UDFs with zero extra deps.
"""

from __future__ import annotations

import re
from html import unescape
from html.parser import HTMLParser

from abot_spark.config import CrawlConfig
from abot_spark.urls import absolutize, resolve_base_href

NOFOLLOW = "nofollow"
NONE = "none"
X_ROBOTS_TAG = "x-robots-tag"


class _LinkCollector(HTMLParser):
    """Collects hrefs in document order, bucketed like the HAP XPath runs."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.a_hrefs: list[tuple[str, str | None]] = []      # (href, rel)
        self.area_hrefs: list[tuple[str, str | None]] = []
        self.canonical_hrefs: list[tuple[str, str | None]] = []
        self.base_href: str | None = None
        self.meta_robots: str | None = None

    def handle_starttag(self, tag: str, attrs: list[tuple[str, str | None]]) -> None:
        amap = {k.lower(): (v if v is not None else "") for k, v in attrs}
        if tag in ("a", "area"):
            if "href" in amap:
                target = self.a_hrefs if tag == "a" else self.area_hrefs
                target.append((amap["href"], amap.get("rel")))
        elif tag == "link":
            # XPath @rel='canonical' is an exact, case-sensitive value match
            if amap.get("rel") == "canonical" and "href" in amap:
                self.canonical_hrefs.append((amap["href"], amap.get("rel")))
        elif tag == "base":
            if self.base_href is None:  # SelectSingleNode -> first wins
                self.base_href = amap.get("href", "").strip()
        elif tag == "meta":
            if self.meta_robots is None and amap.get("name", "").lower() == "robots":
                self.meta_robots = amap.get("content", "")

    # <a href=.../> self-closing tags hit startendtag
    def handle_startendtag(self, tag: str, attrs: list[tuple[str, str | None]]) -> None:
        self.handle_starttag(tag, attrs)


def parse_html(html_text: str) -> _LinkCollector:
    collector = _LinkCollector()
    try:
        collector.feed(html_text or "")
        collector.close()
    except Exception:
        pass  # best-effort, like HAP's error-tolerant parse
    return collector


# ---------------------------------------------------------------------------
# alternative backend: single-pass regex scanner (T2 — the reference ships
# two parser backends with one contract, HAP + AngleSharp,
# ``Abot/Core/Parsers/AngleSharpHyperLinkParser.cs:87-106``).  ~4x faster
# than html.parser's per-char state machine on the link-extraction hot
# path; the full HyperlinkParserTest matrix runs against BOTH backends
# (tests/test_link_extract.py) plus a differential fuzz test.
# ---------------------------------------------------------------------------

# one scan finds, in document order: comments (skipped), script/style
# start tags (CDATA content skipped up to the matching end tag, like
# html.parser's cdata mode), and the five tags the extractor cares about.
_ATTRS = r"(?:\"[^\"]*\"|'[^']*'|[^>])*"
_SCAN_RE = re.compile(
    r"<!--.*?(?:-->|$)"
    rf"|<(?P<cd>script|style)(?=[\s/>])(?P<cdattrs>{_ATTRS})>"
    rf"|<(?P<tag>area|a|link|base|meta)(?=[\s/>])(?P<attrs>{_ATTRS})>",
    re.I | re.S)
_END_RE = {
    "script": re.compile(r"</\s*script(?![-.a-zA-Z0-9:_])[^>]*>", re.I),
    "style": re.compile(r"</\s*style(?![-.a-zA-Z0-9:_])[^>]*>", re.I),
}
_ATTR_RE = re.compile(
    r"([a-zA-Z_][-.:\w]*)\s*(?:=\s*(\"[^\"]*\"|'[^']*'|[^\s>]*))?")

# fast path for the dominant anchor shape ``<a href="...">`` — exactly one
# double-quoted href attribute, nothing else, no entities.  Anything that
# doesn't fullmatch (extra attrs, single quotes, entities, rel=...) falls
# through to the generic attr parser; parity is pinned by the
# HyperlinkParserTest matrix + the scanner-vs-html.parser differential
# fuzz test in tests/test_link_extract.py.
_HREF_ONLY_RE = re.compile(r"\s+href\s*=\s*\"([^\"&<>]*)\"\s*/?\Z", re.I)


def scan_html(html_text: str) -> _LinkCollector:
    """Same contract as :func:`parse_html`, regex-scanner backend."""
    doc = _LinkCollector()
    text = html_text or ""
    pos = 0
    while True:
        m = _SCAN_RE.search(text, pos)
        if m is None:
            break
        pos = m.end()
        cd = m.group("cd")
        if cd is not None:
            # self-closed <script/> has no CDATA content (html.parser
            # only enters cdata mode for non-self-closing start tags)
            if m.group("cdattrs").rstrip().endswith("/"):
                continue
            endm = _END_RE[cd.lower()].search(text, pos)
            pos = endm.end() if endm else len(text)
            continue
        tag = m.group("tag")
        if tag is None:
            continue  # comment
        attrs_s = m.group("attrs")
        if tag in ("a", "A", "area", "AREA"):
            fm = _HREF_ONLY_RE.fullmatch(attrs_s)
            if fm is not None:
                (doc.a_hrefs if tag in ("a", "A") else doc.area_hrefs
                 ).append((fm.group(1), None))
                continue
        attrs: list[tuple[str, str | None]] = []
        for am in _ATTR_RE.finditer(m.group("attrs")):
            val = am.group(2)
            if val is not None:
                if len(val) >= 2 and val[0] in "\"'" and val[-1] == val[0]:
                    val = val[1:-1]
                if "&" in val:
                    val = unescape(val)
            attrs.append((am.group(1), val))
        doc.handle_starttag(tag.lower(), attrs)
    return doc


def _has_nofollow_directive(value: str | None) -> bool:
    if not value:
        return False
    low = value.lower()
    return NOFOLLOW in low or NONE in low


def has_robots_nofollow(
    config: CrawlConfig,
    x_robots_tag_header: str | None,
    meta_robots: str | None,
) -> bool:
    """HyperLinkParser.HasRobotsNoFollow (:219-248)."""
    if config.is_respect_http_x_robots_tag_header_no_follow_enabled and _has_nofollow_directive(
        x_robots_tag_header
    ):
        return True
    if config.is_respect_meta_robots_no_follow_enabled and _has_nofollow_directive(meta_robots):
        return True
    return False


def _rel_is_nofollow(config: CrawlConfig, rel: str | None) -> bool:
    """HapHyperLinkParser.HasRelNoFollow (:155-161)."""
    return (
        config.is_respect_anchor_rel_no_follow_enabled
        and rel is not None
        and rel.lower().strip() == NOFOLLOW
    )


def get_href_values(
    html_text: str,
    config: CrawlConfig,
    x_robots_tag_header: str | None = None,
) -> tuple[list[str], str | None]:
    """HapHyperLinkParser.GetHrefValues (:92-110) -> (hrefs, base_href).

    Returns ``([], base)`` with no links when a page-level nofollow fires.
    Empty/whitespace hrefs are skipped (GetLinks :182).  Entity decoding is
    performed by html.parser itself (DeEntitize equivalent).
    """
    backend = parse_html if config.link_parser_backend == "parser" else scan_html
    doc = backend(html_text)
    if has_robots_nofollow(config, x_robots_tag_header, doc.meta_robots):
        return [], doc.base_href
    hrefs: list[str] = []
    for bucket in (doc.a_hrefs, doc.area_hrefs, doc.canonical_hrefs):
        for href, rel in bucket:
            if _rel_is_nofollow(config, rel):
                continue
            if href and not href.isspace():
                hrefs.append(href)
    return hrefs, doc.base_href


def get_links(
    html_text: str,
    page_url: str,
    config: CrawlConfig,
    x_robots_tag_header: str | None = None,
    clean_url_func=None,
) -> list[str]:
    """HyperLinkParser.GetLinks: hrefs -> ordered, deduped absolute URLs.

    First-seen order is preserved (GetUris :201-202 dedups by AbsoluteUri
    keeping the first occurrence); malformed URLs are dropped silently
    (:204-208).
    """
    hrefs, base_href = get_href_values(html_text, config, x_robots_tag_header)
    base_url = resolve_base_href(page_url, base_href)
    seen: dict[str, None] = {}
    for href in hrefs:
        url = absolutize(
            base_url, href,
            respect_fragment=config.is_respect_url_named_anchor_or_hashbang_enabled,
        )
        if url is None:
            continue
        if clean_url_func is not None:
            url = clean_url_func(url)
            if url is None:
                continue
        seen.setdefault(url)
    return list(seen)
