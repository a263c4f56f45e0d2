"""Sitemap source (S2) — ``Abot/Crawler/GoogleWebCrawler.cs`` semantics.

The reference's ``GoogleWebCrawler``:

- collects ``Sitemap:`` URLs from robots.txt (``TryParseRobotsSitemaps``,
  ``GoogleWebCrawler.cs:210-238``);
- loads each sitemap; a ``<sitemapindex>`` recurses into child sitemaps,
  a ``<urlset>`` yields item locations (``GetSitemapResults`` :159-190);
- bulk-adds every item URL to the scheduler with ``MaxCrawlDepth``
  temporarily forced to 0 (:128-135), i.e. sitemap items enter the
  frontier as depth-0 pages;
- then always falls through to the normal crawl of the root (:140).

Parsing is stdlib ``xml.etree`` (namespace-tolerant), pure-Python so it is
unit-testable and runs driver-side (sitemap counts are tiny relative to
the frontier) or inside a pandas UDF for sitemap-index fan-out at scale.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1].lower()


def parse_sitemap(xml_text: str) -> tuple[list[str], list[str]]:
    """Return ``(item_urls, child_sitemap_urls)`` from one sitemap doc.

    ``<urlset><url><loc>…`` → items; ``<sitemapindex><sitemap><loc>…`` →
    children.  Malformed XML yields ``([], [])`` (the reference logs and
    skips — GoogleWebCrawler.cs:178-188).
    """
    if not xml_text or not xml_text.strip():
        return [], []
    try:
        root = ET.fromstring(xml_text)
    except ET.ParseError:
        return [], []
    items: list[str] = []
    children: list[str] = []
    kind = _local(root.tag)
    for entry in root:
        entry_kind = _local(entry.tag)
        loc = None
        for field in entry:
            if _local(field.tag) == "loc" and field.text:
                loc = field.text.strip()
                break
        if loc is None:
            continue
        if kind == "sitemapindex" or entry_kind == "sitemap":
            children.append(loc)
        else:
            items.append(loc)
    return items, children


def resolve_sitemaps(
    sitemap_urls: list[str],
    fetch,  # Callable[[str], str | None] — returns body or None
    max_depth: int = 3,
    max_sitemaps: int = 1000,
) -> list[str]:
    """Breadth-first expansion of sitemap indexes into item URLs
    (GetSitemapResults recursion, bounded)."""
    seen: set[str] = set()
    queue = list(sitemap_urls)
    items: list[str] = []
    depth = 0
    while queue and depth <= max_depth and len(seen) < max_sitemaps:
        next_queue: list[str] = []
        for sm_url in queue:
            if sm_url in seen or len(seen) >= max_sitemaps:
                continue
            seen.add(sm_url)
            body = fetch(sm_url)
            if body is None:
                continue
            got_items, children = parse_sitemap(body)
            items.extend(got_items)
            next_queue.extend(children)
        queue = next_queue
        depth += 1
    # first-seen order, deduped — matches scheduler Add semantics
    return list(dict.fromkeys(items))
