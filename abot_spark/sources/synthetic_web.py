"""Deterministic synthetic web — the simulated corpus the crawler runs on.

Stand-in for (a) the reference's ``Abot.SiteSimulator`` deterministic page
generator (``Abot.SiteSimulator/Controllers/PageGeneratorController.cs:35-84``)
and (b) a Common-Crawl-style pages table per BASELINE ``input_hint``:
``(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)``
plus fetch-simulation sidecars
``(status_code:int, content_type:string, location:string,
retry_after:string, x_robots_tag:string, error:string)``.

Everything is a pure function of ``(seed, n_domains, sections, leaves)`` —
no wall clock, no randomness outside ``random.Random(seed)`` — so tests,
the DuckDB oracle, and the bench all see the same bytes.

Fixture pages per domain mirror the reference's test matrices:

- ``/redir/{n}`` 301 chains (T6), ``/gone`` 404, ``/err`` 503+Retry-After
  (F5), ``/img`` non-html content type (F3), ``/nofollow-meta`` and
  ``/nofollow-links`` (F7), ``/base`` base-tag override (T3),
  ``/charset/sjis`` and ``/charset/cp1251`` non-utf8 bodies
  (WebContentExtractorTest matrix), ``/trap`` links only inside
  comments/script/style (HyperlinkParserTest), ``/private/...`` robots-
  disallowed section (F6).

Domain sizes follow a Zipf-ish tail when ``zipf=True`` so the fetch-stage
host-skew handling (salted repartition) has something to chew on.
"""

from __future__ import annotations

import datetime as dt
import random
from dataclasses import dataclass, field

EPOCH = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)


@dataclass
class PageRec:
    url: str
    html: bytes
    text: str
    lang: str = "en"
    status_code: int = 200
    content_type: str = "text/html; charset=utf-8"
    location: str | None = None
    retry_after: str | None = None
    x_robots_tag: str | None = None
    error: str | None = None
    warc_ts: dt.datetime = EPOCH


@dataclass
class WebFixture:
    pages: list[PageRec] = field(default_factory=list)
    robots: list[tuple[str, str]] = field(default_factory=list)  # (domain, txt)
    seeds: list[str] = field(default_factory=list)

    def page_map(self) -> dict[str, PageRec]:
        return {p.url: p for p in self.pages}

    def robots_map(self) -> dict[str, str]:
        return dict(self.robots)


def _page(url: str, body_links: list[str], title: str, *, extra: str = "",
          lang: str = "en", ts_off: int = 0, filler_kb: int = 0,
          filler_anchors: int = 0) -> PageRec:
    anchors = "\n".join(f'<a href="{href}">link</a>' for href in body_links)
    if filler_anchors:
        # CPU-heavy realistic pages: many distinct anchors (parse +
        # absolutize + canonicalize work per link, like real link farms)
        anchors += "\n" + "\n".join(
            f'<a href="/f/{ts_off % 97}/{i}?ref={ts_off}">f{i}</a>'
            for i in range(filler_anchors))
    filler = ""
    if filler_kb:
        para = (f"<p>deterministic filler for {title} — the quick crawl "
                "indexes pages across domains with politeness budgets and "
                "charset-aware extraction. </p>\n")
        filler = para * max(1, (filler_kb * 1024) // len(para))
    html_text = (
        f"<html><head><title>{title}</title></head>\n"
        f"<body><h1>{title}</h1>\n{anchors}\n{filler}{extra}</body></html>"
    )
    data = html_text.encode("utf-8")
    return PageRec(
        url=url, html=data, text=data.decode("utf-8"), lang=lang,
        warc_ts=EPOCH + dt.timedelta(seconds=ts_off),
    )


def generate_web(
    n_domains: int = 4,
    sections: int = 3,
    leaves: int = 4,
    seed: int = 42,
    zipf: bool = False,
    with_fixtures: bool = True,
    filler_kb: int = 0,
    filler_anchors: int = 0,
) -> WebFixture:
    """Build the deterministic site graph.

    Every domain: ``/`` -> ``/s/{j}`` -> ``/s/{j}/p/{k}`` tree, one
    cross-domain link per homepage, plus (domain 0, or all when
    ``with_fixtures``) the fixture pages listed in the module docstring.
    """
    rng = random.Random(seed)
    fx = WebFixture()
    roots = [f"http://d{i}.example.com" for i in range(n_domains)]
    ts = 0

    for i, root in enumerate(roots):
        dom_sections = sections
        dom_leaves = leaves
        if zipf:
            # head domains get the bulk of the pages: size ~ 1/(i+1)
            dom_leaves = max(1, int(leaves * n_domains / (i + 1) / 2))

        home_links = [f"/s/{j}" for j in range(dom_sections)]
        home_links.append(roots[(i + 1) % n_domains] + "/")  # external
        if with_fixtures:
            home_links += [
                "/redir/2", "/gone", "/err", "/img", "/nofollow-meta",
                "/nofollow-links", "/base", "/charset/sjis",
                "/charset/cp1251", "/trap", "/private/secret",
                "/dup", "/dup#frag", "http://////",  # dup + malformed
            ]
        ts += 1
        fx.pages.append(_page(root + "/", home_links, f"home d{i}", ts_off=ts,
                              filler_kb=filler_kb, filler_anchors=filler_anchors))

        for j in range(dom_sections):
            sec_url = f"{root}/s/{j}"
            sec_links = [f"/s/{j}/p/{k}" for k in range(dom_leaves)]
            sec_links.append("/")  # back link (already-seen fixture)
            if j > 0:
                sec_links.append(f"/s/{j - 1}")  # cross-section dup discovery
            ts += 1
            fx.pages.append(_page(sec_url, sec_links, f"sec d{i}/{j}", ts_off=ts,
                                  filler_kb=filler_kb, filler_anchors=filler_anchors))
            for k in range(dom_leaves):
                leaf_url = f"{sec_url}/p/{k}"
                leaf_links = []
                if rng.random() < 0.3:
                    leaf_links.append(f"/s/{rng.randrange(dom_sections)}")
                ts += 1
                fx.pages.append(
                    _page(leaf_url, leaf_links, f"leaf d{i}/{j}/{k}", ts_off=ts,
                          filler_kb=filler_kb, filler_anchors=filler_anchors)
                )

        if with_fixtures:
            fx.pages.extend(_fixture_pages(root, ts))
            fx.pages.extend(_sitemap_pages(root))
            ts += 20
        fx.robots.append(
            (
                f"d{i}.example.com",
                "User-agent: *\nDisallow: /private/\n"
                + ("Crawl-delay: 2\n" if i % 2 == 1 else "")
                + (f"Sitemap: {root}/sitemap.xml\n" if with_fixtures else ""),
            )
        )

    fx.seeds = [r + "/" for r in roots]
    return fx


def _fixture_pages(root: str, ts: int) -> list[PageRec]:
    """The per-domain parity fixtures (reference test matrices)."""
    out: list[PageRec] = []

    # redirect chain /redir/2 -> /redir/1 -> /redir/0 -> /s/0 (T6)
    for n in range(3):
        target = f"{root}/redir/{n - 1}" if n > 0 else f"{root}/s/0"
        out.append(
            PageRec(
                url=f"{root}/redir/{n}", html=b"", text="", status_code=301,
                location=target, content_type="text/html",
                warc_ts=EPOCH + dt.timedelta(seconds=ts + n),
            )
        )

    out.append(PageRec(url=f"{root}/gone", html=b"not found", text="not found",
                       status_code=404, error="WebException"))
    out.append(PageRec(url=f"{root}/err", html=b"", text="", status_code=503,
                       retry_after="2", error="WebException"))
    png = b"\x89PNG\r\n\x1a\n" + b"\x00" * 16
    out.append(PageRec(url=f"{root}/img", html=png,
                       text=png.decode("utf-8", errors="replace"),
                       content_type="image/png"))

    nf_meta = (
        '<html><head><meta name="robots" content="nofollow" /></head>'
        f'<body><a href="/hidden-by-meta">x</a></body></html>'
    ).encode()
    out.append(PageRec(url=f"{root}/nofollow-meta", html=nf_meta,
                       text=nf_meta.decode()))
    out.append(PageRec(url=f"{root}/hidden-by-meta",
                       html=b"<html><body>leaf</body></html>",
                       text="<html><body>leaf</body></html>"))

    nf_links = (
        '<html><body><a href="/hidden-by-rel" rel="nofollow">x</a>'
        f'<a href="/s/1">ok</a></body></html>'
    ).encode()
    out.append(PageRec(url=f"{root}/nofollow-links", html=nf_links,
                       text=nf_links.decode()))
    out.append(PageRec(url=f"{root}/hidden-by-rel",
                       html=b"<html><body>leaf</body></html>",
                       text="<html><body>leaf</body></html>"))

    base = (
        f'<html><head><base href="{root}/s/1/" /></head>'
        '<body><a href="p/0">base-relative</a></body></html>'
    ).encode()
    out.append(PageRec(url=f"{root}/base", html=base, text=base.decode()))

    # charset fixtures (WebContentExtractorTest.cs:27-122 styles)
    sjis_text = (
        '<html><head><meta http-equiv="Content-Type" '
        'content="text/html; charset=Shift_JIS"></head>'
        "<body>日本語のテキスト</body></html>"
    )
    out.append(
        PageRec(url=f"{root}/charset/sjis", html=sjis_text.encode("shift_jis"),
                text=sjis_text, lang="ja", content_type="text/html")
    )
    cp1251_text = (
        "<html><head><meta charset='cp1251'></head>"
        "<body>Русский текст</body></html>"
    )
    out.append(
        PageRec(url=f"{root}/charset/cp1251",
                html=cp1251_text.encode("windows-1251"),
                text=cp1251_text, lang="ru", content_type="text/html")
    )

    trap = (
        "<html><body><!-- <a href='/from-comment'>x</a> -->"
        "<script>var a='<a href=\"/from-script\">x</a>';</script>"
        "<style>/* <a href='/from-style'>x</a> */</style>"
        "real text</body></html>"
    ).encode()
    out.append(PageRec(url=f"{root}/trap", html=trap, text=trap.decode()))

    priv = b"<html><body>private</body></html>"
    out.append(PageRec(url=f"{root}/private/secret", html=priv,
                       text=priv.decode()))

    dup = b'<html><body><a href="/s/0">s0</a></body></html>'
    out.append(PageRec(url=f"{root}/dup", html=dup, text=dup.decode()))
    return out


# ---------------------------------------------------------------------------
# parquet writers (pyarrow; no Spark session needed to generate)
# ---------------------------------------------------------------------------

def write_parquet(fx: WebFixture, out_dir: str) -> dict[str, str]:
    """Write pages/robots/seeds parquet under ``out_dir``; returns paths."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    paths = {}

    pages = pa.table(
        {
            "url": [p.url for p in fx.pages],
            "warc_ts": pa.array(
                [p.warc_ts for p in fx.pages], type=pa.timestamp("us", tz="UTC")
            ),
            "html": pa.array([p.html for p in fx.pages], type=pa.binary()),
            "text": [p.text for p in fx.pages],
            "lang": [p.lang for p in fx.pages],
            "status_code": pa.array([p.status_code for p in fx.pages], pa.int32()),
            "content_type": [p.content_type for p in fx.pages],
            "location": [p.location for p in fx.pages],
            "retry_after": [p.retry_after for p in fx.pages],
            "x_robots_tag": [p.x_robots_tag for p in fx.pages],
            "error": [p.error for p in fx.pages],
        }
    )
    paths["pages"] = os.path.join(out_dir, "pages.parquet")
    pq.write_table(pages, paths["pages"])

    robots = pa.table(
        {
            "domain": [d for d, _ in fx.robots],
            "robots_txt": [t for _, t in fx.robots],
        }
    )
    paths["robots"] = os.path.join(out_dir, "robots.parquet")
    pq.write_table(robots, paths["robots"])

    seeds = pa.table(
        {"url": fx.seeds, "seed_id": pa.array(range(len(fx.seeds)), pa.int32())}
    )
    paths["seeds"] = os.path.join(out_dir, "seeds.parquet")
    pq.write_table(seeds, paths["seeds"])
    return paths


def _sitemap_pages(root: str) -> list[PageRec]:
    """Sitemap fixtures (S2): an index pointing at a urlset that lists one
    linked page and one orphan reachable only via the sitemap."""
    index = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        '<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        f"<sitemap><loc>{root}/sitemap-a.xml</loc></sitemap>"
        "</sitemapindex>"
    )
    urlset = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        f"<url><loc>{root}/s/0</loc></url>"
        f"<url><loc>{root}/orphan</loc></url>"
        "</urlset>"
    )
    orphan = b"<html><body>orphan reachable only via sitemap</body></html>"
    return [
        PageRec(url=f"{root}/sitemap.xml", html=index.encode(),
                text=index, content_type="application/xml"),
        PageRec(url=f"{root}/sitemap-a.xml", html=urlset.encode(),
                text=urlset, content_type="application/xml"),
        PageRec(url=f"{root}/orphan", html=orphan, text=orphan.decode()),
    ]
