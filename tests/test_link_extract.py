"""Port of Abot.Tests.Unit/Core/HyperlinkParserTest.cs (the matrix is
commented out in the fork but contract-defining; line cites per test)."""

from __future__ import annotations

from dataclasses import replace

from abot_spark.config import CrawlConfig
from abot_spark.functions.link_extract import get_links

PAGE = "http://a.com/"
CFG = CrawlConfig()


def links(html, page=PAGE, cfg=CFG, header=None, clean=None):
    """Run the whole matrix through BOTH parser backends (T2 contract:
    two backends, one semantics — HAP vs AngleSharp in the reference)."""
    out = {}
    for backend in ("scanner", "parser"):
        c = replace(cfg, link_parser_backend=backend)
        out[backend] = get_links(
            html, page, c, x_robots_tag_header=header, clean_url_func=clean)
    assert out["scanner"] == out["parser"], \
        f"backend divergence: {out['scanner']} != {out['parser']}"
    return out["scanner"]


def test_anchor_tags():  # :36-44
    html = '<a href="http://aaa.com/" ></a><a href="/aaa/a.html" /></a>'
    assert links(html) == ["http://aaa.com/", "http://a.com/aaa/a.html"]


def test_area_tags():  # :48-56
    html = '<area href="http://bbb.com" /><area href="bbb/b.html" />'
    assert links(html) == ["http://bbb.com/", "http://a.com/bbb/b.html"]


def test_uppercase_tags():  # :60-80
    assert links('<A HREF="http://aaa.com/" ></A><A HREF="/aaa/a.html" /></A>') == [
        "http://aaa.com/", "http://a.com/aaa/a.html"]
    assert links('<AREA HREF="http://bbb.com" /><AREA HREF="bbb/b.html" />') == [
        "http://bbb.com/", "http://a.com/bbb/b.html"]


def test_no_links():  # :84-90
    assert links("<html></html>") == []


def test_non_http_schemes_kept():  # :94-105
    html = (
        '<a href="mailto:aaa@gmail.com" /><a href="tel:+123456789" />'
        '<a href="callto:+123456789" /><a href="ftp://user@yourdomainname.com/" />'
        '<a href="file:///C:/Users/" />'
    )
    assert links(html) == [
        "mailto:aaa@gmail.com",
        "tel:+123456789",
        "callto:+123456789",
        "ftp://user@yourdomainname.com/",
        "file:///C:/Users/",
    ]


def test_invalid_format_url_not_returned():  # :109-115
    assert links('<a href="http://////" />') == []


def test_links_in_comments_not_returned():  # :119-139
    html = """<html><head><!--
        <a href='http://a1.com' /><area href='http://a2.com' />
        --></head><body><!--
        <a href='http://b1.com' /><area href='http://b2.com' />
        --></body></html"""
    assert links(html) == []


def test_links_in_script_not_returned():  # :142-162
    html = """<html><head><script>
        <a href='http://a1.com' /><area href='http://a2.com' />
        </script></head><body><script>
        <a href='http://b1.com' /><area href='http://b2.com' />
        </script></body></html"""
    assert links(html) == []


def test_links_in_style_not_returned():  # :165-185
    html = """<html><head><style>
        <a href='http://a1.com' /><area href='http://a2.com' />
        </style></head><body><style>
        <a href='http://b1.com' /><area href='http://b2.com' />
        </style></body></html"""
    assert links(html) == []


def test_duplicate_links_first_seen_once():  # :188-195
    html = '<a href="/aaa/a.html" ></a><a href="/aaa/a.html" /></a>'
    assert links(html) == ["http://a.com/aaa/a.html"]


def test_named_anchors_stripped_by_default():  # :198-207
    html = (
        '<a href="/aaa/a.html" ></a><a href="/aaa/a.html#top" ></a>'
        '<a href="/aaa/a.html#bottom" /></a><a href="/aaa/a.html/#someaction/someid" /></a>'
    )
    assert links(html) == ["http://a.com/aaa/a.html", "http://a.com/aaa/a.html/"]


def test_named_anchors_kept_when_enabled():  # :210-222
    cfg = CFG.with_(is_respect_url_named_anchor_or_hashbang_enabled=True)
    html = (
        '<a href="/aaa/a.html" ></a><a href="/aaa/a.html#top" ></a>'
        '<a href="/aaa/a.html#bottom" /></a><a href="/aaa/a.html/#someaction/someid" /></a>'
    )
    assert links(html, cfg=cfg) == [
        "http://a.com/aaa/a.html",
        "http://a.com/aaa/a.html#top",
        "http://a.com/aaa/a.html#bottom",
        "http://a.com/aaa/a.html/#someaction/someid",
    ]


def test_empty_and_whitespace_html():  # :226-244
    assert links("") == []
    assert links("         ") == []


def test_valid_base_tag():  # :248-256
    html = '<base href="http://bbb.com"><a href="http://aaa.com/" ></a><a href="/aaa/a.html" /></a>'
    assert links(html) == ["http://aaa.com/", "http://bbb.com/aaa/a.html"]


def test_relative_base_tag_ignored():  # :260-268
    html = '<base href="/images"><a href="http://aaa.com/" ></a><a href="/aaa/a.html" /></a>'
    assert links(html) == ["http://aaa.com/", "http://a.com/aaa/a.html"]


def test_invalid_base_tag_ignored():  # :272-280
    html = '<base href="http:http://http:"><a href="http://aaa.com/" ></a><a href="/aaa/a.html" /></a>'
    assert links(html) == ["http://aaa.com/", "http://a.com/aaa/a.html"]


def test_protocol_relative_base_inherits_page_scheme():  # :284-304
    html = '<base href="//aaa.com"><a href="/aaa/a.html" ></a>'
    assert links(html) == ["http://aaa.com/aaa/a.html"]
    assert links(html, page="https://a.com/") == ["https://aaa.com/aaa/a.html"]


def test_html_encoded_href_decodes():  # :330-338
    html = '<a href="http://a.com/search?rls=en&amp;q=stack+overflow" ></a>'
    assert links(html) == ["http://a.com/search?rls=en&q=stack+overflow"]


def test_meta_robots_nofollow_matrix():  # :342-424
    html = '<meta name="robots" content="{}" /><a href="/aaa/a.html" ></a><a href="/bbb/b.html" /></a>'
    respect = CFG.with_(is_respect_meta_robots_no_follow_enabled=True)
    # not enabled -> links returned
    assert len(links(html.format("noindex, nofollow"))) == 2
    for content in ("noindex, nofollow", "NOINDEX, NOFOLLOW", "none", "NONE", "nofollow"):
        assert links(html.format(content), cfg=respect) == [], content
    assert len(links(html.format("noindex"), cfg=respect)) == 2


def test_meta_robots_uppercase_tag():  # :369-380
    respect = CFG.with_(is_respect_meta_robots_no_follow_enabled=True)
    html = '<META NAME="ROBOTS" CONTENT="NOINDEX, NOFOLLOW" /><a href="/aaa/a.html" ></a>'
    assert links(html, cfg=respect) == []


def test_x_robots_tag_header_matrix():  # :428-516
    respect = CFG.with_(is_respect_http_x_robots_tag_header_no_follow_enabled=True)
    html = '<a href="/aaa/a.html" ></a><a href="/bbb/b.html" /></a>'
    for header in ("noindex, nofollow", "NOINDEX, NOFOLLOW", "none", "NONE", "nofollow"):
        assert links(html, cfg=respect, header=header) == [], header
    assert len(links(html, cfg=respect, header="noindex")) == 2
    # not enabled -> header ignored
    assert len(links(html, header="nofollow")) == 2


def test_rel_nofollow():  # :519-540
    respect = CFG.with_(is_respect_anchor_rel_no_follow_enabled=True)
    html = '<a href="/aaa/a.html" rel="nofollow"></a><a href="/bbb/b.html" rel="nofollow" /></a>'
    assert links(html, cfg=respect) == []
    html_upper = '<a href="/aaa/a.html" REL="NOFOLLOW"></a><a href="/bbb/b.html" REL="NOFOLLOW" /></a>'
    assert links(html_upper, cfg=respect) == []
    # disabled -> kept
    assert len(links(html)) == 2


def test_clean_url_delegate():  # :532-541
    html = '<a href="/aaa/a.html" ></a><a href="/bbb/b.html" /></a>'
    out = links(html, clean=lambda u: u.replace("a", "x").replace("b", "y"))
    assert out == ["http://x.com/xxx/x.html", "http://x.com/yyy/y.html"]


def test_colon_in_url():  # :545-552
    url = "http://www.gamespot.com/pc/rpg/numen/index.html?om_act=convert&om_clk=tabs&tag=tabs;summary"
    assert links(f'<a href="{url}" ></a>') == [url]


def test_link_rel_canonical_after_anchors():  # :555-563
    html = (
        '<html><head><link rel="canonical" href="http://a.com/page1" /></head>'
        '<body><a href="http://a.com/page2"></a></body></html>'
    )
    assert links(html) == ["http://a.com/page2", "http://a.com/page1"]


def test_backend_differential_fuzz():
    """Scanner backend == html.parser backend on generated semi-realistic
    html (comments, script/style CDATA, self-closing, entities, quoting
    styles, nofollow, base/meta)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from abot_spark.functions.link_extract import parse_html, scan_html

    href = st.sampled_from(
        ["http://x.com/a", "/rel/p.html", "b.html", "a&amp;b.html",
         "HTTP://UP.COM/", "  ", "", "x.html#frag", "mailto:a@b.c",
         "http://x.com/?q=1&r=2"])
    quote = st.sampled_from(['"{}"', "'{}'", "{}"])
    rel = st.sampled_from(["", ' rel="nofollow"', " rel=canonical",
                           ' REL="NOFOLLOW"', " rel='author'"])
    tag = st.sampled_from(["a", "area", "link", "A", "AREA"])
    close = st.sampled_from([">", " />", "></a>", ">text</a>"])

    @st.composite
    def element(draw):
        kind = draw(st.integers(0, 6))
        if kind == 0:
            return f"<!-- <a href='{draw(href)}'> -->"
        if kind == 1:
            return f"<script>var a = \"<a href='{draw(href)}'>\";</script>"
        if kind == 2:
            return f"<style>a {{ background: url({draw(href)}) }}</style>"
        if kind == 3:
            return f"<base href={draw(quote).format(draw(href))}>"
        if kind == 4:
            return ("<meta name=robots content="
                    f"{draw(quote).format(draw(st.sampled_from(['index', 'nofollow', 'none', 'INDEX,FOLLOW'])))}>")
        h = draw(quote).format(draw(href))
        return f"<{draw(tag)} href={h}{draw(rel)}{draw(close)}"

    @settings(max_examples=300, deadline=None)
    @given(st.lists(element(), max_size=8), st.booleans(), st.booleans())
    def check(parts, respect_nofollow, respect_meta):
        html = "<html><body>" + "".join(parts) + "</body></html>"
        cfg = CFG.with_(
            is_respect_anchor_rel_no_follow_enabled=respect_nofollow,
            is_respect_meta_robots_no_follow_enabled=respect_meta)
        a = get_links(html, PAGE, replace(cfg, link_parser_backend="scanner"))
        b = get_links(html, PAGE, replace(cfg, link_parser_backend="parser"))
        assert a == b, html

    check()
