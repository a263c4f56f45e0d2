"""Port of Abot.Tests.Unit/Core/RobotsDotTextTest.cs (:17-278)."""

from __future__ import annotations

import pytest

from abot_spark.functions.robots import RobotsDotText, parse_robots_rules, path_allowed

ROOT = "http://www.spidertestsite1.com/"
UA = "Some User Agent..."
CONTENT = """
User-Agent: *
Disallow: /disallowedfile.txt
Disallow: /disallowedfolder
Disallow: /disallowedfolder/subfolder
Crawl-Delay: 20

User-Agent: badagent
Disallow: /

User-Agent: userAgentCrawlDelayIs1
Crawl-Delay: 1

User-Agent: userAgentCrawlDelayNotSpecified
Allow: /

User-Agent: userAgentCrawlDelayEmpty
Crawl-Delay:

Sitemap: http://a.com/sitemap.xml
Sitemap: http://b.com/sitemap.xml
"""


@pytest.fixture
def robots():
    return RobotsDotText(ROOT, CONTENT)


def test_constructor_null_args():
    with pytest.raises(ValueError):
        RobotsDotText(None, CONTENT)
    with pytest.raises(ValueError):
        RobotsDotText(ROOT, None)


def test_allowed_pages(robots):  # :66-91
    for path in ("", "allowedfolder/aa.html", "allowedfolder/bb.html", "allowedfile2"):
        assert robots.is_url_allowed(ROOT + path, UA)
    # "*" group is NOT inherited by named groups
    for path in ("", "disallowedfile.txt", "disallowedfolder", "disallowedfolder/",
                 "disallowedfolder/subfolder", "disallowedfolder/subfolder/"):
        assert robots.is_url_allowed(ROOT + path, "userAgentCrawlDelayIs1")


def test_disallowed_pages(robots):  # :94-113
    for path in ("disallowedfile.txt", "disallowedfolder", "disallowedfolder/",
                 "disallowedfolder/subfolder", "disallowedfolder/subfolder/"):
        assert not robots.is_url_allowed(ROOT + path, UA)
    for path in ("", "allowedfolder/aa.html", "allowedfolder/bb.html", "allowedfile2"):
        assert not robots.is_url_allowed(ROOT + path, "badagent")


def test_empty_robots_content_allows_all():  # :116-136
    robots = RobotsDotText(ROOT, "")
    for path in ("", "allowedfolder/aa.html", "allowedfile2"):
        assert robots.is_url_allowed(ROOT + path, UA)
    for path in ("", "disallowedfile.txt", "disallowedfolder/subfolder"):
        assert robots.is_url_allowed(ROOT + path, "userAgentCrawlDelayIs1")


def test_external_pages_always_allowed(robots):  # :140-168
    ext = "http://yahoo.com/"
    for path in ("", "allowedfolder/aa.html", "disallowedfile.txt",
                 "disallowedfolder", "disallowedfolder/subfolder/"):
        assert robots.is_url_allowed(ext + path, UA)
        assert robots.is_url_allowed(ext + path, "userAgentCrawlDelayIs1")


def test_is_user_agent_allowed(robots):  # :176-216
    assert robots.is_user_agent_allowed(None)
    assert robots.is_user_agent_allowed("")
    assert not robots.is_user_agent_allowed("badagent")
    allow_all = RobotsDotText(ROOT, "\nUser-Agent: *\nAllow: /")
    assert allow_all.is_user_agent_allowed("*")
    deny_all = RobotsDotText(ROOT, "\nUser-Agent: *\nDisallow: /")
    assert not deny_all.is_user_agent_allowed("aaaaaaaaaaaa")


def test_empty_and_whitespace_disallow_allows_all():  # :219-227, :262-270
    for trailer in ("Disallow:", "Disallow: "):
        robots = RobotsDotText(ROOT, "User-agent: *\n" + trailer)
        assert robots.is_url_allowed(ROOT, UA)
        assert robots.is_url_allowed(ROOT + "aa.html", UA)


def test_querystring_rules_dont_match():  # :230-240, :255-259
    robots = RobotsDotText(
        ROOT,
        "User-Agent: *\nDisallow: /?category=whatever\nDisallow: /?category=another&color=red",
    )
    assert robots.is_url_allowed(ROOT, UA)
    # querystring matching not supported (IsUrlAllowed_QuerystringMatch_NotSupported)
    assert robots.is_url_allowed(ROOT + "?category=whatever", UA)
    assert robots.is_url_allowed(ROOT + "?category=another&blah=blah", UA)


def test_crawl_delay():  # :272-284
    robots = RobotsDotText(ROOT, CONTENT)
    assert robots.get_crawl_delay(UA) == 20
    assert robots.get_crawl_delay("userAgentCrawlDelayIs1") == 1
    assert robots.get_crawl_delay("badagent") == 0
    assert robots.get_crawl_delay("userAgentCrawlDelayNotSpecified") == 0
    assert robots.get_crawl_delay("userAgentCrawlDelayEmpty") == 0


def test_sitemaps_collected(robots):
    assert robots.sitemaps == ["http://a.com/sitemap.xml", "http://b.com/sitemap.xml"]


def test_wildcard_disallow_star():
    # the PoliteWebCrawler issue-96 probe: root allowed, /* disallowed
    robots = RobotsDotText(ROOT, "User-agent: *\nAllow: /$\nDisallow: /*")
    assert robots.is_url_allowed(ROOT, UA)
    assert not robots.is_url_allowed(ROOT + "aaaaa", UA)


def test_flattened_rules_roundtrip():
    rules = parse_robots_rules(ROOT, CONTENT, "abot")
    assert rules["has_robots"]
    assert rules["crawl_delay_s"] == 20
    assert not path_allowed("/disallowedfolder/x", rules["allow_rules"], rules["disallow_rules"])
    assert path_allowed("/fine", rules["allow_rules"], rules["disallow_rules"])
    missing = parse_robots_rules(ROOT, None, "abot")
    assert not missing["has_robots"]


def test_matcher_differential_fuzz():
    """The serial oracle's verdict path (RobotsDotText.is_url_allowed on a
    full URL) and the wave plan's (parse_robots_rules -> path_allowed on a
    pre-split path) are independent pipelines to the same F6 verdict —
    they must agree on arbitrary robots.txt content, UA, and path."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    seg = st.sampled_from(["a", "b", "ab", "a*", "*b", "a$", ""])
    rule_path = st.builds(
        lambda parts, anchor: "/" + "/".join(parts) + anchor,
        st.lists(seg, max_size=3),
        st.sampled_from(["", "$"]))
    line = st.one_of(
        st.builds(lambda v: f"User-agent: {v}",
                  st.sampled_from(["*", "abot", "badagent", "Goo"])),
        st.builds(lambda p: f"Disallow: {p}", rule_path),
        st.builds(lambda p: f"Allow: {p}", rule_path),
        st.just("Disallow:"),
        st.builds(lambda d: f"Crawl-delay: {d}", st.sampled_from(["1", "x"])),
        st.just("# comment"),
        st.just("junk without colon"),
    )
    texts = st.builds("\n".join, st.lists(line, max_size=12))
    paths = st.builds(
        lambda parts: "/" + "/".join(parts),
        st.lists(st.sampled_from(["a", "b", "ab", "abc", "x"]), max_size=4))

    @settings(max_examples=400, deadline=None)
    @given(txt=texts, path=paths, ua=st.sampled_from(["abot", "other"]))
    def check(txt, path, ua):
        root = "http://fuzz.example.com/"
        serial_verdict = RobotsDotText(root, txt).is_url_allowed(
            root.rstrip("/") + path, ua)
        rules = parse_robots_rules(root, txt, ua)
        plan_verdict = path_allowed(
            path, rules["allow_rules"], rules["disallow_rules"])
        assert serial_verdict == plan_verdict, (txt, path, ua)

    check()


def test_robots_rules_table_matches_driver_parse(spark):
    """S5 scale mode: the distributed mapInPandas parse must equal the
    driver-side parse_robots_rules for every domain, including the
    Crawl-delay cap and NULL robots_txt (no robots -> empty rules)."""
    from abot_spark.functions.robots import robots_rules_table

    fixture = [
        ("a.com", "User-agent: *\nDisallow: /private/\nCrawl-delay: 2\n"),
        ("b.com", "User-agent: abot\nDisallow: /x\n\n"
                  "User-agent: *\nAllow: /x\nDisallow: /\n"),
        ("c.com", None),                       # never fetched a robots.txt
        ("d.com", "User-agent: *\nCrawl-delay: 99\n"),   # capped at 5 s
        ("e.com", ""),                         # empty file: allow all
    ]
    df = spark.createDataFrame(fixture, "domain string, robots_txt string")
    got = {r["domain"]: r for r in
           robots_rules_table(df, "abot", max_delay_s=5.0).collect()}
    assert set(got) == {d for d, _ in fixture}
    for dom, txt in fixture:
        flat = parse_robots_rules(f"http://{dom}/", txt, "abot")
        assert list(got[dom]["allow_rules"]) == flat["allow_rules"], dom
        assert list(got[dom]["disallow_rules"]) == flat["disallow_rules"], dom
        assert got[dom]["delay_ms"] == int(
            min(flat["crawl_delay_s"], 5.0) * 1000), dom
    assert got["d.com"]["delay_ms"] == 5000      # the cap bit
    assert got["a.com"]["delay_ms"] == 2000
