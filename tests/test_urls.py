"""Unit tests for the .NET-Uri-parity URL kernel (abot_spark.urls)."""

from __future__ import annotations

from abot_spark.urls import (
    absolutize,
    authority,
    canonicalize,
    is_base_of,
    remove_dot_segments,
    resolve_base_href,
    strip_fragment,
)


def test_canonicalize_normalizations():
    assert canonicalize("http://AAA.com") == "http://aaa.com/"
    assert canonicalize("HTTP://aaa.com/Path") == "http://aaa.com/Path"
    assert canonicalize("http://aaa.com:80/x") == "http://aaa.com/x"
    assert canonicalize("https://aaa.com:443/x") == "https://aaa.com/x"
    assert canonicalize("http://aaa.com:8080/x") == "http://aaa.com:8080/x"
    assert canonicalize("http://a.com/a/../b") == "http://a.com/b"
    assert canonicalize("http://a.com/a/./b/") == "http://a.com/a/b/"


def test_canonicalize_invalid():
    assert canonicalize("http://////") is None
    assert canonicalize("") is None
    assert canonicalize("no-scheme/path") is None
    assert canonicalize(None) is None


def test_canonicalize_non_http_passthrough():
    assert canonicalize("mailto:aaa@gmail.com") == "mailto:aaa@gmail.com"
    assert canonicalize("tel:+123456789") == "tel:+123456789"
    assert canonicalize("ftp://user@yourdomainname.com/") == "ftp://user@yourdomainname.com/"
    assert canonicalize("file:///C:/Users/") == "file:///C:/Users/"


def test_absolutize():
    assert absolutize("http://a.com/", "/aaa/a.html") == "http://a.com/aaa/a.html"
    assert absolutize("http://a.com/", "bbb/b.html") == "http://a.com/bbb/b.html"
    assert absolutize("http://a.com/aaa/", "b.html") == "http://a.com/aaa/b.html"
    assert absolutize("http://a.com/", "http://b.com") == "http://b.com/"
    assert absolutize("http://a.com/", "page#frag") == "http://a.com/page"
    assert absolutize("http://a.com/", "page#frag", respect_fragment=True) == "http://a.com/page#frag"
    assert absolutize("http://a.com/", "http://////") is None


def test_resolve_base_href():
    page = "http://a.com/"
    assert resolve_base_href(page, None) == page
    assert resolve_base_href(page, "") == page
    assert resolve_base_href(page, "http://bbb.com") == "http://bbb.com"
    assert resolve_base_href(page, "/images") == page          # relative -> ignored
    assert resolve_base_href(page, "http:http://http:") == page  # invalid -> ignored
    assert resolve_base_href(page, "//aaa.com") == "http://aaa.com"
    assert resolve_base_href("https://a.com/", "//aaa.com") == "https://aaa.com"


def test_authority():
    assert authority("http://WWW.A.com/x") == "www.a.com"
    assert authority("http://a.com:80/") == "a.com"
    assert authority("http://a.com:81/") == "a.com:81"
    assert authority("mailto:x@y.com") == ""


def test_is_base_of():
    assert is_base_of("http://a.com/", "http://a.com/deep/page")
    assert is_base_of("http://a.com/sub/", "http://a.com/sub/page")
    assert not is_base_of("http://a.com/sub/", "http://a.com/other")
    assert not is_base_of("http://a.com/", "http://b.com/")
    assert not is_base_of("http://a.com/", "https://a.com/")


def test_strip_fragment_and_dot_segments():
    assert strip_fragment("/a#b#c") == "/a"
    assert strip_fragment("/a") == "/a"
    assert remove_dot_segments("/a/b/../c") == "/a/c"
    assert remove_dot_segments("/a/./b") == "/a/b"
    assert remove_dot_segments("/../x") == "/x"


def test_fast_canonical_parity():
    """_fast_canonical must return either None (defer) or exactly what the
    full parse would produce — across a grammar of tricky shapes."""
    from abot_spark.urls import _canonicalize_slow, _fast_canonical

    hosts = ["a.com", "A.com", "a-b.c0m", "a.com:80", "a.com:8080",
             "user@a.com", "[::1]", "a_b.com", "", "a.com."]
    paths = ["", "/", "/x", "/x/y.html", "/x//y", "/./x", "/x/../y",
             "/x/.", "/x%20y", "/x;p", "/x\\y", "/x?", "/x?q=1", "/x?a=b&c",
             "/x#f", "/x?q#f", "/X/Y", "/x ", "/x\ty"]
    schemes = ["http://", "https://", "HTTP://", "ftp://", ""]
    checked = fast_hits = 0
    for s in schemes:
        for h in hosts:
            for p in paths:
                u = f"{s}{h}{p}"
                f = _fast_canonical(u)
                checked += 1
                if f is not None:
                    fast_hits += 1
                    assert f == _canonicalize_slow(u), u
    assert checked == len(schemes) * len(hosts) * len(paths)
    assert fast_hits > 50  # the fast path actually engages


def test_fast_canonical_hypothesis():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from abot_spark.urls import _canonicalize_slow, _fast_canonical

    url_chars = st.text(
        alphabet="abcXYZ019.-_/:?#@%&=;~[] \t\\", max_size=40)

    @settings(max_examples=500, deadline=None)
    @given(prefix=st.sampled_from(["http://", "https://", "http:/", ""]),
           rest=url_chars)
    def check(prefix, rest):
        u = prefix + rest
        f = _fast_canonical(u)
        if f is not None:
            assert f == _canonicalize_slow(u), repr(u)

    check()


def test_split_authority_path_parity():
    """The manual http(s) scan in split_authority_path must agree with the
    urlsplit-backed slow path on every input (the slow path IS the spec)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from abot_spark.urls import (_split_authority_path_slow,
                                 split_authority_path)

    url_chars = st.text(
        alphabet="abcXYZ019.-_/:?#@%&=;~[] \t\n\\", max_size=40)

    @settings(max_examples=500, deadline=None)
    @given(prefix=st.sampled_from(["http://", "https://", "HTTP://",
                                   "mailto:", ""]),
           rest=url_chars)
    def check(prefix, rest):
        u = prefix + rest
        assert split_authority_path(u) == _split_authority_path_slow(u), \
            repr(u)

    check()
    # the fast path engages on the canonical shapes the link UDF emits
    assert split_authority_path("http://a.com/x/y?q=1") == ("a.com", "/x/y")
    assert split_authority_path("https://a.com") == ("a.com", "/")
    assert split_authority_path("http://a.com:8080/p#f") == \
        ("a.com:8080", "/p")


def test_absolutize_scheme_sniff_parity():
    """absolutize's anchored-regex scheme sniff must classify every href the
    way urlsplit's scheme parse does (same downstream branch)."""
    from urllib.parse import urlsplit

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from abot_spark.urls import absolutize

    def reference_branch(href):
        try:
            return bool(urlsplit(href).scheme)
        except ValueError:
            return None  # original code dropped the href outright

    href_chars = st.text(
        alphabet="abcXYZ019.-_/:?#@%&=+;~[] \t\n\r\x00\\", max_size=40)

    @settings(max_examples=800, deadline=None)
    @given(href=href_chars)
    def check(href):
        # differential: run absolutize and an urlsplit-sniff reimplementation
        # of the original branch structure; outputs must be identical
        base = "http://base.example.com/dir/page.html"
        got = absolutize(base, href)
        stripped = href.strip()
        h = stripped.split("#", 1)[0]
        if h == "":
            return  # base-resolution branch, untouched by the sniff
        from abot_spark.urls import (_fast_canonical, _split_cached,
                                     canonicalize)
        from urllib.parse import urljoin
        if _fast_canonical(h) is not None:
            expected = _fast_canonical(h)
        else:
            branch = reference_branch(h)
            if branch is None:
                expected = None
            elif branch:
                expected = canonicalize(h)
            elif h.startswith("/") and not h.startswith("//"):
                b = _split_cached(base)
                expected = canonicalize(f"{b.scheme}://{b.netloc}{h}")
            else:
                try:
                    expected = canonicalize(urljoin(base, h))
                except ValueError:
                    expected = None
        assert got == expected, repr(href)

    check()
