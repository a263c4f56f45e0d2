"""URL absolutization / canonicalization — .NET ``Uri`` parity kernel.

Pure functions (no Spark imports) so they are unit-testable without a
session and importable inside Arrow pandas UDFs on executors.

Semantics reproduced from the reference:

- ``new Uri(baseUri, href)`` resolution incl. ``.AbsoluteUri`` normalization
  (lowercase scheme/host, default port stripped, empty http(s) path -> "/",
  dot-segments removed) — the output strings here are the parity oracle for
  ``Abot.Tests.Unit/Core/HyperlinkParserTest.cs`` expectations.
- fragment stripping before resolution unless
  ``IsRespectUrlNamedAnchorOrHashbangEnabled``
  (``Abot/Core/Parsers/HyperLinkParser.cs:190-194``).
- malformed URLs dropped silently (``HyperLinkParser.cs:204-208``), e.g.
  ``http://////`` (HyperlinkParserTest ``GetLinks_InvalidFormatUrl``).
- ``Uri.Authority`` = lowercase host[:port], default port omitted
  (used as the per-domain key everywhere: rate limiter, count-by-domain,
  internal/external classification ``Abot/Crawler/WebCrawler.cs:114-115``).

The canonical form produced by :func:`canonicalize` is the seen-set key
(hashed with ``xxhash64`` Spark-side; reference used first 8 MD5 bytes,
``Abot/Core/Repositories/CrawledUrlRepository.cs:58-76`` — only the
"64-bit hash, collisions tolerated" contract is kept).
"""

from __future__ import annotations

from functools import lru_cache
from urllib.parse import urljoin, urlsplit, urlunsplit

_DEFAULT_PORTS = {"http": 80, "https": 443}

_HOST_RE_FAST = __import__("re").compile(r"[a-z0-9.-]+\Z")

# anchored scheme sniff — same accept set as urlsplit's (first char ASCII
# alpha, then letters/digits/"+-.", terminated by the first ":"); used to
# skip a full urlsplit per href in absolutize.  urlsplit additionally
# strips \t\n\r anywhere and leading C0 controls before sniffing, so any
# href containing those defers to the real urlsplit (see absolutize).
_SCHEME_RE = __import__("re").compile(r"[A-Za-z][A-Za-z0-9+.\-]*:")


def _fast_canonical(url: str) -> str | None:
    """Return ``url`` unchanged iff it is *provably already canonical* —
    the dominant case in link batches at scale (most extracted hrefs are
    clean absolute http(s) URLs).  Anything uncertain returns ``None`` and
    falls through to the full parse; exact parity with the slow path is
    property-tested (tests/test_urls.py::test_fast_canonical_parity).
    """
    if url.startswith("http://"):
        rest = url[7:]
    elif url.startswith("https://"):
        rest = url[8:]
    else:
        return None
    if "\t" in url or "\n" in url or "\r" in url or "#" in url:
        return None  # urlsplit strips tab/nl/cr; '#' starts a fragment
    if url[-1].isspace():
        return None  # slow path str.strip()s trailing whitespace — a
        # fragment-stripped href ("/a #frag" -> "/a ") must not keep it
    slash = rest.find("/")
    if slash < 0:
        host, path = rest, ""
    else:
        host, path = rest[:slash], rest[slash:]
    if not host or not _HOST_RE_FAST.match(host):
        return None  # uppercase/port/userinfo/IPv6/empty -> slow path
    if not path:
        return url + "/"  # empty http(s) path normalizes to "/"
    q = path.find("?")
    if q >= 0:
        if q == len(path) - 1:
            return None  # bare trailing "?" is dropped by the slow path
        path = path[:q]
    if "/." in path:
        return None  # may contain "."/".." segments -> slow path
    return url


def strip_fragment(href: str) -> str:
    """``hrefValue.Split('#')[0]`` (HyperLinkParser.cs:192-194)."""
    return href.split("#", 1)[0]


def remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4 — .NET Uri normalizes dot segments in AbsoluteUri."""
    if not path:
        return path
    output: list[str] = []
    for seg in path.split("/"):
        if seg == ".":
            continue
        if seg == "..":
            if len(output) > 1:
                output.pop()
            continue
        output.append(seg)
    # preserve trailing "/." or "/.." collapse to "/"
    if path.endswith(("/.", "/..")) and (not output or output[-1] != ""):
        output.append("")
    return "/".join(output)


@lru_cache(maxsize=1 << 16)
def canonicalize(url: str) -> str | None:
    """Normalize an absolute URL the way .NET ``Uri.AbsoluteUri`` does.

    Memoized per process: web pages repeat boilerplate links (nav, footer)
    heavily, and executor python workers keep their cache across Arrow
    batches.  Pure function of its argument, so caching is transparent.

    Returns ``None`` when the URL is invalid by .NET rules (http(s) URL
    with an empty host, unparseable input, or no scheme).
    Non-http(s) schemes (mailto:, tel:, ftp:, file:) pass through with only
    scheme lowercasing — HyperlinkParserTest ``GetLinks_AnchorTags*`` keeps
    them verbatim.
    """
    if url is None:
        return None
    url = url.strip()
    if not url:
        return None
    fast = _fast_canonical(url)
    if fast is not None:
        return fast
    return _canonicalize_slow(url)


def _canonicalize_slow(url: str) -> str | None:
    """Full parse path of :func:`canonicalize` (also the parity oracle for
    ``_fast_canonical`` in tests)."""
    try:
        parts = urlsplit(url)
    except ValueError:
        return None
    scheme = parts.scheme.lower()
    if not scheme:
        return None
    if scheme not in _DEFAULT_PORTS:
        if parts.scheme == scheme:
            return url
        return urlunsplit((scheme, parts.netloc, parts.path, parts.query, parts.fragment))
    # one manual netloc parse instead of four lazy SplitResult property
    # derivations (hostname/port/username/password each rescan netloc);
    # same validation rules as SplitResult.port (digits, <= 65535)
    raw = parts.netloc
    if "@" in raw:
        userinfo, _, hostport = raw.rpartition("@")
    else:
        userinfo, hostport = "", raw
    if hostport.startswith("["):           # IPv6 literal
        end = hostport.find("]")
        if end < 0:
            return None
        host = hostport[:end + 1].lower()
        rest = hostport[end + 1:]
        if rest and not rest.startswith(":"):
            return None
        port_s = rest[1:]
    else:
        host, _, port_s = hostport.partition(":")
        host = host.lower()
    if not host or host == "[]":
        return None  # e.g. "http://////"
    port = None
    if port_s:
        if not port_s.isdigit():
            return None
        port = int(port_s)
        if port > 65535:
            return None
    netloc = host
    user, _, password = userinfo.partition(":")
    if user:   # empty password drops its ":" (matches SplitResult.password)
        netloc = user + (":" + password if password else "") + "@" + netloc
    if port is not None and port != _DEFAULT_PORTS[scheme]:
        netloc += f":{port}"
    path = remove_dot_segments(parts.path) or "/"
    return urlunsplit((scheme, netloc, path, parts.query, parts.fragment))


@lru_cache(maxsize=1 << 16)
def absolutize(base_url: str, href: str, respect_fragment: bool = False) -> str | None:
    """``new Uri(uriToUse, href).AbsoluteUri`` (HyperLinkParser.cs:186-209).

    Returns the canonical absolute URL, or ``None`` when the href cannot
    form a valid URI (dropped silently by the reference).  Memoized like
    :func:`canonicalize` — the (base_url, href) pair repeats for every
    boilerplate link shared across a site's pages.
    """
    if href is None:
        return None
    href = href.strip()
    if not respect_fragment:
        # fragment removal can expose trailing whitespace ("/ #frag" ->
        # "/ ").  Keep it: every resolution path below must see the href
        # verbatim — an early rstrip changes which urljoin branch fires
        # ("; " resolves to "dir/;" but a bare ";" hits urlparse's RFC-1808
        # params handling and collapses to the base) — and the final
        # canonicalize() strips outer whitespace exactly once, .NET-style.
        # The fast paths below each reject trailing whitespace instead.
        href = strip_fragment(href)
    if href == "" and not respect_fragment:
        # ``new Uri(base, "")`` resolves to the base itself
        return canonicalize(base_url)
    fast = _fast_canonical(href)
    if fast is not None:
        return fast  # clean absolute href: skip scheme-sniff + re-parse
    m = _SCHEME_RE.match(href)
    if m is None and ("\t" in href or "\n" in href or "\r" in href
                      or (href and href[0] < "!")):
        # chars urlsplit strips before sniffing could be hiding a scheme
        try:
            href_scheme = urlsplit(href).scheme
        except ValueError:
            return None
    else:
        href_scheme = href[:m.end() - 1] if m is not None else ""
    if href_scheme:
        # absolute href: .NET validates it standalone — ``http://////``
        # throws rather than being repaired against the base
        return canonicalize(href)
    if href.startswith("/") and not href.startswith("//"):
        # path-absolute fast path (the dominant case in link batches):
        # RFC 3986 §5.3 merge is just scheme://authority + href; dot
        # segments are normalized by canonicalize anyway, so this equals
        # urljoin without re-parsing the base for every href
        origin = _canonical_origin(base_url)
        if origin is not None:
            # origin is proven canonical (cached per base); the join is
            # canonical iff the href part passes the same cleanliness
            # checks _fast_canonical applies to a path — skipping the
            # full-string re-validation canonicalize would repeat per link
            if ("\t" not in href and "\n" not in href and "\r" not in href
                    and "#" not in href and not href[-1].isspace()):
                q = href.find("?")
                p = href if q < 0 else href[:q]
                if "/." not in p and q != len(href) - 1:
                    return origin + href
        base = _split_cached(base_url)
        if base is not None and base.scheme.lower() in _DEFAULT_PORTS:
            return canonicalize(f"{base.scheme}://{base.netloc}{href}")
    try:
        joined = urljoin(base_url, href)
    except ValueError:
        return None
    return canonicalize(joined)


@lru_cache(maxsize=4096)
def _canonical_origin(base_url: str) -> str | None:
    """``scheme://authority`` of ``base_url``, returned only when it is
    *provably already canonical* (clean lowercase http(s) host, no port/
    userinfo) — cached per base so path-absolute hrefs join without
    re-validating the host once per link.  Anything uncertain returns
    ``None`` and the caller takes the full canonicalize path."""
    base = _split_cached(base_url)
    if base is None:
        return None
    scheme = base.scheme.lower()
    if scheme not in _DEFAULT_PORTS:
        return None
    origin = f"{scheme}://{base.netloc}"
    if _fast_canonical(origin) != origin + "/":
        return None
    return origin


@lru_cache(maxsize=4096)
def _split_cached(url: str):
    try:
        return urlsplit(url)
    except ValueError:
        return None


def split_authority_path(url: str) -> tuple[str, str]:
    """(netloc-sans-userinfo, path) of an already-canonical URL — one split
    instead of a re-parse per consumer (the link UDF emits these alongside
    every extracted URL).  Manual scan for the dominant clean-http(s) case;
    anything uncertain (userinfo, stripped chars, other schemes) defers to
    the cached urlsplit path, whose parity with this scan is
    property-tested (tests/test_urls.py::test_split_authority_path_parity).
    """
    if url.startswith("http://"):
        rest = url[7:]
    elif url.startswith("https://"):
        rest = url[8:]
    else:
        return _split_authority_path_slow(url)
    cut = len(rest)
    for sep in "/?#":
        i = rest.find(sep, 0, cut)
        if i >= 0:
            cut = i
    netloc = rest[:cut]
    if not netloc or "@" in netloc or "[" in netloc or "]" in netloc \
            or "\t" in url or "\n" in url or "\r" in url:
        return _split_authority_path_slow(url)
    if cut == len(rest) or rest[cut] != "/":
        return netloc, "/"
    path = rest[cut:]
    for sep in "?#":
        i = path.find(sep)
        if i >= 0:
            path = path[:i]
    return netloc, path


@lru_cache(maxsize=1 << 16)
def _split_authority_path_slow(url: str) -> tuple[str, str]:
    try:
        parts = urlsplit(url)
    except ValueError:
        return "", "/"
    return parts.netloc.rsplit("@", 1)[-1], parts.path or "/"


def resolve_base_href(page_url: str, base_href: str | None) -> str:
    """Pick the URI used for relative resolution (HyperLinkParser.cs:162-184).

    A ``<base href>`` overrides the page URL only when it is a valid
    *absolute* URI; ``//host`` inherits the page scheme.  Invalid or
    relative base hrefs fall back to the page URL (contract from
    HyperlinkParserTest ``GetLinks_RelativeBaseTagPresent`` /
    ``GetLinks_InvalidBaseTagPresent`` — the fork's code at
    HyperLinkParser.cs:175-183 rethrows, but its own test matrix pins the
    upstream fallback behavior, which is what a batch engine needs anyway).
    """
    if not base_href:
        return page_url
    base_href = base_href.strip()
    if not base_href:
        return page_url
    if base_href.startswith("//"):
        scheme = urlsplit(page_url).scheme or "http"
        base_href = f"{scheme}:{base_href}"
    try:
        parts = urlsplit(base_href)
    except ValueError:
        return page_url
    if not parts.scheme:
        return page_url
    if parts.scheme.lower() in _DEFAULT_PORTS and not parts.netloc:
        return page_url  # "http:http://http:" style garbage
    return base_href


def authority(url: str) -> str:
    """.NET ``Uri.Authority``: lowercase host[:port], default port omitted."""
    try:
        parts = urlsplit(url)
    except ValueError:
        return ""
    host = (parts.hostname or "").lower()
    if not host:
        return ""
    try:
        port = parts.port
    except ValueError:
        return host
    if port is not None and port != _DEFAULT_PORTS.get(parts.scheme.lower(), None):
        return f"{host}:{port}"
    return host


def is_base_of(root_url: str, url: str) -> bool:
    """.NET ``Uri.IsBaseOf`` approximation used by the robots gate
    (``Abot/Core/Robots/RobotsDotText.cs:78-82``): same scheme+authority and
    the root path is a directory-prefix of the url path."""
    try:
        r, u = urlsplit(root_url), urlsplit(url)
    except ValueError:
        return False
    if r.scheme.lower() != u.scheme.lower() or authority(root_url) != authority(url):
        return False
    root_path = r.path or "/"
    if not root_path.endswith("/"):
        root_path = root_path.rsplit("/", 1)[0] + "/"
    u_path = u.path or "/"
    return u_path.startswith(root_path)
