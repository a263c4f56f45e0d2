"""Charset-aware text extraction — byte-for-byte port of the precedence in
``Abot/Core/Extractors/WebContentExtractor.cs``.

Precedence (GetContent, :42-79):

1. charset from the ``Content-Type`` response header: everything after the
   first ``charset=`` occurrence, **untrimmed** (GetCharsetFromHeaders
   :90-103 — ``ctype.Substring(ind + 8)`` keeps any trailing junk, which
   then fails Encoding.GetEncoding and falls back to UTF-8; we reproduce
   that).
2. else: decode the body as ASCII and regex-sniff a ``<meta ... charset=``
   (GetCharsetFromBody :110-126; regex const at :22).
3. ``cp1251`` -> ``windows-1251`` alias (CleanCharset :157-165).
4. unknown/invalid charset -> UTF-8 (GetEncoding :133-150).
5. decode the *full original bytes* with the chosen encoding; a leading BOM
   is consumed (the .NET StreamReader default).

These are pure functions; :mod:`abot_spark.functions.udfs` wraps them in an
Arrow-batched pandas UDF.
"""

from __future__ import annotations

import codecs
import re

# Verbatim translation of WebContentExtractor.cs:22 (C# verbatim string;
# "" -> ").  Group 2 is the charset token.
CHARSET_BODY_RE = re.compile(
    r"""<meta(?!\s*(?:name|value)\s*=)(?:[^>]*?content\s*=[\s"']*)?([^>]*?)[\s"';]*charset\s*=[\s"']*([^\s"'/>]*)""",
    re.IGNORECASE,
)

_BOMS = (
    (codecs.BOM_UTF8, ("utf-8", "utf8", "u8")),
    (codecs.BOM_UTF16_LE, ("utf-16", "utf-16-le", "utf16")),
    (codecs.BOM_UTF16_BE, ("utf-16-be",)),
)


def charset_from_headers(content_type: str | None) -> str | None:
    """GetCharsetFromHeaders (:90-103): substring after ``charset=``.

    Ordinal, case-sensitive IndexOf, no trimming — exactly like the C#.
    """
    if content_type is None:
        return None
    ind = content_type.find("charset=")
    if ind == -1:
        return None
    return content_type[ind + len("charset="):]


def charset_from_body(body_ascii: str | None) -> str | None:
    """GetCharsetFromBody (:110-126): regex over the ASCII-projected body."""
    if body_ascii is None:
        return None
    match = CHARSET_BODY_RE.search(body_ascii)
    if not match:
        return None
    value = match.group(2)
    return value if value and not value.isspace() else None


def clean_charset(charset: str | None) -> str | None:
    """CleanCharset (:157-165): the single cp1251 alias fixup."""
    if charset == "cp1251":
        return "windows-1251"
    return charset


def resolve_codec(charset: str | None) -> str:
    """GetEncoding (:133-150): unknown or invalid charset -> UTF-8."""
    if charset is None:
        return "utf-8"
    try:
        return codecs.lookup(charset).name
    except (LookupError, TypeError):
        return "utf-8"


def extract_text(html: bytes | None, content_type: str | None) -> tuple[str | None, str]:
    """Full GetContent pipeline -> ``(charset, text)``.

    ``charset`` is the raw sniffed value post-CleanCharset (None when
    nothing was sniffed), matching ``PageContent.Charset``; ``text`` is the
    decoded body (``PageContent.Text``).
    """
    if html is None:
        return None, ""
    charset = charset_from_headers(content_type)
    if charset is None:
        # .NET Encoding.ASCII projects non-ASCII bytes to '?'; the exact
        # replacement char is irrelevant for charset-token sniffing.
        body_ascii = html.decode("ascii", errors="replace")
        charset = charset_from_body(body_ascii)
    charset = clean_charset(charset)
    codec = resolve_codec(charset)
    raw = html
    for bom, names in _BOMS:
        if codec in names and raw.startswith(bom):
            raw = raw[len(bom):]
            break
    text = raw.decode(codec, errors="replace")
    if text[:1] == "﻿":  # StreamReader consumes a decoded BOM too
        text = text[1:]
    return charset, text
