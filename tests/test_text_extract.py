"""Port of Abot.Tests.Unit/Core/WebContentExtractorTest.cs (charset
precedence + the 4 meta quoting styles + cp1251 alias) plus regex-level
checks on the charset sniffer (WebContentExtractor.cs:22)."""

from __future__ import annotations

from abot_spark.functions.text_extract import (
    charset_from_body,
    charset_from_headers,
    clean_charset,
    extract_text,
    resolve_codec,
)

JA = "日本語のテキスト"


def shift_jis_page(meta: str) -> bytes:
    return (meta + "\n<html><body>" + JA + "</body></html>").encode("shift_jis")


META_VARIANTS = [
    # GetContent_NonUtf8 (:45-58): double quotes, no close
    '<meta http-equiv="Content-Type" content="text/html; charset=Shift_JIS">',
    # GetContent_MetaSingleQuotes_NonUtf8 (:61-75)
    "<meta http-equiv='Content-Type' content='text/html; charset=Shift_JIS'>",
    # GetContent_MetaDoubleQuotesAndClose_NonUtf8 (:78-92)
    '<meta http-equiv="Content-Type" content="text/html; charset=Shift_JIS" />',
    # GetContent_MetaSingleQuotesAndClose_NonUtf8 (:95-109)
    "<meta http-equiv='Content-Type' content='text/html; charset=Shift_JIS' />",
]


def test_utf8_header():  # GetContent_Utf8 (:27-42)
    html = "<!DOCTYPE html>\r\n<html>\r\n<head>\r\n</head></html>".encode()
    charset, text = extract_text(html, "text/html; charset=utf-8")
    assert charset == "utf-8"
    assert text.startswith("<!DOCTYPE html>\r\n<html>\r\n<head>\r\n")


def test_shift_jis_meta_variants():
    for meta in META_VARIANTS:
        charset, text = extract_text(shift_jis_page(meta), "text/html")
        assert charset == "Shift_JIS", meta
        assert text.startswith("<meta http-equiv=")
        assert JA in text


def test_cp1251_converts_to_windows1251():  # (:112-126)
    body = '<meta http-equiv=Content-Type content="text/html; charset=cp1251">Привет'
    raw = body.encode("windows-1251")
    charset, text = extract_text(raw, None)
    assert charset == "windows-1251"
    assert text.startswith("<meta http-equiv=")
    assert "Привет" in text


def test_header_charset_beats_meta():
    # precedence: header first (GetContent :46-56)
    html = ('<meta charset="shift_jis">café').encode("utf-8")
    charset, text = extract_text(html, "text/html; charset=utf-8")
    assert charset == "utf-8"
    assert "café" in text


def test_header_charset_untrimmed_substring():
    # GetCharsetFromHeaders keeps everything after "charset=" (:97-99);
    # the junk then fails Encoding.GetEncoding -> UTF-8 fallback (:133-150)
    assert charset_from_headers("text/html; charset=utf-8; foo=bar") == "utf-8; foo=bar"
    assert resolve_codec("utf-8; foo=bar") == "utf-8"
    charset, text = extract_text("abc".encode(), "text/html; charset=utf-8; foo=bar")
    assert text == "abc"


def test_no_charset_anywhere_falls_back_utf8():
    charset, text = extract_text("hello".encode(), "text/html")
    assert charset is None
    assert text == "hello"


def test_html5_meta_charset():
    assert charset_from_body('<meta charset="utf-8">') == "utf-8"
    assert charset_from_body("<meta charset=utf-8>") == "utf-8"


def test_meta_name_excluded_by_regex():
    # (?!\s*(?:name|value)\s*=) — meta name= tags don't carry charsets
    assert charset_from_body('<meta name="robots" content="charset=evil">') is None


def test_clean_charset_alias_exact_match_only():
    assert clean_charset("cp1251") == "windows-1251"
    assert clean_charset("CP1251") == "CP1251"  # exact match only (:161)
    assert clean_charset(None) is None


def test_unknown_charset_falls_back_utf8():
    charset, text = extract_text("abc".encode(), "text/html; charset=klingon-8")
    assert charset == "klingon-8"
    assert text == "abc"


def test_bom_consumed():
    charset, text = extract_text(b"\xef\xbb\xbfhi", "text/html; charset=utf-8")
    assert text == "hi"


def test_empty_and_none():
    assert extract_text(None, None) == (None, "")
    assert extract_text(b"", None) == (None, "")
