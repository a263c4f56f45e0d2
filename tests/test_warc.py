"""WARC source (sources/warc.py): round-trip through the Common-Crawl
record-per-gzip-member layout into the BASELINE pages-table shape."""

import datetime as dt
import gzip

import pytest

from abot_spark.sources.warc import parse_warc, read_warc, write_warc

UTC = dt.timezone.utc


def _records():
    return [
        {"url": "http://a.example.com/", "ts": dt.datetime(2024, 1, 1, tzinfo=UTC),
         "html": b"<html><body>the cat and the dog of the house</body></html>",
         "content_type": "text/html; charset=utf-8"},
        {"url": "http://b.example.com/x?b=2&a=1",
         "ts": dt.datetime(2024, 1, 2, 3, 4, 5, tzinfo=UTC),
         "html": "<html><meta charset='shift_jis'>日本語</html>"
                 .encode("shift_jis"),
         "content_type": "text/html"},
        {"url": "http://c.example.com/de",
         "ts": dt.datetime(2024, 2, 1, tzinfo=UTC),
         "html": b"<html>und der die das mit und der</html>",
         "content_type": "text/html"},
    ]


@pytest.mark.parametrize("compress,member", [(True, True), (True, False),
                                             (False, False)])
def test_parse_warc_layouts(tmp_path, compress, member):
    p = tmp_path / "f.warc"
    write_warc(_records(), str(p), compress=compress, member_gzip=member)
    got = list(parse_warc(p.read_bytes()))
    assert [r["url"] for r in got] == [r["url"] for r in _records()]
    assert [r["html"] for r in got] == [r["html"] for r in _records()]
    assert got[0]["status_code"] == 200
    assert got[0]["content_type"].startswith("text/html")
    assert got[1]["warc_ts"] == dt.datetime(2024, 1, 2, 3, 4, 5, tzinfo=UTC)


def test_parse_warc_skips_non_response(tmp_path):
    p = tmp_path / "f.warc"
    write_warc(_records()[:1], str(p), compress=False)
    req = (b"WARC/1.0\r\nWARC-Type: request\r\n"
           b"WARC-Target-URI: http://a.example.com/\r\n"
           b"Content-Length: 4\r\n\r\nGET /\r\n\r\n")
    p.write_bytes(req + p.read_bytes())
    got = list(parse_warc(p.read_bytes()))
    assert len(got) == 1 and got[0]["url"] == "http://a.example.com/"


def test_read_warc_pages_table(spark, tmp_path):
    """Two archive files -> one task each -> the (url, warc_ts, html,
    text, lang) table; text via the S4 kernel (charset-aware), lang via
    the lang_id marker heuristic."""
    write_warc(_records()[:2], str(tmp_path / "a.warc.gz"))
    write_warc(_records()[2:], str(tmp_path / "b.warc.gz"))
    df = read_warc(spark, str(tmp_path / "*.warc.gz"))
    assert [f.name for f in df.schema] == \
        ["url", "warc_ts", "html", "text", "lang"]
    rows = {r["url"]: r for r in df.collect()}
    assert len(rows) == 3
    en = rows["http://a.example.com/"]
    assert en["lang"] == "en"
    assert "the cat and the dog" in en["text"]
    assert en["warc_ts"] == dt.datetime(2024, 1, 1)  # session TZ=UTC, naive
    # charset honored byte-for-byte by the shared S4 kernel
    ja = rows["http://b.example.com/x?b=2&a=1"]
    assert "日本語" in ja["text"]
    assert rows["http://c.example.com/de"]["lang"] == "de"


def test_read_warc_drops_non_html(spark, tmp_path):
    recs = _records()[:1] + [
        {"url": "http://a.example.com/img.png",
         "ts": dt.datetime(2024, 1, 1, tzinfo=UTC),
         "html": b"\x89PNG...", "content_type": "image/png"},
    ]
    write_warc(recs, str(tmp_path / "c.warc.gz"))
    urls = [r["url"] for r in
            read_warc(spark, str(tmp_path / "c.warc.gz")).collect()]
    assert urls == ["http://a.example.com/"]
