"""Structured Streaming surfaces: continuous seed ingest (cross-batch
dedup, idempotent epochs), continuous page extraction (kernel parity with
the batch wave), watermarked discovery-rate aggregation."""

from __future__ import annotations

import os
import tempfile
from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from abot_spark.config import CrawlConfig
from abot_spark.functions.udfs import links_col, text_extract_col
from abot_spark.streaming import (
    discovery_rate_stream, page_extract_stream, seed_ingest_stream,
)
from abot_spark.streaming.ingest import read_accepted_seeds


def _ts(minute: int, second: int = 0):
    return datetime(2026, 1, 1, 12, minute, second, tzinfo=timezone.utc)


def _drop_seeds(spark, input_dir: str, name: str, rows):
    # single parquet FILE directly in input_dir (the streaming file source
    # does not descend into non-partition subdirectories)
    import pyarrow as pa
    import pyarrow.parquet as pq
    pq.write_table(
        pa.table({"url": [r[0] for r in rows],
                  "discovered_ts": pa.array([r[1] for r in rows],
                                            pa.timestamp("us", tz="UTC"))}),
        os.path.join(input_dir, f"{name}.parquet"))


def test_seed_ingest_dedups_within_and_across_batches(spark):
    input_dir = tempfile.mkdtemp(prefix="abot-stream-in-")
    work_dir = tempfile.mkdtemp(prefix="abot-stream-wd-")

    _drop_seeds(spark, input_dir, "drop1", [
        ("http://a.example.com/x", _ts(0)),
        ("HTTP://A.EXAMPLE.COM/x#frag", _ts(0, 30)),   # same canonical URL
        ("http://b.example.com/", _ts(1)),
    ])
    q = seed_ingest_stream(spark, input_dir, work_dir)
    q.awaitTermination(120)
    got = read_accepted_seeds(spark, work_dir)
    assert got == ["http://a.example.com/x", "http://b.example.com/"]

    # second drop: one already-seen URL (different spelling), one new
    _drop_seeds(spark, input_dir, "drop2", [
        ("http://a.example.com/x?", _ts(2)),           # canonically seen
        ("http://c.example.com/new", _ts(3)),
    ])
    q2 = seed_ingest_stream(spark, input_dir, work_dir)
    q2.awaitTermination(120)
    got2 = read_accepted_seeds(spark, work_dir)
    assert sorted(got2) == ["http://a.example.com/x",
                            "http://b.example.com/",
                            "http://c.example.com/new"]


def test_page_extract_stream_matches_batch_kernels(spark):
    input_dir = tempfile.mkdtemp(prefix="abot-stream-pages-")
    out_dir = tempfile.mkdtemp(prefix="abot-stream-ext-") + "/out"
    cfg = CrawlConfig()
    html = (b"<html><head><meta charset='utf-8'></head><body>"
            b"<a href='/one'>1</a> <a href='two.html'>2</a>"
            b"caf\xc3\xa9</body></html>")
    rows = [("http://s.example.com/index.html", html,
             "text/html; charset=utf-8", None)]
    schema = ("url string, html binary, content_type string, "
              "x_robots_tag string")
    import pyarrow as pa
    import pyarrow.parquet as pq
    pq.write_table(
        pa.table({"url": [rows[0][0]], "html": [rows[0][1]],
                  "content_type": [rows[0][2]],
                  "x_robots_tag": pa.array([None], pa.string())}),
        os.path.join(input_dir, "b1.parquet"))

    q = page_extract_stream(spark, input_dir, out_dir, cfg)
    q.awaitTermination(120)
    got = spark.read.parquet(out_dir).collect()
    assert len(got) == 1

    batch = (spark.createDataFrame(rows, schema)
             .withColumn("_ext", text_extract_col(F.col("html"),
                                                  F.col("content_type")))
             .withColumn("links", links_col(cfg, F.col("_ext.text"),
                                            F.col("url"),
                                            F.col("x_robots_tag")))
             .select(F.col("_ext.text").alias("text"),
                     F.col("links.url").alias("out_urls"))).first()
    assert got[0]["text"] == batch["text"]          # byte-identical S4
    assert got[0]["out_urls"] == batch["out_urls"]  # identical T1/T3
    assert got[0]["out_urls"] == ["http://s.example.com/one",
                                  "http://s.example.com/two.html"]
    assert "café" in got[0]["text"]


def test_discovery_rate_watermark_drops_late_events(spark):
    input_dir = tempfile.mkdtemp(prefix="abot-stream-rate-")
    _drop_seeds(spark, input_dir, "early", [
        ("http://a.example.com/1", _ts(0, 10)),
        ("http://a.example.com/2", _ts(0, 20)),
        ("http://b.example.com/1", _ts(1, 10)),
        ("http://a.example.com/3", _ts(10)),   # advances watermark to 12:08
    ])
    q = discovery_rate_stream(spark, input_dir, query_name="rate1",
                              available_now=False, max_files_per_trigger=1)
    try:
        q.processAllAvailable()              # batch 1: watermark -> 12:08
        rows = {(r["window_start"].minute, r["domain"]): r["n_discovered"]
                for r in spark.sql("select * from rate1").collect()}
        assert rows[(0, "a.example.com")] == 2
        assert rows[(1, "b.example.com")] == 1
        assert rows[(10, "a.example.com")] == 1

        # batch 2 on the SAME query: one event far behind the watermark —
        # the windowed agg must drop it (no update to the 12:00 window)
        _drop_seeds(spark, input_dir, "late", [
            ("http://a.example.com/late", _ts(0, 40)),
        ])
        q.processAllAvailable()
        emitted = {r["n_discovered"]
                   for r in spark.sql("select * from rate1").collect()
                   if r["window_start"].minute == 0
                   and r["domain"] == "a.example.com"}
        assert emitted == {2}                     # unchanged: late dropped
    finally:
        q.stop()


def _drop_discovered(input_dir: str, name: str, rows):
    import pyarrow as pa
    import pyarrow.parquet as pq
    pq.write_table(
        pa.table({"url": [r[0] for r in rows],
                  "domain": [r[1] for r in rows],
                  "discovered_ts": pa.array([r[2] for r in rows],
                                            pa.timestamp("us", tz="UTC"))}),
        os.path.join(input_dir, f"{name}.parquet"))


def test_politeness_pacing_state_across_batches(spark):
    """C3 as a custom stateful streaming operator
    (``applyInPandasWithState``): one admission per delay window per
    domain (``RateLimiter.cs:55-142``), window position carried in keyed
    state ACROSS micro-batches and query restarts (checkpoint)."""
    from abot_spark.streaming import politeness_pacing_stream

    input_dir = tempfile.mkdtemp(prefix="abot-stream-pace-in-")
    out_dir = tempfile.mkdtemp(prefix="abot-stream-pace-out-")
    t0 = _ts(0)
    t0_ms = int(t0.timestamp() * 1000)

    # batch 1: three same-domain URLs at/near the same instant + one
    # other-domain URL (independent state)
    _drop_discovered(input_dir, "drop1", [
        ("http://d0.example.com/a", "d0.example.com", t0),
        ("http://d0.example.com/b", "d0.example.com", t0),
        ("http://d0.example.com/c", "d0.example.com", _ts(0, 0)),
        ("http://d1.example.com/x", "d1.example.com", t0),
    ])
    q = politeness_pacing_stream(spark, input_dir, out_dir,
                                 default_delay_ms=1000,
                                 delays={"d1.example.com": 250})
    q.awaitTermination(120)
    got = {r["url"]: r["fetch_at_ms"]
           for r in spark.read.parquet(out_dir).collect()}
    # deterministic (discovered_ts, url) order -> a, b, c spaced 1000 ms
    assert got["http://d0.example.com/a"] == t0_ms
    assert got["http://d0.example.com/b"] == t0_ms + 1000
    assert got["http://d0.example.com/c"] == t0_ms + 2000
    assert got["http://d1.example.com/x"] == t0_ms   # separate domain state

    # batch 2, NEW query off the same checkpoint: a URL discovered at
    # t0+500 must wait for the persisted window (t0+3000), proving the
    # per-domain state survived the micro-batch boundary and restart
    _drop_discovered(input_dir, "drop2", [
        ("http://d0.example.com/d", "d0.example.com",
         datetime(2026, 1, 1, 12, 0, 0, 500000, tzinfo=timezone.utc)),
        ("http://d1.example.com/y", "d1.example.com", _ts(0, 1)),
    ])
    q2 = politeness_pacing_stream(spark, input_dir, out_dir,
                                  default_delay_ms=1000,
                                  delays={"d1.example.com": 250})
    q2.awaitTermination(120)
    got2 = {r["url"]: r["fetch_at_ms"]
            for r in spark.read.parquet(out_dir).collect()}
    assert got2["http://d0.example.com/d"] == t0_ms + 3000
    # d1's window (t0+250) had already freed by t0+1000: admit at its ts
    assert got2["http://d1.example.com/y"] == t0_ms + 1000


def test_doc_dedup_stream_cross_batch(spark):
    """Streaming exact dedup: a duplicate arriving in a LATER micro-batch
    (inside the watermark) is dropped by cross-batch state; distinct docs
    all come through exactly once."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from abot_spark.streaming.ingest import doc_dedup_stream

    input_dir = tempfile.mkdtemp(prefix="abot-ddup-in-")
    out_dir = tempfile.mkdtemp(prefix="abot-ddup-out-")

    def drop(name, rows):
        pq.write_table(
            pa.table({"doc_id": pa.array([r[0] for r in rows], pa.int64()),
                      "text": [r[1] for r in rows],
                      "event_ts": pa.array([_ts(*r[2]) for r in rows],
                                           pa.timestamp("us", tz="UTC"))}),
            os.path.join(input_dir, f"{name}.parquet"))

    drop("b0", [(0, "alpha content", (0,)), (1, "beta content", (0, 30)),
                (2, "alpha content", (1,))])      # in-batch dup of 0
    q = doc_dedup_stream(spark, input_dir, out_dir,
                         watermark="10 minutes", max_files_per_trigger=1)
    q.processAllAvailable()
    # cross-batch dup of 'beta content' + one genuinely new doc
    drop("b1", [(3, "beta content", (2,)), (4, "gamma content", (2, 30))])
    q.processAllAvailable()
    q.stop()

    out = spark.read.parquet(os.path.join(out_dir, "unique"))
    rows = out.collect()
    texts = sorted(r["text"] for r in rows)
    assert texts == ["alpha content", "beta content", "gamma content"]
    assert len({r["digest"] for r in rows}) == 3
