"""Structured Streaming surfaces for continuous crawling.

The reference is a batch process per site (``WebCrawler.Crawl`` runs to
completion — ``Abot/Crawler/WebCrawler.cs:400-431``); its closest thing to
streaming is the event stream (S6 sinks, ``WebCrawler.cs:202-293``).  At
Common-Crawl scale the crawl is *continuous*: seeds arrive forever (sitemap
pings, URL submissions, recrawl schedules) and fetched WARC batches land
forever.  These three surfaces wire that up without touching the parity
engine — each reuses the exact batch kernels (``canon_col``,
``text_extract_col``, ``links_col``) so streaming output is byte-identical
to what the wave loop would produce for the same rows:

- :func:`seed_ingest_stream` — a stream of discovered URLs →
  canonicalize → in-batch first-occurrence dedup → anti-join against an
  accumulated ingest seen-set → append accepted seeds.  ``foreachBatch``
  because the dedup set grows with every batch (stream-static joins
  re-plan but we also *append* to the static side; re-reading it per
  batch inside foreachBatch is the documented pattern).  Epoch-keyed
  output dirs make replays idempotent (exactly-once effect on top of the
  sink's at-least-once).
- :func:`page_extract_stream` — a stream of fetched pages (url, html,
  content_type) → charset-aware text extract + link extract (S4/T1/T3
  UDFs) → append.  Stateless, so it is a plain readStream→writeStream
  with no shuffle: each Arrow batch flows through the same two pandas
  UDFs the wave uses.
- :func:`discovery_rate_stream` — watermarked windowed count of
  discovered URLs per domain: the streaming equivalent of the A2
  ``CrawlCountByDomain`` counter, with late events beyond the watermark
  dropped deterministically.

Scale notes: seed ingest shuffles only on ``url_hash`` (the dedup key);
the accumulated seen side is re-read per micro-batch — at 10^10 URLs that
read is pruned the same way the wave loop's is (hash-bucketed storage +
Bloom sidecar, see ``store.py``), and the micro-batch side is small, so
the join broadcasts the *batch*, not the history.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from abot_spark.config import CrawlConfig
from abot_spark.functions.udfs import canon_col, links_col, text_extract_col

SEED_STREAM_SCHEMA = "url string, discovered_ts timestamp"
PAGE_STREAM_SCHEMA = ("url string, html binary, content_type string, "
                      "x_robots_tag string")


def seed_ingest_stream(spark: SparkSession, input_dir: str, work_dir: str,
                       trigger_available_now: bool = True):
    """Watch ``input_dir`` for parquet drops of (url, discovered_ts);
    append never-seen-before canonical seeds to ``{work_dir}/accepted``.

    Returns the started StreamingQuery.  The crawl side drains
    ``{work_dir}/accepted`` into ``WaveCrawler.crawl(seeds)`` — accepted
    seeds still pass the full F1/F6 pipeline on admission; this stage
    only guarantees each canonical URL is emitted once across all
    batches (the T5 ``IsUriKnown`` contract applied to seed discovery).
    """
    accepted_dir = os.path.join(work_dir, "accepted")
    seen_dir = os.path.join(work_dir, "ingest_seen")
    os.makedirs(accepted_dir, exist_ok=True)
    os.makedirs(seen_dir, exist_ok=True)

    def process_batch(batch: DataFrame, epoch_id: int) -> None:
        epoch_out = os.path.join(accepted_dir, f"epoch={epoch_id}")
        if os.path.exists(epoch_out):        # replayed epoch: already done
            return
        s = batch.sparkSession
        # discovered URLs get the T3 discovery treatment: fragment strip
        # (HyperLinkParser.cs:192-194) then canonicalization — the same
        # derivation the wave loop applies to extracted links
        cand = (batch
                .withColumn("url", canon_col(
                    F.substring_index(F.col("url"), "#", 1))["url"])
                .filter(F.col("url").isNotNull())
                .withColumn("url_hash", F.xxhash64("url")))
        # in-batch first-occurrence dedup (T5 order semantics)
        w = Window.partitionBy("url_hash").orderBy("discovered_ts", "url")
        cand = (cand.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1).drop("_rn"))
        try:
            seen = s.read.parquet(seen_dir).select("url_hash").distinct()
            fresh = cand.join(F.broadcast(seen.join(
                F.broadcast(cand.select("url_hash")), "url_hash",
                "left_semi")), "url_hash", "left_anti")
        except Exception:                    # no seen data yet
            fresh = cand
        fresh = fresh.cache()
        fresh.select("url", "url_hash", "discovered_ts") \
            .write.mode("overwrite").parquet(epoch_out)
        fresh.select("url_hash") \
            .write.mode("append").parquet(seen_dir)
        fresh.unpersist()

    stream = (spark.readStream.schema(SEED_STREAM_SCHEMA)
              .parquet(input_dir))
    writer = (stream.writeStream.foreachBatch(process_batch)
              .option("checkpointLocation",
                      os.path.join(work_dir, "_checkpoint")))
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_accepted_seeds(spark: SparkSession, work_dir: str) -> list[str]:
    """Drain helper: all accepted seed URLs, discovery order."""
    accepted_dir = os.path.join(work_dir, "accepted")
    try:
        df = spark.read.option("recursiveFileLookup", "false") \
            .parquet(os.path.join(accepted_dir, "epoch=*"))
    except Exception:
        return []
    return [r["url"] for r in
            df.orderBy("discovered_ts", "url").collect()]


def page_extract_stream(spark: SparkSession, input_dir: str, out_dir: str,
                        cfg: CrawlConfig | None = None,
                        trigger_available_now: bool = True):
    """Continuous S4+T1/T3 over a stream of fetched pages: text bytes and
    outlinks, identical to the wave loop's extract stage for the same
    input rows (same pandas-UDF kernels)."""
    cfg = cfg or CrawlConfig()
    stream = (spark.readStream.schema(PAGE_STREAM_SCHEMA)
              .parquet(input_dir))
    extracted = (
        stream
        .withColumn("_ext", text_extract_col(F.col("html"),
                                             F.col("content_type")))
        .select("url",
                F.col("_ext.charset").alias("charset"),
                F.col("_ext.text").alias("text"),
                F.col("x_robots_tag"))
        .withColumn("links", links_col(cfg, F.col("text"), F.col("url"),
                                       F.col("x_robots_tag")))
        .select("url", "charset", "text",
                F.col("links.url").alias("out_urls"))
    )
    writer = (extracted.writeStream.format("parquet")
              .option("path", out_dir)
              .option("checkpointLocation",
                      os.path.join(out_dir, "_checkpoint"))
              .outputMode("append"))
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def discovery_rate_stream(spark: SparkSession, input_dir: str,
                          window_duration: str = "1 minute",
                          watermark: str = "2 minutes",
                          query_name: str = "discovery_rate",
                          available_now: bool = True,
                          max_files_per_trigger: int | None = None):
    """Watermarked per-domain discovery counts (streaming A2): events
    later than ``watermark`` behind the max seen ``discovered_ts`` are
    dropped; counts update per window.  Memory sink (update mode) for
    inspection/tests; swap the sink for a table in deployment.

    ``available_now=False`` + ``max_files_per_trigger=1`` gives ordered
    one-file micro-batches (watermark advances between them — how the
    late-drop contract is tested)."""
    reader = spark.readStream.schema(SEED_STREAM_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(input_dir)
    counts = (
        stream
        .withColumn("_c", canon_col(F.col("url")))
        .filter(F.col("_c")["url"].isNotNull())
        .withColumn("domain", F.col("_c")["domain"])
        .withWatermark("discovered_ts", watermark)
        .groupBy(F.window("discovered_ts", window_duration).alias("win"),
                 "domain")
        .agg(F.count("*").alias("n_discovered"))
        .select(F.col("win.start").alias("window_start"), "domain",
                "n_discovered")
    )
    writer = (counts.writeStream.format("memory").queryName(query_name)
              .outputMode("update"))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


DOC_STREAM_SCHEMA = "doc_id long, text string, event_ts timestamp"


def doc_dedup_stream(spark: SparkSession, input_dir: str, out_dir: str,
                     watermark: str = "10 minutes",
                     max_files_per_trigger: int | None = None):
    """Streaming exact dedup of a continuous document feed: only the
    first arrival of each content digest (md5 of the normalized text —
    the same key as ``ops.dedup.exact_dedup``) is appended to
    ``out_dir``; later copies are dropped by cross-micro-batch state via
    ``dropDuplicatesWithinWatermark``.

    This is the streaming face of the batch exact-dedup operator: a
    training-data feed ingested continuously (WARC drops, submissions)
    gets deduped *on arrival* instead of by periodic batch rewrites.
    The watermark bounds the state store exactly like the batch layer's
    seen-set compaction bounds the seen table: duplicates farther apart
    than the watermark are left for the periodic batch pass — state
    stays O(docs per watermark window), not O(corpus).

    Returns the started StreamingQuery (availableNow when
    ``max_files_per_trigger`` is None, else ordered per-file
    micro-batches so tests can drive cross-batch arrivals).
    """
    from abot_spark.ops.dedup import normalize_text

    reader = spark.readStream.schema(DOC_STREAM_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    deduped = (
        reader.parquet(input_dir)
        .withColumn("digest", F.md5(normalize_text(F.col("text"))))
        .withWatermark("event_ts", watermark)
        .dropDuplicatesWithinWatermark(["digest"])
    )
    writer = (
        deduped.writeStream.format("parquet")
        .option("path", os.path.join(out_dir, "unique"))
        .option("checkpointLocation", os.path.join(out_dir, "_chk"))
        .outputMode("append")
    )
    if max_files_per_trigger is None:
        writer = writer.trigger(availableNow=True)
    return writer.start()
