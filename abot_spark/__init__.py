"""abot_spark — a PySpark-native re-implementation of the Abot crawl engine.

A from-scratch rebuild of the crawl semantics of ``WorkHardForever/abot``
(C#, /root/reference) on Spark DataFrames:

- BFS URL frontier materialized as a partitioned table with a deterministic
  ``(wave, seq)`` total order (FIFO parity with Abot's scheduler).
- Distributed URL-seen set keyed by ``xxhash64(canonical_url)`` with a
  broadcast Bloom-filter fast path + exact LEFT ANTI JOIN.
- Decision pipeline (ShouldCrawlPage / ShouldCrawlPageLinks /
  ShouldDownloadPageContent / ShouldRecrawlPage) as Column expressions with
  the reference's exact reason strings.
- Link + text extraction as vectorized Arrow pandas UDFs (no per-row Python).
- Per-domain politeness (robots.txt Crawl-delay, min-crawl-delay) as
  deterministic per-wave quotas + in-partition pacing.

Each crawl wave is one Spark job; the crawl is resumable from a checkpointed
wave manifest.
"""

__version__ = "0.1.0"

from abot_spark.config import CrawlConfig  # noqa: F401
