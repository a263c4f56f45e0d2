"""spark-submit job entry for the wave crawler (north_rule deployment
shape: ``spark-submit --py-files abot_spark.zip tools/submit_crawl.py``).

The script imports ``abot_spark`` from whatever ``--py-files`` shipped —
it deliberately does NOT insert the repo onto ``sys.path`` — and runs a
crawl to completion, printing one JSON line of final state.  On a real
cluster the same invocation runs against ``--master yarn``/``k8s`` with
the Iceberg catalog configured; nothing in the job body changes.

Usage (local sandbox proxy for an N-executor run):

    /opt/spark/bin/spark-submit --master local[N] \
        --conf spark.sql.shuffle.partitions=N \
        --py-files /path/abot_spark.zip tools/submit_crawl.py \
        --pages /data/pages.parquet [--robots /data/robots.parquet] \
        --work-dir /data/crawl --seed http://d0.example.com/ \
        [--max-waves 1000] [--resume]
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", required=True)
    ap.add_argument("--robots", default=None)
    ap.add_argument("--work-dir", required=True)
    ap.add_argument("--seed", action="append", default=[])
    ap.add_argument("--max-waves", type=int, default=1000)
    ap.add_argument("--max-pages", type=int, default=0)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--audit-text", action="store_true")
    ap.add_argument("--external", action="store_true",
                    help="crawl across domains (IsExternalPageCrawlingEnabled)")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from abot_spark.config import CrawlConfig
    from abot_spark.crawler import WaveCrawler

    spark = SparkSession.builder.appName("abot-spark-crawl").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    cfg = CrawlConfig(
        is_respect_robots_dot_text_enabled=args.robots is not None,
        is_external_page_crawling_enabled=args.external,
        is_external_page_links_crawling_enabled=args.external,
        max_pages_to_crawl=args.max_pages,
        audit_text=args.audit_text,
    )
    pages = spark.read.parquet(args.pages)
    robots = spark.read.parquet(args.robots) if args.robots else None
    crawler = WaveCrawler(spark, cfg, args.work_dir, pages, robots)
    if args.resume:
        state = crawler.resume(max_waves=args.max_waves)
    else:
        state = crawler.crawl(args.seed, max_waves=args.max_waves)
    print(json.dumps({
        "wave": state.wave,
        "crawled_count": state.crawled_count,
        "retried_count": state.retried_count,
        "next_seq": state.next_seq,
        "latched": state.latched,
        "stop_requested": state.stop_requested,
        "sim_clock_ms": state.sim_clock_ms,
        "metrics": state.metrics,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
