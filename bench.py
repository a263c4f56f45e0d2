"""Per-round benchmark: crawl throughput + headline pipeline queries.

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ...,
   "crawl": {"pages": N, "sec": s, "pages_per_sec": r}}

Env:
  SPARK_GRAFT_SF_DIR  (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS    (default 32)
  BENCH_CRAWL_DOMAINS / BENCH_CRAWL_SECTIONS / BENCH_CRAWL_LEAVES to size
  the synthetic crawl corpus (defaults target a ~60-90 s total run).

Scaling-efficiency evidence (N vs 4N cores, north_rule) is produced by
``tools/bench_scaling.py`` and recorded in ``BENCH.md``/``BASELINE.md`` —
this script is the single-configuration per-round probe.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def build_spark(cpus: int):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("abot-spark-bench")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )


def bench_crawl(spark, cpus: int) -> dict:
    """Pages fetched+extracted per second on a Zipf-skewed synthetic web."""
    from abot_spark.config import CrawlConfig
    from abot_spark.crawler import WaveCrawler
    from abot_spark.sources.synthetic_web import generate_web, write_parquet

    n_domains = int(os.environ.get("BENCH_CRAWL_DOMAINS", "80"))
    sections = int(os.environ.get("BENCH_CRAWL_SECTIONS", "10"))
    leaves = int(os.environ.get("BENCH_CRAWL_LEAVES", "14"))

    fx = generate_web(n_domains=n_domains, sections=sections, leaves=leaves,
                      zipf=True, with_fixtures=False)
    data_dir = tempfile.mkdtemp(prefix="abot-bench-web-")
    paths = write_parquet(fx, data_dir)
    pages = spark.read.parquet(paths["pages"])
    n_corpus = pages.count()

    cfg = CrawlConfig(
        is_external_page_crawling_enabled=True,  # crawl across all domains
        max_pages_to_crawl=0,                    # unbounded: crawl the corpus
        shuffle_partitions=max(cpus, 8),
        audit_text=False,                        # digest-only audit (scale mode)
    )
    def run(run_cfg):
        crawler = WaveCrawler(
            spark, run_cfg, tempfile.mkdtemp(prefix="abot-bench-crawl-"),
            pages, None)
        t0 = time.monotonic()
        state = crawler.crawl([f"http://d{i}.example.com/"
                               for i in range(n_domains)], max_waves=12)
        sec = time.monotonic() - t0
        fetched = crawler.store.read_all("fetched", state.wave)
        n = fetched.count() if fetched is not None else 0
        return {
            "pages": n,
            "waves": state.wave + 1,
            "sec": round(sec, 2),
            "pages_per_sec": round(n / sec, 1) if sec > 0 else 0.0,
        }

    # untimed warmup mini-crawl: the first crawl in a fresh JVM pays
    # one-time JIT/codegen/allocator costs (~2x wall measured on this
    # box) that say nothing about the engine — standard steady-state
    # benchmarking; the timed crawl below still includes every per-wave
    # driver action, checkpoint and write
    warm_fx = generate_web(n_domains=4, sections=3, leaves=3,
                           zipf=False, with_fixtures=False)
    warm_dir = tempfile.mkdtemp(prefix="abot-bench-warm-")
    warm_paths = write_parquet(warm_fx, warm_dir)
    WaveCrawler(spark, cfg, tempfile.mkdtemp(prefix="abot-bench-warmc-"),
                spark.read.parquet(warm_paths["pages"]), None) \
        .crawl([f"http://d{i}.example.com/" for i in range(4)], max_waves=4)
    # one untimed rep at the REAL corpus: C2 JIT of the wave's hot loops
    # keeps compiling through the first full-size crawl (measured: rep 0
    # runs ~15-20% above the plateau the engine then holds) — the timed
    # rep below is the steady state a long-running production crawl lives
    # in, and still pays every per-wave driver action, checkpoint and write
    run(cfg)

    out = {"corpus_pages": n_corpus, **run(cfg)}
    # the 10^10-seen-set fast path, forced live from wave 0: sharded
    # bloom sidecar probe + per-wave shard absorbs + the forked cached
    # plan.  At this corpus size the LINEAR plan is optimal (the sidecar
    # engages at seen_bloom_min_rows in production), so this lane prices
    # the sidecar plumbing end-to-end rather than showing a speedup.
    out["bloom_forced"] = run(cfg.with_(
        use_seen_bloom=True, seen_bloom_min_rows=0))
    return out


#: None = every ``queries()`` entry gets a trend line (VERDICT r2 #8);
#: set to a list of names to restrict a quick local run.
HEADLINE = None


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    spark = build_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    total0 = time.monotonic()
    crawl = bench_crawl(spark, cpus)

    qs = entrymod.queries()
    timings: dict[str, float] = {}
    for name in (HEADLINE or qs):
        fn = qs[name]
        # best of two runs, uniformly for every query: the first execution
        # of a plan shape in a fresh JVM pays one-time janino/JIT
        # compilation (seconds for codegen-wide plans) that a long-running
        # engine amortizes to zero; the second run is the steady state.
        best = None
        for _ in range(2):
            t0 = time.monotonic()
            fn(spark, sf_dir).count()
            dt = time.monotonic() - t0
            best = dt if best is None or dt < best else best
        timings[name] = round(best, 3)
    timings["crawl_wave_loop"] = crawl["sec"]
    total = round(time.monotonic() - total0, 2)

    out = {
        "metric": ("pages fetched+extracted/sec (synthetic Zipf web, "
                   "wave loop) + headline operator suite"),
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cpus": cpus,
        "crawl": crawl,
    }
    # N -> 4N scaling-efficiency evidence (north_rule): recorded by
    # ``tools/bench_scaling.py --out SCALING.json`` (a separate ~20-min
    # run of the single-wave job at local[N] vs local[4N]); embedded here
    # so the per-round JSON line is self-contained.
    repo = os.path.dirname(os.path.abspath(__file__))
    scaling_path = os.path.join(repo, "SCALING.json")
    if os.path.exists(scaling_path):
        with open(scaling_path) as f:
            out["scaling"] = json.load(f)
    # supplementary levels (headline fields only; raw reps stay in the
    # JSON files — BENCH.md explains why 4->16 on one host flattens):
    # the gated 4 vs 16 quota pair and the real multi-JVM spark-submit
    # cluster pair (1 vs 4 executors)
    for key, fname in (("scaling_4_16", "SCALING_4_16.json"),
                       ("scaling_cluster", "SCALING_CLUSTER.json")):
        p = os.path.join(repo, fname)
        if os.path.exists(p):
            with open(p) as f:
                d = json.load(f)
            out[key] = {k: d[k] for k in
                        ("low", "high", "speedup", "scaling_efficiency")
                        if k in d}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
