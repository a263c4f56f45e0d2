"""A/B harness for wave-job Spark configs on the scaling corpus.

Runs the single-wave job (the bench_scaling unit) in a fresh subprocess
per (label, extra-confs) variant, interleaved across reps so host-steal
noise hits every variant equally.  Reports wall + machine CPU per run.

Usage: python tools/ab_wave_configs.py [--cpus 16] [--domains 250]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, os, sys, tempfile, time
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
from abot_spark.config import CrawlConfig
from abot_spark.crawler import WaveCrawler

cpus = int(sys.argv[1]); data_dir = sys.argv[2]
extra = json.loads(sys.argv[3])
nparts = 3 * max(cpus, 4)
if extra.pop("__sp_1x__", None):
    nparts = max(cpus, 4)
shm = "/dev/shm/abot-ab-cfg"; os.makedirs(shm, exist_ok=True)
b = (SparkSession.builder.master(f"local[{{cpus}}]")
     .config("spark.sql.shuffle.partitions", str(nparts))
     .config("spark.sql.adaptive.enabled", "true")
     .config("spark.ui.enabled", "false")
     .config("spark.driver.memory", "48g")
     .config("spark.local.dir", shm))
for k, v in extra.items():
    b = b.config(k, v)
spark = b.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
pages = spark.read.parquet(f"{{data_dir}}/pages.parquet")
seeds = [r["url"] for r in pages.select("url").collect()]
cfg = CrawlConfig(is_external_page_crawling_enabled=True,
                  max_pages_to_crawl=0, shuffle_partitions=nparts,
                  audit_text=False, arrow_max_records_per_batch=4096)
crawler = WaveCrawler(spark, cfg,
                      tempfile.mkdtemp(prefix="abot-ab-", dir=shm),
                      pages, None)

def cpu_j():
    with open("/proc/stat") as fh:
        parts = fh.readline().split()
    return sum(int(x) for x in parts[1:4]) / os.sysconf("SC_CLK_TCK")

t0, c0 = time.monotonic(), cpu_j()
state = crawler.crawl(seeds, max_waves=1)
print(json.dumps({{"wave_ms": state.metrics[0]["wall_ms"],
                  "total_s": round(time.monotonic() - t0, 2),
                  "cpu_s": round(cpu_j() - c0)}}))
"""

VARIANTS = [
    ("baseline", {}),
    ("cache_uncompressed", {"spark.sql.inMemoryColumnarStorage.compressed":
                            "false"}),
    ("shuffle_uncompressed", {"spark.shuffle.compress": "false",
                              "spark.shuffle.spill.compress": "false"}),
    ("both_uncompressed", {"spark.sql.inMemoryColumnarStorage.compressed":
                           "false",
                           "spark.shuffle.compress": "false",
                           "spark.shuffle.spill.compress": "false"}),
    # G1 at 32 threads on a 48g heap may burn CPU in concurrent marking;
    # throughput-oriented ParallelGC is the classic batch alternative
    ("parallel_gc", {"spark.driver.extraJavaOptions": "-XX:+UseParallelGC"}),
    # 1x cores instead of 3x: fewer tasks, less per-task overhead (AQE
    # coalesces anyway); only overrides the SQL-shuffle side, the crawler's
    # repartition/coalesce counts stay at the CrawlConfig value
    ("sp_1x_cores", {"__sp_1x__": "1"}),
]


def run_one(cpus: int, data_dir: str, extra: dict) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", WORKER.format(repo=REPO), str(cpus),
         data_dir, json.dumps(extra)],
        capture_output=True, text=True, timeout=3600)
    for line in out.stdout.strip().splitlines()[::-1]:
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"worker failed: {out.stderr[-1500:]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=16)
    ap.add_argument("--domains", type=int, default=250)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--data-dir", default=None,
                    help="reuse an existing generated corpus dir")
    args = ap.parse_args()

    sys.path.insert(0, REPO)
    if args.data_dir:
        data_dir = args.data_dir
        n_pages = -1
    else:
        from abot_spark.sources.synthetic_web import generate_web, write_parquet
        fx = generate_web(n_domains=args.domains, sections=20, leaves=45,
                          zipf=False, with_fixtures=False, filler_kb=2,
                          filler_anchors=50)
        data_dir = tempfile.mkdtemp(prefix="abot-ab-web-")
        write_parquet(fx, data_dir)
        n_pages = len(fx.pages)
    print(f"# corpus {n_pages} pages, cpus {args.cpus}",
          file=sys.stderr)

    results = {name: [] for name, _ in VARIANTS}
    for _ in range(args.reps):
        for name, extra in VARIANTS:
            r = run_one(args.cpus, data_dir, extra)
            results[name].append(r)
            print(f"{name:22s} wave={r['wave_ms']/1000:.1f}s "
                  f"cpu={r['cpu_s']}s", file=sys.stderr, flush=True)
    best = {n: min(rs, key=lambda r: r["wave_ms"]) for n, rs in
            results.items()}
    print(json.dumps({"corpus_pages": n_pages, "best": best},
                     indent=1))


if __name__ == "__main__":
    main()
