"""Per-stage wave profile at one or more parallelism levels.

Runs the same single-wave job as tools/bench_scaling.py but with
``ABOT_WAVE_TIMING=1``, printing each stage's wall + machine CPU seconds
at every level — the tool for finding which stage stops scaling between
local[N] and local[4N] (Amdahl's serial fraction is per-stage visible).

Usage: python tools/profile_wave.py [--cpus 2,8] [--domains 250]
       [--sections 20] [--leaves 45] [--filler-kb 2] [--filler-anchors 50]
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, os, sys, tempfile, time
if len(sys.argv) > 4 and sys.argv[4]:
    with open(sys.argv[4] + "/cgroup.procs", "a") as _f:
        _f.write(str(os.getpid()))   # CFS-quota cap (see bench_scaling.py)
sys.path.insert(0, {repo!r})
os.environ.setdefault("PYSPARK_PYTHON", sys.executable)
os.environ["ABOT_WAVE_TIMING"] = "1"

from pyspark.sql import SparkSession
from abot_spark.config import CrawlConfig
from abot_spark.crawler import WaveCrawler

cpus = int(sys.argv[1])
nparts = int(sys.argv[2])
data_dir = sys.argv[3]
shm = "/dev/shm/abot-spark-prof"
os.makedirs(shm, exist_ok=True)
spark = (SparkSession.builder.master(f"local[{{cpus}}]")
         .config("spark.sql.shuffle.partitions", str(nparts))
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.ui.enabled", "false")
         .config("spark.driver.memory", "48g")
         .config("spark.local.dir", shm)
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
pages = spark.read.parquet(f"{{data_dir}}/pages.parquet")
seeds = [r["url"] for r in pages.select("url").collect()]
cfg = CrawlConfig(is_external_page_crawling_enabled=True,
                  max_pages_to_crawl=0, shuffle_partitions=nparts,
                  audit_text=False,
                  arrow_max_records_per_batch=4096)
crawler = WaveCrawler(spark, cfg,
                      tempfile.mkdtemp(prefix=f"abot-prof-{{cpus}}-",
                                       dir=shm),
                      pages, None)
t0 = time.monotonic()
state = crawler.crawl(seeds, max_waves=1)
total = time.monotonic() - t0
m = state.metrics[0]
spark.stop()
print(json.dumps({{"cpus": cpus, "pages": m["due"],
                  "wave_ms": m["wall_ms"], "total_s": round(total, 2)}}))
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", default="2,8")
    ap.add_argument("--nparts", type=int, default=24)
    ap.add_argument("--domains", type=int, default=250)
    ap.add_argument("--sections", type=int, default=20)
    ap.add_argument("--leaves", type=int, default=45)
    ap.add_argument("--filler-kb", type=int, default=2)
    ap.add_argument("--filler-anchors", type=int, default=50)
    args = ap.parse_args()

    sys.path.insert(0, REPO)
    from abot_spark.sources.synthetic_web import generate_web, write_parquet

    fx = generate_web(n_domains=args.domains, sections=args.sections,
                      leaves=args.leaves, zipf=False, with_fixtures=False,
                      filler_kb=args.filler_kb,
                      filler_anchors=args.filler_anchors)
    data_dir = tempfile.mkdtemp(prefix="abot-prof-web-")
    write_parquet(fx, data_dir)
    print(f"# corpus: {len(fx.pages)} pages, nparts={args.nparts}",
          file=sys.stderr)

    script = WORKER.format(repo=REPO)
    for cpus in [int(c) for c in args.cpus.split(",")]:
        print(f"\n=== local[{cpus}] ===", flush=True)
        sys.path.insert(0, os.path.join(REPO, "tools"))
        from bench_scaling import _cpu_cgroup
        try:
            cg = _cpu_cgroup(cpus)
        except OSError:
            cg = ""
        out = subprocess.run(
            [sys.executable, "-c", script, str(cpus), str(args.nparts),
             data_dir, cg],
            capture_output=True, text=True, timeout=3600)
        for line in out.stdout.strip().splitlines():
            if line.startswith(("WAVETIME", "{")):
                print(line, flush=True)
        if out.returncode != 0:
            print(out.stderr[-2000:], file=sys.stderr)


if __name__ == "__main__":
    main()
