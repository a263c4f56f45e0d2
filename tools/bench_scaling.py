"""Scaling-efficiency evidence for BASELINE.md (north_rule: throughput
scaling >= 0.8 from N to 4N executors; sandbox proxy = the same wave job
at local[N] vs local[4N] on the same input).

The measured unit is the *wave job* — fetch join + extract UDF + link UDF
+ explode + schedule algebra over the full frontier — because that is the
data-proportional work that scales with executors; the wave *loop* adds a
fixed per-wave driver cost that is wave-count-, not data-, proportional.
Both numbers are reported.

Usage: python tools/bench_scaling.py [--low 8] [--high 32]
Writes JSON to stdout; paste the table into BENCH.md.
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
os.environ.setdefault("PYSPARK_PYTHON", sys.executable)


def probe_host(n_procs=None, secs=1.5):
    # busy-loop throughput probe: the sandbox shares its host and runs at
    # visibly different effective speeds minute to minute (hypervisor
    # steal / frequency).  Bracketing each measured wave with this probe
    # lets the report show WHICH reps ran on a degraded host.
    import multiprocessing as mp

    def burn(q, secs):
        t0 = time.perf_counter(); n = 0
        while time.perf_counter() - t0 < secs:
            for _ in range(10000):
                n += 1
        q.put(n)

    k = n_procs or os.cpu_count()
    q = mp.Queue()
    ps = [mp.Process(target=burn, args=(q, secs)) for _ in range(k)]
    [p.start() for p in ps]
    tot = sum(q.get() for _ in ps)
    [p.join() for p in ps]
    return tot / secs


probe_before = probe_host()
from pyspark.sql import SparkSession
from abot_spark.config import CrawlConfig
from abot_spark.crawler import WaveCrawler

cpus = int(sys.argv[1])
data_dir = sys.argv[2]
shm = "/dev/shm/abot-spark-scale"
os.makedirs(shm, exist_ok=True)
spark = (SparkSession.builder.master(f"local[{{cpus}}]")
         .config("spark.sql.shuffle.partitions", str(3 * max(cpus, 4)))
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.ui.enabled", "false")
         .config("spark.driver.memory", "48g")
         # shuffle/spill on tmpfs: a real 4N-executor cluster multiplies
         # local scratch disks with the executors; local[4N] on one shared
         # rootfs disk does not.  tmpfs models per-executor scratch so the
         # N->4N comparison measures the PLAN's scalability, not the
         # sandbox's single disk (documented in BENCH.md).
         .config("spark.local.dir", shm)
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
pages = spark.read.parquet(f"{{data_dir}}/pages.parquet")
seeds = [r["url"] for r in pages.select("url").collect()]
cfg = CrawlConfig(is_external_page_crawling_enabled=True,
                  max_pages_to_crawl=0, shuffle_partitions=3 * max(cpus, 4),
                  audit_text=False,
                  # ~4 KB synthetic pages: larger Arrow batches amortize
                  # the per-batch python/Arrow overhead (batch ~= 16 MB)
                  arrow_max_records_per_batch=4096)
# checkpoint store on tmpfs for the same reason as spark.local.dir: the
# store is HDFS/S3/Iceberg on a real cluster (bandwidth scales with
# executors); the sandbox's single rootfs disk does not.
crawler = WaveCrawler(spark, cfg,
                      tempfile.mkdtemp(prefix=f"abot-scale-{{cpus}}-",
                                       dir=shm),
                      pages, None)
t0 = time.monotonic()
state = crawler.crawl(seeds, max_waves=1)   # one full wave over all pages
total = time.monotonic() - t0
m = state.metrics[0]
spark.stop()
probe_after = probe_host()
print(json.dumps({{"cpus": cpus, "pages": m["due"],
                  "wave_ms": m["wall_ms"], "total_s": round(total, 2),
                  "probe_before": probe_before,
                  "probe_after": probe_after}}))
"""


def run_one(cpus: int, data_dir: str) -> dict:
    script = WORKER.format(repo=REPO)
    out = subprocess.run(
        [sys.executable, "-c", script, str(cpus), data_dir],
        capture_output=True, text=True, timeout=3600)
    for line in out.stdout.strip().splitlines()[::-1]:
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"worker failed: {out.stderr[-2000:]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--low", type=int, default=8)
    ap.add_argument("--high", type=int, default=32)
    ap.add_argument("--out", default=None,
                    help="also write the result JSON here (e.g. "
                         "SCALING.json at the repo root, which bench.py "
                         "embeds in its per-round JSON line)")
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
    data_dir = tempfile.mkdtemp(prefix="abot-scale-web-")
    write_parquet(fx, data_dir)
    n = len(fx.pages)
    print(f"# corpus: {n} pages, filler {args.filler_kb} KB/page",
          file=sys.stderr)

    # the sandbox shares its host: CPU steal varies run to run, so
    # interleave repetitions and take the best (least-stolen) per level
    reps = int(os.environ.get("SCALE_REPS", "2"))
    lows, highs = [], []
    for _ in range(reps):
        lows.append(run_one(args.low, data_dir))
        highs.append(run_one(args.high, data_dir))
    lo = min(lows, key=lambda r: r["wave_ms"])
    hi = min(highs, key=lambda r: r["wave_ms"])
    tput_lo = lo["pages"] / (lo["wave_ms"] / 1000)
    tput_hi = hi["pages"] / (hi["wave_ms"] / 1000)
    ratio = args.high / args.low
    eff = tput_hi / (ratio * tput_lo)

    # host-speed bracket: min of the before/after busy-probes, as a share
    # of the fastest probe seen across the whole experiment (1.0 = host at
    # full speed; lower = steal/throttle during that rep)
    best_probe = max(min(r["probe_before"], r["probe_after"])
                     for r in lows + highs)
    for r in lows + highs:
        r["host_speed"] = round(
            min(r["probe_before"], r["probe_after"]) / best_probe, 3)
    result = {
        "corpus_pages": n,
        "reps": {"low": [{"wave_ms": r["wave_ms"],
                          "host_speed": r["host_speed"]} for r in lows],
                 "high": [{"wave_ms": r["wave_ms"],
                           "host_speed": r["host_speed"]} for r in highs]},
        "low": {**{k: v for k, v in lo.items()
                   if not k.startswith("probe")},
                "pages_per_sec": round(tput_lo, 1)},
        "high": {**{k: v for k, v in hi.items()
                    if not k.startswith("probe")},
                 "pages_per_sec": round(tput_hi, 1)},
        "speedup": round(tput_hi / tput_lo, 2),
        "scaling_efficiency": round(eff, 3),
        "loadavg_at_end": round(os.getloadavg()[0], 2),
    }
    print(json.dumps(result, indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
