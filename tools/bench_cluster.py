"""North-rule scaling evidence on a REAL multi-executor Spark cluster.

``bench_scaling.py`` measures ``local[N]`` vs ``local[4N]`` (thread
parallelism in one JVM).  This harness runs the same single-wave job on a
standalone Spark cluster via ``spark-submit --py-files abot_spark.zip``
— separate executor JVMs with their own python workers, block managers,
and shuffle clients — at two cluster sizes: N executors and 4N executors
(fixed cores per executor).  That is the north_rule's deployment shape
verbatim; the sandbox constraint is only that all executors share one
host's silicon.

Usage:
    python tools/bench_cluster.py [--execs-low 1] [--execs-high 4]
        [--exec-cores 2] [--corpus DIR]

Starts a master + one worker sized to hold the high configuration if none
are running (SPARK_HOME=/opt/spark), generates the corpus if --corpus is
not given, submits the job at both sizes, prints the JSON evidence line.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_HOME = os.environ.get("SPARK_HOME", "/opt/spark")
MASTER = "spark://127.0.0.1:7077"
SHM = "/dev/shm/abot-spark-scale"

JOB = r"""
import json, os, sys, tempfile, time
from pyspark.sql import SparkSession
from abot_spark.config import CrawlConfig
from abot_spark.crawler import WaveCrawler

data_dir, total_cores = sys.argv[1], int(sys.argv[2])
nparts = 3 * total_cores
spark = SparkSession.builder.appName("abot-bench-cluster").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
pages = spark.read.parquet(f"{data_dir}/pages.parquet")
seeds = [r["url"] for r in pages.select("url").collect()]
cfg = CrawlConfig(is_external_page_crawling_enabled=True,
                  max_pages_to_crawl=0, shuffle_partitions=nparts,
                  audit_text=False, arrow_max_records_per_batch=4096)
work = tempfile.mkdtemp(prefix="abot-cluster-wave-", dir="/dev/shm/abot-spark-scale")
crawler = WaveCrawler(spark, cfg, work, pages, None)
t0 = time.monotonic()
state = crawler.crawl(seeds, max_waves=1)
total = time.monotonic() - t0
m = state.metrics[0]
print("RESULT " + json.dumps({"pages": m["due"], "wave_ms": m["wall_ms"],
                              "total_s": round(total, 2)}))
spark.stop()
"""


def ensure_cluster(total_cores: int, mem_gb: int) -> None:
    """Start master + one worker if nothing is listening on 7077."""
    import socket

    s = socket.socket()
    try:
        s.settimeout(1)
        s.connect(("127.0.0.1", 7077))
        s.close()
        return
    except OSError:
        pass
    env = {**os.environ, "SPARK_HOME": SPARK_HOME,
           "SPARK_LOG_DIR": "/tmp/spark-logs",
           "SPARK_MASTER_HOST": "127.0.0.1",
           "SPARK_WORKER_DIR": os.path.join(SHM, "worker")}
    subprocess.run([f"{SPARK_HOME}/sbin/start-master.sh", "--host",
                    "127.0.0.1", "--port", "7077", "--webui-port", "8091"],
                   env=env, check=True, stdout=sys.stderr)
    time.sleep(4)
    subprocess.run([f"{SPARK_HOME}/sbin/start-worker.sh", MASTER,
                    "--cores", str(total_cores), "--memory", f"{mem_gb}g",
                    "--webui-port", "8092"], env=env, check=True,
                   stdout=sys.stderr)
    time.sleep(4)


def build_zip() -> str:
    zpath = os.path.join(tempfile.mkdtemp(prefix="abot-zip-"),
                         "abot_spark.zip")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        pkg = os.path.join(REPO, "abot_spark")
        for root, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    return zpath

def run_submit(zpath: str, job_path: str, data_dir: str, execs: int,
               exec_cores: int) -> dict:
    total = execs * exec_cores
    cmd = [
        f"{SPARK_HOME}/bin/spark-submit",
        "--master", MASTER,
        "--deploy-mode", "client",
        "--py-files", zpath,
        "--conf", f"spark.executor.cores={exec_cores}",
        "--conf", "spark.executor.memory=8g",
        "--conf", f"spark.cores.max={total}",
        # one shared host: locality waits only serialize the tiny cluster's
        # scheduling (every block is loopback-remote at worst)
        "--conf", "spark.locality.wait=0",
        "--conf", f"spark.sql.shuffle.partitions={3 * total}",
        "--conf", "spark.sql.adaptive.enabled=true",
        "--conf", "spark.driver.memory=8g",
        "--conf", f"spark.local.dir={SHM}",
        "--conf", f"spark.pyspark.python={sys.executable}",
        "--conf", "spark.ui.enabled=false",
        job_path, data_dir, str(total),
    ]
    env = {**os.environ, "SPARK_HOME": SPARK_HOME}
    env.pop("PYTHONPATH", None)   # the job must import from --py-files only
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=3600,
                         env=env)
    for line in out.stdout.strip().splitlines()[::-1]:
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"submit failed:\n{out.stderr[-3000:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--execs-low", type=int, default=1)
    ap.add_argument("--execs-high", type=int, default=4)
    ap.add_argument("--exec-cores", type=int, default=2)
    ap.add_argument("--corpus", default=None)
    ap.add_argument("--reps", type=int,
                    default=int(os.environ.get("SCALE_REPS", "2")))
    ap.add_argument("--domains", type=int, default=120)
    ap.add_argument("--sections", type=int, default=15)
    ap.add_argument("--leaves", type=int, default=40)
    args = ap.parse_args()

    os.makedirs(SHM, exist_ok=True)
    data_dir = args.corpus
    if data_dir is None:
        sys.path.insert(0, REPO)
        from abot_spark.sources.synthetic_web import (
            generate_web, write_parquet)
        fx = generate_web(n_domains=args.domains, sections=args.sections,
                          leaves=args.leaves, zipf=False,
                          with_fixtures=False, filler_kb=2,
                          filler_anchors=50)
        data_dir = tempfile.mkdtemp(prefix="abot-cluster-web-")
        write_parquet(fx, data_dir)
        print(f"# corpus: {len(fx.pages)} pages", file=sys.stderr)

    ensure_cluster(args.execs_high * args.exec_cores, mem_gb=40)
    zpath = build_zip()
    jd = tempfile.mkdtemp(prefix="abot-clusterjob-")
    job_path = os.path.join(jd, "cluster_wave_job.py")
    with open(job_path, "w") as f:
        f.write(JOB)

    lows, highs = [], []
    for _ in range(args.reps):
        lows.append(run_submit(zpath, job_path, data_dir,
                               args.execs_low, args.exec_cores))
        highs.append(run_submit(zpath, job_path, data_dir,
                                args.execs_high, args.exec_cores))
    lo = min(lows, key=lambda r: r["wave_ms"])
    hi = min(highs, key=lambda r: r["wave_ms"])
    tput_lo = lo["pages"] / (lo["wave_ms"] / 1000)
    tput_hi = hi["pages"] / (hi["wave_ms"] / 1000)
    ratio = args.execs_high / args.execs_low
    print(json.dumps({
        "mode": "standalone-cluster spark-submit --py-files",
        "executors": {"low": args.execs_low, "high": args.execs_high,
                      "cores_each": args.exec_cores},
        "reps_wave_ms": {"low": [r["wave_ms"] for r in lows],
                         "high": [r["wave_ms"] for r in highs]},
        "low": {**lo, "pages_per_sec": round(tput_lo, 1)},
        "high": {**hi, "pages_per_sec": round(tput_hi, 1)},
        "speedup": round(tput_hi / tput_lo, 2),
        "scaling_efficiency": round(tput_hi / (ratio * tput_lo), 3),
    }, indent=1))
    shutil.rmtree(os.path.dirname(zpath), ignore_errors=True)


if __name__ == "__main__":
    main()
