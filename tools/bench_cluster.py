"""North-rule scaling evidence on a REAL multi-executor Spark cluster.

``bench_scaling.py`` measures ``local[N]`` vs ``local[4N]`` (thread
parallelism in one JVM).  This harness runs the same single-wave job on a
standalone Spark cluster via ``spark-submit --py-files abot_spark.zip``
— separate executor JVMs with their own python workers, block managers,
and shuffle clients — at two cluster sizes: N executors and 4N executors
(fixed cores per executor).  That is the north_rule's deployment shape
verbatim; the sandbox constraint is only that all executors share one
host's silicon.

Methodology = the same three controls that took the single-JVM pair from
0.60 to 0.83 (see bench_scaling.py's module docstring for the full
rationale, measured on this host):

* **CFS-quota cgroup around the WORKER tree.** The worker process (and
  therefore every executor JVM and python UDF worker it spawns) joins a
  cgroup capped at ``execs * exec_cores`` cores of CPU time — exactly how
  YARN/K8s bound a real N-core container.  Without it the low level's
  GC/compiler/python threads spill onto free host cores and the
  comparison understates scaling.  The worker is restarted per level so
  each level's whole tree sits inside its own quota.  The driver
  (spark-submit, client mode) stays OUTSIDE the quota — on a real cluster
  it has its own node.
* **Identical plan at both levels.** ``spark.sql.shuffle.partitions`` and
  the engine partition count are pinned to ``3 * high_total_cores`` for
  BOTH levels; only the executor count varies.
* **Host-health gating + interleaved reps, best per level, merged across
  runs.** This sandbox's effective core count swings 25-65% run to run
  (hypervisor steal); each rep is bracketed by busy-probes that run
  outside the quota, gated on a minimum effective-core reading, and
  accumulated into SCALING_CLUSTER.json keeping the least-stolen rep per
  level.

Usage:
    python tools/bench_cluster.py [--execs-low 1] [--execs-high 4]
        [--exec-cores 2] [--corpus DIR] [--gate 20] [--out SCALING_CLUSTER.json]
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
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from bench_scaling import _cpu_cgroup, host_effective_cores  # noqa: E402

SPARK_HOME = os.environ.get("SPARK_HOME", "/opt/spark")
MASTER = "spark://127.0.0.1:7077"
SHM = "/dev/shm/abot-spark-scale"

JOB = r"""
import json, multiprocessing as mp, os, sys, tempfile, time


def probe_host(secs=1.5):
    # driver-side busy probe: runs OUTSIDE the worker cgroup (the driver
    # is not quota'd), so it measures the HOST, not our own cap
    def burn(q, secs):
        t0 = time.perf_counter(); n = 0
        while time.perf_counter() - t0 < secs:
            for _ in range(10000):
                n += 1
        q.put(n)

    k = os.cpu_count()
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

data_dir, nparts = sys.argv[1], int(sys.argv[2])
spark = SparkSession.builder.appName("abot-bench-cluster").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
pages = spark.read.parquet(f"{data_dir}/pages.parquet")
seeds = [r["url"] for r in pages.select("url").collect()]
cfg = CrawlConfig(is_external_page_crawling_enabled=True,
                  max_pages_to_crawl=0, shuffle_partitions=nparts,
                  audit_text=False, arrow_max_records_per_batch=4096)
work = tempfile.mkdtemp(prefix="abot-cluster-wave-",
                        dir="/dev/shm/abot-spark-scale")
crawler = WaveCrawler(spark, cfg, work, pages, None)
t0 = time.monotonic()
state = crawler.crawl(seeds, max_waves=1)
total = time.monotonic() - t0
m = state.metrics[0]
spark.stop()
probe_after = probe_host()
print("RESULT " + json.dumps({"pages": m["due"], "wave_ms": m["wall_ms"],
                              "total_s": round(total, 2),
                              "probe_before": probe_before,
                              "probe_after": probe_after}))
"""


def _daemon_env() -> dict:
    return {**os.environ, "SPARK_HOME": SPARK_HOME,
            "SPARK_LOG_DIR": "/tmp/spark-logs",
            "SPARK_MASTER_HOST": "127.0.0.1",
            "SPARK_LOCAL_DIRS": SHM,
            "SPARK_WORKER_DIR": os.path.join(SHM, "worker")}


def ensure_master() -> None:
    import socket

    s = socket.socket()
    try:
        s.settimeout(1)
        s.connect(("127.0.0.1", 7077))
        s.close()
        return
    except OSError:
        pass
    subprocess.run([f"{SPARK_HOME}/sbin/start-master.sh", "--host",
                    "127.0.0.1", "--port", "7077", "--webui-port", "8091"],
                   env=_daemon_env(), check=True, stdout=sys.stderr)
    time.sleep(4)


def start_worker(cores: int, mem_gb: int, cgroup: str) -> subprocess.Popen:
    """Foreground worker whose whole tree (worker JVM -> executor JVMs ->
    python UDF workers) lives inside the level's CFS-quota cgroup."""

    def _join():
        if cgroup:
            with open(cgroup + "/cgroup.procs", "a") as f:
                f.write(str(os.getpid()))

    proc = subprocess.Popen(
        [f"{SPARK_HOME}/bin/spark-class",
         "org.apache.spark.deploy.worker.Worker", MASTER,
         "--cores", str(cores), "--memory", f"{mem_gb}g",
         "--webui-port", "8092"],
        env=_daemon_env(), preexec_fn=_join,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    time.sleep(6)  # registration with the master
    return proc


def stop_worker(proc: subprocess.Popen) -> None:
    proc.terminate()
    try:
        proc.wait(timeout=20)
    except subprocess.TimeoutExpired:
        proc.kill()
        proc.wait(timeout=20)
    # belt and braces: no executor JVM may leak into the next level
    subprocess.run(["pkill", "-f", "CoarseGrainedExecutorBackend"],
                   check=False)
    time.sleep(2)


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
               exec_cores: int, nparts: int) -> dict:
    total = execs * exec_cores
    cmd = [
        f"{SPARK_HOME}/bin/spark-submit",
        "--master", MASTER,
        "--deploy-mode", "client",
        "--py-files", zpath,
        "--conf", f"spark.executor.cores={exec_cores}",
        "--conf", "spark.executor.memory=8g",
        "--conf", f"spark.cores.max={total}",
        # Deployment-faithful JVM sizing: on YARN/K8s each executor gets its
        # own container and sizes GC/JIT/Netty pools to its own cores.  Here
        # all executors share one host cgroup, so each JVM would read the
        # WHOLE level quota (execs*cores) and oversubscribe it execs-fold.
        "--conf", ("spark.executor.extraJavaOptions="
                   f"-XX:ActiveProcessorCount={exec_cores}"),
        # one shared host: locality waits only serialize the tiny cluster's
        # scheduling (every block is loopback-remote at worst)
        "--conf", "spark.locality.wait=0",
        # IDENTICAL plan at both levels: partitioning pinned by the caller
        "--conf", f"spark.sql.shuffle.partitions={nparts}",
        "--conf", "spark.sql.adaptive.enabled=true",
        "--conf", "spark.driver.memory=8g",
        "--conf", f"spark.local.dir={SHM}",
        "--conf", f"spark.pyspark.python={sys.executable}",
        "--conf", "spark.ui.enabled=false",
        job_path, data_dir, str(nparts),
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
    ap.add_argument("--gate", type=float, default=0.0,
                    help="minimum host effective-cores before each rep; "
                         "0 disables")
    ap.add_argument("--gate-wait-s", type=int, default=900)
    ap.add_argument("--out", default=None,
                    help="merge-accumulate the evidence JSON here "
                         "(best rep per level wins)")
    ap.add_argument("--domains", type=int, default=120)
    ap.add_argument("--sections", type=int, default=15)
    ap.add_argument("--leaves", type=int, default=40)
    args = ap.parse_args()

    os.makedirs(SHM, exist_ok=True)
    data_dir = args.corpus
    n_pages = None
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
        n_pages = len(fx.pages)
        print(f"# corpus: {n_pages} pages", file=sys.stderr)

    cores_low = args.execs_low * args.exec_cores
    cores_high = args.execs_high * args.exec_cores
    nparts = 3 * cores_high
    ensure_master()
    zpath = build_zip()
    jd = tempfile.mkdtemp(prefix="abot-clusterjob-")
    job_path = os.path.join(jd, "cluster_wave_job.py")
    with open(job_path, "w") as f:
        f.write(JOB)

    def wait_for_host() -> tuple[float, bool]:
        if args.gate <= 0:
            return (0.0, True)
        t0 = time.monotonic()
        while True:
            eff = host_effective_cores()
            if eff >= args.gate:
                return (eff, True)
            if time.monotonic() - t0 > args.gate_wait_s:
                return (eff, False)
            print(f"# host degraded ({eff} effective cores < {args.gate}); "
                  f"waiting", file=sys.stderr)
            time.sleep(60)

    def one_rep(execs: int, cores: int) -> dict:
        eff, ok = wait_for_host()
        try:
            cg = _cpu_cgroup(cores)
        except OSError:
            cg = ""
        worker = start_worker(cores, mem_gb=40, cgroup=cg)
        try:
            r = run_submit(zpath, job_path, data_dir, execs,
                           args.exec_cores, nparts)
        finally:
            stop_worker(worker)
        r["gate_effective_cores"], r["gated"] = eff, ok
        r["cgroup_cores"] = cores if cg else None
        return r

    lows, highs = [], []
    for _ in range(args.reps):
        lows.append(one_rep(args.execs_low, cores_low))
        highs.append(one_rep(args.execs_high, cores_high))

    # accumulate with a previous run of the same experiment
    if args.out and os.path.exists(args.out):
        try:
            with open(args.out) as f:
                prev = json.load(f)
            same = (prev.get("executors", {}).get("low") == args.execs_low
                    and prev.get("executors", {}).get("high") == args.execs_high
                    and prev.get("executors", {}).get("cores_each")
                    == args.exec_cores
                    and prev.get("nparts") == nparts
                    and prev.get("low", {}).get("pages")
                    == lows[0]["pages"])
            if same:
                lows.extend(prev.get("all_reps", {}).get("low", []))
                highs.extend(prev.get("all_reps", {}).get("high", []))
        except (json.JSONDecodeError, KeyError, IndexError):
            pass

    lo = min(lows, key=lambda r: r["wave_ms"])
    hi = min(highs, key=lambda r: r["wave_ms"])
    tput_lo = lo["pages"] / (lo["wave_ms"] / 1000)
    tput_hi = hi["pages"] / (hi["wave_ms"] / 1000)
    ratio = args.execs_high / args.execs_low
    best_probe = max(
        (min(r["probe_before"], r["probe_after"])
         for r in lows + highs if "probe_before" in r), default=1.0)
    for r in lows + highs:
        if "probe_before" in r:
            r["host_speed"] = round(
                min(r["probe_before"], r["probe_after"]) / best_probe, 3)
    result = {
        "mode": "standalone-cluster spark-submit --py-files",
        "method": ("per-level worker tree CFS-quota'd at execs*cores, "
                   "identical plan/partitioning at both levels, host-"
                   "health-gated interleaved reps, best per level across "
                   "all accumulated reps"),
        "executors": {"low": args.execs_low, "high": args.execs_high,
                      "cores_each": args.exec_cores},
        "nparts": nparts,
        "reps_wave_ms": {"low": [r["wave_ms"] for r in lows],
                         "high": [r["wave_ms"] for r in highs]},
        "all_reps": {"low": lows, "high": highs},
        "low": {**{k: v for k, v in lo.items() if not k.startswith("probe")},
                "pages_per_sec": round(tput_lo, 1)},
        "high": {**{k: v for k, v in hi.items() if not k.startswith("probe")},
                 "pages_per_sec": round(tput_hi, 1)},
        "speedup": round(tput_hi / tput_lo, 2),
        "scaling_efficiency": round(tput_hi / (ratio * tput_lo), 3),
    }
    print(json.dumps(result, indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)
    shutil.rmtree(os.path.dirname(zpath), ignore_errors=True)


if __name__ == "__main__":
    main()
