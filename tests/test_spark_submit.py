"""Deployment-shape evidence (north_rule): the wave job runs via
``spark-submit --py-files abot_spark.zip`` with the package imported from
the shipped archive, not from the repo checkout — the sandbox proxy for a
multi-executor cluster submit.  Crawl outcome must match the serial
oracle exactly."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import zipfile

import pytest

from abot_spark.config import CrawlConfig
from abot_spark.oracle.serial import SerialCrawler
from abot_spark.sources.synthetic_web import generate_web, write_parquet

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


def _build_zip(dest_dir: str) -> str:
    zpath = os.path.join(dest_dir, "abot_spark.zip")
    pkg = os.path.join(REPO, "abot_spark")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg):
            for name in files:
                if not name.endswith(".py"):
                    continue
                full = os.path.join(root, name)
                zf.write(full, os.path.relpath(full, REPO))
    return zpath


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT),
                    reason="spark-submit not installed")
def test_spark_submit_pyfiles_crawl(spark):
    tmp = tempfile.mkdtemp(prefix="abot-submit-")
    fx = generate_web(n_domains=2, sections=2, leaves=2)
    paths = write_parquet(fx, os.path.join(tmp, "web"))
    zpath = _build_zip(tmp)
    work_dir = os.path.join(tmp, "crawl")
    job = os.path.join(tmp, "submit_crawl.py")
    shutil.copy(os.path.join(REPO, "tools", "submit_crawl.py"), job)

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be the only package source
    env.setdefault("PYSPARK_PYTHON", sys.executable)
    out = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[4]",
         "--conf", "spark.sql.shuffle.partitions=8",
         "--conf", "spark.ui.enabled=false",
         "--py-files", zpath, job,
         "--pages", paths["pages"], "--robots", paths["robots"],
         "--work-dir", work_dir, "--audit-text",
         "--seed", "http://d0.example.com/"],
        capture_output=True, text=True, timeout=420, cwd=tmp, env=env,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    result = json.loads(line)

    cfg = CrawlConfig(is_respect_robots_dot_text_enabled=True)
    serial = SerialCrawler(fx, cfg).crawl("http://d0.example.com/")
    assert result["crawled_count"] == serial.crawled_count

    # order parity straight off the submitted run's store
    fetched = spark.read.parquet(
        *[os.path.join(work_dir, "fetched", d)
          for d in os.listdir(os.path.join(work_dir, "fetched"))])
    order = [r["url"] for r in fetched.orderBy("seq").collect()]
    assert order == serial.crawl_order
