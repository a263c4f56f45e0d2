"""A4 memory guard — MemoryManager.cs:25-61 / CachedMemoryMonitor.cs /
WebCrawler.cs:544-599 semantics: start gate on available memory, per-wave
abort on driver RSS above the cap, cached readings."""

from __future__ import annotations

import tempfile

import pytest

from abot_spark.config import CrawlConfig
from abot_spark.crawler import WaveCrawler
from abot_spark.memory import (
    CachedMemoryMonitor, InsufficientMemoryError, MemoryMonitor,
)
from abot_spark.sources.synthetic_web import generate_web, write_parquet


@pytest.fixture(scope="module")
def web(spark):
    fx = generate_web(n_domains=1, sections=2, leaves=2)
    tmp = tempfile.mkdtemp(prefix="abot-mem-web-")
    paths = write_parquet(fx, tmp)
    return {"pages": spark.read.parquet(paths["pages"]),
            "robots": spark.read.parquet(paths["robots"])}


class FakeMonitor(MemoryMonitor):
    def __init__(self, used_mb=100, available_mb=1000):
        self.used = used_mb
        self.available = available_mb
        self.probes = 0

    def process_used_mb(self):
        self.probes += 1
        return self.used

    def available_mb(self):
        return self.available


def test_real_monitor_reads_proc():
    m = MemoryMonitor()
    assert m.process_used_mb() > 0          # this pytest process has RSS
    assert m.available_mb() > 0
    assert m.is_space_available(0)          # 0 disables
    assert not m.is_space_available(1 << 40)


def test_cached_monitor_caches_within_window():
    inner = FakeMonitor(used_mb=42)
    clock = [0.0]
    m = CachedMemoryMonitor(cache_seconds=5, inner=inner,
                            clock=lambda: clock[0])
    assert m.process_used_mb() == 42
    inner.used = 99
    clock[0] = 4.9
    assert m.process_used_mb() == 42        # still cached
    assert inner.probes == 1
    clock[0] = 5.0
    assert m.process_used_mb() == 99        # window elapsed -> re-probe
    assert inner.probes == 2


def _crawler(spark, web, cfg):
    return WaveCrawler(spark, cfg, tempfile.mkdtemp(prefix="abot-mem-"),
                       web["pages"], web["robots"])


def test_min_available_memory_gate_refuses_start(spark, web):
    cfg = CrawlConfig(min_available_memory_required_in_mb=500)
    c = _crawler(spark, web, cfg)
    c.memory_monitor = FakeMonitor(available_mb=100)
    with pytest.raises(InsufficientMemoryError):
        c.crawl(["http://d0.example.com/"])


def test_max_memory_aborts_with_reason_in_manifest(spark, web):
    cfg = CrawlConfig(max_memory_usage_in_mb=200)
    c = _crawler(spark, web, cfg)
    c.memory_monitor = FakeMonitor(used_mb=300)
    state = c.crawl(["http://d0.example.com/"])
    assert state.hard_stop_requested
    assert "InsufficientMemory" in state.error
    assert state.crawled_count == 0         # aborted before wave 1
    # abort reason is durable: a fresh store reads it back
    persisted = c.store.latest_state()
    assert persisted.error == state.error


def test_memory_guard_inactive_by_default(spark, web):
    cfg = CrawlConfig()
    c = _crawler(spark, web, cfg)
    c.memory_monitor = FakeMonitor(used_mb=10**9, available_mb=0)
    state = c.crawl(["http://d0.example.com/"], max_waves=2)
    assert not state.hard_stop_requested and state.error == ""
    assert state.crawled_count > 0
