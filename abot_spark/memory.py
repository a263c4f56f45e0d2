"""A4 memory monitor — driver-side guard mirroring the reference's
``MemoryManager`` (``Abot/Utils/Memory/MemoryManager.cs:25-61``) and
``CachedMemoryMonitor`` (``Abot/Utils/Memory/CachedMemoryMonitor.cs``).

Spark manages executor memory itself, so this guard only watches the
*driver* process (the reference is single-process, so its "process
memory" maps to our driver) and the host's available memory:

- ``min_available_memory_required_in_mb`` — checked once at crawl start;
  if the host cannot supply it the crawl refuses to begin
  (``WebCrawler.cs:544-560`` throws ``InsufficientMemoryException``).
- ``max_memory_usage_in_mb`` — checked at every wave boundary; when the
  driver RSS exceeds it the crawl hard-stops and the manifest records
  the reason (``WebCrawler.cs:580-599`` aborts with the exception in
  ``CrawlResult.ErrorException``).

Readings come from ``/proc`` (Linux-only, like the sandbox); on other
platforms the monitor reports 0 used / unlimited available, i.e. the
guard never fires — matching the reference's behavior when GC readings
are unavailable.
"""

from __future__ import annotations

import time


class InsufficientMemoryError(MemoryError):
    """Raised when ``min_available_memory_required_in_mb`` cannot be met
    at crawl start (maps InsufficientMemoryException)."""


def _read_kv_kb(path: str, key: str) -> int | None:
    try:
        with open(path) as f:
            for line in f:
                if line.startswith(key):
                    return int(line.split()[1])  # value is in kB
    except OSError:
        return None
    return None


class MemoryMonitor:
    """Uncached readings, in MB."""

    def process_used_mb(self) -> int:
        kb = _read_kv_kb("/proc/self/status", "VmRSS:")
        return (kb or 0) // 1024

    def available_mb(self) -> int:
        kb = _read_kv_kb("/proc/meminfo", "MemAvailable:")
        return (kb // 1024) if kb is not None else (1 << 30)

    def is_space_available(self, required_mb: int) -> bool:
        if required_mb <= 0:
            return True
        return self.available_mb() >= required_mb


class CachedMemoryMonitor(MemoryMonitor):
    """Caches the used-memory reading ``cache_seconds`` (the reference
    caches the expensive GC probe — ``CachedMemoryMonitor.cs``; cache
    window from ``MaxMemoryUsageCacheTimeInSeconds``)."""

    def __init__(self, cache_seconds: int = 2,
                 inner: MemoryMonitor | None = None,
                 clock=time.monotonic):
        self.cache_seconds = max(cache_seconds, 0)
        self._inner = inner or MemoryMonitor()
        self._clock = clock
        self._cached: int | None = None
        self._cached_at = 0.0

    def process_used_mb(self) -> int:
        now = self._clock()
        if (self._cached is None
                or now - self._cached_at >= self.cache_seconds):
            self._cached = self._inner.process_used_mb()
            self._cached_at = now
        return self._cached

    def available_mb(self) -> int:
        return self._inner.available_mb()
