"""Checkpointed crawl store — parquet tables + atomic JSON manifests.

Plays the role of the reference's in-memory collections
(``QueueOfPagesToCrawlRepository`` / ``CompactCrawledUrlRepository`` /
``CrawlContext`` counters) as durable, resumable tables:

- ``frontier/wave=N``   — the queue (one directory per wave)
- ``seen/wave=N``       — URL-seen hash appends (xxhash64 keys; the
  reference stored first-8-MD5-bytes, ``CrawledUrlRepository.cs:58-76`` —
  contract is "64-bit hash, collisions tolerated")
- ``fetched/wave=N``    — PageCrawlCompleted audit (S6)
- ``disallowed/wave=N`` / ``links_disallowed/wave=N`` — event audit (S6)
- ``counts/wave=N``     — accumulated CrawlCountByDomain snapshot (A2)
- ``state_N.json``      — CrawlContext scalars + wave lineage (A1/A3/A5),
  committed atomically (tmp + rename) AFTER all of wave N's parquet is
  down, so a crash mid-wave replays from the last committed manifest
  (north_rule: resumable from checkpoint with per-partition lineage).

This is a deliberately Iceberg-shaped layout: each ``wave=N`` directory is
an append snapshot and ``state_N.json`` is the manifest pointer.  On a real
cluster, swap the directory appends for Iceberg table appends (bucketed
``bucket(B, url_hash)`` for ``seen``) and the manifest for the Iceberg
snapshot id — the wave loop code does not change.  (No Iceberg runtime jar
ships in this sandbox, so parquet-dirs-plus-manifest is the local stand-in.)
"""

from __future__ import annotations

import json
import os
import shutil
from dataclasses import asdict, dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class CrawlState:
    """The CrawlContext scalars (``Abot/Poco/CrawlContext.cs:35-93``)."""

    wave: int = 0
    crawled_count: int = 0          # A1 (retries excluded, WebCrawler.cs:1084-1094)
    retried_count: int = 0
    next_seq: int = 0               # total admitted ever == max seq
    budget_used: int = 0            # crawled + queued (incl. pending retries)
    latched: bool = False           # A3 MaxPagesToCrawlLimitReachedOrScheduled
    stop_requested: bool = False    # A5
    hard_stop_requested: bool = False
    sim_clock_ms: int = 0           # simulated wall clock for politeness
    root_authority: str = ""
    original_root_authority: str = ""
    robots_dropped: bool = False    # root-disallow escape hatch fired (F6)
    metrics: list[dict] = field(default_factory=list)  # per-wave lineage


class CrawlStore:
    # links_disallowed audit rides inside `fetched` (links_reason column)
    TABLES = ("frontier", "seen", "fetched", "disallowed", "counts")

    def __init__(self, spark: SparkSession, work_dir: str):
        self.spark = spark
        self.work_dir = work_dir
        os.makedirs(work_dir, exist_ok=True)

    # -- parquet appends ----------------------------------------------------

    def wave_path(self, table: str, wave: int) -> str:
        return os.path.join(self.work_dir, table, f"wave={wave}")

    def write_wave(self, table: str, wave: int, df: DataFrame) -> None:
        df.write.mode("overwrite").parquet(self.wave_path(table, wave))

    def read_wave(self, table: str, wave: int) -> DataFrame:
        return self.spark.read.parquet(self.wave_path(table, wave))

    def read_all(self, table: str, through_wave: int) -> DataFrame | None:
        paths = [
            self.wave_path(table, w)
            for w in range(through_wave + 1)
            if os.path.exists(self.wave_path(table, w))
        ]
        if not paths:
            return None
        return self.spark.read.parquet(*paths)

    # -- manifests ----------------------------------------------------------

    def _state_path(self, wave: int) -> str:
        return os.path.join(self.work_dir, f"state_{wave}.json")

    def commit_state(self, state: CrawlState) -> None:
        """Atomic: the manifest lands only after the wave's data did."""
        tmp = self._state_path(state.wave) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(asdict(state), f, indent=1)
        os.replace(tmp, self._state_path(state.wave))

    def latest_state(self) -> CrawlState | None:
        waves = []
        for name in os.listdir(self.work_dir):
            if name.startswith("state_") and name.endswith(".json"):
                try:
                    waves.append(int(name[len("state_"):-len(".json")]))
                except ValueError:
                    continue
        if not waves:
            return None
        with open(self._state_path(max(waves))) as f:
            return CrawlState(**json.load(f))

    def last_wave(self, table: str, through_wave: int) -> int | None:
        """Newest wave <= through_wave with data for ``table``."""
        best = None
        for w in range(through_wave, -1, -1):
            if os.path.exists(self.wave_path(table, w)):
                best = w
                break
        return best

    def drop_waves_after(self, wave: int) -> None:
        """Discard partial data from waves newer than the last committed
        manifest (crash recovery).  The *frontier* for wave+1 is part of
        wave ``wave``'s committed output (written before the manifest), so
        it is kept."""
        ahead = ("frontier", "seen", "disallowed")  # written at w+1 during wave w
        for table in self.TABLES:
            keep_through = wave + 1 if table in ahead else wave
            tdir = os.path.join(self.work_dir, table)
            if not os.path.isdir(tdir):
                continue
            for name in os.listdir(tdir):
                if name.startswith("wave="):
                    try:
                        w = int(name.split("=", 1)[1])
                    except ValueError:
                        continue
                    if w > keep_through:
                        shutil.rmtree(os.path.join(tdir, name))
        for name in list(os.listdir(self.work_dir)):
            if name.startswith("state_") and name.endswith(".json.tmp"):
                os.remove(os.path.join(self.work_dir, name))
