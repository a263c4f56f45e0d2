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
import uuid
from dataclasses import asdict, dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


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
    frontier_next: int = -1         # rows in frontier wave+1 (-1 = unknown)
    seen_count: int = 0             # cumulative seen-table rows (gates the
                                    # lazy bloom-sidecar maintenance)
    sim_clock_ms: int = 0           # simulated wall clock for politeness
    root_authority: str = ""
    original_root_authority: str = ""
    robots_dropped: bool = False    # root-disallow escape hatch fired (F6)
    error: str = ""                 # terminal abort reason (A4 memory, ...)
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
        start = 0
        base: DataFrame | None = None
        k = self.latest_compact(table, through_wave)
        if k is not None:
            base = self.spark.read.parquet(self.compact_path(table, k))
            start = k + 1
        paths = [
            self.wave_path(table, w)
            for w in range(start, through_wave + 1)
            if os.path.exists(self.wave_path(table, w))
        ]
        if paths:
            deltas = self.spark.read.parquet(*paths)
            base = deltas if base is None else base.unionByName(deltas)
        return base

    # -- compaction (SURVEY.md §4 "Seen-set at 10^10") -----------------------
    #
    # A long crawl appends one small directory per wave; after hundreds of
    # waves the per-wave union is a small-file/scan-fanout problem (file
    # listing + footer reads dominate the anti-join probe).  compact_seen
    # rewrites waves 0..K into ONE hash-bucketed snapshot — the Iceberg
    # rewrite_data_files + expire_snapshots maintenance pair, expressed on
    # the parquet stand-in.  Commit is atomic (write to *.tmp, rename), so
    # a crash mid-compaction leaves only a .tmp that recovery removes, and
    # compaction only ever covers waves at or below the last committed
    # manifest, so resume can never roll back underneath a snapshot.

    def compact_path(self, table: str, through_wave: int) -> str:
        return os.path.join(self.work_dir, f"{table}_compact",
                            f"through={through_wave}")

    def latest_compact(self, table: str, through_wave: int) -> int | None:
        """Newest committed compaction snapshot covering waves <= through_wave."""
        tdir = os.path.join(self.work_dir, f"{table}_compact")
        if not os.path.isdir(tdir):
            return None
        best = None
        for name in os.listdir(tdir):
            if not name.startswith("through=") or name.endswith(".tmp"):
                continue
            try:
                k = int(name.split("=", 1)[1])
            except ValueError:
                continue
            if k <= through_wave and (best is None or k > best):
                best = k
        return best

    def compact_seen(self, through_wave: int, num_buckets: int,
                     prune: bool = True) -> None:
        """Rewrite seen waves 0..through_wave into one bucketed snapshot.

        Bucketing by ``pmod(url_hash, B)`` with an in-file sort on
        ``url_hash`` keeps every hash's rows in one file with tight min/max
        stats — the layout a storage-partitioned Iceberg anti-join needs.
        ``prune`` then removes the superseded per-wave directories (and any
        older snapshot), the expire_snapshots half of the maintenance pair.
        """
        src = self.read_all("seen", through_wave)
        if src is None:
            return
        final = self.compact_path("seen", through_wave)
        tmp = final + ".tmp"
        (src.repartition(num_buckets, F.pmod(F.col("url_hash"),
                                             F.lit(num_buckets)))
            .sortWithinPartitions("url_hash")
            .write.mode("overwrite").parquet(tmp))
        if os.path.isdir(final):
            shutil.rmtree(final)
        os.replace(tmp, final)
        if prune:
            for w in range(through_wave + 1):
                p = self.wave_path("seen", w)
                if os.path.exists(p):
                    shutil.rmtree(p)
            tdir = os.path.join(self.work_dir, "seen_compact")
            for name in os.listdir(tdir):
                stem = name.split("=", 1)[-1].split(".", 1)[0]
                if name.endswith(".tmp") or (
                        stem.isdigit() and int(stem) < through_wave):
                    shutil.rmtree(os.path.join(tdir, name))

    # -- bloom shard sidecar (SURVEY.md §4 "Seen-set at 10^10") --------------
    #
    # Per-bucket bloom shard files next to the seen appends (see
    # BloomSeenShards below); the directory on shared storage IS the live
    # filter — no driver copy, no broadcast — and per-wave file versioning
    # makes it resumable.  On an Iceberg deployment this becomes one sidecar
    # per seen bucket (puffin-style blob keyed by snapshot id); the wave
    # loop is unchanged.

    def bloom_shards_dir(self) -> str:
        return os.path.join(self.work_dir, "seen_bloom_shards")

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
        # bloom shards ride with `seen` (absorbed during wave w-1 -> keep
        # through wave+1); partially-absorbed newer shards must go so the
        # no-false-negative invariant ("marker implies shards cover every
        # seen hash through that wave") survives the crash
        BloomSeenShards.drop_after(self.bloom_shards_dir(), wave + 1)
        cdir = os.path.join(self.work_dir, "seen_compact")
        if os.path.isdir(cdir):
            for name in os.listdir(cdir):
                stem = name.split("=", 1)[-1].split(".", 1)[0]
                # a snapshot can only cover committed waves (<= wave+1, since
                # `seen` rides one ahead); anything newer — or a half-written
                # .tmp — is partial work from the crashed run
                if name.endswith(".tmp") or (
                        stem.isdigit() and int(stem) > wave + 1):
                    shutil.rmtree(os.path.join(cdir, name))
        for name in list(os.listdir(self.work_dir)):
            if name.startswith("state_") and name.endswith(".json.tmp"):
                os.remove(os.path.join(self.work_dir, name))


# -- sharded bloom sidecar ---------------------------------------------------

def bloom_shard_newest(base_dir: str, bucket: int, through_wave: int
                       ) -> str | None:
    """Path of bucket's newest shard file at wave <= through_wave, or None
    (a bucket with no file has never absorbed a key — definitely-new).
    Runs executor-side inside the probe/absorb kernels."""
    d = os.path.join(base_dir, f"bucket={bucket}")
    if not os.path.isdir(d):
        return None
    best, best_w = None, -1
    for name in os.listdir(d):
        if not (name.startswith("wave=") and name.endswith(".bin")):
            continue
        try:
            w = int(name[len("wave="):-len(".bin")])
        except ValueError:
            continue
        if best_w < w <= through_wave:
            best, best_w = os.path.join(d, name), w
    return best


def bloom_shard_load(path: str, expected: int, fpp: float):
    from abot_spark.functions.sketches import BloomFilter

    with open(path, "rb") as f:
        return BloomFilter.from_bytes(f.read(), expected, fpp)


class BloomShardProbe:
    """Picklable probe handle over a :class:`BloomSeenShards` directory at a
    fixed ``through_wave`` — what the wave plan receives instead of a
    broadcast bit array.  Holds only plain values (no SparkSession), so the
    column UDF's closure ships by value."""

    def __init__(self, base_dir: str, n_shards: int, expected_per_shard: int,
                 fpp: float, through_wave: int):
        self.base_dir = base_dir
        self.n_shards = n_shards
        self.expected_per_shard = expected_per_shard
        self.fpp = fpp
        self.through_wave = through_wave

    def bucket_col(self, hash_col) -> "F.Column":
        """JVM-side shard key: ``pmod(hash, B)`` (floored mod — equals the
        numpy ``% B`` the probe kernel computes, for any pow2 B)."""
        c = F.col(hash_col) if isinstance(hash_col, str) else hash_col
        return F.pmod(c, F.lit(self.n_shards)).cast("int")

    def maybe_col(self, hash_col) -> "F.Column":
        """Boolean probe column.  MUST be evaluated on a DataFrame already
        partitioned by :meth:`bucket_col` — each task then touches only its
        own shards, loaded once per (executor, shard file) via the
        executor-side cache (files are immutable: path == identity)."""
        from abot_spark.functions.udfs import shard_maybe_col

        c = F.col(hash_col) if isinstance(hash_col, str) else hash_col
        return shard_maybe_col(self.base_dir, self.n_shards,
                               self.expected_per_shard, self.fpp,
                               self.through_wave, c)

    def probe(self, df: DataFrame, hash_col: str = "url_hash",
              out_col: str = "maybe_seen",
              num_partitions: int = 32) -> DataFrame:
        """Bucket-co-located probe: repartition by shard key, then the
        column UDF (same surface as ``CuckooSeenSidecars.probe``)."""
        return df.repartition(num_partitions, self.bucket_col(hash_col)) \
            .withColumn(out_col, self.maybe_col(hash_col))


class BloomSeenShards:
    """Per-bucket Bloom-filter sidecars for the bucketed seen table.

    The scale layout (SURVEY.md §4 "Seen-set at 10^10"; VERDICT r1 top
    fix): the seen-set's join-pruning filter is **never held or merged on
    the driver and never broadcast**.  It lives as B shard files on shared
    storage — ``base_dir/bucket=<b>/wave=<w>.bin``, each a standalone
    :class:`~abot_spark.functions.sketches.BloomFilter` over that bucket's
    share of ``xxhash64(canonical_url)`` keys (bucket = ``pmod(hash, B)``,
    the same key as the seen table's storage bucketing):

    - **absorb** (per wave): the seen delta shuffles by bucket;
      ``applyInPandas`` tasks each load their bucket's newest shard, fold
      the delta in, and write a new immutable ``wave=w`` file atomically.
      Driver transfer: one (bucket, count) row per touched bucket.
      Untouched buckets keep their older file ("newest <= wave" resolves).
    - **probe** (per wave): candidates repartition by the same key; a
      scalar Arrow pandas UDF over just the hash column loads only the
      shards its partition holds, cached per (executor, file path) — at
      10^10 URLs (~12 GB of filter at 1% FPP) no executor ever holds more
      than its partitions' shards, vs. an impossible 12 GB broadcast.
    - **resume**: the files are the state.  A ``_absorbed_wave=<w>``
      marker commits each wave's absorb (written only after every shard
      task finished); crash recovery drops files newer than the last
      committed crawl manifest, so a marker always implies its shards
      cover every seen hash through that wave — the no-false-negative
      contract (``CrawledUrlRepositoryTest.cs:60-89``) holds across
      crashes.

    Membership contract: False = definitely not seen (skip the exact
    join); True rows confirm against the exact seen table, exactly like
    the cuckoo sidecars above.
    """

    def __init__(self, base_dir: str, n_shards: int = 64,
                 expected_items: int = 10_000_000, fpp: float = 0.01):
        assert n_shards & (n_shards - 1) == 0, "n_shards must be pow2"
        self.base_dir = base_dir
        self.n_shards = n_shards
        # uniform xxhash64 keys spread evenly; 2x headroom absorbs variance
        self.expected_per_shard = max(
            1024, (2 * expected_items) // n_shards)
        self.fpp = fpp
        os.makedirs(base_dir, exist_ok=True)
        # Layout metadata guards the pmod bucket mapping: if n_shards (or
        # the per-shard geometry) changed between runs, existing shard
        # files hold hashes under a DIFFERENT bucket assignment — probing
        # them would return 'definitely new' for seen keys (false
        # negatives).  On mismatch the whole sidecar is dropped; the
        # caller's engagement logic then rebuilds from the exact seen
        # table or simply runs without the fast path (both correct).
        layout = {"n_shards": self.n_shards,
                  "expected_per_shard": self.expected_per_shard,
                  "fpp": self.fpp}
        meta_path = os.path.join(base_dir, "_meta.json")
        prev = None
        if os.path.exists(meta_path):
            try:
                with open(meta_path) as f:
                    prev = json.load(f)
            except (OSError, ValueError):
                prev = None
        if prev != layout:
            if prev is not None or any(
                    n.startswith(("bucket=", "_absorbed_wave="))
                    for n in os.listdir(base_dir)):
                # strict wipe: a partially-failed removal (transient EBUSY)
                # followed by _write_meta would record the NEW layout next
                # to surviving OLD-layout bucket files — re-enabling exactly
                # the false-negative probe path this guard exists to stop.
                # So no ignore_errors, and verify nothing survived before
                # stamping the new layout.
                shutil.rmtree(base_dir)
                os.makedirs(base_dir, exist_ok=True)
                leftovers = [n for n in os.listdir(base_dir)
                             if n.startswith(("bucket=", "_absorbed_wave="))]
                if leftovers:
                    raise RuntimeError(
                        f"bloom sidecar layout wipe left stale entries in "
                        f"{base_dir}: {leftovers[:5]}")
            self._write_meta()

    def _write_meta(self) -> None:
        meta_path = os.path.join(self.base_dir, "_meta.json")
        tmp = f"{meta_path}.{uuid.uuid4().hex}.tmp"
        with open(tmp, "w") as f:
            json.dump({"n_shards": self.n_shards,
                       "expected_per_shard": self.expected_per_shard,
                       "fpp": self.fpp}, f)
        os.replace(tmp, meta_path)

    def prober(self, through_wave: int) -> BloomShardProbe:
        return BloomShardProbe(self.base_dir, self.n_shards,
                               self.expected_per_shard, self.fpp,
                               through_wave)

    def absorb(self, df: DataFrame, hash_col: str, wave: int) -> None:
        """Distributed per-bucket absorb of a seen delta; commits the
        ``wave`` marker once every touched shard is durable.  Idempotent
        under task retry (bloom adds are; the atomic rename keeps readers
        off half-written files)."""
        base_dir, exp, fpp = self.base_dir, self.expected_per_shard, self.fpp

        def fold(key, pdf: "pd.DataFrame") -> "pd.DataFrame":
            import numpy as np
            import pandas as pd

            from abot_spark.functions.sketches import BloomFilter

            b = int(key[0])
            prev = bloom_shard_newest(base_dir, b, wave)
            bf = (bloom_shard_load(prev, exp, fpp) if prev is not None
                  else BloomFilter(exp, fpp, n_buckets=1))
            bf.add_many(pdf[hash_col].to_numpy(dtype=np.int64))
            d = os.path.join(base_dir, f"bucket={b}")
            os.makedirs(d, exist_ok=True)
            path = os.path.join(d, f"wave={wave}.bin")
            # attempt-UNIQUE temp name: under speculative execution two
            # attempts for the same bucket may run concurrently — a shared
            # ".tmp" would interleave writes and rename corrupt bytes into
            # place.  Each attempt writes its own file; whichever rename
            # lands last wins with a complete image (adds are idempotent).
            tmp = f"{path}.{uuid.uuid4().hex}.tmp"
            with open(tmp, "wb") as f:
                f.write(bf.to_bytes())
            os.replace(tmp, path)
            return pd.DataFrame({"bucket": [b], "n": [len(pdf)]})

        (df.select(hash_col)
           .withColumn("_b", F.pmod(F.col(hash_col),
                                    F.lit(self.n_shards)).cast("int"))
           .groupBy("_b")
           .applyInPandas(fold, "bucket int, n long")
           .collect())
        self.mark_absorbed(wave)

    def rebuild(self, seen_df: DataFrame, hash_col: str, wave: int) -> None:
        """From-scratch build off the accumulated seen table (sidecar lost,
        predates the feature, or first engagement catch-up)."""
        shutil.rmtree(self.base_dir, ignore_errors=True)
        os.makedirs(self.base_dir, exist_ok=True)
        self._write_meta()
        self.absorb(seen_df, hash_col, wave)

    # -- wave markers (the sidecar's commit protocol) -----------------------

    def _marker(self, wave: int) -> str:
        return os.path.join(self.base_dir, f"_absorbed_wave={wave}")

    def mark_absorbed(self, wave: int) -> None:
        open(self._marker(wave), "w").close()

    def absorbed_through(self, through_wave: int) -> int | None:
        """Newest committed absorb at wave <= through_wave, or None."""
        best = None
        if not os.path.isdir(self.base_dir):
            return None
        for name in os.listdir(self.base_dir):
            if not name.startswith("_absorbed_wave="):
                continue
            try:
                w = int(name.split("=", 1)[1])
            except ValueError:
                continue
            if w <= through_wave and (best is None or w > best):
                best = w
        return best

    @staticmethod
    def drop_after(base_dir: str, keep_through: int) -> None:
        """Crash recovery: remove shard files and markers newer than the
        last committed crawl manifest (plus any .tmp leftovers)."""
        if not os.path.isdir(base_dir):
            return
        for name in os.listdir(base_dir):
            p = os.path.join(base_dir, name)
            if name.startswith("_absorbed_wave="):
                stem = name.split("=", 1)[1]
                if not stem.isdigit() or int(stem) > keep_through:
                    os.remove(p)
            elif name.startswith("bucket=") and os.path.isdir(p):
                for f in os.listdir(p):
                    stem = f.split("=", 1)[-1].split(".", 1)[0]
                    if f.endswith(".tmp") or (
                            stem.isdigit() and int(stem) > keep_through):
                        os.remove(os.path.join(p, f))


def _cuckoo_path(base_dir: str, bucket: int) -> str:
    return os.path.join(base_dir, f"bucket={bucket}.bin")


def _cuckoo_load(base_dir: str, bucket: int, capacity: int):
    from abot_spark.functions.sketches import CuckooFilter

    path = _cuckoo_path(base_dir, bucket)
    if os.path.exists(path):
        with open(path, "rb") as f:
            return CuckooFilter.from_bytes(f.read(), capacity)
    return CuckooFilter(capacity)


def _cuckoo_save(base_dir: str, bucket: int, cf) -> None:
    path = _cuckoo_path(base_dir, bucket)
    with open(path + ".tmp", "wb") as f:
        f.write(cf.to_bytes())
    os.replace(path + ".tmp", path)


class CuckooSeenSidecars:
    """Per-bucket cuckoo-filter sidecars for the bucketed seen table.

    The scale layout (SURVEY.md §4 "Seen-set at 10^10"): ``seen`` is
    hash-bucketed by ``pmod(url_hash, B)``; each bucket keeps a cuckoo
    filter sized for its share of keys.  Unlike the global Bloom sidecar
    (one broadcastable array), cuckoo filters support **deletion**
    (fingerprint displacement, Fan et al. CoNEXT'14) — required when seen
    marks are retracted under ``AllowUriRecrawling``
    (``Scheduler.cs:78-86``) — and stay small enough per bucket
    (keys/B x 2 bytes) to be loaded bucket-locally by the probing task
    instead of broadcast.

    All operations are ``applyInPandas`` over ``groupBy(bucket)`` — the
    same co-location a storage-partitioned Iceberg join would give, so the
    probe never shuffles the seen table itself, only the (small) probe
    side.  Files live on shared storage (here: the local work dir; on a
    cluster: the object store next to the table), written atomically.

    Membership contract: no false negatives while a bucket is under
    capacity (overflow drops are surfaced in ``rebuild``'s return and the
    exact seen table remains the source of truth).
    """

    def __init__(self, spark: SparkSession, base_dir: str,
                 n_buckets: int = 64, capacity_per_bucket: int = 100_000):
        self.spark = spark
        self.base_dir = base_dir
        self.n_buckets = n_buckets
        self.capacity = capacity_per_bucket
        os.makedirs(base_dir, exist_ok=True)


    def _bucketed(self, df: DataFrame, hash_col: str) -> DataFrame:
        return df.withColumn(
            "_bucket", F.pmod(F.col(hash_col), F.lit(self.n_buckets))
            .cast("int"))


    def _apply(self, df: DataFrame, hash_col: str, op: str) -> dict[int, int]:
        """Distributed per-bucket update; returns {bucket: dropped} where
        ``dropped`` counts keys a full bucket could not absorb (add only).
        Closures capture only plain values — never ``self`` (it holds the
        unpicklable SparkSession)."""
        import numpy as np
        import pandas as pd

        base_dir, capacity = self.base_dir, self.capacity

        def update(key, pdf: "pd.DataFrame") -> "pd.DataFrame":
            b = int(key[0])
            cf = _cuckoo_load(base_dir, b, capacity)
            arr = pdf[hash_col].to_numpy(dtype=np.int64)
            if op == "add":
                ok = cf.add_many(arr)
                dropped = len(arr) - ok
            else:
                cf.delete_many(arr)
                dropped = 0
            _cuckoo_save(base_dir, b, cf)
            return pd.DataFrame({"bucket": [b], "dropped": [dropped]})

        rows = self._bucketed(df, hash_col).groupBy("_bucket") \
            .applyInPandas(update, "bucket int, dropped long").collect()
        return {r["bucket"]: r["dropped"] for r in rows}

    def add(self, df: DataFrame, hash_col: str = "url_hash") -> int:
        """Insert hashes; returns total overflow-dropped (0 when buckets
        are sized right)."""
        return sum(self._apply(df, hash_col, "add").values())

    def delete(self, df: DataFrame, hash_col: str = "url_hash") -> None:
        """Retract seen marks (AllowUriRecrawling mode)."""
        self._apply(df, hash_col, "delete")

    def rebuild(self, seen_df: DataFrame, hash_col: str = "url_hash") -> int:
        shutil.rmtree(self.base_dir, ignore_errors=True)
        os.makedirs(self.base_dir, exist_ok=True)
        return self.add(seen_df, hash_col)

    def probe(self, df: DataFrame, hash_col: str = "url_hash",
              out_col: str = "maybe_seen") -> DataFrame:
        """Append ``out_col: boolean`` — bucket-local membership probe.
        False = definitely not seen; True rows confirm against the exact
        table (same contract as the Bloom path in ``plans/wave.py``)."""
        import numpy as np
        import pandas as pd

        base_dir, capacity = self.base_dir, self.capacity
        out_schema = df.schema.add(out_col, "boolean")

        def probe_group(key, pdf: "pd.DataFrame") -> "pd.DataFrame":
            cf = _cuckoo_load(base_dir, int(key[0]), capacity)
            res = pdf.drop(columns=["_bucket"])
            res[out_col] = cf.contains_many(
                pdf[hash_col].to_numpy(dtype=np.int64))
            return res

        return self._bucketed(df, hash_col).groupBy("_bucket") \
            .applyInPandas(probe_group, out_schema)
