"""The wave loop — PoliteWebCrawler re-expressed as BFS supersteps.

``WaveCrawler.crawl(seeds)`` is the Spark equivalent of
``PoliteWebCrawler.Crawl(uri)`` (``Abot/Crawler/PoliteWebCrawler.cs:107-114``
→ ``WebCrawler.CrawlSiteUsingUriAsStartPoint`` :390-432): each iteration of
``ParallelCrawlSite`` (:502-539) becomes one Spark job over the frontier
table; the mutable ``(Scheduler, CrawlContext)`` pair becomes the
checkpointed :class:`abot_spark.store.CrawlStore` state, making the crawl
resumable mid-run (north_rule) — kill the process after any wave and
``resume()`` continues from the last committed manifest.

Time is simulated (``sim_clock_ms``): politeness and Retry-After delays
advance a deterministic clock instead of sleeping, so ordering and
politeness tests are exact and fast (SURVEY.md §7 "Hard parts" #5).  A
live deployment would swap the corpus join for an async-HTTP
``mapInPandas`` stage and let the real clock gate ``not_before_ms``.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType, IntegerType, LongType, MapType, StringType, StructField,
    StructType,
)

from abot_spark.config import CrawlConfig
from abot_spark.functions.robots import RobotsDotText, parse_robots_rules
from abot_spark.plans import wave as W
from abot_spark.store import CrawlState, CrawlStore
from abot_spark.urls import authority, canonicalize

FRONTIER_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("url_hash", LongType()),
    StructField("domain", StringType()),
    StructField("path", StringType()),
    StructField("parent_url", StringType()),
    StructField("parent_seq", LongType()),
    StructField("depth", IntegerType()),
    StructField("kind", IntegerType()),
    StructField("pos", IntegerType()),
    StructField("is_retry", BooleanType()),
    StructField("retry_count", IntegerType()),
    StructField("redirected_from", StringType()),
    StructField("redirect_position", IntegerType()),
    StructField("is_internal", BooleanType()),
    # PageBag (PageToCrawl.cs:115): user values riding with the page; NULL
    # encodes the empty bag.  Carried frontier → fetched (T7 field map /
    # CombinePageBags, WebCrawler.cs:1055, :1067-1078), preserved across
    # retries (same object re-enqueued), fresh for link/redirect children.
    StructField("page_bag", MapType(StringType(), StringType())),
    StructField("not_before_ms", LongType()),
    StructField("is_root", BooleanType()),
    StructField("seq", LongType()),
    StructField("wave", IntegerType()),
])


class WaveCrawler:
    def __init__(self, spark: SparkSession, cfg: CrawlConfig, work_dir: str,
                 pages: DataFrame | None, robots: DataFrame | None = None,
                 fetcher=None):
        """``pages`` is the simulated-web corpus (fetch = join); passing a
        ``fetcher`` callable instead (see ``plans/fetch_live.py``) switches
        the fetch stage to the salted live-HTTP ``mapInPandas`` path —
        ``HttpFetcher(cfg)`` for a real crawl."""
        if pages is None and fetcher is None:
            raise ValueError("need a pages corpus or a fetcher")
        self.fetcher = fetcher
        self.spark = spark
        self.cfg = cfg
        self._nparts = cfg.shuffle_partitions or int(
            spark.conf.get("spark.sql.shuffle.partitions", "32"))
        self.store = CrawlStore(spark, work_dir)
        self.pages = pages
        self.robots_df = robots
        #: waves that reported unstable refinement marks and re-planned
        #: with one more pass (the dedup fixpoint loop) — diagnostics
        self.refine_replans = 0
        self._corpus: DataFrame | None = None
        self._corpus_future = None
        self._robots_rules: DataFrame | None = None
        self._robots_delay_ms: dict[str, int] = {}
        self._robots_delays_df: DataFrame | None = None
        self._seen_shards = None     # BloomSeenShards sidecar (see _prepare)
        self._shards_through = None  # wave the shards cover seen through

    # -- setup ---------------------------------------------------------------

    def _prepare(self, state: CrawlState) -> None:
        # MB-sized html/text cells: the default 10k-record Arrow batch is
        # ~GBs per python worker; cap so UDF transfer stays ~tens of MB.
        self.spark.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            str(self.cfg.arrow_max_records_per_batch))
        # seen-wave deltas come back via Arrow toPandas (bloom absorption)
        self.spark.conf.set("spark.sql.execution.arrow.pyspark.enabled",
                            "true")
        # transient single-wave caches: compression CPU outweighs the
        # memory it saves (see CrawlConfig.cache_compressed)
        self.spark.conf.set("spark.sql.inMemoryColumnarStorage.compressed",
                            "true" if self.cfg.cache_compressed else "false")
        # AQE coalescing merges shuffles by BYTE size, blind to the Python
        # CPU behind them: it shrank the fetch-join output to ~10 partitions
        # (a few MB of frontier rows each), the extract localCheckpoint froze
        # that, and the link-UDF stage — the wave's dominant CPU — ran as 10
        # long tasks with multi-second stragglers (measured: 5.1/8 cores busy
        # at local[8]).  The engine sizes its shuffles explicitly (nparts),
        # so keep AQE's skew-split but not its coalescing.
        self.spark.conf.set(
            "spark.sql.adaptive.coalescePartitions.enabled", "false")
        # The fetch join must broadcast the *frontier* side — shuffling the
        # html-bearing corpus is GBs per wave vs MBs of frontier rows.  (At
        # 10^10-URL scale with an Iceberg corpus this becomes a storage-
        # partitioned join on bucket(url) instead of a broadcast.)
        self.spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
                            str(256 * 1024 * 1024))
        # The broadcast fetch join makes every downstream stage — extract
        # UDF, link UDF, explode — inherit the CORPUS partitioning.
        # Repartition AFTER redirect resolution: prepare_corpus stacks one
        # union per redirect hop, so repartitioning its *input* would leave
        # the checkpoint (and with it every wave stage) at hops x nparts
        # partitions.
        self._corpus = None
        self._corpus_future = None
        if self.pages is not None:
            # The checkpoint job touches nothing the seed stage needs, so it
            # runs on a background thread and the two overlap; the first
            # fetch resolves it (_corpus_df).  Session confs above are set
            # before submission, so the job sees them.
            from concurrent.futures import ThreadPoolExecutor

            pool = ThreadPoolExecutor(max_workers=1)
            self._corpus_future = pool.submit(
                lambda: W.prepare_corpus(self.pages, self.cfg)
                .repartition(self._nparts, "url").localCheckpoint())
            pool.shutdown(wait=False)
        # Sharded bloom sidecar over the accumulated seen hashes
        # (SURVEY.md §4; store.BloomSeenShards): the filter lives as
        # per-bucket files on shared storage, absorbed and probed executor-
        # side — the driver holds only the "absorbed through wave" marker.
        # Resumed crawls find the shard files in place; a missing/stale
        # sidecar under an engaged-sized seen table is rebuilt distributed.
        self._seen_shards = None
        self._shards_through = None
        if self.cfg.use_seen_bloom:
            from abot_spark.store import BloomSeenShards

            self._seen_shards = BloomSeenShards(
                self.store.bloom_shards_dir(),
                n_shards=self.cfg.bloom_n_shards,
                expected_items=self.cfg.bloom_expected_items,
                fpp=self.cfg.bloom_fpp)
            if state.wave >= 0:
                through = self._seen_shards.absorbed_through(state.wave + 1)
                if through == state.wave + 1:
                    # once engaged, every wave commits a marker — only the
                    # exactly-current one proves full seen coverage
                    self._shards_through = through
                elif state.seen_count >= self.cfg.seen_bloom_min_rows:
                    seen = self.store.read_all("seen", state.wave + 1)
                    if seen is not None:
                        self._seen_shards.rebuild(
                            seen, "url_hash", state.wave + 1)
                        self._shards_through = state.wave + 1
        self._robots_rules = None
        self._robots_delay_ms = {}
        self._robots_delays_df = None
        if (self.cfg.is_respect_robots_dot_text_enabled
                and self.robots_df is not None and not state.robots_dropped):
            ua = self.cfg.robots_dot_text_user_agent_string
            cap_s = self.cfg.max_robots_dot_text_crawl_delay_in_seconds
            base_ms = self.cfg.min_crawl_delay_per_domain_milli_seconds
            if not self.per_domain_robots:
                # Parity mode: the reference only fetches robots for the
                # ROOT (PoliteWebCrawler.cs:128-131) and parses it on the
                # crawl driver (RobotsDotTextFinder) — one filtered row
                # collected, same as the reference's single fetch.
                rows = self.robots_df.filter(
                    F.col("domain") == state.root_authority).collect()
                rules_rows = []
                for r in rows:
                    dom, txt = r["domain"], r["robots_txt"]
                    flat = parse_robots_rules(f"http://{dom}/", txt, ua)
                    rules_rows.append(
                        (dom, flat["allow_rules"], flat["disallow_rules"]))
                    delay_ms = int(min(flat["crawl_delay_s"], cap_s) * 1000)
                    # robots Crawl-delay overrides only when larger than
                    # the config minimum (PoliteWebCrawler.cs:146-167)
                    if delay_ms > base_ms:
                        self._robots_delay_ms[dom] = delay_ms
                if rules_rows:
                    # one domain's rules: a broadcast dim by construction
                    self._robots_rules = F.broadcast(
                        self.spark.createDataFrame(
                            rules_rows,
                            "domain string, allow_rules array<string>, "
                            "disallow_rules array<string>"))
            else:
                # Scale mode (S5 per-domain): parse EVERY domain's robots
                # distributively (Arrow mapInPandas — functions/robots.py
                # robots_rules_table); no collect, no driver loop.  The
                # parsed dim table is cached: the F6 gate joins it every
                # wave and the politeness split joins the Crawl-delay
                # slice; Catalyst/AQE picks broadcast vs shuffle by size.
                from abot_spark.functions.robots import robots_rules_table
                parsed = robots_rules_table(self.robots_df, ua, cap_s) \
                    .persist()
                self._robots_rules = parsed.select(
                    "domain", "allow_rules", "disallow_rules")
                self._robots_delays_df = parsed.filter(
                    F.col("delay_ms") > base_ms).select(
                    "domain", F.col("delay_ms").alias("_robots_delay_ms"))

    # -- public API ----------------------------------------------------------

    per_domain_robots: bool = False
    use_sitemaps: bool = False  # S2: GoogleWebCrawler sitemap seeding
    # -- user decision delegates (WebCrawler.cs:108-112) --------------------
    # Each is a boolean Column predicate (or a zero-arg callable returning
    # one) consulted only where the built-in decision allowed; False
    # denies — the same composition as the reference's Func<...,
    # CrawlDecision> properties.  Column surface = the stage's row:
    #
    # - user_link_predicate (ShouldScheduleLinkDecisionMaker, :1117-1118):
    #   candidate columns (url, domain, path, depth, parent_url, ...);
    #   denial is silent, the link is still marked known.
    # - user_page_predicate (ShouldCrawlPageDecisionMaker, :917-918):
    #   candidate columns; denial is evented (PageCrawlDisallowed) and
    #   consumes no budget slot.
    # - user_download_predicate (ShouldDownloadPageContentDecisionMaker,
    #   :1175-1180): fetched columns (url, domain, depth, status_code,
    #   content_type, ...); denial skips content download, so the page
    #   has no text and its links are not crawled.
    # - user_links_predicate (ShouldCrawlPageLinksDecisionMaker,
    #   :867-872): extracted columns (incl. text); denial is evented via
    #   links_reason.
    # - user_recrawl_predicate (ShouldRecrawlPageDecisionMaker,
    #   :955-959): failed-fetch columns (url, domain, retry_count,
    #   status_code, ...); denial silently drops the retry.
    user_link_predicate = None
    user_page_predicate = None
    user_download_predicate = None
    user_links_predicate = None
    user_recrawl_predicate = None

    @staticmethod
    def _hook(pred):
        return pred() if callable(pred) else pred

    # A4: injectable for tests (simulated readings); real monitor by default
    memory_monitor = None

    def _memory(self):
        if self.memory_monitor is None:
            from abot_spark.memory import CachedMemoryMonitor
            self.memory_monitor = CachedMemoryMonitor(
                self.cfg.max_memory_usage_cache_time_in_seconds)
        return self.memory_monitor

    def crawl(self, seed_urls: list[str], max_waves: int = 1000,
              seed_page_bags: dict[str, dict[str, str]] | None = None
              ) -> CrawlState:
        # A4 start gate (WebCrawler.cs:544-560): refuse to begin unless the
        # host can supply MinAvailableMemoryRequiredInMb
        req = self.cfg.min_available_memory_required_in_mb
        if req > 0 and not self._memory().is_space_available(req):
            from abot_spark.memory import InsufficientMemoryError
            raise InsufficientMemoryError(
                f"Process does not have the configured [{req}mb] of "
                f"available memory to crawl site. This is configurable "
                f"through the minAvailableMemoryRequiredInMb in app.conf "
                f"or CrawlConfiguration.MinAvailableMemoryRequiredInMb.")
        state = CrawlState()
        seeds = [canonicalize(u) for u in seed_urls]
        seeds = [s for s in seeds if s is not None]
        state.root_authority = authority(seeds[0]) if seeds else ""
        state.original_root_authority = state.root_authority
        self._seed_auths = tuple({authority(s) for s in seeds})
        import os as _os
        _timing = _os.environ.get("ABOT_WAVE_TIMING")
        t0 = time.monotonic()
        self._prepare(state)
        t1 = time.monotonic()
        bags = None
        if seed_page_bags:
            # PageBag entrypoint (the event-subscriber mutation surface of
            # the reference, PageToCrawl.cs:111-115): caller-keyed by the
            # pre-canonicalization seed URL or its canonical form
            bags = {}
            for u, bag in seed_page_bags.items():
                cu = canonicalize(u)
                if cu is not None:
                    bags[cu] = dict(bag)
        self._seed_frontier(seeds, state, bags)
        t2 = time.monotonic()
        if _timing:
            print(f"WAVETIME prepare={t1-t0:.2f}s seed={t2-t1:.2f}s",
                  flush=True)
        self.store.commit_state(state)
        return self._loop(state, max_waves)

    def _corpus_df(self):
        """Resolve the background corpus-checkpoint job (see _prepare)."""
        f = self._corpus_future
        if f is not None:
            self._corpus_future = None
            self._corpus = f.result()
        return self._corpus

    def _root_authorities(self, state: CrawlState) -> tuple[str, ...]:
        """IsInternalUri checks both RootUri and OriginalRootUri
        (WebCrawler.cs:796-800); multi-seed crawls widen to all seed
        authorities."""
        return tuple({state.root_authority, state.original_root_authority,
                      *getattr(self, "_seed_auths", ())})

    def resume(self, max_waves: int = 1000) -> CrawlState:
        """Continue from the last committed manifest (crash recovery).

        Wave N's manifest commits only after frontier N+1 and all audit
        appends for wave N are durable, so recovery = drop any partial
        wave>N data and re-enter the loop."""
        state = self.store.latest_state()
        if state is None:
            raise RuntimeError("nothing to resume: no committed state")
        # resuming is an explicit operator request to continue: clear a
        # previously-honored graceful stop (hard stop stays terminal)
        state.stop_requested = False
        self.store.drop_waves_after(state.wave)
        self._prepare(state)
        return self._loop(state, max_waves)  # _loop starts at state.wave + 1

    def _schedule_to_fixpoint(self, agg_exprs: list, sched_kwargs: dict):
        """Run ``schedule_wave`` + its cache-materializing admission
        aggregate, re-planning with one extra refinement pass while the
        final pass reports unstable marks (``_refine_changed``).

        The decision chain is a Jacobi iteration of a strictly causal
        system (every row depends only on strictly-earlier rows' marks),
        so a stable pass IS the serial solution — the stability bit rides
        the aggregate the wave loop already runs, making the common case
        (stable at the default 2 passes; every shaped sweep to date) free.
        A genuinely >=3-deep same-wave collision chain triggers a full
        re-plan per extra pass — rare and bounded by
        ``cfg.dedup_refinement_max_passes``.  Returns ``(sched, crow)``.
        """
        cfg = self.cfg
        passes = cfg.dedup_refinement_passes
        rc_agg = F.max(F.col("_refine_changed").cast("int")).alias("_rc")
        while True:
            sched = W.schedule_wave(
                **sched_kwargs, refinement_passes=passes)
            if sched["cand_base"] is not None:
                sched["cand_base"].count()  # fill before the plan forks
            crow = sched["cand_cache"].agg(*agg_exprs, rc_agg).first()
            if not crow["_rc"] or passes >= cfg.dedup_refinement_max_passes:
                return sched, crow
            # unstable: discard this plan's caches and go one pass deeper
            sched["cand_cache"].unpersist()
            if sched["cand_base"] is not None:
                sched["cand_base"].unpersist()
            passes += 1
            self.refine_replans += 1  # observable (pytest + post-mortems)

    # -- seen-set bloom sidecar ---------------------------------------------

    def _bloom_arg(self):
        """Probe handle over the shard directory for this wave's plan, or
        None while the seen-set is small enough that the exact join alone
        is cheaper than an extra UDF pass (the sidecar is then dormant —
        no marker — so the handle existing implies the files are live)."""
        if self._seen_shards is None or self._shards_through is None:
            return None
        return self._seen_shards.prober(self._shards_through)

    def _absorb_seen_wave(self, wave: int, seen_add: DataFrame | None = None,
                          n_hint: int | None = None,
                          total_seen: int | None = None) -> None:
        """Fold wave ``wave``'s seen appends into the shard files
        (``BloomSeenShards.absorb``) — executors load/update/write their
        own buckets; the driver collects one count row per touched bucket
        and commits the wave marker, never any hashes or bits.  Pass
        ``seen_add`` (the cached wave delta) to read off the cache instead
        of re-reading the parquet append.

        LAZY maintenance: while the accumulated seen-set (``total_seen``)
        is below the engagement threshold the sidecar stays dormant — no
        absorb job, no files — because the wave plan is using the
        broadcast/exact join anyway.  On crossing, one catch-up absorb
        folds the full accumulated table."""
        if self._seen_shards is None:
            return
        if (total_seen is not None
                and total_seen < self.cfg.seen_bloom_min_rows):
            return  # dormant: _prepare rebuilds from the seen table if needed
        if self._shards_through is None and total_seen is not None \
                and n_hint is not None and total_seen > n_hint:
            # first absorb after a dormant stretch: fold everything to date
            # (this wave's append is already durable — the write lane runs
            # the seen write before this)
            src = self.store.read_all("seen", wave)
            if src is not None:
                self._seen_shards.absorb(src, "url_hash", wave)
                self._shards_through = wave
            return
        if n_hint == 0:
            # empty delta: nothing to absorb, but the wave marker must
            # still advance so resume proves full coverage
            self._seen_shards.mark_absorbed(wave)
            self._shards_through = wave
            return
        src = (seen_add if seen_add is not None
               else self.store.read_wave("seen", wave))
        self._seen_shards.absorb(src, "url_hash", wave)
        self._shards_through = wave

    # -- seeding (S1: StartCrawlRootPage, WebCrawler.cs:480-495) -------------

    def _seed_frontier(self, seeds: list[str], state: CrawlState,
                       page_bags: dict[str, dict[str, str]] | None = None
                       ) -> None:
        cfg = self.cfg
        # root-disallow escape hatch (F6) is evaluated driver-side, exactly
        # like PoliteWebCrawler.ShouldCrawlPage for IsRoot pages (:191-227)
        if (cfg.is_respect_robots_dot_text_enabled
                and cfg.is_ignore_robots_dot_text_if_root_disallowed_enabled
                and self.robots_df is not None and seeds):
            root = seeds[0]
            txt = {r["domain"]: r["robots_txt"]
                   for r in self.robots_df.filter(
                       F.col("domain") == state.root_authority).collect()
                   }.get(state.root_authority)
            if txt is not None:
                robots = RobotsDotText(root, txt)
                ua = cfg.robots_dot_text_user_agent_string
                probe = root + ("aaaaa" if root.endswith("/") else "/aaaaa")
                if (not robots.is_url_allowed(root, ua)
                        or not robots.is_url_allowed(probe, ua)):
                    state.robots_dropped = True
                    self._robots_rules = None
                    self._robots_delay_ms = {}
                    self._robots_delays_df = None

        if self.use_sitemaps:
            seeds = seeds + self._sitemap_items(seeds, state)

        rows = []
        for i, s in enumerate(seeds):
            rows.append((s, authority(s),
                         self._path_of(s), s, 0, 0, 1, i,
                         (page_bags or {}).get(s)))
        cand = self.spark.createDataFrame(
            rows, "url string, domain string, path string, parent_url string,"
                  " parent_seq long, depth int, kind int, pos int,"
                  " page_bag map<string,string>"
        ).withColumn("is_retry", F.lit(False)) \
         .withColumn("retry_count", F.lit(0)) \
         .withColumn("redirected_from", F.lit(None).cast("string")) \
         .withColumn("redirect_position", F.lit(0))

        empty_events = self.spark.createDataFrame(
            [], "seq long, domain string, is_retry boolean")
        # one cache-materializing aggregate: admitted count (= frontier 0
        # rows; no retries/deferrals exist at seed time) + A3 latch probe +
        # the refinement-stability bit (fixpoint re-plan when unstable)
        sched, crow = self._schedule_to_fixpoint(
            [F.sum(F.col("admitted").cast("int")).alias("n"),
             F.sum(F.col("_out_seen_add").cast("int")).alias("n_sa"),
             F.sum(F.col("_out_disallowed").cast("int")).alias("n_dis"),
             F.max(F.col("budget_denied").cast("int")).alias("bd")],
            dict(
                candidates=cand, retries=None, frontier_events=empty_events,
                seen=None, prior_counts=None,
                robots_rules=self._robots_rules,
                cfg=cfg, budget_used=state.budget_used, next_seq=0,
                latched=False,
                user_page_predicate=self._hook(self.user_page_predicate),
                root_authorities=self._root_authorities(state),
                wave_ts_ms=0, num_partitions=self._nparts,
                # seed candidates share parent_seq=0/kind=1; the order is
                # pos, whose range is known exactly — computed buckets
                seq_range_hint=("pos", 0, len(rows)),
                direct_add=True,  # seeds: Scheduler.Add only, no AddKnownUri
                n_wave_hint=len(rows),  # seed pass: trivially broadcastable
                n_domains_hint=0,       # no prior counts at seed time
            ))
        frontier0 = sched["admitted"].withColumn("is_root", F.lit(True)) \
            .withColumn("wave", F.lit(0))
        n = int(crow["n"] or 0)
        state.seen_count = int(crow["n_sa"] or 0)
        out_parts = self._nparts if n >= 2000 else 2
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(max_workers=4) as pool:
            futs = [
                pool.submit(self.store.write_wave, "frontier", 0,
                            frontier0.select(
                                [f.name for f in FRONTIER_SCHEMA.fields])
                            .coalesce(out_parts)),
                pool.submit(self._absorb_seen_wave, 0, sched["seen_add"],
                            None, state.seen_count),
            ]
            # empty outputs skip the write (read_all tolerates the gap)
            if state.seen_count:
                futs.append(pool.submit(
                    self.store.write_wave, "seen", 0,
                    sched["seen_add"].coalesce(out_parts)))
            if int(crow["n_dis"] or 0):
                futs.append(pool.submit(
                    self.store.write_wave, "disallowed", 0,
                    sched["disallowed"].coalesce(out_parts)))
            for f in futs:
                f.result()
        sched["cand_cache"].unpersist(False)
        if sched["cand_base"] is not None:
            sched["cand_base"].unpersist(False)
        state.next_seq = n
        state.budget_used = n
        state.latched = bool(crow["bd"])
        state.wave = -1  # the loop starts at wave 0
        state.frontier_next = n

    def _sitemap_items(self, seeds: list[str], state: CrawlState) -> list[str]:
        """S2 (GoogleWebCrawler.cs:123-136, 159-190): robots ``Sitemap:``
        URLs expanded (index recursion) into item URLs that enter the
        frontier at depth 0, after the root seeds and before the crawl."""
        from abot_spark.functions.robots import RobotsDotText
        from abot_spark.functions.sitemaps import resolve_sitemaps

        if self.robots_df is None or self.pages is None or not seeds:
            return []
        robots_txt = {r["domain"]: r["robots_txt"]
                      for r in self.robots_df.filter(
                          F.col("domain") == state.root_authority).collect()}
        txt = robots_txt.get(state.root_authority)
        if not txt:
            return []
        sitemap_urls = RobotsDotText(seeds[0], txt).sitemaps
        if not sitemap_urls:
            return []
        # sitemap docs are few: resolve driver-side against the corpus
        xml_pages = {
            r["url"]: bytes(r["html"]).decode("utf-8", errors="replace")
            for r in self.pages.filter(
                F.col("content_type").contains("xml")).collect()
        }
        items = resolve_sitemaps(sitemap_urls, xml_pages.get)
        out = []
        for u in items:
            cu = canonicalize(u)
            if cu is not None and cu not in seeds:
                out.append(cu)
        return out

    @staticmethod
    def _path_of(url: str) -> str:
        from urllib.parse import urlsplit
        try:
            return urlsplit(url).path or "/"
        except ValueError:
            return "/"

    # -- the loop ------------------------------------------------------------

    def _loop(self, state: CrawlState, max_waves: int) -> CrawlState:
        cfg = self.cfg
        wall_start = time.monotonic()
        w = state.wave + 1
        while w < max_waves:
            # A5 Stop (WebCrawler.cs:562-664): a STOP sentinel in the work
            # dir requests a graceful stop at the next wave boundary —
            # in-flight wave finishes, state commits, resume() continues
            import os as _os
            if _os.path.exists(_os.path.join(self.store.work_dir, "STOP")):
                state.stop_requested = True
            # A4 memory guard (WebCrawler.cs:580-599): driver RSS above the
            # configured cap aborts the crawl with the reason in the manifest
            maxmb = cfg.max_memory_usage_in_mb
            if maxmb > 0 and self._memory().process_used_mb() > maxmb:
                state.error = (
                    f"InsufficientMemory: process is using "
                    f"{self._memory().process_used_mb()}mb, above the max "
                    f"configured MaxMemoryUsageInMb of {maxmb}mb")
                state.hard_stop_requested = True
            if state.hard_stop_requested or state.stop_requested:
                self.store.commit_state(state)
                break
            if (cfg.crawl_timeout_seconds > 0
                    and time.monotonic() - wall_start > cfg.crawl_timeout_seconds):
                state.hard_stop_requested = True
                break
            # the previous wave already counted this frontier — only fall
            # back to an emptiness probe when the hint is unknown (pre-hint
            # state files)
            if state.frontier_next == 0:
                break
            try:
                frontier = self.store.read_wave("frontier", w)
            except Exception:
                break  # no frontier written -> crawl complete
            if state.frontier_next < 0 and frontier.isEmpty():
                break
            state.wave = w
            self._run_wave(frontier, state)
            self.store.commit_state(state)
            # seen-set maintenance at the wave boundary (after the commit,
            # so a snapshot only ever covers durable waves; synchronous, so
            # the next wave's plan never lists files a prune is deleting)
            every = cfg.seen_compact_every_waves
            if every > 0 and (w + 1) % every == 0:
                self.store.compact_seen(
                    w + 1, cfg.seen_compact_buckets or self._nparts,
                    prune=cfg.seen_compact_prune)
            w += 1
        return state

    def _run_wave(self, frontier: DataFrame, state: CrawlState) -> None:
        cfg = self.cfg
        t0 = time.monotonic()
        wave_ts = state.sim_clock_ms
        w = state.wave
        import os as _os
        _timing = _os.environ.get("ABOT_WAVE_TIMING")

        def _cpu_jiffies() -> float:
            # machine-wide CPU-seconds burned (user+nice+system), for
            # per-stage CPU attribution under ABOT_WAVE_TIMING
            with open("/proc/stat") as fh:
                parts = fh.readline().split()
            return sum(int(x) for x in parts[1:4]) / _os.sysconf("SC_CLK_TCK")

        _last = [time.monotonic(), _cpu_jiffies() if _timing else 0.0]

        def _tick(label: str) -> None:
            if _timing:
                now, cpu = time.monotonic(), _cpu_jiffies()
                print(f"WAVETIME wave={w} {label}={now - _last[0]:.2f}s"
                      f" cpu={cpu - _last[1]:.0f}s", flush=True)
                _last[0], _last[1] = now, cpu

        # C3 politeness: per-domain quota for this wave + simulated pacing
        delays = self._effective_delays()
        due, deferred, stats_df = self._politeness_split(
            frontier, delays, wave_ts,
            n_frontier=state.frontier_next, seq_hi=state.next_seq)
        # the stats aggregate and the extract checkpoint below are
        # independent actions over the same frontier lineage (the
        # checkpoint consumes the lazy ``due`` plan, not the collected
        # numbers — those are first needed for the corpus-miss gate AFTER
        # the checkpoint lands) — run the 2-row collect on a side thread
        # so it overlaps the wave's heaviest job instead of preceding it
        from concurrent.futures import ThreadPoolExecutor as _TPE
        _stats_pool = _TPE(max_workers=1)
        stats_fut = _stats_pool.submit(
            lambda: {r["_due"]: r for r in stats_df.collect()})

        _tick("politeness")
        if self._corpus_df() is not None:
            fetched = W.fetch_wave(due, self._corpus)
        else:
            # live deployment: salted domain-bucketed mapInPandas fetch
            # (plans/fetch_live.py); the quota above already bounded this
            # wave's per-domain volume, the stage paces within the budget
            from abot_spark.plans.fetch_live import salted_fetch
            fetched = salted_fetch(due, cfg, self.fetcher, delays,
                                   wave_ts_ms=wave_ts,
                                   num_partitions=self._nparts)
        dl_hook = self._hook(self.user_download_predicate)
        ln_hook = self._hook(self.user_links_predicate)
        extracted = W.extract_wave(fetched, cfg, dl_hook, ln_hook) \
            .withColumn("task_partition_id", F.spark_partition_id()) \
            .drop("html").localCheckpoint()
        stats = stats_fut.result()
        _stats_pool.shutdown()
        d_row = stats.get(True)
        n_processed = (d_row["n"] - (d_row["n_retry"] or 0)) if d_row else 0
        n_retried = (d_row["n_retry"] or 0) if d_row else 0
        wave_elapsed_ms = int(d_row["elapsed_ms"] or 0) if d_row else 0
        n_deferred = stats[False]["n"] if False in stats else 0
        if n_deferred == 0:
            deferred = None
        # due rows' seq range: candidates' parent_seq (links, redirect
        # children, retries alike) falls inside it, so seq assignment can
        # compute its range buckets instead of sampling (one shuffle)
        seq_hint = None
        if d_row is not None and d_row["min_seq"] is not None:
            seq_hint = ("parent_seq", int(d_row["min_seq"]),
                        int(d_row["max_seq"]) + 1)
        if self._corpus is not None:
            # corpus-miss rows (fetch_wave is an inner join so the corpus
            # never re-sorts/shuffles): synthesized 404s off an anti-join
            # against the just-checkpointed fetched urls — broadcast only
            # while the due wave is below the configured threshold (the
            # build side is wave-sized, not miss-sized).  Checkpointed too
            # so the 5 downstream consumers don't replay the frontier scan
            # + quota window + anti-join each
            n_due = int(d_row["n"]) if d_row else 0
            missing = W.extract_wave(
                W.fetch_missing(due, extracted.select("url"), n_wave=n_due,
                                broadcast_rows=cfg.fetch_missing_broadcast_rows),
                cfg, dl_hook, ln_hook) \
                .withColumn("task_partition_id", F.spark_partition_id()) \
                .drop("html").localCheckpoint()
            extracted = extracted.unionByName(missing)

        _tick("fetch_extract_ckpt")
        # root redirect rewrites RootUri (ValidateRootUriForRedirection,
        # WebCrawler.cs:1277-1291) — root rows are wave-0 and few: collect
        if w == 0:
            for r in extracted.filter("is_root").select(
                    "url", "response_url").collect():
                if r["response_url"] != r["url"]:
                    state.root_authority = authority(r["response_url"])

        # audits: completed events (S6); size-dropped pages are silent
        completed = extracted.filter(~F.col("size_dropped"))
        text_cols = (
            [F.col("text")] if cfg.audit_text else
            [F.sha2(F.coalesce(F.col("text"), F.lit("")), 256).alias("text_sha"),
             F.length("text").alias("text_len")]
        )
        fetched_out = completed.select(
            "url", "seq", "depth", "parent_url", "status_code", "charset",
            *text_cols, "domain", "is_retry", "retry_count", "response_url",
            "links_reason", "task_partition_id",
            # T7 CombinePageBags (WebCrawler.cs:1055, :1067-1078): the fresh
            # CrawledPage's bag is empty, so the merged bag IS the frontier
            # row's bag — carried through the fetch join onto the audit
            "page_bag",
            F.lit(w).alias("wave"), F.lit(wave_ts).alias("wave_ts_ms"),
        )

        def _timed(label, fn, *a):
            ts = time.monotonic()
            fn(*a)
            if _timing:
                print(f"WAVETIME wave={w} write:{label}="
                      f"{time.monotonic() - ts:.2f}s", flush=True)

        # counter updates (A1/A2); counts snapshots are cumulative merged
        # totals so read the newest one
        prior_counts = None
        lastc = self.store.last_wave("counts", w - 1)
        if lastc is not None:
            prior_counts = self.store.read_wave("counts", lastc).drop("wave")
        wave_counts = due.filter(~F.col("is_retry")).groupBy("domain") \
            .agg(F.count(F.lit(1)).alias("cnt"))
        if prior_counts is not None:
            wave_counts = wave_counts.unionByName(prior_counts) \
                .groupBy("domain").agg(F.sum("cnt").alias("cnt"))

        # the fetched audit and counts snapshot depend only on the extracted
        # checkpoint / the due split — start them NOW on a side thread so
        # they overlap the schedule/admission stages instead of contending
        # with the frontier write at end of wave
        from concurrent.futures import ThreadPoolExecutor
        early_pool = ThreadPoolExecutor(max_workers=1)

        def _early_lane():
            _timed("fetched", self.store.write_wave, "fetched", w, fetched_out)
            _timed("counts", self.store.write_wave, "counts", w,
                   wave_counts.withColumn("wave", F.lit(w)))

        early_fut = early_pool.submit(_early_lane)

        _tick("fetched_audit_build")
        # candidate generation: links (T1/T3) + redirect children (T6)
        candidates = W.explode_links(extracted, cfg)
        if not cfg.is_http_request_auto_redirects_enabled:
            candidates = candidates.unionByName(
                W.redirect_candidates(extracted, cfg))
        # no checkpoint here: schedule_wave caches the decided candidate set
        # before its multiple consumers, so the link UDF runs exactly once

        _tick("links_explode_ckpt")
        retries = None
        if cfg.max_retry_count > 0:
            # cheap projection off the extracted checkpoint — no UDF rerun,
            # so no checkpoint of its own needed
            retries = W.retry_candidates(
                extracted, cfg, wave_ts,
                self._hook(self.user_recrawl_predicate))

        events = extracted.select("seq", "domain", "is_retry")
        seen = self.store.read_all("seen", w)

        _tick("schedule_build")
        # scheduling outputs belong to the wave they feed: frontier/seen/
        # disallowed land under wave=w+1 (the seed pass owns wave=0).
        # _schedule_to_fixpoint materializes the candidate base FIRST (the
        # admission plan forks into sibling stages — bloom maybe/fresh,
        # known/fresh — that would otherwise race to fill the cache
        # concurrently, re-running the link UDF per branch), then runs ONE
        # aggregate that materializes the decided cache and reads off the
        # A3 latch plus every output's row count — the counts let each
        # downstream write skip its full-cache scan when its output is
        # empty, and let seq assignment pick the volume-appropriate plan.
        # The refinement-stability bit rides the same aggregate; an
        # unstable wave (>=3-deep same-wave collision chain) re-plans with
        # one more refinement pass until the marks are a fixpoint.
        sched, crow = self._schedule_to_fixpoint(
            [F.max(F.col("budget_denied").cast("int")).alias("bd"),
             F.sum(F.col("admitted").cast("int")).alias("n_adm"),
             F.sum(F.col("_out_seen_add").cast("int")).alias("n_sa"),
             F.sum(F.col("_out_disallowed").cast("int")).alias("n_dis")],
            dict(
                candidates=candidates, retries=retries,
                frontier_events=events, seen=seen,
                prior_counts=prior_counts,
                robots_rules=(self._robots_rules
                              if not state.robots_dropped else None),
                cfg=cfg,
                budget_used=state.budget_used,
                next_seq=state.next_seq,
                latched=state.latched,
                root_authorities=self._root_authorities(state),
                wave_ts_ms=wave_ts + wave_elapsed_ms,
                num_partitions=self._nparts,
                user_link_predicate=self._hook(self.user_link_predicate),
                user_page_predicate=self._hook(self.user_page_predicate),
                seen_bloom=self._bloom_arg(),
                seq_range_hint=seq_hint,
                # broadcast gates (wave-proportional aggregates): due-wave
                # rows bound break_pos; pages-ever-admitted bounds the
                # domain snapshot
                n_wave_hint=int(d_row["n"]) if d_row else 0,
                n_domains_hint=state.next_seq,
            ))
        _tick("schedule_admission")  # cand_base fill + decided-cache agg
        any_budget_denial = bool(crow["bd"])
        n_adm = int(crow["n_adm"] or 0)
        n_seen_add = int(crow["n_sa"] or 0)
        n_dis = int(crow["n_dis"] or 0)
        # retry candidates live outside cand_cache; counting them is a
        # cheap scan of the extracted localCheckpoint (only when retries
        # are configured at all) — min(not_before_ms) rides along so the
        # end-of-wave stats need no frontier re-read (see below)
        n_retry_cand, retry_min_nb = 0, None
        if retries is not None:
            rrow = retries.agg(
                F.count(F.lit(1)).alias("n"),
                F.min("not_before_ms").alias("min_nb")).first()
            n_retry_cand = int(rrow["n"])
            retry_min_nb = rrow["min_nb"]
        # cand_cache now holds the decided rows; the pre-decision base cache
        # has no consumer left — free ~one candidate-set of executor memory
        # before the write jobs need it
        if sched["cand_base"] is not None:
            sched["cand_base"].unpersist(False)
        _tick("retry_agg")
        # small waves (all of them while a crawl ramps up) write few rows:
        # merge the output partitions so later read_all unions stay at a
        # sane file count.  n_processed is this wave's volume; candidates
        # are bounded by volume x branching.
        out_parts = self._nparts if n_processed + n_retried >= 2000 else 2
        n_next_new = n_adm + n_retry_cand
        if n_next_new == 0:
            admitted = self.spark.createDataFrame([], FRONTIER_SCHEMA)
        else:
            admitted = sched["seq_assigned"](n_next_new) \
                .withColumn("wave", F.lit(w + 1)) \
                .select([f.name for f in FRONTIER_SCHEMA.fields]) \
                .coalesce(out_parts)
        next_frontier = admitted
        if deferred is not None:
            next_frontier = next_frontier.unionByName(
                deferred.withColumn("wave", F.lit(w + 1))
                .select([f.name for f in FRONTIER_SCHEMA.fields])
                .coalesce(out_parts))
        # empty outputs skip the write altogether: read_all tolerates a
        # missing wave dir (os.path.exists filter), and a committed state
        # with no disallowed/seen dir means "none this wave" on resume —
        # an empty-DataFrame parquet write still costs a job + committer
        # round trip (~0.4 s under concurrent write lanes, measured)
        seen_out = sched["seen_add"].coalesce(out_parts) if n_seen_add \
            else None
        dis_out = sched["disallowed"].coalesce(out_parts) if n_dis else None
        # two-lane write pool: measured on this box, 6 concurrent Spark jobs
        # at local[16] take MORE wall than running them serially (fair-share
        # scheduling slices every job thin and the driver threads contend on
        # the GIL for the Arrow collect inside bloom_absorb).  One lane runs
        # the single heavy job (frontier = assign_seq shuffle + write), the
        # other drains the cheap appends serially — 2 jobs in flight max
        # (fetched/counts already ran on the early lane, overlapped with the
        # admission stages).
        def _light_lane():
            if seen_out is not None:
                _timed("seen", self.store.write_wave, "seen", w + 1, seen_out)
            if dis_out is not None:
                _timed("disallowed", self.store.write_wave,
                       "disallowed", w + 1, dis_out)
            _timed("bloom_absorb", self._absorb_seen_wave,
                   w + 1, sched["seen_add"], n_seen_add,
                   state.seen_count + n_seen_add)

        with early_pool:
            with ThreadPoolExecutor(max_workers=2) as pool:
                futs = [
                    pool.submit(_timed, "frontier", self.store.write_wave,
                                "frontier", w + 1, next_frontier),
                    pool.submit(_light_lane),
                ]
                for f in futs:
                    f.result()
            early_fut.result()
        sched["cand_cache"].unpersist(False)

        _tick("wave_writes")
        # every next-frontier statistic the loop needs is already known —
        # no re-read of the just-written frontier:
        #   row count       = admitted links + retry candidates + deferred
        #   retry count     = retry candidates + retries among deferred
        #   min not_before  = only consulted when NO link was admitted
        #     (admitted links carry not_before = wave_ts + elapsed, which
        #     never exceeds the advanced sim clock), so min over (retry
        #     candidates, deferred) — both aggregated upstream — covers it
        d_def = stats.get(False)
        n_frontier_next = n_next_new + n_deferred
        state.frontier_next = n_frontier_next
        n_new_retries = n_retry_cand + int(
            (d_def["n_retry"] or 0) if d_def is not None else 0)
        min_due = None
        if n_adm == 0:
            nbs = [v for v in (
                retry_min_nb if n_retry_cand else None,
                d_def["min_nb"] if d_def is not None else None,
            ) if v is not None]
            min_due = min(nbs) if nbs else None
        n_admitted = n_frontier_next - n_deferred

        state.crawled_count += n_processed
        state.retried_count += n_retried
        state.seen_count += n_seen_add
        state.next_seq += n_admitted
        # CrawledCount + Scheduler.Count at the start of the next wave
        state.budget_used = state.crawled_count + n_frontier_next
        state.latched = state.latched or any_budget_denial

        # simulated clock: politeness pacing; jump to the earliest
        # not_before if everything queued is in the future
        state.sim_clock_ms = wave_ts + max(wave_elapsed_ms, 1)
        if (n_frontier_next > 0 and min_due is not None
                and min_due > state.sim_clock_ms):
            state.sim_clock_ms = min_due
        _tick("wave_stats")

        state.metrics.append({
            "wave": w, "due": n_processed + n_retried,
            "deferred": n_deferred,
            "admitted": n_admitted, "retries": n_new_retries,
            "frontier_next": n_frontier_next,
            "sim_ms": state.sim_clock_ms,
            "wall_ms": int((time.monotonic() - t0) * 1000),
        })

    # -- politeness (C3) -----------------------------------------------------

    def _effective_delays(self) -> dict[str, int]:
        """max(robots crawl-delay [capped], config min) per domain
        (DomainRateLimiter.cs:41-49 + PoliteWebCrawler.cs:146-167); the
        +20ms fudge of the reference is a thread-wakeup artifact, not a
        semantic, and is dropped."""
        base = self.cfg.min_crawl_delay_per_domain_milli_seconds
        delays = dict(self._robots_delay_ms)
        if base > 0:
            for dom in list(delays):
                delays[dom] = max(delays[dom], base)
        return delays

    def _politeness_split(self, frontier: DataFrame, delays: dict[str, int],
                          wave_ts: int, n_frontier: int = -1,
                          seq_hi: int = 0):
        """Per-domain per-wave quota: at most
        ``wave_seconds*1000/delay_ms`` fetches per domain per wave, FIFO by
        seq; the remainder defers to the next wave keeping its seq (per-
        domain FIFO preserved).  A future ``not_before_ms`` (Retry-After)
        never defers a row — the wave fetches it in place and the
        simulated clock absorbs the wait via ``elapsed_ms`` (matching the
        reference's WaitMinimumRetryDelay, which blocks the dequeued page;
        see the comment at the branch below).

        Returns ``(due, deferred, stats_df)`` — all lazy.  ``stats_df`` is
        a <=2-row aggregate the caller collects ONCE per wave: per is-due
        side it carries the row count, retry count, and the simulated
        politeness elapsed (max over domains of count x delay).  Bundling
        these replaces three separate driver actions (deferred emptiness,
        elapsed, processed/retried counts).

        ``n_frontier``/``seq_hi`` (this wave's frontier row count and the
        exclusive upper bound of its ``seq`` values — both known to the
        wave loop for free) switch the per-domain rank to the bucketed
        two-phase plan above ``politeness_rank_scale_rows``, so a hot Zipf
        domain never becomes one giant window partition."""
        cfg = self.cfg
        base = cfg.min_crawl_delay_per_domain_milli_seconds

        delays_df = self._robots_delays_df
        have_delays = bool(delays) or delays_df is not None
        delay_col = F.lit(base)
        if delays_df is not None:
            # scale mode (per-domain robots): Crawl-delays come from the
            # distributed rules table — a join on domain, not a driver-
            # built literal map (millions of domains would not fit one).
            # The joined column RIDES ON the due rows (not dropped) so the
            # live-fetch stage's in-partition pacing sees the same
            # per-domain delay without a second join (fetch_live.py).
            frontier = frontier.join(delays_df, "domain", "left")
            delay_col = F.greatest(
                F.coalesce(F.col("_robots_delay_ms"), F.lit(0)), F.lit(base))
        elif delays:
            delay_map = F.create_map(
                *[F.lit(x) for kv in delays.items() for x in kv])
            delay_col = F.greatest(
                F.coalesce(delay_map.getItem(F.col("domain")), F.lit(0)),
                F.lit(base))

        # A future not_before_ms (Retry-After) never DEFERS a row to a
        # later wave: the reference's WaitMinimumRetryDelay blocks the
        # dequeued page in place (WebCrawler.cs:1237-1271), so under the
        # serial order the wait delays TIME, not ORDER — deferring would
        # let later-seq retries leapfrog and hand their children earlier
        # seqs than the serial loop gives.  The wave fetches the row and
        # the simulated clock absorbs the wait (elapsed_ms below).
        if not have_delays and base <= 0:
            due, deferred = frontier, None
            tagged = frontier.withColumn("_due", F.lit(True)) \
                             .withColumn("_delay", F.lit(0))
        else:
            quota = F.when(
                delay_col > 0,
                F.greatest(F.floor(F.lit(cfg.wave_seconds * 1000) / delay_col),
                           F.lit(1)),
            ).otherwise(F.lit(1 << 62))

            scale = (cfg.politeness_rank_scale_rows > 0
                     and n_frontier >= cfg.politeness_rank_scale_rows
                     and seq_hi > 0)
            if scale:
                ranked = W.domain_quota_rank(
                    frontier, cfg.frontier_order, self._nparts, seq_hi,
                    quota, delay_col)
            else:
                from pyspark.sql import Window
                # GetNext order under quota truncation: FIFO (reference
                # contract) or priority (depth asc, delay asc, seq) — see
                # CrawlConfig.frontier_order.  delay is constant within a
                # domain partition, so it only matters if a caller reuses
                # the ordering globally; kept for the documented key shape.
                if cfg.frontier_order == "priority":
                    ord_cols = [F.col("depth").asc(), delay_col.asc(),
                                F.col("seq").asc()]
                else:
                    ord_cols = [F.col("seq").asc()]
                w_dom = Window.partitionBy("domain").orderBy(*ord_cols)
                ranked = frontier.withColumn(
                    "_qrank", F.row_number().over(w_dom).cast("long")) \
                    .withColumn("_quota", quota) \
                    .withColumn("_delay", delay_col)
            is_due = (F.coalesce(F.col("_qrank"), F.lit(1 << 62))
                      <= F.col("_quota"))
            # keep _robots_delay_ms on `due`: the live-fetch stage paces
            # with it (dropped before rows reach the frontier schema)
            due = ranked.filter(is_due).drop("_qrank", "_quota", "_delay")
            deferred = ranked.filter(~is_due).drop(
                "_qrank", "_quota", "_delay", "_robots_delay_ms")
            tagged = ranked.withColumn("_due", is_due)

        stats_df = (
            tagged.groupBy("_due", "domain")
            .agg(F.count(F.lit(1)).alias("_cnt"),
                 F.sum(F.col("is_retry").cast("int")).alias("_retry"),
                 F.first("_delay").alias("_d"),
                 F.min("seq").alias("_min_seq"),
                 F.max("seq").alias("_max_seq"),
                 F.min("not_before_ms").alias("_min_nb"),
                 F.max("not_before_ms").alias("_max_nb"))
            .groupBy("_due")
            .agg(F.sum("_cnt").alias("n"),
                 F.sum("_retry").alias("n_retry"),
                 # wave duration = politeness pacing OR the longest
                 # Retry-After wait served in place, whichever dominates
                 F.greatest(
                     F.max(F.col("_cnt") * F.col("_d")),
                     F.greatest(F.max("_max_nb") - F.lit(wave_ts), F.lit(0))
                 ).alias("elapsed_ms"),
                 F.min("_min_seq").alias("min_seq"),
                 F.max("_max_seq").alias("max_seq"),
                 F.min("_min_nb").alias("min_nb"))
        )
        return due, deferred, stats_df
