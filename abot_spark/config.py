"""Crawl configuration — mirrors Abot's ``CrawlConfiguration`` knobs.

Reference: ``Abot/Poco/CrawlConfiguration.cs`` (defaults at :38-50, the
``IsPayAttention`` "0 disables" convention at :72-75).  The dataclass is
frozen so it can be captured by closures shipped to executors (broadcast by
value inside pandas UDFs) without mutation hazards.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import Any


def is_pay_attention(value: int | float, not_pay_attention: int = 0) -> bool:
    """Abot's convention: a limit is active only when > 0.

    Reference: ``Abot/Poco/CrawlConfiguration.cs:72-75``.
    """
    return value > not_pay_attention


@dataclass(frozen=True)
class CrawlConfig:
    """Knob names & defaults follow ``CrawlConfiguration`` (ctor :38-50).

    Snake_cased; only knobs that affect crawl *semantics* are kept (HTTP
    transport knobs like ssl validation have no meaning against a corpus
    table and are accepted but unused).
    """

    # -- crawl behavior ----------------------------------------------------
    max_concurrent_threads: int = 10          # informational; Spark tasks rule
    max_pages_to_crawl: int = 1000            # 0 disables
    max_pages_to_crawl_per_domain: int = 0    # 0 disables
    max_page_size_in_bytes: int = 0           # 0 disables
    user_agent_string: str = (
        "Mozilla/5.0 (Windows NT 6.3; Trident/7.0; rv:11.0) like Gecko"
    )
    max_crawl_depth: int = 100
    max_links_per_page: int = 0               # 0 disables
    crawl_timeout_seconds: int = 0            # 0 disables
    downloadable_content_types: str = "text/html"
    is_uri_recrawling_enabled: bool = False
    is_external_page_crawling_enabled: bool = False
    is_external_page_links_crawling_enabled: bool = False
    http_service_point_connection_limit: int = 200
    http_request_timeout_in_seconds: int = 15
    http_request_max_auto_redirects: int = 7
    is_http_request_auto_redirects_enabled: bool = True
    is_http_request_automatic_decompression_enabled: bool = False
    is_send_cookies_enabled: bool = False
    # HTTP Basic auth on every request when enabled (the reference's
    # CrawlConfiguration.IsAlwaysLogin/LoginUser/LoginPassword,
    # PageRequester.cs:209-216: Authorization: Basic base64(user:password))
    is_always_login: bool = False
    login_user: str = ""
    login_password: str = ""
    is_ssl_certificate_validation_enabled: bool = True
    is_respect_url_named_anchor_or_hashbang_enabled: bool = False
    # parser backend, like the reference's HAP vs AngleSharp choice
    # (Abot/Core/Parsers/AngleSharpHyperLinkParser.cs:87-106): "scanner"
    # (regex single-pass, fast path) or "parser" (stdlib html.parser);
    # both pass the same HyperlinkParserTest matrix
    link_parser_backend: str = "scanner"
    configuration_extensions: dict[str, str] = field(default_factory=dict)

    # -- politeness ---------------------------------------------------------
    is_respect_robots_dot_text_enabled: bool = False
    is_respect_meta_robots_no_follow_enabled: bool = False
    is_respect_http_x_robots_tag_header_no_follow_enabled: bool = False
    is_respect_anchor_rel_no_follow_enabled: bool = False
    is_ignore_robots_dot_text_if_root_disallowed_enabled: bool = False
    robots_dot_text_user_agent_string: str = "abot"
    max_robots_dot_text_crawl_delay_in_seconds: int = 5
    min_crawl_delay_per_domain_milli_seconds: int = 0

    # -- retry --------------------------------------------------------------
    max_retry_count: int = 0
    min_retry_delay_in_milliseconds: int = 0

    # -- memory guard (A4, driver-side; CrawlConfiguration.cs:38-50) --------
    max_memory_usage_in_mb: int = 0                  # 0 disables
    min_available_memory_required_in_mb: int = 0     # 0 disables
    max_memory_usage_cache_time_in_seconds: int = 2

    # -- engine-specific (no Abot equivalent) -------------------------------
    frontier_order: str = "fifo"      # GetNext order when the politeness
    # quota truncates a domain's wave: "fifo" = strict enqueue order
    # (QueueOfPagesToCrawlRepository FIFO contract,
    # Abot/Core/Repositories/QueueOfPagesToCrawlRepository.cs:15-55) or
    # "priority" = (depth asc, crawl_delay asc, seq) — shallow pages and
    # cheap domains first, the priority-queue frontier variant.  The BFS
    # wave loop is already a global depth-priority queue (all of wave w
    # before w+1); this knob additionally prioritizes WITHIN a truncated
    # wave, where deferred/retry/redirect rows make depths heterogeneous.
    audit_text: bool = True           # False: fetched audit stores sha256+len
                                      # instead of the full text (scale mode:
                                      # the corpus already holds the bytes)
    wave_seconds: float = 60.0        # politeness quota horizon per wave
    politeness_rank_scale_rows: int = 2_000_000  # frontier rows above which
                                      # the per-domain quota rank switches
                                      # from a plain window (one partition
                                      # per domain — a hot Zipf domain
                                      # becomes one giant sort) to the
                                      # two-phase bucketed rank
                                      # (plans/wave.py:domain_quota_rank);
                                      # 0 = always plain
    dedup_refinement_passes: int = 2  # total _decision_chain passes when a
                                      # marking-dependent config (link cap /
                                      # budget / domain cap / user page gate)
                                      # is active: pass r re-derives the
                                      # in-wave dedup column from pass r-1's
                                      # EXACT marks and budget-consumes only
                                      # pass-r-1-iterated links.  2 is exact
                                      # for every case the 100-seed shaped
                                      # collision sweeps reach; raise to
                                      # push >=3-deep same-wave interaction
                                      # chains toward the serial fixpoint
                                      # (each extra pass costs one chain
                                      # re-run on the wave's candidates);
                                      # 1 = row-local marks only (the
                                      # pre-round-3 corners come back)
    dedup_refinement_max_passes: int = 16  # fixpoint bound: when the final
                                      # refinement pass reports unstable
                                      # marks (_refine_changed — read free
                                      # off the admission aggregate), the
                                      # wave re-plans with one more pass,
                                      # up to this many.  The chain is a
                                      # causal Jacobi iteration, so it
                                      # converges in <= the longest same-
                                      # wave collision chain; 16 covers
                                      # any plausible wave (the 100-seed
                                      # shaped sweeps never need >2).
    fetch_missing_broadcast_rows: int = 1_000_000  # due-wave rows up to which
                                      # the corpus-miss anti-join broadcasts
                                      # the fetched-url set (urls only, so
                                      # ~100 B/row -> <=100 MB build); above,
                                      # no hint — AQE picks shuffle vs
                                      # broadcast from the real measured size
    link_cap_broadcast_rows: int = 1_000_000  # due-wave rows up to which the
                                      # link-cap pass broadcasts its break_pos
                                      # map (one (long,long) row per capped
                                      # parent, bounded by the wave's page
                                      # count); above, no hint — AQE decides
                                      # from the real aggregate size.  Same
                                      # gate pattern as fetch_missing.
    domain_cap_broadcast_rows: int = 1_000_000  # admitted-pages-ever bound up
                                      # to which the domain-cap pass
                                      # broadcasts the prior CrawlCountByDomain
                                      # snapshot (one row per domain ever
                                      # crawled <= pages ever admitted);
                                      # above, plain join — AQE decides.
    shuffle_partitions: int = 0       # 0 = inherit spark.sql.shuffle.partitions
    arrow_max_records_per_batch: int = 512  # UDF batch rows; default sized
                                      # for MB-scale html cells — raise for
                                      # small-page corpora (batch bytes =
                                      # rows x avg cell size)
    cache_compressed: bool = False    # in-memory columnar compression for
                                      # the per-wave candidate cache.  The
                                      # cache is written once and read 3-4x
                                      # within the same wave, then dropped:
                                      # A/B on the 230k-page corpus showed
                                      # compression costs ~12% of wave wall
                                      # (tools/ab_wave_configs.py); executor
                                      # memory is not the binding resource
                                      # for a transient single-wave cache
    seen_buckets: int = 64            # hash buckets for the seen-set table
    domain_salt: int = 8              # salt factor for skewed-domain fetch
    bloom_expected_items: int = 10_000_000
    bloom_fpp: float = 0.01
    bloom_n_shards: int = 64          # pow2 shard count for the sharded
    # seen-set bloom sidecar (store.BloomSeenShards).  Size so one shard
    # stays comfortably loadable per probing task: at the 10^10-URL north
    # star a 1%-FPP filter is ~12 GB total — 4096 shards of ~3 MB each,
    # absorbed and probed bucket-locally; nothing driver-held or broadcast.
    use_seen_bloom: bool = True       # bloom sidecar prunes the seen-join
    seen_bloom_min_rows: int = 20_000_000
    # ^ engage the bloom fork only once the seen table outgrows broadcast
    # size (20M hashes = 160 MB of longs).  Below that, Catalyst broadcasts
    # the seen keys into a shuffle-free left join and the LINEAR plan wins:
    # the bloom fork costs a base cache, a probe UDF over every candidate,
    # and a forced wide repartition.  Above it, the fork pays for itself by
    # keeping definitely-new candidates out of the (now shuffled /
    # storage-partitioned) exact join.  The sidecar is maintained lazily:
    # dormant (no absorb jobs, no snapshots) until the seen-set reaches
    # this size, then one catch-up absorb folds the accumulated table.
    seen_compact_every_waves: int = 0   # 0 = off; N = rewrite the per-wave
    # seen appends into one hash-bucketed snapshot every N waves (Iceberg
    # rewrite_data_files + expire_snapshots on the parquet stand-in).  A
    # long crawl otherwise accumulates one directory per wave and the
    # anti-join probe pays file-listing + footer reads across all of them.
    seen_compact_buckets: int = 0       # 0 = use the wave shuffle width
    seen_compact_prune: bool = True     # drop superseded per-wave dirs

    def with_(self, **kw: Any) -> "CrawlConfig":
        return replace(self, **kw)

    # convenience predicates mirroring IsPayAttention call sites
    @property
    def max_pages_active(self) -> bool:
        return is_pay_attention(self.max_pages_to_crawl)

    @property
    def max_pages_per_domain_active(self) -> bool:
        return is_pay_attention(self.max_pages_to_crawl_per_domain)

    @property
    def max_page_size_active(self) -> bool:
        return is_pay_attention(self.max_page_size_in_bytes)

    @property
    def max_links_per_page_active(self) -> bool:
        return is_pay_attention(self.max_links_per_page)
