"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes the engine's operators over the driver's
pre-registered tables (``documents``/``embeddings``/``events``/``lineitem``
+ a URL table derived *deterministically in SQL* from ``documents``, so the
DuckDB oracle can reproduce it exactly).  Two groups:

1. crawl-engine operators (SURVEY.md §2): seen-set anti-join, per-domain
   caps, budget cutoffs, decision chains F1/F3 with byte-identical reason
   strings, FIFO ordering, politeness quotas, retry backoff, MD5-prefix
   seen keys (``Abot/Core/Repositories/CrawledUrlRepository.cs:58-76``).
2. training-data pipeline operators: exact/minhash/simhash/ngram dedup,
   brute-force + IVF cosine top-k, language-ID, quality scoring, token
   counting, fingerprinting, sessionization, and the multimodal
   ``mapInPandas`` feature extractor (rows-only check: byte-level decode
   is not SQL-expressible) plus the crawl text/link UDFs driven through
   SQL-constructible fixtures.

Cross-engine determinism: md5-hex string hashing, round(…,4) floats,
total-order tie-breaks everywhere (see ``abot_spark/ops/textstats.py``).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from abot_spark.config import CrawlConfig
from abot_spark.operators.decisions import (
    reason_should_crawl_page,
    reason_should_crawl_page_links,
    reason_should_download_page_content,
)
from abot_spark.ops import dedup as D
from abot_spark.ops import similarity as S
from abot_spark.ops import textstats as T
from abot_spark.ops.multimodal import (
    extract_media_features, resize_images, sample_frames, synth_media,
)

CFG = CrawlConfig()

# sign-bit LSH signature over the first 6 embedding dims (1-based in SQL;
# must mirror abot_spark.ops.similarity.sign_signature bit-for-bit)
_SIGN_SIG_SQL = " + ".join(
    f"(CASE WHEN embedding[{j + 1}] >= 0 THEN {1 << j} ELSE 0 END)"
    for j in range(6))


# ---------------------------------------------------------------------------
# the derived URL table (identical arithmetic in Spark and the SQL oracle)
# ---------------------------------------------------------------------------

def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    dom_idx = F.col("doc_id") % 20
    scheme = F.when(F.col("doc_id") % 17 == 0, F.lit("ftp")) \
        .otherwise(F.lit("http"))
    return d.select(
        "doc_id",
        F.concat(scheme, F.lit("://d"), dom_idx, F.lit(".example.com/p/"),
                 F.col("doc_id")).alias("url"),
        F.concat(F.lit("d"), dom_idx, F.lit(".example.com")).alias("domain"),
        F.col("doc_id").alias("seq"),
        (F.col("doc_id") % 120).cast("int").alias("depth"),
        (F.col("doc_id") % 3).cast("int").alias("wave"),
        (F.col("doc_id") % 11 != 0).alias("is_internal"),
        (F.col("doc_id") % 10).cast("int").alias("redirect_position"),
        F.when(F.col("doc_id") % 9 == 0, F.lit("http://r.example.com/"))
        .otherwise(F.lit(None).cast("string")).alias("redirected_from"),
        F.element_at(
            F.array(F.lit(200), F.lit(301), F.lit(404), F.lit(503)),
            (F.col("doc_id") % 4 + 1).cast("int")).alias("status_code"),
        F.element_at(
            F.array(F.lit("text/html; charset=utf-8"), F.lit("text/html"),
                    F.lit("text/html; charset=utf-8"), F.lit("image/png"),
                    F.lit("text/plain")),
            (F.col("doc_id") % 5 + 1).cast("int")).alias("content_type"),
        F.col("n_chars").alias("content_length"),
        (F.col("doc_id") % 7).cast("int").alias("retry_after_s"),
        ((dom_idx % 3) * 1000).cast("int").alias("delay_ms"),
    )


_URLS_SQL = """
SELECT doc_id,
       (CASE WHEN doc_id % 17 = 0 THEN 'ftp' ELSE 'http' END)
         || '://d' || (doc_id % 20) || '.example.com/p/' || doc_id AS url,
       'd' || (doc_id % 20) || '.example.com' AS domain,
       doc_id AS seq,
       CAST(doc_id % 120 AS INT) AS depth,
       CAST(doc_id % 3 AS INT) AS wave,
       doc_id % 11 <> 0 AS is_internal,
       CAST(doc_id % 10 AS INT) AS redirect_position,
       CASE WHEN doc_id % 9 = 0 THEN 'http://r.example.com/' END
         AS redirected_from,
       [200, 301, 404, 503][CAST(doc_id % 4 AS INT) + 1] AS status_code,
       ['text/html; charset=utf-8', 'text/html',
        'text/html; charset=utf-8', 'image/png',
        'text/plain'][CAST(doc_id % 5 AS INT) + 1] AS content_type,
       n_chars AS content_length,
       CAST(doc_id % 7 AS INT) AS retry_after_s,
       CAST((doc_id % 20 % 3) * 1000 AS INT) AS delay_ms
FROM documents
"""

_NORM_SQL = ("trim(regexp_replace(regexp_replace(lower(text),"
             " '[^a-z0-9 ]', '', 'g'), '\\s+', ' ', 'g'))")


def _shingles_sql(n: int = 3) -> str:
    """DuckDB expression for distinct word n-grams of normalized text."""
    return (
        "list_distinct(list_transform("
        f"range(0, greatest(len(string_split({_NORM_SQL}, ' ')) - {n}, 0) + 1),"
        f" i -> array_to_string(list_slice(string_split({_NORM_SQL}, ' '),"
        f" i + 1, i + {n}), ' ')))"
    )


# ---------------------------------------------------------------------------
# crawl-engine queries
# ---------------------------------------------------------------------------

def q_crawl_seen_antijoin(spark, sf_dir):
    """T5/T8: candidate links vs the seen-set — LEFT ANTI JOIN on the
    MD5-prefix compact key (CrawledUrlRepository semantics)."""
    u = _urls(spark, sf_dir)
    key = F.substring(F.md5("url"), 1, 16)
    seen = u.filter(F.col("doc_id") % 2 == 0) \
        .select(key.alias("seen_key")).distinct()
    cand = u.select("url", key.alias("seen_key"))
    return cand.join(seen, "seen_key", "left_anti") \
        .select("url").orderBy("url")


def q_crawl_seen_hash_key(spark, sf_dir):
    """T8: the seen-set key + bucket derivation (bucketed storage layout)."""
    u = _urls(spark, sf_dir)
    key = F.substring(F.md5("url"), 1, 16)
    return u.select(
        "url", key.alias("seen_key"),
        (F.ascii(F.substring(key, 1, 1)) % 16).alias("bucket"),
    ).orderBy("url")


def q_crawl_domain_cap(spark, sf_dir):
    """F1 per-domain cap as a deterministic window (MaxPagesToCrawlPerDomain)."""
    u = _urls(spark, sf_dir)
    w = Window.partitionBy("domain").orderBy("seq")
    return u.withColumn("domain_rank", F.row_number().over(w)) \
        .filter(F.col("domain_rank") <= 5) \
        .select("domain", "url", "domain_rank").orderBy("domain", "domain_rank")


def q_crawl_budget_cutoff(spark, sf_dir):
    """F1 global MaxPagesToCrawl cutoff: first-N in FIFO (wave, seq) order."""
    u = _urls(spark, sf_dir)
    w = Window.orderBy("wave", "seq")
    return u.withColumn("admission_rank", F.row_number().over(w)) \
        .filter(F.col("admission_rank") <= 100) \
        .select("url", "admission_rank").orderBy("admission_rank")


def q_crawl_decisions_f1(spark, sf_dir):
    """F1 ShouldCrawlPage chain with byte-identical reason strings."""
    u = _urls(spark, sf_dir)
    reason = reason_should_crawl_page(
        CFG,
        redirected_from=F.col("redirected_from"),
        redirect_position=F.col("redirect_position"),
        depth=F.col("depth"),
        is_retry=F.lit(False),
        is_internal=F.col("is_internal"),
    )
    return u.select(
        "url", reason.alias("reason"),
        reason.isNull().alias("allow"),
    ).orderBy("url")


def q_crawl_f3_content_gate(spark, sf_dir):
    """F3 ShouldDownloadPageContent with .NET status-name reasons."""
    u = _urls(spark, sf_dir)
    reason = reason_should_download_page_content(
        CFG,
        has_response=F.lit(True),
        status_code=F.col("status_code"),
        content_type=F.col("content_type"),
        content_length=F.col("content_length").cast("long"),
    )
    return u.select("url", reason.alias("reason"),
                    reason.isNull().alias("allow")).orderBy("url")


def q_crawl_count_by_domain(spark, sf_dir):
    """A2 CrawlCountByDomain."""
    u = _urls(spark, sf_dir)
    return u.groupBy("domain").agg(F.count(F.lit(1)).alias("cnt")) \
        .orderBy("domain")


def q_crawl_fifo_order(spark, sf_dir):
    """Deterministic FIFO parity ordering: rank by (wave, seq)."""
    u = _urls(spark, sf_dir)
    w = Window.orderBy("wave", "seq")
    return u.select("url", "wave", "seq") \
        .withColumn("fifo_rank", F.row_number().over(w)) \
        .filter(F.col("fifo_rank") <= 50).orderBy("fifo_rank")


def q_crawl_politeness_quota(spark, sf_dir):
    """C3: per-domain per-wave fetch quota = wave_seconds*1000/delay."""
    u = _urls(spark, sf_dir)
    quota = F.when(F.col("delay_ms") > 0,
                   F.floor(60000 / F.col("delay_ms"))).otherwise(F.lit(1 << 40))
    w = Window.partitionBy("domain").orderBy("seq")
    return u.withColumn("qrank", F.row_number().over(w)) \
        .filter(F.col("qrank") <= quota) \
        .select("domain", "url", "qrank").orderBy("domain", "qrank")


def q_crawl_priority_order(spark, sf_dir):
    """Priority-frontier GetNext (``CrawlConfig.frontier_order='priority'``):
    when the per-wave politeness quota truncates a domain, pop
    ``(depth asc, crawl_delay asc, seq)`` instead of FIFO ``seq`` — shallow
    pages first (IScheduler.cs:8 "managing the priority of what pages need
    to be crawled"; engine: crawler.py politeness split)."""
    u = _urls(spark, sf_dir)
    w = Window.partitionBy("domain").orderBy("depth", "delay_ms", "seq")
    return u.withColumn("pop_rank", F.row_number().over(w)) \
        .withColumn("due", F.col("pop_rank") <= 3) \
        .select("domain", "url", "pop_rank", "due") \
        .orderBy("domain", "pop_rank")


def q_crawl_retry_backoff(spark, sf_dir):
    """F5: failed fetches → not_before = max(Retry-After, MinRetryDelay)."""
    u = _urls(spark, sf_dir)
    failed = u.filter(F.col("status_code") >= 400)
    not_before = F.greatest(F.col("retry_after_s") * 1000, F.lit(2000))
    return failed.select(
        "url", "status_code",
        not_before.cast("long").alias("not_before_ms"),
        F.ceil(not_before / 60000).cast("long").alias("eligible_wave"),
    ).orderBy("url")


def q_crawl_redirect_resolve(spark, sf_dir):
    """T6 auto-redirect chain resolution (``prepare_corpus`` shape,
    ``WebCrawler.cs:1300-1323`` / ``PageRequester`` AllowAutoRedirect): a
    bounded loop of self-joins follows Location chains to the landing
    page.  Chain structure is derived deterministically from doc_id
    (redirect unless doc_id%5==0, target doc_id+1), so the DuckDB oracle
    can state the closed-form fixpoint the iterative join must reach —
    including dangling targets past the last doc (404/WebException in the
    engine)."""
    u = _urls(spark, sf_dir).select("doc_id", "url")
    base = u.withColumn("is_redirect", F.col("doc_id") % 5 != 0)
    tgt = base.select(F.col("doc_id").alias("t_id"),
                      F.col("is_redirect").alias("t_redirect"))
    cur = base.select(
        "url", F.col("doc_id").alias("cur_id"),
        F.col("is_redirect").alias("cur_redirect"),
        F.lit(0).alias("hops"), F.lit(False).alias("dangling"))
    # each hop references ``cur`` exactly ONCE (a guarded left join over
    # all rows, stepping only where still open) — a split-and-union
    # formulation references it twice per hop, doubling the plan per
    # iteration (2^hops copies of the scan by hop 7)
    for _ in range(CFG.http_request_max_auto_redirects):
        stepping = F.col("cur_redirect") & ~F.col("dangling")
        cur = cur.join(tgt, cur["cur_id"] + 1 == tgt["t_id"], "left").select(
            "url",
            F.when(stepping, F.coalesce(F.col("t_id"), F.col("cur_id")))
            .otherwise(F.col("cur_id")).alias("cur_id"),
            F.when(stepping, F.coalesce("t_redirect", F.lit(False)))
            .otherwise(F.col("cur_redirect")).alias("cur_redirect"),
            F.when(stepping, F.col("hops") + 1)
            .otherwise(F.col("hops")).alias("hops"),
            F.when(stepping, F.col("t_id").isNull())
            .otherwise(F.col("dangling")).alias("dangling"),
        )
    return cur.select(
        "url", F.col("cur_id").alias("final_doc_id"),
        F.col("hops").cast("int").alias("hops"), "dangling",
    ).orderBy("url")


def q_crawl_f2_links_gate(spark, sf_dir):
    """F2 ShouldCrawlPageLinks chain (CrawlDecisionMaker.cs:95-114) with
    byte-identical reason strings; note the ``>=`` depth check vs F1's
    ``>``.  Page text is blanked deterministically for doc_id%13==0 to
    exercise the no-content branch."""
    d = _docs(spark, sf_dir)
    text_eff = F.when(F.col("doc_id") % 13 == 0, F.lit("")) \
        .otherwise(F.col("text"))
    reason = reason_should_crawl_page_links(
        CFG,
        text=text_eff,
        is_internal=F.col("doc_id") % 11 != 0,
        depth=(F.col("doc_id") % 120).cast("int"),
    )
    return d.select(
        "doc_id", reason.alias("reason"), reason.isNull().alias("allow"),
    ).orderBy("doc_id")


def q_crawl_robots_gate(spark, sf_dir):
    """F6 robots gate: longest-match allow/disallow verdict
    (RobotsDotTextTest contract) evaluated by the vectorized robots UDF
    over per-domain rule arrays arriving via broadcast join.  Domains with
    dom_idx%4==0 carry Disallow:/p/ + Allow:/p/2 — the longer allow rule
    wins for paths under /p/2 (wildcard-group non-inheritance fixture
    shape)."""
    from abot_spark.functions.udfs import robots_allowed_col
    u = _urls(spark, sf_dir)
    gated = (F.col("doc_id") % 20) % 4 == 0
    arr_t = "array<string>"
    allow_rules = F.when(gated, F.array(F.lit("/p/2"))) \
        .otherwise(F.lit(None).cast(arr_t))
    dis_rules = F.when(gated, F.array(F.lit("/p/"))) \
        .otherwise(F.lit(None).cast(arr_t))
    path = F.concat(F.lit("/p/"), F.col("doc_id"))
    return u.select(
        "url",
        robots_allowed_col(path, allow_rules, dis_rules).alias("allowed"),
    ).orderBy("url")


def q_crawl_link_cap(spark, sf_dir):
    """T4 MaxLinksPerPage: the cap counts *scheduled* (admitted) links in
    document order (WebCrawler.cs:1138-1166) — a row_number window over
    the post-decision survivors, here capped at 2 with a deterministic
    pos%3 admission stand-in."""
    u = _urls(spark, sf_dir)
    exploded = u.select(
        "url", F.posexplode(F.sequence(
            F.lit(0), (F.col("doc_id") % 7).cast("int"))).alias("pos", "_v"),
    ).filter(F.col("pos") % 3 != 0)
    w = Window.partitionBy("url").orderBy("pos")
    return exploded.withColumn("sched_rank", F.row_number().over(w)) \
        .filter(F.col("sched_rank") <= 2) \
        .select("url", F.col("pos").cast("int").alias("link_pos"),
                F.col("sched_rank").cast("int").alias("sched_rank")) \
        .orderBy("url", "link_pos")


# ---------------------------------------------------------------------------
# training-data pipeline queries
# ---------------------------------------------------------------------------

def q_dedup_exact(spark, sf_dir):
    return D.exact_dedup(_docs(spark, sf_dir)).orderBy("doc_id")


def q_dedup_minhash_bands(spark, sf_dir):
    return D.minhash_bands(_docs(spark, sf_dir), k=8, bands=4) \
        .orderBy("doc_id", "band")


def q_dedup_minhash_pairs(spark, sf_dir):
    return D.minhash_candidate_pairs(_docs(spark, sf_dir), k=8, bands=4) \
        .orderBy("doc_a", "doc_b")


def q_dedup_simhash(spark, sf_dir):
    return D.simhash(_docs(spark, sf_dir), bits=16).orderBy("doc_id")


def q_dedup_ngram_pairs(spark, sf_dir):
    return D.ngram_jaccard_pairs(_docs(spark, sf_dir), shingle_n=3,
                                 threshold=0.2).orderBy("doc_a", "doc_b")


def q_dedup_clusters(spark, sf_dir):
    """Connected components over the MinHash-LSH candidate-pair graph:
    every document gets its transitive duplicate-cluster id (min doc_id
    of the component) — the keep/drop verdict of a dedup pipeline.
    Oracle: recursive-CTE transitive closure over the same pairs."""
    return D.duplicate_clusters(_docs(spark, sf_dir), k=8, bands=4) \
        .orderBy("doc_id")


_PARA_HEADER = "SHARED BOILERPLATE HEADER"


def q_dedup_paragraphs(spark, sf_dir):
    """CCNet-style cross-document boilerplate-paragraph removal.

    The oracle tables carry single-line texts, so both engines first
    build the same derived multi-paragraph corpus — 5 consecutive docs
    concatenated under a shared header line — then drop every paragraph
    occurring in more than one document (the header, plus any exact-dup
    doc texts that landed in different groups)."""
    docs = _docs(spark, sf_dir)
    grouped = (
        docs.select(F.floor(F.col("doc_id") / 5).cast("long").alias("doc_id"),
                    F.col("doc_id").alias("_ord"), "text")
        .groupBy("doc_id")
        .agg(F.concat(
            F.lit(_PARA_HEADER + "\n"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("_ord", "text"))),
                    lambda s: s["text"]),
                "\n")).alias("text")))
    return D.paragraph_dedup(grouped, max_doc_frequency=1).orderBy("doc_id")


def q_dedup_embedding(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet") \
        .withColumn("embedding", F.col("embedding").cast("array<double>"))
    return S.embedding_neardup_pairs(emb, bits=6, threshold=0.3) \
        .orderBy("vec_a", "vec_b")


def q_ann_cosine_topk(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet") \
        .withColumn("embedding", F.col("embedding").cast("array<double>"))
    return S.cosine_topk(emb, [0, 1, 2, 3, 4], k=5) \
        .orderBy("query_id", "rank")


def q_ann_ivf_topk(spark, sf_dir):
    """IVF ANN with deterministic Lloyd-refined centroids (2 rounds,
    exact-decimal means) and nprobe=2 multi-probe search; the oracle
    unrolls the identical rounds in SQL (_ivf_sql)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet") \
        .withColumn("embedding", F.col("embedding").cast("array<double>"))
    return S.ivf_topk(emb, [0, 1, 2, 3, 4], k=5, n_centroids=8,
                      iters=2, nprobe=2) \
        .orderBy("query_id", "rank")


def q_text_quality(spark, sf_dir):
    return T.quality_score(_docs(spark, sf_dir)).orderBy("doc_id")


def q_text_langid(spark, sf_dir):
    return T.lang_id(_docs(spark, sf_dir)).orderBy("doc_id")


def q_text_tokens(spark, sf_dir):
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id", T.token_count_col(F.col("text")).alias("n_tokens"),
        T.subword_count_col(F.col("text")).alias("n_subwords"),
        F.length("text").alias("n_chars_actual"),
    ).orderBy("doc_id")


def q_text_fingerprint(spark, sf_dir):
    return T.fingerprint(_docs(spark, sf_dir), k=8).orderBy("doc_id")


def q_text_gopher(spark, sf_dir):
    """Gopher-style quality gates (Rae et al. 2021 A1.1): word counts,
    mean word length, symbol/bullet/ellipsis ratios, alphabetic-word
    fraction, distinct stopwords, combined keep verdict."""
    return T.gopher_quality(_docs(spark, sf_dir)).orderBy("doc_id")


def q_text_repetition(spark, sf_dir):
    """Within-document repetition signals (Gopher/RefinedWeb repetition
    removal): duplicate-line fraction + char fraction, top word-2-gram
    character share."""
    return T.repetition_scores(_docs(spark, sf_dir)).orderBy("doc_id")


def q_text_ngram_topk(spark, sf_dir):
    """Corpus profiling: top-10 word bigrams per language by document
    frequency (ties broken on the n-gram string for a total order;
    singleton bigrams dropped by the default ``min_docs=2`` tail
    filter — boilerplate candidates by definition repeat)."""
    return T.ngram_topk(_docs(spark, sf_dir), n=2, k=10) \
        .orderBy("lang", "rank")


def q_pipeline_clean_corpus(spark, sf_dir):
    """Composed training-data pipeline: quality gate -> lang-id -> exact
    dedup -> MinHash near-dup removal, one scan of documents
    (ops/pipeline.py)."""
    from abot_spark.ops.pipeline import clean_corpus

    return clean_corpus(_docs(spark, sf_dir), min_tokens=30, min_chars=200,
                        minhash_k=8, bands=4).orderBy("doc_id")


def q_pipeline_refinedweb(spark, sf_dir):
    """The full RefinedWeb/Dolma-style rule set composed into the same
    single-scan pipeline: length gate + Gopher A1.1 keep verdict +
    duplicate-line gate -> lang-id -> exact dedup -> MinHash near-dup
    removal.  The two extra gates are pure array/regex expressions
    riding the base projection — zero extra scans or shuffles.  The
    stop-word gate list is corpus-tuned (the RefinedWeb/Dolma
    per-language adaptation): the synthetic corpus' vocabulary carries
    only a couple of Gopher's published English words, which would make
    the published-list gate reject everything."""
    from abot_spark.ops.pipeline import clean_corpus

    return clean_corpus(_docs(spark, sf_dir), min_tokens=30, min_chars=200,
                        minhash_k=8, bands=4, gopher=True,
                        gopher_stopwords=T.EN_STOPWORDS,
                        max_dup_line_frac=0.3).orderBy("doc_id")


def q_sessionize(spark, sf_dir):
    """Gap-based sessionization of the events stream (30-min gap)."""
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    new_sess = F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    sess = F.sum(new_sess).over(
        w.rowsBetween(Window.unboundedPreceding, 0))
    return e.select("user_id", "event_id", "ts") \
        .withColumn("session_idx", sess.cast("long")) \
        .orderBy("user_id", "event_id")


def q_lineitem_pricing(spark, sf_dir):
    """Hash-agg showcase (TPC-H Q1 shape) over lineitem."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.count(F.lit(1)).alias("count_order"),
    ).orderBy("l_returnflag", "l_linestatus")


# -- UDF-surface queries ----------------------------------------------------

def q_udf_text_extract(spark, sf_dir):
    """S4 extract UDF driven through a SQL-constructible fixture: utf-8
    bytes + charset header must round-trip byte-identically."""
    from abot_spark.functions.udfs import text_extract_col
    d = _docs(spark, sf_dir)
    html = F.encode(F.col("text"), "utf-8")
    ext = text_extract_col(html, F.lit("text/html; charset=utf-8"))
    return d.select("doc_id", ext["text"].alias("extracted_text")) \
        .orderBy("doc_id")


def q_udf_link_extract(spark, sf_dir):
    """T1/T3 link UDF over synthesized anchors: extraction + absolutization
    against the page URL, posexploded."""
    from abot_spark.functions.udfs import links_col
    u = _urls(spark, sf_dir).filter(F.col("doc_id") % 17 != 0)
    html = F.concat(
        F.lit('<html><body><a href="/child/'), F.col("doc_id"),
        F.lit('">c</a><a href="?q=1">q</a></body></html>'))
    links = links_col(CFG, html, F.col("url"), F.lit(None).cast("string"))
    return u.select("url", F.posexplode(links).alias("pos", "link")) \
        .select("url", "pos", F.col("link.url").alias("link")) \
        .orderBy("url", "pos")


def q_warc_ingest(spark, sf_dir):
    """WARC source (sources/warc.py): documents → deterministic WARC
    archives in the Common-Crawl per-record-gzip-member layout → read back
    through the binaryFile + mapInPandas reader into the BASELINE pages
    shape.  ``text`` must round-trip byte-identically through the S4
    charset kernel; ``lang`` is the marker heuristic over the first 4000
    chars; ``warc_ts`` parses the WARC-Date header."""
    import datetime as dt
    import tempfile

    from abot_spark.sources.warc import read_warc, write_warc

    rows = _docs(spark, sf_dir).select("doc_id", "text") \
        .orderBy("doc_id").collect()
    epoch = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    recs = [{
        "url": f"http://w{r['doc_id'] % 20}.example.com/doc/{r['doc_id']}",
        "ts": epoch + dt.timedelta(seconds=int(r["doc_id"])),
        "html": r["text"].encode("utf-8"),
        "content_type": "text/html; charset=utf-8",
    } for r in rows]
    warc_dir = tempfile.mkdtemp(prefix="abot-warc-q-")
    n_shards = 8   # several archives -> several binaryFile tasks
    for s in range(n_shards):
        write_warc(recs[s::n_shards], f"{warc_dir}/part-{s}.warc.gz")
    return read_warc(spark, f"{warc_dir}/*.warc.gz") \
        .select("url", "warc_ts", "text", "lang").orderBy("url")


def q_media_features(spark, sf_dir):
    """Multimodal mapInPandas plumbing (decode stubbed; rows-only check)."""
    return extract_media_features(synth_media(_docs(spark, sf_dir))) \
        .orderBy("doc_id")


def q_media_resize(spark, sf_dir):
    """Image-resize plumbing (mapInPandas, binary→binary; pixel work
    stubbed to first-out_w*out_h-bytes so the oracle is exact)."""
    return resize_images(synth_media(_docs(spark, sf_dir)), max_dim=16) \
        .select("doc_id", "media_type", "is_decodable", "src_width",
                "src_height", "out_width", "out_height",
                F.length("thumb").cast("int").alias("thumb_len"),
                "thumb_sum") \
        .orderBy("doc_id")


def q_media_frames(spark, sf_dir):
    """Video frame-sampling plumbing (mapInPandas 1→N expansion; codec
    stubbed to fixed-size payload slices so the oracle is exact)."""
    return sample_frames(synth_media(_docs(spark, sf_dir)),
                         frame_bytes=64, every=4, frame_ms=40) \
        .select("doc_id", "frame_idx", "ts_ms", "frame_len", "frame_sum") \
        .orderBy("doc_id", "frame_idx")


def q_media_audio(spark, sf_dir):
    """Overlapping audio windowing plumbing (mapInPandas 1→N with shared
    bytes across windows; PCM decode stubbed so the oracle is exact)."""
    from abot_spark.ops.multimodal import chunk_audio
    return chunk_audio(synth_media(_docs(spark, sf_dir)),
                       chunk_bytes=48, hop_bytes=32, bytes_per_ms=4) \
        .select("doc_id", "chunk_idx", "start_ms", "end_ms", "chunk_len",
                "chunk_sum", "loudness") \
        .orderBy("doc_id", "chunk_idx")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "crawl_seen_antijoin": q_crawl_seen_antijoin,
        "crawl_seen_hash_key": q_crawl_seen_hash_key,
        "crawl_domain_cap": q_crawl_domain_cap,
        "crawl_budget_cutoff": q_crawl_budget_cutoff,
        "crawl_decisions_f1": q_crawl_decisions_f1,
        "crawl_f3_content_gate": q_crawl_f3_content_gate,
        "crawl_count_by_domain": q_crawl_count_by_domain,
        "crawl_fifo_order": q_crawl_fifo_order,
        "crawl_politeness_quota": q_crawl_politeness_quota,
        "crawl_priority_order": q_crawl_priority_order,
        "crawl_retry_backoff": q_crawl_retry_backoff,
        "crawl_redirect_resolve": q_crawl_redirect_resolve,
        "crawl_f2_links_gate": q_crawl_f2_links_gate,
        "crawl_robots_gate": q_crawl_robots_gate,
        "crawl_link_cap": q_crawl_link_cap,
        "dedup_exact": q_dedup_exact,
        "dedup_minhash_bands": q_dedup_minhash_bands,
        "dedup_minhash_pairs": q_dedup_minhash_pairs,
        "dedup_simhash": q_dedup_simhash,
        "dedup_ngram_pairs": q_dedup_ngram_pairs,
        "dedup_clusters": q_dedup_clusters,
        "dedup_paragraphs": q_dedup_paragraphs,
        "dedup_embedding": q_dedup_embedding,
        "ann_cosine_topk": q_ann_cosine_topk,
        "ann_ivf_topk": q_ann_ivf_topk,
        "text_quality": q_text_quality,
        "text_langid": q_text_langid,
        "text_tokens": q_text_tokens,
        "text_fingerprint": q_text_fingerprint,
        "text_gopher_quality": q_text_gopher,
        "text_repetition": q_text_repetition,
        "text_ngram_topk": q_text_ngram_topk,
        "pipeline_clean_corpus": q_pipeline_clean_corpus,
        "pipeline_refinedweb": q_pipeline_refinedweb,
        "sessionize": q_sessionize,
        "lineitem_pricing": q_lineitem_pricing,
        "warc_ingest": q_warc_ingest,
        "udf_text_extract": q_udf_text_extract,
        "udf_link_extract": q_udf_link_extract,
        "media_features": q_media_features,
        "media_resize": q_media_resize,
        "media_frames": q_media_frames,
        "media_audio": q_media_audio,
    }


# ---------------------------------------------------------------------------
# DuckDB oracles
# ---------------------------------------------------------------------------

def _simhash_sql(bits: int = 16) -> str:
    tokens = f"list_distinct(string_split({_NORM_SQL}, ' '))"
    terms = []
    for j in range(bits):
        contrib = (
            f"list_sum(list_transform({tokens}, t -> CASE WHEN "
            f"ascii(substr(md5(t), {j + 1}, 1)) % 2 = 1 THEN 1 ELSE -1 END))"
        )
        terms.append(f"(CASE WHEN {contrib} > 0 THEN {1 << j} ELSE 0 END)")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def _minhash_sig_sql(i: int, n: int = 3) -> str:
    return (f"list_min(list_transform({_shingles_sql(n)},"
            f" s -> md5('{i}:' || s)))")


def _ivf_sql(C: int = 8, iters: int = 2, nprobe: int = 2, k: int = 5,
             nq: int = 5) -> str:
    """DuckDB mirror of ops.similarity.ivf_topk: the same seeded Lloyd
    rounds unrolled as CTEs.  Centroid means use exact DECIMAL sums cast
    to double (order-independent — identical bits to the Spark side's
    decimal aggregate), so assignments and scores match exactly."""

    def cos(a: str, b: str) -> str:
        return (f"round(list_inner_product({a}, {b}) / "
                f"(sqrt(list_inner_product({a}, {a})) * "
                f"sqrt(list_inner_product({b}, {b}))), 4)")

    parts = [f"c0 AS (SELECT vec_id AS cluster, embedding::DOUBLE[] AS cv "
             f"FROM embeddings WHERE vec_id < {C})"]
    prev = "c0"
    cos_ec = cos("e.embedding::DOUBLE[]", "c.cv")
    for i in range(1, iters + 1):
        parts.append(
            f"a{i} AS (SELECT e.vec_id, c.cluster, row_number() OVER ("
            f"PARTITION BY e.vec_id ORDER BY {cos_ec} DESC, c.cluster ASC"
            f") AS rnk FROM embeddings e CROSS JOIN {prev} c)")
        parts.append(
            f"m{i} AS (SELECT a.cluster, u.pos AS pos, u.val AS val "
            f"FROM embeddings e JOIN a{i} a "
            f"ON a.vec_id = e.vec_id AND a.rnk = 1, "
            f"UNNEST(list_transform(e.embedding::DOUBLE[], "
            f"(x, i) -> {{'pos': i, 'val': x}})) t(u))")
        parts.append(
            f"d{i} AS (SELECT cluster, pos, "
            f"CAST(SUM(CAST(val AS DECIMAL(28,10))) AS DOUBLE) / count(*) "
            f"AS val FROM m{i} GROUP BY 1, 2)")
        parts.append(
            f"c{i} AS (SELECT cluster, list(val ORDER BY pos) AS cv "
            f"FROM d{i} GROUP BY cluster)")
        prev = f"c{i}"
    parts.append(
        f"af AS (SELECT e.vec_id, c.cluster, row_number() OVER ("
        f"PARTITION BY e.vec_id ORDER BY {cos_ec} DESC, c.cluster ASC"
        f") AS rnk FROM embeddings e CROSS JOIN {prev} c)")
    parts.append(
        "clustered AS (SELECT e.*, a.cluster FROM embeddings e "
        "JOIN af a ON a.vec_id = e.vec_id AND a.rnk = 1)")
    parts.append(
        f"probes AS (SELECT vec_id AS query_id, cluster FROM af "
        f"WHERE vec_id < {nq} AND rnk <= {nprobe})")
    cos_ab = cos("a.embedding::DOUBLE[]", "b.embedding::DOUBLE[]")
    parts.append(
        f"scored AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, "
        f"{cos_ab} AS score FROM embeddings a "
        f"JOIN probes p ON p.query_id = a.vec_id "
        f"JOIN clustered b ON b.cluster = p.cluster "
        f"AND a.vec_id <> b.vec_id)")
    parts.append(
        "ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id "
        "ORDER BY score DESC, neighbor_id ASC) AS rank FROM scored)")
    return ("WITH " + ",\n".join(parts)
            + f" SELECT query_id, neighbor_id, rank, score FROM ranked "
              f"WHERE rank <= {k} ORDER BY query_id, rank")


_GOPHER_SQL_TMPL = r"""
            WITH base AS (
              SELECT doc_id, COALESCE(text, '') AS t,
                     trim(COALESCE(text, '')) AS tr
              FROM documents),
            w AS (
              SELECT doc_id, t,
                     CASE WHEN tr = '' THEN []::VARCHAR[]
                          ELSE string_split_regex(tr, '\s+') END AS words,
                     list_filter(list_transform(
                       string_split(t, chr(10)), x -> trim(x)),
                       x -> x <> '') AS lines
              FROM base),
            m AS (
              SELECT doc_id,
                     len(words) AS n_words,
                     round(COALESCE(list_sum(list_transform(
                         words, x -> len(x))), 0) * 1.0
                       / greatest(len(words), 1), 4) AS mean_word_len,
                     round((len(t) - len(replace(t, '#', ''))
                       + floor((len(t) - len(regexp_replace(
                           t, '\.\.\.', '', 'g'))) / 3)) * 1.0
                       / greatest(len(words), 1), 4) AS symbol_word_ratio,
                     round(len(list_filter(lines,
                         x -> regexp_matches(x, '^[-*]'))) * 1.0
                       / greatest(len(lines), 1), 4) AS bullet_line_frac,
                     round(len(list_filter(lines,
                         x -> regexp_matches(x, '\.\.\.$'))) * 1.0
                       / greatest(len(lines), 1), 4) AS ellipsis_line_frac,
                     round(len(list_filter(words,
                         x -> regexp_matches(x, '[A-Za-z]'))) * 1.0
                       / greatest(len(words), 1), 4) AS alpha_word_frac,
                     CAST(len(list_distinct(regexp_extract_all(lower(t),
                       '__STOP_PAT__'))) AS INT)
                       AS n_stop_distinct
              FROM w)
            SELECT doc_id, n_words, mean_word_len, symbol_word_ratio,
                   bullet_line_frac, ellipsis_line_frac, alpha_word_frac,
                   n_stop_distinct,
                   ((n_words BETWEEN 50 AND 100000)
                    AND (mean_word_len BETWEEN 3 AND 10)
                    AND symbol_word_ratio <= 0.1
                    AND bullet_line_frac <= 0.9
                    AND ellipsis_line_frac <= 0.3
                    AND alpha_word_frac >= 0.8
                    AND n_stop_distinct >= 2) AS keep
            FROM m"""


def _gopher_sql(stop_pat: str) -> str:
    return _GOPHER_SQL_TMPL.replace("__STOP_PAT__", stop_pat)


# the operator default: Gopher's published 8-word English gate list
_GOPHER_SQL = _gopher_sql(r"\b(the|be|to|of|and|that|have|with)\b")


def _bytesum_sql(hex_expr: str) -> str:
    """Byte-sum of a blob given its (uppercase) hex string — DuckDB here
    lacks blob slicing, so all blob math runs over hex() output."""
    return (
        f"COALESCE(list_sum(list_transform("
        f"generate_series(1, CAST(length({hex_expr})/2 AS INT)), "
        f"i -> 16*(strpos('0123456789ABCDEF', substr({hex_expr}, 2*i-1, 1))-1)"
        f" + (strpos('0123456789ABCDEF', substr({hex_expr}, 2*i, 1))-1))), 0)"
    )


# synth_media's blob, reconstructed as a hex string (PNG magic prefix for
# every third row, first-16-chars payload otherwise) — shared by the
# media_resize / media_frames oracles
_MEDIA_HX_SQL = """
  SELECT doc_id,
         doc_id % 3 = 0 AS png,
         CASE WHEN doc_id % 3 = 0
              THEN hex(from_hex('89504E470D0A1A0A') || encode(text))
              ELSE hex(encode(substr(text, 1, 16))) END AS hx
  FROM documents
"""


def oracle_sql() -> dict[str, str]:
    f1_reason = """
      CASE
        WHEN redirected_from IS NOT NULL AND redirect_position > 7
          THEN 'HttpRequestMaxAutoRedirects limit of [7] has been reached'
        WHEN depth > 100 THEN 'Crawl depth is above max'
        WHEN NOT (lower(split_part(url, '://', 1)) LIKE 'http%')
          THEN 'Scheme does not begin with http'
        WHEN NOT is_internal THEN 'Link is external'
      END"""
    f3_reason = """
      CASE
        WHEN status_code <> 200 THEN 'Status code ' ||
          CASE status_code WHEN 301 THEN 'MovedPermanently'
                           WHEN 404 THEN 'NotFound'
                           WHEN 503 THEN 'ServiceUnavailable'
                           ELSE CAST(status_code AS VARCHAR) END
        WHEN NOT contains(lower(trim(content_type)), 'text/html')
          THEN 'Content type is not any of the following: text/html'
      END"""
    cosine = ("round(list_inner_product(a.embedding::DOUBLE[], "
              "b.embedding::DOUBLE[]) / "
              "(sqrt(list_inner_product(a.embedding::DOUBLE[], "
              "a.embedding::DOUBLE[])) * "
              "sqrt(list_inner_product(b.embedding::DOUBLE[], "
              "b.embedding::DOUBLE[]))), 4)")

    bands_union = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, md5({_minhash_sig_sql(2 * b)} || '|' || "
        f"{_minhash_sig_sql(2 * b + 1)}) AS band_key FROM documents"
        for b in range(4)
    )

    en_stop = r"\b(the|a|of|and|to|in|is|it)\b"
    lang_score = {
        lang: (r"len(regexp_extract_all(lower(text), '\b("
               + "|".join(markers) + r")\b'))")
        for lang, markers in T.LANG_MARKERS.items()
    }
    lang_max = "greatest(" + ", ".join(
        f"score_{k}" for k in T.LANG_MARKERS) + ")"
    lang_pred = "CASE " + " ".join(
        f"WHEN score_{k} = {lang_max} THEN '{k}'" for k in T.LANG_MARKERS
    ) + " END"

    grams8 = (
        "list_transform("
        "range(0, greatest(len(string_split_regex(trim(text), '\\s+')) - 8,"
        " 0) + 1),"
        " i -> array_to_string(list_slice("
        "string_split_regex(trim(text), '\\s+'), i + 1, i + 8), ' '))"
    )

    return {
        "crawl_seen_antijoin": f"""
            WITH u AS ({_URLS_SQL}),
            seen AS (SELECT DISTINCT substr(md5(url),1,16) AS k
                     FROM u WHERE doc_id % 2 = 0)
            SELECT url FROM u
            WHERE substr(md5(url),1,16) NOT IN (SELECT k FROM seen)
            ORDER BY url""",
        "crawl_seen_hash_key": f"""
            WITH u AS ({_URLS_SQL})
            SELECT url, substr(md5(url),1,16) AS seen_key,
                   ascii(substr(md5(url),1,1)) % 16 AS bucket
            FROM u ORDER BY url""",
        "crawl_domain_cap": f"""
            WITH u AS ({_URLS_SQL}),
            r AS (SELECT domain, url,
                         row_number() OVER (PARTITION BY domain ORDER BY seq)
                           AS domain_rank FROM u)
            SELECT domain, url, domain_rank FROM r WHERE domain_rank <= 5
            ORDER BY domain, domain_rank""",
        "crawl_budget_cutoff": f"""
            WITH u AS ({_URLS_SQL}),
            r AS (SELECT url, row_number() OVER (ORDER BY wave, seq)
                    AS admission_rank FROM u)
            SELECT url, admission_rank FROM r WHERE admission_rank <= 100
            ORDER BY admission_rank""",
        "crawl_decisions_f1": f"""
            WITH u AS ({_URLS_SQL})
            SELECT url, {f1_reason} AS reason,
                   ({f1_reason}) IS NULL AS allow
            FROM u ORDER BY url""",
        "crawl_f3_content_gate": f"""
            WITH u AS ({_URLS_SQL})
            SELECT url, {f3_reason} AS reason,
                   ({f3_reason}) IS NULL AS allow
            FROM u ORDER BY url""",
        "crawl_count_by_domain": f"""
            WITH u AS ({_URLS_SQL})
            SELECT domain, count(*) AS cnt FROM u GROUP BY domain
            ORDER BY domain""",
        "crawl_fifo_order": f"""
            WITH u AS ({_URLS_SQL}),
            r AS (SELECT url, wave, seq,
                         row_number() OVER (ORDER BY wave, seq) AS fifo_rank
                  FROM u)
            SELECT url, wave, seq, fifo_rank FROM r WHERE fifo_rank <= 50
            ORDER BY fifo_rank""",
        "crawl_politeness_quota": f"""
            WITH u AS ({_URLS_SQL}),
            r AS (SELECT domain, url, delay_ms,
                         row_number() OVER (PARTITION BY domain ORDER BY seq)
                           AS qrank FROM u)
            SELECT domain, url, qrank FROM r
            WHERE qrank <= CASE WHEN delay_ms > 0
                                THEN floor(60000 / delay_ms)
                                ELSE {1 << 40} END
            ORDER BY domain, qrank""",
        "crawl_priority_order": f"""
            WITH u AS ({_URLS_SQL}),
            r AS (SELECT domain, url,
                         row_number() OVER (PARTITION BY domain
                                            ORDER BY depth, delay_ms, seq)
                           AS pop_rank FROM u)
            SELECT domain, url, pop_rank, pop_rank <= 3 AS due FROM r
            ORDER BY domain, pop_rank""",
        "crawl_retry_backoff": f"""
            WITH u AS ({_URLS_SQL})
            SELECT url, status_code,
                   CAST(greatest(retry_after_s * 1000, 2000) AS BIGINT)
                     AS not_before_ms,
                   CAST(ceil(greatest(retry_after_s * 1000, 2000) / 60000.0)
                     AS BIGINT) AS eligible_wave
            FROM u WHERE status_code >= 400 ORDER BY url""",
        "crawl_redirect_resolve": f"""
            WITH u AS ({_URLS_SQL}),
            m AS (SELECT max(doc_id) AS mx FROM documents),
            k AS (SELECT doc_id, url,
                         CASE WHEN doc_id % 5 = 0 THEN 0
                              ELSE 5 - CAST(doc_id % 5 AS INT) END AS steps
                  FROM u)
            SELECT url,
                   CASE WHEN steps = 0 THEN doc_id
                        WHEN doc_id + steps <= mx THEN doc_id + steps
                        ELSE mx END AS final_doc_id,
                   CAST(CASE WHEN doc_id + steps <= mx THEN steps
                             ELSE mx - doc_id + 1 END AS INT) AS hops,
                   doc_id + steps > mx AS dangling
            FROM k, m ORDER BY url""",
        "crawl_f2_links_gate": """
            SELECT doc_id,
                   CASE WHEN text IS NULL
                             OR trim(CASE WHEN doc_id % 13 = 0 THEN ''
                                          ELSE text END) = ''
                          THEN 'Page has no content'
                        WHEN doc_id % 11 = 0 THEN 'Link is external'
                        WHEN doc_id % 120 >= 100
                          THEN 'Crawl depth is above max'
                   END AS reason,
                   (CASE WHEN text IS NULL
                              OR trim(CASE WHEN doc_id % 13 = 0 THEN ''
                                           ELSE text END) = ''
                         THEN 'Page has no content'
                         WHEN doc_id % 11 = 0 THEN 'Link is external'
                         WHEN doc_id % 120 >= 100
                           THEN 'Crawl depth is above max'
                    END) IS NULL AS allow
            FROM documents ORDER BY doc_id""",
        "crawl_robots_gate": f"""
            WITH u AS ({_URLS_SQL})
            SELECT url,
                   CASE WHEN (doc_id % 20) % 4 = 0
                        THEN starts_with('/p/' || doc_id, '/p/2')
                        ELSE TRUE END AS allowed
            FROM u ORDER BY url""",
        "crawl_link_cap": f"""
            WITH u AS ({_URLS_SQL}),
            e AS (SELECT url, CAST(t.i AS INT) AS link_pos
                  FROM u CROSS JOIN
                       UNNEST(range(0, CAST(doc_id % 7 AS INT) + 1)) AS t(i)
                  WHERE t.i % 3 <> 0)
            SELECT url, link_pos,
                   CAST(row_number() OVER (PARTITION BY url
                                           ORDER BY link_pos) AS INT)
                     AS sched_rank
            FROM e
            QUALIFY sched_rank <= 2
            ORDER BY url, link_pos""",
        "dedup_exact": f"""
            WITH d AS (SELECT doc_id, md5({_NORM_SQL}) AS digest
                       FROM documents)
            SELECT doc_id, digest,
                   min(doc_id) OVER (PARTITION BY digest) AS canonical_doc_id,
                   doc_id <> min(doc_id) OVER (PARTITION BY digest)
                     AS is_duplicate
            FROM d ORDER BY doc_id""",
        "dedup_minhash_bands": f"""
            SELECT doc_id, band, band_key FROM ({bands_union})
            ORDER BY doc_id, band""",
        "dedup_minhash_pairs": f"""
            WITH b AS ({bands_union})
            SELECT DISTINCT a.doc_id AS doc_a, c.doc_id AS doc_b
            FROM b a JOIN b c
              ON a.band = c.band AND a.band_key = c.band_key
             AND a.doc_id < c.doc_id
            ORDER BY doc_a, doc_b""",
        "dedup_simhash": f"""
            SELECT doc_id, {_simhash_sql(16)} AS simhash FROM documents
            ORDER BY doc_id""",
        "dedup_ngram_pairs": f"""
            WITH ex AS (
              SELECT doc_id, unnest({_shingles_sql(3)}) AS shingle
              FROM documents),
            capped AS (
              SELECT shingle FROM ex GROUP BY shingle
              HAVING count(*) > 256),
            pruned AS (
              SELECT * FROM ex
              WHERE shingle NOT IN (SELECT shingle FROM capped)),
            sizes AS (SELECT doc_id, count(*) AS sz FROM pruned
                      GROUP BY doc_id),
            inter AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                     count(*) AS n_common
              FROM pruned a JOIN pruned b
                ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              GROUP BY 1, 2)
            SELECT doc_a, doc_b,
                   round(n_common * 1.0
                         / (sa.sz + sb.sz - n_common), 4) AS jaccard
            FROM inter
            JOIN sizes sa ON sa.doc_id = doc_a
            JOIN sizes sb ON sb.doc_id = doc_b
            WHERE round(n_common * 1.0 / (sa.sz + sb.sz - n_common), 4) >= 0.2
            ORDER BY doc_a, doc_b""",
        "dedup_clusters": f"""
            WITH RECURSIVE b AS ({bands_union}),
            p AS (
              SELECT DISTINCT a.doc_id AS doc_a, c.doc_id AS doc_b
              FROM b a JOIN b c
                ON a.band = c.band AND a.band_key = c.band_key
               AND a.doc_id < c.doc_id),
            e AS (SELECT doc_a AS s, doc_b AS d FROM p
                  UNION SELECT doc_b, doc_a FROM p),
            reach(s, d) AS (
              SELECT s, d FROM e
              UNION
              SELECT r.s, e2.d FROM reach r JOIN e e2 ON r.d = e2.s),
            comp AS (SELECT s AS doc_id, min(d) AS m FROM reach GROUP BY s)
            SELECT doc.doc_id,
                   COALESCE(comp.m, doc.doc_id) AS cluster_id,
                   doc.doc_id <> COALESCE(comp.m, doc.doc_id) AS is_duplicate
            FROM documents doc LEFT JOIN comp ON comp.doc_id = doc.doc_id
            ORDER BY doc.doc_id""",
        "dedup_paragraphs": f"""
            WITH grouped AS (
              SELECT doc_id // 5 AS gid,
                     '{_PARA_HEADER}' || chr(10) ||
                     string_agg(text, chr(10) ORDER BY doc_id) AS text
              FROM documents GROUP BY 1),
            paras AS (
              SELECT gid, u.pos AS pos, u.para AS para
              FROM grouped,
                   UNNEST(list_transform(string_split(text, chr(10)),
                                         (p, i) -> {{'pos': i, 'para': p}}))
                     t(u)),
            freq AS (
              SELECT trim(lower(para)) AS key, count(DISTINCT gid) AS docs
              FROM paras WHERE trim(lower(para)) <> '' GROUP BY 1),
            boiler AS (SELECT key FROM freq WHERE docs > 1),
            kept AS (
              SELECT p.* FROM paras p
              WHERE trim(lower(p.para)) NOT IN (SELECT key FROM boiler)),
            totals AS (
              SELECT gid, count(*) AS n_paragraphs FROM paras GROUP BY gid),
            clean AS (
              SELECT gid,
                     string_agg(para, chr(10) ORDER BY pos) AS clean_text,
                     count(*) AS kept_n
              FROM kept GROUP BY gid)
            SELECT t.gid AS doc_id, COALESCE(c.clean_text, '') AS clean_text,
                   t.n_paragraphs,
                   t.n_paragraphs - COALESCE(c.kept_n, 0) AS n_removed
            FROM totals t LEFT JOIN clean c ON c.gid = t.gid
            ORDER BY doc_id""",
        "dedup_embedding": f"""
            WITH sig AS (
              SELECT vec_id, embedding, {_SIGN_SIG_SQL} AS sig
              FROM embeddings)
            SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, {cosine} AS score
            FROM sig a JOIN sig b
              ON a.sig = b.sig AND a.vec_id < b.vec_id
            WHERE {cosine} >= 0.3
            ORDER BY vec_a, vec_b""",
        "ann_cosine_topk": f"""
            WITH scored AS (
              SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
                     {cosine} AS score
              FROM embeddings a JOIN embeddings b
                ON a.vec_id < 5 AND a.vec_id <> b.vec_id),
            ranked AS (
              SELECT *, row_number() OVER (
                PARTITION BY query_id
                ORDER BY score DESC, neighbor_id ASC) AS rank
              FROM scored)
            SELECT query_id, neighbor_id, rank, score FROM ranked
            WHERE rank <= 5 ORDER BY query_id, rank""",
        "ann_ivf_topk": _ivf_sql(C=8, iters=2, nprobe=2, k=5, nq=5),
        "text_quality": f"""
            WITH q AS (
              SELECT doc_id,
                     len(text) AS n_chars,
                     CASE WHEN trim(text) = '' THEN 0
                          ELSE len(string_split_regex(trim(text), '\\s+'))
                     END AS n_tokens,
                     len(text) - len(regexp_replace(text,
                       '[\\.,;:!\\?]', '', 'g')) AS n_punct,
                     len(regexp_extract_all(lower(text), '{en_stop}'))
                       AS n_stop
              FROM documents)
            SELECT doc_id, n_chars, n_tokens,
                   round(n_punct * 1.0 / greatest(n_chars, 1), 4)
                     AS punct_ratio,
                   round(n_stop * 1.0 / greatest(n_tokens, 1), 4)
                     AS stopword_ratio,
                   round((n_chars - n_tokens + 1) * 1.0
                         / greatest(n_tokens, 1), 4) AS mean_token_len
            FROM q ORDER BY doc_id""",
        "text_langid": f"""
            WITH s AS (
              SELECT doc_id, lang,
                     {', '.join(f"{expr} AS score_{k}"
                                for k, expr in lang_score.items())}
              FROM documents)
            SELECT doc_id, lang,
                   {', '.join(f'score_{k}' for k in T.LANG_MARKERS)},
                   {lang_pred} AS pred_lang
            FROM s ORDER BY doc_id""",
        "text_tokens": f"""
            SELECT doc_id,
                   CASE WHEN trim(text) = '' THEN 0
                        ELSE len(string_split_regex(trim(text), '\\s+'))
                   END AS n_tokens,
                   len(regexp_extract_all(text,
                       '{T.BPE_TOKEN_PATTERN.replace("'", "''")}'))
                     AS n_subwords,
                   len(text) AS n_chars_actual
            FROM documents ORDER BY doc_id""",
        "text_fingerprint": f"""
            SELECT doc_id,
                   coalesce(list_min(list_transform({grams8}, g -> md5(g))),
                            md5(text)) AS fingerprint
            FROM documents ORDER BY doc_id""",
        "text_gopher_quality": _GOPHER_SQL + " ORDER BY doc_id",
        "text_repetition": f"""
            WITH lines AS (
              SELECT doc_id, x AS line
              FROM documents,
                   UNNEST(list_filter(list_transform(
                     string_split(COALESCE(text, ''), chr(10)),
                     x -> trim(x)), x -> x <> '')) t(x)),
            pl AS (SELECT doc_id, line, count(*) AS cnt
                   FROM lines GROUP BY 1, 2),
            ls AS (SELECT doc_id, sum(cnt) AS n_lines,
                          sum(cnt - 1) AS dup_lines,
                          sum(cnt * len(line)) AS line_chars,
                          sum((cnt - 1) * len(line)) AS dup_chars
                   FROM pl GROUP BY 1),
            norm AS (SELECT doc_id, {_NORM_SQL} AS nrm FROM documents),
            toks AS (SELECT doc_id, len(nrm) AS norm_len,
                            CASE WHEN nrm = '' THEN []::VARCHAR[]
                                 ELSE string_split(nrm, ' ') END AS tk
                     FROM norm),
            grams AS (
              SELECT doc_id, norm_len, g
              FROM toks,
                   UNNEST(CASE WHEN len(tk) < 2 THEN []::VARCHAR[]
                     ELSE list_transform(
                       generate_series(1, len(tk) - 1),
                       i -> tk[i] || ' ' || tk[i + 1]) END) t(g)),
            pg AS (SELECT doc_id, norm_len, g, count(*) AS cnt
                   FROM grams GROUP BY 1, 2, 3),
            mx AS (SELECT doc_id, max(cnt) AS maxc,
                          first(norm_len) AS norm_len
                   FROM pg GROUP BY 1),
            top AS (SELECT p.doc_id, min(p.g) AS top_2gram,
                           first(m.maxc) AS topc,
                           first(m.norm_len) AS norm_len
                    FROM pg p JOIN mx m
                      ON m.doc_id = p.doc_id AND p.cnt = m.maxc
                    GROUP BY 1)
            SELECT d.doc_id,
                   CAST(COALESCE(ls.n_lines, 0) AS INT) AS n_lines,
                   round(COALESCE(ls.dup_lines, 0) * 1.0
                     / greatest(COALESCE(ls.n_lines, 0), 1), 4)
                     AS dup_line_frac,
                   round(COALESCE(ls.dup_chars, 0) * 1.0
                     / greatest(COALESCE(ls.line_chars, 0), 1), 4)
                     AS dup_line_char_frac,
                   top.top_2gram,
                   round(COALESCE(top.topc * len(top.top_2gram), 0) * 1.0
                     / greatest(COALESCE(top.norm_len, 0), 1), 4)
                     AS top_2gram_char_frac
            FROM documents d
            LEFT JOIN ls ON ls.doc_id = d.doc_id
            LEFT JOIN top ON top.doc_id = d.doc_id
            ORDER BY d.doc_id""",
        "text_ngram_topk": f"""
            WITH ex AS (
              SELECT lang, doc_id, unnest({_shingles_sql(2)}) AS ngram
              FROM documents),
            df AS (
              SELECT lang, ngram, count(DISTINCT doc_id) AS n_docs
              FROM ex GROUP BY 1, 2
              HAVING count(DISTINCT doc_id) >= 2),
            r AS (
              SELECT lang, ngram, n_docs,
                     row_number() OVER (PARTITION BY lang
                       ORDER BY n_docs DESC, ngram) AS rank
              FROM df)
            SELECT lang, ngram, n_docs, CAST(rank AS INT) AS rank
            FROM r WHERE rank <= 10 ORDER BY lang, rank""",
        "pipeline_clean_corpus": f"""
            WITH feat AS (
              SELECT doc_id,
                     len(text) AS n_chars,
                     CASE WHEN trim(text) = '' THEN 0
                          ELSE len(string_split_regex(trim(text), '\\s+'))
                     END AS n_tokens,
                     md5({_NORM_SQL}) AS digest,
                     {', '.join(f"{expr} AS score_{k}"
                                for k, expr in lang_score.items())}
              FROM documents),
            langed AS (SELECT *, {lang_pred} AS pred_lang FROM feat),
            gated AS (SELECT * FROM langed
                      WHERE n_tokens >= 30 AND n_chars >= 200),
            uniq AS (SELECT * FROM (
                       SELECT *, min(doc_id) OVER (PARTITION BY digest)
                         AS canon FROM gated)
                     WHERE doc_id = canon),
            bands AS ({' UNION ALL '.join(
                f"SELECT d.doc_id, {b} AS band, "
                f"md5({_minhash_sig_sql(2 * b)} || '|' || "
                f"{_minhash_sig_sql(2 * b + 1)}) AS band_key "
                f"FROM documents d SEMI JOIN uniq u ON d.doc_id = u.doc_id"
                for b in range(4))}),
            near AS (SELECT DISTINCT b2.doc_id
                     FROM bands b1 JOIN bands b2
                       ON b1.band = b2.band AND b1.band_key = b2.band_key
                      AND b1.doc_id < b2.doc_id)
            SELECT doc_id, pred_lang, n_chars, n_tokens FROM uniq
            WHERE doc_id NOT IN (SELECT doc_id FROM near)
            ORDER BY doc_id""",
        "pipeline_refinedweb": f"""
            WITH feat AS (
              SELECT doc_id,
                     len(text) AS n_chars,
                     CASE WHEN trim(text) = '' THEN 0
                          ELSE len(string_split_regex(trim(text), '\\s+'))
                     END AS n_tokens,
                     md5({_NORM_SQL}) AS digest,
                     {', '.join(f"{expr} AS score_{k}"
                                for k, expr in lang_score.items())}
              FROM documents),
            langed AS (SELECT *, {lang_pred} AS pred_lang FROM feat),
            gq AS ({_gopher_sql(en_stop)}),
            dl AS (
              SELECT doc_id,
                     round((len(lines) - len(list_distinct(lines))) * 1.0
                       / greatest(len(lines), 1), 4) AS dlf
              FROM (SELECT doc_id, list_filter(list_transform(
                      string_split(COALESCE(text, ''), chr(10)),
                      x -> trim(x)), x -> x <> '') AS lines
                    FROM documents)),
            gated AS (SELECT langed.* FROM langed
                      JOIN gq ON gq.doc_id = langed.doc_id AND gq.keep
                      JOIN dl ON dl.doc_id = langed.doc_id AND dl.dlf <= 0.3
                      WHERE n_tokens >= 30 AND n_chars >= 200),
            uniq AS (SELECT * FROM (
                       SELECT *, min(doc_id) OVER (PARTITION BY digest)
                         AS canon FROM gated)
                     WHERE doc_id = canon),
            bands AS ({' UNION ALL '.join(
                f"SELECT d.doc_id, {b} AS band, "
                f"md5({_minhash_sig_sql(2 * b)} || '|' || "
                f"{_minhash_sig_sql(2 * b + 1)}) AS band_key "
                f"FROM documents d SEMI JOIN uniq u ON d.doc_id = u.doc_id"
                for b in range(4))}),
            near AS (SELECT DISTINCT b2.doc_id
                     FROM bands b1 JOIN bands b2
                       ON b1.band = b2.band AND b1.band_key = b2.band_key
                      AND b1.doc_id < b2.doc_id)
            SELECT doc_id, pred_lang, n_chars, n_tokens FROM uniq
            WHERE doc_id NOT IN (SELECT doc_id FROM near)
            ORDER BY doc_id""",
        "sessionize": """
            WITH l AS (
              SELECT user_id, event_id, ts,
                     epoch(ts - lag(ts) OVER (PARTITION BY user_id
                                              ORDER BY ts, event_id)) AS gap
              FROM events),
            m AS (
              SELECT user_id, event_id, ts,
                     CASE WHEN gap IS NULL OR gap > 1800 THEN 1 ELSE 0 END
                       AS new_sess
              FROM l)
            SELECT user_id, event_id, ts,
                   CAST(sum(new_sess) OVER (PARTITION BY user_id
                        ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
            FROM m ORDER BY user_id, event_id""",
        "lineitem_pricing": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   count(*) AS count_order
            FROM lineitem GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus""",
        "warc_ingest": f"""
            WITH s AS (
              SELECT doc_id, text,
                     {', '.join(
                         expr.replace('lower(text)',
                                      'lower(substr(text, 1, 4000))')
                         + f' AS score_{k}'
                         for k, expr in lang_score.items())}
              FROM documents)
            SELECT 'http://w' || (doc_id % 20) || '.example.com/doc/'
                     || doc_id AS url,
                   TIMESTAMP '2024-01-01' + to_seconds(doc_id) AS warc_ts,
                   text,
                   {lang_pred} AS lang
            FROM s ORDER BY url""",
        "udf_text_extract": """
            SELECT doc_id, text AS extracted_text FROM documents
            ORDER BY doc_id""",
        "udf_link_extract": f"""
            WITH u AS ({_URLS_SQL}),
            f AS (SELECT doc_id, url FROM u WHERE doc_id % 17 <> 0)
            SELECT url, pos, link FROM (
              SELECT url, 0 AS pos,
                     'http://d' || (doc_id % 20) || '.example.com/child/'
                       || doc_id AS link
              FROM f
              UNION ALL
              SELECT url, 1 AS pos,
                     'http://d' || (doc_id % 20) || '.example.com/p/'
                       || doc_id || '?q=1' AS link
              FROM f)
            ORDER BY url, pos""",
        # media_features: the decode stub is deterministic (byte-histogram
        # mean), so even the binary path has an exact SQL oracle — bytes
        # are recovered in DuckDB by hex-expanding the blob.
        "media_features": """
            WITH m AS (
              SELECT doc_id,
                     doc_id % 3 = 0 AS png,
                     CASE WHEN doc_id % 3 = 0 THEN encode(text)
                          ELSE encode(substr(text, 1, 16)) END AS body
              FROM documents
            ), b AS (
              SELECT doc_id, png, body, octet_length(body) AS blen,
                     COALESCE(list_sum(list_transform(
                       generate_series(1, octet_length(body)),
                       i -> 16 * (strpos('0123456789ABCDEF',
                                         substr(hex(body), 2*i-1, 1)) - 1)
                          + (strpos('0123456789ABCDEF',
                                    substr(hex(body), 2*i, 1)) - 1))),
                       0) AS bsum
              FROM m
            )
            SELECT doc_id,
                   CASE WHEN png THEN 'image/png'
                        ELSE 'application/octet-stream' END AS media_type,
                   CAST(CASE WHEN png THEN 8 + blen ELSE blen END
                        AS BIGINT) AS n_bytes,
                   CASE WHEN png THEN TRUE
                        ELSE substr(hex(body), 1, 8) = '52494646'
                        END AS is_decodable,
                   CASE WHEN png THEN (425.0 + bsum) / (8 + blen)
                        WHEN substr(hex(body), 1, 8) = '52494646'
                          THEN CAST(bsum AS DOUBLE) / blen
                        ELSE NULL END AS feature_mean
            FROM b ORDER BY doc_id""",
        # media_resize: stub decode makes dims a pure function of the
        # bytes (w = 1 + bytesum % 64, h = 1 + len % 64) and the 'resize'
        # a byte-prefix, so the whole binary path is SQL-exact
        "media_resize": f"""
            WITH m AS ({_MEDIA_HX_SQL}
            ), b AS (
              SELECT doc_id, png, hx,
                     CAST(length(hx)/2 AS INT) AS blen,
                     CAST({_bytesum_sql('hx')} AS BIGINT) AS bsum
              FROM m
            ), d AS (
              SELECT doc_id, png, hx, blen,
                     (png OR substr(hx, 1, 8) = '52494646'
                          OR substr(hx, 1, 8) = 'FFD8FFE0') AS ok,
                     CAST(1 + bsum % 64 AS INT) AS w,
                     CAST(1 + blen % 64 AS INT) AS h
              FROM b
            ), r AS (
              SELECT doc_id, png, hx, blen, ok, w, h,
                     CASE WHEN greatest(w, h) <= 16 THEN w
                          ELSE greatest(1, w * 16 // greatest(w, h))
                          END AS ow,
                     CASE WHEN greatest(w, h) <= 16 THEN h
                          ELSE greatest(1, h * 16 // greatest(w, h))
                          END AS oh
              FROM d
            )
            SELECT doc_id,
                   CASE WHEN png THEN 'image/png'
                        ELSE 'application/octet-stream' END AS media_type,
                   ok AS is_decodable,
                   CASE WHEN ok THEN w END AS src_width,
                   CASE WHEN ok THEN h END AS src_height,
                   CASE WHEN ok THEN ow END AS out_width,
                   CASE WHEN ok THEN oh END AS out_height,
                   CASE WHEN ok THEN least(blen, ow * oh) END AS thumb_len,
                   CASE WHEN ok THEN CAST(
                     {_bytesum_sql('substr(hx, 1, 2 * ow * oh)')}
                     AS BIGINT) END AS thumb_sum
            FROM r ORDER BY doc_id""",
        # media_frames: stub codec = fixed 64-byte payload slices, every
        # 4th frame at 40 ms/frame — exact over the hex expansion
        "media_frames": f"""
            WITH m AS ({_MEDIA_HX_SQL}
            ), f AS (
              SELECT doc_id, i AS frame_idx,
                     substr(hx, i*128 + 1, 128) AS fhex
              FROM m, UNNEST(generate_series(0,
                     CAST(ceil(length(hx)/128.0) AS INT) - 1)) AS u(i)
              WHERE i % 4 = 0
            )
            SELECT doc_id,
                   CAST(frame_idx AS INT) AS frame_idx,
                   CAST(frame_idx * 40 AS BIGINT) AS ts_ms,
                   CAST(length(fhex)/2 AS INT) AS frame_len,
                   CAST({_bytesum_sql('fhex')} AS BIGINT) AS frame_sum
            FROM f ORDER BY doc_id, frame_idx""",
        "media_audio": f"""
            WITH m AS ({_MEDIA_HX_SQL}
            ), c AS (
              SELECT doc_id, k AS chunk_idx,
                     k * 32 AS start_b,
                     substr(hx, k*64 + 1, 96) AS chex
              FROM m, UNNEST(generate_series(0,
                     CAST(ceil(length(hx)/64.0) AS INT) - 1)) AS u(k)
              WHERE k * 64 < length(hx)
            )
            SELECT doc_id,
                   CAST(chunk_idx AS INT) AS chunk_idx,
                   CAST(start_b // 4 AS BIGINT) AS start_ms,
                   CAST((start_b + length(chex)//2) // 4 AS BIGINT)
                     AS end_ms,
                   CAST(length(chex)//2 AS INT) AS chunk_len,
                   CAST({_bytesum_sql('chex')} AS BIGINT) AS chunk_sum,
                   {_bytesum_sql('chex')} * 1.0 / (length(chex)/2)
                     AS loudness
            FROM c ORDER BY doc_id, chunk_idx""",
    }


# ---------------------------------------------------------------------------
# flagship entry: a real crawl over a deterministic synthetic web
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Run a small end-to-end crawl (the engine's flagship op) and return
    the fetched table in crawl order."""
    import tempfile

    from abot_spark.crawler import WaveCrawler
    from abot_spark.sources.synthetic_web import generate_web, write_parquet

    fx = generate_web(n_domains=2, sections=2, leaves=2)
    data_dir = tempfile.mkdtemp(prefix="abot-entry-web-")
    paths = write_parquet(fx, data_dir)
    cfg = CrawlConfig(is_respect_robots_dot_text_enabled=True)
    crawler = WaveCrawler(
        spark, cfg, tempfile.mkdtemp(prefix="abot-entry-crawl-"),
        spark.read.parquet(paths["pages"]),
        spark.read.parquet(paths["robots"]))
    state = crawler.crawl(["http://d0.example.com/"], max_waves=20)
    fetched = crawler.store.read_all("fetched", state.wave)
    return fetched.select("url", "seq", "wave", "depth", "status_code",
                          "domain").orderBy("seq")
