"""Arrow-vectorized pandas UDF wrappers over the pure kernels.

Exactly two UDF families exist in the whole engine (per SURVEY.md §2.6 and
the BASELINE input_hint "no per-row Python"):

1. ``text_extract_udf`` — S4, ``Abot/Core/Extractors/WebContentExtractor.cs``
   charset precedence, byte-identical text (north_rule invariant).
2. ``links_udf`` — T1+T3, ``Abot/Core/Parsers/HapHyperLinkParser.cs`` +
   ``HyperLinkParser.GetUris``: href collection → absolutization →
   first-seen in-page dedup, emitted as ``array<string>`` for ``posexplode``.

Plus one small helper family for robots matching (F6) that evaluates
pre-flattened per-domain rules against URL paths.

All other operators are JVM-side Column expressions (whole-stage codegen).
The UDFs receive Arrow batches (pandas Series); the per-row work inside the
batch is unavoidable Python-object parsing (HTML), which is the same cost
model as the reference's per-page HAP parse — but amortized over Arrow
transfer and parallelized by Spark tasks.  Tune
``spark.sql.execution.arrow.maxRecordsPerBatch`` for ~MB-sized html cells.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from abot_spark.config import CrawlConfig
from abot_spark.functions.link_extract import get_links
from abot_spark.urls import split_authority_path
from abot_spark.functions.robots import path_allowed
from abot_spark.functions.text_extract import extract_text

EXTRACT_SCHEMA = StructType(
    [
        StructField("charset", StringType()),
        StructField("text", StringType()),
    ]
)

URL_STRUCT = StructType(
    [
        StructField("url", StringType()),
        StructField("domain", StringType()),
        StructField("path", StringType()),
    ]
)


def _url_parts(url: str | None) -> tuple[str | None, str | None, str | None]:
    from urllib.parse import urlsplit

    from abot_spark.urls import authority, canonicalize

    # all-null Arrow batches surface as NaN floats in pandas
    canon = canonicalize(url) if isinstance(url, str) and url else None
    if canon is None:
        return None, None, None
    try:
        path = urlsplit(canon).path or "/"
    except ValueError:
        path = "/"
    return canon, authority(canon), path


def canon_col(url: Column) -> Column:
    """``url -> struct<url,domain,path>`` — .NET-Uri-parity canonical form
    (:mod:`abot_spark.urls`), the seen-set key derivation (T8).  NULL when
    the URL is invalid by .NET rules (dropped silently, T3)."""

    @F.pandas_udf(URL_STRUCT)
    def _canon(url_s: pd.Series) -> pd.DataFrame:
        rows = [_url_parts(u) for u in url_s]
        return pd.DataFrame(rows, columns=["url", "domain", "path"])

    return _canon(url)


def text_extract_col(html: Column, content_type: Column) -> Column:
    """``(html binary, content_type) -> struct<charset,text>`` — S4.

    Byte-identical to ``WebContentExtractor.GetContent`` (:42-79); the
    kernel is :func:`abot_spark.functions.text_extract.extract_text`.
    """

    @F.pandas_udf(EXTRACT_SCHEMA)
    def _extract(html_s: pd.Series, ctype_s: pd.Series) -> pd.DataFrame:
        out_charset, out_text = [], []
        for html_b, ctype in zip(html_s, ctype_s):
            charset, text = extract_text(
                bytes(html_b) if html_b is not None else None,
                ctype if ctype is not None else None,
            )
            out_charset.append(charset)
            out_text.append(text)
        return pd.DataFrame({"charset": out_charset, "text": out_text})

    return _extract(html, content_type)


def links_col(cfg: CrawlConfig, text: Column, page_url: Column,
              x_robots_tag: Column) -> Column:
    """``(text, page_url, x_robots_tag) -> array<struct<url,domain,path>>``
    — T1+T3.

    ``text`` is the decoded html (the reference parses DOMs from
    ``Content.Text`` — ``Abot/Poco/CrawledPage.cs:57-70``).  Output order is
    the reference's scheduling order: all ``<a>``, then ``<area>``, then
    canonical ``<link>``s, first-seen deduped (``HyperLinkParser.cs:201-202``).
    domain/path ride along so the JVM side never re-parses the URL.
    Config is captured by value in the closure (broadcast with the task).
    """

    @F.pandas_udf(ArrayType(URL_STRUCT))
    def _links(text_s: pd.Series, url_s: pd.Series, xrt_s: pd.Series) -> pd.Series:
        out = []
        for text_v, url_v, xrt in zip(text_s, url_s, xrt_s):
            if text_v is None or url_v is None:
                out.append([])
                continue
            rows = []
            for link in get_links(text_v, url_v, cfg, xrt):
                # get_links output is already canonical: one cached split
                # recovers authority+path (host already lowercased,
                # default port already stripped)
                netloc, path = split_authority_path(link)
                rows.append({"url": link, "domain": netloc, "path": path})
            out.append(rows)
        return pd.Series(out)

    return _links(text, page_url, x_robots_tag)


# flat candidate rows produced by flat_links_map (T1+T3 fused with the
# explode): url/domain/path of each outlink plus the parent carry-through
FLAT_LINKS_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("domain", StringType()),
    StructField("path", StringType()),
    StructField("parent_seq", LongType()),
    StructField("parent_url", StringType()),
    StructField("depth", IntegerType()),
    StructField("pos", IntegerType()),
])


def flat_links_map(cfg: CrawlConfig):
    """``mapInArrow`` generator fusing T1+T3 with the explode.

    The ``links_col`` + ``posexplode`` plan builds 10^7s of Python dicts
    per wave, ships them as Arrow *nested* struct arrays, and then pays a
    JVM ``Generate`` + struct projection that profiles as expensive as the
    parse itself (see BENCH.md).  Emitting already-flat columns keeps the
    whole path primitive Arrow arrays: the per-page loop appends to flat
    lists, parent columns are Arrow ``take``s with a repeated index — no
    nested types, no Generate, and (vs the earlier ``mapInPandas`` shape)
    no pandas block materialization on either side of the kernel: input
    strings come straight off the Arrow buffers, output arrays are built
    by single ``pa.array`` C loops.  Input rows: (text, response_url,
    x_robots_tag, seq, url, depth); output: FLAT_LINKS_SCHEMA with
    ``depth`` already +1 and ``pos`` the in-page first-seen link index
    (T5 ordering key).
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    names = [f.name for f in FLAT_LINKS_SCHEMA.fields]

    def gen(batches):
        for rb in batches:
            col = {name: rb.column(i)
                   for i, name in enumerate(rb.schema.names)}
            urls: list[str] = []
            domains: list[str] = []
            paths: list[str] = []
            counts = np.zeros(rb.num_rows, dtype=np.int64)
            text_a = col["text"].to_pylist()
            rurl_a = col["response_url"].to_pylist()
            xrt_a = col["x_robots_tag"].to_pylist()
            for i in range(rb.num_rows):
                text_v, url_v = text_a[i], rurl_a[i]
                if text_v is None or url_v is None:
                    continue
                links = get_links(text_v, url_v, cfg, xrt_a[i])
                counts[i] = len(links)
                for link in links:
                    netloc, path = split_authority_path(link)
                    urls.append(link)
                    domains.append(netloc)
                    paths.append(path)
            if not urls:
                continue
            pos = np.concatenate(
                [np.arange(c, dtype=np.int32) for c in counts if c > 0])
            idx = pa.array(np.repeat(
                np.arange(rb.num_rows, dtype=np.int64), counts))
            yield pa.RecordBatch.from_arrays([
                pa.array(urls, type=pa.string()),
                pa.array(domains, type=pa.string()),
                pa.array(paths, type=pa.string()),
                pc.take(col["seq"], idx),
                pc.take(col["url"], idx),
                pc.add(pc.take(col["depth"], idx),
                       pa.scalar(1, pa.int32())),
                pa.array(pos, type=pa.int32()),
            ], names=names)

    return gen


def shard_maybe_col(base_dir: str, n_shards: int, expected_per_shard: int,
                    fpp: float, through_wave: int, hash_col: Column) -> Column:
    """``url_hash -> boolean`` — sharded seen-set Bloom probe (T5/T8 fast
    path; SURVEY.md §4 "Seen-set at 10^10").

    The executor-side half of :class:`abot_spark.store.BloomSeenShards`:
    no broadcast — each Arrow batch groups its hashes by shard bucket
    (``hash % B``, floored == Spark ``pmod``) and probes that bucket's
    newest ``wave <= through_wave`` file from shared storage.  Evaluate
    AFTER repartitioning by the same bucket key so a task only ever loads
    the few shards its partition holds; shard files are immutable
    (atomic-rename writes), so the per-executor cache keys on the path
    alone.  A bucket with no file never absorbed a key: definitely new.

    False means *definitely not seen* — those candidates skip the exact
    seen-join entirely; True rows continue to the exact join, so bloom
    false positives never mis-mark a URL (the no-false-negatives contract
    of ``CrawledUrlRepositoryTest.cs:60-89`` is preserved end-to-end).
    """
    import numpy as np

    @F.pandas_udf(BooleanType())
    def _maybe(h: pd.Series) -> pd.Series:
        from abot_spark.functions import sketches
        from abot_spark.store import bloom_shard_load, bloom_shard_newest

        cache = getattr(sketches, "_SHARD_UDF_CACHE", None)
        if cache is None:
            cache = sketches._SHARD_UDF_CACHE = {}
        arr = h.to_numpy(dtype=np.int64)
        buckets = arr % n_shards          # floored: matches JVM pmod
        out = np.zeros(len(arr), dtype=bool)
        for b in np.unique(buckets):
            m = buckets == b
            ls_key = (base_dir, int(b), through_wave)
            path = cache.get(ls_key, 0)   # 0 = unresolved; None = no file
            if path == 0:
                path = bloom_shard_newest(base_dir, int(b), through_wave)
                if len(cache) > 8192:     # bound: stale waves' entries
                    cache.clear()
                cache[ls_key] = path
            if path is None:
                continue                  # bucket never absorbed: all new
            bf = cache.get(path)
            if bf is None:
                bf = bloom_shard_load(path, expected_per_shard, fpp)
                cache[path] = bf
            out[m] = bf.contains_many(arr[m])
        return pd.Series(out)

    return _maybe(hash_col)


def robots_allowed_col(path: Column, allow_rules: Column,
                       disallow_rules: Column) -> Column:
    """``(path, allow_rules, disallow_rules) -> boolean`` — F6 verdict.

    Rules are pre-flattened per (domain, user-agent) by
    :func:`abot_spark.functions.robots.parse_robots_rules` and arrive via a
    broadcast join on domain; NULL rule arrays (no robots.txt) allow.
    Longest-match semantics per the RobotsDotTextTest contract.
    """

    @F.pandas_udf(BooleanType())
    def _allowed(path_s: pd.Series, allow_s: pd.Series, dis_s: pd.Series) -> pd.Series:
        out = []
        for path_v, allow_v, dis_v in zip(path_s, allow_s, dis_s):
            if allow_v is None and dis_v is None:
                out.append(True)
                continue
            out.append(
                path_allowed(
                    path_v if path_v else "/",
                    list(allow_v) if allow_v is not None else [],
                    list(dis_v) if dis_v is not None else [],
                )
            )
        return pd.Series(out)

    return _allowed(path, allow_rules, disallow_rules)
