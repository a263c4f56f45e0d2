"""Custom stateful streaming operator: per-domain politeness pacing via
``applyInPandasWithState``.

The batch engine enforces C3 per wave (quota window + in-partition
pacing — ``crawler.py``/``plans/wave.py``).  A continuous deployment
needs the same token-gate semantics across an unbounded stream of
discovered URLs: the reference's ``RateLimiter`` admits at most one
occurrence per delay window per authority and blocks callers until the
window frees (``Abot/Utils/RateLimiter.cs:55-142``;
``DomainRateLimiter.RateLimit`` at
``Abot/Core/Limiters/DomainRateLimiter.cs:41-72``).  That is exactly the
shape of a keyed stateful stream operator:

- **group key** = domain — the same axis the batch wave partitions
  politeness by, so state stays tiny (one row per live authority) and
  shuffles hash on the natural key;
- **state** = ``next_free_ms``, a single long per domain — the
  continuous analogue of the rate limiter's token timestamp.  It
  persists in the state store across micro-batches (and restarts via
  the checkpoint), which no stateless stream stage can express;
- **admissions** within a micro-batch are ordered deterministically by
  ``(discovered_ts, url)`` — the streaming counterpart of the wave's
  ``(wave, seq)`` total order, so replays are byte-identical.

At crawl scale the state store holds one long per domain (10^7 domains
≈ hundreds of MB across the cluster, RocksDB-backed); the stage shuffles
only the micro-batch, never history.  Skewed domains do not skew the
*state* (one row regardless of volume); their row volume rides the same
salted-repartition story as the batch fetch stage.
"""

from __future__ import annotations

import os
from collections.abc import Iterator
from typing import TYPE_CHECKING

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql.streaming import StreamingQuery

PACE_IN_SCHEMA = "url string, domain string, discovered_ts timestamp"
PACE_OUT_SCHEMA = "url string, domain string, fetch_at_ms long"
PACE_STATE_SCHEMA = "next_free_ms long"


def politeness_pacing_stream(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    default_delay_ms: int = 1000,
    delays: dict[str, int] | None = None,
    trigger_available_now: bool = True,
) -> "StreamingQuery":
    """Continuous C3: assign each discovered URL its earliest polite
    fetch time, one admission per ``delay`` window per domain, with the
    window carried across micro-batches in keyed state.

    ``delays`` overrides the per-domain delay (the batch engine computes
    it as ``max(robots crawl-delay capped, config minimum)`` —
    ``PoliteWebCrawler.cs:146-167``); ``default_delay_ms`` covers the
    rest.
    """
    delay_map = dict(delays or {})

    def pace(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (domain,) = key
        delay = int(delay_map.get(domain, default_delay_ms))
        next_free = int(state.get[0]) if state.exists else 0
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["discovered_ts", "url"],
                                kind="mergesort", ignore_index=True)
        fetch_at = []
        for ts in rows["discovered_ts"]:
            t = int(pd.Timestamp(ts).value // 1_000_000)   # ns -> ms
            at = max(t, next_free)
            fetch_at.append(at)
            next_free = at + delay
        state.update((next_free,))
        yield pd.DataFrame({"url": rows["url"],
                            "domain": domain,
                            "fetch_at_ms": fetch_at})

    stream = spark.readStream.schema(PACE_IN_SCHEMA).parquet(input_dir)
    paced = stream.groupBy("domain").applyInPandasWithState(
        pace,
        outputStructType=PACE_OUT_SCHEMA,
        stateStructType=PACE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    writer = (paced.writeStream.format("parquet")
              .option("path", out_dir)
              .option("checkpointLocation",
                      os.path.join(out_dir, "_checkpoint"))
              .outputMode("append"))
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
