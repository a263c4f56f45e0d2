"""Multimodal-column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``.

The Spark-side contract (schema, batching, partitioning) is real and
tested; the codec work itself is STUBBED behind ``_decode_image`` because
no image/audio library ships in this container — a deployment swaps in
PIL/ffmpeg inside the same batch loop without touching the plan.

Pipeline shape for 100 TB of media:
- media rides in its own column family (parquet binary column); metadata
  (width/height/duration/codec) is extracted once and stored as plain
  columns so filters prune *before* bytes are read (Parquet column
  pruning: a plan that filters on ``meta.width`` never deserializes
  ``media``);
- ``mapInPandas`` (not a scalar UDF) so one Python invocation sees a whole
  Arrow batch and can early-exit on undecodable rows;
- partition sizing: media cells are MB-scale — set
  ``spark.sql.files.maxPartitionBytes`` so a task holds O(100) cells, and
  repartition by a content-hash bucket to even out file-size skew.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = ("doc_id long, media binary, media_type string, "
                "meta_width int, meta_height int")

FEATURE_SCHEMA = ("doc_id long, media_type string, n_bytes long, "
                  "is_decodable boolean, feature_mean double")


def _decode_image(data: bytes) -> dict:
    """STUB: real deployments decode via PIL/libvips here.

    Deterministic fake: treats the byte histogram as the 'decoded'
    signal so tests exercise the full batch path end-to-end."""
    if not data or data[:4] not in (b"\x89PNG", b"RIFF", b"\xff\xd8\xff\xe0"):
        return {"ok": False, "mean": None}
    return {"ok": True, "mean": sum(data) / len(data)}


def extract_media_features(media_df: DataFrame) -> DataFrame:
    """binary media column -> per-item features via one mapInPandas pass."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"doc_id": [], "media_type": [], "n_bytes": [],
                   "is_decodable": [], "feature_mean": []}
            for doc_id, blob, mtype in zip(
                    pdf["doc_id"], pdf["media"], pdf["media_type"]):
                data = bytes(blob) if blob is not None else b""
                dec = _decode_image(data)
                out["doc_id"].append(doc_id)
                out["media_type"].append(mtype)
                out["n_bytes"].append(len(data))
                out["is_decodable"].append(dec["ok"])
                out["feature_mean"].append(dec["mean"] if dec["ok"] else None)
            yield pd.DataFrame(out)

    return media_df.mapInPandas(batches, FEATURE_SCHEMA)


def synth_media(documents: DataFrame) -> DataFrame:
    """Deterministic fake media column derived from documents — PNG magic
    for every third row, garbage otherwise — so the decode path has both
    branches to chew on."""
    return documents.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0,
               F.concat(F.lit(b"\x89PNG\r\n\x1a\n"),
                        F.encode(F.col("text"), "utf-8")))
        .otherwise(F.encode(F.substring(F.col("text"), 1, 16), "utf-8"))
        .alias("media"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("image/png"))
        .otherwise(F.lit("application/octet-stream")).alias("media_type"),
        F.lit(None).cast("int").alias("meta_width"),
        F.lit(None).cast("int").alias("meta_height"),
    )
