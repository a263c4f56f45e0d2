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

RESIZE_SCHEMA = ("doc_id long, media_type string, is_decodable boolean, "
                 "src_width int, src_height int, out_width int, "
                 "out_height int, thumb binary, thumb_sum long")

FRAME_SCHEMA = ("doc_id long, frame_idx int, ts_ms long, frame binary, "
                "frame_len int, frame_sum long")


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


def _decode_dims(data: bytes) -> tuple[int, int] | None:
    """STUB dimension decode (real deployments read the codec header).

    Deterministic fake: width/height derived from the byte-sum and
    length, so the resize math downstream is exact and SQL-checkable."""
    if not data or data[:4] not in (b"\x89PNG", b"RIFF", b"\xff\xd8\xff\xe0"):
        return None
    return 1 + sum(data) % 64, 1 + len(data) % 64


def resize_images(media_df: DataFrame, max_dim: int = 16) -> DataFrame:
    """Fit each decodable image inside ``max_dim`` × ``max_dim`` (aspect
    preserved, integer math) via one ``mapInPandas`` pass.

    The pixel work is STUBBED: the 'thumbnail' is the first
    ``out_w*out_h`` payload bytes — a real deployment swaps PIL's
    ``Image.thumbnail`` into the same batch loop.  Binary-in →
    binary-out is the Spark plumbing under test: thumb rides out as a
    ``binary`` column plus its byte-sum so parity checks stay numeric."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in ("doc_id", "media_type", "is_decodable",
                                   "src_width", "src_height", "out_width",
                                   "out_height", "thumb", "thumb_sum")}
            for doc_id, blob, mtype in zip(
                    pdf["doc_id"], pdf["media"], pdf["media_type"]):
                data = bytes(blob) if blob is not None else b""
                dims = _decode_dims(data)
                out["doc_id"].append(doc_id)
                out["media_type"].append(mtype)
                out["is_decodable"].append(dims is not None)
                if dims is None:
                    for k in ("src_width", "src_height", "out_width",
                              "out_height", "thumb", "thumb_sum"):
                        out[k].append(None)
                    continue
                w, h = dims
                m = max(w, h)
                ow, oh = ((w, h) if m <= max_dim else
                          (max(1, w * max_dim // m), max(1, h * max_dim // m)))
                thumb = data[:ow * oh]
                out["src_width"].append(w)
                out["src_height"].append(h)
                out["out_width"].append(ow)
                out["out_height"].append(oh)
                out["thumb"].append(thumb)
                out["thumb_sum"].append(sum(thumb))
            yield pd.DataFrame(out)

    return media_df.mapInPandas(batches, RESIZE_SCHEMA)


def sample_frames(media_df: DataFrame, frame_bytes: int = 64,
                  every: int = 4, frame_ms: int = 40) -> DataFrame:
    """1→N frame sampling: each media payload explodes into every
    ``every``-th frame, via one ``mapInPandas`` pass.

    The codec is STUBBED: a 'frame' is a fixed ``frame_bytes`` slice of
    the payload at 1000/``frame_ms`` fps — a real deployment swaps
    pyav/ffmpeg keyframe extraction into the same loop.  The plumbing
    under test is the row *expansion* inside an Arrow batch (the output
    batch is bigger than the input batch), which is exactly how video →
    frame-sample runs at 100 TB: no explode shuffle, no driver round-trip."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in ("doc_id", "frame_idx", "ts_ms", "frame",
                                   "frame_len", "frame_sum")}
            for doc_id, blob in zip(pdf["doc_id"], pdf["media"]):
                data = bytes(blob) if blob is not None else b""
                n_frames = -(-len(data) // frame_bytes)   # ceil
                for i in range(0, n_frames, every):
                    fr = data[i * frame_bytes:(i + 1) * frame_bytes]
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["ts_ms"].append(i * frame_ms)
                    out["frame"].append(fr)
                    out["frame_len"].append(len(fr))
                    out["frame_sum"].append(sum(fr))
            yield pd.DataFrame(out)

    return media_df.mapInPandas(batches, FRAME_SCHEMA)


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


AUDIO_CHUNK_SCHEMA = ("doc_id long, chunk_idx int, start_ms long, "
                      "end_ms long, chunk binary, chunk_len int, "
                      "chunk_sum long, loudness double")


def chunk_audio(media_df: DataFrame, chunk_bytes: int = 48,
                hop_bytes: int = 32, bytes_per_ms: int = 4) -> DataFrame:
    """1→N *overlapping* audio windowing (the ASR/feature-extraction
    shape: fixed windows with hop < window, e.g. 30 s windows on a 20 s
    hop) via one ``mapInPandas`` pass.

    The codec is STUBBED: payload bytes stand in for PCM samples —
    window k covers bytes ``[k*hop, k*hop + chunk_bytes)`` and its
    'loudness' is the mean byte value — a real deployment swaps
    soundfile/ffmpeg PCM decode into the same loop.  The plumbing under
    test is overlapping 1→N expansion inside an Arrow batch: unlike
    :func:`sample_frames` the output windows share bytes, which is why
    this must happen batch-side (an ``explode`` of pre-built slices
    would shuffle each overlapped byte twice).
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in ("doc_id", "chunk_idx", "start_ms",
                                   "end_ms", "chunk", "chunk_len",
                                   "chunk_sum", "loudness")}
            for doc_id, blob in zip(pdf["doc_id"], pdf["media"]):
                data = bytes(blob) if blob is not None else b""
                k = 0
                while k * hop_bytes < len(data):
                    start = k * hop_bytes
                    chunk = data[start:start + chunk_bytes]
                    s = sum(chunk)
                    out["doc_id"].append(doc_id)
                    out["chunk_idx"].append(k)
                    out["start_ms"].append(start // bytes_per_ms)
                    out["end_ms"].append((start + len(chunk)) // bytes_per_ms)
                    out["chunk"].append(chunk)
                    out["chunk_len"].append(len(chunk))
                    out["chunk_sum"].append(s)
                    out["loudness"].append(s / len(chunk))
                    k += 1
            yield pd.DataFrame(out)

    return media_df.mapInPandas(batches, AUDIO_CHUNK_SCHEMA)
