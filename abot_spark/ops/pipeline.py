"""Composed corpus-cleaning pipeline over ``documents`` — the canonical
training-data preparation flow a 100 TB web corpus goes through before
tokenization:

    quality gate -> language id -> exact dedup -> MinHash near-dup removal

Single-scan design: every per-document feature (char/token counts,
language marker scores, content digest, MinHash LSH band keys) is computed
in ONE projection over the input, so the 100 TB table is read once.  The
only shuffles after that are the ones the semantics require:

  1. digest canonicalization — ``min(doc_id) OVER (PARTITION BY digest)``
     (hash-partitioned window; map-side the gate has already dropped the
     junk rows, so only surviving docs shuffle);
  2. the LSH band self-join (band_key equi-join of two compact
     ``(doc_id, band, band_key)`` projections — the html/text columns never
     shuffle).

Stage order matters and is part of the contract: the quality gate runs
FIRST (cheapest, biggest fan-in reduction), dedup stages only see
survivors.  Near-dup policy is deterministic: any doc that appears as the
GREATER member of a candidate pair is dropped, so the smallest doc_id of
every near-dup cluster survives regardless of partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from abot_spark.ops.dedup import (
    normalize_text,
    shingles_from_tokens,
    spread_input,
)
from abot_spark.ops.textstats import (
    dup_line_frac_col,
    gopher_cols,
    lang_pred_col,
    lang_scores,
    quality_cols,
)


def clean_corpus(documents: DataFrame, min_tokens: int = 30,
                 min_chars: int = 200, keep_langs: tuple[str, ...] = (),
                 minhash_k: int = 8, bands: int = 4,
                 shingle_n: int = 3, gopher: bool = False,
                 gopher_stopwords: list[str] | None = None,
                 max_dup_line_frac: float | None = None) -> DataFrame:
    """Surviving docs as (doc_id, pred_lang, n_chars, n_tokens).

    ``keep_langs`` empty = no language filter (pred_lang still reported).
    MinHash parameters match ``dedup.minhash_candidate_pairs`` so the
    near-dup stage is the same operator, inlined into the single scan.
    ``gopher=True`` adds the Gopher A1.1 keep verdict
    (``gopher_stopwords`` substitutes a per-corpus stop-word gate list
    for Gopher's published English default — the RefinedWeb/Dolma
    per-language adaptation) and
    ``max_dup_line_frac`` the row-local duplicate-line gate (both are
    pure array/regex expressions, so the RefinedWeb-style full rule set
    still costs ZERO extra scans or shuffles — they ride the same base
    projection and shrink everything downstream).
    """
    q = quality_cols(F.col("text"))
    scores = lang_scores(F.col("text"))
    extra = []
    if gopher:
        extra.append(gopher_cols(F.col("text"), gopher_stopwords)["keep"]
                     .alias("_gopher_ok"))
    if max_dup_line_frac is not None:
        extra.append(dup_line_frac_col(F.col("text")).alias("_dup_lines"))
    # one projection computes every per-doc feature; the token array is
    # projected separately so the k signature mins share it (Catalyst
    # cannot CSE non-trivial children inside transform lambdas)
    base = spread_input(documents).select(
        "doc_id",
        q["n_chars"].alias("n_chars"),
        q["n_tokens"].alias("n_tokens"),
        F.md5(normalize_text(F.col("text"))).alias("digest"),
        F.split(normalize_text(F.col("text")), " ").alias("_toks"),
        *[c.alias(f"score_{lang}") for lang, c in scores.items()],
        *extra,
    )
    base = base.withColumn(
        "pred_lang",
        lang_pred_col({lang: F.col(f"score_{lang}") for lang in scores}))

    gated = base.filter((F.col("n_tokens") >= min_tokens)
                        & (F.col("n_chars") >= min_chars))
    if gopher:
        gated = gated.filter(F.col("_gopher_ok"))
    if max_dup_line_frac is not None:
        gated = gated.filter(F.col("_dup_lines") <= max_dup_line_frac)
    if keep_langs:
        gated = gated.filter(F.col("pred_lang").isin(*keep_langs))

    # exact dedup among survivors: keep the min doc_id per digest
    w = Window.partitionBy("digest")
    uniq = (gated
            .withColumn("_canon", F.min("doc_id").over(w))
            .filter(F.col("doc_id") == F.col("_canon")))

    # MinHash signatures off the shared token array (same construction as
    # dedup.minhash_signatures), then band keys, then the LSH self-join —
    # only (doc_id, band, band_key) rows shuffle
    sh = uniq.select(
        "doc_id", "pred_lang", "n_chars", "n_tokens",
        shingles_from_tokens(F.col("_toks"), shingle_n).alias("_sh"))

    def salted_min(i: int):
        return F.array_min(F.transform(
            F.col("_sh"), lambda s: F.md5(F.concat(F.lit(f"{i}:"), s))))

    sigs = sh.select(
        "doc_id", "pred_lang", "n_chars", "n_tokens",
        *[salted_min(i).alias(f"sig_{i}") for i in range(minhash_k)])
    # sigs feeds the band explode AND the final anti-join — cache it so
    # the shingle/signature CPU runs once per row
    sigs = sigs.cache()

    rows_per_band = minhash_k // bands
    # near-dup drop set in ONE shuffle: band keys posexploded off a single
    # scan of the cached signatures (not a 4-branch union), then one
    # groupBy((band, band_key)) per bucket — a doc is a near-duplicate iff
    # some bucket contains a smaller doc_id, i.e. iff it is a NON-MINIMUM
    # member of at least one bucket, so the bucket's sorted member array
    # minus its head IS the drop set.  No band-table self-join, no
    # O(|bucket|^2) pair rows (the old a<b self-join materialized every
    # pair just to keep the right side).  Same semantics as
    # dedup.minhash_candidate_pairs' bucket expansion.
    band_keys = F.array(*[
        F.md5(F.concat_ws("|", *[
            F.col(f"sig_{b * rows_per_band + j}")
            for j in range(rows_per_band)]))
        for b in range(bands)])
    band_df = sigs.select(
        "doc_id", F.posexplode(band_keys).alias("band", "band_key"))
    near = (band_df.groupBy("band", "band_key")
            .agg(F.array_distinct(F.sort_array(F.collect_list("doc_id")))
                 .alias("_ds"))
            .select(F.explode(
                F.slice(F.col("_ds"), 2, F.size(F.col("_ds")) - 1))
                .alias("doc_id"))
            .distinct())

    return (sigs.join(near, "doc_id", "left_anti")
            .select("doc_id", "pred_lang", "n_chars", "n_tokens"))
