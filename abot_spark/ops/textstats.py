"""Text-analysis operators for a training-data pipeline over ``documents``.

All JVM-side Column expressions (whole-stage codegen; zero UDFs), each with
an exact ANSI-SQL equivalent for the DuckDB oracle (see
``__spark_entry__.oracle_sql``).  Cross-engine determinism rules used
throughout the ops modules:

- hashing is md5-hex-string based (identical output in Spark and DuckDB;
  also matches the reference's seen-set being an MD5 prefix,
  ``Abot/Core/Repositories/CrawledUrlRepository.cs:58-76``);
- float outputs are rounded to 4 decimals before comparison;
- every ranking has a total deterministic tie-break.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# tiny per-language marker lists for the n-gram/stopword language heuristic;
# chosen to be regex-safe in both engines
LANG_MARKERS = {
    "en": ["the", "and", "of", "with", "fast"],
    "de": ["und", "der", "die", "das", "mit"],
    "es": ["el", "la", "los", "con", "por"],
    "fr": ["le", "les", "des", "avec", "pour"],
    "zh": ["de", "shi", "zai", "he", "le"],
}
EN_STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it"]


def token_count_col(text: Column) -> Column:
    """Whitespace tokenization; empty text -> 0 tokens."""
    trimmed = F.trim(F.coalesce(text, F.lit("")))
    return F.when(trimmed == "", F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+")))


# GPT-2-style pretokenizer approximation: English contractions, letter
# runs, digit runs, punctuation runs (each with an optional leading
# space), lone apostrophes.  Deliberately lookaround-free and ASCII so
# Java regex (Spark), RE2 (DuckDB) and Python `re` agree byte-for-byte —
# the BPE-ish proxy for "how many subword tokens would this text cost".
BPE_TOKEN_PATTERN = (
    r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s']+|'")


def subword_count_col(text: Column) -> Column:
    """BPE-ish token count via ``BPE_TOKEN_PATTERN`` (JVM-side regex —
    no Python in the hot path); empty/null text -> 0."""
    return F.size(F.regexp_extract_all(
        F.coalesce(text, F.lit("")), F.lit(BPE_TOKEN_PATTERN), F.lit(0)))


def quality_cols(text: Column) -> dict[str, Column]:
    """Length / punctuation / stopword-ratio quality features."""
    t = F.coalesce(text, F.lit(""))
    n_chars = F.length(t)
    n_tokens = token_count_col(t)
    n_punct = F.length(t) - F.length(F.regexp_replace(t, r"[\.,;:!\?]", ""))
    stop_pat = r"\b(" + "|".join(EN_STOPWORDS) + r")\b"
    n_stop = F.size(F.regexp_extract_all(F.lower(t), F.lit(stop_pat), F.lit(0)))
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "punct_ratio": F.round(n_punct / F.greatest(n_chars, F.lit(1)), 4),
        "stopword_ratio": F.round(n_stop / F.greatest(n_tokens, F.lit(1)), 4),
        "mean_token_len": F.round(
            (n_chars - n_tokens + 1) / F.greatest(n_tokens, F.lit(1)), 4),
    }


def quality_score(documents: DataFrame) -> DataFrame:
    cols = quality_cols(F.col("text"))
    return documents.select(
        "doc_id", *[c.alias(name) for name, c in cols.items()])


def lang_scores(text: Column) -> dict[str, Column]:
    scores = {}
    low = F.lower(F.coalesce(text, F.lit("")))
    for lang, markers in LANG_MARKERS.items():
        pat = r"\b(" + "|".join(markers) + r")\b"
        scores[lang] = F.size(F.regexp_extract_all(low, F.lit(pat), F.lit(0)))
    return scores


def lang_pred_col(score_of: dict[str, Column]) -> Column:
    """Argmax language from per-language score columns; ties broken by
    the fixed ``LANG_MARKERS`` order (a CASE cascade, deterministic in
    both engines)."""
    max_score = F.greatest(*[score_of[k] for k in LANG_MARKERS])
    pred = None
    for k in LANG_MARKERS:
        cond = score_of[k] == max_score
        pred = F.when(cond, F.lit(k)) if pred is None else pred.when(cond, F.lit(k))
    return pred


def lang_id(documents: DataFrame) -> DataFrame:
    """Marker-token language heuristic: argmax score, ties broken by the
    fixed language order (deterministic in both engines via a greatest-of-
    structs / CASE cascade)."""
    scores = lang_scores(F.col("text"))
    out = documents.select("doc_id", "lang", *[
        c.alias(f"score_{k}") for k, c in scores.items()])
    return out.withColumn(
        "pred_lang",
        lang_pred_col({k: F.col(f"score_{k}") for k in LANG_MARKERS}))


def fingerprint(documents: DataFrame, k: int = 8) -> DataFrame:
    """Document fingerprint: lexicographic-min md5 over word k-grams
    (winnowing-lite).  Shorter docs fall back to the whole-text hash."""
    # tokens projected first: inlining the split into the transform lambda
    # would re-split the text once per gram (Catalyst can't CSE through
    # lambda bodies — see ops/dedup.shingles_from_tokens)
    toks = documents.select(
        "doc_id", "text",
        F.split(F.trim(F.col("text")), r"\s+").alias("_toks"))
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size("_toks") - k, F.lit(0))),
        lambda i: F.array_join(F.slice(F.col("_toks"), i + 1, k), " "),
    )
    fp = F.array_min(F.transform(grams, lambda g: F.md5(g)))
    return toks.select(
        "doc_id",
        F.coalesce(fp, F.md5(F.col("text"))).alias("fingerprint"),
    )


def ngram_topk(documents: DataFrame, n: int = 2, k: int = 10,
               by_lang: bool = True) -> DataFrame:
    """(lang, ngram, n_docs, rank): top-``k`` word n-grams per language
    by *document* frequency — the corpus-profiling step that surfaces
    boilerplate candidates and template families before dedup.

    Document frequency (not term frequency) so one spammy document
    cannot dominate; ties break on the n-gram string so the rank is
    total and engine-portable.

    Scale notes (100 TB corpus): explode → one partial-aggregated
    groupBy((lang, ngram)); the rank window partitions by ``lang``
    (bounded cardinality) over rows already shrunk to distinct n-grams —
    at frontier scale, pre-filtering with ``n_docs > 1`` before the
    window drops the long unique tail ahead of the sort.
    """
    from abot_spark.ops.dedup import normalize_text, shingles_from_tokens

    lang_col = F.col("lang") if by_lang else F.lit("all")
    grams = documents.select(
        lang_col.alias("lang"), "doc_id",
        F.split(normalize_text(F.col("text")), " ").alias("_toks")
    ).select(
        "lang", "doc_id",
        F.explode(shingles_from_tokens(F.col("_toks"), n)).alias("ngram"))
    df = grams.groupBy("lang", "ngram").agg(
        F.count_distinct("doc_id").alias("n_docs"))
    w = Window.partitionBy("lang").orderBy(
        F.col("n_docs").desc(), F.col("ngram"))
    return (df.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("lang", "ngram", "n_docs", "rank"))
