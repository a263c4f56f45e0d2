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
# Gopher's published stop-word gate list (Rae et al. 2021 §A1.1: "contain
# at least two of the following English words: the, be, to, of, and,
# that, have, with") — distinct from EN_STOPWORDS, which feeds the
# lang-id/quality-ratio heuristics.
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


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


def gopher_cols(text: Column,
                stopwords: list[str] | None = None) -> dict[str, Column]:
    """The Gopher gate feature columns (see :func:`gopher_quality`) as a
    dict, so the composed pipeline can inline them into its single-scan
    projection.  ``stopwords`` defaults to Gopher's published 8-word
    English list (``GOPHER_STOPWORDS``); the gate is language-specific,
    so RefinedWeb/Dolma-style pipelines substitute a per-corpus list."""
    t = F.coalesce(text, F.lit(""))
    trimmed = F.trim(t)
    words = F.when(trimmed == "", F.array().cast("array<string>")) \
        .otherwise(F.split(trimmed, r"\s+"))
    n_words = F.size(words)
    mean_word_len = F.round(
        F.aggregate(words, F.lit(0), lambda acc, w: acc + F.length(w))
        / F.greatest(n_words, F.lit(1)), 4)
    # Gopher's symbol set: '#' and '...' (ellipsis)
    n_hash = F.length(t) - F.length(F.regexp_replace(t, r"#", ""))
    n_ellipsis = F.floor(
        (F.length(t) - F.length(F.regexp_replace(t, r"\.\.\.", ""))) / 3)
    symbol_word_ratio = F.round(
        (n_hash + n_ellipsis) / F.greatest(n_words, F.lit(1)), 4)
    alpha_word_frac = F.round(
        F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]")))
        / F.greatest(n_words, F.lit(1)), 4)
    lines = F.filter(
        F.transform(F.split(t, r"\n"), lambda x: F.trim(x)),
        lambda x: x != "")
    n_lines = F.size(lines)
    bullet_line_frac = F.round(
        F.size(F.filter(lines, lambda x: x.rlike(r"^[-*]")))
        / F.greatest(n_lines, F.lit(1)), 4)
    ellipsis_line_frac = F.round(
        F.size(F.filter(lines, lambda x: x.rlike(r"\.\.\.$")))
        / F.greatest(n_lines, F.lit(1)), 4)
    stop_pat = r"\b(" + "|".join(stopwords or GOPHER_STOPWORDS) + r")\b"
    n_stop_distinct = F.size(F.array_distinct(
        F.regexp_extract_all(F.lower(t), F.lit(stop_pat), F.lit(0))))
    keep = ((n_words >= 50) & (n_words <= 100_000)
            & (mean_word_len >= 3) & (mean_word_len <= 10)
            & (symbol_word_ratio <= 0.1)
            & (bullet_line_frac <= 0.9) & (ellipsis_line_frac <= 0.3)
            & (alpha_word_frac >= 0.8) & (n_stop_distinct >= 2))
    return {
        "n_words": n_words,
        "mean_word_len": mean_word_len,
        "symbol_word_ratio": symbol_word_ratio,
        "bullet_line_frac": bullet_line_frac,
        "ellipsis_line_frac": ellipsis_line_frac,
        "alpha_word_frac": alpha_word_frac,
        "n_stop_distinct": n_stop_distinct.cast("int"),
        "keep": keep,
    }


def dup_line_frac_col(text: Column) -> Column:
    """Row-local duplicate-line fraction — (lines - distinct lines) /
    lines over nonempty trimmed ``\\n``-spans; the same value
    :func:`repetition_scores` computes via its groupBy (``sum(cnt-1) /
    sum(cnt)``), but as a pure array expression so the composed pipeline
    can gate on it inside its single scan without a shuffle."""
    lines = F.filter(
        F.transform(F.split(F.coalesce(text, F.lit("")), r"\n"),
                    lambda x: F.trim(x)),
        lambda x: x != "")
    return F.round(
        (F.size(lines) - F.size(F.array_distinct(lines)))
        / F.greatest(F.size(lines), F.lit(1)), 4)


def gopher_quality(documents: DataFrame,
                   stopwords: list[str] | None = None) -> DataFrame:
    """Gopher-style document quality gates (Rae et al. 2021 §A1.1, the
    rule set RefinedWeb/Dolma-style pipelines reuse): per-document word
    count, mean word length, symbol-to-word ratio, bullet/ellipsis line
    fractions, alphabetic-word fraction, distinct-stopword count, and
    the combined ``keep`` verdict with the published thresholds
    (50 <= words <= 100k, 3 <= mean word len <= 10, symbols/word <= 0.1,
    bullet lines <= 90%, ellipsis lines <= 30%, >= 80% words with an
    alphabetic char, >= 2 distinct stopwords from Gopher's published
    8-word list — ``GOPHER_STOPWORDS``).

    Scale notes: pure higher-order array/regex Column expressions —
    whole-stage codegen, zero UDFs, ZERO shuffles (each document is
    scored from its own row); thresholds compare 4-decimal-rounded
    ratios so the DuckDB oracle makes identical keep decisions.
    """
    cols = gopher_cols(F.col("text"), stopwords)
    return documents.select(
        "doc_id", *[c.alias(name) for name, c in cols.items()])


def repetition_scores(documents: DataFrame) -> DataFrame:
    """Within-document repetition signals (the Gopher/RefinedWeb
    repetition-removal family): duplicate-line fraction and char
    fraction, plus the character share of the most frequent word 2-gram.

    Definitions (documented so the oracle is exact):

    - a "line" is a nonempty ``trim``med ``\\n``-span; ``dup_line_frac``
      = repeats beyond each line's first occurrence / total lines;
      ``dup_line_char_frac`` weights the same by line length;
    - ``top_2gram_char_frac`` = occurrences x length of the most
      frequent word 2-gram over the normalized text (ties: lexicographic
      smallest gram), divided by the normalized text's length.

    Scale notes: explode -> partial-aggregated ``groupBy(doc_id, key)``
    -> per-doc aggregate — linear work keyed by doc, two shuffles, no
    windows over unbounded partitions (the per-doc rank is an argmax
    carried inside ``max_by``-style struct aggregation).
    """
    from abot_spark.ops.dedup import normalize_text

    t = F.coalesce(F.col("text"), F.lit(""))
    lines = documents.select(
        "doc_id",
        F.explode(F.filter(
            F.transform(F.split(t, r"\n"), lambda x: F.trim(x)),
            lambda x: x != "")).alias("line"))
    per_line = lines.groupBy("doc_id", "line").agg(
        F.count(F.lit(1)).alias("cnt"))
    line_stats = per_line.groupBy("doc_id").agg(
        F.sum("cnt").alias("_n_lines"),
        F.sum(F.col("cnt") - 1).alias("_dup_lines"),
        F.sum(F.col("cnt") * F.length("line")).alias("_line_chars"),
        F.sum((F.col("cnt") - 1) * F.length("line")).alias("_dup_chars"))

    norm = documents.select(
        "doc_id", normalize_text(F.col("text")).alias("_norm"))
    toks = norm.select(
        "doc_id", F.length("_norm").alias("_norm_len"),
        F.when(F.col("_norm") == "", F.array().cast("array<string>"))
        .otherwise(F.split(F.col("_norm"), " ")).alias("_toks"))
    grams = toks.select(
        "doc_id", "_norm_len",
        F.explode(F.when(
            F.size("_toks") < 2, F.array().cast("array<string>")
        ).otherwise(F.transform(
            F.sequence(F.lit(0), F.size("_toks") - 2),
            lambda i: F.concat_ws(
                " ", F.element_at(F.col("_toks"), i + 1),
                F.element_at(F.col("_toks"), i + 2))))).alias("gram"))
    per_gram = grams.groupBy("doc_id", "_norm_len", "gram").agg(
        F.count(F.lit(1)).alias("cnt"))
    # per-doc argmax, engine-portably: max count first, then the
    # lexicographically smallest gram at that count (a semi-join back —
    # no window, no struct-ordering subtleties)
    max_cnt = per_gram.groupBy("doc_id").agg(F.max("cnt").alias("_maxc"))
    top = per_gram.join(max_cnt, "doc_id") \
        .filter(F.col("cnt") == F.col("_maxc")) \
        .groupBy("doc_id").agg(
            F.min("gram").alias("top_2gram"),
            F.first("_maxc").alias("_topc"),
            F.first("_norm_len").alias("_norm_len"))
    out = documents.select("doc_id") \
        .join(line_stats, "doc_id", "left") \
        .join(top, "doc_id", "left")
    return out.select(
        "doc_id",
        F.coalesce("_n_lines", F.lit(0)).cast("int").alias("n_lines"),
        F.round(F.coalesce("_dup_lines", F.lit(0))
                / F.greatest(F.coalesce("_n_lines", F.lit(0)), F.lit(1)),
                4).alias("dup_line_frac"),
        F.round(F.coalesce("_dup_chars", F.lit(0))
                / F.greatest(F.coalesce("_line_chars", F.lit(0)), F.lit(1)),
                4).alias("dup_line_char_frac"),
        "top_2gram",
        F.round(F.coalesce(
            F.col("_topc") * F.length("top_2gram"),
            F.lit(0)) / F.greatest("_norm_len", F.lit(1)), 4)
        .alias("top_2gram_char_frac"))


#: Salt buckets for the two-phase top-k in :func:`ngram_topk`.  The
#: final per-language merge window sees at most ``_TOPK_SALTS * k``
#: rows per language regardless of vocabulary size.
_TOPK_SALTS = 32


def ngram_topk(documents: DataFrame, n: int = 2, k: int = 10,
               by_lang: bool = True, min_docs: int = 2) -> DataFrame:
    """(lang, ngram, n_docs, rank): top-``k`` word n-grams per language
    by *document* frequency — the corpus-profiling step that surfaces
    boilerplate candidates and template families before dedup.

    Document frequency (not term frequency) so one spammy document
    cannot dominate; ties break on the n-gram string so the rank is
    total and engine-portable.  N-grams seen in fewer than ``min_docs``
    documents (default 2) are dropped before ranking: singleton n-grams
    are by definition not boilerplate candidates, and at corpus scale
    they ARE the vocabulary (Zipf tail), so the filter shrinks the
    ranked set by orders of magnitude.

    .. note:: **Changed** (round 3): ``min_docs`` default went 1 → 2, so
       default-arg callers no longer see singleton n-grams in the ranked
       output (a corpus whose every n-gram is unique now ranks nothing).
       Pass ``min_docs=1`` for the old exhaustive behavior.

    Scale notes (100 TB corpus): explode → one partial-aggregated
    groupBy((lang, ngram)) → ``n_docs >= min_docs`` tail drop → a
    TWO-PHASE top-k so no single task ever sorts a language's whole
    vocabulary: phase 1 ranks within ``(lang, salt)`` where
    ``salt = xxhash64(ngram) % _TOPK_SALTS`` — each n-gram appears in
    exactly one salt bucket, so every global top-k row survives its
    bucket's local top-k — and phase 2 merges the ≤ ``_TOPK_SALTS·k``
    survivors per language in a final (bounded) window.  Language
    cardinality is tiny, so phase 2 is O(salts·k log salts·k) per
    language however large the corpus.
    """
    from abot_spark.ops.dedup import normalize_text, shingles_from_tokens

    lang_col = F.col("lang") if by_lang else F.lit("all")
    grams = documents.select(
        lang_col.alias("lang"), "doc_id",
        F.split(normalize_text(F.col("text")), " ").alias("_toks")
    ).select(
        "lang", "doc_id",
        F.explode(shingles_from_tokens(F.col("_toks"), n)).alias("ngram"))
    # (lang, ngram, doc_id) rows are UNIQUE by construction (shingles are
    # array_distinct per document), so the document frequency is a plain
    # count — count_distinct would add a distinct-aggregate pass (extra
    # hash-dedup state in both partial and final aggregation) to recompute
    # a uniqueness the explode already guarantees.  Same invariant
    # ngram_jaccard_pairs exploits for its posting-list sizes.
    df = (grams.groupBy("lang", "ngram")
          .agg(F.count(F.lit(1)).alias("n_docs"))
          .filter(F.col("n_docs") >= min_docs))
    # Phase 1: local top-k inside each (lang, salt) bucket.  The global
    # top-k is a subset of the union of bucket top-ks because each
    # n-gram lives in exactly one bucket.
    w_bucket = Window.partitionBy("lang", "_salt").orderBy(
        F.col("n_docs").desc(), F.col("ngram"))
    survivors = (df.withColumn(
        "_salt", F.pmod(F.xxhash64("ngram"), F.lit(_TOPK_SALTS)))
        .withColumn("_r", F.row_number().over(w_bucket))
        .filter(F.col("_r") <= k))
    # Phase 2: merge the bounded survivor set per language.
    w = Window.partitionBy("lang").orderBy(
        F.col("n_docs").desc(), F.col("ngram"))
    return (survivors.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("lang", "ngram", "n_docs", "rank"))
