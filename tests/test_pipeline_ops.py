"""Training-data pipeline ops: invariants beyond the DuckDB oracle gate
(which covers exact value parity — see tools/check_oracles.py)."""

from __future__ import annotations

import hashlib
import re

import pytest
from pyspark.sql import functions as F

from abot_spark.ops import dedup as D
from abot_spark.ops import similarity as S
from abot_spark.ops import textstats as T
from abot_spark.ops.multimodal import (
    extract_media_features, resize_images, sample_frames, synth_media,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog", "en"),
        (1, "the quick brown fox jumps over the lazy dog", "en"),  # exact dup
        (2, "the quick brown fox jumps over the lazy cat", "en"),  # near dup
        (3, "completely different content about spark engines", "en"),
        (4, "", "en"),
        (5, "der schnelle braune fuchs und der faule hund", "de"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_exact_dedup_groups(spark, docs):
    out = {r["doc_id"]: r for r in D.exact_dedup(docs).collect()}
    assert out[1]["canonical_doc_id"] == 0 and out[1]["is_duplicate"]
    assert not out[0]["is_duplicate"]
    assert not out[2]["is_duplicate"]  # near-dup is NOT an exact dup


def test_minhash_matches_pure_python(spark, docs):
    """The Spark signature must equal an independent pure-python minwise
    hash over the same shingle set (portability invariant)."""
    sig = {r["doc_id"]: r for r in
           D.minhash_signatures(docs, k=4, shingle_n=3).collect()}

    def py_sig(text, i):
        norm = re.sub(r"\s+", " ",
                      re.sub(r"[^a-z0-9 ]", "", text.lower())).strip()
        toks = norm.split(" ")
        grams = {" ".join(toks[j:j + 3])
                 for j in range(max(len(toks) - 3, 0) + 1)}
        return min(hashlib.md5(f"{i}:{g}".encode()).hexdigest()
                   for g in grams)

    for doc_id, text in [(0, "the quick brown fox jumps over the lazy dog"),
                         (3, "completely different content about spark engines")]:
        for i in range(4):
            assert sig[doc_id][f"sig_{i}"] == py_sig(text, i)


def test_minhash_pairs_find_near_dups(spark, docs):
    pairs = {(r["doc_a"], r["doc_b"]) for r in
             D.minhash_candidate_pairs(docs, k=8, bands=8).collect()}
    assert (0, 1) in pairs          # identical docs always collide
    assert (0, 3) not in pairs      # unrelated docs don't


def test_simhash_near_dup_distance(spark, docs):
    sh = {r["doc_id"]: r["simhash"] for r in D.simhash(docs, 16).collect()}
    assert sh[0] == sh[1]                 # identical docs: identical hash
    assert 0 <= sh[0] < (1 << 16)
    assert sh[2] != sh[3]                 # distinct content separates
    # 16 bits on ~9-token docs is too coarse for a strict near<far
    # Hamming ordering; the oracle gate pins exact values instead


def test_ngram_jaccard_values(spark, docs):
    pairs = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in
             D.ngram_jaccard_pairs(docs, shingle_n=3, threshold=0.1,
                                   max_df=1.0).collect()}
    assert pairs[(0, 1)] == 1.0
    assert 0.1 <= pairs[(0, 2)] < 1.0


@pytest.fixture(scope="module")
def emb(spark):
    import math
    rows = []
    for i in range(40):
        base = [math.cos(i % 4 + d / 7.0) for d in range(8)]
        rows.append((i, [float(x + (0.01 * (i // 4))) for x in base], i % 4))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")


def test_cosine_topk_prefers_same_label(spark, emb):
    out = S.cosine_topk(emb, [0, 1], k=3).collect()
    labels = {r["vec_id"]: r["label"] for r in emb.collect()}
    for r in out:
        if r["rank"] == 1:
            assert labels[r["neighbor_id"]] == labels[r["query_id"]]


def test_embedding_neardup_bucketed_pairs(spark, emb):
    """Near-dup pairs must (a) share the sign-bit LSH bucket, (b) carry the
    exact brute-force cosine, (c) contain every same-bucket pair above the
    threshold — the bucketing prunes candidates, never scores."""
    out = S.embedding_neardup_pairs(emb, bits=4, threshold=0.9).collect()
    sigs = {r["vec_id"]: r["sig"] for r in emb.select(
        "vec_id", S.sign_signature(F.col("embedding"), 4).alias("sig"))
        .collect()}
    vecs = {r["vec_id"]: r["embedding"] for r in emb.collect()}

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = sum(x * x for x in a) ** 0.5
        nb = sum(x * x for x in b) ** 0.5
        return round(dot / (na * nb), 4)

    got = {(r["vec_a"], r["vec_b"]): r["score"] for r in out}
    assert got, "fixture should contain near-dup pairs"
    for (a, b), score in got.items():
        assert sigs[a] == sigs[b]
        assert score == pytest.approx(cos(vecs[a], vecs[b]), abs=1e-4)
    # completeness within buckets
    ids = sorted(vecs)
    for i in ids:
        for j in ids:
            if i < j and sigs[i] == sigs[j] and cos(vecs[i], vecs[j]) >= 0.9:
                assert (i, j) in got


def test_ivf_topk_subset_of_probed_clusters(spark, emb):
    """Every IVF neighbor must live in one of the query's nprobe nearest
    clusters (the index prunes candidates; it never scores outside its
    probes)."""
    cents = S.kmeans_centroids(emb, 4, iters=2)
    clusters = {r["vec_id"]: r["cluster"] for r in
                S._nearest_centroids(emb, cents, nprobe=1).collect()}
    probes = {}
    for r in S._nearest_centroids(
            emb.filter(F.col("vec_id").isin([0, 1])), cents,
            nprobe=2).collect():
        probes.setdefault(r["vec_id"], set()).add(r["cluster"])
    out = S.ivf_topk(emb, [0, 1], k=3, n_centroids=4, iters=2,
                     nprobe=2).collect()
    for r in out:
        assert clusters[r["neighbor_id"]] in probes[r["query_id"]]


def test_ivf_recall_vs_brute_force(spark, emb):
    """VERDICT r1 #7: Lloyd refinement + nprobe>1 must recover >=0.9
    recall@5 against the brute-force baseline on the fixture (the old
    first-C-seeds + nprobe=1 index was correct-per-contract but weak)."""
    queries = list(range(8))
    truth = {}
    for r in S.cosine_topk(emb, queries, k=5).collect():
        truth.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    got = {}
    for r in S.ivf_topk(emb, queries, k=5, n_centroids=8, iters=2,
                        nprobe=2).collect():
        got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits = sum(len(truth[q] & got.get(q, set())) for q in queries)
    recall = hits / sum(len(truth[q]) for q in queries)
    assert recall >= 0.9, f"recall@5 = {recall:.3f}"


def test_textstats_columns(spark, docs):
    q = {r["doc_id"]: r for r in T.quality_score(docs).collect()}
    assert q[4]["n_tokens"] == 0 and q[4]["n_chars"] == 0
    assert q[0]["n_tokens"] == 9
    assert q[0]["stopword_ratio"] > 0
    # BPE-ish subword counting: JVM regex must agree with python re
    import re
    sub = {r["doc_id"]: r["n_subwords"] for r in docs.select(
        "doc_id", T.subword_count_col(F.col("text")).alias("n_subwords"))
        .collect()}
    for r in docs.collect():
        assert sub[r["doc_id"]] == len(
            re.findall(T.BPE_TOKEN_PATTERN, r["text"]))
    assert sub[4] == 0
    row = spark.createDataFrame(
        [(99, "I'll say it's 42% done... naive, re-run")],
        "doc_id long, text string").select(
        T.subword_count_col(F.col("text")).alias("n")).first()
    assert row["n"] == 14   # contractions split, runs grouped
    langid = {r["doc_id"]: r for r in T.lang_id(docs).collect()}
    assert langid[0]["pred_lang"] == "en"
    assert langid[5]["pred_lang"] == "de"


def test_media_features_stub_paths(spark, docs):
    feats = {r["doc_id"]: r for r in
             extract_media_features(synth_media(docs)).collect()}
    assert feats[0]["is_decodable"] and feats[0]["feature_mean"] is not None
    assert not feats[1]["is_decodable"] and feats[1]["feature_mean"] is None
    assert feats[0]["n_bytes"] > 8


def test_media_resize_fit_and_bytes(spark, docs):
    rows = {r["doc_id"]: r for r in
            resize_images(synth_media(docs), max_dim=16).collect()}
    # decodable (doc 0, PNG magic): dims fit inside 16x16, aspect kept
    r0 = rows[0]
    assert r0["is_decodable"]
    assert max(r0["out_width"], r0["out_height"]) <= 16
    if max(r0["src_width"], r0["src_height"]) <= 16:
        assert (r0["out_width"], r0["out_height"]) == \
            (r0["src_width"], r0["src_height"])
    # stub thumbnail = payload byte prefix; byte-sum rides as a column
    payload = (b"\x89PNG\r\n\x1a\n"
               + "the quick brown fox jumps over the lazy dog".encode())
    want = payload[:r0["out_width"] * r0["out_height"]]
    assert bytes(r0["thumb"]) == want and r0["thumb_sum"] == sum(want)
    # undecodable (doc 1, no magic): nulls across the board
    r1 = rows[1]
    assert not r1["is_decodable"] and r1["thumb"] is None \
        and r1["out_width"] is None


def test_media_frames_expansion(spark, docs):
    frames = sample_frames(synth_media(docs), frame_bytes=8, every=2,
                           frame_ms=40).collect()
    by_doc: dict[int, list] = {}
    for r in frames:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 0 payload: 8-byte magic + 44 text bytes = 52 -> 7 frames, every
    # 2nd sampled -> idx 0,2,4,6; last frame is the 4-byte tail
    f0 = sorted(by_doc[0], key=lambda r: r["frame_idx"])
    assert [r["frame_idx"] for r in f0] == [0, 2, 4, 6]
    assert [r["ts_ms"] for r in f0] == [0, 80, 160, 240]
    payload = (b"\x89PNG\r\n\x1a\n"
               + "the quick brown fox jumps over the lazy dog".encode())
    for r in f0:
        want = payload[r["frame_idx"] * 8:(r["frame_idx"] + 1) * 8]
        assert bytes(r["frame"]) == want
        assert r["frame_len"] == len(want) and r["frame_sum"] == sum(want)
    # empty payload (doc 4, empty text -> 16-byte substr is '') -> no rows
    assert 4 not in by_doc


def test_clean_corpus_stage_semantics(spark):
    """Composed pipeline: gate -> lang -> exact dedup -> near-dup removal,
    each stage pinned by a doc built to be dropped by exactly that stage."""
    from abot_spark.ops.pipeline import clean_corpus

    long_en = ("the quick brown fox jumps over the lazy dog and then "
               "it runs far away into the green forest by the river " * 3)
    near = long_en.replace("green forest", "dark forest")
    rows = [
        (0, long_en, "en"),                 # survives
        (1, long_en, "en"),                 # exact dup of 0 -> dropped
        (2, near, "en"),                    # near dup of 0 -> dropped
        (3, "too short", "en"),             # quality gate -> dropped
        (4, ("und der schnelle braune fuchs springt nicht über den faulen "
             "hund denn die das ist ein und nicht der über ein " * 4), "de"),
        (5, ("completely different text about distributed query engines "
             "and columnar storage with whole stage code generation and "
             "adaptive execution planning for large analytical workloads "
             * 2), "en"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")

    kept = {r["doc_id"]: r for r in
            clean_corpus(docs, min_tokens=20, min_chars=120).collect()}
    assert set(kept) == {0, 4, 5}
    assert kept[0]["pred_lang"] == "en"
    assert kept[4]["pred_lang"] == "de"
    assert kept[0]["n_tokens"] > 20 and kept[0]["n_chars"] > 120

    # language filter composes on top
    en_only = {r["doc_id"] for r in
               clean_corpus(docs, min_tokens=20, min_chars=120,
                            keep_langs=("en",)).collect()}
    assert en_only == {0, 5}


def test_duplicate_clusters_transitive(spark):
    """a~b and b~c (no a~c pair) must land in ONE cluster with the min
    doc_id canonical; untouched docs are their own singleton cluster."""
    docs = spark.createDataFrame(
        [(i,) for i in range(7)], "doc_id long")
    pairs = spark.createDataFrame(
        [(1, 5), (5, 6),        # chain: {1,5,6}
         (2, 3)],               # pair: {2,3}
        "doc_a long, doc_b long")
    out = {r["doc_id"]: r for r in
           D.duplicate_clusters(docs, pairs=pairs).collect()}
    assert len(out) == 7
    assert out[1]["cluster_id"] == out[5]["cluster_id"] == \
        out[6]["cluster_id"] == 1
    assert out[2]["cluster_id"] == out[3]["cluster_id"] == 2
    for d in (0, 4):
        assert out[d]["cluster_id"] == d and not out[d]["is_duplicate"]
    assert not out[1]["is_duplicate"] and out[5]["is_duplicate"]
    assert out[6]["is_duplicate"] and out[3]["is_duplicate"]


def test_duplicate_clusters_long_chain_converges(spark):
    """A 40-node path graph needs pointer jumping to converge inside the
    iteration cap — plain propagation would take 40 rounds."""
    n = 40
    docs = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long")
    out = D.duplicate_clusters(docs, pairs=pairs, max_iter=10).collect()
    assert all(r["cluster_id"] == 0 for r in out)
    assert sum(r["is_duplicate"] for r in out) == n - 1


def test_duplicate_clusters_from_minhash(spark, docs):
    """End-to-end over minhash pairs: exact dups 0/1 and near-dup 2
    cluster together; the rest stay singletons."""
    out = {r["doc_id"]: r["cluster_id"] for r in
           D.duplicate_clusters(docs).collect()}
    assert out[0] == out[1] == out[2] == 0
    assert out[3] == 3 and out[5] == 5


def test_paragraph_dedup_removes_boilerplate(spark):
    header = "COOKIE BANNER accept all cookies"
    rows = [
        (0, header + "\nunique zero\nalso zero"),
        (1, header + "\nunique one"),
        (2, header + "\n\nunique two"),   # empty paragraph survives
        (3, "no boilerplate here"),
        (4, header),                       # all content removed
    ]
    out = {r["doc_id"]: r for r in D.paragraph_dedup(
        spark.createDataFrame(rows, "doc_id long, text string")).collect()}
    assert out[0]["clean_text"] == "unique zero\nalso zero"
    assert out[0]["n_paragraphs"] == 3 and out[0]["n_removed"] == 1
    assert out[1]["clean_text"] == "unique one"
    assert out[2]["clean_text"] == "\nunique two"   # empty line kept
    assert out[3]["clean_text"] == "no boilerplate here"
    assert out[3]["n_removed"] == 0
    assert out[4]["clean_text"] == "" and out[4]["n_removed"] == 1


def test_paragraph_dedup_frequency_threshold(spark):
    """max_doc_frequency=2: a paragraph in exactly 2 docs survives; the
    same paragraph twice in ONE doc counts one distinct document."""
    rows = [
        (0, "twice in one doc\ntwice in one doc\nsolo a"),
        (1, "in two docs\nsolo b"),
        (2, "in two docs\nsolo c"),
        (3, "IN THREE docs\nsolo d"),
        (4, "in three DOCS\nsolo e"),      # case-insensitive key
        (5, "  in three docs \nsolo f"),   # whitespace-insensitive key
    ]
    out = {r["doc_id"]: r for r in D.paragraph_dedup(
        spark.createDataFrame(rows, "doc_id long, text string"),
        max_doc_frequency=2).collect()}
    assert out[0]["clean_text"] == "twice in one doc\ntwice in one doc\nsolo a"
    assert out[1]["clean_text"] == "in two docs\nsolo b"
    assert out[3]["clean_text"] == "solo d"
    assert out[4]["clean_text"] == "solo e"
    assert out[5]["clean_text"] == "solo f"


def test_paragraph_dedup_broadcast_hostile_majority_boiler(spark):
    """>50% of all paragraphs boilerplate — the web-scale shape where a
    broadcast of the boilerplate key set would OOM; the shuffled mark
    join must stay exact (VERDICT r1 fix #2)."""
    header = ["nav home", "nav about", "footer contact", "cookie notice"]
    rows = [(i, "\n".join(header + [f"unique body {i}"])) for i in range(40)]
    out = {r["doc_id"]: r for r in D.paragraph_dedup(
        spark.createDataFrame(rows, "doc_id long, text string")).collect()}
    assert len(out) == 40
    for i in range(40):
        assert out[i]["clean_text"] == f"unique body {i}"
        assert out[i]["n_paragraphs"] == 5 and out[i]["n_removed"] == 4


def test_paragraph_dedup_regex_metachar_separator(spark):
    """sep is a literal, not a regex: '.' must split on dots only."""
    rows = [(0, "shared part.unique a"), (1, "shared part.unique b")]
    out = {r["doc_id"]: r for r in D.paragraph_dedup(
        spark.createDataFrame(rows, "doc_id long, text string"),
        sep=".").collect()}
    assert out[0]["clean_text"] == "unique a"
    assert out[0]["n_paragraphs"] == 2 and out[0]["n_removed"] == 1
    assert out[1]["clean_text"] == "unique b"


def test_ngram_jaccard_absolute_df_cap_bounds_skew(spark):
    """One shingle present in 90% of docs: with the absolute cap it is
    pruned, so pair fan-out is bounded by the rare shingles only
    (VERDICT r1 fix #3).  Docs sharing ONLY the boilerplate shingle must
    not pair at all."""
    boiler = "click here to accept"
    rows = []
    for i in range(40):
        uniq = f"unique words number {i} padded filler text"
        # docs 0..35 carry the boilerplate shingle; 36..39 don't
        rows.append((i, (boiler + " " + uniq) if i < 36 else uniq))
    # two docs that genuinely share rare content
    rows.append((100, boiler + " genuinely shared rare tail content"))
    rows.append((101, boiler + " genuinely shared rare tail content"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in
             D.ngram_jaccard_pairs(docs, shingle_n=3, threshold=0.05,
                                   max_df_count=8).collect()}
    # boilerplate-only overlap produces no pair at all: fan-out bounded
    assert pairs == {(100, 101): 1.0}, f"unexpected pairs {sorted(pairs)}"


def test_audio_chunks_overlap_and_tail(spark):
    from abot_spark.ops.multimodal import MEDIA_SCHEMA, chunk_audio
    payload = bytes(range(80))   # 80 bytes -> starts at 0, 32, 64
    media = spark.createDataFrame(
        [(0, bytearray(payload), "audio/pcm", None, None),
         (1, None, "audio/pcm", None, None)],
        MEDIA_SCHEMA)
    out = {r["chunk_idx"]: r for r in
           chunk_audio(media, chunk_bytes=48, hop_bytes=32,
                       bytes_per_ms=4).collect()}
    assert set(out) == {0, 1, 2}   # doc 1 (null media) emits nothing
    # full window [0,48)
    assert out[0]["chunk_len"] == 48 and out[0]["start_ms"] == 0
    assert out[0]["end_ms"] == 12
    assert bytes(out[0]["chunk"]) == payload[0:48]
    # overlapping window [32,80) shares 16 bytes with window 0
    assert bytes(out[1]["chunk"]) == payload[32:80]
    assert out[1]["start_ms"] == 8 and out[1]["end_ms"] == 20
    # tail window [64,80) is short
    assert out[2]["chunk_len"] == 16
    assert bytes(out[2]["chunk"]) == payload[64:80]
    assert out[2]["loudness"] == sum(payload[64:80]) / 16


def test_ngram_topk_doc_frequency_and_ties(spark):
    rows = [
        (0, "alpha beta alpha beta", "en"),   # 'alpha beta' once per doc
        (1, "alpha beta gamma", "en"),
        (2, "gamma delta", "en"),
        (3, "uno dos", "es"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = T.ngram_topk(docs, n=2, k=3, min_docs=1).collect()
    en = {r["ngram"]: r for r in out if r["lang"] == "en"}
    # document frequency, not term frequency: doc 0 repeats 'alpha beta'
    assert en["alpha beta"]["n_docs"] == 2 and en["alpha beta"]["rank"] == 1
    # ties (n_docs=1) break on the ngram string ascending
    one_doc = sorted(g for g, r in en.items() if r["n_docs"] == 1)
    ranks = [en[g]["rank"] for g in one_doc]
    assert ranks == sorted(ranks)
    es = [r for r in out if r["lang"] == "es"]
    assert len(es) == 1 and es[0]["ngram"] == "uno dos"
    # default min_docs=2 drops the singleton tail entirely
    dflt = T.ngram_topk(docs, n=2, k=3).collect()
    assert {(r["lang"], r["ngram"]) for r in dflt} == {("en", "alpha beta")}


def test_ngram_topk_two_phase_plan_and_parity(spark):
    """Plan guard (VERDICT r2 #1): one dominant language with a large
    distinct-n-gram vocabulary must NOT be ranked in a single
    per-language window over the whole vocabulary.  The physical plan
    must show the bucketed phase-1 window (partitioned by the salt) and
    the final merge window must sit above the phase-1 ``_r <= k``
    filter; the two-phase result must equal the brute-force rank."""
    import itertools
    words = [f"w{i:03d}" for i in range(40)]
    rows = []
    # 200 docs, each a distinct 6-word line -> ~1000 distinct bigrams in
    # one language, with a few repeated boilerplate lines.
    combos = itertools.combinations(words, 6)
    for d in range(200):
        toks = list(next(combos))
        rows.append((d, " ".join(toks) + " common boiler plate", "en"))
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = T.ngram_topk(docs, n=2, k=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # phase-1 window partitions on the salt column
    assert "_salt" in plan, "bucketed phase-1 window missing from plan"
    # exactly two Window operators: bucket top-k then bounded merge
    assert plan.count("Window") >= 2
    got = [(r["lang"], r["ngram"], r["n_docs"], r["rank"])
           for r in out.orderBy("lang", "rank").collect()]
    # brute force in Python over the same normalization
    from collections import defaultdict
    dfreq = defaultdict(set)
    for d, text, lang in rows:
        toks = text.split()
        for i in range(len(toks) - 1):
            dfreq[(lang, f"{toks[i]} {toks[i+1]}")].add(d)
    ranked = sorted(((lang, g, len(ds)) for (lang, g), ds in dfreq.items()
                     if len(ds) >= 2), key=lambda t: (t[0], -t[2], t[1]))
    want = [(lang, g, nd, i + 1)
            for i, (lang, g, nd) in enumerate(ranked[:5])]
    assert got == want


def test_gopher_quality_gates(spark):
    """Each Gopher gate (Rae et al. 2021 A1.1) must fire on its crafted
    offender and the clean doc must pass all of them."""
    good = ("the project of building a corpus is described here and it "
            "required careful work to collect clean useful text in many "
            "piles of records " * 4)          # ~100 words, stopwords, alpha
    rows = [
        (0, good),
        (1, "too short to pass the fifty word minimum"),
        (2, " ".join(["x"] * 60)),            # mean word len 1 < 3
        (3, ("# " * 30) + good),              # symbol ratio > 0.1
        (4, "\n".join(["- item " + str(i) for i in range(30)])),  # bullets
        (5, good.replace("the", "zzz").replace("and", "qqq")
            .replace("it", "vv").replace("of", "ww").replace("a ", "b ")
            .replace("to", "kk").replace("in", "jj").replace("is", "hh")),
        (6, ""),
    ]
    out = {r["doc_id"]: r for r in T.gopher_quality(
        spark.createDataFrame(rows, "doc_id long, text string")).collect()}
    assert out[0]["keep"], out[0]
    assert not out[1]["keep"] and out[1]["n_words"] < 50
    assert not out[2]["keep"] and out[2]["mean_word_len"] < 3
    assert not out[3]["keep"] and out[3]["symbol_word_ratio"] > 0.1
    assert not out[4]["keep"] and out[4]["bullet_line_frac"] > 0.9
    assert not out[5]["keep"] and out[5]["n_stop_distinct"] < 2
    assert not out[6]["keep"] and out[6]["n_words"] == 0


def test_repetition_scores_lines_and_grams(spark):
    rows = [
        (0, "unique one\nrepeated line\nrepeated line\nunique two"),
        (1, "spark spark spark spark"),     # top 2-gram 'spark spark' x3
        (2, "single"),                       # no 2-grams
        (3, ""),
    ]
    out = {r["doc_id"]: r for r in T.repetition_scores(
        spark.createDataFrame(rows, "doc_id long, text string")).collect()}
    r0 = out[0]
    assert r0["n_lines"] == 4
    assert r0["dup_line_frac"] == 0.25       # 1 repeat / 4 lines
    # repeated chars: 13 of (10+13+13+10)
    assert r0["dup_line_char_frac"] == round(13 / 46, 4)
    r1 = out[1]
    assert r1["top_2gram"] == "spark spark"
    # 3 occurrences x 11 chars over 23 normalized chars
    assert r1["top_2gram_char_frac"] == round(33 / 23, 4)
    assert out[2]["top_2gram"] is None
    assert out[2]["top_2gram_char_frac"] == 0.0
    assert out[3]["n_lines"] == 0 and out[3]["dup_line_frac"] == 0.0


def test_clean_corpus_gopher_and_dupline_gates(spark):
    """The composed pipeline's optional RefinedWeb-style gates: a doc
    failing Gopher (too short / no stopwords) or exceeding the
    duplicate-line cap is dropped before dedup; clean docs survive."""
    good = ("the project of building a corpus is described here and it "
            "required careful work to collect clean useful text in many "
            "piles of records " * 4)
    good2 = ("a different account of the effort to assemble and clean a "
             "large corpus is given in this report and it describes the "
             "steps we took for quality checks " * 4)
    repeat = "\n".join(["the same line of text appears here"] * 30)
    rows = [(0, good, "en"),
            (1, " ".join(["word"] * 60), "en"),        # no stopwords
            (2, good2 + "\n" + repeat, "en")]          # dup lines > 0.3
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    from abot_spark.ops.pipeline import clean_corpus
    plain = {r["doc_id"] for r in clean_corpus(
        docs, min_tokens=30, min_chars=200).collect()}
    gated = {r["doc_id"] for r in clean_corpus(
        docs, min_tokens=30, min_chars=200, gopher=True,
        max_dup_line_frac=0.3).collect()}
    assert 0 in plain and 0 in gated
    assert 1 in plain and 1 not in gated      # gopher kills it
    assert 2 in plain and 2 not in gated      # dup-line gate kills it


def test_minhash_bands_single_scan_plan(spark, docs):
    """Plan guard: banding must be ONE posexploded scan of the signature
    projection, not a per-band union — a union re-references the
    signature lineage, so the normalize/tokenize/shingle prep re-runs
    once per band for any consumer that evaluates the keys."""
    out = D.minhash_bands(docs, k=8, bands=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Union" not in plan, "per-band union is back in the bands plan"
    # the pair expansion consumes the same single-scan shape
    pplan = (D.minhash_candidate_pairs(docs, k=8, bands=4)
             ._jdf.queryExecution().executedPlan().toString())
    assert "Union" not in pplan
    # and the rows are the full doc x band grid
    assert out.count() == docs.count() * 4


def test_clean_corpus_neardup_no_self_join_plan(spark):
    """Plan guard: the near-dup drop set must come from the bucket-local
    non-min expansion (one groupBy), not a band-table self-join — the
    only join in the whole pipeline is the final left-anti against the
    drop set."""
    from abot_spark.ops.pipeline import clean_corpus

    long_en = ("the quick brown fox jumps over the lazy dog and then "
               "it runs far away into the green forest by the river " * 3)
    rows = [(0, long_en, "en"),
            (1, long_en.replace("green forest", "dark forest"), "en"),
            (2, "x " * 200, "en")]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = clean_corpus(docs, min_tokens=20, min_chars=120)
    plan = out._jdf.queryExecution().executedPlan().toString()
    n_joins = sum(plan.count(j) for j in
                  ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
                   "BroadcastNestedLoopJoin", "CartesianProduct"))
    assert n_joins == 1, f"expected only the left-anti join, saw {n_joins}"
    assert "LeftAnti" in plan
    # semantics unchanged: near-dup of 0 dropped, others kept
    assert {r["doc_id"] for r in out.collect()} == {0, 2}


def test_duplicate_clusters_empty_pair_set(spark):
    """No candidate pairs at all: every doc must come back as its own
    singleton cluster with is_duplicate=False, and the loop must still
    terminate via the convergence sum (the initial comparison point is
    round 1's own sum now — there is no separate initial action to fall
    back on)."""
    docs = spark.createDataFrame(
        [(i, f"totally unique text number {i}", "en") for i in range(5)],
        "doc_id long, text string, lang string")
    pairs = spark.createDataFrame([], "doc_a long, doc_b long")
    out = {r["doc_id"]: r for r in
           D.duplicate_clusters(docs, pairs=pairs).collect()}
    assert set(out) == set(range(5))
    for i in range(5):
        assert out[i]["cluster_id"] == i and not out[i]["is_duplicate"]
