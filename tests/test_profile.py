"""Corpus profiling: per-group stats with exact quantiles, top tokens."""

from __future__ import annotations

import pytest

from wp_motor_spark.operators import dedup, profile


def test_corpus_profile_exact_quantiles(spark):
    # en token counts: [1, 2, 3, 10] -> p50 = 2.5 (interpolated), p90 = 7.9
    docs = [
        (1, "a", "en"),
        (2, "a b", "en"),
        (3, "a b c", "en"),
        (4, "a b c d e f g h i j", "en"),
        (5, "x y z", "de"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text", "lang"])
    out = {r["grp"]: r for r in profile.corpus_profile(df).collect()}
    en = out["en"]
    assert en["n_docs"] == 4 and en["total_tokens"] == 16
    assert en["mean_tokens"] == pytest.approx(4.0)
    assert en["p50_tokens"] == pytest.approx(2.5)
    # index 0.9*(n-1) = 2.7 -> 3 + 0.7*(10-3)
    assert en["p90_tokens"] == pytest.approx(7.9, abs=1e-4)
    assert en["min_tokens"] == 1 and en["max_tokens"] == 10
    assert out["de"]["n_docs"] == 1 and out["de"]["p50_tokens"] == 3.0


def test_top_tokens_counts_and_tiebreak(spark):
    docs = [
        (1, "b b a c"),
        (2, "a b"),
        (3, "c a"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    rows = profile.top_tokens(df, n=2).collect()
    # counts: a=3 (3 docs), b=3 (2 docs), c=2 -> tie a/b broken by token asc
    assert [(r["rank"], r["token"], r["cnt"], r["doc_freq"]) for r in rows] == [
        (1, "a", 3, 3),
        (2, "b", 3, 2),
    ]


def test_incremental_dedup_keeps_only_fresh_batch_docs(spark):
    docs = [
        (2, "seen before"),     # corpus
        (4, "still here"),      # corpus
        (1, "Seen   BEFORE"),   # batch dup of corpus (normalized) -> drop
        (3, "brand new"),       # batch fresh -> keep
        (5, "brand  NEW"),      # batch dup of doc 3 within batch -> drop
        (7, "also new"),        # batch fresh -> keep
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    batch = df.where("doc_id % 2 = 1")
    seen = df.where("doc_id % 2 = 0")
    kept = sorted(
        r["doc_id"] for r in dedup.incremental_dedup(batch, seen).collect()
    )
    assert kept == [3, 7]


def test_tfidf_keywords_ranks_distinctive_terms(spark):
    docs = [
        (1, "apple apple banana common common common"),
        (2, "cherry cherry durian common common common"),
        (3, "elder common common common common common"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = {r["doc_id"]: r["keywords"] for r in
           profile.tfidf_keywords(df, top_k=2).collect()}
    # 'common' appears in all docs -> idf = ln(1) = 0 -> ranked last
    assert out[1].split(",") == ["apple", "banana"]
    assert out[2].split(",") == ["cherry", "durian"]
    # doc3 has only two distinct terms; 'common' fills the 2nd slot but
    # the zero-idf term can never outrank a distinctive one
    assert out[3].split(",")[0] == "elder"


def test_doc_information_entropy_and_surprisal(spark):
    import math

    docs = [
        (1, "x x x x"),          # zero entropy (one token type)
        (2, "a b c d"),          # max entropy ln(4)
        (3, "a a b b"),          # entropy ln(2)
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in profile.doc_information(df).collect()}
    assert out[1]["entropy"] == 0.0
    assert abs(out[2]["entropy"] - math.log(4)) < 1e-6
    assert abs(out[3]["entropy"] - math.log(2)) < 1e-6
    # corpus model: p(x) = 4/12; doc1 surprisal = -ln(4/12)
    assert abs(out[1]["surprisal"] - (-math.log(4 / 12))) < 1e-6
    # rarer vocabulary -> higher surprisal: docs 2,3 share a,b (freq 3)
    # and doc2 adds singletons c,d -> doc2 > doc3
    assert out[2]["surprisal"] > out[3]["surprisal"]
