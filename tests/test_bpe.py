"""Real BPE: textbook merge order, round-trip losslessness, compression
monotonicity, and the distributed encoder matching the driver encoder."""

from __future__ import annotations

from pyspark.sql import functions as F

from wp_motor_spark.operators import bpe


def test_train_learns_textbook_merges(spark):
    # classic Sennrich example: low/lower/newest/widest frequencies
    corpus = " ".join(
        ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    )
    df = spark.createDataFrame([(corpus,)], ["text"])
    merges = bpe.train_bpe(df, num_merges=6, sample_n=10)
    # the 9-frequency suffix chain of newest+widest merges first (ties
    # break lexicographically, documented), building the 'est</w>' unit
    assert merges[0] == ("t", "</w>")  # freq 9, lexicographic winner
    assert ("e", "st</w>") in merges[:3]
    ranks = {p: i for i, p in enumerate(merges)}
    # after 6 merges the common suffix is one unit: newest -> n|e?|west</w>
    assert len(bpe.encode_word("newest", ranks)) <= 4
    assert bpe.encode_word("newest", ranks)[-1].endswith("est</w>")
    # determinism: retraining yields the identical merge list
    assert merges == bpe.train_bpe(df, num_merges=6, sample_n=10)


def test_encode_round_trips_and_compresses(spark):
    docs = [(i, f"the common tokens appear commonly token {i}") for i in range(30)]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    merges = bpe.train_bpe(df, num_merges=60, sample_n=100)
    ranks = {p: i for i, p in enumerate(merges)}
    for _, t in docs[:5]:
        for w in t.lower().split():
            toks = bpe.encode_word(w, ranks)
            assert "".join(toks) == w + "</w>"  # lossless
    # more merges can only shorten encodings
    few = {p: i for i, p in enumerate(merges[:10])}
    w = "commonly"
    assert len(bpe.encode_word(w, ranks)) <= len(bpe.encode_word(w, few))
    assert len(bpe.encode_word(w, few)) <= len(w) + 1


def test_distributed_encoder_matches_driver(spark):
    docs = [(i, f"some shared vocabulary with doc specific part{i}")
            for i in range(20)]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    merges = bpe.train_bpe(df, num_merges=40, sample_n=50)
    ranks = {p: i for i, p in enumerate(merges)}
    counter = bpe.encode_udf(merges, output="count")
    got = {r["doc_id"]: r["n"] for r in
           df.select("doc_id", counter(F.col("text")).alias("n")).collect()}
    for i, t in docs:
        want = sum(len(bpe.encode_word(w, ranks)) for w in t.lower().split())
        assert got[i] == want
    toker = bpe.encode_udf(merges, output="tokens")
    row = df.where("doc_id = 3").select(toker(F.col("text")).alias("t")).first()
    assert "".join(row["t"]).count("</w>") == len(docs[3][1].split())
