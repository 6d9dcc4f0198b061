"""Cluster + curation operator tests (connected components, token budget,
deterministic stratified sampling)."""

import pytest
from pyspark.sql import functions as F

from wp_motor_spark.operators import curate, dedup


def test_connected_components_merges_chains(spark):
    # A~B, B~C, plus an isolated pair D~E: {A,B,C} and {D,E}
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], ["id_a", "id_b"]
    )
    comp = {r["id"]: r["comp"] for r in dedup.connected_components(pairs).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_connected_components_long_chain_and_cycle(spark):
    # a 9-node path (diameter 8) and a 3-cycle sharing no nodes
    path = [(i, i + 1) for i in range(20, 28)]
    cyc = [(51, 52), (52, 53), (53, 51)]
    pairs = spark.createDataFrame(path + cyc, ["id_a", "id_b"])
    comp = {r["id"]: r["comp"] for r in dedup.connected_components(pairs).collect()}
    assert all(comp[i] == 20 for i in range(20, 29))
    assert all(comp[i] == 51 for i in (51, 52, 53))


def test_connected_components_iteration_cap(spark):
    pairs = spark.createDataFrame([(i, i + 1) for i in range(8)], ["id_a", "id_b"])
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup.connected_components(pairs, max_iters=1)


def test_token_budget_select_cut_and_first_row_guarantee(spark):
    rows = [
        # lang, quality, tokens, id
        ("en", 0.9, 800, 1),
        ("en", 0.8, 900, 2),
        ("en", 0.7, 900, 3),   # cum 2600 > 2000 -> cut
        ("de", 0.9, 5000, 4),  # alone exceeds budget but is rank 1 -> kept
        ("de", 0.8, 10, 5),    # cum 5010 > 2000 -> cut
    ]
    df = spark.createDataFrame(rows, ["lang", "q", "n_tok", "doc_id"])
    out = curate.token_budget_select(
        df, budget=2000, tokens_col="n_tok", partition_col="lang", order_col="q"
    )
    got = {r["doc_id"]: r["cum_tokens"] for r in out.collect()}
    assert got == {1: 800, 2: 1700, 4: 5000}


def test_token_budget_select_tiebreak_deterministic(spark):
    rows = [("en", 0.5, 1000, i) for i in (7, 3, 5)]
    df = spark.createDataFrame(rows, ["lang", "q", "n_tok", "doc_id"])
    out = curate.token_budget_select(
        df, budget=2000, tokens_col="n_tok", partition_col="lang", order_col="q"
    )
    # equal scores: lowest ids win the budget
    assert sorted(r["doc_id"] for r in out.collect()) == [3, 5]


def test_sample_fraction_by_key_deterministic_and_exact(spark):
    df = spark.range(10_000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "a").otherwise("b").alias("k"),
    )
    out = curate.sample_fraction_by_key(
        df, {"a": 0.25}, key_col="k", id_col="doc_id", modulus=100
    )
    rows = out.collect()
    # unlisted stratum 'b' keeps everything; 'a' keeps ids with id%100 < 25
    assert sum(1 for r in rows if r["k"] == "b") == 5_000
    a_ids = {r["doc_id"] for r in rows if r["k"] == "a"}
    assert a_ids == {i for i in range(10_000) if i % 2 == 0 and i % 100 < 25}
    # rerun -> identical (no RNG state)
    again = {r["doc_id"] for r in out.collect() if r["k"] == "a"}
    assert again == a_ids
