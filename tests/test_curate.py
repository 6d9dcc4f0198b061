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
        dedup.connected_components(pairs, max_iters=1, small_graph_threshold=0)


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
    # unlisted stratum 'b' keeps everything; 'a' keeps spread-bucket < 25
    assert sum(1 for r in rows if r["k"] == "b") == 5_000
    a_ids = {r["doc_id"] for r in rows if r["k"] == "a"}
    expect = {
        i
        for i in range(10_000)
        if i % 2 == 0 and curate.id_bucket_py(i, 100) < 25
    }
    assert a_ids == expect
    # uniform-ish over sequential ids: ~25% of the 5000 'a' rows
    assert 0.2 <= len(a_ids) / 5_000 <= 0.3
    # rerun -> identical (no RNG state)
    again = {r["doc_id"] for r in out.collect() if r["k"] == "a"}
    assert again == a_ids


def test_paragraph_dedup_keeps_first_occurrence(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha one\n\nshared para\n\nbeta"),
            (2, "shared para\n\ngamma two"),
            (3, "shared para"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in dedup.paragraph_dedup(docs).collect()}
    # doc 1 keeps everything (first occurrence of 'shared para' is (1,1))
    assert out[1]["text"] == "alpha one\n\nshared para\n\nbeta"
    assert out[1]["n_paras_kept"] == 3
    # doc 2 loses the shared para, keeps its own
    assert out[2]["text"] == "gamma two"
    assert out[2]["n_paras_kept"] == 1
    # doc 3 becomes empty and is dropped
    assert 3 not in out


def test_paragraph_dedup_keep_empty_docs(spark):
    docs = spark.createDataFrame(
        [(1, "same"), (2, "same")], ["doc_id", "text"]
    )
    out = {
        r["doc_id"]: r
        for r in dedup.paragraph_dedup(docs, drop_empty_docs=False).collect()
    }
    assert out[1]["text"] == "same"
    assert out[2]["text"] == "" and out[2]["n_paras_kept"] == 0


def test_paragraph_dedup_normalized_matching(spark):
    # case/whitespace-insensitive dedup, but ORIGINAL text is kept
    docs = spark.createDataFrame(
        [(1, "Hello   World"), (2, "hello world")], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r for r in dedup.paragraph_dedup(docs).collect()}
    assert out[1]["text"] == "Hello   World"
    assert 2 not in out


def test_domain_mixture_select_ratios(spark):
    # 80 'a' docs, 20 'b' docs; target 50/50 -> binding domain is b:
    # keep all 20 b + 20 of a
    rows = [(i, "a") for i in range(80)] + [(i, "b") for i in range(100, 120)]
    df = spark.createDataFrame(rows, ["doc_id", "k"])
    out = curate.domain_mixture_select(
        df, {"a": 0.5, "b": 0.5}, key_col="k", id_col="doc_id"
    )
    got = out.groupBy("k").count().collect()
    by_k = {r["k"]: r["count"] for r in got}
    assert by_k["b"] == 20
    # the spread-id gate keeps exactly the ids whose bucket < 2500 —
    # compute the same expectation in plain Python
    expect_a = sum(1 for i in range(80) if curate.id_bucket_py(i) < 2500)
    assert by_k["a"] == expect_a
    # and the spread is actually uniform-ish over sequential ids
    assert 10 <= expect_a <= 30


def test_domain_mixture_drops_untargeted(spark):
    rows = [(i, "a") for i in range(10)] + [(i, "x") for i in range(10, 20)]
    df = spark.createDataFrame(rows, ["doc_id", "k"])
    out = curate.domain_mixture_select(df, {"a": 1.0}, key_col="k", id_col="doc_id")
    assert out.where(F.col("k") == "x").count() == 0
    assert out.count() == 10


def test_connected_components_small_and_distributed_paths_agree(spark):
    # same graph through the driver union-find gate and the iterative path
    edges = [(1, 2), (2, 3), (10, 11), (11, 12), (12, 13), (40, 41)]
    pairs = spark.createDataFrame(edges, ["id_a", "id_b"])
    small = {
        (r["id"], r["comp"])
        for r in dedup.connected_components(pairs).collect()
    }
    dist = {
        (r["id"], r["comp"])
        for r in dedup.connected_components(
            pairs, small_graph_threshold=0
        ).collect()
    }
    assert small == dist
    assert {c for _, c in small} == {1, 10, 40}


def test_connected_components_convergence_telemetry(spark):
    """Worst-case chain pins the propagation-round count: min-label moves
    ONE hop per iteration, so an n-edge path whose min sits at one end
    needs n rounds + 1 confirming round. Telemetry makes bench wobbles on
    dedup_clusters attributable (rounds vs shared-box noise)."""
    n = 7  # path 0-1-...-7: diameter 7
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], ["id_a", "id_b"]
    )
    dedup.CC_TELEMETRY.clear()
    comp = {
        r["id"]: r["comp"]
        for r in dedup.connected_components(
            pairs, small_graph_threshold=0, max_iters=20
        ).collect()
    }
    assert comp == {i: 0 for i in range(n + 1)}
    assert dedup.CC_TELEMETRY[-1] == {
        "path": "propagation", "edges": 2 * n, "rounds": n + 1
    }
    # union-find gate records its path + edge count too
    dedup.connected_components(pairs).collect()
    assert dedup.CC_TELEMETRY[-1] == {"path": "union_find", "edges": 2 * n}


def test_chunk_documents_windows_and_overlap(spark):
    # 10 tokens, chunk 4, overlap 2 -> stride 2 -> ceil((10-2)/2) = 4 chunks
    txt = "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"
    df = spark.createDataFrame([(1, txt), (2, "a b"), (3, "  ")], ["doc_id", "text"])
    out = curate.chunk_documents(df, chunk_tokens=4, overlap=2)
    rows = {(r["doc_id"], r["chunk_no"]): r for r in out.collect()}
    assert rows[(1, 0)]["chunk_text"] == "t0 t1 t2 t3"
    assert rows[(1, 1)]["chunk_text"] == "t2 t3 t4 t5"
    assert rows[(1, 3)]["chunk_text"] == "t6 t7 t8 t9"
    assert (1, 4) not in rows  # no window past the end
    # short doc -> exactly one chunk; blank doc -> one empty chunk
    assert rows[(2, 0)]["chunk_text"] == "a b" and rows[(2, 0)]["n_chunk_tok"] == 2
    assert rows[(3, 0)]["chunk_text"] == "" and rows[(3, 0)]["n_chunk_tok"] == 0
    # every token appears in some chunk (coverage, no gaps)
    covered = " ".join(r["chunk_text"] for (d, _), r in sorted(rows.items()) if d == 1)
    assert all(f"t{i}" in covered for i in range(10))


def test_chunk_documents_rejects_bad_overlap(spark):
    df = spark.createDataFrame([(1, "a")], ["doc_id", "text"])
    import pytest as _pytest

    with _pytest.raises(ValueError):
        curate.chunk_documents(df, chunk_tokens=4, overlap=4)


def test_pack_sequences_concat_then_cut(spark):
    # single bucket -> one global stream; seq_len 10
    rows = [(1, 4), (2, 4), (3, 4), (4, 9), (5, 1)]
    df = spark.createDataFrame(rows, ["doc_id", "n_tokens"])
    out = curate.pack_sequences(df, seq_len=10, n_buckets=1).orderBy("doc_id").collect()
    # cum_before: 0, 4, 8, 12, 21
    assert [(r["pack_id"], r["pack_offset"]) for r in out] == [
        (0, 0), (0, 4), (0, 8), (1, 2), (2, 1),
    ]
    assert all(r["bucket"] == 0 for r in out)


def test_pack_sequences_buckets_are_independent(spark):
    rows = [(i, 5) for i in range(40)]
    df = spark.createDataFrame(rows, ["doc_id", "n_tokens"])
    out = out_all = curate.pack_sequences(df, seq_len=10, n_buckets=4).collect()
    # within each bucket, offsets restart from 0 and advance by 5 mod 10
    from collections import defaultdict

    by_bucket = defaultdict(list)
    for r in sorted(out_all, key=lambda r: (r["bucket"], r["doc_id"])):
        by_bucket[r["bucket"]].append((r["pack_id"], r["pack_offset"]))
    for b, seq in by_bucket.items():
        assert seq[0] == (0, 0)
        for i, (p, off) in enumerate(seq):
            assert (p, off) == (i * 5 // 10, i * 5 % 10)


def test_compression_ratio_matches_zlib_and_orders_by_redundancy(spark):
    import zlib

    from wp_motor_spark.operators import text as T

    docs = [
        (1, "abc " * 200),                    # highly repetitive
        (2, "the quick brown fox jumps over the lazy dog and then naps"),
        (3, ""),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    ratio = T.compression_ratio_udf()
    out = {
        r["doc_id"]: r["r"]
        for r in df.select("doc_id", ratio(F.col("text")).alias("r")).collect()
    }
    for i, txt in docs[:2]:
        want = round(len(zlib.compress(txt.encode(), 6)) / len(txt.encode()), 6)
        assert out[i] == want  # byte-identical parity with driver zlib
    assert out[1] < out[2]  # repetition compresses harder
    assert out[3] is None


def test_html_to_text_strips_markup_and_decodes_entities(spark):
    from wp_motor_spark.operators import text as T

    html = (
        "<html><head><title>t</title><script>var x = '<p>';</script></head>"
        "<body><!-- c --><style>p{color:red}</style>"
        "<h1>Head&amp;line</h1><p>first &lt;para&gt;</p>"
        "<div>second&nbsp;para</div><br>tail</body></html>"
    )
    df = spark.createDataFrame([(1, html), (2, "no markup here")], ["i", "h"])
    out = {r["i"]: r["t"] for r in
           df.select("i", T.html_to_text(F.col("h")).alias("t")).collect()}
    assert out[1] == "Head&line\nfirst <para>\nsecond para\ntail"
    assert out[2] == "no markup here"


def test_blocklist_filter_matches_deep_hosts(spark):
    """A depth-7 host must match BOTH its exact deep blocklist entry and
    a shallow registrable-domain entry (the r13-advice hole: a
    max_labels=6 cap silently dropped the LONGEST suffixes, so exact
    entries at depth >=7 never matched)."""
    from wp_motor_spark.operators.cleanse import blocklist_filter, host_suffixes

    deep = "a.b.c.d.e.f.bad.com"  # 8 labels
    docs = spark.createDataFrame(
        [(1, deep), (2, "ok.example.org"), (3, "sub.bad.com")],
        ["doc_id", "host"],
    )
    bl = spark.createDataFrame([(deep,), ("bad.com",)], ["entry"])
    out = {
        r["doc_id"]: r["blocked"]
        for r in blocklist_filter(docs, bl).collect()
    }
    assert out == {1: True, 2: False, 3: True}

    # the probe set contains EVERY suffix of an 8-label host, deepest
    # included (the default cap exceeds real-world DNS depth)
    sfx = spark.createDataFrame([(deep,)], ["h"]).select(
        host_suffixes(F.col("h")).alias("s")
    ).head()["s"]
    assert deep in sfx and "bad.com" in sfx and len(sfx) == 8
