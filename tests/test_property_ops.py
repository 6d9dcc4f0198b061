"""Property-based tests for the round-4 curation operators (hypothesis):
invariants that must hold for ANY input, not just the fixtures —
mirroring the generator/parser duality strategy of test_property.py.

Spark jobs are expensive per example, so each property batches all
hypothesis-drawn cases into ONE DataFrame and asserts per-row.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from wp_motor_spark.operators import curate, dedup

_spark_holder = {}


@pytest.fixture(scope="module", autouse=True)
def _hold_spark(spark):
    _spark_holder["s"] = spark


_texts = st.lists(
    st.text(alphabet="abcdefg", min_size=1, max_size=4), min_size=0, max_size=30
).map(" ".join)


@given(docs=st.lists(_texts, min_size=1, max_size=12), chunk=st.integers(3, 10),
       overlap=st.integers(0, 2))
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_chunking_covers_every_token_in_order(docs, chunk, overlap):
    spark = _spark_holder["s"]
    df = spark.createDataFrame(list(enumerate(docs)), ["doc_id", "text"])
    out = curate.chunk_documents(df, chunk_tokens=chunk, overlap=overlap)
    rows = sorted(
        ((r["doc_id"], r["chunk_no"], r["chunk_text"]) for r in out.collect())
    )
    stride = chunk - overlap
    for i, text in enumerate(docs):
        toks = text.split() if text.strip() else []
        chunks = [c for (d, _, c) in rows if d == i]
        # reconstruction: chunk j starts at j*stride; overlap region must
        # agree and the concatenation with overlaps removed is the doc
        rebuilt: list[str] = []
        for j, c in enumerate(chunks):
            ct = c.split() if c else []
            if j == 0:
                rebuilt.extend(ct)
            else:
                assert ct[:overlap] == rebuilt[j * stride : j * stride + overlap]
                rebuilt.extend(ct[overlap:])
        assert rebuilt == toks


@given(counts=st.lists(st.integers(0, 30), min_size=1, max_size=25),
       seq_len=st.integers(4, 16))
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_packing_offsets_are_a_contiguous_stream(counts, seq_len):
    spark = _spark_holder["s"]
    df = spark.createDataFrame(list(enumerate(counts)), ["doc_id", "n_tokens"])
    out = curate.pack_sequences(df, seq_len=seq_len, n_buckets=1)
    rows = sorted((r["doc_id"], r["pack_id"], r["pack_offset"]) for r in out.collect())
    cum = 0
    for (doc_id, pack_id, off) in rows:
        assert pack_id == cum // seq_len and off == cum % seq_len
        cum += counts[doc_id]


@given(texts=st.lists(_texts, min_size=1, max_size=15))
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_span_removal_never_invents_tokens(texts):
    spark = _spark_holder["s"]
    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    out = {r["doc_id"]: r for r in
           dedup.remove_duplicate_spans(df, span=4).collect()}
    for i, text in enumerate(texts):
        toks = text.split() if text.strip() else []
        kept = out[i]["clean_text"].split() if out[i]["clean_text"] else []
        # kept tokens are a subsequence of the original
        it = iter(toks)
        assert all(any(t == x for x in it) for t in kept)
        assert out[i]["n_removed"] == len(toks) - len(kept)
        assert out[i]["n_tokens"] == len(toks)


@given(seen=st.sets(st.integers(0, 500), min_size=1, max_size=60),
       probe=st.sets(st.integers(0, 1000), min_size=1, max_size=60))
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_bloom_never_false_negative(seen, probe):
    from pyspark.sql import functions as F

    from wp_motor_spark.operators import bloom

    spark = _spark_holder["s"]
    sdf = spark.createDataFrame([(f"v{x}",) for x in seen], ["d"])
    bf = bloom.bloom_build(sdf, "d", n_expected=len(seen), fpp=0.01)
    pdf = spark.createDataFrame([(f"v{x}",) for x in probe], ["d"])
    misses = {
        r["d"] for r in bloom.bloom_filter_rows(pdf, "d", bf, keep_hits=False).collect()
    }
    # anything reported definitely-new must really be unseen
    assert all(int(m[1:]) not in seen for m in misses)


@given(lines=st.lists(
    st.text(alphabet=st.characters(min_codepoint=1, max_codepoint=0x2FF),
            max_size=80),
    min_size=1, max_size=40))
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_wpl_dispatch_never_crashes_on_arbitrary_input(lines):
    """ANSI mode is on: any malformed line must land in miss/partial,
    never throw from a typed cast or regex path. Runs the full
    label+diagnose surface over hypothesis-generated garbage."""
    from pyspark.sql import functions as F

    from wp_motor_spark.wpl import MultiParser

    spark = _spark_holder["s"]
    mp = MultiParser(
        "rule a { (symbol(A ),digit:n,ip:sip,time_3339:t) }\n"
        "rule b { (symbol(B ),float:f,chars:w\") }"
    )
    df = spark.createDataFrame([(l,) for l in lines], ["value"])
    out = mp.diagnose(df)
    rows = out.collect()  # must not raise
    assert len(rows) == len(lines)
    assert set(r["_disposition"] for r in rows) <= {
        "success", "partial", "miss", "blank"
    }
