"""Corpus curation / selection operators for training-data pipelines.

Extensions beyond the reference surface (BASELINE.json north star): once
dedup + quality scoring have run, a pipeline still has to DECIDE what goes
into the training mix — typically "the best documents per language until
the token budget is full". These operators express that selection as pure
window/aggregate plans (no UDFs, no collect), so they hold at corpus scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

# Knuth multiplicative-hash id spreader: sequential ids (the common case
# for generated doc/event ids) land uniformly across buckets instead of
# `id % modulus` keeping the FIRST fraction of every range. Constants are
# chosen so the intermediate stays far below 2^63 (ANSI mode overflows
# loudly): (P1-1) * K ~ 2.7e15. Same integer arithmetic runs verbatim in
# the DuckDB oracles — deterministic across engines, unlike RNG sampling.
_SPREAD_P1 = 1_000_003
_SPREAD_K = 2_654_435_761
_SPREAD_P2 = 1_000_000_007


def id_bucket(id_col: Column, modulus: int = 10_000) -> Column:
    """Deterministic uniform bucket in [0, modulus) from an integer id."""
    return F.pmod(
        F.pmod(F.pmod(id_col, F.lit(_SPREAD_P1)) * F.lit(_SPREAD_K), F.lit(_SPREAD_P2)),
        F.lit(modulus),
    )


def id_bucket_sql(id_expr: str, modulus: int = 10_000) -> str:
    """The same bucket as ANSI SQL (for DuckDB oracles)."""
    return f"(({id_expr} % {_SPREAD_P1}) * {_SPREAD_K} % {_SPREAD_P2}) % {modulus}"


def id_bucket_py(i: int, modulus: int = 10_000) -> int:
    """The same bucket in plain Python (for tests computing expectations)."""
    return ((i % _SPREAD_P1) * _SPREAD_K % _SPREAD_P2) % modulus


def token_budget_select(
    df: DataFrame,
    budget: int,
    tokens_col: str = "n_tokens",
    partition_col: str | None = None,
    order_col: str | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Greedy budget fill: rank documents (best first) inside each
    partition (e.g. language), keep documents while the running token sum
    stays within `budget`; the first document of a partition is always
    kept even if it alone exceeds the budget (a budget must not silence a
    stratum entirely).

    Ordering is (order_col DESC, id ASC) — the id tiebreak makes the cut
    deterministic under equal scores. One window (= one shuffle on the
    partition key); the cumulative sum rides the same sort, no second
    pass. Skewed strata (one language dominating the corpus) behave like
    any skewed window: AQE or an explicit salt on the ranking stage; the
    budget filter itself adds nothing to the shuffle.
    """
    parts = [partition_col] if partition_col else []
    order = (
        [F.col(order_col).desc(), F.col(id_col).asc()]
        if order_col
        else [F.col(id_col).asc()]
    )
    w = Window.partitionBy(*parts).orderBy(*order)
    cum = F.sum(F.col(tokens_col)).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    rank = F.row_number().over(w)
    return (
        df.withColumn("__cum_tokens", cum)
        .withColumn("__rank", rank)
        .where((F.col("__cum_tokens") <= budget) | (F.col("__rank") == 1))
        .drop("__rank")
        .withColumnRenamed("__cum_tokens", "cum_tokens")
    )


def domain_mixture_select(
    df: DataFrame,
    targets: dict[str, float],
    key_col: str,
    id_col: str = "doc_id",
    modulus: int = 10_000,
) -> DataFrame:
    """Select the largest corpus subset whose domain mix matches the
    target proportions exactly (up to id-mod granularity): the binding
    domain is the one with the least data relative to its share — every
    other domain downsamples to keep the ratios. Domains absent from
    `targets` are dropped (share 0).

    Plan shape: one map-side-combined count per domain (a shuffle of
    |domains| rows), a bounded driver collect of those counts (domains
    are a config-sized set, never corpus-sized), then a map-only
    deterministic id-mod filter — the same reproducible gate as
    sample_fraction_by_key. At 100 TB the data pass is a single scan.
    """
    counts = {
        r[key_col]: r["cnt"]
        for r in df.groupBy(key_col).agg(F.count("*").alias("cnt")).collect()
        if r[key_col] in targets
    }
    if not counts:
        return df.where(F.lit(False))
    scale = min(counts[k] / targets[k] for k in counts if targets[k] > 0)
    fractions = {k: targets[k] * scale / counts[k] for k in counts}
    expr: Column = F.lit(None).cast("double")
    for k, v in fractions.items():
        expr = F.when(F.col(key_col) == k, F.lit(v)).otherwise(expr)
    keep = F.coalesce(expr, F.lit(0.0))
    return df.where(id_bucket(F.col(id_col), modulus) < keep * modulus)


def sample_fraction_by_key(
    df: DataFrame,
    fractions: dict[str, float],
    key_col: str,
    id_col: str = "doc_id",
    modulus: int = 10_000,
) -> DataFrame:
    """Deterministic stratified downsampling: keep a row when its
    spread id bucket < fraction * modulus for its stratum's fraction
    (missing strata keep everything). Unlike `DataFrame.sampleBy` this is
    reproducible across runs/engines (no RNG state), which training-data
    pipelines need for auditability; the multiplicative-hash bucket makes
    the sample uniform even over sequential ids. Map-only — no shuffle."""
    frac = F.lit(None).cast("double")
    expr: Column = frac
    for k, v in fractions.items():
        expr = F.when(F.col(key_col) == k, F.lit(float(v))).otherwise(expr)
    keep = F.coalesce(expr, F.lit(1.0))
    return df.where(id_bucket(F.col(id_col), modulus) < keep * modulus)


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 32,
    overlap: int = 8,
) -> DataFrame:
    """Split each document into fixed-size token windows with overlap —
    the standard RAG / context-window prep step. Emits one row per chunk:
    (id, chunk_no, chunk_text, n_chunk_tok).

    Window i covers tokens [i*stride, i*stride + chunk_tokens) with
    stride = chunk_tokens - overlap; a document of n <= chunk_tokens
    tokens yields exactly one chunk (blank text yields one empty chunk, so
    no document silently disappears).

    Scale shape: map-only — tokenize, `transform` over a chunk-index
    `sequence`, `explode`. No shuffle, no UDF; output size is
    input * (1 + overlap/stride), the unavoidable duplication overlap
    buys. Row explosion is per-document bounded, so partition sizes grow
    by the same constant factor everywhere (no skew introduced).
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("require 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    from wp_motor_spark.operators.dedup import raw_tokens

    toks = raw_tokens(F.col(text_col))
    n_tok = F.size(toks)
    n_chunks = (
        F.when(n_tok <= chunk_tokens, F.lit(1))
        .otherwise(F.ceil((n_tok - F.lit(overlap)) / F.lit(float(stride))))
        .cast("int")
    )
    chunk = lambda i: F.slice(toks, i * stride + 1, chunk_tokens)  # noqa: E731
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            i.cast("int").alias("chunk_no"),
            F.array_join(chunk(i), " ").alias("chunk_text"),
            F.size(chunk(i)).alias("n_chunk_tok"),
        ),
    )
    return df.select(F.col(id_col), F.explode(chunks).alias("__c")).select(
        id_col, "__c.chunk_no", "__c.chunk_text", "__c.n_chunk_tok"
    )


def pack_sequences(
    df: DataFrame,
    seq_len: int,
    tokens_col: str = "n_tokens",
    id_col: str = "doc_id",
    n_buckets: int = 64,
) -> DataFrame:
    """Deterministic sequence packing: concatenate documents in id order
    and cut the stream into `seq_len`-token training sequences — each
    document is assigned the pack its first token lands in plus its
    offset inside that pack (the concat-then-cut packing used by LM
    pre-tokenization pipelines; a doc crossing a boundary continues into
    the next pack).

    Parallelism: a single global running sum would funnel the corpus
    through one partition, so documents are first spread over
    `n_buckets` independent streams by the deterministic id hash
    (`id_bucket`), and the running sum is a window per bucket — pack ids
    are (bucket, pack_id) pairs. One shuffle (the window partition), no
    UDFs. At 100 TB, n_buckets ~ cluster cores keeps each window's state
    tiny while preserving exact reproducibility run-to-run — which RNG
    shuffles can't give you.
    """
    b = id_bucket(F.col(id_col), n_buckets).alias("bucket")
    w = Window.partitionBy("bucket").orderBy(F.col(id_col).asc())
    cum_before = F.coalesce(
        F.sum(tokens_col).over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0).cast("bigint"),
    )
    return (
        df.withColumn("bucket", b)
        .withColumn("pack_id", F.floor(cum_before / seq_len))
        .withColumn("pack_offset", cum_before % seq_len)
    )


def coverage_select_greedy(
    docs,
    k: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 1,
):
    """Greedy maximum-coverage selection (the classic (1-1/e) facility-
    location greedy, Nemhauser et al. 1978) over token TYPES: each round
    picks the document adding the most not-yet-covered distinct tokens
    (doc_id ascending breaks ties) — the diversity-first subset
    selection used to seed instruction-tuning pools and dedup-aware
    eval slices. Returns (rank, doc_id, gain) for the k picks; stops
    early when no document adds coverage.

    Scale shape: the distinct (doc, token) table materializes ONCE
    (one shuffle) and persists; each of the k rounds is an anti-join
    against the covered-token set + a doc-keyed partial agg + a 1-row
    argmax collect. The covered set is bounded by the union vocab of
    the k picked docs (k × per-doc vocab — kilobytes at any corpus
    size); it is derived from the persisted toks frame per round and
    broadcast into the anti-join INSIDE the argmax job, so each round
    is exactly ONE action (the former four — union/distinct/
    localCheckpoint/collect — are gone; the greedy sequence is
    unchanged, gate-verified)."""
    from pyspark.sql import functions as F

    spark = docs.sparkSession
    # Materialize the split ONCE behind a projection boundary before the
    # n-gram transform: inlined, CollapseProject re-evaluates the regex
    # split inside every lambda reference (size/sequence/slice) — measured
    # 4-8x slower on the bigram build (guide §1 isolate-then-fix).
    words = F.split(F.trim(F.lower(text_col)), r"\s+")
    base = docs.select(F.col(id_col).alias("doc_id"), words.alias("__w"))
    w = F.col("__w")
    if ngram > 1:
        units = F.when(
            F.size(w) >= ngram,
            F.transform(
                F.sequence(F.lit(1), F.size(w) - ngram + 1),
                lambda i: F.array_join(F.slice(w, i, ngram), " "),
            ),
        ).otherwise(F.array(F.array_join(w, " ")))
    else:
        units = w
    toks = (
        base.select("doc_id", F.explode(units).alias("tok"))
        .where(F.col("tok") != "")
        .distinct()
        .persist()
    )
    picked: list[tuple[int, int, int]] = []
    picked_ids: list[int] = []
    try:
        for rank in range(1, k + 1):
            pool = toks
            if picked_ids:
                # ONE action per round: the covered set is the picked docs'
                # union vocab, derived from the SAME persisted toks frame
                # and broadcast inside the argmax job (bounded: k docs x
                # per-doc vocab). No per-round collect of picked tokens —
                # the former driver round-trip halved here (16 -> 8 jobs).
                pool = pool.where(~F.col("doc_id").isin(picked_ids))
                covered = (
                    toks.where(F.col("doc_id").isin(picked_ids))
                    .select("tok")
                    .distinct()
                )
                pool = pool.join(F.broadcast(covered), "tok", "left_anti")
            best = (
                pool.groupBy("doc_id")
                .agg(F.count(F.lit(1)).alias("gain"))
                .orderBy(F.desc("gain"), F.asc("doc_id"))
                .first()
            )
            if best is None or best["gain"] == 0:
                break
            picked.append((rank, best["doc_id"], best["gain"]))
            picked_ids.append(best["doc_id"])
    finally:
        toks.unpersist()
    return spark.createDataFrame(picked, "rank int, doc_id long, gain long")


def unimax_allocation(counts_df, budget: float, max_epochs: float = 2.0):
    """UniMax language-sampling allocation (Chung et al. 2023, "UniMax:
    Fairer and More Effective Language Sampling for Large-Scale
    Multilingual Pretraining", Algorithm 1): give every language as close
    to a UNIFORM share of the token budget as possible without repeating
    any language's corpus more than ``max_epochs`` times.

    Water-filling closed form over ascending capacity b_l = c_l * E: the
    capped set is a PREFIX of the ascending order, so window functions
    replace the sequential loop — language i is capped when
    b_i * (L - i + 1) + cumsum(b)_{i-1} <= N, i.e. granting it full
    capacity still leaves a uniform share for everyone after it; every
    uncapped language splits the remaining budget equally.

    Input: counts_df(lang, token_count). Output adds `capacity`,
    `alloc_tokens`, `weight` (= alloc / N). The frame is |languages|
    rows — the windows are a single-partition sort over a tiny frame,
    all the real work happened in the upstream token-count aggregation.
    """
    lang_col, cnt_col = counts_df.columns[0], counts_df.columns[1]
    b = counts_df.select(
        F.col(lang_col).alias("lang"),
        F.col(cnt_col).cast("double").alias("token_count"),
        (F.col(cnt_col) * F.lit(float(max_epochs))).alias("capacity"),
    )
    # tiny frame: single-partition windows are fine (|langs| rows)
    w_ord = Window.orderBy(F.col("capacity").asc(), F.col("lang").asc())
    w_cum = w_ord.rowsBetween(Window.unboundedPreceding, -1)
    ranked = b.select(
        "*",
        F.row_number().over(w_ord).alias("i"),
        F.coalesce(F.sum("capacity").over(w_cum), F.lit(0.0)).alias("cum_prev"),
        F.count(F.lit(1)).over(
            Window.partitionBy().rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("L"),
    )
    n = F.lit(float(budget))
    capped = (F.col("capacity") * (F.col("L") - F.col("i") + 1) + F.col("cum_prev")) <= n
    ranked = ranked.withColumn("capped", capped)
    agg = ranked.agg(
        F.sum(F.when(F.col("capped"), F.col("capacity")).otherwise(0.0)).alias("cap_sum"),
        F.sum(F.when(~F.col("capped"), 1).otherwise(0)).alias("k_free"),
    )
    out = ranked.crossJoin(F.broadcast(agg)).select(
        "lang",
        "token_count",
        "capacity",
        F.when(F.col("capped"), F.col("capacity"))
        .otherwise((n - F.col("cap_sum")) / F.col("k_free"))
        .alias("alloc_tokens"),
    )
    return out.select(
        "*", F.round(F.col("alloc_tokens") / n, 9).alias("weight")
    )
