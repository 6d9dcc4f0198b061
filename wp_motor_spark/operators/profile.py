"""Corpus profiling — the one-pass statistics a curation run starts from.

Extensions beyond the reference surface (BASELINE.json north star): before
mixing/sampling decisions you need the corpus shape — per-language volume,
token-length distribution (exact quantiles, not sketches, so the numbers
are reproducible and oracle-checkable), and the global token frequency
table (stopword derivation, vocabulary pruning, boilerplate spotting).

Scale shapes:
- `corpus_profile`: ONE aggregation pass; the shuffle carries one row per
  (lang) group of pre-combined partials. Exact quantiles use Spark's
  `percentile` aggregate, whose state is a count-per-distinct-value map —
  token counts are small ints, so distinct values are bounded (~1e5) no
  matter how many documents, unlike quantiles over raw doubles. At 100 TB
  this is a full scan + a tiny shuffle.
- `top_tokens`: explode → two-phase count. Partial (map-side) aggregation
  absorbs the Zipf skew: "the" collapses to one row per map partition
  before the shuffle, so the hot key costs |partitions| rows, not |docs|.
  The final top-N sorts only the |vocab| count rows, never documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from wp_motor_spark.operators.text import token_count_ws, tokens


def corpus_profile(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "lang",
) -> DataFrame:
    """Per-group corpus statistics: doc count, token totals/mean, and the
    exact interpolated p50/p90/p99 of per-document token counts.

    `percentile` (Spark) and `quantile_cont` (DuckDB) both compute the
    linearly-interpolated quantile at index p*(n-1), so the oracle matches
    to float precision; both sides round to 4 dp to pin that down.
    """
    n_tok = token_count_ws(F.col(text_col))
    return (
        df.select(F.col(group_col).alias("grp"), n_tok.alias("__nt"))
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__nt").alias("total_tokens"),
            F.round(F.avg("__nt"), 4).alias("mean_tokens"),
            F.round(F.expr("percentile(__nt, 0.5)"), 4).alias("p50_tokens"),
            F.round(F.expr("percentile(__nt, 0.9)"), 4).alias("p90_tokens"),
            F.round(F.expr("percentile(__nt, 0.99)"), 4).alias("p99_tokens"),
            F.min("__nt").alias("min_tokens"),
            F.max("__nt").alias("max_tokens"),
        )
    )


def top_tokens(
    df: DataFrame,
    text_col: str = "text",
    n: int = 50,
    min_len: int = 1,
) -> DataFrame:
    """Global token frequency table, top `n` by (count desc, token asc) —
    the deterministic tie-break makes the cut reproducible and lets the
    DuckDB oracle return the identical row set.

    Emits (rank, token, cnt, doc_freq): corpus frequency and document
    frequency in the same aggregation (df via count of distinct doc —
    computed as a per-doc `array_distinct` before the explode, so the
    shuffle never carries duplicate (token, doc) rows from one document).
    """
    # ONE token-keyed shuffle for both corpus count and document
    # frequency: sort the token array, mark run starts (= first occurrence
    # within the doc) map-side, explode (token, is_first) structs, then a
    # single groupBy computes cnt = count(*) and doc_freq = count of
    # firsts. The sorted array is projected FIRST so the run-boundary
    # subscript hits a bound attribute (O(1) array access), not the
    # array_sort(split(...)) subtree — subscripting an unbound expression
    # inside a higher-order lambda re-evaluates it per element (the O(n²)
    # trap documented at text.top_word_fraction).
    sorted_df = df.select(F.array_sort(tokens(F.col(text_col))).alias("__t"))
    t = F.col("__t")
    is_first = F.transform(
        t, lambda x, i: (i == 0) | (x != F.element_at(t, i))
    )  # element_at is 1-based: element_at(t, i) is the PREVIOUS element
    pairs = F.zip_with(
        t,
        is_first,
        lambda tok, fst: F.struct(tok.alias("token"), fst.alias("is_first")),
    )
    per_doc = (
        sorted_df.select(F.explode(pairs).alias("z"))
        .select("z.token", "z.is_first")
        .where(F.length("token") >= min_len)
    )
    agg = per_doc.groupBy("token").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.count_if("is_first").alias("doc_freq"),
    )
    top = agg.orderBy(F.col("cnt").desc(), F.col("token").asc()).limit(n)
    from pyspark.sql import Window

    # constant partition key: the frame is the <=n post-limit rows either
    # way, but an empty partition spec makes WindowExec WARN on every run
    # (a bare lit(0) or col*0 is constant-folded back out; col % 1 survives)
    w = Window.partitionBy(F.col("cnt") % 1).orderBy(
        F.col("cnt").desc(), F.col("token").asc()
    )
    return top.select(
        F.row_number().over(w).alias("rank"), "token", "cnt", "doc_freq"
    )


def tfidf_keywords(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int = 5,
) -> DataFrame:
    """Per-document keyword extraction by tf-idf: the `top_k` terms with
    the highest tf * ln(N / df) (ties broken by term asc), returned as
    (id, keywords) with keywords comma-joined in rank order.

    One token-keyed shuffle computes document frequency (same
    run-boundary trick as `top_tokens` — df rides the first-occurrence
    flags, no second aggregation); per-doc term counts ride an id-keyed
    aggregation of the same exploded rows; the idf join moves (token, df)
    pairs with NO broadcast hint — a whitespace-token vocab grows under
    Heaps' law (1e8-1e9 distinct tokens at 100 TB), so the join must be
    able to shuffle on token; AQE broadcasts it at runtime when the df
    table is actually small. Ranking is a per-doc window over candidate
    terms only.
    """
    from pyspark.sql import Window

    sorted_df = df.select(
        F.col(id_col).alias("__id"),
        F.array_sort(tokens(F.col(text_col))).alias("__t"),
    )
    t = F.col("__t")
    is_first = F.transform(t, lambda x, i: (i == 0) | (x != F.element_at(t, i)))
    pairs = F.zip_with(
        t,
        is_first,
        lambda tok, fst: F.struct(tok.alias("token"), fst.alias("is_first")),
    )
    exploded = (
        sorted_df.select("__id", F.size("__t").alias("__len"), F.explode(pairs).alias("z"))
        .select("__id", "__len", "z.token", "z.is_first")
        .where(F.length("token") >= 1)
    )
    n_docs = df.count()
    dfreq = (
        exploded.where("is_first")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    tf = exploded.groupBy("__id", "token").agg(
        F.count(F.lit(1)).alias("tf"), F.first("__len").alias("__len")
    )
    scored = tf.join(dfreq, "token").select(
        "__id",
        "token",
        F.round(
            (F.col("tf") / F.greatest(F.col("__len"), F.lit(1)))
            * F.log(F.lit(float(n_docs)) / F.col("df")),
            10,
        ).alias("score"),
    )
    w = Window.partitionBy("__id").orderBy(F.desc("score"), F.asc("token"))
    top = scored.withColumn("rk", F.row_number().over(w)).where(F.col("rk") <= top_k)
    return top.groupBy("__id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("rk"), F.col("token")))
                ),
                lambda s: s["token"],
            ),
            ",",
        ).alias("keywords")
    ).select(F.col("__id").alias(id_col), "keywords")


def doc_information(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Information-theoretic quality signals per document:

    - `surprisal`: mean -ln p(token) under the CORPUS unigram model
      (p = corpus_count/total) — the cheap perplexity proxy used to rank
      documents by "typicality" (low = boilerplate-ish, high = rare/noisy
      vocabulary; both tails are filter candidates).
    - `entropy`: Shannon entropy of the document's OWN token distribution
      — near zero for repetition loops, ~ln(len) for all-distinct text.

    Plan: entropy is computed entirely map-side from the per-doc sorted
    run-lengths (one id-keyed aggregation of (id, tf) rows); surprisal
    needs the corpus model — ONE token-keyed count (map-side combined)
    joined back onto the same (id, token, tf) rows WITHOUT a broadcast
    hint (Heaps' law keeps a raw-text vocab growing; AQE broadcasts at
    runtime when actually small). Two shuffles total, text never moves
    after tokenization.
    """
    from pyspark.sql import Window

    sorted_df = df.select(
        F.col(id_col).alias("__id"),
        F.array_sort(tokens(F.col(text_col))).alias("__t"),
    )
    t = F.col("__t")
    is_first = F.transform(t, lambda x, i: (i == 0) | (x != F.element_at(t, i)))
    pairs = F.zip_with(
        t,
        is_first,
        lambda tok, fst: F.struct(tok.alias("token"), fst.alias("is_first")),
    )
    exploded = (
        sorted_df.select(
            "__id", F.size("__t").alias("__len"), F.explode(pairs).alias("z")
        )
        .select("__id", "__len", "z.token", "z.is_first")
        .where(F.length("token") >= 1)
    )
    tf = exploded.groupBy("__id", "token").agg(
        F.count(F.lit(1)).alias("tf"), F.first("__len").alias("__len")
    )
    corpus = exploded.groupBy("token").agg(F.count(F.lit(1)).alias("c"))
    total = exploded.count()
    scored = tf.join(corpus, "token").select(
        "__id",
        "tf",
        "__len",
        (F.col("tf") * -F.log(F.col("c") / F.lit(float(total)))).alias("__surp"),
        (
            F.col("tf")
            * -F.log(F.col("tf") / F.greatest(F.col("__len"), F.lit(1)))
        ).alias("__ent"),
    )
    return scored.groupBy("__id").agg(
        F.round(F.sum("__surp") / F.greatest(F.first("__len"), F.lit(1)), 6).alias(
            "surprisal"
        ),
        F.round(F.sum("__ent") / F.greatest(F.first("__len"), F.lit(1)), 6).alias(
            "entropy"
        ),
    ).select(F.col("__id").alias(id_col), "surprisal", "entropy")
