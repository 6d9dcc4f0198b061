"""Corpus curation / selection operators for training-data pipelines.

Extensions beyond the reference surface (BASELINE.json north star): once
dedup + quality scoring have run, a pipeline still has to DECIDE what goes
into the training mix — typically "the best documents per language until
the token budget is full". These operators express that selection as pure
window/aggregate plans (no UDFs, no collect), so they hold at corpus scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


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


def sample_fraction_by_key(
    df: DataFrame,
    fractions: dict[str, float],
    key_col: str,
    id_col: str = "doc_id",
    modulus: int = 10_000,
) -> DataFrame:
    """Deterministic stratified downsampling: keep a row when
    `id mod modulus < fraction * modulus` for its stratum's fraction
    (missing strata keep everything). Unlike `DataFrame.sampleBy` this is
    reproducible across runs/engines (no RNG state), which training-data
    pipelines need for auditability. Map-only — no shuffle."""
    frac = F.lit(None).cast("double")
    expr: Column = frac
    for k, v in fractions.items():
        expr = F.when(F.col(key_col) == k, F.lit(float(v))).otherwise(expr)
    keep = F.coalesce(expr, F.lit(1.0))
    return df.where((F.pmod(F.col(id_col), F.lit(modulus))) < keep * modulus)
