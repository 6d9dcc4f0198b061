"""Deduplication operators for large-scale corpus curation.

Exact, MinHash+LSH, SimHash, and n-gram-Jaccard near-dup — the standard
toolbox for training-data pipelines. All are pure DataFrame ops:

- exact:    one hash-shuffle on the digest (not the full text — at 100TB
            shuffling 64-hex digests instead of documents is the point).
- minhash:  per-row signature is computed map-side with JVM expressions
            (xxhash64 under `transform`), then one shuffle per band on the
            band key; candidate verification re-joins only candidates.
- simhash:  map-only signature + self-join on rotated prefix buckets.
- ngram:    explode+group inverted index — exact Jaccard, heaviest shuffle;
            use on candidate pairs or small corpora.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def normalize_text(col: Column) -> Column:
    """Canonical form for dedup: lowercase, collapse whitespace, trim."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def content_digest(col: Column) -> Column:
    return F.sha2(normalize_text(col).cast("binary"), 256)


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest-id row per distinct normalized text.

    GroupBy on the 256-bit digest => shuffle carries (digest, id) only;
    the winning rows are recovered with a self-semi-join on (digest, id),
    so full documents never shuffle.
    """
    digest = content_digest(F.col(text_col)).alias("__digest")
    keyed = df.select(F.col(id_col), digest)
    winners = keyed.groupBy("__digest").agg(F.min(id_col).alias(id_col))
    return df.join(winners.select(id_col), id_col, "inner")


def shingles(col: Column, n: int = 3) -> Column:
    """Word n-gram shingle array (distinct)."""
    words = F.split(normalize_text(col), " ")
    idx = F.sequence(F.lit(0), F.greatest(F.size(words) - n, F.lit(0)))
    grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)))
    return F.array_distinct(
        F.when(F.size(words) >= n, grams).otherwise(F.array(F.concat_ws(" ", words)))
    )


def minhash_signature(col: Column, num_hashes: int = 32, n: int = 3) -> Column:
    """MinHash signature: per permutation i, min over shingles of
    xxhash64(shingle, seed=i). Entirely JVM expressions, map-side."""
    sh = shingles(col, n)
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda i: F.array_min(F.transform(sh, lambda s: F.xxhash64(s, i))),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
    n: int = 3,
) -> DataFrame:
    """Near-duplicate candidate pairs via banded MinHash LSH, verified with
    exact shingle Jaccard. Returns (id_a, id_b, jaccard) with id_a < id_b.

    Scale shape: rows explode into `bands` bucket keys (small constant),
    shuffle on the band hash, join within buckets only, then verification
    touches candidate pairs instead of the full cross product.
    """
    rows_per_band = num_hashes // bands
    sig = df.select(
        F.col(id_col).alias("__id"),
        shingles(F.col(text_col), n).alias("__sh"),
        minhash_signature(F.col(text_col), num_hashes, n).alias("__sig"),
    )
    banded = sig.select(
        "__id",
        "__sh",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(
                        F.concat_ws(",", F.slice(F.col("__sig"), b * rows_per_band + 1, rows_per_band)), b
                    ).alias("bucket"),
                ),
            )
        ).alias("bk"),
    ).select("__id", "__sh", "bk.band", "bk.bucket")
    left = banded.alias("a")
    right = banded.alias("b")
    cand = (
        left.join(
            right,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            F.col("a.__sh").alias("sh_a"),
            F.col("b.__sh").alias("sh_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    jac = (inter / union).alias("jaccard")
    return (
        cand.select("id_a", "id_b", jac)
        .where(F.col("jaccard") >= threshold)
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard similarity pairs via an inverted shingle index.

    explode -> groupBy(shingle) -> pair counts -> |A∩B| / (|A|+|B|-|A∩B|).
    SQL-expressible (the DuckDB oracle mirrors it); heaviest shuffle of the
    dedup family — prefer minhash_lsh_pairs at scale.
    """
    sh = df.select(F.col(id_col).alias("id"), shingles(F.col(text_col), n).alias("sh"))
    sizes = sh.select("id", F.size("sh").alias("n_sh"))
    inv = sh.select("id", F.explode("sh").alias("g"))
    a = inv.alias("a")
    b = inv.alias("b")
    inter = (
        a.join(b, (F.col("a.g") == F.col("b.g")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_sh").alias("nb"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            (F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def simhash(col: Column, bits: int = 64) -> Column:
    """SimHash fingerprint: per-token xxhash64, bit-vote, sign -> bit.

    Pure expressions, one pass over tokens: each token hash becomes a
    64-slot ±1 array (bits via its base-2 string — shifts by a column
    aren't expressible), vote arrays are summed element-wise, and the
    sign vector packs back into one LongType fingerprint.
    """
    toks = F.array_distinct(F.split(normalize_text(col), " "))
    token_bits = lambda t: F.transform(  # noqa: E731 — array<int> of ±1, MSB first
        F.filter(F.split(F.lpad(F.bin(F.xxhash64(t)), bits, "0"), ""), lambda c: c != ""),
        lambda c: F.when(c == "1", 1).otherwise(-1),
    )
    votes = F.aggregate(
        toks,
        F.array_repeat(F.lit(0), bits),
        lambda acc, t: F.zip_with(acc, token_bits(t), lambda a, b: a + b),
    )
    return F.aggregate(
        votes,
        F.lit(0).cast("long"),
        lambda acc, v: F.shiftleft(acc, 1) + F.when(v > 0, 1).otherwise(0),
    )


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance <= max_hamming.

    Candidate generation: split the 64-bit fingerprint into 4 16-bit blocks
    (pigeonhole: distance<=3 => at least one block equal), join per block,
    verify with bit_count(xor). One shuffle per block on a 16-bit key.
    """
    f = df.select(
        F.col(id_col).alias("__id"), simhash(F.col(text_col)).alias("__fp")
    )
    blocks = f.select(
        "__id",
        "__fp",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("blk"),
                        F.shiftright(F.col("__fp"), b * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("key"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bk"),
    ).select("__id", "__fp", "bk.blk", "bk.key")
    a, b = blocks.alias("a"), blocks.alias("b")
    ham = F.bit_count(F.col("a.__fp").bitwiseXOR(F.col("b.__fp")))
    return (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            ham.alias("hamming"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .where(F.col("hamming") <= max_hamming)
    )


def embedding_neardup_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
) -> DataFrame:
    """Embedding-cosine near-dup pairs (id_a < id_b, cosine >= threshold).

    Brute self-join; for scale, pre-bucket with similarity.hyperplane_lsh.
    """
    from wp_motor_spark.operators.similarity import cosine

    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cosine(F.col("va"), F.col("vb")).alias("cosine"))
        .where(F.col("cosine") >= threshold)
    )
