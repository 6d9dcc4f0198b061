"""Text analysis operators for corpus curation — all pure JVM expressions.

Language ID (stopword-profile heuristic), quality scoring, token counting
(whitespace + BPE-ish regex), and rolling-hash document fingerprinting.
Every one is a Column fn usable map-side at any scale (no UDFs, no state)
— except compression_ratio_udf, the documented Arrow-batched exception
(DEFLATE has no JVM-expression form).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, functions as F

# Small stopword profiles per language — heuristic n-gram/stopword LID.
_PROFILES: dict[str, list[str]] = {
    "en": "the of and to in is was for on that with as are at this".split(),
    "de": "der die das und ist von zu den mit nicht ein eine im".split(),
    "fr": "le la les de des et est dans que pour une sur pas au".split(),
    "es": "el la los de y que en un una es por con para del".split(),
}


def tokens(col: Column) -> Column:
    return F.split(F.trim(F.lower(col)), r"\s+")


def token_count_ws(col: Column) -> Column:
    """Whitespace token count."""
    t = F.trim(col)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(F.size(F.split(t, r"\s+")))


def token_count_bpe(col: Column) -> Column:
    """BPE-ish subword count: word chunks of <=4 chars + punctuation marks.

    Approximates a byte-pair tokenizer's token count with a regex —
    ceil(len/4) per word plus one per non-space punctuation.
    """
    words = F.split(F.trim(col), r"\s+")
    word_toks = F.aggregate(
        words,
        F.lit(0),
        lambda acc, w: acc + F.ceil(F.length(F.regexp_replace(w, r"[^\p{L}\p{N}]", "")) / 4.0).cast("int")
        + F.length(F.regexp_replace(w, r"[\p{L}\p{N}]", "")),
    )
    return F.when(F.length(F.trim(col)) == 0, F.lit(0)).otherwise(word_toks)


def stopword_ratio(col: Column, lang: str = "en") -> Column:
    t = tokens(col)
    hits = F.size(F.filter(t, lambda w: w.isin(*_PROFILES[lang])))
    return hits / F.greatest(F.size(t), F.lit(1))


def detect_language(col: Column) -> Column:
    """Best stopword-profile match; 'und' (undetermined) when no profile
    scores above a floor."""
    t = tokens(col)
    total = F.greatest(F.size(t), F.lit(1))

    def hits(words: list[str]) -> Column:
        # one-arg lambda: a 2-arg lambda would be treated as (value, index)
        return F.size(F.filter(t, lambda w: w.isin(*words)))

    scored = F.array(
        *[
            F.struct(
                (hits(sw) / total).alias("score"),
                F.lit(lang).alias("lang"),
            )
            for lang, sw in _PROFILES.items()
        ]
    )
    best = F.array_max(scored)
    return F.when(best.getField("score") >= 0.08, best.getField("lang")).otherwise(F.lit("und"))


def punct_ratio(col: Column) -> Column:
    total = F.greatest(F.length(col), F.lit(1))
    return F.length(F.regexp_replace(col, r"[\p{L}\p{N}\s]", "")) / total


def mean_word_length(col: Column) -> Column:
    t = tokens(col)
    return F.aggregate(
        t, F.lit(0), lambda acc, w: acc + F.length(w)
    ) / F.greatest(F.size(t), F.lit(1))


def quality_score(col: Column) -> Column:
    """Composite [0,1] quality heuristic: favors mid-length docs, low
    punctuation, normal word lengths, and presence of stopwords (prose
    rather than keyword spam). Deterministic, SQL-mirrorable."""
    n_tok = token_count_ws(col).cast("double")
    len_score = F.least(n_tok / 20.0, F.lit(1.0)) * F.when(n_tok > 1000, 0.5).otherwise(1.0)
    punct_pen = F.when(punct_ratio(col) > 0.2, 0.5).otherwise(1.0)
    wl = mean_word_length(col)
    wl_score = F.when((wl >= 3) & (wl <= 10), 1.0).otherwise(0.6)
    sw = stopword_ratio(col)
    sw_score = F.when(sw >= 0.05, 1.0).otherwise(0.7)
    return F.round(len_score * punct_pen * wl_score * sw_score, 4)


def fingerprint(col: Column) -> Column:
    """64-bit document fingerprint: xxhash64 of the normalized text —
    stable content identity for exact-dup detection and joins."""
    return F.xxhash64(F.trim(F.regexp_replace(F.lower(col), r"\s+", " ")))


def top_word_fraction(col: Column) -> Column:
    """Fraction of tokens taken by the single most frequent token — the
    word-level analogue of Gopher's top-n-gram repetition signal (Rae et
    al. 2021, §A1.1). Pure array expressions: sort the token array, count
    the longest equal run via aggregate over indices — map-only, no
    explode/shuffle, so it composes into scan-side quality filtering.
    O(n log n) per doc on doc-sized arrays."""
    t = F.array_sort(tokens(col))
    n = F.size(t)
    # run-length fold over the sorted array itself, carrying the previous
    # element in the accumulator. Folding over index sequences and
    # subscripting t[i] inside the lambda is the trap: every subscript
    # re-evaluates the whole array_sort(split(...)) subtree (higher-order
    # fns are interpreted, children re-eval per step) — measured O(n^2),
    # 2.8 s for 500 docs; this form is one pass, t evaluates once.
    best = F.aggregate(
        t,
        F.struct(
            F.lit(0).alias("best"),
            F.lit(0).alias("cur"),
            F.lit(None).cast("string").alias("prev"),
        ),
        lambda acc, x: F.struct(
            F.greatest(
                acc["best"],
                F.when(x == acc["prev"], acc["cur"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
            F.when(x == acc["prev"], acc["cur"] + 1).otherwise(F.lit(1)).alias("cur"),
            x.alias("prev"),
        ),
        lambda acc: acc["best"],
    )
    return F.when(n <= 1, F.lit(1.0)).otherwise(best / n.cast("double"))


def duplicate_token_fraction(col: Column) -> Column:
    """Fraction of tokens that are repeats of an earlier token —
    1 - distinct/total (Gopher's duplicate-line fraction, applied at
    token granularity for single-line corpora). Map-only."""
    t = tokens(col)
    n = F.greatest(F.size(t), F.lit(1))
    return F.lit(1.0) - F.size(F.array_distinct(t)) / n.cast("double")


def gopher_flags_from_metrics(
    n_words: Column,
    mean_wl: Column,
    sw_ratio: Column,
    top_frac: Column,
    dup_frac: Column,
) -> Column:
    """Gopher rule flags from precomputed metric columns. Use this form
    when the metrics are (or will be) materialized columns: building the
    metrics once and flagging from column references guarantees each
    array aggregate runs once per row — separate calls to the metric
    functions produce fresh lambda-variable ids, so codegen CSE cannot
    dedupe them across expressions."""
    flags = {
        "ok_n_words": (n_words >= 50) & (n_words <= 100_000),
        "ok_word_len": (mean_wl >= 3) & (mean_wl <= 10),
        "ok_stopwords": sw_ratio >= 0.02,
        "ok_top_word": top_frac <= 0.2,
        "ok_dup_tokens": dup_frac <= 0.6,
    }
    keep = None
    for c in flags.values():
        keep = c if keep is None else (keep & c)
    return F.struct(*[v.alias(k) for k, v in flags.items()], keep.alias("keep"))


def gopher_quality_flags(col: Column) -> Column:
    """Gopher-style document filter (Rae et al. 2021, table A1) adapted
    to this corpus: struct of individual rule booleans + overall keep.
    Rules: 50 <= n_words <= 100k, 3 <= mean word len <= 10, stopword
    ratio >= 0.02, top-word fraction <= 0.2, duplicate-token fraction
    <= 0.6. All pure JVM expressions — usable as a scan-side filter.
    For wide outputs, prefer materializing the metrics and calling
    gopher_flags_from_metrics (see its docstring on CSE)."""
    return gopher_flags_from_metrics(
        token_count_ws(col),
        mean_word_length(col),
        stopword_ratio(col),
        top_word_fraction(col),
        duplicate_token_fraction(col),
    )


def rolling_fingerprints(col: Column, window: int = 8) -> Column:
    """Rolling hashes over word windows (winnowing-style): array of
    xxhash64 for every `window`-word span — input to plagiarism-style
    overlap detection."""
    words = F.split(F.trim(F.regexp_replace(F.lower(col), r"\s+", " ")), " ")
    idx = F.sequence(F.lit(0), F.greatest(F.size(words) - window, F.lit(0)))
    return F.transform(idx, lambda i: F.xxhash64(F.concat_ws(" ", F.slice(words, i + 1, window))))


def compression_ratio_udf():
    """Per-doc zlib compression ratio (compressed/raw bytes) — the
    classic redundancy signal (highly repetitive machine-generated text
    compresses far below natural language; Rae et al. 2021 use it as a
    quality filter). zlib level 6, deterministic across platforms for a
    given input, so the pytest gate recomputes it byte-identically.

    This is the one text signal that genuinely needs Python (no JVM
    expression computes DEFLATE): an Arrow-batched pandas UDF, stateless
    and map-side — the documented slow-path contract (SCALE.md Python
    boundaries). Returns NULL for empty text rather than a 0/0 ratio.
    """
    import zlib

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def ratio(s: pd.Series) -> pd.Series:
        def one(v):
            if v is None:
                return None
            b = v.encode("utf-8")
            if not b:
                return None
            return round(len(zlib.compress(b, 6)) / len(b), 6)

        return s.map(one)

    return ratio


def html_to_text(col: Column) -> Column:
    """HTML -> visible text, entirely JVM-side (regexp_replace chain, no
    UDF): drop script/style/head blocks and comments, turn block-level
    closes and <br> into newlines, strip remaining tags, decode the
    common entities, collapse whitespace. The boilerplate-light cousin of
    trafilatura for WARC/HTML ingestion — map-only, composes into the
    scan like any quality signal. Patterns stay in the Java/RE2-common
    subset so the DuckDB oracle runs them verbatim."""
    c = col
    c = F.regexp_replace(c, r"(?is)<script\b[^>]*>.*?</script>", " ")
    c = F.regexp_replace(c, r"(?is)<style\b[^>]*>.*?</style>", " ")
    c = F.regexp_replace(c, r"(?is)<head\b[^>]*>.*?</head>", " ")
    c = F.regexp_replace(c, r"(?s)<!--.*?-->", " ")
    c = F.regexp_replace(c, r"(?i)<(br|/p|/div|/h[1-6]|/li|/tr)\b[^>]*>", "\n")
    c = F.regexp_replace(c, r"(?s)<[^>]+>", " ")
    for ent, rep in [
        ("&nbsp;", " "), ("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"),
        ("&quot;", "\""), ("&#39;", "'"), ("&apos;", "'"),
    ]:
        c = F.replace(c, F.lit(ent), F.lit(rep))
    c = F.regexp_replace(c, r"[ \t]+", " ")
    c = F.regexp_replace(c, r" ?\n ?", "\n")
    c = F.regexp_replace(c, r"\n{2,}", "\n")
    # trim() strips only spaces — strip ALL edge whitespace incl newlines
    return F.regexp_replace(c, r"^\s+|\s+$", "")


def decode_text_safe(col: Column) -> Column:
    """Binary -> string that NEVER throws on malformed bytes: invalid
    UTF-8 sequences become U+FFFD instead of failing the task (plain
    `decode(..., 'UTF-8')` raises under ANSI mode — one bad crawl
    payload would sink a whole WARC batch). JVM-side, map-only."""
    return F.call_function("make_valid_utf8", col.cast("string"))
