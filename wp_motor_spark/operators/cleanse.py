"""Crawl-hygiene primitives: URL canonicalization and Luhn checks.

A large-scale crawl pipeline dedups pages by CANONICAL URL before it
ever fetches or hashes bodies, and screens text for accidentally
captured payment-card numbers (a standard PCI/privacy gate next to
PII redaction). Both are pure per-row expression pipelines — map-only,
whole-stage-codegen, no shuffle — so they cost one scan at any corpus
size.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# Tracking parameters every major pipeline strips (Google Analytics
# utm_*, Facebook fbclid, Google gclid, Microsoft msclkid).
_TRACKING_RE = r"^(utm_[a-z]+|fbclid|gclid|msclkid|ref)="


def canonicalize_url(url: Column, max_dot_depth: int = 4) -> Column:
    """RFC 3986-style canonical form:

    - scheme and host lowercase,
    - default ports dropped (:80 for http, :443 for https),
    - dot-segments resolved ('/./' and 'seg/../' — bounded to
      `max_dot_depth` nesting levels; a regexp pass per level keeps the
      whole thing codegen-able instead of a per-row loop),
    - fragment dropped,
    - tracking query params dropped (utm_*/fbclid/gclid/msclkid/ref),
    - surviving query params sorted byte-wise,
    - empty query dropped.
    """
    u = F.trim(url)
    # split off fragment
    u = F.regexp_replace(u, r"#.*$", "")
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    rest = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
    hostport = F.lower(F.regexp_extract(rest, r"^([^/?]*)", 1))
    host = F.when(
        (scheme == "http") & hostport.endswith(":80"),
        F.regexp_replace(hostport, r":80$", ""),
    ).when(
        (scheme == "https") & hostport.endswith(":443"),
        F.regexp_replace(hostport, r":443$", ""),
    ).otherwise(hostport)
    pathq = F.regexp_replace(rest, r"^[^/?]*", "")
    path = F.regexp_extract(pathq, r"^([^?]*)", 1)
    query = F.when(
        pathq.contains("?"), F.regexp_replace(pathq, r"^[^?]*\?", "")
    )
    # resolve dot-segments: '/./' first, then one 'seg/../' level per pass
    for _ in range(max_dot_depth):
        path = F.regexp_replace(path, r"/\.(?=/|$)", "")
        path = F.regexp_replace(path, r"/[^/]+/\.\.(?=/|$)", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    params = F.filter(
        F.split(F.coalesce(query, F.lit("")), "&"),
        lambda p: (p != "") & ~p.rlike(_TRACKING_RE),
    )
    qnorm = F.array_join(F.array_sort(params), "&")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(qnorm != "", F.concat(F.lit("?"), qnorm)).otherwise(F.lit("")),
    )


def luhn_valid(digits: Column) -> Column:
    """Luhn checksum (ISO/IEC 7812) over a digit string: from the
    rightmost digit, double every second digit, subtract 9 when the
    double exceeds 9, and require the total to be divisible by 10.
    Pure integer HOF arithmetic — one pass per candidate run."""
    rev = F.reverse(digits)
    total = F.aggregate(
        F.sequence(F.lit(1), F.length(rev)),
        F.lit(0),
        lambda acc, i: acc
        + F.when(
            i % 2 == 0,
            F.when(
                F.substring(rev, i, 1).cast("int") * 2 > 9,
                F.substring(rev, i, 1).cast("int") * 2 - 9,
            ).otherwise(F.substring(rev, i, 1).cast("int") * 2),
        ).otherwise(F.substring(rev, i, 1).cast("int")),
    )
    return (F.length(digits) > 0) & (total % 10 == 0)


def find_card_candidates(df, text_col: str = "text"):
    """Extract 13-19 digit runs (the ISO/IEC 7812 PAN length range) from
    a text column and Luhn-validate each: one exploded candidate row per
    run with the PCI-style masked form (first 6 + last 4 kept).

    Scale shape: regexp_extract_all + explode is map-only; the output is
    bounded by the number of digit runs, not corpus size."""
    # maximal digit runs, then a length filter — identical semantics to
    # lookaround-bounded {13,19} but expressible in RE2 too (the DuckDB
    # oracle has no lookbehind)
    runs = F.explode(
        F.filter(
            F.expr(f"regexp_extract_all({text_col}, '[0-9]+', 0)"),
            lambda r: (F.length(r) >= 13) & (F.length(r) <= 19),
        )
    )
    out = df.select("*", runs.alias("card"))
    masked = F.concat(
        F.substring("card", 1, 6),
        F.repeat(F.lit("*"), F.length("card") - 10),
        F.substring(F.col("card"), F.length("card") - 3, 4),
    )
    return out.select(
        "*",
        luhn_valid(F.col("card")).alias("luhn_valid"),
        masked.alias("masked"),
    )


# --------------------------------------------------------------- C4 cleaning


def c4_clean(df, text_col: str = "text", min_words: int = 5, min_lines: int = 3):
    """C4 cleaning heuristics (Raffel et al. 2020, "Exploring the Limits
    of Transfer Learning", §2.2 — the public C4 recipe):

    line level — keep a line only if it ends in a terminal punctuation
    mark ('.', '!', '?', '"'), has at least ``min_words`` words, and does
    not mention 'javascript';
    document level — drop the page when fewer than ``min_lines`` lines
    survive, or the page contains 'lorem ipsum' or a curly brace '{'.

    Returns the input plus `kept_lines` (array), `n_lines_kept`,
    `cleaned` (retained lines re-joined) and `c4_kept` (doc verdict).

    Scale shape: MAP-ONLY — split + HOF filter + doc-level predicates in
    whole-stage codegen; no shuffle, no UDF. At 100 TB this runs at scan
    speed next to the other per-doc quality signals."""
    t = F.col(text_col)
    lines = F.filter(F.split(t, "\n"), lambda s: F.trim(s) != "")
    keep = F.filter(
        lines,
        lambda s: F.trim(s).rlike(r'[.!?"]$')
        & (F.size(F.split(F.trim(s), r"\s+")) >= min_words)
        & ~F.lower(s).contains("javascript"),
    )
    low = F.lower(t)
    doc_ok = (
        (F.size(keep) >= min_lines)
        & ~low.contains("lorem ipsum")
        & ~low.contains("{")
    )
    return df.select(
        "*",
        keep.alias("kept_lines"),
        F.size(keep).alias("n_lines_kept"),
        F.array_join(keep, "\n").alias("cleaned"),
        doc_ok.alias("c4_kept"),
    )


def host_suffixes(host: Column, max_labels: int = 16) -> Column:
    """All dot-suffix candidates of a host name ('a.b.example.com' ->
    ['a.b.example.com','b.example.com','example.com','com']) — the probe
    set for registrable-domain blocklist joins (UT1-style lists block a
    domain AND every subdomain). The fan-out is capped at ``max_labels``
    suffixes per row; when a host has more labels, the SHORTEST
    ``max_labels`` suffixes are kept. The default cap of 16 exceeds any
    real-world host depth (DNS's 255-octet name bound allows <=127
    labels, but public hosts run <=10), so 'domain AND every subdomain'
    holds in practice — including exact deep-host blocklist entries,
    which a tighter cap would silently stop matching. Callers with
    hostile inputs deeper than the cap must truncate their blocklist
    entries to the same ``max_labels`` so probe set and list agree."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    return F.transform(
        F.sequence(F.greatest(F.lit(0), n - F.lit(max_labels)), n - 1),
        lambda i: F.array_join(F.slice(labels, i + 1, n), "."),
    )


def blocklist_filter(df, blocklist_df, host_col: str = "host"):
    """Domain-blocklist gating (the crawl-pipeline step in front of
    fetch/dedup; UT1/Blacklists-style lists): a document is blocked when
    ANY dot-suffix of its host appears in the blocklist.

    Scale shape: the suffix candidates are a bounded per-row array (<=
    label count); the membership test is a BROADCAST semi-join of the
    exploded suffixes against the blocklist (real lists are ~1M rows —
    broadcastable), then a bounded regroup by the row id. No all-pairs,
    no skew: the join key is the suffix, and the explode fan-out is
    bounded by max_labels."""
    id_col = df.columns[0]
    probe = df.select(
        id_col, F.explode(host_suffixes(F.col(host_col))).alias("__sfx")
    )
    hit = (
        probe.join(
            F.broadcast(
                blocklist_df.withColumnRenamed(blocklist_df.columns[0], "__sfx")
            ),
            "__sfx",
            "left_semi",
        )
        .select(id_col)
        .distinct()
        .withColumn("blocked", F.lit(True))
    )
    return df.join(hit, id_col, "left").withColumn(
        "blocked", F.coalesce(F.col("blocked"), F.lit(False))
    )
