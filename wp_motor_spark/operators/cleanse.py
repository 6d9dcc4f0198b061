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
