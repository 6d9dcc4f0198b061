"""PII detection / redaction for training-data pipelines.

Regex-based scrubbing of emails, IPv4 addresses, CN mobile numbers and
GB 11643 id-card numbers — the same value shapes the WPL field parsers
recognize (compiler.py email/ip/mobile_phone/id_card), reused here as
corpus-curation operators. Pure JVM `regexp_count`/`regexp_replace`
chains: map-only, whole-stage-codegen, no shuffle, so redaction cost is
one linear scan regardless of corpus size.

Patterns deliberately avoid lookaround/backreferences so the identical
pattern string runs on both java.util.regex (Spark) and RE2 (DuckDB
oracle) with the same semantics.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

_OCTET = "(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])"

# Ordered: longer/more-specific shapes first so a redacted id-card never
# leaves an 11-digit tail for the phone pattern to half-match.
PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "id_card": r"\b[0-9]{17}[0-9Xx]\b",
    "phone": r"\b1[3-9][0-9]{9}\b",
    "ipv4": rf"\b{_OCTET}(\.{_OCTET}){{3}}\b",
}

PLACEHOLDERS: dict[str, str] = {
    "email": "[EMAIL]",
    "id_card": "[ID]",
    "phone": "[PHONE]",
    "ipv4": "[IP]",
}


def pii_counts(col: Column, kinds: list[str] | None = None) -> Column:
    """struct<email:int, id_card:int, phone:int, ipv4:int> match counts.

    Counts overlap-free occurrences per category on the RAW text (before
    any redaction), so e.g. the digits inside an email local part are
    still part of the email match, not a phone false positive."""
    kinds = kinds or list(PATTERNS)
    return F.struct(
        *[F.regexp_count(col, F.lit(PATTERNS[k])).alias(k) for k in kinds]
    )


def redact(col: Column, kinds: list[str] | None = None) -> Column:
    """Replace every PII occurrence with its typed placeholder.

    Application order is PATTERNS order (specific -> general): email
    first (its local part may contain digit runs), then id_card (18
    digits) before phone (11 digits) before ipv4. Each replacement is a
    global regexp_replace — one codegen'd pass per category."""
    kinds = kinds or list(PATTERNS)
    out = col
    for k in PATTERNS:
        if k in kinds:
            out = F.regexp_replace(out, F.lit(PATTERNS[k]), F.lit(PLACEHOLDERS[k]))
    return out


def has_pii(col: Column, kinds: list[str] | None = None) -> Column:
    """Boolean: any category matches (cheap pre-filter before redact —
    lets the common no-PII row skip the replace chain via a CASE)."""
    kinds = kinds or list(PATTERNS)
    pred: Column | None = None
    for k in kinds:
        m = col.rlike(PATTERNS[k])
        pred = m if pred is None else (pred | m)
    return pred if pred is not None else F.lit(False)
