"""PII detection/redaction unit tests (operators/pii.py)."""

from pyspark.sql import functions as F

from wp_motor_spark.operators import pii


def _one(spark, s, expr_fn):
    df = spark.createDataFrame([(s,)], ["t"])
    return df.select(expr_fn(F.col("t")).alias("o")).collect()[0]["o"]


def test_redact_all_categories(spark):
    s = (
        "mail a.b+c@ex-ample.org phone 13912345678 host 192.168.0.1 "
        "id 110101199003078515 done"
    )
    out = _one(spark, s, pii.redact)
    assert out == "mail [EMAIL] phone [PHONE] host [IP] id [ID] done"


def test_counts_and_ordering(spark):
    # the email local part contains an 11-digit phone-shaped run: it must
    # be consumed by the email match, not double-counted as a phone
    s = "x13912345678@example.com and 13900000000"
    row = _one(spark, s, pii.pii_counts)
    assert row["email"] == 1
    assert row["phone"] == 1
    out = _one(spark, s, pii.redact)
    assert out == "[EMAIL] and [PHONE]"


def test_id_card_not_phone(spark):
    # 18-digit id must redact as [ID], never leave an 11-digit tail for
    # the phone pattern
    out = _one(spark, "n 110101199003078515 n", pii.redact)
    assert out == "n [ID] n"


def test_boundaries(spark):
    # digit runs embedded in longer numbers are NOT phones/ids
    s = "big 139123456789012345678901 num"
    row = _one(spark, s, pii.pii_counts)
    assert row["phone"] == 0 and row["id_card"] == 0
    assert _one(spark, s, pii.redact) == s


def test_no_pii_passthrough_and_has_pii(spark):
    s = "just some plain words 42 and 1.5 ratios"
    assert _one(spark, s, pii.redact) == s
    assert _one(spark, s, pii.has_pii) is False
    assert _one(spark, "a@b.co", pii.has_pii) is True


def test_ipv4_octet_bounds(spark):
    row = _one(spark, "ok 255.255.255.255 bad 256.1.2.3", pii.pii_counts)
    assert row["ipv4"] == 1


def test_gopher_flags_and_repetition(spark):
    from wp_motor_spark.operators import text as T

    good = " ".join(f"the quick brown w{2 * i} x{2 * i + 1}" for i in range(12))  # 60 words
    spam = " ".join(["buy"] * 60)
    short = "too short"
    df = spark.createDataFrame([(1, good), (2, spam), (3, short)], ["i", "t"])
    rows = {
        r["i"]: r
        for r in df.select(
            "i",
            T.gopher_quality_flags(F.col("t")).alias("g"),
            F.round(T.top_word_fraction(F.col("t")), 4).alias("topf"),
            F.round(T.duplicate_token_fraction(F.col("t")), 4).alias("dupf"),
        ).collect()
    }
    assert rows[1]["g"]["keep"] is True
    assert rows[2]["g"]["keep"] is False and rows[2]["g"]["ok_top_word"] is False
    assert rows[2]["topf"] == 1.0 and rows[2]["dupf"] == round(1 - 1 / 60, 4)
    assert rows[3]["g"]["ok_n_words"] is False
    # good: 'the' appears 12x/60 = 0.2 exactly -> ok_top_word still True
    assert rows[1]["topf"] == 0.2 and rows[1]["g"]["ok_top_word"] is True
