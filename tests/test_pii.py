"""functions/pii.py — detector precision/recall edges and redaction
byte-exactness that the aggregate certificate can't isolate:
boundary behavior (15/17-digit runs, digits glued to letters), Luhn
arithmetic on known-good numbers, placeholder non-interference, and
non-BMP neighborhoods."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from goconnect_spark.functions.pii import (
    luhn_valid,
    pii_counts,
    redact_pii,
    with_pii_scrub,
)


def _scrub_one(spark, text):
    df = spark.createDataFrame([(text,)], "t string")
    row = with_pii_scrub(df, "t", out_col="red").collect()[0]
    return row


@pytest.mark.parametrize(
    "cc,ok",
    [
        ("4111111111111111", True),  # classic Visa test number
        ("4111111111111112", False),
        ("5500005555555559", True),
        ("5500005555555550", False),
        ("0000000000000000", True),  # sum 0 is a valid checksum
    ],
)
def test_luhn_known_numbers(spark, cc, ok):
    got = spark.range(1).select(luhn_valid(F.lit(cc)).alias("v")).collect()[0].v
    assert got is ok


def test_counts_and_redaction_multi(spark):
    t = (
        "pay 4111111111111111 or 4111111111111112 call 312-555-0142 "
        "ip 10.1.2.3 mail a.b+x@ex4.com end"
    )
    r = _scrub_one(spark, t)
    assert (r.n_emails, r.n_phones, r.n_ipv4, r.n_cc_candidates, r.n_cc_valid) == (
        1, 1, 1, 2, 1,
    )
    assert r.red == "pay [CC] or [CC] call [PHONE] ip [IP] mail [EMAIL] end"


def test_digit_run_boundaries(spark):
    # 15 and 17 digit runs are NOT card candidates; digits glued to
    # letters break \b so nothing matches inside identifiers
    r = _scrub_one(spark, "id 411111111111111 x 41111111111111111 ref4111111111111111")
    assert r.n_cc_candidates == 0
    assert r.red.endswith("ref4111111111111111")


def test_phone_and_ip_boundaries(spark):
    r = _scrub_one(spark, "v1.2.3.4000 10.1.2.3.4 555-555-55555 1-555-555-5555")
    # 10.1.2.3.4: the regex takes the leftmost 4-group match; the
    # trailing .4 survives (both engines agree — RE2 and Java regex
    # are leftmost here). 4000 breaks the last octet's \b.
    assert r.n_phones == 1  # the 555-555-5555 tail of 1-555-555-5555
    assert r.n_ipv4 == 1


def test_empty_and_null_text(spark):
    df = spark.createDataFrame([("",), (None,)], "t string")
    rows = with_pii_scrub(df, "t", out_col="red").collect()
    by = {r.t: r for r in rows}
    assert by[""].n_emails == 0 and by[""].red == ""
    assert by[None].red is None


def test_non_bmp_neighbors(spark):
    # astral chars adjacent to PII must not shift match offsets
    r = _scrub_one(spark, "😀 4111111111111111 𝄞 a@b.io ü")
    assert r.n_cc_candidates == 1 and r.n_cc_valid == 1 and r.n_emails == 1
    assert r.red == "😀 [CC] 𝄞 [EMAIL] ü"


def test_placeholders_do_not_cascade(spark):
    # a placeholder must never create a new match for a later pattern
    out = spark.createDataFrame([("a@b.io 4111111111111111",)], "t string")
    red = out.select(redact_pii(F.col("t")).alias("r")).collect()[0].r
    assert red == "[EMAIL] [CC]"
    again = spark.createDataFrame([(red,)], "t string")
    c = again.select(*[v.alias(k) for k, v in pii_counts(F.col("t")).items()]).collect()[0]
    assert (c.n_emails, c.n_cc_candidates) == (0, 0)


def test_iban_known_valid_and_invalid(spark):
    from goconnect_spark.functions.pii import iban_valid

    rows = [
        ("DE44500105175407324931", True),   # ECB's canonical example
        ("DE45500105175407324931", False),  # check digits off by one
        ("DE00000000000000000000", False),
    ]
    for iban, ok in rows:
        got = spark.range(1).select(
            iban_valid(F.lit(iban)).alias("v")
        ).collect()[0].v
        assert got is ok, iban


def test_iban_detection_boundaries(spark):
    r = _scrub_one(
        spark,
        "pay to DE44500105175407324931 not DE445001051754073249311 "
        "nor XDE44500105175407324931",
    )
    # 21-digit run fails the fixed length; letter-glued prefix breaks \b
    assert r.n_ibans == 1 and r.n_iban_valid == 1
    assert "[IBAN]" in r.red and "DE445001051754073249311" in r.red


def test_iban_redaction_order_safe(spark):
    # the 20-digit run inside an IBAN must never partial-match the
    # 16-digit card pattern (no word boundary inside the run)
    r = _scrub_one(spark, "DE44500105175407324931 and 4111111111111111")
    assert r.n_cc_candidates == 1 and r.n_ibans == 1
    assert r.red == "[IBAN] and [CC]"
