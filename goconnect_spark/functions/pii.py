"""PII detection and redaction — pure JVM column expressions.

An LLM training-data pipeline scrubs personally identifiable
information before anything else touches the corpus. The four
detector classes here (emails, NANP-style phone numbers, IPv4
addresses, 16-digit payment-card numbers with a Luhn validity
check) cover the regex-shaped families a first-pass scrubber
handles; the point of the module is the SHAPE, not the pattern
list — every detector is a `pyspark.sql.functions` column
expression (regexp_extract_all / regexp_replace / aggregate), so
the whole scrub runs inside whole-stage codegen with zero Python
boundary, zero shuffles, and per-row cost independent of corpus
size: the embarrassingly-parallel map stage that scales to 100 TB
by adding executors.

The Luhn check matters for precision at scale: 16 consecutive
digits appear constantly in logs/IDs, and a checksum gate drops
~90% of those false positives. It is expressed as a higher-order
`aggregate` over `sequence(1,16)` — integer arithmetic on
substrings, fully codegen'd, no UDF.

Patterns are passed through `F.lit` / the function API (never
interpolated into SQL text), so there is no escaped-string
dialect to get wrong. They deliberately use explicit classes
(`[0-9]`, `[.]`) that mean the same thing to Java regex and RE2 —
the DuckDB oracle runs the SAME patterns as a genuinely
independent second implementation.

Reference parity: the reference (a stream connector) has no PII
layer; this extends its Map surface (pipeline.go:60-75) the way a
goconnect user would have to write by hand in a Processor.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

# Explicit char classes only — identical semantics in Java regex
# (Spark) and RE2 (DuckDB); no \d, no escaped-literal minefield.
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}"
PHONE_RE = "\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b"
IPV4_RE = "\\b(?:[0-9]{1,3}[.]){3}[0-9]{1,3}\\b"
CC_RE = "\\b[0-9]{16}\\b"
# German-format IBAN (DE + 2 check digits + 18 BBAN digits): the
# fixed-length country form keeps the MOD-97-10 rearrangement a
# constant 24-digit layout, which is what lets both engines validate
# with one precomputed power table instead of big-int arithmetic.
IBAN_RE = "\\bDE[0-9]{20}\\b"

# 10^p mod 97 for p = 0..23 — the ISO 7064 MOD-97-10 checksum of a
# 24-digit number is sum(digit_i * POW97[len-i]) mod 97; the sum
# tops out under 21k, so the whole validation is small-int math.
POW97 = [pow(10, p, 97) for p in range(24)]

# Redaction placeholders: no digits / '@' / '.', so one detector's
# replacement can never create another detector's match.
PLACEHOLDERS = {
    EMAIL_RE: "[EMAIL]",
    PHONE_RE: "[PHONE]",
    IPV4_RE: "[IP]",
    IBAN_RE: "[IBAN]",
    CC_RE: "[CC]",
}


def luhn_valid(cc: Column) -> Column:
    """Luhn checksum over a 16-digit string column (payment-card
    validity). Fixed length means the doubled positions are the odd
    1-based left indexes; digits come from substring, the sum from a
    codegen'd higher-order aggregate — no UDF."""

    def digit(i):
        return F.substring(cc, i, F.lit(1)).cast("int")

    def contrib(acc, i):
        doubled = digit(i) * 2
        return acc + F.when(
            i % 2 == 1, F.when(doubled > 9, doubled - 9).otherwise(doubled)
        ).otherwise(digit(i))

    total = F.aggregate(F.sequence(F.lit(1), F.lit(16)), F.lit(0), contrib)
    return total % 10 == 0


def mod97_24(digits24: Column) -> Column:
    """ISO 7064 MOD-97-10 remainder of a 24-digit string column via
    the precomputed power table — integer column arithmetic only, no
    big-number type needed (the weighted digit sum stays < 21k)."""
    pow_arr = F.array(*[F.lit(p) for p in POW97])

    def term(acc, i):
        d = F.substring(digits24, i, F.lit(1)).cast("int")
        return acc + d * F.element_at(pow_arr, F.lit(25) - i)

    total = F.aggregate(F.sequence(F.lit(1), F.lit(24)), F.lit(0), term)
    return total % 97


def iban_valid(iban: Column) -> Column:
    """MOD-97-10 validity of a German-format IBAN (DE + 22): move the
    first four chars to the end ('DE' maps to '1314'), remainder of
    the resulting 24-digit number must be 1."""
    rearranged = F.concat(
        F.substring(iban, 5, F.lit(18)),
        F.lit("1314"),
        F.substring(iban, 3, F.lit(2)),
    )
    return mod97_24(rearranged) == 1


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-row detector counts: n_emails / n_phones / n_ipv4 /
    n_cc_candidates (16-digit runs) / n_cc_valid (Luhn-passing
    subset). All five are column expressions over ONE pass of each
    pattern."""
    ccs = F.regexp_extract_all(text, F.lit(CC_RE), F.lit(0))
    ibans = F.regexp_extract_all(text, F.lit(IBAN_RE), F.lit(0))
    return {
        "n_emails": F.size(F.regexp_extract_all(text, F.lit(EMAIL_RE), F.lit(0))),
        "n_phones": F.size(F.regexp_extract_all(text, F.lit(PHONE_RE), F.lit(0))),
        "n_ipv4": F.size(F.regexp_extract_all(text, F.lit(IPV4_RE), F.lit(0))),
        "n_cc_candidates": F.size(ccs),
        "n_cc_valid": F.size(F.filter(ccs, luhn_valid)),
        "n_ibans": F.size(ibans),
        "n_iban_valid": F.size(F.filter(ibans, iban_valid)),
    }


def redact_pii(text: Column) -> Column:
    """Replace every detector match with its placeholder. Candidate
    16-digit runs are redacted whether or not they pass Luhn —
    over-redaction is the safe default for a training corpus; the
    validity count (pii_counts) is the metrics signal. Order cannot
    matter: the four patterns are mutually non-overlapping and the
    placeholders contain no digits or '@'."""
    out = text
    for pat, repl in PLACEHOLDERS.items():
        out = F.regexp_replace(out, pat, repl)
    return out


def with_pii_scrub(df: DataFrame, text_col: str, out_col: str = "text_redacted") -> DataFrame:
    """Attach the five detector-count columns and the redacted text.
    One map stage, no shuffle, no Python boundary."""
    text = F.col(text_col)
    cols = pii_counts(text)
    out = df
    for name, col in cols.items():
        out = out.withColumn(name, col)
    return out.withColumn(out_col, redact_pii(text))
