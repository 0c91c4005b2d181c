"""PII scrubbing rules: coverage of the common real-world forms and
the email-before-IP ordering invariant."""

from __future__ import annotations

import pyspark.sql.functions as F

from hands_on_trino_iceberg_superset_spark.operators.scrub import (
    redact,
    redact_pii,
)


def _one(spark, text: str) -> str:
    return (
        spark.createDataFrame([(text,)], "t string")
        .select(redact(F.col("t")).alias("r"))
        .collect()[0].r
    )


def test_email_with_ip_host_redacts_whole_address(spark) -> None:
    assert _one(spark, "contact user@10.0.0.1 now") == \
        "contact <EMAIL> now"
    assert _one(spark, "mail a.b@ex.org x") == "mail <EMAIL> x"


def test_phone_forms(spark) -> None:
    assert _one(spark, "call 555-867-5309 now") == "call <PHONE> now"
    assert _one(spark, "call (212) 555-0123") == "call <PHONE>"
    assert _one(spark, "call +1 415 555 2671") == "call <PHONE>"
    assert _one(spark, "tel +1-555-010-0042") == "tel <PHONE>"


def test_ip_and_counts(spark) -> None:
    df = spark.createDataFrame(
        [("a@b.co and 10.0.0.1 and 555-010-9999",)], "text string"
    )
    row = redact_pii(df).collect()[0]
    assert row.n_email == 1 and row.n_ip == 1 and row.n_phone == 1
    assert row.text_redacted == "<EMAIL> and <IP> and <PHONE>"


def test_plain_text_untouched(spark) -> None:
    s = "the quick brown fox 123 456"
    assert _one(spark, s) == s
