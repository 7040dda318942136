"""PII scrub tests (functions/pii.py): redaction, counting, ordering."""

from __future__ import annotations

from pyspark.sql import functions as F

from agf_data_ingestion_spark.functions.pii import pii_counts, scrub_pii


def _scrub(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    return [
        (r["out"], r["c"]["emails"], r["c"]["phones"], r["c"]["ips"])
        for r in df.select(
            scrub_pii("text").alias("out"), pii_counts("text").alias("c")
        ).collect()
    ]


def test_email_redacted_and_counted(spark):
    out, e, p, i = _scrub(spark, ["contact john.doe+x@example.co.uk now"])[0]
    assert out == "contact <EMAIL> now"
    assert (e, p, i) == (1, 0, 0)


def test_phone_variants(spark):
    rows = _scrub(
        spark,
        ["call 555-123-4567", "call +1 (555) 123 4567", "call 5551234567"],
    )
    for out, e, p, i in rows:
        assert "<PHONE>" in out, out
        assert p == 1


def test_ipv4_redacted(spark):
    out, e, p, i = _scrub(spark, ["host 192.168.0.1 responded"])[0]
    assert out == "host <IP> responded"
    assert i == 1


def test_email_digits_not_double_counted_as_phone(spark):
    # the email is scrubbed before phone counting — its digit runs must not
    # produce phantom phone matches
    out, e, p, i = _scrub(spark, ["mail 5551234567890@example.com ok"])[0]
    assert out == "mail <EMAIL> ok"
    assert (e, p) == (1, 0)


def test_plain_text_untouched(spark):
    text = "the quick brown fox jumped in 2024 over 42 fences"
    out, e, p, i = _scrub(spark, [text])[0]
    assert out == text
    assert (e, p, i) == (0, 0, 0)


def test_multiple_hits_per_doc(spark):
    out, e, p, i = _scrub(
        spark, ["a@b.io and c@d.io from 10.0.0.1 and 10.0.0.2"]
    )[0]
    assert out.count("<EMAIL>") == 2 and out.count("<IP>") == 2
    assert (e, i) == (2, 2)


def test_scrub_is_codegen_not_udf(spark):
    """The scrub must stay JVM-side: no BatchEvalPython/ArrowEvalPython in
    the plan (training-corpus scrubbing runs over every byte of 100 TB)."""
    df = spark.range(10).select(
        F.concat(F.lit("x"), F.col("id").cast("string")).alias("text")
    )
    plan = df.select(scrub_pii("text"))._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
