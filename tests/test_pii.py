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


# --- catalog query (plans/pii.py, OP-X-PII): the oracle-checked variant ---

SF = "/root/testdata/sf0.001"


def test_catalog_planted_truth(spark):
    """Every planted email/phone/IPv4 is detected exactly once and the
    redaction removes all of them (corpus-level bit-identity vs DuckDB is
    pinned by the oracle gate at all three scale factors)."""
    from agf_data_ingestion_spark.plans.pii import docs_pii_redaction

    out = docs_pii_redaction(spark, SF).collect()
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert len(out) == n_docs
    assert all(r.all_detected for r in out)
    assert all(r.clean_after_redaction for r in out)
    # moduli 3/5/7 plant ~1/3, ~1/5, ~1/7 of docs — sanity-band the rates
    assert 0.15 * n_docs < sum(r.n_email for r in out) < 0.55 * n_docs
    assert 0.08 * n_docs < sum(r.n_phone for r in out) < 0.40 * n_docs
    assert 0.05 * n_docs < sum(r.n_ipv4 for r in out) < 0.30 * n_docs


def test_catalog_scrub_is_map_only(spark):
    """The corpus scrub must be scan-shaped: zero exchanges, zero Python
    eval nodes — at 100 TB this pass runs at read throughput."""
    from agf_data_ingestion_spark.plans.pii import docs_pii_redaction

    plan = (
        docs_pii_redaction(spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan
    assert "EvalPython" not in plan, plan


def test_stream_scrub_equals_batch_scrub(spark, tmp_path):
    """Batch-chopping must not change a single scrubbed row (the scrub is
    row-local; streaming/pii_stream.py)."""
    import os

    from agf_data_ingestion_spark.streaming.pii_stream import (
        scrub_transform,
        start_scrub_stream,
    )

    rows = [
        (1, "mail a@b.io now"),
        (2, "call 555-123-4567 or +1 (555) 123 4567"),
        (3, "host 10.0.0.1 clean text"),
        (4, "nothing personal here 2024"),
        (5, "both x@y.org and 192.168.0.9"),
    ]
    src = str(tmp_path / "src")
    spark.createDataFrame(rows, "doc_id long, text string").repartition(
        3
    ).write.parquet(src)

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = start_scrub_stream(
        stream, str(tmp_path / "out"), str(tmp_path / "ck"), available_now=True
    )
    q.awaitTermination()

    got = sorted(
        tuple(r)
        for r in spark.read.parquet(str(tmp_path / "out"))
        .drop("_batch_id")
        .collect()
    )
    want = sorted(
        tuple(r) for r in scrub_transform(spark.read.parquet(src)).collect()
    )
    assert got == want
    by_id = {r[0]: r for r in got}
    assert "<EMAIL>" in by_id[1][1] and by_id[1][2] == 1
    assert by_id[2][1].count("<PHONE>") == 2 and by_id[2][3] == 2
    assert "<IP>" in by_id[3][1] and by_id[3][4] == 1
    assert by_id[4][1] == "nothing personal here 2024"


def test_ipv6_scrub_full_and_compressed(spark):
    rows = _scrub(
        spark,
        [
            "node 2001:0db8:85a3:0000:0000:8a2e:0370:7334 up",
            "short fe80::1 local",
            "mid 2001:db8::8a2e:370:7334 ok",
            "prose be:ef is not an address",
        ],
    )
    assert rows[0][0] == "node <IP6> up"
    assert rows[1][0] == "short <IP6> local"
    assert rows[2][0] == "mid <IP6> ok"
    assert rows[3][0] == "prose be:ef is not an address"


def test_ipv6_counts_in_audit_struct(spark):
    from agf_data_ingestion_spark.functions.pii import pii_counts

    df = spark.createDataFrame(
        [("a fe80::1 b 2001:0db8:85a3:0000:0000:8a2e:0370:7334 c",)], "text string"
    )
    c = df.select(pii_counts("text").alias("c")).collect()[0]["c"]
    assert c["ips6"] == 2 and c["ips"] == 0 and c["emails"] == 0


def test_catalog_detector_rejects_fake_octets(spark):
    """VERDICT r5 finding #4: the catalog IPv4 pattern must not match
    999.999.999.999 — octet-range alternation, still RE2-safe."""
    from agf_data_ingestion_spark.plans.pii import _RE_IPV4
    from agf_data_ingestion_spark.functions.pii import count_matches

    df = spark.createDataFrame(
        [
            ("x 999.999.999.999 y", 0),
            # the embedded VALID quad "0.1.2.3" matches — inherent without
            # anchors (the Java∩RE2 subset excludes \b/lookaround); both
            # engines agree, and redaction favors recall anyway
            ("x 300.1.2.3 y", 1),
            ("x 255.255.255.255 y", 1),
            ("x 0.0.0.0 y", 1),
            ("x 192.168.0.1 y", 1),
        ],
        "text string, want int",
    )
    import pyspark.sql.functions as F

    bad = df.filter(count_matches("text", _RE_IPV4) != F.col("want")).collect()
    assert not bad, bad
