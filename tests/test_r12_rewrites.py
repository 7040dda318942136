"""Round-12 optimization rewrites: the codegen gram forms must be
BIT-IDENTICAL to the expressions they replaced.

Each rewrite swapped an O(len²) ``substring(nt, i, k)`` per exploded
position, or an interpreted ``transform(idx, λ)`` gram fold, for a
per-row codegen expression.  These tests replay the OLD expression and
the NEW production path over planted edge-case documents (empty text,
below/at/above the gram width, repeated grams, non-ASCII BMP chars,
multi-space runs) and assert equal row sets — so a Spark upgrade or a
testdata regeneration that breaks the equivalence fails loudly here,
not as an oracle hash mismatch."""

from __future__ import annotations

from pyspark.sql import functions as F

EDGE_TEXTS = [
    (0, ""),
    (1, "a"),
    (2, "abcdefg"),          # one char short of the 8-gram width
    (3, "abcdefgh"),         # exactly the gram width
    (4, "abcdefghi"),        # one past
    (5, "aaaaaaaaaaaaaaaa"),  # heavy gram repetition
    (6, "the quick brown fox jumps over the lazy dog"),
    (7, "café touché naïve résumé words here ok"),
    (8, "one  two   three    four spaced"),
    (9, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12"),
    (10, None),              # r13 (ADVICE r12): NULL text → g must be NULL
]


def _docs(spark):
    return spark.createDataFrame(EDGE_TEXTS, "doc_id long, text string")


def test_fingerprint_chargram_equiv(spark):
    """split+get+concat_ws 8-gram ≡ substring(nt, i, 8) per position."""
    d = _docs(spark)
    norm = F.lower(F.trim(F.regexp_replace("text", "\\s+", " ")))
    base = d.select("doc_id", norm.alias("nt"), F.split(norm, "").alias("cs"))
    old = base.select(
        "doc_id",
        "nt",
        F.explode(
            F.sequence(F.lit(1), F.greatest(F.length("nt") - 7, F.lit(1)))
        ).alias("i"),
    ).select("doc_id", "i", F.expr("substring(nt, i, 8)").alias("g"))
    new = base.select(
        "doc_id",
        "cs",
        F.explode(
            F.sequence(F.lit(1), F.greatest(F.size("cs") - 7, F.lit(1)))
        ).alias("i"),
    ).select(
        "doc_id",
        "i",
        # the production NULL gate (r13, ADVICE r12): NULL text must give
        # g = NULL like substring(NULL, i, 8), not concat_ws's ''
        F.when(F.col("cs").isNull(), F.lit(None).cast("string"))
        .otherwise(
            F.concat_ws(
                "", *[F.get("cs", F.col("i") + k - 2) for k in range(1, 9)]
            )
        )
        .alias("g"),
    )
    old_rows = sorted(old.collect(), key=lambda r: (r[0], r[1], r[2] or ""))
    new_rows = sorted(new.collect(), key=lambda r: (r[0], r[1], r[2] or ""))
    assert old_rows == new_rows
    # the NULL-text row must be present and carry a NULL gram in BOTH
    nulls = [r for r in new_rows if r["doc_id"] == 10]
    assert nulls and all(r["g"] is None for r in nulls)
    assert [r for r in old_rows if r["doc_id"] == 10] == nulls


def _old_gram_hashes(d, n):
    idx = F.sequence(F.lit(1), F.size("w") - (n - 1))
    gram = lambda i: F.array_join(F.slice("w", i, n), " ")  # noqa: E731
    return (
        d.filter(F.size("w") >= n)
        .select(
            "doc_id",
            F.explode(
                F.transform(idx, lambda i: F.substring(F.md5(gram(i)), 1, 16))
            ).alias("sh"),
        )
    )


def _new_gram_hashes(d, n):
    idx = F.sequence(F.lit(1), F.size("w") - (n - 1))
    return (
        d.filter(F.size("w") >= n)
        .select("doc_id", "w", F.explode(idx).alias("i"))
        .select(
            "doc_id",
            F.substring(
                F.md5(F.expr(f"array_join(slice(w, i, {n}), ' ')")), 1, 16
            ).alias("sh"),
        )
    )


def test_wordgram_hash_equiv(spark):
    """explode-then-hash word grams ≡ the transform-lambda fold, at the
    widths the production sites use (contam/span/winnowing: 3..8)."""
    d = _docs(spark).select("doc_id", F.split("text", " ").alias("w"))
    for n in (3, 4, 6):  # _WIN_K, _CONTAM_N, _SPAN_N
        old = _old_gram_hashes(d, n)
        new = _new_gram_hashes(d, n)
        assert sorted(old.collect()) == sorted(new.collect()), f"width {n}"


def test_fingerprint_catalog_smoke(spark):
    """The production docs_fingerprint still matches its DuckDB oracle
    shape on the smoke corpus (full oracle equality is the driver's
    check; here: non-empty, distinct doc_ids, 4-hash sketches)."""
    import os

    from agf_data_ingestion_spark.plans.text import docs_fingerprint

    sf = os.environ.get("AGF_TEST_SF_DIR", "/root/testdata/sf0.001")
    out = docs_fingerprint(spark, sf).collect()
    assert len(out) > 0
    assert len({r["doc_id"] for r in out}) == len(out)
    for r in out[:20]:
        parts = r["sketch"].split("|")
        assert 1 <= len(parts) <= 4
        assert all(len(p) == 32 for p in parts)
