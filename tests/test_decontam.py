"""OP-X-DECONTAMSPAN: span-removal decontamination invariants.

Cross-engine bit-identity is covered by the oracle gate; these pin the
operator's CONTRACT on the real corpus: spans are disjoint per doc,
removal is surgical (never the whole doc on this corpus), the removed
word accounting is exact, and the segment-aware residual check is TRUE
everywhere — plus a hand-planted case where the flagged spans and the
cleaned text are known in closed form.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from agf_data_ingestion_spark.plans.training_data import (
    _BENCH_DOCS,
    _CONTAM_N,
    docs_decontam_spans,
)
from tests.conftest import SF_SMOKE


def test_decontam_invariants(spark):
    out = docs_decontam_spans(spark, SF_SMOKE)
    agg = out.agg(
        F.count("*").alias("n"),
        F.sum(F.when(~F.col("clean_after_removal"), 1).otherwise(0)).alias("dirty"),
        F.sum(F.when(F.col("words_removed") < F.col("n_words"), 1).otherwise(0)).alias(
            "partials"
        ),
        F.sum(
            F.when(
                (F.col("words_removed") < F.col("n_spans") * _CONTAM_N), 1
            ).otherwise(0)
        ).alias("under_min"),  # every span covers ≥ N words
        F.min("removed_ppm").alias("lo"),
        F.max("removed_ppm").alias("hi"),
    ).first()
    assert agg.n > 0, "planted corpus must produce contaminated docs"
    assert agg.dirty == 0  # residual check holds on every row
    # surgical on non-clone docs (full wipes happen only for exact
    # benchmark clones, which ARE wholly contaminated)
    assert agg.partials > 0
    assert agg.under_min == 0
    assert 0 < agg.lo <= agg.hi <= 1_000_000


def test_decontam_planted_closed_form(spark, tmp_path):
    """doc 100 shares one 4-gram island with bench doc 0 in the middle and
    one at the end; doc 101 is clean."""
    bench = "alpha beta gamma delta epsilon"
    # shares 'alpha beta gamma delta' (positions 3..6) and
    # 'beta gamma delta epsilon' (positions 9..12, end-anchored)
    dirty = "x1 x2 alpha beta gamma delta x3 x4 beta gamma delta epsilon"
    clean = "q1 q2 q3 q4 q5 q6"
    df = spark.createDataFrame(
        [(0, bench), (100, dirty), (101, clean)], "doc_id long, text string"
    )
    sf_dir = str(tmp_path / "mini")
    import os

    os.makedirs(sf_dir, exist_ok=True)
    df.toPandas().to_parquet(os.path.join(sf_dir, "documents.parquet"), index=False)
    rows = {r.doc_id: r for r in docs_decontam_spans(spark, sf_dir).collect()}
    assert set(rows) == {100}
    r = rows[100]
    assert r.n_spans == 2 and r.n_words == 12 and r.words_removed == 8
    assert r.clean_after_removal
    expected_clean = "x1 x2 x3 x4"
    got = (
        spark.range(1)
        .select(F.md5(F.lit(expected_clean)).alias("h"))
        .first()
        .h
    )
    assert r.cleaned_hash == got
    assert _BENCH_DOCS > 0  # planted ids (0 bench, 100/101 corpus) respect it
