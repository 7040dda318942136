"""OP-X-QUALTRAIN (r7): trained binary quality classifier — planted
ground-truth accuracy, model size bound, calibration contract, and the
single-exchange apply plan shape.  Cross-engine bit-identity is covered
by scripts/check_oracle.py (driver gate)."""

from __future__ import annotations

from pyspark.sql import functions as F

from agf_data_ingestion_spark.plans.quality_model import (
    _D,
    docs_quality_apply,
    docs_quality_train,
)
from tests.conftest import SF_SMOKE


def test_accuracy_on_planted_truth(spark):
    out = docs_quality_apply(spark, SF_SMOKE)
    agg = out.agg(
        F.count("*").alias("n"),
        F.sum(F.col("correct").cast("int")).alias("ok"),
        F.sum(F.col("true_hi").cast("int")).alias("hi"),
    ).first()
    assert agg.n > 50 and 0 < agg.hi < agg.n  # both classes planted
    assert agg.ok / agg.n >= 0.95


def test_model_is_broadcast_sized(spark):
    m = docs_quality_train(spark, SF_SMOKE)
    assert m.count() <= _D  # constant-bounded, never corpus-sized
    # junk bigrams must separate: strongly negative weights exist, and
    # language bigrams carry positive mass
    stats = m.agg(F.min("weight").alias("lo"), F.max("weight").alias("hi")).first()
    assert stats.lo < -1000 and stats.hi > 1000


def test_calibration_is_per_language_percent_rank(spark):
    rows = docs_quality_apply(spark, SF_SMOKE).collect()
    by_lang: dict = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append((r["score"], r["doc_id"], r["lang_pctile"]))
    for lang, vals in by_lang.items():
        vals.sort()
        n = len(vals)
        for rank, (_, _, pct) in enumerate(vals):
            want = rank / (n - 1) if n > 1 else 0.0
            assert abs(pct - want) < 1e-12, (lang, rank, pct, want)


def test_apply_plan_single_corpus_exchange(spark):
    # the langid r7 shape: model broadcast, one groupBy collapses each
    # doc map-side, ONE doc-keyed corpus exchange; the only other
    # exchanges are the constant-size model aggs and the 1-row-per-doc
    # calibration window — never a corpus join or corpus window
    df = docs_quality_apply(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    doc_ex = [
        l
        for l in plan.splitlines()
        if "Exchange hashpartitioning" in l and "doc_id" in l
    ]
    assert len(doc_ex) == 1, plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_pr_curve_invariants(spark):
    """r8: confusion counts are consistent (tp+fn / fp+tn constant),
    recall is monotone non-increasing in the cut, and the planted
    separation makes high cuts precise (>= 90% precision at the top
    quartile cut)."""
    from agf_data_ingestion_spark.plans.quality_model import (
        _PR_TILES,
        docs_quality_pr_curve,
    )

    rows = sorted(
        docs_quality_pr_curve(spark, SF_SMOKE).collect(),
        key=lambda r: r["cut_tile"],
    )
    assert len(rows) == _PR_TILES - 1
    tot_hi = rows[0]["tp"] + rows[0]["fn"]
    tot_lo = rows[0]["fp"] + rows[0]["tn"]
    prev_recall = 10**6 + 1
    for r in rows:
        assert r["tp"] + r["fn"] == tot_hi and r["fp"] + r["tn"] == tot_lo
        assert 0 <= r["precision_ppm"] <= 10**6
        assert r["recall_ppm"] <= prev_recall  # fewer kept, never more TP
        prev_recall = r["recall_ppm"]
    top_quartile = [r for r in rows if r["cut_tile"] == (_PR_TILES * 3) // 4]
    assert top_quartile and top_quartile[0]["precision_ppm"] >= 900_000
