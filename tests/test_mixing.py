"""OP-X-DOREMI / OP-X-OVERLAP (plans/mixing.py): multiplicative-weights
invariants, overlap-matrix consistency, and the scale plan shapes.
Cross-engine bit-identity is covered by scripts/check_oracle.py."""

from __future__ import annotations

from pyspark.sql import functions as F

from agf_data_ingestion_spark.plans.mixing import (
    _PPM,
    docs_domain_reweight,
    docs_source_overlap,
)
from tests.conftest import SF_SMOKE


def test_reweight_invariants(spark):
    rows = docs_domain_reweight(spark, SF_SMOKE).collect()
    k = len(rows)
    assert k >= 2
    total = sum(r["weight_ppm"] for r in rows)
    # renormalized to K·1e6 up to one truncation unit per domain
    assert k * _PPM - k <= total <= k * _PPM
    by_excess = sorted(rows, key=lambda r: r["excess_ppm"])
    # Group-DRO direction: the hardest domain gains weight, the easiest
    # loses it (excess above/below the mixture average)
    assert by_excess[-1]["weight_ppm"] > _PPM and by_excess[-1]["upweighted"]
    assert by_excess[0]["weight_ppm"] < _PPM and not by_excess[0]["upweighted"]
    # weights are monotone in excess for the static-signal iteration
    ws = [r["weight_ppm"] for r in by_excess]
    assert ws == sorted(ws)


def test_reweight_touches_corpus_once(spark):
    plan = (
        docs_domain_reweight(spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Scan parquet") == 1, plan  # rounds are K-row only


def test_overlap_matrix_consistency(spark):
    rows = docs_source_overlap(spark, SF_SMOKE).collect()
    assert rows
    srcs = {r["src_a"] for r in rows} | {r["src_b"] for r in rows}
    k = len(srcs)
    assert len(rows) <= k * (k - 1) // 2
    for r in rows:
        assert r["src_a"] < r["src_b"]
        assert 0 < r["inter"] <= min(r["na"], r["nb"])
        assert r["jaccard_ppm"] <= min(r["contain_a_ppm"], r["contain_b_ppm"])
        assert r["contain_a_ppm"] <= _PPM and r["contain_b_ppm"] <= _PPM


def test_overlap_gram_join_never_broadcasts_corpus(spark):
    plan = (
        docs_source_overlap(spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the gram self-join is corpus-sized on BOTH sides: shuffle-hash
    # pinned; only the K-row size table broadcasts
    assert "ShuffledHashJoin" in plan, plan
    for line in plan.splitlines():
        if "BroadcastHashJoin" in line:
            assert "src_" in line or "source" in line, line


def test_overlap_shares_one_gram_exchange_at_runtime(spark):
    # the explicit gram repartition lets all four consumers (join sides +
    # two size joins) reuse ONE executed shuffle — AQE decides at runtime,
    # so the pin inspects the final adaptive plan after an action
    df = docs_source_overlap(spark, SF_SMOKE)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ReusedExchange") >= 3, plan
