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


def test_overlap_sketch_accuracy_within_4_sigma(spark):
    """The OPH sketch's Jaccard and union estimates agree with the exact
    matrix within >=4 sigma (binomial over S bins for the matched-minima
    Jaccard fraction; ~union/sqrt(S) for the summed per-bin union
    estimator) — the accuracy half of the sketch twin; cross-engine
    bit-identity is the oracle's job."""
    from agf_data_ingestion_spark.plans.mixing import (
        _OVS_BINS,
        docs_source_overlap_sketch,
    )

    exact = {
        (r["src_a"], r["src_b"]): r
        for r in docs_source_overlap(spark, SF_SMOKE).collect()
    }
    est_rows = docs_source_overlap_sketch(spark, SF_SMOKE).collect()
    assert est_rows
    checked = 0
    for r in est_rows:
        e = exact.get((r["src_a"], r["src_b"]))
        s_eff = r["n_union_bins"]
        assert s_eff <= _OVS_BINS
        if e is None:
            # a zero-intersection pair: matched minima are hash
            # collisions only — essentially impossible in 60 bits
            assert r["n_match"] == 0
            continue
        checked += 1
        union = e["na"] + e["nb"] - e["inter"]
        j_true = e["inter"] / union
        sigma_j = (max(j_true * (1 - j_true), 1e-9) / s_eff) ** 0.5
        assert abs(r["n_match"] / s_eff - j_true) <= 4 * sigma_j + 1 / s_eff
        # KMV over bin minima: sigma ~ union/sqrt(k); the bin-collision
        # bias (~k/2S) is well inside the 4-sigma band
        from agf_data_ingestion_spark.plans.mixing import _OVU_K

        sigma_u = union / (_OVU_K**0.5)
        assert abs(r["est_union"] - union) <= 4 * sigma_u + _OVU_K
    assert checked  # the planted overlaps were actually compared


def test_overlap_sketch_pair_stage_is_corpus_constant(spark):
    """Everything after the signature aggregation runs on <= K^2 * k
    rows: the corpus parquet is scanned ONCE (the cached signatures —
    r12 switched the localCheckpoint to cache() so the auto-routed twin
    shares the materialization), and every pair-stage consumer reads the
    cache, never the corpus."""
    from agf_data_ingestion_spark.plans.mixing import (
        docs_source_overlap_sketch,
    )

    df = docs_source_overlap_sketch(spark, SF_SMOKE)
    # execute: the first action materializes the signature cache; AQE's
    # final plan is what the pair stage actually read from
    df.write.format("noop").mode("overwrite").save()
    plan = df._jdf.queryExecution().executedPlan().toString()
    # all three sig consumers (tag_a, tag_b, srcs) read the cached
    # signatures — InMemoryTableScan nodes, not fresh corpus scans
    assert plan.count("InMemoryTableScan") >= 3, plan
    # and every parquet mention in the printout belongs to the cache's
    # own build subtree (InMemoryRelation prints its child plan); nothing
    # above/outside the first cache node re-scans the corpus
    head = plan.split("InMemoryRelation", 1)[0]
    assert "Scan parquet" not in head, plan
    # the signatures RDD is actually materialized in the block store
    infos = spark.sparkContext._jsc.sc().getRDDStorageInfo()
    assert any(i.numCachedPartitions() > 0 for i in infos), "sig cache empty"


# ---------------------------------------------------------------------------
# Auto-routed overlap (OP-X-AUTOROUTE, r9)
# ---------------------------------------------------------------------------


def test_overlap_route_boundary(spark):
    """The routing guard flips EXACTLY at threshold+1 gram rows, counts
    gram rows the same way both engines do (a doc of n >= 3 words yields
    n-2 rows; shorter docs contribute zero), and an empty corpus routes
    exact with guard 0."""
    from agf_data_ingestion_spark.plans.mixing import _overlap_route

    T = 10

    def mk(n_words):
        return spark.createDataFrame(
            [("s", " ".join(f"w{i}" for i in range(n_words)))],
            "source string, text string",
        )

    assert _overlap_route(spark, mk(T + 2), T) == (T, False)  # at threshold
    assert _overlap_route(spark, mk(T + 3), T) == (T + 1, True)  # one past
    assert _overlap_route(spark, mk(2), T) == (0, False)  # short doc
    empty = spark.createDataFrame([], "source string, text string")
    assert _overlap_route(spark, empty, T) == (0, False)


def test_overlap_auto_equals_routed_branch(spark):
    """At SF_SMOKE the corpus sits below the production threshold, so the
    routed entry point must return the EXACT branch verbatim (same pairs,
    same jaccard), tagged with the guard value."""
    from agf_data_ingestion_spark.plans.mixing import (
        _OVR_THRESHOLD,
        docs_source_overlap_auto,
    )

    auto = docs_source_overlap_auto(spark, SF_SMOKE).collect()
    assert auto and {r["routed"] for r in auto} == {"exact"}
    assert all(0 < r["gram_rows"] <= _OVR_THRESHOLD for r in auto)
    exact = {
        (r["src_a"], r["src_b"]): r["jaccard_ppm"]
        for r in docs_source_overlap(spark, SF_SMOKE).collect()
    }
    assert {(r["src_a"], r["src_b"]): r["jaccard_ppm"] for r in auto} == exact


def test_mixture_anneal_schedule(spark):
    """Phase 0 is the uniform mixture, the final phase is exactly the
    DoReMi weights, interpolation is monotone toward each source's final
    weight, and per-phase targets never exceed the phase budget."""
    from agf_data_ingestion_spark.plans.mixing import (
        _ANN_PHASES,
        docs_domain_reweight,
        docs_mixture_anneal,
    )

    rows = docs_mixture_anneal(spark, SF_SMOKE).collect()
    drm = {
        r["source"]: r["weight_ppm"]
        for r in docs_domain_reweight(spark, SF_SMOKE).collect()
    }
    by_phase = {}
    for r in rows:
        by_phase.setdefault(r["phase"], {})[r["source"]] = r
    assert set(by_phase) == set(range(_ANN_PHASES))
    for s, r in by_phase[0].items():
        assert r["weight_ppm"] == 1_000_000  # uniform start
    for s, r in by_phase[_ANN_PHASES - 1].items():
        assert r["weight_ppm"] == drm[s]  # DoReMi end
    for s in drm:
        ws = [by_phase[p][s]["weight_ppm"] for p in range(_ANN_PHASES)]
        diffs = [b - a for a, b in zip(ws, ws[1:])]
        assert all(d >= 0 for d in diffs) or all(d <= 0 for d in diffs)
    for p, srcs in by_phase.items():
        budget = None
        tot = sum(r["target_tokens"] for r in srcs.values())
        # truncating division: targets sum to at most the phase budget
        from agf_data_ingestion_spark.plans.base import t as _t
        from pyspark.sql import functions as FF

        budget = (
            _t(spark, SF_SMOKE, "documents")
            .agg(FF.sum(FF.size(FF.split("text", " "))))
            .collect()[0][0]
            // _ANN_PHASES
        )
        assert 0 < tot <= budget


def test_preference_pairs_invariants(spark):
    """No document appears on both sides, margins are strictly positive,
    pair ranks are dense from 1 within each source, and chosen docs
    outscore rejected ones by exactly the margin."""
    from agf_data_ingestion_spark.plans.quality_model import (
        docs_preference_pairs,
    )

    rows = docs_preference_pairs(spark, SF_SMOKE).collect()
    assert rows
    chosen = {r["chosen_id"] for r in rows}
    rejected = {r["rejected_id"] for r in rows}
    assert not (chosen & rejected)
    assert all(r["margin"] > 0 for r in rows)
    by_src = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r["pair_rank"])
    for src, ranks in by_src.items():
        ranks.sort()
        # dense prefix 1..k (later ranks may drop via the margin filter,
        # but only from the zero-margin middle outward)
        assert ranks[0] == 1
        assert ranks == list(range(1, len(ranks) + 1))
