"""Contract tests for the round-3 scale operators (SURVEY.md §2.9):
Bloom-filter decontamination (one-sided error), deterministic dataset
split (disjoint total cover), Count-Min frequency sketch (never
underestimates), and integer-exact PMI collocations.  The bit-level
cross-engine checks live in the oracle gate; these pin the algorithmic
guarantees that a hash-value change could silently break."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_bloom_contamination_has_no_false_negatives(spark):
    """Bloom filters are one-sided: every doc the EXACT shingle join flags
    must also be flagged by the Bloom pass (false positives allowed,
    false negatives never)."""
    from agf_data_ingestion_spark.plans.training_data import (
        docs_bloom_contamination,
        docs_contamination,
    )

    exact = {
        r["doc_id"] for r in docs_contamination(spark, SF_SMOKE).collect()
    }
    bloom = docs_bloom_contamination(spark, SF_SMOKE).collect()
    flagged = {r["doc_id"] for r in bloom}
    assert exact, "fixture should produce a non-trivial contaminated set"
    assert exact <= flagged
    # and the filter is not degenerately saturated (flagging everything)
    n_corpus = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .filter(F.col("doc_id") >= 10)
        .count()
    )
    assert len(flagged) < n_corpus


def test_dataset_split_is_a_disjoint_total_cover(spark):
    """Every document lands in exactly one split, and the realized shares
    track the 90/5/5 target (hash-uniformity, loose bounds)."""
    from agf_data_ingestion_spark.plans.training_data import docs_dataset_split

    rows = docs_dataset_split(spark, SF_SMOKE).collect()
    n_total = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").count()
    assert sum(r["n_docs"] for r in rows) == n_total
    by_split = {}
    for r in rows:
        by_split[r["split"]] = by_split.get(r["split"], 0) + r["n_docs"]
    assert set(by_split) == {"train", "val", "test"}
    assert 0.80 <= by_split["train"] / n_total <= 0.97
    for s in ("val", "test"):
        assert 0.005 <= by_split[s] / n_total <= 0.12


def test_countmin_never_underestimates(spark):
    from agf_data_ingestion_spark.plans.sketches import events_countmin_err

    rows = events_countmin_err(spark, SF_SMOKE).collect()
    n_users = (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .select("user_id").distinct().count()
    )
    assert len(rows) == min(20, n_users)
    for r in rows:
        assert r["est_n"] >= r["exact_n"]
        assert r["overcount"] == r["est_n"] - r["exact_n"]


def test_pmi_bigrams_ranked_and_thresholded(spark):
    from agf_data_ingestion_spark.plans.text import docs_pmi_bigrams

    rows = docs_pmi_bigrams(spark, SF_SMOKE).collect()
    assert rows, "corpus should contain collocations above the count floor"
    lifts = [r["lift_ppm"] for r in rows]
    assert lifts == sorted(lifts, reverse=True)
    for r in rows:
        assert r["n_xy"] >= 5
        assert r["n_w1"] >= r["n_xy"] and r["n_w2"] >= r["n_xy"]


def test_semdedup_survivors_have_no_close_pair(spark):
    """Greedy keep-lowest rule: (a) no two survivors in the same cell are
    within tau of each other, (b) every dropped vector has a lower-id
    same-cell neighbor within tau (one-hop witness)."""
    import numpy as np

    from agf_data_ingestion_spark.plans.similarity import _SD_TAU, emb_semdedup

    surv = emb_semdedup(spark, SF_SMOKE).collect()
    cells = {r["vec_id"]: r["cell"] for r in surv}
    emb = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").collect()
    }
    assert 0 < len(surv) <= len(emb)

    def cos(a, b):
        return float(emb[a] @ emb[b] / (np.linalg.norm(emb[a]) * np.linalg.norm(emb[b])))

    by_cell: dict[int, list[int]] = {}
    for vid, c in cells.items():
        by_cell.setdefault(c, []).append(vid)
    for members in by_cell.values():
        members.sort()
        for i, a in enumerate(members):
            for b in members[i + 1:]:
                # strict float check is the oracle's job; allow an epsilon
                # here since this recomputation is plain numpy
                assert cos(a, b) < _SD_TAU + 1e-9, (a, b)


def test_pit_enrich_matches_exactly_one_version_per_fact(spark):
    """Temporal-validity law: the SCD2 intervals tile each user's timeline,
    so every click fact matches exactly one dimension version, and the
    matched band equals the band of that user's latest event at-or-before
    the click."""
    from pyspark.sql import functions as F

    from agf_data_ingestion_spark.plans.windows import events_pit_enrich

    enriched = events_pit_enrich(spark, SF_SMOKE)
    n_clicks = (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .filter(F.col("event_type") == "click")
        .count()
    )
    assert enriched.count() == n_clicks
    assert enriched.select("event_id").distinct().count() == n_clicks
    # the regime never starts after the fact it annotates
    assert enriched.filter(F.col("band_since_us") > F.col("ts_us")).count() == 0
