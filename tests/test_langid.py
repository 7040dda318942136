"""Trained language-ID (plans/langid.py, OP-X-LANGID): planted-truth
accuracy, model shape, and scale-shape pins.  Corpus-level bit-identity
vs DuckDB is pinned by the oracle gate at all three scale factors."""

from __future__ import annotations

from pyspark.sql import functions as F

from agf_data_ingestion_spark.plans.langid import (
    _D,
    _corpus,
    docs_langid_apply,
    docs_langid_train,
)

SF = "/root/testdata/sf0.001"


def test_planted_corpus_shape(spark):
    c = _corpus(spark, SF)
    rows = c.collect()
    langs = {r.lang for r in rows}
    assert langs == {0, 1, 2}
    # ~80/20 split, both sides populated
    n_train = sum(r.is_train for r in rows)
    assert 0.7 * len(rows) < n_train < 0.9 * len(rows)
    # alphabets: a lang-0 doc never contains letters outside a–j + space
    for r in rows[:50]:
        alphabet = {0: set("abcdefghij"), 1: set("ghijklmnop"), 2: set("mnopqrstuv")}[
            r.lang
        ]
        assert set(r.text) <= alphabet | {" "}


def test_accuracy_at_least_95(spark):
    out = docs_langid_apply(spark, SF).collect()
    assert out, "held-out split must be non-empty"
    acc = sum(r.correct for r in out) / len(out)
    assert acc >= 0.95, f"accuracy {acc:.3f}"
    # every held-out doc got a real prediction (no -1 fallbacks)
    assert all(r.pred_lang in (0, 1, 2) for r in out)


def test_model_is_constant_size_and_integer(spark):
    w = docs_langid_train(spark, SF)
    rows = w.collect()
    assert 0 < len(rows) <= 3 * _D  # bounded by buckets x languages
    assert dict(w.dtypes) == {
        "bucket": "bigint",
        "lang": "bigint",
        "n": "bigint",
        "weight": "bigint",
    }
    # per-million weights: each language's weights sum to ~1e6 (truncation
    # loses < 1 per bucket)
    by_lang: dict[int, int] = {}
    for r in rows:
        by_lang[r.lang] = by_lang.get(r.lang, 0) + r.weight
    for lang, s in by_lang.items():
        assert 1_000_000 - len(rows) <= s <= 1_000_000, (lang, s)


def test_apply_plan_shape(spark):
    plan = (
        docs_langid_apply(spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the model join is a broadcast (the model is constant ≤ 3·_D rows at
    # ANY corpus size — the only F.broadcast pins in the module are the
    # model/totals sides); the corpus is scanned, never collected
    assert "BroadcastHashJoin" in plan, plan
    assert "documents.parquet" in plan
