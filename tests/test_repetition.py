"""Semantic + plan-shape tests for docs_repetition_signals (OP-X-REPETITION,
the Gopher repetition filters).  Corpus-level bit-identity is pinned by the
DuckDB oracle (scripts/check_oracle.py); these assert hand-computed values
on planted edge cases and the single-exchange plan claim."""

from __future__ import annotations

from agf_data_ingestion_spark.plans.text import docs_repetition_signals

SF = "/root/testdata/sf0.001"


def _planted(spark, tmp_path):
    texts = [
        "a b a b a b c",  # overlapping dup 3-grams, dominant bigram
        "u v w x y z p q r s t k l m n o aa bb cc dd",  # 20 distinct: passes
        "solo",  # 1 word: no bigrams/3-grams at all
        "x x x x",  # degenerate run: tb_ppm > 1e6 by the overlap convention
    ]
    rows = [(i, t, "en", "test", len(t)) for i, t in enumerate(texts)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = docs_repetition_signals(spark, str(tmp_path)).collect()
    return {r.doc_id: r for r in out}


def test_planted_values(spark, tmp_path):
    got = _planted(spark, tmp_path)
    assert len(got) == 4

    r = got[0]  # "a b a b a b c": 7 words, 3 distinct
    assert r.n_words == 7
    assert r.dup_word_ppm == (7 - 3) * 1000000 // 7
    assert (r.top_bigram, r.top_bigram_n) == ("a b", 3)
    assert r.top_bigram_ppm == 3 * 2 * 1000000 // 7
    # dup 3-grams: "a b a" at {1,3}, "b a b" at {2,4} -> starts 1,2,3,4
    # interval union covers positions 1..6 -> 3 + 1 + 1 + 1 = 6
    assert r.dup3_ppm == 6 * 1000000 // 7
    assert not r.passes_repetition

    r = got[1]  # 20 distinct words, every bigram unique
    assert r.dup_word_ppm == 0 and r.dup3_ppm == 0
    assert r.top_bigram_n == 1 and r.top_bigram_ppm == 100000
    assert r.passes_repetition

    r = got[2]  # single word: empty bigram/3-gram branches coalesce to 0
    assert r.n_words == 1 and r.top_bigram == "" and r.top_bigram_n == 0
    assert (r.dup_word_ppm, r.top_bigram_ppm, r.dup3_ppm) == (0, 0, 0)
    assert r.passes_repetition

    r = got[3]  # "x x x x": overlap convention exceeds 1e6
    assert r.dup_word_ppm == 750000
    assert r.top_bigram_ppm == 3 * 2 * 1000000 // 4  # 1_500_000
    assert r.dup3_ppm == 1000000  # starts {1,2}: 3 + 1 covers all 4 words
    assert not r.passes_repetition


def test_tie_breaks_to_smallest_bigram(spark, tmp_path):
    df = spark.createDataFrame(
        [(0, "b a b a c d c d", "en", "t", 15)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    r = docs_repetition_signals(spark, str(tmp_path)).collect()[0]
    # "b a" x2, "a b" x1, "c d" x2, "a c" x1, "d c" x1 -> tie (2) between
    # "b a" and "c d": lexicographically smallest wins
    assert (r.top_bigram, r.top_bigram_n) == ("b a", 2)


def test_single_materialized_exchange(spark):
    df = docs_repetition_signals(spark, SF)
    df.collect()  # AQE exchange reuse is decided at runtime
    plan = df._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    # all four branches must read ONE materialized corpus shuffle: the
    # words/bigram/3-gram subtrees canonicalize to the same (doc_id, w)
    # exchange, so three of them come back as ReusedExchange
    assert final.count("ReusedExchange") == 3, final
    # per-doc aggregate joins are doc-count-sized: never broadcast, and
    # co-partitioned so they add no exchange of their own
    assert "BroadcastHashJoin" not in final, final
    assert "SortMergeJoin" not in final, final
