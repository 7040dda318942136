"""Semantic + plan-shape tests for plans/lm.py (bigram LM scoring, DSIR
importance weights, duplicated-span extraction).  Value-level correctness
is pinned by the DuckDB oracles (scripts/check_oracle.py); these assert
the invariants the oracle comparison can't express."""

from __future__ import annotations

from pyspark.sql import functions as F

from agf_data_ingestion_spark.plans import lm

SF = "/root/testdata/sf0.001"


def _plan_str(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_lm_score_bounds(spark):
    rows = lm.docs_bigram_lm_score(spark, SF).collect()
    assert rows, "every sf has >=2-word docs"
    for r in rows:
        # p(w2|w1) is a conditional probability: 0 < score <= 1.0 (scaled)
        assert 0 < r.lm_score_micro <= lm._LM_SCALE
        assert r.n_bigrams >= 1


def test_lm_count_joins_never_broadcast(spark):
    # vocabulary-sized count tables must shuffle-hash join, not broadcast
    plan = _plan_str(lm.docs_bigram_lm_score(spark, SF))
    assert "ShuffledHashJoin" in plan, plan
    assert "BroadcastHashJoin" not in plan, plan


def test_dsir_upweights_target_language(spark):
    w = lm.docs_dsir_weights(spark, SF)
    d = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "lang")
        .join(w, "doc_id")
        .groupBy(F.col("lang") == "en")
        .agg(F.avg("dsir_weight_micro").alias("m"))
        .collect()
    )
    means = {r[0]: r.m for r in d}
    # docs drawn from the target distribution must average a higher
    # importance weight than off-target docs
    assert means[True] > means[False], means


def test_dsir_bucket_join_is_broadcast(spark):
    # the bucket weight table is bounded by _DSIR_BUCKETS — it must
    # broadcast, never shuffle the corpus-side features for it
    plan = _plan_str(lm.docs_dsir_weights(spark, SF))
    assert "BroadcastHashJoin" in plan, plan


def test_dup_spans_are_maximal_and_consistent(spark):
    rows = lm.docs_dup_span_extract(spark, SF).collect()
    assert rows, "the sf0.001 corpus contains cross-doc duplicated spans"
    seen = {}
    for r in rows:
        assert r.span_start >= 1
        assert r.span_words == r.span_end - r.span_start + 1
        assert r.span_words >= lm._SPAN_N
        # islands may bridge gaps ≤ _SPAN_N, so the shingle count is
        # bounded by (not equal to) the dense-cover count
        assert 1 <= r.n_dup_shingles <= r.span_words - lm._SPAN_N + 1
        seen.setdefault(r.doc_id, []).append((r.span_start, r.span_end))
    # maximality: islands within one doc never touch or overlap
    for spans in seen.values():
        spans.sort()
        for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
            assert s2 > e1 + 1, (s1, e1, s2, e2)


def test_dup_spans_cover_known_duplicates(spark):
    # any two docs sharing a full _SPAN_N-word window must both report a
    # span containing it; cross-check one pair found independently
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    sh = docs.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(
                    F.lit(1), F.size(F.split("text", " ")) - (lm._SPAN_N - 1)
                ),
                lambda i: F.array_join(
                    F.slice(F.split("text", " "), i, lm._SPAN_N), " "
                ),
            )
        ).alias("gram"),
    )
    pair = (
        sh.groupBy("gram")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .limit(1)
        .collect()
    )
    extracted = {r.doc_id for r in lm.docs_dup_span_extract(spark, SF).collect()}
    if pair:
        holders = {
            r.doc_id
            for r in sh.filter(F.col("gram") == pair[0].gram)
            .select("doc_id")
            .distinct()
            .collect()
        }
        assert holders <= extracted, (holders, extracted)


def test_quality_calibrated_per_language_fraction(spark):
    from agf_data_ingestion_spark.plans.text import (
        _CALIBRATED_DROP_FRAC,
        docs_quality_calibrated,
    )

    rows = docs_quality_calibrated(spark, SF).collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r.keep)
    assert len(by_lang) >= 3
    for lang, keeps in by_lang.items():
        frac = sum(keeps) / len(keeps)
        # every language keeps ~(1 - drop_frac) of ITS OWN docs — the
        # whole point of calibration vs a global absolute threshold
        assert abs(frac - (1 - _CALIBRATED_DROP_FRAC)) < 0.12, (lang, frac)


def test_lm_buckets_are_equal_thirds_per_language(spark):
    from agf_data_ingestion_spark.plans.lm import docs_lm_buckets

    rows = docs_lm_buckets(spark, SF).collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r)
    for lang, rs in by_lang.items():
        counts = {}
        for r in rs:
            counts[r.bucket] = counts.get(r.bucket, 0) + 1
        # ntile thirds: sizes differ by at most 1
        assert max(counts.values()) - min(counts.values()) <= 1, (lang, counts)
        # head scores dominate tail scores
        head_min = min(r.lm_score_micro for r in rs if r.bucket == "head")
        tail_max = max(r.lm_score_micro for r in rs if r.bucket == "tail")
        assert head_min >= tail_max, (lang, head_min, tail_max)


def test_winnowing_guarantee_on_shared_spans(spark):
    """MOSS guarantee: documents sharing >= w+k-1 consecutive words share
    at least one fingerprint hash.  _SPAN_N == _WIN_W + _WIN_K - 1 == 6,
    so every duplicated span found by docs_dup_span_extract must witness
    a shared winnowing fingerprint between its holders."""
    from pyspark.sql import functions as F

    assert lm._WIN_W + lm._WIN_K - 1 == lm._SPAN_N
    fps = {}
    for r in lm.docs_winnowing(spark, SF).collect():
        fps.setdefault(r.doc_id, set()).add(r.fp_hash)
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    sh = docs.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size(F.split("text", " ")) - (lm._SPAN_N - 1)),
                lambda i: F.array_join(F.slice(F.split("text", " "), i, lm._SPAN_N), " "),
            )
        ).alias("gram"),
    ).distinct()
    pairs = (
        sh.alias("a")
        .join(sh.alias("b"), "gram")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("x"), F.col("b.doc_id").alias("y"))
        .distinct()
        .collect()
    )
    assert pairs, "sf0.001 contains cross-doc 6-word spans"
    for p in pairs:
        assert fps.get(p.x, set()) & fps.get(p.y, set()), (p.x, p.y)


def test_winnowing_density(spark):
    from pyspark.sql import functions as F

    fps = lm.docs_winnowing(spark, SF).groupBy("doc_id").count()
    grams = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select(
            "doc_id",
            (F.size(F.split("text", " ")) - (lm._WIN_K - 1)).alias("n_grams"),
        )
        .filter(F.col("n_grams") >= lm._WIN_W)
    )
    rows = grams.join(fps, "doc_id").collect()
    assert rows
    for r in rows:
        # selections exist and are a strict subsample of the gram stream
        assert 1 <= r["count"] <= r.n_grams
    avg_density = sum(r["count"] for r in rows) / sum(r.n_grams for r in rows)
    # expected density 2/(w+1) = 0.4; allow generous slack
    assert 0.2 <= avg_density <= 0.6, avg_density


def test_hybrid_rrf_fusion_semantics(spark):
    from agf_data_ingestion_spark.plans.lm import (
        _RRF_K,
        _RRF_SCALE,
        docs_hybrid_rrf,
    )

    rows = docs_hybrid_rrf(spark, SF).collect()
    assert len(rows) == 10
    for r in rows:
        # every fused doc came from at least one ranker
        assert r.bm25_rank is not None or r.cos_rank is not None
        expect = 0
        if r.bm25_rank is not None:
            expect += _RRF_SCALE // (_RRF_K + r.bm25_rank)
        if r.cos_rank is not None:
            expect += _RRF_SCALE // (_RRF_K + r.cos_rank)
        assert r.rrf_score == expect
    # result is sorted by fused score (with doc_id tiebreak)
    scores = [(r.rrf_score, -r.doc_id) for r in rows]
    assert scores == sorted(scores, reverse=True)
    # a doc present in BOTH rankers outranks one with a single equal rank
    both = [r for r in rows if r.bm25_rank is not None and r.cos_rank is not None]
    only = [r for r in rows if (r.bm25_rank is None) != (r.cos_rank is None)]
    if both and only:
        assert max(r.rrf_score for r in both) > min(r.rrf_score for r in only)


def test_bpe_train_matches_reference_greedy_merge(spark, tmp_path):
    """r5 OP-X-BPETRAIN: the windows-only parity formulation of greedy
    left-to-right merging must agree with a literal Sennrich-style Python
    reference on a planted corpus exercising the overlap cases (x == y
    runs of even/odd length, alternating x != y chains, ties)."""
    import collections

    texts = [
        "aaaa aaa aaaa abab ababab banana",
        "aaaa abab banana bananas",
        "mississippi aaa abab riverbank riverbed",
        "abcdefgh abcdefgh mississippi banana",
    ]
    rows = [(i, t, "en", "test", len(t)) for i, t in enumerate(texts)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    # reference implementation: pair counting with overlaps, argmax with
    # (max count, lexicographically smallest pair), greedy left-to-right
    # merge (Sennrich et al. 2016, the textbook loop)
    wc = collections.Counter(w for t in texts for w in t.split(" ") if w)
    vocab = {tuple(list(w) + ["</w>"]): c for w, c in wc.items()}
    # identical words stay separate keys in the engine; counts are summed
    # per pair either way, so a dict keyed by symbol tuple is equivalent
    expected = []
    for r in range(1, lm._BPE_ROUNDS + 1):
        pairs = collections.Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        (bx, by), bc = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        expected.append((r, bx, by, bx + by, bc))
        nv = collections.Counter()
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == bx and syms[i + 1] == by:
                    out.append(bx + by)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            nv[tuple(out)] += c
        vocab = nv

    got = [
        (r["round"], r["x"], r["y"], r["merged"], r["pair_count"])
        for r in lm.docs_bpe_train(spark, str(tmp_path)).collect()
    ]
    assert sorted(got) == expected, (got, expected)
