"""Salting is semantics-preserving: salted plans must equal unsalted plans
exactly, including on pathologically skewed inputs."""

from __future__ import annotations

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
