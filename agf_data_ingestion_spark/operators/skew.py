"""Skew-mitigation utilities: salted two-phase aggregation and salted
broadcast-replicated joins.

AQE's skew-join splitting (enabled in session.py) handles sort-merge skew
at runtime; these explicit tools cover the cases AQE cannot: a single
hot GROUP BY key that overwhelms one reducer, and a skewed equi-join where
the hot key's rows must spread across tasks.  Both are semantics-preserving
— results are bit-identical to the unsalted plan (asserted in
tests/test_skew.py and the `events_salted_type_counts` oracle query).

Salts are derived with ``pmod(hash(...), n)`` over stable input columns, so
runs are deterministic — no ``rand()`` (which would break retry/replay
correctness: a re-executed task must salt identically).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from agf_data_ingestion_spark.plans.base import DEC_MONEY


def salted_sum_count(
    df: DataFrame,
    keys: list[str],
    value: Column,
    *,
    salt_from: list[str],
    n_salt: int = 16,
) -> DataFrame:
    """Two-phase grouped sum+count that spreads each hot key over ``n_salt``
    reducers.

    Phase 1 groups by (keys, salt) — at most ``n_salt`` partial rows per
    key per partition; phase 2 combines partials per key.  Sums use the
    exact-decimal representation so phase order cannot change the result.
    Output: keys + ``n`` (count) + ``total`` (double).
    """
    salt = F.pmod(F.hash(*[F.col(c) for c in salt_from]), F.lit(n_salt)).alias("_salt")
    partial = (
        df.select(*keys, salt, value.cast(DEC_MONEY).alias("_v"))
        .groupBy(*keys, "_salt")
        .agg(F.count("*").alias("_n"), F.sum("_v").alias("_s"))
    )
    return (
        partial.groupBy(*keys)
        .agg(F.sum("_n").alias("n"), F.sum("_s").cast("double").alias("total"))
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    keys: list[str],
    *,
    salt_from: list[str],
    n_salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where the big side's hot keys are spread across ``n_salt``
    sub-keys and the small side is replicated ``n_salt``× to meet them.

    Use when the small side is too big to broadcast outright but a hot key
    on the big side would otherwise pin one task at 100× the median.  Cost:
    small side × n_salt (bounded, chosen); win: the hot key's rows process
    in parallel.  Join output equals the unsalted join exactly — for the
    SUPPORTED join types: right/full outer would emit every unmatched
    small-side row once per salt replica (n_salt duplicates), so they are
    rejected rather than silently wrong.
    """
    if how not in ("inner", "left", "left_outer", "left_semi", "left_anti"):
        raise ValueError(
            f"salted_join supports inner/left/left_semi/left_anti, got {how!r}: "
            "right/full outer would duplicate unmatched small-side rows "
            "once per salt replica"
        )
    spark = big.sparkSession
    salts = spark.range(n_salt).select(F.col("id").cast("int").alias("_salt"))
    big_s = big.withColumn(
        "_salt", F.pmod(F.hash(*[F.col(c) for c in salt_from]), F.lit(n_salt)).cast("int")
    )
    small_s = small.crossJoin(salts)
    return big_s.join(small_s, keys + ["_salt"], how).drop("_salt")
