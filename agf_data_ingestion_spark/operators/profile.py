"""Table profiling: per-column null counts, exact distincts, and bounds
(OP-X-PROFILE).

The first thing run against any newly-landed 100 TB table.  Shape: one
branch per column, each a ``groupBy(col)`` count — EVERY per-column
statistic then derives from that distinct-value table (n_rows = Σcnt,
n_nulls = cnt of the null key, n_distinct = #non-null keys, bounds =
min/max keys), so the heavy reduction is a map-side-combined keyed
aggregation followed by a global agg over ≤ #partitions partial rows.

Why not one pass with 6 × ``count_distinct``: Spark rewrites
multi-distinct as a single 7-way Expand feeding ONE un-keyed
SortAggregate reducer — every distinct value of every column funnels,
sorted, through one task (measured 3.8-5 s at sf0.1 vs ~1 s for the
branch form).  The branch form also scans via column pruning: each
branch's parquet scan reads exactly one column.

Determinism: bounds aggregate on the NATIVE column (numeric/temporal
ordering, never lexicographic) and only the 1-row result is rendered to
string; float columns render through DECIMAL(25,6) — the one
float→string path both engines format identically (bare double→string
differs: Java's Double.toString vs DuckDB's shortest-round-trip).

Reference mapping: generalizes the verification counts the reference's
deploy script runs against its three tables (DEPLOY_NOW.sh item-count
checks) into a reusable operator.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """(col_name, n_rows, n_nulls, n_distinct, min_value, max_value) for
    each requested column (default: all)."""
    cols = columns or df.columns
    dtypes = dict(df.dtypes)

    def render(c, expr):
        if dtypes[c] in ("double", "float"):
            expr = expr.cast("decimal(25,6)")
        return expr.cast("string")

    parts = []
    for c in cols:
        grouped = df.groupBy(F.col(c).alias("_k")).agg(
            F.count(F.lit(1)).alias("_cnt")
        )
        parts.append(
            grouped.agg(
                F.sum("_cnt").alias("n_rows"),
                F.coalesce(
                    F.sum(F.when(F.col("_k").isNull(), F.col("_cnt"))),
                    F.lit(0).cast("long"),
                ).alias("n_nulls"),
                F.count("_k").alias("n_distinct"),
                render(c, F.min("_k")).alias("min_value"),
                render(c, F.max("_k")).alias("max_value"),
            ).select(
                F.lit(c).alias("col_name"),
                "n_rows",
                "n_nulls",
                "n_distinct",
                "min_value",
                "max_value",
            )
        )
    return reduce(DataFrame.unionByName, parts)
