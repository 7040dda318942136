"""Table profiling: per-column null counts, exact distincts, and bounds in
ONE aggregation pass (OP-X-PROFILE).

The first thing run against any newly-landed 100 TB table: a single
``agg`` computes every column's statistics together (Catalyst plans the
multi-distinct via one Expand — still a single scan of the data), then a
``stack`` unpivots the 1-row wide result into the (col_name, stats) long
form — the unpivot costs nothing, it runs on one row.

Determinism: bounds aggregate on the NATIVE column (numeric/temporal
ordering, never lexicographic) and only the 1-row RESULT is rendered to
string; float columns render through DECIMAL(25,6) — the one float→string
path both engines format identically (bare double→string differs:
Java's Double.toString vs DuckDB's shortest-round-trip).

Reference mapping: generalizes the verification counts the reference's
deploy script runs against its three tables (DEPLOY_NOW.sh item-count
checks) into a reusable operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """(col_name, n_rows, n_nulls, n_distinct, min_value, max_value) for
    each requested column (default: all), computed in one aggregation."""
    cols = columns or df.columns
    dtypes = dict(df.dtypes)

    def render(c, expr):
        if dtypes[c] in ("double", "float"):
            expr = expr.cast("decimal(25,6)")
        return expr.cast("string")

    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"_{c}__nulls"),
            F.count_distinct(F.col(c)).alias(f"_{c}__distinct"),
            render(c, F.min(F.col(c))).alias(f"_{c}__min"),
            render(c, F.max(F.col(c))).alias(f"_{c}__max"),
        ]
    wide = df.agg(*aggs)
    stack = ", ".join(
        f"'{c}', _{c}__nulls, _{c}__distinct, _{c}__min, _{c}__max" for c in cols
    )
    return wide.selectExpr(
        "_n AS n_rows",
        f"stack({len(cols)}, {stack}) AS"
        " (col_name, n_nulls, n_distinct, min_value, max_value)",
    ).select("col_name", "n_rows", "n_nulls", "n_distinct", "min_value", "max_value")
