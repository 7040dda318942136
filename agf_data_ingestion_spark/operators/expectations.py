"""Declarative data-quality expectations: a rule set checked against a
DataFrame in as few passes as the rules allow, returning one violations
row per rule — the Great-Expectations/dbt-test shape, generalizing the
reference's required-field manifest validation (``split_valid``,
reference agf_ingestion_lambda.py:61-77) from "these keys exist" to a
full constraint vocabulary.

Rule forms (dicts):
  {"rule": "not_null",  "col": c}
  {"rule": "unique",    "col": c}
  {"rule": "min",       "col": c, "value": v}      # violations: col < v
  {"rule": "max",       "col": c, "value": v}      # violations: col > v
  {"rule": "in_set",    "col": c, "values": [...]}
  {"rule": "regex",     "col": c, "pattern": p}    # violations: no match
  {"rule": "foreign_key", "col": c, "ref": DataFrame, "ref_col": rc}

Pass structure (the profile.py lesson, CLAUDE.md): every row-local rule
(not_null / min / max / in_set / regex) compiles to ONE conditional count
in a single shared aggregation — one scan, map-side combined, no matter
how many rules.  ``unique`` rules CANNOT ride that pass without the
multi-distinct Expand trap (N count_distincts in one agg plan an
(N+1)-way Expand through a single un-keyed reducer), so each gets its own
keyed groupBy branch; ``foreign_key`` rules each contribute one left-anti
join against (distinct) reference keys.  All branches reduce to one row
and union into the report.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_REPORT_COLS = ["rule_id", "col", "rule", "violations", "n_rows", "pass"]


def _rule_id(i: int, r: dict) -> str:
    return f"r{i:02d}_{r['rule']}_{r['col']}"


def _row_violation(r: dict):
    """The per-row violation predicate of a row-local rule (Column)."""
    c = F.col(r["col"])
    kind = r["rule"]
    if kind == "not_null":
        return c.isNull()
    if kind == "min":
        return c < F.lit(r["value"])
    if kind == "max":
        return c > F.lit(r["value"])
    if kind == "in_set":
        return ~c.isin(*r["values"]) | c.isNull()
    if kind == "regex":
        return ~c.rlike(r["pattern"]) | c.isNull()
    raise ValueError(f"rule {kind!r} is not row-local")


def split_by_expectations(
    df: DataFrame, rules: list[dict]
) -> tuple[DataFrame, DataFrame]:
    """(passing, violating) split by the ROW-LOCAL rules — the streaming
    form of the gate: evaluable per record with no global state, so it
    runs identically inside a micro-batch or a batch scan.  The violating
    frame carries a ``_violated`` array naming every failed rule (the DLQ
    diagnosis column, mirroring the ingest quarantine's reason column).
    Global rules (unique / foreign_key) are rejected: streams handle
    those with ``dropDuplicatesWithinWatermark`` and reference joins,
    not a row predicate."""
    flags = [
        F.when(_row_violation(r), F.lit(_rule_id(i, r))) for i, r in enumerate(rules)
    ]
    tagged = df.withColumn(
        "_violated", F.array_compact(F.array(*flags))
    )
    good = tagged.filter(F.size("_violated") == 0).drop("_violated")
    bad = tagged.filter(F.size("_violated") > 0)
    return good, bad


def check_expectations(df: DataFrame, rules: list[dict]) -> DataFrame:
    """One report row per rule: (rule_id, col, rule, violations, n_rows,
    pass).  ``n_rows`` is the checked row count (for ``unique`` it is the
    distinct-key count surplus base, i.e. total rows).  An empty rule set
    returns an empty report with the same schema."""
    if not rules:
        return df.sparkSession.createDataFrame(
            [],
            "rule_id string, col string, rule string,"
            " violations long, n_rows long, pass boolean",
        )
    row_local: list[tuple[int, dict]] = []
    uniques: list[tuple[int, dict]] = []
    fks: list[tuple[int, dict]] = []
    for i, r in enumerate(rules):
        kind = r["rule"]
        if kind in ("not_null", "min", "max", "in_set", "regex"):
            row_local.append((i, r))
        elif kind == "unique":
            uniques.append((i, r))
        elif kind == "foreign_key":
            fks.append((i, r))
        else:
            raise ValueError(f"unknown rule {kind!r}")

    parts: list[DataFrame] = []

    if row_local:
        aggs = [F.count(F.lit(1)).alias("_n")]
        for i, r in row_local:
            # NULL under min/max is not counted — surfacing nulls is
            # not_null's job; in_set/regex treat NULL as violating
            aggs.append(F.count_if(_row_violation(r)).alias(f"_v{i}"))
        one = df.agg(*aggs)
        # fan the single agg row out via explode-of-structs, NOT a union of
        # per-rule projections: column pruning would split a unioned shared
        # aggregate into one full-scan aggregate PER RULE (each branch only
        # references its own counter), silently multiplying the table scan
        structs = [
            F.struct(
                F.lit(_rule_id(i, r)).alias("rule_id"),
                F.lit(r["col"]).alias("col"),
                F.lit(r["rule"]).alias("rule"),
                F.col(f"_v{i}").cast("long").alias("violations"),
                F.col("_n").cast("long").alias("n_rows"),
                (F.col(f"_v{i}") == 0).alias("pass"),
            )
            for i, r in row_local
        ]
        parts.append(
            one.select(F.explode(F.array(*structs)).alias("r")).select("r.*")
        )

    for i, r in uniques:
        c = r["col"]
        per_key = df.groupBy(c).agg(F.count(F.lit(1)).alias("_c"))
        agg = per_key.agg(
            F.sum(F.when(F.col("_c") > 1, F.col("_c")).otherwise(F.lit(0))).alias("_v"),
            F.sum("_c").alias("_n"),
        )
        parts.append(
            agg.select(
                F.lit(_rule_id(i, r)).alias("rule_id"),
                F.lit(c).alias("col"),
                F.lit("unique").alias("rule"),
                F.coalesce(F.col("_v"), F.lit(0)).cast("long").alias("violations"),
                F.coalesce(F.col("_n"), F.lit(0)).cast("long").alias("n_rows"),
                (F.coalesce(F.col("_v"), F.lit(0)) == 0).alias("pass"),
            )
        )

    for i, r in fks:
        c = r["col"]
        ref = r["ref"].select(F.col(r["ref_col"]).alias(c)).dropDuplicates([c])
        orphans = df.select(c).filter(F.col(c).isNotNull()).join(ref, c, "left_anti")
        agg = df.agg(F.count(F.lit(1)).alias("_n")).crossJoin(
            orphans.agg(F.count(F.lit(1)).alias("_v"))
        )
        parts.append(
            agg.select(
                F.lit(_rule_id(i, r)).alias("rule_id"),
                F.lit(c).alias("col"),
                F.lit("foreign_key").alias("rule"),
                F.col("_v").cast("long").alias("violations"),
                F.col("_n").cast("long").alias("n_rows"),
                (F.col("_v") == 0).alias("pass"),
            )
        )

    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
