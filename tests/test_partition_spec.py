"""Partition-spec evolution / hidden partitioning (r8, VERDICT r7 ask #1):
Iceberg-style transform specs (identity / day / month / hour / bucket /
truncate) carried in the manifest, bound to source FIELD IDS so renames
never break them.  A spec change is one metadata-only commit; old files
keep their old spec; plan_files prunes each file through its OWN spec;
spec-less files (pre-spec, compaction rewrites) are conservatively kept.

Reference parity: the reference's raw/{instrument}/{YYYY}/{MM}/{DD}/ lake
layout is hand-rolled hidden partitioning (lambda/agf_ingestion_lambda.py:76
mints the path from the sync timestamp; :216 reassembles the date from path
segments) — here the same contract is (identity(instrument), day(ts))."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from agf_data_ingestion_spark.sources import snapshots as S
from agf_data_ingestion_spark.sources.snapshots import (
    CommitConflict,
    SchemaEvolutionError,
    current_version,
    plan_files,
    read_manifest,
    snapshot_drop_column,
    snapshot_partition_spec,
    snapshot_read,
    snapshot_rename_column,
    snapshot_restore,
    snapshot_set_partition_spec,
    snapshot_write,
)


def _events(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"),
        F.to_timestamp(
            F.concat(
                F.lit("2024-03-0"),
                (F.col("id") % 5 + 1).cast("string"),
                F.lit(" 0"),
                (F.col("id") % 8).cast("string"),
                F.lit(":13:0"),
                (F.col("id") % 9).cast("string"),
            )
        ).alias("ts"),
        F.concat(F.lit("inst0"), (F.col("id") % 3).cast("string")).alias("src"),
    )


def _rows(df):
    return sorted((r["k"], str(r["ts"]), r["src"]) for r in df.collect())


def test_spec_change_then_append_reads_both_layouts(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    snapshot_write(_events(spark, 0, 40), tbl)  # pre-spec, unpartitioned
    v_spec = snapshot_set_partition_spec(tbl, [("day", "ts")])
    assert v_spec == 2  # metadata-only commit
    assert snapshot_partition_spec(tbl) == [("day", "ts")]
    snapshot_write(_events(spark, 40, 80), tbl)  # post-spec, partitioned
    m = read_manifest(tbl)
    old = [f for f in m["files"] if "partition" not in f]
    new = [f for f in m["files"] if "partition" in f]
    assert old and new  # both layouts live in one manifest
    assert all(f["spec_id"] == 1 for f in new)
    assert all(set(f["partition"]) == {"ts_day"} for f in new)
    # the union read is exact across both layouts
    assert _rows(snapshot_read(spark, tbl)) == _rows(
        _events(spark, 0, 40).unionByName(_events(spark, 40, 80))
    )
    # partition columns are HIDDEN: the schema is unchanged
    assert [c for c, _ in S.snapshot_schema(tbl)] == ["k", "ts", "src"]


def test_day_partition_prunes_strict_subset_and_exact_result(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    snapshot_write(spark.range(0, 1).select(
        F.col("id").alias("k"),
        F.to_timestamp(F.lit("2024-03-01 00:00:00")).alias("ts"),
        F.lit("inst00").alias("src"),
    ), tbl)
    snapshot_set_partition_spec(tbl, [("day", "ts")])
    snapshot_write(_events(spark, 0, 60), tbl)
    where = [("ts", ">=", "2024-03-04 00:00:00")]
    kept = plan_files(tbl, where=where)
    allf = plan_files(tbl)
    # strict subset: days 1-3 files are pruned by their partition tuple
    assert 0 < len(kept) < len(allf)
    assert all(
        f.get("partition", {}).get("ts_day", "9999") >= "2024-03-04"
        for f in kept
        if "partition" in f
    )
    got = _rows(snapshot_read(spark, tbl, where=where))
    exp = _rows(
        _events(spark, 0, 60).filter(F.col("ts") >= "2024-03-04")
    )
    assert got == exp


def test_bucket_partition_prunes_equality(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    snapshot_write(_events(spark, 0, 2), tbl)
    snapshot_set_partition_spec(tbl, [("bucket", "k", 8)])
    snapshot_write(_events(spark, 2, 200), tbl)
    kept = plan_files(tbl, where=[("k", "==", 77)])
    want = S._bucket_py(77, 8)
    # every partitioned file kept is exactly the bucket of 77 — the
    # plan-time python bucket and the write-time Spark bucket agree
    part_kept = [f for f in kept if "partition" in f]
    assert part_kept and all(
        f["partition"]["k_bucket"] == want for f in part_kept
    )
    assert len(part_kept) < len(
        [f for f in plan_files(tbl) if "partition" in f]
    )
    got = snapshot_read(spark, tbl, where=[("k", "==", 77)]).collect()
    assert [r["k"] for r in got] == [77]


def test_truncate_and_identity_transforms(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    snapshot_write(_events(spark, 0, 1), tbl)
    snapshot_set_partition_spec(
        tbl, [("identity", "src"), ("truncate", "k", 50)]
    )
    snapshot_write(_events(spark, 1, 150), tbl)
    m = read_manifest(tbl)
    parts = [f["partition"] for f in m["files"] if "partition" in f]
    assert all(set(p) == {"src", "k_truncate"} for p in parts)
    assert all(p["k_truncate"] % 50 == 0 for p in parts)  # int truncate
    # identity equality + int-truncate range both prune
    kept = plan_files(tbl, where=[("src", "==", "inst01"), ("k", ">=", 100)])
    for f in kept:
        if "partition" in f:
            assert f["partition"]["src"] == "inst01"
            assert f["partition"]["k_truncate"] + 49 >= 100
    got = _rows(
        snapshot_read(
            spark, tbl, where=[("src", "==", "inst01"), ("k", ">=", 100)]
        )
    )
    exp = _rows(
        _events(spark, 1, 150).filter(
            (F.col("src") == "inst01") & (F.col("k") >= 100)
        )
    )
    assert got == exp


def test_string_truncate_prefix_pruning(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(1, "alpha"), (2, "alto"), (3, "beta"), (4, "bravo")],
        "k long, s string",
    )
    snapshot_write(df.limit(1), tbl)
    snapshot_set_partition_spec(tbl, [("truncate", "s", 2)])
    snapshot_write(df, tbl)
    kept = plan_files(tbl, where=[("s", "==", "beta")])
    assert all(
        f["partition"]["s_truncate"] == "be" for f in kept if "partition" in f
    )
    got = sorted(
        r["s"]
        for r in snapshot_read(spark, tbl, where=[("s", ">=", "br")]).collect()
    )
    assert got == ["bravo"]


def test_spec_change_refuses_racing_append(spark, tmp_path, monkeypatch):
    """OCC: a spec change racing ANY other commit refuses loudly (single
    CAS attempt, no rebase) — the r7 DDL-vs-append discipline."""
    tbl = str(tmp_path / "tbl")
    snapshot_write(_events(spark, 0, 10), tbl)
    real = S._publish
    state = {"raced": False}

    def race(table, files, parent, op, **kw):
        if op.startswith("set_partition_spec") and not state["raced"]:
            state["raced"] = True
            monkeypatch.setattr(S, "_publish", real)  # appends go through
            snapshot_write(_events(spark, 10, 20), tbl)
            monkeypatch.setattr(S, "_publish", race)
        return real(table, files, parent, op, **kw)

    monkeypatch.setattr(S, "_publish", race)
    with pytest.raises(CommitConflict):
        snapshot_set_partition_spec(tbl, [("day", "ts")])
    monkeypatch.setattr(S, "_publish", real)
    # nothing half-committed: still unpartitioned, data intact
    assert snapshot_partition_spec(tbl) == []
    assert snapshot_read(spark, tbl).count() == 20


def test_spec_survives_rename_and_blocks_source_drop(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    snapshot_write(_events(spark, 0, 10), tbl)
    snapshot_set_partition_spec(tbl, [("day", "ts")])
    snapshot_rename_column(tbl, "ts", "event_ts")
    # the spec follows the field id: it now reports the NEW logical name
    assert snapshot_partition_spec(tbl) == [("day", "event_ts")]
    snapshot_write(
        _events(spark, 10, 30).withColumnRenamed("ts", "event_ts"), tbl
    )
    kept = plan_files(tbl, where=[("event_ts", ">=", "2024-03-05 00:00:00")])
    assert 0 < len(kept) < len(plan_files(tbl))
    with pytest.raises(SchemaEvolutionError, match="partition spec"):
        snapshot_drop_column(tbl, "event_ts")
    # after resetting the spec the drop goes through
    snapshot_set_partition_spec(tbl, [])
    snapshot_drop_column(tbl, "event_ts")
    assert [c for c, _ in S.snapshot_schema(tbl)] == ["k", "src"]


def test_idempotent_set_and_spec_id_reuse(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    snapshot_write(_events(spark, 0, 5), tbl)
    v1 = snapshot_set_partition_spec(tbl, [("day", "ts")])
    assert snapshot_set_partition_spec(tbl, [("day", "ts")]) == v1  # no-op
    snapshot_set_partition_spec(tbl, [("identity", "src")])
    v3 = snapshot_set_partition_spec(tbl, [("day", "ts")])  # back again
    m = read_manifest(tbl, v3)
    # the day spec was REUSED by id, not re-minted
    assert [s["spec_id"] for s in m["specs"]] == [1, 2]
    assert m["default_spec_id"] == 1


def test_restore_rolls_spec_back(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    snapshot_write(_events(spark, 0, 5), tbl)
    v_plain = current_version(tbl)
    snapshot_set_partition_spec(tbl, [("day", "ts")])
    snapshot_write(_events(spark, 5, 10), tbl)
    snapshot_restore(tbl, v_plain)
    assert snapshot_partition_spec(tbl) == []
    snapshot_write(_events(spark, 5, 10), tbl)  # writes unpartitioned again
    assert all(
        "partition" not in f for f in read_manifest(tbl)["files"]
    )
    assert snapshot_read(spark, tbl).count() == 10


def test_spec_validation_refusals(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    snapshot_write(_events(spark, 0, 3), tbl)
    for bad in (
        [("day", "k")],  # day of a long
        [("bucket", "ts", 8)],  # bucket of a timestamp
        [("bucket", "k")],  # missing n
        [("truncate", "k", 0)],  # zero width
        [("day", "nope")],  # unknown column
        [("day", "ts"), ("day", "ts")],  # duplicate field name
    ):
        with pytest.raises((SchemaEvolutionError, ValueError)):
            snapshot_set_partition_spec(tbl, bad)
    with pytest.raises(ValueError, match="unknown partition transform"):
        snapshot_set_partition_spec(tbl, [("year", "ts")])
    # a partitioned table refuses a batch missing the source column
    snapshot_set_partition_spec(tbl, [("day", "ts")])
    with pytest.raises(SchemaEvolutionError, match="partition source"):
        snapshot_write(
            spark.createDataFrame([(1, "x")], "k long, src string"), tbl
        )


def test_null_partition_value_conservative_keep(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    snapshot_write(_events(spark, 0, 2), tbl)
    snapshot_set_partition_spec(tbl, [("day", "ts")])
    snapshot_write(
        spark.createDataFrame(
            [(100, None, "instXX")], "k long, ts timestamp, src string"
        ),
        tbl,
    )
    m = read_manifest(tbl)
    nulls = [
        f
        for f in m["files"]
        if "partition" in f and f["partition"]["ts_day"] is None
    ]
    assert nulls  # the NULL row landed in the hive default partition
    # a ts predicate cannot prune the NULL-partition file
    assert any(
        f["partition"].get("ts_day") is None
        for f in plan_files(tbl, where=[("ts", ">=", "2024-03-01")])
        if "partition" in f
    )
    assert snapshot_read(spark, tbl).count() == 3


def test_expiry_reclaims_nested_partition_files(spark, tmp_path):
    from agf_data_ingestion_spark.sources.snapshots import expire_snapshots

    tbl = str(tmp_path / "tbl")
    snapshot_write(_events(spark, 0, 20), tbl)
    snapshot_set_partition_spec(tbl, [("day", "ts")])
    snapshot_write(_events(spark, 20, 40), tbl)
    old_parts = [
        f["path"] for f in read_manifest(tbl)["files"] if "partition" in f
    ]
    assert all(os.sep + "_p_ts_day=" in p for p in old_parts)
    snapshot_write(_events(spark, 40, 50), tbl, mode="overwrite")
    deleted = expire_snapshots(tbl, keep_last=1, orphan_grace_s=0.0)
    assert set(old_parts) <= set(deleted)  # nested hive dirs reclaimed
    assert snapshot_read(spark, tbl).count() == 10


def test_hour_and_month_transforms_prune(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [
            (1, "2024-03-01 04:10:00"),
            (2, "2024-03-01 09:10:00"),
            (3, "2024-04-02 04:10:00"),
        ],
        "k long, iso string",
    ).select("k", F.to_timestamp("iso").alias("ts"))
    snapshot_write(df.limit(1), tbl)
    snapshot_set_partition_spec(tbl, [("month", "ts"), ("hour", "ts")])
    snapshot_write(df, tbl)
    kept = plan_files(
        tbl,
        where=[
            ("ts", ">=", "2024-03-01 05:00:00"),
            ("ts", "<", "2024-04-01 00:00:00"),
        ],
    )
    part_kept = [f["partition"] for f in kept if "partition" in f]
    assert part_kept == [{"ts_month": "2024-03", "ts_hour": "2024-03-01-09"}]
    got = snapshot_read(
        spark,
        tbl,
        where=[
            ("ts", ">=", "2024-03-01 05:00:00"),
            ("ts", "<", "2024-04-01 00:00:00"),
        ],
    ).collect()
    assert [r["k"] for r in got] == [2]


def test_compaction_restores_partition_layout(spark, tmp_path):
    """r8: COW rewrites emit spec-less files (conservatively kept);
    compaction rewrites UNDER the default spec, so maintenance converges
    the table back to a fully partition-pruned layout."""
    from agf_data_ingestion_spark.sources.snapshots import (
        snapshot_compact,
        snapshot_delete,
    )

    tbl = str(tmp_path / "tbl")
    snapshot_write(_events(spark, 0, 2), tbl)
    snapshot_set_partition_spec(tbl, [("day", "ts")])
    for lo in (2, 30, 60):
        snapshot_write(_events(spark, lo, lo + 28), tbl)
    # a COW delete rewrites touched files WITHOUT the spec
    snapshot_delete(spark, tbl, [("k", "==", 40)], mode="cow")
    m = read_manifest(tbl)
    assert any("partition" not in f for f in m["files"])  # degraded
    snapshot_compact(spark, tbl, small_bytes=1 << 30)  # everything small
    m2 = read_manifest(tbl)
    assert m2["files"] and all("partition" in f for f in m2["files"])
    assert all(f["spec_id"] == 1 for f in m2["files"])
    # pruning over the compacted layout is strict again and exact
    where = [("ts", ">=", "2024-03-04 00:00:00")]
    kept = plan_files(tbl, where=where)
    assert 0 < len(kept) < len(plan_files(tbl))
    got = _rows(snapshot_read(spark, tbl, where=where))
    exp = _rows(
        _events(spark, 0, 2)
        .unionByName(_events(spark, 2, 30))
        .unionByName(_events(spark, 30, 58))
        .unionByName(_events(spark, 60, 88))
        .filter((F.col("ts") >= "2024-03-04") & (F.col("k") != 40))
    )
    assert got == exp


def test_partition_cli(spark, tmp_path, capsys):
    import json as _json
    import sys

    from scripts.agf_pipeline import main as pipeline_main

    tbl = str(tmp_path / "tbl")
    snapshot_write(_events(spark, 0, 5), tbl)
    argv = sys.argv

    def run(*extra):
        sys.argv = ["agf_pipeline.py", "partition", "--table", tbl, *extra]
        try:
            assert pipeline_main() == 0
        finally:
            sys.argv = argv
        return _json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    out = run("--set", "day:ts", "bucket:k:8")
    assert out["committed"] and out["spec"] == [["day", "ts"], ["bucket", "k", 8]]
    assert run()["spec"] == [["day", "ts"], ["bucket", "k", 8]]  # show
    out = run("--clear")
    assert out["committed"] and out["spec"] == []
