"""snapshot_maintain (r8, VERDICT r7 ask #3): policy-gated maintenance —
a churned table (small-file appends + DV deletes + zero-read equality
deletes) converges in ONE policy pass to a bounded file count with
rowcount/minmax restored to metadata-exact; a healthy table is a
provable no-op."""

from __future__ import annotations

from pyspark.sql import functions as F

from agf_data_ingestion_spark.sources.snapshots import (
    current_version,
    read_manifest,
    snapshot_delete,
    snapshot_delete_keys,
    snapshot_maintain,
    snapshot_minmax,
    snapshot_read,
    snapshot_rowcount,
    snapshot_table_health,
    snapshot_write,
)


def _churn(spark, tmp_path, name="tbl"):
    """12 tiny appends, a DV delete, and an eq delete — all three debts."""
    tbl = str(tmp_path / name)
    for lo in range(0, 120, 10):
        snapshot_write(
            spark.range(lo, lo + 10)
            .select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
            .coalesce(1),
            tbl,
        )
    snapshot_delete(spark, tbl, [("k", "<", 5)], mode="dv")
    snapshot_delete_keys(spark.createDataFrame([(110,), (111,)], "k long"), tbl)
    return tbl


def test_churned_table_converges_in_one_policy_pass(spark, tmp_path):
    tbl = _churn(spark, tmp_path)
    import pytest

    with pytest.raises(RuntimeError, match="equality deletes"):
        snapshot_rowcount(tbl)  # honest refusal while eq items are live
    report = snapshot_maintain(spark, tbl, keep_last=1, orphan_grace_s=0.0)
    assert report["compacted"] is True
    fired = {k for k, t in report["triggers"].items() if t["fired"]}
    assert fired == {"small_files", "eq_items"}  # dv_ppm under 10% here
    assert report["paths_reclaimed"] > 0
    # bounded file count: 12 tiny files + rewrites collapse to ~1
    assert report["after"]["files"] <= 2
    assert report["after"]["eq_items"] == 0
    assert report["after"]["dv_positions"] == 0
    # metadata answers are exact again, and match the data
    rows = sorted(r["k"] for r in snapshot_read(spark, tbl).collect())
    assert rows == [k for k in range(5, 120) if k not in (110, 111)]
    assert report["metadata_rowcount"] == snapshot_rowcount(tbl) == len(rows)
    assert snapshot_minmax(tbl, "k") == (5, 119)


def test_healthy_table_is_a_noop(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    snapshot_write(
        spark.range(100).select(F.col("id").alias("k")).coalesce(1), tbl
    )
    v = current_version(tbl)
    report = snapshot_maintain(
        spark, tbl, policy={"small_bytes": 1}  # nothing is "small"
    )
    assert not any(t["fired"] for t in report["triggers"].values())
    assert report["compacted"] is False
    assert current_version(tbl) == v  # no commit happened
    assert report["metadata_rowcount"] == 100


def test_dv_ppm_trigger_fires_alone(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    snapshot_write(
        spark.range(100).select(F.col("id").alias("k")).coalesce(1), tbl
    )
    snapshot_delete(spark, tbl, [("k", "<", 30)], mode="dv")  # 30% shadowed
    h = snapshot_table_health(tbl)
    assert h["dv_ppm"] == 300_000 and h["eq_items"] == 0
    report = snapshot_maintain(
        spark, tbl, policy={"small_bytes": 1, "max_small_files": 10**6}
    )
    assert report["triggers"]["dv_ppm"]["fired"]
    assert report["compacted"] and report["after"]["dv_positions"] == 0
    assert snapshot_rowcount(tbl) == 70


def test_maintain_cli_policy_mode(spark, tmp_path, capsys):
    import json
    import sys

    from scripts.agf_pipeline import main as pipeline_main

    tbl = _churn(spark, tmp_path)
    argv = sys.argv
    sys.argv = [
        "agf_pipeline.py", "maintain", "--table", tbl, "--policy",
        "--keep-last", "1", "--orphan-grace-s", "0",
    ]
    try:
        rc = pipeline_main()
    finally:
        sys.argv = argv
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["compacted"] is True
    assert out["metadata_rowcount"] == 113
    # second run: healthy now, nothing fires, nothing commits
    v = current_version(tbl)
    report = snapshot_maintain(spark, tbl)
    assert not any(t["fired"] for t in report["triggers"].values())
    assert current_version(tbl) == v
