"""Predicate UPDATE (sources/snapshots.py `snapshot_update`, OP-X-UPDATE):
the DML statement completing INSERT/DELETE/MERGE.  Pins the r6 ADVICE
finding: cow ≡ dv reader equivalence, no-op on zero matches, CDC
delete(old)+insert(new), SET sees the OLD row, retype raises
SchemaEvolutionError, and concurrent same-file commits recompute and
converge (the `_commit_rewrite` entry-identity rule)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from agf_data_ingestion_spark.sources.snapshots import (
    SchemaEvolutionError,
    current_version,
    read_manifest,
    snapshot_delete,
    snapshot_diff,
    snapshot_read,
    snapshot_rowcount,
    snapshot_update,
    snapshot_write,
)


def _rows(df):
    return sorted((r["k"], r["v"]) for r in df.select("k", "v").collect())


def _mk(spark, tmp_path, name="tbl", n=40, files=4):
    tbl = str(tmp_path / name)
    df = spark.range(n).select(
        F.col("id").alias("k"), F.concat(F.lit("v"), F.col("id")).alias("v")
    )
    snapshot_write(df, tbl, cluster_by=["k"], cluster_files=files)
    return tbl


def test_update_cow_equals_dv(spark, tmp_path):
    a = _mk(spark, tmp_path, "cow")
    b = _mk(spark, tmp_path, "dv")
    where = [("k", ">=", 10), ("k", "<", 20)]
    sets = {"v": "concat(v, '!')"}
    snapshot_update(spark, a, where, sets)  # cow default
    before = {f["path"] for f in read_manifest(b)["files"]}
    snapshot_update(spark, b, where, sets, mode="dv")
    assert _rows(snapshot_read(spark, a)) == _rows(snapshot_read(spark, b))
    got = _rows(snapshot_read(spark, b))
    assert sum(1 for _, v in got if v.endswith("!")) == 10 and len(got) == 40
    # dv mode: no pre-existing data file rewritten, matched rows shadowed
    after = read_manifest(b)["files"]
    assert before <= {f["path"] for f in after}
    assert any(f.get("dv") for f in after)
    assert snapshot_rowcount(b) == 40 == snapshot_read(spark, b).count()


@pytest.mark.parametrize("mode", ["cow", "dv"])
def test_update_noop_on_zero_matches(spark, tmp_path, mode):
    tbl = _mk(spark, tmp_path, f"noop_{mode}")
    v = current_version(tbl)
    # stats prove no file admits the predicate: no commit at all
    assert snapshot_update(spark, tbl, [("k", ">=", 1000)], {"v": "'x'"}, mode=mode) == v
    # files admit the range but no row matches (k=7 deleted first): dv
    # mode detects zero positions post-scan and must also not commit
    snapshot_delete(spark, tbl, [("k", "==", 7)])
    v2 = current_version(tbl)
    assert (
        snapshot_update(spark, tbl, [("k", "==", 7)], {"v": "'x'"}, mode="dv") == v2
    )


@pytest.mark.parametrize("mode", ["cow", "dv"])
def test_update_cdc_emits_delete_plus_insert(spark, tmp_path, mode):
    tbl = _mk(spark, tmp_path, f"cdc_{mode}")
    v0 = current_version(tbl)
    v1 = snapshot_update(spark, tbl, [("k", "==", 7)], {"v": "'SEVEN'"}, mode=mode)
    d = snapshot_diff(spark, tbl, v_from=v0, v_to=v1)
    got = sorted((r["_change"], r["k"], r["v"]) for r in d.collect())
    assert got == [("delete", 7, "v7"), ("insert", 7, "SEVEN")]


def test_update_set_sees_old_row(spark, tmp_path):
    # standard UPDATE semantics: every SET expression evaluates against
    # the OLD row — expressions never observe each other's writes
    tbl = str(tmp_path / "old")
    df = spark.createDataFrame([(1, "a", "b"), (2, "c", "d")], "k long, x string, y string")
    snapshot_write(df, tbl)
    snapshot_update(spark, tbl, [("k", "==", 1)], {"x": "y", "y": "x"})
    row = {r["k"]: (r["x"], r["y"]) for r in snapshot_read(spark, tbl).collect()}
    assert row[1] == ("b", "a") and row[2] == ("c", "d")


def test_update_null_predicate_rows_kept_unchanged(spark, tmp_path):
    # a NULL predicate verdict means UNMATCHED (the COALESCE rule): the
    # row must survive the update with its old values, in both modes
    for mode in ("cow", "dv"):
        tbl = str(tmp_path / f"nullp_{mode}")
        df = spark.createDataFrame([(1, "a"), (None, "n"), (5, "b")], "k long, v string")
        snapshot_write(df, tbl)
        snapshot_update(spark, tbl, [("k", "<", 3)], {"v": "upper(v)"}, mode=mode)
        got = {(r["k"], r["v"]) for r in snapshot_read(spark, tbl).collect()}
        assert got == {(1, "A"), (None, "n"), (5, "b")}


def test_update_retype_raises_schema_evolution_error(spark, tmp_path):
    tbl = _mk(spark, tmp_path, n=10, files=1)
    v = current_version(tbl)
    for mode in ("cow", "dv"):
        with pytest.raises(SchemaEvolutionError):
            # v: string -> bigint is a type fork, refused at the commit point
            snapshot_update(spark, tbl, [("k", "<", 5)], {"v": "k"}, mode=mode)
    assert current_version(tbl) == v  # nothing committed
    assert _rows(snapshot_read(spark, tbl)) == [(i, f"v{i}") for i in range(10)]


def test_update_unknown_column_raises(spark, tmp_path):
    tbl = _mk(spark, tmp_path, n=10, files=1)
    with pytest.raises(ValueError, match="no such column"):
        snapshot_update(spark, tbl, [("k", "<", 5)], {"zz": "'x'"})


def test_update_concurrent_same_file_commits_recompute(spark, tmp_path):
    """Two concurrent UPDATEs hitting the SAME file: the loser's
    `_commit_rewrite` sees a changed entry and recomputes on the winner's
    state — both updates land, rowcount stays exact (cow × dv matrix
    covered by running one of each)."""
    import threading

    tbl = _mk(spark, tmp_path, n=20, files=1)
    errs: list[Exception] = []

    def _upd(where, sets, mode):
        def run():
            try:
                snapshot_update(spark, tbl, where, sets, mode=mode)
            except Exception as e:  # pragma: no cover
                errs.append(e)

        return run

    t1 = threading.Thread(target=_upd([("k", "<", 3)], {"v": "'lo'"}, "dv"))
    t2 = threading.Thread(target=_upd([("k", ">=", 17)], {"v": "'hi'"}, "cow"))
    t1.start(); t2.start(); t1.join(); t2.join()
    assert not errs
    got = _rows(snapshot_read(spark, tbl))
    assert len(got) == 20 == snapshot_rowcount(tbl)
    assert [v for k, v in got if k < 3] == ["lo"] * 3
    assert [v for k, v in got if k >= 17] == ["hi"] * 3
    assert [v for k, v in got if 3 <= k < 17] == [f"v{k}" for k in range(3, 17)]


def test_update_dv_then_read_with_pruning(spark, tmp_path):
    # updated rows live in NEW files; stats-pruned reads must still see
    # exactly the post-update state
    tbl = _mk(spark, tmp_path)
    snapshot_update(spark, tbl, [("k", "==", 12)], {"v": "'TWELVE'"}, mode="dv")
    got = _rows(snapshot_read(spark, tbl, where=[("k", ">=", 10), ("k", "<", 15)]))
    assert got == [(10, "v10"), (11, "v11"), (12, "TWELVE"), (13, "v13"), (14, "v14")]
