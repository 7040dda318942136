"""Merge-on-read deletion vectors (sources/snapshots.py, r6): a DELETE
with ``mode='dv'`` commits O(matches) position-delete entries instead of
copy-on-write rewriting files.  Pins the VERDICT r5 done-criteria:
DV delete ≡ COW delete result; CDC emits the deletes; snapshot_rowcount
stays exact; compaction applies and purges DVs; a DV commit no longer
conflicts with a concurrent disjoint rewrite."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from agf_data_ingestion_spark.sources.snapshots import (
    current_version,
    expire_snapshots,
    read_manifest,
    snapshot_compact,
    snapshot_delete,
    snapshot_diff,
    snapshot_history,
    snapshot_merge,
    snapshot_minmax,
    snapshot_read,
    snapshot_rowcount,
    snapshot_upsert,
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


def test_dv_delete_equals_cow_delete(spark, tmp_path):
    a = _mk(spark, tmp_path, "cow")
    b = _mk(spark, tmp_path, "dv")
    where = [("k", ">=", 10), ("k", "<", 20)]
    snapshot_delete(spark, a, where)  # cow default
    snapshot_delete(spark, b, where, mode="dv")
    assert _rows(snapshot_read(spark, a)) == _rows(snapshot_read(spark, b))
    assert len(_rows(snapshot_read(spark, b))) == 30


def test_dv_delete_rewrites_no_data_file(spark, tmp_path):
    tbl = _mk(spark, tmp_path)
    before = {f["path"] for f in read_manifest(tbl)["files"]}
    v = snapshot_delete(spark, tbl, [("k", "<", 10)], mode="dv")
    m = read_manifest(tbl, v)
    assert {f["path"] for f in m["files"]} == before  # O(matches): no rewrite
    dvd = [f for f in m["files"] if f.get("dv")]
    assert dvd and sum(i["n"] for f in dvd for i in f["dv"]) == 10
    # time travel still sees the pre-delete rows
    assert len(_rows(snapshot_read(spark, tbl, version=v - 1))) == 40
    assert len(_rows(snapshot_read(spark, tbl))) == 30


def test_dv_rowcount_exact_and_minmax_honest(spark, tmp_path):
    tbl = _mk(spark, tmp_path)
    assert snapshot_minmax(tbl, "k") == (0, 39)
    snapshot_delete(spark, tbl, [("k", "<", 5)], mode="dv")
    # overlapping second delete: positions stay disjoint by construction
    snapshot_delete(spark, tbl, [("k", "<", 8)], mode="dv")
    assert snapshot_rowcount(tbl) == 32 == snapshot_read(spark, tbl).count()
    # a DV'd file's stats may describe deleted rows: metadata MIN/MAX
    # must refuse rather than answer 0
    assert snapshot_minmax(tbl, "k") is None
    h = snapshot_history(tbl)[-1]
    assert h["total_rows"] == 32 and h["dv_rows"] == 8
    # no-op predicate: no commit at all
    v = current_version(tbl)
    assert snapshot_delete(spark, tbl, [("k", ">=", 1000)], mode="dv") == v


def test_dv_read_with_pruning_predicates(spark, tmp_path):
    tbl = _mk(spark, tmp_path)
    snapshot_delete(spark, tbl, [("k", "==", 12)], mode="dv")
    got = _rows(snapshot_read(spark, tbl, where=[("k", ">=", 10), ("k", "<", 15)]))
    assert got == [(10, "v10"), (11, "v11"), (13, "v13"), (14, "v14")]


def test_cdc_emits_dv_deletes(spark, tmp_path):
    tbl = _mk(spark, tmp_path)
    v0 = current_version(tbl)
    v1 = snapshot_delete(spark, tbl, [("k", ">=", 38)], mode="dv")
    d = snapshot_diff(spark, tbl, v_from=v0, v_to=v1)
    got = sorted((r["_change"], r["k"]) for r in d.collect())
    assert got == [("delete", 38), ("delete", 39)]


def test_cdc_stream_emits_dv_deletes(spark, tmp_path):
    from agf_data_ingestion_spark.sources.snapshot_stream import SnapshotCDCSource

    tbl = _mk(spark, tmp_path)
    snapshot_delete(spark, tbl, [("k", "<", 3)], mode="dv")
    spark.dataSource.register(SnapshotCDCSource)
    q = (
        spark.readStream.format("agf_snapshot_cdc")
        .option("table", tbl)
        .load()
        .writeStream.format("memory")
        .queryName("dv_cdc")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select _change, k from dv_cdc").collect()
    dels = sorted(r["k"] for r in rows if r["_change"] == "delete")
    ins = sorted(r["k"] for r in rows if r["_change"] == "insert")
    assert dels == [0, 1, 2] and ins == list(range(40))


def test_compaction_applies_and_purges_dvs(spark, tmp_path):
    tbl = _mk(spark, tmp_path)
    snapshot_delete(spark, tbl, [("k", "<", 10)], mode="dv")
    dv_files = {
        p
        for f in read_manifest(tbl)["files"]
        for i in f.get("dv") or []
        for p in i["paths"]
    }
    assert dv_files
    want = _rows(snapshot_read(spark, tbl))
    snapshot_compact(spark, tbl, small_bytes=1)  # DV'd entries compact anyway
    m = read_manifest(tbl)
    assert not any(f.get("dv") for f in m["files"])
    assert _rows(snapshot_read(spark, tbl)) == want
    assert snapshot_minmax(tbl, "k") == (10, 39)  # metadata answers again
    # expiry reclaims the now-unreferenced DV files
    expire_snapshots(tbl, keep_last=1, orphan_grace_s=0.0)
    assert all(not os.path.exists(p) for p in dv_files)


def test_dv_then_merge_and_upsert_semantics(spark, tmp_path):
    tbl = _mk(spark, tmp_path, n=20, files=2)
    snapshot_delete(spark, tbl, [("k", "==", 5)], mode="dv")
    # upsert sees the merged view: a DV-deleted key is insertable again
    snapshot_upsert(
        spark.createDataFrame([(5, "back")], "k long, v string"), tbl, keys=["k"]
    )
    assert (5, "back") in _rows(snapshot_read(spark, tbl))
    # merge rewrites touched files off the merged view (no resurrection)
    snapshot_delete(spark, tbl, [("k", "==", 7)], mode="dv")
    snapshot_merge(
        spark.createDataFrame([(6, "SIX")], "k long, v string"), tbl, keys=["k"]
    )
    rows = _rows(snapshot_read(spark, tbl))
    assert (6, "SIX") in rows and all(k != 7 for k, _ in rows)
    assert snapshot_rowcount(tbl) == len(rows)


def test_dv_commit_composes_with_disjoint_rewrite(spark, tmp_path):
    """A DV delete and a compaction of DISJOINT files both commit (the
    r5 OCC model extended: a DV commit is an entry change, validated at
    file granularity)."""
    tbl = str(tmp_path / "tbl")
    lo = spark.range(0, 20).select(F.col("id").alias("k"), F.lit("x").alias("v"))
    hi = spark.range(20, 40).select(F.col("id").alias("k"), F.lit("y").alias("v"))
    snapshot_write(lo, tbl, cluster_by=["k"], cluster_files=2)
    snapshot_write(hi, tbl, cluster_by=["k"], cluster_files=2)

    import threading

    errs: list[Exception] = []

    def _dv():
        try:
            snapshot_delete(spark, tbl, [("k", "<", 5)], mode="dv")
        except Exception as e:  # pragma: no cover
            errs.append(e)

    def _merge_hi():
        try:
            snapshot_merge(
                spark.createDataFrame([(30, "z")], "k long, v string"),
                tbl,
                keys=["k"],
            )
        except Exception as e:  # pragma: no cover
            errs.append(e)

    t1, t2 = threading.Thread(target=_dv), threading.Thread(target=_merge_hi)
    t1.start(); t2.start(); t1.join(); t2.join()
    assert not errs and current_version(tbl) == 4
    rows = _rows(snapshot_read(spark, tbl))
    assert len(rows) == 35 and (30, "z") in rows and all(k >= 5 for k, _ in rows)
    assert snapshot_rowcount(tbl) == 35


def test_same_file_dv_races_converge(spark, tmp_path):
    """Two concurrent DV deletes hitting the SAME file: entry-identity
    validation forces one to recompute on the winner's entry — both
    deletes land, counts stay exact."""
    tbl = _mk(spark, tmp_path, n=20, files=1)

    import threading

    errs: list[Exception] = []

    def _del(where):
        def run():
            try:
                snapshot_delete(spark, tbl, where, mode="dv")
            except Exception as e:  # pragma: no cover
                errs.append(e)
        return run

    t1 = threading.Thread(target=_del([("k", "<", 3)]))
    t2 = threading.Thread(target=_del([("k", ">=", 17)]))
    t1.start(); t2.start(); t1.join(); t2.join()
    assert not errs
    rows = _rows(snapshot_read(spark, tbl))
    assert [k for k, _ in rows] == list(range(3, 17))
    assert snapshot_rowcount(tbl) == 14


def test_dv_restore_and_expiry_keep_dv_files(spark, tmp_path):
    from agf_data_ingestion_spark.sources.snapshots import snapshot_restore

    tbl = _mk(spark, tmp_path)
    v_dv = snapshot_delete(spark, tbl, [("k", "<", 10)], mode="dv")
    snapshot_write(
        spark.createDataFrame([(100, "new")], "k long, v string"), tbl
    )
    # expiry keeping the DV'd version must keep its DV files
    expire_snapshots(tbl, keep_last=2, orphan_grace_s=0.0)
    assert snapshot_read(spark, tbl, version=v_dv).count() == 30
    v_r = snapshot_restore(tbl, v_dv)
    assert v_r > v_dv and snapshot_rowcount(tbl) == 30


def test_merge_dv_equals_merge_cow(spark, tmp_path):
    """mode='dv' MERGE (shadow matched rows + append batch) produces the
    same reader-visible table as the copy-on-write merge, without
    rewriting any pre-existing data file."""
    a = _mk(spark, tmp_path, "cowm")
    b = _mk(spark, tmp_path, "dvm")
    batch = spark.createDataFrame(
        [(5, "FIVE"), (15, "FIFTEEN"), (100, "NEW")], "k long, v string"
    )
    snapshot_merge(batch, a, keys=["k"])
    before = {f["path"] for f in read_manifest(b)["files"]}
    snapshot_merge(batch, b, keys=["k"], mode="dv")
    assert _rows(snapshot_read(spark, a)) == _rows(snapshot_read(spark, b))
    after = read_manifest(b)["files"]
    assert before <= {f["path"] for f in after}  # no pre-existing rewrite
    assert any(f.get("dv") for f in after)
    assert snapshot_rowcount(b) == 41 == snapshot_read(spark, b).count()


def test_merge_dv_cdc_emits_update_as_delete_insert(spark, tmp_path):
    tbl = _mk(spark, tmp_path)
    v0 = current_version(tbl)
    batch = spark.createDataFrame([(7, "SEVEN")], "k long, v string")
    v1 = snapshot_merge(batch, tbl, keys=["k"], mode="dv")
    d = snapshot_diff(spark, tbl, v_from=v0, v_to=v1)
    got = sorted((r["_change"], r["k"], r["v"]) for r in d.collect())
    assert got == [("delete", 7, "v7"), ("insert", 7, "SEVEN")]


def test_merge_dv_insert_only_batch(spark, tmp_path):
    tbl = _mk(spark, tmp_path, n=10, files=1)
    batch = spark.createDataFrame([(50, "x"), (51, "y")], "k long, v string")
    snapshot_merge(batch, tbl, keys=["k"], mode="dv")
    assert snapshot_rowcount(tbl) == 12
    assert not any(f.get("dv") for f in read_manifest(tbl)["files"])


def test_dv_delete_on_relative_table_path(spark, tmp_path):
    """Manifests may store RELATIVE paths (os.path.join verbatim) while
    DV records are keyed by the scan's absolute _metadata.file_path —
    the counts lookup must normalize or the delete silently no-ops.
    (Relative paths resolve against the shared Python/JVM cwd; the test
    builds one that lands in tmp_path.)"""
    tbl = os.path.relpath(str(tmp_path / "rel_tbl"), os.getcwd())
    assert not os.path.isabs(tbl)
    df = spark.range(30).select(
        F.col("id").alias("k"), F.concat(F.lit("v"), F.col("id")).alias("v")
    )
    snapshot_write(df, tbl, cluster_by=["k"], cluster_files=2)
    v = snapshot_delete(spark, tbl, [("k", "<", 10)], mode="dv")
    assert v == 2  # a real commit, not a silent no-op
    assert snapshot_rowcount(tbl) == 20 == snapshot_read(spark, tbl).count()
    # CDC over the relative-path table also applies the DVs
    d = snapshot_diff(spark, tbl, v_from=1, v_to=2)
    assert sorted(r["k"] for r in d.collect() if r["_change"] == "delete") == list(
        range(10)
    )


def test_dv_anti_join_broadcasts_int_ids_not_paths(spark, tmp_path):
    """r7 (VERDICT r6 finding #3): the merge-on-read anti-join's broadcast
    side must carry (int file id, position) rows — never the absolute-path
    string per position — and the byte guard must hint the broadcast for
    a bounded set."""
    tbl = _mk(spark, tmp_path)
    snapshot_delete(spark, tbl, [("k", "<", 10)], mode="dv")
    df = snapshot_read(spark, tbl)
    plan = df._jdf.queryExecution().executedPlan().toString()
    anti = [l for l in plan.splitlines() if "LeftAnti" in l]
    assert anti, plan
    # the anti-join keys are the encoded id + position, not the path
    assert all("_dv_fid" in l and "_dv_pos" in l for l in anti), anti
    assert all("_dv_fp" not in l for l in anti), anti
    assert "BroadcastHashJoin" in anti[0], anti  # guard hinted the build side
    assert df.count() == 30  # and the merged read is still exact
