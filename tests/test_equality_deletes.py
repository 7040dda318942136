"""Equality deletes (sources/snapshots.py r7, OP-X-EQDELETE): DELETE-BY-KEY
and eq-MERGE commit O(batch) key rows with ZERO reads of the table — the
Iceberg-v2 equality-delete rung under r6's position-delete one.  Pins the
VERDICT r6 done-criteria: eq ≡ COW/position-DV results, CDC nets exactly,
streaming upsert micro-batches commit O(batch) with zero target reads,
metadata rowcount refuses honestly, compaction converts eq → physical →
reclaimed, and the sequence rule exempts same-commit and later files."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from agf_data_ingestion_spark.sources import snapshots as S
from agf_data_ingestion_spark.sources.snapshots import (
    current_version,
    expire_snapshots,
    read_manifest,
    snapshot_compact,
    snapshot_delete,
    snapshot_delete_keys,
    snapshot_diff,
    snapshot_history,
    snapshot_merge,
    snapshot_minmax,
    snapshot_read,
    snapshot_restore,
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


def _keys(spark, vals, col="k", dtype="long"):
    return spark.createDataFrame([(v,) for v in vals], f"{col} {dtype}")


def test_eq_delete_equals_cow_and_position_dv(spark, tmp_path):
    a = _mk(spark, tmp_path, "cow")
    b = _mk(spark, tmp_path, "posdv")
    c = _mk(spark, tmp_path, "eq")
    where = [("k", ">=", 10), ("k", "<", 20)]
    snapshot_delete(spark, a, where)
    snapshot_delete(spark, b, where, mode="dv")
    snapshot_delete_keys(_keys(spark, range(10, 20)), c)
    want = _rows(snapshot_read(spark, a))
    assert want == _rows(snapshot_read(spark, b)) == _rows(snapshot_read(spark, c))
    assert len(want) == 30
    # zero-rewrite, zero-DV commit: same data entries, no dv items, one
    # manifest-level eq item carrying the key fileset
    m = read_manifest(c)
    assert not any(f.get("dv") for f in m["files"])
    assert len(m["eq_deletes"]) == 1 and m["eq_deletes"][0]["n"] == 10
    assert m["eq_deletes"][0]["key_cols"] == ["k"]


def test_eq_delete_never_reads_the_table(spark, tmp_path, monkeypatch):
    """The whole point: the writer commits knowing only the keys."""
    tbl = _mk(spark, tmp_path)
    calls = []
    monkeypatch.setattr(
        S, "_read_entries", lambda *a, **k: calls.append(1) or 1 / 0
    )
    snapshot_delete_keys(_keys(spark, [1, 2, 3]), tbl)
    assert not calls  # no merge-on-read scan, no positions computed
    monkeypatch.undo()
    assert len(_rows(snapshot_read(spark, tbl))) == 37


def test_eq_merge_equals_cow_merge_with_zero_target_reads(spark, tmp_path, monkeypatch):
    a = _mk(spark, tmp_path, "cowm")
    b = _mk(spark, tmp_path, "eqm")
    batch = spark.createDataFrame(
        [(5, "FIVE"), (15, "FIFTEEN"), (100, "NEW")], "k long, v string"
    )
    snapshot_merge(batch, a, keys=["k"])
    before = {f["path"] for f in read_manifest(b)["files"]}
    calls = []
    monkeypatch.setattr(
        S, "_read_entries", lambda *a, **k: calls.append(1) or 1 / 0
    )
    snapshot_merge(batch, b, keys=["k"], mode="eq")
    assert not calls  # the target was never scanned
    monkeypatch.undo()
    assert _rows(snapshot_read(spark, a)) == _rows(snapshot_read(spark, b))
    assert before <= {f["path"] for f in read_manifest(b)["files"]}


def test_eq_merge_same_sequence_rule(spark, tmp_path):
    """The eq item is stamped at the SAME sequence as the batch it rides
    with: it shadows prior copies of the keys, never the batch itself —
    and a LATER append of a deleted key survives."""
    tbl = _mk(spark, tmp_path, n=10, files=1)
    snapshot_merge(
        spark.createDataFrame([(3, "THREE")], "k long, v string"),
        tbl,
        keys=["k"],
        mode="eq",
    )
    rows = _rows(snapshot_read(spark, tbl))
    assert (3, "THREE") in rows and (3, "v3") not in rows and len(rows) == 10
    # delete key 7, then append it back: the append's sequence is later
    snapshot_delete_keys(_keys(spark, [7]), tbl)
    snapshot_write(
        spark.createDataFrame([(7, "BACK")], "k long, v string"), tbl
    )
    rows = _rows(snapshot_read(spark, tbl))
    assert (7, "BACK") in rows and (7, "v7") not in rows
    # upsert sees the merged view: the eq-deleted key is insertable again
    snapshot_delete_keys(_keys(spark, [8]), tbl)
    snapshot_upsert(
        spark.createDataFrame([(8, "UP")], "k long, v string"), tbl, keys=["k"]
    )
    assert (8, "UP") in _rows(snapshot_read(spark, tbl))


def test_eq_cdc_diff_nets_exactly(spark, tmp_path):
    tbl = _mk(spark, tmp_path)
    v0 = current_version(tbl)
    v1 = snapshot_delete_keys(_keys(spark, [38, 39]), tbl)
    d = snapshot_diff(spark, tbl, v_from=v0, v_to=v1)
    got = sorted((r["_change"], r["k"]) for r in d.collect())
    assert got == [("delete", 38), ("delete", 39)]
    # eq-merge update surfaces as delete(old) + insert(new)
    v2 = snapshot_merge(
        spark.createDataFrame([(7, "SEVEN")], "k long, v string"),
        tbl,
        keys=["k"],
        mode="eq",
    )
    d2 = snapshot_diff(spark, tbl, v_from=v1, v_to=v2)
    got2 = sorted((r["_change"], r["k"], r["v"]) for r in d2.collect())
    assert got2 == [("delete", 7, "v7"), ("insert", 7, "SEVEN")]


def test_eq_cdc_stream_emits_deletes(spark, tmp_path):
    from agf_data_ingestion_spark.sources.snapshot_stream import SnapshotCDCSource

    tbl = _mk(spark, tmp_path, n=10, files=2)
    snapshot_delete_keys(_keys(spark, [0, 1]), tbl)
    spark.dataSource.register(SnapshotCDCSource)
    q = (
        spark.readStream.format("agf_snapshot_cdc")
        .option("table", tbl)
        .load()
        .writeStream.format("memory")
        .queryName("eq_cdc")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select _change, k from eq_cdc").collect()
    dels = sorted(r["k"] for r in rows if r["_change"] == "delete")
    ins = sorted(r["k"] for r in rows if r["_change"] == "insert")
    assert dels == [0, 1] and ins == list(range(10))


def test_eq_rowcount_refuses_minmax_none_history_honest(spark, tmp_path):
    tbl = _mk(spark, tmp_path)
    snapshot_delete_keys(_keys(spark, [5]), tbl)
    with pytest.raises(RuntimeError, match="equality deletes"):
        snapshot_rowcount(tbl)
    assert snapshot_minmax(tbl, "k") is None
    h = snapshot_history(tbl)[-1]
    assert h["total_rows"] is None and h["eq_delete_keys"] == 1
    assert snapshot_read(spark, tbl).count() == 39  # the read is exact
    # pre-delete version still answers from metadata
    assert snapshot_rowcount(tbl, version=1) == 40


def test_eq_compaction_applies_gcs_and_expiry_reclaims(spark, tmp_path):
    tbl = _mk(spark, tmp_path)
    snapshot_delete_keys(_keys(spark, range(0, 10)), tbl)
    eq_files = [p for it in read_manifest(tbl)["eq_deletes"] for p in it["paths"]]
    assert eq_files and all(os.path.exists(p) for p in eq_files)
    want = _rows(snapshot_read(spark, tbl))
    snapshot_compact(spark, tbl, small_bytes=1)  # eq-shadowed entries compact anyway
    m = read_manifest(tbl)
    assert not m.get("eq_deletes")  # fully applied -> GC'd at the commit
    assert _rows(snapshot_read(spark, tbl)) == want
    assert snapshot_rowcount(tbl) == 30 and snapshot_minmax(tbl, "k") == (10, 39)
    expire_snapshots(tbl, keep_last=1, orphan_grace_s=0.0)
    assert all(not os.path.exists(p) for p in eq_files)


def test_eq_noop_when_stats_disprove(spark, tmp_path):
    tbl = _mk(spark, tmp_path)
    v = current_version(tbl)
    # every live file's k-range is [0, 39]: stats prove nothing matches
    assert snapshot_delete_keys(_keys(spark, [1000, 2000]), tbl) == v
    assert not read_manifest(tbl).get("eq_deletes")


def test_eq_validation(spark, tmp_path):
    tbl = _mk(spark, tmp_path, n=10, files=1)
    with pytest.raises(ValueError, match="no such column"):
        snapshot_delete_keys(_keys(spark, [1], col="zz"), tbl)
    with pytest.raises(ValueError, match="type mismatch"):
        snapshot_delete_keys(_keys(spark, [1], dtype="int"), tbl)
    with pytest.raises(ValueError, match="NULL key"):
        snapshot_delete_keys(_keys(spark, [1, None]), tbl)


def test_eq_multi_column_keys(spark, tmp_path):
    tbl = str(tmp_path / "mk")
    df = spark.range(20).select(
        (F.col("id") % 4).alias("a"),
        F.col("id").alias("k"),
        F.lit("x").alias("v"),
    )
    snapshot_write(df, tbl)
    snapshot_delete_keys(
        spark.createDataFrame([(1, 5), (2, 6)], "a long, k long"), tbl
    )
    got = sorted(r["k"] for r in snapshot_read(spark, tbl).collect())
    assert got == sorted(set(range(20)) - {5, 6})


def test_eq_pruned_read_and_time_travel_and_restore(spark, tmp_path):
    tbl = _mk(spark, tmp_path)
    v_eq = snapshot_delete_keys(_keys(spark, [12]), tbl)
    got = _rows(snapshot_read(spark, tbl, where=[("k", ">=", 10), ("k", "<", 15)]))
    assert got == [(10, "v10"), (11, "v11"), (13, "v13"), (14, "v14")]
    # the pre-delete version reads WITHOUT the eq context
    assert len(_rows(snapshot_read(spark, tbl, version=v_eq - 1))) == 40
    snapshot_write(spark.createDataFrame([(100, "new")], "k long, v string"), tbl)
    v_r = snapshot_restore(tbl, v_eq)
    assert v_r > v_eq
    rows = _rows(snapshot_read(spark, tbl))
    assert len(rows) == 39 and all(k != 12 for k, _ in rows)


def test_eq_streaming_upsert_micro_batches(spark, tmp_path, monkeypatch):
    """The streaming-CDC-upsert shape: a sequence of eq-merge micro-batch
    commits, each O(batch) with zero target reads, converges to the same
    table as one big merge — batch-chop independence."""
    one = _mk(spark, tmp_path, "oneshot", n=30, files=3)
    chop = _mk(spark, tmp_path, "chopped", n=30, files=3)
    updates = [(k, f"u{k}") for k in range(0, 30, 3)] + [(100 + i, f"n{i}") for i in range(4)]
    snapshot_merge(
        spark.createDataFrame(updates, "k long, v string"), one, keys=["k"]
    )
    calls = []
    orig = S._read_entries
    monkeypatch.setattr(
        S, "_read_entries", lambda *a, **k: calls.append(1) or orig(*a, **k)
    )
    for i in range(0, len(updates), 5):  # 3 micro-batches
        snapshot_merge(
            spark.createDataFrame(updates[i : i + 5], "k long, v string"),
            chop,
            keys=["k"],
            mode="eq",
        )
    assert not calls  # every micro-batch committed with zero target reads
    monkeypatch.undo()
    assert _rows(snapshot_read(spark, one)) == _rows(snapshot_read(spark, chop))
    # later micro-batches correctly shadow earlier ones' keys too
    snapshot_merge(
        spark.createDataFrame([(0, "u0-final")], "k long, v string"),
        chop,
        keys=["k"],
        mode="eq",
    )
    assert (0, "u0-final") in _rows(snapshot_read(spark, chop))
    assert (0, "u0") not in _rows(snapshot_read(spark, chop))


def test_eq_racing_compaction_recomputes(spark, tmp_path):
    """An equality delete landing under a compaction forces the compaction
    to recompute (rebasing would resurrect the deleted keys inside the
    freshly-sequenced rewrite) — both effects land."""
    import threading

    tbl = _mk(spark, tmp_path, n=20, files=4)
    errs: list[Exception] = []

    def _eq():
        try:
            snapshot_delete_keys(_keys(spark, [2, 11]), tbl)
        except Exception as e:  # pragma: no cover
            errs.append(e)

    def _compact():
        try:
            snapshot_compact(spark, tbl, small_bytes=1 << 30)
        except Exception as e:  # pragma: no cover
            errs.append(e)

    t1, t2 = threading.Thread(target=_eq), threading.Thread(target=_compact)
    t1.start(); t2.start(); t1.join(); t2.join()
    assert not errs
    rows = _rows(snapshot_read(spark, tbl))
    assert [k for k, _ in rows] == [k for k in range(20) if k not in (2, 11)]


def test_eq_on_branch_and_publish(spark, tmp_path):
    from agf_data_ingestion_spark.sources.branches import (
        branch_root,
        snapshot_branch,
        snapshot_branch_publish,
    )

    tbl = _mk(spark, tmp_path, n=20, files=2)
    # live eq on the parent forks with the branch
    snapshot_delete_keys(_keys(spark, [0]), tbl)
    root = snapshot_branch(tbl, "scrub")
    assert len(_rows(snapshot_read(spark, root))) == 19
    # branch-local eq delete stays isolated, then publishes back
    snapshot_delete_keys(_keys(spark, [5, 6]), root)
    assert len(_rows(snapshot_read(spark, root))) == 17
    assert len(_rows(snapshot_read(spark, tbl))) == 19
    snapshot_branch_publish(tbl, "scrub", drop=True)
    rows = _rows(snapshot_read(spark, tbl))
    assert len(rows) == 17 and all(k not in (0, 5, 6) for k, _ in rows)
    assert not os.path.isdir(branch_root(tbl, "scrub"))


def test_fork_and_restore_never_restamp_legacy_entries(spark, tmp_path):
    """r7 review finding: a pre-r7 table's UNSTAMPED entries read as seq 0
    forever.  A branch fork (parent=0 commit) must not stamp them fresh —
    that would exempt them from the eq deletes travelling in the same
    manifest and resurrect the deleted rows on the branch."""
    import json as _json

    from agf_data_ingestion_spark.sources import snapshots as SS
    from agf_data_ingestion_spark.sources.branches import snapshot_branch

    tbl = _mk(spark, tmp_path, "legacy", n=10, files=1)
    # forge a pre-r7 table: strip seq from every committed entry
    m_raw = _json.load(open(SS._manifest_path(tbl, 1)))
    for name in m_raw["segments"]:
        p = f"{tbl}/_snapshots/segs/{name}"
        ent = _json.load(open(p))
        for e in ent:
            e.pop("seq", None)
        _json.dump(ent, open(p, "w"))
    SS._SEG_CACHE.clear()
    assert all("seq" not in f for f in SS.read_manifest(tbl)["files"])
    snapshot_delete_keys(_keys(spark, [3, 4]), tbl)
    assert snapshot_read(spark, tbl).count() == 8
    root = snapshot_branch(tbl, "fork")
    # the fork must still see the erasure (entries stayed unstamped/seq-0)
    assert snapshot_read(spark, root).count() == 8
    m = S.read_manifest(root)
    assert m.get("eq_deletes"), "fork GC'd the live eq item"
    # ... and a restore of the eq'd version keeps it erased too
    snapshot_write(spark.createDataFrame([(99, "x")], "k long, v string"), tbl)
    from agf_data_ingestion_spark.sources.snapshots import snapshot_restore

    snapshot_restore(tbl, 2)
    assert snapshot_read(spark, tbl).count() == 8


def test_merge_eq_null_delete_keys_refused(spark, tmp_path):
    tbl = _mk(spark, tmp_path, "nulldel", n=5, files=1)
    with pytest.raises(ValueError, match="NULL-keyed delete_keys"):
        snapshot_merge(
            spark.createDataFrame([(1, "u")], "k long, v string"),
            tbl,
            keys=["k"],
            mode="eq",
            delete_keys=spark.createDataFrame([(None,)], "k long"),
        )


def test_update_and_merge_over_live_eq_respect_the_merged_view(spark, tmp_path):
    """snapshot_update / cow-merge on a table carrying a LIVE eq item must
    read the merged view: eq-deleted rows never resurrect into rewrites,
    and the rewritten files (fresh sequence) stay exempt afterwards."""
    from agf_data_ingestion_spark.sources.snapshots import snapshot_update

    tbl = _mk(spark, tmp_path, "upd_eq", n=20, files=2)
    snapshot_delete_keys(_keys(spark, [3, 15]), tbl)
    snapshot_update(spark, tbl, [("k", "<", 10)], {"v": "upper(v)"})  # cow
    got = dict(_rows(snapshot_read(spark, tbl)))
    assert 3 not in got and 15 not in got and len(got) == 18
    assert got[5] == "V5" and got[12] == "v12"
    # the cow rewrite of the low file applied + outlived the eq item for
    # that file; the untouched high file still carries it
    snapshot_merge(
        spark.createDataFrame([(16, "SIXTEEN")], "k long, v string"), tbl, keys=["k"]
    )
    got = dict(_rows(snapshot_read(spark, tbl)))
    assert 15 not in got and got[16] == "SIXTEEN" and len(got) == 18


def test_delete_keys_after_rename_uses_logical_names(spark, tmp_path):
    from agf_data_ingestion_spark.sources.snapshots import (
        snapshot_rename_column,
    )

    tbl = _mk(spark, tmp_path, "ren_then_eq", n=10, files=1)
    snapshot_rename_column(tbl, "k", "key")
    # keys address the LOGICAL name; bounds translate to the physical one
    snapshot_delete_keys(
        spark.createDataFrame([(4,)], "key long"), tbl
    )
    got = sorted(r["key"] for r in snapshot_read(spark, tbl).collect())
    assert got == [0, 1, 2, 3, 5, 6, 7, 8, 9]
    # and the stats-disproof no-op still engages through the translation
    v = current_version(tbl)
    assert snapshot_delete_keys(
        spark.createDataFrame([(1000,)], "key long"), tbl
    ) == v
