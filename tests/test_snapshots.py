"""Snapshot table format (sources/snapshots.py): atomic commits, time
travel, idempotent upsert-as-a-commit, compaction invariance, and snapshot
expiry."""

from __future__ import annotations

import os

import pytest

from agf_data_ingestion_spark.sources.snapshots import (
    NoSuchVersionError,
    current_version,
    expire_snapshots,
    read_manifest,
    snapshot_compact,
    snapshot_read,
    snapshot_upsert,
    snapshot_write,
)


def _rows(df):
    return sorted((r["k"], r["v"]) for r in df.collect())


def test_append_overwrite_and_time_travel(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    v1 = snapshot_write(spark.createDataFrame([(1, "a")], "k long, v string"), tbl)
    v2 = snapshot_write(spark.createDataFrame([(2, "b")], "k long, v string"), tbl)
    assert (v1, v2) == (1, 2)
    assert _rows(snapshot_read(spark, tbl)) == [(1, "a"), (2, "b")]
    assert _rows(snapshot_read(spark, tbl, version=1)) == [(1, "a")]

    v3 = snapshot_write(
        spark.createDataFrame([(9, "z")], "k long, v string"), tbl, mode="overwrite"
    )
    assert v3 == 3 and current_version(tbl) == 3
    assert _rows(snapshot_read(spark, tbl)) == [(9, "z")]
    # overwrite does not disturb history
    assert _rows(snapshot_read(spark, tbl, version=2)) == [(1, "a"), (2, "b")]
    with pytest.raises(NoSuchVersionError):
        snapshot_read(spark, tbl, version=7)


def test_upsert_is_idempotent_single_commit(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    batch = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    v1 = snapshot_upsert(batch, tbl, keys=["k"])
    v_again = snapshot_upsert(batch, tbl, keys=["k"])
    # full re-delivery commits NOTHING (no empty snapshot, no new version)
    assert (v1, v_again) == (1, 1)
    mixed = spark.createDataFrame([(2, "dup"), (3, "c")], "k long, v string")
    v2 = snapshot_upsert(mixed, tbl, keys=["k"])
    assert v2 == 2
    assert _rows(snapshot_read(spark, tbl)) == [(1, "a"), (2, "b"), (3, "c")]


def test_compaction_preserves_rows_and_history(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    for i in range(5):  # five tiny commits = five small files at least
        snapshot_write(
            spark.createDataFrame([(i, f"v{i}")], "k long, v string").coalesce(1), tbl
        )
    before = _rows(snapshot_read(spark, tbl))
    files_before = len(read_manifest(tbl)["files"])
    v = snapshot_compact(spark, tbl, small_bytes=8 << 20)
    assert v == 6
    assert _rows(snapshot_read(spark, tbl)) == before
    assert len(read_manifest(tbl)["files"]) < files_before
    # a reader pinned to v5 still sees the PRE-compaction file list, intact
    assert _rows(snapshot_read(spark, tbl, version=5)) == before
    assert len(read_manifest(tbl, 5)["files"]) == files_before


def test_expiry_drops_unreferenced_files_keeps_current(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    for i in range(3):
        snapshot_write(
            spark.createDataFrame([(i, "x")], "k long, v string").coalesce(1), tbl
        )
    snapshot_write(
        spark.createDataFrame([(99, "y")], "k long, v string"), tbl, mode="overwrite"
    )
    deleted = expire_snapshots(tbl, keep_last=1)
    assert deleted  # the three pre-overwrite data files + old manifests
    assert _rows(snapshot_read(spark, tbl)) == [(99, "y")]
    with pytest.raises(NoSuchVersionError):
        snapshot_read(spark, tbl, version=2)
    # no orphaned parquet files left outside the retained manifest
    retained = {f["path"] for f in read_manifest(tbl)["files"]}
    on_disk = set()
    for sub in os.listdir(os.path.join(tbl, "data")):
        d = os.path.join(tbl, "data", sub)
        on_disk.update(
            os.path.join(d, n) for n in os.listdir(d) if n.endswith(".parquet")
        )
    assert on_disk == retained


def test_streaming_ingest_into_snapshot_sink(spark, lake, tmp_path):
    """backfill(sink='snapshot') must land the same tables as the plain
    sink, every table readable only through committed manifests, and a full
    re-delivery (fresh checkpoint over the same lake) must not advance any
    table version (exactly-once at the commit level)."""
    import datetime as dt
    import os

    from agf_data_ingestion_spark.streaming.ingest_stream import backfill

    now = dt.datetime(2024, 6, 1)
    wh_p = str(tmp_path / "wh_parquet")
    wh_s = str(tmp_path / "wh_snapshot")
    backfill(spark, lake["root"], wh_p, str(tmp_path / "ck_p"), now=now)
    backfill(spark, lake["root"], wh_s, str(tmp_path / "ck_s"), now=now, sink="snapshot")

    for table in ("sync_runs", "experiments"):
        plain = sorted(
            tuple(r) for r in spark.read.parquet(os.path.join(wh_p, table)).collect()
        )
        snap = sorted(
            tuple(r) for r in snapshot_read(spark, os.path.join(wh_s, table)).collect()
        )
        assert plain == snap, table
    # file_inventory: key-set equality (duplicate winners are arrival-order
    # dependent in both sinks, same as the stream/backfill invariant)
    kp = sorted(
        map(tuple, spark.read.parquet(os.path.join(wh_p, "file_inventory"))
            .select("experiment_id", "file_path").collect())
    )
    ks = sorted(
        map(tuple, snapshot_read(spark, os.path.join(wh_s, "file_inventory"))
            .select("experiment_id", "file_path").collect())
    )
    assert kp == ks

    versions = {
        t: current_version(os.path.join(wh_s, t))
        for t in ("sync_runs", "experiments", "file_inventory")
    }
    backfill(spark, lake["root"], wh_s, str(tmp_path / "ck_s2"), now=now, sink="snapshot")
    for t, v in versions.items():
        assert current_version(os.path.join(wh_s, t)) == v, t


def test_snapshot_diff_is_row_level_cdc(spark, tmp_path):
    from agf_data_ingestion_spark.sources.snapshots import snapshot_diff

    tbl = str(tmp_path / "tbl")
    snapshot_write(spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"), tbl)
    # v2 = update k=2 (delete+insert), insert k=3 (overwrite with new state)
    snapshot_write(
        spark.createDataFrame([(1, "a"), (2, "B"), (3, "c")], "k long, v string"),
        tbl, mode="overwrite",
    )
    d = snapshot_diff(spark, tbl, v_from=1, v_to=2)
    changes = sorted((r["_change"], r["k"], r["v"]) for r in d.collect())
    assert changes == [
        ("delete", 2, "b"),
        ("insert", 2, "B"),
        ("insert", 3, "c"),
    ]
    # self-diff is empty
    assert snapshot_diff(spark, tbl, v_from=2, v_to=2).count() == 0


def test_incremental_reconcile_audits_only_the_delta(spark, tmp_path):
    from pyspark.sql import functions as F

    from agf_data_ingestion_spark.operators.reconcile import reconcile_incremental

    tbl = str(tmp_path / "tracked")
    snapshot_write(
        spark.createDataFrame([("raw/a/1",), ("raw/a/2",)], "s3_key string"), tbl
    )
    v1 = current_version(tbl)
    snapshot_write(
        spark.createDataFrame([("raw/b/3",), ("raw/b/4",)], "s3_key string"), tbl
    )
    # storage has everything from v2 except raw/b/4 (a DB orphan), plus an
    # untracked object raw/b/9 (a storage orphan)
    storage = spark.createDataFrame(
        [("raw/a/1",), ("raw/a/2",), ("raw/b/3",), ("raw/b/9",)], "key string"
    )
    res = reconcile_incremental(spark, storage, tbl, v_from=v1)
    # tracked side is ONLY the delta (2 keys), not the whole table
    assert res.tracked_count == 2
    assert res.orphaned_in_db == 1 and res.sample_db == ["raw/b/4"]
    # storage side is checked against the FULL current tracked set:
    # raw/a/* were tracked before v_from and must NOT be false positives
    assert res.orphaned_in_storage == 1
    assert res.sample_storage == ["raw/b/9"]
    # a fully in-sync table yields in_sync even when storage predates v_from
    in_sync = reconcile_incremental(
        spark,
        spark.createDataFrame(
            [("raw/a/1",), ("raw/a/2",), ("raw/b/3",), ("raw/b/4",)], "key string"
        ),
        tbl,
        v_from=v1,
    )
    assert in_sync.status == "in_sync"


def test_compaction_with_zorder_clustering(spark, tmp_path):
    """compact(sort_by=zkey) must produce files covering disjoint tight key
    ranges (the min/max-stat pruning contract) while preserving rows."""
    from pyspark.sql import functions as F

    from agf_data_ingestion_spark.functions.zorder import zorder2

    tbl = str(tmp_path / "tbl")
    for i in range(4):
        df = spark.range(i * 100, (i + 1) * 100).select(
            F.col("id").alias("a"), (F.col("id") * 7 % 400).alias("b")
        ).coalesce(1)
        snapshot_write(df.withColumn("zkey", zorder2("a", "b")), tbl)
    before = sorted(r["a"] for r in snapshot_read(spark, tbl).collect())

    snapshot_compact(spark, tbl, small_bytes=8 << 20, sort_by=["zkey"])
    after_df = snapshot_read(spark, tbl)
    assert sorted(r["a"] for r in after_df.collect()) == before

    # per-file zkey ranges must be non-overlapping (range repartition)
    files = read_manifest(tbl)["files"]
    ranges = []
    for f in files:
        pdf = spark.read.parquet(f["path"]).agg(
            F.min("zkey").alias("lo"), F.max("zkey").alias("hi")
        ).collect()[0]
        ranges.append((pdf["lo"], pdf["hi"]))
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, ranges


def test_schema_evolution_add_column(spark, tmp_path):
    """A commit adding a column evolves the current schema (nulls backfill
    older files); time-traveling to a pre-evolution version keeps the
    narrow schema."""
    tbl = str(tmp_path / "tbl")
    snapshot_write(spark.createDataFrame([(1, "a")], "k long, v string"), tbl)
    snapshot_write(
        spark.createDataFrame([(2, "b", "extra")], "k long, v string, note string"), tbl
    )
    cur = snapshot_read(spark, tbl)
    assert set(f.name for f in cur.schema.fields) == {"k", "v", "note"}
    rows = {r["k"]: r["note"] for r in cur.collect()}
    assert rows == {1: None, 2: "extra"}
    old = snapshot_read(spark, tbl, version=1)
    assert [f.name for f in old.schema.fields] == ["k", "v"]


def test_manifest_stats_prune_file_opens(spark, tmp_path):
    """A predicate read must OPEN only the files whose min/max stats admit
    the predicate — the manifest-level data-skipping contract."""
    from agf_data_ingestion_spark.sources.snapshots import plan_files

    tbl = str(tmp_path / "tbl")
    # 4 single-file commits with disjoint k-ranges: [0,100), [100,200), ...
    for i in range(4):
        df = spark.range(i * 100, (i + 1) * 100).selectExpr(
            "id as k", "concat('v', id) as v"
        ).coalesce(1)
        snapshot_write(df, tbl)

    m = read_manifest(tbl)
    assert len(m["files"]) == 4
    assert all("stats" in f and "k" in f["stats"] for f in m["files"])

    # point predicate: exactly one file planned and opened
    planned = plan_files(tbl, where=[("k", "==", 150)])
    assert len(planned) == 1
    df = snapshot_read(spark, tbl, where=[("k", "==", 150)])
    assert len(df.inputFiles()) == 1
    assert [r["k"] for r in df.collect()] == [150]

    # range predicate spanning two files
    df2 = snapshot_read(spark, tbl, where=[("k", ">=", 150), ("k", "<", 250)])
    assert len(df2.inputFiles()) == 2
    assert sorted(r["k"] for r in df2.collect()) == list(range(150, 250))

    # predicate outside every range: zero matching rows, schema intact
    df3 = snapshot_read(spark, tbl, where=[("k", ">", 10_000)])
    assert df3.count() == 0
    assert df3.columns == ["k", "v"]

    # string-column stats prune too
    df4 = snapshot_read(spark, tbl, where=[("v", "==", "v0")])
    assert len(df4.inputFiles()) == 1

    # results are EXACT where ranges merely overlap: unpruned-but-filtered
    full = sorted(
        r["k"] for r in snapshot_read(spark, tbl).filter("k >= 150 and k < 250").collect()
    )
    assert sorted(r["k"] for r in df2.collect()) == full


def test_zorder_compaction_enables_stat_pruning(spark, tmp_path):
    """After compact(sort_by=zkey) the reader must prune on the clustered
    zkey bounds — the point of the Z-order layout."""
    from pyspark.sql import functions as F

    from agf_data_ingestion_spark.functions.zorder import zorder2
    from agf_data_ingestion_spark.sources.snapshots import plan_files

    tbl = str(tmp_path / "tbl")
    for i in range(4):
        df = spark.range(i * 100, (i + 1) * 100).select(
            F.col("id").alias("a"), (F.col("id") * 7 % 400).alias("b")
        ).coalesce(1)
        snapshot_write(df.withColumn("zkey", zorder2("a", "b")), tbl)
    snapshot_compact(spark, tbl, small_bytes=8 << 20, sort_by=["zkey"])

    files = read_manifest(tbl)["files"]
    assert all("zkey" in f["stats"] for f in files)
    if len(files) > 1:
        lo = min(f["stats"]["zkey"][0] for f in files)
        planned = plan_files(tbl, where=[("zkey", "<=", lo)])
        assert len(planned) < len(files)


def test_snapshot_delete_copy_on_write(spark, tmp_path):
    """Predicate DELETE: matching rows gone from the new version, history
    intact, files whose stats exclude the predicate carried over UNTOUCHED
    (copy-on-write rewrites only overlapping files), stats-proven no-op
    deletes commit nothing."""
    from agf_data_ingestion_spark.sources.snapshots import snapshot_delete

    tbl = str(tmp_path / "del_tbl")
    lo = spark.range(0, 100).selectExpr("id AS k", "CAST(id AS STRING) AS v")
    hi = spark.range(100, 200).selectExpr("id AS k", "CAST(id AS STRING) AS v")
    v1 = snapshot_write(lo.coalesce(1), tbl)
    v2 = snapshot_write(hi.coalesce(1), tbl)
    hi_paths = {
        f["path"]
        for f in read_manifest(tbl, v2)["files"]
        if f["stats"]["k"][0] >= 100
    }
    assert hi_paths, "the second commit's files must carry k >= 100 stats"

    v3 = snapshot_delete(spark, tbl, [("k", "<", 50)])
    assert v3 == 3 and current_version(tbl) == 3
    got = sorted(r["k"] for r in snapshot_read(spark, tbl).collect())
    assert got == list(range(50, 200))
    # history unaffected (physical removal is expiry's job)
    assert sorted(r["k"] for r in snapshot_read(spark, tbl, version=v2).collect()) == list(range(200))
    # copy-on-write: the non-overlapping files were reused verbatim
    new_paths = {f["path"] for f in read_manifest(tbl, v3)["files"]}
    assert hi_paths <= new_paths
    # the rewritten file(s) are new paths, not edits of old ones
    lo_paths = {f["path"] for f in read_manifest(tbl, v2)["files"]} - hi_paths
    assert not (lo_paths & new_paths)

    # stats prove no file overlaps -> no-op, version unchanged
    assert snapshot_delete(spark, tbl, [("k", ">", 10_000)]) == v3
    assert current_version(tbl) == v3

    # delete everything that remains in the low file: empty rewrite leaves
    # no empty part files in the manifest
    v4 = snapshot_delete(spark, tbl, [("k", "<", 100)])
    assert sorted(r["k"] for r in snapshot_read(spark, tbl).collect()) == list(range(100, 200))
    assert all(
        f["stats"]["k"][0] >= 100 for f in read_manifest(tbl, v4)["files"]
    )


def test_snapshot_diff_scans_only_file_delta(spark, tmp_path):
    """CDC over the file-list delta: an append's diff is exactly its rows,
    and a compaction (same rows, new files) nets to ZERO changes — both
    provable because unchanged files cancel in the multiset difference."""
    from agf_data_ingestion_spark.sources.snapshots import snapshot_diff

    tbl = str(tmp_path / "cdc_tbl")
    snapshot_write(
        spark.range(0, 50).selectExpr("id AS k", "id * 2 AS v").coalesce(4), tbl
    )
    snapshot_write(
        spark.range(50, 60).selectExpr("id AS k", "id * 2 AS v").coalesce(1), tbl
    )
    d12 = snapshot_diff(spark, tbl, v_from=1, v_to=2)
    rows = [(r["k"], r["_change"]) for r in d12.collect()]
    assert sorted(rows) == [(k, "insert") for k in range(50, 60)]

    v3 = snapshot_compact(spark, tbl, small_bytes=1 << 30)  # force full rewrite
    assert v3 == 3
    assert snapshot_diff(spark, tbl, v_from=2, v_to=3).count() == 0


def test_snapshot_delete_keeps_null_predicate_rows(spark, tmp_path):
    """DELETE removes only rows where the predicate is TRUE: a NULL
    predicate (NULL column value) must KEEP the row — and the outcome
    must not depend on whether the row's file was stats-pruned."""
    from agf_data_ingestion_spark.sources.snapshots import snapshot_delete

    tbl = str(tmp_path / "null_del")
    rows = [(1, 50.0), (2, None), (3, 150.0), (4, None)]
    snapshot_write(
        spark.createDataFrame(rows, "k long, v double").coalesce(1), tbl
    )
    snapshot_delete(spark, tbl, [("v", ">=", 100.0)])
    got = sorted((r["k"], r["v"]) for r in snapshot_read(spark, tbl).collect())
    assert got == [(1, 50.0), (2, None), (4, None)]


def test_as_of_timestamp_time_travel(spark, tmp_path):
    import time as _time

    from agf_data_ingestion_spark.sources.snapshots import (
        snapshot_history,
        version_as_of,
    )

    tbl = str(tmp_path / "tbl")
    snapshot_write(spark.createDataFrame([(1, "a")], "k long, v string"), tbl)
    t_between = _time.time()
    _time.sleep(0.01)
    snapshot_write(spark.createDataFrame([(2, "b")], "k long, v string"), tbl)

    assert version_as_of(tbl, t_between) == 1
    assert version_as_of(tbl, _time.time()) == 2
    assert _rows(snapshot_read(spark, tbl, as_of=t_between)) == [(1, "a")]
    assert _rows(snapshot_read(spark, tbl, as_of=_time.time())) == [
        (1, "a"),
        (2, "b"),
    ]
    # before the first commit: no snapshot to resolve
    first_ts = snapshot_history(tbl)[0]["committed_at"]
    with pytest.raises(NoSuchVersionError):
        version_as_of(tbl, first_ts - 1.0)
    with pytest.raises(ValueError):
        snapshot_read(spark, tbl, version=1, as_of=t_between)


def test_history_metadata_table(spark, tmp_path):
    from agf_data_ingestion_spark.sources.snapshots import snapshot_history

    tbl = str(tmp_path / "tbl")
    snapshot_write(spark.createDataFrame([(1, "a")], "k long, v string"), tbl)
    snapshot_write(spark.createDataFrame([(2, "b")], "k long, v string"), tbl)
    snapshot_write(
        spark.createDataFrame([(9, "z")], "k long, v string"), tbl, mode="overwrite"
    )
    h = snapshot_history(tbl)
    assert [r["version"] for r in h] == [1, 2, 3]
    assert [r["parent"] for r in h] == [0, 1, 2]
    assert [r["op"] for r in h] == ["append", "append", "overwrite"]
    # append accumulates files; overwrite resets the live set
    assert h[1]["n_files"] > h[0]["n_files"]
    assert h[2]["n_files"] < h[1]["n_files"]
    assert all(r["total_bytes"] > 0 for r in h)
    assert h[0]["committed_at"] <= h[1]["committed_at"] <= h[2]["committed_at"]


def test_as_of_skips_expired_versions(spark, tmp_path):
    import time as _time

    from agf_data_ingestion_spark.sources.snapshots import (
        snapshot_history,
        version_as_of,
    )

    tbl = str(tmp_path / "tbl")
    for k in (1, 2, 3):
        snapshot_write(spark.createDataFrame([(k, "x")], "k long, v string"), tbl)
    expire_snapshots(tbl, keep_last=2)
    # v1's manifest is gone: history starts at v2, as_of(now) still resolves
    assert [r["version"] for r in snapshot_history(tbl)] == [2, 3]
    assert version_as_of(tbl, _time.time()) == 3


def test_merge_updates_and_inserts(spark, tmp_path):
    from agf_data_ingestion_spark.sources.snapshots import snapshot_merge

    tbl = str(tmp_path / "tbl")
    snapshot_write(
        spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k long, v string"), tbl
    )
    v2 = snapshot_merge(
        spark.createDataFrame([(2, "B"), (4, "d")], "k long, v string"), tbl, keys=["k"]
    )
    assert v2 == 2
    assert _rows(snapshot_read(spark, tbl)) == [(1, "a"), (2, "B"), (3, "c"), (4, "d")]
    # time travel still sees the pre-merge row
    assert _rows(snapshot_read(spark, tbl, version=1)) == [(1, "a"), (2, "b"), (3, "c")]
    # merge into an empty table is a plain insert
    tbl2 = str(tmp_path / "tbl2")
    snapshot_merge(spark.createDataFrame([(1, "x")], "k long, v string"), tbl2, keys=["k"])
    assert _rows(snapshot_read(spark, tbl2)) == [(1, "x")]


def test_merge_rejects_duplicate_keys(spark, tmp_path):
    from agf_data_ingestion_spark.sources.snapshots import snapshot_merge

    tbl = str(tmp_path / "tbl")
    snapshot_write(spark.createDataFrame([(1, "a")], "k long, v string"), tbl)
    with pytest.raises(ValueError, match="not unique"):
        snapshot_merge(
            spark.createDataFrame([(2, "x"), (2, "y")], "k long, v string"),
            tbl,
            keys=["k"],
        )


def test_merge_rewrites_only_overlapping_files(spark, tmp_path):
    from agf_data_ingestion_spark.sources.snapshots import (
        read_manifest,
        snapshot_merge,
    )

    tbl = str(tmp_path / "tbl")
    # two commits with DISJOINT key ranges → disjoint file stats
    snapshot_write(
        spark.createDataFrame([(i, "lo") for i in range(10)], "k long, v string")
        .coalesce(1),
        tbl,
    )
    snapshot_write(
        spark.createDataFrame([(i, "hi") for i in range(100, 110)], "k long, v string")
        .coalesce(1),
        tbl,
    )
    before = {f["path"] for f in read_manifest(tbl)["files"]}
    lo_files = {
        f["path"] for f in read_manifest(tbl)["files"] if f["stats"]["k"][1] < 100
    }
    snapshot_merge(
        spark.createDataFrame([(5, "LO")], "k long, v string"), tbl, keys=["k"]
    )
    after = {f["path"] for f in read_manifest(tbl)["files"]}
    # the hi-range file is carried over untouched; the lo file was rewritten
    assert (before - lo_files) <= after
    assert not (lo_files & after)
    got = dict(_rows(snapshot_read(spark, tbl)))
    assert got[5] == "LO" and got[105] == "hi" and len(got) == 20


def test_tags_pin_releases_through_expiry(spark, tmp_path):
    from agf_data_ingestion_spark.sources.snapshots import (
        snapshot_tag,
        snapshot_tags,
        snapshot_untag,
    )

    tbl = str(tmp_path / "tbl")
    snapshot_write(spark.createDataFrame([(1, "a")], "k long, v string"), tbl)
    snapshot_tag(tbl, "corpus-v1.0")
    for k in (2, 3, 4):
        snapshot_write(spark.createDataFrame([(k, "x")], "k long, v string"), tbl)
    expire_snapshots(tbl, keep_last=1)
    # v1 survives expiry because the tag pins it
    assert snapshot_tags(tbl) == {"corpus-v1.0": 1}
    assert _rows(snapshot_read(spark, tbl, tag="corpus-v1.0")) == [(1, "a")]
    # tags are immutable; untag then expiry reclaims
    with pytest.raises(ValueError, match="immutable"):
        snapshot_tag(tbl, "corpus-v1.0")
    snapshot_untag(tbl, "corpus-v1.0")
    expire_snapshots(tbl, keep_last=1)
    with pytest.raises(NoSuchVersionError):
        snapshot_read(spark, tbl, tag="corpus-v1.0")
    with pytest.raises(NoSuchVersionError):
        snapshot_read(spark, tbl, version=1)


def test_tag_validation(spark, tmp_path):
    from agf_data_ingestion_spark.sources.snapshots import snapshot_tag

    tbl = str(tmp_path / "tbl")
    snapshot_write(spark.createDataFrame([(1, "a")], "k long, v string"), tbl)
    for bad in ("", "../evil", "a/b", ".hidden"):
        with pytest.raises(ValueError):
            snapshot_tag(tbl, bad)


# ---------------------------------------------------------------------------
# Optimistic concurrency (r4): CAS manifest reservation + conflict rebase
# ---------------------------------------------------------------------------


def test_cas_reservation_and_pointer_repair(spark, tmp_path):
    from agf_data_ingestion_spark.sources.snapshots import (
        CommitConflict,
        _bump_current,
        _publish,
        _repair_current,
    )

    tbl = str(tmp_path / "tbl")
    snapshot_write(spark.createDataFrame([(1, "a")], "k long, v string"), tbl)
    files = read_manifest(tbl)["files"]
    # second reservation of the same version must lose the CAS
    v2 = _publish(tbl, files, parent=1, op="append")
    assert v2 == 2
    with pytest.raises(CommitConflict):
        _publish(tbl, files, parent=1, op="append")
    # pointer never regresses
    _bump_current(tbl, 1)
    assert current_version(tbl) == 2
    # simulate a writer that crashed between reservation and pointer bump:
    # v3 manifest exists, CURRENT still says 2 -> repair rolls forward
    import json as _json

    mpath = os.path.join(tbl, "_snapshots", "v-00000003.json")
    with open(mpath, "w") as fh:
        _json.dump({"version": 3, "parent": 2, "op": "append", "files": files}, fh)
    assert _repair_current(tbl) == 3
    assert current_version(tbl) == 3
    # and the next writer commits v4 on top, not a clash at v3
    v4 = snapshot_write(spark.createDataFrame([(2, "b")], "k long, v string"), tbl)
    assert v4 == 4


def _run_racers(n, fn):
    """Run ``fn(i)`` in n threads, all released together; returns results."""
    import threading

    barrier = threading.Barrier(n, timeout=120)
    results: list = [None] * n
    errors: list = []

    def runner(i):
        try:
            results[i] = fn(i, barrier)
        except Exception as exc:  # pragma: no cover - surfaced by assert
            errors.append(exc)

    threads = [threading.Thread(target=runner, args=(i,)) for i in range(n)]
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=300)
    assert not errors, errors
    return results


def test_concurrent_disjoint_upserts_both_commit(spark, tmp_path, monkeypatch):
    """VERDICT r3 #4: two concurrent snapshot_upsert writers on DISJOINT
    keys must both commit (no lost update, no serial table lock) and the
    history must show both versions.  The race is made deterministic by
    holding every writer at a barrier AFTER its data files are written but
    BEFORE the CAS — both therefore attempt the same parent version and
    one must rebase."""
    import threading

    from agf_data_ingestion_spark.sources import snapshots as snap

    tbl = str(tmp_path / "tbl")
    real_write = snap._write_data_files
    gate = threading.Barrier(2, timeout=120)
    passed = threading.local()

    def gated_write(df, table, **kw):
        files = real_write(df, table, **kw)
        if not getattr(passed, "done", False):
            passed.done = True
            gate.wait()
        return files

    monkeypatch.setattr(snap, "_write_data_files", gated_write)

    def writer(i, barrier):
        df = spark.createDataFrame([(i * 10 + j, f"w{i}") for j in range(3)], "k long, v string")
        barrier.wait()
        return snapshot_upsert(df, tbl, keys=["k"])

    versions = _run_racers(2, writer)
    assert sorted(versions) == [1, 2], versions
    from agf_data_ingestion_spark.sources.snapshots import snapshot_history

    hist = snapshot_history(tbl)
    assert [h["version"] for h in hist] == [1, 2]
    assert all(h["op"] == "upsert" for h in hist)
    got = sorted((r["k"], r["v"]) for r in snapshot_read(spark, tbl).collect())
    assert got == [(j, "w0") for j in range(3)] + [(10 + j, "w1") for j in range(3)]


def test_concurrent_overlapping_upserts_first_writer_wins(spark, tmp_path, monkeypatch):
    """Same deterministic race, fully-OVERLAPPING keys: exactly one copy of
    each key survives (first-writer-wins), the loser's batch is absorbed,
    and the loser returns the winner's version without committing one."""
    import threading

    from agf_data_ingestion_spark.sources import snapshots as snap

    tbl = str(tmp_path / "tbl")
    real_write = snap._write_data_files
    gate = threading.Barrier(2, timeout=120)
    passed = threading.local()

    def gated_write(df, table, **kw):
        files = real_write(df, table, **kw)
        if not getattr(passed, "done", False):
            passed.done = True
            gate.wait()
        return files

    monkeypatch.setattr(snap, "_write_data_files", gated_write)

    def writer(i, barrier):
        df = spark.createDataFrame([(j, f"w{i}") for j in range(3)], "k long, v string")
        barrier.wait()
        return snapshot_upsert(df, tbl, keys=["k"])

    versions = _run_racers(2, writer)
    # one writer committed v1; the other found all keys taken -> returns 1
    assert sorted(versions) == [1, 1], versions
    assert current_version(tbl) == 1
    rows = snapshot_read(spark, tbl).collect()
    assert sorted(r["k"] for r in rows) == [0, 1, 2]
    assert len({r["v"] for r in rows}) == 1  # one writer's copy, atomically


def test_concurrent_partial_overlap_rebases(spark, tmp_path, monkeypatch):
    """Partial key overlap: the CAS loser drops the beaten keys, rewrites
    its batch files, and commits only its novel keys."""
    import threading

    from agf_data_ingestion_spark.sources import snapshots as snap

    tbl = str(tmp_path / "tbl")
    real_write = snap._write_data_files
    gate = threading.Barrier(2, timeout=120)
    passed = threading.local()

    def gated_write(df, table, **kw):
        files = real_write(df, table, **kw)
        if not getattr(passed, "done", False):
            passed.done = True
            gate.wait()
        return files

    monkeypatch.setattr(snap, "_write_data_files", gated_write)

    def writer(i, barrier):
        # writer 0: keys {0,1,2}; writer 1: keys {2,3,4} — overlap on 2
        df = spark.createDataFrame(
            [(j + i * 2, f"w{i}") for j in range(3)], "k long, v string"
        )
        barrier.wait()
        return snapshot_upsert(df, tbl, keys=["k"])

    versions = _run_racers(2, writer)
    assert sorted(versions) == [1, 2], versions
    rows = snapshot_read(spark, tbl).collect()
    by_key = {r["k"]: r["v"] for r in rows}
    assert sorted(by_key) == [0, 1, 2, 3, 4]
    assert len(rows) == 5  # the contested key exists exactly once


def _race_append_on_first_publish(spark, snap, monkeypatch, rows, schema):
    """Monkeypatch ``_publish`` so the FIRST commit attempt is beaten by an
    interleaved optimistic append of ``rows`` — the deterministic twin of
    an append landing between a rewrite's read and its commit."""
    real_publish = snap._publish
    fired = []

    def racing_publish(table, files, parent, op, **kw):
        if not fired and op != "append":
            fired.append(True)
            real_publish(
                table,
                snap.read_manifest(table)["files"]
                + snap._write_data_files(
                    spark.createDataFrame(rows, schema), table
                ),
                parent,
                "append",
            )
        return real_publish(table, files, parent, op, **kw)

    monkeypatch.setattr(snap, "_publish", racing_publish)


def test_rewrite_rebases_over_disjoint_occ_append(spark, tmp_path, monkeypatch):
    """r5 file-level OCC: a merge whose commit loses the CAS to an append
    OUTSIDE its key range must REBASE (no recompute — the winner's files
    carry through untouched), and nothing is silently dropped."""
    from agf_data_ingestion_spark.sources import snapshots as snap
    from agf_data_ingestion_spark.sources.snapshots import snapshot_merge

    tbl = str(tmp_path / "tbl")
    snapshot_write(spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"), tbl)
    _race_append_on_first_publish(
        spark, snap, monkeypatch, [(99, "appended")], "k long, v string"
    )
    v = snapshot_merge(
        spark.createDataFrame([(2, "B!")], "k long, v string"), tbl, keys=["k"]
    )
    assert v == 3  # append took v2, merge rebased and committed v3
    got = sorted((r["k"], r["v"]) for r in snapshot_read(spark, tbl).collect())
    assert got == [(1, "a"), (2, "B!"), (99, "appended")]
    from agf_data_ingestion_spark.sources.snapshots import snapshot_history

    assert [h["op"] for h in snapshot_history(tbl)] == ["append", "append", "merge"]


def test_merge_recomputes_over_inrange_occ_append(spark, tmp_path, monkeypatch):
    """r5 file-level OCC: an interleaved append INSIDE the merge's key
    range cannot be rebased over (its rows would shadow the merge) — the
    transaction recomputes and the merge's row replaces the appended copy
    too."""
    from agf_data_ingestion_spark.sources import snapshots as snap
    from agf_data_ingestion_spark.sources.snapshots import snapshot_merge

    tbl = str(tmp_path / "tbl")
    snapshot_write(spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"), tbl)
    # the racing append writes key 2 — the very key the merge replaces
    _race_append_on_first_publish(
        spark, snap, monkeypatch, [(2, "stale-race")], "k long, v string"
    )
    v = snapshot_merge(
        spark.createDataFrame([(2, "B!")], "k long, v string"), tbl, keys=["k"]
    )
    assert v == 3
    got = sorted((r["k"], r["v"]) for r in snapshot_read(spark, tbl).collect())
    # exactly one copy of key 2, and it is the merge's (serialized last)
    assert got == [(1, "a"), (2, "B!")]


def test_delete_recomputes_over_matching_occ_append(spark, tmp_path, monkeypatch):
    """r5 file-level OCC: DELETE serializes after every interleaved
    commit — an appended row matching the predicate is deleted by the
    recompute, never resurrected by a rebase (the GDPR semantics)."""
    from agf_data_ingestion_spark.sources import snapshots as snap
    from agf_data_ingestion_spark.sources.snapshots import snapshot_delete

    tbl = str(tmp_path / "tbl")
    snapshot_write(
        spark.createDataFrame([(1, "a"), (2, "b"), (50, "keep")], "k long, v string"),
        tbl,
    )
    _race_append_on_first_publish(
        spark, snap, monkeypatch, [(3, "late-match")], "k long, v string"
    )
    v = snapshot_delete(spark, tbl, where=[("k", "<=", 10)])
    assert v == 3
    got = sorted((r["k"], r["v"]) for r in snapshot_read(spark, tbl).collect())
    assert got == [(50, "keep")]


def test_compact_rebases_over_any_occ_append(spark, tmp_path, monkeypatch):
    """r5 file-level OCC: compaction rebases over ANY interleaved append —
    the appended file simply stays uncompacted in the new manifest."""
    from agf_data_ingestion_spark.sources import snapshots as snap
    from agf_data_ingestion_spark.sources.snapshots import (
        read_manifest,
        snapshot_compact,
        snapshot_history,
    )

    tbl = str(tmp_path / "tbl")
    for i in range(3):  # three small files via three appends
        snapshot_write(
            spark.createDataFrame([(i, f"v{i}")], "k long, v string"),
            tbl,
            mode="append",
        )
    _race_append_on_first_publish(
        spark, snap, monkeypatch, [(99, "inflight")], "k long, v string"
    )
    v = snapshot_compact(spark, tbl, small_bytes=8 << 20)
    assert v == 5  # appends v1-3, racing append v4, compact v5
    assert [h["op"] for h in snapshot_history(tbl)][-2:] == ["append", "compact"]
    got = sorted((r["k"], r["v"]) for r in snapshot_read(spark, tbl).collect())
    assert got == [(0, "v0"), (1, "v1"), (2, "v2"), (99, "inflight")]
    # the in-flight file is referenced verbatim (not rewritten by compact)
    appended_paths = {f["path"] for f in read_manifest(tbl, 4)["files"]} - {
        f["path"] for f in read_manifest(tbl, 3)["files"]
    }
    assert appended_paths <= {f["path"] for f in read_manifest(tbl, 5)["files"]}


def test_concurrent_disjoint_merges_both_commit(spark, tmp_path, monkeypatch):
    """r5 headline: two merges over DISJOINT key ranges touching DISJOINT
    files both commit — no table lock, no lost update; the CAS loser
    rebases at file granularity instead of recomputing."""
    import threading

    from agf_data_ingestion_spark.sources import snapshots as snap
    from agf_data_ingestion_spark.sources.snapshots import (
        snapshot_history,
        snapshot_merge,
    )

    tbl = str(tmp_path / "tbl")
    # two files with disjoint key ranges (separate appends)
    snapshot_write(
        spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"), tbl
    )
    snapshot_write(
        spark.createDataFrame([(11, "c"), (12, "d")], "k long, v string"),
        tbl,
        mode="append",
    )

    real_write = snap._write_data_files
    gate = threading.Barrier(2, timeout=120)
    passed = threading.local()

    def gated_write(df, table, **kw):
        files = real_write(df, table, **kw)
        if not getattr(passed, "done", False):
            passed.done = True
            gate.wait()
        return files

    monkeypatch.setattr(snap, "_write_data_files", gated_write)

    def writer(i, barrier):
        # writer 0 updates low-range keys, writer 1 high-range keys
        df = spark.createDataFrame([(1 + 10 * i, f"w{i}")], "k long, v string")
        barrier.wait()
        return snapshot_merge(df, tbl, keys=["k"])

    versions = _run_racers(2, writer)
    assert sorted(versions) == [3, 4], versions
    assert [h["op"] for h in snapshot_history(tbl)] == [
        "append",
        "append",
        "merge",
        "merge",
    ]
    got = sorted((r["k"], r["v"]) for r in snapshot_read(spark, tbl).collect())
    assert got == [(1, "w0"), (2, "b"), (11, "w1"), (12, "d")]


def test_concurrent_overlapping_merges_serialize_by_recompute(
    spark, tmp_path, monkeypatch
):
    """Two merges over the SAME key: the CAS loser detects the winner
    replaced its touched file, recomputes on fresh state, and both commits
    land — exactly one copy of the key survives (the recomputing loser's,
    serialized last)."""
    import threading

    from agf_data_ingestion_spark.sources import snapshots as snap
    from agf_data_ingestion_spark.sources.snapshots import (
        current_version,
        snapshot_history,
        snapshot_merge,
    )

    tbl = str(tmp_path / "tbl")
    snapshot_write(
        spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"), tbl
    )

    real_write = snap._write_data_files
    gate = threading.Barrier(2, timeout=120)
    passed = threading.local()

    def gated_write(df, table, **kw):
        files = real_write(df, table, **kw)
        if not getattr(passed, "done", False):
            passed.done = True
            gate.wait()
        return files

    monkeypatch.setattr(snap, "_write_data_files", gated_write)

    def writer(i, barrier):
        df = spark.createDataFrame([(2, f"w{i}")], "k long, v string")
        barrier.wait()
        return snapshot_merge(df, tbl, keys=["k"])

    versions = _run_racers(2, writer)
    assert sorted(versions) == [2, 3], versions
    assert current_version(tbl) == 3
    assert [h["op"] for h in snapshot_history(tbl)] == ["append", "merge", "merge"]
    rows = snapshot_read(spark, tbl).collect()
    by_key = {r["k"]: r["v"] for r in rows}
    assert len(rows) == 2 and sorted(by_key) == [1, 2]
    assert by_key[1] == "a" and by_key[2] in ("w0", "w1")


def test_expire_keeps_inflight_orphans_reclaims_old(spark, tmp_path, monkeypatch):
    """Vacuum-vs-writer safety: a data file in NO manifest may belong to an
    in-flight optimistic commit — expiry must keep it inside the grace
    window and reclaim it after; files referenced only by EXPIRED
    manifests are committed and reclaimable immediately."""
    import os as _os

    from agf_data_ingestion_spark.sources import snapshots as snap

    tbl = str(tmp_path / "tbl")
    # v1 overwritten by v2..v4 -> v1's file becomes expired-referenced
    for k in (1, 2, 3, 4):
        snapshot_write(
            spark.createDataFrame([(k, "x")], "k long, v string"),
            tbl,
            mode="overwrite",
        )
    # a fresh orphan: written data files with no manifest (in-flight shape)
    orphan_files = snap._write_data_files(
        spark.createDataFrame([(99, "o")], "k long, v string"), tbl
    )
    orphans = {f["path"] for f in orphan_files}
    deleted = set(expire_snapshots(tbl, keep_last=1))
    # in-flight orphans survive; the expired versions' files are gone
    assert orphans.isdisjoint(deleted)
    assert all(_os.path.exists(p) for p in orphans)
    assert any(p.endswith(".parquet") for p in deleted)
    # past the grace window the orphan is reclaimed
    deleted2 = set(expire_snapshots(tbl, keep_last=1, orphan_grace_s=0.0))
    assert orphans <= deleted2
    # the retained version is intact
    assert sorted(r["k"] for r in snapshot_read(spark, tbl).collect()) == [4]


def test_restore_rolls_back_as_new_commit(spark, tmp_path):
    from agf_data_ingestion_spark.sources.snapshots import (
        snapshot_restore,
        snapshot_tag,
    )

    tbl = str(tmp_path / "tbl")
    snapshot_write(spark.createDataFrame([(1, "a")], "k long, v string"), tbl)
    snapshot_tag(tbl, "golden")
    snapshot_write(spark.createDataFrame([(2, "bad")], "k long, v string"), tbl)
    snapshot_write(
        spark.createDataFrame([(9, "worse")], "k long, v string"), tbl, mode="overwrite"
    )
    assert current_version(tbl) == 3
    v = snapshot_restore(tbl, tag="golden")
    assert v == 4  # append-only history: restore is a NEW commit
    assert _rows(snapshot_read(spark, tbl)) == [(1, "a")]
    # the bad commits remain time-travelable
    assert _rows(snapshot_read(spark, tbl, version=3)) == [(9, "worse")]
    assert _rows(snapshot_read(spark, tbl, version=2)) == [(1, "a"), (2, "bad")]
    # restoring to the current state is a no-op (no empty commit)
    assert snapshot_restore(tbl, version=4) == 4
    assert current_version(tbl) == 4
    from agf_data_ingestion_spark.sources.snapshots import snapshot_history

    assert snapshot_history(tbl)[-1]["op"] == "restore@1"


def test_concurrent_upsert_stress_overlapping_random(spark, tmp_path):
    """Randomized OCC stress: 6 unsynchronized writers upsert overlapping
    random key sets concurrently.  Invariants that must survive ANY
    interleaving: every touched key lands EXACTLY once, each row is some
    writer's intact (key, value) pair, versions form an unbroken 1..N
    chain, and no writer errors."""
    import random
    import threading

    rng = random.Random(17)
    tbl = str(tmp_path / "tbl")
    batches = []
    for w in range(6):
        ks = rng.sample(range(40), 12)
        batches.append([(k, f"w{w}") for k in ks])
    dfs = [spark.createDataFrame(b, "k long, v string") for b in batches]
    errors: list = []

    def go(w):
        try:
            snapshot_upsert(dfs[w], tbl, keys=["k"])
        except Exception as exc:  # pragma: no cover
            errors.append((w, exc))

    threads = [threading.Thread(target=go, args=(w,)) for w in range(6)]
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=300)
    assert not errors, errors

    rows = snapshot_read(spark, tbl).collect()
    touched = set().union(*[{k for k, _ in b} for b in batches])
    assert sorted(r["k"] for r in rows) == sorted(touched)  # exactly once
    by_writer = {f"w{w}": {k for k, _ in batches[w]} for w in range(6)}
    for r in rows:
        assert r["k"] in by_writer[r["v"]]  # value belongs to a real batch
    from agf_data_ingestion_spark.sources.snapshots import snapshot_history

    hist = snapshot_history(tbl)
    assert [h["version"] for h in hist] == list(range(1, len(hist) + 1))
    assert 1 <= len(hist) <= 6


def test_clustered_write_enables_stats_pruning(spark, tmp_path):
    """cluster_by makes per-file min/max tight: a range predicate prunes
    to a strict subset of files at plan time, and results stay exact."""
    from pyspark.sql import functions as F

    from agf_data_ingestion_spark.sources.snapshots import plan_files

    tbl_u, tbl_c = str(tmp_path / "unclustered"), str(tmp_path / "clustered")
    df = spark.range(0, 10_000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    ).repartition(8)  # unclustered: every file spans the whole k domain
    snapshot_write(df, tbl_u)
    snapshot_write(df, tbl_c, cluster_by=["k"], cluster_files=8)

    pred = [("k", ">=", 9000)]
    total_c = len(read_manifest(tbl_c)["files"])
    kept_c = len(plan_files(tbl_c, where=pred))
    kept_u = len(plan_files(tbl_u, where=pred))
    assert kept_u == len(read_manifest(tbl_u)["files"])  # nothing provable
    assert kept_c < total_c  # clustered: most files pruned
    got = sorted(r["k"] for r in snapshot_read(spark, tbl_c, where=pred).collect())
    assert got == list(range(9000, 10_000))


def test_audited_write_gates_the_commit(spark, tmp_path):
    from agf_data_ingestion_spark.sources.snapshots import (
        AuditFailed,
        snapshot_write_audited,
    )

    tbl = str(tmp_path / "tbl")
    rules = [
        {"rule": "not_null", "col": "k"},
        {"rule": "unique", "col": "k"},
        {"rule": "min", "col": "n", "value": 0},
    ]
    good = spark.createDataFrame([(1, "a", 5), (2, "b", 0)], "k long, v string, n long")
    assert snapshot_write_audited(good, tbl, rules=rules) == 1

    bad = spark.createDataFrame([(3, "c", -1), (3, "d", 2)], "k long, v string, n long")
    with pytest.raises(AuditFailed) as ei:
        snapshot_write_audited(bad, tbl, rules=rules)
    kinds = {r["rule"] for r in ei.value.report}
    assert kinds == {"unique", "min"}
    # the failed audit committed NOTHING and left NO data files behind
    assert current_version(tbl) == 1
    deleted = expire_snapshots(tbl, keep_last=1, orphan_grace_s=0.0)
    assert deleted == []


def test_bloom_prunes_point_lookups_in_wide_ranges(spark, tmp_path):
    """Per-file blooms disprove equality where [min,max] stats cannot: an
    UNCLUSTERED write leaves every file spanning the whole key domain,
    yet a point lookup opens only the bloom-admitted file(s) — and the
    result stays exact."""
    from pyspark.sql import functions as F

    from agf_data_ingestion_spark.sources.snapshots import plan_files

    tbl = str(tmp_path / "tbl")
    df = spark.range(0, 8_000).select(
        (F.col("id") * 7919 % 100_000).alias("k"), F.col("id").alias("v")
    ).repartition(8)
    snapshot_write(df, tbl, bloom_cols=["k"])
    total = len(read_manifest(tbl)["files"])
    assert total >= 4

    probe = 7919 * 123 % 100_000  # present in exactly one partition's file
    pred = [("k", "==", probe)]
    kept = plan_files(tbl, where=pred)
    assert 1 <= len(kept) < total, (len(kept), total)
    got = [(r["k"], r["v"]) for r in snapshot_read(spark, tbl, where=pred).collect()]
    assert got == [(probe, 123)]
    # an absent key prunes every file (modulo bloom false positives)
    assert len(plan_files(tbl, where=[("k", "==", 100_001)])) < total
    assert snapshot_read(spark, tbl, where=[("k", "==", 100_001)]).count() == 0


def test_bloom_survives_compaction_and_merge(spark, tmp_path):
    from pyspark.sql import functions as F

    from agf_data_ingestion_spark.sources.snapshots import plan_files, snapshot_merge

    tbl = str(tmp_path / "tbl")
    for part in range(4):
        df = spark.range(part * 1000, (part + 1) * 1000).select(
            (F.col("id") * 7919 % 100_000).alias("k"), F.col("id").alias("v")
        ).coalesce(1)
        snapshot_write(df, tbl, bloom_cols=["k"])
    snapshot_compact(spark, tbl, small_bytes=8 << 20)
    assert all("k" in f.get("bloom", {}) for f in read_manifest(tbl)["files"])
    # merge rewrites carry blooms too
    snapshot_merge(
        spark.createDataFrame([(7919 % 100_000, 999_999)], "k long, v long"),
        tbl,
        keys=["k"],
    )
    assert all("k" in f.get("bloom", {}) for f in read_manifest(tbl)["files"])
    # absent keys still prune after maintenance (bloom is probabilistic
    # at ~2% fp/file — require most probes to prune fully)
    fully_pruned = sum(
        1
        for probe in (100_001, 100_003, 100_007, 100_009, 100_013)
        if plan_files(tbl, where=[("k", "==", probe)]) == []
    )
    assert fully_pruned >= 4, fully_pruned


def test_rowcount_is_metadata_only(spark, tmp_path):
    from agf_data_ingestion_spark.sources.snapshots import snapshot_rowcount

    tbl = str(tmp_path / "tbl")
    snapshot_write(spark.range(0, 1234).selectExpr("id AS k"), tbl)
    snapshot_write(spark.range(0, 766).selectExpr("id + 10000 AS k"), tbl)
    assert snapshot_rowcount(tbl) == 2000
    assert snapshot_rowcount(tbl, version=1) == 1234
    assert snapshot_rowcount(tbl) == snapshot_read(spark, tbl).count()


def test_minmax_is_metadata_only(spark, tmp_path):
    from agf_data_ingestion_spark.sources.snapshots import (
        snapshot_delete,
        snapshot_minmax,
    )

    tbl = str(tmp_path / "tbl")
    snapshot_write(spark.range(100, 600).selectExpr("id AS k"), tbl)
    snapshot_write(spark.range(0, 50).selectExpr("id AS k"), tbl)
    assert snapshot_minmax(tbl, "k") == (0, 599)
    assert snapshot_minmax(tbl, "k", version=1) == (100, 599)
    # unknown column: conservative None, never a wrong answer
    assert snapshot_minmax(tbl, "nope") is None
    # copy-on-write delete rewrites the touched files, so stats keep
    # describing exactly the live rows
    snapshot_delete(spark, tbl, [("k", ">=", 500)])
    assert snapshot_minmax(tbl, "k") == (0, 499)


def test_expire_repairs_current_and_keeps_reserved_head(spark, tmp_path):
    """r4 ADVICE: a writer that crashed between CAS reservation and pointer
    bump leaves a fully-written manifest ABOVE CURRENT.  Expiry must roll
    CURRENT forward first — otherwise the reserved head's data files look
    like orphans, get vacuumed past the grace window, and a later
    _repair_current advances onto an unreadable manifest."""
    import json as _json
    import os as _os

    from agf_data_ingestion_spark.sources import snapshots as snap

    tbl = str(tmp_path / "tbl")
    snapshot_write(spark.createDataFrame([(1, "a")], "k long, v string"), tbl)
    snapshot_write(spark.createDataFrame([(2, "b")], "k long, v string"), tbl)
    # simulate the crash: stage v3's data files + manifest, but never bump
    files = snap._write_data_files(
        spark.createDataFrame([(3, "c")], "k long, v string"), tbl
    )
    with open(snap._manifest_path(tbl, 3), "w") as fh:
        _json.dump(
            {
                "version": 3,
                "parent": 2,
                "op": "append",
                "committed_at": 0.0,
                "files": read_manifest(tbl, 2)["files"] + files,
            },
            fh,
        )
    assert current_version(tbl) == 2  # pointer still lags
    deleted = set(expire_snapshots(tbl, keep_last=1, orphan_grace_s=0.0))
    # the reserved head's files survived, CURRENT was repaired onto it,
    # and the table head is readable
    assert {f["path"] for f in files}.isdisjoint(deleted)
    assert current_version(tbl) == 3
    assert all(_os.path.exists(f["path"]) for f in files)
    got = sorted((r["k"], r["v"]) for r in snapshot_read(spark, tbl).collect())
    assert got == [(1, "a"), (2, "b"), (3, "c")]


def test_bloom_probe_type_mismatch_never_false_prunes(spark, tmp_path):
    """r4 ADVICE: build/probe both rendered with str() meant probe 5.0 or
    '5' against an int column hashed differently and pruned EVERY file.
    Int-valued floats must canonicalize to the int rendering; genuinely
    type-mismatched probes must fall through to the conservative path."""
    from agf_data_ingestion_spark.sources.snapshots import plan_files

    tbl = str(tmp_path / "tbl")
    snapshot_write(
        spark.createDataFrame([(5, "x"), (6, "y")], "k long, v string").coalesce(1),
        tbl,
        bloom_cols=["k"],
    )
    assert len(plan_files(tbl, where=[("k", "==", 5)])) == 1
    # float probe of an int value: canonicalized, still finds the file
    assert len(plan_files(tbl, where=[("k", "==", 5.0)])) == 1
    # string probe of an int column: bloom must NOT prove absence
    assert len(plan_files(tbl, where=[("k", "==", "5")])) == 1
    # a genuinely absent key still prunes
    assert plan_files(tbl, where=[("k", "==", 999)]) == []
    assert plan_files(tbl, where=[("k", "==", 999.0)]) == []


def test_audited_write_records_bloom_cols(spark, tmp_path):
    """r4 ADVICE: the curate CLI's WAP path dropped bloom_cols, silently
    losing data-skipping metadata on audited releases."""
    from agf_data_ingestion_spark.sources.snapshots import (
        plan_files,
        snapshot_write_audited,
    )

    tbl = str(tmp_path / "tbl")
    snapshot_write_audited(
        spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"),
        tbl,
        rules=[{"col": "k", "rule": "not_null"}],
        bloom_cols=["k"],
    )
    assert all("k" in f.get("bloom", {}) for f in read_manifest(tbl)["files"])
    assert plan_files(tbl, where=[("k", "==", 777)]) == []


@pytest.mark.heavy_rung  # r13 suite-wall gate: scale rung; property pinned by segment-reuse asserts in test_snapshots (O(delta) staging)
def test_segment_manifests_commit_o_delta(spark, tmp_path):
    """r5 segment manifests: a commit writes only its DELTA segment and
    names the parent's segments — manifest JSON stays tiny at any table
    size (the Iceberg manifest-list model), resolution still yields the
    full file list, and a rewrite carries untouched segments by name."""
    import json

    from agf_data_ingestion_spark.sources import snapshots as snap
    from agf_data_ingestion_spark.sources.snapshots import snapshot_merge

    tbl = str(tmp_path / "tbl")
    for i in range(10):
        snapshot_write(
            spark.createDataFrame([(i, "x")], "k long, v string").coalesce(1), tbl
        )
    raw9 = json.load(open(snap._manifest_path(tbl, 9)))
    raw10 = json.load(open(snap._manifest_path(tbl, 10)))
    assert "files" not in raw10 and len(raw10["segments"]) == 10
    # exactly ONE new segment per append; the rest are reused by name
    assert set(raw9["segments"]) <= set(raw10["segments"])
    assert len(set(raw10["segments"]) - set(raw9["segments"])) == 1
    # manifest growth is one segment NAME + its seg_meta bounds entry per
    # commit (~50 B + ~160 B — the Iceberg manifest-list trade: aggregate
    # stats ride in the list so planning prunes without resolving), never
    # per-FILE entries (which would grow with table size, not commits)
    s1 = os.path.getsize(snap._manifest_path(tbl, 1))
    s10 = os.path.getsize(snap._manifest_path(tbl, 10))
    assert s10 - s1 < 9 * 300, (s1, s10)
    assert snapshot_read(spark, tbl).count() == 10
    # a single-key merge rewrites only the touched segment
    v = snapshot_merge(
        spark.createDataFrame([(3, "MERGED")], "k long, v string"), tbl, keys=["k"]
    )
    rawm = json.load(open(snap._manifest_path(tbl, v)))
    assert len(set(rawm["segments"]) & set(raw10["segments"])) == 9
    got = {r["k"]: r["v"] for r in snapshot_read(spark, tbl).collect()}
    assert got[3] == "MERGED" and len(got) == 10


@pytest.mark.heavy_rung  # r13 suite-wall gate: scale rung; property pinned by adjacent-merge unit asserts (coalescer) at small commit counts
def test_segment_coalescing_bounds_manifest_width(spark, tmp_path, monkeypatch):
    """Geometric coalescing keeps the per-manifest segment count bounded
    (LSM-style smallest-pair merges) without changing the resolved table."""
    from agf_data_ingestion_spark.sources import snapshots as snap

    monkeypatch.setattr(snap, "_MAX_SEGMENTS", 4)
    tbl = str(tmp_path / "tbl")
    for i in range(7):
        snapshot_write(
            spark.createDataFrame([(i, "x")], "k long, v string").coalesce(1), tbl
        )
    m = read_manifest(tbl)
    assert len(m["segments"]) <= 4
    assert sorted(r["k"] for r in snapshot_read(spark, tbl).collect()) == list(
        range(7)
    )


def test_expiry_reclaims_unreferenced_segments(spark, tmp_path):
    """Expiry deletes segment files no retained manifest names (with the
    same in-flight grace rule as data files)."""
    from agf_data_ingestion_spark.sources import snapshots as snap

    tbl = str(tmp_path / "tbl")
    for i in range(3):
        snapshot_write(
            spark.createDataFrame([(i, "x")], "k long, v string").coalesce(1), tbl
        )
    snapshot_write(
        spark.createDataFrame([(99, "y")], "k long, v string"), tbl, mode="overwrite"
    )
    expire_snapshots(tbl, keep_last=1, orphan_grace_s=0.0)
    kept = set(read_manifest(tbl)["segments"])
    on_disk = set(os.listdir(snap._segs_path(tbl)))
    assert on_disk == kept
    assert sorted(r["k"] for r in snapshot_read(spark, tbl).collect()) == [99]


def test_merge_crash_before_commit_leaves_table_intact(spark, tmp_path, monkeypatch):
    """A rewrite that dies AFTER staging its data files but BEFORE the CAS
    leaves the table untouched (readers see the old head), and the staged
    orphans are reclaimed by expiry once past the grace window — the
    rewrite twin of the r4 streaming crash-recovery invariants."""
    from agf_data_ingestion_spark.sources import snapshots as snap
    from agf_data_ingestion_spark.sources.snapshots import snapshot_merge

    tbl = str(tmp_path / "tbl")
    snapshot_write(spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"), tbl)

    real = snap._commit_rewrite
    died = []

    def dying_commit(*a, **kw):
        died.append(True)
        raise RuntimeError("simulated crash before CAS")

    monkeypatch.setattr(snap, "_commit_rewrite", dying_commit)
    with pytest.raises(RuntimeError, match="simulated crash"):
        snapshot_merge(
            spark.createDataFrame([(2, "B!")], "k long, v string"), tbl, keys=["k"]
        )
    assert died and current_version(tbl) == 1
    assert _rows(snapshot_read(spark, tbl)) == [(1, "a"), (2, "b")]

    # restart: the same merge succeeds on the intact table
    monkeypatch.setattr(snap, "_commit_rewrite", real)
    assert snapshot_merge(
        spark.createDataFrame([(2, "B!")], "k long, v string"), tbl, keys=["k"]
    ) == 2
    assert _rows(snapshot_read(spark, tbl)) == [(1, "a"), (2, "B!")]
    # the crashed attempt's staged files are unreferenced orphans
    expire_snapshots(tbl, keep_last=2, orphan_grace_s=0.0)
    referenced = {f["path"] for f in read_manifest(tbl)["files"]} | {
        f["path"] for f in read_manifest(tbl, 1)["files"]
    }
    on_disk = set()
    for sub in os.listdir(os.path.join(tbl, "data")):
        d = os.path.join(tbl, "data", sub)
        on_disk.update(
            os.path.join(d, n) for n in os.listdir(d) if n.endswith(".parquet")
        )
    assert on_disk == referenced


def test_concurrent_mixed_upserts_and_merges_stress(spark, tmp_path):
    """Free-running mixed writers (4 disjoint-key upserts + 2 disjoint-range
    merges over pre-seeded rows): every commit lands, no lost update, one
    copy per key, merges apply exactly — the file-level OCC invariants
    under an arbitrary interleaving (no barrier: real thread timing)."""
    from agf_data_ingestion_spark.sources.snapshots import (
        snapshot_history,
        snapshot_merge,
    )

    tbl = str(tmp_path / "tbl")
    # two seed files with disjoint key ranges for the mergers to rewrite
    snapshot_write(
        spark.createDataFrame([(k, "seedA") for k in range(0, 5)], "k long, v string"),
        tbl,
    )
    snapshot_write(
        spark.createDataFrame(
            [(k, "seedB") for k in range(100, 105)], "k long, v string"
        ),
        tbl,
    )

    def writer(i, barrier):
        barrier.wait()
        if i < 4:  # upserters: fresh disjoint keys
            df = spark.createDataFrame(
                [(1000 + i * 10 + j, f"u{i}") for j in range(3)], "k long, v string"
            )
            return snapshot_upsert(df, tbl, keys=["k"])
        lo = 0 if i == 4 else 100  # mergers: rewrite one seed range each
        df = spark.createDataFrame(
            [(lo + j, f"m{i}") for j in range(5)], "k long, v string"
        )
        return snapshot_merge(df, tbl, keys=["k"])

    versions = _run_racers(6, writer)
    assert sorted(versions) == [3, 4, 5, 6, 7, 8], versions
    hist = snapshot_history(tbl)
    assert [h["version"] for h in hist] == list(range(1, 9))
    assert sorted(h["op"] for h in hist[2:]) == ["merge", "merge"] + ["upsert"] * 4
    rows = snapshot_read(spark, tbl).collect()
    by_key = {r["k"]: r["v"] for r in rows}
    assert len(rows) == len(by_key) == 22  # 10 seeds + 12 upserted
    assert all(by_key[k] == "m4" for k in range(0, 5))
    assert all(by_key[k] == "m5" for k in range(100, 105))
    for i in range(4):
        assert all(by_key[1000 + i * 10 + j] == f"u{i}" for j in range(3))
