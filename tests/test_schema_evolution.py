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


# -- r7: non-additive evolution (rename / drop / widen via the field
# registry — immutable physical names, Delta column-mapping shape) ----------


def _mk(spark, tmp_path, name="tbl", n=20, files=2):
    from pyspark.sql import functions as F

    tbl = str(tmp_path / name)
    df = spark.range(n).select(
        F.col("id").alias("k"),
        F.concat(F.lit("v"), F.col("id")).alias("v"),
    )
    snapshot_write(df, tbl, cluster_by=["k"], cluster_files=files)
    return tbl


def test_rename_preserves_old_files_and_new_writes(spark, tmp_path):
    from agf_data_ingestion_spark.sources.snapshots import (
        plan_files,
        snapshot_minmax,
        snapshot_rename_column,
    )

    tbl = _mk(spark, tmp_path)
    v1 = 1
    snapshot_rename_column(tbl, "k", "key")
    # pre-rename files read under the new logical name, data intact
    got = sorted((r["key"], r["v"]) for r in snapshot_read(spark, tbl).collect())
    assert got == [(i, f"v{i}") for i in range(20)]
    # time travel shows the epoch-correct schema
    assert [c for c, _ in snapshot_schema(tbl, v1)] == ["k", "v"]
    assert [c for c, _ in snapshot_schema(tbl)] == ["key", "v"]
    # new writes land under the immutable physical name and read back
    snapshot_write(
        spark.createDataFrame([(100, "new")], "key long, v string"), tbl
    )
    rows = snapshot_read(spark, tbl)
    assert rows.count() == 21 and (100, "new") in {
        (r["key"], r["v"]) for r in rows.collect()
    }
    # stats pruning still works through the rename (old files keyed by
    # the physical name): a selective predicate opens a strict subset
    kept = plan_files(tbl, where=[("key", "<", 5)])
    assert 0 < len(kept) < len(plan_files(tbl))
    assert snapshot_minmax(tbl, "key") == (0, 100)
    # predicate reads stay exact
    assert snapshot_read(spark, tbl, where=[("key", "<", 3)]).count() == 3
    # the old name is gone, and re-adding it is refused (reserved phys)
    with pytest.raises(Exception):
        snapshot_read(spark, tbl).select("k").collect()
    with pytest.raises(SchemaEvolutionError, match="reserved"):
        snapshot_write(
            spark.createDataFrame([(1, "x", 9)], "key long, v string, k long"),
            tbl,
        )


def test_rename_then_merge_upsert_delete(spark, tmp_path):
    from agf_data_ingestion_spark.sources.snapshots import (
        snapshot_delete,
        snapshot_rename_column,
        snapshot_rowcount,
    )

    tbl = _mk(spark, tmp_path)
    snapshot_rename_column(tbl, "k", "key")
    snapshot_merge(
        spark.createDataFrame([(5, "FIVE")], "key long, v string"), tbl, keys=["key"]
    )
    snapshot_upsert(
        spark.createDataFrame([(5, "no"), (50, "up")], "key long, v string"),
        tbl,
        keys=["key"],
    )
    snapshot_delete(spark, tbl, [("key", "==", 7)], mode="dv")
    got = {(r["key"], r["v"]) for r in snapshot_read(spark, tbl).collect()}
    assert (5, "FIVE") in got and (50, "up") in got
    assert all(k != 7 for k, _ in got)
    assert snapshot_rowcount(tbl) == 20  # 20 - deleted + upserted
    # the files written post-rename carry the PHYSICAL column name
    import pyarrow.parquet as pq

    from agf_data_ingestion_spark.sources.snapshots import read_manifest

    for f in read_manifest(tbl)["files"]:
        assert "k" in pq.read_schema(f["path"]).names  # phys, not "key"


def test_drop_hides_everywhere_including_cdc(spark, tmp_path):
    from agf_data_ingestion_spark.sources.snapshots import (
        current_version,
        snapshot_drop_column,
    )

    tbl = str(tmp_path / "drop")
    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0)], "k long, v string, secret double"
    )
    snapshot_write(df, tbl)
    v1 = current_version(tbl)
    snapshot_drop_column(tbl, "secret")
    assert snapshot_read(spark, tbl).columns == ["k", "v"]
    assert [c for c, _ in snapshot_schema(tbl, v1)] == ["k", "v", "secret"]
    # diff across the drop + a data change hides the column too
    snapshot_write(spark.createDataFrame([(3, "c")], "k long, v string"), tbl)
    d = snapshot_diff(spark, tbl, v_from=v1, v_to=current_version(tbl))
    assert "secret" not in d.columns
    assert sorted((r["_change"], r["k"]) for r in d.collect()) == [("insert", 3)]
    # streaming CDC replays history under the current (dropped) schema
    from agf_data_ingestion_spark.sources.snapshot_stream import SnapshotCDCSource

    spark.dataSource.register(SnapshotCDCSource)
    q = (
        spark.readStream.format("agf_snapshot_cdc")
        .option("table", tbl)
        .load()
        .writeStream.format("memory")
        .queryName("drop_cdc")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from drop_cdc").collect()
    assert rows and all("secret" not in r.asDict() for r in rows)
    assert sorted(r["k"] for r in rows if r["_change"] == "insert") == [1, 2, 3]
    # re-using the dropped name is refused over the dead bytes
    with pytest.raises(SchemaEvolutionError, match="reserved"):
        snapshot_write(
            spark.createDataFrame([(9, "z", 1.0)], "k long, v string, secret double"),
            tbl,
        )


def test_widen_reads_are_exact_and_batches_may_stay_narrow(spark, tmp_path):
    from agf_data_ingestion_spark.sources.snapshots import (
        snapshot_minmax,
        snapshot_widen_column,
    )

    tbl = str(tmp_path / "widen")
    snapshot_write(
        spark.createDataFrame([(1, 10), (2, 2147483647)], "k long, n int"), tbl
    )
    snapshot_widen_column(tbl, "n", "bigint")
    assert dict(snapshot_schema(tbl))["n"] == "bigint"
    # old int32 files upcast exactly; a value beyond int32 now fits
    snapshot_write(
        spark.createDataFrame([(3, 9_000_000_000)], "k long, n long"), tbl
    )
    got = {r["k"]: r["n"] for r in snapshot_read(spark, tbl).collect()}
    assert got == {1: 10, 2: 2147483647, 3: 9_000_000_000}
    assert dict(snapshot_read(spark, tbl).dtypes)["n"] == "bigint"
    # a NARROW post-widen batch is still accepted (upcast on read)
    snapshot_write(spark.createDataFrame([(4, 7)], "k long, n int"), tbl)
    assert snapshot_read(spark, tbl).count() == 4
    assert snapshot_minmax(tbl, "n") == (7, 9_000_000_000)
    # non-widening change refused
    with pytest.raises(SchemaEvolutionError, match="widening"):
        snapshot_widen_column(tbl, "n", "int")


def test_rename_nets_zero_in_cdc_and_diff_aligns_by_field_id(spark, tmp_path):
    from agf_data_ingestion_spark.sources.snapshots import (
        current_version,
        snapshot_rename_column,
    )

    tbl = _mk(spark, tmp_path, "ren", n=6, files=1)
    v1 = current_version(tbl)
    v2 = snapshot_rename_column(tbl, "v", "text")
    # a pure rename changes no data: the diff is EMPTY
    assert snapshot_diff(spark, tbl, v_from=v1, v_to=v2).count() == 0
    # rename + data change: the old side aligns by field id under the
    # new name, so only the real change surfaces
    snapshot_write(spark.createDataFrame([(9, "nine")], "k long, text string"), tbl)
    d = snapshot_diff(spark, tbl, v_from=v1, v_to=current_version(tbl))
    got = sorted((r["_change"], r["k"], r["text"]) for r in d.collect())
    assert got == [("insert", 9, "nine")]


def test_rename_on_branch_rebases_and_registry_conflict_refuses(spark, tmp_path):
    from agf_data_ingestion_spark.sources.branches import (
        BranchDiverged,
        snapshot_branch,
        snapshot_branch_rebase,
    )
    from agf_data_ingestion_spark.sources.snapshots import (
        snapshot_rename_column,
    )

    tbl = _mk(spark, tmp_path, "br", n=10, files=1)
    root = snapshot_branch(tbl, "mig")
    snapshot_rename_column(root, "v", "text")
    snapshot_write(spark.createDataFrame([(50, "b")], "k long, text string"), tbl.replace(tbl, root))
    # parent appends (no registry change): rebase carries the rename
    snapshot_write(spark.createDataFrame([(60, "p")], "k long, v string"), tbl)
    snapshot_branch_rebase(tbl, "mig", drop=True)
    got = {(r["k"], r["text"]) for r in snapshot_read(spark, tbl).collect()}
    assert (50, "b") in got and (60, "p") in got and len(got) == 12
    # both sides evolving the registry refuses
    tbl2 = _mk(spark, tmp_path, "br2", n=10, files=1)
    root2 = snapshot_branch(tbl2, "mig")
    snapshot_rename_column(root2, "v", "text")
    snapshot_rename_column(tbl2, "k", "key")
    with pytest.raises(BranchDiverged, match="registry"):
        snapshot_branch_rebase(tbl2, "mig")


def test_eq_delete_key_rename_refused_until_compact(spark, tmp_path):
    from agf_data_ingestion_spark.sources.snapshots import (
        snapshot_compact,
        snapshot_delete_keys,
        snapshot_rename_column,
    )

    tbl = _mk(spark, tmp_path, "eqr", n=10, files=1)
    snapshot_delete_keys(spark.createDataFrame([(3,)], "k long"), tbl)
    with pytest.raises(SchemaEvolutionError, match="equality delete"):
        snapshot_rename_column(tbl, "k", "key")
    snapshot_compact(spark, tbl, small_bytes=1)
    snapshot_rename_column(tbl, "k", "key")  # applied items no longer block
    assert snapshot_read(spark, tbl).count() == 9


def test_overwrite_preserves_field_ids_by_name(spark, tmp_path):
    """r7 review finding: an overwrite re-derives the registry from the
    batch — same-NAMED columns must keep their ids (diff and CDC align
    by id; a positional re-assignment would bind unrelated columns)."""
    from agf_data_ingestion_spark.sources.snapshots import (
        current_version,
        read_manifest,
    )

    tbl = str(tmp_path / "ow")
    snapshot_write(
        spark.createDataFrame([(1, "a")], "k long, v string"), tbl
    )
    ids1 = {f["name"]: f["id"] for f in read_manifest(tbl)["fields"]}
    v1 = current_version(tbl)
    # overwrite with the columns REORDERED and one changed row
    snapshot_write(
        spark.createDataFrame([("b", 1)], "v string, k long"),
        tbl,
        mode="overwrite",
    )
    ids2 = {f["name"]: f["id"] for f in read_manifest(tbl)["fields"]}
    assert ids1 == ids2  # same names, same ids, any order
    d = snapshot_diff(spark, tbl, v_from=v1, v_to=current_version(tbl))
    got = sorted((r["_change"], r["k"], r["v"]) for r in d.collect())
    assert got == [("delete", 1, "a"), ("insert", 1, "b")]


def test_empty_overwrite_reads_as_empty_frame(spark, tmp_path):
    tbl = str(tmp_path / "empty")
    snapshot_write(spark.createDataFrame([(1, "a")], "k long, v string"), tbl)
    snapshot_write(
        spark.createDataFrame([], "k long, v string"), tbl, mode="overwrite"
    )
    df = snapshot_read(spark, tbl)
    assert df.count() == 0 and df.columns == ["k", "v"]


def test_cdc_replay_survives_rename_of_gcd_eq_key(spark, tmp_path):
    """r7 review finding: an eq-delete key column renamed AFTER the item
    was applied+GC'd must not break historical CDC replay — key values
    are read by the version's physical names, never through the current
    logical schema."""
    from agf_data_ingestion_spark.sources.snapshot_stream import SnapshotCDCSource
    from agf_data_ingestion_spark.sources.snapshots import (
        snapshot_compact,
        snapshot_delete_keys,
        snapshot_rename_column,
    )

    tbl = str(tmp_path / "ren_eq")
    snapshot_write(
        spark.range(6).selectExpr("id as k", "concat('v', id) as v"), tbl
    )
    snapshot_delete_keys(spark.createDataFrame([(2,)], "k long"), tbl)
    snapshot_compact(spark, tbl, small_bytes=1)  # applies + GCs the item
    snapshot_rename_column(tbl, "k", "id")  # legal: no live item
    spark.dataSource.register(SnapshotCDCSource)
    q = (
        spark.readStream.format("agf_snapshot_cdc")
        .option("table", tbl)
        .load()
        .writeStream.format("memory")
        .queryName("ren_eq_cdc")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select _change, id from ren_eq_cdc").collect()
    dels = sorted(r["id"] for r in rows if r["_change"] == "delete")
    assert dels.count(2) >= 1  # the historical eq delete replays correctly


def test_rename_validates_new_name_and_cli_requires_to(spark, tmp_path):
    from agf_data_ingestion_spark.sources.snapshots import (
        snapshot_rename_column,
        snapshot_widen_column,
    )

    tbl = _mk(spark, tmp_path, "val", n=5, files=1)
    with pytest.raises(ValueError, match="invalid new name"):
        snapshot_rename_column(tbl, "k", None)
    with pytest.raises(ValueError, match="invalid new name"):
        snapshot_rename_column(tbl, "k", "")
    with pytest.raises(ValueError, match="invalid type"):
        snapshot_widen_column(tbl, "k", None)


def test_dropped_field_id_never_reissued(spark, tmp_path):
    """r7 review finding: fresh field ids must start above the MAX-EVER id
    (persisted last_field_id), not the max LIVE id — a column minted
    after a drop would otherwise inherit the dropped column's id and the
    by-id CDC/diff alignment would bind the two unrelated columns."""
    from agf_data_ingestion_spark.sources.snapshots import (
        current_version,
        read_manifest,
        snapshot_drop_column,
    )

    tbl = str(tmp_path / "idreuse")
    snapshot_write(
        spark.createDataFrame([(1, "a", 9.5)], "k long, v string, c double"), tbl
    )
    v1 = current_version(tbl)
    dropped_id = {
        f["name"]: f["id"] for f in read_manifest(tbl)["fields"]
    }["c"]
    snapshot_drop_column(tbl, "c")
    # append with a NEW column: its id must not be c's
    snapshot_write(
        spark.createDataFrame([(2, "b", "new")], "k long, v string, d string"), tbl
    )
    ids = {f["name"]: f["id"] for f in read_manifest(tbl)["fields"]}
    assert ids["d"] != dropped_id and ids["d"] > dropped_id
    # diff across the drop+add boundary: the new column reads NULL for
    # pre-drop rows, never the dropped column's values
    d = snapshot_diff(spark, tbl, v_from=v1, v_to=current_version(tbl))
    got = sorted(
        (r["_change"], r["k"], r["d"]) for r in d.collect()
    )
    assert got == [("insert", 2, "new")]
    # the same rule holds through an OVERWRITE after the drop
    snapshot_write(
        spark.createDataFrame([(3, "c", 1.0)], "k long, v string, e double"),
        tbl,
        mode="overwrite",
    )
    ids2 = {f["name"]: f["id"] for f in read_manifest(tbl)["fields"]}
    assert ids2["e"] > dropped_id and ids2["k"] == ids["k"]


def test_domain_reweight_survives_long_documents(spark, tmp_path):
    """r7 review finding: the chars-per-word signal must compute in
    BIGINT — a 2148+-char document overflowed int32 under ANSI."""
    import pandas as pd

    from agf_data_ingestion_spark.plans.mixing import docs_domain_reweight

    sf = str(tmp_path / "longdocs")
    import os

    os.makedirs(sf)
    pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": ["word " * 1000, "tiny text here", "x " * 2000, "ok"],
            "lang": ["en"] * 4,
            "source": ["s0", "s0", "s1", "s1"],
            "n_chars": [5000, 14, 4000, 2],
        }
    ).to_parquet(os.path.join(sf, "documents.parquet"))
    rows = docs_domain_reweight(spark, sf).collect()
    assert len(rows) == 2 and all(r["excess_ppm"] > 0 for r in rows)
