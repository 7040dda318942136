"""Declared table sort order (r8): the write-side half of data skipping
promoted from a per-call option (snapshot_write(cluster_by=...)) to table
METADATA the Iceberg-SortOrder way — the manifest carries an append-only
order history bound to source FIELD IDS (rename-proof), every data file
records the order it was written under, appends/compaction apply the
default order with no caller involvement, and snapshot_maintain gains an
``unsorted_files`` trigger that converges historical files.

Readers never depend on the order for correctness: a file written under
an old or no order is just a file whose min/max stats span more of the
domain, so plan_files stays exact either way — the order only changes
how MUCH a selective predicate can prune.
"""

from __future__ import annotations

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
    snapshot_maintain,
    snapshot_read,
    snapshot_rename_column,
    snapshot_restore,
    snapshot_set_sort_order,
    snapshot_sort_order,
    snapshot_table_health,
    snapshot_write,
)


def _shuffled(spark, lo, hi):
    """A batch whose input order scatters k across the whole [lo, hi)
    domain — an unsorted write leaves every file spanning ~everything."""
    return (
        spark.range(lo, hi)
        .select(
            # md5-derived content-stable shuffle (the repo rule: never rand())
            F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 8), 16, 10)
            .cast("bigint")
            .alias("ord"),
            F.col("id").alias("k"),
            (F.col("id") % 7).alias("v"),
        )
        .orderBy("ord")
        .drop("ord")
        .repartition(4)
    )


def test_set_sort_order_is_metadata_only_and_idempotent(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    snapshot_write(_shuffled(spark, 0, 100), tbl)
    m0 = read_manifest(tbl)
    v = snapshot_set_sort_order(tbl, ["k"])
    assert v == m0["version"] + 1
    m1 = read_manifest(tbl)
    # zero bytes moved: identical file entries, only metadata changed
    assert [f["path"] for f in m1["files"]] == [f["path"] for f in m0["files"]]
    assert snapshot_sort_order(tbl) == ["k"]
    assert snapshot_set_sort_order(tbl, ["k"]) == v  # idempotent: no commit
    assert current_version(tbl) == v


def test_appends_under_order_are_clustered_and_stamped(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    snapshot_write(_shuffled(spark, 0, 2000), tbl)
    snapshot_set_sort_order(tbl, ["k"])
    snapshot_write(_shuffled(spark, 2000, 4000), tbl)
    m = read_manifest(tbl)
    stamped = [f for f in m["files"] if f.get("sort_order_id") == 1]
    unstamped = [f for f in m["files"] if "sort_order_id" not in f]
    assert stamped and unstamped
    # stamped files cover tight disjoint ranges: their spans tile the
    # batch domain instead of each spanning all of it
    spans = sorted(tuple(f["stats"]["k"]) for f in stamped)
    assert all(lo >= 2000 and hi < 4000 for lo, hi in spans)
    if len(spans) > 1:
        for (_, h1), (l2, _) in zip(spans, spans[1:]):
            assert h1 < l2  # disjoint ascending ranges
    # the pre-order files each span ~their whole batch (scattered write)
    for u in unstamped:
        assert u["stats"]["k"][1] - u["stats"]["k"][0] > 1000


def test_maintain_converges_unsorted_history_and_prunes(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    for i in range(4):
        snapshot_write(_shuffled(spark, i * 500, (i + 1) * 500), tbl)
    before_rows = sorted(
        (r["k"], r["v"]) for r in snapshot_read(spark, tbl).collect()
    )
    # unsorted layout: within the covering batch every file spans the
    # whole batch domain, so the point query opens ALL of that batch's
    # files (4 per write via repartition(4))
    hit_before = plan_files(tbl, where=[("k", "==", 1234)])
    assert len(hit_before) == 4
    snapshot_set_sort_order(tbl, ["k"])
    h = snapshot_table_health(tbl)
    assert h["unsorted_files"] == h["files"] > 0
    rep = snapshot_maintain(spark, tbl)
    assert rep["triggers"]["unsorted_files"]["fired"] and rep["compacted"]
    h2 = snapshot_table_health(tbl)
    assert h2["unsorted_files"] == 0
    # content identical, point query now opens a strict subset
    after_rows = sorted(
        (r["k"], r["v"]) for r in snapshot_read(spark, tbl).collect()
    )
    assert after_rows == before_rows
    hit = plan_files(tbl, where=[("k", "==", 1234)])
    assert 1 <= len(hit) < len(hit_before)
    # second maintain run is a provable no-op
    rep2 = snapshot_maintain(spark, tbl)
    assert not rep2["compacted"]
    assert not any(t["fired"] for t in rep2["triggers"].values())


def test_order_survives_rename_and_blocks_source_drop(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    snapshot_write(_shuffled(spark, 0, 100), tbl)
    snapshot_set_sort_order(tbl, ["k"])
    snapshot_rename_column(tbl, "k", "key")
    assert snapshot_sort_order(tbl) == ["key"]  # field-id binding
    with pytest.raises(SchemaEvolutionError, match="sort order"):
        snapshot_drop_column(tbl, "key")
    # appends under the new name still cluster
    df = spark.range(100, 200).select(
        F.col("id").alias("key"), (F.col("id") % 7).alias("v")
    )
    snapshot_write(df, tbl)
    m = read_manifest(tbl)
    assert any(f.get("sort_order_id") == 1 for f in m["files"])


def test_batch_lacking_sort_column_refuses(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    snapshot_write(_shuffled(spark, 0, 50), tbl)
    snapshot_set_sort_order(tbl, ["k"])
    bad = spark.range(5).select((F.col("id") % 7).alias("v"))
    with pytest.raises(SchemaEvolutionError, match="sort-order column"):
        snapshot_write(bad, tbl)


def test_reset_and_order_id_reuse(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    snapshot_write(_shuffled(spark, 0, 50), tbl)
    snapshot_set_sort_order(tbl, ["k"])
    snapshot_write(_shuffled(spark, 50, 100), tbl)  # stamped
    m_ordered = read_manifest(tbl)
    n_stamped = sum(1 for f in m_ordered["files"] if "sort_order_id" in f)
    assert n_stamped >= 1
    snapshot_set_sort_order(tbl, [])
    assert snapshot_sort_order(tbl) == []
    snapshot_write(_shuffled(spark, 100, 150), tbl)  # unsorted again
    m = read_manifest(tbl)
    assert sum(1 for f in m["files"] if "sort_order_id" in f) == n_stamped
    # re-declaring the same columns reuses the historical order id
    v = snapshot_set_sort_order(tbl, ["k"])
    m2 = read_manifest(tbl, v)
    assert m2["default_sort_order_id"] == 1
    assert len(m2["sort_orders"]) == 1


def test_sort_order_change_refuses_racing_append(spark, tmp_path, monkeypatch):
    tbl = str(tmp_path / "tbl")
    snapshot_write(_shuffled(spark, 0, 20), tbl)
    real = S._publish
    state = {"raced": False}

    def race(table, files, parent, op, **kw):
        if op.startswith("set_sort_order") and not state["raced"]:
            state["raced"] = True
            monkeypatch.setattr(S, "_publish", real)
            snapshot_write(_shuffled(spark, 20, 40), tbl)
            monkeypatch.setattr(S, "_publish", race)
        return real(table, files, parent, op, **kw)

    monkeypatch.setattr(S, "_publish", race)
    with pytest.raises(CommitConflict):
        snapshot_set_sort_order(tbl, ["k"])
    monkeypatch.setattr(S, "_publish", real)
    assert snapshot_sort_order(tbl) == []
    assert snapshot_read(spark, tbl).count() == 40


def test_restore_rolls_sort_order_back(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    snapshot_write(_shuffled(spark, 0, 50), tbl)
    v_plain = current_version(tbl)
    snapshot_set_sort_order(tbl, ["k"])
    snapshot_write(_shuffled(spark, 50, 100), tbl)
    snapshot_restore(tbl, v_plain)
    assert snapshot_sort_order(tbl) == []
    snapshot_write(_shuffled(spark, 100, 150), tbl)  # no stamp, no cluster
    m = read_manifest(tbl)
    assert all("sort_order_id" not in f for f in m["files"])


def test_validation_refusals(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    df = spark.range(10).select(
        F.col("id").alias("k"), F.array(F.col("id")).alias("arr")
    )
    snapshot_write(df, tbl)
    with pytest.raises(SchemaEvolutionError, match="no such column"):
        snapshot_set_sort_order(tbl, ["nope"])
    with pytest.raises(SchemaEvolutionError, match="unsortable"):
        snapshot_set_sort_order(tbl, ["arr"])
    with pytest.raises(SchemaEvolutionError, match="duplicate"):
        snapshot_set_sort_order(tbl, ["k", "k"])
    with pytest.raises(SchemaEvolutionError, match="no committed schema"):
        snapshot_set_sort_order(str(tmp_path / "empty"), ["k"])


def _grid(spark, lo, hi):
    """Rows whose (k, u) scatter over a 64x64 grid regardless of id
    order — an unsorted write leaves every file spanning both dims."""
    return spark.range(lo, hi).select(
        F.col("id").alias("id"),
        F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 4), 16, 10)
        .cast("bigint")
        .alias("h"),
    ).select(
        "id",
        (F.col("h") % 64).alias("k"),
        ((F.col("h") / 64).cast("bigint") % 64).alias("u"),
    )


def test_zorder_transform_order_2d_pruning(spark, tmp_path):
    """Declared ``("zorder", k, u)`` order: maintenance converges the
    table to Morton-clustered files, and a small 2-D box predicate then
    opens a strict subset on BOTH dimensions at once — the OPTIMIZE
    ZORDER claim, now table metadata instead of a per-call option."""
    tbl = str(tmp_path / "tbl")
    for i in range(4):
        snapshot_write(_grid(spark, i * 1000, (i + 1) * 1000).repartition(3), tbl)
    box = [("k", ">=", 8), ("k", "<", 16), ("u", ">=", 8), ("u", "<", 16)]
    n_files = len(read_manifest(tbl)["files"])
    assert len(plan_files(tbl, where=box)) == n_files  # unsorted: no pruning
    before = sorted(
        (r["id"], r["k"], r["u"]) for r in snapshot_read(spark, tbl).collect()
    )
    snapshot_set_sort_order(tbl, [("zorder", "k", "u")])
    assert snapshot_sort_order(tbl) == [["zorder", "k", "u"]]
    # small_bytes sized so the rewrite emits SEVERAL clustered files —
    # pruning needs file granularity to show
    rep = snapshot_maintain(spark, tbl, policy={"small_bytes": 12_288})
    assert rep["compacted"]
    after_files = read_manifest(tbl)["files"]
    assert len(after_files) > 1  # multiple clustered files to prune among
    hit = plan_files(tbl, where=box)
    assert 1 <= len(hit) < len(after_files)
    after = sorted(
        (r["id"], r["k"], r["u"]) for r in snapshot_read(spark, tbl).collect()
    )
    assert after == before
    # appends under the transform order are stamped and clustered
    snapshot_write(_grid(spark, 4000, 5000), tbl)
    m = read_manifest(tbl)
    assert all(f.get("sort_order_id") == 1 for f in m["files"])


def test_zorder_member_rename_survives_and_drop_refuses(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    snapshot_write(_grid(spark, 0, 200), tbl)
    snapshot_set_sort_order(tbl, [("zorder", "k", "u")])
    snapshot_rename_column(tbl, "u", "user_bucket")
    assert snapshot_sort_order(tbl) == [["zorder", "k", "user_bucket"]]
    with pytest.raises(SchemaEvolutionError, match="sort order"):
        snapshot_drop_column(tbl, "user_bucket")
    snapshot_write(
        _grid(spark, 200, 400).withColumnRenamed("u", "user_bucket"), tbl
    )
    assert any(
        f.get("sort_order_id") == 1 for f in read_manifest(tbl)["files"]
    )


def test_zorder_validation_refusals(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    df = spark.range(10).select(
        F.col("id").alias("k"),
        (F.col("id") % 3).alias("u"),
        F.col("id").cast("string").alias("s"),
    )
    snapshot_write(df, tbl)
    with pytest.raises(SchemaEvolutionError, match="exactly 2"):
        snapshot_set_sort_order(tbl, [("zorder", "k")])
    with pytest.raises(SchemaEvolutionError, match="must be an integer"):
        snapshot_set_sort_order(tbl, [("zorder", "k", "s")])
    with pytest.raises(ValueError, match="unknown sort transform"):
        snapshot_set_sort_order(tbl, [("peano", "k", "u")])
    with pytest.raises(SchemaEvolutionError, match="duplicate"):
        snapshot_set_sort_order(tbl, [("zorder", "k", "u"), "k"])
    # mixed plain + transform order is legal (distinct columns)
    df2 = spark.range(10).select(
        F.col("id").alias("a"), (F.col("id") % 3).alias("b"),
        (F.col("id") % 5).alias("c")
    )
    tbl2 = tbl + "2"
    snapshot_write(df2, tbl2)
    v = snapshot_set_sort_order(tbl2, ["a", ("zorder", "b", "c")])
    assert v > 0


def test_hilbert_transform_order_2d_pruning(spark, tmp_path):
    """Declared ``("hilbert", k, u)`` order — the liquid-clustering
    upgrade: same converge-then-prune contract as zorder, with the curve
    index attached through the grid-bounded distinct-cell table (write
    Python cost ≤65536 rows at any batch size)."""
    tbl = str(tmp_path / "tbl")
    for i in range(4):
        snapshot_write(_grid(spark, i * 1000, (i + 1) * 1000).repartition(3), tbl)
    box = [("k", ">=", 8), ("k", "<", 16), ("u", ">=", 8), ("u", "<", 16)]
    before = sorted(
        (r["id"], r["k"], r["u"]) for r in snapshot_read(spark, tbl).collect()
    )
    assert len(plan_files(tbl, where=box)) == len(read_manifest(tbl)["files"])
    snapshot_set_sort_order(tbl, [("hilbert", "k", "u")])
    assert snapshot_sort_order(tbl) == [["hilbert", "k", "u"]]
    rep = snapshot_maintain(spark, tbl, policy={"small_bytes": 12_288})
    assert rep["compacted"]
    after_files = read_manifest(tbl)["files"]
    assert len(after_files) > 1
    hit = plan_files(tbl, where=box)
    assert 1 <= len(hit) < len(after_files)
    after = sorted(
        (r["id"], r["k"], r["u"]) for r in snapshot_read(spark, tbl).collect()
    )
    assert after == before
    # appends under the hilbert order are stamped + clustered
    snapshot_write(_grid(spark, 4000, 5000), tbl)
    assert all(
        f.get("sort_order_id") == 1 for f in read_manifest(tbl)["files"]
    )


def test_sort_order_survives_partition_spec_writer(spark, tmp_path):
    """Review finding (r8): under a partition spec the partitionBy writer
    re-sorts each task by the PARTITION columns — a within-partition sort
    that doesn't lead with them is silently destroyed while the files
    still get stamped sort_order_id, so maintenance would never converge
    them.  Pin the fix: stamped files under (spec + sort order) must
    carry TIGHT disjoint k-ranges per partition value, and a point query
    prunes within the partition."""
    from agf_data_ingestion_spark.sources.snapshots import (
        snapshot_set_partition_spec,
    )

    tbl = str(tmp_path / "tbl")
    df0 = _shuffled(spark, 0, 10).withColumn("p", F.col("k") % 2)
    snapshot_write(df0, tbl)
    snapshot_set_partition_spec(tbl, [("identity", "p")])
    snapshot_set_sort_order(tbl, ["k"])
    big = _shuffled(spark, 0, 4000).withColumn("p", F.col("k") % 2)
    snapshot_write(big.repartition(6), tbl)
    m = read_manifest(tbl)
    stamped = [f for f in m["files"] if f.get("sort_order_id") == 1]
    assert len(stamped) >= 2
    # within each partition value the stamped files' k-ranges are
    # disjoint (sorted within the dir), not whole-domain spans
    by_part = {}
    for f in stamped:
        by_part.setdefault(f["partition"]["p"], []).append(
            tuple(f["stats"]["k"])
        )
    for p, spans in by_part.items():
        spans.sort()
        for (_, h1), (l2, _) in zip(spans, spans[1:]):
            assert h1 <= l2, (p, spans)  # == only at dup boundary values
    # hidden partitioning + stats prune together: the p-predicate drops
    # the other partition dir, the k-stats stay tight within it
    hit = plan_files(tbl, where=[("k", "==", 2000), ("p", "==", 0)])
    assert 1 <= len(hit) < len(stamped) + 1  # strict subset of all files
    assert all(f["partition"]["p"] == 0 for f in hit if "partition" in f)
    # content round-trips
    assert snapshot_read(spark, tbl).count() == 4010
    # compaction under spec+order also converges (pre-spec file rewritten
    # sorted into partition dirs)
    rep = snapshot_maintain(spark, tbl, policy={"small_bytes": 16_384})
    assert rep["compacted"]
    m2 = read_manifest(tbl)
    assert snapshot_table_health(tbl)["unsorted_files"] == 0
    for f in m2["files"]:
        assert f.get("sort_order_id") == 1
        lo, hi = f["stats"]["k"]
        assert hi - lo < 4000  # never a whole-domain span
    assert snapshot_read(spark, tbl).count() == 4010
