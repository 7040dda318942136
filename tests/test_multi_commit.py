"""snapshot_multi_write (r8, VERDICT r7 ask #4): two-phase multi-table
atomic commit — corpus + ANN index + datacard publish as ONE visible
event.  Deterministic crash tests on both sides of the marker (the
atomic decision point) prove no torn state is observable, and an OCC
race with a lock-free single-table writer converges via whole-txn
retry."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from agf_data_ingestion_spark.sources import snapshots as S
from agf_data_ingestion_spark.sources.snapshots import (
    CommitConflict,
    current_version,
    read_manifest,
    snapshot_multi_write,
    snapshot_read,
    snapshot_write,
    version_as_of,
)


def _df(spark, lo, hi, tag="x"):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), F.lit(tag).alias("v")
    )


def _mk(spark, tmp_path, name, n=10):
    tbl = str(tmp_path / name)
    snapshot_write(_df(spark, 0, n, "base").coalesce(1), tbl)
    return tbl


def _ks(spark, tbl):
    return sorted(r["k"] for r in snapshot_read(spark, tbl).collect())


def test_three_tables_commit_atomically(spark, tmp_path):
    corpus = _mk(spark, tmp_path, "corpus")
    index = _mk(spark, tmp_path, "index")
    card = _mk(spark, tmp_path, "card")
    out = snapshot_multi_write(
        [
            (_df(spark, 100, 105, "t"), corpus),
            (_df(spark, 100, 103, "t"), index),
            (_df(spark, 100, 101, "t"), card),
        ],
        op="release:v1",
    )
    assert out == {corpus: 2, index: 2, card: 2}
    assert _ks(spark, corpus) == list(range(10)) + list(range(100, 105))
    assert _ks(spark, index) == list(range(10)) + list(range(100, 103))
    assert _ks(spark, card) == list(range(10)) + [100]
    # one shared op label ties the release together in every history
    for tbl in (corpus, index, card):
        assert read_manifest(tbl)["op"] == "release:v1"
        # COMMITS line written: as-of resolution sees the txn version
        assert version_as_of(tbl, read_manifest(tbl)["committed_at"]) == 2


def test_crash_before_marker_leaves_nothing_visible(spark, tmp_path):
    """Hard crash after staging BOTH manifests but before the marker: no
    table ever shows the txn, the dead slots are reclaimed, and later
    appends proceed."""
    a = _mk(spark, tmp_path, "a")
    b = _mk(spark, tmp_path, "b")
    marker = str(tmp_path / "never-created.committed")
    for tbl in (a, b):
        files, schema = S._stage_write(_df(spark, 100, 103, "t"), tbl, "append")
        S._publish(
            tbl,
            read_manifest(tbl)["files"] + files,
            current_version(tbl),
            "multi_write:dead",
            batch_schema=schema,
            txn_marker=marker,
        )
        # staged but invisible: pointer untouched
        assert current_version(tbl) == 1
    # any reader/writer repair refuses to roll over it AND reclaims it
    # (the dead txn holds no lock)
    for tbl in (a, b):
        assert S._repair_current(tbl) == 1
        assert not os.path.exists(S._manifest_path(tbl, 2))
        assert _ks(spark, tbl) == list(range(10))
    # the slot is free again for ordinary writers
    snapshot_write(_df(spark, 200, 201, "later"), a)
    assert current_version(a) == 2 and 200 in _ks(spark, a)


def test_crash_after_marker_recovers_all_tables(spark, tmp_path):
    """Hard crash between the marker and the pointer bumps: recovery
    rolls EVERY table forward — all-or-nothing holds on the commit
    side too, including the COMMITS index line."""
    a = _mk(spark, tmp_path, "a")
    b = _mk(spark, tmp_path, "b")
    marker = str(tmp_path / "txn.committed")
    for tbl in (a, b):
        files, schema = S._stage_write(_df(spark, 100, 103, "t"), tbl, "append")
        S._publish(
            tbl,
            read_manifest(tbl)["files"] + files,
            current_version(tbl),
            "multi_write:recovered",
            batch_schema=schema,
            txn_marker=marker,
        )
    with open(marker, "w") as fh:
        fh.write("txn")  # the decision point happened; then the crash
    for tbl in (a, b):
        assert current_version(tbl) == 1  # not yet visible
        assert S._repair_current(tbl) == 2  # any later activity repairs
        assert _ks(spark, tbl) == list(range(10)) + [100, 101, 102]
        assert version_as_of(tbl, read_manifest(tbl)["committed_at"]) == 2


def test_occ_race_with_single_table_writer_converges(spark, tmp_path, monkeypatch):
    """A lock-free append lands on table B between the txn's repair and
    its reservation: the txn's prepare conflicts, aborts its staged
    manifests, and retries on fresh parents — both the append and the
    txn survive, in that order."""
    a = _mk(spark, tmp_path, "a")
    b = _mk(spark, tmp_path, "b")
    real = S._publish
    state = {"raced": False}

    def race(table, files, parent, op, **kw):
        if (
            kw.get("txn_marker")
            and table == b
            and not state["raced"]
        ):
            state["raced"] = True
            monkeypatch.setattr(S, "_publish", real)
            snapshot_write(_df(spark, 500, 501, "race").coalesce(1), b)
            monkeypatch.setattr(S, "_publish", race)
        return real(table, files, parent, op, **kw)

    monkeypatch.setattr(S, "_publish", race)
    out = snapshot_multi_write(
        [(_df(spark, 100, 102, "t"), a), (_df(spark, 100, 102, "t"), b)]
    )
    monkeypatch.setattr(S, "_publish", real)
    assert state["raced"]
    # the racing append holds an earlier version; the txn rebased past it
    assert out[a] == current_version(a) and out[b] == current_version(b)
    assert 500 in _ks(spark, b) and 100 in _ks(spark, b) and 100 in _ks(spark, a)
    # no version holes / orphan staged manifests anywhere
    for tbl in (a, b):
        for v in range(1, current_version(tbl) + 1):
            assert "txn_marker" not in json.dumps(
                read_manifest(tbl, v).get("op")
            )
            read_manifest(tbl, v)  # resolvable


def test_duplicate_table_refused_and_abort_cleans(spark, tmp_path):
    a = _mk(spark, tmp_path, "a")
    with pytest.raises(ValueError, match="duplicate table"):
        snapshot_multi_write(
            [(_df(spark, 1, 2), a), (_df(spark, 2, 3), a)]
        )
    # mid-prepare failure (evolution refusal on the SECOND table) aborts
    # the first table's staged manifest: nothing committed anywhere
    b = _mk(spark, tmp_path, "b")
    bad = _df(spark, 1, 2).select(F.col("k").cast("string").alias("k"))
    with pytest.raises(S.SchemaEvolutionError):
        snapshot_multi_write([(_df(spark, 100, 101), a), (bad, b)])
    assert current_version(a) == 1 and current_version(b) == 1
    assert not os.path.exists(S._manifest_path(a, 2))
    assert not os.path.exists(S._manifest_path(b, 2))


def test_txn_aligned_read_pins_one_publish(spark, tmp_path):
    """snapshot_read_txn (r8): a consumer pins corpus + index + card to
    the SAME atomic publish even after later single-table commits — the
    read side of the multi-table txn."""
    from agf_data_ingestion_spark.sources.snapshots import (
        snapshot_multi_write,
        snapshot_read_txn,
        snapshot_txn_id,
        snapshot_txn_versions,
        snapshot_write,
    )

    a, b = str(tmp_path / "a"), str(tmp_path / "b")

    def batch(tag, n):
        return spark.range(n).selectExpr(
            "id AS k", f"'{tag}' AS tag"
        )

    snapshot_multi_write([(batch("t1", 5), a), (batch("t1", 7), b)])
    v2 = snapshot_multi_write([(batch("t2", 3), a), (batch("t2", 2), b)])
    # a later single-table append on `a` must not leak into the txn read
    snapshot_write(batch("solo", 9), a)
    versions, tid = snapshot_txn_versions([a, b])
    assert versions == v2
    assert snapshot_txn_id(a, versions[a]) == tid
    frames = snapshot_read_txn(spark, [a, b], tid)
    assert frames[a].where("tag = 'solo'").count() == 0
    assert frames[a].count() == 8 and frames[b].count() == 9
    # an explicit older txn id reads the first publish
    tid1 = snapshot_txn_id(a, 1)
    older, _ = snapshot_txn_versions([a, b], tid1)
    assert older == {a: 1, b: 1}
    f1 = snapshot_read_txn(spark, [a, b], tid1)
    assert f1[a].count() == 5 and f1[b].count() == 7
    # a table with no common txn refuses loudly
    c = str(tmp_path / "c")
    snapshot_write(batch("x", 1), c)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="no multi-table txn"):
        snapshot_txn_versions([a, c])
