"""OP-X-BRANCH: zero-copy forks, isolation, fast-forward publish,
divergence, expiry safety, drop safety (sources/branches.py)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from agf_data_ingestion_spark.sources.branches import (
    BranchDiverged,
    branch_fork_version,
    branch_root,
    snapshot_branch,
    snapshot_branch_drop,
    snapshot_branch_publish,
    snapshot_branches,
)
from agf_data_ingestion_spark.sources.snapshots import (
    current_version,
    expire_snapshots,
    read_manifest,
    snapshot_compact,
    snapshot_delete,
    snapshot_read,
    snapshot_rowcount,
    snapshot_tags,
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


def _batch(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), F.concat(F.lit("b"), F.col("id")).alias("v")
    )


def test_fork_is_zero_copy_and_isolated(spark, tmp_path):
    tbl = _mk(spark, tmp_path)
    root = snapshot_branch(tbl, "exp")
    # zero copy: branch v1 references the parent's files verbatim
    assert [f["path"] for f in read_manifest(root, 1)["files"]] == [
        f["path"] for f in read_manifest(tbl)["files"]
    ]
    assert _rows(snapshot_read(spark, root)) == _rows(snapshot_read(spark, tbl))
    assert branch_fork_version(tbl, "exp") == 1
    # writes on either side are invisible to the other
    snapshot_write(_batch(spark, 100, 110), root)
    snapshot_write(_batch(spark, 200, 205), tbl)
    assert len(_rows(snapshot_read(spark, root))) == 50
    assert len(_rows(snapshot_read(spark, tbl))) == 45
    assert snapshot_branches(tbl) == {"exp": {"fork": 1, "current": 2}}
    # the branch name is reserved while it exists
    with pytest.raises(ValueError):
        snapshot_branch(tbl, "exp")


def test_publish_fast_forward(spark, tmp_path):
    tbl = _mk(spark, tmp_path)
    root = snapshot_branch(tbl, "wap")
    snapshot_write(_batch(spark, 100, 110), root)
    snapshot_delete(spark, root, [("k", "<", 5)], mode="dv")
    expected = _rows(snapshot_read(spark, root))
    pre = current_version(tbl)
    v = snapshot_branch_publish(tbl, "wap")
    assert v == pre + 1
    assert _rows(snapshot_read(spark, tbl)) == expected
    assert snapshot_rowcount(tbl) == len(expected) == 45
    # history stays append-only: the pre-publish state is still readable
    assert len(_rows(snapshot_read(spark, tbl, version=pre))) == 40
    # publish commits by hardlink: every published path is parent-owned
    root_abs = os.path.abspath(root)
    for f in read_manifest(tbl, v)["files"]:
        assert not os.path.abspath(f["path"]).startswith(root_abs + os.sep)
        for item in f.get("dv") or []:
            for p in item["paths"]:
                assert not os.path.abspath(p).startswith(root_abs + os.sep)


def test_publish_diverged_raises_and_commits_nothing(spark, tmp_path):
    tbl = _mk(spark, tmp_path)
    snapshot_branch(tbl, "exp")
    snapshot_write(_batch(spark, 100, 110), branch_root(tbl, "exp"))
    snapshot_write(_batch(spark, 200, 205), tbl)  # parent advances
    pre = current_version(tbl)
    with pytest.raises(BranchDiverged):
        snapshot_branch_publish(tbl, "exp")
    assert current_version(tbl) == pre


def test_parent_expiry_cannot_starve_a_branch(spark, tmp_path):
    tbl = _mk(spark, tmp_path)
    root = snapshot_branch(tbl, "keep")
    before = _rows(snapshot_read(spark, root))
    # parent rewrites everything, then expires aggressively
    snapshot_write(_batch(spark, 500, 510), tbl, mode="overwrite")
    expire_snapshots(tbl, keep_last=1, orphan_grace_s=0.0)
    # the fork tag pinned v1: the branch still reads its exact fork state
    assert _rows(snapshot_read(spark, root)) == before
    assert snapshot_tags(tbl) == {"branch-keep": 1}


def test_drop_after_publish_is_safe(spark, tmp_path):
    tbl = _mk(spark, tmp_path)
    root = snapshot_branch(tbl, "exp")
    snapshot_write(_batch(spark, 100, 110), root)
    snapshot_compact(spark, root)  # branch-local rewrite of parent files
    expected = _rows(snapshot_read(spark, root))
    snapshot_branch_publish(tbl, "exp", drop=True)
    assert snapshot_branches(tbl) == {}
    assert "branch-exp" not in snapshot_tags(tbl)
    assert not os.path.isdir(root)
    # hardlinked inodes survive the branch rmtree
    assert _rows(snapshot_read(spark, tbl)) == expected
    # and the published state survives parent expiry too
    expire_snapshots(tbl, keep_last=1, orphan_grace_s=0.0)
    assert _rows(snapshot_read(spark, tbl)) == expected


def test_unpublished_branch_drop_leaves_parent_untouched(spark, tmp_path):
    tbl = _mk(spark, tmp_path)
    snapshot_branch(tbl, "scrap")
    snapshot_write(_batch(spark, 100, 110), branch_root(tbl, "scrap"))
    before = _rows(snapshot_read(spark, tbl))
    snapshot_branch_drop(tbl, "scrap")
    assert _rows(snapshot_read(spark, tbl)) == before
    assert snapshot_branches(tbl) == {}
    # name is reusable after drop
    snapshot_branch(tbl, "scrap")
    assert snapshot_branches(tbl)["scrap"]["fork"] == 1


def test_publish_of_untouched_branch_is_noop(spark, tmp_path):
    tbl = _mk(spark, tmp_path)
    snapshot_branch(tbl, "idle")
    assert snapshot_branch_publish(tbl, "idle") == current_version(tbl) == 1


def test_crashed_fork_is_resumable(spark, tmp_path):
    from agf_data_ingestion_spark.sources.snapshots import snapshot_tag

    tbl = _mk(spark, tmp_path)
    # simulate a fork that crashed between tag and branch-v1 creation
    snapshot_tag(tbl, "branch-lost", 1)
    root = snapshot_branch(tbl, "lost")  # resumes at the tag's version
    assert branch_fork_version(tbl, "lost") == 1
    assert _rows(snapshot_read(spark, root)) == _rows(snapshot_read(spark, tbl, version=1))
    # a conflicting explicit version still refuses
    snapshot_branch_drop(tbl, "lost")
    snapshot_write(_batch(spark, 100, 105), tbl)
    snapshot_tag(tbl, "branch-lost2", 1)
    with pytest.raises(ValueError):
        snapshot_branch(tbl, "lost2", version=2)


def test_fork_version_survives_branch_side_expiry(spark, tmp_path):
    tbl = _mk(spark, tmp_path)
    root = snapshot_branch(tbl, "exp")
    for lo in (100, 110, 120):
        snapshot_write(_batch(spark, lo, lo + 10), root)
    expire_snapshots(root, keep_last=1, orphan_grace_s=0.0)  # v1 op label gone
    assert branch_fork_version(tbl, "exp") == 1  # the parent tag is durable
    assert snapshot_branches(tbl)["exp"]["fork"] == 1
    v = snapshot_branch_publish(tbl, "exp")
    assert snapshot_rowcount(tbl, v) == 70


def test_rebase_publishes_onto_advanced_parent(spark, tmp_path):
    """VERDICT r6 ask #7: parent-append-then-publish succeeds via rebase —
    the parent's post-fork append AND the branch's work (an append plus a
    DV delete of a fork file) both land in one atomic commit."""
    from agf_data_ingestion_spark.sources.branches import (
        BranchDiverged,
        snapshot_branch,
        snapshot_branch_publish,
        snapshot_branch_rebase,
    )
    from agf_data_ingestion_spark.sources.snapshots import snapshot_delete

    tbl = _mk(spark, tmp_path, n=20, files=2)
    root = snapshot_branch(tbl, "work")
    # branch work: DV-delete a fork slice + append new rows
    snapshot_delete(spark, root, [("k", "<", 3)], mode="dv")
    snapshot_write(
        spark.createDataFrame([(100, "b")], "k long, v string"), root
    )
    # parent advances — strict publish must refuse
    snapshot_write(spark.createDataFrame([(200, "p")], "k long, v string"), tbl)
    with pytest.raises(BranchDiverged):
        snapshot_branch_publish(tbl, "work")
    v = snapshot_branch_rebase(tbl, "work", drop=True)
    assert v == current_version(tbl)
    rows = _rows(snapshot_read(spark, tbl))
    assert (100, "b") in rows and (200, "p") in rows
    assert all(k >= 3 for k, _ in rows if k < 100)
    assert len(rows) == 17 + 2
    # history stays append-only: the pre-rebase parent state is intact
    assert len(_rows(snapshot_read(spark, tbl, version=v - 1))) == 21


def test_rebase_refuses_overlapping_file_touch(spark, tmp_path):
    """Both sides changed the same fork file (parent COW-deleted from it,
    branch DV'd it): rebase must refuse and commit nothing."""
    from agf_data_ingestion_spark.sources.branches import (
        BranchDiverged,
        snapshot_branch,
        snapshot_branch_rebase,
    )
    from agf_data_ingestion_spark.sources.snapshots import snapshot_delete

    tbl = _mk(spark, tmp_path, n=20, files=1)  # ONE file: any touch overlaps
    root = snapshot_branch(tbl, "work")
    snapshot_delete(spark, root, [("k", "==", 5)], mode="dv")
    snapshot_delete(spark, tbl, [("k", "==", 7)])  # parent rewrites the file
    v_before = current_version(tbl)
    with pytest.raises(BranchDiverged, match="both touched"):
        snapshot_branch_rebase(tbl, "work")
    assert current_version(tbl) == v_before  # nothing committed
    assert (5, "v5") in _rows(snapshot_read(spark, tbl))


def test_rebase_refuses_eq_delete_divergence(spark, tmp_path):
    from agf_data_ingestion_spark.sources.branches import (
        BranchDiverged,
        snapshot_branch,
        snapshot_branch_rebase,
    )
    from agf_data_ingestion_spark.sources.snapshots import snapshot_delete_keys

    tbl = _mk(spark, tmp_path, n=20, files=2)
    root = snapshot_branch(tbl, "work")
    snapshot_delete_keys(
        spark.createDataFrame([(5,)], "k long"), root
    )
    snapshot_write(spark.createDataFrame([(200, "p")], "k long, v string"), tbl)
    with pytest.raises(BranchDiverged, match="equality deletes"):
        snapshot_branch_rebase(tbl, "work")
    # and the mirror: the PARENT adding an eq delete also refuses
    tbl2 = _mk(spark, tmp_path, "tbl2", n=20, files=2)
    root2 = snapshot_branch(tbl2, "work")
    snapshot_write(spark.createDataFrame([(100, "b")], "k long, v string"), root2)
    snapshot_delete_keys(spark.createDataFrame([(5,)], "k long"), tbl2)
    with pytest.raises(BranchDiverged, match="parent added equality"):
        snapshot_branch_rebase(tbl2, "work")


def test_rebase_on_unadvanced_parent_acts_like_publish(spark, tmp_path):
    from agf_data_ingestion_spark.sources.branches import (
        snapshot_branch,
        snapshot_branch_rebase,
    )

    tbl = _mk(spark, tmp_path, n=10, files=1)
    root = snapshot_branch(tbl, "work")
    snapshot_write(spark.createDataFrame([(100, "b")], "k long, v string"), root)
    snapshot_branch_rebase(tbl, "work", drop=True)
    assert (100, "b") in _rows(snapshot_read(spark, tbl))
    assert snapshot_rowcount(tbl) == 11


def test_rebase_refuses_colliding_added_paths(spark, tmp_path, monkeypatch):
    """ADVICE r7: a branch-added entry whose path collides with a
    parent-added path must refuse (BranchDiverged), never silently keep
    the parent's entry.  uuid commit dirs make a real collision
    practically unreachable, so the test forges one by rewriting the
    branch's added-entry path to the parent's."""
    from agf_data_ingestion_spark.sources import branches as B
    from agf_data_ingestion_spark.sources.branches import snapshot_branch_rebase

    tbl = _mk(spark, tmp_path, n=10, files=1)
    fork_v = current_version(tbl)
    root = snapshot_branch(tbl, "work")
    snapshot_write(spark.createDataFrame([(100, "b")], "k long, v string"), root)
    snapshot_write(spark.createDataFrame([(200, "p")], "k long, v string"), tbl)
    fork_paths = {f["path"] for f in read_manifest(tbl, fork_v)["files"]}
    par_added = [
        f["path"]
        for f in read_manifest(tbl, current_version(tbl))["files"]
        if f["path"] not in fork_paths
    ]
    assert len(par_added) == 1
    real = B._deep_entries

    def forged(m):
        out = [dict(f) for f in real(m)]
        for f in out:
            if f["path"] not in fork_paths:
                f["path"] = par_added[0]
        return out

    monkeypatch.setattr(B, "_deep_entries", forged)
    v_before = current_version(tbl)
    with pytest.raises(BranchDiverged, match="both added"):
        snapshot_branch_rebase(tbl, "work")
    assert current_version(tbl) == v_before  # nothing committed
