"""Versioned small-state store (operators/statestore.py): atomic swap,
crash-window semantics, and the r4 read-grace retention — a lock-free
reader holding a lazy DataFrame over the superseded version must still
be able to run its action after one more commit."""

from __future__ import annotations

import os

from agf_data_ingestion_spark.operators.statestore import state_read, state_write


def _versions(root):
    return sorted(n for n in os.listdir(root) if n.startswith("v-"))


def test_state_roundtrip_and_absent(spark, tmp_path):
    root = str(tmp_path / "st")
    assert state_read(spark, root) is None
    state_write(spark.createDataFrame([(1, "a")], "k long, v string"), root, 1)
    assert [(r["k"], r["v"]) for r in state_read(spark, root).collect()] == [(1, "a")]


def test_superseded_version_retained_for_readers(spark, tmp_path):
    root = str(tmp_path / "st")
    state_write(spark.createDataFrame([(1,)], "k long"), root, 1)
    # a lock-free reader resolves CURRENT now but runs its action later
    lazy = state_read(spark, root)
    state_write(spark.createDataFrame([(2,)], "k long"), root, 2)
    # grace window: the superseded v1 dir still exists, so the stale
    # reader's action succeeds instead of hitting deleted files
    assert len(_versions(root)) == 2
    assert [r["k"] for r in lazy.collect()] == [1]
    assert [r["k"] for r in state_read(spark, root).collect()] == [2]


def test_retention_is_bounded(spark, tmp_path):
    root = str(tmp_path / "st")
    for i in range(1, 5):
        state_write(spark.createDataFrame([(i,)], "k long"), root, i)
    # current + exactly keep_last=1 superseded survive
    assert len(_versions(root)) == 2
    assert [r["k"] for r in state_read(spark, root).collect()] == [4]
