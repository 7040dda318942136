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


def test_replayed_hint_tiebreak_keeps_previous_current(spark, tmp_path):
    """r4 ADVICE: two commits sharing a version_hint (a replayed streaming
    batch) differ only in the random uuid suffix, so a pure name sort
    retained an arbitrary one — the dir the PREVIOUS CURRENT pointer named
    (what a lock-free reader already resolved) must be the survivor."""
    import os

    root = str(tmp_path / "st")
    for attempt in range(6):  # same hint six times: replayed batch
        state_write(spark.createDataFrame([(attempt,)], "k long"), root, 7)
        with open(os.path.join(root, "CURRENT")) as fh:
            prev = fh.read().strip()
        lazy = state_read(spark, root)
        state_write(spark.createDataFrame([(attempt + 100,)], "k long"), root, 7)
        # the superseded dir the reader resolved must still exist
        assert os.path.isdir(os.path.join(root, prev)), prev
        assert [r["k"] for r in lazy.collect()] == [attempt]
    assert [r["k"] for r in state_read(spark, root).collect()] == [105]
