"""Writer-lock tests: mutual exclusion, timeout, stale-lock break, and the
locked upsert path staying idempotent."""

from __future__ import annotations

import json
import os
import time

import pytest

from agf_data_ingestion_spark.operators.locking import (
    TableLockedError,
    _lock_dir,
    table_lock,
)
from agf_data_ingestion_spark.operators.upsert import upsert_append


def test_lock_excludes_second_writer(tmp_path):
    table = str(tmp_path / "t")
    with table_lock(table):
        assert os.path.isdir(_lock_dir(table))
        with pytest.raises(TableLockedError):
            with table_lock(table, wait_s=0.5, poll_s=0.1):
                pass
    # released on exit
    assert not os.path.exists(_lock_dir(table))


def test_lock_waits_for_release(tmp_path):
    table = str(tmp_path / "t")
    # hold briefly in-process via nested scopes: simulate with manual dirs
    lockdir = _lock_dir(table)
    os.mkdir(lockdir)
    with open(os.path.join(lockdir, "owner.json"), "w") as fh:
        json.dump({"acquired_at": time.time()}, fh)
    t0 = time.monotonic()
    # release shortly after from "another writer"
    import threading

    def release():
        time.sleep(0.4)
        os.remove(os.path.join(lockdir, "owner.json"))
        os.rmdir(lockdir)

    threading.Thread(target=release).start()
    with table_lock(table, wait_s=5.0, poll_s=0.05):
        waited = time.monotonic() - t0
    assert 0.3 <= waited < 3.0


def test_stale_lock_is_broken(tmp_path):
    table = str(tmp_path / "t")
    lockdir = _lock_dir(table)
    os.mkdir(lockdir)
    with open(os.path.join(lockdir, "owner.json"), "w") as fh:
        json.dump({"acquired_at": time.time() - 10_000}, fh)  # long-dead holder
    with table_lock(table, wait_s=2.0, stale_after_s=900.0):
        pass  # acquired by breaking the stale lock
    assert not os.path.exists(lockdir)


def test_release_leaves_foreign_lock_untouched(tmp_path):
    """If the holder's lock is broken (TTL) and re-acquired by another writer
    while the holder is still working, the holder's release must NOT delete
    the new holder's lock (ADVICE r1: owner-token verification)."""
    import shutil

    from agf_data_ingestion_spark.operators.locking import LockBrokenWarning

    table = str(tmp_path / "t")
    lockdir = _lock_dir(table)
    with pytest.warns(LockBrokenWarning):
        with table_lock(table):
            # simulate a stale-break + foreign re-acquisition mid-hold
            shutil.rmtree(lockdir)
            os.mkdir(lockdir)
            with open(os.path.join(lockdir, "owner.json"), "w") as fh:
                json.dump({"token": "someone-else", "acquired_at": time.time()}, fh)
    # the foreign lock survives the original holder's release
    assert os.path.isdir(lockdir)
    with open(os.path.join(lockdir, "owner.json")) as fh:
        assert json.load(fh)["token"] == "someone-else"


def test_token_guarded_removal_spares_fresh_lock(tmp_path):
    """_remove_if_token only deletes the exact lock instance it was aimed at:
    a lock whose token changed hands since the stale read is restored intact
    (ADVICE r1: stale-break race)."""
    from agf_data_ingestion_spark.operators.locking import _remove_if_token

    table = str(tmp_path / "t")
    lockdir = _lock_dir(table)
    os.mkdir(lockdir)
    with open(os.path.join(lockdir, "owner.json"), "w") as fh:
        json.dump({"token": "fresh-holder", "acquired_at": time.time()}, fh)
    assert _remove_if_token(lockdir, "stale-holder") is False
    assert os.path.isdir(lockdir)
    with open(os.path.join(lockdir, "owner.json")) as fh:
        assert json.load(fh)["token"] == "fresh-holder"
    assert _remove_if_token(lockdir, "fresh-holder") is True
    assert not os.path.exists(lockdir)


def test_no_empty_lockdir_window_during_acquire(tmp_path, monkeypatch):
    """Acquisition lands the lock directory WITH owner.json in one rename —
    the lock path itself is never mkdir'd, and at the moment of every rename
    onto the lock path the staged source already contains owner.json."""
    table = str(tmp_path / "t")
    lockdir = _lock_dir(table)

    real_mkdir, real_rename = os.mkdir, os.rename
    mkdirs_of_lockdir = []
    renames_without_owner = []

    def spy_mkdir(path, *a, **kw):
        if str(path) == lockdir:
            mkdirs_of_lockdir.append(path)
        return real_mkdir(path, *a, **kw)

    def spy_rename(src, dst, *a, **kw):
        if str(dst) == lockdir and not os.path.exists(os.path.join(src, "owner.json")):
            renames_without_owner.append(src)
        return real_rename(src, dst, *a, **kw)

    monkeypatch.setattr(os, "mkdir", spy_mkdir)
    monkeypatch.setattr(os, "rename", spy_rename)
    for _ in range(20):
        with table_lock(table, wait_s=2.0):
            pass
    assert not mkdirs_of_lockdir, "lock dir must only appear via atomic rename"
    assert not renames_without_owner, "lock must carry owner.json when published"


def test_locked_upsert_stays_idempotent(spark, tmp_path):
    table = str(tmp_path / "inv")
    df = spark.createDataFrame(
        [("e1", "a.csv", 10), ("e2", "b.csv", 20)], ["experiment_id", "file_path", "n"]
    )
    upsert_append(df, table, ["experiment_id", "file_path"], lock=True)
    upsert_append(df, table, ["experiment_id", "file_path"], lock=True)  # replay
    out = spark.read.parquet(table)
    assert out.count() == 2
    assert not os.path.exists(_lock_dir(table))
