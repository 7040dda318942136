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
