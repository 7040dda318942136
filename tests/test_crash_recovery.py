"""Crash-recovery e2e for the streaming → snapshot path (VERDICT r4 #4).

OCC covers concurrent writers; these tests kill a writer MID-COMMIT and
prove exactly-once on restart, at both crash points the format's design
names:

(a) after data files are staged but before the CAS manifest reservation —
    the restarted stream replays the micro-batch (its offsets never
    committed), the staged files stay invisible (no manifest references
    them), and ``expire_snapshots`` reclaims them after the orphan grace
    window while protecting in-flight writes inside it;

(b) after the snapshot commit but before the streaming checkpoint
    advances — the restarted stream REPLAYS the already-applied
    micro-batch and the sink's own bookmark (mv: ``mv_refresh@N`` op;
    ingest: keyed idempotent upsert) absorbs the duplicate without a new
    commit.
"""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from agf_data_ingestion_spark.operators.mv import mv_last_applied, mv_read
from agf_data_ingestion_spark.sources.snapshots import (
    current_version,
    expire_snapshots,
    snapshot_read,
    snapshot_write,
)


class InjectedCrash(RuntimeError):
    pass


def _recompute(spark, fact):
    return sorted(
        tuple(r)
        for r in snapshot_read(spark, fact)
        .groupBy("g")
        .agg(
            F.count(F.lit(1)).alias("_cnt"),
            F.sum(F.col("v").cast("decimal(25,6)")).cast("decimal(25,6)").alias("val_sum"),
        )
        .collect()
    )


def _view(spark, mv):
    return sorted(
        tuple(r) for r in mv_read(spark, mv).select("g", "_cnt", "val_sum").collect()
    )


def _drain(spark, fact, mv, ck):
    from agf_data_ingestion_spark.streaming.mv_stream import start_mv_stream

    q = start_mv_stream(
        spark,
        fact,
        mv,
        group_cols=["g"],
        measures={"val_sum": "v"},
        checkpoint_dir=ck,
        available_now=True,
    )
    q.awaitTermination()


def _staged_data_files(table):
    return sorted(glob.glob(os.path.join(table, "data", "*", "*.parquet")))


def test_crash_before_cas_reservation_replays_and_reclaims(spark, tmp_path):
    """(a): kill the MV writer after its view data files are staged but
    before the CAS manifest reservation.  Restart must replay the batch
    (checkpoint offsets never committed) and converge to the batch twin;
    the crashed attempt's files are orphans — kept inside the grace
    window, reclaimed after it."""
    import agf_data_ingestion_spark.operators.mv as mv_mod

    fact, mv, ck = (str(tmp_path / p) for p in ("fact", "mv", "ck"))
    snapshot_write(
        spark.createDataFrame(
            [(i, f"g{i % 3}", float(i) + 0.25) for i in range(30)],
            "k long, g string, v double",
        ).coalesce(1),
        fact,
    )

    real_commit = mv_mod._commit

    def dying_commit(*a, **kw):
        raise InjectedCrash("killed after staging, before CAS")

    with pytest.MonkeyPatch.context() as mp:
        mp.setattr(mv_mod, "_commit", dying_commit)
        with pytest.raises(Exception):  # StreamingQueryException wraps it
            _drain(spark, fact, mv, ck)

    # crash state: files staged, NO manifest — readers see an empty table
    orphans = _staged_data_files(mv)
    assert orphans, "crash point must be after the data-file stage"
    assert current_version(mv) == 0

    # restart (same checkpoint): offsets were never committed, so the
    # micro-batch replays and the view converges to the batch twin
    _drain(spark, fact, mv, ck)
    assert mv_last_applied(mv) == current_version(fact) == 1
    assert _view(spark, mv) == _recompute(spark, fact)
    assert mv_mod._commit is real_commit

    # vacuum: inside the grace window the orphans are protected (they are
    # indistinguishable from an in-flight optimistic write)...
    expire_snapshots(mv, orphan_grace_s=3600.0)
    assert set(orphans) <= set(_staged_data_files(mv))
    # ...after it they are reclaimed, and the live view is untouched
    deleted = expire_snapshots(mv, orphan_grace_s=0.0)
    assert set(orphans) <= set(deleted)
    assert not (set(orphans) & set(_staged_data_files(mv)))
    assert _view(spark, mv) == _recompute(spark, fact)


def test_crash_after_commit_before_checkpoint_absorbs_replay(spark, tmp_path):
    """(b): kill the MV writer AFTER its snapshot commit but before the
    streaming checkpoint advances.  The restart replays the same
    micro-batch; the view's commit bookmark absorbs it — no second
    commit, bit-identical view — and the stream keeps tracking new
    commits afterwards."""
    import agf_data_ingestion_spark.streaming.mv_stream as mvs

    fact, mv, ck = (str(tmp_path / p) for p in ("fact", "mv", "ck"))
    snapshot_write(
        spark.createDataFrame(
            [(i, f"g{i % 4}", 10.0 * i) for i in range(20)],
            "k long, g string, v double",
        ).coalesce(1),
        fact,
    )

    real_apply = mvs.mv_apply_cdc_batch

    def apply_then_die(batch_df, mv_table, **kw):
        real_apply(batch_df, mv_table, **kw)
        raise InjectedCrash("killed after sink commit, before offset commit")

    with pytest.MonkeyPatch.context() as mp:
        mp.setattr(mvs, "mv_apply_cdc_batch", apply_then_die)
        with pytest.raises(Exception):
            _drain(spark, fact, mv, ck)

    # crash state: the view IS committed (bookmark = fact v1) even though
    # the streaming checkpoint thinks the batch never ran
    assert mv_last_applied(mv) == 1
    applied_view = _view(spark, mv)
    v_mv = current_version(mv)

    # restart: Spark replays the same micro-batch; the bookmark filters
    # every already-applied version — NO new view commit, identical rows
    _drain(spark, fact, mv, ck)
    assert current_version(mv) == v_mv
    assert _view(spark, mv) == applied_view == _recompute(spark, fact)

    # the pipeline is still live-correct after the duplicate: a new fact
    # commit (with deletes) flows through on the same checkpoint
    from agf_data_ingestion_spark.sources.snapshots import snapshot_delete

    snapshot_write(
        spark.createDataFrame([(100, "g9", -3.5)], "k long, g string, v double"),
        fact,
    )
    snapshot_delete(spark, fact, [("k", "<", 5)])
    _drain(spark, fact, mv, ck)
    assert mv_last_applied(mv) == current_version(fact) == 3
    assert _view(spark, mv) == _recompute(spark, fact)


def _write_run(root, inst, day, run_id, n_files=2):
    import json

    d = os.path.join(root, "raw", inst, "2024", "03", f"{day:02d}", run_id)
    os.makedirs(d, exist_ok=True)
    doc = {
        "sync_timestamp": f"2024-03-{day:02d}T10:00:00Z",
        "computer_name": f"PC-{inst}",
        "files_in_batch": n_files,
        "files_by_staff": {"Staff_A": n_files},
        "file_manifest": [
            {
                "path": f"Staff_A/EXP1/{run_id}_f{i}.csv",
                "size": 100 + i,
                "checksum": "ab" * 32,
            }
            for i in range(n_files)
        ],
    }
    with open(os.path.join(d, "run.json"), "w") as fh:
        json.dump(doc, fh)


def test_ingest_stream_crash_mid_snapshot_commit_equals_batch_twin(spark, tmp_path):
    """(a) on the INGEST path with the snapshot sink: kill the upsert at
    the CAS point mid-foreachBatch (sync_runs may land, file_inventory
    must not), restart on the same checkpoint, and the warehouse must
    equal a clean batch-twin backfill of the same lake."""
    import datetime as dt

    import agf_data_ingestion_spark.sources.snapshots as snap
    from agf_data_ingestion_spark.streaming.ingest_stream import (
        backfill,
        start_run_ingest,
    )

    now = dt.datetime(2024, 6, 1)
    lake = str(tmp_path / "lake")
    wh, wh_twin = str(tmp_path / "wh"), str(tmp_path / "wh_twin")
    for i, day in enumerate((1, 2, 3)):
        _write_run(lake, f"inst{i}", day, f"r{i}")

    real_publish = snap._publish
    fired = []

    def publish_once_then_die(table, *a, **kw):
        # let sync_runs commit, kill the file_inventory commit — a crash
        # PARTWAY through the foreachBatch's multi-table transaction
        if "file_inventory" in table and not fired:
            fired.append(True)
            raise InjectedCrash("killed at the CAS point")
        return real_publish(table, *a, **kw)

    with pytest.MonkeyPatch.context() as mp:
        mp.setattr(snap, "_publish", publish_once_then_die)
        q = start_run_ingest(
            spark, lake, wh, str(tmp_path / "ck"), available_now=True,
            now=now, sink="snapshot",
        )
        with pytest.raises(Exception):
            q.awaitTermination()

    # restart on the SAME checkpoint: the failed epoch replays; the keyed
    # idempotent upsert absorbs the half-applied sync_runs rows
    q = start_run_ingest(
        spark, lake, wh, str(tmp_path / "ck"), available_now=True,
        now=now, sink="snapshot",
    )
    q.awaitTermination()

    backfill(spark, lake, wh_twin, str(tmp_path / "ck_twin"), now=now,
             file_type="run", sink="snapshot")

    for tbl in ("sync_runs", "file_inventory"):
        got = sorted(
            tuple(r) for r in snapshot_read(spark, os.path.join(wh, tbl)).collect()
        )
        want = sorted(
            tuple(r)
            for r in snapshot_read(spark, os.path.join(wh_twin, tbl)).collect()
        )
        assert got == want and got, tbl
