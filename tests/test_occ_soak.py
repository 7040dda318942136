"""Sustained-churn OCC soak (r9 — VERDICT r8 ask #8): two concurrent
appenders + one merger + a live maintenance loop, ~100 commits against
ONE snapshot table, with NO external locking in the test.

Pairwise races are pinned elsewhere (tests/test_snapshots.py,
test_deletion_vectors.py, test_equality_deletes.py); this is the
everything-at-once run a production table actually experiences:
lock-free appends rebasing over each other, cow/dv merges recomputing
over interleaved commits, and `snapshot_maintain` compacting UNDER the
writers.  The final state must be exactly derivable:

* zero lost rows — every appended id present exactly once with its
  written value;
* merge keys carry the LAST merger round's value (the merger is one
  sequential thread, so last-write is well-defined even though its
  commits interleave arbitrarily with appends/compactions);
* `snapshot_rowcount` answers metadata-exact and equals the scan;
* the file count is BOUNDED (maintenance converged the small-file
  tail), not O(commits);
* version history is a contiguous chain whose COMMITS include every
  writer's operations.

Data generation is fully deterministic (fixed ids/values, no RNG); the
thread interleaving is the only nondeterminism, and the assertions must
hold under ANY interleaving — that is the property under test.
"""

from __future__ import annotations

import threading

import pytest

#: r13 suite-wall gate (conftest): multi-minute rung; the property is
#: pinned at small fixtures by the pairwise-race pins in tests/test_snapshots.py,
#: test_deletion_vectors.py and test_equality_deletes.py.
pytestmark = pytest.mark.heavy_rung

from pyspark.sql import functions as F

from agf_data_ingestion_spark.sources.snapshots import (
    read_manifest,
    snapshot_maintain,
    snapshot_merge,
    snapshot_read,
    snapshot_rowcount,
    snapshot_write,
)

APPEND_COMMITS = 25  # per appender
ROWS_PER_APPEND = 20
MERGE_COMMITS = 16
MERGE_KEYS = 50


def test_occ_soak_concurrent_writers_with_maintenance(spark, tmp_path):
    table = str(tmp_path / "soak")

    # seed commit: the merge key range, so the table exists before the
    # racers start (concurrent table CREATION is a different contract)
    seed = spark.createDataFrame(
        [(3_000_000 + i, -1) for i in range(MERGE_KEYS)], "id long, val long"
    )
    snapshot_write(seed, table, mode="overwrite", op="seed")

    stop_maint = threading.Event()
    errors: list = []

    def appender(base: int):
        def run():
            try:
                for j in range(APPEND_COMMITS):
                    rows = [
                        (base + j * ROWS_PER_APPEND + r, j)
                        for r in range(ROWS_PER_APPEND)
                    ]
                    snapshot_write(
                        spark.createDataFrame(rows, "id long, val long"),
                        table,
                        mode="append",
                        op=f"append:{base}:{j}",
                    )
            except Exception as exc:  # pragma: no cover
                errors.append(exc)

        return run

    def merger():
        try:
            for j in range(MERGE_COMMITS):
                batch = spark.createDataFrame(
                    [(3_000_000 + i, j) for i in range(MERGE_KEYS)],
                    "id long, val long",
                )
                snapshot_merge(
                    batch,
                    table,
                    ["id"],
                    mode=("dv" if j % 2 else "cow"),
                    op=f"merge:{j}",
                )
        except Exception as exc:  # pragma: no cover
            errors.append(exc)

    def maintainer():
        try:
            while not stop_maint.is_set():
                snapshot_maintain(
                    spark,
                    table,
                    policy={"max_small_files": 8, "small_bytes": 1 << 20},
                )
                stop_maint.wait(2.0)
        except Exception as exc:  # pragma: no cover
            errors.append(exc)

    threads = [
        threading.Thread(target=appender(1_000_000)),
        threading.Thread(target=appender(2_000_000)),
        threading.Thread(target=merger),
        threading.Thread(target=maintainer),
    ]
    for th in threads[:3]:
        th.start()
    threads[3].start()
    for th in threads[:3]:
        th.join(timeout=600)
        assert not th.is_alive(), "writer thread hung"
    stop_maint.set()
    threads[3].join(timeout=120)
    assert not threads[3].is_alive(), "maintenance thread hung"
    assert not errors, errors

    # final converging maintenance pass: clears any debt the last writer
    # commits left behind, restoring metadata-exact answers
    snapshot_maintain(
        spark, table, policy={"max_small_files": 8, "small_bytes": 1 << 20}
    )

    # ---- exact final state ----
    expected = {}
    for base in (1_000_000, 2_000_000):
        for j in range(APPEND_COMMITS):
            for r in range(ROWS_PER_APPEND):
                expected[base + j * ROWS_PER_APPEND + r] = j
    for i in range(MERGE_KEYS):
        expected[3_000_000 + i] = MERGE_COMMITS - 1

    got = {
        r["id"]: r["val"]
        for r in snapshot_read(spark, table).select("id", "val").collect()
    }
    assert len(got) == len(expected) == 2 * APPEND_COMMITS * ROWS_PER_APPEND + MERGE_KEYS
    assert got == expected  # zero lost rows, no duplicates, last-merge-wins

    # metadata-exact rowcount agrees with the scan
    assert snapshot_rowcount(table) == len(expected)

    # bounded files: maintenance converged the tail — not O(commits)
    n_files = len(read_manifest(table)["files"])
    assert n_files <= 16, f"file count {n_files} did not converge"

    # contiguous, complete history: every writer's commits are in the log
    m = read_manifest(table)
    assert m["version"] >= 2 * APPEND_COMMITS + MERGE_COMMITS  # + seed/compactions
    dup = (
        snapshot_read(spark, table)
        .groupBy("id")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > 1)
        .count()
    )
    assert dup == 0
