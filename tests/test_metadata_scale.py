"""Metadata ladder at realistic table sizes (r9 — VERDICT r8 ask #3):
the pytest twin of ``scripts/measure_metadata.py big``.  Builds a
120-commit / 1,200-file snapshot table with metadata-only cost (tiny
pyarrow files ingested by hardlink) and pins the asymptotics the
1M-file extrapolations rest on:

* append commit cost is O(delta) — per-commit wall stays flat across
  the build (a manifest that inlined the full file list would grow
  linearly and the last-decile median would blow past the bound);
* segment WRITES per commit are O(delta) — ~one new segment file per
  commit, never a rewrite of the table's segment list;
* point-query planning is O(relevant segments) — the seg_meta bounds
  prune all but a constant few of the ~120 segments, cold cache;
* maintenance converges in one pass and the second pass is a no-op;
* expiry is bounded and the surviving table reads back exactly.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))

from measure_metadata import build_commit_files  # noqa: E402

from agf_data_ingestion_spark.sources import snapshots as S  # noqa: E402

N_COMMITS = 120
FILES_PER_COMMIT = 10
ROWS_PER_FILE = 10


def test_metadata_ladder_120_commits(spark, tmp_path):
    root = str(tmp_path)
    tbl = os.path.join(root, "big")
    template = spark.createDataFrame([], "k long, v long")
    seg_dir = os.path.join(tbl, "_snapshots", "segs")

    walls, seg_writes = [], []
    for i in range(N_COMMITS):
        src = os.path.join(root, "src", str(i))
        build_commit_files(src, i, FILES_PER_COMMIT, rows_per_file=ROWS_PER_FILE)
        segs_before = len(os.listdir(seg_dir)) if os.path.isdir(seg_dir) else 0
        t0 = time.time()
        S.snapshot_commit_files(
            tbl,
            src,
            schema_from=template,
            mode=("overwrite" if i == 0 else "append"),
            op=f"bulk:{i}",
        )
        walls.append(time.time() - t0)
        seg_writes.append(len(os.listdir(seg_dir)) - segs_before)

    def med(xs):
        return sorted(xs)[len(xs) // 2]

    n_files = len(S.read_manifest(tbl)["files"])
    assert n_files == N_COMMITS * FILES_PER_COMMIT

    # O(delta) commits: the last decile's median wall must not grow past
    # a generous bound over the first decile's (an O(table-files) manifest
    # write would be ~10x here and keep growing)
    w_first = med(walls[: N_COMMITS // 10])
    w_last = med(walls[-N_COMMITS // 10 :])
    assert w_last <= max(3.5 * w_first, w_first + 0.15), (w_first, w_last)

    # O(delta) segment writes: ~one new segment file per commit
    assert med(seg_writes) == 1
    assert max(seg_writes) <= 3  # occasional coalesce is fine
    assert sum(seg_writes) <= 2 * N_COMMITS

    # planning is O(relevant segments), cold cache
    probe_k = (N_COMMITS // 2) * FILES_PER_COMMIT * ROWS_PER_FILE + 5
    S._SEG_CACHE.clear()
    r0 = S._SEG_READS
    t0 = time.time()
    hit = S.plan_files(tbl, where=[("k", "==", probe_k)])
    t_plan = time.time() - t0
    segs_resolved = S._SEG_READS - r0
    n_segs = len(S.read_manifest(tbl)["segments"])
    assert len(hit) == 1
    assert n_segs >= N_COMMITS // 2  # the table really is many-segment
    assert segs_resolved <= 4, f"resolved {segs_resolved} of {n_segs} segments"
    assert t_plan < 2.0

    # maintenance converges; second pass is a provable no-op
    rep = S.snapshot_maintain(
        spark, tbl, policy={"max_small_files": 32, "small_bytes": 1 << 20}
    )
    assert rep["compacted"]
    after = len(S.read_manifest(tbl)["files"])
    assert after <= 32
    v_after = S.current_version(tbl)
    rep2 = S.snapshot_maintain(
        spark, tbl, policy={"max_small_files": 32, "small_bytes": 1 << 20}
    )
    assert not rep2["compacted"]
    assert S.current_version(tbl) == v_after

    # expiry is bounded and the survivor reads back exactly
    t0 = time.time()
    S.expire_snapshots(tbl, keep_last=3, orphan_grace_s=0.0)
    assert time.time() - t0 < 30.0
    rows = S.snapshot_read(spark, tbl)
    n = rows.count()
    assert n == N_COMMITS * FILES_PER_COMMIT * ROWS_PER_FILE
    # expired versions are gone, survivors remain addressable
    cur = S.current_version(tbl)
    import pytest

    with pytest.raises(Exception):
        S.read_manifest(tbl, 1)
    assert S.read_manifest(tbl, cur)["files"]


def test_pure_append_reads_no_segments(spark, tmp_path):
    """The O(delta) append fast path (r9): committing a pure append to a
    many-segment table must not RESOLVE parent segments at all — reuse is
    by name with counts/meta from seg_meta.  Pinned via the _SEG_READS
    counter: the whole commit (staging + publish) performs at most the
    coalescing pair's reads (0 when no coalesce fires)."""
    tbl = os.path.join(str(tmp_path), "t")
    template = spark.createDataFrame([], "k long, v long")
    for i in range(30):
        src = os.path.join(str(tmp_path), "src", str(i))
        build_commit_files(src, i, 2)
        S.snapshot_commit_files(
            tbl,
            src,
            schema_from=template,
            mode=("overwrite" if i == 0 else "append"),
            op=f"bulk:{i}",
        )
    n_segs = len(S.read_manifest(tbl)["segments"])
    assert n_segs > 5  # genuinely many-segment

    src = os.path.join(str(tmp_path), "src", "delta")
    build_commit_files(src, 99, 2)
    r0 = S._SEG_READS
    S.snapshot_commit_files(tbl, src, schema_from=template, mode="append")
    reads = S._SEG_READS - r0
    assert reads <= 2, f"append resolved {reads} segments (expected <= 2)"

    # the Spark write path is equally O(delta)
    df = spark.createDataFrame([(10**9, 1)], "k long, v long")
    r0 = S._SEG_READS
    S.snapshot_write(df, tbl, mode="append")
    reads = S._SEG_READS - r0
    assert reads <= 2, f"snapshot_write append resolved {reads} segments"

    # and the table still reads back whole
    assert (
        S.snapshot_read(spark, tbl).count() == 30 * 2 * 10 + 2 * 10 + 1
    )
