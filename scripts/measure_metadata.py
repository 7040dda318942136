#!/usr/bin/env python
"""Measured metadata-scale evidence for the r8 storage rungs (SCALE.md):

1. manifest-list segment pruning — segments resolved + wall time for a
   point query on a many-commit table, with seg_meta vs with it stripped
   (the pre-r8 planner's behavior);
2. declared sort order — files a point query opens before vs after
   maintenance converges an unsorted table;
3. zorder transform order — files a 2-D box predicate opens before vs
   after convergence.

Usage: python scripts/measure_metadata.py [n_commits]
Prints markdown rows.

``big`` mode (r9 — VERDICT r8 ask #3): the realistic-table-size rung the
1M-file extrapolations rest on.  Builds a 500-commit / 10k-file table
with METADATA-ONLY cost (tiny pyarrow-written data files ingested by
hardlink via ``snapshot_commit_files``) and measures: per-commit append
wall across the build (flat ⇔ O(delta) manifest writes), segment files
written per commit, cold point-query planning (segments resolved vs
total), maintenance convergence, and expiry wall.

    python scripts/measure_metadata.py big [n_commits=500] [files_per_commit=20]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_commit_files(src_dir: str, commit: int, n_files: int, rows_per_file: int = 10):
    """Write ``n_files`` tiny parquet files with disjoint, tight k-ranges
    for one commit — pyarrow-direct so the build measures the snapshot
    format's metadata cost, not Spark job overhead."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(src_dir, exist_ok=True)
    for j in range(n_files):
        base = (commit * n_files + j) * rows_per_file
        ks = list(range(base, base + rows_per_file))
        pq.write_table(
            pa.table({"k": pa.array(ks, pa.int64()), "v": pa.array([commit] * rows_per_file, pa.int64())}),
            os.path.join(src_dir, f"part-{j:05d}.parquet"),
        )


def big_rung(n_commits: int, files_per_commit: int) -> None:
    from agf_data_ingestion_spark.session import get_spark
    from agf_data_ingestion_spark.sources import snapshots as S

    spark = get_spark("measure-metadata-big", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    root = "/tmp/agf_meta_big"
    shutil.rmtree(root, ignore_errors=True)
    tbl = os.path.join(root, "big")
    template = spark.createDataFrame([], "k long, v long")
    seg_dir = os.path.join(tbl, "_snapshots", "segs")

    walls, seg_writes = [], []
    for i in range(n_commits):
        src = os.path.join(root, "src", str(i))
        build_commit_files(src, i, files_per_commit)
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

    n_files_total = len(S.read_manifest(tbl)["files"])
    w0 = med(walls[: n_commits // 10])
    w1 = med(walls[n_commits // 2 - n_commits // 20 : n_commits // 2 + n_commits // 20])
    w2 = med(walls[-n_commits // 10 :])
    print(f"| measurement | value |")
    print(f"|---|---|")
    print(
        f"| build: {n_commits} commits x {files_per_commit} files "
        f"= {n_files_total} files | total {sum(walls):.1f} s |"
    )
    print(
        f"| per-commit wall: first/mid/last decile medians "
        f"| {w0 * 1000:.0f} / {w1 * 1000:.0f} / {w2 * 1000:.0f} ms "
        f"(last/first = {w2 / w0:.2f}x) |"
    )
    print(
        f"| segment files written per commit (median / max) "
        f"| {med(seg_writes)} / {max(seg_writes)} |"
    )

    # cold point-query planning
    probe = [("k", "==", (n_commits // 2) * files_per_commit * 10 + 5)]
    S._SEG_CACHE.clear()
    r0 = S._SEG_READS
    t0 = time.time()
    hit = S.plan_files(tbl, where=probe)
    t_plan = time.time() - t0
    segs_resolved = S._SEG_READS - r0
    n_segs = len(S.read_manifest(tbl)["segments"])
    print(
        f"| cold point-query planning | {len(hit)} files, "
        f"{segs_resolved}/{n_segs} segments resolved, {t_plan * 1000:.0f} ms |"
    )

    # maintenance convergence
    t0 = time.time()
    rep = S.snapshot_maintain(
        spark, tbl, policy={"max_small_files": 64, "small_bytes": 1 << 20}
    )
    t_maint = time.time() - t0
    after = len(S.read_manifest(tbl)["files"])
    t0 = time.time()
    rep2 = S.snapshot_maintain(
        spark, tbl, policy={"max_small_files": 64, "small_bytes": 1 << 20}
    )
    t_noop = time.time() - t0
    print(
        f"| maintenance: {n_files_total} -> {after} files "
        f"| {t_maint:.1f} s; second run no-op ({'no commit' if not rep2['compacted'] else 'COMMITTED'}) {t_noop:.1f} s |"
    )

    # expiry
    t0 = time.time()
    S.expire_snapshots(tbl, keep_last=5, orphan_grace_s=0.0)
    t_exp = time.time() - t0
    rows = S.snapshot_read(spark, tbl).count()
    print(
        f"| expire keep_last=5 over {n_commits + 1} versions "
        f"| {t_exp:.1f} s; table reads back {rows} rows |"
    )
    expected = n_commits * files_per_commit * 10
    assert rows == expected, (rows, expected)
    shutil.rmtree(root, ignore_errors=True)


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "big":
        big_rung(
            int(sys.argv[2]) if len(sys.argv) > 2 else 500,
            int(sys.argv[3]) if len(sys.argv) > 3 else 20,
        )
        return
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    from pyspark.sql import functions as F

    from agf_data_ingestion_spark.session import get_spark
    from agf_data_ingestion_spark.sources import snapshots as S

    spark = get_spark("measure-metadata", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    root = "/tmp/agf_meta_measure"
    shutil.rmtree(root, ignore_errors=True)

    # -- 1. segment pruning -------------------------------------------------
    tbl = os.path.join(root, "segs")
    width = 10_000
    for i in range(n):
        S.snapshot_write(
            spark.range(i * width, (i + 1) * width).select(
                F.col("id").alias("k"), (F.col("id") % 97).alias("v")
            ),
            tbl,
        )
    m = S.read_manifest(tbl)
    n_segs = len(m["segments"])
    probe = [("k", "==", (n // 2) * width + 5)]

    def plan(clear_meta: bool):
        v = S.current_version(tbl)
        mp = S._manifest_path(tbl, v)
        with open(mp) as fh:
            raw = json.load(fh)
        if clear_meta:
            raw.pop("seg_meta", None)
        else:
            assert "seg_meta" in raw
        os.remove(mp)
        with open(mp, "w") as fh:
            json.dump(raw, fh)
        S._SEG_CACHE.clear()
        r0 = S._SEG_READS
        t0 = time.time()
        hit = S.plan_files(tbl, where=probe)
        return len(hit), S._SEG_READS - r0, time.time() - t0

    files_meta, segs_meta, t_meta = plan(clear_meta=False)
    files_nometa, segs_nometa, t_nometa = plan(clear_meta=True)
    # sanity BEFORE printing any evidence rows; the table is throwaway
    # (rmtree below), so the stripped manifest is never restored
    assert files_meta == files_nometa
    print("| measurement | with seg_meta | without (pre-r8) |")
    print("|---|---|---|")
    print(
        f"| point-query planning over {n} commits ({n_segs} segments) — "
        f"segments resolved | {segs_meta} | {segs_nometa} |"
    )
    print(
        f"| planning wall (cold segment cache) | {t_meta * 1000:.1f} ms |"
        f" {t_nometa * 1000:.1f} ms |"
    )

    # -- 2. declared sort order ---------------------------------------------
    tbl2 = os.path.join(root, "sorted")
    for i in range(6):
        S.snapshot_write(
            spark.range(i * 4000, (i + 1) * 4000)
            .select(
                F.conv(
                    F.substring(F.md5(F.col("id").cast("string")), 1, 8), 16, 10
                )
                .cast("bigint")
                .alias("ord"),
                F.col("id").alias("k"),
            )
            .orderBy("ord")
            .drop("ord")
            .repartition(4),
            tbl2,
        )
    before = len(S.plan_files(tbl2, where=[("k", "==", 12_345)]))
    total_before = len(S.read_manifest(tbl2)["files"])
    S.snapshot_set_sort_order(tbl2, ["k"])
    S.snapshot_maintain(spark, tbl2, policy={"small_bytes": 40_000})
    after = len(S.plan_files(tbl2, where=[("k", "==", 12_345)]))
    total_after = len(S.read_manifest(tbl2)["files"])
    print(
        f"| sort-order convergence: files opened for k==12345 "
        f"| {after}/{total_after} (converged) | {before}/{total_before} "
        f"(unsorted) |"
    )

    # -- 3. zorder transform order -------------------------------------------
    tbl3 = os.path.join(root, "zorder")
    for i in range(4):
        S.snapshot_write(
            spark.range(i * 6000, (i + 1) * 6000)
            .select(
                F.conv(
                    F.substring(F.md5(F.col("id").cast("string")), 1, 4), 16, 10
                )
                .cast("bigint")
                .alias("h")
            )
            .select(
                (F.col("h") % 64).alias("k"),
                (F.col("h") / 64).cast("bigint").alias("u"),
            )
            .repartition(3),
            tbl3,
        )
    box = [("k", ">=", 8), ("k", "<", 16), ("u", ">=", 8), ("u", "<", 16)]
    zbefore = len(S.plan_files(tbl3, where=box))
    ztot_b = len(S.read_manifest(tbl3)["files"])
    S.snapshot_set_sort_order(tbl3, [("zorder", "k", "u")])
    S.snapshot_maintain(spark, tbl3, policy={"small_bytes": 24_000})
    zafter = len(S.plan_files(tbl3, where=box))
    ztot_a = len(S.read_manifest(tbl3)["files"])
    print(
        f"| zorder convergence: files opened for the 8×8 box "
        f"| {zafter}/{ztot_a} (converged) | {zbefore}/{ztot_b} (unsorted) |"
    )
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
