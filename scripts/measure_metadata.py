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
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
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
