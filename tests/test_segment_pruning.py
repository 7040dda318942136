"""Manifest-list (segment-level) pruning (r8): the manifest carries
aggregate column bounds per SEGMENT, so ``plan_files`` resolves only the
segments whose bounds admit the predicate — planning metadata I/O becomes
O(relevant segments) instead of O(table files).  At 100 TB / millions of
files even READING the file list is a job; Iceberg's manifest-list stats
are the public model (per-manifest partition/column bounds consulted
before any manifest is opened).

Conservatism contract: a segment is skipped ONLY when its recorded bounds
disprove the ANDed predicate for a column EVERY member entry has stats
for (``_seg_meta_of`` drops columns any member lacks); segments without
recorded meta (pre-meta manifests) are always resolved.  The per-file
``_file_admits`` check stays exact downstream, so segment pruning can
never change the planned file set — only how much metadata was read to
produce it.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from agf_data_ingestion_spark.sources import snapshots as S
from agf_data_ingestion_spark.sources.snapshots import (
    plan_files,
    read_manifest,
    snapshot_delete,
    snapshot_read,
    snapshot_write,
)


def _batch(spark, lo, hi):
    """One append covering the key range [lo, hi) — tight per-file and
    per-segment bounds by construction."""
    return spark.range(lo, hi).select(
        F.col("id").alias("k"),
        (F.col("id") * 2).alias("v"),
        F.concat(F.lit("s"), (F.col("id") % 3).cast("string")).alias("tag"),
    )


def _seg_reads():
    return S._SEG_READS


def _fresh(table):
    """Clear the process segment cache so _SEG_READS counts THIS plan's
    resolutions, not residue from table setup."""
    S._SEG_CACHE.clear()


def _build(spark, tmp_path, n_batches=6, width=100):
    tbl = str(tmp_path / "tbl")
    for i in range(n_batches):
        snapshot_write(_batch(spark, i * width, (i + 1) * width), tbl)
    return tbl


def test_point_query_resolves_strict_subset_of_segments(spark, tmp_path):
    tbl = _build(spark, tmp_path)
    m = read_manifest(tbl)
    n_segs = len(m["segments"])
    assert n_segs >= 6  # one segment per disjoint append
    _fresh(tbl)
    r0 = _seg_reads()
    hit = plan_files(tbl, where=[("k", "==", 250)])
    used = _seg_reads() - r0
    assert used < n_segs  # the manifest-list claim: strict subset resolved
    assert used >= 1
    # and the plan is still exactly the files whose range covers k=250
    assert hit and all(f["stats"]["k"][0] <= 250 <= f["stats"]["k"][1] for f in hit)


def test_segment_pruning_never_changes_the_planned_file_set(spark, tmp_path):
    tbl = _build(spark, tmp_path)
    for where in (
        [("k", "==", 250)],
        [("k", ">=", 480)],
        [("k", "<", 73)],
        [("k", ">", 120), ("k", "<=", 180)],
        [("tag", "==", "s1")],  # every segment spans all tags — no pruning
        None,
    ):
        pruned = plan_files(tbl, where=where)
        # ground truth: per-file pruning over the FULL resolved list
        m = read_manifest(tbl)
        flds = S._fields_of(m)
        pw = S._to_phys(where, flds)
        full = [f for f in m["files"] if S._file_admits(f, pw)]
        assert sorted(f["path"] for f in pruned) == sorted(
            f["path"] for f in full
        ), where


def test_unprunable_predicate_resolves_everything(spark, tmp_path):
    tbl = _build(spark, tmp_path)
    m = read_manifest(tbl)
    _fresh(tbl)
    r0 = _seg_reads()
    out = plan_files(tbl, where=[("tag", "==", "s1")])
    assert _seg_reads() - r0 == len(m["segments"])  # all spans admit
    assert len(out) == len(m["files"])


def test_pre_meta_manifest_is_conservatively_resolved(spark, tmp_path):
    """A manifest committed before seg_meta existed (simulated by
    stripping the key) must plan correctly by resolving every segment."""
    tbl = _build(spark, tmp_path, n_batches=4)
    v = S.current_version(tbl)
    mp = S._manifest_path(tbl, v)
    with open(mp) as fh:
        m = json.load(fh)
    meta = m.pop("seg_meta")
    os.chmod(mp, 0o644)
    os.remove(mp)
    with open(mp, "w") as fh:
        json.dump(m, fh)
    _fresh(tbl)
    r0 = _seg_reads()
    hit = plan_files(tbl, where=[("k", "==", 10)])
    assert _seg_reads() - r0 == len(m["segments"])  # no meta → resolve all
    assert len(hit) >= 1 and all(
        f["stats"]["k"][0] <= 10 <= f["stats"]["k"][1] for f in hit
    )
    assert meta  # the stripped meta was real


def test_reused_segment_meta_survives_and_dv_refreshes_it(spark, tmp_path):
    """An untouched segment's meta rides through later commits unchanged;
    a DV commit changes an entry, forcing a NEW segment whose meta is
    recomputed — and pruning stays correct for the merged view."""
    tbl = _build(spark, tmp_path, n_batches=3)
    m1 = read_manifest(tbl)
    # delete one key in the middle batch → that segment is rewritten
    snapshot_delete(spark, tbl, where=[("k", "==", 150)], mode="dv")
    m2 = read_manifest(tbl)
    assert m2["seg_meta"] and len(m2["segments"]) >= 3
    # untouched segments keep their exact meta dicts
    shared = set(m1["segments"]) & set(m2["segments"])
    assert shared
    for s in shared:
        assert m1["seg_meta"][s] == m2["seg_meta"][s]
    # pruned plan + snapshot_read still agree on the merged view
    rows = snapshot_read(spark, tbl).where("k >= 100 and k < 200").count()
    assert rows == 99  # one DV'd row gone
    hit = plan_files(tbl, where=[("k", "==", 150)])
    assert hit  # the file still exists (DV shadows the row, not the file)


def test_coalesced_segments_recompute_meta(spark, tmp_path, monkeypatch):
    """Geometric segment merging (> _MAX_SEGMENTS) writes merged segments
    whose meta is recomputed over the union — bounds stay sound."""
    monkeypatch.setattr(S, "_MAX_SEGMENTS", 3)
    tbl = _build(spark, tmp_path, n_batches=5)
    m = read_manifest(tbl)
    assert len(m["segments"]) <= 3
    assert set(m["seg_meta"]) == set(m["segments"])
    for s in m["segments"]:
        ent = S._read_segment(tbl, s)
        lo = min(e["stats"]["k"][0] for e in ent)
        hi = max(e["stats"]["k"][1] for e in ent)
        assert m["seg_meta"][s]["stats"]["k"] == [lo, hi]
        assert m["seg_meta"][s]["n"] == len(ent)
    # plans over the coalesced layout remain exact
    hit = plan_files(tbl, where=[("k", "==", 499)])
    assert hit and all(
        f["stats"]["k"][0] <= 499 <= f["stats"]["k"][1] for f in hit
    )


def test_stats_less_member_blocks_pruning_on_that_column(spark, tmp_path):
    """A segment containing one entry WITHOUT stats for the predicate
    column must never be skipped (the per-file conservative-keep, lifted
    to the segment level)."""
    tbl = _build(spark, tmp_path, n_batches=2)
    v = S.current_version(tbl)
    m = S._load_manifest(tbl, v)
    # strip 'k' stats from every entry of the FIRST segment and rebuild
    # it as a hand-written segment + manifest (simulating a legacy writer)
    s0 = m["segments"][0]
    ent = [dict(e) for e in S._read_segment(tbl, s0)]
    for e in ent:
        e["stats"] = {c: b for c, b in e["stats"].items() if c != "k"}
    new_name = S._write_segment(tbl, ent)
    m["segments"] = [new_name] + m["segments"][1:]
    m["seg_meta"] = dict(m["seg_meta"])
    m["seg_meta"].pop(s0)
    m["seg_meta"][new_name] = S._seg_meta_of(ent)
    assert "k" not in m["seg_meta"][new_name]["stats"]
    mp = S._manifest_path(tbl, v)
    os.remove(mp)
    with open(mp, "w") as fh:
        json.dump(m, fh)
    _fresh(tbl)
    r0 = _seg_reads()
    # probe k=150: INSIDE the intact segment's range, OUTSIDE the
    # stripped segment's actual data — yet the stripped segment must be
    # resolved AND its entries planned (no stats → cannot prune)
    hit = plan_files(tbl, where=[("k", "==", 150)])
    assert _seg_reads() - r0 == 2
    paths0 = {e["path"] for e in ent}
    assert paths0 <= {f["path"] for f in hit}
