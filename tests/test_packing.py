"""Sequence-packing invariants (OP-X-SEQPACK, plans/packing.py).
Cross-engine bit-identity is covered by scripts/check_oracle.py; these
pin the NEXT-FIT semantics the loader contract depends on, the r10
adaptive bucket-count rule, and the collision-proof seq_id encoding."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from agf_data_ingestion_spark.plans.packing import (
    _PK_BUDGET,
    _PK_DOCS_PER_BUCKET,
    _PK_MIN_BUCKETS,
    _packed,
    docs_packed_sequences,
)
from tests.conftest import SF_SMOKE


def _base_frame(spark, sf_dir):
    from agf_data_ingestion_spark.plans.base import t

    return t(spark, sf_dir, "documents").select(
        "doc_id",
        F.least(
            F.size(F.split("text", " ")).cast("long"), F.lit(_PK_BUDGET).cast("long")
        ).alias("tok"),
        F.substring(
            F.md5(F.concat(F.lit("pack:"), F.col("doc_id").cast("string"))), 1, 16
        ).alias("h"),
    )


def _check_invariants(rows, n_buckets):
    assert rows
    by_seq = defaultdict(list)
    by_bucket = defaultdict(list)
    for r in rows:
        by_seq[r["seq_id"]].append(r)
        by_bucket[r["bucket"]].append(r)
        # seq_id = seq * n_buckets + bucket: injective at ANY per-bucket
        # sequence count (the r10 encoding, ADVICE r9)
        assert r["seq_id"] % n_buckets == r["bucket"]
        assert 1 <= r["n_tok"] <= _PK_BUDGET

    # within a sequence: offsets are contiguous in pack order and the
    # fill never exceeds the window
    for seq, members in by_seq.items():
        members.sort(key=lambda r: r["pack_rank"])
        fill = 0
        for m in members:
            assert m["seq_offset"] == fill
            fill += m["n_tok"]
        assert fill <= _PK_BUDGET

    # next-fit property: a sequence only opens because the NEXT doc did
    # not fit — so within a bucket, each non-final sequence's fill plus
    # its successor's first doc overflows the window (no premature opens)
    for bucket, members in by_bucket.items():
        members.sort(key=lambda r: r["pack_rank"])
        # ranks are dense 1..n
        assert [m["pack_rank"] for m in members] == list(range(1, len(members) + 1))
        fills = defaultdict(int)
        first_tok = {}
        order = []
        for m in members:
            if m["seq_id"] not in fills:
                order.append(m["seq_id"])
                first_tok[m["seq_id"]] = m["n_tok"]
            fills[m["seq_id"]] += m["n_tok"]
        for a, b in zip(order, order[1:]):
            assert fills[a] + first_tok[b] > _PK_BUDGET
        # sequence ordinals are dense within the bucket
        assert [s // n_buckets for s in order] == list(range(len(order)))

    # every doc packed exactly once + seq_ids collision-free across buckets
    assert len({r["doc_id"] for r in rows}) == len(rows)


def test_packing_invariants(spark):
    rows = docs_packed_sequences(spark, SF_SMOKE).collect()
    n_docs = len({r["doc_id"] for r in rows})
    expected_nb = max(
        _PK_MIN_BUCKETS, min(65536, n_docs // _PK_DOCS_PER_BUCKET)
    )
    _check_invariants(rows, expected_nb)


def test_packing_two_bucket_counts(spark):
    """The explicit-count escape hatch: both counts produce valid
    packings, every doc exactly once, seq_ids unique at each count."""
    d = _base_frame(spark, SF_SMOKE)
    for nb in (8, 32):
        rows = _packed(d, n_buckets=nb).collect()
        _check_invariants(rows, nb)
        assert len({r["seq_id"] for r in rows}) == len(
            {(r["bucket"], r["seq_id"]) for r in rows}
        )


def test_bucket_count_only_rebuckets(spark):
    """r10 pin (VERDICT r9 ask #5 'Done'): the within-bucket fold is a
    pure function of the bucket's doc set — changing the stream count
    re-buckets docs but NEVER changes how a given doc set packs.  Take
    one bucket's docs from an 8-stream pack and re-pack exactly that set
    as a single stream: ranks, sequence ordinals, offsets, and token
    counts must be identical."""
    d = _base_frame(spark, SF_SMOKE)
    packed8 = _packed(d, n_buckets=8).collect()
    target = [r for r in packed8 if r["bucket"] == 3]
    assert target
    ids = {r["doc_id"] for r in target}
    sub = d.filter(F.col("doc_id").isin([int(i) for i in ids]))
    solo = _packed(sub, n_buckets=1).collect()
    # n_buckets=1: bucket = 0 for every doc, seq_id = ordinal
    decode8 = sorted(
        (r["doc_id"], r["pack_rank"], r["seq_id"] // 8, r["seq_offset"], r["n_tok"])
        for r in target
    )
    decode1 = sorted(
        (r["doc_id"], r["pack_rank"], r["seq_id"], r["seq_offset"], r["n_tok"])
        for r in solo
    )
    assert decode8 == decode1


def test_per_bucket_fold_bound(spark):
    """The serial-fold bound the adaptive rule exists for: with the
    md5-uniform bucket assignment, no bucket's doc count exceeds 4x the
    mean at the catalog scale (the fold is O(max bucket), so this is the
    parallelism guarantee)."""
    rows = docs_packed_sequences(spark, SF_SMOKE).collect()
    by_bucket = defaultdict(int)
    for r in rows:
        by_bucket[r["bucket"]] += 1
    mean = len(rows) / max(1, len(by_bucket))
    assert max(by_bucket.values()) <= 4 * mean
