"""Sequence-packing invariants (OP-X-SEQPACK, plans/packing.py).
Cross-engine bit-identity is covered by scripts/check_oracle.py; these
pin the NEXT-FIT semantics the loader contract depends on."""

from __future__ import annotations

from collections import defaultdict

from agf_data_ingestion_spark.plans.packing import (
    _PK_BUDGET,
    _PK_SEQBASE,
    docs_packed_sequences,
)
from tests.conftest import SF_SMOKE


def test_packing_invariants(spark):
    rows = docs_packed_sequences(spark, SF_SMOKE).collect()
    assert rows
    by_seq = defaultdict(list)
    by_bucket = defaultdict(list)
    for r in rows:
        by_seq[r["seq_id"]].append(r)
        by_bucket[r["bucket"]].append(r)
        assert r["seq_id"] // _PK_SEQBASE == r["bucket"]
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
        assert [s % _PK_SEQBASE for s in order] == list(range(len(order)))

    # every doc packed exactly once
    assert len({r["doc_id"] for r in rows}) == len(rows)
