"""Persisted incremental IVF-PQ index (operators/ann_index.py,
OP-X-ANNINC): append-equivalence, state round-trip, probe-time file
pruning, and search determinism."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from agf_data_ingestion_spark.operators.ann_index import (
    ann_index_append,
    ann_index_create,
    ann_index_search,
    load_state,
    probe_plan,
    train_index_state,
)
from agf_data_ingestion_spark.sources.snapshots import snapshot_read

SF = "/root/testdata/sf0.001"


def _vectors(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", "embedding"
    )


def _rows(df):
    return sorted(
        (int(r.vec_id), int(r.cell), tuple(int(c) for c in r.code))
        for r in df.collect()
    )


def test_append_equals_rebuild(spark, tmp_path):
    """The serving contract: appends under the frozen state produce a
    table bit-identical to a from-scratch encode of the union corpus —
    index maintenance is a pure fold."""
    v = _vectors(spark)
    split = 400
    a, b = v.filter(F.col("vec_id") < split), v.filter(F.col("vec_id") >= split)
    state = train_index_state(a)

    inc = str(tmp_path / "inc")
    ann_index_create(a, inc, state=state, cluster_files=4)
    ann_index_append(b, inc, cluster_files=4)

    full = str(tmp_path / "full")
    ann_index_create(v, full, state=state, cluster_files=4)

    assert _rows(snapshot_read(spark, inc)) == _rows(snapshot_read(spark, full))

    # search over the two tables must agree exactly (int64 ADC scores)
    q = v.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    r_inc = sorted(map(tuple, ann_index_search(spark, inc, q, k=3).collect()))
    r_full = sorted(map(tuple, ann_index_search(spark, full, q, k=3).collect()))
    assert r_inc == r_full and len(r_inc) == 9


def test_state_roundtrip(spark, tmp_path):
    v = _vectors(spark).filter(F.col("vec_id") < 300)
    state = train_index_state(v)
    table = str(tmp_path / "t")
    ann_index_create(v, table, state=state)
    got = load_state(table)
    assert got["cells"] == state["cells"]
    assert np.array_equal(got["ccv"], state["ccv"])
    assert set(got["rcb"]) == set(state["rcb"])
    for m in state["rcb"]:
        assert got["rcb"][m][0] == state["rcb"][m][0]
        assert np.array_equal(got["rcb"][m][1], state["rcb"][m][1])


def test_probe_prunes_files(spark, tmp_path):
    """cluster_by=['cell'] makes per-file cell ranges tight, so a
    single-cell probe opens a strict subset of the table's files."""
    v = _vectors(spark)
    table = str(tmp_path / "t")
    ann_index_create(v, table, cluster_files=8)
    state = load_state(table)
    one = [state["cells"][0]]
    paths, total = probe_plan(table, one)
    assert total >= 8
    assert 0 < len(paths) < total, (len(paths), total)
    # the probe still sees every row of that cell
    got = (
        spark.read.parquet(*paths)
        .filter(F.col("cell") == one[0])
        .count()
    )
    want = (
        snapshot_read(spark, table).filter(F.col("cell") == one[0]).count()
    )
    assert got == want > 0


def test_search_is_deterministic_and_excludes_self(spark, tmp_path):
    v = _vectors(spark)
    table = str(tmp_path / "t")
    ann_index_create(v, table, cluster_files=4)
    q = v.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    r1 = sorted(map(tuple, ann_index_search(spark, table, q, k=3).collect()))
    r2 = sorted(map(tuple, ann_index_search(spark, table, q, k=3).collect()))
    assert r1 == r2 and len(r1) == 15
    assert all(qid != nid for qid, nid, _rank, _s in r1)
