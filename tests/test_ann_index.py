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


def _search_rows(spark, table, queries, **kw):
    from agf_data_ingestion_spark.operators.ann_index import ann_index_search

    return sorted(map(tuple, ann_index_search(spark, table, queries, k=3, **kw).collect()))


def test_retrain_equals_fresh_create(spark, tmp_path):
    """ann_index_retrain ≡ a fresh ann_index_create on the same rows:
    same table content, same search results (VERDICT r5 #4 done-bar)."""
    from agf_data_ingestion_spark.operators.ann_index import ann_index_retrain
    from agf_data_ingestion_spark.sources.snapshots import current_version

    v = _vectors(spark)
    seed = v.filter(F.col("vec_id") < 300)
    tbl = str(tmp_path / "idx")
    ann_index_create(seed, tbl, cluster_files=4)
    ann_index_append(v.filter(F.col("vec_id") >= 300), tbl, cluster_files=4)
    v_pre = current_version(tbl)
    queries = v.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    pre = _search_rows(spark, tbl, queries)

    v_rt = ann_index_retrain(v, tbl, cluster_files=4)
    assert v_rt == v_pre + 1

    fresh = str(tmp_path / "fresh")
    ann_index_create(v, fresh, cluster_files=4)
    assert _rows(snapshot_read(spark, tbl)) == _rows(snapshot_read(spark, fresh))
    assert _search_rows(spark, tbl, queries) == _search_rows(spark, fresh, queries)

    # time travel: the pre-retrain version searches with the OLD codebook
    assert _search_rows(spark, tbl, queries, version=v_pre) == pre
    # append after retrain encodes under the NEW state and folds cleanly
    ann_index_append(v.limit(0), tbl, cluster_files=4)
    assert _search_rows(spark, tbl, queries) == _search_rows(spark, fresh, queries)


def test_retrain_requires_covering_corpus(spark, tmp_path):
    """Rows the supplied corpus misses cannot be re-encoded — loud error,
    never silent row loss."""
    import pytest

    from agf_data_ingestion_spark.operators.ann_index import ann_index_retrain

    v = _vectors(spark)
    tbl = str(tmp_path / "idx")
    ann_index_create(v, tbl, cluster_files=4)
    with pytest.raises(ValueError, match="not in the supplied corpus"):
        ann_index_retrain(v.filter(F.col("vec_id") >= 100), tbl, cluster_files=4)


def test_append_vs_retrain_race_converges(spark, tmp_path):
    """Either interleaving converges to ONE codebook version covering
    every row: a retrain landing first makes the append re-encode
    (StaleCodebook path); an append landing first forces the retrain
    recompute (delta_safe=never)."""
    import threading

    from agf_data_ingestion_spark.operators.ann_index import (
        _effective_state_name,
        ann_index_retrain,
    )

    v = _vectors(spark)
    seed = v.filter(F.col("vec_id") < 400)
    batch = v.filter(F.col("vec_id") >= 400).localCheckpoint(eager=True)
    tbl = str(tmp_path / "idx")
    ann_index_create(seed, tbl, cluster_files=4)

    errs: list[Exception] = []

    def _append():
        try:
            ann_index_append(batch, tbl, cluster_files=4)
        except Exception as e:  # pragma: no cover
            errs.append(e)

    def _retrain():
        try:
            # the union corpus: covers the concurrent append's rows
            ann_index_retrain(v, tbl, cluster_files=4)
        except Exception as e:  # pragma: no cover
            errs.append(e)

    t1, t2 = threading.Thread(target=_append), threading.Thread(target=_retrain)
    t1.start(); t2.start(); t1.join(); t2.join()
    assert not errs

    # one surviving codebook version; the table decodes consistently:
    # every row re-encodes to itself under the effective state
    name = _effective_state_name(tbl)
    from agf_data_ingestion_spark.operators.ann_index import encode, load_state

    want = _rows(encode(v, load_state(tbl, name=name)))
    got = _rows(snapshot_read(spark, tbl))
    assert got == want


def test_search_respects_deletion_vectors(spark, tmp_path):
    """A snapshot_delete(mode='dv') over the index table removes vectors
    from search results — the probe scan reads merge-on-read, so
    DV-deleted rows never resurrect as neighbors."""
    from agf_data_ingestion_spark.sources.snapshots import snapshot_delete

    v = _vectors(spark)
    tbl = str(tmp_path / "idx")
    ann_index_create(v, tbl, cluster_files=4)
    queries = v.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    before = ann_index_search(spark, tbl, queries, k=3).collect()
    victim = int(before[0].neighbor_id)
    snapshot_delete(spark, tbl, [("vec_id", "==", victim)], mode="dv")
    after = ann_index_search(spark, tbl, queries, k=3).collect()
    assert all(int(r.neighbor_id) != victim for r in after)
    assert len(after) == 6  # still top-3 per query from the survivors


def test_retrain_preserves_dv_deletes(spark, tmp_path):
    """Retrain rebuilds the LIVE rows: a snapshot_delete(mode='dv') stays
    deleted through a retrain (never resurrected), and the deleted id is
    not demanded of the corpus."""
    from agf_data_ingestion_spark.operators.ann_index import ann_index_retrain
    from agf_data_ingestion_spark.sources.snapshots import (
        snapshot_delete,
        snapshot_rowcount,
    )

    v = _vectors(spark)
    tbl = str(tmp_path / "idx")
    ann_index_create(v, tbl, cluster_files=4)
    n = snapshot_rowcount(tbl)
    snapshot_delete(spark, tbl, [("vec_id", "==", 3)], mode="dv")
    # corpus WITHOUT the deleted id satisfies the coverage check
    ann_index_retrain(v.filter(F.col("vec_id") != 3), tbl, cluster_files=4)
    ids = {int(r.vec_id) for r in snapshot_read(spark, tbl).select("vec_id").collect()}
    assert 3 not in ids and len(ids) == n - 1
    queries = v.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    after = ann_index_search(spark, tbl, queries, k=3).collect()
    assert all(int(r.neighbor_id) != 3 for r in after)
