"""Misra–Gries heavy-hitters sink: the lower-bound/err contract and the
guaranteed-presence property for true heavy hitters, across micro-batches.

Claims under test (streaming/sketches.py):
* summary counts are LOWER bounds: cnt ≤ true count;
* true count ≤ cnt + err (err = cumulative decrements, reported by the sink);
* err after the whole stream ≤ N/(k+1);
* every key with true count > err is present in the summary.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from agf_data_ingestion_spark.streaming.sketches import (
    mg_merge,
    mg_read,
    mg_sink,
    mg_summary,
)

SCHEMA = StructType([StructField("token", StringType())])

_K = 8


def _zipfish_rows(lo: int, hi: int) -> list[dict]:
    """Deterministic skewed tokens: token t_j appears when j divides i —
    small j are heavy (t_1 in every row), large j rare."""
    rows = []
    for i in range(lo, hi):
        for j in (1, 2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37):
            if i % j == 0:
                rows.append({"token": f"t{j}"})
    return rows


def _true_counts(rows: list[dict]) -> dict[str, int]:
    out: dict[str, int] = {}
    for r in rows:
        out[r["token"]] = out.get(r["token"], 0) + 1
    return out


def _write(dirpath: str, name: str, rows: list[dict]) -> None:
    os.makedirs(dirpath, exist_ok=True)
    with open(os.path.join(dirpath, name), "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")


def _assert_mg_contract(summary_rows, err, rows):
    true = _true_counts(rows)
    n = len(rows)
    est = {r.key: r.cnt for r in summary_rows}
    assert len(est) <= _K
    assert err <= n // (_K + 1) + 1, (err, n)
    for key, cnt in est.items():
        assert cnt <= true[key], (key, cnt, true[key])
        assert true[key] <= cnt + err, (key, cnt, err, true[key])
    for key, tc in true.items():
        if tc > err:
            assert key in est, (key, tc, err, sorted(est))


def test_mg_summary_batch_contract(spark):
    rows = _zipfish_rows(0, 2000)
    df = spark.createDataFrame(rows, SCHEMA)
    summary, err = mg_summary(df, key_col="token", k=_K)
    _assert_mg_contract(summary.collect(), err, rows)


def test_mg_merge_keeps_contract(spark):
    rows = _zipfish_rows(0, 3000)
    df = spark.createDataFrame(rows, SCHEMA)
    parts = [df.filter(F.crc32(F.col("token")) % 3 == i) for i in range(3)]
    merged, err = mg_summary(parts[0], key_col="token", k=_K)
    for p in parts[1:]:
        s, e1 = mg_summary(p, key_col="token", k=_K)
        merged, e2 = mg_merge(merged, s, k=_K)
        err += e1 + e2
    _assert_mg_contract(merged.collect(), err, rows)


def test_mg_streaming_sink_contract(spark, tmp_path):
    src = str(tmp_path / "src")
    chk = str(tmp_path / "chk")
    table = str(tmp_path / "mg")
    all_rows = []
    for i, (lo, hi) in enumerate([(0, 1000), (1000, 2000), (2000, 3000)]):
        rows = _zipfish_rows(lo, hi)
        all_rows.extend(rows)
        _write(src, f"{i}.json", rows)

    stream = spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).json(src)
    q = (
        stream.writeStream.foreachBatch(mg_sink(spark, table, key_col="token", k=_K))
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    stored, err = mg_read(spark, table)
    _assert_mg_contract(stored.collect(), err, all_rows)


def test_mg_sink_redelivery_is_idempotent(spark, tmp_path):
    """Re-running a foreachBatch under the same batch_id must not
    double-count (MG counter addition is not naturally idempotent)."""
    from agf_data_ingestion_spark.streaming.sketches import mg_sink, mg_read

    table = str(tmp_path / "mg")
    rows = _zipfish_rows(0, 1000)
    batch = spark.createDataFrame(rows, SCHEMA)
    sink = mg_sink(spark, table, key_col="token", k=_K)
    sink(batch, 0)
    once = sorted(map(tuple, mg_read(spark, table)[0].collect()))
    sink(batch, 0)  # re-delivery
    again = sorted(map(tuple, mg_read(spark, table)[0].collect()))
    assert again == once
    sink(batch, 1)  # a genuinely new batch still applies
    after = dict(map(tuple, mg_read(spark, table)[0].collect()))
    assert after["t1"] > dict(map(tuple, once))["t1"]


def test_mg_group_summary_contract(spark):
    """Per-group variant: bounds hold independently per group, with no
    driver collect inside the compress."""
    from pyspark.sql.types import StructType, StructField, StringType
    from agf_data_ingestion_spark.streaming.sketches import mg_group_summary

    schema = StructType([StructField("grp", StringType()), StructField("token", StringType())])
    rows = [{"grp": f"g{i % 3}", "token": r["token"]} for i, r in enumerate(_zipfish_rows(0, 2000))]
    df = spark.createDataFrame(rows, schema)
    summary, err = mg_group_summary(df, group_col="grp", key_col="token", k=_K)
    errs = {r.grp: r.err for r in err.collect()}
    est = {}
    for r in summary.collect():
        est.setdefault(r.grp, {})[r.key] = r.cnt
    true = {}
    for r in rows:
        true.setdefault(r["grp"], {}).setdefault(r["token"], 0)
        true[r["grp"]][r["token"]] += 1
    for g, tc in true.items():
        e = errs.get(g, 0)
        n_g = sum(tc.values())
        assert e <= n_g // (_K + 1) + 1, (g, e, n_g)
        assert len(est.get(g, {})) <= _K
        for key, cnt in est.get(g, {}).items():
            assert cnt <= tc[key] <= cnt + e, (g, key)
        for key, c in tc.items():
            if c > e:
                assert key in est.get(g, {}), (g, key, c, e)


def test_mg_group_sink_stream_and_redelivery(spark, tmp_path):
    from pyspark.sql.types import StructType, StructField, StringType
    from agf_data_ingestion_spark.streaming.sketches import (
        mg_group_read,
        mg_group_sink,
        mg_group_summary,
    )

    schema = StructType([StructField("grp", StringType()), StructField("token", StringType())])
    table = str(tmp_path / "mgg")
    sink = mg_group_sink(spark, table, group_col="grp", key_col="token", k=_K)
    all_rows = []
    for bid, (lo, hi) in enumerate([(0, 800), (800, 1600), (1600, 2400)]):
        rows = [{"grp": f"g{i % 3}", "token": r["token"]} for i, r in enumerate(_zipfish_rows(lo, hi))]
        all_rows.extend(rows)
        sink(spark.createDataFrame(rows, schema), bid)
        sink(spark.createDataFrame(rows, schema), bid)  # re-delivery: no-op

    summary, errs = mg_group_read(spark, table)
    true = {}
    for r in all_rows:
        true.setdefault(r["grp"], {}).setdefault(r["token"], 0)
        true[r["grp"]][r["token"]] += 1
    est = {}
    for r in summary.collect():
        est.setdefault(r.grp, {})[r.key] = r.cnt
    for g, tc in true.items():
        e = errs.get(g, 0)
        assert e <= sum(tc.values()) // (_K + 1) + 1
        for key, cnt in est.get(g, {}).items():
            assert cnt <= tc[key] <= cnt + e, (g, key, cnt, e, tc[key])
        for key, c in tc.items():
            if c > e:
                assert key in est.get(g, {}), (g, key, c, e)
