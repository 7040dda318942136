"""Unit tests for the scalar/derivation layer against the reference's exact
semantics (oracle values computed by reimplementing the reference behavior
in plain Python here, from FIXTURES.md/SURVEY.md §2.3)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from agf_data_ingestion_spark.functions.checksums import is_valid_checksum, normalize_checksum
from agf_data_ingestion_spark.functions.paths import (
    basename,
    dirname,
    file_extension,
    is_valid_raw_key,
    payload_s3_key,
    synth_experiment_id,
)
from agf_data_ingestion_spark.functions.timestamps import parse_iso_timestamp


def _one(spark, expr, **cols):
    df = spark.createDataFrame([tuple(cols.values())], list(cols.keys()))
    return df.select(expr.alias("v")).first()["v"]


def test_valid_raw_key(spark):
    cases = {
        "raw/inst01/2024/03/01/run_1/run.json": True,
        "raw/inst01/2024/03/01/run_1": True,           # exactly 6 segments
        "raw/inst01/2024/03/01": False,                # too short
        "other/inst01/2024/03/01/run_1/run.json": False,
        "raw/inst01/20x4/03/01/run_1/run.json": False,  # non-numeric year
        "raw/inst01/2024/3/1/run_1/run.json": True,     # unpadded still digits
    }
    rows = [(k,) for k in cases]
    df = spark.createDataFrame(rows, ["key"]).select(
        "key", is_valid_raw_key(F.col("key")).alias("ok")
    )
    got = {r["key"]: r["ok"] for r in df.collect()}
    assert got == cases


def test_basename_ext_dirname(spark):
    assert _one(spark, basename(F.col("p")), p="a/b/c.txt") == "c.txt"
    assert _one(spark, basename(F.col("p")), p="c.txt") == "c.txt"
    assert _one(spark, dirname(F.col("p")), p="a/b/c.txt") == "a/b"
    assert _one(spark, dirname(F.col("p")), p="c.txt") == ""
    assert _one(spark, file_extension(F.col("p")), p="ARCHIVE.TAR.GZ") == "gz"
    assert _one(spark, file_extension(F.col("p")), p="noext") == "unknown"
    assert _one(spark, file_extension(F.col("p")), p=".hidden") == "hidden"


def test_payload_rewrite(spark):
    run_key = "raw/i/2024/03/01/r1/run.json"
    # multi-segment: staff/exp/file -> <dir>/staff/payload/exp/file  (ref :386-388)
    assert (
        _one(spark, payload_s3_key(F.col("k"), F.col("p")), k=run_key, p="Staff/EXP1/f.txt")
        == "raw/i/2024/03/01/r1/Staff/payload/EXP1/f.txt"
    )
    # single-segment degenerate branch (ref :389-391): seg/payload/seg
    assert (
        _one(spark, payload_s3_key(F.col("k"), F.col("p")), k=run_key, p="f.txt")
        == "raw/i/2024/03/01/r1/f.txt/payload/f.txt"
    )


def test_synth_experiment_id(spark):
    e = synth_experiment_id(F.col("p"), F.col("s"), F.col("r"))
    # folder present and != file -> folder_staff  (ref :373-375)
    assert _one(spark, e, p="Staff/EXP1/f.txt", s="Staff", r="r1") == "EXP1_Staff"
    # two segments: parts[1] == parts[-1] (the file) -> standalone (ref :376-377)
    assert _one(spark, e, p="Staff/f.txt", s="Staff", r="r1") == "standalone_Staff_r1"
    # one segment -> standalone
    assert _one(spark, e, p="f.txt", s="f.txt", r="r1") == "standalone_f.txt_r1"


def test_checksums(spark):
    h = "a" * 64
    assert _one(spark, normalize_checksum(F.col("c")), c=h.upper()) == h
    assert _one(spark, normalize_checksum(F.col("c")), c=f"sha256:{h}") == h
    assert _one(spark, normalize_checksum(F.col("c")), c=f"  sha256:{h} ") == h
    assert _one(spark, normalize_checksum(F.col("c")), c="a" * 63) is None
    assert _one(spark, is_valid_checksum(F.col("c")), c="z" * 64) is False


def test_parse_timestamp_lenient_strict(spark):
    fixed = dt.datetime(2024, 5, 1, 12, 0, 0)
    lenient = parse_iso_timestamp(F.col("t"), now=fixed)
    strict = parse_iso_timestamp(F.col("t"), strict=True)
    # Z-suffix parses to the same instant as +00:00 (session tz = UTC)
    got = _one(spark, lenient, t="2024-03-01T10:30:00Z")
    assert got == dt.datetime(2024, 3, 1, 10, 30, 0)
    got = _one(spark, lenient, t="2024-03-01T10:30:00+00:00")
    assert got == dt.datetime(2024, 3, 1, 10, 30, 0)
    # garbage/empty -> fixed now under lenient, NULL under strict
    assert _one(spark, lenient, t="not-a-date") == fixed
    assert _one(spark, lenient, t="") == fixed
    assert _one(spark, strict, t="not-a-date") is None
    assert _one(spark, strict, t="") is None


def test_top_level_api_surface_resolves():
    import agf_data_ingestion_spark as pkg

    for name in pkg._API:
        fn = getattr(pkg, name)
        assert callable(fn), name
    assert "snapshot_merge" in dir(pkg)
    import pytest

    with pytest.raises(AttributeError):
        pkg.no_such_api
