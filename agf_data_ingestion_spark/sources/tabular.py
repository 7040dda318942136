"""Multi-format tabular source/sink helpers: CSV, JSON-lines, ORC.

The reference's only wire format is JSON manifests
(``agf_ingestion_lambda.py:194-199``); an analytics engine replacing it
must also ingest the delimited/columnar formats instruments and upstream
systems actually emit.  All readers take an EXPLICIT schema (never infer —
inference is a full extra pass over the data and schema drift becomes
silent) and split malformed rows into a quarantine DataFrame instead of
failing the batch (OP-SINK-DLQ semantics, same contract as the manifest
readers).

Scale notes: CSV and JSON scans parallelize per file-split like parquet
but carry no column statistics — predicates filter after parse, so these
formats are landing-zone inputs, not storage formats.  `to_columnar`
rewrites a landing table to parquet/ORC with an optional partition layout;
downstream queries then get pruning + pushdown.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

_CORRUPT = "_corrupt_record"


def _with_corrupt_field(schema: StructType) -> StructType:
    if _CORRUPT in schema.fieldNames():
        return schema
    return StructType(list(schema.fields) + [StructField(_CORRUPT, StringType(), True)])


def read_csv_quarantined(
    spark: SparkSession,
    path: str,
    schema: StructType,
    *,
    header: bool = True,
    sep: str = ",",
) -> tuple[DataFrame, DataFrame]:
    """PERMISSIVE CSV read → (valid_rows, quarantined_raw_lines).

    A row that fails to parse against the schema lands in the quarantine
    frame with its raw text preserved (the DLQ translation of
    OP-STRM-ERR: poison records cost one row, never the batch).
    """
    df = (
        spark.read.schema(_with_corrupt_field(schema))
        .option("header", header)
        .option("sep", sep)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .csv(path)
        # one materialization feeding both splits; localCheckpoint (not
        # cache) so the blocks are released when the frames are GC'd —
        # cache entries registered here would leak per call in a
        # long-lived session with no handle for the caller to unpersist
        .localCheckpoint(eager=True)
    )
    valid = df.filter(F.col(_CORRUPT).isNull()).drop(_CORRUPT)
    bad = df.filter(F.col(_CORRUPT).isNotNull()).select(F.col(_CORRUPT).alias("raw"))
    return valid, bad


def read_jsonl_quarantined(
    spark: SparkSession, path: str, schema: StructType
) -> tuple[DataFrame, DataFrame]:
    """PERMISSIVE JSON-lines read → (valid_rows, quarantined_raw_lines)."""
    df = (
        spark.read.schema(_with_corrupt_field(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .json(path)
        .localCheckpoint(eager=True)  # see read_csv_quarantined
    )
    valid = df.filter(F.col(_CORRUPT).isNull()).drop(_CORRUPT)
    bad = df.filter(F.col(_CORRUPT).isNotNull()).select(F.col(_CORRUPT).alias("raw"))
    return valid, bad


def to_columnar(
    df: DataFrame,
    path: str,
    *,
    fmt: str = "parquet",
    partition_by: tuple[str, ...] = (),
    mode: str = "overwrite",
) -> None:
    """Rewrite a landing-zone table to a columnar format (parquet or ORC),
    optionally Hive-partitioned — the step that turns a CSV drop into a
    prunable, pushdown-friendly lake table."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    if fmt == "parquet":
        w.parquet(path)
    elif fmt == "orc":
        w.orc(path)
    else:
        raise ValueError(f"unsupported columnar format: {fmt}")


def read_columnar(spark: SparkSession, path: str, *, fmt: str = "parquet") -> DataFrame:
    if fmt == "parquet":
        return spark.read.parquet(path)
    if fmt == "orc":
        return spark.read.orc(path)
    raise ValueError(f"unsupported columnar format: {fmt}")
