"""agf_data_ingestion_spark — a PySpark-native analytics/ingestion engine.

A brand-new Spark-first implementation of the query and data-processing
capabilities of the reference system (an AWS-serverless metadata-ingestion
pipeline; see SURVEY.md), extended with large-scale training-data pipeline
operators (dedup, similarity search, text analysis, multimodal columns).

Everything is expressed through the DataFrame/SQL API so Catalyst handles
predicate pushdown, column pruning, join strategy, and AQE re-planning.
"""

__version__ = "0.1.0"

from agf_data_ingestion_spark.session import get_spark  # noqa: F401

#: Lazy top-level API: the names a consumer reaches for first, resolved on
#: first access so importing the package stays cheap (no plan modules, no
#: SparkSession side effects).
_API = {
    # snapshot table format
    "snapshot_read": "agf_data_ingestion_spark.sources.snapshots",
    "snapshot_write": "agf_data_ingestion_spark.sources.snapshots",
    "snapshot_upsert": "agf_data_ingestion_spark.sources.snapshots",
    "snapshot_merge": "agf_data_ingestion_spark.sources.snapshots",
    "snapshot_delete": "agf_data_ingestion_spark.sources.snapshots",
    "snapshot_compact": "agf_data_ingestion_spark.sources.snapshots",
    "snapshot_diff": "agf_data_ingestion_spark.sources.snapshots",
    "snapshot_tag": "agf_data_ingestion_spark.sources.snapshots",
    "snapshot_untag": "agf_data_ingestion_spark.sources.snapshots",
    "snapshot_tags": "agf_data_ingestion_spark.sources.snapshots",
    "snapshot_history": "agf_data_ingestion_spark.sources.snapshots",
    "expire_snapshots": "agf_data_ingestion_spark.sources.snapshots",
    "version_as_of": "agf_data_ingestion_spark.sources.snapshots",
    # ingest / ops
    "backfill": "agf_data_ingestion_spark.streaming.ingest_stream",
    "upsert_append": "agf_data_ingestion_spark.operators.upsert",
    "reconcile": "agf_data_ingestion_spark.operators.reconcile",
    "reconcile_incremental": "agf_data_ingestion_spark.operators.reconcile",
    "check_expectations": "agf_data_ingestion_spark.operators.expectations",
    # training-data delivery
    "assign_shards": "agf_data_ingestion_spark.operators.shards",
    "write_training_shards": "agf_data_ingestion_spark.operators.shards",
}


def __getattr__(name: str):
    if name in _API:
        import importlib

        return getattr(importlib.import_module(_API[name]), name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def __dir__():
    return sorted(set(globals()) | set(_API))
