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
