from agf_data_ingestion_spark.sources.manifests import (  # noqa: F401
    read_experiment_manifests,
    read_run_manifests,
    stream_experiment_manifests,
    stream_run_manifests,
)
from agf_data_ingestion_spark.sources.tables import load_table, testdata  # noqa: F401
