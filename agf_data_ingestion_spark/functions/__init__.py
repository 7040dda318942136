"""Column-expression building blocks (SURVEY.md §2.2-2.3).

Every function here is pure — it takes/returns ``pyspark.sql.Column`` so it
composes into a single Project node and stays inside whole-stage codegen.
No Python UDFs in this layer.
"""

from agf_data_ingestion_spark.functions.paths import (  # noqa: F401
    basename,
    dirname,
    file_extension,
    is_valid_raw_key,
    path_segment,
    payload_s3_key,
    synth_experiment_id,
)
from agf_data_ingestion_spark.functions.timestamps import (  # noqa: F401
    epoch_seconds,
    parse_iso_timestamp,
)
from agf_data_ingestion_spark.functions.checksums import (  # noqa: F401
    is_valid_checksum,
    normalize_checksum,
)
