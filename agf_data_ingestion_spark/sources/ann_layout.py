"""IVF index as a partitioned table layout: the inverted file IS the
directory structure.

``emb_ivf_topk`` (plans/similarity.py) assigns every vector to its nearest
coarse-centroid cell; persisting the corpus ``partitionBy("cell")`` turns
that assignment into physical layout, so an ANN probe of ``nprobe`` cells
becomes a parquet scan whose ``PartitionFilters`` prune every other cell's
directory — at 10⁹ vectors a probe reads nprobe/ncells of the data without
any index structure beyond the filesystem (the same pattern Iceberg/Hive
partitioning gives any high-selectivity categorical predicate).

This is the write-side completion of the ANN story: centroid training
(`emb_kmeans_train`), assignment (`emb_ivf_topk`), layout (here), and the
snapshot format's Z-order + manifest stats (sources/snapshots.py) for
range predicates inside each cell.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_ivf_layout(assigned: DataFrame, table_dir: str, *, mode: str = "overwrite") -> None:
    """Persist an assigned corpus — (cell, vec_id, embedding, ...) — as a
    cell-partitioned parquet table.  One directory per inverted-file cell."""
    assigned.write.mode(mode).partitionBy("cell").parquet(table_dir)


def read_probe_cells(spark: SparkSession, table_dir: str, cells: list[int]) -> DataFrame:
    """Scan ONLY the probed cells.  The ``isin`` predicate lands in the
    scan's PartitionFilters (verified in tests/test_ann_layout.py), so
    unprobed directories are never listed into the plan."""
    return spark.read.parquet(table_dir).filter(F.col("cell").isin(cells))
