"""Query-plan catalog: every engine capability as a (Spark plan, SQL oracle) pair.

``QUERIES`` maps a stable query name → QuerySpec.  The driver contract
(``__spark_entry__.py``) re-exports these; ``scripts/check_oracle.py`` runs
the Spark plan and the DuckDB oracle side by side exactly like the driver
does (row count + schema + order-insensitive value hash).

Cross-engine determinism rules used throughout (see plans/base.py):
* Sums over floating columns go through an exact DECIMAL cast so the result
  is independent of accumulation order (Spark partial aggs vs DuckDB), then
  back to DOUBLE for a stable output type.
* Every LIMIT / row_number has a unique total-order tiebreaker.
* No current_timestamp / rand in oracle-checked plans — "now" is a pinned
  literal.
"""

from __future__ import annotations

import dataclasses as _dc

from agf_data_ingestion_spark.plans.base import QuerySpec
from agf_data_ingestion_spark.plans import (
    analytics,
    ingest_queries,
    media,
    similarity,
    text,
    tpch_extra,
    tpch_more,
    training_data,
    windows,
)


def _pinned_session(fn):
    """Wrap a catalog query so it behaves identically under ANY caller's
    SparkSession (the driver builds its own): timestamps must render/parse
    in UTC to match the DuckDB oracle's naive timestamps."""

    def wrapped(spark, sf_dir):
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        return fn(spark, sf_dir)

    wrapped.__name__ = getattr(fn, "__name__", "query")
    wrapped.__doc__ = fn.__doc__
    return wrapped


QUERIES: dict[str, QuerySpec] = {}
for _mod in (
    analytics,
    tpch_extra,
    tpch_more,
    text,
    similarity,
    ingest_queries,
    media,
    windows,
    training_data,
):
    for _name, _spec in _mod.QUERIES.items():
        QUERIES[_name] = _dc.replace(_spec, fn=_pinned_session(_spec.fn))

__all__ = ["QUERIES", "QuerySpec"]
