"""Z-order layout keys (functions/zorder.py): bit-exact interleave
round-trip, and the locality property that justifies the operator — a 2-D
range predicate touches fewer sort-contiguous file groups under the z
layout than under either single-column sort."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_interleave_round_trip(spark):
    from agf_data_ingestion_spark.functions.zorder import zorder2

    df = spark.createDataFrame(
        [(a, b) for a in (0, 1, 5, 100, (1 << 21) - 1) for b in (0, 3, 77, (1 << 21) - 1)],
        "a long, b long",
    ).withColumn("z", zorder2("a", "b"))
    for r in df.collect():
        z = r["z"]
        a = sum(((z >> (2 * i)) & 1) << i for i in range(21))
        b = sum(((z >> (2 * i + 1)) & 1) << i for i in range(21))
        assert (a, b) == (r["a"], r["b"])


def test_zorder_locality_beats_single_column_sorts(spark):
    from agf_data_ingestion_spark.plans.windows import events_zorder_layout

    z = events_zorder_layout(spark, SF_SMOKE)
    n_files = 64  # simulate a 64-file sorted write: ntile = contiguous ranges
    layouts = {
        "z": F.ntile(n_files).over(Window.orderBy("zkey", "event_id")),
        "time": F.ntile(n_files).over(Window.orderBy("hour_bucket", "event_id")),
        "user": F.ntile(n_files).over(Window.orderBy("user_id", "event_id")),
    }
    # a predicate selective in BOTH dimensions (~27% of users, ~10% of time)
    pred = (F.col("user_id") < 4) & F.col("hour_bucket").between(473400, 473472)
    touched = {}
    for name, tile in layouts.items():
        d = z.withColumn("f", tile).filter(pred)
        touched[name] = d.select("f").distinct().count()
        assert d.count() > 0
    # z-order must not lose to either single-column layout, and must beat
    # the worse of the two strictly (that is the whole point of the key)
    assert touched["z"] <= min(touched["time"], touched["user"]), touched
    assert touched["z"] < max(touched["time"], touched["user"]), touched
