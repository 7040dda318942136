"""Custom Python Data Source (sources/synth.py): partition-count contract,
determinism across partitioning choices, and schema shape."""

from __future__ import annotations

from agf_data_ingestion_spark.sources.synth import SynthEventsSource


def test_synth_source_is_deterministic_across_partitioning(spark):
    spark.dataSource.register(SynthEventsSource)
    a = (
        spark.read.format("agf_synth")
        .option("rows", 500)
        .option("numPartitions", 2)
        .load()
    )
    b = (
        spark.read.format("agf_synth")
        .option("rows", 500)
        .option("numPartitions", 7)
        .load()
    )
    assert a.rdd.getNumPartitions() == 2
    assert b.rdd.getNumPartitions() == 7
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    assert ra == rb and len(ra) == 500  # partitioning never changes content
    assert [f.name for f in a.schema.fields] == [
        "event_id", "ts_us", "user_id", "event_type", "value",
    ]
    # different seed → different content
    c = (
        spark.read.format("agf_synth")
        .option("rows", 500)
        .option("numPartitions", 2)
        .option("seed", 7)
        .load()
    )
    assert sorted(map(tuple, c.collect())) != ra


def test_synth_source_feeds_catalog_operators(spark):
    """The generated frame must be usable by the engine's own operators —
    sessionize-shaped windows over synthetic events."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    spark.dataSource.register(SynthEventsSource)
    e = (
        spark.read.format("agf_synth")
        .option("rows", 2000)
        .option("users", 50)
        .load()
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    gaps = e.withColumn("prev", F.lag("ts_us").over(w)).filter(
        F.col("prev").isNotNull()
    )
    assert gaps.count() == 2000 - 50  # every user has a full lag chain
    per_user = e.groupBy("user_id").count()
    assert per_user.count() == 50


def test_synth_stream_reader_delivers_deterministic_batches(spark, tmp_path):
    """The streaming side must deliver consecutive id ranges whose rows are
    bit-identical to the batch reader's for the same ids (the replayable-
    source contract: recovery re-reads regenerate the same rows)."""
    import time

    spark.dataSource.register(SynthEventsSource)
    out: list = []

    def sink(batch, bid):
        out.extend(tuple(r) for r in batch.collect())

    q = (
        spark.readStream.format("agf_synth")
        .option("batchSize", 50)
        .load()
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "chk"))
        .start()
    )
    try:
        deadline = time.time() + 60
        while len(out) < 150 and time.time() < deadline:
            time.sleep(0.5)
    finally:
        q.stop()
    assert len(out) >= 150
    got = sorted(out)[:150]
    ids = [r[0] for r in got]
    assert ids == list(range(150))  # consecutive ranges, no gaps or dups
    want = sorted(
        tuple(r)
        for r in spark.read.format("agf_synth")
        .option("rows", 150)
        .option("users", 100)  # match the stream reader's default
        .load()
        .collect()
    )
    assert got == want  # stream rows ≡ batch rows for the same ids
