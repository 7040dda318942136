"""Streaming incremental near-duplicate detection: the continuous-ingestion
twin of ``plans/text.py:docs_incremental_neardup``.

Each micro-batch of documents is MinHash-banded (``_sigs_of`` — only the
batch is ever hashed), probed against the persisted corpus band store for
candidates, exact-verified with 3-gram Jaccard against the persisted
shingle store, and then appended to both stores.  A document's flagged
duplicate is its best match among all STRICTLY EARLIER documents (earlier
batches, or same batch with a smaller doc_id).  "Earlier" is therefore
ARRIVAL order across batches and doc_id order within one — the two agree
exactly when arrival order respects doc_id order (the ingest pipeline's
property: ids are assigned monotonically at ingest), and under that
precondition the result is independent of how the input is chopped into
batches: one batch with everything, or N batches, yields the identical
dup table (asserted by tests/test_neardup_stream.py).  If out-of-id-order
arrival is possible, the (new_id, dup_of) ORIENTATION of a pair can flip
versus the single-batch run — the pair membership itself cannot.

Storage (r6, VERDICT r5 next-round #5): all three stores are SNAPSHOT
tables (sources/snapshots.py) — concurrent writers compose through the
lock-free OCC, expiry/time-travel/CDC apply, and a crash between store
appends leaves committed-or-absent versions, never half-written parquet
directories.  The band store additionally keeps the BUCKETED ``(band,
bsig)`` file layout (sources/bucketed.py:write_bucketed_snapshot): the
corpus-sized store side of the probe join plans as a bucketed scan with
NO Exchange — only the micro-batch side shuffles to the bucket count
(plan-pinned).  At 1e9 docs that converts the probe from
"move the corpus every batch" to "move the batch".

Scale shape (the measured r3 claim in SCALE.md): per batch the work is
hash(|batch|) + band-probe(|batch| × collisions) + verify(|candidates|).
The stores are corpus-sized but are snapshot appends — nothing
corpus-sized is shuffled, collected, or broadcast; the shuffle_hash hint
rides the BATCH side (the build side must be the small one).

Reference lineage: the at-least-once re-delivery tolerance mirrors the
reference's idempotent conditional writes (agf_ingestion_lambda.py:226-236)
— re-processing a batch re-derives the same (doc_id, band, bsig) rows, and
the dup table is keyed by new_id so re-appends are dropped by the reader.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from agf_data_ingestion_spark.plans.text import (
    _lsh_bands,
    _shingles,
    _sigs_of,
    best_jaccard_matches,
)
from agf_data_ingestion_spark.sources.bucketed import (
    bucketed_snapshot_frame,
    prune_probe_dirs,
    write_bucketed_snapshot,
)
from agf_data_ingestion_spark.sources.snapshots import (
    current_version,
    snapshot_read,
    snapshot_write,
)

#: band-store bucket count — the ONE fixed shuffle width every probe and
#: append reuses; at 100 TB this is sized to executor count, not data
N_BAND_BUCKETS = 16


def _store_or_none(spark: SparkSession, table: str, **kw) -> DataFrame | None:
    """Absent snapshot store (no commits yet) → None; a CORRUPT store
    still raises — swallowing errors here would silently skip corpus
    dedup for every later batch."""
    if current_version(table) == 0:
        return None
    return snapshot_read(spark, table, **kw)


def neardup_sink(
    spark: SparkSession,
    store_dir: str,
    *,
    threshold: float = 0.2,
):
    """``foreachBatch`` function maintaining band/shingle snapshot stores
    and a dup snapshot table under ``store_dir`` (``bands/``, ``sets/``,
    ``dups/``)."""
    bands_tbl = os.path.join(store_dir, "bands")
    sets_tbl = os.path.join(store_dir, "sets")
    dups_tbl = os.path.join(store_dir, "dups")

    def sink(batch: DataFrame, batch_id: int) -> None:
        batch = batch.select("doc_id", "text")
        if batch.isEmpty():
            return
        # stabilize the batch plan: sigs/bands/sets all re-consume it
        batch = batch.localCheckpoint(eager=True)
        bands = _lsh_bands(_sigs_of(batch)).localCheckpoint(eager=True)
        sets_ = (
            batch.select("doc_id", _shingles().alias("sset"))
            .withColumn("sz", F.size("sset"))
            .localCheckpoint(eager=True)
        )

        # candidate pairs (new_id > dup_of so "earlier" always wins):
        # within-batch self-join + batch-vs-store probe
        nb = bands.alias("n")
        wb = bands.alias("c")
        cands = nb.join(
            wb,
            (F.col("n.band") == F.col("c.band"))
            & (F.col("n.bsig") == F.col("c.bsig"))
            & (F.col("n.doc_id") > F.col("c.doc_id")),
        ).select(F.col("n.doc_id").alias("new_id"), F.col("c.doc_id").alias("dup_of"))
        if current_version(bands_tbl) > 0:
            # the bucketed probe: the store side scans its (band, bsig)
            # buckets with NO exchange; only the batch side shuffles, and
            # the shuffle_hash hint makes the BATCH the build side
            stored_bands = bucketed_snapshot_frame(
                spark,
                bands_tbl,
                bucket_by=["band", "bsig"],
                n_buckets=N_BAND_BUCKETS,
                sort_by=["band", "bsig"],
            )
            # At-least-once tolerance: a re-delivered batch finds its OWN
            # rows in the store (the prior attempt appended them before the
            # checkpoint commit failed).  Those are not "earlier" documents
            # — without this anti-join a doc would match itself with
            # jaccard 1.0 and shadow its real duplicates.  Within-batch
            # pairs are already handled by the self-join above.
            stored_bands = stored_bands.join(
                batch.select("doc_id"), "doc_id", "left_anti"
            )
            sb = stored_bands.alias("c")
            cands = cands.unionByName(
                nb.hint("shuffle_hash")
                .join(
                    sb,
                    (F.col("n.band") == F.col("c.band"))
                    & (F.col("n.bsig") == F.col("c.bsig")),
                )
                .select(
                    F.col("n.doc_id").alias("new_id"),
                    F.col("c.doc_id").alias("dup_of"),
                )
            )
        cands = cands.distinct()

        # exact verify: new side = batch sets; dup side = batch ∪ stored
        # sets — via the SAME helper as the catalog query, so the
        # verify/tiebreak semantics cannot drift between batch and stream
        dup_side = sets_
        stored_sets = _store_or_none(spark, sets_tbl)
        if stored_sets is not None:
            dup_side = dup_side.unionByName(stored_sets)
        flagged = best_jaccard_matches(
            cands, sets_, dup_side.drop("sz"), threshold=threshold
        )
        snapshot_write(flagged, dups_tbl, op=f"neardup_dups@{batch_id}")
        # append the batch to the stores AFTER flagging (a doc never
        # matches itself; same-batch earlier docs were handled above)
        write_bucketed_snapshot(
            bands,
            bands_tbl,
            bucket_by=["band", "bsig"],
            n_buckets=N_BAND_BUCKETS,
            sort_by=["band", "bsig"],
            op=f"neardup_bands@{batch_id}",
        )
        snapshot_write(sets_, sets_tbl, op=f"neardup_sets@{batch_id}")
        # bound in-stream growth: keep only the trailing probe dirs (each
        # is O(files) hardlinks; N batches would accumulate N of them)
        prune_probe_dirs(spark, bands_tbl, keep_last=2)

    return sink


def best_dup_rows(d: DataFrame) -> DataFrame:
    """Keep the best-jaccard/lowest-dup_of row per ``new_id`` — the dup
    table's keep-best window, extracted for the structural sweep
    (plan_registry, r12).  Partitions on the new-doc id: batch/corpus
    cardinality at any scale."""
    w = Window.partitionBy("new_id").orderBy(F.desc("jaccard"), F.asc("dup_of"))
    return d.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1).drop("rn")


def read_dups(spark: SparkSession, store_dir: str) -> DataFrame:
    """The accumulated dup table; keyed by new_id (re-deliveries dropped,
    keeping the best-jaccard/lowest-dup_of row like the sink's window)."""
    return best_dup_rows(snapshot_read(spark, os.path.join(store_dir, "dups")))
