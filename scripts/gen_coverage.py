#!/usr/bin/env python
"""Regenerate COVERAGE.md: the SURVEY.md §2 operator-ID → implementation
audit table (query catalog coverage + test-only coverage)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from agf_data_ingestion_spark.plans import QUERIES  # noqa: E402

# Operators whose semantics are sinks / runtime behavior rather than a
# query result — covered by the module + test suite instead of the oracle
# harness.  (op → implementation, tests)
TEST_COVERED = {
    "OP-X-SHARDS": (
        "operators/shards.py (deterministic token-budgeted training-shard writer: two-pass distributed prefix sum — per-partition subtotals, driver offsets bounded by partition count, parallel local windows; one file per shard + manifest; wired into the curate CLI via --shards)",
        "tests/test_shards.py (distributed prefix sum == single-window ground truth; partitioning-independence; budget/contiguity/determinism; manifest round-trip) + tests/test_curate_cli.py",
    ),
    "OP-X-CDCSTREAM": (
        "sources/snapshot_stream.py (Spark 4 Python DataSource streaming CDC over the snapshot format: per-trigger batches covering newly committed versions, insert/delete rows tagged with _commit_version, file-delta rule so appends read only the appended batch; replayable offsets)",
        "tests/test_snapshot_stream.py (tails commits across runs, compaction nets to zero, replay determinism, startingVersion)",
    ),
    "OP-X-MERGE": (
        "sources/snapshots.py (copy-on-write keyed MERGE with per-key stats-range file pruning; immutable release tags + tag-aware expiry; timestamp/tag time travel; snapshot_replace put_item-parity ingest sink, streaming/ingest_stream.py)",
        "tests/test_snapshots.py (merge update+insert, duplicate rejection, stats-pruned rewrite, tag pinning through expiry) + tests/test_streaming.py (changed-resync replace vs insert-only)",
    ),
    "OP-X-DEDUP-INC": (
        "streaming/neardup_stream.py (incremental near-dup sink: per-batch hash, band-store probe, exact verify, append) + plans/text.py `docs_incremental_neardup`",
        "tests/test_neardup_stream.py (batch-chop independence vs independently-derived batch semantics)",
    ),
    "OP-X-UDTF": (
        "functions/udtfs.py (Spark 4 Python UDTF: sentence segmentation with source offsets, LATERAL join shape, lazy handle; JVM-native twin is the production path)",
        "tests/test_udtf.py (UDTF ≡ native twin on corpus + adversarial edge cases; span-offset reconstruction)",
    ),
    "OP-X-DV": (
        "sources/snapshots.py (merge-on-read deletion vectors: snapshot_delete(mode='dv') commits O(matches) position-delete files and entry updates only; merge-on-read reads via _read_entries anti-join with size-guarded broadcast; compaction applies-and-purges; expiry reclaims; entry-identity OCC + segment reuse)",
        "tests/test_deletion_vectors.py (DV ≡ COW result, zero-rewrite commit, exact rowcount across overlapping deletes, honest MIN/MAX, CDC/diff + streaming CDC emit the deletes, compaction purge + reclaim, upsert/merge over DVs, disjoint-rewrite concurrency, same-file race convergence, restore/expiry retention)",
    ),
    "OP-X-SCHEMAEVO": (
        "sources/snapshots.py `snapshot_rename_column`/`snapshot_drop_column`/`snapshot_widen_column` + `_evolve_fields` field registry (immutable physical names, metadata-only DDL commits; registry-driven reads with Spark 4 parquet type promotion; reserved-name refusal; by-field-id CDC alignment)",
        "tests/test_schema_evolution.py r7 block (rename preserves old files + stats pruning + DML across the rename, drop hides everywhere incl. streaming CDC with reserved-name refusal, widen reads exact with narrow post-widen batches accepted, pure rename nets zero in diff, diff aligns by field id, branch rebase carries one-sided registry evolution and refuses two-sided, eq-key rename blocked until compact)",
    ),
    "OP-X-EQDELETE": (
        "sources/snapshots.py `snapshot_delete_keys` + `snapshot_merge(mode='eq', delete_keys=...)` (Iceberg-v2 equality deletes: O(batch) key rows + manifest metadata, zero target reads; per-entry sequence numbers + manifest-level eq items with key bounds; readers anti-join keys size-guarded; compaction applies, commit GC drops, expiry reclaims; `forget --keys` CLI) + streaming/upsert_stream.py (continuous CDC upsert runtime: foreachBatch nets each micro-batch — order_col last-change-wins, delete_col deletes folded into the SAME atomic commit — with the op-label + durable-HWM exactly-once bookmark of the ann_stream pattern)",
        "tests/test_equality_deletes.py (eq == cow == position-DV, zero-read pins via monkeypatched _read_entries, same-sequence rule incl. delete-then-reinsert, CDC diff + streaming CDC net exactly, honest rowcount/minmax refusal, compaction->GC->expiry, stats-disproof no-op, NULL/type/column validation, multi-column keys, pruned reads + time travel + restore, batch-chopped streaming upsert == one-shot merge, eq-vs-compaction race recompute, branch fork/publish with live eq) + tests/test_upsert_stream.py (micro-batches == one-shot with zero target reads, replayed batch no-op, last-change-wins, one-commit upsert+delete with exact CDC, overlap refusal, e2e streaming query + restart dedup)",
    ),
    "OP-X-PARTSPEC": (
        "sources/snapshots.py (partition-spec evolution / hidden partitioning: transform specs (identity/day/month/hour/bucket/truncate) bound to source field ids, metadata-only single-CAS spec commits that refuse racing appends, hive-partitioned writes recording per-file partition tuples, per-spec scan pruning with conservative-KEEP, spec-aware restore and drop-column refusal)",
        "tests/test_partition_spec.py (13 cases: both-layout reads, strict-subset pruning per transform incl. md5-bucket plan-time/write-time agreement, OCC refusal of a racing append, rename survives via field ids + source-drop refusal, spec-id reuse + idempotent set, restore rolls the spec back, NULL-partition conservative keep, nested-dir expiry reclaim)",
    ),
    "OP-X-MAINTAIN": (
        "sources/snapshots.py `snapshot_maintain`/`snapshot_table_health` (policy-gated maintenance: metadata-only small-file/dv-ppm/eq-item triggers, compaction only when one fires, keep_last expiry; `maintain --policy` CLI)",
        "tests/test_maintenance.py (churned table — 12 tiny appends + DV + eq deletes — converges in ONE pass to bounded files with metadata-exact rowcount/minmax, healthy-table no-op commits nothing, dv-ppm trigger fires alone, CLI policy mode e2e)",
    ),
    "OP-X-SEGPRUNE": (
        "sources/snapshots.py `_seg_meta_of`/`_derive_segments`/`plan_files` (manifest-list segment pruning: per-segment aggregate column bounds carried in the manifest and copied O(delta) for reused segments; planning resolves only segments whose bounds admit the predicate — O(relevant segments) metadata I/O; conservative on stats-less members and pre-meta manifests)",
        "tests/test_segment_pruning.py (7 cases: strict-subset segment resolution pinned via the _SEG_READS counter, planned file set identical with and without seg_meta across 6 predicate shapes, unprunable predicate resolves everything, pre-meta manifest conservatively resolves all, reused-segment meta stability + DV entry-churn refresh, geometric-coalesce meta recompute, stats-less member blocks pruning on that column)",
    ),
    "OP-X-SORTORDER": (
        "sources/snapshots.py `snapshot_set_sort_order`/`snapshot_sort_order`/`_sort_cols_of` (declared table sort order: append-only order history bound to source field ids, files stamp their order id, appends range-cluster + sortWithinPartitions under the default order — within partition dirs when a spec is also set — compaction converges unsorted files, maintain gains the unsorted_files trigger, drop-of-sort-source refuses, restore rolls the history back, single-CAS race refusal)",
        "tests/test_sort_order.py (14 cases incl. zorder- and hilbert-transform 2-D box pruning, member rename survival, transform validation, and the spec+sort interplay pin — sorts lead with the partition columns so the partitionBy writer's required ordering is already satisfied and never destroys the secondary keys; metadata-only + idempotent set, stamped appends cover disjoint tight ranges vs pre-order whole-domain files, maintain converges unsorted history then prunes a strict subset with identical content and no-ops on the second run, order survives rename + blocks source drop, batch lacking the sort column refuses, reset + order-id reuse, racing append refusal, restore rollback, validation refusals)",
    ),
    "OP-X-PRUNEOPS": (
        "sources/snapshots.py `_file_nulls`/`_file_admits`/`_where_condition` (null-count + IN-list data skipping: footer null counts per file, is_null/not_null/in prune ops at file AND segment level, exact residual filters, conservative keep for pre-evolution and stats-less files, COW delete accepts IN predicates)",
        "tests/test_null_in_pruning.py (5 cases: is_null/not_null prune with exact results, per-value IN pruning incl. empty-list zero-plan and nothing-matches, segment-level null/IN pruning via _SEG_READS, pre-evolution conservative keep, COW delete with IN predicate + exact rowcount)",
    ),
    "OP-X-TEXTIDX": (
        "operators/text_index.py (persisted BM25 inverted index on the snapshot format: token-clustered + token-bloomed postings with denormalized dl, per-batch delta stats so concurrent appends commute, atomic two-table snapshot_multi_write commits, search = pruned per-term scans + exact decimal BM25 scoring)",
        "tests/test_text_index.py (5 cases: search ≡ docs_bm25_search bit-for-bit, append ≡ from-scratch rebuild incl. stats + search parity, lockstep two-table versions with stats ≡ direct recount, strict-subset probes via range pruning AND bloom exclusion of rare terms, unknown-term empty result) + tests/test_text_index_stream.py (stream ≡ one-shot build, replayed batch no-op, torn-HWM repair from op labels)",
    ),
    "OP-X-CURATE": (
        "operators/curation.py `curate_full` (end-to-end curation: rule gate → exact dedup → near-dup collapse → decontam → PR-curve-chosen trained-quality cut → DoReMi weights → WFQ interleave → token-budgeted shards; ONE snapshot_multi_write publishing shards+lineage+datacard(funnel)+index postings/stats+probe stores (hashes/bands/sets + r10 benchmark shingles)+policy; txn-aligned read-back verify; per-stage wall/rows; scripts/agf_pipeline.py curate --full; bench pipeline_curate_full)",
        "tests/test_curation.py (composed run BIT-IDENTICAL to stage-at-a-time execution with parquet round-trips between every stage; ten-table txn alignment survives later single-table commits; datacard funnel == report incl. monotone gates; lineage/postings/stats cover exactly the published corpus)",
    ),
    "OP-X-CURATEINC": (
        "operators/curation.py `curate_incremental` (O(batch) release append: frozen-policy gates from the published policy table, pruned probe-store dedup — hash IN-list / band-signature / sets-by-candidate-id reads through cluster+bloom skipping — r10 decontamination vs the txn-published benchmark shingle store (batch-bounded sh IN-list + the benchmark-id rule), manifest-stats shard continuation, horizon-free WFQ ordering, ten-table append txn; scripts/agf_pipeline.py curate --append-batch)",
        "tests/test_curation_incremental.py (planted exact-dup/near-dup/internal-dup/gate-fail/good cases each pinned to their drop reason; shard + global_pos continuation; index and all three probe stores cover exactly the union corpus; new txn atomic across ten tables with the base txn still time-travelable and published rows byte-stable)",
    ),
    "OP-X-CURATESTREAM": (
        "streaming/curate_stream.py (continuous curation: document stream -> curate_incremental, one ten-table txn per micro-batch; exactly-once via op-label bookmark + durable HWM under the shards table; zero-survivor batches commit the label trail, empty batches only advance the HWM)",
        "tests/test_curate_stream.py (real availableNow stream across a restart ≡ same-chop manual curate_incremental on a byte-identical twin release; replayed batch ids are exact no-ops; torn-HWM repair from the op-label scan; fresh batch still applies)",
    ),
    "OP-X-RELFORGET": (
        "operators/curation.py `release_forget` + `verify_release` (ten-table-release GDPR erasure via zero-read eq deletes in a crash-safe idempotent order, stats recomputed not delta-corrected, datacard audit trail; release audit: txn alignment, lineage cover, stats match, store coverage, bench-store presence, policy completeness, r10 current-state mode detecting torn forgets + deep mode verifying NO published doc shares a shingle with the benchmark store; curate --forget-ids / --verify-release [--current] [--deep])",
        "tests/test_release_forget.py (victims vanish from all six content tables' current state, survivors byte-stable, stats repair exact, audit rows land, replay is a {found: 0} no-op with no version churn, the publish txn still time-travels) + tests/test_curation.py::test_verify_release_audit",
    ),
    "OP-X-MULTITXN": (
        "sources/snapshots.py `snapshot_multi_write` (two-phase multi-table atomic commit: lock-free staging, txn_marker manifest reservations under an ordered lock set, marker-rename decision point, publish/recovery unified in _repair_current, dead-staging reclaim under the table lock)",
        "tests/test_multi_commit.py (three-table atomicity with shared op label + as-of visibility, hard crash BEFORE the marker leaves nothing visible and frees the slots, hard crash AFTER the marker recovers ALL tables incl. COMMITS lines, OCC race with a lock-free single-table writer converges via whole-txn retry, duplicate-table refusal + mid-prepare abort cleanliness, txn-aligned snapshot_read_txn pins one publish against later single-table commits)",
    ),
    "OP-X-UPDATE": (
        "sources/snapshots.py `snapshot_update` (predicate UPDATE completing the DML triad: cow rewrites stats-pruned touched files, dv shadows matched rows with position deletes + appends updated rows; SET sees the OLD row; up-front 0-row type check raises SchemaEvolutionError on retyping expressions before any write)",
        "tests/test_snapshot_update.py (cow ≡ dv reader equivalence, zero-match no-op both at stats and post-scan level, CDC delete+insert, OLD-row swap semantics, NULL-predicate rows kept, retype refusal with no commit, unknown column, concurrent same-file cow×dv race convergence, pruned reads post-update)",
    ),
    "OP-X-BRANCH": (
        "sources/branches.py (zero-copy branch fork: fork-version tag-pinned on the parent, branch is a full snapshot table under <table>/_branches/<name> — every snapshot op works on it unchanged; strict fast-forward publish as ONE replace-shaped parent commit with branch-local files hardlinked into the parent tree under the table lock; r7: snapshot_branch_rebase publishes a DIVERGED branch by replaying its net entry delta onto the advanced parent head when the touched file sets are disjoint and neither side added equality deletes — else BranchDiverged commits nothing; drop releases the pin)",
        "tests/test_branches.py (zero-copy fork + isolation both directions, fast-forward publish incl. DV entries with append-only history, divergence refusal commits nothing, parent-expiry starvation safety via the fork tag, drop-after-publish inode safety through expiry, name reuse, idle-branch no-op publish; r7 rebase: parent-append-then-publish lands both sides atomically, overlapping-file touch refuses, eq-delete divergence refuses both directions, unadvanced-parent rebase == publish)",
    ),
    "OP-X-OCC": (
        "sources/snapshots.py (optimistic concurrency: CAS manifest reservation via atomic link, lock-free append/upsert with manifest-delta conflict rebase, lock-held rewrite retry, pointer repair, vacuum grace for in-flight writers)",
        "tests/test_snapshots.py (CAS loss + pointer repair; deterministic races: disjoint-key dual commit, first-writer-wins overlap, partial-overlap rebase, merge-vs-append retry, orphan grace)",
    ),
    "OP-X-MVSTREAM": (
        "streaming/mv_stream.py (continuous CDC->MV query: foreachBatch folds each commit delta into the view; view-bookmark replay filter; availableNow backfill twin) + operators/mv.py mv_apply_cdc_batch",
        "tests/test_mv.py (view == full recompute at every micro-batch across downtime catch-up, live tail, and bookmark replay)",
    ),
    "OP-X-DCTPHASH": (
        "operators/multimodal.py (dct_phash_media: area-mean-pool 32x32 -> numpy 2D DCT-II -> low 8x8 minus DC -> median threshold, Arrow-batched; banded_hamming_pairs backend-agnostic detector)",
        "tests/test_media.py (local-reference parity, perceptual margin, planted-pair recovery through the banded pipeline, cross-validation vs SimHash)",
    ),
    "OP-X-MV": (
        "operators/mv.py (incremental materialized-view maintenance: CDC-delta aggregation with sign, decimal-exact keyed merge, bookmark rides the atomic view commit)",
        "tests/test_mv.py (incremental == full recompute across appends + deletes; zero-count group drop; idempotent no-op refresh)",
    ),
    "OP-X-TWS": (
        "streaming/tws_kmv.py (Spark 4 transformWithStateInPandas: per-group KMV in engine-managed RocksDB ListState; JVM-side md5 hash prep)",
        "tests/test_tws_kmv.py (processor merge logic vs batch estimator; e2e stream gated on protobuf availability)",
    ),
    "OP-X-HEAVYHIT": (
        "streaming/sketches.py (Misra-Gries summary/merge/sink: <=k counters + cumulative err bound)",
        "tests/test_mg_sketch.py (lower-bound/err/guaranteed-presence contract, batch + merge + streaming)",
    ),
    "OP-SRC-SYNTH": (
        "sources/synth.py (Spark 4 Python Data Source: partition-parallel deterministic generator, batch + replayable stream)",
        "tests/test_synth_source.py (3 tests: partitioning contract, determinism, stream≡batch)",
    ),
    "OP-X-SNAPSHOT": (
        "sources/snapshots.py (manifest snapshots: atomic commit, time travel by version/timestamp/tag, compaction, tag-aware expiry, atomic keyed upsert, copy-on-write predicate DELETE and keyed MERGE, immutable release tags, history metadata view)",
        "tests/test_snapshots.py (history invariance, idempotent upsert, compaction, expiry, stats-pruned copy-on-write delete + merge, as-of resolution across expired versions, tag pinning through expiry)",
    ),
    "OP-SINK-UPSERT": (
        "operators/upsert.py `upsert_append` (dropDuplicates + left-anti + append)",
        "tests/test_upsert.py (ingest-twice idempotency property)",
    ),
    "OP-SINK-BATCH": (
        "operators/upsert.py append path; streaming/ingest_stream.py foreachBatch writers",
        "tests/test_upsert.py, tests/test_streaming.py",
    ),
    "OP-SINK-ALERT": (
        "operators/reconcile.py `format_report` (pluggable reporter; SNS/SES stays external)",
        "tests/test_reconcile.py",
    ),
    "OP-SRC-EVENT": (
        "sources/manifests.py `stream_*_manifests` (file-source discovery per micro-batch, pathGlobFilter suffix routing)",
        "tests/test_streaming.py::test_stream_ingests_new_files_incrementally",
    ),
    "OP-STRM-TRIGGER": (
        "streaming/ingest_stream.py (maxFilesPerTrigger / availableNow; checkpointing replaces EventBridge delivery tracking)",
        "tests/test_streaming.py",
    ),
    "OP-STRM-CRON": (
        "operators/reconcile.py `reconcile` as an on-demand batch job (scheduling stays external, as in the reference)",
        "tests/test_reconcile.py",
    ),
    "OP-STRM-STATE": (
        "streaming/windowed.py `dedup_within_watermark`; idempotent MERGE in foreachBatch (upsert.py)",
        "tests/test_windowed_streaming.py::test_dedup_within_watermark",
    ),
    "OP-STRM-LATE": (
        "streaming/windowed.py `windowed_counts` (watermark = the reference's 8-day lateness bound made explicit)",
        "tests/test_windowed_streaming.py::test_windowed_counts_batch_and_late_drop",
    ),
    "OP-STRM-PAR": (
        "native partition parallelism (backfill = batch read of the same glob)",
        "tests/test_streaming.py::test_backfill_equals_streaming",
    ),
    "OP-STRM-RETRY": (
        "spark.task.maxFailures (engine-native task retry)",
        "— (platform behavior)",
    ),
    "OP-SINK-METRICS": (
        "streaming/windowed.py `observed` (Observation counters); quarantine counts",
        "tests/test_windowed_streaming.py::test_observe_metrics",
    ),
    "OP-DATE-NOW": (
        "functions/timestamps.py `now_column` (explicit pinned-now parameter for determinism)",
        "tests/test_functions.py; every ingest query pins now=2024-06-01",
    ),
    "OP-STR-URLDEC": (
        "sources/manifests.py / operators/reconcile.py (`url_decode` on file-URI keys)",
        "tests/test_reconcile.py",
    ),
    "OP-X-ANNINC": (
        "operators/ann_index.py (persisted IVF-PQ index over the snapshot format: frozen codebook state + cell-clustered (vec_id, cell, code) table; retrain-free appends, stats-pruned probes, exact-int64 ADC search) + streaming/ann_stream.py (continuous maintenance: foreachBatch folds with the micro-batch id recorded AS the commit op — bookmark and data move in one atomic manifest swap)",
        "tests/test_ann_index.py (append ≡ from-scratch rebuild under frozen state; state round-trip; probe opens a strict file subset; deterministic self-excluding search); tests/test_ann_stream.py (stream ≡ batch rebuild; replayed batch id is a no-op; mid-stream crash + checkpoint restart resumes without duplicate folds)",
    ),
}

HEADER = """# COVERAGE — SURVEY.md §2 operator inventory → implementation audit

Generated by `python scripts/gen_coverage.py`.  Two coverage routes:

1. **Query catalog** (`__spark_entry__.queries()`): each operator is
   exercised by at least one catalog query; *oracle* means the driver
   cross-checks the Spark result against an equivalent DuckDB SQL
   statement (row count + schema + order-insensitive value hash).
   Entries marked *rows-only* have no faithful ANSI-SQL twin (sketches,
   seeded LSH, zip bytes) and carry pytest assertions instead.
2. **Module + test suite**: sink/runtime operators whose effect is state,
   not a result set.

## 1. Query-catalog coverage
"""


def main() -> None:
    ops: dict[str, list[tuple[str, bool]]] = {}
    for name, spec in QUERIES.items():
        for op in spec.ops:
            ops.setdefault(op, []).append((name, spec.oracle is not None))

    lines = [HEADER]
    lines.append("| Operator (SURVEY §2) | Catalog queries (— = rows-only) |")
    lines.append("|---|---|")
    for op in sorted(ops):
        qs = ", ".join(f"`{n}`" + ("" if o else " —") for n, o in ops[op])
        lines.append(f"| {op} | {qs} |")

    lines.append("\n## 2. Module/test coverage (sinks, streaming runtime)\n")
    lines.append("| Operator | Implementation | Verified by |")
    lines.append("|---|---|---|")
    for op in sorted(TEST_COVERED):
        impl, tests = TEST_COVERED[op]
        lines.append(f"| {op} | {impl} | {tests} |")

    n_oracle = sum(1 for s in QUERIES.values() if s.oracle)
    lines.append(
        f"\n**Catalog size**: {len(QUERIES)} queries, {n_oracle} oracle-checked, "
        f"{len(QUERIES) - n_oracle} rows-only.\n"
    )
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "COVERAGE.md"), "w") as fh:
        fh.write("\n".join(lines))
    print(f"COVERAGE.md written: {len(ops)} query-covered ops, {len(TEST_COVERED)} test-covered")


if __name__ == "__main__":
    main()
