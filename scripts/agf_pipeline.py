#!/usr/bin/env python
"""Operational CLI — the reference's entry points as engine subcommands.

    python scripts/agf_pipeline.py backfill  --lake <dir> --warehouse <dir>
        [--file-type {all,run,experiment}] [--dry-run] [--now ISO]
    python scripts/agf_pipeline.py stream    --lake <dir> --warehouse <dir>
        [--checkpoint <dir>] [--max-files-per-trigger N]
    python scripts/agf_pipeline.py reconcile --lake <dir> --warehouse <dir>
        [--days N]
    python scripts/agf_pipeline.py export    --warehouse <dir> --out <dir>
        [--group-col instrument_id]
    python scripts/agf_pipeline.py expect    --warehouse <dir>
    python scripts/agf_pipeline.py curate    --out <dir>
        [--docs <dir with documents.parquet>] [--decontaminate] [--split]
        [--shards <dir> [--shard-tokens N] [--shard-seed S]]
        [--release-table <dir> [--release-tag NAME]]
    python scripts/agf_pipeline.py tokenizer [--docs <dir>]
        (train the corpus BPE merges; prints the merge table + token totals)
    python scripts/agf_pipeline.py alter <rename|drop|widen>
        --table <dir> --column C [--to NEW]
        (metadata-only schema evolution: zero bytes rewritten)
    python scripts/agf_pipeline.py branch <create|publish|rebase|drop|list>
        --table <dir> [--name N] [--version V] [--drop]
        (zero-copy fork / fast-forward publish / rebase onto an advanced
        parent / drop / list — the multi-commit write-audit-publish
        staging loop)

Reference parity: ``scripts/backfill_s3_data.py`` (CLI flags --file-type /
--dry-run, summary counts), the EventBridge-triggered ingest (stream), the
weekly reconciliation Lambda (reconcile, incremental --days window), and
the zip-generator Lambda (export).
"""

from __future__ import annotations

import argparse
import datetime as dt
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _spark():
    from agf_data_ingestion_spark.session import get_spark

    s = get_spark("agf-pipeline")
    s.sparkContext.setLogLevel("ERROR")
    return s


def cmd_backfill(args) -> int:
    from agf_data_ingestion_spark.streaming.ingest_stream import backfill

    spark = _spark()
    now = dt.datetime.fromisoformat(args.now) if args.now else None
    if args.dry_run:
        from agf_data_ingestion_spark.sources.manifests import (
            read_experiment_manifests,
            read_run_manifests,
        )

        n_run = read_run_manifests(spark, args.lake).count() if args.file_type in ("all", "run") else 0
        n_exp = (
            read_experiment_manifests(spark, args.lake).count()
            if args.file_type in ("all", "experiment")
            else 0
        )
        print(f"DRY RUN: would process {n_run} run.json + {n_exp} experiment.json manifests")
        return 0
    chk = args.checkpoint or os.path.join(args.warehouse, "_checkpoints")
    backfill(
        spark, args.lake, args.warehouse, chk,
        file_type=args.file_type, now=now, sink=args.sink,
    )
    counts = {}
    for name in ("sync_runs", "experiments", "file_inventory"):
        path = os.path.join(args.warehouse, name)
        if not os.path.exists(path):
            counts[name] = 0
        elif args.sink.startswith("snapshot"):
            from agf_data_ingestion_spark.sources.snapshots import snapshot_read

            counts[name] = snapshot_read(spark, path).count()
        else:
            from agf_data_ingestion_spark.sources.tables import load_table

            counts[name] = load_table(spark, args.warehouse, name).count()
    print(f"backfill complete: {counts}")
    return 0


def cmd_stream(args) -> int:
    from agf_data_ingestion_spark.streaming.ingest_stream import (
        start_experiment_ingest,
        start_run_ingest,
    )

    spark = _spark()
    chk = args.checkpoint or os.path.join(args.warehouse, "_checkpoints")
    q1 = start_run_ingest(
        spark, args.lake, args.warehouse, chk,
        max_files_per_trigger=args.max_files_per_trigger, available_now=args.available_now,
        sink=args.sink,
    )
    q2 = start_experiment_ingest(
        spark, args.lake, args.warehouse, chk,
        max_files_per_trigger=args.max_files_per_trigger, available_now=args.available_now,
        sink=args.sink,
    )
    q1.awaitTermination()
    q2.awaitTermination()
    return 0


def cmd_reconcile(args) -> int:
    from agf_data_ingestion_spark.operators.reconcile import (
        format_report,
        list_storage_keys,
        reconcile,
        tracked_keys,
    )
    from agf_data_ingestion_spark.sources.tables import load_table

    spark = _spark()
    cutoff = (
        dt.datetime.now(dt.timezone.utc).replace(tzinfo=None) - dt.timedelta(days=args.days)
        if args.days
        else None
    )
    tables = {}
    for name in ("file_inventory", "sync_runs", "experiments"):
        path = os.path.join(args.warehouse, name)
        if os.path.exists(path):
            tables[name] = load_table(spark, args.warehouse, name)
    res = reconcile(
        list_storage_keys(spark, args.lake, cutoff=cutoff),
        tracked_keys(tables, cutoff=cutoff),
    )
    # reference delivery semantics (SNS → SES → print): CLI deployments get
    # the terminal channel; cloud channels are prepended by deployment glue
    from agf_data_ingestion_spark.operators.notify import (
        NotificationChain,
        print_notifier,
        reconciliation_subject,
    )

    chain = NotificationChain([print_notifier()])
    chain.notify(
        reconciliation_subject(res.orphaned_in_storage, res.orphaned_in_db),
        format_report(res, dt.datetime.now(dt.timezone.utc).isoformat()),
    )
    return 0 if res.status == "in_sync" else 2


def cmd_export(args) -> int:
    from pyspark.sql import functions as F

    from agf_data_ingestion_spark.operators.export import export_zip_groups
    from agf_data_ingestion_spark.sources.tables import load_table

    spark = _spark()
    inv = load_table(spark, args.warehouse, "file_inventory")
    # content is stubbed from metadata here (real deployment: ranged reads
    # of the object store inside the same group task)
    results = export_zip_groups(
        inv.withColumn("content", F.encode(F.col("s3_key"), "UTF-8")),
        group=F.col(args.group_col),
        path=F.col("file_path"),
        content=F.col("content"),
        output_dir=args.out,
    ).collect()
    for r in results:
        print(f"{r['export_group']}: {r['status']} files={r['file_count']} zip={r['zip_bytes']}")
    return 0


def _load_warehouse_table(spark, warehouse: str, name: str):
    """Load a warehouse table through the layout it was written with: a
    snapshot-format table (``_snapshots/`` manifest dir) must be read via
    its committed manifest — a plain parquet read of the data directory
    would ingest historical pre-merge files retained for time travel and
    double-count replaced keys."""
    path = os.path.join(warehouse, name)
    if os.path.isdir(os.path.join(path, "_snapshots")):
        from agf_data_ingestion_spark.sources.snapshots import snapshot_read

        return snapshot_read(spark, path)
    from agf_data_ingestion_spark.sources.tables import load_table

    return load_table(spark, warehouse, name)


def cmd_expect(args) -> int:
    """Data-quality gate over the warehouse tables (CI shape: exit 0 when
    every expectation passes, 3 otherwise; one JSON report line).  The
    default rule set encodes the reference's implicit invariants: primary
    keys present + unique, counts/sizes non-negative, file_inventory
    rows referentially attached to a sync run."""
    import json

    from pyspark.sql import functions as F

    from agf_data_ingestion_spark.operators.expectations import check_expectations

    spark = _spark()
    sync_runs = _load_warehouse_table(spark, args.warehouse, "sync_runs")
    inventory = _load_warehouse_table(spark, args.warehouse, "file_inventory")
    reports = []
    reports.append(
        check_expectations(
            sync_runs,
            [
                {"rule": "not_null", "col": "run_id"},
                {"rule": "unique", "col": "run_id"},
                {"rule": "min", "col": "files_count", "value": 0},
                {"rule": "min", "col": "total_bytes", "value": 0},
                {"rule": "in_set", "col": "processing_status", "values": ["completed"]},
            ],
        ).withColumn("table", F.lit("sync_runs"))
    )
    reports.append(
        check_expectations(
            inventory,
            [
                {"rule": "not_null", "col": "file_path"},
                {"rule": "min", "col": "file_size_bytes", "value": 0},
            ],
        ).withColumn("table", F.lit("file_inventory"))
    )
    # referential run_id applies to run-manifest rows only: experiment
    # manifests carry the reference's literal 'from_experiment_json'
    # sentinel (agf_ingestion_lambda.py experiment path), which has no
    # sync_runs counterpart by design.  NULL run_ids must NOT slip
    # through this filter (a not-equals predicate drops them), so the
    # subset keeps them and gates them with an explicit not_null rule —
    # the foreign_key rule alone ignores NULL keys.
    run_origin = inventory.filter(
        F.col("run_id").isNull() | (F.col("run_id") != "from_experiment_json")
    )
    reports.append(
        check_expectations(
            run_origin,
            [
                {"rule": "not_null", "col": "run_id"},
                {
                    "rule": "foreign_key",
                    "col": "run_id",
                    "ref": sync_runs,
                    "ref_col": "run_id",
                },
            ],
        ).withColumn("table", F.lit("file_inventory[run-origin]"))
    )
    rows = [r.asDict() for rep in reports for r in rep.collect()]
    n_fail = sum(1 for r in rows if not r["pass"])
    print(json.dumps({"checks": len(rows), "failed": n_fail, "report": rows}))
    return 0 if n_fail == 0 else 3


def cmd_curate(args) -> int:
    """Training-corpus curation: quality gate → exact dedup → near-dup
    cluster representatives — optionally followed by benchmark
    decontamination (``--decontaminate``) and deterministic train/val/test
    assignment (``--split``) — composed from the same oracle-checked
    catalog plans (docs_quality_gate, docs_dedup_exact, docs_dup_clusters,
    docs_contamination, docs_dataset_split).  Writes the surviving
    documents as parquet and prints ONE JSON funnel line.

    Every stage is a semi-join of the corpus against a (doc_id)-shaped
    survivor frame — at 100 TB the corpus text is scanned once for the
    final write; the gates themselves move only ids, hashes, signatures.
    Decontamination note: the exact shingle join is the truth here; at
    benchmark sets too large to broadcast, run the Bloom pass
    (docs_bloom_contamination — one-sided, never misses) as the map-side
    prefilter and exact-verify only its candidates.
    """
    import json

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    if getattr(args, "forget_ids", None):
        # release-level GDPR erasure: remove the docs from every
        # content-derived table of the ten-table release + repair stats
        from agf_data_ingestion_spark.operators.curation import release_forget

        ids = [int(x) for x in args.forget_ids.split(",") if x.strip()]
        print(json.dumps(release_forget(_spark(), args.out, ids)))
        return 0

    if getattr(args, "verify_release", False):
        # release audit: cross-table invariants of the ten-table publish
        # (--current audits per-table CURRENT state — detects torn forgets)
        from agf_data_ingestion_spark.operators.curation import verify_release

        report = verify_release(
            _spark(),
            args.out,
            current=getattr(args, "current", False),
            deep=getattr(args, "deep", False),
        )
        print(json.dumps(report))
        return 0 if report["ok"] else 6

    if getattr(args, "diff_releases", None):
        # release-to-release diff (r10): (section, key, a, b, delta) rows
        # between two published txn ids; 'current' = per-table current
        # state (sees marker-less forget commits)
        from agf_data_ingestion_spark.operators.curation import release_diff

        ta, tb = args.diff_releases
        rows = release_diff(
            _spark(),
            args.out,
            None if ta == "current" else ta,
            None if tb == "current" else tb,
        ).collect()
        out = [
            {k: r[k] for k in ("section", "key", "a", "b", "delta")}
            for r in sorted(rows, key=lambda r: (r["section"], r["key"]))
        ]
        print(json.dumps(out))
        return 0

    if getattr(args, "append_batch", None):
        # O(batch) incremental append to a published release: frozen
        # policy gates + pruned probe-store dedup + shard continuation,
        # one ten-table txn (operators/curation.py curate_incremental)
        from agf_data_ingestion_spark.operators.curation import curate_incremental

        spark = _spark()
        report = curate_incremental(
            spark,
            spark.read.parquet(args.append_batch),
            args.out,
            batch_label=args.batch_label,
            seed=args.shard_seed,
            budget_tokens=args.shard_tokens,
        )
        print(json.dumps(report))
        return 0

    if getattr(args, "full", False):
        # the end-to-end pipeline (operators/curation.py): every stage,
        # one atomic ten-table publish (shards/lineage/datacard/postings/
        # stats/hashes/bands/sets/bench/policy), funnel + per-stage walls in
        # the JSON report
        from agf_data_ingestion_spark.operators.curation import curate_full

        report = curate_full(
            _spark(),
            args.docs,
            args.out,
            budget_tokens=args.shard_tokens,
            seed=args.shard_seed,
        )
        print(json.dumps(report))
        return 0

    from agf_data_ingestion_spark.plans.base import t
    from agf_data_ingestion_spark.plans.text import docs_dup_clusters, docs_quality_gate
    from agf_data_ingestion_spark.plans.training_data import (
        docs_contamination,
        split_assignment,
    )

    spark = _spark()
    sf_dir = args.docs
    docs = t(spark, sf_dir, "documents")
    n_input = docs.count()

    gate = docs_quality_gate(spark, sf_dir).filter(F.col("keep")).select("doc_id")
    survivors = docs.join(gate, "doc_id", "left_semi")
    n_quality = survivors.count()

    # Dedup representatives are chosen AMONG SURVIVORS of the prior stage —
    # keying them off the full corpus would drop a whole dup-group whenever
    # its global representative had already been gated out, vanishing
    # content that has a perfectly good quality-passing copy.
    w_exact = Window.partitionBy(F.md5(F.lower(F.col("text")))).orderBy(F.asc("doc_id"))
    survivors = (
        survivors.withColumn("_rn", F.row_number().over(w_exact))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    n_exact = survivors.count()

    # near-dup cluster labels come from the full-corpus LSH graph (edges
    # through gated-out members still connect their surviving neighbors);
    # the kept member is the lowest-id SURVIVOR of each cluster
    labels = docs_dup_clusters(spark, sf_dir)
    w_near = Window.partitionBy("cluster_id").orderBy(F.asc("doc_id"))
    survivors = (
        survivors.join(labels, "doc_id")
        .withColumn("_rn", F.row_number().over(w_near))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "cluster_id")
    )
    n_final = survivors.count()

    report = {
        "input": n_input,
        "after_quality_gate": n_quality,
        "after_exact_dedup": n_exact,
        "after_neardup": n_final,
    }

    if getattr(args, "decontaminate", False):
        contaminated = docs_contamination(spark, sf_dir).select("doc_id")
        survivors = survivors.join(contaminated, "doc_id", "left_anti")
        report["after_decontamination"] = survivors.count()

    if getattr(args, "split", False):
        survivors = survivors.withColumn("split", split_assignment())
        report["splits"] = {
            r["split"]: r["n"]
            for r in survivors.groupBy("split").agg(F.count("*").alias("n")).collect()
        }

    survivors.write.mode("overwrite").parquet(args.out)
    report["out"] = args.out

    if getattr(args, "shards", None):
        from agf_data_ingestion_spark.operators.shards import write_training_shards

        manifest = write_training_shards(
            spark.read.parquet(args.out),
            args.shards,
            budget_tokens=args.shard_tokens,
            seed=args.shard_seed,
        )
        report["shards"] = {
            "out": args.shards,
            "n_shards": manifest["n_shards"],
            "budget_tokens": manifest["budget_tokens"],
            "seed": manifest["seed"],
        }

    if getattr(args, "release_table", None):
        # commit the curated corpus as a snapshot version and pin it with
        # an immutable tag: the release survives expiry, reads back via
        # snapshot_read(tag=...), and every training run can name the
        # exact bytes it consumed
        from agf_data_ingestion_spark.sources.snapshots import (
            AuditFailed,
            snapshot_tag,
            snapshot_tags,
            snapshot_write_audited,
        )

        # validate the tag BEFORE committing: tags are immutable, so a
        # re-run with the same name must fail cleanly with the report
        # printed and no dangling untagged version left behind
        if args.release_tag and args.release_tag in snapshot_tags(args.release_table):
            report["release_error"] = (
                f"tag {args.release_tag!r} already exists (tags are immutable)"
            )
            print(json.dumps(report))
            return 4
        # write-audit-publish: a release that fails its structural gate
        # (doc identity present and unique) never becomes a version
        try:
            v = snapshot_write_audited(
                spark.read.parquet(args.out),
                args.release_table,
                rules=[
                    {"rule": "not_null", "col": "doc_id"},
                    {"rule": "unique", "col": "doc_id"},
                ],
                mode="overwrite",
            )
        except AuditFailed as exc:
            report["release_error"] = str(exc)
            print(json.dumps(report))
            return 5
        tag = args.release_tag or f"release-v{v}"
        snapshot_tag(args.release_table, tag, version=v)
        report["release"] = {"table": args.release_table, "version": v, "tag": tag}

    print(json.dumps(report))
    return 0


def cmd_maintain(args) -> int:
    """Steady-state snapshot-table maintenance in one pass: compact the
    small-file tail, expire old versions, and reclaim unreferenced data
    files (respecting the in-flight-writer grace window) — the OPTIMIZE +
    VACUUM operational loop a 100 TB snapshot lake runs on a schedule."""
    from agf_data_ingestion_spark.sources.snapshots import (
        current_version,
        expire_snapshots,
        snapshot_compact,
        snapshot_maintain,
    )

    import json

    spark = _spark()
    if args.policy:
        # policy-gated path (r8): compact only when a health trigger
        # fires; the report names every trigger's measured value
        report = snapshot_maintain(
            spark,
            args.table,
            policy={
                "small_bytes": args.small_bytes,
                "max_small_files": args.max_small_files,
                "max_dv_ppm": args.max_dv_ppm,
                "max_eq_items": args.max_eq_items,
            },
            keep_last=args.keep_last,
            orphan_grace_s=args.orphan_grace_s,
        )
        print(json.dumps(report))
        return 0
    before = current_version(args.table)
    compacted_to = snapshot_compact(
        spark, args.table, small_bytes=args.small_bytes
    )
    deleted = expire_snapshots(
        args.table, keep_last=args.keep_last, orphan_grace_s=args.orphan_grace_s
    )
    print(
        json.dumps(
            {
                "table": args.table,
                "version_before": before,
                "version_after": current_version(args.table),
                "compaction_committed": compacted_to != before,
                "paths_reclaimed": len(deleted),
            }
        )
    )
    return 0


def cmd_forget(args) -> int:
    """Right-to-be-forgotten erasure over a snapshot table: a predicate
    DELETE — merge-on-read deletion vectors by default (O(matches)
    commit; r6), copy-on-write with ``--cow``, or a zero-read EQUALITY
    delete with ``--keys col=v1,v2,...`` (r7: the writer never scans the
    table — the keyed GDPR shape).  ``--physical`` chases the logical
    delete with compaction (applies + purges DVs / eq key sets) and
    aggressive expiry so the erased bytes leave disk in the same run —
    the GDPR operational loop.  One JSON line.

    Predicates are ``col:op:value`` triples (op ∈ ==,<,<=,>,>=), ANDed;
    values parse as int → float → string.  ``rows_deleted`` is null when
    a live equality delete makes the metadata count unknowable (honest
    refusal; ``--physical`` restores it)."""
    import json

    from agf_data_ingestion_spark.sources.snapshots import (
        current_version,
        expire_snapshots,
        snapshot_compact,
        snapshot_delete,
        snapshot_delete_keys,
        snapshot_rowcount,
        snapshot_schema,
    )

    def _val(s: str):
        for cast in (int, float):
            try:
                return cast(s)
            except ValueError:
                continue
        return s

    def _typed_key(s: str, dtype: str):
        """Parse a CLI key literal into the Python type PySpark's row
        verifier accepts for the DECLARED column type (ADVICE r7: _val's
        int-first parse crashes DoubleType with PySparkTypeError)."""
        base = dtype.split("(")[0].strip().lower()
        try:
            if base in ("tinyint", "smallint", "int", "integer", "bigint",
                        "long", "short", "byte"):
                return int(s)
            if base in ("double", "float", "real"):
                return float(s)
            if base in ("decimal", "numeric"):
                from decimal import Decimal

                return Decimal(s)
            if base in ("boolean", "bool"):
                low = s.strip().lower()
                if low in ("true", "1"):
                    return True
                if low in ("false", "0"):
                    return False
                raise ValueError(f"not a boolean literal: {s!r}")
            if base == "date":
                import datetime as _dt

                return _dt.date.fromisoformat(s)
            if base == "timestamp":
                import datetime as _dt

                return _dt.datetime.fromisoformat(s)
            return s
        except (ValueError, ArithmeticError) as exc:
            raise SystemExit(
                f"forget: cannot parse {s!r} as {dtype}: {exc}"
            ) from exc

    def _count(table):
        try:
            return snapshot_rowcount(table)
        except RuntimeError:  # live equality deletes: unknowable
            return None

    if bool(args.keys) == bool(args.where):
        raise SystemExit("forget: pass exactly one of --where / --keys")
    spark = _spark()
    rows_before = _count(args.table)
    v_before = current_version(args.table)
    if args.keys:
        col, _, vals = args.keys.partition("=")
        dtype = dict(snapshot_schema(args.table)).get(col)
        if dtype is None:
            raise SystemExit(f"forget: no such column {col!r}")
        # coerce by the DECLARED column type, not by what the value looks
        # like — a numeric-looking key on a string column must stay a
        # string, and a bare integer literal on a double column must become
        # a float (PySpark's type verifier rejects int for DoubleType)
        keys = spark.createDataFrame(
            [(_typed_key(s, dtype),) for s in vals.split(",")],
            f"`{col}` {dtype}",
        )
        where, mode = [[col, "in", vals]], "eq"
        v = snapshot_delete_keys(keys, args.table)
    else:
        where = []
        for triple in args.where:
            col, op, value = triple.split(":", 2)
            where.append((col, op, _val(value)))
        mode = "cow" if args.cow else "dv"
        v = snapshot_delete(spark, args.table, where, mode=mode)
    reclaimed = 0
    if args.physical:
        snapshot_compact(spark, args.table, small_bytes=args.small_bytes)
        reclaimed = len(
            expire_snapshots(args.table, keep_last=1, orphan_grace_s=0.0)
        )
    rows_after = _count(args.table)
    print(
        json.dumps(
            {
                "table": args.table,
                "where": [list(w) for w in where],
                "mode": mode,
                "rows_deleted": rows_before - rows_after
                if rows_before is not None and rows_after is not None
                else None,
                "version": current_version(args.table),
                "committed": v > v_before,
                "physical": bool(args.physical),
                "paths_reclaimed": reclaimed,
            }
        )
    )
    return 0


def cmd_tokenizer(args) -> int:
    """Train the corpus BPE tokenizer (plans/lm.py docs_bpe_train) and
    print the merge table — the artifact a downstream tokenizer ships —
    plus corpus token totals under it, one JSON line."""
    import json

    from pyspark.sql import functions as F

    from agf_data_ingestion_spark.plans.lm import docs_bpe_tokens, docs_bpe_train

    spark = _spark()
    merges = [
        {
            "round": r["round"],
            "pair": [r["x"], r["y"]],
            "merged": r["merged"],
            "count": r["pair_count"],
        }
        for r in docs_bpe_train(spark, args.docs).collect()
    ]
    totals = (
        docs_bpe_tokens(spark, args.docs)
        .groupBy()
        .agg(F.sum("n_words").alias("w"), F.sum("n_bpe_tokens").alias("t"))
        .collect()[0]
    )
    print(
        json.dumps(
            {
                "docs": args.docs,
                "merges": merges,
                "corpus_words": int(totals["w"]),
                "corpus_bpe_tokens": int(totals["t"]),
            }
        )
    )
    return 0


def cmd_scrub(args) -> int:
    """Scrub PII from a document corpus (streaming/pii_stream.py): redact
    emails/phones/IPv4 in ``text`` and write the scrubbed table plus
    per-category audit totals, one JSON line.  Batch by default; with
    --stream the identical transform runs as an availableNow Structured
    Streaming query (checkpointed, resumable).  Both modes emit the SAME
    schema (batch stamps the constant ``_batch_id = 0`` the single-batch
    availableNow run would), and a stream re-run with a FRESH checkpoint
    resets --out first — foreachBatch appends, so stale output under a
    new checkpoint would duplicate rows; resuming on the existing
    checkpoint keeps the output, exactly-once via the replayed offsets."""
    import json
    import os
    import shutil
    import sys

    from pyspark.sql import functions as F

    from agf_data_ingestion_spark.streaming.pii_stream import (
        scrub_transform,
        start_scrub_stream,
    )

    spark = _spark()
    src = f"{args.docs}/documents.parquet"
    if args.stream:
        ck = f"{args.out}_ck"
        if os.path.exists(args.out) and not os.path.exists(ck):
            # fresh checkpoint == fresh run: match batch mode's overwrite
            # semantics instead of appending duplicates into stale output
            print(f"scrub: fresh checkpoint — resetting {args.out}", file=sys.stderr)
            shutil.rmtree(args.out)
        # FileStreamSource takes a directory: stream the sf dir filtered
        # down to the documents table file(s)
        stream = (
            spark.readStream.schema(spark.read.parquet(src).schema)
            .option("pathGlobFilter", "documents.parquet")
            .parquet(args.docs)
        )
        q = start_scrub_stream(stream, args.out, ck, available_now=True)
        q.awaitTermination()
    else:
        scrub_transform(spark.read.parquet(src)).withColumn(
            "_batch_id", F.lit(0).cast("long")
        ).write.mode("overwrite").parquet(args.out)
    totals = (
        spark.read.parquet(args.out)
        .groupBy()
        .agg(
            F.count("*").alias("n"),
            F.sum("pii_emails").alias("e"),
            F.sum("pii_phones").alias("p"),
            F.sum("pii_ips").alias("i"),
        )
        .collect()[0]
    )
    print(
        json.dumps(
            {
                "docs": args.docs,
                "out": args.out,
                "mode": "stream" if args.stream else "batch",
                "rows": int(totals["n"]),
                "emails": int(totals["e"] or 0),
                "phones": int(totals["p"] or 0),
                "ips": int(totals["i"] or 0),
            }
        )
    )
    return 0


def cmd_partition(args) -> int:
    """Show or evolve a snapshot table's default partition spec (r8):
    ``--set day:ts bucket:k:8`` commits a metadata-only spec change,
    ``--clear`` returns to unpartitioned writes, no flag shows the
    current spec.  One JSON line either way."""
    import json

    from agf_data_ingestion_spark.sources.snapshots import (
        current_version,
        snapshot_partition_spec,
        snapshot_set_partition_spec,
    )

    if args.set and args.clear:
        raise SystemExit("partition: pass at most one of --set / --clear")
    committed = False
    if args.set or args.clear:
        spec = []
        for item in args.set or []:
            parts = item.split(":")
            if len(parts) == 2:
                spec.append((parts[0], parts[1]))
            elif len(parts) == 3:
                spec.append((parts[0], parts[1], int(parts[2])))
            else:
                raise SystemExit(
                    f"partition: bad transform {item!r} "
                    f"(transform:col or transform:col:n)"
                )
        before = current_version(args.table)
        v = snapshot_set_partition_spec(args.table, spec)
        committed = v > before
    print(
        json.dumps(
            {
                "table": args.table,
                "spec": [list(s) for s in snapshot_partition_spec(args.table)],
                "version": current_version(args.table),
                "committed": committed,
            }
        )
    )
    return 0


def cmd_sortorder(args) -> int:
    """Show or evolve a snapshot table's default sort order (r8):
    ``--set k ts`` commits a metadata-only order change, ``--clear``
    returns to unsorted writes, no flag shows the current order.  One
    JSON line either way."""
    import json

    from agf_data_ingestion_spark.sources.snapshots import (
        current_version,
        snapshot_set_sort_order,
        snapshot_sort_order,
    )

    if args.set and args.clear:
        raise SystemExit("sortorder: pass at most one of --set / --clear")
    committed = False
    if args.set or args.clear:
        spec = [
            tuple(item.split(":")) if ":" in item else item
            for item in args.set or []
        ]
        before = current_version(args.table)
        v = snapshot_set_sort_order(args.table, spec)
        committed = v > before
    print(
        json.dumps(
            {
                "table": args.table,
                "sort_order": snapshot_sort_order(args.table),
                "version": current_version(args.table),
                "committed": committed,
            }
        )
    )
    return 0


def cmd_takedown(args) -> int:
    """Surgical GDPR/rights-holder removal from materialized training
    shards (operators/shards.py takedown_shards): lineage-routed, only
    affected shard files rewritten, zero-read lineage erasure, manifest
    audit.  One JSON report line."""
    import json

    from agf_data_ingestion_spark.operators.shards import takedown_shards
    from agf_data_ingestion_spark.session import get_spark

    spark = get_spark("agf-takedown")
    rep = takedown_shards(spark, args.shards, [int(i) for i in args.ids])
    print(json.dumps(rep, sort_keys=True))
    return 0


def cmd_history(args) -> int:
    """Inspect a snapshot table: commit history, tags, current version,
    metadata-only row count — the DESCRIBE HISTORY analog, one JSON line."""
    import json

    from agf_data_ingestion_spark.sources.snapshots import (
        current_version,
        snapshot_history,
        snapshot_rowcount,
        snapshot_tags,
    )

    try:
        rows = snapshot_rowcount(args.table)
    except RuntimeError:  # live equality deletes: metadata count unknowable
        rows = None
    print(
        json.dumps(
            {
                "table": args.table,
                "current_version": current_version(args.table),
                "rows": rows,
                "tags": snapshot_tags(args.table),
                "history": snapshot_history(args.table),
            }
        )
    )
    return 0


def cmd_branch(args) -> int:
    """Branch lifecycle over a snapshot table (sources/branches.py):
    create a zero-copy fork, list branches, fast-forward publish, drop.
    All metadata-only — no Spark session, one JSON line."""
    import json

    from agf_data_ingestion_spark.sources.branches import (
        BranchDiverged,
        branch_root,
        snapshot_branch,
        snapshot_branch_drop,
        snapshot_branch_publish,
        snapshot_branch_rebase,
        snapshot_branches,
    )

    out = {"table": args.table, "action": args.action, "branch": args.name}
    if args.action == "list":
        out["branches"] = snapshot_branches(args.table)
    elif args.action == "create":
        out["root"] = snapshot_branch(args.table, args.name, args.version)
    elif args.action in ("publish", "rebase"):
        fn = snapshot_branch_publish if args.action == "publish" else snapshot_branch_rebase
        try:
            out["published_version"] = fn(args.table, args.name, drop=args.drop)
        except BranchDiverged as exc:
            print(json.dumps({**out, "error": "diverged", "detail": str(exc)}))
            return 1
    elif args.action == "drop":
        snapshot_branch_drop(args.table, args.name)
        out["dropped_root"] = branch_root(args.table, args.name)
    print(json.dumps(out))
    return 0


def cmd_alter(args) -> int:
    """Non-additive schema evolution over a snapshot table (r7): rename /
    drop / widen as metadata-only commits — zero bytes rewritten, no
    Spark session.  One JSON line."""
    import json

    from agf_data_ingestion_spark.sources.snapshots import (
        snapshot_drop_column,
        snapshot_rename_column,
        snapshot_schema,
        snapshot_widen_column,
    )

    if args.action in ("rename", "widen") and not args.to:
        raise SystemExit(f"alter {args.action}: --to is required")
    if args.action == "rename":
        v = snapshot_rename_column(args.table, args.column, args.to)
    elif args.action == "drop":
        v = snapshot_drop_column(args.table, args.column)
    else:  # widen
        v = snapshot_widen_column(args.table, args.column, args.to)
    print(
        json.dumps(
            {
                "table": args.table,
                "action": args.action,
                "column": args.column,
                "to": args.to,
                "version": v,
                "schema": [list(c) for c in snapshot_schema(args.table)],
            }
        )
    )
    return 0


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("backfill")
    b.add_argument("--lake", required=True)
    b.add_argument("--warehouse", required=True)
    b.add_argument("--file-type", choices=["all", "run", "experiment"], default="all")
    b.add_argument("--dry-run", action="store_true")
    b.add_argument("--now")
    b.add_argument("--checkpoint")
    b.add_argument("--sink", choices=["parquet", "snapshot", "snapshot_replace"], default="parquet")
    b.set_defaults(fn=cmd_backfill)

    s = sub.add_parser("stream")
    s.add_argument("--lake", required=True)
    s.add_argument("--warehouse", required=True)
    s.add_argument("--checkpoint")
    s.add_argument("--max-files-per-trigger", type=int)
    s.add_argument("--available-now", action="store_true")
    s.add_argument("--sink", choices=["parquet", "snapshot", "snapshot_replace"], default="parquet")
    s.set_defaults(fn=cmd_stream)

    r = sub.add_parser("reconcile")
    r.add_argument("--lake", required=True)
    r.add_argument("--warehouse", required=True)
    r.add_argument("--days", type=int, default=0)
    r.set_defaults(fn=cmd_reconcile)

    e = sub.add_parser("export")
    e.add_argument("--warehouse", required=True)
    e.add_argument("--out", required=True)
    e.add_argument("--group-col", default="instrument_id")
    e.set_defaults(fn=cmd_export)

    x = sub.add_parser("expect")
    x.add_argument("--warehouse", required=True)
    x.set_defaults(fn=cmd_expect)

    c = sub.add_parser("curate")
    c.add_argument("--docs", default="/root/testdata/sf0.01", help="dir containing documents.parquet")
    c.add_argument("--out", required=True)
    c.add_argument("--full", action="store_true",
                   help="run the WHOLE pipeline (gate > dedup > decontam > "
                        "quality cut > DoReMi > WFQ shards) and publish "
                        "shards+lineage+datacard+index+stores+policy under "
                        "--out as ONE multi-table snapshot txn")
    c.add_argument("--append-batch", metavar="PARQUET",
                   help="incremental curation: gate this NEW document batch "
                        "under the release at --out (frozen policy, pruned "
                        "probe-store dedup) and append it as one txn")
    c.add_argument("--batch-label", default="b0")
    c.add_argument("--forget-ids", metavar="ID[,ID...]",
                   help="release-level GDPR erasure: remove these doc ids "
                        "from shards/lineage/index/stores of the release "
                        "at --out, repair stats, append the audit trail")
    c.add_argument("--diff-releases", nargs=2, metavar=("TXN_A", "TXN_B"),
                   help="release-notes diff between two published txn ids "
                        "of the release at --out ('current' = per-table "
                        "current state); prints (section,key,a,b,delta) "
                        "JSON rows")
    c.add_argument("--current", action="store_true",
                   help="with --verify-release: audit per-table CURRENT "
                        "state instead of the txn-pinned publish")
    c.add_argument("--deep", action="store_true",
                   help="with --verify-release: also verify no published "
                        "document shares a shingle with the benchmark "
                        "store (re-reads corpus text)")
    c.add_argument("--verify-release", action="store_true",
                   help="audit the release at --out: ten-table txn "
                        "alignment, lineage/index/store coverage, dense "
                        "positions, complete frozen policy")
    c.add_argument("--decontaminate", action="store_true",
                   help="drop docs sharing shingles with the benchmark slice")
    c.add_argument("--split", action="store_true",
                   help="add deterministic train/val/test assignment column")
    c.add_argument("--shards", metavar="DIR",
                   help="also write token-budgeted training shards + manifest")
    c.add_argument("--shard-tokens", type=int, default=4096)
    c.add_argument("--shard-seed", default="0")
    c.add_argument("--release-table", metavar="DIR",
                   help="also commit the curated corpus to this snapshot table")
    c.add_argument("--release-tag",
                   help="immutable tag name for the release (default release-vN)")
    c.set_defaults(fn=cmd_curate)

    h = sub.add_parser("history")
    h.add_argument("--table", required=True, help="snapshot table root")
    h.set_defaults(fn=cmd_history)

    ps = sub.add_parser("partition")
    ps.add_argument("--table", required=True, help="snapshot table root")
    ps.add_argument(
        "--set",
        nargs="+",
        help="transform:col or transform:col:n (identity/day/month/hour/"
        "bucket/truncate)",
    )
    ps.add_argument(
        "--clear", action="store_true", help="back to unpartitioned writes"
    )
    ps.set_defaults(fn=cmd_partition)

    so = sub.add_parser("sortorder")
    so.add_argument("--table", required=True, help="snapshot table root")
    so.add_argument(
        "--set",
        nargs="+",
        help="sort columns, ascending; zorder:a:b / hilbert:a:b for 2-D "
        "curve clustering",
    )
    so.add_argument(
        "--clear", action="store_true", help="back to unsorted writes"
    )
    so.set_defaults(fn=cmd_sortorder)

    td = sub.add_parser("takedown")
    td.add_argument("--shards", required=True, help="shard out_dir root")
    td.add_argument("--ids", nargs="+", required=True, help="doc ids to remove")
    td.set_defaults(fn=cmd_takedown)

    tk = sub.add_parser("tokenizer")
    tk.add_argument(
        "--docs",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"),
        help="directory with documents.parquet",
    )
    tk.set_defaults(fn=cmd_tokenizer)

    sc = sub.add_parser("scrub")
    sc.add_argument(
        "--docs",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"),
        help="directory with documents.parquet",
    )
    sc.add_argument("--out", required=True, help="scrubbed output table path")
    sc.add_argument("--stream", action="store_true", help="run as a checkpointed stream")
    sc.set_defaults(fn=cmd_scrub)

    m = sub.add_parser("maintain")
    m.add_argument("--table", required=True, help="snapshot table root")
    m.add_argument("--small-bytes", type=int, default=8 << 20)
    m.add_argument("--keep-last", type=int, default=2)
    m.add_argument("--orphan-grace-s", type=float, default=3600.0)
    m.add_argument(
        "--policy",
        action="store_true",
        help="compact only when a health trigger fires (r8)",
    )
    m.add_argument("--max-small-files", type=int, default=8)
    m.add_argument("--max-dv-ppm", type=int, default=100_000)
    m.add_argument("--max-eq-items", type=int, default=0)
    m.set_defaults(fn=cmd_maintain)

    fg = sub.add_parser("forget")
    fg.add_argument("--table", required=True, help="snapshot table root")
    fg.add_argument(
        "--where",
        nargs="+",
        help="ANDed col:op:value triples (op in ==,<,<=,>,>=)",
    )
    fg.add_argument(
        "--keys",
        help="zero-read equality delete: col=v1,v2,... (r7)",
    )
    fg.add_argument(
        "--cow", action="store_true", help="copy-on-write instead of DV"
    )
    fg.add_argument(
        "--physical",
        action="store_true",
        help="compact + expire so erased bytes leave disk now",
    )
    fg.add_argument("--small-bytes", type=int, default=8 << 20)
    fg.set_defaults(fn=cmd_forget)

    al = sub.add_parser("alter")
    al.add_argument("action", choices=["rename", "drop", "widen"])
    al.add_argument("--table", required=True, help="snapshot table root")
    al.add_argument("--column", required=True)
    al.add_argument("--to", help="new name (rename) / new type (widen)")
    al.set_defaults(fn=cmd_alter)

    br = sub.add_parser("branch")
    br.add_argument("action", choices=["create", "publish", "rebase", "drop", "list"])
    br.add_argument("--table", required=True, help="snapshot table root")
    br.add_argument("--name", help="branch name (all actions except list)")
    br.add_argument("--version", type=int, help="create: fork version (default current)")
    br.add_argument(
        "--drop", action="store_true", help="publish: also drop the branch"
    )
    br.set_defaults(fn=cmd_branch)

    args = ap.parse_args()
    if args.cmd == "branch" and args.action != "list" and not args.name:
        ap.error("branch %s requires --name" % args.action)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
