#!/usr/bin/env python
"""Measured scaling ladder (VERDICT r4 #7): build an N× synthetic replica
of sf0.1 and time the dedup / ANN / components families at both scales.

Replicas are DECORRELATED so the ladder measures corpus growth, not
duplicate-density growth:

* documents: every word is prefixed ``r{k}`` per replica — shingle sets
  are disjoint across replicas (no artificial cross-replica near-dups),
  while each replica's internal duplicate structure is preserved exactly;
* embeddings: each replica's vectors flip signs on an md5-chosen subset
  of dimensions — norms preserved, hyperplane/cell buckets decorrelated.

Usage: python scripts/measure_scaling.py [factor] [reps]
Writes the replica under /tmp/agf_scale_sf<factor>x and prints one
markdown row per query: name, sf0.1 median, N× median, ratio.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/root/testdata/sf0.1"

QUERIES = [
    # dedup family
    "docs_minhash_lsh",
    "docs_neardup_verified",
    "docs_incremental_neardup",
    "docs_fingerprint",
    "docs_simhash",
    # components
    "docs_dup_clusters",
    # ANN ladder
    "emb_cosine_topk",
    "emb_ann_lsh_topk",
    "emb_ivf_topk",
    "emb_pq_adc_topk",
    "emb_ivfpq_topk",
    "emb_semdedup",
    # r6/r7 additions (documents-only plants scale with doc_id/count)
    "docs_langid_apply",
    "docs_url_curation",
    "docs_decontam_spans",
    "docs_quality_apply",
    "docs_domain_reweight",
    "docs_source_overlap",
    "docs_source_overlap_sketch",
    # r8-continuation additions: shard-audit prefix sum, Hilbert layout
    # (distinct-cell table is grid-bounded — ratio should be ~map growth),
    # drift histograms (one map-combined pass)
    "docs_takedown_audit",
    "events_hilbert_layout",
    "events_drift_tvd",
    "docs_curriculum_order",
    # r9 additions (r10, VERDICT r9 ask #4): packing fold, DPO pairs,
    # anneal schedule, recall surface, reweighted WFQ stream
    "docs_packed_sequences",
    "docs_preference_pairs",
    "docs_mixture_anneal",
    "emb_ann_recall_curve",
    "docs_reweighted_shards",
    # r10 addition: release-notes diff (two gate+dedup+shingle passes)
    "docs_release_diff",
]


def build_replica(out_dir: str, factor: int) -> None:
    import numpy as np
    import pyarrow.parquet as pq
    import pandas as pd

    os.makedirs(out_dir, exist_ok=True)
    docs = pq.read_table(os.path.join(BASE, "documents.parquet")).to_pandas()
    embs = pq.read_table(os.path.join(BASE, "embeddings.parquet")).to_pandas()
    dim = len(embs["embedding"].iloc[0])

    # replica texts are decorrelated by prefixing NON-STOPWORD tokens
    # (r11 FIX: the old every-word prefix zeroed every replica doc's
    # stopword_ratio, so the rule gate dropped 100% of replica docs and
    # the r10 pipeline ladder measured a constant ~1x survivor set
    # downstream of rule_gate — 'ok' counts were FLAT at any factor.
    # Leaving stopwords intact keeps the gate pass rate proportional
    # while near-dup jaccard vs the original stays low, the same rule as
    # tests/test_curation_incremental._perturb.  Pipeline-rung numbers
    # before this fix are not comparable.)
    from agf_data_ingestion_spark.plans.text import _STOPWORDS

    doc_parts, emb_parts = [], []
    for k in range(factor):
        d = docs.copy()
        if k > 0:
            d["doc_id"] = d["doc_id"] + 10_000_000 * k
            pre = f"r{k}"
            d["text"] = d["text"].map(
                lambda t: " ".join(
                    w if w in _STOPWORDS else pre + w for w in t.split()
                )
            )
            d["n_chars"] = d["text"].str.len().astype("int64")
        doc_parts.append(d)

        e = embs.copy()
        if k > 0:
            e["vec_id"] = e["vec_id"] + 10_000_000 * k
            seed = int(hashlib.md5(f"scale:{k}".encode()).hexdigest()[:8], 16)
            signs = np.where(
                np.random.default_rng(seed).random(dim) < 0.5, -1.0, 1.0
            ).astype(np.float32)
            e["embedding"] = e["embedding"].map(
                lambda v: (np.asarray(v, dtype=np.float32) * signs)
            )
        emb_parts.append(e)

    pd.concat(doc_parts, ignore_index=True).to_parquet(
        os.path.join(out_dir, "documents.parquet")
    )
    pd.concat(emb_parts, ignore_index=True).to_parquet(
        os.path.join(out_dir, "embeddings.parquet")
    )
    # events: id-shifted replicas over the SAME time span — decorrelated
    # entities, constant grid/window extents, so the events-family rungs
    # measure pure corpus growth
    evs = pq.read_table(os.path.join(BASE, "events.parquet")).to_pandas()
    ev_parts = []
    for k in range(factor):
        e = evs.copy()
        if k > 0:
            e["event_id"] = e["event_id"] + 10_000_000 * k
            e["user_id"] = e["user_id"] + 10_000_000 * k
        ev_parts.append(e)
    pd.concat(ev_parts, ignore_index=True).to_parquet(
        os.path.join(out_dir, "events.parquet")
    )


def median(xs):
    xs = sorted(xs)
    return xs[len(xs) // 2]


#: skew rung (r9 — VERDICT r8 ask #5): same ROW COUNTS as sf0.1, but one
#: source carries 50% of the corpus and one user carries 50% of events —
#: the hot-key shapes that break naive per-key windows/groupBys.  Text
#: and embeddings are byte-identical to sf0.1 so any wall delta is the
#: skew, not different work.
SKEW_QUERIES = [
    # dedup family (keys are content hashes — should be skew-immune)
    "docs_fingerprint",
    "docs_minhash_lsh",
    "docs_dup_clusters",
    # per-SOURCE windows / aggregates (the 50%-mass source hits these)
    "docs_domain_reweight",
    "docs_curriculum_order",
    "docs_reweighted_shards",
    # per-USER windows + the salted-counts path (the hot user hits these)
    "events_latest_per_user",
    "events_session_window_native",
    "events_salted_type_counts",
]


def build_skew_replica(out_dir: str) -> None:
    import pyarrow.parquet as pq
    import pandas as pd

    os.makedirs(out_dir, exist_ok=True)
    docs = pq.read_table(os.path.join(BASE, "documents.parquet")).to_pandas()
    hot = docs["doc_id"] % 2 == 0
    docs.loc[hot, "source"] = "src0"
    docs.to_parquet(os.path.join(out_dir, "documents.parquet"))
    evs = pq.read_table(os.path.join(BASE, "events.parquet")).to_pandas()
    evs.loc[evs["event_id"] % 2 == 0, "user_id"] = 1
    evs.to_parquet(os.path.join(out_dir, "events.parquet"))
    shutil.copyfile(
        os.path.join(BASE, "embeddings.parquet"),
        os.path.join(out_dir, "embeddings.parquet"),
    )


def skew_rung(reps: int) -> None:
    out_dir = "/tmp/agf_skew_sf01"
    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    build_skew_replica(out_dir)

    from agf_data_ingestion_spark.plans import QUERIES as CATALOG
    from agf_data_ingestion_spark.session import get_spark

    spark = get_spark("measure-skew")
    spark.sparkContext.setLogLevel("ERROR")
    print("| query | uniform sf0.1 | skewed (50% source / 50% user) | ratio |")
    print("|---|---|---|---|")
    for name in SKEW_QUERIES:
        fn = CATALOG[name].fn
        fn(spark, BASE).count()  # warm plan shapes
        times = {}
        for label, sf_dir in (("base", BASE), ("skew", out_dir)):
            samples = []
            for _ in range(reps):
                from agf_data_ingestion_spark.plans import text as _text

                _text._CLUSTER_LABEL_CACHE.clear()
                t0 = time.time()
                fn(spark, sf_dir).count()
                samples.append(time.time() - t0)
            times[label] = median(samples)
        ratio = times["skew"] / times["base"]
        print(
            f"| {name} | {times['base']:.2f} s | {times['skew']:.2f} s "
            f"| {ratio:.2f}x |",
            flush=True,
        )


def skew_scale_rung(factor: int, reps: int) -> None:
    """r10 (VERDICT r9 ask #2 'Done'): the skew rung at VOLUME — a
    ``factor``× replica in uniform vs 50%-mass-source form, timing the
    skew-ROUTED per-source windows.  Both corpora put the largest source
    above the routing guard, so this measures the salted decomposition
    under the exact skew SCALE.md called "fatal at 50 B rows" for the
    r9 whole-source windows; a flat ratio is the fix's evidence."""
    import pandas as pd
    import pyarrow.parquet as pq

    uni_dir = f"/tmp/agf_skewscale_uni{factor}x"
    skew_dir = f"/tmp/agf_skewscale_hot{factor}x"
    for d in (uni_dir, skew_dir):
        if os.path.isdir(d):
            shutil.rmtree(d)
    build_replica(uni_dir, factor)
    os.makedirs(skew_dir, exist_ok=True)
    docs = pq.read_table(os.path.join(uni_dir, "documents.parquet")).to_pandas()
    docs.loc[docs["doc_id"] % 2 == 0, "source"] = "src0"
    docs.to_parquet(os.path.join(skew_dir, "documents.parquet"))
    for f in ("embeddings.parquet", "events.parquet"):
        shutil.copyfile(os.path.join(uni_dir, f), os.path.join(skew_dir, f))

    from agf_data_ingestion_spark.plans import QUERIES as CATALOG
    from agf_data_ingestion_spark.session import get_spark

    spark = get_spark("measure-skew-scale")
    spark.sparkContext.setLogLevel("ERROR")
    print(
        f"| query | uniform {factor}x | 50%-mass source {factor}x | ratio |"
    )
    print("|---|---|---|---|")
    for name in ("docs_curriculum_order", "docs_reweighted_shards"):
        fn = CATALOG[name].fn
        fn(spark, uni_dir).count()  # warm
        times = {}
        for label, sf_dir in (("uni", uni_dir), ("skew", skew_dir)):
            samples = []
            for _ in range(reps):
                t0 = time.time()
                fn(spark, sf_dir).count()
                samples.append(time.time() - t0)
            times[label] = median(samples)
        print(
            f"| {name} | {times['uni']:.2f} s | {times['skew']:.2f} s "
            f"| {times['skew'] / times['uni']:.2f}x |",
            flush=True,
        )


def window_skew_rung(factor: int, reps: int) -> None:
    """r11 (VERDICT r10 ask #1 'Done'): the newly routed whole-partition
    windows at VOLUME under 50%-mass keys — a ``factor``× replica in
    uniform vs skewed form where ONE language, ONE source, and ONE
    event_type each carry half their corpus (each query is keyed on
    exactly one of those, so one skewed twin serves all).  Both corpora
    put the largest key above every routing guard, so this times the
    salted decompositions (operators/skew.py) under the exact skew the
    r9/r10 verdicts called fatal for the undecomposed plans; a flat
    ratio is the fix's evidence.  (docs_quality_apply / _pr_curve key on
    the PLANTED md5 lang — corpus/3 by construction at ANY corpus, so
    the uniform ladder itself is their skew case; docs_epoch_order's
    epoch is always 2-valued likewise — all three are covered by the
    uniform column of this table.)"""
    import pyarrow.parquet as pq

    uni_dir = f"/tmp/agf_winskew_uni{factor}x"
    skew_dir = f"/tmp/agf_winskew_hot{factor}x"
    for d in (uni_dir, skew_dir):
        if os.path.isdir(d):
            shutil.rmtree(d)
    build_replica(uni_dir, factor)
    os.makedirs(skew_dir, exist_ok=True)
    docs = pq.read_table(os.path.join(uni_dir, "documents.parquet")).to_pandas()
    half = docs["doc_id"] % 2 == 0
    docs.loc[half, "lang"] = "en"
    docs.loc[half, "source"] = "src0"
    docs.to_parquet(os.path.join(skew_dir, "documents.parquet"))
    evs = pq.read_table(os.path.join(uni_dir, "events.parquet")).to_pandas()
    evs.loc[evs["event_id"] % 2 == 0, "event_type"] = "purchase"
    evs.to_parquet(os.path.join(skew_dir, "events.parquet"))
    shutil.copyfile(
        os.path.join(uni_dir, "embeddings.parquet"),
        os.path.join(skew_dir, "embeddings.parquet"),
    )

    from agf_data_ingestion_spark.plans import QUERIES as CATALOG
    from agf_data_ingestion_spark.session import get_spark

    spark = get_spark("measure-window-skew")
    spark.sparkContext.setLogLevel("ERROR")
    print(
        f"| query | uniform {factor}x | 50%-mass key {factor}x | ratio |"
    )
    print("|---|---|---|---|")
    for name in (
        "docs_token_packing",          # lang-keyed running sum
        "docs_quality_calibrated",     # lang-keyed percent_rank
        "docs_lm_buckets",             # lang-keyed ntile (double key)
        "docs_preference_pairs",       # source-keyed double rank
        "docs_name_collision",         # source-keyed row_number
        "docs_quality_apply",          # planted-lang percent_rank (corpus/3)
        "docs_epoch_order",            # epoch-keyed rank (corpus/2)
        "events_median_value",         # event_type-keyed median rank
        "events_mad_outliers",         # event_type-keyed double median
        "events_quantile_sketch",      # event_type exact-q50 rank (late r11)
        "docs_export_zip_manifest",    # export_group(=source) entry ranks
    ):
        fn = CATALOG[name].fn
        fn(spark, uni_dir).count()  # warm
        times = {}
        for label, sf_dir in (("uni", uni_dir), ("skew", skew_dir)):
            samples = []
            for _ in range(reps):
                t0 = time.time()
                fn(spark, sf_dir).count()
                samples.append(time.time() - t0)
            times[label] = median(samples)
        print(
            f"| {name} | {times['uni']:.2f} s | {times['skew']:.2f} s "
            f"| {times['skew'] / times['uni']:.2f}x |",
            flush=True,
        )


def probe_rung(store_rows: int, probe_keys: int, reps: int) -> None:
    """r11 (VERDICT r10 ask #3 'Done' + scale evidence): the routed
    store probe at BULK batch size — an ``store_rows``-row key-clustered
    snapshot store probed with ``probe_keys`` distinct keys, IN-list
    branch (driver-collected predicate) vs the join branch (min/max
    range-pruned scan + shuffle-hash semi-join).  The join branch's
    driver traffic is O(1) regardless of batch size; the IN-list ships
    every key through the driver AND plants a probe_keys-wide predicate
    into the scan."""
    import shutil as _sh

    from pyspark.sql import functions as F

    from agf_data_ingestion_spark.operators.curation import _probe_store
    from agf_data_ingestion_spark.session import get_spark
    from agf_data_ingestion_spark.sources.snapshots import snapshot_write

    spark = get_spark("probe-rung")
    spark.sparkContext.setLogLevel("ERROR")
    root = "/tmp/agf_probe_rung"
    if os.path.isdir(root):
        _sh.rmtree(root)
    store = os.path.join(root, "store")
    rows = spark.range(store_rows).select(
        F.md5(F.col("id").cast("string")).alias("h"), F.col("id").alias("v")
    )
    snapshot_write(rows, store, mode="overwrite", cluster_by=["h"], cluster_files=16)
    # every other probe key hits; keys are md5s, so the min/max range
    # prune keeps most files (worst case for the join branch)
    keys = spark.range(probe_keys).select(
        F.md5((F.col("id") * 2).cast("string")).alias("h")
    ).localCheckpoint(eager=True)
    print(f"| branch | store rows | probe keys | matched | median wall |")
    print("|---|---|---|---|---|")
    for label, limit in (("in-list", 10**9), ("semi-join", 0)):
        samples, n = [], 0
        for _ in range(reps):
            t0 = time.time()
            df, used_inlist = _probe_store(spark, keys, store, "h", limit=limit)
            n = df.count()
            samples.append(time.time() - t0)
            assert used_inlist == (limit > 0)
        print(
            f"| {label} | {store_rows} | {probe_keys} | {n} "
            f"| {median(samples):.2f} s |",
            flush=True,
        )


def _dir_mb(root: str) -> float:
    total = 0
    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(dirpath, f))
            except OSError:
                pass
    return total / 1e6


def pipeline_rung(factor: int) -> None:
    """r10 (VERDICT r9 ask #4): curate_full at 1× vs ``factor``× (per-
    stage walls from the funnel report) and a FIXED 500-doc
    curate_incremental append against each published release — the
    append wall must be flat (O(batch), not O(release))."""
    import tempfile

    from pyspark.sql import functions as F

    from agf_data_ingestion_spark.operators.curation import (
        curate_full,
        curate_incremental,
    )
    from agf_data_ingestion_spark.session import get_spark

    big_dir = f"/tmp/agf_scale_sf{factor}x"
    if not os.path.isdir(big_dir):
        build_replica(big_dir, factor)
    spark = get_spark("measure-pipeline")
    spark.sparkContext.setLogLevel("ERROR")
    reports = {}
    for label, sf_dir in (("1x", BASE), (f"{factor}x", big_dir)):
        out = tempfile.mkdtemp(prefix=f"agf_pipe_{label}_")
        rep = curate_full(spark, sf_dir, out, budget_tokens=4000, seed="0")
        reports[label] = rep
        batch = (
            spark.read.parquet(os.path.join(BASE, "documents.parquet"))
            .orderBy("doc_id")
            .limit(500)
            .select(
                (F.col("doc_id") + 900_000_000).alias("doc_id"),
                F.concat(F.lit("inc "), F.col("text")).alias("text"),
                "lang",
                "source",
                (F.length("text") + 4).cast("long").alias("n_chars"),
            )
        )
        inc = curate_incremental(
            spark, batch, out, batch_label="ladder", budget_tokens=4000
        )
        rep["_inc_wall"] = inc["wall_s"]
        rep["_inc_stages"] = inc["stages"]
        # r11 (VERDICT r10 ask #7): publish throughput envelope — bytes
        # the full-release publish wrote vs its stage wall
        rep["_mb"] = _dir_mb(out)
        rep["_pub_wall"] = next(
            s["wall_s"] for s in rep["stages"] if s["name"] == "publish"
        )
        # r11 (ask #6): release_diff over the two REAL txns just
        # published (full release vs release+append) — must be flat in
        # release size (text never read)
        from agf_data_ingestion_spark.operators.curation import release_diff

        t0 = time.time()
        release_diff(spark, out, rep["txn"]["id"], inc["txn"]["id"]).count()
        rep["_diff_wall"] = round(time.time() - t0, 3)
    print("| stage | 1x wall | %sx wall | ratio |" % factor)
    print("|---|---|---|---|")
    for i, st in enumerate(reports["1x"]["stages"]):
        b = reports[f"{factor}x"]["stages"][i]
        r = b["wall_s"] / max(st["wall_s"], 1e-3)
        print(
            f"| {st['name']} | {st['wall_s']:.2f} s | {b['wall_s']:.2f} s "
            f"| {r:.2f}x |",
            flush=True,
        )
    a, b = reports["1x"], reports[f"{factor}x"]
    print(
        f"| TOTAL curate_full | {a['wall_s']:.2f} s | {b['wall_s']:.2f} s "
        f"| {b['wall_s'] / a['wall_s']:.2f}x |"
    )
    print(
        f"| curate_incremental (500-doc batch) | {a['_inc_wall']:.2f} s "
        f"| {b['_inc_wall']:.2f} s | {b['_inc_wall'] / a['_inc_wall']:.2f}x |"
    )
    print(
        f"| publish MB/s (release bytes / publish wall) "
        f"| {a['_mb']:.1f} MB in {a['_pub_wall']:.2f} s = "
        f"{a['_mb'] / max(a['_pub_wall'], 1e-3):.2f} MB/s "
        f"| {b['_mb']:.1f} MB in {b['_pub_wall']:.2f} s = "
        f"{b['_mb'] / max(b['_pub_wall'], 1e-3):.2f} MB/s | — |"
    )
    print(
        f"| release_diff (real txns, full vs +append) | {a['_diff_wall']:.2f} s "
        f"| {b['_diff_wall']:.2f} s | {b['_diff_wall'] / a['_diff_wall']:.2f}x |"
    )


def eq_rung(factor: int, reps: int) -> None:
    """Eq-delete reader ladder (r8, VERDICT r7 ask #7): a snapshot table
    at 1× and N× carrying many LIVE multi-column equality-delete items;
    times the merge-on-read read (anti-join per key-column set) on both
    sides of the broadcast guard — the guard crossover itself sits at
    _DV_BROADCAST_MAX_BYTES / _EQ_BROADCAST_ROW_BYTES = 512k live keys,
    so the under-guard runs broadcast and the forced-fallback run shows
    the shuffle-join cost the guard would pick beyond it."""
    import shutil as _sh

    from pyspark.sql import functions as F

    from agf_data_ingestion_spark.session import get_spark
    from agf_data_ingestion_spark.sources import snapshots as S
    from agf_data_ingestion_spark.sources.snapshots import (
        read_manifest,
        snapshot_delete_keys,
        snapshot_read,
        snapshot_write,
    )

    spark = get_spark("eq-ladder")
    spark.sparkContext.setLogLevel("ERROR")
    root = "/tmp/agf_scale_eq"
    if os.path.isdir(root):
        _sh.rmtree(root)
    print("| table | rows | live eq keys | guard side | read median |")
    print("|---|---|---|---|---|")
    for label, mult in (("1x", 1), (f"{factor}x", factor)):
        tbl = os.path.join(root, label)
        base = spark.read.parquet(os.path.join(BASE, "documents.parquet"))
        parts = [
            base.select(
                (F.col("doc_id") + F.lit(10_000_000 * k)).alias("doc_id"),
                "source",
                "n_chars",
            )
            for k in range(mult)
        ]
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        snapshot_write(df, tbl, cluster_by=["doc_id"], cluster_files=8 * mult)
        # 10 commits of multi-column (doc_id, source) delete keys, all LIVE
        for c in range(10):
            keys = df.filter(F.pmod(F.col("doc_id"), F.lit(97)) == c).select(
                "doc_id", "source"
            )
            snapshot_delete_keys(keys, tbl)
        live = sum(it["n"] for it in S._eq_items(read_manifest(tbl)))
        guard_bytes = live * S._EQ_BROADCAST_ROW_BYTES
        side = (
            "broadcast"
            if guard_bytes <= S._DV_BROADCAST_MAX_BYTES
            else "shuffle-fallback"
        )
        for forced, note in ((False, side), (True, "forced-fallback")):
            if forced:
                saved = S._DV_BROADCAST_MAX_BYTES
                S._DV_BROADCAST_MAX_BYTES = 0
            try:
                samples = []
                for _ in range(reps):
                    t0 = time.time()
                    n = snapshot_read(spark, tbl).count()
                    samples.append(time.time() - t0)
            finally:
                if forced:
                    S._DV_BROADCAST_MAX_BYTES = saved
            print(
                f"| {label} | {n} | {live} | {note} | {median(samples):.2f} s |",
                flush=True,
            )


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "skew":
        skew_rung(int(sys.argv[2]) if len(sys.argv) > 2 else 3)
        return
    if len(sys.argv) > 1 and sys.argv[1] == "skew10":
        skew_scale_rung(
            int(sys.argv[2]) if len(sys.argv) > 2 else 10,
            int(sys.argv[3]) if len(sys.argv) > 3 else 3,
        )
        return
    if len(sys.argv) > 1 and sys.argv[1] == "probe":
        probe_rung(
            int(sys.argv[2]) if len(sys.argv) > 2 else 500_000,
            int(sys.argv[3]) if len(sys.argv) > 3 else 150_000,
            int(sys.argv[4]) if len(sys.argv) > 4 else 3,
        )
        return
    if len(sys.argv) > 1 and sys.argv[1] == "winskew":
        window_skew_rung(
            int(sys.argv[2]) if len(sys.argv) > 2 else 10,
            int(sys.argv[3]) if len(sys.argv) > 3 else 3,
        )
        return
    if len(sys.argv) > 1 and sys.argv[1] == "pipeline":
        pipeline_rung(int(sys.argv[2]) if len(sys.argv) > 2 else 10)
        return
    if len(sys.argv) > 1 and sys.argv[1] == "eq":
        eq_rung(
            int(sys.argv[2]) if len(sys.argv) > 2 else 10,
            int(sys.argv[3]) if len(sys.argv) > 3 else 3,
        )
        return
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    only = sys.argv[3:]  # optional query-name filter
    queries = [q for q in QUERIES if not only or q in only]
    out_dir = f"/tmp/agf_scale_sf{factor}x"
    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    build_replica(out_dir, factor)

    from agf_data_ingestion_spark.plans import QUERIES as CATALOG
    from agf_data_ingestion_spark.session import get_spark

    spark = get_spark("measure-scaling")
    spark.sparkContext.setLogLevel("ERROR")

    print(f"| query | sf0.1 (5k docs / 2k vecs) | {factor}× | ratio |")
    print("|---|---|---|---|")
    for name in queries:
        fn = CATALOG[name].fn
        fn(spark, BASE).count()  # warm plan shapes / Arrow / codegen
        times = {}
        for label, sf_dir in (("base", BASE), ("big", out_dir)):
            samples = []
            for _ in range(reps):
                # the cluster-label memo short-circuits repeat invocations
                # entirely (one localCheckpoint per (app, sf)); clear it so
                # every rep measures the real components run
                from agf_data_ingestion_spark.plans import text as _text

                _text._CLUSTER_LABEL_CACHE.clear()
                t0 = time.time()
                fn(spark, sf_dir).count()
                samples.append(time.time() - t0)
            times[label] = median(samples)
        ratio = times["big"] / times["base"]
        print(
            f"| {name} | {times['base']:.2f} s | {times['big']:.2f} s "
            f"| {ratio:.2f}× |",
            flush=True,
        )


if __name__ == "__main__":
    main()
