"""Release-churn soak (r10 — VERDICT r9 ask #6): a published TEN-table
release under the concurrent load production applies — a serial
incremental-append stream RACING release_forget erasures and a live
snapshot_maintain loop over every release table, with NO external
locking in the test.

The single-table OCC soak (tests/test_occ_soak.py) pins the storage
layer; this lifts it to the release contract.  The assertions must hold
under ANY thread interleaving:

* zero LOST docs — every id each append txn committed is still present
  at the end (forgets target base docs only, so appended ids can only
  disappear through a bug);
* zero RESURRECTED docs — forgotten ids stay gone from every
  content-derived table, and ids an append's gates dropped stay absent;
* ``verify_release(current=True)`` is GREEN at quiescence (coverage,
  index-stats match — the stats recompute is version-pinned against
  racing appends, the r10 release_forget fix this soak motivated — and
  policy completeness), with only the informational position-holes flag
  cleared;
* the shards rowcount is metadata-exact and equals the scan.

Batches are WFQ-cut survivors re-labeled with fresh ids (provably pass
the frozen gates; mutually non-dup by construction), split
deterministically; forget victims are deterministic base ids.  The
thread interleaving is the only nondeterminism — that is the property
under test."""

from __future__ import annotations

import threading

import pytest

#: r13 suite-wall gate (conftest): multi-minute rung; the property is
#: pinned at small fixtures by tests/test_release_forget.py (forget vs append races)
#: and tests/test_curation_incremental.py (gate semantics).
pytestmark = pytest.mark.heavy_rung

from agf_data_ingestion_spark.operators.curation import (
    _DOC_COLS,
    curate_full,
    curate_incremental,
    pick_cut_tile,
    release_forget,
    stage_decontam,
    stage_exact_dedup,
    stage_neardup,
    stage_quality_cut,
    stage_rule_gate,
    verify_release,
)
from agf_data_ingestion_spark.sources.snapshots import (
    snapshot_maintain,
    snapshot_read,
    snapshot_rowcount,
)
from tests.conftest import SF_SMOKE

N_FORGETS = 4
VICTIMS_PER_FORGET = 2
BATCH_SIZE = 3


def test_release_churn_soak(spark, tmp_path):
    out = str(tmp_path / "soak_rel")
    rel = curate_full(spark, SF_SMOKE, out, budget_tokens=2000, seed="0")
    base_ids = {
        r["doc_id"]
        for r in snapshot_read(spark, rel["tables"]["shards"])
        .select("doc_id")
        .collect()
    }

    # deterministic batch material: WFQ-cut survivors (pass every frozen
    # gate; mutually non-dup — each is its own cluster representative)
    from agf_data_ingestion_spark.plans.base import t

    docs = t(spark, SF_SMOKE, "documents")
    docs = stage_rule_gate(spark, SF_SMOKE, docs)
    docs = stage_exact_dedup(docs)
    docs = stage_neardup(spark, SF_SMOKE, docs)
    docs = stage_decontam(spark, SF_SMOKE, docs)
    survivors, _ = stage_quality_cut(
        spark, SF_SMOKE, docs, pick_cut_tile(spark, SF_SMOKE)
    )
    pool = sorted(
        (
            r
            for r in survivors.select(*_DOC_COLS).collect()
            if r["doc_id"] not in base_ids
        ),
        key=lambda r: r["doc_id"],
    )
    n_batches = max(2, min(5, len(pool) // BATCH_SIZE))
    assert len(pool) >= 2 * BATCH_SIZE, f"only {len(pool)} WFQ-cut survivors"
    batches = [
        pool[k * BATCH_SIZE : (k + 1) * BATCH_SIZE] for k in range(n_batches)
    ]

    # forget victims: deterministic base ids, disjoint across forgets
    victims = sorted(base_ids)[: N_FORGETS * VICTIMS_PER_FORGET]
    forget_sets = [
        victims[k * VICTIMS_PER_FORGET : (k + 1) * VICTIMS_PER_FORGET]
        for k in range(N_FORGETS)
    ]

    stop_maint = threading.Event()
    errors: list = []
    appended_per_batch: list[set] = []

    def appender():
        try:
            for k, members in enumerate(batches):
                base = 1_000_000 * (k + 1)
                rows = [
                    (base + i, m["text"], m["lang"], m["source"], len(m["text"]))
                    for i, m in enumerate(members)
                ]
                curate_incremental(
                    spark,
                    spark.createDataFrame(
                        rows,
                        "doc_id long, text string, lang string,"
                        " source string, n_chars long",
                    ),
                    out,
                    batch_label=f"soak{k}",
                    seed="0",
                    budget_tokens=2000,
                )
                batch_ids = {r[0] for r in rows}
                got = {
                    r["doc_id"]
                    for r in snapshot_read(spark, rel["tables"]["shards"])
                    .select("doc_id")
                    .collect()
                    if r["doc_id"] in batch_ids
                }
                appended_per_batch.append(got)
        except Exception as exc:  # pragma: no cover
            errors.append(exc)

    def forgetter():
        try:
            for ids in forget_sets:
                rep = release_forget(spark, out, ids)
                assert rep["found"] == len(ids), rep
        except Exception as exc:  # pragma: no cover
            errors.append(exc)

    def maintainer():
        try:
            while not stop_maint.is_set():
                for tbl in rel["tables"].values():
                    snapshot_maintain(
                        spark,
                        tbl,
                        policy={"max_small_files": 8, "small_bytes": 1 << 20},
                    )
                stop_maint.wait(1.0)
        except Exception as exc:  # pragma: no cover
            errors.append(exc)

    threads = [
        threading.Thread(target=appender),
        threading.Thread(target=forgetter),
        threading.Thread(target=maintainer),
    ]
    for th in threads[:2]:
        th.start()
    threads[2].start()
    for th in threads[:2]:
        th.join(timeout=600)
        assert not th.is_alive(), "writer thread hung"
    stop_maint.set()
    threads[2].join(timeout=120)
    assert not threads[2].is_alive(), "maintenance thread hung"
    assert not errors, errors

    # quiescent convergence pass
    for tbl in rel["tables"].values():
        snapshot_maintain(
            spark, tbl, policy={"max_small_files": 8, "small_bytes": 1 << 20}
        )

    # ---- exact final state ----
    appended = set().union(*appended_per_batch) if appended_per_batch else set()
    expected = (base_ids - set(victims)) | appended
    final = {
        r["doc_id"]
        for r in snapshot_read(spark, rel["tables"]["shards"])
        .select("doc_id")
        .collect()
    }
    lost = expected - final
    resurrected = final - expected
    assert not lost, f"lost docs: {sorted(lost)[:10]}"
    assert not resurrected, f"resurrected docs: {sorted(resurrected)[:10]}"
    assert len(appended_per_batch) == len(batches)  # every append committed

    # forgotten ids gone from EVERY content-derived table
    for name in ("shards", "lineage", "postings", "hashes", "bands", "sets"):
        ids = {
            r["doc_id"]
            for r in snapshot_read(spark, rel["tables"][name])
            .select("doc_id")
            .distinct()
            .collect()
        }
        assert not (ids & set(victims)), name

    # current-state audit green at quiescence (stats recompute included)
    rep = verify_release(spark, out, current=True)
    assert rep["ok"], rep["checks"]
    assert rep["counts"]["docs"] == len(expected)

    # metadata-exact rowcount equals the scan
    assert snapshot_rowcount(rel["tables"]["shards"]) == len(expected)
