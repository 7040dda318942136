"""Persisted, incrementally-maintained IVF-PQ ANN index (OP-X-ANNINC).

Composes the ANN ladder's IVF-PQ rung (plans/similarity.py: exact-integer
coarse centroids + residual codebooks) with the snapshot table format
(sources/snapshots.py): the index AT REST is a snapshot table of
``(vec_id, cell, code)`` rows clustered by cell, plus a frozen KiB-sized
codebook state committed through the statestore's atomic pointer swap.

The serving contract is the standard one (FAISS ``IndexIVFPQ.add``; the
reference system has no ANN surface — this is part of the 100 TB
extension): TRAINING is a one-time pass over a sample; APPENDS never
retrain — new vectors are assigned to their coarse cell and
residual-encoded under the frozen codebooks, then committed as an O(batch)
snapshot append.  When corpus drift decays recall, ``ann_index_retrain``
(r6) retrains + re-encodes the whole index as ONE lock-free rewrite
transaction with CODEBOOK VERSIONING: each create/retrain binds its state
file to the commit via the op marker, probes resolve the codebook
matching the snapshot version they read (time travel searches with the
codebook its codes were encoded under), and appends validate their
codebook version at the commit point — an append racing a retrain
re-encodes itself instead of committing mixed-codebook rows.  That makes index maintenance a pure streaming fold: the
table after any sequence of appends is bit-identical to a from-scratch
encode of the union corpus under the same state (pinned in
tests/test_ann_index.py), so readers never see a half-updated index and
time travel / CDC / OCC all apply to the index like any other table.

Scale shape: encode is ONE map-only Arrow pass (codebooks ride in the
closure — the emb_kmeans_train pattern); the search probe reads ONLY the
files whose recorded [min, max] cell stats admit a probed cell
(``cluster_by=["cell"]`` makes those ranges tight), so a probe of
``nprobe`` cells opens ~nprobe/ncells of the table regardless of corpus
size; the ADC scan emits nprobe-bounded candidate rows per query and the
only shuffle is the per-query top-k window.  All ranking quantities are
exact int64 (LUT sums + coarse dots), so results are reproducible
bit-for-bit across engines and runs.
"""

from __future__ import annotations

import json
import os
import uuid

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from agf_data_ingestion_spark.plans.similarity import (
    _IVFPQ_NPROBE,
    _IVFPQ_Q,
    _IVFPQ_SCALE,
    _PQ_M,
    _PQ_SUBDIM,
    _ivfpq_assign,
    _ivfpq_codes_from,
    _ivfpq_rassign,
    _ivfpq_residuals,
    _ivfpq_train,
)
from agf_data_ingestion_spark.sources.snapshots import (
    CommitConflict,
    RewriteConflict,
    _commit_rewrite,
    _file_admits,
    _OCC_MAX_RETRIES,
    _publish,
    _repair_current,
    _schema_of,
    _write_data_files,
    current_version,
    read_manifest,
    snapshot_history,
    snapshot_write,
)


class StaleCodebook(RuntimeError):
    """An append encoded its batch under a codebook version a concurrent
    retrain replaced before the commit could land — the batch must be
    re-encoded under the new state (handled inside ann_index_append)."""


def _state_dir(table: str) -> str:
    return table.rstrip("/") + ".index_state"


#: commit-op markers that introduce a codebook version; the state-file
#: name rides IN the atomic manifest swap (the mv/ann_append bookmark
#: pattern), so readers always resolve the codebook their snapshot
#: version was encoded under — no separate pointer race
_CREATE_PREFIX = "ann_create@"
_RETRAIN_PREFIX = "ann_retrain@"


def save_state(state: dict, table: str, name: str = "state.json") -> None:
    """Write a frozen codebook state file atomically (tmp + os.replace —
    the statestore pointer discipline; the state is KiB-sized JSON).
    Versioned states use unique ``state-<uuid>.json`` names and become
    live only when a commit's op references them."""
    d = _state_dir(table)
    os.makedirs(d, exist_ok=True)
    payload = {
        "cells": [int(c) for c in state["cells"]],
        "ccv": np.asarray(state["ccv"], dtype=np.int64).tolist(),
        "rcb": {
            str(m): {"ids": [int(i) for i in ids], "mat": mat.tolist()}
            for m, (ids, mat) in state["rcb"].items()
        },
    }
    tmp = os.path.join(d, f"_{name}.tmp")
    with open(tmp, "w") as fh:
        json.dump(payload, fh)
    os.replace(tmp, os.path.join(d, name))


def _pointer_path(table: str) -> str:
    return os.path.join(_state_dir(table), "current_state.json")


def _state_log(table: str) -> list[dict]:
    """The durable [{name, since}] codebook-version log (since-sorted) —
    the post-expiry fallback for state resolution.  Reads the legacy
    single-pointer format too."""
    try:
        with open(_pointer_path(table)) as fh:
            p = json.load(fh)
    except FileNotFoundError:
        return []
    if "log" in p:
        return p["log"]
    return [{"name": p["name"], "since": int(p["since"])}]


def _update_pointer(table: str, name: str, since_version: int) -> None:
    """Append to the durable codebook-version LOG (atomic tmp+replace) —
    a log, not just the latest pointer, so a RETAINED pre-retrain version
    whose create/retrain marker has expired still resolves to ITS state
    file instead of a nonexistent legacy name.  The committed op marker
    stays the source of truth while its manifest is retained (it moves
    with the commit atomically); the log is written right after."""
    log = [e for e in _state_log(table) if int(e["since"]) != since_version]
    log.append({"name": name, "since": since_version})
    log.sort(key=lambda e: int(e["since"]))
    p = _pointer_path(table)
    os.makedirs(_state_dir(table), exist_ok=True)
    tmp = f"{p}.tmp"
    with open(tmp, "w") as fh:
        json.dump({"log": log}, fh)
    os.replace(tmp, p)


def _effective_state_name(table: str, version: int | None = None) -> str:
    """The codebook state a given snapshot version's codes were encoded
    under: the LAST ``ann_create@``/``ann_retrain@`` marker at or before
    ``version`` — found by a BACKWARD op-only manifest scan (O(versions
    since the last retrain), no file-list resolution); falls back to the
    durable state log (markers expired) and finally the legacy
    unversioned ``state.json``."""
    from agf_data_ingestion_spark.sources.snapshots import (
        NoSuchVersionError,
        _manifest_op,
    )

    v = current_version(table) if version is None else version
    for vv in range(v, 0, -1):
        try:
            op = _manifest_op(table, vv) or ""
        except NoSuchVersionError:
            continue  # expired hole (tagged versions may survive below)
        if op.startswith(_CREATE_PREFIX) or op.startswith(_RETRAIN_PREFIX):
            return op.split("@", 1)[1]
    best = None
    for e in _state_log(table):
        if int(e["since"]) <= v:
            best = e["name"]
    if best is not None:
        return best
    return "state.json"  # pre-versioning table


def load_state(
    table: str, *, version: int | None = None, name: str | None = None
) -> dict:
    """The frozen codebook state for ``version`` (default: current) — or
    a specific state file by ``name`` (internal)."""
    if name is None:
        name = _effective_state_name(table, version)
    with open(os.path.join(_state_dir(table), name)) as fh:
        p = json.load(fh)
    return {
        "cells": [int(c) for c in p["cells"]],
        "ccv": np.array(p["ccv"], dtype=np.int64),
        "rcb": {
            int(m): (
                [int(i) for i in v["ids"]],
                np.array(v["mat"], dtype=np.int64),
            )
            for m, v in p["rcb"].items()
        },
    }


def train_index_state(vectors: DataFrame) -> dict:
    """One-time codebook training over a (vec_id, embedding) frame —
    coarse hyperplane seed + Lloyd round, residual PQ seed + Lloyd round
    (plans/similarity._ivfpq_train; driver state is K·d ints only)."""
    cells, ccv, rcb = _ivfpq_train(_ivfpq_codes_from(vectors))
    return {"cells": cells, "ccv": ccv, "rcb": rcb}


def encode(vectors: DataFrame, state: dict) -> DataFrame:
    """(vec_id, cell, code): assign + residual-encode under the FROZEN
    state in one map-only Arrow pass — the append path never shuffles.
    The codes pass is NOT checkpointed here: encode is its only consumer,
    and an eager checkpoint would add a blocking job to every streaming
    append micro-batch for nothing (the r4 single-consumer rule)."""
    return _encode_codes(_ivfpq_codes_from(vectors, checkpoint=False), state)


def _encode_codes(codes: DataFrame, state: dict) -> DataFrame:
    """encode() over a pre-computed (vec_id, c) codes frame — lets
    ``ann_index_create`` reuse the SAME (checkpointed) codes pass for
    training and encoding instead of recomputing it."""
    cells = np.array(state["cells"], dtype=np.int64)
    ccv = state["ccv"]
    rcb = state["rcb"]

    def enc(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            C = np.stack(pdf["c"].to_numpy()).astype(np.int64)
            a = _ivfpq_assign(C, ccv)
            cb = _ivfpq_rassign(_ivfpq_residuals(C, ccv), rcb)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "cell": cells[a],
                    "code": [row.tolist() for row in cb],
                }
            )

    return codes.mapInPandas(enc, "vec_id bigint, cell bigint, code array<bigint>")


def ann_index_create(
    vectors: DataFrame,
    table: str,
    *,
    state: dict | None = None,
    cluster_files: int | None = None,
) -> int:
    """Train (unless a frozen ``state`` is supplied), persist the state
    under a fresh versioned name, and commit the encoded corpus as the
    index table's first snapshot — the ``ann_create@<state>`` op marker
    binds the codebook version to the commit atomically.  Clustered by
    cell so per-file stats prune probes.  The codes pass runs ONCE: when
    training it is checkpointed (train + encode both consume it); with a
    supplied state it feeds encode directly."""
    codes = _ivfpq_codes_from(vectors, checkpoint=state is None)
    if state is not None:
        st = state
    else:
        cells, ccv, rcb = _ivfpq_train(codes)
        st = {"cells": cells, "ccv": ccv, "rcb": rcb}
    name = f"state-{uuid.uuid4().hex}.json"
    save_state(st, table, name=name)
    v = snapshot_write(
        _encode_codes(codes, st),
        table,
        mode="overwrite",
        cluster_by=["cell"],
        cluster_files=cluster_files,
        op=f"{_CREATE_PREFIX}{name}",
    )
    _update_pointer(table, name, v)
    return v


def _cluster_cells(df: DataFrame, cluster_files: int | None) -> DataFrame:
    """The cell-clustered write layout (same shape snapshot_write's
    cluster_by produces): tight per-file cell ranges so probes prune."""
    if cluster_files:
        df = df.repartitionByRange(cluster_files, "cell")
    else:
        df = df.repartitionByRange("cell")
    return df.sortWithinPartitions("cell")


def _append_commit(
    table: str, new_files: list[dict], batch_schema, encoded_name: str, op: str | None
) -> int:
    """Append commit with a CODEBOOK VERSION CHECK inside the OCC loop:
    publishing parent+1 proves no commit interleaved after we read
    ``parent``, so checking the effective state at ``parent`` is atomic
    with the commit — an append encoded under a codebook a concurrent
    retrain replaced raises :class:`StaleCodebook` instead of committing
    mixed-codebook rows (the marker rides in the manifest op, so there is
    no pointer-update window to race)."""
    parent = current_version(table)
    for _ in range(_OCC_MAX_RETRIES):
        if _effective_state_name(table, parent) != encoded_name:
            raise StaleCodebook(
                f"{table}: codebook changed while appending — re-encode"
            )
        base = read_manifest(table, parent)["files"] if parent > 0 else []
        try:
            return _publish(
                table, base + new_files, parent, op or "append",
                batch_schema=batch_schema,
            )
        except CommitConflict:
            parent = _repair_current(table)
    raise CommitConflict(f"ann append on {table} lost {_OCC_MAX_RETRIES} CAS races")


def ann_index_append(
    vectors: DataFrame,
    table: str,
    *,
    cluster_files: int | None = None,
    op: str | None = None,
) -> int:
    """Fold a new vector batch into the index: encode under the CURRENT
    frozen state, snapshot-append.  O(batch) work + O(delta) commit;
    concurrent appends compose through the snapshot format's lock-free
    OCC, and a concurrent RETRAIN is detected at the commit point
    (:class:`StaleCodebook`) — the batch transparently re-encodes under
    the new codebook and retries, so appends never mix codebook versions.
    ``op`` labels the commit (the streaming maintainer records its
    micro-batch bookmark there — streaming/ann_stream.py)."""
    for _ in range(3):  # a retrain can steal at most one re-encode per race
        name = _effective_state_name(table)
        df = _cluster_cells(
            encode(vectors, load_state(table, name=name)), cluster_files
        )
        schema = _schema_of(df)
        files = _write_data_files(df, table)
        try:
            return _append_commit(table, files, schema, name, op)
        except StaleCodebook:
            continue  # orphaned files: expiry's grace window reclaims them
    raise StaleCodebook(
        f"{table}: codebook retrained repeatedly during one append"
    )


def ann_index_retrain(
    vectors: DataFrame, table: str, *, cluster_files: int | None = None
) -> int:
    """Retrain the codebooks and re-encode the WHOLE index as one
    lock-free rewrite transaction (VERDICT r5 next-round #4): a
    continuously-ingesting corpus drifts and recall decays under the
    frozen create-time codebook; this is the recourse.

    ``vectors`` must cover every LIVE vec_id in the index (it is the
    authoritative corpus — codes are not invertible, so rows it misses
    cannot be re-encoded; a gap raises rather than silently dropping
    rows).  "Live" is merge-on-read: rows removed by a
    ``snapshot_delete(mode='dv')`` are neither demanded of the corpus nor
    resurrected by the rewrite — the retrained index contains exactly the
    live rows, re-encoded.  The new state file is staged first and bound to the commit by
    the ``ann_retrain@<state>`` op marker, so probes resolve the codebook
    matching the snapshot version they read — time travel to a
    pre-retrain version searches with the OLD codebook.

    Concurrency: the commit validates at file granularity with
    ``delta_safe = never`` — ANY interleaved commit (its rows are encoded
    under the old state) forces a transparent recompute on fresh state,
    and an append landing AFTER the retrain re-encodes itself via the
    :class:`StaleCodebook` check.  Either order converges to one
    codebook version covering every row (tests/test_ann_index.py)."""
    from agf_data_ingestion_spark.sources.snapshots import _read_entries

    spark = vectors.sparkSession
    codes = _ivfpq_codes_from(vectors)  # checkpointed: train + encode + cover
    name = f"state-{uuid.uuid4().hex}.json"
    st = None
    for _ in range(_OCC_MAX_RETRIES):
        parent = _repair_current(table)
        m = read_manifest(table, parent)
        # the index CONTENT to rebuild = the LIVE rows of the current
        # version — merge-on-read, so a snapshot_delete(mode='dv') stays
        # deleted through a retrain (never resurrected), and DV'd ids are
        # not demanded of the corpus
        from agf_data_ingestion_spark.sources.snapshots import _fields_of

        live_ids = (
            _read_entries(
                spark,
                m["files"],
                eq_deletes=m.get("eq_deletes"),
                fields=_fields_of(m),
            ).select("vec_id")
            if m["files"]
            else None
        )
        live_codes = codes
        if live_ids is not None:
            missing = live_ids.join(
                codes.select("vec_id"), "vec_id", "left_anti"
            ).count()
            if missing:
                raise ValueError(
                    f"ann_index_retrain: {missing} live indexed vec_id(s) are "
                    f"not in the supplied corpus — rows cannot be re-encoded"
                )
            live_codes = codes.join(live_ids, "vec_id", "left_semi")
        if st is None:  # train once; the codebook is corpus-derived state
            cells, ccv, rcb = _ivfpq_train(live_codes)
            st = {"cells": cells, "ccv": ccv, "rcb": rcb}
            save_state(st, table, name=name)
        # re-encode per attempt: a RewriteConflict means the live set
        # changed (an interleaved append/delete) — the rewrite files must
        # cover exactly the NEW live rows
        df = _cluster_cells(_encode_codes(live_codes, st), cluster_files)
        schema = _schema_of(df)
        new_files = _write_data_files(df, table)
        try:
            v = _commit_rewrite(
                table,
                parent,
                {f["path"] for f in m["files"]},
                new_files,
                f"{_RETRAIN_PREFIX}{name}",
                batch_schema=schema,
                # any interleaved commit carries OLD-codebook rows: recompute
                delta_safe=lambda f: False,
            )
        except RewriteConflict:
            continue
        _update_pointer(table, name, v)
        return v
    raise CommitConflict(
        f"ann_index_retrain on {table} lost {_OCC_MAX_RETRIES} recompute races"
    )


def probe_plan(
    table: str, cells: list[int], version: int | None = None
) -> tuple[list[str], int]:
    """(paths to open, total file count): the files whose recorded cell
    range admits ANY probed cell — the manifest-level pruning a probe
    rides.  Exposed separately so tests and EXPLAIN evidence can assert
    the pruning ratio."""
    keep, total = _probe_entries(table, cells, version)
    return [f["path"] for f in keep], total


def _probe_entries(
    table: str, cells: list[int], version: int | None = None
) -> tuple[list[dict], int]:
    m = read_manifest(table, version)
    keep = [
        f
        for f in m["files"]
        if any(_file_admits(f, [("cell", "==", c)]) for c in cells)
    ]
    return keep, len(m["files"])


def ann_index_search(
    spark: SparkSession,
    table: str,
    queries: DataFrame,
    *,
    k: int = 3,
    nprobe: int = _IVFPQ_NPROBE,
    version: int | None = None,
) -> DataFrame:
    """Top-k ADC search against the persisted index: per query, rank the
    ``nprobe`` nearest coarse cells (exact integer d², lowest-cell tie),
    open only the files those cells admit, LUT-scan their codes, and
    window out the top-k by (ascore desc, neighbor_id asc).

    ``queries`` is a bounded (query_id, embedding) frame (filter first —
    never the corpus); codes/LUTs are computed driver-side with the SAME
    order-preserving fold as the corpus encode, so scores are exact
    int64 and reproducible.  Self-matches (neighbor_id == query_id) are
    excluded, matching the catalog ANN queries.

    ``version`` time-travels the search: the manifest AND the codebook
    both resolve to that snapshot (a pre-retrain version searches with
    the codebook its codes were encoded under)."""
    empty = "query_id bigint, neighbor_id bigint, rank int, ascore bigint"
    st = load_state(table, version=version)
    cells, ccv, rcb = st["cells"], st["ccv"], st["rcb"]
    qrows = sorted(queries.collect(), key=lambda r: int(r["query_id"]))
    qids = [int(r["query_id"]) for r in qrows]
    if not qids:
        return spark.createDataFrame([], empty)
    qC = []
    for r in qrows:
        v = np.array(list(r["embedding"]), dtype=np.float64)
        acc = 0.0
        for x in v:  # the order-preserving fold, dim by dim
            acc = acc + x * x
        qC.append(np.floor(v / np.sqrt(acc) * _IVFPQ_SCALE).astype(np.int64))
    qvq = np.stack(qC) * _IVFPQ_Q

    probes: dict[int, list[int]] = {}
    for qi, q in enumerate(qids):
        diff = qvq[qi][None, :] - ccv
        d2 = (diff * diff).sum(axis=1)
        order = sorted(range(len(cells)), key=lambda ci: (int(d2[ci]), cells[ci]))
        probes[q] = [cells[ci] for ci in order[:nprobe]]
    probe_cells = sorted({c for cs in probes.values() for c in cs})

    kept, _total = _probe_entries(table, probe_cells, version)
    if not kept:
        # empty index table, or every probed cell's rows were removed by
        # a later snapshot_delete — an empty result, not an unpack error
        return spark.createDataFrame([], empty)
    # merge-on-read: entries carrying deletion vectors (a snapshot_delete
    # over the index) anti-join their positions, equality deletes their
    # keys; plain entries = bare scan
    from agf_data_ingestion_spark.sources.snapshots import (
        _fields_of,
        _read_entries,
    )

    _m = read_manifest(table, version)
    scan = _read_entries(
        spark,
        kept,
        eq_deletes=_m.get("eq_deletes"),
        fields=_fields_of(_m),
    ).filter(F.col("cell").isin(probe_cells))

    lut = {
        q: [qvq[qi].reshape(_PQ_M, _PQ_SUBDIM)[m] @ rcb[m][1].T for m in range(_PQ_M)]
        for qi, q in enumerate(qids)
    }
    coarse = {q: qvq[qi] @ ccv.T for qi, q in enumerate(qids)}
    cell_pos = {c: ci for ci, c in enumerate(cells)}
    probe_set = {q: set(cs) for q, cs in probes.items()}
    rcb_ids = {m: np.array(rcb[m][0], dtype=np.int64) for m in range(_PQ_M)}

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            vid = pdf["vec_id"].to_numpy().astype(np.int64)
            cell = pdf["cell"].to_numpy().astype(np.int64)
            code = np.stack(pdf["code"].to_numpy()).astype(np.int64)
            pos = np.stack(
                [np.searchsorted(rcb_ids[m], code[:, m]) for m in range(_PQ_M)],
                axis=1,
            )
            cpos = np.array([cell_pos[c] for c in cell], dtype=np.int64)
            outq, outn, outs = [], [], []
            for q in qids:
                mask = np.array(
                    [c in probe_set[q] for c in cell], dtype=bool
                ) & (vid != q)
                if not mask.any():
                    continue
                rscore = np.zeros(int(mask.sum()), dtype=np.int64)
                for m in range(_PQ_M):
                    rscore += lut[q][m][pos[mask, m]]
                outq.append(np.full(int(mask.sum()), q, dtype=np.int64))
                outn.append(vid[mask])
                outs.append(coarse[q][cpos[mask]] + rscore)
            if not outq:
                continue
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(outq),
                    "neighbor_id": np.concatenate(outn),
                    "ascore": np.concatenate(outs),
                }
            )

    scored = scan.mapInPandas(score, "query_id bigint, neighbor_id bigint, ascore bigint")
    return rank_topk_per_query(scored, k)


def rank_topk_per_query(scored: DataFrame, k: int) -> DataFrame:
    """Top-``k`` ADC candidates per query by (score desc, id asc) — the
    search ranking window, extracted for the structural sweep
    (plan_registry, r12).  Partitions on ``query_id`` (query-set
    cardinality, never corpus) and the ``rank <= k`` filter gives the
    optimizer its map-side WindowGroupLimit bound."""
    w = Window.partitionBy("query_id").orderBy(F.desc("ascore"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "ascore")
    )
