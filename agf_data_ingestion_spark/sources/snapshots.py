"""Snapshot table format: atomic commits, time travel, and compaction over
plain parquet — the minimal slice of a transactional table format
(Delta/Iceberg-style) the 100 TB sink story needs, with no external
dependency.

Layout::

    table/
      data/<commit-uuid>/part-*.parquet   immutable data files
      dv/<commit-uuid>/part-*.parquet     position-delete files (r6):
                                          (file_path, pos) pairs a
                                          merge-on-read DELETE committed
      eqd/<commit-uuid>/part-*.parquet    equality-delete key files (r7):
                                          key rows a zero-read
                                          DELETE-BY-KEY / eq-MERGE
                                          committed; scoped by sequence
                                          number (manifest "eq_deletes")
      _snapshots/v-00000001.json          manifest: the file list of v1
      _snapshots/CURRENT                  pointer file (atomic rename swap)

Why a manifest format (and not directory listing):

* **Atomic commits** — a commit is one ``rename`` of the CURRENT pointer;
  readers see the old file list or the new one, never a half-written
  table.  This retires the read-then-overwrite race the plain sink handles
  with localCheckpoint, and makes upsert batches all-or-nothing.
* **Time travel** — every manifest is immutable; ``snapshot_read(...,
  version=N)`` reproduces any past state exactly (audit/debug/replay — the
  reference's immutable-S3 assumption, agf_reconciliation_lambda.py:266,
  promoted to a first-class guarantee).
* **O(files) planning, no listing** — at 100 TB a recursive object-store
  listing is minutes; a manifest read is one small JSON GET.  Spark then
  opens exactly the listed files.
* **Compaction without downtime** — streaming ingest produces small files;
  ``snapshot_compact`` rewrites them into target-sized ones and commits a
  new manifest, while every reader pinned to an older version keeps its
  exact file list (immutability makes this safe).

Concurrency (r4 — optimistic concurrency, reference parity with the 50
concurrent-writer ingest fleet the conditional-write arbiter allows,
agf-lambda-stack.yaml:134 / agf_ingestion_lambda.py:227-236):

* **Version reservation is a CAS.**  A manifest is staged to a temp file
  and published with ``os.link`` — atomic-exclusive on POSIX (the
  object-store twin is a conditional PUT / If-None-Match).  Exactly one
  writer wins version N; losers get :class:`CommitConflict`.
* **Append-shaped commits (``snapshot_write`` append, ``snapshot_upsert``)
  take NO table lock.**  Data files are written first (unreferenced until
  committed), then the commit loop reserves parent+1; on conflict it
  REBASES: re-reads the new current manifest, re-checks its own rows
  against only the files the interleaved commits added (for upsert: one
  anti-join against the delta, first-writer-wins per key), and retries.
  Disjoint-key writers therefore both commit, serialized only at the
  microsecond-scale reservation — never during their scans or file
  writes.
* **Rewrite-shaped commits (merge / delete / compact) are lock-free
  too (r5)**: their commit point (``_commit_rewrite``) validates at FILE
  granularity — a lost CAS rebases onto the winner iff every file this
  rewrite replaced is still referenced and no interleaved commit added
  rows inside the rewrite's key range / predicate (per-file stats
  check); otherwise :class:`RewriteConflict` recomputes the whole
  transaction on fresh state.  Disjoint-file rewrites commit
  concurrently; DELETE serializes after every interleaved commit.
* **Manifests are segment lists (r5)**: a commit names its parent's
  immutable segment files and writes only the delta entries — commit
  I/O is O(delta), not O(table); expiry vacuums unreferenced segments.
* The CURRENT pointer advances monotonically under a separate
  microsecond pointer lock; a writer that crashes between reservation
  and pointer bump leaves a fully-written manifest that the next
  writer's conflict handler rolls forward (``_repair_current``).

Concurrent READERS need no lock at any time.
"""

from __future__ import annotations

import contextlib
import functools
import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

from agf_data_ingestion_spark.operators.locking import (
    TableLockedError,
    table_lock,
)

_SNAP_DIR = "_snapshots"
_CURRENT = "CURRENT"


class NoSuchVersionError(ValueError):
    pass


class CommitConflict(RuntimeError):
    """Another writer won the attempted snapshot version (CAS miss)."""


class RewriteConflict(CommitConflict):
    """A concurrent commit invalidated this rewrite's inputs (a file it
    rewrote disappeared, or an interleaved commit added rows its predicate
    / key range covers) — the transaction must recompute on fresh state.
    Raised from the commit point; ``_retry_on_conflict`` re-runs the whole
    transaction body, exactly Iceberg's validation-failure semantics."""


class SchemaEvolutionError(ValueError):
    """The incoming batch changes the TYPE of an existing column — only
    ADDITIVE evolution (new columns) is supported, the Iceberg/Delta
    default.  Dropping or retyping requires an explicit overwrite."""


#: commit-loop budget for optimistic writers; each retry rebases on the
#: winner's manifest, so livelock needs a sustained adversarial stream
_OCC_MAX_RETRIES = 20


def _snap_path(table: str) -> str:
    return os.path.join(table, _SNAP_DIR)


def _manifest_path(table: str, version: int) -> str:
    return os.path.join(_snap_path(table), f"v-{version:08d}.json")


# -- segment manifests (r5) --------------------------------------------------
# A manifest no longer inlines the full file list: it names immutable
# SEGMENT files (Iceberg's manifest-list model), and a commit writes only
# the segments its parent didn't already have — commit I/O is O(delta),
# not O(table).  At 1M files an append used to rewrite the whole file list
# every commit; now it writes one small segment + a tiny manifest.

#: per-manifest segment-count bound; exceeding commits coalesce the two
#: smallest segments (geometric merging, LSM-style) so manifests stay tiny
#: while amortized rewrite cost stays O(N / _MAX_SEGMENTS) per commit
_MAX_SEGMENTS = 64

#: immutable segment cache (segments are content-frozen once linked into a
#: manifest); bounded by periodic clear, entries must not be mutated
_SEG_CACHE: dict[str, list] = {}


def _segs_path(table: str) -> str:
    return os.path.join(_snap_path(table), "segs")


#: segment resolutions requested since process start — the observable the
#: segment-pruning tests pin (planning a selective predicate must resolve a
#: strict SUBSET of the manifest's segments, the Iceberg manifest-list claim)
_SEG_READS = 0


def _read_segment(table: str, name: str) -> list[dict]:
    global _SEG_READS
    _SEG_READS += 1
    p = os.path.join(_segs_path(table), name)
    ent = _SEG_CACHE.get(p)
    if ent is None:
        with open(p) as fh:
            ent = json.load(fh)
        if len(_SEG_CACHE) > 4096:
            _SEG_CACHE.clear()
        _SEG_CACHE[p] = ent
    return ent


def _seg_meta_of(entries: list[dict]) -> dict:
    """Segment-level aggregate stats for manifest-list pruning: per-column
    [min, max] over the member entries' file stats, recorded ONLY for
    columns where EVERY entry carries comparable stats — a segment with
    one stats-less (or type-mixed) entry for a column cannot be pruned on
    it, mirroring ``_file_admits``'s conservative-keep per file.  Stats
    are keyed PHYSICAL (the file-footer domain, same as entry stats)."""
    stats: dict[str, list] = {}
    if not entries:
        return {"n": 0, "stats": stats}
    common = set(entries[0].get("stats") or {})
    for e in entries[1:]:
        common &= set(e.get("stats") or {})
    for c in sorted(common):
        lo = hi = None
        ok = True
        for e in entries:
            l, h = e["stats"][c]
            if l is None or h is None:
                ok = False
                break
            try:
                lo = l if lo is None or l < lo else lo
                hi = h if hi is None or h > hi else hi
            except TypeError:  # cross-entry incomparable stat types
                ok = False
                break
        if ok:
            stats[c] = [lo, hi]
    out = {"n": len(entries), "stats": stats}
    # null totals (r8): summable only for columns EVERY member records —
    # seg nulls == 0 disproves IS NULL for the whole segment, seg nulls
    # == seg rows disproves IS NOT NULL
    ncommon = set(entries[0].get("nulls") or {})
    for e in entries[1:]:
        ncommon &= set(e.get("nulls") or {})
    if ncommon:
        out["nulls"] = {
            c: sum(e["nulls"][c] for e in entries) for c in sorted(ncommon)
        }
    if all("rows" in e for e in entries):
        out["rows"] = sum(e["rows"] for e in entries)
    return out


def _write_segment(table: str, entries: list[dict]) -> str:
    """Stage-then-rename an immutable segment file; a crash mid-write
    leaves an unreferenced temp/orphan that expiry's grace window
    reclaims, never a referenced-but-corrupt segment."""
    os.makedirs(_segs_path(table), exist_ok=True)
    name = f"seg-{uuid.uuid4().hex}.json"
    p = os.path.join(_segs_path(table), name)
    tmp = f"{p}.tmp"
    with open(tmp, "w") as fh:
        json.dump(entries, fh)
    os.rename(tmp, p)
    _SEG_CACHE[p] = entries
    return name


def _derive_segments(
    table: str, files: list[dict], parent_m: dict | None
) -> tuple[list[str], dict]:
    """Split the committing file list into (reused parent segments +
    one new segment for the delta).  A parent segment is reusable iff
    EVERY path it lists survives into the new manifest — data files are
    immutable, so path identity implies entry identity.  Derivation is
    O(table) in MEMORY per commit (dict-equality checks) but the WRITE is
    O(delta) — the same trade Iceberg's manifest list makes.

    Reuse checks ENTRY identity, not just path identity: data files are
    immutable, but since r6 an entry can change without its path changing
    (a deletion-vector commit extends its ``dv`` list) — path-only reuse
    would silently resurrect the pre-DV entry.

    Returns ``(segment names, seg_meta)`` — seg_meta carries each
    segment's aggregate column bounds (``_seg_meta_of``) in the MANIFEST,
    so scan planning can skip resolving segments whose bounds already
    disprove the predicate (manifest-list pruning, r8).  A reused
    segment's meta is copied from the parent manifest when present
    (byte-stable across commits); recomputed otherwise (pre-meta
    manifests upgrade lazily as their segments get reused)."""
    parent_meta = (parent_m or {}).get("seg_meta") or {}
    target = {f["path"]: f for f in files}
    covered: set[str] = set()
    segs: list[tuple[str, int]] = []
    meta: dict[str, dict] = {}
    for name in (parent_m or {}).get("segments") or []:
        ent = _read_segment(table, name)
        paths = [e["path"] for e in ent]
        if (
            paths
            and all(target.get(e["path"]) == e for e in ent)
            and not any(p in covered for p in paths)
        ):
            segs.append((name, len(paths)))
            covered.update(paths)
            meta[name] = parent_meta.get(name) or _seg_meta_of(ent)
    leftover = [f for f in files if f["path"] not in covered]
    if leftover:
        name = _write_segment(table, leftover)
        segs.append((name, len(leftover)))
        meta[name] = _seg_meta_of(leftover)
    while len(segs) > _MAX_SEGMENTS:
        # merge the ADJACENT pair (manifest order = commit order) with the
        # smallest combined entry count.  Merging the two smallest segments
        # REGARDLESS of position — the pre-r9 rule — repeatedly fused the
        # newest delta with some distant old segment, and by ~500 commits
        # every segment's column bounds spanned most of the key space:
        # a point query resolved 64/64 segments (measured,
        # scripts/measure_metadata.py big) — manifest-list pruning
        # destroyed by its own compaction.  Adjacent merging keeps each
        # segment covering a CONTIGUOUS commit range, so for the common
        # clustered-arrival pattern (time-ordered ingest, sequential keys)
        # merged bounds stay tight and pruning survives unbounded commit
        # counts; amortized rewrite cost stays O(N / _MAX_SEGMENTS).
        i = min(
            range(len(segs) - 1), key=lambda j: segs[j][1] + segs[j + 1][1]
        )
        merged = _read_segment(table, segs[i][0]) + _read_segment(
            table, segs[i + 1][0]
        )
        for old, _n in segs[i : i + 2]:
            meta.pop(old, None)
        name = _write_segment(table, merged)
        segs[i : i + 2] = [(name, len(merged))]
        meta[name] = _seg_meta_of(merged)
    return [name for name, _ in segs], meta


def _derive_segments_append(
    table: str, parent_m: dict | None, delta: list[dict]
) -> tuple[list[str], dict]:
    """The O(delta) fast path of :func:`_derive_segments` for PURE
    appends (r9): every parent segment is reusable by construction (an
    append drops and mutates nothing), so reuse is by NAME with meta and
    entry counts taken from the parent's ``seg_meta`` — no segment is
    read, no entry is compared.  Only the delta segment is written, plus
    the same bounded adjacent geometric coalescing (which reads exactly
    the two segments it merges, cache-served).  A parent segment missing
    from seg_meta (pre-r8 manifest) is resolved once to recover its
    count/meta — the lazy upgrade `_derive_segments` also performs."""
    parent_meta = (parent_m or {}).get("seg_meta") or {}
    segs: list[tuple[str, int]] = []
    meta: dict[str, dict] = {}
    for name in (parent_m or {}).get("segments") or []:
        pm = parent_meta.get(name)
        if pm is None or "n" not in pm:
            ent = _read_segment(table, name)
            pm = _seg_meta_of(ent)
        segs.append((name, pm["n"]))
        meta[name] = pm
    if delta:
        name = _write_segment(table, delta)
        segs.append((name, len(delta)))
        meta[name] = _seg_meta_of(delta)
    while len(segs) > _MAX_SEGMENTS:
        # the same adjacent-pair geometric coalescing as the slow path
        i = min(
            range(len(segs) - 1), key=lambda j: segs[j][1] + segs[j + 1][1]
        )
        merged = _read_segment(table, segs[i][0]) + _read_segment(
            table, segs[i + 1][0]
        )
        for old, _n in segs[i : i + 2]:
            meta.pop(old, None)
        name = _write_segment(table, merged)
        segs[i : i + 2] = [(name, len(merged))]
        meta[name] = _seg_meta_of(merged)
    return [name for name, _ in segs], meta


def current_version(table: str) -> int:
    """The committed version (0 = empty table, no commits yet)."""
    try:
        with open(os.path.join(_snap_path(table), _CURRENT)) as fh:
            return int(fh.read().strip())
    except FileNotFoundError:
        return 0


def read_manifest(table: str, version: int | None = None) -> dict:
    """The manifest dict with ``files`` RESOLVED: segment-based manifests
    (r5) materialize their file list by concatenating the named immutable
    segments (cached per process); legacy inline-``files`` manifests pass
    through unchanged.  Entries are shallow COPIES of the cached segment
    dicts — a caller mutating a returned entry can no longer corrupt the
    process-wide ``_SEG_CACHE`` (manifest resolution is not hot enough
    for the copy to matter)."""
    m = _load_manifest(table, version)
    if "files" not in m:
        m["files"] = [
            dict(e) for s in m.get("segments") or [] for e in _read_segment(table, s)
        ]
    return m


def _load_manifest(table: str, version: int | None = None) -> dict:
    """The RAW manifest dict — segment file lists left unresolved.  The
    planning path reads this form so segment-level pruning can decide
    which segments to resolve at all (``plan_files``); every other caller
    goes through :func:`read_manifest`."""
    v = current_version(table) if version is None else version
    if v == 0:
        return {"version": 0, "files": [], "parent": None}
    try:
        with open(_manifest_path(table, v)) as fh:
            return json.load(fh)
    except FileNotFoundError:
        raise NoSuchVersionError(f"{table}: no snapshot v{v}") from None


def _manifest_op(table: str, version: int) -> str | None:
    """A version's commit-op label WITHOUT resolving its file list —
    segment manifests keep the raw JSON tiny, so bookmark scans
    (ann_applied_batch_ids, codebook-version resolution) stay O(1) per
    version instead of materializing every retained manifest's files.
    Raises ``NoSuchVersionError`` for an expired version."""
    try:
        with open(_manifest_path(table, version)) as fh:
            return json.load(fh).get("op")
    except FileNotFoundError:
        raise NoSuchVersionError(f"{table}: no snapshot v{version}") from None


def _commit_index(table: str) -> dict[int, float]:
    """{version: committed_at} from the append-only ``COMMITS`` index
    (one line per commit, written by ``_commit``) — O(versions) tiny-line
    reads instead of deserializing every manifest's full file list.
    Legacy tables without the index fall back to a manifest scan."""
    idx = os.path.join(_snap_path(table), "COMMITS")
    out: dict[int, float] = {}
    try:
        with open(idx) as fh:
            for line in fh:
                v, ts = line.split()
                out[int(v)] = float(ts)
        return out
    except FileNotFoundError:
        pass
    for v in range(1, current_version(table) + 1):
        try:
            out[v] = read_manifest(table, v).get("committed_at", 0.0)
        except NoSuchVersionError:  # expired snapshot — hole in history
            continue
    return out


def version_as_of(table: str, ts: float) -> int:
    """The latest committed version whose ``committed_at`` ≤ ``ts`` (epoch
    seconds) — timestamp-based time travel, the `FOR TIMESTAMP AS OF`
    resolution step of Iceberg/Delta.  Raises ``NoSuchVersionError`` when
    the table's first commit is later than ``ts``.  Resolution reads the
    commit-time index, not the manifests; expired versions must still be
    skipped (their index line survives, their manifest doesn't)."""
    commits = _commit_index(table)
    best = 0
    for v in sorted(commits):
        if commits[v] <= ts:
            try:
                read_manifest(table, v)
            except NoSuchVersionError:
                continue
            best = v
    if best == 0:
        raise NoSuchVersionError(f"{table}: no snapshot committed at or before {ts}")
    return best


def snapshot_history(table: str) -> list[dict]:
    """Commit history, oldest first — the ``history`` metadata table of
    Iceberg/Delta: one row per retained version with its parent, operation,
    commit timestamp, file count, and total bytes.  Expired versions are
    skipped (their manifests are gone); the surviving rows still chain via
    ``parent``."""
    out = []
    schemas: dict[int, list | None] = {}
    for v in range(1, current_version(table) + 1):
        try:
            m = read_manifest(table, v)
        except NoSuchVersionError:
            continue
        schemas[v] = m.get("schema")
        # schema-evolution marker: columns this commit ADDED vs its parent
        # (the DESCRIBE HISTORY evidence the evolution tests pin)
        psch = schemas.get(m.get("parent") or 0)
        added = (
            [n for n, _ in m["schema"] if n not in {c for c, _ in psch}]
            if m.get("schema") is not None and psch is not None
            else []
        )
        out.append(
            {
                "version": m["version"],
                "parent": m.get("parent"),
                "op": m.get("op"),
                "committed_at": m.get("committed_at"),
                "n_files": len(m["files"]),
                "n_cols": len(m["schema"]) if m.get("schema") is not None else None,
                "added_cols": added,
                "total_bytes": sum(f.get("bytes", 0) for f in m["files"]),
                # LIVE rows: footer counts minus deletion-vector positions;
                # unknowable (None) while an equality delete is live
                "total_rows": sum(_live_rows(f) for f in m["files"])
                if all("rows" in f for f in m["files"])
                and not m.get("eq_deletes")
                else None,
                "dv_rows": sum(
                    i["n"] for f in m["files"] for i in (f.get("dv") or [])
                ),
                "eq_delete_keys": sum(
                    it["n"] for it in m.get("eq_deletes") or []
                ),
            }
        )
    return out


# -- field registry: non-additive schema evolution (r7) ------------------------
# Iceberg evolves schemas by FIELD ID; Delta's column-mapping "name mode"
# keeps an immutable PHYSICAL column name per field.  This format uses the
# Delta shape (parquet files written here carry no field ids to key on):
# the manifest records
#
#     "fields": [{"id": 1, "name": <logical>, "phys": <physical>,
#                 "type": <spark simpleString>}, ...]
#     "retired_phys": [<physical names of dropped columns>]
#
# where ``phys`` is the column's name AT CREATION and never changes.
# RENAME updates only ``name`` (metadata-only commit; old files read
# correctly because their physical columns still match ``phys``); DROP
# removes the field and retires its phys (old files keep the bytes, every
# reader — snapshot_read, CDC, diff — hides them); WIDEN updates ``type``
# along the safe lattice (int→bigint etc.; Spark 4's parquet reader
# upcasts int32 files into a bigint read schema exactly).  Writers rename
# logical → phys before writing; readers scan with the (phys, type)
# schema and alias back.  A table never renamed/dropped has phys == name
# everywhere and every mapping below is the identity.
#
# Re-USING a reserved name (any live field's phys under a different
# logical name, or a retired phys) as a new column is REFUSED: old files'
# physical bytes would leak into the new column.  This is also the
# loud-failure path for a rename racing a concurrent append — the
# append's re-evolution at the CAS sees its old column name reserved and
# raises instead of silently forking a column.

#: safe type widenings (batch/file type → table type) — value-preserving,
#: supported by Spark 4's parquet vectorized type promotion
_WIDENS = {
    ("tinyint", "smallint"), ("tinyint", "int"), ("tinyint", "bigint"),
    ("smallint", "int"), ("smallint", "bigint"),
    ("int", "bigint"),
    ("float", "double"),
}


def _fields_of(m: dict | None) -> list[dict] | None:
    """The manifest's field registry; derived as the identity registry
    from the logical schema for manifests that predate it."""
    if not m:
        return None
    if m.get("fields") is not None:
        return m["fields"]
    if m.get("schema") is None:
        return None
    return [
        {"id": i + 1, "name": n, "phys": n, "type": t}
        for i, (n, t) in enumerate(m["schema"])
    ]


def _phys_of(fields: list[dict] | None) -> dict[str, str]:
    """logical name → physical name ({} means identity)."""
    return {
        f["name"]: f["phys"] for f in fields or [] if f["name"] != f["phys"]
    }


def _is_identity(fields: list[dict] | None) -> bool:
    return all(f["name"] == f["phys"] for f in fields or [])


def _to_phys(where: list[tuple] | None, fields: list[dict] | None):
    """Predicate triples with logical columns translated to the physical
    names the per-file stats are keyed by."""
    p = _phys_of(fields)
    if not p or not where:
        return where
    return [(p.get(c, c), op, v) for c, op, v in where]


def _last_field_id(parent_m: dict | None) -> int:
    """The highest field id EVER minted on this table — persisted as
    manifest ``last_field_id`` (Iceberg's last-column-id).  Fresh ids
    must start above it, never above the max LIVE id: a column minted
    after a DROP would otherwise inherit the dropped column's id and
    the by-id alignment in snapshot_diff / the CDC reader would bind
    the two unrelated columns together across the drop boundary."""
    fields = _fields_of(parent_m) or []
    return max(
        (parent_m or {}).get("last_field_id", 0),
        max((f["id"] for f in fields), default=0),
    )


def _evolve_fields(
    parent_m: dict | None,
    batch_schema: list | None,
    *,
    replace: bool = False,
) -> tuple[list | None, list | None, list]:
    """The field-registry twin of ``_evolve_schema``: returns (fields,
    schema, retired_phys) for the child manifest.  Additive columns get
    fresh ids with phys = name (reserved names refused); a batch column
    NARROWER than the table type is fine (the read schema upcasts it —
    ``_WIDENS``); any other type change raises
    :class:`SchemaEvolutionError`."""
    parent_fields = _fields_of(parent_m)
    retired = list((parent_m or {}).get("retired_phys") or [])
    if batch_schema is None:
        schema = (parent_m or {}).get("schema")
        return parent_fields, schema, retired
    if replace or not parent_fields:
        # a REPLACE adopts the batch schema wholesale with fresh physical
        # names (it references no old file), but same-NAMED columns keep
        # their parent field id — snapshot_diff and the CDC reader align
        # versions BY ID, and a positional re-assignment would bind
        # unrelated columns together across the overwrite boundary
        pid = {f["name"]: f["id"] for f in parent_fields or []}
        next_id = _last_field_id(parent_m)
        fields = []
        for n, t in batch_schema:
            fid = pid.get(n)
            if fid is None:
                next_id += 1
                fid = next_id
            fields.append({"id": fid, "name": n, "phys": n, "type": t})
        return fields, [[n, t] for n, t in batch_schema], [] if replace else retired
    by_name = {f["name"]: f for f in parent_fields}
    reserved = {f["phys"] for f in parent_fields} | set(retired)
    conflicts, fields = [], [dict(f) for f in parent_fields]
    next_id = _last_field_id(parent_m)
    for n, t in batch_schema:
        f = by_name.get(n)
        if f is None:
            if n in reserved:
                raise SchemaEvolutionError(
                    f"column name {n!r} is reserved by this table's rename/"
                    f"drop history — pick a different name"
                )
            next_id += 1
            fields.append({"id": next_id, "name": n, "phys": n, "type": t})
            reserved.add(n)
        elif t != f["type"] and (t, f["type"]) not in _WIDENS:
            conflicts.append((n, f["type"], t))
    if conflicts:
        detail = ", ".join(f"{n}: {old} -> {new}" for n, old, new in conflicts)
        raise SchemaEvolutionError(
            f"additive evolution only — column type change(s): {detail}"
        )
    return fields, [[f["name"], f["type"]] for f in fields], retired


def _schema_of(df: DataFrame) -> list[list[str]]:
    """JSON-storable ``[[name, dtype], ...]`` in the frame's column order —
    what each commit records so evolution is validated from metadata,
    never by opening old file footers (O(1) at any table size)."""
    return [[n, t] for n, t in df.dtypes]


def _evolve_schema(
    parent_schema: list | None,
    batch_schema: list | None,
    *,
    replace: bool = False,
) -> list | None:
    """Additive schema evolution (Iceberg/Delta ADD COLUMN semantics): the
    committed table schema is the parent's columns (order preserved) plus
    any NEW batch columns appended; a batch missing parent columns is fine
    (readers NULL-fill old/new files via mergeSchema), but RETYPING an
    existing column raises :class:`SchemaEvolutionError` — a silent type
    fork would break every downstream mergeSchema read.  ``replace`` (an
    overwrite/restore, which references none of the parent's files) adopts
    the batch schema wholesale."""
    if batch_schema is None:
        return parent_schema
    if replace or not parent_schema:
        return batch_schema
    ptypes = {n: t for n, t in parent_schema}
    # a batch NARROWER than the table type is fine (r7 widening: the read
    # schema upcasts the file's physical type); any other change forks
    conflicts = [
        (n, ptypes[n], t)
        for n, t in batch_schema
        if n in ptypes and ptypes[n] != t and (t, ptypes[n]) not in _WIDENS
    ]
    if conflicts:
        detail = ", ".join(f"{n}: {old} -> {new}" for n, old, new in conflicts)
        raise SchemaEvolutionError(
            f"additive evolution only — column type change(s): {detail}"
        )
    return [list(c) for c in parent_schema] + [
        [n, t] for n, t in batch_schema if n not in ptypes
    ]


def snapshot_schema(table: str, version: int | None = None) -> list[tuple[str, str]]:
    """The ``(column, dtype)`` list version N committed with — time travel
    returns each version's OWN schema (a pre-evolution version never shows
    the later columns).  Answered from the manifest; legacy manifests
    written before schema tracking fall back to the file footers of that
    version's own file list."""
    m = read_manifest(table, version)
    if m.get("schema") is not None:
        return [tuple(c) for c in m["schema"]]
    # legacy manifest: derive from the version's own files (union, first
    # occurrence order) — arrow types rendered via a throwaway read would
    # need a session; keep it footer-only and map to Spark simpleString
    import pyarrow.parquet as pq

    seen: dict[str, str] = {}
    for f in m["files"]:
        sch = pq.read_schema(f["path"])
        for field in sch:
            seen.setdefault(field.name, str(field.type))
    return list(seen.items())


def _bump_current(table: str, version: int) -> None:
    """Advance the CURRENT pointer to ``version`` iff it is ahead — under a
    separate microsecond-scale pointer lock, so two winners publishing out
    of order can never regress the pointer."""
    with table_lock(_snap_path(table), wait_s=30.0, poll_s=0.01):
        if current_version(table) < version:
            cur = os.path.join(_snap_path(table), _CURRENT)
            tmp = os.path.join(_snap_path(table), f"{_CURRENT}.tmp-{uuid.uuid4()}")
            with open(tmp, "w") as fh:
                fh.write(str(version))
            os.rename(tmp, cur)


def _repair_current(table: str) -> int:
    """Roll CURRENT forward over any fully-reserved manifests it lags
    behind (a writer that crashed between reservation and pointer bump
    leaves one); returns the repaired current version.

    Multi-table txn staging (r8): a manifest carrying ``txn_marker`` is
    committed iff its marker file exists — roll over it like any crashed
    bump.  A marker-LESS staged manifest is an in-flight or dead txn:
    never roll over it; instead try to clean it under the table lock
    (the staging writer holds that lock through its decision point, so a
    free lock means the txn died — its slot is reclaimed so appends can
    proceed; a held lock means in-flight — stop here and let the caller's
    CAS spin)."""
    v = current_version(table)
    while True:
        mp = _manifest_path(table, v + 1)
        try:
            with open(mp) as fh:
                raw = json.load(fh)
        except FileNotFoundError:
            break
        except (OSError, json.JSONDecodeError):
            break  # being written/removed this instant: treat as absent
        marker = raw.get("txn_marker")
        if marker and not os.path.exists(marker):
            if _txn_clean_staged(table, v + 1, marker):
                continue  # slot freed (or resolved) — re-check it
            break  # txn in flight: do not roll past it
        if marker:
            # committed txn recovered past a crash: its COMMITS line is
            # the txn's phase-2 job, which may never have run — append it
            # here so as-of resolution sees the version (idempotent:
            # _commit_index keys by version, duplicates overwrite)
            with open(os.path.join(_snap_path(table), "COMMITS"), "a") as fh:
                fh.write(f"{v + 1} {raw.get('committed_at', 0.0)}\n")
        v += 1
    if v > current_version(table):
        _bump_current(table, v)
    return v


def _txn_clean_staged(table: str, version: int, marker: str) -> bool:
    """Remove a DEAD txn's staged manifest to free its version slot.
    Returns True when the slot was freed or the txn turned out committed
    (caller re-checks), False when the staging writer still holds the
    table lock (in flight).  The lock acquisition uses a zero wait —
    a crashed holder's lock is reclaimed by the TTL breaker on a later
    pass, exactly like any other crashed lock-holding transaction."""
    try:
        with table_lock(table, wait_s=0.0, poll_s=0.01):
            try:
                with open(_manifest_path(table, version)) as fh:
                    m = json.load(fh)
            except (OSError, json.JSONDecodeError):
                return True  # already cleaned by another repairer
            if m.get("txn_marker") != marker or os.path.exists(marker):
                return True  # committed meanwhile (or a different txn)
            os.remove(_manifest_path(table, version))
            return True
    except TableLockedError:
        return False


def _publish(
    table: str,
    files: list[dict],
    parent: int,
    op: str,
    *,
    batch_schema: list | None = None,
    replace: bool = False,
    add_eq: list | None = None,
    eq_deletes: list | None = None,
    last_seq_floor: int = 0,
    fields: list | None = None,
    retired: list | None = None,
    stamp_new: bool = True,
    last_field_id_floor: int = 0,
    specs: list | None = None,
    default_spec_id: int | None = None,
    sort_orders: list | None = None,
    default_sort_order_id: int | None = None,
    txn_marker: str | None = None,
    append_delta: list | None = None,
) -> int:
    """CAS-publish manifest v(parent+1): stage the full manifest to a temp
    file, then ``os.link`` it into place — atomic-exclusive, so exactly
    one writer wins each version (the object-store twin is a conditional
    PUT).  Raises :class:`CommitConflict` on a lost race.  On success the
    CURRENT pointer is bumped monotonically.

    ``append_delta`` (r9, O(delta) appends): the NEW entries of a PURE
    append — ``files`` is ignored and the parent's file list is never
    materialized.  Pure means: no replace, no equality deletes added or
    overridden, no registry override, normal stamping.  Under those
    preconditions every parent segment is reusable BY CONSTRUCTION (an
    append never drops or mutates an entry), prior equality deletes
    stay exactly as applicable as they were (new entries carry this
    commit's sequence, newer than every prior eq item), and every delta
    entry is new (fresh uuid commit dir) — so the per-entry equality
    scan, the parent-paths set, and the eq re-filter are all skipped.
    Commit cost: O(delta + segment COUNT), independent of table size
    (measured: the 10 → 38 ms per-commit growth across 400 → 10k files
    flattens — scripts/measure_metadata.py big).  A legacy inline-files
    parent falls back to the resolved slow path transparently.

    ``batch_schema`` (r5): the committing frame's ``_schema_of`` — evolved
    against the PARENT manifest's schema at this exact commit point, so a
    racing writer's incompatible evolution is caught on the loser's rebase
    retry (the winner's schema is the new parent).  None (delete/compact)
    carries the parent schema forward unchanged.

    Sequence numbers (r7, equality deletes): every manifest carries a
    monotone ``last_seq``; entries NEW to this commit (no ``seq`` key —
    callers never pre-stamp) are stamped with this commit's sequence AS
    COPIES, re-stamped fresh on every CAS retry so a lost race can never
    leak a stale ordering.  Entries inherited from the parent pass
    through byte-identical (pre-r7 entries stay unstamped and read as
    seq 0 — they predate every possible equality delete), which is what
    keeps segment reuse and ``_commit_rewrite`` entry-identity
    validation working unchanged.  ``last_seq_floor`` lets restore /
    branch publish carry a foreign counter forward so the global
    ordering stays monotone.

    Equality deletes ride the manifest: ``eq_deletes=None`` inherits the
    parent's list (reset by ``replace``), an explicit list overrides
    (restore / branch publish), and ``add_eq`` items are stamped with
    this commit's sequence — so a merge that appends its batch and adds
    an equality delete in ONE commit shadows only PRIOR rows (the
    Iceberg same-sequence rule).  Items no live entry admits
    (``_eq_applies``: sequence + key-bounds check) are garbage-collected
    at every commit, so a non-empty list always means "some live file
    may carry deleted keys"."""
    version = parent + 1
    os.makedirs(_snap_path(table), exist_ok=True)
    fast = append_delta is not None
    if fast and (
        replace
        or eq_deletes is not None
        or add_eq
        or fields is not None
        or not stamp_new
    ):
        raise ValueError("_publish: append_delta requires a pure append")
    if fast:
        parent_m = _load_manifest(table, parent) if parent > 0 else None
        if parent_m is None or "segments" not in parent_m:
            # empty or legacy inline-files parent: the slow path is
            # already O(delta) there — resolve and fall through
            parent_m = read_manifest(table, parent) if parent > 0 else None
            files = list((parent_m or {}).get("files") or []) + list(append_delta)
            fast = False
    else:
        parent_m = read_manifest(table, parent) if parent > 0 else None
    if fields is not None:
        # explicit registry (restore / branch / rename-drop-widen APIs):
        # the logical schema is derived from it, never re-evolved
        new_fields, new_schema = fields, [[f["name"], f["type"]] for f in fields]
        new_retired = list(retired or [])
    else:
        new_fields, new_schema, new_retired = _evolve_fields(
            parent_m, batch_schema, replace=replace
        )
    last_seq = (
        max((parent_m or {}).get("last_seq", parent), last_seq_floor) + 1
    )
    # stamp ONLY entries new to this commit: an unstamped entry already in
    # the parent is pre-r7 and must stay unstamped (seq 0 — older than any
    # equality delete); stamping it would both exempt it from earlier eq
    # deletes and churn its entry identity under segment reuse / OCC.
    # ``stamp_new=False`` (branch fork/publish/rebase, restore): EVERY
    # entry pre-exists somewhere — an unstamped one is legacy even though
    # this commit's parent (0, or another lineage) doesn't list it, and
    # stamping it would exempt it from the eq deletes travelling in the
    # same manifest (deleted rows would resurrect on the fork/restore)
    if fast:
        # pure append: every delta entry is new (stamp it), prior eq
        # items pass through verbatim (still admitted by exactly the
        # parent entries that admitted them; the delta's fresh sequence
        # exceeds every prior eq seq), parent segments reuse by name
        files = [
            f if "seq" in f else dict(f, seq=last_seq) for f in append_delta
        ]
        eq = [dict(it) for it in (parent_m or {}).get("eq_deletes") or []]
        seg_names, seg_meta = _derive_segments_append(table, parent_m, files)
    else:
        parent_paths = {f["path"] for f in (parent_m or {}).get("files") or []}
        files = [
            f
            if ("seq" in f or not stamp_new or f["path"] in parent_paths)
            else dict(f, seq=last_seq)
            for f in files
        ]
        if eq_deletes is not None:
            eq = [dict(it) for it in eq_deletes]
        elif replace:
            eq = []  # logical replace: no prior rows survive eq deletion
        else:
            eq = [dict(it) for it in (parent_m or {}).get("eq_deletes") or []]
        eq += [dict(it, seq=last_seq) for it in add_eq or []]
        eq = [it for it in eq if any(_eq_applies(f, it) for f in files)]
        # O(delta) WRITES even on the slow path: reuse the parent's
        # untouched segments by name, write only the new entries (plus
        # bounded geometric coalescing); seg_meta rides in the manifest
        # so planning prunes whole segments WITHOUT resolving them
        seg_names, seg_meta = _derive_segments(table, files, parent_m)
    manifest = {
        "version": version,
        "parent": parent,
        "op": op,
        "committed_at": time.time(),
        "last_seq": last_seq,
        "schema": new_schema,
        "segments": seg_names,
        "seg_meta": seg_meta,
    }
    if new_fields is not None:
        manifest["fields"] = new_fields
        # monotone max-ever field id (Iceberg last-column-id): a later
        # addition must never re-issue a DROPPED column's id
        manifest["last_field_id"] = max(
            _last_field_id(parent_m),
            last_field_id_floor,
            max((f["id"] for f in new_fields), default=0),
        )
    if new_retired:
        manifest["retired_phys"] = new_retired
    if eq:
        manifest["eq_deletes"] = eq
    # partition specs (r8, hidden partitioning): None inherits the parent's
    # spec history verbatim (the common case — every append/rewrite), an
    # explicit list overrides (set_partition_spec adds one; restore rolls
    # the history back with the data).  Spec history is append-only: old
    # files keep their spec_id forever, so a spec is never deleted.
    new_specs = (
        specs if specs is not None else (parent_m or {}).get("specs") or []
    )
    new_dsid = (
        default_spec_id
        if default_spec_id is not None
        else (parent_m or {}).get("default_spec_id", 0)
    )
    if new_specs:
        manifest["specs"] = new_specs
    if new_dsid:
        manifest["default_spec_id"] = new_dsid
    # sort orders (r8, same inheritance discipline as partition specs):
    # history is append-only, files stamp the order they were written
    # under, a declared order is advisory metadata the write path and
    # compaction consult — never a read-time correctness input
    new_orders = (
        sort_orders
        if sort_orders is not None
        else (parent_m or {}).get("sort_orders") or []
    )
    new_oid = (
        default_sort_order_id
        if default_sort_order_id is not None
        else (parent_m or {}).get("default_sort_order_id", 0)
    )
    if new_orders:
        manifest["sort_orders"] = new_orders
    if new_oid:
        manifest["default_sort_order_id"] = new_oid
    if txn_marker is not None:
        # multi-table txn staging (r8): the manifest is CAS-reserved but
        # NOT made visible — no COMMITS line, no pointer bump.  Readers
        # and _repair_current treat it as committed only once the marker
        # file exists (the txn's single atomic decision point).
        manifest["txn_marker"] = txn_marker
    mpath = _manifest_path(table, version)
    tmp = f"{mpath}.tmp-{uuid.uuid4()}"
    with open(tmp, "w") as fh:
        json.dump(manifest, fh)
    try:
        os.link(tmp, mpath)  # the atomic reservation: one winner per version
    except FileExistsError:
        raise CommitConflict(f"{table}: v{version} already committed") from None
    finally:
        os.remove(tmp)
    if txn_marker is not None:
        return version
    # append-only commit-time index: lets as-of resolution read one tiny
    # line per version instead of every manifest's full file list (single
    # O_APPEND write; order across writers is irrelevant — readers key on
    # the version column)
    with open(os.path.join(_snap_path(table), "COMMITS"), "a") as fh:
        fh.write(f"{version} {manifest['committed_at']}\n")
    _bump_current(table, version)
    return version


def _commit(
    table: str,
    files: list[dict],
    parent: int,
    op: str,
    *,
    batch_schema: list | None = None,
    replace: bool = False,
) -> int:
    """Commit point for LOCK-HOLDING transactions (since r5: only the MV
    refresh fold, operators/mv.py — snapshot rewrites moved to the
    lock-free ``_commit_rewrite``).

    The pre-publish ``assert_lock_held`` turns a mid-transaction lock
    theft (TTL breaker fired on a slow writer) into a loud abort BEFORE
    the atomic point; the publish itself is still the CAS, so an
    optimistic append that slipped past the lock surfaces as
    :class:`CommitConflict` (the caller retries its transaction on fresh
    state) instead of being silently overwritten."""
    from agf_data_ingestion_spark.operators.locking import assert_lock_held

    assert_lock_held(table)
    return _publish(
        table, files, parent, op, batch_schema=batch_schema, replace=replace
    )


def _retry_on_conflict(fn):
    """Re-run a whole rewrite transaction when its commit point raises a
    non-rebasable conflict (:class:`RewriteConflict`, or CAS-race budget
    exhaustion) — each retry re-reads the current manifest, so the rewrite
    is recomputed on fresh state."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        last: CommitConflict | None = None
        for _ in range(_OCC_MAX_RETRIES):
            try:
                return fn(*args, **kwargs)
            except CommitConflict as exc:
                last = exc
        raise last

    return wrapper


def _commit_rewrite(
    table: str,
    parent: int,
    touched_paths: set[str],
    new_files: list[dict],
    op: str,
    *,
    batch_schema: list | None = None,
    delta_safe=None,
) -> int:
    """Commit point for LOCK-FREE copy-on-write rewrites (merge / delete /
    compact) with FILE-LEVEL conflict detection — the r5 rung SCALE.md
    named: rewrites touching disjoint files commit concurrently instead of
    serializing on the table lock (Iceberg's validation model; the
    reference's own arbiter is row-conditional, ``agf_ingestion_lambda.py:
    226-236``, so file-granular validation is strictly finer than its
    whole-table Lambda serialization).

    The new manifest is (current files − ``touched_paths``) + ``new_files``.
    On a lost CAS the commit REBASES rather than recomputing, iff the
    interleaved commits are provably irrelevant to this rewrite:

    * every path in ``touched_paths`` is still referenced by the winner's
      manifest — otherwise a concurrent rewrite replaced bytes this
      transaction read, and its survivors frame is stale
      (:class:`RewriteConflict` → the caller's ``_retry_on_conflict``
      recomputes the whole transaction);
    * every touched ENTRY is byte-identical in the winner's manifest (r6)
      — a concurrent deletion-vector commit changes an entry without
      changing its path; rebasing over it would resurrect the DV-deleted
      rows (rewrites read with the OLD DV applied) or drop the winner's
      DV (a same-file DV commit built from the stale entry);
    * ``delta_safe(f)`` is True for every file the interleaved commits
      ADDED — the per-op guard proving the new rows cannot fall inside
      this rewrite's key range / predicate (stats-based, conservative:
      a stats-less delta file always forces a recompute).  ``None``
      means any addition is safe (compaction: later appends simply stay
      uncompacted until the next run);
    * the winner's EQUALITY-DELETE list is unchanged (r7) — an
      interleaved equality delete shadows rows this rewrite already
      read without it, and the rewrite's output files get a FRESH
      sequence the delete would no longer apply to; rebasing would
      therefore resurrect the deleted keys inside the rewritten files
      (:class:`RewriteConflict` → recompute sees the new eq context).
    """
    parent_m = read_manifest(table, parent) if parent > 0 else {}
    base = parent_m.get("files") or []
    base_eq = json.dumps(_eq_items(parent_m), sort_keys=True)
    new_paths = {f["path"] for f in new_files}
    for _ in range(_OCC_MAX_RETRIES):
        files = [f for f in base if f["path"] not in touched_paths] + new_files
        try:
            return _publish(
                table, files, parent, op, batch_schema=batch_schema
            )
        except CommitConflict:
            cur = _repair_current(table)
            cur_m = read_manifest(table, cur)
            if json.dumps(_eq_items(cur_m), sort_keys=True) != base_eq:
                raise RewriteConflict(
                    f"{table}: a concurrent equality delete landed under "
                    f"this {op} — recomputing"
                ) from None
            cur_files = cur_m["files"]
            cur_paths = {f["path"] for f in cur_files}
            missing = touched_paths - cur_paths
            if missing:
                raise RewriteConflict(
                    f"{table}: {len(missing)} file(s) this {op} rewrote were "
                    f"replaced by a concurrent commit — recomputing"
                ) from None
            base_by_path = {f["path"]: f for f in base}
            cur_by_path = {f["path"]: f for f in cur_files}
            if any(
                cur_by_path[p] != base_by_path.get(p) for p in touched_paths
            ):
                raise RewriteConflict(
                    f"{table}: a concurrent commit changed a touched entry "
                    f"(deletion vectors) under this {op} — recomputing"
                ) from None
            base_paths = {f["path"] for f in base}
            delta = [
                f
                for f in cur_files
                if f["path"] not in base_paths and f["path"] not in new_paths
            ]
            if delta_safe is not None and not all(delta_safe(f) for f in delta):
                raise RewriteConflict(
                    f"{table}: a concurrent commit added rows inside this "
                    f"{op}'s scope — recomputing"
                ) from None
            base, parent = cur_files, cur  # rebase onto the winner
    raise CommitConflict(
        f"{op} on {table} lost {_OCC_MAX_RETRIES} CAS races"
    )


def _json_stat_value(v):
    """Footer stat → JSON-storable value, or None when not representable.

    datetimes/dates become ISO strings (ISO order == chronological order,
    so string comparison stays a valid pruning comparison); NaN floats are
    rejected (a NaN bound proves nothing)."""
    import datetime as _dt

    if isinstance(v, bool) or isinstance(v, int) or isinstance(v, str):
        return v
    if isinstance(v, float):
        return None if v != v else v
    if isinstance(v, (_dt.datetime, _dt.date)):
        return v.isoformat(sep=" ") if isinstance(v, _dt.datetime) else v.isoformat()
    return None


def _file_stats(path: str) -> dict:
    """Per-file {col: [min, max]} from the parquet footer's row-group
    statistics — the data-skipping index Iceberg keeps in manifests and
    Delta in the transaction log.  Costs one footer read at commit time;
    saves opening the file at all when a predicate disproves the range.

    Only top-level columns with usable min/max in EVERY row group are
    recorded (a single stats-less row group makes the file unprunable for
    that column)."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    mins: dict = {}
    maxs: dict = {}
    dead: set = set()
    for rg in range(md.num_row_groups):
        row_group = md.row_group(rg)
        for ci in range(row_group.num_columns):
            col = row_group.column(ci)
            name = col.path_in_schema
            if "." in name or name in dead:  # nested leaves: skip
                continue
            st = col.statistics
            if st is None or not st.has_min_max:
                dead.add(name)
                continue
            lo, hi = _json_stat_value(st.min), _json_stat_value(st.max)
            if lo is None or hi is None:
                dead.add(name)
                continue
            mins[name] = lo if name not in mins else min(mins[name], lo)
            maxs[name] = hi if name not in maxs else max(maxs[name], hi)
    return {c: [mins[c], maxs[c]] for c in mins if c not in dead}


def _file_nulls(path: str) -> dict:
    """Per-file {col: null_count} from the parquet footer — recorded only
    for top-level columns whose EVERY row group reports a null count
    (one unknown makes the file unprunable for null predicates).  This is
    the third data-skipping index after min/max and blooms: ``IS NULL``
    prunes files with zero nulls, ``IS NOT NULL`` prunes all-null files
    (the backfilled-column scan shape)."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    nulls: dict = {}
    dead: set = set()
    for rg in range(md.num_row_groups):
        row_group = md.row_group(rg)
        for ci in range(row_group.num_columns):
            col = row_group.column(ci)
            name = col.path_in_schema
            if "." in name or name in dead:
                continue
            st = col.statistics
            if st is None or st.null_count is None:
                dead.add(name)
                continue
            nulls[name] = nulls.get(name, 0) + st.null_count
    return {c: n for c, n in nulls.items() if c not in dead}


_BLOOM_BITS = 8192  # MINIMUM size; sized up to ~8 bits/value (fp ≈ 2%)
_BLOOM_MAX_BITS = 1 << 23  # 1 MiB cap per (file, column)


def _bloom_canon(value):
    """Canonical probe/build rendering: int-valued floats collapse to int
    so ``5.0`` and ``5`` hash identically on both sides (bools stay
    distinct — they are a different column type)."""
    if (
        isinstance(value, float)
        and not isinstance(value, bool)
        and value.is_integer()
    ):
        return int(value)
    return value


def _bloom_positions(value, bits: int = _BLOOM_BITS) -> list[int]:
    """The k=4 bit positions of ``value`` — md5-derived so the SAME
    integers come out of any engine/runtime that renders the value the
    same way.  Values are rendered with ``str()`` after
    :func:`_bloom_canon`: stable for ints and strings (the supported
    bloom column types)."""
    import hashlib

    digest = hashlib.md5(str(_bloom_canon(value)).encode()).hexdigest()
    return [int(digest[i * 8 : i * 8 + 8], 16) % bits for i in range(4)]


def _bloom_of(path: str, col: str, bits: int = _BLOOM_BITS) -> str | None:
    """Hex-encoded bloom filter over a file's column values (one footer +
    column read at commit time); None when the column is absent."""
    import pyarrow.parquet as pq

    try:
        tbl = pq.read_table(path, columns=[col])
    except Exception:
        return None
    values = [v for v in tbl.column(col).to_pylist() if v is not None]
    # size to ~8 bits/value (k=4 → fp ≈ 2%), floor at the default, cap at
    # 1 MiB — a fixed-size bloom saturates on big files and stops pruning
    while bits < _BLOOM_MAX_BITS and bits < 8 * len(values):
        bits *= 2
    arr = bytearray(bits // 8)
    for v in values:
        for pos in _bloom_positions(v, bits):
            arr[pos // 8] |= 1 << (pos % 8)
    return bytes(arr).hex()


@functools.lru_cache(maxsize=64)
def _bloom_bytes_cached(hx: str) -> bytes | None:
    """Decoded bloom bitmap, memoized on the hex STRING OBJECT (r12):
    an IN-list probe checks K values against F files, and decoding the
    up-to-1 MiB hex per (file, value) pair made driver-side pruning
    O(K x F x bloom_bytes).  The hex strings come out of the process-wide
    ``_SEG_CACHE`` (entry dicts are shallow copies sharing the str
    objects), so the lru key hashes once per string and hits by
    identity.

    Sizing (r13, ADVICE r12): the prune loop is FILE-outer — within one
    probe each file's bloom is decoded once regardless of cache size, so
    the cache only has to span files across CONSECUTIVE probes of the
    same store version.  64 entries covers that working set while
    bounding worst-case driver pinning at 64 × the 1 MiB bloom cap
    (vs ~512 MiB at the old maxsize=512); typical store blooms are KBs."""
    try:
        return bytes.fromhex(hx)
    except ValueError:
        return None


@functools.lru_cache(maxsize=8192)
def _probe_positions(value, bits: int) -> tuple[int, ...]:
    """Probe-side twin of :func:`_bloom_positions` (r12): an IN-list
    checks the same value against every candidate file, and the md5 was
    recomputed per (file, value).  Build side (`_bloom_of`) stays
    uncached — it streams every ROW value exactly once and would thrash
    the cache."""
    return tuple(_bloom_positions(value, bits))


def _bloom_excludes(f: dict, col: str, value) -> bool:
    """True iff the file's bloom filter PROVES ``col == value`` matches no
    row (absent/odd blooms prove nothing).

    A probe whose TYPE differs from the stored column's (``'5'`` vs int 5)
    would hash differently and falsely prune every file, so the bloom is
    only consulted when the canonicalized probe type matches the type of
    the file's recorded stats bounds — otherwise fall through to the
    conservative min/max path (r4 ADVICE)."""
    hx = f.get("bloom", {}).get(col)
    if not hx:
        return False
    probe = _bloom_canon(value)
    bounds = f.get("stats", {}).get(col)
    if bounds:
        ref = _bloom_canon(bounds[0])
        if type(probe) is not type(ref):
            return False  # type-mismatched probe proves nothing
    elif not isinstance(probe, (int, str)) or isinstance(probe, bool):
        # no stats to confirm the stored type: only trust the documented
        # bloom column types
        return False
    arr = _bloom_bytes_cached(hx)
    if arr is None:
        return False
    bits = len(arr) * 8
    return any(
        not (arr[pos // 8] >> (pos % 8)) & 1
        for pos in _probe_positions(value, bits)
    )


def _write_data_files(
    df: DataFrame,
    table: str,
    *,
    bloom_cols: list[str] | None = None,
    fields: list | None = None,
    partition_by: list[str] | None = None,
    spec_id: int = 0,
    partition_coerce: dict | None = None,
) -> list[dict]:
    """Write ``df`` as immutable parquet files under a fresh commit dir,
    recording per-file column min/max stats (and, for ``bloom_cols``,
    a 1 KiB membership bloom per column) in the manifest entry.

    ``fields`` (r7): the table's field registry — logical columns whose
    physical name differs (post-rename) are written under their PHYSICAL
    name, so every data file of a field shares one physical column
    regardless of rename history; stats/blooms are keyed physical (the
    footer domain).  Identity registries skip the projection.

    ``partition_by`` (r8): derived ``_p_*`` transform columns the write
    hive-partitions on — Spark drops them from the data files (the
    SOURCE columns always stay in the data, even for identity transforms,
    because the writer partitions on a derived copy), and each file's
    partition tuple is parsed back off its directory path and recorded in
    the entry together with ``spec_id``."""
    from urllib.parse import unquote

    from pyspark.sql import functions as F

    p = _phys_of(fields)
    if p:
        df = df.select(
            *[F.col(c).alias(p.get(c, c)) for c in df.columns]
        )
        bloom_cols = [p.get(c, c) for c in bloom_cols or []]
    commit_dir = os.path.join(table, "data", uuid.uuid4().hex)
    writer = df.write.mode("error")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(commit_dir)
    import pyarrow.parquet as pq

    paths = sorted(
        os.path.join(root, name)
        for root, _dirs, names in os.walk(commit_dir)
        for name in names
        if name.endswith(".parquet")
    )
    files = []
    for fp in paths:
        rows = pq.ParquetFile(fp).metadata.num_rows
        if rows == 0:
            # an empty part (partition count > row count) carries no
            # stats — referencing it would poison metadata MIN/MAX
            # and add a no-op scan task to every read
            os.remove(fp)
            continue
        entry = {
            "path": fp,
            "bytes": os.path.getsize(fp),
            "rows": rows,
            "stats": _file_stats(fp),
        }
        nl = _file_nulls(fp)
        if nl:
            entry["nulls"] = nl
        if partition_by:
            part = {}
            for comp in os.path.relpath(fp, commit_dir).split(os.sep)[:-1]:
                k, _, raw = comp.partition("=")
                pname = k[3:] if k.startswith("_p_") else k
                if raw == "__HIVE_DEFAULT_PARTITION__":
                    part[pname] = None  # NULL partition: never pruned
                else:
                    part[pname] = (partition_coerce or {}).get(pname, str)(
                        unquote(raw)
                    )
            entry["partition"] = part
            entry["spec_id"] = spec_id
        blooms = {
            c: b
            for c in (bloom_cols or [])
            if (b := _bloom_of(fp, c)) is not None
        }
        if blooms:
            entry["bloom"] = blooms
        files.append(entry)
    return files


def _common_bloom_cols(entries: list[dict]) -> list[str]:
    """Bloom columns present on EVERY entry — rewrites recompute those for
    their output files so data skipping survives maintenance."""
    if not entries:
        return []
    cols = set(entries[0].get("bloom", {}))
    for f in entries[1:]:
        cols &= set(f.get("bloom", {}))
    return sorted(cols)


def _statically_empty(df: DataFrame) -> bool:
    """True iff the optimizer PROVES the frame has zero rows
    (``maxRows == Some(0)`` on the optimized plan — ``empty_frame``
    below constructs such frames).  Driver-side inspection only, so a
    lazy corpus frame can never trigger a job here; note a Python
    ``createDataFrame([], schema)`` plans as a LogicalRDD whose row
    count is UNKNOWABLE statically — use ``empty_frame`` instead for
    schema-carrying empty appends."""
    try:
        mr = df._jdf.queryExecution().optimizedPlan().maxRows()
        return (not mr.isEmpty()) and int(mr.get()) == 0
    except Exception:  # noqa: BLE001 — conservative: treat as non-empty
        return False


def empty_frame(spark: SparkSession, ddl: str) -> DataFrame:
    """A schema-carrying frame the optimizer can PROVE empty (r11 —
    ``spark.range(0)`` projected to the DDL schema; maxRows folds to 0).
    Use for the per-txn empty appends (curate_incremental's policy/bench
    rows): ``_stage_write`` then skips the Spark write job entirely,
    saving one job per empty table per trigger."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import _parse_datatype_string

    schema = _parse_datatype_string(ddl)
    return spark.range(0).select(
        *[F.lit(None).cast(f.dataType).alias(f.name) for f in schema.fields]
    )


def _stage_write(
    df: DataFrame,
    table: str,
    mode: str,
    *,
    cluster_by: list[str] | None = None,
    cluster_files: int | None = None,
    bloom_cols: list[str] | None = None,
) -> tuple[list[dict], list]:
    """The lock-free front half of ``snapshot_write`` — validate evolution
    against the current manifest, apply the default partition spec's
    transform columns, cluster, and write the data files (unreferenced
    until a manifest lists them).  Returns (entries, batch_schema) for
    the caller's own commit protocol (CAS loop or multi-table txn)."""
    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode must be append|overwrite, got {mode!r}")
    batch_schema = _schema_of(df)
    empty_local = _statically_empty(df)
    flds = None
    # raw manifest: staging consults schema/fields/specs/sort-order only —
    # resolving the full file list here was O(table) per append (r9)
    m0 = _load_manifest(table)
    if mode == "append":
        # fail BEFORE the file write on a type-changing batch (additive
        # evolution only); re-validated at the CAS point against whatever
        # parent actually wins
        _evolve_fields(m0, batch_schema)  # incl. reserved-name refusal
        flds = _fields_of(m0)  # renamed columns write under their phys
    # hidden partitioning (r8): under a non-empty default spec the batch
    # gains derived _p_* transform columns and the write hive-partitions
    # on them — each data file then covers exactly one partition tuple,
    # recorded in its manifest entry for plan-time pruning.  The batch is
    # hash-distributed on the transform columns first (unless the caller
    # asked for range clustering) so one partition value doesn't fan out
    # into a file per input task; a skewed partition column is the
    # caller's spec choice, same as any partitioned table format.
    df, spec_kwargs = _apply_default_spec(df, m0, strict=True)
    # declared sort order (r8): applied when the caller didn't cluster
    # explicitly — under a partition spec rows sort WITHIN each partition
    # dir's files; otherwise the batch range-clusters on the order itself
    sort_plan, sort_oid = ([], 0) if cluster_by else _sort_plan_of(m0)
    if sort_plan:
        missing = [
            c
            for it in sort_plan
            for c in it["cols"]
            if c not in df.columns
        ]
        if missing:
            raise SchemaEvolutionError(
                f"batch lacks sort-order column(s) {missing} — "
                f"set sort order [] first to write without them"
            )
    # Sorts under a partition spec MUST lead with the partition columns:
    # the partitionBy writer's required ordering is the partition columns,
    # and a child ordering that doesn't already satisfy that prefix gets
    # RE-SORTED per task — silently destroying the secondary sort keys
    # (empirically: files stamped sorted whose stats spanned the whole
    # domain, which maintenance then never converges).
    pcols = spec_kwargs["partition_by"] if spec_kwargs else []
    if spec_kwargs and not cluster_by:
        df = df.repartition(*pcols)
        if sort_plan:
            df, skeys, tmp = _apply_sort_keys(df, sort_plan)
            df = df.sortWithinPartitions(*pcols, *skeys).drop(*tmp)
    elif sort_plan:
        df, skeys, tmp = _apply_sort_keys(df, sort_plan)
        df = (
            df.repartitionByRange(*skeys)
            .sortWithinPartitions(*skeys)
            .drop(*tmp)
        )
    if cluster_by:
        # explicit file-count target when given: AQE otherwise coalesces a
        # small batch into one partition and the layout degenerates to a
        # single whole-domain file
        if cluster_files:
            df = df.repartitionByRange(cluster_files, *cluster_by)
        else:
            df = df.repartitionByRange(*cluster_by)
        df = df.sortWithinPartitions(*pcols, *cluster_by)
    if empty_local:
        # r11 (curate_stream latency rung): a provably 0-row literal
        # batch — the schema-carrying policy/bench appends every
        # incremental txn makes — skips the Spark write job entirely.
        # ``_write_data_files`` drops 0-row part files anyway, so the
        # manifest entries are identical ([]); every schema/spec/sort
        # validation above still ran on the empty batch.
        return [], batch_schema
    new_files = _write_data_files(
        df, table, bloom_cols=bloom_cols, fields=flds, **spec_kwargs
    )
    if sort_plan:
        for f in new_files:
            f["sort_order_id"] = sort_oid
    return new_files, batch_schema


def snapshot_write(
    df: DataFrame,
    table: str,
    *,
    mode: str = "append",
    cluster_by: list[str] | None = None,
    cluster_files: int | None = None,
    bloom_cols: list[str] | None = None,
    op: str | None = None,
) -> int:
    """Commit ``df`` as a new snapshot.  ``mode='append'`` keeps the parent
    file list; ``'overwrite'`` logically replaces it (old files stay on
    disk for time travel until expired).  Returns the committed version.

    ``cluster_by`` (r4): range-repartition + sort the batch on the given
    columns before writing, so each data file covers a TIGHT value range
    and the per-file min/max stats recorded in the manifest actually
    prune — the clustered-write half of data skipping (an unclustered
    write leaves every file spanning the whole domain, and ``plan_files``
    can prove nothing).  This is the WRITE-side lever for the dominant
    time/tenant access patterns; pair with ``functions/zorder.py`` keys
    for multi-dimensional clustering.  Result CONTENT is independent of
    the clustering (only the file layout changes; the single write action
    avoids the repartitionByRange multi-action trap).

    ``bloom_cols`` (r4): record a 1 KiB membership bloom per (file,
    column) in the manifest — ``plan_files`` then DISPROVES equality
    predicates inside wide stat ranges (point lookups over unclustered
    data: ~4% false-keep per file at ~1k distinct values, tunable via
    ``_BLOOM_BITS``).  Int/string columns (values are rendered with
    ``str()`` at build and probe time).

    Optimistic (r4): data files are written with no lock held (they are
    unreferenced until a manifest lists them), then the CAS commit loop
    reserves parent+1 — on conflict an append simply rebases onto the
    winner's file list and retries (append commutes with every other
    commit); an overwrite is last-writer-wins by definition.

    ``op`` (r5): optional commit-operation label recorded in the manifest
    in place of the bare mode string — idempotent writers (the streaming
    ANN maintainer) encode their replay bookmark in it, the mv pattern
    (operators/mv.py: the bookmark and the commit move in ONE atomic
    manifest swap, so exactly-once needs no side table)."""
    new_files, batch_schema = _stage_write(
        df,
        table,
        mode,
        cluster_by=cluster_by,
        cluster_files=cluster_files,
        bloom_cols=bloom_cols,
    )
    parent = current_version(table)
    for _ in range(_OCC_MAX_RETRIES):
        try:
            if mode == "append":
                # O(delta) commit (r9): the parent file list is never
                # materialized — segments reuse by name, the delta is the
                # only new segment (see _publish append_delta)
                return _publish(
                    table,
                    [],
                    parent,
                    op or mode,
                    batch_schema=batch_schema,
                    append_delta=new_files,
                )
            return _publish(
                table,
                new_files,
                parent,
                op or mode,
                batch_schema=batch_schema,
                replace=True,
            )
        except CommitConflict:
            parent = _repair_current(table)
    raise CommitConflict(
        f"snapshot_write({mode}) on {table} lost {_OCC_MAX_RETRIES} CAS races"
    )


def snapshot_multi_write(
    writes: list[tuple[DataFrame, str]],
    *,
    mode: str = "append",
    op: str | None = None,
    cluster_by: dict[str, list] | None = None,
    bloom_cols: dict[str, list] | None = None,
    cluster_files: dict[str, int] | None = None,
) -> dict[str, int]:
    """Commit several tables' batches ALL-OR-NOTHING (r8, VERDICT r7 ask
    #4) — the training-pipeline publish step that lands corpus + ANN index
    + datacard as one visible event.  Returns {table: committed version}.

    Two-phase over the existing primitives:

    1. **Stage** (lock-free): each batch's data files are written
       unreferenced, exactly like ``snapshot_write``'s front half.
    2. **Prepare** (ordered lock set — tables locked in sorted-path order,
       so concurrent multi-txns cannot deadlock): each table's manifest is
       CAS-reserved at parent+1 carrying ``txn_marker`` — reserved but
       INVISIBLE (no pointer bump, no COMMITS line; ``_repair_current``
       refuses to roll over it while the marker is absent).  A lock-free
       single-table append that slips in between repair and reservation
       costs a ``CommitConflict`` → every staged manifest is deleted and
       the whole prepare retries on fresh parents (appends commute, so
       the retry converges like any OCC rebase).
    3. **Decide**: ``assert_lock_held`` on every table (a TTL lock theft
       aborts BEFORE the atomic point, the ``_commit`` discipline), then
       one ``rename`` creates the marker file — THE commit point.
    4. **Publish**: bump every table's pointer (+ COMMITS line).  A crash
       anywhere after the marker is repaired forward by any reader's
       ``_repair_current``; a crash before it leaves only marker-less
       staged manifests, which repair deletes once the dead txn's table
       lock is free (TTL) — so readers can NEVER observe a torn subset.
    """
    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode must be append|overwrite, got {mode!r}")
    if not writes:
        return {}
    tables = [tbl for _df, tbl in writes]
    if len({_scan_path(tbl) for tbl in tables}) != len(tables):
        raise ValueError("snapshot_multi_write: duplicate table in writes")
    order = sorted(range(len(writes)), key=lambda i: _scan_path(tables[i]))

    def _stage_one(i: int):
        return (
            tables[i],
            *_stage_write(
                writes[i][0],
                tables[i],
                mode,
                cluster_by=(cluster_by or {}).get(tables[i]),
                bloom_cols=(bloom_cols or {}).get(tables[i]),
                cluster_files=(cluster_files or {}).get(tables[i]),
            ),
        )

    # r12 (VERDICT r11 ask #2): the N staged writes are INDEPENDENT until
    # the marker rename — each stages under its own uuid commit dir on a
    # different table, and Spark job submission is thread-safe per
    # session — so stage them from a thread pool instead of serially
    # (publish was N x fixed job cost at any corpus size; SCALE.md r11
    # envelope).  ex.map preserves ``order``'s sorted-path sequence for
    # the deadlock-free lock set below; the CAS/marker protocol after
    # staging stays strictly serial.  Pool bounded at 8: each stage is
    # its own Spark job and beyond scheduler parallelism extra threads
    # only queue.
    if len(writes) > 1:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=min(8, len(writes))) as ex:
            staged = list(ex.map(_stage_one, order))
    else:
        staged = [_stage_one(i) for i in order]
    txn_id = uuid.uuid4().hex
    marker = os.path.join(
        _scan_path(_snap_path(staged[0][0])), "txns", f"{txn_id}.committed"
    )
    for _ in range(_OCC_MAX_RETRIES):
        reserved: list[tuple[str, int]] = []
        with contextlib.ExitStack() as stack:
            for tbl, _files, _schema in staged:
                stack.enter_context(table_lock(tbl))
            try:
                for tbl, files, schema in staged:
                    parent = _repair_current(tbl)
                    # a marker-less staged manifest blocking parent+1 is a
                    # DEAD txn (we hold this table's lock, and a live txn
                    # would be holding it): free the slot directly
                    while True:
                        mp = _manifest_path(tbl, parent + 1)
                        try:
                            with open(mp) as fh:
                                stale = json.load(fh)
                        except FileNotFoundError:
                            break
                        if stale.get("txn_marker") and not os.path.exists(
                            stale["txn_marker"]
                        ):
                            os.remove(mp)
                        else:
                            break  # committed meanwhile: repair next loop
                    if mode == "append":
                        v = _publish(
                            tbl,
                            [],
                            parent,
                            op or f"multi_write:{txn_id}",
                            batch_schema=schema,
                            txn_marker=marker,
                            append_delta=files,
                        )
                    else:
                        v = _publish(
                            tbl,
                            files,
                            parent,
                            op or f"multi_write:{txn_id}",
                            batch_schema=schema,
                            replace=True,
                            txn_marker=marker,
                        )
                    reserved.append((tbl, v))
                from agf_data_ingestion_spark.operators.locking import (
                    assert_lock_held,
                )

                for tbl, _v in reserved:
                    assert_lock_held(tbl)
                os.makedirs(os.path.dirname(marker), exist_ok=True)
                tmpm = f"{marker}.tmp-{uuid.uuid4()}"
                with open(tmpm, "w") as fh:
                    fh.write(txn_id)
                os.rename(tmpm, marker)  # THE atomic commit point
            except CommitConflict:
                for tbl, v in reserved:
                    try:
                        os.remove(_manifest_path(tbl, v))
                    except FileNotFoundError:
                        pass
                continue  # whole-txn retry on fresh parents
            except BaseException:
                for tbl, v in reserved:
                    try:
                        os.remove(_manifest_path(tbl, v))
                    except FileNotFoundError:
                        pass
                raise
            # phase 2: repair IS the publish (pointer bump + COMMITS line
            # for committed-marker manifests) — the same path a crash
            # recovery takes, so both are one tested code path
            for tbl, v in reserved:
                _repair_current(tbl)
            return dict(reserved)
    raise CommitConflict(
        f"snapshot_multi_write lost {_OCC_MAX_RETRIES} prepare races"
    )


def snapshot_txn_id(table: str, version: int | None = None) -> str | None:
    """The multi-table txn id a version committed under (None for a
    single-table commit) — recovered from the ``txn_marker`` path the
    manifest retains after publish."""
    mk = _load_manifest(table, version).get("txn_marker")
    return os.path.basename(mk).rsplit(".", 1)[0] if mk else None


def snapshot_txn_versions(
    tables: list[str], txn_id: str | None = None
) -> tuple[dict[str, int], str]:
    """({table: version}, txn_id) for an atomic multi-table publish —
    the READ side of ``snapshot_multi_write``: a consumer of corpus +
    index + datacard (or postings + stats) pins every table to the SAME
    publish event, immune to later single-table commits interleaving.

    ``txn_id=None`` resolves the NEWEST txn common to all ``tables``
    (newest by its version on the first table).  Versions whose
    manifests expired are skipped — an expired txn is simply no longer
    addressable, like any expired snapshot."""
    if not tables:
        raise ValueError("snapshot_txn_versions: no tables")

    def tx_of(tbl: str, stop_at: str | None) -> dict[str, int]:
        """txn id → newest version per table; with ``stop_at`` the
        descending scan returns at the FIRST match (the pinned-read fast
        path — O(versions since the txn), not O(retained history)).
        ``_repair_current`` first: a txn whose marker landed but whose
        phase-2 publish crashed on this table IS committed — any
        reader's repair rolls the pointer forward, and scanning a stale
        pointer would mis-report the txn as never-committed here."""
        out: dict[str, int] = {}
        for v in range(_repair_current(tbl), 0, -1):
            try:
                m = _load_manifest(tbl, v)
            except NoSuchVersionError:
                continue  # expired
            mk = m.get("txn_marker")
            if not mk:
                continue
            tid = os.path.basename(mk).rsplit(".", 1)[0]
            out.setdefault(tid, v)  # first (newest) version wins
            if stop_at is not None and tid == stop_at:
                return out
        return out

    maps = {t: tx_of(t, txn_id) for t in tables}
    if txn_id is None:
        common = set(maps[tables[0]])
        for t in tables[1:]:
            common &= set(maps[t])
        if not common:
            raise ValueError(
                f"no multi-table txn spans all of {sorted(tables)}"
            )
        txn_id = max(common, key=lambda tid: maps[tables[0]][tid])
    missing = [t for t in tables if txn_id not in maps[t]]
    if missing:
        raise ValueError(f"txn {txn_id!r} never committed on {missing}")
    return {t: maps[t][txn_id] for t in tables}, txn_id


def snapshot_read_txn(
    spark: SparkSession, tables: list[str], txn_id: str | None = None
) -> dict[str, DataFrame]:
    """Each table AS OF the same multi-table publish (see
    :func:`snapshot_txn_versions`)."""
    versions, _tid = snapshot_txn_versions(tables, txn_id)
    return {
        t: snapshot_read(spark, t, version=v) for t, v in versions.items()
    }


def snapshot_commit_files(
    table: str,
    src_dir: str,
    *,
    schema_from: DataFrame,
    mode: str = "append",
    op: str | None = None,
) -> int:
    """Commit PRE-WRITTEN parquet files as a snapshot (r6): each file in
    ``src_dir`` is hardlinked into a fresh commit dir PRESERVING its
    basename, then committed through the usual optimistic CAS loop.

    This is the bridge between Spark's catalog-only bucketed writer and
    the snapshot format: a bucketed write encodes the bucket id in the
    FILE NAME (``part-*_00012.c000``), which the bucketed scan keys on —
    so ingesting the files by link (no rewrite, no rename) preserves the
    bucket layout while the manifest adds OCC / time travel / expiry on
    top (sources/bucketed.py:write_bucketed_snapshot).

    ``schema_from`` supplies the committed Spark schema (the frame the
    files were written from) — additive evolution is validated exactly
    like ``snapshot_write``."""
    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode must be append|overwrite, got {mode!r}")
    import pyarrow.parquet as pq

    batch_schema = _schema_of(schema_from)
    if mode == "append":
        # raw manifest: validation needs schema/fields only (r9 — the
        # resolved file list made every hardlink-ingest commit O(table))
        m0 = _load_manifest(table)
        _evolve_schema(m0.get("schema"), batch_schema)
        if not _is_identity(_fields_of(m0)):
            raise SchemaEvolutionError(
                "snapshot_commit_files: pre-written files cannot follow a "
                "renamed registry — rewrite through snapshot_write"
            )
    commit_dir = os.path.join(table, "data", uuid.uuid4().hex)
    os.makedirs(commit_dir)
    new_files = []
    for name in sorted(os.listdir(src_dir)):
        if not name.endswith(".parquet"):
            continue
        p = os.path.join(commit_dir, name)
        os.link(os.path.join(src_dir, name), p)
        new_files.append(
            {
                "path": p,
                "bytes": os.path.getsize(p),
                "rows": pq.ParquetFile(p).metadata.num_rows,
                "stats": _file_stats(p),
                **({"nulls": nl} if (nl := _file_nulls(p)) else {}),
            }
        )
    parent = current_version(table)
    for _ in range(_OCC_MAX_RETRIES):
        try:
            if mode == "append":
                return _publish(
                    table,
                    [],
                    parent,
                    op or mode,
                    batch_schema=batch_schema,
                    append_delta=new_files,
                )
            return _publish(
                table,
                new_files,
                parent,
                op or mode,
                batch_schema=batch_schema,
                replace=True,
            )
        except CommitConflict:
            parent = _repair_current(table)
    raise CommitConflict(
        f"snapshot_commit_files({mode}) on {table} lost {_OCC_MAX_RETRIES} CAS races"
    )


#: predicate op → (file survives pruning given its [lo, hi] stat range)
_PRUNE_OPS = {
    ">=": lambda lo, hi, v: hi >= v,
    ">": lambda lo, hi, v: hi > v,
    "<=": lambda lo, hi, v: lo <= v,
    "<": lambda lo, hi, v: lo < v,
    "==": lambda lo, hi, v: lo <= v <= hi,
    "=": lambda lo, hi, v: lo <= v <= hi,
}


def plan_files(
    table: str,
    *,
    version: int | None = None,
    where: list[tuple] | None = None,
) -> list[dict]:
    """The manifest file entries a read of ``where`` must open: every file
    whose recorded [min, max] could satisfy ALL predicate triples
    ``(col, op, value)``; op ∈ {==, <, <=, >, >=}.  Files with no stats
    for a predicate column are conservatively kept.  This is the
    data-skipping step — at 100 TB a pruned plan opens the handful of
    files whose ranges overlap the predicate instead of the whole table
    (and is what makes Z-order clustering pay off at the reader).
    Predicate columns are LOGICAL; per-file stats are keyed by the
    physical names (r7 renames), so the triples are translated through
    the version's field registry before pruning.  Files written under a
    partition spec (r8) are additionally pruned through their partition
    tuple — each file under its OWN spec, keyed by source field id, so a
    table whose spec evolved prunes both layouts in one plan.

    Manifest-list pruning (r8): the manifest carries aggregate column
    bounds PER SEGMENT (``seg_meta``), so a selective predicate resolves
    only the segments whose bounds admit it — planning metadata I/O is
    O(relevant segments), not O(table files).  Segments without recorded
    meta (pre-meta manifests) are conservatively resolved; the per-file
    check below stays exact either way."""
    m = _load_manifest(table, version)
    flds = _fields_of(m)
    pwhere = _to_phys(where, flds)
    if "files" in m:  # legacy inline manifest
        cand = m["files"]
    else:
        seg_meta = m.get("seg_meta") or {}
        cand = []
        for s in m.get("segments") or []:
            sm = seg_meta.get(s)
            if (
                pwhere
                and sm is not None
                and not _file_admits(
                    {
                        "stats": sm["stats"],
                        "nulls": sm.get("nulls", {}),
                        **({"rows": sm["rows"]} if "rows" in sm else {}),
                    },
                    pwhere,
                )
            ):
                continue  # whole segment disproved — never resolved
            cand.extend(dict(e) for e in _read_segment(table, s))
    specs = {s["spec_id"]: s for s in m.get("specs") or []}
    fid_of = {f["name"]: f["id"] for f in flds or []}
    return [
        f
        for f in cand
        if _file_admits(f, pwhere)
        and _partition_admits(f, where, specs, fid_of)
    ]


def _file_admits(f: dict, where: list[tuple] | None) -> bool:
    """True when file entry ``f``'s recorded stats CANNOT disprove the
    ANDed ``(col, op, value)`` predicate — i.e. the file must be opened.
    Shared by ``plan_files`` (reader skipping), ``snapshot_delete``
    (which files to rewrite), and the rewrite commit validation (could an
    interleaved commit's new file contain predicate-matching rows)."""
    for col, op, value in where or []:
        if op in ("is_null", "not_null"):
            # null-count pruning (r8): recorded per file from the footer;
            # a column ABSENT from the counts (stats-less, or added after
            # this file was written — where every row reads NULL) keeps
            # the file conservatively
            n = f.get("nulls", {}).get(col)
            rows = f.get("rows")
            if n is None:
                continue
            if op == "is_null" and n == 0:
                return False
            if op == "not_null" and rows is not None and n == rows:
                return False
            continue
        if op == "in":
            # IN-list pruning (r8, the takedown/point-lookup shape): the
            # file survives iff AT LEAST ONE value survives both the
            # range and the bloom — each check per value is exactly the
            # equality rule below
            vals = list(value)
            if not vals:
                return False  # empty IN list matches nothing
            any_admits = False
            for v in vals:
                if _bloom_excludes(f, col, v):
                    continue
                if col in f.get("stats", {}):
                    lo, hi = f["stats"][col]
                    try:
                        if not _PRUNE_OPS["=="](lo, hi, v):
                            continue
                    except TypeError:
                        pass  # incomparable → this value might match
                any_admits = True
                break
            if not any_admits:
                return False
            continue
        if op not in _PRUNE_OPS:
            raise ValueError(f"unsupported prune op {op!r}")
        # a bloom can disprove equality even when the [min, max] range
        # admits it (point lookups inside a wide range)
        if op in ("==", "=") and _bloom_excludes(f, col, value):
            return False
        if col not in f.get("stats", {}):
            continue  # no stats → cannot prune on this triple
        lo, hi = f["stats"][col]
        try:
            if not _PRUNE_OPS[op](lo, hi, value):
                return False
        except TypeError:
            # predicate value not comparable with the stored stat type
            # (e.g. numeric vs ISO string) — pruning proves nothing,
            # keep the file; the residual filter stays exact
            continue
    return True


# -- partition-spec evolution / hidden partitioning (r8) ----------------------
# The reference's lake layout IS hand-rolled hidden partitioning —
# raw/{instrument}/{YYYY}/{MM}/{DD}/ minted from the sync timestamp
# (lambda/agf_ingestion_lambda.py:76) and reassembled from path segments at
# read (:216).  This section re-expresses it the Iceberg way: a table carries
# an append-only history of partition SPECS (transform lists over source
# FIELD IDS, so renames never break them), each data file records the spec it
# was written under plus its partition tuple, and scan planning prunes
# per-file through that file's OWN spec — a spec change is one metadata
# commit, old files keep their old layout, and readers see both.
#
#     manifest["specs"]           = [{"spec_id": 1, "fields": [
#                                      {"src_id": 3, "transform": "day",
#                                       "name": "ts_day"}, ...]}, ...]
#     manifest["default_spec_id"] = 1          (0 = unpartitioned)
#     entry["spec_id"]            = 1
#     entry["partition"]          = {"ts_day": "2024-03-01"}   (null = NULL)
#
# Transforms: identity | day | month | hour (timestamp/date) |
# bucket(n) (int/string, md5-derived — engine-stable, never a JVM hash) |
# truncate(n) (int: v - v % n; string: prefix).  Files with no spec/partition
# (pre-spec files, compaction/merge rewrites) are conservatively KEPT — the
# per-file min/max stats discipline still prunes them, and the residual
# filter stays exact either way.

_INT_TYPES = {"tinyint", "smallint", "int", "bigint"}
_TRANSFORMS = ("identity", "day", "month", "hour", "bucket", "truncate")


def _spec_by_id(m: dict | None, spec_id: int) -> dict | None:
    for s in (m or {}).get("specs") or []:
        if s["spec_id"] == spec_id:
            return s
    return None


def _default_spec(m: dict | None) -> tuple[dict | None, int]:
    """(spec, spec_id) a new write must partition under — (None, 0) when
    the table is unpartitioned or predates specs."""
    sid = (m or {}).get("default_spec_id", 0)
    s = _spec_by_id(m, sid) if sid else None
    return (s, sid) if s and s["fields"] else (None, 0)


def _build_spec_fields(spec: list, fields: list[dict]) -> list[dict]:
    """Validate user transform tuples against the field registry and bind
    them to source FIELD IDS (rename-proof, the Iceberg source-id model)."""
    by_name = {f["name"]: f for f in fields}
    out: list[dict] = []
    seen: set[str] = set()
    for item in spec:
        tr, col = item[0], item[1]
        n = int(item[2]) if len(item) > 2 and item[2] is not None else None
        f = by_name.get(col)
        if f is None:
            raise SchemaEvolutionError(
                f"partition spec: no such column {col!r}"
            )
        t = f["type"].split("(")[0]
        if tr in ("day", "month"):
            ok = t in ("timestamp", "date")
        elif tr == "hour":
            ok = t == "timestamp"
        elif tr == "bucket":
            ok = t in _INT_TYPES or t == "string"
            if n is None or n < 2:
                raise SchemaEvolutionError(
                    f"bucket({col}) needs a bucket count n >= 2"
                )
        elif tr == "truncate":
            ok = t in _INT_TYPES or t == "string"
            if n is None or n < 1:
                raise SchemaEvolutionError(
                    f"truncate({col}) needs a width n >= 1"
                )
        elif tr == "identity":
            ok = not t.startswith(("array", "map", "struct", "binary"))
        else:
            raise ValueError(
                f"unknown partition transform {tr!r} (one of {_TRANSFORMS})"
            )
        if not ok:
            raise SchemaEvolutionError(
                f"partition transform {tr!r} does not apply to "
                f"{col!r}: {f['type']}"
            )
        name = col if tr == "identity" else f"{col}_{tr}"
        if name in seen:
            raise SchemaEvolutionError(
                f"duplicate partition field name {name!r}"
            )
        seen.add(name)
        sf: dict = {"src_id": f["id"], "transform": tr, "name": name}
        if n is not None:
            sf["n"] = n
        out.append(sf)
    return out


def _bucket_py(value, n: int) -> int:
    """The plan-time twin of the Spark-side bucket expression: md5 of the
    value's string rendering, first 15 hex digits, mod n — int renders via
    ``CAST(x AS STRING)`` ≡ ``str(int)``, strings pass through, so both
    sides compute the identical bucket (the repo's md5-only hash rule)."""
    import hashlib

    return int(
        hashlib.md5(str(value).encode("utf-8")).hexdigest()[:15], 16
    ) % n


def _partition_expr(col: str, typ: str, sf: dict):
    """The Spark Column computing transform ``sf`` over logical ``col`` —
    evaluated once per row at write, never at read (hidden partitioning)."""
    from pyspark.sql import functions as F

    tr = sf["transform"]
    c = F.col(col)
    if tr == "identity":
        return c
    if tr == "day":
        return F.date_format(c, "yyyy-MM-dd")
    if tr == "month":
        return F.date_format(c, "yyyy-MM")
    if tr == "hour":
        return F.date_format(c, "yyyy-MM-dd-HH")
    if tr == "bucket":
        return (
            F.conv(F.substring(F.md5(c.cast("string")), 1, 15), 16, 10)
            .cast("long")
            % sf["n"]
        )
    if tr == "truncate":
        if typ.split("(")[0] in _INT_TYPES:
            # v - pmod(v, n): truncates toward -inf, matching Python's %
            return c - F.pmod(c, F.lit(sf["n"]))
        return F.substring(c, 1, sf["n"])
    raise ValueError(f"unknown partition transform {tr!r}")


def _partition_coercers(spec: dict, src_of: dict) -> dict:
    """Hive directory values are strings; coerce each partition field back
    to the JSON type its pruning comparisons need."""
    coerce = {}
    for sf in spec["fields"]:
        _, typ = src_of[sf["src_id"]]
        t = typ.split("(")[0]
        tr = sf["transform"]
        if tr == "bucket" or (
            tr in ("identity", "truncate") and t in _INT_TYPES
        ):
            coerce[sf["name"]] = int
        elif tr == "identity" and t in ("double", "float"):
            coerce[sf["name"]] = float
        elif tr == "identity" and t == "boolean":
            coerce[sf["name"]] = lambda s: s == "true"
        else:
            coerce[sf["name"]] = str
    return coerce


def _transform_admits(sf: dict, pval, op: str, v) -> bool:
    """Can a file whose partition value is ``pval`` contain a row
    satisfying ``(op, v)`` on the SOURCE column?  Bounds derive from the
    transform; timestamp/date predicates are ISO strings (the stats
    domain), so string comparison is the chronological one.  Raises
    TypeError on incomparable operands — callers conservatively keep."""
    tr = sf["transform"]
    if tr == "bucket":
        # membership only: a bucket disproves nothing but equality
        return op not in ("==", "=") or _bucket_py(v, sf["n"]) == pval
    if tr == "truncate" and isinstance(pval, str):
        if not isinstance(v, str):
            raise TypeError("string truncate vs non-string predicate")
        pref = v[: len(pval)]
        if op in ("==", "="):
            return pval == pref
        if op in ("<", "<="):
            return pval <= pref  # min value with this prefix is pval itself
        return pval >= pref  # >, >=: max value with this prefix is pval+inf
    if tr == "identity":
        lo, hi = pval, pval
    elif tr in ("day", "month"):
        # '~' (0x7E) sorts after every char ISO stats contain, so
        # [pval, pval + '~'] brackets exactly the period's timestamps
        lo, hi = pval, pval + "~"
    elif tr == "hour":
        lo = pval[:10] + " " + pval[11:]  # dir form 2024-03-01-14 → stat form
        hi = lo + "~"
    else:  # int truncate
        lo, hi = pval, pval + sf["n"] - 1
    return _PRUNE_OPS[op](lo, hi, v)


def _partition_admits(
    f: dict, where: list[tuple] | None, specs: dict, fid_of: dict
) -> bool:
    """Partition-tuple pruning for one file entry under its OWN spec —
    the second pruning gate ``plan_files`` applies after stats.  Files
    with no spec/partition, NULL partition values, or incomparable
    predicate values are conservatively kept."""
    part = f.get("partition")
    if not where or not part:
        return True
    spec = specs.get(f.get("spec_id"))
    if not spec:
        return True
    by_src = {sf["src_id"]: sf for sf in spec["fields"]}
    for col, op, v in where:
        sf = by_src.get(fid_of.get(col))
        if sf is None or sf["name"] not in part:
            continue
        pval = part[sf["name"]]
        if pval is None or op not in _PRUNE_OPS:
            continue
        try:
            if not _transform_admits(sf, pval, op, v):
                return False
        except TypeError:
            continue  # incomparable → pruning proves nothing
    return True


def _apply_default_spec(
    df: DataFrame, m: dict | None, *, strict: bool = False
) -> tuple[DataFrame, dict]:
    """(df + derived ``_p_*`` transform columns, ``_write_data_files``
    kwargs) for the manifest's default spec — (df, {}) when the table is
    unpartitioned.  ``strict`` raises when the frame lacks a spec source
    column (explicit writes); non-strict callers (compaction rewrites)
    fall back to a spec-less write, which readers conservatively keep."""
    from pyspark.sql import functions as F

    spec, spec_id = _default_spec(m)
    if not spec:
        return df, {}
    src_of = {f["id"]: (f["name"], f["type"]) for f in _fields_of(m) or []}
    missing = [
        src_of[sf["src_id"]][0]
        for sf in spec["fields"]
        if src_of[sf["src_id"]][0] not in df.columns
    ]
    if missing:
        if strict:
            raise SchemaEvolutionError(
                f"batch lacks partition source column(s) {missing} — "
                f"set spec [] first to write without them"
            )
        return df, {}
    pexprs = [
        _partition_expr(*src_of[sf["src_id"]], sf).alias("_p_" + sf["name"])
        for sf in spec["fields"]
    ]
    df = df.select("*", *pexprs)
    return df, {
        "partition_by": ["_p_" + sf["name"] for sf in spec["fields"]],
        "spec_id": spec_id,
        "partition_coerce": _partition_coercers(spec, src_of),
    }


def snapshot_partition_spec(
    table: str, version: int | None = None
) -> list[tuple]:
    """The default partition spec as user-facing ``(transform, column[,
    n])`` tuples — source ids resolved through the version's field
    registry (a renamed source shows its CURRENT logical name).  Empty
    list = unpartitioned."""
    m = read_manifest(table, version)
    spec, _sid = _default_spec(m)
    if not spec:
        return []
    name_of = {f["id"]: f["name"] for f in _fields_of(m) or []}
    out = []
    for sf in spec["fields"]:
        src = name_of.get(sf["src_id"], f"<dropped:{sf['src_id']}>")
        out.append(
            (sf["transform"], src, sf["n"])
            if "n" in sf
            else (sf["transform"], src)
        )
    return out


def snapshot_set_partition_spec(table: str, spec: list[tuple]) -> int:
    """Change the table's DEFAULT partition spec as one METADATA-ONLY
    commit (Iceberg partition-spec evolution): no byte of data moves, old
    files keep their old spec, and only files written AFTER this commit
    land in the new layout.  ``spec`` is a list of transform tuples —
    ``("identity", col)``, ``("day"|"month"|"hour", col)``,
    ``("bucket", col, n)``, ``("truncate", col, n)`` — or ``[]`` to return
    to unpartitioned writes.

    Single CAS attempt, NO rebase retry: a spec change racing any other
    commit refuses loudly (:class:`CommitConflict`) — the author decided
    on state that no longer exists, the same loud-failure discipline the
    r7 DDL commits use for a rename racing an append.  Idempotent: setting
    the spec the table already has returns the current version with no
    commit."""
    m = read_manifest(table)
    fields = _fields_of(m)
    if not fields:
        raise SchemaEvolutionError(
            f"{table}: no committed schema to partition (empty table)"
        )
    sfields = _build_spec_fields(spec, fields)
    cur_spec, cur_sid = _default_spec(m)
    if ((cur_spec or {}).get("fields") or []) == sfields:
        return m["version"]
    all_specs = list(m.get("specs") or [])
    if not sfields:
        sid = 0
    else:
        hit = [s["spec_id"] for s in all_specs if s["fields"] == sfields]
        if hit:
            sid = hit[0]
        else:
            sid = max((s["spec_id"] for s in all_specs), default=0) + 1
            all_specs = all_specs + [{"spec_id": sid, "fields": sfields}]
    return _publish(
        table,
        m["files"],
        m["version"],
        f"set_partition_spec:{sid}",
        specs=all_specs,
        default_spec_id=sid,
    )


# -- declared sort order (r8) -------------------------------------------------
# The write-side half of data skipping, promoted from a per-call option
# (snapshot_write(cluster_by=...)) to TABLE METADATA the Iceberg-SortOrder
# way: the manifest carries an append-only history of sort orders bound to
# source FIELD IDS (rename-proof), every data file records the order it was
# written under, appends and compaction apply the default order without the
# caller knowing it exists, and maintenance converges historical unsorted
# files.  A declared order is advisory layout metadata — readers never
# depend on it for correctness (per-file min/max stats stay the only
# pruning input), so a file written under an old or no order is simply a
# file whose stats span more of the domain.
#
#     manifest["sort_orders"]           = [{"order_id": 1, "fields":
#                                           [{"src_id": 3}, ...]}, ...]
#     manifest["default_sort_order_id"] = 1          (0 = unsorted)
#     entry["sort_order_id"]            = 1

_UNSORTABLE = ("array", "map", "struct", "binary")


def _default_sort_order(m: dict | None) -> tuple[dict | None, int]:
    """(order, order_id) new writes must cluster under — (None, 0) when
    the table is unsorted or predates sort orders."""
    oid = (m or {}).get("default_sort_order_id", 0)
    if not oid:
        return None, 0
    for o in (m or {}).get("sort_orders") or []:
        if o["order_id"] == oid:
            return (o, oid) if o["fields"] else (None, 0)
    return None, 0


def _sort_plan_of(m: dict | None) -> tuple[list[dict], int]:
    """The default sort order resolved against the CURRENT field registry
    (renames never break it) as a list of plan items plus the order id —
    ([], 0) when unsorted.  Items: ``{"kind": "col", "cols": [name]}``
    for a plain ascending column, ``{"kind": "zorder", "cols": [a, b],
    "types": [...]}`` for the 2-D Morton transform (r8: OPTIMIZE ZORDER
    as table metadata, not a per-call option)."""
    order, oid = _default_sort_order(m)
    if not order:
        return [], 0
    reg = {f["id"]: f for f in _fields_of(m) or []}
    plan: list[dict] = []
    for of in order["fields"]:
        ids = of.get("src_ids") or [of["src_id"]]
        if any(i not in reg for i in ids):
            return [], 0  # a source left the registry (non-default history)
        item = {
            "kind": of.get("transform", "col"),
            "cols": [reg[i]["name"] for i in ids],
            "types": [reg[i]["type"] for i in ids],
        }
        plan.append(item)
    return plan, oid


def _sort_cols_of(m: dict | None) -> tuple[list[str], int]:
    """Back-compat view of :func:`_sort_plan_of` for consumers that only
    need plain column names (health signal, drop refusal): every column
    any order item touches, flattened."""
    plan, oid = _sort_plan_of(m)
    return [c for item in plan for c in item["cols"]], oid


def _sort_member_expr(col: str, typ: str) -> str:
    """SQL expression projecting a sort-transform member onto a BIGINT
    domain for normalization: ints pass through, timestamps/dates become
    epoch integers."""
    t = typ.split("(")[0]
    if t == "timestamp":
        return f"unix_micros(`{col}`)"
    if t == "date":
        return f"unix_date(`{col}`)"
    return f"`{col}`"


#: normalization width for zorder sort transforms (2×16 interleaved bits)
_SORT_Z_BITS = 16


def _apply_sort_keys(df: DataFrame, plan: list[dict]):
    """(df with derived key columns, key column names, temp columns to
    drop after clustering).  A transform item computes its batch's member
    bounds as ONE scalar aggregate joined back broadcast — part of the
    same write action, so the repartitionByRange multi-action trap does
    not apply.

    ``zorder`` interleaves 16-bit normalized members as a pure codegen
    bit expression.  ``hilbert`` (the liquid-clustering upgrade — unit
    adjacency, tighter file boxes at misaligned cuts; see OP-X-HILBERT)
    normalizes to the 8-bit grid and attaches the curve index through
    the grid-bounded distinct-cell table + broadcast join, because the
    8 unrolled rounds as SQL would CollapseProject into a janino-blowup
    expression — Python cost stays ≤65 536 rows per write at ANY batch
    size."""
    from pyspark.sql import functions as F

    from agf_data_ingestion_spark.functions.zorder import (
        _H_BITS,
        _interleave_expr,
        hilbert_np,
        norm_expr,
    )

    tmp: list[str] = []
    aggs = []
    for i, item in enumerate(plan):
        if item["kind"] == "col":
            continue
        for j, (c, ty) in enumerate(zip(item["cols"], item["types"])):
            e = _sort_member_expr(c, ty)
            aggs.append(F.expr(f"min({e})").alias(f"_lo_{i}_{j}"))
            aggs.append(F.expr(f"max({e})").alias(f"_hi_{i}_{j}"))
    if aggs:
        import pandas as pd

        bounds = df.agg(*aggs)
        df = df.crossJoin(F.broadcast(bounds))
        for i, item in enumerate(plan):
            if item["kind"] == "col":
                continue
            bits = _SORT_Z_BITS if item["kind"] == "zorder" else _H_BITS
            na = norm_expr(
                _sort_member_expr(item["cols"][0], item["types"][0]),
                f"_lo_{i}_0",
                f"_hi_{i}_0",
                bits,
            )
            nb = norm_expr(
                _sort_member_expr(item["cols"][1], item["types"][1]),
                f"_lo_{i}_1",
                f"_hi_{i}_1",
                bits,
            )
            k = f"_skey_{i}"
            if item["kind"] == "zorder":
                df = df.withColumn(
                    k, F.expr(_interleave_expr(f"({na})", f"({nb})", bits))
                )
            else:  # hilbert
                cx, cy = f"_cx_{i}", f"_cy_{i}"
                df = df.withColumn(cx, F.expr(na)).withColumn(cy, F.expr(nb))
                h_udf = F.pandas_udf(
                    lambda x, y: pd.Series(hilbert_np(x, y, _H_BITS)),
                    "bigint",
                )
                sig = (
                    df.select(cx, cy)
                    .distinct()
                    .select(cx, cy, h_udf(cx, cy).alias(k))
                )
                df = df.join(F.broadcast(sig), [cx, cy])
                tmp += [cx, cy]
            tmp.append(k)
        tmp += [c for c in df.columns if c.startswith(("_lo_", "_hi_"))]
    keys = [
        item["cols"][0] if item["kind"] == "col" else f"_skey_{i}"
        for i, item in enumerate(plan)
    ]
    return df, keys, tmp


def snapshot_sort_order(table: str, version: int | None = None) -> list:
    """The default sort order in user-facing form (empty = unsorted):
    plain columns as strings, transforms as ``["zorder", a, b]`` lists —
    names resolved through the field registry (renames show the current
    name)."""
    m = read_manifest(table, version)
    order, _oid = _default_sort_order(m)
    if not order:
        return []
    name_of = {f["id"]: f["name"] for f in _fields_of(m) or []}
    out: list = []
    for of in order["fields"]:
        if "src_ids" in of:
            out.append(
                [of["transform"]]
                + [name_of.get(i, f"<dropped:{i}>") for i in of["src_ids"]]
            )
        else:
            out.append(name_of.get(of["src_id"], f"<dropped:{of['src_id']}>"))
    return out


def snapshot_set_sort_order(table: str, cols: list[str]) -> int:
    """Declare the table's DEFAULT sort order as one METADATA-ONLY commit:
    no byte of data moves; appends and compaction from this version on
    range-cluster + sort within files on ``cols`` (ascending), and
    ``snapshot_maintain`` gains a trigger that converges pre-order files.
    ``[]`` returns the table to unsorted writes.

    Same DDL discipline as partition specs: single CAS attempt, a sort
    change racing any other commit refuses loudly (CommitConflict);
    idempotent when the order already matches."""
    m = read_manifest(table)
    fields = _fields_of(m)
    if not fields:
        raise SchemaEvolutionError(
            f"{table}: no committed schema to sort (empty table)"
        )
    by_name = {f["name"]: f for f in fields}
    ofields: list[dict] = []
    seen: set[str] = set()

    def _member(col: str, *, numeric: bool = False) -> dict:
        f = by_name.get(col)
        if f is None:
            raise SchemaEvolutionError(f"sort order: no such column {col!r}")
        t = f["type"].split("(")[0]
        if t.startswith(_UNSORTABLE):
            raise SchemaEvolutionError(
                f"sort order: column {col!r} of type {f['type']} is unsortable"
            )
        if numeric and t not in _INT_TYPES | {"timestamp", "date"}:
            raise SchemaEvolutionError(
                f"sort order: zorder member {col!r} must be an integer, "
                f"timestamp, or date column (got {f['type']})"
            )
        if col in seen:
            raise SchemaEvolutionError(f"sort order: duplicate column {col!r}")
        seen.add(col)
        return f

    for col in cols:
        if isinstance(col, (tuple, list)):
            tr, members = col[0], list(col[1:])
            if tr not in ("zorder", "hilbert"):
                raise ValueError(
                    f"unknown sort transform {tr!r} ('zorder' or 'hilbert')"
                )
            if len(members) != 2:
                raise SchemaEvolutionError(
                    f"sort order: {tr} takes exactly 2 columns"
                )
            ofields.append(
                {
                    "transform": tr,
                    "src_ids": [
                        _member(c, numeric=True)["id"] for c in members
                    ],
                }
            )
        else:
            ofields.append({"src_id": _member(col)["id"]})
    cur, cur_oid = _default_sort_order(m)
    if ((cur or {}).get("fields") or []) == ofields:
        return m["version"]
    all_orders = list(m.get("sort_orders") or [])
    if not ofields:
        oid = 0
    else:
        hit = [o["order_id"] for o in all_orders if o["fields"] == ofields]
        if hit:
            oid = hit[0]
        else:
            oid = max((o["order_id"] for o in all_orders), default=0) + 1
            all_orders = all_orders + [{"order_id": oid, "fields": ofields}]
    return _publish(
        table,
        m["files"],
        m["version"],
        f"set_sort_order:{oid}",
        sort_orders=all_orders,
        default_sort_order_id=oid,
    )


# -- merge-on-read deletion vectors (r6) --------------------------------------
# A DELETE can commit O(matches) POSITION-DELETE entries instead of copy-on-
# write rewriting every touched file (the Iceberg-v2 position-delete / Delta
# deletion-vector model): a manifest file entry gains
#
#     "dv": [{"paths": [<dv parquet files>], "n": <deleted positions in
#             THIS file>}, ...]
#
# and every reader anti-joins (file, position) against the union of the
# entry's delete vectors.  Positions are the parquet reader's physical row
# index (``_metadata.row_index``) — produced and consumed by the same
# mechanism, so they cannot drift — and each delete computes its positions
# on the MERGED view (existing DVs applied), so per-commit ``n`` increments
# are disjoint by construction and ``snapshot_rowcount`` stays exact
# metadata-only.  Compaction applies and drops DVs; expiry reclaims DV
# files no retained manifest references; file-level OCC treats a DV commit
# as an entry change (see ``_commit_rewrite``), so DV commits on disjoint
# files never conflict with concurrent rewrites.

#: DV anti-join broadcast guard, in BYTES of the hashed side (r7, VERDICT
#: r6 finding #3: the old 4M-row guard ignored that each row carried the
#: full absolute path STRING — ~100+ B/row hash-relations to hundreds of
#: MB while row-wise "small").  The broadcast side now carries
#: (int file id, long position) rows — ~16 B each — and the guard is the
#: exact manifest position count × that row width (never a blind
#: estimate); larger sets fall back to AQE's pick and compaction is the
#: cure.  64 MiB matches the ``base.bdim`` dimension-broadcast guard.
#: Row width is the MEASURED BroadcastExchange dataSize per (int, long)
#: position row (~96 B incl. UnsafeRow + hashed-relation overhead — the
#: raw 16 B/row would under-guard the built relation 6×): 250k spread-
#: erasure positions report 24 MiB int-keyed vs 88 MiB string-keyed.
_DV_BROADCAST_MAX_BYTES = 64 << 20
_DV_ROW_BYTES = 96
#: target positions per DV part file (bounds part count for huge deletes)
_DV_FILE_TARGET_ROWS = 8_000_000


def _dv_items(f: dict) -> list[dict]:
    return f.get("dv") or []


def _dv_signature(f: dict) -> str:
    """Entry-delta cancellation key: two entries with the same path are
    the same row multiset iff their DV lists match.  Shared by
    ``snapshot_diff`` and the streaming CDC source so the rule cannot
    desynchronize."""
    return json.dumps(_dv_items(f), sort_keys=True)


def _scan_path(p: str) -> str:
    """A manifest entry path in the domain ``_metadata.file_path``
    renders (absolute): manifests store paths as given to the writer,
    which may be RELATIVE — DV records are keyed by the scan-side
    absolute form, so every counts/positions lookup must go through
    this."""
    return os.path.abspath(p)


def _live_rows(f: dict) -> int | None:
    """Rows a reader sees from this entry: footer rows minus DV'd
    positions (None for a legacy entry without a recorded row count)."""
    if "rows" not in f:
        return None
    return f["rows"] - sum(i["n"] for i in _dv_items(f))


def _norm_file_path(col):
    """``_metadata.file_path`` renders as ``file:/abs/path`` (scheme-slash
    count varies) — normalize to the plain filesystem path the manifests
    and DV records store."""
    from pyspark.sql import functions as F

    return F.regexp_replace(col, "^file:/+", "/")


# -- equality deletes (r7) -----------------------------------------------------
# The Iceberg-v2 equality-delete rung UNDER the position-delete one: a
# DELETE-BY-KEY commits O(batch) key rows and manifest metadata with ZERO
# target reads — the writer does not know (and never finds out) which files
# hold the keys.  The manifest carries
#
#     "eq_deletes": [{"paths": [<key parquet files>], "key_cols": [...],
#                     "n": <key rows>, "seq": s, "bounds": {col: [lo, hi]}}]
#
# and an item applies to a data entry iff entry.seq < item.seq (files
# appended AFTER the delete are never shadowed — the same-sequence rule
# lets a merge append its batch and delete prior copies in ONE commit) and
# the entry's key-column stats overlap the item's key bounds.  Readers
# anti-join rows on (key columns, row seq < item seq); compaction rewrites
# shadowed entries off the merged view (fresh seq → items stop applying)
# and every commit garbage-collects items no live entry admits, after
# which expiry reclaims the key filesets.  Exact metadata row counts are
# UNKNOWABLE while an item is live (matches were never counted) —
# ``snapshot_rowcount`` refuses rather than guesses.

#: per-key-row byte estimate for the eq anti-join broadcast guard (keys
#: are a few scalar columns; hashed-relation overhead dominates, as
#: measured for the position-delete form)
_EQ_BROADCAST_ROW_BYTES = 128


def _eq_items(m: dict) -> list[dict]:
    return m.get("eq_deletes") or []


def _eq_applies(entry: dict, item: dict) -> bool:
    """Could equality-delete ``item`` shadow any row of ``entry``?
    Sequence rule first (strictly-prior files only), then the per-column
    key bounds vs the entry's parquet stats — a disjoint range on ANY key
    column proves no row can equal any deleted key (both are conservative
    min/max, so False here is a proof, True is merely "cannot disprove")."""
    if entry.get("seq", 0) >= item["seq"]:
        return False
    st = entry.get("stats") or {}
    for c, (lo, hi) in (item.get("bounds") or {}).items():
        if c in st:
            flo, fhi = st[c]
            try:
                if fhi < lo or flo > hi:
                    return False
            except TypeError:
                pass  # incomparable stat domains: cannot disprove
    return True


def _eq_sig(entry: dict, eq_list: list[dict] | None) -> str:
    """The identity of the equality deletes APPLICABLE to an entry — the
    eq twin of ``_dv_signature``: two same-path entries read as the same
    row multiset iff their DV lists AND their applicable eq sets match.
    Shared by ``snapshot_diff`` and the streaming CDC source."""
    return json.dumps(
        sorted(
            [sorted(it["paths"]), it["seq"]]
            for it in eq_list or []
            if _eq_applies(entry, it)
        )
    )


def _read_entries(
    spark: SparkSession,
    entries: list[dict],
    *,
    keep_position: bool = False,
    eq_deletes: list | None = None,
    fields: list | None = None,
):
    """Read manifest file entries WITH their deletion vectors applied —
    the merge-on-read path every consumer of raw manifest file lists must
    use (snapshot_read / merge / delete / compact / diff).  When no entry
    carries a DV and positions aren't requested, this is a plain parquet
    scan — zero overhead on the common path.

    ``keep_position=True`` retains the physical ``(_dv_fp, _dv_pos)``
    columns; the DV delete path computes its new positions on this merged
    view, which is what keeps per-file DV counts disjoint across commits.

    Scale: the corpus side never shuffles for a bounded DV set — the DV
    side's EXACT position count is recorded in the manifest, and before
    the anti-join its path strings are dictionary-encoded to INT file ids
    (the ordinal in this read's sorted entry list) via the tiny
    (path, id) mapping frame, so the hashed relation carries ~16 B/row
    instead of a 100+ B absolute path per position (r7; ~8–12× smaller
    broadcast on spread erasures).  The same mapping join restricts a
    shared DV fileset to THIS read's files (a pruned read of 3 files
    must not broadcast a 2000-file commit's full position set), so the
    byte guard's sum over the KEPT entries' n is exact by construction;
    an over-``_DV_BROADCAST_MAX_BYTES`` set is left to AQE and signals
    the table is due for compaction."""
    from pyspark.sql import functions as F

    paths = sorted(f["path"] for f in entries)
    if fields:
        # registry-driven read (r7): scan with the (physical name, logical
        # type) schema — Spark 4's parquet reader upcasts narrower file
        # types (int32 files under a bigint field), files missing a
        # later-added field read NULL, and DROPPED columns' bytes are
        # never even decoded — then alias back to the logical names
        ddl = ", ".join(f"`{f['phys']}` {f['type']}" for f in fields)
        df = spark.read.schema(ddl).parquet(*paths)
        if not _is_identity(fields):
            df = df.select(
                *[F.col(f["phys"]).alias(f["name"]) for f in fields]
            )
    else:
        df = spark.read.option("mergeSchema", "true").parquet(*paths)
    items = [i for f in entries for i in _dv_items(f)]
    eq = [
        it
        for it in eq_deletes or []
        if any(_eq_applies(f, it) for f in entries)
    ]
    if not items and not eq and not keep_position:
        return df
    cols = df.columns
    df = df.select(
        "*",
        _norm_file_path(F.col("_metadata.file_path")).alias("_dv_fp"),
        F.col("_metadata.row_index").alias("_dv_pos"),
    )
    if items or eq:
        # one tiny (path → int id, sequence) mapping frame serves both
        # delete forms, attached to the scan with a broadcast LEFT join so
        # a path that somehow fails to map gets NULL id/seq, which no
        # anti-join condition can match — the row is KEPT, never dropped
        keep = sorted({_scan_path(f["path"]) for f in entries})
        seq_of = {_scan_path(f["path"]): f.get("seq", 0) for f in entries}
        mapping = spark.createDataFrame(
            [(p, i, seq_of[p]) for i, p in enumerate(keep)],
            "_dv_fp string, _dv_fid int, _dv_seq long",
        )
        df = df.join(F.broadcast(mapping), "_dv_fp", "left")
    if items:
        dv_paths = sorted({p for i in items for p in i["paths"]})
        dv = spark.read.parquet(*dv_paths).select(
            F.col("file_path").alias("_dv_fp"), F.col("pos").alias("_dv_pos")
        )
        # inner mapping join: encodes path → int id AND drops positions of
        # files outside this read in one pass
        dv = dv.join(F.broadcast(mapping), "_dv_fp", "inner").select(
            "_dv_fid", "_dv_pos"
        )
        n_pos = sum(i["n"] for f in entries for i in _dv_items(f))
        if n_pos * _DV_ROW_BYTES <= _DV_BROADCAST_MAX_BYTES:
            dv = F.broadcast(dv)
        df = df.join(dv, ["_dv_fid", "_dv_pos"], "left_anti")
    if eq:
        # one anti-join per key-column set: rows are shadowed iff their
        # key tuple appears in an item whose sequence is strictly LATER
        # than the row's file (`_dv_seq < _eq_seq` as the join residual) —
        # a NULL key on either side matches nothing (SQL equality)
        groups: dict[tuple, list[dict]] = {}
        for it in eq:
            groups.setdefault(tuple(it["key_cols"]), []).append(it)
        for key_cols, its in sorted(groups.items()):
            parts = [
                spark.read.parquet(*sorted(it["paths"])).select(
                    *[
                        F.col(c).alias(f"_eqk_{j}")
                        for j, c in enumerate(key_cols)
                    ],
                    F.lit(it["seq"]).cast("long").alias("_eq_seq"),
                )
                for it in its
            ]
            keys = parts[0]
            for p in parts[1:]:
                keys = keys.unionByName(p)
            if (
                sum(it["n"] for it in its) * _EQ_BROADCAST_ROW_BYTES
                <= _DV_BROADCAST_MAX_BYTES
            ):
                keys = F.broadcast(keys)
            cond = df["_dv_seq"] < keys["_eq_seq"]
            for j, c in enumerate(key_cols):
                cond = cond & (df[c] == keys[f"_eqk_{j}"])
            df = df.join(keys, cond, "left_anti")
    df = df.drop("_dv_fid", "_dv_seq")
    return df if keep_position else df.select(cols)


def snapshot_read(
    spark: SparkSession,
    table: str,
    *,
    version: int | None = None,
    as_of: float | None = None,
    tag: str | None = None,
    where: list[tuple] | None = None,
) -> DataFrame:
    """The table as of ``version`` (default: current), or — mutually
    exclusive — as of epoch-seconds timestamp ``as_of`` (resolved to the
    latest commit at or before it, `FOR TIMESTAMP AS OF` semantics), or
    at a named release ``tag`` (`VERSION AS OF 'corpus-v1.0'`).
    Empty tables read as an empty frame only when a schema-bearing
    snapshot exists.

    ``where`` (optional ANDed ``(col, op, value)`` triples) enables
    manifest-level data skipping via the per-file stats recorded at commit
    time: files whose min/max disprove a predicate are never opened, and
    the predicates are still applied to the returned frame so results are
    exact even where stats are absent or ranges merely overlap.  For
    timestamp/date columns pass ISO-formatted strings (stats are stored
    that way; ISO order == chronological order).

    ``mergeSchema`` is always on: a table whose commits span a column
    addition (schema evolution) reads as the union schema, with nulls for
    files written before the column existed — old snapshots keep their
    narrower schema because their manifests never reference newer files."""
    from pyspark.sql import functions as F

    if sum(x is not None for x in (version, as_of, tag)) > 1:
        raise ValueError("pass at most one of version / as_of / tag")
    if as_of is not None:
        version = version_as_of(table, as_of)
    elif tag is not None:
        tags = snapshot_tags(table)
        if tag not in tags:
            raise NoSuchVersionError(f"{table}: no tag {tag!r}")
        version = tags[tag]
    m = read_manifest(table, version)
    if not m["files"]:
        # an empty overwrite / delete-all commits a file-less manifest
        # whose SCHEMA still lives in the registry (since r7 no empty
        # part file is kept around to carry it): honor the docstring and
        # read as an empty frame; only a never-written table raises
        flds = _fields_of(m)
        if flds:
            return spark.createDataFrame(
                [], ", ".join(f"`{f['name']}` {f['type']}" for f in flds)
            )
        raise NoSuchVersionError(f"{table}: v{m['version']} has no data files")
    kept = plan_files(table, version=version, where=where)
    if kept:
        # merge-on-read: entries carrying deletion vectors anti-join their
        # (file, position) delete sets, equality deletes anti-join their
        # key sets; plain entries read as a bare scan
        df = _read_entries(
            spark, kept, eq_deletes=_eq_items(m), fields=_fields_of(m)
        )
    else:
        # all files pruned: keep one for the schema — the residual filter
        # below returns its (provably empty) matching subset, so applying
        # the file's DVs would be wasted work
        df = _read_entries(spark, [m["files"][0]], fields=_fields_of(m)).limit(0)
    cond = _where_condition(df, where)
    return df.filter(cond) if cond is not None else df


def _where_condition(df: DataFrame, where: list[tuple] | None):
    """ANDed Column for ``(col, op, value)`` triples, or None when empty —
    the exact residual twin of the manifest-stat pruning (timestamp/date
    columns compare as ISO strings, the domain the stats are stored in)."""
    from pyspark.sql import functions as F

    cond = None
    for col, op, value in where or []:
        c = F.col(col)
        if dict(df.dtypes).get(col) in ("timestamp", "date"):
            c = c.cast("string")
        if op == "is_null":
            clause = c.isNull()
        elif op == "not_null":
            clause = c.isNotNull()
        elif op == "in":
            vals = list(value)
            clause = c.isin(vals) if vals else F.lit(False)
        else:
            v = F.lit(value)
            clause = {
                ">=": c >= v,
                ">": c > v,
                "<=": c <= v,
                "<": c < v,
                "==": c == v,
                "=": c == v,
            }[op]
        cond = clause if cond is None else (cond & clause)
    return cond


def snapshot_upsert(df: DataFrame, table: str, keys: list[str]) -> int:
    """Idempotent keyed append AS ONE ATOMIC COMMIT — optimistic (r4).

    First-writer-wins insert-only semantics, now WITHOUT a table lock
    (reference parity: the conditional-write arbiter lets 50 ingest
    writers run concurrently, agf_ingestion_lambda.py:227-236).  The
    anti-join against the snapshot-as-of ``parent`` and the data-file
    write run lock-free; the CAS commit then reserves parent+1.  On a
    lost race the writer re-checks its surviving rows against ONLY the
    files the interleaved commits added (one anti-join over the manifest
    delta — never a rescan of the table): disjoint-key writers rebase and
    commit immediately, overlapping keys defer to the earlier winner
    (rows dropped, files rewritten), a fully-absorbed batch returns the
    winner's version with no commit.  Readers only ever see committed
    manifests."""
    spark = df.sparkSession
    batch = df.dropDuplicates(keys)  # same within-batch rule as upsert_append
    batch_schema = _schema_of(batch)
    m0 = read_manifest(table)
    _evolve_fields(m0, batch_schema)  # fail fast incl. reserved names
    flds = _fields_of(m0)
    parent = current_version(table)
    if parent > 0:
        existing = snapshot_read(spark, table, version=parent)
        fresh = batch.join(
            existing.select(*keys).dropDuplicates(keys), keys, "left_anti"
        )
    else:
        fresh = batch
    # materialize the anti-join ONCE: isEmpty(), the file write, and any
    # conflict re-checks must not each re-run the full join
    fresh = fresh.localCheckpoint(eager=True)
    if fresh.isEmpty():
        return parent
    new_files = _write_data_files(fresh, table, fields=flds)
    for _ in range(_OCC_MAX_RETRIES):
        base = read_manifest(table, parent)["files"] if parent > 0 else []
        try:
            return _publish(
                table, base + new_files, parent, "upsert", batch_schema=batch_schema
            )
        except CommitConflict:
            cur = _repair_current(table)
            base_paths = {f["path"] for f in base}
            delta_paths = sorted(
                f["path"]
                for f in read_manifest(table, cur)["files"]
                if f["path"] not in base_paths
            )
            if delta_paths:
                from pyspark.sql import functions as F

                # delta files store PHYSICAL names: translate the key
                # columns through the winner's registry before selecting
                p = _phys_of(_fields_of(read_manifest(table, cur)))
                others = (
                    spark.read.option("mergeSchema", "true")
                    .parquet(*delta_paths)
                    .select(
                        *[F.col(p.get(k, k)).alias(k) for k in keys]
                    )
                    .dropDuplicates(keys)
                )
                survived = fresh.join(others, keys, "left_anti").localCheckpoint(
                    eager=True
                )
                n_before, n_after = fresh.count(), survived.count()
                if n_after == 0:
                    return cur  # every key beaten by earlier winners: no-op
                if n_after != n_before:
                    # some keys lost first-writer-wins: rewrite the batch
                    # files without them (the old files stay unreferenced)
                    fresh = survived
                    new_files = _write_data_files(fresh, table, fields=flds)
            parent = cur
    raise CommitConflict(
        f"snapshot_upsert on {table} lost {_OCC_MAX_RETRIES} CAS races"
    )


@_retry_on_conflict
def snapshot_merge(
    df: DataFrame,
    table: str,
    keys: list[str],
    *,
    mode: str = "cow",
    op: str | None = None,
    delete_keys: DataFrame | None = None,
) -> int:
    """MERGE: rows of ``df`` REPLACE same-keyed rows in the table,
    unmatched rows insert — the update primitive ``snapshot_upsert``
    deliberately lacks (upsert is first-writer-wins insert-only).  One
    atomic commit, LOCK-FREE since r5: the commit validates at file
    granularity (``_commit_rewrite``), so merges whose key ranges touch
    disjoint files commit concurrently; an interleaved commit inside this
    merge's key range forces a transparent recompute.

    ``mode='cow'`` (default) rewrites every touched file; ``mode='dv'``
    (r6) is MERGE-ON-READ: matched rows are shadowed by O(matches)
    position-delete entries and the batch appends as new files — an
    UPDATE therefore costs O(matches + batch), never a file rewrite
    (Iceberg-v2 MOR merge).  ``mode='eq'`` (r7) goes one rung further:
    the batch appends and prior same-keyed rows are shadowed by an
    EQUALITY delete carrying the batch's key rows, stamped at the same
    commit sequence so it applies strictly to PRIOR files — the target
    is never scanned at all (zero reads, O(batch) writes), which is the
    streaming-CDC-upsert shape: a micro-batch commits without touching
    100 TB of history.  All modes produce identical reader-visible
    results; a dv/eq merge's update surfaces in CDC as delete(old) +
    insert(new), exactly the ``snapshot_diff`` contract.

    Scale shape mirrors ``snapshot_delete``: the incoming batch's per-key
    [min, max] bounds are compared against each file's manifest stats and
    only files whose key ranges OVERLAP the batch (or that carry no
    stats) are rewritten — at 100 TB a merge of one instrument-day
    rewrites the files covering that key range, never the table.  The
    rewrite itself is one anti-join of touched-file rows against the
    batch's distinct keys (AQE picks the strategy; the batch side is
    typically ≪ table).

    ``df`` must be unique on ``keys`` — with duplicate keys "which copy
    wins" would depend on physical row order, which is exactly the
    nondeterminism this format bans everywhere else (raises ValueError).

    ``op`` (r7): optional commit label in place of the mode string — the
    idempotent streaming CDC-upsert sink encodes its replay bookmark in
    it (streaming/upsert_stream.py, the ann_stream/mv pattern).
    ``delete_keys`` (r7, ``mode='eq'`` only): keys to delete WITHOUT
    replacement, folded into the SAME equality-delete item as the
    batch's own keys — upserts and deletes of one CDC micro-batch land
    in ONE atomic zero-read commit.  Must be disjoint from ``df``'s keys
    (a key both replaced and deleted in one batch is a caller bug —
    net the batch first)."""
    if not keys:
        raise ValueError("snapshot_merge requires at least one key column")
    if mode not in ("cow", "dv", "eq"):
        raise ValueError(f"mode must be cow|dv|eq, got {mode!r}")
    if delete_keys is not None and mode != "eq":
        raise ValueError("delete_keys requires mode='eq'")
    spark = df.sparkSession
    from pyspark.sql import functions as F

    # materialize the incoming batch ONCE: the dup check, bounds agg,
    # anti-join key set, and final file write would otherwise each re-run
    # its lineage (the same discipline as snapshot_upsert's checkpointed
    # anti-join)
    df = df.localCheckpoint(eager=True)
    dup = df.groupBy(*keys).count().filter(F.col("count") > 1).limit(1).collect()
    if dup:
        raise ValueError(f"snapshot_merge: df is not unique on {keys}: {dup[0]}")
    batch_schema = _schema_of(df)
    parent = _repair_current(table)
    m = read_manifest(table, parent) if parent > 0 else {"files": []}
    _evolve_fields(m, batch_schema)  # fail before any rewrite (reserved names too)
    flds = _fields_of(m)
    physm = _phys_of(flds)
    if mode == "eq":
        # ZERO target reads: append the batch; shadow prior same-keyed
        # rows with an equality delete stamped at this commit's sequence
        # (the same-sequence rule exempts the batch itself).  NULL-keyed
        # batch rows shadow nothing and simply append — identical to the
        # cow/dv no-match behavior.
        not_null = " AND ".join(f"`{c}` IS NOT NULL" for c in keys)
        dk = None
        if delete_keys is not None:
            # validate BEFORE any file write (a refused batch must leave
            # nothing behind but cheap orphans), each check ONE action
            dk = delete_keys.select(*keys).localCheckpoint(eager=True)
            any_null = " OR ".join(f"`{c}` IS NULL" for c in keys)
            if dk.filter(any_null).limit(1).count():
                raise ValueError(
                    "snapshot_merge: NULL-keyed delete_keys rows match "
                    "nothing — refusing to commit a partial erasure"
                )
            if df.join(dk, list(keys), "left_semi").limit(1).count():
                raise ValueError(
                    "snapshot_merge: delete_keys overlaps the batch's keys "
                    "— net the micro-batch before applying it"
                )
        appended = [
            f for f in _write_data_files(df, table, fields=flds) if f["rows"] > 0
        ]
        kdf = df.select(*keys).filter(not_null)
        if dk is not None:
            kdf = kdf.unionByName(dk).dropDuplicates(list(keys))
        paths, n, bounds = _write_eq_keys(kdf, table)
        # bounds compare against per-file stats, which are keyed by the
        # PHYSICAL column names
        bounds = {physm.get(c, c): v for c, v in bounds.items()}
        item = {"paths": paths, "key_cols": list(keys), "n": n, "bounds": bounds}
        for _ in range(_OCC_MAX_RETRIES):
            base = read_manifest(table, parent)["files"] if parent > 0 else []
            try:
                return _publish(
                    table,
                    base + appended,
                    parent,
                    op or "merge-eq",
                    batch_schema=batch_schema,
                    add_eq=[item] if n else None,
                )
            except CommitConflict:
                parent = _repair_current(table)
        raise CommitConflict(
            f"snapshot_merge(eq) on {table} lost {_OCC_MAX_RETRIES} CAS races"
        )
    # incoming key bounds (one tiny agg) → which files COULD match;
    # normalized into the stats' storage domain (datetimes/dates are
    # ISO strings there — comparing raw datetime objects against them
    # would TypeError and silently degrade to a full-table rewrite)
    raw = df.agg(
        *[F.min(k).alias(f"lo_{k}") for k in keys],
        *[F.max(k).alias(f"hi_{k}") for k in keys],
    ).collect()[0]
    bounds = {c: _json_stat_value(raw[c]) for c in raw.asDict()}

    def _overlaps(f: dict) -> bool:
        for k in keys:
            pk = physm.get(k, k)  # stats are keyed by physical names
            if pk not in f.get("stats", {}):
                return True  # no stats → could match, must rewrite
            lo, hi = f["stats"][pk]
            if raw[f"lo_{k}"] is None:
                # empty batch / all-NULL key: equality on NULL matches
                # nothing, so no file needs rewriting on this evidence
                return False
            ilo, ihi = bounds[f"lo_{k}"], bounds[f"hi_{k}"]
            if ilo is None or ihi is None:
                return True  # bound not stat-representable: conservative
            try:
                if hi < ilo or lo > ihi:
                    return False  # disjoint on this key col
            except TypeError:
                return True  # incomparable stat types: keep conservative
        return True

    touched = [f for f in m["files"] if _overlaps(f)]
    if mode == "dv":
        # merge-on-read: shadow the matched rows with position deletes,
        # append the whole batch as new files — O(matches + batch)
        appended = [
            f for f in _write_data_files(df, table, fields=flds) if f["rows"] > 0
        ]
        dv_upd: list[dict] = []
        if touched:
            scan = _read_entries(
                spark,
                touched,
                keep_position=True,
                eq_deletes=_eq_items(m),
                fields=flds,
            )
            matches = scan.join(df.select(*keys).distinct(), keys, "left_semi").select(
                F.col("_dv_fp").alias("file_path"), F.col("_dv_pos").alias("pos")
            )
            dv_paths, counts = _write_dv(spark, table, touched, matches)
            dv_upd = _dv_entries(touched, dv_paths, counts)
        if not dv_upd and not appended:
            return parent
        return _commit_rewrite(
            table,
            parent,
            {e["path"] for e in dv_upd},
            dv_upd + appended,
            "merge-dv",
            batch_schema=batch_schema,
            # an interleaved commit may have added rows sharing this
            # batch's keys — rebasing would leave them un-replaced
            delta_safe=lambda f: not _overlaps(f),
        )
    new_files: list[dict] = []
    if touched:
        # merge-on-read: a raw path read would resurrect DV/eq-deleted
        # rows into the survivors rewrite
        old = _read_entries(spark, touched, eq_deletes=_eq_items(m), fields=flds)
        survivors = old.join(df.select(*keys).distinct(), keys, "left_anti")
        bc = _common_bloom_cols(touched)
        new_files += _write_data_files(survivors, table, bloom_cols=bc, fields=flds)
        new_files += _write_data_files(df, table, bloom_cols=bc, fields=flds)
    else:
        new_files += _write_data_files(df, table, fields=flds)
    new_files = [f for f in new_files if f["rows"] > 0]
    return _commit_rewrite(
        table,
        parent,
        {f["path"] for f in touched},
        new_files,
        "merge",
        batch_schema=batch_schema,
        # an interleaved commit whose new rows could share a key with this
        # batch would be silently shadowed by the rebase — recompute instead
        delta_safe=lambda f: not _overlaps(f),
    )


_TAG_RE = None  # compiled lazily


def _tags_dir(table: str) -> str:
    return os.path.join(_snap_path(table), "tags")


def _check_tag(name: str) -> None:
    import re

    global _TAG_RE
    if _TAG_RE is None:
        _TAG_RE = re.compile(r"^[A-Za-z0-9][A-Za-z0-9._-]*$")
    if not _TAG_RE.match(name):
        raise ValueError(f"invalid tag name {name!r}")


def snapshot_tag(table: str, name: str, version: int | None = None) -> int:
    """Pin a named, immutable reference to a version (default: current) —
    the dataset-release primitive (`corpus-v1.0` for a training run).
    Tagged versions survive ``expire_snapshots``; re-tagging an existing
    name raises (tags are immutable — delete via ``snapshot_untag``).

    Concurrency: runs under the table lock (an untagged version must not
    be expired between the manifest check and the tag landing), and the
    tag file is published with ``os.link`` — link fails with EEXIST if a
    concurrent tagger won, so the immutability guarantee holds under
    races (a check-then-rename would silently overwrite)."""
    _check_tag(name)
    with table_lock(table):
        v = current_version(table) if version is None else version
        read_manifest(table, v)  # must exist (raises NoSuchVersionError)
        if v == 0:
            raise NoSuchVersionError(f"{table}: cannot tag the empty version")
        os.makedirs(_tags_dir(table), exist_ok=True)
        path = os.path.join(_tags_dir(table), name)
        # hidden temp name: cannot collide with a valid tag (tags must
        # start alphanumeric), so listings just skip dotfiles
        tmp = os.path.join(_tags_dir(table), f".tmp-{uuid.uuid4()}")
        with open(tmp, "w") as fh:
            fh.write(str(v))
        try:
            os.link(tmp, path)  # atomic create-if-absent
        except FileExistsError:
            raise ValueError(
                f"tag {name!r} already exists (tags are immutable)"
            ) from None
        finally:
            os.remove(tmp)
        return v


def snapshot_untag(table: str, name: str) -> None:
    _check_tag(name)
    try:
        os.remove(os.path.join(_tags_dir(table), name))
    except FileNotFoundError:
        raise ValueError(f"no such tag {name!r}") from None


def snapshot_tags(table: str) -> dict[str, int]:
    """All tags → versions (empty dict for an untagged table)."""
    d = _tags_dir(table)
    if not os.path.isdir(d):
        return {}
    out = {}
    for name in os.listdir(d):
        if name.startswith("."):  # in-flight temp files only
            continue
        with open(os.path.join(d, name)) as fh:
            out[name] = int(fh.read().strip())
    return out


@_retry_on_conflict
def snapshot_delete(
    spark: SparkSession, table: str, where: list[tuple], *, mode: str = "cow"
) -> int:
    """Predicate DELETE as one atomic commit — the right-to-be-forgotten
    primitive a training-data lake cannot ship without.  ``where`` is the
    same ANDed ``(col, op, value)`` triple form as ``snapshot_read``; rows
    matching ALL triples are removed.

    ``mode='cow'`` (default) rewrites every touched file without the
    matching rows; ``mode='dv'`` (r6) is MERGE-ON-READ: the commit writes
    O(matches) position-delete entries and attaches them to the touched
    entries — no data file is rewritten.  At 100 TB a GDPR erasure batch
    touching 1% of files costs a terabyte of rewrite under COW and a few
    MB of (file, position) pairs under DV; reads merge the DVs until
    ``snapshot_compact`` applies and drops them.  Both modes produce
    identical reader-visible results (pinned in
    tests/test_deletion_vectors.py).

    Scale shape: the manifest stats decide which files COULD contain a
    matching row (``plan_files``); every other file is carried into the
    new version untouched — at 100 TB a clustered delete touches the
    handful of overlapping files, never the table (this is why Z-order
    compaction and stats-skipping pay off at the writer too, not just the
    reader).  Old versions still reference the pre-delete files: time
    travel sees the data until ``expire_snapshots`` drops it — run expiry
    to make a deletion PHYSICAL, exactly the Iceberg/Delta operational
    model (under DV, expiry reclaims superseded DV files the same way).

    Concurrency: a DV commit changes entries without replacing paths, so
    file-level OCC (``_commit_rewrite`` entry-identity validation) lets a
    DV delete commit concurrently with any rewrite or DV touching
    DISJOINT files; same-file races recompute transparently.
    """
    if not where:
        raise ValueError("snapshot_delete requires a non-empty predicate")
    if mode not in ("cow", "dv"):
        raise ValueError(f"mode must be cow|dv, got {mode!r}")
    parent = _repair_current(table)
    m = read_manifest(table, parent) if parent > 0 else {"files": []}
    flds = _fields_of(m)
    pwhere = _to_phys(where, flds)  # stats domain for delta validation
    touched = plan_files(table, version=parent, where=where)
    if mode == "dv":
        return _delete_dv(spark, table, parent, touched, where)
    touched_paths = {f["path"] for f in touched}
    new_files = []
    if touched:
        # merge-on-read: apply any existing DVs/eq-deletes before
        # rewriting, or the rewrite would resurrect deleted rows
        df = _read_entries(
            spark, touched, eq_deletes=_eq_items(m), fields=flds
        )
        # DELETE semantics: remove rows where the predicate is TRUE.
        # A NULL predicate (e.g. a NULL column value) must KEEP the row
        # — plain ~cond would evaluate NULL and drop it
        cond = _where_condition(df, where)
        survivors = df.filter(cond.isNull() | ~cond)
        written = _write_data_files(survivors, table, fields=flds)
        # an all-deleted rewrite leaves empty part files — keep the
        # manifest free of them (cheap footer check, no data read)
        new_files = [f for f in written if f["rows"] > 0]
    if not new_files and not touched:
        return parent  # stats prove nothing matched: no-op, no commit
    return _commit_rewrite(
        table,
        parent,
        touched_paths,
        new_files,
        "delete",
        # an interleaved commit may have added rows the predicate matches —
        # rebasing would resurrect them past the delete; recompute instead
        delta_safe=lambda f: not _file_admits(f, pwhere),
    )


def _write_dv(
    spark: SparkSession, table: str, touched: list[dict], matches: DataFrame
) -> tuple[list[str], dict[str, int]]:
    """Write a (file_path, pos) DV fileset and return (paths, per-file
    counts).  Part count is bounded by the worst case (every live row
    matches) so a huge erasure batch neither funnels through one task nor
    sprays files; per-file counts are read back from the WRITTEN fileset,
    so the recorded ``n`` is exactly what readers will anti-join (never a
    recomputed twin)."""
    from pyspark.sql import functions as F

    worst = sum(_live_rows(f) or 0 for f in touched)
    nparts = int(max(1, min(64, worst // _DV_FILE_TARGET_ROWS + 1)))
    dv_dir = os.path.join(table, "dv", uuid.uuid4().hex)
    matches.repartition(nparts).write.mode("error").parquet(dv_dir)
    dv_paths = sorted(
        os.path.join(dv_dir, n)
        for n in os.listdir(dv_dir)
        if n.endswith(".parquet")
    )
    counts = {
        r["file_path"]: int(r["n"])
        for r in spark.read.parquet(*dv_paths)
        .groupBy("file_path")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    return dv_paths, counts


def _dv_entries(
    touched: list[dict], dv_paths: list[str], counts: dict[str, int]
) -> list[dict]:
    """Touched entries with a new DV item appended (entries with zero
    matching positions are left untouched — they stay in the manifest as
    their base entries).  ``counts`` is keyed by the SCAN-side absolute
    path (``_scan_path``); a non-empty counts map that matches NO touched
    entry means the path domains diverged (symlinked roots etc.) — raise
    loudly, a silent no-op delete must never commit."""
    out = []
    matched = 0
    for f in touched:
        n = counts.get(_scan_path(f["path"]))
        if n:
            matched += n
            e = dict(f)
            e["dv"] = _dv_items(f) + [{"paths": dv_paths, "n": n}]
            out.append(e)
    if counts and matched != sum(counts.values()):
        raise RuntimeError(
            "deletion-vector path-domain mismatch: scan positions reference "
            "files no touched manifest entry resolves to — refusing to "
            "commit a partial delete"
        )
    return out


def _delete_dv(
    spark: SparkSession,
    table: str,
    parent: int,
    touched: list[dict],
    where: list[tuple],
) -> int:
    """The merge-on-read DELETE commit body: compute matching (file,
    position) pairs on the MERGED view of the touched files (existing DVs
    applied — new positions are therefore disjoint from every earlier
    commit's, keeping per-entry ``n`` sums exact), write them as a DV
    fileset, and commit entry updates only.  O(matches) data written; the
    table's data files are untouched."""
    from pyspark.sql import functions as F

    if not touched:
        return parent  # stats prove nothing matched: no-op, no commit
    m = read_manifest(table, parent)
    flds = _fields_of(m)
    pwhere = _to_phys(where, flds)
    scan = _read_entries(
        spark,
        touched,
        keep_position=True,
        eq_deletes=_eq_items(m),
        fields=flds,
    )
    cond = _where_condition(scan, where)
    matches = scan.filter(cond).select(
        F.col("_dv_fp").alias("file_path"), F.col("_dv_pos").alias("pos")
    )
    dv_paths, counts = _write_dv(spark, table, touched, matches)
    if not counts:
        # predicate matched nothing: no commit (the empty DV fileset is an
        # unreferenced orphan; expiry's grace window reclaims it)
        return parent
    new_entries = _dv_entries(touched, dv_paths, counts)
    return _commit_rewrite(
        table,
        parent,
        {e["path"] for e in new_entries},
        new_entries,
        "delete-dv",
        # same guard as COW delete: an interleaved commit may have added
        # rows the predicate matches — rebasing would let them escape
        delta_safe=lambda f: not _file_admits(f, pwhere),
    )


def _write_eq_keys(df: DataFrame, table: str) -> tuple[list[str], int, dict]:
    """Write key rows as an equality-delete fileset under ``eqd/``;
    returns (paths, row count, merged per-column bounds).  Bounds come
    from the WRITTEN files' parquet footers (the same conservative
    ``_file_stats`` machinery data entries use), merged across the
    fileset — a column missing stats in any file is simply unbounded."""
    import pyarrow.parquet as pq

    eq_dir = os.path.join(table, "eqd", uuid.uuid4().hex)
    df.write.mode("error").parquet(eq_dir)
    paths = sorted(
        os.path.join(eq_dir, name)
        for name in os.listdir(eq_dir)
        if name.endswith(".parquet")
    )
    rows = {p: pq.ParquetFile(p).metadata.num_rows for p in paths}
    n = sum(rows.values())
    per = [_file_stats(p) for p in paths if rows[p]]
    bounds: dict = {}
    for c in set.intersection(*[set(s) for s in per]) if per else ():
        bounds[c] = [
            min(s[c][0] for s in per),
            max(s[c][1] for s in per),
        ]
    return paths, n, bounds


def snapshot_delete_keys(df: DataFrame, table: str) -> int:
    """Equality DELETE (delete-by-key, r7): remove every row whose
    ``df.columns`` key tuple appears in ``df`` — as ONE commit of
    O(batch) key rows plus manifest metadata, with ZERO reads of the
    table (the Iceberg-v2 equality-delete rung under the position-delete
    one).  This is the primitive for keyed GDPR erasure and streaming
    CDC at 100 TB: a position delete must SCAN the touched files to find
    its positions; an equality delete only knows the keys — readers
    anti-join them (size-guarded broadcast), compaction converts the
    shadowed files to clean rewrites, and every commit garbage-collects
    fully-applied items.

    The key columns must exist in the table with EXACTLY matching types
    (a silently coerced key would match nothing).  NULL key values are
    refused loudly — SQL equality can never match them, and a silent
    no-op erasure must never commit (the ``_dv_entries`` rule).

    Lock-free append-shaped commit: the key fileset is unreferenced
    until the manifest lands; a lost CAS rebases onto the winner's file
    list (an equality delete commutes with every commit — it applies
    only to files with a strictly smaller sequence, and a concurrently
    appended file gets this read's parent+1 sequence, i.e. the delete
    serializes last, the DELETE-GDPR rule).  If the live files' key
    stats PROVE no key can match, nothing is committed."""
    from pyspark.sql import functions as F

    key_cols = list(df.columns)
    if not key_cols:
        raise ValueError("snapshot_delete_keys requires at least one key column")
    types = dict(snapshot_schema(table))
    missing = sorted(set(key_cols) - set(types))
    if missing:
        raise ValueError(f"snapshot_delete_keys: no such column(s) {missing}")
    bad = [(c, t, types[c]) for c, t in df.dtypes if t != types[c]]
    if bad:
        detail = ", ".join(f"{c}: {t} (table: {tt})" for c, t, tt in bad)
        raise ValueError(f"snapshot_delete_keys: key type mismatch — {detail}")
    batch = df.dropDuplicates(key_cols).localCheckpoint(eager=True)
    null_cond = None
    for c in key_cols:
        clause = F.col(c).isNull()
        null_cond = clause if null_cond is None else (null_cond | clause)
    if batch.filter(null_cond).limit(1).count():
        raise ValueError(
            "snapshot_delete_keys: NULL key values match nothing — refusing "
            "to commit a partial erasure"
        )
    paths, n, bounds = _write_eq_keys(batch, table)
    if n == 0:
        return _repair_current(table)
    # bounds compare against per-file stats, which are keyed by the
    # PHYSICAL column names
    physm = _phys_of(_fields_of(read_manifest(table)))
    bounds = {physm.get(c, c): v for c, v in bounds.items()}
    item = {"paths": paths, "key_cols": key_cols, "n": n, "bounds": bounds}
    for _ in range(_OCC_MAX_RETRIES):
        parent = _repair_current(table)
        files = read_manifest(table, parent)["files"] if parent > 0 else []
        # a probe with an always-later sequence: if no live entry admits
        # the key bounds, stats PROVE nothing matches — no-op, no commit
        if not any(_eq_applies(f, dict(item, seq=1 << 62)) for f in files):
            return parent
        try:
            return _publish(table, files, parent, "delete-eq", add_eq=[item])
        except CommitConflict:
            continue
    raise CommitConflict(
        f"snapshot_delete_keys on {table} lost {_OCC_MAX_RETRIES} CAS races"
    )


@_retry_on_conflict
def snapshot_update(
    spark: SparkSession,
    table: str,
    where: list[tuple],
    set_exprs: dict[str, str],
    *,
    mode: str = "cow",
) -> int:
    """Predicate UPDATE as one atomic commit — completes the DML triad
    (INSERT = write/upsert, DELETE, MERGE = keyed update; this is the
    ``UPDATE ... SET ... WHERE ...`` statement).  ``where`` is the ANDed
    triple form; ``set_exprs`` maps column → SQL expression evaluated per
    matched row.  Every SET expression sees the OLD row (standard UPDATE
    semantics — expressions never observe each other's writes), and
    expressions must be deterministic (the format's global rule; a
    rand()-ful expression would break rewrite-vs-recompute convergence).

    ``mode='cow'`` rewrites the stats-pruned touched files with the
    projection applied; ``mode='dv'`` (merge-on-read) shadows matched
    rows with O(matches) position deletes and appends the updated rows —
    an UPDATE costs O(matches), never a file rewrite, and CDC shows
    delete(old) + insert(new), exactly the MERGE-DV contract.  Both
    modes produce identical reader-visible results (test-pinned).

    Retyping a column raises :class:`SchemaEvolutionError` before any
    commit (additive-only evolution, same as every write path).  Scale
    and concurrency shape are ``snapshot_delete``'s: manifest stats
    bound the touched set, ``_commit_rewrite`` validates at file/entry
    granularity, and an interleaved commit whose files admit the
    predicate forces a transparent recompute.
    """
    from pyspark.sql import functions as F

    if not where:
        raise ValueError("snapshot_update requires a non-empty predicate")
    if not set_exprs:
        raise ValueError("snapshot_update requires at least one SET expression")
    if mode not in ("cow", "dv"):
        raise ValueError(f"mode must be cow|dv, got {mode!r}")
    parent = _repair_current(table)
    schema = snapshot_schema(table, parent)
    types = dict(schema)
    unknown = sorted(set(set_exprs) - set(types))
    if unknown:
        raise ValueError(f"snapshot_update: no such column(s) {unknown}")
    # type-check every SET expression against the table schema UP FRONT
    # (0-row analysis, driver-only): a retyping expression must raise
    # SchemaEvolutionError before any file is written — left to the commit
    # point, COW's when/otherwise would ANSI-coerce the OLD values into
    # the new type and die with a bare cast error mid-write instead
    probe = spark.createDataFrame(
        [], ", ".join(f"`{n}` {t}" for n, t in schema)
    ).select(*[F.expr(e).alias(c) for c, e in set_exprs.items()])
    retyped = [
        (c, types[c], t) for c, t in probe.dtypes if t != types[c]
    ]
    if retyped:
        detail = ", ".join(f"{c}: {old} -> {new}" for c, old, new in retyped)
        raise SchemaEvolutionError(
            f"additive evolution only — UPDATE retypes column(s): {detail}"
        )
    touched = plan_files(table, version=parent, where=where)
    if not touched:
        return parent  # stats prove nothing matched: no-op, no commit

    def _apply(df: DataFrame, only_matched: bool) -> DataFrame:
        cond = _where_condition(df, where)
        data_cols = [c for c in df.columns if c not in ("_dv_fp", "_dv_pos")]
        if only_matched:
            df = df.filter(cond)  # NULL predicate rows are unmatched
            proj = [
                F.expr(set_exprs[c]).alias(c) if c in set_exprs else F.col(c)
                for c in data_cols
            ]
        else:
            proj = [
                # NULL cond → otherwise branch → old value (unmatched)
                F.when(cond, F.expr(set_exprs[c])).otherwise(F.col(c)).alias(c)
                if c in set_exprs
                else F.col(c)
                for c in data_cols
            ]
        return df.select(*proj)

    um = read_manifest(table, parent)
    eq_ctx, uflds = _eq_items(um), _fields_of(um)
    pwhere = _to_phys(where, uflds)
    if mode == "dv":
        scan = _read_entries(
            spark, touched, keep_position=True, eq_deletes=eq_ctx, fields=uflds
        )
        cond = _where_condition(scan, where)
        matched = scan.filter(cond)
        # one scan feeds both the DV positions and the updated-row append
        matched = matched.localCheckpoint(eager=True)
        matches = matched.select(
            F.col("_dv_fp").alias("file_path"), F.col("_dv_pos").alias("pos")
        )
        dv_paths, counts = _write_dv(spark, table, touched, matches)
        if not counts:
            return parent  # predicate matched nothing
        dv_upd = _dv_entries(touched, dv_paths, counts)
        updated = _apply(matched, only_matched=True)
        appended = [
            f
            for f in _write_data_files(updated, table, fields=uflds)
            if f["rows"] > 0
        ]
        return _commit_rewrite(
            table,
            parent,
            {e["path"] for e in dv_upd},
            dv_upd + appended,
            "update-dv",
            batch_schema=_schema_of(updated),
            delta_safe=lambda f: not _file_admits(f, pwhere),
        )
    df = _read_entries(spark, touched, eq_deletes=eq_ctx, fields=uflds)
    updated = _apply(df, only_matched=False)
    bc = _common_bloom_cols(touched)
    new_files = [
        f
        for f in _write_data_files(updated, table, bloom_cols=bc, fields=uflds)
        if f["rows"] > 0
    ]
    return _commit_rewrite(
        table,
        parent,
        {f["path"] for f in touched},
        new_files,
        "update",
        batch_schema=_schema_of(updated),
        delta_safe=lambda f: not _file_admits(f, pwhere),
    )


@_retry_on_conflict
def snapshot_compact(
    spark: SparkSession,
    table: str,
    *,
    small_bytes: int = 8 << 20,
    sort_by: list[str] | None = None,
) -> int:
    """Rewrite every file smaller than ``small_bytes`` into consolidated
    files and commit the swap.  Readers pinned to older versions keep
    their exact file lists (immutability).  At 100 TB this is the
    steady-state answer to streaming ingest's small-file problem: compact
    touches only the small tail, never the already-right-sized bulk.

    ``sort_by`` clusters the rewritten rows (``OPTIMIZE ... ZORDER BY``
    equivalent when passed a Morton key column built with
    functions/zorder.py): a range repartition + within-file sort, so each
    rewritten file covers a tight key range and parquet min/max stats
    prune multi-dimensional predicates.

    Lock-free since r5: compaction never conflicts with interleaved
    APPENDS (their files simply stay uncompacted until the next run — the
    rebase carries them through), and a concurrent rewrite of a file this
    run consolidated triggers a recompute via file-level validation.

    Deletion vectors (r6) and equality deletes (r7): every entry carrying
    a DV or admitting a live equality delete is compacted REGARDLESS of
    size — compaction is where merge-on-read deletes become physical: the
    rewrite reads the merged view (DVs + eq keys applied), the new
    entries carry no DVs and a FRESH sequence (so eq items stop applying
    to them), the commit's GC drops fully-applied eq items, and expiry
    reclaims the unreferenced DV/key filesets."""
    parent = _repair_current(table)
    m = read_manifest(table, parent) if parent > 0 else {"files": []}
    eq = _eq_items(m)

    def _shadowed(f: dict) -> bool:
        return bool(_dv_items(f)) or any(_eq_applies(f, it) for it in eq)

    # declared sort order (r8): files written under a different (or no)
    # order are compaction candidates regardless of size — OPTIMIZE is
    # where the table converges to the declared layout
    splan, soid = _sort_plan_of(m)

    def _unsorted(f: dict) -> bool:
        return bool(soid) and f.get("sort_order_id") != soid

    small = [
        f
        for f in m["files"]
        if f["bytes"] < small_bytes or _shadowed(f) or _unsorted(f)
    ]
    if not small or (
        len(small) == 1 and not _shadowed(small[0]) and not _unsorted(small[0])
    ):
        return parent
    # mergeSchema: small files may straddle a schema evolution — a
    # plain read would take the first footer and silently DROP the
    # newer columns from the compacted rewrite; DVs/eq applied
    # merge-on-read
    df = _read_entries(spark, small, eq_deletes=eq, fields=_fields_of(m))
    total = sum(f["bytes"] for f in small)
    target_files = int(max(1, total // small_bytes))
    # r8: compaction RESTORES the default-spec layout — COW/merge/update
    # rewrites emit spec-less (conservatively-kept) files, and the
    # steady-state maintenance pass is where the table converges back to
    # partition-pruned; spec-less output only when no default spec is set.
    # Spec FIRST so the sorts below can lead with the partition columns —
    # the partitionBy writer re-sorts any child ordering that doesn't
    # satisfy that prefix, destroying the secondary sort keys (the
    # _stage_write rule)
    df, spec_kwargs = _apply_default_spec(df, m)
    pcols = spec_kwargs["partition_by"] if spec_kwargs else []
    if sort_by:
        df = df.repartitionByRange(target_files, *sort_by).sortWithinPartitions(
            *pcols, *sort_by
        )
    elif splan:
        df, skeys, tmp = _apply_sort_keys(df, splan)
        df = (
            df.repartitionByRange(target_files, *skeys)
            .sortWithinPartitions(*pcols, *skeys)
            .drop(*tmp)
        )
    else:
        df = df.coalesce(target_files)
    written = _write_data_files(
        df,
        table,
        bloom_cols=_common_bloom_cols(small),
        fields=_fields_of(m),
        **spec_kwargs,
    )
    # a fully-DV'd input can compact to zero rows — keep empty parts out
    new_files = [f for f in written if f["rows"] > 0]
    if splan and not sort_by:
        for f in new_files:
            f["sort_order_id"] = soid
    return _commit_rewrite(
        table,
        parent,
        {f["path"] for f in small},
        new_files,
        "compact",
        delta_safe=None,  # any concurrent addition is compaction-safe
    )


#: default maintenance-policy thresholds (snapshot_maintain)
_MAINT_DEFAULTS = {
    "small_bytes": 8 << 20,
    "max_small_files": 8,
    "max_dv_ppm": 100_000,  # 10% of physical rows shadowed by DVs
    "max_eq_items": 0,  # any live eq item blocks metadata-exact counts
    # files not written under the table's CURRENT default sort order
    # (always 0 when no order is declared — the trigger can only fire
    # once a user set one, and compaction converges it)
    "max_unsorted_files": 0,
}


def snapshot_table_health(table: str, version: int | None = None) -> dict:
    """The metadata-only signals a maintenance policy decides on: small-
    file count, live-DV position share (ppm of physical rows), and live
    equality-delete item count — O(manifest), no data read."""
    m = read_manifest(table, version)
    small_bytes = _MAINT_DEFAULTS["small_bytes"]
    rows = sum(f.get("rows") or 0 for f in m["files"])
    dv_pos = sum(i["n"] for f in m["files"] for i in _dv_items(f))
    soid = _sort_plan_of(m)[1]
    return {
        "version": m["version"],
        "files": len(m["files"]),
        "small_files": sum(
            1 for f in m["files"] if f["bytes"] < small_bytes
        ),
        "physical_rows": rows,
        "dv_positions": dv_pos,
        "dv_ppm": (dv_pos * 1_000_000) // max(rows, 1),
        "eq_items": len(_eq_items(m)),
        "unsorted_files": sum(
            1 for f in m["files"] if soid and f.get("sort_order_id") != soid
        ),
    }


def snapshot_maintain(
    spark: SparkSession,
    table: str,
    *,
    policy: dict | None = None,
    keep_last: int | None = None,
    orphan_grace_s: float = 3600.0,
    sort_by: list[str] | None = None,
) -> dict:
    """POLICY-driven maintenance (VERDICT r7 ask #3): evaluate the table's
    metadata health against thresholds and compact ONLY when a trigger
    fires — the scheduled OPTIMIZE loop a 100 TB lake runs, promoted from
    the manual CLI verb to a self-deciding operator.  Returns a report of
    every trigger's measured value and what was done.

    Triggers (``policy`` overrides ``_MAINT_DEFAULTS``):

    * ``max_small_files`` — files under ``small_bytes`` exceed the limit
      (streaming ingest's small-file tail);
    * ``max_dv_ppm`` — live deletion-vector positions exceed the given
      share of physical rows (merge-on-read debt slows every scan);
    * ``max_eq_items`` — live equality-delete items exceed the limit
      (0 by default: ANY live item makes ``snapshot_rowcount`` /
      ``snapshot_minmax`` refuse, so maintenance restores metadata-exact
      answers at the first opportunity).

    Compaction itself is the existing lock-free ``snapshot_compact`` —
    shadowed entries (DV or eq-admitting) are rewritten regardless of
    size, so ONE run clears all three debts; ``keep_last`` additionally
    expires history afterwards (VACUUM).  A healthy table is a provable
    no-op: no trigger fired, no commit, version unchanged."""
    pol = dict(_MAINT_DEFAULTS, **(policy or {}))
    before = snapshot_table_health(table)
    triggers = {
        "small_files": {
            "value": before["small_files"],
            "limit": pol["max_small_files"],
            "fired": before["small_files"] > pol["max_small_files"],
        },
        "dv_ppm": {
            "value": before["dv_ppm"],
            "limit": pol["max_dv_ppm"],
            "fired": before["dv_ppm"] > pol["max_dv_ppm"],
        },
        "eq_items": {
            "value": before["eq_items"],
            "limit": pol["max_eq_items"],
            "fired": before["eq_items"] > pol["max_eq_items"],
        },
        "unsorted_files": {
            "value": before["unsorted_files"],
            "limit": pol["max_unsorted_files"],
            "fired": before["unsorted_files"] > pol["max_unsorted_files"],
        },
    }
    compacted = False
    if any(t["fired"] for t in triggers.values()):
        v = snapshot_compact(
            spark, table, small_bytes=pol["small_bytes"], sort_by=sort_by
        )
        compacted = v > before["version"]
    reclaimed: list[str] = []
    if keep_last is not None:
        reclaimed = expire_snapshots(
            table, keep_last=keep_last, orphan_grace_s=orphan_grace_s
        )
    after = snapshot_table_health(table)
    try:
        rowcount = snapshot_rowcount(table)
    except RuntimeError:
        rowcount = None  # still-live eq items (nothing fired, or raced)
    return {
        "table": table,
        "triggers": triggers,
        "compacted": compacted,
        "paths_reclaimed": len(reclaimed),
        "before": before,
        "after": after,
        "metadata_rowcount": rowcount,
    }


def snapshot_diff(
    spark: SparkSession,
    table: str,
    *,
    v_from: int,
    v_to: int | None = None,
) -> DataFrame:
    """Row-level change feed between two committed versions: each result row
    carries ``_change ∈ {insert, delete}`` (an update appears as a delete of
    the old row + insert of the new).  CDC-by-time-travel — both versions
    are immutable file lists, so the diff is a null-safe multiset
    difference (``exceptAll``) each way and needs no change-tracking
    metadata at write time.

    Scale shape: the exceptAll runs over ONLY the entry delta — entries
    IDENTICAL in both manifests (same path, same deletion-vector list,
    same APPLICABLE equality-delete set) contribute identical row
    multisets to both sides and therefore cancel, so skipping them
    provably cannot change the result.  An append of 1 GB to a 100 TB
    table diffs 1 GB; a compaction (same rows, new files) diffs the
    rewritten slice and nets to zero rows; a DV delete diffs the touched
    files (each side reads them with ITS version's DVs applied) and nets
    to exactly the deleted rows; an equality delete diffs the files its
    key bounds admit (each side reads with ITS version's eq context) —
    the honest cost of a zero-read commit is a bounds-bounded read at
    diff time."""
    from pyspark.sql import functions as F

    mf = read_manifest(table, v_from)
    mt = read_manifest(table, v_to)
    eq_f, eq_t = _eq_items(mf), _eq_items(mt)
    ef = {f["path"]: f for f in mf["files"]}
    et = {f["path"]: f for f in mt["files"]}

    def _sig(f: dict, eq: list) -> str:
        return _dv_signature(f) + "|" + _eq_sig(f, eq)

    only_old = [
        ef[p]
        for p in sorted(ef)
        if p not in et or _sig(ef[p], eq_f) != _sig(et[p], eq_t)
    ]
    only_new = [
        et[p]
        for p in sorted(et)
        if p not in ef or _sig(et[p], eq_t) != _sig(ef[p], eq_f)
    ]
    schema_hint = sorted(set(ef) | set(et))
    if not schema_hint:
        raise NoSuchVersionError(f"{table}: both versions have no data files")

    ff, ft = _fields_of(mf), _fields_of(mt)

    def _align(df):
        """Project a v_from frame onto v_to's schema BY FIELD ID (r7):
        a renamed column lines up under its new name (a pure rename
        therefore nets zero rows), a dropped column is hidden (rows
        differing only there collapse — drop hides everywhere incl.
        CDC), a later-added column reads NULL, a widened column
        upcasts."""
        if not ff or not ft or ff == ft:
            return df
        by_id = {f["id"]: f for f in ff}
        cols = []
        for g in ft:
            f = by_id.get(g["id"])
            if f is None:
                cols.append(F.lit(None).cast(g["type"]).alias(g["name"]))
            else:
                cols.append(F.col(f["name"]).cast(g["type"]).alias(g["name"]))
        return df.select(*cols)

    def _read(entries, other=None, eq=None, fields=None, align=False):
        if entries:
            df = _read_entries(spark, entries, eq_deletes=eq, fields=fields)
            return _align(df) if align else df
        # empty side: take the schema from the populated side (free), or —
        # only when BOTH sides are empty — from a single file's footer.
        # Merging footers of every file in both manifests here would cost
        # O(#files) on each diff and pure appends (the common CDC case)
        # hit this branch every time.
        if other is not None:
            return spark.createDataFrame([], other.schema)
        return spark.read.parquet(schema_hint[0]).limit(0)

    if only_new:
        new = _read(only_new, eq=eq_t, fields=ft)
        old = _read(only_old, other=new, eq=eq_f, fields=ff, align=True)
    else:
        old = _read(only_old, eq=eq_f, fields=ff, align=True)
        new = _read(only_new, other=old, eq=eq_t, fields=ft)
    if set(old.columns) != set(new.columns):
        # the diff straddles a schema evolution: align both sides to the
        # union schema (NULL for the missing side) so exceptAll is legal —
        # a pre-evolution row then diffs against its widened twin on the
        # NULL-filled column, exactly mergeSchema's read semantics
        types = {**dict(old.dtypes), **dict(new.dtypes)}
        union_cols = old.columns + [c for c in new.columns if c not in set(old.columns)]
        old = old.select(
            *[
                F.col(c) if c in old.columns else F.lit(None).cast(types[c]).alias(c)
                for c in union_cols
            ]
        )
        new = new.select(
            *[
                F.col(c) if c in new.columns else F.lit(None).cast(types[c]).alias(c)
                for c in union_cols
            ]
        )
    elif old.columns != new.columns:
        new = new.select(*old.columns)  # mergeSchema order can differ per side
    inserted = new.exceptAll(old).withColumn("_change", F.lit("insert"))
    deleted = old.exceptAll(new).withColumn("_change", F.lit("delete"))
    return inserted.unionByName(deleted)


def expire_snapshots(
    table: str, *, keep_last: int = 2, orphan_grace_s: float = 3600.0
) -> list[str]:
    """Drop manifests older than the last ``keep_last`` versions and delete
    data files no retained manifest references.  TAGGED versions are
    always retained (their manifests and data files survive until
    ``snapshot_untag``) — a pinned corpus release stays reproducible
    through routine expiry, the Iceberg ref-retention model.  Returns
    deleted paths.

    ``orphan_grace_s`` (r4): an optimistic writer (snapshot_write /
    snapshot_upsert) writes its data files BEFORE they are referenced by
    any manifest — deleting every unreferenced file would race an
    in-flight commit and corrupt the table it produces.  Unreferenced
    files younger than the grace window are therefore kept (the Delta
    VACUUM retention model); a lost CAS attempt's orphans are reclaimed
    by the next expiry after the window."""
    with table_lock(table):
        # roll CURRENT over any fully-reserved manifest first (a writer
        # that crashed between CAS reservation and pointer bump): without
        # this, files referenced ONLY by manifest cur+1 look like orphans
        # and get vacuumed, leaving a later _repair_current pointing at a
        # manifest whose data is gone
        cur = _repair_current(table)
        tagged = set(snapshot_tags(table).values())
        retained_versions = sorted(
            set(range(max(1, cur - keep_last + 1), cur + 1)) | tagged
        )
        referenced: set[str] = set()
        referenced_segs: set[str] = set()
        for v in retained_versions:
            m = read_manifest(table, v)
            for f in m["files"]:
                referenced.add(f["path"])
                # deletion-vector files live exactly as long as an entry
                # references them; compaction drops the reference and the
                # next expiry reclaims the DV bytes
                referenced.update(p for i in _dv_items(f) for p in i["paths"])
            # equality-delete key filesets: live while any retained
            # manifest lists the item (commit-time GC drops applied items)
            referenced.update(p for it in _eq_items(m) for p in it["paths"])
            referenced_segs.update(m.get("segments") or [])
        # every path ANY existing manifest lists is a COMMITTED file — if
        # no retained version needs it, it is reclaimable immediately; a
        # path in NO manifest is either a lost CAS attempt's leftover or
        # an IN-FLIGHT optimistic write, distinguishable only by age
        ever_committed: set[str] = set()
        for v in range(1, cur + 1):
            try:
                mv = read_manifest(table, v)
                for f in mv["files"]:
                    ever_committed.add(f["path"])
                    ever_committed.update(
                        p for i in _dv_items(f) for p in i["paths"]
                    )
                ever_committed.update(
                    p for it in _eq_items(mv) for p in it["paths"]
                )
            except NoSuchVersionError:
                continue
        deleted = []
        now = time.time()
        # data files, DV filesets, and eq-delete key filesets share the
        # same reclaim rule
        for root_name in ("data", "dv", "eqd"):
            root = os.path.join(table, root_name)
            if not os.path.isdir(root):
                continue
            # recursive: partitioned commits (r8) nest hive dirs under the
            # commit dir, so a two-level listing would leak those files
            for d, _dirs, names in os.walk(root):
                for name in names:
                    p = os.path.join(d, name)
                    if not name.endswith(".parquet") or p in referenced:
                        continue
                    if (
                        p not in ever_committed
                        and now - os.path.getmtime(p) < orphan_grace_s
                    ):
                        continue  # possibly an in-flight optimistic write
                    os.remove(p)
                    deleted.append(p)
        for v in range(1, max(1, cur - keep_last + 1)):
            if v in tagged:
                continue  # pinned release: manifest survives expiry
            mp = _manifest_path(table, v)
            if os.path.exists(mp):
                os.remove(mp)
                deleted.append(mp)
            # an expired version's bucketed probe dir (hardlinks created
            # by bucketed_snapshot_frame) would otherwise keep the data
            # inodes alive after their last manifest reference is gone
            pd = os.path.join(table, "_probe", f"v{v:08d}")
            if os.path.isdir(pd):
                import shutil

                shutil.rmtree(pd, ignore_errors=True)
                deleted.append(pd)
        # bucketed-writer scratch dirs (sources/bucketed.py) are normally
        # removed by their writer's finally block; a crashed writer leaks
        # one — reclaim it after the same in-flight grace window
        scratch_root = os.path.join(table, "_scratch")
        if os.path.isdir(scratch_root):
            import shutil

            for sub in os.listdir(scratch_root):
                d = os.path.join(scratch_root, sub)
                if now - os.path.getmtime(d) >= orphan_grace_s:
                    shutil.rmtree(d, ignore_errors=True)
                    deleted.append(d)
        # segment files no retained manifest names; young unreferenced
        # segments may belong to an in-flight commit (staged before its
        # CAS) — same grace rule as data files
        segs_dir = _segs_path(table)
        if os.path.isdir(segs_dir):
            for name in os.listdir(segs_dir):
                p = os.path.join(segs_dir, name)
                if name in referenced_segs:
                    continue
                if now - os.path.getmtime(p) < orphan_grace_s:
                    continue
                os.remove(p)
                _SEG_CACHE.pop(p, None)
                deleted.append(p)
        return deleted


def snapshot_rowcount(table: str, version: int | None = None) -> int:
    """COUNT(*) answered from the manifest alone — O(files) metadata, no
    data read (the Delta log-stats count pushdown).  Deletion vectors
    keep this EXACT: each entry subtracts its recorded DV position counts
    (disjoint across commits by construction — positions are computed on
    the merged view).  Falls back to one footer read per legacy file
    entry written before row counts were recorded.

    Live EQUALITY deletes make the exact count UNKNOWABLE without a data
    read (the delete never counted its matches — that is the point of a
    zero-read commit), so this REFUSES rather than guesses; run
    ``snapshot_compact`` to apply the deletes and restore metadata
    counts, or count via ``snapshot_read``."""
    m = read_manifest(table, version)
    if _eq_items(m):
        raise RuntimeError(
            f"{table}: live equality deletes make the metadata row count "
            "unknowable — compact to apply them, or count via snapshot_read"
        )
    total = 0
    for f in m["files"]:
        live = _live_rows(f)
        if live is not None:
            total += live
        else:  # legacy entry: footer metadata read, still no data scan
            import pyarrow.parquet as pq

            total += pq.ParquetFile(f["path"]).metadata.num_rows - sum(
                i["n"] for i in _dv_items(f)
            )
    return total


def snapshot_minmax(
    table: str, col: str, version: int | None = None
) -> tuple | None:
    """(min, max) of ``col`` answered from per-file manifest stats alone —
    O(files) metadata, no data read (the Delta/Iceberg stats-pushdown for
    MIN/MAX aggregates).  Returns None when ANY live file lacks stats for
    the column (a metadata answer would be wrong, not approximate — the
    caller must fall back to a scan).  COW rewrites keep stats exact for
    live rows; a file carrying a DELETION VECTOR does not — its stats may
    describe only DV-deleted rows, so any DV'd file forces the None
    fallback (pruning via ``plan_files`` stays valid: stats remain
    conservative bounds; only the exact metadata-only ANSWER is off the
    table until compaction applies the DVs).  Live equality deletes
    force the same honest None — any matching row might be the extreme."""
    m = read_manifest(table, version)
    if _eq_items(m):
        return None
    col = _phys_of(_fields_of(m)).get(col, col)  # stats are keyed physical
    lo = hi = None
    for f in m["files"]:
        if _dv_items(f):
            return None  # min/max row may be deleted: metadata can't prove it
        st = f.get("stats", {}).get(col)
        if st is None:
            return None
        flo, fhi = st
        if flo is None or fhi is None:
            return None
        lo = flo if lo is None or flo < lo else lo
        hi = fhi if hi is None or fhi > hi else hi
    return None if lo is None else (lo, hi)


def snapshot_restore(table: str, version: int | None = None, *, tag: str | None = None) -> int:
    """Roll the table BACK to an earlier state as a NEW commit (Delta
    RESTORE / Iceberg rollback): the restored version's exact file list is
    re-committed at head, so history is append-only — the bad commits
    remain inspectable and time-travelable, and readers pinned to them are
    untouched.  Restoring to a TAGGED release (``tag=``) is the
    bad-training-run escape hatch: one commit returns the corpus to the
    pinned state.

    No data is copied (manifests reference immutable files), so restore is
    O(manifest) at any table size.  Optimistic like every append-shaped
    commit: CAS with rebase-free retry (restore is a whole-table
    statement; last writer wins on a race, same as overwrite).
    """
    if (version is None) == (tag is None):
        raise ValueError("pass exactly one of version / tag")
    if tag is not None:
        tags = snapshot_tags(table)
        if tag not in tags:
            raise NoSuchVersionError(f"{table}: no tag {tag!r}")
        version = tags[tag]
    # under the TABLE lock: expiry also holds it, so the restored
    # version's files cannot be reclaimed between the existence check and
    # the commit (restore is metadata-only — the hold is microseconds);
    # optimistic appends don't take this lock, so the commit is still the
    # CAS with retry
    with table_lock(table):
        restored = read_manifest(table, version)  # raises if expired
        files = restored["files"]
        eq_paths = [p for it in _eq_items(restored) for p in it["paths"]]
        for f in files:
            for p in (
                [f["path"]]
                + [q for i in _dv_items(f) for q in i["paths"]]
                + eq_paths
            ):
                if not os.path.exists(p):
                    raise NoSuchVersionError(
                        f"{table}: v{version} references expired file {p}"
                    )
        parent = _repair_current(table)
        if parent == version:
            return parent
        for _ in range(_OCC_MAX_RETRIES):
            try:
                # restore rolls the SCHEMA back with the data — and the
                # EQUALITY-DELETE context and sequence floor with it, so
                # the restored entries (which keep their original seqs)
                # read exactly as version N's readers saw them
                return _publish(
                    table,
                    files,
                    parent,
                    f"restore@{version}",
                    batch_schema=restored.get("schema"),
                    replace=restored.get("schema") is not None,
                    eq_deletes=_eq_items(restored),
                    last_seq_floor=restored.get("last_seq", version),
                    fields=_fields_of(restored),
                    retired=restored.get("retired_phys"),
                    stamp_new=False,
                    # spec history rolls back with the data (an empty list
                    # is an explicit override, never "inherit the parent")
                    specs=restored.get("specs") or [],
                    default_spec_id=restored.get("default_spec_id", 0),
                    sort_orders=restored.get("sort_orders") or [],
                    default_sort_order_id=restored.get(
                        "default_sort_order_id", 0
                    ),
                )
            except CommitConflict:
                parent = _repair_current(table)
    raise CommitConflict(f"snapshot_restore on {table} lost {_OCC_MAX_RETRIES} CAS races")


def _alter_fields(table: str, op: str, mutate) -> int:
    """Shared CAS loop for the metadata-only DDL commits (rename / drop /
    widen): ``mutate(fields, retired, manifest)`` returns the new
    (fields, retired); the file list, eq context, and sequence counter
    carry through unchanged.  Append-shaped: a lost CAS re-reads and
    re-validates on the winner's registry."""
    for _ in range(_OCC_MAX_RETRIES):
        parent = _repair_current(table)
        m = read_manifest(table, parent) if parent > 0 else None
        fields = _fields_of(m)
        if not fields:
            raise SchemaEvolutionError(
                f"{table}: no committed schema to alter (empty table)"
            )
        new_fields, retired = mutate(
            [dict(f) for f in fields], list((m or {}).get("retired_phys") or []), m
        )
        try:
            return _publish(
                table,
                m["files"],
                parent,
                op,
                fields=new_fields,
                retired=retired,
            )
        except CommitConflict:
            continue
    raise CommitConflict(f"{op} on {table} lost {_OCC_MAX_RETRIES} CAS races")


def _eq_referenced_cols(m: dict | None) -> set[str]:
    return {c for it in _eq_items(m or {}) for c in it["key_cols"]}


def snapshot_rename_column(table: str, old: str, new: str) -> int:
    """RENAME a column as one metadata-only commit (r7 non-additive
    evolution — the first migration every long-lived table hits).  The
    field keeps its id and its immutable PHYSICAL name, so every existing
    data file keeps reading correctly and no byte is rewritten; new
    writes land under the same physical name.  Time travel shows each
    version's own logical schema.  Refused when ``new`` collides with a
    live logical name or any reserved physical name, and when a LIVE
    equality delete references ``old`` (its stored key files are keyed by
    the old name — compact first)."""

    if not new or not isinstance(new, str):
        raise ValueError(f"snapshot_rename_column: invalid new name {new!r}")

    def mutate(fields, retired, m):
        names = {f["name"] for f in fields}
        if old not in names:
            raise ValueError(f"snapshot_rename_column: no such column {old!r}")
        if new in names:
            raise SchemaEvolutionError(f"column {new!r} already exists")
        reserved = {f["phys"] for f in fields if f["name"] != old} | set(retired)
        if new in reserved:
            raise SchemaEvolutionError(
                f"column name {new!r} is reserved by this table's rename/"
                f"drop history — pick a different name"
            )
        if old in _eq_referenced_cols(m):
            raise SchemaEvolutionError(
                f"column {old!r} is referenced by a live equality delete — "
                f"run snapshot_compact first"
            )
        for f in fields:
            if f["name"] == old:
                f["name"] = new
        return fields, retired

    return _alter_fields(table, f"rename:{old}->{new}", mutate)


def snapshot_drop_column(table: str, col: str) -> int:
    """DROP a column as one metadata-only commit: the field leaves the
    registry and its physical name is RETIRED — old files keep the bytes
    (time travel to pre-drop versions still shows them) but every reader
    of this and later versions (snapshot_read, CDC, diff) hides the
    column, and the name can never be silently re-used over the dead
    bytes.  Refused for the last column and for live eq-delete keys."""

    def mutate(fields, retired, m):
        hit = [f for f in fields if f["name"] == col]
        if not hit:
            raise ValueError(f"snapshot_drop_column: no such column {col!r}")
        if len(fields) == 1:
            raise SchemaEvolutionError("cannot drop the only column")
        if col in _eq_referenced_cols(m):
            raise SchemaEvolutionError(
                f"column {col!r} is referenced by a live equality delete — "
                f"run snapshot_compact first"
            )
        spec, _sid = _default_spec(m)
        if spec and any(sf["src_id"] == hit[0]["id"] for sf in spec["fields"]):
            raise SchemaEvolutionError(
                f"column {col!r} is a source of the default partition spec "
                f"— snapshot_set_partition_spec first"
            )
        order, _oid = _default_sort_order(m)
        if order and any(
            hit[0]["id"] in (of.get("src_ids") or [of["src_id"]])
            for of in order["fields"]
        ):
            raise SchemaEvolutionError(
                f"column {col!r} is a source of the default sort order "
                f"— snapshot_set_sort_order first"
            )
        return (
            [f for f in fields if f["name"] != col],
            retired + [hit[0]["phys"]],
        )

    return _alter_fields(table, f"drop-column:{col}", mutate)


def snapshot_widen_column(table: str, col: str, new_type: str) -> int:
    """WIDEN a column's type along the safe lattice (int→bigint,
    float→double, ...) as one metadata-only commit: existing files keep
    their narrower physical type and Spark's parquet reader upcasts them
    exactly under the widened read schema; later batches may write either
    width.  Any non-widening change is refused — that is an overwrite,
    not an evolution."""

    if not new_type or not isinstance(new_type, str):
        raise ValueError(f"snapshot_widen_column: invalid type {new_type!r}")

    def mutate(fields, retired, m):
        hit = [f for f in fields if f["name"] == col]
        if not hit:
            raise ValueError(f"snapshot_widen_column: no such column {col!r}")
        cur = hit[0]["type"]
        if cur == new_type:
            return fields, retired  # idempotent no-op (still commits)
        if (cur, new_type) not in _WIDENS:
            raise SchemaEvolutionError(
                f"{col}: {cur} -> {new_type} is not a safe widening"
            )
        for f in fields:
            if f["name"] == col:
                f["type"] = new_type
        return fields, retired

    return _alter_fields(table, f"widen:{col}:{new_type}", mutate)


class AuditFailed(RuntimeError):
    """snapshot_write_audited: the batch violated its expectations; nothing
    was committed.  ``report`` holds the failing rule rows."""

    def __init__(self, report: list):
        self.report = report
        failing = ", ".join(f"{r['rule_id']}:{r['rule']}({r['col']})" for r in report)
        super().__init__(f"audit failed — no commit: {failing}")


def snapshot_write_audited(
    df: DataFrame,
    table: str,
    *,
    rules: list[dict],
    mode: str = "append",
    cluster_by: list[str] | None = None,
    cluster_files: int | None = None,
    bloom_cols: list[str] | None = None,
) -> int:
    """Write-audit-publish (the WAP gate, thin form): evaluate the
    declarative expectations (operators/expectations.py rule vocabulary)
    against the BATCH, and commit only if every rule passes — a corpus
    release that fails its quality gate never becomes a version, so
    downstream consumers (and time travel) only ever see audited states.
    Raises :class:`AuditFailed` with the failing report rows otherwise;
    since validation runs BEFORE any file is written, a failed audit
    leaves no orphans to vacuum.

    The audit is one extra pass over the batch (the expectation engine's
    single shared aggregation), trivially parallel at any batch size; the
    commit itself is the usual optimistic CAS.
    """
    from agf_data_ingestion_spark.operators.expectations import check_expectations

    df = df.localCheckpoint(eager=True)  # audit + write must see one batch
    report = check_expectations(df, rules)
    failing = [r.asDict() for r in report.filter(~report["pass"]).collect()]
    if failing:
        raise AuditFailed(failing)
    return snapshot_write(
        df,
        table,
        mode=mode,
        cluster_by=cluster_by,
        cluster_files=cluster_files,
        bloom_cols=bloom_cols,
    )
