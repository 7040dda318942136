"""Streaming change-data-feed source over the snapshot table format —
the Delta CDF / Iceberg incremental-read analog: ``readStream`` a
snapshot table and receive one micro-batch per committed version, each
row tagged ``_change ∈ {insert, delete}`` and ``_commit_version``.

Spark 4 Python DataSource (``SimpleDataSourceStreamReader``, same
machinery as sources/synth.py).  Offsets are ``{"version": v}``; a
micro-batch advances over every newly committed version (one
``read()`` prefetch per trigger), emitting each commit's row-level
delta with the same entry-delta rule as ``snapshot_diff``: entries
present in both manifests with the same deletion-vector list cancel
(identical row multisets on both sides), so only the commit's
added/removed/DV-touched files are ever read — an append of one batch
to a 100 TB table reads one batch, a DV delete reads the touched slice.  Manifests are immutable, so ``readBetweenOffsets`` (checkpoint
recovery) regenerates any batch bit-identically — the replayable-source
contract, with no change-tracking metadata written at commit time.

The delta is computed driver-side with pyarrow (a Python DataSource
reader cannot launch nested Spark jobs); per-version deltas are
commit-sized by construction, which is exactly the scale this is for —
a CDC consumer tails commits, it does not re-read the table.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql.datasource import (
    DataSource,
    SimpleDataSourceStreamReader,
)

from agf_data_ingestion_spark.sources.snapshots import (
    current_version,
    read_manifest,
)

_TYPE_MAP = {
    "int64": "bigint",
    "int32": "int",
    "int16": "smallint",
    "int8": "tinyint",
    "double": "double",
    "float": "float",
    "string": "string",
    "large_string": "string",
    "bool": "boolean",
    "date32[day]": "date",
}


def _arrow_ddl(field) -> str:
    t = str(field.type)
    if t in _TYPE_MAP:
        return _TYPE_MAP[t]
    if t.startswith("timestamp"):
        return "timestamp_ntz"
    raise ValueError(f"snapshot CDC stream: unsupported column type {t!r}")


def _table_schema_ddl(table: str) -> str:
    import pyarrow.parquet as pq

    # prefer the current snapshot; a currently-EMPTY table (delete-all /
    # empty overwrite) still has a well-defined CDC replay, so fall back
    # through retained history for any schema-bearing manifest
    m = read_manifest(table)
    if not m["files"] and not m.get("schema"):
        for v in range(current_version(table), 0, -1):
            try:
                m = read_manifest(table, v)
            except Exception:
                continue
            if m["files"] or m.get("schema"):
                break
    if m.get("schema"):
        # the manifest's LOGICAL schema (r7: registry names — renamed
        # columns stream under their current name, dropped ones are
        # hidden); Spark TimestampType rows are normalized to naive UTC
        # by _norm_val, so they must be declared ntz
        cols = ", ".join(
            f"`{n}` {'timestamp_ntz' if t == 'timestamp' else t}"
            for n, t in m["schema"]
        )
        return f"_change string, _commit_version bigint, {cols}"
    if not m["files"]:
        raise ValueError(f"{table}: no committed data files to infer a schema from")
    sch = pq.read_schema(m["files"][0]["path"])
    cols = ", ".join(f"`{f.name}` {_arrow_ddl(f)}" for f in sch)
    return f"_change string, _commit_version bigint, {cols}"


def _dv_positions(entries: list[dict]) -> dict[str, set[int]]:
    """{SCAN-side absolute data file path: deleted physical positions}
    for the entries' deletion vectors — read driver-side with pyarrow
    (DV filesets are O(deleted rows), commit-sized by the same argument
    as the delta).  DV records are keyed by the scan-side absolute path
    (``_scan_path``): manifests may store relative paths, so lookups must
    normalize through the same helper."""
    import pyarrow.parquet as pq

    from agf_data_ingestion_spark.sources.snapshots import _scan_path

    wanted = {_scan_path(f["path"]) for f in entries if f.get("dv")}
    if not wanted:
        return {}
    paths = sorted(
        {p for f in entries for i in (f.get("dv") or []) for p in i["paths"]}
    )
    out: dict[str, set[int]] = {}
    for p in paths:
        tbl = pq.read_table(p)
        for fp, pos in zip(
            tbl.column("file_path").to_pylist(), tbl.column("pos").to_pylist()
        ):
            if fp in wanted:
                out.setdefault(fp, set()).add(pos)
    return out


def _norm_val(v):
    """tz-aware timestamps (Spark TimestampType writes parquet as UTC-
    adjusted) normalize to naive UTC so they match the declared
    ``timestamp_ntz`` schema instead of being session-timezone-shifted
    by the converter — applied to data rows AND eq-delete keys so the
    two compare in one domain."""
    import datetime as _dt

    if isinstance(v, _dt.datetime) and v.tzinfo is not None:
        return v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
    return v


def _eq_key_sets(eq_list: list[dict], fields_v=None):
    """[(physical key column names under THIS version's registry, item,
    set of key tuples)] for the version's equality deletes — loaded
    driver-side with pyarrow (key filesets are O(deleted keys),
    commit-sized).  Key values are read from the data files by PHYSICAL
    name, never through the stream's CURRENT logical schema: a key
    column renamed or dropped AFTER the item was applied+GC'd must not
    break historical replay (rename is only refused while the item is
    LIVE, so ``key_cols`` match the version's logical names and map
    through its registry)."""
    import pyarrow.parquet as pq

    from agf_data_ingestion_spark.sources.snapshots import _phys_of

    physm = _phys_of(fields_v) if fields_v else {}
    out = []
    for it in eq_list or []:
        phys = [physm.get(c, c) for c in it["key_cols"]]
        keys: set = set()
        for p in sorted(it["paths"]):
            tbl = pq.read_table(p)
            cols = [
                [_norm_val(v) for v in tbl.column(c).to_pylist()]
                for c in it["key_cols"]
            ]
            keys.update(zip(*cols))
        out.append((phys, it, keys))
    return out


def _rows_of(
    entries: list[dict],
    names: list[str],
    eq_list=None,
    phys=None,
    fields_v=None,
) -> Counter:
    """Multiset of row tuples from manifest file ENTRIES, deletion
    vectors AND applicable equality deletes applied (physical row index
    == pyarrow's whole-file read order — the same contract
    ``_metadata.row_index`` exposes on the Spark read path).  Column
    order pinned to ``names``; ``phys`` (r7) is the parallel list of
    PHYSICAL column names under this version's field registry — None for
    a column that did not exist at this version (reads as NULL);
    ``fields_v`` is the version's registry, used to resolve eq-delete
    key columns to their physical names (a key column may be absent
    from the CURRENT schema entirely)."""
    import pyarrow.parquet as pq

    from agf_data_ingestion_spark.sources.snapshots import (
        _eq_applies,
        _scan_path,
    )

    dead = _dv_positions(entries)
    eq_sets = _eq_key_sets(eq_list, fields_v)
    phys = phys or list(names)
    out: Counter = Counter()
    for f in sorted(entries, key=lambda e: e["path"]):
        tbl = pq.read_table(f["path"])
        cols = [
            [_norm_val(v) for v in tbl.column(p).to_pylist()]
            if p is not None and p in tbl.column_names
            else [None] * tbl.num_rows
            for p in phys
        ]
        gone = dead.get(_scan_path(f["path"]), ())
        applicable = [
            (pcols, keys) for pcols, it, keys in eq_sets if _eq_applies(f, it)
        ]
        kvals: dict[str, list] = {}
        for pcols, _ in applicable:
            for p in pcols:
                if p not in kvals:
                    kvals[p] = (
                        [_norm_val(v) for v in tbl.column(p).to_pylist()]
                        if p in tbl.column_names
                        else [None] * tbl.num_rows
                    )
        for pos, row in enumerate(zip(*cols)):
            if pos in gone:
                continue
            if any(
                tuple(kvals[p][pos] for p in pcols) in keys
                for pcols, keys in applicable
            ):
                continue
            out[row] += 1
    return out


class SnapshotCDCStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options, names: list[str]):
        self.table = options["table"]
        self.names = names
        start = options.get("startingVersion")
        self._start = int(start) if start is not None else 0
        # the stream's names are the CURRENT logical schema; per-version
        # deltas map each to that version's PHYSICAL column by field id
        # (r7 renames — ids are stable, physical names immutable)
        from agf_data_ingestion_spark.sources.snapshots import _fields_of

        self._id_of = {
            f["name"]: f["id"]
            for f in _fields_of(read_manifest(self.table)) or []
        }

    def _phys_for(self, m: dict) -> list:
        from agf_data_ingestion_spark.sources.snapshots import _fields_of

        fields_v = _fields_of(m)
        if fields_v is None or not self._id_of:
            return list(self.names)  # legacy: logical == physical
        by_id = {f["id"]: f["phys"] for f in fields_v}
        return [by_id.get(self._id_of.get(n)) for n in self.names]

    def initialOffset(self) -> dict:
        return {"version": self._start}

    def _delta(self, v: int):
        """The row-level changes committed by version ``v``.  Entries
        cancel only when path, deletion-vector list AND applicable
        equality-delete set all match — both delete forms change what an
        unmoved file reads as, and each side must read the touched file
        with ITS version's delete context so the delta nets to exactly
        the deleted rows (same rule as ``snapshot_diff``)."""
        from agf_data_ingestion_spark.sources.snapshots import (
            _dv_signature,
            _eq_sig,
            _fields_of,
        )

        mf = read_manifest(self.table, v - 1) if v > 1 else {"files": []}
        mt = read_manifest(self.table, v)
        eq_f = mf.get("eq_deletes") or []
        eq_t = mt.get("eq_deletes") or []

        def _sig(f, eq):
            return _dv_signature(f) + "|" + _eq_sig(f, eq)

        ef = {f["path"]: f for f in mf["files"]}
        et = {f["path"]: f for f in mt["files"]}
        removed = _rows_of(
            [
                ef[p]
                for p in sorted(ef)
                if p not in et or _sig(ef[p], eq_f) != _sig(et[p], eq_t)
            ],
            self.names,
            eq_f,
            self._phys_for(mf),
            _fields_of(mf),
        )
        added = _rows_of(
            [
                et[p]
                for p in sorted(et)
                if p not in ef or _sig(et[p], eq_t) != _sig(ef[p], eq_f)
            ],
            self.names,
            eq_t,
            self._phys_for(mt),
            _fields_of(mt),
        )
        rows = []
        for r in sorted(added.keys() | removed.keys(), key=repr):
            n = added[r] - removed[r]
            change = "insert" if n > 0 else "delete"
            for _ in range(abs(n)):
                rows.append((change, v) + r)
        return rows

    def read(self, start: dict):
        v = start["version"]
        cur = current_version(self.table)
        if cur <= v:
            # nothing committed: MUST be an iterator, not a list — when
            # end == start the wrapper's add_result_to_cache probes the
            # result with next() (to reject a non-advancing non-empty
            # batch), and a bare list raises TypeError.  availableNow
            # runs never hit this (they only trigger when data exists);
            # continuous processing-time triggers hit it on the first
            # idle trigger (found by scripts/measure_streaming.py).
            return iter(()), start
        # advance over ALL newly committed versions in one batch (the
        # runtime prefetches a single read() per trigger); every row still
        # carries its own _commit_version, so per-commit attribution and
        # ordering survive the batching
        rows = []
        for nv in range(v + 1, cur + 1):
            rows.extend(self._delta(nv))
        return rows, {"version": cur}

    def readBetweenOffsets(self, start: dict, end: dict):
        # REPLAY path: after a crash the checkpointed offsets re-read on
        # the EXECUTOR, whose reader requires an iterator — a bare list
        # here fails only on recovery (found by tests/test_crash_recovery)
        rows = []
        for v in range(start["version"] + 1, end["version"] + 1):
            rows.extend(self._delta(v))
        return iter(rows)


class SnapshotCDCSource(DataSource):
    """Register with ``spark.dataSource.register(SnapshotCDCSource)``, then
    ``spark.readStream.format("agf_snapshot_cdc").option("table", path)``.
    Options: ``table`` (required), ``startingVersion`` (default 0 = full
    history from the first commit)."""

    @classmethod
    def name(cls):
        return "agf_snapshot_cdc"

    def schema(self):
        return _table_schema_ddl(self.options["table"])

    def simpleStreamReader(self, schema):
        # the first TWO fields are this source's metadata columns; the
        # rest are data columns verbatim (which may legitimately start
        # with '_' — e.g. quarantine tables carry _violated/_batch_id)
        names = [f.name for f in schema.fields[2:]]
        return SnapshotCDCStreamReader(self.options, names)
