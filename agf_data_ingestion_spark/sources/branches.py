"""Snapshot BRANCHES: zero-copy forks with fast-forward publish
(OP-X-BRANCH) — the Iceberg branch / Delta shallow-clone write model.

The r4 audited commit (write-audit-publish) validates ONE batch before
it lands; a branch generalizes WAP to a whole SEQUENCE of commits: fork
the table, run any number of appends / upserts / DV-deletes / merges /
compactions against the fork, audit the result, then publish the
branch's final state back as a single atomic parent commit — or drop
the branch and the parent never saw any of it.  This is the standard
staging pattern for risky corpus surgery at 100 TB (re-tokenize, bulk
PII scrub, experimental filter sweep): the production table stays
readable and writable-by-others the whole time, and the publish is one
manifest swap.

Design (everything reuses the existing single-table machinery — a
branch IS a snapshot table):

* **Fork is O(manifest), zero data copy.**  ``snapshot_branch`` pins the
  fork version with an immutable TAG on the parent (``branch-<name>``) —
  tagged versions and their files survive ``expire_snapshots``
  (sources/snapshots.py), so the parent's routine expiry can never
  vacuum a file the branch still references — then commits the fork
  version's exact entry list as v1 of a fresh table rooted at
  ``<table>/_branches/<name>``.  Entries are deep-copied verbatim
  (manifest paths are stored as-is — the CLAUDE.md relative-path rule),
  so branch commits reference the parent's immutable data files in
  place.
* **Every snapshot operation works on the branch root unchanged** —
  ``snapshot_write/upsert/merge/delete/compact/read`` all take a table
  path; OCC, time travel, CDC, DV, expiry apply per-branch.  New data
  lands under the BRANCH's own ``data/``/``dv/`` tree; parent-owned
  files are never mutated (commits only replace manifest entries).
* **Publish is strict fast-forward** (Iceberg's
  ``fast_forward(main, branch)`` rule): if the parent advanced past the
  fork version, :class:`BranchDiverged` is raised — rebase by
  re-forking.  Otherwise the branch's current entries are committed on
  the parent as one replace-shaped commit (the ``snapshot_restore``
  pattern: files + schema travel together).  Branch-LOCAL files are
  relocated into the parent's tree by ``os.link`` — O(files) metadata,
  no data movement, and the parent owns its references outright, so
  dropping the branch afterwards can never orphan the parent (hardlink
  inodes survive the branch rmtree).  Runs under the parent table lock
  so expiry cannot reclaim the just-linked files before the manifest
  lands (hardlinks keep the ORIGINAL inode mtime — a fresh link to an
  old file would otherwise look like an expired orphan, not an
  in-flight write).
* **Publish is itself a commit**, so history on the parent is
  append-only: time travel to the pre-publish version still works, the
  op label records the branch name and branch version, and CDC/diff
  see exactly the branch's net effect (unchanged parent entries keep
  their entry identity and cancel).

The reference has no multi-writer staging story at all (its arbiter
serializes single-object writes, agf_ingestion_lambda.py:227-236); this
is part of the 100 TB storage extension alongside OP-X-SNAPSHOT /
OP-X-OCC / OP-X-DV.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from agf_data_ingestion_spark.operators.locking import table_lock
from agf_data_ingestion_spark.sources.snapshots import (
    CommitConflict,
    NoSuchVersionError,
    _dv_items,
    _fields_of,
    _manifest_op,
    _publish,
    _repair_current,
    _scan_path,
    current_version,
    read_manifest,
    snapshot_tag,
    snapshot_tags,
    snapshot_untag,
)

_BRANCH_DIR = "_branches"


class BranchDiverged(RuntimeError):
    """The parent advanced past the branch's fork version — a fast-forward
    publish is impossible.  Re-fork from the new head (and replay the
    branch's work) to rebase; nothing was committed."""


def _check_branch(name: str) -> None:
    # same alphabet as tags: the fork tag embeds the branch name
    import re

    if not re.match(r"^[A-Za-z0-9][A-Za-z0-9._-]*$", name):
        raise ValueError(f"invalid branch name {name!r}")


def _fork_tag(name: str) -> str:
    return f"branch-{name}"


def branch_root(table: str, name: str) -> str:
    """The branch's table root — pass it to any snapshot_* function."""
    _check_branch(name)
    return os.path.join(table, _BRANCH_DIR, name)


def _deep_entries(m: dict) -> list[dict]:
    # manifest entries nest DV filesets; copy all the way down so branch
    # commits can never alias the parent's (or the cache's) dicts
    return json.loads(json.dumps(m["files"]))


def snapshot_branch(table: str, name: str, version: int | None = None) -> str:
    """Fork ``table`` at ``version`` (default: current) into a new branch;
    returns the branch root.  O(manifest), zero data copy; the fork
    version is tag-pinned on the parent until ``snapshot_branch_drop``."""
    root = branch_root(table, name)
    if os.path.isdir(os.path.join(root, "_snapshots")):
        raise ValueError(f"branch {name!r} already exists on {table}")
    # tag FIRST (under the parent lock, inside snapshot_tag): once the tag
    # lands, neither the manifest nor its files can expire under us; the
    # tag also reserves the branch name (immutable — re-create raises)
    try:
        v = snapshot_tag(table, _fork_tag(name), version)
    except ValueError:
        # tag exists but the branch has no manifest: a fork crashed between
        # tag and v1 (or we lost a same-name race mid-create).  Resume the
        # fork at the TAG's version iff it matches the request — idempotent
        # crash repair; a concurrent same-name creator then races the v1
        # CAS below and exactly one wins.
        pinned = snapshot_tags(table).get(_fork_tag(name))
        if pinned is None or (version is not None and version != pinned):
            raise
        v = pinned
    m = read_manifest(table, v)
    os.makedirs(root, exist_ok=True)
    # the fork carries the parent's equality-delete context AND its
    # sequence counter (r7): entries keep their parent-domain seqs, so
    # parent eq items keep applying on the branch, and branch-local
    # commits continue the SAME monotone sequence — publish can then move
    # branch seqs back to the parent with no cross-domain translation
    _publish(
        root,
        _deep_entries(m),
        0,
        f"branch_fork@{v}",
        batch_schema=m.get("schema"),
        replace=m.get("schema") is not None,
        eq_deletes=json.loads(json.dumps(m.get("eq_deletes") or [])),
        last_seq_floor=m.get("last_seq", v),
        fields=_fields_of(m),
        retired=m.get("retired_phys"),
        stamp_new=False,
        last_field_id_floor=m.get("last_field_id", 0),
    )
    return root


def branch_fork_version(table: str, name: str) -> int:
    """The parent version this branch was forked from.  The parent-side
    fork TAG is the durable record (it lives until branch drop); the
    branch's own v1 op label is the fallback — branch-side
    ``expire_snapshots`` may legitimately age the v1 manifest out."""
    pinned = snapshot_tags(table).get(_fork_tag(name))
    if pinned is not None:
        return pinned
    op = _manifest_op(branch_root(table, name), 1) or ""
    if not op.startswith("branch_fork@"):
        raise NoSuchVersionError(f"{table}: {name!r} is not a branch")
    return int(op.split("@", 1)[1])


def snapshot_branches(table: str) -> dict[str, dict]:
    """All branches → {fork: parent fork version, current: branch head}."""
    d = os.path.join(table, _BRANCH_DIR)
    if not os.path.isdir(d):
        return {}
    out = {}
    for name in sorted(os.listdir(d)):
        if not os.path.isdir(os.path.join(d, name, "_snapshots")):
            continue
        out[name] = {
            "fork": branch_fork_version(table, name),
            "current": current_version(branch_root(table, name)),
        }
    return out


def _relocate(path: str, root_abs: str, dest: str) -> str:
    """Hardlink a branch-local file into the parent's tree; parent-owned
    paths pass through verbatim (they already survive parent expiry via
    the publishing manifest's reference)."""
    p = _scan_path(path)
    if not p.startswith(root_abs + os.sep):
        return path
    os.makedirs(dest, exist_ok=True)
    out = os.path.join(dest, f"{uuid.uuid4().hex}-{os.path.basename(p)}")
    os.link(p, out)
    return out


def snapshot_branch_publish(table: str, name: str, *, drop: bool = False) -> int:
    """Fast-forward the parent to the branch's current state as ONE atomic
    commit; returns the new parent version.  Raises
    :class:`BranchDiverged` (committing nothing) if the parent moved past
    the fork version.  ``drop=True`` also drops the branch afterwards."""
    root = branch_root(table, name)
    fork_v = branch_fork_version(table, name)
    bm = read_manifest(root)
    if bm["version"] == 1:
        # nothing was committed on the branch; publishing would re-commit
        # the parent's own state — make it the no-op it is
        return _repair_current(table)
    root_abs = _scan_path(root)
    run = uuid.uuid4().hex
    files = _deep_entries(bm)
    # parent lock: expiry (which also takes it) must not see the fresh
    # hardlinks as old orphans before the manifest references them, and
    # the divergence check must hold through the publish CAS (lock-free
    # appends don't take this lock — they surface as CommitConflict below,
    # which IS divergence)
    with table_lock(table):
        cur = _repair_current(table)
        if cur != fork_v:
            raise BranchDiverged(
                f"{table} is at v{cur}, branch {name!r} forked at v{fork_v}"
            )
        data_dest = os.path.join(table, "data", f"publish-{run}")
        dv_dest = os.path.join(table, "dv", f"publish-{run}")
        eq_dest = os.path.join(table, "eqd", f"publish-{run}")
        for f in files:
            f["path"] = _relocate(f["path"], root_abs, data_dest)
            for item in _dv_items(f):
                item["paths"] = [
                    _relocate(p, root_abs, dv_dest) for p in item["paths"]
                ]
        # branch-local equality-delete key filesets relocate like DVs;
        # item seqs are already in the shared counter domain (fork rule)
        eq = json.loads(json.dumps(bm.get("eq_deletes") or []))
        for item in eq:
            item["paths"] = [
                _relocate(p, root_abs, eq_dest) for p in item["paths"]
            ]
        try:
            v = _publish(
                table,
                files,
                cur,
                f"branch_publish@{name}:{bm['version']}",
                batch_schema=bm.get("schema"),
                replace=bm.get("schema") is not None,
                eq_deletes=eq,
                last_seq_floor=bm.get("last_seq", bm["version"]),
                fields=_fields_of(bm),
                retired=bm.get("retired_phys"),
                stamp_new=False,
                last_field_id_floor=bm.get("last_field_id", 0),
            )
        except CommitConflict as exc:  # a lock-free append interleaved
            raise BranchDiverged(
                f"{table} advanced during publish of branch {name!r}"
            ) from exc
    if drop:
        snapshot_branch_drop(table, name)
    return v


def _eq_identity(m: dict) -> set:
    """Equality-delete items as an identity set (paths + key columns +
    sequence).  GC removals are harmless (a dropped item applied to
    nothing); only ADDITIONS relative to the fork make a rebase unsafe."""
    return {
        json.dumps([sorted(it["paths"]), it["key_cols"], it["seq"]])
        for it in m.get("eq_deletes") or []
    }


def snapshot_branch_rebase(table: str, name: str, *, drop: bool = False) -> int:
    """Publish a DIVERGED branch by replaying its net delta onto the
    advanced parent head — the lock-free-append story extended to
    branches (VERDICT r6 ask #7).  Returns the new parent version.

    The branch's net effect vs its fork point is (touched fork entries —
    removed or changed in place, e.g. a DV delete) + (added entries).
    The rebase commits ``parent head − branch-touched + branch-added``
    iff it is PROVABLY equivalent to replaying the branch's commits on
    the new head, validated at the same granularity `_commit_rewrite`
    uses:

    * the fork entries the branch touched must be byte-identical in the
      parent head (a parent rewrite/DV of the same file means both sides
      changed one file — :class:`BranchDiverged`, re-fork and replay);
    * neither side may have ADDED equality deletes since the fork — the
      two sides extended the shared sequence counter independently, so
      a new eq item's strictly-prior scope is no longer well-defined
      across the merge (fork-inherited items stay valid: their sequences
      predate every post-fork file on BOTH sides);
    * the branch schema evolves additively against the parent head
      (:class:`SchemaEvolutionError` propagates on a retype fork).

    This is snapshot-isolation, not serializability: a parent append
    whose ROWS would have matched a branch-side keyed merge is carried
    through un-merged, exactly Iceberg's fast-forward-with-validation
    semantics — refusal stays the answer when file sets overlap.
    Like publish, a no-op branch just repairs and returns the head, and
    everything runs under the parent table lock (fresh hardlinks must
    not be visible to expiry before the manifest references them)."""
    root = branch_root(table, name)
    fork_v = branch_fork_version(table, name)
    bm = read_manifest(root)
    if bm["version"] == 1:
        return _repair_current(table)
    root_abs = _scan_path(root)
    run = uuid.uuid4().hex
    with table_lock(table):
        cur = _repair_current(table)
        fm = read_manifest(table, fork_v)  # fork tag pins it through expiry
        pm = read_manifest(table, cur)
        fork_e = {f["path"]: f for f in fm["files"]}
        br_e = {f["path"]: f for f in _deep_entries(bm)}
        par_e = {f["path"]: f for f in pm["files"]}
        br_touched = {
            p for p, f in fork_e.items() if p not in br_e or br_e[p] != f
        }
        par_touched = {
            p for p, f in fork_e.items() if p not in par_e or par_e[p] != f
        }
        overlap = sorted(br_touched & par_touched)
        if overlap:
            raise BranchDiverged(
                f"{table}: branch {name!r} and the parent both touched "
                f"{len(overlap)} file(s) since v{fork_v} (e.g. {overlap[0]})"
            )
        if _eq_identity(bm) - _eq_identity(fm):
            raise BranchDiverged(
                f"{table}: branch {name!r} added equality deletes since the "
                f"fork — their sequence scope cannot survive a rebase"
            )
        if _eq_identity(pm) - _eq_identity(fm):
            raise BranchDiverged(
                f"{table}: the parent added equality deletes since v{fork_v} "
                f"— re-fork so branch files inherit their scope"
            )

        # field-registry divergence (r7 rename/drop/widen): at most ONE
        # side may have evolved the registry since the fork — independent
        # evolutions could assign colliding field ids with different
        # meanings; the evolved side's registry wins (physical names are
        # immutable, so the other side's files read correctly under it)
        def _reg(m):
            return json.dumps(
                [_fields_of(m), m.get("retired_phys") or []], sort_keys=True
            )

        if _reg(pm) != _reg(fm) and _reg(bm) != _reg(fm):
            raise BranchDiverged(
                f"{table}: branch {name!r} and the parent both evolved the "
                f"schema registry since v{fork_v} — re-fork and replay"
            )
        reg_m = bm if _reg(bm) != _reg(fm) else pm
        files = []
        for p, f in par_e.items():
            if p in br_touched:
                if p in br_e:
                    files.append(br_e[p])  # branch-changed entry (DV list)
                # else: the branch removed it
            else:
                files.append(f)  # parent state carries through
        added = {p: f for p, f in br_e.items() if p not in fork_e}
        # a branch-added path already present in the parent head means both
        # sides minted the same path since the fork — uuid commit dirs make
        # this practically unreachable, but silently preferring the parent
        # entry would be silent data loss, not the refusal used everywhere
        # else (ADVICE r7)
        collide = sorted(p for p in added if p in par_e)
        if collide:
            raise BranchDiverged(
                f"{table}: branch {name!r} and the parent both added "
                f"{len(collide)} identical path(s) since v{fork_v} "
                f"(e.g. {collide[0]})"
            )
        files += list(added.values())
        data_dest = os.path.join(table, "data", f"rebase-{run}")
        dv_dest = os.path.join(table, "dv", f"rebase-{run}")
        for f in files:
            f["path"] = _relocate(f["path"], root_abs, data_dest)
            for item in _dv_items(f):
                item["paths"] = [
                    _relocate(p, root_abs, dv_dest) for p in item["paths"]
                ]
        try:
            v = _publish(
                table,
                files,
                cur,
                f"branch_rebase@{name}:{bm['version']}",
                last_seq_floor=bm.get("last_seq", bm["version"]),
                fields=_fields_of(reg_m),
                retired=reg_m.get("retired_phys"),
                stamp_new=False,
                last_field_id_floor=max(
                    bm.get("last_field_id", 0), pm.get("last_field_id", 0)
                ),
            )
        except CommitConflict as exc:  # a lock-free append interleaved
            raise BranchDiverged(
                f"{table} advanced during rebase of branch {name!r}"
            ) from exc
    if drop:
        snapshot_branch_drop(table, name)
    return v


def snapshot_branch_drop(table: str, name: str) -> None:
    """Delete the branch and release the parent's fork-version pin.  Safe
    after publish: the parent owns hardlinked inodes, not branch paths."""
    root = branch_root(table, name)
    if _fork_tag(name) in snapshot_tags(table):
        snapshot_untag(table, _fork_tag(name))
    shutil.rmtree(root, ignore_errors=True)
