"""Single-writer table lock for the plain-Parquet idempotent sink.

The upsert sink (operators/upsert.py) is correct only single-writer: two
concurrent anti-join-then-append cycles can both conclude a key is new and
both append it.  The reference never hits this because DynamoDB serializes
its conditional writes (``agf_ingestion_lambda.py:226-236``); a plain-file
lake has no such arbiter, so this module supplies one: a mutual-exclusion
lock built from the one atomic primitive every filesystem offers
(``mkdir`` — creation is atomic-exclusive on POSIX; on object stores swap
for a conditional PUT, same API).

This turns the documented single-writer *assumption* into an enforced
invariant.  A lock directory carries owner + timestamp metadata; stale
locks (crashed writers) are broken after a TTL.  For true multi-writer
MERGE semantics you graduate to a transactional table format
(Delta/Iceberg) — the sink helper stays the single swap point.
"""

from __future__ import annotations

import contextlib
import json
import os
import shutil
import socket
import time
import uuid
import warnings


class TableLockedError(RuntimeError):
    """The table is locked by another writer and the wait budget expired."""


#: lockdir → token for locks held by THIS process — the registry
#: ``assert_lock_held`` verifies against, turning a stolen lock into a
#: loud failure at the caller's commit point instead of silent corruption
_HELD: dict[str, str] = {}


def assert_lock_held(table_path: str) -> None:
    """Verify the lock this process acquired on ``table_path`` is STILL
    ours on disk.  Call immediately before an atomic commit point inside
    a long transaction: if a TTL-based breaker (or the hand-off race)
    stole the lock mid-write, this raises instead of letting two writers'
    commits interleave.  No-op when the table is not lock-managed in this
    process (e.g. single-writer deployments)."""
    lockdir = _lock_dir(table_path)
    token = _HELD.get(lockdir)
    if token is None:
        return
    if _read_meta(lockdir).get("token") != token:
        raise TableLockedError(
            f"lock on {table_path} was broken while held — aborting before "
            f"the commit point (another writer may hold the table)"
        )


class LockBrokenWarning(UserWarning):
    """This holder's lock was broken (stale TTL) while it was still working;
    the release left the new holder's lock untouched."""


def _lock_dir(table_path: str) -> str:
    return table_path.rstrip("/") + "._lock"


def _read_meta(lockdir: str) -> dict:
    try:
        with open(os.path.join(lockdir, "owner.json")) as fh:
            return json.load(fh)
    except Exception:
        return {}


def _acquire_once(lockdir: str, meta: dict) -> bool:
    """Atomically acquire: stage owner.json in a temp dir, then ``rename``
    into place.  POSIX ``rename(dir, dst)`` succeeds only if ``dst`` is
    absent (a held lock is never empty under this protocol, so a non-absent
    dst always fails with ENOTEMPTY/EEXIST) — acquisition and its metadata
    are therefore a single atomic step; no observer can ever see a lock
    directory without its owner.json (the round-1 stale-break race)."""
    tmp = f"{lockdir}.tmp-{meta['token']}"
    os.mkdir(tmp)
    with open(os.path.join(tmp, "owner.json"), "w") as fh:
        json.dump(meta, fh)
    try:
        os.rename(tmp, lockdir)
        return True
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)
        return False


def _remove_if_token(lockdir: str, token: str) -> bool:
    """Atomically remove ``lockdir`` iff its owner token is ``token``.

    The directory is first renamed to a private trash name (atomic — after
    this no other process can see or acquire-over it), the trashed
    owner.json is then the authoritative copy: matching token → delete;
    mismatch → we raced with a hand-off, rename the lock back untouched.
    Returns True when the matching lock was removed."""
    trash = f"{lockdir}.trash-{uuid.uuid4()}"
    try:
        os.rename(lockdir, trash)
    except OSError:
        return False  # already gone / already re-acquired
    if _read_meta(trash).get("token") == token:
        shutil.rmtree(trash, ignore_errors=True)
        return True
    # raced: someone else's fresh lock — put it back where it was
    try:
        os.rename(trash, lockdir)
    except OSError:
        # a third contender acquired in the brief absent window; their
        # lock stands and the displaced holder's is left IN the trash dir
        # as evidence (never deleted — destroying it would erase the only
        # record of the double-hold).  The displaced holder detects the
        # theft at its next assert_lock_held() call or at release
        # (LockBrokenWarning); commit points that verify via
        # assert_lock_held fail loudly instead of corrupting.
        warnings.warn(
            f"lock hand-off race at {lockdir}: displaced holder's lock "
            f"preserved at {trash}",
            LockBrokenWarning,
            stacklevel=2,
        )
    return False


@contextlib.contextmanager
def table_lock(
    table_path: str,
    *,
    wait_s: float = 30.0,
    poll_s: float = 0.25,
    stale_after_s: float = 900.0,
):
    """Acquire an exclusive writer lock on ``table_path`` for the duration
    of the ``with`` block.

    Acquisition = atomic ``mkdir`` of ``<table>._lock``; contenders poll
    until the holder releases or ``wait_s`` expires (→ TableLockedError).
    A lock older than ``stale_after_s`` (crashed holder — the reference's
    Lambda timeout analog) is broken and re-contended.
    """
    lockdir = _lock_dir(table_path)
    os.makedirs(os.path.dirname(os.path.abspath(lockdir)) or ".", exist_ok=True)
    token = str(uuid.uuid4())
    my_meta = {
        "token": token,
        "host": socket.gethostname(),
        "pid": os.getpid(),
        "acquired_at": time.time(),
    }
    deadline = time.monotonic() + wait_s
    while True:
        my_meta["acquired_at"] = time.time()
        if _acquire_once(lockdir, my_meta):
            break
        meta = _read_meta(lockdir)
        ts = meta.get("acquired_at", 0)
        if ts and time.time() - ts > stale_after_s:
            # stale holder (crashed writer): remove THAT specific lock —
            # token-guarded + atomic, so a concurrent breaker/acquirer
            # can never have its fresh lock collateral-deleted — then
            # re-contend (another waiter may win; that's fine)
            _remove_if_token(lockdir, meta.get("token"))
            continue
        if time.monotonic() >= deadline:
            raise TableLockedError(
                f"{table_path} locked by {meta.get('host', '?')}:"
                f"{meta.get('pid', '?')} since {ts}"
            ) from None
        time.sleep(poll_s)
    _HELD[lockdir] = token
    try:
        yield
    finally:
        _HELD.pop(lockdir, None)
        # release only OUR lock: if the TTL elapsed mid-write and another
        # writer broke + re-acquired, their lock must stand
        if _read_meta(lockdir).get("token") == token:
            _remove_if_token(lockdir, token)
        else:
            warnings.warn(
                f"lock on {table_path} was broken while held "
                f"(exceeded stale_after_s={stale_after_s}); not releasing",
                LockBrokenWarning,
                stacklevel=2,
            )
