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
import socket
import time
import uuid


class TableLockedError(RuntimeError):
    """The table is locked by another writer and the wait budget expired."""


def _lock_dir(table_path: str) -> str:
    return table_path.rstrip("/") + "._lock"


def _read_meta(lockdir: str) -> dict:
    try:
        with open(os.path.join(lockdir, "owner.json")) as fh:
            return json.load(fh)
    except Exception:
        return {}


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
    deadline = time.monotonic() + wait_s
    while True:
        try:
            os.mkdir(lockdir)  # atomic-exclusive
            break
        except FileExistsError:
            meta = _read_meta(lockdir)
            ts = meta.get("acquired_at", 0)
            if ts and time.time() - ts > stale_after_s:
                # stale holder: break the lock, then re-contend (another
                # waiter may win the subsequent mkdir — that's fine)
                with contextlib.suppress(OSError):
                    os.remove(os.path.join(lockdir, "owner.json"))
                with contextlib.suppress(OSError):
                    os.rmdir(lockdir)
                continue
            if time.monotonic() >= deadline:
                raise TableLockedError(
                    f"{table_path} locked by {meta.get('host', '?')}:"
                    f"{meta.get('pid', '?')} since {ts}"
                ) from None
            time.sleep(poll_s)
    try:
        with open(os.path.join(lockdir, "owner.json"), "w") as fh:
            json.dump(
                {
                    "token": token,
                    "host": socket.gethostname(),
                    "pid": os.getpid(),
                    "acquired_at": time.time(),
                },
                fh,
            )
        yield
    finally:
        with contextlib.suppress(OSError):
            os.remove(os.path.join(lockdir, "owner.json"))
        with contextlib.suppress(OSError):
            os.rmdir(lockdir)
