"""Snapshot-retention helper shared by the two versioned stores
(_VersionedTable._vacuum and fulltext.vacuum_postings).

The grace period must measure time since DEREFERENCE, not since the
data was written: a batch written hours ago can fall out of the kept
manifests a second ago, and a reader that resolved the superseded
manifest just before that is still mid-scan — age-testing the write
mtime would delete the files under it immediately (the exact in-flight
window the grace exists for).

Dereference time is not recorded anywhere at commit, so the vacuum
records it ITSELF the first time it observes a path dereferenced: a
sentinel file is touched inside the directory, and deletion is allowed
only on a LATER vacuum once the sentinel is older than the grace. A
re-referenced path (impossible for immutable batches, but cheap to
honor) simply keeps its sentinel ignored. Grace <= 0 keeps the old
one-pass delete (unit-test mode).
"""

from __future__ import annotations

import os
import time

DEREF_SENTINEL = "_gvs_derefd"


def deref_expired(path: str, grace_s: float) -> bool:
    """True when the dereferenced directory ``path`` may be deleted.

    First observation (no sentinel yet) touches the sentinel and
    returns False — the deletion happens on a later vacuum, at least
    ``grace_s`` seconds after the FIRST vacuum saw the path
    dereferenced (an upper bound on when it actually was)."""
    if grace_s <= 0:
        return True
    sentinel = os.path.join(path, DEREF_SENTINEL)
    try:
        age = time.time() - os.path.getmtime(sentinel)
    except OSError:
        try:
            with open(sentinel, "w"):
                pass
        except OSError:
            pass  # path vanished under us — the next pass re-observes
        return False
    return age >= grace_s
