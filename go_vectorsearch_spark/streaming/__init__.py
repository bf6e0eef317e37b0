"""Structured-Streaming operators (engine extensions; the reference has
no streaming surface — SURVEY.md §2.10)."""

from __future__ import annotations


def require_local_path(p: str, what: str) -> None:
    """Fail LOUDLY on remote URIs where a sink/source keeps local-FS
    bookkeeping beside the data (fresh-checkpoint detection, the
    exactly-once stream-id token): ``os.path`` answers False for any
    ``scheme://`` path, which silently flips the fresh-vs-resumed
    branch — stale epochs resurrect as duplicates, or a replayed epoch
    re-applies under a fresh id. Object-store deployments should use a
    table-format sink (Delta/Iceberg) whose log IS the bookkeeping."""
    if "://" in str(p):
        raise ValueError(
            f"{what} requires a local filesystem path, got {p!r}: its "
            "exactly-once bookkeeping lives beside the data via os.path "
            "and would silently misbehave on a remote URI"
        )
