"""Crash-safe directory-swap protocol for self-maintained state tables.

The streaming ingest paths keep their dedup state in plain parquet
directories (the landed corpus, the banded minhash index, the vocab
summary) and periodically compact them by writing a rewritten copy to
``{path}__compacting`` and swapping it in with two ``os.rename`` calls
via ``{path}__precompact``. Two renames are not atomic: a crash between
them leaves ``path`` missing — and because these tables ARE the dedup
state, a restarted stream would read "no state" and silently re-ingest
duplicates (ADVICE r6).

``recover_interrupted_swap`` inspects the three directories and either
finishes or rolls back an interrupted swap, restoring the invariant
"``path`` holds a complete state table" before any batch runs. Call it
on ingest start for every swap-maintained state dir. On a real cluster
this job belongs to the table format (Delta/Iceberg commit protocol);
on plain parquet directories this is the minimal equivalent.
"""

from __future__ import annotations

import os
import shutil

TMP_SUFFIX = "__compacting"
OLD_SUFFIX = "__precompact"


def atomic_swap_dirs(path: str) -> None:
    """Swap ``{path}__compacting`` (a fully-written rewrite) into
    ``path``, retiring the previous contents via ``{path}__precompact``.
    Call only after the rewrite finished. Recoverable at every
    intermediate state by :func:`recover_interrupted_swap`."""
    path = path.rstrip("/")
    tmp, old = path + TMP_SUFFIX, path + OLD_SUFFIX
    shutil.rmtree(old, ignore_errors=True)
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)


def recover_interrupted_swap(path: str) -> str | None:
    """Finish or roll back an interrupted :func:`atomic_swap_dirs`.

    Returns a short description of the action taken, or ``None`` when
    the state was already consistent. Every reachable crash state maps
    to exactly one case:

    - ``path`` + ``tmp``: crash before the swap began (rewrite may be
      incomplete) → drop ``tmp``; ``path`` is authoritative.
    - ``path`` + ``old``: crash after the swap, before cleanup →
      drop ``old``.
    - ``old`` + ``tmp``, no ``path``: crash between the two renames —
      ``tmp`` is the complete rewrite (it was fully written before the
      first rename) → finish: promote ``tmp``, drop ``old``.
    - ``old`` only, no ``path``: rewrite vanished → roll back ``old``.
    - ``tmp`` only, no ``path``: promote ``tmp`` (complete rewrite,
      previous contents already retired).
    """
    path = path.rstrip("/")
    tmp, old = path + TMP_SUFFIX, path + OLD_SUFFIX
    has = os.path.exists
    if has(path):
        acted = []
        if has(tmp):
            shutil.rmtree(tmp)
            acted.append("dropped stale rewrite")
        if has(old):
            shutil.rmtree(old)
            acted.append("dropped retired copy")
        return "; ".join(acted) or None
    if has(tmp):
        os.rename(tmp, path)
        shutil.rmtree(old, ignore_errors=True)
        return "finished interrupted swap"
    if has(old):
        os.rename(old, path)
        return "rolled back interrupted swap"
    return None
