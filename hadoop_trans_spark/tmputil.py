"""Self-cleaning temp staging dirs (ADVICE r13, generalized).

Many declared queries stage fixtures into ``tempfile.mkdtemp`` dirs and
return a DataFrame that LAZILY reads them — the caller (driver/bench)
collects after the query function returns, so the dir cannot be deleted
eagerly inside the query. Nothing ever deleted them: repeated
bench/driver sweeps had accumulated ~1900 ``htspark_*``/``ckpt_`` dirs
in /tmp by round 14.

``staging_dir`` is a mkdtemp whose path is recorded in a module
registry and removed by ONE ``atexit`` hook at interpreter exit —
after every lazy read has happened, once per process no matter how
many sweeps ran. Within a process the footprint stays bounded by one
sweep's staging; across processes it no longer accumulates at all.
Queries that can clean eagerly (q250's try/finally) still should —
this is the backstop for the lazy-read pattern, not a license to skip
eager cleanup where it is possible.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

_STAGED: list[str] = []


def _cleanup() -> None:
    while _STAGED:
        shutil.rmtree(_STAGED.pop(), ignore_errors=True)


def staging_dir(prefix: str) -> str:
    """mkdtemp registered for removal at interpreter exit."""
    path = tempfile.mkdtemp(prefix=prefix)
    if not _STAGED:
        atexit.register(_cleanup)
    _STAGED.append(path)
    return path
