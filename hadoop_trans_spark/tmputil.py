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
import os
import shutil
import tempfile

_STAGED: list[str] = []


def staging_base() -> str | None:
    """Base directory for ephemeral staging (r14, guide §6).

    Staged fixtures, streaming checkpoints and state stores are
    PER-PROCESS ephemeral (created, read and deleted within one run),
    yet Structured Streaming fsyncs its offset/commit logs and
    state-store delta files on every micro-batch commit — measured
    3.4 ms per fsync on this sandbox's /tmp (virtio disk) vs 0.01 ms on
    /dev/shm, which inflated every stateful streaming query 5-20x
    (q202: 2.5 s → 43.8 s at sf0.1). RAM-backed staging is the right
    LOCAL layout for ephemeral state; a cluster deployment instead sets
    ``$SPARK_GRAFT_TMPDIR`` to fast local disk and configures a
    RELIABLE checkpoint dir for anything that must survive the process
    (see operators/stage.py). Explicit env var wins; /dev/shm is used
    when present and writable; otherwise the tempfile default (honors
    $TMPDIR) stands.
    """
    base = os.environ.get("SPARK_GRAFT_TMPDIR")
    if base:
        # Fail fast on a typo'd path (ADVICE r14): a bad value would
        # otherwise surface later as an opaque FileNotFoundError from
        # tempfile.mkdtemp and a silently broken spark.local.dir.
        if os.path.isdir(base) and os.access(base, os.W_OK):
            return base
        import warnings

        warnings.warn(
            f"$SPARK_GRAFT_TMPDIR={base!r} is not an existing writable "
            "directory; falling back to the default staging base",
            stacklevel=2,
        )
    shm = "/dev/shm"
    if os.path.isdir(shm) and os.access(shm, os.W_OK):
        # Capacity gate (ADVICE r14): Docker's default /dev/shm is 64 MB
        # — writable, but one staged fixture fills it and every write
        # after that dies with ENOSPC. Only claim a RAM-backed base that
        # actually has room (>= 4 GiB free; this sandbox's tmpfs is
        # sized at half of RAM).
        try:
            st = os.statvfs(shm)
            if st.f_bavail * st.f_frsize >= 4 * 1024**3:
                return shm
        except OSError:
            pass
    return None


def shuffle_scratch_base() -> str | None:
    """Base for ``spark.local.dir`` (shuffle/blockmgr scratch) — SPLIT
    from :func:`staging_base` (r15, VERDICT r14 item 2 + ADVICE).

    The r14 fsync measurement justified RAM-backing the STAGING path
    (streaming offset/commit logs and state-store deltas fsync per
    micro-batch; /dev/shm took q202 43.8 s → 3.0 s). Shuffle scratch is
    different: Spark never fsyncs shuffle files, and pointing spills at
    tmpfs makes memory-pressure spills consume the very RAM they exist
    to relieve (guide §5) — fine in this 126 GiB sandbox, a production
    hazard anywhere real. The r15 cold A/B (OPTIMIZATION_r15.md) of the
    five join-shape queries measured shm-vs-disk shuffle scratch at
    parity (8.31 vs 8.62 s over q204/q209/q216/q229/q163, inside the
    cold noise band), so RAM buys nothing here. Default: Spark's own
    disk-backed default (None — spark.local.dir unset);
    ``$SPARK_GRAFT_LOCAL_DIR`` overrides for clusters with dedicated
    fast scratch disks."""
    base = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if base:
        if os.path.isdir(base) and os.access(base, os.W_OK):
            return base
        import warnings

        warnings.warn(
            f"$SPARK_GRAFT_LOCAL_DIR={base!r} is not an existing writable "
            "directory; leaving spark.local.dir at Spark's default",
            stacklevel=2,
        )
    return None


def _cleanup() -> None:
    while _STAGED:
        shutil.rmtree(_STAGED.pop(), ignore_errors=True)


def staging_dir(prefix: str) -> str:
    """mkdtemp under :func:`staging_base`, removed at interpreter exit."""
    path = tempfile.mkdtemp(prefix=prefix, dir=staging_base())
    if not _STAGED:
        atexit.register(_cleanup)
    _STAGED.append(path)
    return path
