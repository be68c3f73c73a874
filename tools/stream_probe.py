"""State-store restart probe for the streaming surface (VERDICT r12 item 3).

Every declared streaming query runs the whole fixture as ONE availableNow
pass with a fresh checkpoint, so the driver gate never exercises the
contract a production stream lives by: stop mid-stream, restart from the
checkpoint, and produce EXACTLY the rows a never-stopped run produces —
no losses (state forgotten on resume) and no duplicates (state replayed).
This probe drives that contract for every stateful operator family:

  1. stage the fixture's events as K ts-ordered files (arrival order —
     the shape a migrate loop feeds a landing dir);
  2. SINGLE run: one availableNow pass over all K files, fresh
     checkpoint — the reference result;
  3. RESTART run: a growing dir with only the first half of the files,
     availableNow to completion (watermark mid-stream, open windows /
     dedup keys / join buffers / custom state live in the checkpoint),
     process STOPPED; remaining files copied in; a NEW query resumed
     from the SAME checkpoint;
  4. compare the canonical final result of (3) against (2).

Output-mode canonicalization: append emits each row exactly once across
both phases (union phase sinks); update re-emits a key per batch it
changed (canonical = the job's own monotone fold, max per key); complete
re-emits full state (canonical = LAST phase's table alone).

Usage:
  python tools/stream_probe.py [fixture_dir] [--files=6] [--jobs=a,b,...]

Differential probing under injected data (the null_probe campaign):
  python tools/null_probe.py /root/testdata/sf0.001 /tmp/p --mode=time
  python tools/stream_probe.py /tmp/p

Exit 1 on any restart-vs-single mismatch. Jobs covered: tumbling,
sliding, session, chained, dedup, join_inner, join_left, join_full,
streaks (applyInPandasWithState), totals (complete mode).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def stage_split(src_dir: str, out_dir: str, n_files: int) -> None:
    """events.parquet → K ts-ordered parquet files + the other tables
    copied as-is (the static sides of stream-static jobs)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    for name in os.listdir(src_dir):
        if name == "events.parquet":
            continue
        src = os.path.join(src_dir, name)
        dst = os.path.join(out_dir, name)
        if os.path.isfile(src):
            shutil.copy2(src, dst)
    t = pq.read_table(os.path.join(src_dir, "events.parquet"))
    order = pc.sort_indices(t, sort_keys=[("ts", "ascending")])
    t = t.take(order)
    n = t.num_rows
    step = (n + n_files - 1) // n_files
    for i in range(n_files):
        chunk = t.slice(i * step, step)
        if chunk.num_rows == 0:
            break
        pq.write_table(
            chunk, os.path.join(out_dir, f"events_{i:03d}.parquet")
        )


ABORT_MARK = "stream_probe injected crash"


def run_available_now(
    sdf, output_mode: str, checkpoint: str, abort_after: int | None = None
):
    """One availableNow pass through a foreachBatch collector; returns
    [(batch_id, rows)] in batch order.

    foreachBatch (not the memory sink) because it is the one sink shape
    that SUPPORTS checkpoint recovery — the restart leg resumes a NEW
    query from the prior run's checkpoint, which the memory sink
    refuses outright ("This query does not support recovering from
    checkpoint location"). It is also the honest production shape: a
    resumed job replays only uncommitted batches, so the collector sees
    each batch exactly once across both phases.

    ``abort_after=N`` injects the UNCLEAN-restart crash (VERDICT r13
    item 4): the sink function completes its write for batch N (rows
    collected — the external side effect happened) and then raises, so
    the query dies BETWEEN the sink write and the batch's commit-log
    entry — the harsher window a clean stop() never exercises. On
    resume Spark must replay batch N (it never committed) with state
    stores rolled back to version N: the collector legitimately sees
    batch N twice, which is exactly why foreachBatch's contract is
    at-least-once and production sinks key their writes on batchId.
    The probe models that idempotent sink: merge_by_batch_id keeps the
    LAST write per batch_id before comparing."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from hadoop_trans_spark.streaming.jobs import _pinned_state_partitions

    spark = sdf.sparkSession
    batches: list[tuple[int, list]] = []

    def sink(bdf, batch_id: int) -> None:
        batches.append((batch_id, bdf.collect()))
        if abort_after is not None and batch_id >= abort_after:
            raise RuntimeError(f"{ABORT_MARK} after sink write of batch {batch_id}")

    name = f"probe_{uuid.uuid4().hex}"
    with _pinned_state_partitions(spark):
        q = (
            sdf.writeStream.foreachBatch(sink)
            .queryName(name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .option("checkpointLocation", checkpoint)
            .start()
        )
        try:
            if not q.awaitTermination(300):
                q.stop()
                raise TimeoutError(f"stream {name} did not finish")
        except StreamingQueryException as ex:
            if abort_after is None or ABORT_MARK not in str(ex):
                raise
    return batches


def merge_by_batch_id(phases) -> list[tuple[int, list]]:
    """Idempotent-sink fold across crash/resume phases: the resume
    replays the uncommitted batch under the SAME batch_id, and a
    production exactly-once sink (txn keyed on batchId) overwrites it —
    keep the last write per batch_id, in batch order."""
    final: dict[int, list] = {}
    for phase in phases:
        for bid, rows in phase:
            final[bid] = rows
    return [(bid, final[bid]) for bid in sorted(final)]


def flat(batches) -> list:
    """[(batch_id, rows)] → all rows in batch order."""
    return [r for _, rows in batches for r in rows]


def canon_rows(rows) -> list[tuple]:
    # None-safe sort: outer joins emit NULL-padded rows
    return sorted(
        (tuple(r) for r in rows),
        key=lambda t: tuple((v is None, v) for v in t),
    )


def canon_streaks(rows) -> list[tuple]:
    """update-mode fold: counters are monotone, max per key is final."""
    best: dict = {}
    for r in rows:
        k = r[0]
        cur = best.get(k)
        best[k] = (
            (k, max(cur[1], r[1]), max(cur[2], r[2])) if cur else tuple(r)
        )
    return sorted(best.values())


def jobs_table():
    """name -> (build(spark, dir) -> streaming DF, output_mode,
    canonicalize(single_rows, restart_phase_rows) -> (a, b))."""
    from hadoop_trans_spark.streaming import (
        chained_windowed_rollup,
        complete_totals_stream,
        read_events_stream,
        session_windows,
        sliding_counts,
        stream_dedup,
        stream_stream_full_outer_join,
        stream_stream_join,
        stream_stream_left_join,
        tumbling_counts,
        user_streaks_updates,
    )

    def es(spark, d):
        # one file per micro-batch: the watermark and every state store
        # advance K times per phase, not once
        return read_events_stream(spark, d, max_files_per_trigger=1)

    def union(single, phases):
        return canon_rows(flat(single)), canon_rows(
            [r for b in phases for r in flat(b)]
        )

    def fold_streaks(single, phases):
        return canon_streaks(flat(single)), canon_streaks(
            [r for b in phases for r in flat(b)]
        )

    def last_table(single, phases):
        # complete mode re-emits full state per batch: final state is
        # the LAST batch of the LAST phase (and of the single run)
        return canon_rows(single[-1][1]), canon_rows(phases[-1][-1][1])

    return {
        "tumbling": (lambda s, d: tumbling_counts(es(s, d)), "append", union),
        "sliding": (lambda s, d: sliding_counts(es(s, d)), "append", union),
        "session": (lambda s, d: session_windows(es(s, d)), "append", union),
        "chained": (
            lambda s, d: chained_windowed_rollup(es(s, d)),
            "append",
            union,
        ),
        "dedup": (lambda s, d: stream_dedup(s, d), "append", union),
        "join_inner": (
            lambda s, d: stream_stream_join(s, d),
            "append",
            union,
        ),
        "join_left": (
            lambda s, d: stream_stream_left_join(s, d),
            "append",
            union,
        ),
        "join_full": (
            lambda s, d: stream_stream_full_outer_join(s, d),
            "append",
            union,
        ),
        "streaks": (
            lambda s, d: user_streaks_updates(es(s, d)),
            "update",
            fold_streaks,
        ),
        "totals": (
            lambda s, d: complete_totals_stream(es(s, d)),
            "complete",
            last_table,
        ),
    }


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    src = args[0] if args else "/root/testdata/sf0.001"
    n_files = 6
    only = None
    abort_points: list[int] = []
    for a in sys.argv[1:]:
        if a.startswith("--files="):
            n_files = int(a.split("=", 1)[1])
        if a.startswith("--jobs="):
            only = a.split("=", 1)[1].split(",")
        if a == "--abort":
            abort_points = [1, 3]
        elif a.startswith("--abort="):
            abort_points = [int(x) for x in a.split("=", 1)[1].split(",")]

    from hadoop_trans_spark.session import get_spark

    spark = get_spark(app_name="stream_probe")

    work = tempfile.mkdtemp(prefix="stream_probe_")
    full = os.path.join(work, "full")
    stage_split(src, full, n_files)
    split_files = sorted(
        f for f in os.listdir(full) if f.startswith("events_")
    )
    half = len(split_files) // 2 or 1

    table = jobs_table()
    if only:
        table = {k: v for k, v in table.items() if k in only}
    bad = []
    for name, (build, mode, canon) in table.items():
        # SINGLE: all files, fresh checkpoint
        single = run_available_now(
            build(spark, full), mode, tempfile.mkdtemp(prefix="ckpt_s_")
        )
        # RESTART: first half, stop, add the rest, resume from the SAME
        # checkpoint (a new query object — the process-restart shape)
        grow = os.path.join(work, f"grow_{name}")
        os.makedirs(grow)
        for f in os.listdir(full):
            if not f.startswith("events_") or f in split_files[:half]:
                shutil.copy2(os.path.join(full, f), os.path.join(grow, f))
        ckpt = tempfile.mkdtemp(prefix="ckpt_r_")
        phase1 = run_available_now(build(spark, grow), mode, ckpt)
        for f in split_files[half:]:
            shutil.copy2(os.path.join(full, f), os.path.join(grow, f))
        phase2 = run_available_now(build(spark, grow), mode, ckpt)
        a, b = canon(single, [phase1, phase2])
        ok = a == b
        status = {
            "single_rows": len(a),
            "restart_rows": len(b),
            "phase1_rows": len(flat(phase1)),
            "phase2_rows": len(flat(phase2)),
            "single_batches": len(single),
            "match": ok,
        }
        if not ok:
            sa, sb = set(a), set(b)
            status["missing_after_restart"] = [
                repr(x) for x in sorted(sa - sb)[:5]
            ]
            status["extra_after_restart"] = [
                repr(x) for x in sorted(sb - sa)[:5]
            ]
            bad.append(name)
        print(json.dumps({name: status}))

        # UNCLEAN restarts: crash between sink write and batch commit at
        # each abort point (all files present from the start), resume
        # from the same checkpoint, idempotent-sink merge by batch_id.
        for ap in abort_points:
            ckpt_a = tempfile.mkdtemp(prefix="ckpt_a_")
            crashed = run_available_now(
                build(spark, full), mode, ckpt_a, abort_after=ap
            )
            resumed = run_available_now(build(spark, full), mode, ckpt_a)
            merged = merge_by_batch_id([crashed, resumed])
            aa, bb = canon(single, [merged])
            replayed = {b for b, _ in crashed} & {b for b, _ in resumed}
            ok2 = aa == bb
            st2 = {
                "abort_after_batch": ap,
                "single_rows": len(aa),
                "crash_resume_rows": len(bb),
                "replayed_batch_ids": sorted(replayed),
                "match": ok2,
            }
            if not ok2:
                sa, sb = set(aa), set(bb)
                st2["missing"] = [repr(x) for x in sorted(sa - sb)[:5]]
                st2["extra"] = [repr(x) for x in sorted(sb - sa)[:5]]
                bad.append(f"{name}@abort{ap}")
            print(json.dumps({f"{name}_abort{ap}": st2}))
    print(
        f"\n=== STREAM RESTART PROBE === jobs: {len(table)}  bad: {len(bad)}"
        + (f"  ({','.join(bad)})" if bad else "")
    )
    shutil.rmtree(work, ignore_errors=True)
    if bad:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
