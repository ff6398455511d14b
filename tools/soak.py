#!/usr/bin/env python
"""Sustained micro-batch soak of the north-star pipeline.

The drain bench (tools/scaling.py) processes the whole input in one
availableNow epoch; production streaming is INCREMENTAL: many
micro-batches, the event-time watermark advancing between them, sessions
emitted as they close, state bounded by the watermark.  This tool runs
that shape — `available_now=False` with `maxFilesPerTrigger` — over the
seeded SF input until the directory is drained, then reports per-batch
throughput and state-size evolution from the progress stream.

Usage: python tools/soak.py [sf] [files_per_trigger] [cores]
Writes BENCH/SOAK.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
WORK_ROOT = "/dev/shm/logstash_spark_bench"


def main() -> None:
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 10.0
    fpt = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    cores = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
    os.environ.setdefault("SPARK_GRAFT_BENCH_JVM", "1")

    from logstash_spark.session import get_spark
    from logstash_spark.sources.transcripts import ensure_transcripts_tsorted
    from logstash_spark.streaming.jobs import run_north_star

    spark = get_spark("soak", master=f"local[{cores}]",
                      shuffle_partitions=cores,
                      extra_conf={"spark.local.dir": os.path.join(WORK_ROOT, "local")})
    # live-replay fixture: delivery-ordered files (see ensure_transcripts_tsorted)
    src = ensure_transcripts_tsorted(spark, sf)
    n_files = len([f for f in os.listdir(src) if f.endswith(".parquet")])
    n_turns = spark.read.parquet(src).count()
    os.makedirs(WORK_ROOT, exist_ok=True)
    work = tempfile.mkdtemp(prefix="soak_", dir=WORK_ROOT)

    t0 = time.perf_counter()
    handle = run_north_star(
        spark, src,
        out_dir=os.path.join(work, "out"),
        checkpoint_dir=os.path.join(work, "ckpt"),
        max_files_per_trigger=fpt,
        available_now=False,
    )
    # drain detection: stop once both queries have consumed every file and
    # gone idle (two consecutive zero-row batches each)
    qs = handle.queries
    idle = {q.id: 0 for q in qs}
    sess_rows = 0
    try:
        while True:
            time.sleep(2)
            done = 0
            for q in qs:
                lp = q.lastProgress
                if lp and lp["numInputRows"] == 0:
                    idle[q.id] += 1
                elif lp:
                    idle[q.id] = 0
                if idle[q.id] >= 3:
                    done += 1
            if done == len(qs) or time.perf_counter() - t0 > 1800:
                break
        elapsed = time.perf_counter() - t0
        batches = []
        for q in qs:
            name = q.name
            for p in q.recentProgress:
                so = p.get("stateOperators") or []
                batches.append({
                    "query": name.replace("north_star_", ""),
                    "batch": p["batchId"],
                    "rows": p["numInputRows"],
                    "trigger_s": round(p["durationMs"]["triggerExecution"] / 1000, 2),
                    "state_rows": so[0]["numRowsTotal"] if so else None,
                    "wm": p.get("eventTime", {}).get("watermark"),
                })
        for q in qs:
            q.stop()
        sess_dir = os.path.join(work, "out", "sessions")
        if os.path.isdir(sess_dir):
            sess_rows = spark.read.parquet(sess_dir).count()
    finally:
        shutil.rmtree(work, ignore_errors=True)

    turn_batches = [b for b in batches if b["query"] == "turns" and b["rows"]]
    sess_batches = [b for b in batches if b["query"] == "sessions" and b["rows"]]
    busy_s = sum(b["trigger_s"] for b in turn_batches)
    tput = round(n_turns / busy_s, 1) if busy_s else None
    # steady-state = drop the first 2 batches (JIT)
    steady = turn_batches[2:] or turn_batches
    steady_tput = round(sum(b["rows"] for b in steady) /
                        max(sum(b["trigger_s"] for b in steady), 1e-9), 1)
    # median-batch throughput: the steady mean is hostage to a single
    # multi-second host stall (observed ~1/run on this sandbox VM); the
    # median batch is what a stall-free cluster sustains
    per_batch = sorted(b["rows"] / max(b["trigger_s"], 1e-9) for b in steady)
    median_tput = round(per_batch[len(per_batch) // 2], 1) if per_batch else 0.0
    peak_state = max((b["state_rows"] or 0 for b in sess_batches), default=0)
    result = {
        "sf": sf, "cores": cores, "files": n_files, "files_per_trigger": fpt,
        "turns": n_turns, "wall_s": round(elapsed, 1),
        "turn_batches": len(turn_batches), "session_batches": len(sess_batches),
        "busy_turns_per_sec": tput, "steady_turns_per_sec": steady_tput,
        "median_batch_turns_per_sec": median_tput,
        "sessions_emitted": sess_rows, "peak_session_state_rows": peak_state,
    }

    md = os.path.join(REPO, "BENCH", "SOAK.md")
    os.makedirs(os.path.dirname(md), exist_ok=True)
    with open(md, "w") as f:
        f.write(f"""# SOAK — sustained micro-batch streaming (continuous mode)

The drain bench processes everything in one epoch; this run is the
production shape: `maxFilesPerTrigger={fpt}` over {n_files} files at
SF={sf} on local[{cores}], watermark advancing batch-to-batch, sessions
emitted incrementally as they close, state bounded by the watermark.

* input: {n_turns:,} turns, {len(turn_batches)} parse micro-batches
* busy throughput (input / sum of parse trigger time): **{tput:,} turns/s**
* steady-state throughput (excl. first 2 JIT batches): **{steady_tput:,} turns/s**
* median-batch throughput (stall-robust; the sandbox VM shows ~one
  multi-second host stall per run): **{median_tput:,} turns/s**
* sessions emitted incrementally: {sess_rows:,}
* peak session-window state rows: {peak_state:,} (vs {sess_rows:,} total
  sessions — the watermark keeps state a small fraction of the stream,
  which is what makes the 10^12-turn target feasible: state scales with
  the active-session working set, not the stream length)

Per-batch trigger times (parse query):

| batch | rows | trigger s | watermark |
|---|---|---|---|
""")
        for b in turn_batches:
            f.write(f"| {b['batch']} | {b['rows']:,} | {b['trigger_s']} | {b['wm'] or '-'} |\n")
        f.write("""
Generated by `tools/soak.py`; exactly-once sink + checkpoint lineage
identical to the drain path (logstash_spark/streaming/jobs.py).
""")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
