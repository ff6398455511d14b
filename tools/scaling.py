#!/usr/bin/env python
"""Scaling-efficiency evidence (BASELINE.json north rule).

The rule requires throughput scaling efficiency >= 0.8 from N to 4N
executors.  No real cluster exists in this sandbox, so (per driver
instruction) we run the IDENTICAL north-star job at two parallelism levels
— ``local[8]`` and ``local[32]`` — on the SAME input, in separate JVMs
(fresh SparkContext each), and report throughput at both plus the
efficiency ``(tput_4N / tput_N) / 4``.

Usage:
    python tools/scaling.py [sf]            # default sf=0.1; writes BENCH/BASELINE.md
    python tools/scaling.py --child N SF    # internal: one measured run
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _one_run(spark, src: str, tag: str) -> dict:
    from logstash_spark.streaming.jobs import run_north_star

    work = tempfile.mkdtemp(prefix=f"scale_{tag}_")
    try:
        t0 = time.perf_counter()
        q = run_north_star(spark, src,
                           out_dir=os.path.join(work, "out"),
                           checkpoint_dir=os.path.join(work, "ckpt"),
                           available_now=True)
        q.awaitTermination()
        elapsed = time.perf_counter() - t0
        trigger_ms = sum(p["durationMs"]["triggerExecution"]
                         for p in q.recentProgress)
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return {"sec": round(elapsed, 3), "trigger_sec": round(trigger_ms / 1000, 3)}


def child(cores: int, sf: float) -> None:
    """One measured configuration: warm the JVM/codegen on a small input
    first (excluded, standard benchmarking practice — a long-lived cluster
    is always warm), then time the full run twice and keep the best."""
    from logstash_spark.session import get_spark
    from logstash_spark.sources.transcripts import ensure_transcripts_parquet
    src = ensure_transcripts_parquet(sf)
    warm_src = ensure_transcripts_parquet(min(sf / 10, 0.1))
    spark = get_spark(f"scaling-{cores}", master=f"local[{cores}]")
    n_turns = spark.read.parquet(src).count()
    _one_run(spark, warm_src, f"{cores}_warm")
    runs = [_one_run(spark, src, f"{cores}_m{i}") for i in range(2)]
    best = min(runs, key=lambda r: r["sec"])
    print(json.dumps({"cores": cores, "sec": best["sec"],
                      "trigger_sec": best["trigger_sec"],
                      "runs": runs, "turns": n_turns,
                      "turns_per_sec": round(n_turns / best["sec"], 1)}))


def run_child(cores: int, sf: float) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--child", str(cores), str(sf)],
        capture_output=True, text=True, cwd=REPO, timeout=3600,
    )
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(int(sys.argv[2]), float(sys.argv[3]))
        return

    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 0.1
    # warm the input cache once so neither run pays generation cost
    from logstash_spark.sources.transcripts import ensure_transcripts_parquet
    src = ensure_transcripts_parquet(sf)

    r8 = run_child(8, sf)
    r32 = run_child(32, sf)
    eff = (r32["turns_per_sec"] / r8["turns_per_sec"]) / 4.0

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    md = os.path.join(REPO, "BENCH", "BASELINE.md")
    with open(md, "w") as f:
        f.write(f"""# BENCH — measured throughput & scaling efficiency

Job: the north-star streaming pipeline (grok + mutate + session-window
keyed by conv_id + exactly-once sink), `Trigger.AvailableNow` over the
seeded transcript stream at SF={sf} ({r8['turns']:,} turns, input
`{os.path.relpath(src, REPO)}`).  Identical job + identical input at two
parallelism levels, fresh JVM each (sandbox proxy for N vs 4N executors,
per BASELINE.json north rule + driver instruction).

| parallelism | wall sec | turns/sec |
|---|---|---|
| local[8]  (N)  | {r8['sec']} | {r8['turns_per_sec']:,} |
| local[32] (4N) | {r32['sec']} | {r32['turns_per_sec']:,} |

**Scaling efficiency (N -> 4N)** = ({r32['turns_per_sec']:,} / {r8['turns_per_sec']:,}) / 4
= **{eff:.2f}** (target >= 0.8).

Shuffle partitions track core count (8 / 32); AQE coalescing enabled in
both runs (logstash_spark/session.py).  Headline per-query timings are in
`BENCH_r*.json` produced by `bench.py`.
""")
    print(json.dumps({"sf": sf, "local8": r8, "local32": r32,
                      "efficiency": round(eff, 3), "report": md}))


if __name__ == "__main__":
    main()
