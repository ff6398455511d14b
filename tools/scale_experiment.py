#!/usr/bin/env python
"""Throwaway experiment: time north-star phases under different masters.

Usage: python tools/scale_experiment.py <master> <sf> [tag]
Prints one JSON line with phase timings.
"""
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


WORK_ROOT = os.environ.get("SCEXP_WORK", "/dev/shm/scexp")


def gc_ms(spark) -> int:
    mf = spark._jvm.java.lang.management.ManagementFactory
    return sum(b.getCollectionTime() for b in mf.getGarbageCollectorMXBeans())


def one_run(spark, src):
    from logstash_spark.streaming.jobs import run_north_star
    os.makedirs(WORK_ROOT, exist_ok=True)
    gc0 = gc_ms(spark)
    work = tempfile.mkdtemp(prefix="scexp_", dir=WORK_ROOT)
    try:
        t0 = time.perf_counter()
        q = run_north_star(spark, src,
                           out_dir=os.path.join(work, "out"),
                           checkpoint_dir=os.path.join(work, "ckpt"),
                           available_now=True)
        # run_north_star awaits q1 internally in drain mode; measure split
        q.awaitTermination()
        elapsed = time.perf_counter() - t0
        per_q = {}
        for sq in q.queries:
            ms = sum(p["durationMs"]["triggerExecution"] for p in sq.recentProgress)
            per_q[sq.name] = round(ms / 1000, 2)
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return {"sec": round(elapsed, 3), "phases": per_q,
            "gc_sec": round((gc_ms(spark) - gc0) / 1000, 1)}


def main():
    master, sf = sys.argv[1], float(sys.argv[2])
    tag = sys.argv[3] if len(sys.argv) > 3 else master
    os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
    from logstash_spark.session import get_spark
    from logstash_spark.sources.transcripts import ensure_transcripts_parquet
    src = ensure_transcripts_parquet(sf)

    # shuffle partitions: match total cores
    if master.startswith("local-cluster["):
        w, c, m = master[len("local-cluster["):-1].split(",")
        cores = int(w) * int(c)
        extra = {"spark.executor.memory": f"{int(m)}m",
                 "spark.executor.cores": c}
    elif master.startswith("local["):
        cores = int(master[len("local["):-1])
        extra = {}
    else:
        cores = 32
        extra = {}
    # extra conf via env: SCEXP_CONF="k1=v1;k2=v2"
    for kv in os.environ.get("SCEXP_CONF", "").split(";"):
        if "=" in kv:
            k, v = kv.split("=", 1)
            extra[k] = v
    spark = get_spark(f"scexp-{tag}", master=master,
                      shuffle_partitions=cores, extra_conf=extra)
    n = spark.read.parquet(src).count()
    # warm-up: one FULL run (JIT, page cache, heap first-touch) — excluded
    warm = one_run(spark, src)
    runs = sorted((one_run(spark, src) for i in range(3)), key=lambda r: r["sec"])
    med = runs[len(runs) // 2]
    print(json.dumps({"tag": tag, "master": master, "cores": cores, "sf": sf,
                      "turns": n, "median": med, "warm": warm, "runs": runs,
                      "turns_per_sec": round(n / med["sec"], 1)}))
    spark.stop()


if __name__ == "__main__":
    main()
