#!/usr/bin/env python
"""Repeat the turns phase N times in one JVM, sampling /proc/stat."""
import json
import os
import shutil
import sys
import tempfile
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

NAMES = ['user', 'nice', 'system', 'idle', 'iowait', 'irq', 'softirq', 'steal']


def snap():
    with open('/proc/stat') as f:
        return list(map(int, f.readline().split()[1:9]))


class Sampler(threading.Thread):
    def __init__(self):
        super().__init__(daemon=True)
        self.marks = []
        self.stop = False

    def run(self):
        while not self.stop:
            self.marks.append((time.time(), snap()))
            time.sleep(2)


def cpu_pct(marks, t0, t1):
    in_win = [s for t, s in marks if t0 <= t <= t1]
    if len(in_win) < 2:
        return {}
    d = [y - x for x, y in zip(in_win[0], in_win[-1])]
    tot = sum(d) or 1
    return {n: round(100 * v / tot, 1) for n, v in zip(NAMES, d)}


def main():
    master = sys.argv[1] if len(sys.argv) > 1 else 'local[32]'
    sf = float(sys.argv[2]) if len(sys.argv) > 2 else 10.0
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
    from logstash_spark.session import get_spark
    from logstash_spark.sources.transcripts import ensure_transcripts_parquet
    from logstash_spark.streaming.jobs import stream_transcripts, parse_stage
    from logstash_spark.sinks.exactly_once import ExactlyOnceParquetSink

    src = ensure_transcripts_parquet(sf)
    cores = int(master[len('local['):-1]) if master.startswith('local[') else 32
    spark = get_spark("turns-profile", master=master, shuffle_partitions=cores)
    samp = Sampler()
    samp.start()
    mf = spark._jvm.java.lang.management.ManagementFactory

    def gc_ms():
        return sum(b.getCollectionTime() for b in mf.getGarbageCollectorMXBeans())

    for i in range(reps):
        work = tempfile.mkdtemp(prefix="tp_", dir="/dev/shm/scexp")
        sink = ExactlyOnceParquetSink(os.path.join(work, "turns"))
        g0 = gc_ms()
        t0 = time.time()
        q = (parse_stage(stream_transcripts(spark, src))
             .writeStream.outputMode("append")
             .option("checkpointLocation", os.path.join(work, "ckpt"))
             .foreachBatch(sink.foreach_batch())
             .trigger(availableNow=True).start())
        q.awaitTermination()
        t1 = time.time()
        print(json.dumps({"rep": i, "sec": round(t1 - t0, 2),
                          "gc_sec": round((gc_ms() - g0) / 1000, 1),
                          "cpu": cpu_pct(samp.marks, t0, t1)}), flush=True)
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    os.makedirs("/dev/shm/scexp", exist_ok=True)
    main()
