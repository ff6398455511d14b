#!/usr/bin/env python
"""Profile the sessions phase alone: parse once to a turns dir, then run
session_rollup_stream over it repeatedly, dumping microbatch progress."""
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    master = sys.argv[1] if len(sys.argv) > 1 else 'local[32]'
    sf = float(sys.argv[2]) if len(sys.argv) > 2 else 10.0
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
    from logstash_spark.session import get_spark
    from logstash_spark.sources.transcripts import ensure_transcripts_parquet
    from logstash_spark.streaming.jobs import (
        stream_transcripts, parse_stage, session_rollup_stream, PARSED_SCHEMA)
    from logstash_spark.sinks.exactly_once import ExactlyOnceParquetSink

    src = ensure_transcripts_parquet(sf)
    cores = int(master[len('local['):-1]) if master.startswith('local[') else 32
    spark = get_spark("sess-profile", master=master, shuffle_partitions=cores)
    base = tempfile.mkdtemp(prefix="sp_", dir="/dev/shm/scexp")

    # produce the turns dir ONCE
    sink = ExactlyOnceParquetSink(os.path.join(base, "turns"))
    q = (parse_stage(stream_transcripts(spark, src))
         .writeStream.outputMode("append")
         .option("checkpointLocation", os.path.join(base, "ckpt_t"))
         .foreachBatch(sink.foreach_batch()).trigger(availableNow=True).start())
    q.awaitTermination()
    print("turns ready", flush=True)

    for i in range(reps):
        work = tempfile.mkdtemp(prefix=f"r{i}_", dir=base)
        sess_src = (spark.readStream.schema(PARSED_SCHEMA)
                    .option("pathGlobFilter", "*.parquet")
                    .parquet(os.path.join(base, "turns", "batch_id=*")))
        sessions = session_rollup_stream(sess_src)
        ssink = ExactlyOnceParquetSink(os.path.join(work, "sessions"),
                                       merge_keys=["conv_id", "session_start"])
        t0 = time.time()
        q = (sessions.writeStream.outputMode("append")
             .option("checkpointLocation", os.path.join(work, "ckpt"))
             .foreachBatch(ssink.foreach_batch())
             .trigger(availableNow=True).start())
        q.awaitTermination()
        sec = time.time() - t0
        batches = []
        for p in q.recentProgress:
            d = p["durationMs"]
            so = p.get("stateOperators") or []
            batches.append({
                "batch": p["batchId"], "rows": p["numInputRows"],
                "dur": {k: round(v / 1000, 2) for k, v in d.items()},
                "state": [{k: s.get(k) for k in
                           ("numRowsTotal", "numRowsUpdated", "commitTimeMs",
                            "stateMemory", "numShufflePartitions")} for s in so],
            })
        print(json.dumps({"rep": i, "sec": round(sec, 2), "batches": batches}),
              flush=True)
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    os.makedirs("/dev/shm/scexp", exist_ok=True)
    main()
