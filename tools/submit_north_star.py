#!/usr/bin/env python
"""spark-submit entry point for the north-star streaming pipeline.

Cluster usage (north rule: "runs via spark-submit --py-files on
multi-executor clusters"):

    cd /root/repo && zip -qr /tmp/logstash_spark.zip logstash_spark
    spark-submit --master <yarn|k8s://...|spark://...> \
        --py-files /tmp/logstash_spark.zip \
        tools/submit_north_star.py \
        --src  <transcript table / parquet dir> \
        --out  <sink dir / Iceberg table path> \
        --ckpt <checkpoint dir> [--gap "30 minutes"] [--watermark "1 hour"] \
        [--continuous]            # default: Trigger.AvailableNow (drain+stop)

Local smoke (same code path the driver/bench use):

    python tools/submit_north_star.py --src data/transcripts_sf0.1 \
        --out /tmp/ns_out --ckpt /tmp/ns_ckpt

The job is resumable: re-submitting with the same --ckpt continues from the
recorded offsets (per-partition lineage), and the exactly-once sink makes
epoch replays no-ops.  On a real cluster the N -> 4N scaling knob is just
executor count; shuffle partitions follow SPARK_GRAFT_CPUS or
--shuffle-partitions.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# local runs: make the repo root importable (cluster runs get the package
# via --py-files instead)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--src", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--ckpt", required=True)
    p.add_argument("--gap", default="30 minutes")
    p.add_argument("--watermark", default="1 hour")
    p.add_argument("--max-files-per-trigger", type=int, default=None)
    p.add_argument("--continuous", action="store_true",
                   help="keep running (micro-batch cadence) instead of "
                        "draining available data and stopping")
    p.add_argument("--metrics", default=None,
                   help="jsonl path for the flow-metrics/lineage listener")
    args = p.parse_args(argv)

    from logstash_spark.session import get_spark
    from logstash_spark.streaming.jobs import run_north_star

    spark = get_spark("north-star")
    if args.metrics:
        from logstash_spark.streaming.listener import FlowMetricsListener
        spark.streams.addListener(FlowMetricsListener(args.metrics))

    q = run_north_star(
        spark, args.src, args.out, args.ckpt,
        gap=args.gap, watermark=args.watermark,
        max_files_per_trigger=args.max_files_per_trigger,
        available_now=not args.continuous,
    )
    q.awaitTermination()
    last = q.lastProgress
    if last:
        print(json.dumps({"batchId": last["batchId"],
                          "numInputRows": last["numInputRows"],
                          "durationMs": last["durationMs"]}))


if __name__ == "__main__":
    main()
