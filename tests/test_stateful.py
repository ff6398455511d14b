"""Exact aggregate-filter CEP semantics (applyInPandasWithState):
end_of_task mid-stream emission, timeout via event-time timer, task_id
reuse after a marker, pending state not emitted."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from logstash_spark.streaming import jobs as J
from logstash_spark.streaming.stateful import aggregate_stateful_stream


def _write(dirpath, rows, fname, mtime):
    tbl = pa.table({
        "conv_id": pa.array([r[0] for r in rows]),
        "turn_idx": pa.array([r[1] for r in rows], type=pa.int32()),
        "role": pa.array([r[2] for r in rows]),
        "text": pa.array([r[3] for r in rows]),
        "tool": pa.array([None] * len(rows), type=pa.string()),
        "ts": pa.array([r[4] * 1_000_000 for r in rows], type=pa.timestamp("us")),
    })
    p = os.path.join(dirpath, fname)
    pq.write_table(tbl, p)
    os.utime(p, (mtime, mtime))


T0 = 1_700_000_000


def test_aggregate_stateful_end_of_task_timeout_and_reuse(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    # conv A: 3 turns then marker; then a SECOND task on the same conv_id
    # conv B: no marker, last activity early -> must TIME OUT
    # conv C: recent activity, no marker -> stays pending (no emission)
    batch1 = [
        ("A", 0, "user", "hello", T0),
        ("A", 1, "assistant", "hi", T0 + 10),
        ("A", 2, "tool", "run", T0 + 20),
        ("A", 3, "assistant", "task=done bye", T0 + 30),
        ("B", 0, "user", "start b", T0 + 5),
        ("B", 1, "assistant", "working", T0 + 15),
    ]
    batch2 = [
        ("A", 4, "user", "second task", T0 + 100),
        ("A", 5, "assistant", "task=done again", T0 + 110),
        # far-future rows push the watermark past B's timeout
        ("C", 0, "user", "recent", T0 + 50_000),
        ("C", 1, "assistant", "still going", T0 + 50_010),
    ]
    _write(src, batch1, "p0.parquet", 1_700_000_000)
    _write(src, batch2, "p1.parquet", 1_700_000_001)

    stream = J.stream_transcripts(spark, src, max_files_per_trigger=1)
    out = aggregate_stateful_stream(stream, gap_sec=600, watermark="1 hour")
    sink_dir = str(tmp_path / "out")
    q = (out.writeStream.outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .format("parquet").option("path", sink_dir)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    rows = spark.read.parquet(sink_dir).collect()
    by = {}
    for r in rows:
        by.setdefault(r["conv_id"], []).append(r)

    # conv A: two end_of_task emissions (task_id reuse), correct accumulation
    a = sorted(by["A"], key=lambda r: r["first_ts"])
    assert [r["emit_reason"] for r in a] == ["end_of_task", "end_of_task"]
    assert a[0]["n_turns"] == 4 and a[0]["n_tool_turns"] == 1
    assert a[1]["n_turns"] == 2 and a[1]["n_tool_turns"] == 0
    assert a[0]["last_ts"].timestamp() == T0 + 30
    assert a[1]["first_ts"].timestamp() == T0 + 100

    # conv B: timeout emission with full accumulation
    b = by["B"]
    assert len(b) == 1 and b[0]["emit_reason"] == "timeout"
    assert b[0]["n_turns"] == 2
    assert b[0]["last_ts"].timestamp() == T0 + 15

    # conv C: still pending -> nothing emitted
    assert "C" not in by


def test_aggregate_stateful_matches_generated_markers(spark, tmp_path):
    """Every generated conversation ends with task=done; with in-order
    arrival each must emit exactly one end_of_task whose n_turns covers the
    turns at or before the marker."""
    from logstash_spark.sources.transcripts import generate_transcripts
    import pyarrow.compute as pc

    src = str(tmp_path / "src")
    os.makedirs(src)
    tbl = generate_transcripts(1200, seed=11, late_frac=0.0, malformed_frac=0.0)
    tbl = tbl.take(pc.sort_indices(tbl, sort_keys=[("ts", "ascending")]))
    half = tbl.num_rows // 2
    for i, sl in enumerate([tbl.slice(0, half), tbl.slice(half)]):
        p = os.path.join(src, f"p{i}.parquet")
        pq.write_table(sl, p)
        os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))

    stream = J.stream_transcripts(spark, src, max_files_per_trigger=1)
    out = aggregate_stateful_stream(stream, gap_sec=3600, watermark="30 minutes")
    sink_dir = str(tmp_path / "out")
    q = (out.writeStream.outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .format("parquet").option("path", sink_dir)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    got = spark.read.parquet(sink_dir)
    eot = got.filter("emit_reason = 'end_of_task'").collect()
    assert eot, "no end_of_task emissions"
    # no conversation may emit end_of_task twice (one marker each)
    convs = [r["conv_id"] for r in eot]
    assert len(convs) == len(set(convs))
    # accumulations are sane
    assert all(r["n_turns"] >= 1 and r["first_ts"] <= r["last_ts"] for r in eot)


def test_aggregate_stateful_kill_resume_matches_single_run(spark, tmp_path):
    """Kill/resume across the applyInPandasWithState checkpoint: run with
    half the files, stop (state persisted mid-task), add the rest, resume
    from the same checkpoint — the union of emissions must equal a fresh
    single-shot run over all files (state schema + timers survive resume)."""
    src = str(tmp_path / "src")
    os.makedirs(src)
    # conv A: first half BEFORE the kill, marker arrives AFTER resume
    # conv B: entirely before the kill, times out after resume (watermark
    #         pushed by conv C rows that only arrive post-resume)
    # conv C: post-resume watermark driver + its own marker
    batch1 = [
        ("A", 0, "user", "hello", T0),
        ("A", 1, "tool", "run", T0 + 10),
        ("B", 0, "user", "start b", T0 + 5),
        ("B", 1, "assistant", "working", T0 + 15),
    ]
    batch2 = [
        ("A", 2, "assistant", "task=done bye", T0 + 30),
        ("C", 0, "user", "go", T0 + 50_000),
        ("C", 1, "assistant", "task=done c", T0 + 50_010),
        ("C", 2, "user", "future", T0 + 90_000),
    ]

    def run(src_dir, ckpt, sink_dir):
        stream = J.stream_transcripts(spark, src_dir, max_files_per_trigger=1)
        out = aggregate_stateful_stream(stream, gap_sec=600, watermark="1 hour")
        q = (out.writeStream.outputMode("append")
             .option("checkpointLocation", ckpt)
             .format("parquet").option("path", sink_dir)
             .trigger(availableNow=True).start())
        q.awaitTermination()

    # phase 1: only batch1 visible; run to completion (kill point)
    _write(src, batch1, "p0.parquet", 1_700_000_000)
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "out")
    run(src, ckpt, sink)
    # phase 2: new file appears; resume from the SAME checkpoint
    _write(src, batch2, "p1.parquet", 1_700_000_001)
    run(src, ckpt, sink)
    got = {(r.conv_id, r.n_turns, r.n_tool_turns, r.emit_reason)
           for r in spark.read.parquet(sink).collect()}

    # single-shot reference: fresh checkpoint, all files at once
    src2 = str(tmp_path / "src2")
    os.makedirs(src2)
    _write(src2, batch1, "p0.parquet", 1_700_000_000)
    _write(src2, batch2, "p1.parquet", 1_700_000_001)
    ref_sink = str(tmp_path / "ref_out")
    run(src2, str(tmp_path / "ckpt2"), ref_sink)
    exp = {(r.conv_id, r.n_turns, r.n_tool_turns, r.emit_reason)
           for r in spark.read.parquet(ref_sink).collect()}

    assert ("A", 3, 1, "end_of_task") in exp, "fixture sanity"
    assert ("B", 2, 0, "timeout") in exp, "fixture sanity"
    assert got == exp


def test_aggregate_tws_twin_matches_apwstate(spark, tmp_path):
    """transformWithStateInPandas twin (RocksDB-backed) emits exactly what
    the applyInPandasWithState path emits on the same input.  Skipped (and
    the operator raises with an install hint) when the TWS worker's
    protobuf dependency is absent, as in this sandbox."""
    from logstash_spark.streaming.stateful import (aggregate_tws_stream,
                                                   tws_available)

    if not tws_available():
        with pytest.raises(NotImplementedError, match="protobuf"):
            aggregate_tws_stream(J.stream_transcripts(spark, str(tmp_path)))
        pytest.skip("protobuf absent: TWS gated (hint verified)")

    src = str(tmp_path / "src")
    os.makedirs(src)
    batch1 = [
        ("A", 0, "user", "hello", T0),
        ("A", 1, "assistant", "hi", T0 + 10),
        ("A", 2, "tool", "run", T0 + 20),
        ("A", 3, "assistant", "task=done bye", T0 + 30),
        ("B", 0, "user", "start b", T0 + 5),
        ("B", 1, "assistant", "working", T0 + 15),
    ]
    batch2 = [
        ("A", 4, "user", "second task", T0 + 100),
        ("A", 5, "assistant", "task=done again", T0 + 110),
        ("C", 0, "user", "recent", T0 + 50_000),
        ("C", 1, "assistant", "still going", T0 + 50_010),
    ]
    _write(src, batch1, "p0.parquet", 1_700_000_000)
    _write(src, batch2, "p1.parquet", 1_700_000_001)

    def run(builder, tag, conf=None):
        old = {}
        for k, v in (conf or {}).items():
            old[k] = spark.conf.get(k, None)
            spark.conf.set(k, v)
        try:
            stream = J.stream_transcripts(spark, src, max_files_per_trigger=1)
            out = builder(stream, gap_sec=600, watermark="1 hour")
            sink = str(tmp_path / f"out_{tag}")
            q = (out.writeStream.outputMode("append")
                 .option("checkpointLocation", str(tmp_path / f"ck_{tag}"))
                 .format("parquet").option("path", sink)
                 .trigger(availableNow=True).start())
            q.awaitTermination()
            return {tuple(r) for r in spark.read.parquet(sink).collect()}
        finally:
            for k, v in old.items():
                if v is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, v)

    rocks = {"spark.sql.streaming.stateStore.providerClass":
             "org.apache.spark.sql.execution.streaming.state."
             "RocksDBStateStoreProvider"}
    base = run(aggregate_stateful_stream, "apw")
    tws = run(aggregate_tws_stream, "tws", conf=rocks)
    assert tws == base and tws


def test_throttle_stream_kill_resume_matches_single_run(spark, tmp_path):
    """Throttle state (per key+window running count) survives a
    checkpoint resume: split-run union == single-shot run."""
    from logstash_spark.streaming.stateful import throttle_stream

    batch1 = [("A", i, "user", f"m{i}", T0 + i) for i in range(4)]
    batch2 = [("A", i, "user", f"m{i}", T0 + i) for i in range(4, 8)]
    # push watermark so windows close
    batch2 += [("Z", 0, "user", "future", T0 + 90_000)]

    def run(src_dir, ckpt, sink_dir):
        stream = J.stream_transcripts(spark, src_dir, max_files_per_trigger=1)
        out = throttle_stream(stream, period="1 hour", max_count=5)
        q = (out.writeStream.outputMode("append")
             .option("checkpointLocation", ckpt)
             .format("parquet").option("path", sink_dir)
             .trigger(availableNow=True).start())
        q.awaitTermination()

    src = str(tmp_path / "src")
    os.makedirs(src)
    _write(src, batch1, "p0.parquet", 1_700_000_000)
    ckpt, sink = str(tmp_path / "ck"), str(tmp_path / "out")
    run(src, ckpt, sink)
    _write(src, batch2, "p1.parquet", 1_700_000_001)
    run(src, ckpt, sink)
    got = {(r.conv_id, r.turn_idx, r.throttled)
           for r in spark.read.parquet(sink).collect()}

    src2 = str(tmp_path / "src2")
    os.makedirs(src2)
    _write(src2, batch1, "p0.parquet", 1_700_000_000)
    _write(src2, batch2, "p1.parquet", 1_700_000_001)
    sink2 = str(tmp_path / "out2")
    run(src2, str(tmp_path / "ck2"), sink2)
    want = {(r.conv_id, r.turn_idx, r.throttled)
            for r in spark.read.parquet(sink2).collect()}

    assert got == want and got
    # the split across the kill is mid-window: turns 5..7 only throttle if
    # the pre-kill count (4) survived the resume
    assert ("A", 6, True) in got and ("A", 3, False) in got
