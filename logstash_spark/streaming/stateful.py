"""Exact aggregate-filter CEP semantics via applyInPandasWithState.

The reference's aggregate filter (plugin logstash-filter-aggregate,
rakelib/plugins-metadata.json:79) keeps a per-task map across events and
emits it as a new event on (a) `end_of_task => true`, or (b) timeout with
`push_map_as_event_on_timeout` — the timeout check rides the periodic
flush tick (logstash-core/src/main/java/org/logstash/execution/
PeriodicFlush.java:50-57; flush API AbstractFilterDelegatorExt.java:154-175).
It is single-worker-only in the reference (java_pipeline.rb:105-127).

`session_window` aggregation (jobs.session_rollup_stream) covers the common
gap-timeout case declaratively; THIS operator is the exact-CEP path the
north star calls for: per-key mutable state + event-time timers, emitting

* `end_of_task` — the moment a done-marker turn is processed (mid-stream,
  not deferred to window close), state cleared, a later turn starts a
  fresh accumulation (the reference's `task_id` reuse), and
* `timeout` — when the event-time watermark passes last_activity + gap
  (push_map_as_event_on_timeout), via GroupStateTimeout.EventTimeTimeout.

Scale design: state is partitioned by conv_id (the same key every other
stateful stage uses, so the shuffle partitioning is reused); per-group
logic is pandas-vectorized over Arrow batches — the only Python loop is
over done-marker segments within a (group, micro-batch), never over rows.
Watermark bounds state exactly as it bounds the session windows.
"""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = ("conv_id string, n_turns long, first_ts timestamp, "
              "last_ts timestamp, n_tool_turns long, emit_reason string")
STATE_SCHEMA = "n long, first_us long, last_us long, tools long"

_US = 1_000_000


def _emit(conv_id, n, first_us, last_us, tools, reason):
    import pandas as pd

    return pd.DataFrame({
        "conv_id": [conv_id],
        "n_turns": [n],
        "first_ts": [pd.Timestamp(first_us, unit="us")],
        "last_ts": [pd.Timestamp(last_us, unit="us")],
        "n_tool_turns": [tools],
        "emit_reason": [reason],
    })


def _fold_batch(conv_id, pdf, carry0, end_marker):
    """Shared CEP core for BOTH stateful APIs (applyInPandasWithState and
    transformWithStateInPandas): fold one micro-batch's rows for one key
    into (emissions, carry_out).  carry/carry_out = (n, first_us, last_us,
    tools) or None.  Pure pandas -> fully exercised by the apw tests even
    where the TWS API itself is env-gated."""
    import pandas as pd  # noqa: F401

    emissions = []
    raw_ts = pdf["ts"].astype("int64") // 1000  # pandas ns -> us
    raw_tool = pdf["role"] == "tool"
    raw_done = pdf["text"].str.contains(end_marker, regex=False).fillna(False)
    ndone = int(raw_done.sum())

    def merged(n, first, last, tools, c):
        if c is None:
            return (n, first, last, tools)
        return (n + c[0], min(first, c[1]), max(last, c[2]), tools + c[3])

    # fast path A — no end marker in this batch: order-free stats merge
    # (the dominant shape for live incremental batches; skips the
    # sort + segment machinery, which is ~all of the per-group cost)
    if ndone == 0:
        return emissions, merged(len(pdf), int(raw_ts.min()),
                                 int(raw_ts.max()), int(raw_tool.sum()),
                                 carry0)
    # fast path B — exactly one marker with an unambiguous timestamp:
    # everything at-or-before it closes one task, the rest carries
    # (the dominant drain/backfill shape)
    if ndone == 1:
        m_ts = int(raw_ts[raw_done].iloc[0])
        if int((raw_ts == m_ts).sum()) == 1:
            before = raw_ts <= m_ts
            emissions.append(_emit(
                conv_id, *merged(int(before.sum()), int(raw_ts[before].min()),
                                 m_ts, int(raw_tool[before].sum()), carry0),
                "end_of_task"))
            after = ~before
            if bool(after.any()):
                return emissions, (int(after.sum()), int(raw_ts[after].min()),
                                   int(raw_ts[after].max()),
                                   int(raw_tool[after].sum()))
            return emissions, None

    # general path: multiple markers / timestamp ties
    pdf = pdf.sort_values(["ts", "turn_idx"], kind="stable")
    ts_us = pdf["ts"].astype("int64") // 1000
    is_tool = (pdf["role"] == "tool").astype("int64")
    done = pdf["text"].str.contains(end_marker, regex=False).fillna(False)

    # segment the batch at done-markers: rows up to and including each
    # marker close one task; the tail stays in state
    seg = done.cumsum().shift(fill_value=0)  # segment index per row
    carry = carry0

    for _seg_id, grp in pdf.groupby(seg.values, sort=True):
        g_ts = ts_us[grp.index]
        g_n = len(grp)
        g_first, g_last = int(g_ts.min()), int(g_ts.max())
        g_tools = int(is_tool[grp.index].sum())
        if carry is not None:
            n0, f0, l0, t0 = carry
            g_n += n0
            g_first, g_last = min(g_first, f0), max(g_last, l0)
            g_tools += t0
            carry = None
        if bool(done[grp.index].any()):
            emissions.append(_emit(conv_id, g_n, g_first, g_last, g_tools,
                                   "end_of_task"))
        else:
            carry = (g_n, g_first, g_last, g_tools)
    return emissions, carry


def make_aggregate_fn(gap_sec: int, end_marker: str = "task=done"):
    """Build the per-group stateful function (curried so gap/marker are
    plain broadcast closures, no driver state)."""

    def _park(state, carry):
        state.update(carry)
        # timer at last activity + gap; must be ahead of the watermark
        wm_ms = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max(carry[2] // 1000 + gap_sec * 1000,
                                      wm_ms + 1))

    def fn(key, pdf_iter, state: GroupState):
        import pandas as pd

        conv_id = key[0]
        if state.hasTimedOut:
            n, first_us, last_us, tools = state.get
            state.remove()
            yield _emit(conv_id, n, first_us, last_us, tools, "timeout")
            return

        chunks = list(pdf_iter)
        pdf = chunks[0] if len(chunks) == 1 else pd.concat(chunks, ignore_index=True)
        carry0 = state.get if state.exists else None
        emissions, carry = _fold_batch(conv_id, pdf, carry0, end_marker)
        yield from emissions
        if carry is not None:
            _park(state, carry)
        elif state.exists:
            state.remove()

    return fn


def aggregate_stateful_stream(df: DataFrame, gap_sec: int = 1800,
                              watermark: str = "1 hour",
                              end_marker: str = "task=done") -> DataFrame:
    """df: streaming transcript DataFrame (conv_id, turn_idx, role, text, ts).

    Returns the emitted task summaries (one row per end_of_task or timeout).
    """
    return (
        df.withWatermark("ts", watermark)
        .groupBy("conv_id")
        .applyInPandasWithState(
            make_aggregate_fn(gap_sec, end_marker),
            OUT_SCHEMA, STATE_SCHEMA,
            "append", GroupStateTimeout.EventTimeTimeout,
        )
    )


# ---------------------------------------------------------------------------
# streaming throttle (reference logstash-filter-throttle, meta:211)
# ---------------------------------------------------------------------------

THROTTLE_OUT_SCHEMA = ("conv_id string, turn_idx int, ts timestamp, "
                       "throttled boolean")
THROTTLE_STATE_SCHEMA = "n long"


def make_throttle_fn(max_count: int):
    """Per-(key, window) running event count; events past `max_count` are
    flagged.  This is the reference's after_count semantics — an event is
    throttled the moment the key exceeds the rate, earlier events pass —
    which, unlike the batch join-back shape (windows.throttle tags the whole
    over-limit window after the fact), is streaming-legal: every event is
    emitted in the micro-batch it arrives in, state is one counter per
    (key, window), cleared by an event-time timer at window end."""

    def fn(key, pdf_iter, state: GroupState):
        import pandas as pd

        if state.hasTimedOut:
            state.remove()
            return

        chunks = list(pdf_iter)
        pdf = chunks[0] if len(chunks) == 1 else pd.concat(chunks, ignore_index=True)
        pdf = pdf.sort_values(["ts", "turn_idx"], kind="stable")
        import numpy as np

        n0 = state.get[0] if state.exists else 0
        running = n0 + np.arange(1, len(pdf) + 1)
        win_end_us = int(key[1].value) // 1000 if hasattr(key[1], "value") else 0
        state.update((n0 + len(pdf),))
        # clear state once the watermark passes the window end
        state.setTimeoutTimestamp(max(win_end_us // 1000,
                                      state.getCurrentWatermarkMs() + 1))
        yield pd.DataFrame({
            "conv_id": pdf["conv_id"].values,
            "turn_idx": pdf["turn_idx"].values,
            "ts": pdf["ts"].values,
            "throttled": running > max_count,
        })

    return fn


def throttle_stream(df: DataFrame, period: str = "1 hour", max_count: int = 10,
                    key_col: str = "conv_id",
                    watermark: str = "1 hour") -> DataFrame:
    """Streaming throttle: flag events beyond `max_count` per key per
    tumbling `period` window.  Grouping key is (key, window_end) so the
    shuffle partitioning matches the other conv_id-keyed stages."""
    from pyspark.sql import functions as F

    staged = (df.withWatermark("ts", watermark)
              .withColumn("__we", F.window(F.col("ts"), period).getField("end")))
    return (
        staged.groupBy(key_col, "__we")
        .applyInPandasWithState(
            make_throttle_fn(max_count),
            THROTTLE_OUT_SCHEMA, THROTTLE_STATE_SCHEMA,
            "append", GroupStateTimeout.EventTimeTimeout,
        )
    )


# ---------------------------------------------------------------------------
# transformWithStateInPandas twin (Spark 4 stateful API; RocksDB-backed)
# ---------------------------------------------------------------------------

def tws_available() -> bool:
    """True when the TWS worker's protobuf dependency is importable."""
    try:
        from google.protobuf import descriptor  # noqa: F401
        return True
    except ImportError:
        return False

def aggregate_tws_stream(df: DataFrame, gap_sec: int = 1800,
                         watermark: str = "1 hour",
                         end_marker: str = "task=done") -> DataFrame:
    """Same CEP semantics as aggregate_stateful_stream, on the
    transformWithState API (SPARK-49564: typed value state + first-class
    event-time timers + TTL; REQUIRES the RocksDB state-store provider —
    state lives off-heap/on-disk, the 10^12-turn configuration).

    applyInPandasWithState remains the default (works on any provider);
    this twin is the forward path and is pinned equal to it by
    tests/test_stateful.py when the environment supports it.

    ENV GATE: the TWS python worker speaks protobuf to the JVM state
    server (pyspark/sql/streaming/proto/StateMessage_pb2); without the
    `protobuf` package this raises with the install hint.
    """
    if not tws_available():
        raise NotImplementedError(
            "transformWithStateInPandas needs the protobuf package on the "
            "driver/executors: pip install protobuf (absent in this "
            "sandbox); use aggregate_stateful_stream (identical semantics)")
    from pyspark.sql.streaming import StatefulProcessor

    class AggProcessor(StatefulProcessor):
        def init(self, handle):
            self.handle = handle
            self.state = handle.getValueState("agg", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timer_values):
            import pandas as pd

            conv_id = key[0]
            exists = self.state.exists()
            carry0 = tuple(self.state.get()) if exists else None
            chunks = list(rows)
            pdf = (chunks[0] if len(chunks) == 1
                   else pd.concat(chunks, ignore_index=True))
            # SAME core as applyInPandasWithState (fast paths + segment
            # fold) — only the state/timer plumbing differs per API
            emissions, carry = _fold_batch(conv_id, pdf, carry0, end_marker)
            if carry is not None:
                self.state.update(carry)
                # event-time timer at last activity + gap
                for t in self.handle.listTimers():
                    self.handle.deleteTimer(t)
                self.handle.registerTimer(carry[2] // 1000 + gap_sec * 1000)
            elif exists:
                self.state.clear()
            return iter(emissions)

        def handleExpiredTimer(self, key, timer_values, expired_timer_info):
            if self.state.exists():
                n, first_us, last_us, tools = self.state.get()
                self.state.clear()
                yield _emit(key[0], n, first_us, last_us, tools, "timeout")

        def close(self):
            pass

    return (df.withWatermark("ts", watermark)
            .groupBy("conv_id")
            .transformWithStateInPandas(AggProcessor(), OUT_SCHEMA,
                                        "append", "eventTime",
                                        eventTimeColumnName="last_ts"))
