"""Binary wire-format codecs: netflow v5, msgpack, fluent, collectd.

Reference plugins (rakelib/plugins-metadata.json:2-38): logstash-codec-
netflow, -msgpack, -fluent, -collectd.  The reference decodes these with
client libraries; none are installed in this environment, and none are
needed — all four wire formats are public, fixed specifications:

* netflow v5: RFC-less but Cisco-published fixed layout — 24-byte header +
  N x 48-byte records, all fields big-endian.
* msgpack: the msgpack.org spec (format byte -> typed payload).
* fluent forward mode: msgpack arrays ``[tag, time, record]`` (and the
  batched ``[tag, [[time, record], ...]]`` form).
* collectd: TLV "parts" (type u16, length u16, payload), numeric parts
  big-endian u64/i64, gauges little-endian f64 (the protocol's own quirk).

Execution shape: every decoder runs inside ``mapInPandas`` — Arrow batches
in, a Python/numpy decode over the batch, Arrow batches out.  This is the
sanctioned escape-hatch shape for binary payloads (same as the yaml full
path, operators/parsers.yaml_filter): the interpreter loop is per PACKET
(which carries up to 30 flow records / many values), numpy vectorizes the
fixed-layout record arrays inside each packet, and no row-at-a-time Python
UDF appears in any plan.  At 100 TB these parallelize embarrassingly: the
decode is a narrow map, no shuffle, and the output schema is fixed so
column pruning works downstream.
"""

from __future__ import annotations

import struct

from pyspark.sql import DataFrame


# ---------------------------------------------------------------------------
# netflow v5 (logstash-codec-netflow, meta:26)
# ---------------------------------------------------------------------------

NETFLOW5_SCHEMA = (
    "flow_seq_num long, engine_type int, engine_id int, sampling_interval int, "
    "uptime_ms long, unix_sec long, "
    "ipv4_src_addr string, ipv4_dst_addr string, ipv4_next_hop string, "
    "input_snmp int, output_snmp int, in_pkts long, in_bytes long, "
    "first_switched long, last_switched long, "
    "l4_src_port int, l4_dst_port int, tcp_flags int, protocol int, "
    "src_tos int, src_as int, dst_as int, src_mask int, dst_mask int, "
    "record_idx int, netflow_failed boolean"
)

_NF5_HEADER = struct.Struct(">HHIIIIBBH")   # 24 bytes
_NF5_RECORD_LEN = 48


def _ip_str(arr):
    """uint32 array -> dotted-quad strings, vectorized."""
    return [f"{v >> 24 & 255}.{v >> 16 & 255}.{v >> 8 & 255}.{v & 255}"
            for v in arr]


def _decode_nf5_packet(buf: bytes):
    """One export packet -> list of per-record dicts (numpy-vectorized)."""
    import numpy as np

    if buf is None or len(buf) < _NF5_HEADER.size:
        return None
    (version, count, uptime, unix_sec, _unix_nsec, flow_seq,
     engine_type, engine_id, sampling) = _NF5_HEADER.unpack_from(buf, 0)
    if version != 5 or len(buf) < _NF5_HEADER.size + count * _NF5_RECORD_LEN:
        return None
    rec = np.frombuffer(
        buf, offset=_NF5_HEADER.size, count=count,
        dtype=np.dtype([
            ("src", ">u4"), ("dst", ">u4"), ("nexthop", ">u4"),
            ("input", ">u2"), ("output", ">u2"),
            ("dpkts", ">u4"), ("doctets", ">u4"),
            ("first", ">u4"), ("last", ">u4"),
            ("srcport", ">u2"), ("dstport", ">u2"),
            ("pad1", "u1"), ("tcp_flags", "u1"), ("prot", "u1"), ("tos", "u1"),
            ("src_as", ">u2"), ("dst_as", ">u2"),
            ("src_mask", "u1"), ("dst_mask", "u1"), ("pad2", ">u2"),
        ]))
    return {
        "flow_seq_num": int(flow_seq), "engine_type": int(engine_type),
        "engine_id": int(engine_id), "sampling_interval": int(sampling),
        "uptime_ms": int(uptime), "unix_sec": int(unix_sec),
        "ipv4_src_addr": _ip_str(rec["src"]),
        "ipv4_dst_addr": _ip_str(rec["dst"]),
        "ipv4_next_hop": _ip_str(rec["nexthop"]),
        "input_snmp": rec["input"], "output_snmp": rec["output"],
        "in_pkts": rec["dpkts"], "in_bytes": rec["doctets"],
        "first_switched": rec["first"], "last_switched": rec["last"],
        "l4_src_port": rec["srcport"], "l4_dst_port": rec["dstport"],
        "tcp_flags": rec["tcp_flags"], "protocol": rec["prot"],
        "src_tos": rec["tos"], "src_as": rec["src_as"], "dst_as": rec["dst_as"],
        "src_mask": rec["src_mask"], "dst_mask": rec["dst_mask"],
        "n": int(count),
    }


def netflow5_decode(df: DataFrame, source: str,
                    carry_cols: list[str] | None = None) -> DataFrame:
    """Decode netflow v5 export packets (binary column) into one row per
    flow record; malformed/wrong-version packets yield one row with
    ``netflow_failed=true`` (reference tags decode failures).
    """
    carry = carry_cols if carry_cols is not None else [
        c for c in df.columns if c != source]
    carry_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.schema.fields if f.name in carry)
    out_schema = (carry_schema + ", " if carry_schema else "") + NETFLOW5_SCHEMA
    fields = [f.strip().rsplit(" ", 1)[0] for f in NETFLOW5_SCHEMA.split(",")]

    def decode(batches):
        import pandas as pd

        for pdf in batches:
            out_rows = []
            for _, row in pdf.iterrows():
                base = {c: row[c] for c in carry}
                pkt = _decode_nf5_packet(row[source])
                if pkt is None:
                    out_rows.append({**base,
                                     **{f: None for f in fields},
                                     "record_idx": None,
                                     "netflow_failed": True})
                    continue
                n = pkt.pop("n")
                if n == 0:
                    # count=0 is a decode anomaly (no collector emits it);
                    # a zero-row packet must be visible downstream, not
                    # silently indistinguishable from filtered data
                    out_rows.append({**base,
                                     **{f: None for f in fields},
                                     "record_idx": None,
                                     "netflow_failed": True})
                    continue
                for i in range(n):
                    out_rows.append({**base,
                                     **{k: (int(v[i]) if hasattr(v, "dtype")
                                            else v[i] if isinstance(v, list)
                                            else v)
                                        for k, v in pkt.items()},
                                     "record_idx": i,
                                     "netflow_failed": False})
            yield pd.DataFrame(out_rows,
                               columns=carry + fields) if out_rows else \
                pd.DataFrame(columns=carry + fields)

    return df.mapInPandas(decode, out_schema)


# ---------------------------------------------------------------------------
# msgpack (logstash-codec-msgpack, meta:22) — spec-complete minimal decoder
# ---------------------------------------------------------------------------

class MsgpackError(ValueError):
    pass


_MP_MAX_DEPTH = 512


def _mp_decode(buf: bytes, pos: int = 0, depth: int = 0):
    """Decode one msgpack object at ``pos``; return (value, next_pos).

    Implements the msgpack.org format families: nil/bool, fixint,
    uint8-64, int8-64, float32/64, fixstr/str8-32, bin8-32,
    fixarray/array16-32, fixmap/map16-32.  Ext types are surfaced as
    (type, bytes) tuples.  Raises MsgpackError on truncation/unknown,
    and on nesting past ``_MP_MAX_DEPTH`` — a ~100 KB run of 0x91 bytes
    must become a failure TAG, not a task-killing RecursionError.
    """
    if depth > _MP_MAX_DEPTH:
        raise MsgpackError("nesting too deep")
    if pos >= len(buf):
        raise MsgpackError("truncated")
    b = buf[pos]
    pos += 1
    if b <= 0x7F:                       # positive fixint
        return b, pos
    if b >= 0xE0:                       # negative fixint
        return b - 0x100, pos
    if 0x80 <= b <= 0x8F:               # fixmap
        return _mp_map(buf, pos, b & 0x0F, depth + 1)
    if 0x90 <= b <= 0x9F:               # fixarray
        return _mp_array(buf, pos, b & 0x0F, depth + 1)
    if 0xA0 <= b <= 0xBF:               # fixstr
        n = b & 0x1F
        return buf[pos:pos + n].decode("utf-8"), pos + n
    if b == 0xC0:
        return None, pos
    if b == 0xC2:
        return False, pos
    if b == 0xC3:
        return True, pos
    if b in (0xC4, 0xC5, 0xC6):         # bin8/16/32
        w = 1 << (b - 0xC4)
        n = int.from_bytes(buf[pos:pos + w], "big")
        pos += w
        return buf[pos:pos + n], pos + n
    if b == 0xCA:
        return struct.unpack_from(">f", buf, pos)[0], pos + 4
    if b == 0xCB:
        return struct.unpack_from(">d", buf, pos)[0], pos + 8
    if b in (0xCC, 0xCD, 0xCE, 0xCF):   # uint8/16/32/64
        w = 1 << (b - 0xCC)
        return int.from_bytes(buf[pos:pos + w], "big"), pos + w
    if b in (0xD0, 0xD1, 0xD2, 0xD3):   # int8/16/32/64
        w = 1 << (b - 0xD0)
        return int.from_bytes(buf[pos:pos + w], "big", signed=True), pos + w
    if b in (0xD9, 0xDA, 0xDB):         # str8/16/32
        w = 1 << (b - 0xD9)
        n = int.from_bytes(buf[pos:pos + w], "big")
        pos += w
        return buf[pos:pos + n].decode("utf-8"), pos + n
    if b == 0xDC:
        return _mp_array(buf, pos + 2,
                         int.from_bytes(buf[pos:pos + 2], "big"), depth + 1)
    if b == 0xDD:
        return _mp_array(buf, pos + 4,
                         int.from_bytes(buf[pos:pos + 4], "big"), depth + 1)
    if b == 0xDE:
        return _mp_map(buf, pos + 2,
                       int.from_bytes(buf[pos:pos + 2], "big"), depth + 1)
    if b == 0xDF:
        return _mp_map(buf, pos + 4,
                       int.from_bytes(buf[pos:pos + 4], "big"), depth + 1)
    if b in (0xD4, 0xD5, 0xD6, 0xD7, 0xD8):   # fixext 1/2/4/8/16
        n = 1 << (b - 0xD4)
        t = buf[pos]
        return ("__ext__", t, buf[pos + 1:pos + 1 + n]), pos + 1 + n
    if b in (0xC7, 0xC8, 0xC9):               # ext8/16/32
        w = 1 << (b - 0xC7)
        n = int.from_bytes(buf[pos:pos + w], "big")
        pos += w
        t = buf[pos]
        return ("__ext__", t, buf[pos + 1:pos + 1 + n]), pos + 1 + n
    raise MsgpackError(f"unknown format byte 0x{b:02x}")


def _mp_array(buf, pos, n, depth=0):
    out = []
    for _ in range(n):
        v, pos = _mp_decode(buf, pos, depth)
        out.append(v)
    return out, pos


def _mp_map(buf, pos, n, depth=0):
    out = {}
    for _ in range(n):
        k, pos = _mp_decode(buf, pos, depth)
        v, pos = _mp_decode(buf, pos, depth)
        out[k if isinstance(k, str) else repr(k)] = v
    return out, pos


def _mp_to_jsonable(v):
    if isinstance(v, bytes):
        import base64

        return base64.b64encode(v).decode("ascii")
    if isinstance(v, tuple) and v and v[0] == "__ext__":
        import base64

        return {"__ext_type__": v[1],
                "__ext_data__": base64.b64encode(v[2]).decode("ascii")}
    if isinstance(v, list):
        return [_mp_to_jsonable(x) for x in v]
    if isinstance(v, dict):
        return {k: _mp_to_jsonable(x) for k, x in v.items()}
    if isinstance(v, float) and (v != v):       # NaN -> null, like json codec
        return None
    return v


def msgpack_decode(df: DataFrame, source: str, schema: str,
                   target: str | None = None) -> DataFrame:
    """msgpack codec decode: binary column -> ``schema`` columns.

    Decode happens in an Arrow-batched ``mapInPandas`` (packet-level Python
    loop over the batch, same sanctioned shape as yaml_filter's full path);
    the decoded object is re-serialized to a JSON string column and parsed
    with the same from_json machinery as the json filter so type coercion,
    ``target`` nesting, and `_msgpackparsefailure` tagging behave
    identically to their text-codec siblings.  bytes values are base64
    (msgpack bin has no JSON analog — documented divergence, reference
    emits raw strings).
    """
    import json as _json

    from pyspark.sql import functions as F

    from logstash_spark.functions.decorators import add_tag
    from logstash_spark.operators.parsers import json_filter

    carry_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)

    def decode(batches):
        for pdf in batches:
            def one(b):
                if b is None:
                    return None
                try:
                    v, end = _mp_decode(bytes(b))
                    if end != len(b):
                        return None         # trailing garbage = failure
                    if not isinstance(v, dict):
                        return None         # scalar/array top level: the
                        # reference codec needs a map to make an event —
                        # anything else is a decode anomaly, tag it
                    return _json.dumps(_mp_to_jsonable(v))
                except (MsgpackError, RecursionError, UnicodeDecodeError,
                        IndexError, struct.error):
                    return None

            pdf = pdf.assign(__mp_json=pdf[source].map(one))
            yield pdf

    staged = df.mapInPandas(decode, carry_schema + ", __mp_json string")
    # NULL json from a NON-null packet is a decode failure
    failed = F.col(source).isNotNull() & F.col("__mp_json").isNull()
    # snapshot any PRE-EXISTING json failure tag (from an earlier json
    # filter) so stripping the internal json_filter's tag can't erase it
    had_jpf = (F.array_contains("tags", "_jsonparsefailure")
               if "tags" in df.columns else F.lit(False))
    staged = staged.withColumn("__had_jpf", F.coalesce(had_jpf, F.lit(False)))
    out = json_filter(staged, "__mp_json", schema, target=target)
    out = out.withColumn(
        "tags",
        F.when(F.col("__had_jpf"), F.col("tags"))
         .otherwise(F.array_remove(F.col("tags"), "_jsonparsefailure")))
    out = add_tag(out, "_msgpackparsefailure", when=failed)
    return out.drop("__mp_json", "__had_jpf")


# ---------------------------------------------------------------------------
# fluent forward mode (logstash-codec-fluent, meta:14)
# ---------------------------------------------------------------------------

def _fluent_time(t) -> int | None:
    """Fluent entry time -> epoch seconds.

    fluentd sends sub-second times as msgpack ext type 0 ("EventTime":
    4-byte seconds + 4-byte nanos, both big-endian) unless
    time_as_integer=true — _mp_decode surfaces ext as a tuple.  Plain
    ints/floats pass through; anything else is an unparseable entry."""
    if isinstance(t, bool):
        return None
    if isinstance(t, (int, float)):
        return int(t)
    if (isinstance(t, tuple) and len(t) == 3 and t[0] == "__ext__"
            and t[1] == 0 and len(t[2]) == 8):
        return int.from_bytes(t[2][:4], "big")
    return None


def fluent_decode(df: DataFrame, source: str) -> DataFrame:
    """fluent codec: msgpack ``[tag, time, record]`` entries (and the
    batched ``[tag, [[time, record], ...]]`` forward form) -> one row per
    record with (fluent_tag, fluent_time, record json string).

    The record is emitted as a JSON string column ``record`` for the caller
    to ``from_json`` with their schema (fluent records are schemaless);
    malformed packets yield ``fluent_failed=true``.
    """
    import json as _json

    carry = [c for c in df.columns if c != source]
    carry_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.schema.fields if f.name in carry)
    out_schema = ((carry_schema + ", ") if carry_schema else "") + \
        "fluent_tag string, fluent_time long, record string, fluent_failed boolean"

    def decode(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                base = {c: r[c] for c in carry}
                bad = {**base, "fluent_tag": None, "fluent_time": None,
                       "record": None, "fluent_failed": True}
                b = r[source]
                if b is None:
                    rows.append(bad)
                    continue
                try:
                    v, end = _mp_decode(bytes(b))
                except (MsgpackError, RecursionError, UnicodeDecodeError,
                        IndexError, struct.error):
                    rows.append(bad)
                    continue
                if (end != len(b) or not isinstance(v, list) or len(v) < 2
                        or not isinstance(v[0], str)):
                    rows.append(bad)
                    continue
                tag = v[0]
                if isinstance(v[1], list):     # batched forward mode
                    entries = [(e[0], e[1]) for e in v[1]
                               if isinstance(e, list) and len(e) == 2]
                else:                          # single [tag, time, record]
                    entries = [(v[1], v[2] if len(v) > 2 else {})]
                emitted = False
                for t, rec in entries:
                    t = _fluent_time(t)
                    if t is None:
                        continue               # unparseable entry time
                    rows.append({**base, "fluent_tag": tag,
                                 "fluent_time": t,
                                 "record": _json.dumps(_mp_to_jsonable(rec)),
                                 "fluent_failed": False})
                    emitted = True
                if not emitted:
                    rows.append(bad)
            yield pd.DataFrame(
                rows, columns=carry + ["fluent_tag", "fluent_time",
                                       "record", "fluent_failed"]) if rows \
                else pd.DataFrame(columns=carry + [
                    "fluent_tag", "fluent_time", "record", "fluent_failed"])

    return df.mapInPandas(decode, out_schema)


# ---------------------------------------------------------------------------
# collectd binary protocol (logstash-codec-collectd, meta:10)
# ---------------------------------------------------------------------------

_CD_HOST = 0x0000
_CD_TIME = 0x0001
_CD_TIME_HR = 0x0008
_CD_PLUGIN = 0x0002
_CD_PLUGIN_INST = 0x0003
_CD_TYPE = 0x0004
_CD_TYPE_INST = 0x0005
_CD_VALUES = 0x0006
_CD_INTERVAL = 0x0007
_CD_INTERVAL_HR = 0x0009

_CD_DS_NAMES = {0: "COUNTER", 1: "GAUGE", 2: "DERIVE", 3: "ABSOLUTE"}


def collectd_decode(df: DataFrame, source: str) -> DataFrame:
    """collectd codec: TLV parts packet -> one row per value.

    Part layout: type u16 BE, length u16 BE (incl. 4-byte header), payload.
    String parts are NUL-terminated; numeric parts u64 BE (time/interval
    shifted >>30 in the *_hr forms); the VALUES part is
    ``n:u16, n x dtype:u8, n x value`` where GAUGE is f64 LITTLE-endian and
    the rest are u64/i64 BE — the protocol's documented quirk.  State parts
    (host/time/plugin/type/...) persist across subsequent VALUES parts
    within the packet, exactly like the reference codec's accumulator.
    """
    carry = [c for c in df.columns if c != source]
    carry_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.schema.fields if f.name in carry)
    out_cols = ["host", "collectd_time", "plugin", "plugin_instance",
                "collectd_type", "type_instance", "ds_type", "value",
                "interval", "collectd_failed"]
    out_schema = ((carry_schema + ", ") if carry_schema else "") + (
        "host string, collectd_time long, plugin string, "
        "plugin_instance string, collectd_type string, type_instance string, "
        "ds_type string, value double, interval long, collectd_failed boolean")

    def _packet_rows(buf: bytes):
        state = {"host": None, "collectd_time": None, "plugin": None,
                 "plugin_instance": None, "collectd_type": None,
                 "type_instance": None, "interval": None}
        rows = []
        pos = 0
        while pos + 4 <= len(buf):
            ptype, plen = struct.unpack_from(">HH", buf, pos)
            if plen < 4 or pos + plen > len(buf):
                raise ValueError("bad part length")
            payload = buf[pos + 4:pos + plen]
            pos += plen
            if ptype in (_CD_HOST, _CD_PLUGIN, _CD_PLUGIN_INST,
                         _CD_TYPE, _CD_TYPE_INST):
                key = {_CD_HOST: "host", _CD_PLUGIN: "plugin",
                       _CD_PLUGIN_INST: "plugin_instance",
                       _CD_TYPE: "collectd_type",
                       _CD_TYPE_INST: "type_instance"}[ptype]
                state[key] = payload.rstrip(b"\x00").decode("utf-8")
            elif ptype in (_CD_TIME, _CD_TIME_HR):
                v = int.from_bytes(payload, "big")
                state["collectd_time"] = v >> 30 if ptype == _CD_TIME_HR else v
            elif ptype in (_CD_INTERVAL, _CD_INTERVAL_HR):
                v = int.from_bytes(payload, "big")
                state["interval"] = v >> 30 if ptype == _CD_INTERVAL_HR else v
            elif ptype == _CD_VALUES:
                n = struct.unpack_from(">H", payload, 0)[0]
                dtypes = payload[2:2 + n]
                vals = payload[2 + n:]
                if len(dtypes) < n or len(vals) < 8 * n:
                    # int.from_bytes would happily decode a short slice to
                    # a bogus small value — truncation is a failure
                    raise ValueError("truncated VALUES part")
                for i in range(n):
                    dt = dtypes[i]
                    raw = vals[8 * i:8 * i + 8]
                    if dt == 1:                      # GAUGE: f64 LE (!)
                        val = struct.unpack("<d", raw)[0]
                    elif dt == 2:                    # DERIVE: i64 BE
                        val = float(int.from_bytes(raw, "big", signed=True))
                    else:                            # COUNTER/ABSOLUTE u64 BE
                        val = float(int.from_bytes(raw, "big"))
                    rows.append({**state,
                                 "ds_type": _CD_DS_NAMES.get(dt, str(dt)),
                                 "value": val, "collectd_failed": False})
            # unknown part types are skipped (forward compat, like reference)
        if pos != len(buf):
            raise ValueError("trailing bytes")
        if not rows:
            # state-only packet (no VALUES part): decode anomaly, surface
            # as a tagged row rather than emitting nothing
            raise ValueError("no VALUES part")
        return rows

    def decode(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                base = {c: r[c] for c in carry}
                b = r[source]
                try:
                    if b is None:
                        raise ValueError("null packet")
                    for rec in _packet_rows(bytes(b)):
                        rows.append({**base, **rec})
                except (ValueError, struct.error, UnicodeDecodeError):
                    rows.append({**base,
                                 **{c: None for c in out_cols[:-1]},
                                 "collectd_failed": True})
            yield pd.DataFrame(rows, columns=carry + out_cols) if rows else \
                pd.DataFrame(columns=carry + out_cols)

    return df.mapInPandas(decode, out_schema)


# ---------------------------------------------------------------------------
# edn (logstash-codec-edn / -edn_lines, meta:12) — text format, but it
# shares the decode->jsonable->from_json plumbing with msgpack above
# ---------------------------------------------------------------------------

class EdnError(ValueError):
    pass


_EDN_TOKEN = None  # compiled lazily


def _edn_tokens(s: str):
    import re as _re

    global _EDN_TOKEN
    if _EDN_TOKEN is None:
        _EDN_TOKEN = _re.compile(r"""
            (?P<ws>[,\s]+)
          | (?P<comment>;[^\n]*)
          | (?P<discard>\#_)
          | (?P<set>\#\{)
          | (?P<tag>\#[A-Za-z][\w./-]*)
          | (?P<open>[\[\({])
          | (?P<close>[\]\)}])
          | (?P<string>"(?:\\.|[^"\\])*")
          | (?P<char>\\(?:newline|return|space|tab|u[0-9a-fA-F]{4}|\S))
          | (?P<number>[+-]?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?[NM]?)
          | (?P<kw_sym>[:]?[A-Za-z*+!_?$%&=<>.|/-][\w*+!?$%&=<>.:#|/-]*)
        """, _re.VERBOSE)
    pos = 0
    while pos < len(s):
        m = _EDN_TOKEN.match(s, pos)
        if not m:
            raise EdnError(f"bad edn at {pos}: {s[pos:pos+10]!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind in ("ws", "comment"):
            continue
        yield kind, m.group()
    yield "eof", ""


_EDN_MAX_DEPTH = 512


def _edn_parse(tokens, depth=0):
    kind, tok = next(tokens)
    return _edn_value(kind, tok, tokens, depth)


def _edn_value(kind, tok, tokens, depth=0):
    import json as _json

    if depth > _EDN_MAX_DEPTH:      # "[[[[..." must tag, not RecursionError
        raise EdnError("nesting too deep")
    if kind == "eof":
        raise EdnError("truncated")
    if kind == "discard":                      # #_ drops the next form
        _edn_parse(tokens, depth + 1)
        return _edn_parse(tokens, depth)
    if kind == "tag":                          # #inst/#uuid -> tagged value
        v = _edn_parse(tokens, depth + 1)
        return {"__edn_tag__": tok[1:], "value": v}
    if kind == "string":
        return _json.loads(tok)                # edn strings are JSON strings
    if kind == "char":
        c = tok[1:]
        return {"newline": "\n", "return": "\r", "space": " ",
                "tab": "\t"}.get(c, chr(int(c[1:], 16)) if c.startswith("u")
                                 and len(c) == 5 else c)
    if kind == "number":
        t = tok.rstrip("NM")
        return float(t) if any(x in t for x in ".eE") else int(t)
    if kind == "kw_sym":
        if tok == "nil":
            return None
        if tok == "true":
            return True
        if tok == "false":
            return False
        return tok.lstrip(":")                 # keyword/symbol -> bare name
    if kind == "set":
        out = []
        for k, t in tokens:
            if k == "close" and t == "}":
                return out                     # sets -> arrays (JSON has none)
            if k == "discard":                 # trailing #_ before closer
                _edn_parse(tokens, depth + 1)
                continue
            out.append(_edn_value(k, t, tokens, depth + 1))
        raise EdnError("unclosed set")
    if kind == "open":
        closer = {"[": "]", "(": ")", "{": "}"}[tok]
        out = []
        for k, t in tokens:
            if k == "close":
                if t != closer:
                    raise EdnError(f"mismatched {t!r}")
                break
            if k == "discard":                 # trailing #_ before closer
                _edn_parse(tokens, depth + 1)
                continue
            out.append(_edn_value(k, t, tokens, depth + 1))
        else:
            raise EdnError("unclosed form")
        if tok == "{":
            if len(out) % 2:
                raise EdnError("odd map")
            return {(k if isinstance(k, str) else repr(k)): v
                    for k, v in zip(out[::2], out[1::2])}
        return out
    raise EdnError(f"unexpected {kind} {tok!r}")


def edn_decode(df: DataFrame, source: str, schema: str,
               target: str | None = None) -> DataFrame:
    """edn codec decode: EDN text column -> ``schema`` columns.

    Subset per the EDN spec: nil/bool, ints/floats (N/M suffixes accepted),
    strings, chars, keywords/symbols (emitted as bare names — the reference
    codec's EDN->event conversion does the same for map keys), vectors,
    lists, maps, sets (-> arrays), ``#_`` discard, ``;`` comments, and
    tagged literals (``#inst ...`` -> {__edn_tag__, value}).  Same
    Arrow-batch decode -> JSON -> from_json plumbing as msgpack_decode;
    failures tag ``_ednparsefailure``.
    """
    import json as _json

    from pyspark.sql import functions as F

    from logstash_spark.functions.decorators import add_tag
    from logstash_spark.operators.parsers import json_filter

    carry_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)

    def decode(batches):
        for pdf in batches:
            def one(s):
                if s is None:
                    return None
                try:
                    toks = _edn_tokens(s)
                    v = _edn_parse(toks)
                    kind, _ = next(toks)
                    if kind != "eof":
                        return None
                    return _json.dumps(v)
                except (EdnError, RecursionError, StopIteration, ValueError):
                    return None

            yield pdf.assign(__edn_json=pdf[source].map(one))

    staged = df.mapInPandas(decode, carry_schema + ", __edn_json string")
    failed = F.col(source).isNotNull() & F.col("__edn_json").isNull()
    had_jpf = (F.array_contains("tags", "_jsonparsefailure")
               if "tags" in df.columns else F.lit(False))
    staged = staged.withColumn("__had_jpf", F.coalesce(had_jpf, F.lit(False)))
    out = json_filter(staged, "__edn_json", schema, target=target)
    out = out.withColumn(
        "tags",
        F.when(F.col("__had_jpf"), F.col("tags"))
         .otherwise(F.array_remove(F.col("tags"), "_jsonparsefailure")))
    out = add_tag(out, "_ednparsefailure", when=failed)
    return out.drop("__edn_json", "__had_jpf")


# ---------------------------------------------------------------------------
# encode side: msgpack + fluent (the codec contract is bidirectional —
# logstash-core/lib/logstash/codecs/base.rb:38-86 declares both decode and
# encode; these are the two binary codecs used output-side in practice)
# ---------------------------------------------------------------------------

def _mp_encode(v, depth: int = 0) -> bytes:
    """Encode one Python value to msgpack bytes (msgpack.org spec).

    The exact inverse of :func:`_mp_decode` over the JSON-able domain:
    None/bool, int (fixint/uint8-64/int8-32), float (float64), str
    (fixstr/str8-32), bytes (bin8-32), list (fixarray/array16-32), dict
    (fixmap/map16-32).  Smallest-width encodings throughout, so
    decode(encode(x)) == x and encode(decode(b)) == b for canonical b.
    """
    if depth > _MP_MAX_DEPTH:
        raise MsgpackError("nesting too deep")
    if v is None:
        return b"\xc0"
    if isinstance(v, bool):
        return b"\xc3" if v else b"\xc2"
    if isinstance(v, int):
        if 0 <= v <= 0x7F:
            return bytes([v])
        if -32 <= v < 0:
            return bytes([v & 0xFF])
        if v >= 0:
            for fmt, code, lim in ((">B", 0xCC, 1 << 8), (">H", 0xCD, 1 << 16),
                                   (">I", 0xCE, 1 << 32), (">Q", 0xCF, 1 << 64)):
                if v < lim:
                    return bytes([code]) + struct.pack(fmt, v)
            raise MsgpackError(f"int too large: {v}")
        for fmt, code, lim in ((">b", 0xD0, 1 << 7), (">h", 0xD1, 1 << 15),
                               (">i", 0xD2, 1 << 31), (">q", 0xD3, 1 << 63)):
            if -v <= lim:
                return bytes([code]) + struct.pack(fmt, v)
        raise MsgpackError(f"int too small: {v}")
    if isinstance(v, float):
        return b"\xcb" + struct.pack(">d", v)
    if isinstance(v, str):
        b = v.encode("utf-8")
        n = len(b)
        if n <= 31:
            return bytes([0xA0 | n]) + b
        if n < 1 << 8:
            return b"\xd9" + bytes([n]) + b
        if n < 1 << 16:
            return b"\xda" + struct.pack(">H", n) + b
        return b"\xdb" + struct.pack(">I", n) + b
    if isinstance(v, (bytes, bytearray)):
        b = bytes(v)
        n = len(b)
        if n < 1 << 8:
            return b"\xc4" + bytes([n]) + b
        if n < 1 << 16:
            return b"\xc5" + struct.pack(">H", n) + b
        return b"\xc6" + struct.pack(">I", n) + b
    if isinstance(v, (list, tuple)):
        n = len(v)
        if n <= 15:
            head = bytes([0x90 | n])
        elif n < 1 << 16:
            head = b"\xdc" + struct.pack(">H", n)
        else:
            head = b"\xdd" + struct.pack(">I", n)
        return head + b"".join(_mp_encode(x, depth + 1) for x in v)
    if isinstance(v, dict):
        n = len(v)
        if n <= 15:
            head = bytes([0x80 | n])
        elif n < 1 << 16:
            head = b"\xde" + struct.pack(">H", n)
        else:
            head = b"\xdf" + struct.pack(">I", n)
        return head + b"".join(
            _mp_encode(k, depth + 1) + _mp_encode(x, depth + 1)
            for k, x in v.items())
    raise MsgpackError(f"unencodable type {type(v).__name__}")


def _py_clean(v):
    """numpy/pandas scalars -> plain Python (Arrow batches hand pandas
    dtypes to the encoder; msgpack needs native types)."""
    import numpy as np
    import pandas as pd

    if v is None or (isinstance(v, float) and v != v):
        return None
    if v is pd.NaT:
        return None
    if isinstance(v, np.bool_):
        return bool(v)
    if isinstance(v, np.integer):
        return int(v)
    if isinstance(v, np.floating):
        return float(v)
    if isinstance(v, (pd.Timestamp,)):
        return v.isoformat()
    if isinstance(v, np.ndarray):
        return [_py_clean(x) for x in v]
    if isinstance(v, (list, tuple)):
        return [_py_clean(x) for x in v]
    if isinstance(v, dict):
        return {k: _py_clean(x) for k, x in v.items()}
    return v


def msgpack_encode(df: DataFrame, columns: list[str] | None = None,
                   target: str = "message") -> DataFrame:
    """msgpack codec ENCODE (codecs/base.rb:66-86 contract): each row's
    ``columns`` (default: all) become one msgpack map in binary column
    ``target`` — the exact input :func:`msgpack_decode` accepts.

    Arrow-batched ``mapInPandas``; only the encoded column is appended, the
    event columns pass through untouched for downstream routing.
    """
    cols = columns if columns is not None else list(df.columns)
    # a pre-existing column named ``target`` is REPLACED by the encoded
    # bytes (codec semantics: encoding into `message` overwrites it) —
    # without the exclusion the output schema would declare the name
    # twice (string and binary) and fail at execution
    carry = [f for f in df.schema.fields if f.name != target]
    carry_names = [f.name for f in carry]
    carry_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in carry)
    out_schema = ((carry_schema + ", ") if carry_schema else "") + \
        f"{target} binary"

    def encode(batches):
        for pdf in batches:
            def one(row):
                return _mp_encode(
                    {c: _py_clean(row[c]) for c in cols})

            enc = pdf.apply(one, axis=1) if len(pdf) else []
            yield pdf.assign(**{target: enc})[carry_names + [target]]

    return df.mapInPandas(encode, out_schema)


def fluent_encode(df: DataFrame, tag, time_col: str,
                  record_cols: list[str] | None = None,
                  target: str = "message",
                  time_as_integer: bool = True) -> DataFrame:
    """fluent codec ENCODE: one forward-mode ``[tag, time, record]``
    msgpack message per row — the exact input :func:`fluent_decode`
    accepts.  ``tag`` is a literal string or (with ``F.col`` semantics) a
    column name prefixed ``@`` (the reference codec's tag => option takes
    either).  ``time_col`` must be epoch seconds (long) or timestamp;
    ``time_as_integer=False`` emits the fluentd EventTime ext-0 form
    (4-byte seconds + 4-byte nanos)."""
    rec_cols = record_cols if record_cols is not None else [
        c for c in df.columns if c != time_col]
    carry = [f for f in df.schema.fields if f.name != target]
    carry_names = [f.name for f in carry]
    carry_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in carry)
    out_schema = ((carry_schema + ", ") if carry_schema else "") + \
        f"{target} binary"
    tag_col = tag[1:] if isinstance(tag, str) and tag.startswith("@") else None

    def encode(batches):
        import pandas as pd

        for pdf in batches:
            def one(row):
                t = _py_clean(row[time_col])
                if isinstance(t, str):          # isoformat timestamp
                    t = int(pd.Timestamp(t).timestamp())
                t = int(t)
                tg = str(row[tag_col]) if tag_col else str(tag)
                return (bytes([0x93])           # fixarray(3)
                        + _mp_encode(tg)
                        + (_mp_encode(t) if time_as_integer
                           else b"\xd7\x00" + struct.pack(">II", t, 0))
                        + _mp_encode(
                            {c: _py_clean(row[c]) for c in rec_cols}))

            enc = pdf.apply(one, axis=1) if len(pdf) else []
            yield pdf.assign(**{target: enc})[carry_names + [target]]

    return df.mapInPandas(encode, out_schema)
