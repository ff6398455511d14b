"""Binary codec conformance: netflow v5, msgpack, fluent, collectd.

Wire fixtures are hand-built from the PUBLIC format specifications
(Cisco netflow v5 layout, msgpack.org spec, fluent forward protocol,
collectd binary protocol) — the same fixtures a reference codec test would
encode with its client library.
"""

from __future__ import annotations

import struct

import pytest
from pyspark.sql import functions as F


def _nf5_packet(records, flow_seq=7, uptime=1000, unix_sec=1717200000):
    hdr = struct.pack(">HHIIIIBBH", 5, len(records), uptime, unix_sec,
                      0, flow_seq, 1, 2, 100)
    recs = b""
    for r in records:
        recs += struct.pack(
            ">IIIHHIIIIHHBBBBHHBBH",
            r["src"], r["dst"], r["nexthop"], r["input"], r["output"],
            r["pkts"], r["octets"], r["first"], r["last"],
            r["sport"], r["dport"], 0, r["flags"], r["proto"], r["tos"],
            r["sas"], r["das"], r["smask"], r["dmask"], 0)
    return hdr + recs


def _ip(a, b, c, d):
    return (a << 24) | (b << 16) | (c << 8) | d


class TestNetflow5:
    def test_decode_two_records(self, spark):
        from logstash_spark.operators.codecs_binary import netflow5_decode

        pkt = _nf5_packet([
            dict(src=_ip(10, 0, 0, 1), dst=_ip(192, 168, 1, 2),
                 nexthop=_ip(10, 0, 0, 254), input=1, output=2,
                 pkts=100, octets=64000, first=10, last=20,
                 sport=443, dport=55555, flags=0x18, proto=6, tos=0,
                 sas=65001, das=65002, smask=24, dmask=16),
            dict(src=_ip(172, 16, 5, 9), dst=_ip(8, 8, 8, 8),
                 nexthop=0, input=3, output=4,
                 pkts=1, octets=76, first=30, last=30,
                 sport=53124, dport=53, flags=0, proto=17, tos=0,
                 sas=0, das=15169, smask=12, dmask=32),
        ])
        df = spark.createDataFrame([("p1", pkt), ("p2", b"\x00\x01garbage")],
                                   "pkt_id string, raw binary")
        out = netflow5_decode(df, "raw").collect()
        ok = sorted([r for r in out if not r.netflow_failed],
                    key=lambda r: r.record_idx)
        assert len(ok) == 2
        assert ok[0].ipv4_src_addr == "10.0.0.1"
        assert ok[0].ipv4_dst_addr == "192.168.1.2"
        assert ok[0].in_bytes == 64000 and ok[0].protocol == 6
        assert ok[0].tcp_flags == 0x18 and ok[0].src_as == 65001
        assert ok[0].flow_seq_num == 7 and ok[0].sampling_interval == 100
        assert ok[1].ipv4_dst_addr == "8.8.8.8" and ok[1].l4_dst_port == 53
        bad = [r for r in out if r.netflow_failed]
        assert len(bad) == 1 and bad[0].pkt_id == "p2"

    def test_truncated_packet_fails(self, spark):
        from logstash_spark.operators.codecs_binary import netflow5_decode

        # header claims 2 records but carries only one
        pkt = _nf5_packet([dict(src=1, dst=2, nexthop=0, input=0, output=0,
                                pkts=1, octets=1, first=0, last=0, sport=1,
                                dport=2, flags=0, proto=6, tos=0, sas=0,
                                das=0, smask=0, dmask=0)])
        pkt = pkt[:2] + struct.pack(">H", 2) + pkt[4:]
        df = spark.createDataFrame([(pkt,)], "raw binary")
        out = netflow5_decode(df, "raw").collect()
        assert len(out) == 1 and out[0].netflow_failed


# -- minimal msgpack ENCODER for fixtures (tests only) ------------------------

def mp_enc(v) -> bytes:
    if v is None:
        return b"\xc0"
    if v is True:
        return b"\xc3"
    if v is False:
        return b"\xc2"
    if isinstance(v, int):
        if 0 <= v <= 0x7F:
            return bytes([v])
        if -32 <= v < 0:
            return bytes([v & 0xFF])
        if v >= 0:
            return b"\xcf" + v.to_bytes(8, "big")
        return b"\xd3" + v.to_bytes(8, "big", signed=True)
    if isinstance(v, float):
        return b"\xcb" + struct.pack(">d", v)
    if isinstance(v, str):
        b = v.encode("utf-8")
        if len(b) <= 31:
            return bytes([0xA0 | len(b)]) + b
        return b"\xda" + struct.pack(">H", len(b)) + b
    if isinstance(v, bytes):
        return b"\xc4" + bytes([len(v)]) + v
    if isinstance(v, list):
        head = (bytes([0x90 | len(v)]) if len(v) <= 15
                else b"\xdc" + struct.pack(">H", len(v)))
        return head + b"".join(mp_enc(x) for x in v)
    if isinstance(v, dict):
        head = (bytes([0x80 | len(v)]) if len(v) <= 15
                else b"\xde" + struct.pack(">H", len(v)))
        return head + b"".join(mp_enc(k) + mp_enc(x) for k, x in v.items())
    raise TypeError(type(v))


class TestMsgpack:
    def test_decode_map(self, spark):
        from logstash_spark.operators.codecs_binary import msgpack_decode

        good = mp_enc({"i": 42, "s": "hello", "f": 2.5, "ok": True,
                       "arr": [1, 2, 3]})
        df = spark.createDataFrame(
            [("a", good), ("b", b"\xc1bogus"), ("c", None)],
            "id string, raw binary")
        out = msgpack_decode(
            df, "raw",
            "i long, s string, f double, ok boolean, arr array<long>")
        rows = {r.id: r for r in out.collect()}
        assert rows["a"].i == 42 and rows["a"].s == "hello"
        assert rows["a"].f == 2.5 and rows["a"].ok is True
        assert list(rows["a"].arr) == [1, 2, 3]
        assert "_msgpackparsefailure" not in (rows["a"].tags or [])
        assert "_msgpackparsefailure" in rows["b"].tags
        # null input is not a decode failure (mirrors json filter on null)
        assert "_msgpackparsefailure" not in (rows["c"].tags or [])

    def test_all_int_widths_and_strings(self, spark):
        from logstash_spark.operators.codecs_binary import _mp_decode

        cases = [0, 1, 127, -1, -32, 255, 65535, 2**32, 2**63 - 1,
                 -129, -65536, -(2**63), "x" * 40, 3.14, None, True,
                 [1, "a", [2.0]], {"k": {"n": 1}}, b"\x00\xff"]
        for v in cases:
            got, end = _mp_decode(mp_enc(v))
            assert got == v and end == len(mp_enc(v)), v

    def test_trailing_garbage_is_failure(self, spark):
        from logstash_spark.operators.codecs_binary import msgpack_decode

        df = spark.createDataFrame([(mp_enc({"i": 1}) + b"junk",)], "raw binary")
        out = msgpack_decode(df, "raw", "i long").collect()[0]
        assert "_msgpackparsefailure" in out.tags


class TestFluent:
    def test_single_and_batched_forward(self, spark):
        from logstash_spark.operators.codecs_binary import fluent_decode

        single = mp_enc(["app.log", 1717200000, {"msg": "hello", "level": "info"}])
        batched = mp_enc(["db.slow", [[1717200001, {"q": "SELECT 1"}],
                                      [1717200002, {"q": "SELECT 2"}]]])
        df = spark.createDataFrame(
            [("s", single), ("b", batched), ("x", b"\x01\x02")],
            "id string, raw binary")
        out = fluent_decode(df, "raw")
        rows = out.collect()
        ok = [r for r in rows if not r.fluent_failed]
        assert len(ok) == 3
        single_rows = [r for r in ok if r.fluent_tag == "app.log"]
        assert len(single_rows) == 1
        assert single_rows[0].fluent_time == 1717200000
        assert '"msg": "hello"' in single_rows[0].record
        db = sorted((r for r in ok if r.fluent_tag == "db.slow"),
                    key=lambda r: r.fluent_time)
        assert [r.fluent_time for r in db] == [1717200001, 1717200002]
        # record column is from_json-able with a caller schema
        parsed = (out.filter(~F.col("fluent_failed"))
                  .withColumn("j", F.from_json("record", "q string, msg string"))
                  .collect())
        assert any(r.j.q == "SELECT 2" for r in parsed)
        assert [r.id for r in rows if r.fluent_failed] == ["x"]


def _cd_str(ptype, s):
    b = s.encode() + b"\x00"
    return struct.pack(">HH", ptype, 4 + len(b)) + b


def _cd_num(ptype, v):
    return struct.pack(">HHQ", ptype, 12, v)


class TestCollectd:
    def test_packet_with_state_carryover(self, spark):
        from logstash_spark.operators.codecs_binary import collectd_decode

        values1 = struct.pack(">HHH", 0x0006, 4 + 2 + 2 + 16, 2) + \
            bytes([1, 0]) + struct.pack("<d", 0.25) + (123).to_bytes(8, "big")
        values2 = struct.pack(">HHH", 0x0006, 4 + 2 + 1 + 8, 1) + \
            bytes([2]) + (-5).to_bytes(8, "big", signed=True)
        pkt = (_cd_str(0x0000, "web-01") +
               _cd_num(0x0008, 1717200000 << 30) +     # time_hr
               _cd_str(0x0002, "cpu") + _cd_str(0x0003, "0") +
               _cd_str(0x0004, "cpu") + _cd_str(0x0005, "idle") +
               _cd_num(0x0007, 10) +                    # interval (plain)
               values1 +
               _cd_str(0x0005, "steal") +               # state update
               values2)
        df = spark.createDataFrame([(pkt,), (b"\xff",)], "raw binary")
        rows = collectd_decode(df, "raw").collect()
        ok = [r for r in rows if not r.collectd_failed]
        assert len(ok) == 3
        assert all(r.host == "web-01" and r.plugin == "cpu" and
                   r.collectd_time == 1717200000 and r.interval == 10
                   for r in ok)
        idle = [r for r in ok if r.type_instance == "idle"]
        assert {(r.ds_type, r.value) for r in idle} == \
            {("GAUGE", 0.25), ("COUNTER", 123.0)}
        steal = [r for r in ok if r.type_instance == "steal"]
        assert steal[0].ds_type == "DERIVE" and steal[0].value == -5.0
        assert sum(r.collectd_failed for r in rows) == 1


class TestEdn:
    def test_decode_map(self, spark):
        from logstash_spark.operators.codecs_binary import edn_decode

        rows = [
            ("a", '{:name "svc-1" :port 8080 :ratio 0.5 :on true '
                  ':labels [:web :prod] :meta {:zone "us"} :skip #_ 99 nil}'),
            ("b", "{:broken"),
            ("c", None),
        ]
        df = spark.createDataFrame(rows, "id string, raw string")
        out = edn_decode(
            df, "raw",
            "name string, port long, ratio double, on boolean, "
            "labels array<string>, meta struct<zone:string>")
        got = {r.id: r for r in out.collect()}
        assert got["a"].name == "svc-1" and got["a"].port == 8080
        assert got["a"].ratio == 0.5 and got["a"].on is True
        assert list(got["a"].labels) == ["web", "prod"]
        assert got["a"].meta.zone == "us"
        assert "_ednparsefailure" not in (got["a"].tags or [])
        assert "_ednparsefailure" in got["b"].tags
        assert "_ednparsefailure" not in (got["c"].tags or [])

    def test_parser_forms(self):
        from logstash_spark.operators.codecs_binary import (_edn_parse,
                                                            _edn_tokens)

        def parse(s):
            return _edn_parse(_edn_tokens(s))

        assert parse("nil") is None and parse("true") is True
        assert parse("42") == 42 and parse("-1.5e2") == -150.0
        assert parse("42N") == 42 and parse("1.5M") == 1.5
        assert parse('"a\\nb"') == "a\nb"
        assert parse("(1 2 3)") == [1, 2, 3]
        assert parse("#{1 2}") == [1, 2]
        assert parse("\\newline") == "\n" and parse("\\u0041") == "A"
        assert parse("; comment\n[1, 2]") == [1, 2]
        assert parse('#inst "2024-01-01"') == \
            {"__edn_tag__": "inst", "value": "2024-01-01"}
        assert parse("{:a {:b [1 :kw]}}") == {"a": {"b": [1, "kw"]}}


class TestReviewFixes:
    """Regressions for the round-3 code-review findings."""

    def test_fluent_eventtime_ext(self, spark):
        """fluentd's default EventTime (msgpack ext 0: 4B secs + 4B nanos)
        must decode, not crash the task."""
        from logstash_spark.operators.codecs_binary import fluent_decode

        secs = 1717200000
        ext_time = b"\xd7\x00" + secs.to_bytes(4, "big") + (500).to_bytes(4, "big")
        pkt = (b"\x93" + mp_enc("app") + ext_time
               + mp_enc({"msg": "hi"}))
        df = spark.createDataFrame([(pkt,)], "raw binary")
        r = fluent_decode(df, "raw").collect()[0]
        assert not r.fluent_failed and r.fluent_time == secs

    def test_truncated_float_tags_not_crashes(self, spark):
        from logstash_spark.operators.codecs_binary import (fluent_decode,
                                                            msgpack_decode)

        df = spark.createDataFrame([(b"\xcb\x00",)], "raw binary")  # half a f64
        assert "_msgpackparsefailure" in \
            msgpack_decode(df, "raw", "i long").collect()[0].tags
        assert fluent_decode(df, "raw").collect()[0].fluent_failed

    def test_preexisting_json_failure_tag_survives(self, spark):
        """A _jsonparsefailure from an EARLIER json filter must not be
        stripped by msgpack/edn's internal tag rewrite."""
        from logstash_spark.operators.codecs_binary import (edn_decode,
                                                            msgpack_decode)
        from logstash_spark.operators.parsers import json_filter

        df = spark.createDataFrame(
            [("not json", mp_enc({"i": 1}), "{:k 1}")],
            "j string, mp binary, ed string")
        staged = json_filter(df, "j", "x long")   # tags _jsonparsefailure
        out1 = msgpack_decode(staged, "mp", "i long")
        assert "_jsonparsefailure" in out1.collect()[0].tags
        out2 = edn_decode(staged, "ed", "k long")
        assert "_jsonparsefailure" in out2.collect()[0].tags

    def test_edn_trailing_discard(self):
        from logstash_spark.operators.codecs_binary import (_edn_parse,
                                                            _edn_tokens)

        assert _edn_parse(_edn_tokens("[1 2 #_3]")) == [1, 2]
        assert _edn_parse(_edn_tokens("{:a 1 #_:b #_2}")) == {"a": 1}
        assert _edn_parse(_edn_tokens("#{1 #_2}")) == [1]

    def test_collectd_truncated_values_part_fails(self, spark):
        from logstash_spark.operators.codecs_binary import collectd_decode

        # VALUES part claiming 2 values but carrying 1
        pkt = struct.pack(">HHH", 0x0006, 4 + 2 + 2 + 8, 2) + \
            bytes([0, 0]) + (7).to_bytes(8, "big")
        df = spark.createDataFrame([(pkt,)], "raw binary")
        rows = collectd_decode(df, "raw").collect()
        assert len(rows) == 1 and rows[0].collectd_failed
