"""Per-operator conformance goldens (SURVEY.md §5 strategy: example-based
goldens mirroring logstash-core/spec/ shapes)."""

import datetime

from pyspark.sql import functions as F
from pyspark.sql import Row

from logstash_spark.operators.grok import grok, CompiledGrok
from logstash_spark.operators.dissect import dissect
from logstash_spark.operators.mutate import mutate
from logstash_spark.operators.date import date
from logstash_spark.operators.parsers import kv, csv_filter, json_filter
from logstash_spark.operators import misc
from logstash_spark.operators import windows as W
from logstash_spark.plans.pipeline import Pipeline, Stage, If
from logstash_spark.functions import conditions as C
from logstash_spark.functions.sprintf import compile_sprintf


GROK_TPL = "status=%{INT:status:int} bytes=%{INT:bytes:int} tool=%{WORD:tool_name} msg=%{WORD:msg}"


def test_grok_extracts_and_tags(spark, transcripts):
    out = grok(transcripts, "text", GROK_TPL)
    rows = out.filter(F.col("status").isNotNull()).limit(5).collect()
    assert rows, "grok matched nothing"
    for r in rows:
        assert r.status in (200, 300, 400)
        assert isinstance(r.bytes, int)
        assert "_grokparsefailure" not in (r.tags or [])
    # malformed rows get the failure tag and null captures
    bad = out.filter(F.col("text").startswith("RAW|")).limit(5).collect()
    assert bad
    for r in bad:
        assert "_grokparsefailure" in r.tags
        assert r.status is None


def test_grok_apache_pattern(spark):
    line = '127.0.0.1 - frank [10/Oct/2000:13:55:36 -0700] "GET /apache_pb.gif HTTP/1.0" 200 2326'
    df = spark.createDataFrame([Row(message=line)])
    tpl = ('%{IPORHOST:clientip} %{USER:ident} %{USER:auth} \\[%{HTTPDATE:timestamp}\\] '
           '"%{WORD:verb} %{NOTSPACE:request} HTTP/%{NUMBER:httpversion}" '
           '%{INT:response:int} %{INT:bytes:int}')
    r = grok(df, "message", tpl).collect()[0]
    assert r.clientip == "127.0.0.1"
    assert r.auth == "frank"
    assert r.timestamp == "10/Oct/2000:13:55:36 -0700"
    assert r.verb == "GET"
    assert r.response == 200 and r.bytes == 2326


def test_dissect(spark):
    df = spark.createDataFrame([Row(m="alpha beta [gamma] 42")])
    r = dissect(df, "m", "%{a} %{b} [%{c}] %{n}", convert={"n": "int"}).collect()[0]
    assert (r.a, r.b, r.c, r.n) == ("alpha", "beta", "gamma", 42)
    bad = dissect(spark.createDataFrame([Row(m="no brackets here")]),
                  "m", "%{a} [%{c}]").collect()[0]
    assert "_dissectfailure" in bad.tags


def test_mutate_chain(spark):
    df = spark.createDataFrame([Row(s="  Hello.World  ", n="42", csv="a,b,c")])
    # sub-ops apply in the reference's fixed order (copy is last), so
    # uppercase-of-a-copy needs a second mutate block, as in Logstash
    step1 = mutate(
        df,
        strip=["s"],
        gsub=[("s", r"\.", "-")],
        lowercase=["s"],
        convert={"n": "integer"},
        split={"csv": ","},
        copy={"s": "s2"},
    )
    out = mutate(step1, uppercase=["s2"]).collect()[0]
    assert out.s == "hello-world"
    assert out.n == 42
    assert out.csv == ["a", "b", "c"]
    assert out.s2 == "HELLO-WORLD"


def test_date_formats(spark):
    df = spark.createDataFrame(
        [
            Row(id=1, raw="10/Oct/2000:13:55:36 -0700", fmt="httpdate"),
            Row(id=2, raw="2026-01-02T03:04:05.678Z", fmt="iso"),
            Row(id=3, raw="1767225600", fmt="unix"),
            Row(id=4, raw="1767225600123", fmt="unix_ms"),
            Row(id=5, raw="not a date", fmt="bad"),
        ]
    )
    out = {r.id: r for r in date(
        df, "raw",
        ["dd/MMM/yyyy:HH:mm:ss Z", "ISO8601"],
        target="parsed_ts",
    ).collect()}
    assert out[1].parsed_ts == datetime.datetime(2000, 10, 10, 20, 55, 36)
    assert out[2].parsed_ts == datetime.datetime(2026, 1, 2, 3, 4, 5, 678000)
    assert "_dateparsefailure" in out[5].tags

    unix_out = date(df.filter("id = 3"), "raw", ["UNIX"], target="u").collect()[0]
    assert unix_out.u == datetime.datetime(2026, 1, 1, 0, 0)
    ms_out = date(df.filter("id = 4"), "raw", ["UNIX_MS"], target="u").collect()[0]
    assert ms_out.u == datetime.datetime(2026, 1, 1, 0, 0, 0, 123000)


def test_kv_json_csv(spark):
    df = spark.createDataFrame([Row(kv_msg="ip=1.2.3.4 error=REFUSED",
                                    json_msg='{"k": 87, "tags": ["a"]}',
                                    csv_msg='1,"two, quoted",3.5')])
    r = kv(df, "kv_msg", include_keys=["ip", "error"]).collect()[0]
    assert r.ip == "1.2.3.4" and r.error == "REFUSED"
    r = json_filter(df, "json_msg", "k long, tags array<string>").collect()[0]
    assert r.k == 87 and r.tags == ["a"]
    bad = json_filter(spark.createDataFrame([Row(json_msg="{nope")]),
                      "json_msg", "k long").collect()[0]
    assert "_jsonparsefailure" in bad.tags
    r = csv_filter(df, "csv_msg", ["a", "b", "c"], types={"a": "long", "c": "double"}).collect()[0]
    assert r.a == 1 and r.b == "two, quoted" and r.c == 3.5


def test_fingerprint_uuid_anonymize(spark):
    df = spark.createDataFrame([Row(a="x", b="y")])
    r = misc.fingerprint(df, ["a", "b"], method="SHA256").collect()[0]
    import hashlib
    assert r.fingerprint == hashlib.sha256(b"x|y").hexdigest()
    r = misc.uuid_filter(df, deterministic_from=["a"]).collect()[0]
    assert len(r.uuid) == 36 and r.uuid.count("-") == 4
    r2 = misc.uuid_filter(df, deterministic_from=["a"]).collect()[0]
    assert r.uuid == r2.uuid
    r = misc.anonymize(df, ["a"], key="k").collect()[0]
    assert r.a == hashlib.sha256(b"kx").hexdigest()


def test_cidr_syslog_truncate_urldecode(spark):
    df = spark.createDataFrame([Row(ip="10.1.2.3", pri="165", s="hello%20world xx")])
    r = misc.cidr(df, "ip", ["10.0.0.0/8"]).collect()[0]
    assert "cidr_match" in r.tags
    r = misc.cidr(df, "ip", ["192.168.0.0/16"]).collect()[0]
    assert "cidr_match" not in (r.tags or [])
    r = misc.syslog_pri(df, "pri").collect()[0]
    assert r.syslog_facility_code == 20 and r.syslog_severity == "notice"
    r = misc.truncate(df, ["s"], 5).collect()[0]
    assert r.s == "hello"
    r = misc.urldecode(df.select(F.split("s", " ").getItem(0).alias("s")), "s").collect()[0]
    assert r.s == "hello world"


def test_drop_clone_split_translate(spark):
    df = spark.createDataFrame([Row(id=i, t="keep" if i % 2 else "drop") for i in range(10)])
    assert misc.drop(df, F.col("t") == "drop").count() == 5
    c = misc.clone(df.limit(1), ["copy1", "copy2"])
    types = [r.type for r in c.collect()]
    assert types == [None, "copy1", "copy2"]
    s = misc.split_field(spark.createDataFrame([Row(x="a b c")]), "x", " ")
    assert [r.x for r in s.collect()] == ["a", "b", "c"]
    tr = misc.translate(df, "t", {"drop": "DISCARD"}, "decision", fallback="PASS")
    got = {r.id: r.decision for r in tr.collect()}
    assert got[0] == "DISCARD" and got[1] == "PASS"
    dict_df = spark.createDataFrame([Row(k="keep", v="retained")])
    tj = misc.translate_join(df, "t", dict_df, "k", "v", "decision", fallback="?")
    got = {r.id: r.decision for r in tj.collect()}
    assert got[1] == "retained" and got[0] == "?"


def test_conditions_truthiness_and_in(spark):
    df = spark.createDataFrame(
        [Row(id=1, f="x", l=["a", "b"]), Row(id=2, f="", l=[]),
         Row(id=3, f="false", l=None), Row(id=4, f=None, l=["x"])]
    )
    got = {r.id: r.t for r in df.select("id", C.truthy(F.col("f")).alias("t")).collect()}
    assert got == {1: True, 2: False, 3: False, 4: False}
    # in: substring containment for strings
    r = df.select("id", C.in_("x", F.col("f")).alias("c")).collect()
    assert {x.id: x.c for x in r}[1] is True
    # in: array membership
    r = {x.id: x.c for x in df.select("id", C.in_array("a", F.col("l")).alias("c")).collect()}
    assert r[1] is True and r[2] is False


def test_sprintf(spark):
    df = spark.createDataFrame(
        [Row(role="tool", n=7, ts=datetime.datetime(2026, 1, 2, 3, 4, 5))]
    )
    col = compile_sprintf("role=%{role} n=%{n} missing=%{nope} day=%{+yyyy-MM-dd}", df.columns)
    assert df.select(col.alias("s")).collect()[0].s == \
        "role=tool n=7 missing=%{nope} day=2026-01-02"


def test_pipeline_if_else_branch(spark, transcripts):
    from logstash_spark.functions.decorators import add_tag

    pipe = Pipeline([
        Stage(lambda df: grok(df, "text", GROK_TPL), "grok"),
        If(
            predicate=lambda df: F.col("status") == 200,
            then=[Stage(lambda df: add_tag(df, "ok"), "tag-ok")],
            otherwise=[Stage(lambda df: add_tag(df, "not-ok"), "tag-else")],
        ),
    ])
    out = pipe(transcripts)
    assert out.count() == transcripts.count()  # branch+union preserves rows
    ok = out.filter(F.array_contains("tags", "ok"))
    assert ok.count() == out.filter(F.col("status") == 200).count()
    # null-status (grok failures) must go down the else path (lazy complement)
    nulls = out.filter(F.col("status").isNull())
    assert nulls.filter(~F.array_contains("tags", "not-ok")).count() == 0


def test_session_and_endoftask(spark, transcripts):
    sess = W.session_rollup(transcripts, "ts", "conv_id", "30 minutes")
    assert sess.count() > 0
    r = sess.limit(1).collect()[0]
    assert r.session_end > r.session_start
    eot = W.aggregate_end_of_task(
        transcripts, "conv_id", "ts", F.col("text").contains("task=done"))
    assert eot.count() == transcripts.select("conv_id").distinct().count()
    assert eot.filter(F.col("duration_sec") < 0).count() == 0


def test_elapsed_join(spark, transcripts):
    out = W.elapsed_join(
        transcripts, "conv_id", "ts",
        start_pred=F.col("role") == "user",
        end_pred=F.col("role").isin("assistant", "tool"),
        max_lag="interval 2 hours",
    )
    rows = out.limit(10).collect()
    assert rows
    assert all(0 < r.elapsed_sec <= 7200 for r in rows)


def test_throttle(spark, transcripts):
    out = W.throttle(transcripts, "ts", ["conv_id"], "7 days", max_count=10)
    assert out.count() == transcripts.count()
    tagged = out.filter(F.array_contains("tags", "throttled"))
    assert tagged.count() > 0


def test_grok_single_pass_edges(spark):
    # single capture: sentinel prefix alone must signal the match
    df = spark.createDataFrame([Row(m="id=42 ok"), Row(m="nothing here"),
                                Row(m=None)])
    out = grok(df, "m", "id=%{INT:id:int}").orderBy(F.col("m").asc_nulls_first()).collect()
    assert out[0].id is None and "_grokparsefailure" in out[0].tags   # null
    assert out[1].id == 42 and not out[1].tags                       # match
    assert out[2].id is None and "_grokparsefailure" in out[2].tags  # no match

    # a text row that BEGINS with the pattern's own literal but fails later
    # must not be misdetected as matched
    df2 = spark.createDataFrame([Row(m="id=notanint")])
    r = grok(df2, "m", "id=%{INT:id:int} done").collect()[0]
    assert r.id is None and "_grokparsefailure" in r.tags

    # empty-string capture value stays null, match still detected
    df3 = spark.createDataFrame([Row(m="a= b=7")])
    r = grok(df3, "m", "a=%{DATA:a} b=%{INT:b:int}").collect()[0]
    assert r.b == 7 and r.a is None


def test_dissect_single_pass_edges(spark):
    # last-field greedy keeps trailing delimiters inside the final capture
    df = spark.createDataFrame([Row(m="x:y:rest:of:it")])
    r = dissect(df, "m", "%{a}:%{b}:%{c}").collect()[0]
    assert (r.a, r.b, r.c) == ("x", "y", "rest:of:it")
    # null source tags failure, no crash
    r2 = dissect(spark.createDataFrame([(None,)], "m string"),
                 "m", "%{a}:%{b}").collect()[0]
    assert "_dissectfailure" in r2.tags


def test_grok_dot_excludes_newline(spark):
    """Reference grok (Oniguruma) excludes newline from `.`: DATA/GREEDYDATA
    must not cross lines of a multiline-assembled event (ADVICE r1)."""
    df = spark.createDataFrame([
        Row(m="level=ERROR msg=disk full\nstacktrace line two"),
        Row(m="level=ERROR\nmsg=on another line"),  # DATA can't bridge the \n
    ])
    out = grok(df, "m", "level=%{WORD:lvl} msg=%{GREEDYDATA:rest}").collect()
    r0 = [r for r in out if r.m.startswith("level=ERROR msg=")][0]
    assert r0.lvl == "ERROR"
    assert r0.rest == "disk full"          # stops at the newline
    r1 = [r for r in out if "\nmsg=" in r.m][0]
    assert "_grokparsefailure" in r1.tags  # match cannot span the newline
    assert r1.rest is None


def test_grok_sentinel_source_rows(spark):
    """Source values containing \\x1e route to the per-group path and still
    produce correct captures / failure tags (ADVICE r1)."""
    df = spark.createDataFrame([
        Row(m="\x1estatus=200 bytes=1 tool=t msg=ok"),    # matches, has sentinel
        Row(m="\x1e not matching at all"),                 # no match, has sentinel
        Row(m="status=400 bytes=2 tool=u msg=no"),         # plain fast path
    ])
    out = {r.m: r for r in grok(df, "m", GROK_TPL).collect()}
    ok = out["\x1estatus=200 bytes=1 tool=t msg=ok"]
    assert (ok.status, ok.bytes, ok.tool_name, ok.msg) == (200, 1, "t", "ok")
    assert "_grokparsefailure" not in (ok.tags or [])
    bad = out["\x1e not matching at all"]
    assert "_grokparsefailure" in bad.tags and bad.status is None
    plain = out["status=400 bytes=2 tool=u msg=no"]
    assert (plain.status, plain.msg) == (400, "no")


def test_grok_single_pass_false_parity(spark, transcripts):
    fast = grok(transcripts, "text", GROK_TPL).select(
        "conv_id", "turn_idx", "status", "bytes", "tool_name", "msg", "tags")
    slow = grok(transcripts, "text", GROK_TPL, single_pass=False).select(
        "conv_id", "turn_idx", "status", "bytes", "tool_name", "msg", "tags")
    assert fast.exceptAll(slow).count() == 0
    assert slow.exceptAll(fast).count() == 0


def test_dissect_sentinel_source_rows(spark):
    df = spark.createDataFrame([
        Row(m="\x1ealpha beta"),     # leading sentinel, still matches %{a} %{b}
        Row(m="\x1e-no-space"),      # sentinel, no match
    ])
    out = {r.m: r for r in dissect(df, "m", "%{a} %{b}").collect()}
    ok = out["\x1ealpha beta"]
    assert (ok.a, ok.b) == ("\x1ealpha", "beta")
    assert "_dissectfailure" not in (ok.tags or [])
    assert "_dissectfailure" in out["\x1e-no-space"].tags


def test_grok_pattern_library_compiles():
    """Every library pattern expands to a regex whose capture-group count
    equals the number of %{X:field} references (library bodies must be
    non-capturing) and compiles under Python re (no Java-only syntax)."""
    import re as _re
    from logstash_spark.operators.grok import CompiledGrok
    from logstash_spark.operators.grok_patterns import PATTERNS

    for name in PATTERNS:
        g = CompiledGrok(f"%{{{name}}}")
        compiled = _re.compile(g.regex)
        assert compiled.groups == len(g.captures), (
            f"{name}: {compiled.groups} regex groups vs {len(g.captures)} captures")


def test_grok_combinedapachelog_composite(spark):
    line = ('93.180.71.3 - - [17/May/2015:08:05:32 +0000] '
            '"GET /downloads/product_1 HTTP/1.1" 304 - '
            '"-" "Debian APT-HTTP/1.3 (0.8.16~exp12ubuntu10.21)"')
    df = spark.createDataFrame([Row(message=line)])
    r = grok(df, "message", "%{COMBINEDAPACHELOG}").collect()[0]
    assert r.clientip == "93.180.71.3"
    assert r.ident == "-" and r.auth == "-"  # USER matches '-' (reference parity)
    assert r.timestamp == "17/May/2015:08:05:32 +0000"
    assert r.verb == "GET" and r.request == "/downloads/product_1"
    assert r.httpversion == "1.1" and r.response == "304"
    assert r.bytes is None  # '-' branch
    assert r.referrer == '"-"'
    assert r.agent == '"Debian APT-HTTP/1.3 (0.8.16~exp12ubuntu10.21)"'


def test_grok_sysloglive_composite(spark):
    line = "Mar 16 00:01:25 evita postfix/smtpd[1713]: connect from camomile.cloud9.net[168.100.1.3]"
    df = spark.createDataFrame([Row(message=line)])
    r = grok(df, "message", "%{SYSLOGLINE}").collect()[0]
    assert r.timestamp == "Mar 16 00:01:25"
    assert r.logsource == "evita"
    assert r.program == "postfix/smtpd" and r.pid == "1713"
    assert r.message.startswith("connect from camomile")


def test_grok_nested_named_capture_numbering(spark):
    """%{COMPOSITE:outer} with named captures inside must number groups by
    paren position (outer first)."""
    df = spark.createDataFrame([Row(m="Mar 16 00:01:25 evita cron[7]: run")])
    r = grok(df, "m", "%{SYSLOGBASE:header} %{GREEDYDATA:rest}").collect()[0]
    assert r.header == "Mar 16 00:01:25 evita cron[7]:"
    assert r.logsource == "evita" and r.program == "cron" and r.pid == "7"
    assert r.rest == "run"


def test_json_lines_codec(spark):
    from logstash_spark.operators.codecs import json_lines_decode

    df = spark.createDataFrame([
        Row(payload='{"a": 1}\n{"a": 2}\nbroken'),
        Row(payload='{"a": 7}'),
    ])
    out = json_lines_decode(df, "payload", "a long")
    rows = sorted(((r.a, "_jsonparsefailure" in (r.tags or []))
                   for r in out.collect()), key=lambda x: (x[0] is None, x[0]))
    assert rows == [(1, False), (2, False), (7, False), (None, True)]


def test_fieldref_paths_and_indices(spark):
    """event_spec.rb-shaped goldens for the shared field-reference resolver:
    nested struct walk, list indexing, negative index (Accessors.java:152-187)."""
    from logstash_spark.functions.fieldref import field_col, parse_field_ref

    assert parse_field_ref("[a][b][0]") == ["a", "b", "0"]
    assert parse_field_ref("plain") == ["plain"]

    df = spark.createDataFrame(
        [Row(geo={"country": "US", "city": "nyc"},
             arr=["x", "y", "z"],
             deep=Row(inner=["p", "q"]))])
    got = df.select(
        field_col(df.columns, "[geo][country]").alias("c"),
        field_col(df.columns, "[arr][0]").alias("a0"),
        field_col(df.columns, "[arr][2]").alias("a2"),
        field_col(df.columns, "[arr][-1]").alias("alast"),
        field_col(df.columns, "[deep][inner][-2]").alias("d"),
    ).collect()[0]
    assert (got.c, got.a0, got.a2, got.alast, got.d) == ("US", "x", "z", "z", "p")
    assert field_col(df.columns, "[nope][x]") is None


def test_decorators_sprintf_key_and_value(spark):
    """decorators.rb:28-43: add_field/add_tag sprintf BOTH key and value;
    dynamic keys land in the `fields` map, static keys become columns."""
    from logstash_spark.functions.decorators import (add_field_sprintf,
                                                     add_tag_sprintf)

    df = spark.createDataFrame([Row(role="user", turn_idx=3)])
    out = add_field_sprintf(df, "seen_%{role}", "turn-%{turn_idx}")
    r = out.collect()[0]
    assert r.fields == {"seen_user": "turn-3"}
    out2 = add_field_sprintf(out, "static_col", "%{role}!")
    assert out2.collect()[0].static_col == "user!"
    out3 = add_tag_sprintf(out2, "from_%{role}")
    assert "from_user" in out3.collect()[0].tags


def test_tags_normalization_and_metadata_contract(spark):
    """Event.java:232-249 (_tags + _tagsparsefailure on illegal tags value),
    Event.java:106-111 (@metadata readable but never serialized)."""
    from logstash_spark.functions.decorators import normalize_tags, strip_metadata
    from logstash_spark.functions.sprintf import compile_sprintf

    # bare string tags -> singleton list
    s = spark.createDataFrame([Row(id=1, tags="solo")])
    assert normalize_tags(s).collect()[0].tags == ["solo"]
    # illegal numeric tags -> stashed in _tags + _tagsparsefailure
    n = spark.createDataFrame([Row(id=1, tags=123)])
    r = normalize_tags(n).collect()[0]
    assert r.tags == ["_tagsparsefailure"] and r._tags == ["123"]
    # legal array<string> passes through untouched
    ok = spark.createDataFrame([Row(id=1, tags=["a"])])
    assert normalize_tags(ok).collect()[0].tags == ["a"]

    # @metadata: sprintf can read it; sink projection drops it
    m = spark.createDataFrame([Row(id=1, **{"@metadata": {"k": "v"}})])
    rendered = m.select(compile_sprintf("meta=%{[@metadata][k]}", m.columns,
                                        ts_field="id").alias("x")).collect()[0].x
    assert rendered == "meta=v"
    assert "@metadata" not in strip_metadata(m).columns


def test_lookup_enrichment_operator(spark):
    """jdbc_static analog: broadcast dim join, multi-col fetch, defaults,
    miss tag; plan must be a broadcast hash join (no stream-side shuffle)."""
    from logstash_spark.operators.lookup import lookup

    dim = spark.createDataFrame(
        [("python", "code", "high"), ("search", "retrieval", "low")],
        "tool string, category string, risk string")
    ev = spark.createDataFrame(
        [Row(id=1, tool="python"), Row(id=2, tool="unknown"), Row(id=3, tool=None)])
    out = lookup(ev, "tool", dim, "tool",
                 fetch={"category": "cat", "risk": "risk"},
                 defaults={"cat": "other"}, tag_on_miss="_miss")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    got = {r.id: (r.cat, r.risk, "_miss" in (r.tags or [])) for r in out.collect()}
    assert got[1] == ("code", "high", False)
    assert got[2] == ("other", None, True)
    assert got[3] == ("other", None, True)


def test_grok_syslog5424_composite(spark):
    from logstash_spark.operators.grok import grok
    from pyspark.sql import Row

    line = ('<165>1 2024-08-17T05:14:15.000003Z mymachine.example.com '
            'evntslog 1234 ID47 [exampleSDID@32473 iut="3"] '
            'BOMAn application event log entry')
    nil = '<34>1 2024-08-17T05:14:15Z host app - - - cold start'
    df = spark.createDataFrame([Row(t=line), Row(t=nil), Row(t="junk")])
    rows = {r.t[:5]: r for r in grok(df, "t", "%{SYSLOG5424LINE}").collect()}
    r = rows["<165>"]
    assert not r.tags
    assert r.syslog5424_ver == "1"
    assert r.syslog5424_host == "mymachine.example.com"
    assert r.syslog5424_app == "evntslog"
    assert r.syslog5424_proc == "1234"
    assert r.syslog5424_msgid == "ID47"
    assert r.syslog5424_sd == '[exampleSDID@32473 iut="3"]'
    assert r.syslog5424_msg == "BOMAn application event log entry"
    n = rows["<34>1"]
    assert not n.tags
    assert n.syslog5424_host == "host" and n.syslog5424_sd is None
    assert n.syslog5424_msg == "cold start"
    assert "_grokparsefailure" in rows["junk"].tags


def test_translate_regex_mode_first_match_wins(spark):
    from logstash_spark.operators.misc import translate
    from pyspark.sql import Row

    df = spark.createDataFrame([Row(s="ERROR disk full"), Row(s="error minor"),
                                Row(s="warning"), Row(s="ok")])
    out = translate(df, "s", {"^ERROR": "crit", "(?i)error": "err",
                              "warn": "warn"},
                    target="level", fallback="none", exact=False)
    got = {r.s: r.level for r in out.collect()}
    assert got == {"ERROR disk full": "crit",   # first key wins over (?i)error
                   "error minor": "err", "warning": "warn", "ok": "none"}


def test_fingerprint_concatenate_sources_false(spark):
    import hashlib
    from logstash_spark.operators.misc import anonymize, fingerprint
    from pyspark.sql import Row

    df = spark.createDataFrame([Row(a="x", b="y")])
    r = fingerprint(df, ["a", "b"], concatenate_sources=False).collect()[0]
    assert r.fingerprint == hashlib.sha256(b"y").hexdigest()  # last source
    r2 = fingerprint(df, ["a", "b"], method="MD5").collect()[0]
    assert r2.fingerprint == hashlib.md5(b"x|y").hexdigest()
    r3 = anonymize(df, ["a"], key="k", method="MD5").collect()[0]
    assert r3.a == hashlib.md5(b"kx").hexdigest()


def test_kv_shaping_options(spark):
    from logstash_spark.operators.parsers import kv
    from pyspark.sql import Row

    df = spark.createDataFrame([Row(s='"USER"=alice  PASS=s3cret  X=1')])
    out = kv(df, "s", field_split="  ", value_split="=",
             trim_key='"', transform_key="lowercase",
             exclude_keys=["pass"], prefix="kv_",
             include_keys=["user"]).collect()[0]
    assert out.kv == {"kv_user": "alice", "kv_x": "1"}
    assert out.user == "alice"


def test_bucketed_join_has_no_exchange(spark, transcripts, tmp_path):
    """Bucketed tables on the same key+count join WITHOUT a shuffle —
    the persisted-partitioning evidence for repeated conv_id joins."""
    from logstash_spark.plans.bucketing import (join_is_shuffle_free,
                                                write_bucketed)

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        left = transcripts.select("conv_id", "turn_idx", "role")
        right = (transcripts.groupBy("conv_id")
                 .agg(F.count("*").alias("n_turns")))
        write_bucketed(left, "bkt_turns", "conv_id", buckets=8)
        write_bucketed(right, "bkt_convs", "conv_id", buckets=8)
        assert join_is_shuffle_free(spark, "bkt_turns", "bkt_convs", "conv_id")
        # sanity: same join on unbucketed data DOES shuffle
        plain = left.join(right, "conv_id")
        plan = plain._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS bkt_turns")
        spark.sql("DROP TABLE IF EXISTS bkt_convs")


def test_dissect_append_notation(spark):
    from pyspark.sql import Row
    from logstash_spark.operators.dissect import dissect

    df = spark.createDataFrame(
        [Row(t="Mar 16 00:01:25 host prog[42]: hello world")])
    r = dissect(df, "t",
                "%{ts} %{+ts} %{+ts} %{src} %{prog}[%{pid}]: %{msg}"
                ).collect()[0]
    assert r.ts == "Mar 16 00:01:25"
    assert r.src == "host" and r.prog == "prog" and r.pid == "42"
    assert r.msg == "hello world"


def test_dissect_append_order(spark):
    from pyspark.sql import Row
    from logstash_spark.operators.dissect import dissect

    df = spark.createDataFrame([Row(t="b c a")])
    r = dissect(df, "t", "%{+f/2} %{+f/3} %{+f/1}").collect()[0]
    assert r.f == "ab c"          # /1 first, joined by preceding delimiters


def test_dissect_indirect_rejected(spark):
    import pytest as _pytest
    from logstash_spark.operators.dissect import CompiledDissect

    with _pytest.raises(ValueError, match="indirect"):
        CompiledDissect("%{k} %{&k}")


def test_grok_pattern_list_break_on_match(spark):
    from pyspark.sql import Row
    from logstash_spark.operators.grok import grok

    df = spark.createDataFrame([
        Row(t="status=404 took=12"),
        Row(t="level=warn msg=slow"),
        Row(t="neither matches"),
    ])
    out = grok(df, "t", ["status=%{INT:status:int} took=%{INT:took:int}",
                         "level=%{WORD:level} msg=%{WORD:msg}"])
    rows = {r.t[:6]: r for r in out.collect()}
    a = rows["status"]
    assert a.status == 404 and a.took == 12 and a.level is None and not a.tags
    b = rows["level="]
    assert b.level == "warn" and b.msg == "slow" and b.status is None and not b.tags
    assert "_grokparsefailure" in rows["neithe"].tags


def test_grok_pattern_list_shared_field_first_wins(spark):
    from pyspark.sql import Row
    from logstash_spark.operators.grok import grok

    df = spark.createDataFrame([Row(t="x=1 y=2")])
    r = grok(df, "t", ["x=%{INT:v:int} y=%{INT:w:int}",
                       "y=%{INT:v:int}"]).collect()[0]
    assert r.v == 1 and r.w == 2          # first pattern wins for v


def test_lscl_grok_pattern_list(spark):
    from pyspark.sql import Row
    from logstash_spark.plans.lscl import compile_lscl

    pipe = compile_lscl('''
    filter {
      grok { match => { "t" => ["a=%{INT:a:int}", "b=%{INT:b:int}"] } }
    }
    ''')
    df = spark.createDataFrame([Row(t="a=5"), Row(t="b=7")])
    rows = {r.t: r for r in pipe.apply(df).collect()}
    assert rows["a=5"].a == 5 and rows["a=5"].b is None
    assert rows["b=7"].b == 7 and not rows["b=7"].tags


def test_csv_quote_and_empty_options(spark):
    from pyspark.sql import Row
    from logstash_spark.operators.parsers import csv_filter

    df = spark.createDataFrame([Row(s="'a,b';;3")])
    r = csv_filter(df, "s", ["x", "y", "z"], separator=";",
                   quote_char="'", skip_empty_columns=True).collect()[0]
    assert r.x == "a,b" and r.y is None and r.z == "3"


def test_batch_filter_custom_code_escape_hatch(spark):
    """ruby-filter analog: vectorized batch function, may change row count."""
    from pyspark.sql import Row
    from logstash_spark.operators.custom import batch_filter

    df = spark.createDataFrame([Row(n=1), Row(n=2), Row(n=3)])

    def double_evens(pdf):
        out = pdf[pdf["n"] % 2 == 0].copy()
        out["n2"] = out["n"] * 2
        return out

    rows = batch_filter(df, double_evens, "n long, n2 long").collect()
    assert [(r.n, r.n2) for r in rows] == [(2, 4)]


def test_metrics_ewma_matches_recurrence(spark):
    from pyspark.sql import Row
    from logstash_spark.operators.windows import metrics_ewma
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = []
    counts = [4, 0, 2, 6]       # events per 10s interval for key "a"
    for i, c in enumerate(counts):
        for j in range(c):
            rows.append(Row(k="a", ts=base + dt.timedelta(seconds=10 * i + j)))
    rows.append(Row(k="b", ts=base))
    df = spark.createDataFrame(rows)
    got = {(r.k, r.window_start.second + 60 * r.window_start.minute): r
           for r in metrics_ewma(df, "ts", ["k"], "10 seconds", alpha=0.5).collect()}

    # hand recurrence for key a: ewma_0 = 4; then 2.0, 2.0, 4.0
    # (counts 4,0(absent interval -> no row),2,6) — absent intervals emit
    # no row, matching the plugin which only flushes on events seen
    expect = {}
    prev = None
    for i, c in [(0, 4), (2, 2), (3, 6)]:
        prev = c if prev is None else 0.5 * c + 0.5 * prev
        expect[("a", 10 * i)] = prev
    for kk, v in expect.items():
        assert abs(got[kk].rate_ewma - v) < 1e-12, (kk, got[kk].rate_ewma, v)
    assert got[("b", 0)].rate_ewma == 1.0


def test_prune_regex_names(spark):
    from pyspark.sql import Row
    from logstash_spark.operators.misc import prune

    df = spark.createDataFrame([Row(field1="a", field2="b", other="c")])
    assert prune(df, whitelist=[r"^field\d+$"]).columns == ["field1", "field2"]
    assert prune(df, blacklist=[r"^field"]).columns == ["other"]


def test_truncate_is_byte_accurate(spark):
    from pyspark.sql import Row
    from logstash_spark.operators.misc import truncate

    df = spark.createDataFrame([Row(s="abcdef"), Row(s="äöü")])  # ä = 2 bytes
    out = {r.s is not None and len(r.s): r.s
           for r in truncate(df, ["s"], 5).collect()}
    rows = [r.s for r in truncate(df, ["s"], 5).collect()]
    assert "abcde" in rows          # 5 bytes of ascii
    assert "äö" in rows             # 5 bytes cuts ü mid-codepoint -> dropped


def test_date_tai64n(spark):
    # canonical daemontools example: @4000000037c219bf2ef02e94
    df = spark.createDataFrame([Row(raw="@4000000037c219bf2ef02e94"),
                                Row(raw="@zznotvalid")])
    out = {bool(r.raw.startswith("@4")): r
           for r in date(df, "raw", ["TAI64N"], target="t").collect()}
    # secs = 0x37c219bf, nanos = 0x2ef02e94 -> us truncation; like the
    # reference, no TAI-UTC leap-second correction is applied
    got = out[True].t
    assert got == datetime.datetime(1999, 8, 24, 4, 4, 15, 787492)
    assert "_dateparsefailure" in out[False].tags
