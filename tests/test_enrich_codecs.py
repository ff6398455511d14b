"""Unit tests for enrichment (geoip/useragent), codecs (multiline), DLQ
routing, metrics rates, and embedding-cosine dedup."""

import pytest
from pyspark.sql import functions as F


def test_geoip_range_join_and_miss_tag(spark):
    from logstash_spark.operators.enrich import cidr_blocks_df, geoip

    df = spark.createDataFrame(
        [("a", "10.1.2.3"), ("b", "10.200.0.1"), ("c", "192.168.1.1")],
        "id string, ip string")
    blocks = cidr_blocks_df(spark, [("10.0.0.0/9", "US", "nyc"),
                                    ("10.128.0.0/9", "DE", "berlin")])
    out = {r["id"]: r for r in geoip(df, "ip", blocks).collect()}
    assert out["a"]["geo_country"] == "US"
    assert out["b"]["geo_city"] == "berlin"
    assert out["c"]["geo_country"] is None
    assert "_geoip_lookup_failure" in out["c"]["tags"]
    assert "_geoip_lookup_failure" not in out["a"]["tags"]


def test_useragent_rule_precedence(spark):
    from logstash_spark.operators.enrich import useragent

    # Chrome UA also contains "Safari" — Chrome rule must win
    df = spark.createDataFrame(
        [("chrome", "Mozilla/5.0 (Windows NT 10.0) Chrome/120.0.1 Safari/537.36"),
         ("safari", "Mozilla/5.0 (Mac OS X) Version/17.1 Safari/605.1"),
         ("none", "SomeBot/1.0")],
        "id string, ua string")
    out = {r["id"]: r for r in useragent(df, "ua").collect()}
    assert out["chrome"]["ua_name"] == "Chrome"
    assert out["chrome"]["ua_version"] == "120.0.1"
    assert out["chrome"]["ua_os"] == "Windows"
    assert out["safari"]["ua_name"] == "Safari"
    assert out["none"]["ua_name"] == "Other"
    assert out["none"]["ua_version"] is None


def test_multiline_previous(spark):
    from logstash_spark.operators.codecs import multiline_assemble

    rows = [("c1", 0, "EVENT one"), ("c1", 1, "  cont a"), ("c1", 2, "  cont b"),
            ("c1", 3, "EVENT two"), ("c2", 0, "EVENT solo")]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, line string")
    out = multiline_assemble(df, "line", "conv_id", "turn_idx",
                             pattern=r"^\s", negate=False, what="previous")
    got = {(r["conv_id"], r["event_idx"]): r for r in out.collect()}
    assert got[("c1", 1)]["message"] == "EVENT one\n  cont a\n  cont b"
    assert got[("c1", 1)]["n_lines"] == 3
    assert got[("c1", 2)]["message"] == "EVENT two"
    assert got[("c2", 1)]["message"] == "EVENT solo"


def test_multiline_next(spark):
    from logstash_spark.operators.codecs import multiline_assemble

    # lines ending with '\' attach to the NEXT line's event? no: in logstash
    # `what => next` means the matching line belongs to the next event --
    # i.e. a trailing-continuation marker joins the line(s) that follow.
    rows = [("c1", 0, "part1 \\"), ("c1", 1, "part2"), ("c1", 2, "alone")]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, line string")
    out = multiline_assemble(df, "line", "conv_id", "turn_idx",
                             pattern=r"\\$", negate=False, what="next")
    msgs = sorted(r["message"] for r in out.collect())
    assert msgs == ["alone", "part1 \\\npart2"]


def test_dlq_split_first_reason_wins(spark):
    from logstash_spark.operators.dlq import dlq_split, dlq_write, dlq_replay

    df = spark.createDataFrame(
        [("a", 10), ("b", 5000), ("c", -1)], "id string, size long")
    ok, dlq = dlq_split(df, [
        (F.col("size") < 0, "negative"),
        (F.col("size") > 4000, "oversize"),
    ])
    assert [r["id"] for r in ok.collect()] == ["a"]
    got = {r["id"]: r["dlq_reason"] for r in dlq.collect()}
    assert got == {"b": "oversize", "c": "negative"}


def test_dlq_write_replay_roundtrip(spark, tmp_path):
    from logstash_spark.operators.dlq import dlq_split, dlq_write, dlq_replay

    df = spark.createDataFrame([("x", 9000)], "id string, size long")
    _, dlq = dlq_split(df, [(F.col("size") > 4000, "oversize")])
    p = str(tmp_path / "dlq")
    dlq_write(dlq, p)
    back = dlq_replay(spark, p)
    assert back.count() == 1
    assert back.first()["dlq_reason"] == "oversize"


def test_metrics_rates_window_math(spark):
    from logstash_spark.operators.windows import metrics_rates

    df = spark.createDataFrame(
        [("u", "2026-01-01 00:10:00"), ("u", "2026-01-01 00:50:00"),
         ("u", "2026-01-01 01:10:00")],
        "role string, ts_s string").withColumn("ts", F.col("ts_s").cast("timestamp"))
    out = metrics_rates(df, "ts", ["role"], ["1 hour"]).collect()
    by_start = {str(r["window_start"]): r for r in out}
    assert by_start["2026-01-01 00:00:00"]["n"] == 2
    assert abs(by_start["2026-01-01 00:00:00"]["rate_per_sec"] - 2 / 3600) < 1e-12
    assert by_start["2026-01-01 01:00:00"]["n"] == 1


def test_embedding_cosine_exact_vs_lsh(spark):
    from logstash_spark.datahub.dedup import embedding_cosine_pairs

    # 3 base vectors + 1 scaled clone of v0 (cosine 1.0 with v0)
    rows = [(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0, 0.0]),
            (2, [0.0, 0.0, 1.0, 0.0]), (100, [2.0, 0.0, 0.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    exact = embedding_cosine_pairs(df, threshold=0.99, exact=True).collect()
    assert [(r["id_a"], r["id_b"]) for r in exact] == [(0, 100)]
    lsh = embedding_cosine_pairs(df, threshold=0.99, exact=False,
                                 n_planes=4, dim=4).collect()
    # identical-direction vectors always share every LSH bucket -> recall 1
    assert [(r["id_a"], r["id_b"]) for r in lsh] == [(0, 100)]


def test_csv_lines_decode(spark):
    from pyspark.sql import Row
    from logstash_spark.operators.codecs import csv_lines_decode

    raw = 'a,1,"x,y"\nb,2,z'
    df = spark.createDataFrame([Row(payload=raw)])
    out = (csv_lines_decode(df, "payload", ["name", "n", "note"],
                            types={"n": "int"})
           .orderBy("name").collect())
    assert [(r.name, r.n, r.note) for r in out] == [
        ("a", 1, "x,y"), ("b", 2, "z")]


def test_yaml_filter_flat_and_full(spark):
    from pyspark.sql import Row
    from logstash_spark.operators.parsers import yaml_filter

    df = spark.createDataFrame([
        Row(id=1, y="role: user\nidx: 3\nmsg: hello"),
        Row(id=2, y="# comment\nrole: tool   # trailing\nidx: 4\nmsg: ok"),
        Row(id=3, y="not: [valid"),          # invalid YAML
        Row(id=4, y="- a\n- b"),             # non-mapping root
        Row(id=5, y=None),
    ])
    schema = "role string, idx long, msg string"

    full = {r.id: r for r in yaml_filter(df, "y", schema, target="p").collect()}
    assert full[1].p.role == "user" and full[1].p.idx == 3
    assert full[2].p.role == "tool" and full[2].p.msg == "ok"
    for bad in (3, 4, 5):
        assert "_yamlparsefailure" in (full[bad].tags or [])
    assert "_yamlparsefailure" not in (full[1].tags or [])

    # flat JVM path parses the k: v shape identically (comments stripped)
    flat = {r.id: r for r in
            yaml_filter(df.filter("id <= 2"), "y", schema, target="p",
                        flat=True).collect()}
    assert flat[1].p.role == "user" and flat[1].p.idx == 3
    assert flat[2].p.role == "tool" and flat[2].p.msg == "ok"


def test_cef_decode_space_values_and_miss(spark):
    from pyspark.sql import Row
    from logstash_spark.operators.codecs import cef_decode

    df = spark.createDataFrame([
        Row(id=1, raw="CEF:0|Vendor|Prod|1.0|sig42|Port scan detected|7|"
                      "src=10.1.2.3 msg=multi word value spt=443"),
        Row(id=2, raw="plainly not cef"),
    ])
    out = {r.id: r for r in cef_decode(df, "raw").collect()}
    assert out[1].cef_vendor == "Vendor"
    assert out[1].cef_name == "Port scan detected"
    assert out[1].cef_severity == "7"
    # a value containing spaces runs until the next key=
    assert out[1].cef_ext["msg"] == "multi word value"
    assert out[1].cef_ext["spt"] == "443"
    assert "_cefparsefailure" in (out[2].tags or [])
    assert "_cefparsefailure" not in (out[1].tags or [])


def test_graphite_roundtrip_and_es_bulk(spark):
    from pyspark.sql import Row
    from logstash_spark.operators.codecs import (
        dots_encode, es_bulk_encode, graphite_decode, graphite_encode,
        rubydebug_encode)

    df = spark.createDataFrame([
        Row(id="a", raw="servers.web1.load 0.75 1700000000"),
        Row(id="b", raw="bad line"),
    ])
    dec = {r.id: r for r in graphite_decode(df, "raw").collect()}
    assert dec["a"].metric == "servers.web1.load"
    assert dec["a"].metric_value == 0.75
    assert "_graphiteparsefailure" in (dec["b"].tags or [])

    enc = graphite_encode(
        graphite_decode(df, "raw").filter("metric is not null"),
        "metric", "metric_value", "metric_ts", target="line2").collect()
    assert enc[0].line2 == "servers.web1.load 0.75 1700000000"

    docs = spark.createDataFrame([Row(doc_id="d1", text="hi \"there\"")])
    bulk = es_bulk_encode(docs, index="docs", id_col="doc_id",
                          doc_cols=["doc_id", "text"]).collect()[0].bulk
    action, doc = bulk.split("\n")
    import json
    assert json.loads(action) == {"index": {"_index": "docs", "_id": "d1"}}
    assert json.loads(doc) == {"doc_id": "d1", "text": 'hi "there"'}

    assert dots_encode(docs).collect()[0].dot == "."
    dbg = json.loads(rubydebug_encode(docs).collect()[0].debug)
    assert dbg["doc_id"] == "d1"


def test_jdbc_static_and_named_lookups(spark):
    from pyspark.sql import Row
    from logstash_spark.operators.lookup import (
        elasticsearch_lookup, jdbc_static, memcached_lookup)

    events = spark.createDataFrame(
        [Row(id=1, user="ann"), Row(id=2, user="bob"), Row(id=3, user="zed")])
    dim = spark.createDataFrame(
        [Row(login="ann", dept="eng"), Row(login="bob", dept="ops")])

    out = {r.id: r for r in jdbc_static(
        events, "user", {"dept": "user_dept"}, dim=dim, dim_key="login",
    ).collect()}
    assert out[1].user_dept == "eng" and out[2].user_dept == "ops"
    assert out[3].user_dept is None
    assert "_jdbcstaticfailure" in (out[3].tags or [])

    # remote-loader path is honestly gated without a driver jar
    import pytest as _pytest
    with _pytest.raises(NotImplementedError, match="--jars"):
        jdbc_static(events, "user", ["dept"],
                    jdbc_url="jdbc:postgresql://h/db",
                    loader_query="SELECT * FROM t", dim_key="login")

    mc = memcached_lookup(events, "user",
                          dim.withColumnRenamed("login", "key"),
                          {"dept": "cached_dept"})
    assert {r.cached_dept for r in mc.collect()} == {"eng", "ops", None}
    es = elasticsearch_lookup(events, "user",
                              dim.withColumnRenamed("login", "_id"),
                              ["dept"])
    assert {r.dept for r in es.collect()} == {"eng", "ops", None}


def test_dns_filter_snapshot_join(spark):
    from pyspark.sql import Row
    from logstash_spark.operators.enrich import dns_filter

    df = spark.createDataFrame([Row(h="db.example.com"), Row(h="unknown.host")])
    records = spark.createDataFrame([Row(name="db.example.com", address="10.0.0.5")])
    got = {(r.h, "_dnsfailure" in (r.tags or []))
           for r in dns_filter(df, "h", records).collect()}
    assert got == {("10.0.0.5", False), ("unknown.host", True)}
    # reverse + append
    rev = dns_filter(
        spark.createDataFrame([Row(ip="10.0.0.5")]), "ip", records,
        action="append", target="host", reverse=True).collect()[0]
    assert rev.ip == "10.0.0.5" and rev.host == "db.example.com"


def test_http_and_jdbc_streaming_lookup_analogs(spark):
    from pyspark.sql import Row
    from logstash_spark.operators.lookup import (http_lookup,
                                                 jdbc_streaming_lookup)

    df = spark.createDataFrame([Row(u="http://x/1", uid=1),
                                Row(u="http://x/9", uid=9)])
    responses = spark.createDataFrame(
        [Row(url="http://x/1", status=200, body="ok")])
    r = {x.u: x for x in http_lookup(
        df, "u", responses, ["status", "body"],
        tag_on_miss="_httpfailure").collect()}
    assert r["http://x/1"].status == 200 and r["http://x/1"].body == "ok"
    assert "_httpfailure" in r["http://x/9"].tags

    users = spark.createDataFrame([Row(id=1, name="ada")])
    j = {x.uid: x for x in jdbc_streaming_lookup(
        df, "uid", users, ["name"]).collect()}
    assert j[1].name == "ada" and j[9].name is None
