"""Community-plugin filters (operators/community.py): bytes, range,
cipher, environment, extractnumbers, json_encode, metricize, tld, age,
alter — semantics per each plugin's public README."""

import os

import pyspark.sql.functions as F
import pytest

from logstash_spark.operators.community import (
    age,
    alter,
    bytes_filter,
    cipher,
    environment,
    extractnumbers,
    json_encode,
    metricize,
    range_filter,
    tld,
    tld_with_suffixes,
)


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


# -- bytes -------------------------------------------------------------------

def test_bytes_binary_units(spark):
    df = _df(spark, [("1kb",), ("2 MB",), ("1.5GiB",), ("123",), ("3TB",),
                     ("junk",), (None,)], "s string")
    out = {r["s"]: (r["bytes_value"], "_bytesparsefailure" in (r["tags"] or []))
           for r in bytes_filter(df, "s").collect()}
    assert out["1kb"] == (1024, False)
    assert out["2 MB"] == (2 * 1024**2, False)
    assert out["1.5GiB"] == (int(1.5 * 1024**3), False)
    assert out["123"] == (123, False)
    assert out["3TB"] == (3 * 1024**4, False)
    assert out["junk"] == (None, True)
    assert out[None] == (None, True)


def test_bytes_metric_method_keeps_iec_binary(spark):
    df = _df(spark, [("1kb",), ("1KiB",)], "s string")
    out = {r["s"]: r["bytes_value"]
           for r in bytes_filter(df, "s", conversion_method="metric").collect()}
    assert out["1kb"] == 1000      # metric: kB = 1000
    assert out["1KiB"] == 1024     # explicit IEC stays binary


# -- range -------------------------------------------------------------------

def test_range_actions(spark):
    df = _df(spark, [(1, "ab"), (5, "abcdef"), (9, "x")], "n int, s string")
    out = range_filter(df, [
        ("n", 4, 6, "tag:mid"),
        ("s", 1, 2, "field:short:yes"),   # string -> length check
        ("n", 9, 99, "drop"),
    ])
    rows = {r["n"]: r for r in out.collect()}
    assert set(rows) == {1, 5}            # 9 dropped
    assert "mid" in rows[5]["tags"] and not rows[1]["tags"]
    assert rows[1]["short"] == "yes" and rows[5]["short"] is None


def test_range_negate(spark):
    df = _df(spark, [(1,), (5,)], "n int")
    out = range_filter(df, [("n", 4, 6, "tag:out")], negate=True)
    rows = {r["n"]: list(r["tags"] or []) for r in out.collect()}
    assert rows == {1: ["out"], 5: []}


# -- cipher ------------------------------------------------------------------

def test_cipher_roundtrip_gcm(spark):
    df = _df(spark, [("secret payload",), ("",)], "s string")
    key = "0123456789abcdef"
    enc = cipher(df, "s", "e", key)                     # GCM default
    dec = cipher(enc, "e", "back", key, mode="decrypt")
    for r in dec.collect():
        assert r["back"] == r["s"]
        assert r["e"] != r["s"]


def test_cipher_ecb_deterministic(spark):
    df = _df(spark, [("same",), ("same",)], "s string")
    out = cipher(df, "s", "e", "0123456789abcdef", algorithm="ECB").collect()
    assert out[0]["e"] == out[1]["e"]


# -- environment -------------------------------------------------------------

def test_environment(spark):
    os.environ["LS_SPARK_TEST_ENV"] = "hello"
    df = _df(spark, [(1,)], "n int")
    out = environment(df, {"envval": "LS_SPARK_TEST_ENV",
                           "missing": "LS_SPARK_NO_SUCH"}).collect()[0]
    assert out["envval"] == "hello" and out["missing"] is None


# -- extractnumbers ----------------------------------------------------------

def test_extractnumbers(spark):
    df = _df(spark, [("a 12 b -3 c 4.5 d 0.25e",), ("none",)], "s string")
    rows = extractnumbers(df, "s").collect()
    assert list(rows[0]["ints"]) == [12, -3]
    assert list(rows[0]["floats"]) == [4.5, 0.25]
    assert list(rows[1]["ints"]) == [] and list(rows[1]["floats"]) == []


# -- json_encode -------------------------------------------------------------

def test_json_encode(spark):
    df = _df(spark, [("u", 3)], "role string, n int")
    out = json_encode(df, ["role", "n"], target="obj")
    out = json_encode(out, "role", target="val").collect()[0]
    assert out["obj"] == '{"role":"u","n":3}'
    assert out["val"] == '"u"'


# -- metricize ---------------------------------------------------------------

def test_metricize(spark):
    df = _df(spark, [("a", 1.0, 2.0), ("b", 3.0, None)],
             "id string, m1 double, m2 double")
    out = metricize(df, ["m1", "m2"])
    got = sorted((r["id"], r["metric"], r["value"]) for r in out.collect())
    assert got == [("a", "m1", 1.0), ("a", "m2", 2.0), ("b", "m1", 3.0)]
    assert set(out.columns) == {"id", "metric", "value"}


# -- tld ---------------------------------------------------------------------

def test_tld_basic(spark):
    df = _df(spark, [("a.b.example.com",), ("example.com",), ("localhost",)],
             "h string")
    rows = {r["h"]: r for r in tld(df, "h").collect()}
    assert rows["a.b.example.com"]["tld_tld"] == "com"
    assert rows["a.b.example.com"]["tld_domain"] == "example.com"
    assert rows["a.b.example.com"]["tld_subdomain"] == "a.b"
    assert rows["example.com"]["tld_subdomain"] is None
    assert rows["localhost"]["tld_domain"] is None


def test_tld_with_suffix_table(spark):
    df = _df(spark, [("shop.example.co.uk",), ("x.example.com",)], "h string")
    sfx = _df(spark, [("co.uk",), ("uk",), ("com",)], "suffix string")
    rows = {r["h"]: r for r in tld_with_suffixes(df, "h", sfx).collect()}
    assert rows["shop.example.co.uk"]["tld_tld"] == "co.uk"       # longest wins
    assert rows["shop.example.co.uk"]["tld_domain"] == "example.co.uk"
    assert rows["x.example.com"]["tld_domain"] == "example.com"


# -- age ---------------------------------------------------------------------

def test_age_fixed_now(spark):
    df = spark.sql("SELECT TIMESTAMP '2024-01-01 00:00:00' AS ts")
    out = age(df, ts_col="ts", now="2024-01-01 01:00:00").collect()[0]
    assert out["age"] == 3600.0


# -- alter -------------------------------------------------------------------

def test_alter_ops(spark):
    df = _df(spark, [("active", None, "x"), ("stale", "keep", None)],
             "state string, a string, b string")
    out = alter(df,
                condrewrite=[("state", "stale", "dead")],
                condrewriteother=[("state", "active", "flag", "on")],
                coalesce={"first": ["a", "b"]})
    rows = sorted((r["state"], r["flag"], r["first"]) for r in out.collect())
    assert rows == [("active", "on", "x"), ("dead", None, "keep")]


# -- LSCL wiring -------------------------------------------------------------

def test_lscl_community_filters(spark):
    from logstash_spark.plans.lscl import compile_lscl

    conf = """
    filter {
      bytes { source => "size" target => "nbytes" }
      json_encode { source => "role" target => "jrole" }
      tld { source => "host" }
      alter { coalesce => ["first", "a", "b"] }
    }
    """
    pipe = compile_lscl(conf)
    df = spark.createDataFrame(
        [("2kb", "u", "x.example.org", None, "fb")],
        "size string, role string, host string, a string, b string")
    row = pipe.apply(df).collect()[0]
    assert row["nbytes"] == 2048
    assert row["jrole"] == '"u"'
    assert row["tld_domain"] == "example.org"
    assert row["first"] == "fb"


def test_lscl_metricize_and_range(spark):
    from logstash_spark.plans.lscl import compile_lscl

    conf = """
    filter {
      range { ranges => ["n", 0, 5, "tag:small"] }
      metricize { metrics => ["m1", "m2"] }
    }
    """
    pipe = compile_lscl(conf)
    df = spark.createDataFrame([(3, 1.0, 2.0)], "n int, m1 double, m2 double")
    rows = pipe.apply(df).collect()
    assert {(r["metric"], r["value"]) for r in rows} == {("m1", 1.0), ("m2", 2.0)}
    assert all("small" in r["tags"] for r in rows)
