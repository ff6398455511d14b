"""Property-based conformance: random inputs, pure-Python oracles.

The reference's own strategy is example goldens (SURVEY.md §5); these
hypothesis suites extend it with randomized coverage of the extraction
kernels — each Spark result is checked against an independent Python
implementation of the reference semantics (re / str.split), one driver
round-trip per case batch to keep runtime sane.
"""

from __future__ import annotations

import re

from hypothesis import given, settings, strategies as st
from pyspark.sql import Row
from pyspark.sql import functions as F

from logstash_spark.operators.grok import grok, CompiledGrok
from logstash_spark.operators.dissect import dissect
from logstash_spark.operators.parsers import kv

# printable-but-not-pathological text: no \x1e (documented single-pass
# caveat), no newlines inside a value.  Words are ASCII because the
# engine's contract is Java-regex semantics (\w, \b are ASCII-only there,
# unlike Python's default Unicode-aware classes); the oracle mirrors that
# with re.ASCII.
_WORD = st.text(alphabet="abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789_",
                min_size=1, max_size=12)
_NOISE = st.text(
    alphabet=st.characters(blacklist_characters="\x1e\n\r",
                           blacklist_categories=("Cs", "Cc")),
    min_size=0, max_size=20)


@settings(max_examples=30, deadline=None)
@given(st.integers(-10**12, 10**12), _WORD, _NOISE)
def test_grok_matches_re_oracle(spark_prop, n, word, noise):
    text = f"{noise}n={n} w={word}"
    tpl = "n=%{INT:n:int} w=%{WORD:w}"
    g = CompiledGrok(tpl)
    m = re.search(g.regex, text, re.ASCII)
    df = spark_prop.createDataFrame([Row(t=text)])
    r = grok(df, "t", tpl).collect()[0]
    if m:
        assert r.n == int(m.group(1))
        assert r.w == m.group(2)
        assert not r.tags
    else:
        assert r.n is None and "_grokparsefailure" in r.tags


@settings(max_examples=30, deadline=None)
@given(st.lists(_WORD, min_size=2, max_size=5))
def test_dissect_matches_split_oracle(spark_prop, parts):
    text = ":".join(parts)
    mapping = ":".join(f"%{{f{i}}}" for i in range(len(parts)))
    df = spark_prop.createDataFrame([Row(t=text)])
    r = dissect(df, "t", mapping).collect()[0]
    # oracle: non-greedy split on the first len-1 delimiters
    expect = text.split(":", len(parts) - 1)
    for i, v in enumerate(expect):
        assert getattr(r, f"f{i}") == v


@settings(max_examples=20, deadline=None)
@given(st.dictionaries(_WORD, _WORD, min_size=1, max_size=5))
def test_kv_matches_dict_oracle(spark_prop, d):
    text = " ".join(f"{k}={v}" for k, v in d.items())
    df = spark_prop.createDataFrame([Row(t=text)])
    out = kv(df, "t", target="parsed").collect()[0].parsed
    assert out == d


# -- community filters (operators/community.py) ------------------------------

_BYTES_ORACLE_RX = re.compile(
    r"^\s*([0-9]*\.?[0-9]+)\s*(?:([KkMmGgTtPp])(i|I)?)?[Bb]?\s*$")


def _bytes_oracle(s: str, method: str = "binary"):
    m = _BYTES_ORACLE_RX.match(s)
    if not m:
        return None
    num = float(m.group(1))
    power = {"k": 1, "m": 2, "g": 3, "t": 4, "p": 5}.get(
        (m.group(2) or "").lower(), 0)
    base = 1024.0 if (method == "binary" or m.group(3)) else 1000.0
    from decimal import Decimal, ROUND_HALF_UP
    d = num * base ** power
    r = float(Decimal(d).quantize(0, ROUND_HALF_UP))
    # Spark double->long try_cast: range check compares against
    # Long.MaxValue.toDouble (= 2^63 exactly, rounded up) -> values above
    # 2^63 null out, 2^63 itself passes and the JVM (long) conversion
    # saturates to MAX_VALUE
    if r > float(2**63) or r < -float(2**63):
        return None
    v = int(Decimal(r).quantize(0, ROUND_HALF_UP))
    return max(-(2**63), min(v, 2**63 - 1))


@settings(max_examples=30, deadline=None)
@given(
    st.decimals(min_value=0, max_value=10**6, places=2).map(str),
    st.sampled_from(["", "b", "kb", "KB", " MB", "GiB", "tb", "PiB", "kib"]),
    st.sampled_from(["binary", "metric"]),
)
def test_bytes_matches_python_oracle(spark_prop, num, unit, method):
    from logstash_spark.operators.community import bytes_filter

    s = f"{num}{unit}"
    df = spark_prop.createDataFrame([Row(s=s)])
    r = bytes_filter(df, "s", conversion_method=method).collect()[0]
    assert r.bytes_value == _bytes_oracle(s, method)


@settings(max_examples=30, deadline=None)
@given(_NOISE, st.lists(st.integers(-10**9, 10**9), max_size=4),
       st.lists(st.decimals(min_value=-10**6, max_value=10**6,
                            places=3).map(float), max_size=3))
def test_extractnumbers_matches_re_oracle(spark_prop, noise, ints, floats):
    from logstash_spark.operators.community import extractnumbers

    text = noise + " " + " ".join(
        [str(i) for i in ints] + [f"{f:.3f}" for f in floats])
    float_rx = r"[+-]?\d+\.\d+"
    want_floats = [float(x) for x in re.findall(float_rx, text, re.ASCII)]
    cleaned = re.sub(float_rx, " ", text, flags=re.ASCII)
    want_ints = [int(x) for x in re.findall(r"[+-]?\d+", cleaned, re.ASCII)]
    df = spark_prop.createDataFrame([Row(t=text)])
    r = extractnumbers(df, "t").collect()[0]
    assert list(r.ints) == want_ints
    assert list(r.floats) == want_floats


@settings(max_examples=20, deadline=None)
@given(st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789-.",
               min_size=1, max_size=30))
def test_tld_matches_split_oracle(spark_prop, host):
    from logstash_spark.operators.community import tld

    parts = host.split(".")
    df = spark_prop.createDataFrame([Row(h=host)])
    r = tld(df, "h").collect()[0]
    assert r.tld_tld == parts[-1]
    assert r.tld_domain == (".".join(parts[-2:]) if len(parts) >= 2 else None)
    assert r.tld_subdomain == (".".join(parts[:-2]) if len(parts) >= 3 else None)


# -- msgpack decoder: round-trip against an independent test encoder ---------

_mp_scalar = st.one_of(
    st.none(), st.booleans(),
    st.integers(min_value=-(2**63), max_value=2**64 - 1),
    st.floats(allow_nan=False, allow_infinity=False),
    st.text(max_size=40),
    st.binary(max_size=20),
)
_mp_value = st.recursive(
    _mp_scalar,
    lambda inner: st.one_of(
        st.lists(inner, max_size=6),
        st.dictionaries(st.text(max_size=10), inner, max_size=6)),
    max_leaves=12)


@settings(max_examples=150, deadline=None)
@given(_mp_value)
def test_msgpack_decode_roundtrip(v):
    """Pure decoder property: for any value the test encoder (written
    independently from the msgpack.org spec) can emit, _mp_decode returns
    the identical value and consumes exactly the payload."""
    from logstash_spark.operators.codecs_binary import _mp_decode
    from tests.test_codecs_binary import mp_enc

    # uint64 range: values above 2**63-1 use the 0xcf family
    wire = mp_enc(v)
    got, end = _mp_decode(wire)
    assert end == len(wire)
    assert got == v
