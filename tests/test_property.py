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
