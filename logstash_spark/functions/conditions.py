"""Logstash conditional-expression semantics as Catalyst Column builders.

Reference: the LSCL conditional language (logstash-core/lib/logstash/config/
grammar.treetop:138-232) compiled by EventCondition.java:110-141.  Each
builder returns a Column predicate; the compile-time operand-type dispatch
of the reference (EventCondition static constructors) is mirrored here by
Python-side dispatch on the operand kinds.

Key quirks preserved:

* truthiness (EventCondition.java:501-508, docs/reference/
  event-dependent-configuration.md:344-350): a bare field is false iff
  missing/null, empty string, or the string "false".
* `in` is polymorphic (EventCondition.java:293-331): field-in-list ->
  membership; anything-vs-string -> substring containment; list-vs-scalar ->
  any-element-equals.
* `!=` is the negation of Ruby-equality; we use null-safe equality so that
  null != x behaves deterministically (EventCondition.java:133-134, 376-412).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def truthy(col: Column) -> Column:
    """`if [field]` semantics: false iff null, "", or "false"."""
    s = col.cast("string")
    return s.isNotNull() & (s != F.lit("")) & (s != F.lit("false"))


def eq(left: Column, right) -> Column:
    right = right if isinstance(right, Column) else F.lit(right)
    return left.eqNullSafe(right)


def neq(left: Column, right) -> Column:
    return ~eq(left, right)


def regex_match(col: Column, pattern: str) -> Column:
    """`=~` — regex (or literal substring) match; null field never matches
    (EventCondition.java:232-250)."""
    return col.isNotNull() & col.rlike(pattern)


def regex_not_match(col: Column, pattern: str) -> Column:
    """`!~` — true when the field exists and does not match."""
    return col.isNotNull() & ~col.rlike(pattern)


def in_(needle, haystack) -> Column:
    """Polymorphic `in` dispatch (EventCondition.java:293-357).

    needle/haystack may be a Column or a Python literal (str/list).  Dispatch:
      * haystack is a Python list            -> isin membership
      * haystack is an array Column          -> array_contains
      * haystack is a string (Column or lit) -> substring containment
    """
    if isinstance(haystack, list):
        n = needle if isinstance(needle, Column) else F.lit(needle)
        return n.isin(*haystack)
    if isinstance(haystack, Column):
        # runtime array vs string dispatch is compile-time in the reference;
        # callers pass haystack_kind explicitly via in_array/in_string when
        # the Column type is known. Default: string containment.
        return contains(haystack, needle)
    raise TypeError(f"unsupported haystack: {haystack!r}")


def in_array(needle, arr: Column) -> Column:
    n = needle if isinstance(needle, Column) else F.lit(needle)
    return F.array_contains(arr, n)


def contains(string_col: Column, needle) -> Column:
    n = needle if isinstance(needle, Column) else F.lit(needle)
    return string_col.isNotNull() & string_col.contains(n)


def not_in(needle, haystack) -> Column:
    if isinstance(haystack, list):
        n = needle if isinstance(needle, Column) else F.lit(needle)
        return ~n.isin(*haystack)
    return ~in_(needle, haystack)


def nand(a: Column, b: Column) -> Column:
    return ~(a & b)


def xor(a: Column, b: Column) -> Column:
    return a != b
