"""Null-safe equi-join helper.

Reference key tuples may contain None (e.g. ``kbid`` is None for NIL
mentions under ``strong_all_match``) and Python dict keys treat None as
an ordinary value; Spark's ``=`` join drops null keys. ``<=>``
(EqualNullSafe) is still a hash-joinable equi-predicate in Catalyst,
so these joins stay broadcast/SMJ — never a nested loop.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def ns_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    how: str = "inner",
    extra: Column | None = None,
) -> DataFrame:
    """Join on ``on`` columns with null-safe equality; the join columns
    in the result are coalesced to single columns named as in ``on``;
    all other columns from both sides are kept."""
    if not on:
        return left.crossJoin(right)
    l = left
    r = right
    cond = reduce(
        lambda a, b: a & b, [l[c].eqNullSafe(r[c]) for c in on])
    if extra is not None:
        cond = cond & extra
    j = l.join(r, cond, how)
    keep = [F.coalesce(l[c], r[c]).alias(c) for c in on]
    lc = [l[c] for c in left.columns if c not in on]
    rc = [r[c] for c in right.columns if c not in on]
    return j.select(*keep, *lc, *rc)
