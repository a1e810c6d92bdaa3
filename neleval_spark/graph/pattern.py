"""Basic-graph-pattern (BGP) queries over the materialized triple
table — the SPARQL-style conjunctive query layer a KG exists to serve
(``SELECT ?x ?y WHERE { ?x type Person . ?x knows ?y }``).

The reference has no query layer at all (its KB involvement stops at
the redirect dict, reference tac.py:83-103); this is public-knowledge
relational algebra: each triple pattern is a filtered projection of
the triple table, and a conjunction is the natural join of its
patterns on shared variables (Pérez, Arenas, Gutierrez: "Semantics
and Complexity of SPARQL", ISWC 2006 — BGP evaluation IS the join).

Scale shape (triples is the 10^12-row table):

* each pattern scans the triple table ONCE with its constants pushed
  down — constant predicate/object filters reach the parquet scan
  (partition- and row-group-prunable), so a selective pattern like
  (?x, located_in, Berlin) reads a sliver, not the table;
* join ORDER is chosen greedily by selectivity (patterns with more
  constants first, then always a pattern sharing ≥1 variable with
  the accumulated solution — never a cartesian unless the pattern
  graph itself is disconnected, which raises unless
  ``allow_product=True``);
* every join is a hash equi-join on the shared variable columns; a
  selective pattern side is broadcast by AQE at runtime, and skewed
  join keys (hub entities) are covered by AQE skew-join splitting —
  there is no iterative self-join here for skew to compound through;
* solutions follow SPARQL set semantics over the deduplicated
  triple table: patterns are deduplicated per projected variable
  tuple before joining (a pattern that drops a position — e.g. a
  constant-object pattern used as an existence check on ?x — would
  otherwise multiply solutions by its match count).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["match_pattern"]

_POS = ("subj", "pred", "obj")


def _is_var(term: str) -> bool:
    return isinstance(term, str) and term.startswith("?")


def _pattern_df(triples: DataFrame, pat: tuple[str, str, str],
                idx: int) -> tuple[DataFrame, set]:
    """One triple pattern → (projection keyed by its variables, vars).

    Constants become pushed-down equality filters; repeated variables
    within one pattern (e.g. ``(?x, knows, ?x)``) become same-row
    equality; the surviving variable positions are renamed to the
    variable names and deduplicated (set semantics per solution
    tuple).
    """
    df = triples.select(*_POS)
    seen: dict[str, str] = {}  # bare variable name -> source column
    for col, term in zip(_POS, pat):
        if _is_var(term):
            name = term[1:]
            if not name:
                raise ValueError("bare '?' is not a variable name")
            if name in seen:  # repeated var: same-row equality
                df = df.where(F.col(col) == F.col(seen[name]))
            else:
                seen[name] = col
        else:
            df = df.where(F.col(col) == F.lit(term))
    out = df.select(*[F.col(c).alias(v) for v, c in seen.items()])
    if not seen:
        # fully-ground pattern: existence check — empty iff no match
        out = df.limit(1).select(F.lit(1).alias(f"__exists_{idx}__"))
        return out, set()
    return out.distinct(), set(seen)


def match_pattern(triples: DataFrame,
                  pattern: list[tuple[str, str, str]],
                  allow_product: bool = False) -> DataFrame:
    """Evaluate a conjunctive triple pattern; one column per variable.

    ``pattern`` is a list of (subj, pred, obj) terms where strings
    starting with ``?`` are variables and anything else is a constant
    — e.g. ``[("?x", "type", "Person"), ("?x", "knows", "?y")]``.
    Raises on a disconnected pattern graph unless ``allow_product``
    (a genuine cross product at triple-table scale is almost always
    a query bug, not an intent).
    """
    if not pattern:
        raise ValueError("empty pattern")
    parts = [(_pattern_df(triples, p, i), p)
             for i, p in enumerate(pattern)]
    # most-constant (most selective) pattern first
    order = sorted(
        range(len(parts)),
        key=lambda i: (-sum(not _is_var(t) for t in parts[i][1]), i))
    remaining = list(order)
    first = remaining.pop(0)
    acc, bound = parts[first][0]
    while remaining:
        # next: any pattern sharing a bound variable (equi-join); a
        # ground pattern (0/1-row existence frame) or an accumulator
        # that is itself still ground (bound empty) is always safe
        nxt = next((i for i in remaining
                    if parts[i][0][1] & bound
                    or not parts[i][0][1] or not bound),
                   None)
        if nxt is None:
            if not allow_product:
                raise ValueError(
                    "disconnected pattern graph (cross product); "
                    "pass allow_product=True if intended")
            nxt = remaining[0]
        remaining.remove(nxt)
        df, vs = parts[nxt][0]
        shared = sorted(vs & bound)
        if shared:
            acc = acc.join(df, on=shared)
        else:
            # ground-pattern existence check (0/1 broadcast row) or
            # an explicitly-allowed product
            acc = acc.crossJoin(F.broadcast(df) if not vs else df)
        bound |= vs
    if not bound:
        # every pattern ground: one (matched=1) row iff all exist
        return acc.select(F.lit(1).alias("matched")).limit(1)
    return acc.select(*sorted(bound))
