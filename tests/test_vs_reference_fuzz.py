"""Differential FUZZ vs the live reference engine.

`test_vs_reference.py` runs one fixed 1000-doc generated corpus — a
broad-drift net.  This module walks the degenerate corners instead:
hypothesis generates tiny annotation sets (1-3 docs, colliding span
grids, NIL-heavy pools, disjoint/identical gold-system pairs) and
EVERY measure — including ``mention_ceaf`` / ``entity_ceaf``, whose
Hungarian solve is instant at this size — must agree with the
reference to 1e-10.  This is the suite's only randomized CEAF parity
net (the driver gate records ``mention_ceaf`` as ``no_oracle``), and
it exercises exactly the places where zero-denominator guards,
NIL handling, and cluster tie-breaking live (reference
evaluate.py:281 StrictMetricWarning; coref_metrics.py ceaf paths).

Cost control: examples are capped (each one runs 12 Spark measure
jobs, ~10 s warm) and shrinking is disabled — a failure prints the
raw example, which at <=10 rows/side is already minimal enough to
debug by eye.
"""

import os
import sys

import pytest
from hypothesis import HealthCheck, Phase, example, given, settings
from hypothesis import strategies as st

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "neleval")),
    reason="reference not present")

MEASURES = [
    "strong_mention_match", "strong_typed_mention_match",
    "strong_link_match", "strong_typed_all_match", "strong_all_match",
    "entity_match", "b_cubed", "muc", "pairwise", "b_cubed_plus",
    "mention_ceaf", "entity_ceaf",
]

# The long tail both engines expose as measure strings: the four
# overlap aggregates (fractional credit for partial span overlap —
# exercised hard by the colliding grid), BLANC-negative, the NIL
# tagging filter, and the typed/linked CEAF variants.
EXTENDED = [
    "overlap-sumsum:None:span", "overlap-summax:None:span",
    "overlap-maxsum:None:span", "overlap-maxmax:None:span",
    "pairwise_negative:None:span", "strong_typed_nil_match",
    "mention_ceaf_plus", "typed_mention_ceaf",
    "typed_mention_ceaf_plus",
]

KBIDS = ["E00001", "E00002", "E00003", "NIL0001", "NIL0002"]
TYPES = ["PER", "ORG"]

# (doc, start, span-length, kbid-index, type-index).  The tight
# start/length grid makes span collisions (exact and overlapping)
# between gold and system the COMMON case, which is where the match
# joins and cluster intersections get interesting.
_row = st.tuples(
    st.integers(0, 2), st.integers(0, 6), st.integers(1, 3),
    st.integers(0, len(KBIDS) - 1), st.integers(0, len(TYPES) - 1))
_rows = st.lists(_row, min_size=1, max_size=10)


def _dedupe(rows):
    """One annotation per (doc, start, end) per side — both engines
    key strong measures on the span tuple; duplicate spans within one
    side would test reader behavior, not measure semantics."""
    seen, out = set(), []
    for doc, start, length, kb, ty in rows:
        key = (doc, start, length)
        if key in seen:
            continue
        seen.add(key)
        out.append((f"doc{doc}", start, start + length,
                    KBIDS[kb], TYPES[ty]))
    return sorted(out)


def _nonoverlapping(rows):
    """Valid-input constraint for the overlap family: the reference's
    pair sweep (annotation.py:419-431, its own ``XXX: cands should
    not be overlapping`` note) assumes spans within ONE side never
    overlap — its ``validate-spans`` tool flags such input as
    invalid, and on it the sweep silently drops pairs while our range
    join finds them all (divergence documented in
    measures/overlap.py).  Greedily keep each doc's first
    non-conflicting span, inclusive-end overlap test."""
    kept = []
    for row in rows:
        docid, start, end = row[0], row[1], row[2]
        if any(d == docid and start <= e and s <= end
               for d, s, e, _, _ in kept):
            continue
        kept.append(row)
    return kept


def _write(path, rows):
    with open(path, "w") as f:
        for docid, start, end, kbid, ty in rows:
            f.write(f"{docid}\t{start}\t{end}\t{kbid}\t1.0\t{ty}\n")


def _reference_scores(data_dir, measures):
    import collections
    import collections.abc

    for n in ("Sequence", "Mapping", "MutableMapping", "Iterable",
              "Callable", "Set", "MutableSet", "MutableSequence",
              "Hashable"):
        setattr(collections, n, getattr(collections.abc, n))
    import numpy as np

    for n, v in (("bool", bool), ("int", int), ("float", float),
                 ("object", object)):
        if not hasattr(np, n):
            setattr(np, n, v)
    sys.path.insert(0, REF)
    try:
        from neleval.evaluate import Evaluate

        res = Evaluate(f"{data_dir}/system.tsv",
                       gold=f"{data_dir}/gold.tsv",
                       measures=measures, fmt="none")()
        return {m: {k: res[m][k]
                    for k in ("precision", "recall", "fscore")}
                for m in res}
    finally:
        sys.path.remove(REF)


# Explicit corners always run (Phase.explicit): identical sides,
# fully disjoint spans, all-NIL vs all-linked, and one-mention sides.
_IDENTICAL = [(0, 0, 2, 0, 0), (0, 3, 2, 3, 1), (1, 0, 1, 1, 0)]
_DISJOINT_G = [(0, 0, 1, 0, 0), (1, 0, 1, 1, 0)]
_DISJOINT_S = [(0, 4, 1, 0, 0), (2, 0, 1, 1, 0)]
_ALL_NIL = [(0, 0, 2, 3, 0), (0, 3, 2, 4, 0), (1, 0, 2, 3, 1)]
_ALL_LINKED = [(0, 0, 2, 0, 0), (0, 3, 2, 1, 0), (1, 0, 2, 0, 1)]


def _assert_parity(spark, gold, system, measures, valid_spans=False):
    import tempfile

    from neleval_spark.measures import evaluate
    from neleval_spark.sources.tsv import read_annotations_tsv

    g_rows, s_rows = _dedupe(gold), _dedupe(system)
    if valid_spans:
        g_rows, s_rows = _nonoverlapping(g_rows), _nonoverlapping(s_rows)

    data_dir = tempfile.mkdtemp(prefix="nef_")
    _write(f"{data_dir}/gold.tsv", g_rows)
    _write(f"{data_dir}/system.tsv", s_rows)

    want = _reference_scores(data_dir, measures)
    got = evaluate(
        read_annotations_tsv(spark, f"{data_dir}/system.tsv"),
        read_annotations_tsv(spark, f"{data_dir}/gold.tsv"),
        measures=measures)

    assert set(want) == set(got)
    for m, sc in want.items():
        for k, v in sc.items():
            assert abs(got[m][k] - v) <= 1e-10, (
                m, k, v, got[m][k], gold, system)


@settings(max_examples=8, deadline=None,
          phases=[Phase.explicit, Phase.reuse, Phase.generate],
          suppress_health_check=[HealthCheck.too_slow])
@example(gold=_IDENTICAL, system=_IDENTICAL)
@example(gold=_DISJOINT_G, system=_DISJOINT_S)
@example(gold=_ALL_NIL, system=_ALL_LINKED)
@example(gold=[(0, 0, 1, 0, 0)], system=[(0, 0, 1, 3, 0)])
@given(gold=_rows, system=_rows)
def test_fuzz_reference_parity(spark, gold, system):
    _assert_parity(spark, gold, system, MEASURES)


@settings(max_examples=4, deadline=None,
          phases=[Phase.explicit, Phase.reuse, Phase.generate],
          suppress_health_check=[HealthCheck.too_slow])
@example(gold=_IDENTICAL, system=_IDENTICAL)
@example(gold=_ALL_NIL, system=_ALL_LINKED)
@given(gold=_rows, system=_rows)
def test_fuzz_reference_parity_extended(spark, gold, system):
    """Overlap aggregates reward PARTIAL span overlap, so the
    colliding grid (lengths 1-3 at adjacent starts) produces the
    fractional-credit cases.  Spans within one side are made
    non-overlapping first (``_nonoverlapping``): that is the
    reference sweep's documented input precondition — this very test
    caught the divergence on invalid input before the constraint was
    added (overlap-sumsum precision 0.5119 ref vs 0.5476 ours on a
    doc whose gold mentions nested)."""
    _assert_parity(spark, gold, system, EXTENDED, valid_spans=True)


def _reference_errors(data_dir):
    """Reference Analyze.iter_errors as normalized (doc, gold, sys,
    label) tuples — MISSING/NIL disambiguated the way the reference's
    string form does (analyze.py:33-38)."""
    import collections
    import collections.abc

    for n in ("Sequence", "Mapping", "MutableMapping", "Iterable",
              "Callable", "Set", "MutableSet", "MutableSequence",
              "Hashable"):
        setattr(collections, n, getattr(collections.abc, n))
    import numpy as np

    for n, v in (("bool", bool), ("int", int), ("float", float),
                 ("object", object)):
        if not hasattr(np, n):
            setattr(np, n, v)
    sys.path.insert(0, REF)
    try:
        from neleval.analyze import MISSING, Analyze

        def norm(v):
            return "MISSING" if v is MISSING else (
                "NIL" if v is None else v)

        a = Analyze(f"{data_dir}/system.tsv",
                    gold=f"{data_dir}/gold.tsv")
        return collections.Counter(
            (e.doc_id, norm(e.gold), norm(e.system), e.label)
            for e in a.iter_errors())
    finally:
        sys.path.remove(REF)


@settings(max_examples=6, deadline=None,
          phases=[Phase.explicit, Phase.reuse, Phase.generate],
          suppress_health_check=[HealthCheck.too_slow])
@example(gold=_IDENTICAL, system=_IDENTICAL)
@example(gold=_DISJOINT_G, system=_DISJOINT_S)
@example(gold=_ALL_NIL, system=_ALL_LINKED)
@given(gold=_rows, system=_rows)
def test_fuzz_reference_error_analysis(spark, gold, system):
    """Per-mention error taxonomy parity: error_table must emit the
    reference's exact (doc, gold, system, label) multiset, incl. the
    reference quirk that correct links are ALWAYS yielded
    (analyze.py:87-91 — the `continue` is commented out) and that
    one-sided docs align against an empty counterpart
    (evaluate.py:62-68)."""
    import collections
    import tempfile

    from neleval_spark.analyze import error_table
    from neleval_spark.sources.tsv import read_annotations_tsv

    data_dir = tempfile.mkdtemp(prefix="nea_")
    _write(f"{data_dir}/gold.tsv", _dedupe(gold))
    _write(f"{data_dir}/system.tsv", _dedupe(system))

    want = _reference_errors(data_dir)
    rows = error_table(
        read_annotations_tsv(spark, f"{data_dir}/system.tsv"),
        read_annotations_tsv(spark, f"{data_dir}/gold.tsv")).collect()
    got = collections.Counter(
        (r["docid"],
         "MISSING" if r["label"] == "extra"
         else (r["gold_kbid"] if r["gold_kbid"] is not None else "NIL"),
         "MISSING" if r["label"] == "missing"
         else (r["system_kbid"] if r["system_kbid"] is not None
               else "NIL"),
         r["label"]) for r in rows)
    assert got == want, (got, want, gold, system)
