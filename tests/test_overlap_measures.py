"""Overlap-measure arithmetic pinned from the reference
(neleval/test.py:585-605, ``test_measure_overlap``): per-ref credit in
'max' mode (best single overlap fraction) and 'sum' mode (interval-union
sweep, neleval/annotation.py:437-465), driven through the full
``overlap_contingency`` plan rather than a scalar helper.

The reference cases use a credit map {ref: [cands]}; here the refs are
the GOLD side and cands the SYS side, so the pinned credit totals are
the measure's ``rtp`` (gold credit) under gold_mode.
"""

import pytest

from neleval_spark.measures.catalog import MeasureSpec
from neleval_spark.measures.overlap import overlap_contingency


def _ann_df(spark, spans, typed=False):
    """Bare-span annotation rows (docid d1) with optional type key."""
    rows = []
    for sp in spans:
        if typed:
            start, end, typ = sp
        else:
            (start, end), typ = sp, None
        rows.append(("d1", start, end, typ))
    return spark.createDataFrame(
        rows, "docid string, start long, end long, type string")


def _contingency(spark, sys_spans, gold_spans, agg, typed=False):
    key = ("span", "type") if typed else ("span",)
    spec = MeasureSpec(key, None, agg)
    out = overlap_contingency(
        _ann_df(spark, sys_spans, typed),
        _ann_df(spark, gold_spans, typed), spec).first()
    return {k: round(v, 6) for k, v in out.asDict().items()}


REF = (5, 14)   # 10 chars long          (reference test.py:587)
REF2 = (2, 3)   # 2 chars long           (reference test.py:588)

# (sys_spans, expected gold credit under 'max', under 'sum') —
# values pinned verbatim from reference test.py:589-605
CASES = [
    ([], 0.0, 0.0),
    ([(1, 7)], 0.3, 0.3),
    ([(1, 7), (11, 15)], 0.4, 0.7),
    ([(1, 8), (12, 15)], 0.4, 0.7),
    ([(5, 14)], 1.0, 1.0),
    # "Overlapping is not officially supported, but current behaviour":
    ([(1, 7), (6, 15)], 0.9, 1.0),
]


@pytest.mark.parametrize("sys_spans,exp_max,exp_sum", CASES)
def test_overlap_gold_credit(spark, sys_spans, exp_max, exp_sum):
    for gold_mode, exp in [("max", exp_max), ("sum", exp_sum)]:
        got = _contingency(spark, sys_spans, [REF],
                           f"overlap-{gold_mode}max")
        assert got["rtp"] == pytest.approx(exp), (gold_mode, got)
        assert got["fn"] == pytest.approx(1.0 - exp)
        assert got["fp"] == pytest.approx(len(sys_spans) - got["ptp"])


def test_overlap_two_refs(spark):
    # {ref: [Ann(1,8), Ann(12,15)], ref2: [Ann(1,8)]} → 1.4 / 1.7
    sys_spans = [(1, 8), (12, 15)]
    got = _contingency(spark, sys_spans, [REF, REF2], "overlap-maxmax")
    assert got["rtp"] == pytest.approx(1.4)
    got = _contingency(spark, sys_spans, [REF, REF2], "overlap-summax")
    assert got["rtp"] == pytest.approx(1.7)


def test_overlap_sys_credit_direction(spark):
    # ptp uses sys annotations as refs: (1,7) vs gold (5,14) overlaps
    # chars 5-7 = 3 of the sys span's 7 → 3/7
    got = _contingency(spark, [(1, 7)], [REF], "overlap-maxmax")
    assert got["ptp"] == pytest.approx(3 / 7)
    assert got["fp"] == pytest.approx(1 - 3 / 7)


def test_overlap_typed_refs_distinct(spark):
    """Two same-span gold annotations with different types are distinct
    refs, each earning credit from same-type candidates only (the
    reference credits per annotation; key includes 'type')."""
    gold = [(5, 14, "A"), (5, 14, "B")]
    sys_spans = [(1, 7, "A"), (1, 7, "B")]
    for agg in ("overlap-maxmax", "overlap-sumsum"):
        got = _contingency(spark, sys_spans, gold, agg, typed=True)
        assert got["rtp"] == pytest.approx(0.6), (agg, got)
        assert got["fn"] == pytest.approx(1.4)
        assert got["ptp"] == pytest.approx(2 * 3 / 7)

    # and a type with no same-type candidate earns nothing
    got = _contingency(spark, [(1, 7, "A")], gold, "overlap-sumsum",
                       typed=True)
    assert got["rtp"] == pytest.approx(0.3)
    assert got["fn"] == pytest.approx(1.7)
