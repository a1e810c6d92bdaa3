"""TAC'15 reader (S3) and evaluation-tab round trip (S7)."""

import pytest


TAC15_LINES = [
    # run, mention_id, text, offset, kbid, ne_type, mention_type,
    # score, web, wiki, unknown (reference: neleval/tac.py:170-238)
    "run1\tM01\tChina\tD1: 10 - 14\tE100\tGPE\tNAM\t0.9\t-\t-\t-",
    "run1\tM02\tChina\tD1: 10 - 14\tE200\tGPE\tNAM\t0.7\t-\t-\t-",
    "run1\tM03\tObama\tD1: 20 - 24\tNIL01\tPER\tNOM\t1.0\t-\t-\t-",
    "run1\tM04\tParis\tD2: 5 - 9\tE300\tGPE\tNAM\t0.8\t-\t-\t-",
]


def test_prepare_tac15(spark, tmp_path):
    from neleval_spark.sources.tac import prepare_tac15

    p = tmp_path / "tac15.tsv"
    p.write_text("\n".join(TAC15_LINES) + "\n")
    df = prepare_tac15(spark, str(p))
    rows = {(r["docid"], r["start"], r["end"]): r for r in df.collect()}
    assert set(rows) == {("D1", 10, 14), ("D1", 20, 24), ("D2", 5, 9)}
    d1 = rows[("D1", 10, 14)]
    # candidates sorted by descending score; top promoted
    assert d1["eid"] == "E100" and abs(d1["score"] - 0.9) < 1e-9
    assert [c["eid"] for c in d1["candidates"]] == ["E100", "E200"]
    assert d1["type"] == "GPE/NAM"
    nil = rows[("D1", 20, 24)]
    assert nil["is_nil"] and nil["kbid"] is None


def test_evaluation_tab_roundtrip(spark):
    """S7: tab-format results re-ingest (reference:
    evaluate.py:208-218)."""
    from neleval_spark.measures.contingency import (
        Matrix, read_tab_format, tab_format)

    results = {
        "strong_all_match": Matrix(8, 2, 8, 1).results,
        "muc": Matrix(3, 1, 3, 2).results,
    }
    text = tab_format(results)
    back = read_tab_format(text.splitlines())
    for name, res in results.items():
        for metric, val in res.items():
            assert abs(back[name][metric] - round(val, 3)) < 1e-3


# --- round 2: CoNLL coref end-to-end -----------------------------------------
#
# Expected lines produced by executing the reference PrepareConllCoref
# (neleval/import_.py:37-110, shimmed for py3) on the same input.

CONLL_COREF_DOC = (
    "#begin document (docX); part 000\n"
    "a\t(1\n" "b\t1)\n" "c\t(2)\n" "d\t(1(3\n" "e\t3)\n" "f\t1)\n"
    "#end document\n"
    "#begin document (docY)\n"
    "x\t(1)|(4\n" "y\t-\n" "z\t4)|(NIL7)\n"
    "#end document\n"
    "#begin document \n"
    "q\t(E55)\n"
    "#end document\n"
)

_X = "(docX);_part_000"
_Y = "(docY)"

PREPARE_CONLL_EXPECTED = {
    (): [
        f"{_X}\t1\t2\tNIL1:{_X}\t\t",
        f"{_X}\t3\t3\tNIL2:{_X}\t\t",
        f"{_X}\t4\t5\tNIL3:{_X}\t\t",
        f"{_X}\t4\t6\tNIL1:{_X}\t\t",
        f"{_Y}\t1\t1\tNIL1:{_Y}\t\t",
        f"{_Y}\t1\t3\tNIL4:{_Y}\t\t",
        f"{_Y}\t3\t3\tNILNIL7:{_Y}\t\t",
        "doc2\t1\t1\tNILE55:doc2\t\t",
    ],
    ("with_kb",): [
        f"{_X}\t1\t2\t1\t\t",
        f"{_X}\t3\t3\t2\t\t",
        f"{_X}\t4\t5\t3\t\t",
        f"{_X}\t4\t6\t1\t\t",
        f"{_Y}\t1\t1\t1\t\t",
        f"{_Y}\t1\t3\t4\t\t",
        f"{_Y}\t3\t3\tNIL7:{_Y}\t\t",
        "doc2\t1\t1\tE55\t\t",
    ],
    ("cross_doc",): [
        f"{_X}\t1\t2\tNIL1\t\t",
        f"{_X}\t3\t3\tNIL2\t\t",
        f"{_X}\t4\t5\tNIL3\t\t",
        f"{_X}\t4\t6\tNIL1\t\t",
        f"{_Y}\t1\t1\tNIL1\t\t",
        f"{_Y}\t1\t3\tNIL4\t\t",
        f"{_Y}\t3\t3\tNILNIL7\t\t",
        "doc2\t1\t1\tNILE55\t\t",
    ],
    ("with_kb", "cross_doc"): [
        f"{_X}\t1\t2\t1\t\t",
        f"{_X}\t3\t3\t2\t\t",
        f"{_X}\t4\t5\t3\t\t",
        f"{_X}\t4\t6\t1\t\t",
        f"{_Y}\t1\t1\t1\t\t",
        f"{_Y}\t1\t3\t4\t\t",
        f"{_Y}\t3\t3\tNIL7\t\t",
        "doc2\t1\t1\tE55\t\t",
    ],
}


@pytest.mark.parametrize("flags", list(PREPARE_CONLL_EXPECTED))
def test_prepare_conll_coref_golden(spark, tmp_path, flags):
    from neleval_spark.sources.conll import prepare_conll_coref
    from neleval_spark.sources.tsv import annotations_to_tsv_lines

    p = tmp_path / "coref.txt"
    p.write_text(CONLL_COREF_DOC)
    df = prepare_conll_coref(spark, str(p), **{f: True for f in flags})
    lines = sorted(r["value"]
                   for r in annotations_to_tsv_lines(df).collect())
    assert lines == PREPARE_CONLL_EXPECTED[flags]


def test_prepare_conll_coref_evaluate_roundtrip(spark, tmp_path):
    """Prepared CoNLL coref self-evaluates perfectly through the full
    evaluate path (mirrors reference test.py conll self-eval intent)."""
    from neleval_spark.measures import evaluate
    from neleval_spark.sources.conll import prepare_conll_coref

    p = tmp_path / "coref.txt"
    p.write_text(CONLL_COREF_DOC)
    df = prepare_conll_coref(spark, str(p))
    res = evaluate(df, df, measures=["mention_ceaf", "muc", "b_cubed",
                                     "strong_mention_match"])
    for m, v in res.items():
        assert v["fscore"] == 1.0, (m, v)
    assert res["strong_mention_match"]["ptp"] == 8
