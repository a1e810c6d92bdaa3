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
