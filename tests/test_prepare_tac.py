"""Golden prepare test: prepare_tac output must equal the reference's
committed combined.tsv fixtures byte-for-byte per line (reference:
neleval/test.py:41-47). Output order is not meaningful distributedly,
so both sides are compared as sorted line lists."""

import os

import pytest

EXAMPLES = "/root/reference/neleval/examples"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(EXAMPLES), reason="reference fixtures not present")


@pytest.mark.parametrize(
    "links,queries,combined",
    [
        ("tac_gold.tab", "tac_gold.xml", "tac_gold.combined.tsv"),
        ("tac_system.tab", "tac_system.xml", "tac_system.combined.tsv"),
    ],
)
def test_tac_prepare_golden(spark, links, queries, combined):
    from neleval_spark.sources.tac import prepare_tac
    from neleval_spark.sources.tsv import annotations_to_tsv_lines

    df = prepare_tac(
        spark,
        os.path.join(EXAMPLES, links),
        os.path.join(EXAMPLES, queries),
    )
    lines = [r["value"] for r in annotations_to_tsv_lines(df).collect()]
    with open(os.path.join(EXAMPLES, combined)) as f:
        expected = f.read().rstrip("\n").split("\n")
    assert sorted(lines) == sorted(expected)


def test_tsv_read_write_roundtrip(spark):
    """Read ↔ write round-trip (reference: test.py:69-72)."""
    from neleval_spark.sources.tsv import (
        annotations_to_tsv_lines, read_annotations_tsv)

    path = os.path.join(EXAMPLES, "tac_gold.combined.tsv")
    df = read_annotations_tsv(spark, path)
    lines = [r["value"] for r in annotations_to_tsv_lines(df).collect()]
    with open(path) as f:
        expected = f.read().rstrip("\n").split("\n")
    assert sorted(lines) == sorted(expected)
