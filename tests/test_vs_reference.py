"""Live-reference parity net: run the ACTUAL reference engine (not
pinned fixtures) and this engine on the same generated annotations
and require every P/R/F to agree exactly.

The measure set here excludes mention_ceaf because the reference's
Hungarian solve is minutes-slow on cross-doc cluster structures (the
recorded head-to-head runs in BENCH/VSREF.md cover CEAF parity at
2k/20k/50k docs); everything else is seconds-fast.
"""

import os
import sys

import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "neleval")),
    reason="reference not present")

MEASURES = [
    "strong_mention_match", "strong_typed_mention_match",
    "strong_link_match", "strong_typed_all_match", "strong_all_match",
    "entity_match", "b_cubed", "muc", "pairwise", "b_cubed_plus",
]


def _reference_scores(data_dir):
    import collections
    import collections.abc

    for n in ("Sequence", "Mapping", "MutableMapping", "Iterable",
              "Callable", "Set", "MutableSet", "MutableSequence",
              "Hashable"):
        setattr(collections, n, getattr(collections.abc, n))
    import numpy as np

    if not hasattr(np, "bool"):
        np.bool = bool
    sys.path.insert(0, REF)
    try:
        from neleval.evaluate import Evaluate

        res = Evaluate(f"{data_dir}/system.tsv",
                       gold=f"{data_dir}/gold.tsv",
                       measures=MEASURES, fmt="none")()
        return {m: {k: res[m][k]
                    for k in ("precision", "recall", "fscore")}
                for m in res}
    finally:
        sys.path.remove(REF)


def test_live_reference_parity(spark, tmp_path):
    from scripts.bench_vs_reference import generate

    from neleval_spark.measures import evaluate
    from neleval_spark.sources.tsv import read_annotations_tsv

    data_dir = str(tmp_path)
    generate(data_dir, 1000, seed=7)

    want = _reference_scores(data_dir)
    got = evaluate(
        read_annotations_tsv(spark, f"{data_dir}/system.tsv"),
        read_annotations_tsv(spark, f"{data_dir}/gold.tsv"),
        measures=MEASURES)

    assert set(want) == set(got)
    for m, sc in want.items():
        for k, v in sc.items():
            assert abs(got[m][k] - v) <= 1e-10, (m, k, v, got[m][k])
