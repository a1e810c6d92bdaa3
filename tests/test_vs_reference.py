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


def test_multinomial_bootstrap_ci_vs_reference(spark):
    """bootstrap_confidence(method='multinomial') implements the
    reference's exact resampling protocol (bootstrap_trials,
    significance.py:224-234: N uniform doc draws with replacement per
    trial).  Run BOTH on the same per-doc contingency table with 2000
    trials each (different RNG streams) and require the 90/95/99% CI
    bounds to agree within stochastic tolerance."""
    import collections
    import collections.abc
    import random

    for n in ("Sequence", "Mapping", "MutableMapping", "Iterable",
              "Callable", "Set", "MutableSet", "MutableSequence",
              "Hashable"):
        setattr(collections, n, getattr(collections.abc, n))
    import numpy as np

    if not hasattr(np, "bool"):
        np.bool = bool
    sys.path.insert(0, REF)
    try:
        from neleval.evaluate import Matrix
        from neleval.significance import _percentile, bootstrap_trials

        from neleval_spark.stats.significance import (
            bootstrap_confidence, nist_percentile)

        rng = random.Random(7)
        rows = [(f"doc{i:03d}", float(rng.randint(0, 9)),
                 float(rng.randint(0, 4)), float(rng.randint(0, 9)),
                 float(rng.randint(0, 4))) for i in range(200)]
        per_doc = spark.createDataFrame(
            rows, "docid string, ptp double, fp double, "
                  "rtp double, fn double")
        ours = bootstrap_confidence(per_doc, n_trials=2000,
                                    method="multinomial", seed=11)

        random.seed(11)
        mats = [Matrix(int(p), int(f), int(r), int(n))
                for _, p, f, r, n in rows]
        hist = bootstrap_trials(mats, 2000,
                                ["precision", "recall", "fscore"])
        for metric in ("precision", "recall", "fscore"):
            values = sorted(hist[metric])
            for pct in (90, 95, 99):
                ref_lo = _percentile(values, (100 - pct) / 2)
                ref_hi = _percentile(values, 100 - (100 - pct) / 2)
                lo, hi = ours[metric][pct]
                # 2000-trial percentile sampling noise on 200 docs is
                # ~0.002-0.004; 0.01 is ~3σ
                assert abs(lo - ref_lo) < 0.01, (metric, pct, lo, ref_lo)
                assert abs(hi - ref_hi) < 0.01, (metric, pct, hi, ref_hi)
        # sanity: our NIST percentile equals the reference's on the
        # reference's own trial vector (exact, same formula)
        assert nist_percentile(values, 2.5) == _percentile(values, 2.5)
    finally:
        sys.path.remove(REF)
