"""Reporting operators over evaluation results (reference:
neleval/summary.py): system ranking with ties (A14,
RankSystems._rank :965-996), composite measure ratios (A15,
ComposeMeasures :874-896) and measure correlation (A13,
CompareMeasures :684-707).

Evaluation-result tables are tiny (systems × measures); ranking and
composition are expressed relationally anyway so they compose with
grouped inputs; correlation is computed driver-side (as in the
reference, which uses scipy on a dense matrix — here: pandas/numpy).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rank_systems(results: DataFrame, metric: str = "fscore",
                 limit: int | None = None) -> DataFrame:
    """Rank systems per measure by a metric, equal scores sharing a
    rank (reference: summary.py:965-996).

    ``results``: (system, measure, <metric>...) long-format rows.
    """
    w = Window.partitionBy("measure").orderBy(
        F.col(metric).desc(), F.col("system").asc())
    rw = Window.partitionBy("measure").orderBy(F.col(metric).desc())
    out = results.select(
        "system", "measure", F.col(metric).alias("score"),
        F.rank().over(rw).alias("rank"),
        F.row_number().over(w).alias("rn"),
    )
    if limit is not None:
        out = out.where(F.col("rn") <= limit)
    return out.drop("rn").orderBy("measure", "rank", "system")


def compose_measures(results: DataFrame, numerator: str,
                     denominator: str,
                     name: str | None = None) -> DataFrame:
    """New rows metric-wise ratio m1/m2 per system (reference:
    summary.py:874-896); zero denominators yield null."""
    name = name or f"{numerator}/{denominator}"
    num = results.where(F.col("measure") == numerator)
    den = results.where(F.col("measure") == denominator)
    metrics = [c for c in results.columns
               if c not in ("system", "measure")]
    n = num.select("system",
                   *[F.col(c).alias(f"__n_{c}") for c in metrics])
    d = den.select("system",
                   *[F.col(c).alias(f"__d_{c}") for c in metrics])
    j = n.join(d, "system")
    return j.select(
        "system",
        F.lit(name).alias("measure"),
        *[
            F.when(F.col(f"__d_{c}") != 0,
                   F.col(f"__n_{c}") / F.col(f"__d_{c}"))
            .alias(c)
            for c in metrics
        ],
    )


def _rankdata(x: np.ndarray) -> np.ndarray:
    """Average ranks (ties shared), scipy-free."""
    order = np.argsort(x, kind="mergesort")
    ranks = np.empty(len(x), dtype=float)
    sx = x[order]
    i = 0
    while i < len(x):
        j = i
        while j + 1 < len(x) and sx[j + 1] == sx[i]:
            j += 1
        ranks[order[i:j + 1]] = (i + j) / 2 + 1
        i = j + 1
    return ranks


def pearson(a: np.ndarray, b: np.ndarray) -> float:
    a = a - a.mean()
    b = b - b.mean()
    den = np.sqrt((a * a).sum() * (b * b).sum())
    return float((a * b).sum() / den) if den else float("nan")


def spearman(a: np.ndarray, b: np.ndarray) -> float:
    return pearson(_rankdata(a), _rankdata(b))


def kendall_tau(a: np.ndarray, b: np.ndarray) -> float:
    n = len(a)
    conc = disc = 0
    for i in range(n):
        da = a[i + 1:] - a[i]
        db = b[i + 1:] - b[i]
        s = np.sign(da) * np.sign(db)
        conc += int((s > 0).sum())
        disc += int((s < 0).sum())
    den = conc + disc
    return (conc - disc) / den if den else float("nan")


def compare_measures(results: DataFrame, metric: str = "fscore") -> dict:
    """Pairwise correlation between measures' scores across systems
    (reference: summary.py:684-707). Returns
    {(m1, m2): {'pearson': .., 'spearman': .., 'kendall': ..}}."""
    pdf = (
        results.groupBy("system").pivot("measure")
        .agg(F.first(metric))
        .toPandas()
        .set_index("system")
        .sort_index()
    )
    out = {}
    cols = sorted(pdf.columns)
    for i, m1 in enumerate(cols):
        for m2 in cols[i + 1:]:
            a = pdf[m1].to_numpy(dtype=float)
            b = pdf[m2].to_numpy(dtype=float)
            out[(m1, m2)] = {
                "pearson": pearson(a, b),
                "spearman": spearman(a, b),
                "kendall": kendall_tau(a, b),
            }
    return out
