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


def quartiles(values: np.ndarray) -> np.ndarray:
    """[min, q1, median, q3, max] (reference: summary.py:704-706
    ``np.percentile(scores, [0, 25, 50, 75, 100])``)."""
    return np.percentile(np.asarray(values, dtype=float),
                         [0, 25, 50, 75, 100])


def compare_measures_full(scores_by_measure: dict) -> dict:
    """Correlations + quartiles over {measure: per-system score vector}
    (reference: CompareMeasures.__call__, summary.py:684-707)."""
    measures = list(scores_by_measure)
    correlations = {}
    for i, m1 in enumerate(measures):
        for m2 in measures[i + 1:]:
            a = np.asarray(scores_by_measure[m1], dtype=float)
            b = np.asarray(scores_by_measure[m2], dtype=float)
            correlations[m1, m2] = {
                "pearson": pearson(a, b),
                "spearman": spearman(a, b),
                "kendall": kendall_tau(a, b),
            }
    quarts = {m: quartiles(scores_by_measure[m]) for m in measures}
    return {"correlations": correlations, "quartiles": quarts}


def compare_measures_tab(results: dict, measures: list[str]) -> str:
    """Reference CompareMeasures.tab_format (summary.py:709-726):
    width-padded, tab-joined rows of pearson/spearman/kendall plus
    median-diff and iqr-ratio from the quartiles."""
    correlations = results["correlations"]
    quarts = results["quartiles"]
    rows = [["measure1", "measure2", "pearson-r", "spearman-r",
             "kendall-tau", "median-diff", "iqr-ratio"]]
    for i, m1 in enumerate(measures):
        for m2 in measures[i + 1:]:
            corr = correlations[m1, m2]
            q1, q2 = quarts[m1], quarts[m2]
            iqr2 = q2[3] - q2[1]
            data = [corr["pearson"], corr["spearman"], corr["kendall"],
                    q1[2] - q2[2],
                    (q1[3] - q1[1]) / iqr2 if iqr2 else float("inf")]
            rows.append([m1, m2] + ["%0.3f" % v for v in data])
    widths = [max(len(r[c]) for r in rows) for c in range(len(rows[0]))]
    fmt = "\t".join("{:%ds}" % w for w in widths)
    return "\n".join(fmt.format(*r) for r in rows)


def rank_system_tuples(tuples, group_re=None, limit=None, max_rank=None,
                       group_limit=None, group_max=None):
    """Reference RankSystems._rank (summary.py:965-996): shared ranks
    on score ties, optional per-group ranks and limit/max cut-offs.
    ``tuples``: (system, group, measure, metric, score) sorted by
    (measure, metric, -score).  Yields (tuple, ranks)."""
    import itertools
    from collections import defaultdict

    def _rank(rows):
        key_fns = [(lambda t: None, limit, max_rank)]
        if group_re is not None:
            key_fns.insert(0, (lambda t: t[1], group_limit, group_max))
        inf = float("inf")
        idx: dict = defaultdict(int)
        prev: dict = defaultdict(lambda: (inf, inf))
        for tup in rows:
            no_yield = False
            ranks = []
            for fn, lim, mx in key_fns:
                key = fn(tup)
                idx[key] += 1
                if lim is not None and idx[key] > lim:
                    no_yield = True
                    break
                score, rank = prev[key]
                if tup[4] != score:
                    rank = idx[key]
                    prev[key] = (tup[4], rank)
                ranks.append(rank)
                if mx is not None and rank > mx:
                    no_yield = True
                    break
            if not no_yield:
                yield tup, tuple(ranks)

    tuples = sorted(tuples, key=lambda t: (t[2], t[3], -t[4]))
    for _, rows in itertools.groupby(tuples, key=lambda t: (t[2], t[3])):
        yield from _rank(rows)


def plot_systems_data(results: dict, measures: list[str],
                      metric: str = "fscore", group_re=None,
                      best_in_group: bool = False, sort_by: str = "none",
                      at_most: int | None = None,
                      figures_by: str = "measure",
                      secondary: str = "markers") -> list[dict]:
    """The data side of the reference's PlotSystems (summary.py:116-654):
    select/group/sort the (system, measure, score[, ci]) points that
    each figure would render.  Figure rendering itself is a thin
    matplotlib layer (optional here — the container has no matplotlib);
    this function is the part with semantics.

    ``results``: {system: {measure: {metric: score | {'score','lo','hi'}}}}.
    Returns [{'figure': name, 'secondary': ..., 'points': [{system,
    group, measure, score, prf?, lo?, hi?}]}].

    Grouping (reference _regroup, summary.py:280-301): with
    ``group_re``, points are emitted BY GROUP — groups ordered by key
    (``sort_by='name'``, the default grouping order) or by their best
    member's score (``sort_by='score'``), systems name-sorted within
    a group — and ``at_most`` keeps the first N GROUPS (whole), not N
    points; ``best_in_group`` reduces each group to its top system
    first.  Without ``group_re``, sort/truncate act on points.

    The reference's figure-data variants are all carried in the
    payload so a front-end can render each of them:

    * ``secondary='markers'`` (reference _generate_plots markers
      branch, summary.py:530-546): every point carries its full
      ``prf`` triple when the input has one (evaluate tab files) —
      the recall-precision scatter is points (prf[1], prf[0]).
    * ``secondary='rows'/'columns'`` (_plot1d, :242-278): 1-d score
      plots; points carry ``lo``/``hi`` interval bounds when the
      input is confidence output — the reference's errorbar data
      (_plot, :178-203).
    * ``secondary='heatmap'`` (_heatmap, :464-493): one figure with
      the score ``matrix`` plus ``rows``/``columns`` name lists
      (primary × secondary per ``figures_by``, like _metric_matrix,
      :452-462).
    """
    def _point(system, measure):
        cell = results[system][measure]
        val = cell[metric]
        if isinstance(val, dict):
            p = {"system": system, "measure": measure,
                 "score": val["score"]}
            p.update({k: val[k] for k in ("lo", "hi") if k in val})
        else:
            p = {"system": system, "measure": measure, "score": val}
            if all(k in cell for k in
                   ("precision", "recall", "fscore")):
                p["prf"] = [cell["precision"], cell["recall"],
                            cell["fscore"]]
        if group_re is not None:
            p["group"] = group_re.search(system).group()
        return p

    systems = list(results)

    def _select(points):
        if best_in_group and group_re is not None:
            best: dict = {}
            for p in points:
                cur = best.get(p["group"])
                if cur is None or p["score"] > cur["score"]:
                    best[p["group"]] = p
            points = list(best.values())
        if group_re is not None:
            # reference _regroup (summary.py:280-301): points order
            # BY GROUP — groups sorted by key ('name') or by their
            # best score ('score'), systems name-sorted within —
            # and ``at_most`` truncates GROUPS, not points
            groups: dict = {}
            for p in sorted(points, key=lambda p: p["system"]):
                groups.setdefault(p["group"], []).append(p)
            keys = sorted(groups)
            if sort_by == "score":
                keys.sort(key=lambda g: -max(p["score"]
                                             for p in groups[g]))
            if at_most is not None:
                keys = keys[:at_most]
            return [p for g in keys for p in groups[g]]
        if sort_by == "name":
            points.sort(key=lambda p: p["system"])
        elif sort_by == "score":
            points.sort(key=lambda p: -p["score"])
        if at_most is not None:
            points = points[:at_most]
        return points

    if secondary == "heatmap":
        # score matrix: primary rows × secondary columns, column
        # selection/order from _select on the first row's points
        if figures_by == "system":
            rows, cols = systems, measures
            cell = lambda r, c: _point(r, c)  # noqa: E731
        else:
            rows, cols = measures, systems
            cell = lambda r, c: _point(c, r)  # noqa: E731
        col_order = ([p["system"] for p in
                      _select([_point(s, rows[0]) for s in systems])]
                     if figures_by != "system" else cols)
        return [{
            "figure": "heatmap", "secondary": "heatmap",
            "rows": list(rows), "columns": list(col_order),
            "matrix": [[cell(r, c)["score"] for c in col_order]
                       for r in rows],
        }]
    if figures_by == "measure":
        return [{"figure": m, "secondary": secondary,
                 "points": _select([_point(s, m) for s in systems])}
                for m in measures]
    if figures_by == "system":
        return [{"figure": s, "secondary": secondary,
                 "points": _select([_point(s, m) for m in measures])}
                for s in systems]
    if figures_by == "single":
        return [{"figure": "single", "secondary": secondary,
                 "points": _select([_point(s, m) for s in systems
                                    for m in measures])}]
    raise ValueError(f"unknown figures_by: {figures_by!r}")
