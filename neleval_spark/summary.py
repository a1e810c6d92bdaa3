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


def order_measures(scores_by_measure: dict, sort_by: str = "none"
                   ) -> list[str]:
    """Measure ordering for the CompareMeasures plot family
    (reference summary.py:742-760).

    * ``'none'`` — input order; ``'name'`` — lexicographic.
    * ``'eigen'`` — by each measure's loading on the first principal
      component of the (system × measure) score matrix.  The
      reference's ``np.argsort(PCA(all_results).s)`` indexes the
      singular-VALUE vector, which mlab's PCA returns already sorted
      — a no-op quirk; the intent ("order correlated measures next
      to each other") is the PC-1 loading order implemented here.
    * ``'mds'`` — 1-d classical MDS (Torgerson) over euclidean
      distances between measure score vectors.  The reference uses
      sklearn's SMACOF with a fixed ``random_state``; the classical
      eigensolve is deterministic with no dependency and agrees on
      the axis that explains the most pairwise distance.

    Both embeddings fix the eigenvector sign (largest-|coordinate|
    entry positive) so the order is reproducible across BLAS builds.
    """
    measures = list(scores_by_measure)
    if sort_by in ("none", None):
        return measures
    if sort_by == "name":
        return sorted(measures)
    x = np.column_stack([np.asarray(scores_by_measure[m], dtype=float)
                         for m in measures])
    if sort_by == "eigen":
        centered = x - x.mean(axis=0, keepdims=True)
        # loadings of PC-1 = right singular vector of the centered
        # score matrix (systems × measures)
        _, _, vt = np.linalg.svd(centered, full_matrices=False)
        coord = vt[0]
    elif sort_by == "mds":
        # classical MDS: double-centre the squared-distance matrix
        # between measure columns, top eigenvector = 1-d embedding
        sq = ((x[:, :, None] - x[:, None, :]) ** 2).sum(axis=0)
        n = len(measures)
        j = np.eye(n) - np.full((n, n), 1.0 / n)
        b = -0.5 * j @ sq @ j
        vals, vecs = np.linalg.eigh(b)
        coord = vecs[:, np.argmax(vals)]
    else:
        raise ValueError(f"unknown sort_by: {sort_by!r}")
    if coord[np.argmax(np.abs(coord))] < 0:
        coord = -coord
    return [measures[i] for i in np.argsort(coord, kind="stable")]


def compare_measures_data(scores_by_measure: dict,
                          sort_by: str = "none",
                          label_map: dict | None = None) -> dict:
    """The data side of CompareMeasures' plot output (reference
    summary.py:734-806): per-metric correlation MATRICES (symmetric,
    unit diagonal, measures ordered per :func:`order_measures`), the
    quartile SPREAD payload of its boxplot, and the raw score vectors
    its violin plot draws from.  Rendering lives in
    :mod:`neleval_spark.figures` (SVG, no matplotlib)."""
    measures = order_measures(scores_by_measure, sort_by)
    full = compare_measures_full(scores_by_measure)
    corr = full["correlations"]

    def _cell(m1, m2, metric):
        if m1 == m2:
            return 1.0
        pair = corr.get((m1, m2)) or corr[(m2, m1)]
        return pair[metric]

    label_map = label_map or {}
    return {
        "measures": measures,
        "labels": [label_map.get(m, m) for m in measures],
        "matrices": {
            metric: [[_cell(m1, m2, metric) for m2 in measures]
                     for m1 in measures]
            for metric in ("pearson", "spearman", "kendall")
        },
        "spread": {m: list(full["quartiles"][m]) for m in measures},
        "scores": {m: [float(v) for v in scores_by_measure[m]]
                   for m in measures},
    }


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
                      secondary: str = "markers",
                      metrics: tuple | None = None,
                      label_map: dict | None = None,
                      anon: bool = False) -> list[dict]:
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

    Display options (reference add_arguments, summary.py:604-650):
    ``metrics`` — the ``--pr`` / ``--prf`` / ``--recall-only``
    metric-set selectors; one figure list per metric, each payload
    tagged with its ``metric`` (the reference overlays them as
    series; the payload keeps them separable).  ``label_map`` — the
    ``--label-map`` display renames; every point (and heatmap
    row/column list) gains a ``label``.  ``anon`` — ``--anon`` hides
    system names (their labels become empty; measure labels are kept,
    matching the reference, which blanks only system ticks).
    """
    if metrics is not None:
        out = []
        for mt in metrics:
            for fig in plot_systems_data(
                    results, measures, metric=mt, group_re=group_re,
                    best_in_group=best_in_group, sort_by=sort_by,
                    at_most=at_most, figures_by=figures_by,
                    secondary=secondary, label_map=label_map,
                    anon=anon):
                fig = dict(fig)
                fig["metric"] = mt
                if len(metrics) > 1:
                    fig["figure"] = f"{fig['figure']}-{mt}"
                out.append(fig)
        return out

    label_map = label_map or {}

    def _label(name, is_system):
        if anon and is_system:
            return ""
        return label_map.get(name, name)

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
        p["label"] = (_label(measure, False) if figures_by == "system"
                      else _label(system, True))
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
        rows_are_systems = figures_by == "system"
        return [{
            "figure": "heatmap", "secondary": "heatmap",
            "rows": list(rows), "columns": list(col_order),
            "row_labels": [_label(r, rows_are_systems) for r in rows],
            "col_labels": [_label(c, not rows_are_systems)
                           for c in col_order],
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
