"""Dependency-free SVG rendering of ``plot_systems_data`` payloads.

The reference renders PlotSystems figures through a ~500-line
matplotlib layer (reference summary.py:116-654); this container ships
no matplotlib, so the semantic half lives in
:func:`neleval_spark.summary.plot_systems_data` and THIS module turns
its payloads into real image artifacts with nothing but string
building — deterministic output (fixed 2-dp coordinate formatting, no
randomness), suitable for golden-file tests.

Three renderers cover the reference's figure families:

* ``prf scatter``  — points carry ``prf`` triples: the recall (x) ×
  precision (y) scatter of the reference's markers branch
  (summary.py:530-546);
* ``score dots``   — 1-d score plot with optional lo/hi interval
  whiskers (the errorbar data of _plot, :178-203);
* ``heatmap``      — the score matrix of _heatmap (:464-493) on a
  light→blue sequential ramp with in-cell values.

Plus the CompareMeasures plot family (reference plot_format,
summary.py:734-806): per-metric correlation matrices on a diverging
ramp, the quartile-spread boxplot and a fixed-bin violin — see
:func:`render_compare_measures_svgs`.
"""

from __future__ import annotations

from xml.sax.saxutils import escape

FONT = "font-family=\"sans-serif\""


def _f(x: float) -> str:
    return f"{x:.2f}"


def _ramp(v: float, cmap: str = "blues") -> str:
    """score 0..1 → fill colour (integer channels — deterministic
    everywhere).  ``'blues'`` is the light→blue sequential default;
    ``'rdbu'`` is a red→white→blue diverging ramp (0.5 = white) for
    signed data such as correlations — the reference's ``--cmap``
    knob (summary.py:612) reduced to the two families its figures
    actually use."""
    v = min(1.0, max(0.0, v))
    if cmap == "rdbu":
        if v < 0.5:
            t = v * 2
            r, g, b = (round(178 + 69 * t), round(24 + 223 * t),
                       round(43 + 204 * t))
        else:
            t = (v - 0.5) * 2
            r, g, b = (round(247 - 214 * t), round(247 - 145 * t),
                       round(247 - 75 * t))
        return f"rgb({r},{g},{b})"
    if cmap != "blues":
        raise ValueError(f"unknown cmap: {cmap!r} "
                         "(supported: blues, rdbu)")
    r = round(247 - 215 * v)
    g = round(251 - 108 * v)
    b = round(255 - 71 * v)
    return f"rgb({r},{g},{b})"


def _svg(width: float, height: float, body: list[str],
         title: str) -> str:
    head = (
        f"<svg xmlns=\"http://www.w3.org/2000/svg\" "
        f"width=\"{_f(width)}\" height=\"{_f(height)}\" "
        f"viewBox=\"0 0 {_f(width)} {_f(height)}\">\n"
        f"<text x=\"{_f(width / 2)}\" y=\"18\" text-anchor=\"middle\" "
        f"font-size=\"14\" {FONT}>{escape(title)}</text>\n")
    return head + "\n".join(body) + "\n</svg>\n"


def _axis_x(x0, x1, y, labels=True, lo=0.0, hi=1.0) -> list[str]:
    out = [f"<line x1=\"{_f(x0)}\" y1=\"{_f(y)}\" x2=\"{_f(x1)}\" "
           f"y2=\"{_f(y)}\" stroke=\"#333\"/>"]
    for i in range(5):
        v = i / 4
        x = x0 + v * (x1 - x0)
        out.append(f"<line x1=\"{_f(x)}\" y1=\"{_f(y)}\" "
                   f"x2=\"{_f(x)}\" y2=\"{_f(y + 4)}\" "
                   f"stroke=\"#333\"/>")
        if labels:
            out.append(f"<text x=\"{_f(x)}\" y=\"{_f(y + 16)}\" "
                       f"text-anchor=\"middle\" font-size=\"10\" "
                       f"{FONT}>{lo + v * (hi - lo):.2f}</text>")
    return out


def _point_label(p: dict) -> str:
    """Display label: ``label`` when plot_systems_data attached one
    (label-map / anon aware), else the raw system/measure name."""
    if "label" in p:
        return p["label"]
    return p.get("system", p.get("measure", ""))


def render_prf_scatter_svg(fig: dict, size: float = 420,
                           cmap: str = "blues") -> str:
    """Recall (x) × precision (y) scatter; every point must carry a
    ``prf`` triple [precision, recall, fscore]."""
    m, plot = 60.0, size - 90.0
    x0, y0 = m, size - m  # origin (0,0) bottom-left
    body = _axis_x(x0, x0 + plot, y0)
    body.append(f"<line x1=\"{_f(x0)}\" y1=\"{_f(y0)}\" "
                f"x2=\"{_f(x0)}\" y2=\"{_f(y0 - plot)}\" "
                f"stroke=\"#333\"/>")
    for i in range(5):
        v = i / 4
        y = y0 - v * plot
        body.append(f"<line x1=\"{_f(x0 - 4)}\" y1=\"{_f(y)}\" "
                    f"x2=\"{_f(x0)}\" y2=\"{_f(y)}\" stroke=\"#333\"/>")
        body.append(f"<text x=\"{_f(x0 - 8)}\" y=\"{_f(y + 3)}\" "
                    f"text-anchor=\"end\" font-size=\"10\" {FONT}>"
                    f"{v:.2f}</text>")
    body.append(f"<text x=\"{_f(x0 + plot / 2)}\" y=\"{_f(size - 14)}\" "
                f"text-anchor=\"middle\" font-size=\"11\" {FONT}>"
                f"recall</text>")
    body.append(f"<text x=\"16\" y=\"{_f(y0 - plot / 2)}\" "
                f"text-anchor=\"middle\" font-size=\"11\" {FONT} "
                f"transform=\"rotate(-90 16 {_f(y0 - plot / 2)})\">"
                f"precision</text>")
    for p in fig["points"]:
        prec, rec, _ = p["prf"]
        x = x0 + rec * plot
        y = y0 - prec * plot
        label = _point_label(p)
        body.append(f"<circle cx=\"{_f(x)}\" cy=\"{_f(y)}\" r=\"4\" "
                    f"fill=\"{_ramp(p['score'], cmap)}\" "
                    f"stroke=\"#333\"/>")
        body.append(f"<text x=\"{_f(x + 6)}\" y=\"{_f(y + 3)}\" "
                    f"font-size=\"9\" {FONT}>{escape(label)}</text>")
    return _svg(size, size, body, fig.get("figure", ""))


def render_score_dots_svg(fig: dict, width: float = 560,
                          lines: bool = False,
                          limits: tuple = (0.0, 1.0),
                          cmap: str = "blues") -> str:
    """1-d score dot plot, one labeled row per point; lo/hi interval
    whiskers when present.  ``lines`` joins consecutive dots (the
    reference's ``--lines``, useful when systems form a series);
    ``limits`` rescales the score axis (``--limits``)."""
    pts = fig["points"]
    lo_ax, hi_ax = limits
    span = (hi_ax - lo_ax) or 1.0

    def _x(v):
        return lm + max(0.0, min(1.0, (v - lo_ax) / span)) * plot

    lm, rm, top, row = 170.0, 30.0, 34.0, 22.0
    plot = width - lm - rm
    height = top + row * len(pts) + 30
    y_axis = top + row * len(pts) + 4
    body = _axis_x(lm, lm + plot, y_axis, lo=lo_ax, hi=hi_ax)
    if lines and len(pts) > 1:
        path = " ".join(f"{_f(_x(p['score']))},"
                        f"{_f(top + row * i + row / 2)}"
                        for i, p in enumerate(pts))
        body.append(f"<polyline points=\"{path}\" fill=\"none\" "
                    f"stroke=\"#999\" stroke-width=\"1.5\"/>")
    for i, p in enumerate(pts):
        y = top + row * i + row / 2
        label = _point_label(p)
        body.append(f"<text x=\"{_f(lm - 8)}\" y=\"{_f(y + 3)}\" "
                    f"text-anchor=\"end\" font-size=\"10\" {FONT}>"
                    f"{escape(label)}</text>")
        if "lo" in p and "hi" in p:
            xl = _x(p["lo"])
            xh = _x(p["hi"])
            body.append(f"<line x1=\"{_f(xl)}\" y1=\"{_f(y)}\" "
                        f"x2=\"{_f(xh)}\" y2=\"{_f(y)}\" "
                        f"stroke=\"#888\" stroke-width=\"2\"/>")
            for xe in (xl, xh):
                body.append(f"<line x1=\"{_f(xe)}\" y1=\"{_f(y - 4)}\" "
                            f"x2=\"{_f(xe)}\" y2=\"{_f(y + 4)}\" "
                            f"stroke=\"#888\"/>")
        x = _x(p["score"])
        body.append(f"<circle cx=\"{_f(x)}\" cy=\"{_f(y)}\" r=\"4\" "
                    f"fill=\"{_ramp(p['score'], cmap)}\" "
                    f"stroke=\"#333\"/>")
    return _svg(width, height, body, fig.get("figure", ""))


def render_heatmap_svg(fig: dict, cell: float = 56,
                       cmap: str = "blues", vmin: float = 0.0,
                       vmax: float = 1.0) -> str:
    """Score-matrix heatmap with row/column labels and in-cell
    values.  ``vmin``/``vmax`` set the colour scale (e.g. -1..1 with
    ``cmap='rdbu'`` for correlation matrices); display names come
    from ``row_labels``/``col_labels`` when present."""
    rows = fig.get("row_labels", fig["rows"])
    cols = fig.get("col_labels", fig["columns"])
    vspan = (vmax - vmin) or 1.0
    lm, top = 150.0, 40.0
    ch = 24.0
    width = lm + cell * len(cols) + 20
    height = top + ch * len(rows) + 70
    body = []
    for j, c in enumerate(cols):
        x = lm + cell * j + cell / 2
        y = top + ch * len(rows) + 12
        body.append(f"<text x=\"{_f(x)}\" y=\"{_f(y)}\" "
                    f"text-anchor=\"end\" font-size=\"9\" {FONT} "
                    f"transform=\"rotate(-45 {_f(x)} {_f(y)})\">"
                    f"{escape(str(c))}</text>")
    for i, r in enumerate(rows):
        y = top + ch * i
        body.append(f"<text x=\"{_f(lm - 6)}\" y=\"{_f(y + ch / 2 + 3)}\" "
                    f"text-anchor=\"end\" font-size=\"10\" {FONT}>"
                    f"{escape(str(r))}</text>")
        for j in range(len(cols)):
            v = fig["matrix"][i][j]
            x = lm + cell * j
            if v != v:  # NaN (zero-variance input): masked white,
                # as the reference's cmap.set_bad('white')
                body.append(
                    f"<rect x=\"{_f(x)}\" y=\"{_f(y)}\" "
                    f"width=\"{_f(cell)}\" height=\"{_f(ch)}\" "
                    f"fill=\"#fff\" stroke=\"#ddd\"/>")
                continue
            frac = (v - vmin) / vspan
            body.append(
                f"<rect x=\"{_f(x)}\" y=\"{_f(y)}\" "
                f"width=\"{_f(cell)}\" height=\"{_f(ch)}\" "
                f"fill=\"{_ramp(frac, cmap)}\" stroke=\"#fff\"/>")
            dark = (frac >= 0.6 if cmap == "blues"
                    else abs(frac - 0.5) >= 0.35)
            tcol = "#fff" if dark else "#000"
            body.append(
                f"<text x=\"{_f(x + cell / 2)}\" y=\"{_f(y + ch / 2 + 3)}\" "
                f"text-anchor=\"middle\" font-size=\"9\" fill=\"{tcol}\" "
                f"{FONT}>{v:.3f}</text>")
    return _svg(width, height, body, fig.get("figure", "heatmap"))


def render_corr_matrix_svg(data: dict, metric: str = "pearson",
                           cell: float = 56) -> str:
    """Correlation-matrix heatmap for one metric of a
    :func:`neleval_spark.summary.compare_measures_data` payload —
    the reference CompareMeasures plot_format's imshow per metric
    (summary.py:770-789), on the diverging ramp over [-1, 1]."""
    labels = data["labels"]
    fig = {"figure": f"measure correlation ({metric})",
           "rows": labels, "columns": labels,
           "matrix": data["matrices"][metric]}
    return render_heatmap_svg(fig, cell=cell, cmap="rdbu",
                              vmin=-1.0, vmax=1.0)


def render_spread_svg(data: dict, width: float = 560,
                      limits: tuple = (0.0, 1.0)) -> str:
    """Horizontal boxplot of each measure's per-system score spread
    (reference plot_format's ``ax.boxplot``, summary.py:791-796):
    min–max whisker, q1–q3 box, median tick, from the payload's
    ``spread`` quartiles."""
    measures = data["measures"]
    labels = data["labels"]
    lo_ax, hi_ax = limits
    span = (hi_ax - lo_ax) or 1.0
    lm, rm, top, row = 170.0, 30.0, 34.0, 26.0
    plot = width - lm - rm

    def _x(v):
        return lm + max(0.0, min(1.0, (v - lo_ax) / span)) * plot

    height = top + row * len(measures) + 30
    body = _axis_x(lm, lm + plot, top + row * len(measures) + 4,
                   lo=lo_ax, hi=hi_ax)
    for i, m in enumerate(measures):
        mn, q1, med, q3, mx = data["spread"][m]
        y = top + row * i + row / 2
        body.append(f"<text x=\"{_f(lm - 8)}\" y=\"{_f(y + 3)}\" "
                    f"text-anchor=\"end\" font-size=\"10\" {FONT}>"
                    f"{escape(labels[i])}</text>")
        body.append(f"<line x1=\"{_f(_x(mn))}\" y1=\"{_f(y)}\" "
                    f"x2=\"{_f(_x(mx))}\" y2=\"{_f(y)}\" "
                    f"stroke=\"#888\"/>")
        for xe in (mn, mx):
            body.append(f"<line x1=\"{_f(_x(xe))}\" y1=\"{_f(y - 5)}\" "
                        f"x2=\"{_f(_x(xe))}\" y2=\"{_f(y + 5)}\" "
                        f"stroke=\"#888\"/>")
        body.append(f"<rect x=\"{_f(_x(q1))}\" y=\"{_f(y - 7)}\" "
                    f"width=\"{_f(max(_x(q3) - _x(q1), 1.0))}\" "
                    f"height=\"14\" fill=\"{_ramp(med)}\" "
                    f"stroke=\"#333\"/>")
        body.append(f"<line x1=\"{_f(_x(med))}\" y1=\"{_f(y - 7)}\" "
                    f"x2=\"{_f(_x(med))}\" y2=\"{_f(y + 7)}\" "
                    f"stroke=\"#000\" stroke-width=\"2\"/>")
    return _svg(width, height, body, "measure spread")


def render_violin_svg(data: dict, width: float = 560,
                      bins: int = 12,
                      limits: tuple = (0.0, 1.0)) -> str:
    """Violin plot of each measure's score distribution (reference
    plot_format's ``ax.violinplot``, summary.py:798-804): a symmetric
    per-measure histogram profile (deterministic fixed-bin density —
    no KDE dependency) with a median tick."""
    measures = data["measures"]
    labels = data["labels"]
    lo_ax, hi_ax = limits
    span = (hi_ax - lo_ax) or 1.0
    lm, rm, top, row = 170.0, 30.0, 34.0, 30.0
    plot = width - lm - rm

    def _x(v):
        return lm + max(0.0, min(1.0, (v - lo_ax) / span)) * plot

    height = top + row * len(measures) + 30
    body = _axis_x(lm, lm + plot, top + row * len(measures) + 4,
                   lo=lo_ax, hi=hi_ax)
    half = row / 2 - 3
    for i, m in enumerate(measures):
        scores = data["scores"][m]
        y = top + row * i + row / 2
        body.append(f"<text x=\"{_f(lm - 8)}\" y=\"{_f(y + 3)}\" "
                    f"text-anchor=\"end\" font-size=\"10\" {FONT}>"
                    f"{escape(labels[i])}</text>")
        counts = [0] * bins
        for v in scores:
            frac = max(0.0, min(1.0, (v - lo_ax) / span))
            counts[min(bins - 1, int(frac * bins))] += 1
        peak = max(counts) or 1
        upper, lower = [], []
        for b in range(bins):
            xc = lm + (b + 0.5) / bins * plot
            h = half * counts[b] / peak
            upper.append(f"{_f(xc)},{_f(y - h)}")
            lower.append(f"{_f(xc)},{_f(y + h)}")
        pts = (f"{_f(lm)},{_f(y)} " + " ".join(upper)
               + f" {_f(lm + plot)},{_f(y)} "
               + " ".join(reversed(lower)))
        body.append(f"<polygon points=\"{pts}\" fill=\"#c6dbef\" "
                    f"stroke=\"#333\" stroke-width=\"0.8\"/>")
        med = sorted(scores)[len(scores) // 2] if scores else 0.0
        body.append(f"<line x1=\"{_f(_x(med))}\" y1=\"{_f(y - half)}\" "
                    f"x2=\"{_f(_x(med))}\" y2=\"{_f(y + half)}\" "
                    f"stroke=\"#000\" stroke-width=\"2\"/>")
    return _svg(width, height, body, "measure distributions")


def render_compare_measures_svgs(data: dict) -> dict:
    """All five CompareMeasures plot_format artifacts (reference
    summary.py:734-806): {name: svg} for pearson/spearman/kendall
    matrices plus spread and violin."""
    out = {metric: render_corr_matrix_svg(data, metric)
           for metric in ("pearson", "spearman", "kendall")}
    out["spread"] = render_spread_svg(data)
    out["violin"] = render_violin_svg(data)
    return out


def render_figure_svg(fig: dict, lines: bool = False,
                      cmap: str = "blues",
                      limits: tuple = (0.0, 1.0),
                      scale: float = 1.0) -> str:
    """Dispatch on the payload shape (see module docstring).
    ``lines``/``cmap``/``limits`` mirror the reference's --lines /
    --cmap / --limits; ``scale`` multiplies the base canvas size
    (the --figsize knob)."""
    sec = fig.get("secondary")
    if sec == "heatmap":
        return render_heatmap_svg(fig, cell=56 * scale, cmap=cmap)
    pts = fig.get("points", [])
    # the scatter needs prf triples AND a markers request — an
    # explicit --rows/--columns wins even when prf data is present
    # (the reference's mutually-exclusive --scatter/--rows/--columns)
    if pts and all("prf" in p for p in pts) and sec in (None,
                                                        "markers"):
        return render_prf_scatter_svg(fig, size=420 * scale,
                                      cmap=cmap)
    return render_score_dots_svg(fig, width=560 * scale,
                                 lines=lines, limits=limits,
                                 cmap=cmap)
