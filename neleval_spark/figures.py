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
"""

from __future__ import annotations

from xml.sax.saxutils import escape

FONT = "font-family=\"sans-serif\""


def _f(x: float) -> str:
    return f"{x:.2f}"


def _ramp(v: float) -> str:
    """score 0..1 → light→blue sequential fill (integer channels —
    deterministic everywhere)."""
    v = min(1.0, max(0.0, v))
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


def _axis_x(x0, x1, y, labels=True) -> list[str]:
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
                       f"{FONT}>{v:.2f}</text>")
    return out


def render_prf_scatter_svg(fig: dict, size: float = 420) -> str:
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
        label = p.get("system", p.get("measure", ""))
        body.append(f"<circle cx=\"{_f(x)}\" cy=\"{_f(y)}\" r=\"4\" "
                    f"fill=\"{_ramp(p['score'])}\" stroke=\"#333\"/>")
        body.append(f"<text x=\"{_f(x + 6)}\" y=\"{_f(y + 3)}\" "
                    f"font-size=\"9\" {FONT}>{escape(label)}</text>")
    return _svg(size, size, body, fig.get("figure", ""))


def render_score_dots_svg(fig: dict, width: float = 560) -> str:
    """1-d score dot plot, one labeled row per point; lo/hi interval
    whiskers when present."""
    pts = fig["points"]
    lm, rm, top, row = 170.0, 30.0, 34.0, 22.0
    plot = width - lm - rm
    height = top + row * len(pts) + 30
    y_axis = top + row * len(pts) + 4
    body = _axis_x(lm, lm + plot, y_axis)
    for i, p in enumerate(pts):
        y = top + row * i + row / 2
        label = p.get("system", p.get("measure", ""))
        body.append(f"<text x=\"{_f(lm - 8)}\" y=\"{_f(y + 3)}\" "
                    f"text-anchor=\"end\" font-size=\"10\" {FONT}>"
                    f"{escape(label)}</text>")
        if "lo" in p and "hi" in p:
            xl = lm + p["lo"] * plot
            xh = lm + p["hi"] * plot
            body.append(f"<line x1=\"{_f(xl)}\" y1=\"{_f(y)}\" "
                        f"x2=\"{_f(xh)}\" y2=\"{_f(y)}\" "
                        f"stroke=\"#888\" stroke-width=\"2\"/>")
            for xe in (xl, xh):
                body.append(f"<line x1=\"{_f(xe)}\" y1=\"{_f(y - 4)}\" "
                            f"x2=\"{_f(xe)}\" y2=\"{_f(y + 4)}\" "
                            f"stroke=\"#888\"/>")
        x = lm + p["score"] * plot
        body.append(f"<circle cx=\"{_f(x)}\" cy=\"{_f(y)}\" r=\"4\" "
                    f"fill=\"{_ramp(p['score'])}\" stroke=\"#333\"/>")
    return _svg(width, height, body, fig.get("figure", ""))


def render_heatmap_svg(fig: dict, cell: float = 56) -> str:
    """Score-matrix heatmap with row/column labels and in-cell
    values on the sequential ramp."""
    rows, cols = fig["rows"], fig["columns"]
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
            body.append(
                f"<rect x=\"{_f(x)}\" y=\"{_f(y)}\" "
                f"width=\"{_f(cell)}\" height=\"{_f(ch)}\" "
                f"fill=\"{_ramp(v)}\" stroke=\"#fff\"/>")
            tcol = "#000" if v < 0.6 else "#fff"
            body.append(
                f"<text x=\"{_f(x + cell / 2)}\" y=\"{_f(y + ch / 2 + 3)}\" "
                f"text-anchor=\"middle\" font-size=\"9\" fill=\"{tcol}\" "
                f"{FONT}>{v:.3f}</text>")
    return _svg(width, height, body, fig.get("figure", "heatmap"))


def render_figure_svg(fig: dict) -> str:
    """Dispatch on the payload shape (see module docstring)."""
    if fig.get("secondary") == "heatmap":
        return render_heatmap_svg(fig)
    pts = fig.get("points", [])
    if pts and all("prf" in p for p in pts):
        return render_prf_scatter_svg(fig)
    return render_score_dots_svg(fig)
