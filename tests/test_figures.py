"""Golden-SVG regression for the dependency-free figure renderer
(neleval_spark/figures.py): the three payload families of
plot_systems_data render byte-identically to the frozen fixtures
(deterministic 2-dp formatting), and the CLI writes real .svg
artifacts without matplotlib."""

import os
import xml.dom.minidom as minidom

FIX = os.path.join(os.path.dirname(__file__), "fixtures")

PRF_FIG = {
    "figure": "strong_all_match", "secondary": "markers", "points": [
        {"system": "sysA", "measure": "strong_all_match",
         "score": 0.82, "prf": [0.80, 0.84, 0.82]},
        {"system": "sysB", "measure": "strong_all_match",
         "score": 0.66, "prf": [0.70, 0.62, 0.66]},
        {"system": "sysC", "measure": "strong_all_match",
         "score": 0.91, "prf": [0.93, 0.89, 0.91]},
    ]}
CI_FIG = {
    "figure": "fscore", "secondary": "rows", "points": [
        {"system": "sysA", "measure": "strong_all_match",
         "score": 0.82, "lo": 0.75, "hi": 0.88},
        {"system": "sysB", "measure": "strong_all_match",
         "score": 0.66, "lo": 0.58, "hi": 0.73},
    ]}
HEATMAP_FIG = {
    "figure": "heatmap", "secondary": "heatmap",
    "rows": ["strong_all_match", "b_cubed", "muc"],
    "columns": ["sysA", "sysB"],
    "matrix": [[0.82, 0.66], [0.77, 0.59], [0.88, 0.71]]}


def _golden(fig, name):
    from neleval_spark.figures import render_figure_svg

    svg = render_figure_svg(fig)
    minidom.parseString(svg)  # well-formed XML
    with open(os.path.join(FIX, f"fig_{name}.svg")) as f:
        assert svg == f.read(), f"fig_{name}.svg drifted"
    return svg


def test_golden_prf_scatter():
    svg = _golden(PRF_FIG, "prf_scatter")
    assert svg.count("<circle") == 3
    assert "recall" in svg and "precision" in svg and "sysC" in svg


def test_golden_score_dots_ci():
    svg = _golden(CI_FIG, "score_dots_ci")
    assert svg.count("<circle") == 2
    # each interval renders a whisker line plus two end caps
    assert svg.count("stroke=\"#888\"") == 6


def test_golden_heatmap():
    svg = _golden(HEATMAP_FIG, "heatmap")
    assert svg.count("<rect") == 6
    assert "0.820" in svg and "0.590" in svg


EXAMPLES = "/root/reference/neleval/examples"


def test_cli_plot_systems_svg_output(spark, capsys, tmp_path):
    """--out-fmt '*.svg' writes real artifacts via the built-in
    renderer (no matplotlib in this container)."""
    import pytest

    if not os.path.isdir(EXAMPLES):
        pytest.skip("reference fixtures not present")
    from tests.test_cli import _run

    gold_path = os.path.join(EXAMPLES, "tac_gold.combined.tsv")
    sys_path = os.path.join(EXAMPLES, "tac_system.combined.tsv")
    out_a = _run(capsys, "evaluate", sys_path, "-g", gold_path,
                 "-m", "strong_link_match")
    fa = tmp_path / "teamX.run1.eval"
    fa.write_text(out_a)
    fmt = str(tmp_path / "fig_{name}.svg")
    _run(capsys, "plot-systems", str(fa), "-m", "strong_link_match",
         "--out-fmt", fmt)
    path = str(tmp_path / "fig_strong_link_match.svg")
    assert os.path.exists(path)
    with open(path) as f:
        svg = f.read()
    minidom.parseString(svg)
    # evaluate input carries prf triples -> recall/precision scatter
    assert "recall" in svg and "<circle" in svg
