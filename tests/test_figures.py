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


def test_group_ordering_and_at_most_groups():
    """Reference _regroup parity (summary.py:280-301): with group_re,
    points order BY GROUP (name- or best-score-sorted), systems
    name-sorted within, and at_most truncates GROUPS not points."""
    import re

    from neleval_spark.summary import plot_systems_data

    results = {
        "teamB-run2": {"m": {"fscore": 0.60}},
        "teamA-run1": {"m": {"fscore": 0.55}},
        "teamB-run1": {"m": {"fscore": 0.90}},
        "teamC-run1": {"m": {"fscore": 0.70}},
        "teamA-run2": {"m": {"fscore": 0.80}},
    }
    gre = re.compile(r"^team[A-Z]")
    figs = plot_systems_data(results, ["m"], group_re=gre)
    order = [(p["group"], p["system"]) for p in figs[0]["points"]]
    assert order == [("teamA", "teamA-run1"), ("teamA", "teamA-run2"),
                     ("teamB", "teamB-run1"), ("teamB", "teamB-run2"),
                     ("teamC", "teamC-run1")]
    # sort_by=score orders groups by their best score
    figs = plot_systems_data(results, ["m"], group_re=gre,
                             sort_by="score")
    assert [p["group"] for p in figs[0]["points"]] == \
        ["teamB", "teamB", "teamA", "teamA", "teamC"]
    # at_most keeps whole groups (2 groups -> 4 points, not 2 points)
    figs = plot_systems_data(results, ["m"], group_re=gre,
                             sort_by="score", at_most=2)
    assert [(p["group"], p["system"]) for p in figs[0]["points"]] == \
        [("teamB", "teamB-run1"), ("teamB", "teamB-run2"),
         ("teamA", "teamA-run1"), ("teamA", "teamA-run2")]
    # best_in_group + group ordering compose
    figs = plot_systems_data(results, ["m"], group_re=gre,
                             best_in_group=True, sort_by="score")
    assert [(p["system"], p["score"]) for p in figs[0]["points"]] == \
        [("teamB-run1", 0.90), ("teamA-run2", 0.80),
         ("teamC-run1", 0.70)]
    # heatmap columns follow the same group selection
    figs = plot_systems_data(results, ["m"], group_re=gre,
                             sort_by="score", at_most=1,
                             secondary="heatmap")
    assert figs[0]["columns"] == ["teamB-run1", "teamB-run2"]
    assert figs[0]["matrix"] == [[0.90, 0.60]]
