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


# ---- CompareMeasures plot family + PlotSystems display options ----

def _scores3():
    # m_hi and m_hi2 move together across systems; m_anti moves the
    # opposite way -> any sensible 1-d embedding puts m_anti at an end
    return {
        "m_hi": [0.90, 0.70, 0.50, 0.30],
        "m_anti": [0.20, 0.40, 0.60, 0.80],
        "m_hi2": [0.85, 0.66, 0.48, 0.28],
    }


def test_order_measures_eigen_mds_deterministic():
    from neleval_spark.summary import order_measures

    scores = _scores3()
    assert order_measures(scores, "none") == list(scores)
    assert order_measures(scores, "name") == ["m_anti", "m_hi",
                                              "m_hi2"]
    for sort_by in ("eigen", "mds"):
        order = order_measures(scores, sort_by)
        # correlated pair adjacent, anti-correlated at an end
        assert order.index("m_anti") in (0, 2), (sort_by, order)
        assert abs(order.index("m_hi") - order.index("m_hi2")) == 1
        # deterministic across calls (fixed eigenvector sign)
        assert order == order_measures(scores, sort_by)


def test_compare_measures_data_matrices():
    from neleval_spark.summary import compare_measures_data

    data = compare_measures_data(_scores3(), sort_by="name",
                                 label_map={"m_hi": "High"})
    assert data["measures"] == ["m_anti", "m_hi", "m_hi2"]
    assert data["labels"] == ["m_anti", "High", "m_hi2"]
    for metric, mat in data["matrices"].items():
        n = len(mat)
        for i in range(n):
            assert mat[i][i] == 1.0
            for j in range(n):
                assert mat[i][j] == mat[j][i], metric
    # anti-correlation shows up signed
    i, j = 0, 1  # m_anti vs m_hi
    assert data["matrices"]["pearson"][i][j] < -0.99
    assert len(data["spread"]["m_hi"]) == 5
    assert data["scores"]["m_anti"] == [0.20, 0.40, 0.60, 0.80]


def test_render_compare_measures_svgs():
    import xml.dom.minidom as minidom

    from neleval_spark.figures import render_compare_measures_svgs
    from neleval_spark.summary import compare_measures_data

    data = compare_measures_data(_scores3(), sort_by="eigen")
    svgs = render_compare_measures_svgs(data)
    assert sorted(svgs) == ["kendall", "pearson", "spearman",
                            "spread", "violin"]
    for name, svg in svgs.items():
        minidom.parseString(svg)
        assert "m_anti" in svg, name
    # unit diagonal renders the rdbu blue pole
    assert "rgb(33,102,172)" in svgs["pearson"]
    assert svgs["violin"].count("<polygon") == 3
    # one box rect per measure (plus no others)
    assert svgs["spread"].count("<rect") == 3


def test_corr_matrix_nan_masked_white():
    import xml.dom.minidom as minidom

    from neleval_spark.figures import render_corr_matrix_svg
    from neleval_spark.summary import compare_measures_data

    data = compare_measures_data({"flat": [0.5, 0.5, 0.5],
                                  "vary": [0.1, 0.5, 0.9]})
    svg = render_corr_matrix_svg(data, "pearson")
    minidom.parseString(svg)
    assert "fill=\"#fff\" stroke=\"#ddd\"" in svg  # masked NaN cell
    assert "nan" not in svg


def test_plot_systems_metrics_label_map_anon():
    from neleval_spark.summary import plot_systems_data

    results = {
        "sysA": {"m": {"precision": 0.8, "recall": 0.6,
                       "fscore": 0.69}},
        "sysB": {"m": {"precision": 0.5, "recall": 0.9,
                       "fscore": 0.64}},
    }
    figs = plot_systems_data(results, ["m"],
                             metrics=("precision", "recall"),
                             label_map={"sysA": "Alpha"})
    assert [f["figure"] for f in figs] == ["m-precision", "m-recall"]
    assert [f["metric"] for f in figs] == ["precision", "recall"]
    assert figs[0]["points"][0]["score"] == 0.8
    assert figs[1]["points"][1]["score"] == 0.9
    assert figs[0]["points"][0]["label"] == "Alpha"
    assert figs[0]["points"][1]["label"] == "sysB"
    # anon blanks system labels but keeps measure labels
    figs = plot_systems_data(results, ["m"], anon=True)
    assert all(p["label"] == "" for p in figs[0]["points"])
    figs = plot_systems_data(results, ["m"], figures_by="system",
                             anon=True)
    assert [p["label"] for p in figs[0]["points"]] == ["m"]
    # heatmap payload carries display label lists
    figs = plot_systems_data(results, ["m"], secondary="heatmap",
                             label_map={"sysA": "Alpha"})
    assert figs[0]["col_labels"] == ["Alpha", "sysB"]
    assert figs[0]["row_labels"] == ["m"]


def test_score_dots_lines_and_limits():
    import xml.dom.minidom as minidom

    from neleval_spark.figures import render_score_dots_svg

    fig = {"figure": "fscore", "points": [
        {"system": "a", "score": 0.60},
        {"system": "b", "score": 0.80},
    ]}
    plain = render_score_dots_svg(fig)
    lined = render_score_dots_svg(fig, lines=True)
    assert "<polyline" not in plain and "<polyline" in lined
    zoom = render_score_dots_svg(fig, limits=(0.5, 1.0))
    minidom.parseString(zoom)
    assert ">0.50<" in zoom and ">0.00<" not in zoom
    # 0.6 sits at 20% of a 0.5-1.0 axis vs 60% of 0-1
    def _cx(svg):
        return float(svg.split("<circle cx=\"")[1].split("\"")[0])
    assert _cx(zoom) < _cx(plain)


def test_cli_compare_measures_plot(spark, capsys, tmp_path):
    """--fmt plot writes the five CompareMeasures artifacts."""
    import os
    import xml.dom.minidom as minidom

    import pytest

    if not os.path.isdir(EXAMPLES):
        pytest.skip("reference fixtures not present")
    from tests.test_cli import _run

    gold_path = os.path.join(EXAMPLES, "tac_gold.combined.tsv")
    sys_path = os.path.join(EXAMPLES, "tac_system.combined.tsv")
    paths = []
    for name, src in [("run1", sys_path), ("gold", gold_path)]:
        out = _run(capsys, "evaluate", src, "-g", gold_path,
                   "-m", "strong_link_match", "-m",
                   "strong_all_match", "-m", "entity_match")
        p = tmp_path / f"{name}.eval"
        p.write_text(out)
        paths.append(str(p))
    fmt = str(tmp_path / "cmp_{name}.svg")
    _run(capsys, "compare-measures", *paths,
         "-m", "strong_link_match", "-m", "strong_all_match",
         "-m", "entity_match", "--fmt", "plot", "--sort-by", "name",
         "-o", fmt)
    for name in ("pearson", "spearman", "kendall", "spread",
                 "violin"):
        path = str(tmp_path / f"cmp_{name}.svg")
        assert os.path.exists(path), name
        with open(path) as f:
            minidom.parseString(f.read())
