"""Measure catalog — a verbatim reproduction of the reference's measure
names and semantics (neleval/configs.py:12-136); measure names are API.

A measure is a *query spec*, not data: ``(key, filter, agg, weighting)``
drives a generated DataFrame plan (reference class: Measure,
neleval/annotation.py:238-296).
"""

from __future__ import annotations

from dataclasses import dataclass, field


NON_CLUSTERING_AGG = ("sets",) + tuple(
    f"overlap-{p1}{p2}" for p1 in ("sum", "max") for p2 in ("sum", "max")
)

CLUSTERING_AGGS = {
    "muc", "b_cubed", "pairwise", "pairwise_negative",
    "mention_ceaf", "entity_ceaf",
}


@dataclass(frozen=True)
class MeasureSpec:
    key: tuple[str, ...]
    filter: str | None = None
    agg: str = "sets"
    weighting: dict | None = field(default=None, compare=False, hash=False)

    def __post_init__(self):
        if self.agg != "sets" and self.weighting:
            raise NotImplementedError(
                "weighting is only implemented for aggregate='sets'")

    @property
    def is_clustering(self) -> bool:
        return self.agg not in NON_CLUSTERING_AGG

    def with_weighting(self, weighting):
        return MeasureSpec(self.key, self.filter, self.agg, weighting)

    def __str__(self):
        return "{}:{}:{}".format(self.agg, self.filter, "+".join(self.key))

    @classmethod
    def from_string(cls, s: str, weighting=None) -> "MeasureSpec":
        if s.count(":") != 2:
            raise ValueError(f"Expected 2 colons in {s!r}")
        a, f, k = s.split(":")
        if f in ("", "None"):
            f = None
        return cls(tuple(k.split("+")), f, a, weighting)


def _m(key, filter=None, agg="sets"):
    return MeasureSpec(tuple(key), filter, agg)


# neleval/configs.py:12-41 verbatim
MEASURES: dict[str, MeasureSpec] = {
    # Mention evaluation measures
    "strong_mention_match":        _m(["span"]),
    "strong_typed_mention_match":  _m(["span", "type"]),
    "strong_linked_mention_match": _m(["span"], "is_linked"),
    # Linking evaluation measures
    "strong_link_match":           _m(["span", "kbid"], "is_linked"),
    "strong_nil_match":            _m(["span"], "is_nil"),
    "strong_all_match":            _m(["span", "kbid"]),
    "strong_typed_link_match":     _m(["span", "type", "kbid"], "is_linked"),
    "strong_typed_nil_match":      _m(["span", "type"], "is_nil"),
    "strong_typed_all_match":      _m(["span", "type", "kbid"]),
    # Document-level tagging evaluation measures
    "entity_match":                _m(["docid", "kbid"], "is_linked"),
    # Clustering evaluation measures
    "muc":                         _m(["span"], agg="muc"),
    "b_cubed":                     _m(["span"], agg="b_cubed"),
    "b_cubed_plus":                _m(["span", "kbid"], agg="b_cubed"),
    "entity_ceaf":                 _m(["span"], agg="entity_ceaf"),
    "mention_ceaf":                _m(["span"], agg="mention_ceaf"),
    "mention_ceaf_plus":           _m(["span", "kbid"], agg="mention_ceaf"),
    "typed_mention_ceaf":          _m(["span", "type"], agg="mention_ceaf"),
    "typed_mention_ceaf_plus":     _m(["span", "type", "kbid"], agg="mention_ceaf"),
    "pairwise":                    _m(["span"], agg="pairwise"),
}

# neleval/configs.py:57-136
MEASURE_SETS: dict[str, list] = {
    "all": ["all-tagging", "all-coref"],
    "all-tagging": sorted({
        "strong_mention_match",
        "strong_typed_mention_match",
        "strong_linked_mention_match",
        "strong_link_match",
        "strong_nil_match",
        "strong_all_match",
        "strong_typed_link_match",
        "strong_typed_nil_match",
        "strong_typed_all_match",
        "entity_match",
    }),
    "all-coref": sorted({
        "mention_ceaf",
        "entity_ceaf",
        "b_cubed",
        "pairwise",
        "muc",
        "b_cubed_plus",
        "typed_mention_ceaf",
        "mention_ceaf_plus",
        "typed_mention_ceaf_plus",
    }),
    "cornolti": ["strong_linked_mention_match", "strong_link_match",
                 "entity_match"],
    "hachey": ["strong_mention_match", "strong_linked_mention_match",
               "strong_link_match", "entity_match"],
    "luo": ["muc", "b_cubed", "mention_ceaf", "entity_ceaf"],
    "tac09": ["strong_link_match", "strong_nil_match", "strong_all_match"],
    "tac11": ["tac09", "b_cubed", "b_cubed_plus"],
    "tac14": ["tac11", "strong_mention_match", "strong_typed_mention_match",
              "strong_typed_all_match", "mention_ceaf",
              "typed_mention_ceaf"],
    "tmp": ["mention_ceaf", "entity_ceaf", "pairwise"],
}

DEFAULT_MEASURE_SET = "all"
DEFAULT_MEASURE = "strong_all_match"


def _expand(measures):
    if isinstance(measures, str):
        if measures in MEASURE_SETS:
            measures = MEASURE_SETS[measures]
        else:
            return [measures]
    if isinstance(measures, MeasureSpec):
        return [measures]
    if len(measures) == 1:
        return _expand(measures[0])
    return [m for group in measures for m in _expand(group)]


def parse_measures(in_measures, incl_clustering: bool = True,
                   allow_unknown: bool = False) -> list[str]:
    """Expand group names, dedupe preserving order, validate
    (reference: neleval/configs.py:155-188; ``allow_unknown`` keeps
    unresolvable names, used when ranking over evaluation files that
    may carry composed measures)."""
    measures = _expand(in_measures)
    seen = set()
    measures = [seen.add(m) or m for m in measures if m not in seen]
    invalid = []
    for m in measures:
        if m in MEASURES:
            continue
        try:
            get_measure(m)
        except Exception:
            invalid.append(m)
    if invalid and not allow_unknown:
        raise ValueError(f"Could not resolve measures: {sorted(invalid)}")
    if not incl_clustering:
        measures = [m for m in measures if not get_measure(m).is_clustering]
    if not measures:
        raise ValueError(
            f"Could not resolve {in_measures!r} to any measures.")
    return measures


def get_measure(name, weighting=None) -> MeasureSpec:
    if isinstance(name, MeasureSpec):
        measure = name
    elif name.count(":") == 2:
        measure = MeasureSpec.from_string(name)
    else:
        measure = MEASURES[name]
    if weighting:
        return measure.with_weighting(weighting)
    return measure
