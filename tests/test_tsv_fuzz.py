"""Hypothesis round-trip fuzz of the TSV annotation format: write →
read must preserve mentions exactly for every representable shape —
unicode surfaces, float scores (incl. integral and tiny values),
bare types, and multi-attr JSON candidates.  Shapes the format CANNOT
represent round-trip (score 0.0 renders '', reference
annotation.py:203) are excluded by the generator — that asymmetry is
pinned separately in test_sources_extra."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SAFE = st.text(
    alphabet=st.characters(
        codec="utf-8",
        # no tabs/newlines (field separators) and no surrogates
        exclude_characters="\t\n\r",
        exclude_categories=("Cs", "Cc")),
    min_size=1, max_size=8)

SCORES = st.floats(min_value=1e-6, max_value=1e6,
                   allow_nan=False, allow_infinity=False)


@st.composite
def _candidate(draw):
    eid = draw(SAFE)
    score = draw(SCORES)
    # a candidate with NO type and NO attrs renders an empty third
    # field, which the format cannot represent in trailing position
    # (the reference writer emits the same line its reader rejects) —
    # generate only representable shapes; a '{'-prefixed bare type
    # would read back as JSON attrs (reference from_string semantics)
    kind = draw(st.integers(1, 2))
    if kind == 1:
        type_, attrs = draw(SAFE.filter(
            lambda t: not t.startswith("{"))), None
    else:
        keys = draw(st.lists(
            SAFE.filter(lambda s: s != "type"),
            min_size=2, max_size=3, unique=True))
        attrs = {k: draw(st.one_of(st.none(), SAFE)) for k in keys}
        type_ = None
    return (eid, score, type_, attrs)


@st.composite
def _mention(draw):
    docid = draw(SAFE)
    start = draw(st.integers(0, 10_000))
    end = start + draw(st.integers(1, 50))
    cands = draw(st.lists(_candidate(), min_size=1, max_size=3))
    # distinct, descending scores: the reader re-sorts by -score, so
    # tie order would be ambiguous (covered by the fixture tests that
    # pin the reference's stable tie-break)
    scores = sorted({c[1] for c in cands}, reverse=True)
    if len(scores) < len(cands):
        return None
    cands = [(c[0], s, c[2], c[3])
             for c, s in zip(cands, scores)]
    return (docid, start, end, cands)


def _attrs_key(d):
    return (tuple(sorted(d.items(), key=lambda kv: kv[0]))
            if d is not None else None)


def _norm(row):
    return (row["docid"], row["start"], row["end"],
            tuple((c["eid"], c["score"], c["type"],
                   _attrs_key(c["attrs"]))
                  for c in row["candidates"]))


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(mentions=st.lists(_mention(), min_size=1, max_size=15))
def test_tsv_write_read_roundtrip(spark, tmp_path_factory, mentions):
    from pyspark.sql import functions as F

    from neleval_spark.operators.normalize import (
        derive_mention_columns, with_is_first)
    from neleval_spark.sources.tsv import (
        annotations_to_tsv_lines, read_annotations_tsv)

    mentions = [m for m in mentions if m is not None]
    # one mention per (docid, start, end): the format keys on spans
    seen, rows = set(), []
    for m in mentions:
        if m[:3] in seen:
            continue
        seen.add(m[:3])
        rows.append(m)
    if not rows:
        return

    schema = ("docid string, start long, end long, candidates "
              "array<struct<eid string, score double, type string, "
              "attrs map<string,string>>>")
    df = with_is_first(derive_mention_columns(
        spark.createDataFrame(rows, schema), sort=True))
    lines = [r["value"] for r in annotations_to_tsv_lines(df).collect()]

    p = tmp_path_factory.mktemp("tsvfuzz") / "ann.tsv"
    p.write_text("\n".join(lines) + "\n", encoding="utf-8")
    back = read_annotations_tsv(spark, str(p))

    # canonical in-memory form (reference Candidate, annotation.py):
    # a bare type is carried as attrs={'type': t} alongside the type
    # column — normalize the generated input to that shape
    want = {(_d, _s, _e,
             tuple((c[0], c[1], c[2],
                    _attrs_key({"type": c[2]} if c[3] is None else c[3]))
                   for c in _c))
            for _d, _s, _e, _c in rows}
    got = {_norm(r) for r in back.collect()}
    assert got == want


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(mentions=st.lists(_mention(), min_size=1, max_size=15))
def test_tsv_reader_matches_reference(spark, tmp_path_factory, mentions):
    """Cross-engine READER differential: the reference's
    ``Annotation.from_string`` (annotation.py:103-112, candidate sort
    by -score; Candidate.from_string:218-236, bare-type vs JSON-attrs
    tails) and our ``read_annotations_tsv`` must produce identical
    mentions from the SAME TSV bytes (emitted by our writer — so this
    also proves the reference engine can consume our files).  Guards
    the candidate-tail parser, which is plan-staged and easy to
    regress silently."""
    import collections
    import collections.abc
    import os
    import sys

    for n in ("Sequence", "Mapping", "MutableMapping", "Iterable",
              "Callable", "Set", "MutableSet", "MutableSequence",
              "Hashable"):
        setattr(collections, n, getattr(collections.abc, n))

    REF = "/root/reference"
    if not os.path.isdir(os.path.join(REF, "neleval")):
        pytest.skip("reference not present")

    from neleval_spark.operators.normalize import (
        derive_mention_columns, with_is_first)
    from neleval_spark.sources.tsv import (
        annotations_to_tsv_lines, read_annotations_tsv)

    mentions = [m for m in mentions if m is not None]
    seen, rows = set(), []
    for m in mentions:
        if m[:3] in seen:
            continue
        seen.add(m[:3])
        rows.append(m)
    if not rows:
        return

    schema = ("docid string, start long, end long, candidates "
              "array<struct<eid string, score double, type string, "
              "attrs map<string,string>>>")
    df = with_is_first(derive_mention_columns(
        spark.createDataFrame(rows, schema), sort=True))
    lines = [r["value"] for r in annotations_to_tsv_lines(df).collect()]

    p = tmp_path_factory.mktemp("tsvdiff") / "ann.tsv"
    p.write_text("\n".join(lines) + "\n", encoding="utf-8")

    ours = {_norm(r)
            for r in read_annotations_tsv(spark, str(p)).collect()}

    sys.path.insert(0, REF)
    try:
        from neleval.annotation import Annotation
        theirs = set()
        for line in lines:
            ann = Annotation.from_string(line)
            theirs.add((ann.docid, ann.start, ann.end,
                        tuple((c.eid, c.score,
                               c.__dict__.get("type"),
                               _attrs_key(dict(c.__dict__)))
                              for c in ann.candidates)))
    finally:
        sys.path.remove(REF)

    assert ours == theirs
