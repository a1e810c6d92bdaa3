"""TAC'09-14 and TAC'15 prepare stages.

``prepare_tac`` re-expresses the reference's PrepareTac
(neleval/tac.py:23-80, TacReader :119-167) relationally:

    queries XML → (qid, docid, beg, end, name) rows
    links tab   → (qid, eid, type, score) rows
    join on qid → group by span (dedup, neleval/tac.py:157-159)
    → candidates sorted by -score (tac.py:130-131)
    → redirect mapping via broadcast join (tac.py:98-103)
    → range anti-join against excluded spans (tac.py:106-116)

The queries file is a dimension (thousands of rows) — it is parsed on
the driver with ElementTree and parallelized; the links side is read
distributedly with ``spark.read.csv``.  This prepare shape is the
template for the construction pipeline's candidate-generation stage.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType, LongType, StringType, StructField, StructType)

from ..operators.normalize import (
    derive_mention_columns, normalise_link_col, with_is_first)

QUERIES_SCHEMA = StructType(
    [
        StructField("qid", StringType()),
        StructField("docid", StringType()),
        StructField("start", StringType()),  # strings in reference reader
        StructField("end", StringType()),    # (neleval/tac.py:67-69)
        StructField("name", StringType()),
    ]
)

LINKS_SCHEMA = StructType(
    [
        StructField("qid", StringType()),
        StructField("eid", StringType()),
        StructField("type", StringType()),
        StructField("score", DoubleType()),
    ]
)


def read_tac_queries(spark: SparkSession, path: str) -> DataFrame:
    """Parse the kbpentlink queries XML (reference: neleval/tac.py:151-167).

    ``q_pos`` is the query's XML document position: within a span group
    the reference concatenates candidates in query iteration order
    (tac.py:126-129, stable sort), so q_pos is the first tie-break."""
    rows = []
    for _, elem in ET.iterparse(path):
        if elem.tag == "query":
            d = {child.tag: child.text for child in elem}
            rows.append(
                (elem.get("id"), d.get("docid"), d.get("beg"),
                 d.get("end"), d.get("name"), len(rows))
            )
    schema = StructType(
        QUERIES_SCHEMA.fields + [StructField("q_pos", LongType())])
    return spark.createDataFrame(rows, schema)


def read_tac_links(spark: SparkSession, path: str,
                   gold: bool = False) -> DataFrame:
    """Read the links tab file; score defaults to 1.0 when absent and
    header/short rows are dropped (reference: neleval/tac.py:137-149).

    ``gold=True`` projects to the first three columns with a literal
    1.0 score, mirroring the reference track pipeline's awk step
    (scripts/run_tac14_evaluation.sh:24 ``{print $1,$2,$3,"1.0"}``) —
    a real TAC gold tab carries a non-numeric 4th column (genre)
    that must never reach the float parse or the score ordering.

    ``line_ord`` preserves file order (monotonically_increasing_id is
    ordered within and across the ordered file splits) so equal-score
    candidates tie-break on link-file position exactly as the
    reference's stable ``sorted(..., reverse=True)`` does (tac.py:130).
    """
    raw = spark.read.csv(path, sep="\t", header=False,
                         schema="c0 string, c1 string, c2 string, c3 string")
    raw = raw.withColumn("line_ord", F.monotonically_increasing_id())
    score = (F.lit(1.0) if gold else
             F.coalesce(F.col("c3").cast("double"), F.lit(1.0)))
    return (
        raw.where(F.col("c2").isNotNull() & (F.col("c0") != "query_id"))
        .select(
            F.col("c0").alias("qid"),
            F.col("c1").alias("eid"),
            F.col("c2").alias("type"),
            score.alias("score"),
            F.col("line_ord"),
        )
    )


def read_mapping_file(spark: SparkSession, path: str) -> DataFrame:
    """Redirect-mapping TSV → (alias, canonical) rows (reference:
    read_mapping, neleval/tac.py:83-95): first column is the canonical
    title, remaining columns its aliases; spaces → underscores; the
    title maps to itself; later lines overwrite earlier duplicates
    (dict semantics), replicated with ``max_by`` on line order."""
    raw = spark.read.text(path).withColumn(
        "line_ord", F.monotonically_increasing_id())
    bits = F.split(F.regexp_replace(F.col("value"), r"[\r\n]+$", ""), "\t")
    under = lambda c: F.replace(c, F.lit(" "), F.lit("_"))  # noqa: E731
    rows = raw.select(
        under(F.element_at(bits, 1)).alias("canonical"),
        F.explode(F.transform(bits, under)).alias("alias"),
        F.col("line_ord"),
    )
    return rows.groupBy("alias").agg(
        F.max_by("canonical", "line_ord").alias("canonical"))


def read_excluded_spans_file(spark: SparkSession, path: str) -> DataFrame:
    """Excluded-spans TSV → (docid, start, end) rows (reference:
    read_excluded_spans, neleval/tac.py:106-116 — which explodes to
    per-offset sets; here the span row feeds a range anti-join)."""
    raw = spark.read.csv(
        path, sep="\t", header=False,
        schema="docid string, start string, end string")
    return raw.select(
        "docid",
        F.col("start").cast("long").alias("start"),
        F.col("end").cast("long").alias("end"),
    )


def filter_excluded_spans(df: DataFrame,
                          excluded: DataFrame | None) -> DataFrame:
    """Drop mentions whose start or end offset falls inside an excluded
    span (reference explodes per-offset sets, neleval/tac.py:106-116;
    here: a broadcast range anti-join — no explosion)."""
    if excluded is None:
        return df
    x = F.broadcast(
        excluded.select(
            F.col("docid").alias("__xdoc"),
            F.col("start").cast("long").alias("__xs"),
            F.col("end").cast("long").alias("__xe"),
        )
    )
    s = F.col("start").cast("long")
    e = F.col("end").cast("long")
    cond = (
        (df["docid"] == x["__xdoc"])
        & (s.between(x["__xs"], x["__xe"]) | e.between(x["__xs"], x["__xe"]))
    )
    return df.join(x, cond, "left_anti")


def _validate_alignment(queries: DataFrame, links: DataFrame,
                        queries_all: DataFrame | None = None) -> None:
    """Raise as the reference does on misaligned inputs: every
    non-excluded span GROUP must have ≥1 candidate link — the reference
    concatenates candidates across all qids sharing a (docid, start,
    end) span before the no-candidates raise (neleval/tac.py:125-131
    then :71-72), so a qid with zero link rows is fine when a span-mate
    has candidates.  The excluded-span check precedes the raise, so
    excluded spans never trigger it.  Every link row must align to a
    known query — excluded or not (tac.py:133-135)."""
    has = links.select("qid").distinct().withColumn("__has", F.lit(1))
    bad = (
        queries.join(has, "qid", "left")
        .groupBy("docid", "start", "end")
        .agg(
            F.max("__has").alias("__any"),
            F.sort_array(
                F.collect_list(F.struct("q_pos", "qid"))).alias("__qs"),
        )
        .where(F.col("__any").isNull())
        # reference iterates span groups sorted on the raw string
        # tuple (docid, start, end) and raises at the first empty one
        .orderBy("docid", F.col("start").cast("string"),
                 F.col("end").cast("string"))
        .limit(1)
        .collect()
    )
    queries = queries_all if queries_all is not None else queries
    if bad:
        qids = tuple(x["qid"] for x in bad[0]["__qs"])
        raise ValueError("No candidates found for query " + str(qids))
    unaligned = [r["qid"] for r in
                 links.join(queries, "qid", "left_anti")
                 .select("qid").distinct().limit(5).collect()]
    if unaligned:
        raise ValueError(
            "Remaining annotations unaligned to queries: "
            + ", ".join(map(str, unaligned)))


def prepare_tac(
    spark: SparkSession,
    links_path: str,
    queries_path: str,
    excluded: DataFrame | None = None,
    mapping: DataFrame | None = None,
    strict: bool = True,
    gold: bool = False,
) -> DataFrame:
    """TAC queries+links → normalized mentions DataFrame.

    ``gold=True`` applies the reference track pipeline's gold-tab
    projection (first three columns + literal 1.0 score; see
    read_tac_links).

    Candidate lists for queries sharing a span are concatenated then
    sorted by descending score (stable on link-file order), replicating
    neleval/tac.py:126-131 where grouped query qids ``pop`` their
    candidates in qid-sorted span groups.  Pre-sort order inside a span
    group is (query XML position, link-file line) — the two ordinals
    carried by the readers — so equal-score tie-breaking is
    byte-identical to the reference's stable sort.
    """
    queries_all = read_tac_queries(spark, queries_path)
    # exclusion applies BEFORE the no-candidates check (reference
    # annotations() order); unaligned links are checked against ALL
    # queries since reference exclusion happens after pairing
    queries = filter_excluded_spans(queries_all, excluded)
    links = read_tac_links(spark, links_path, gold=gold)
    if strict:
        _validate_alignment(queries, links, queries_all=queries_all)

    if mapping is not None:
        m = F.broadcast(mapping.select(
            F.col("alias").alias("__alias"), F.col("canonical").alias("__canon")))
        links = (
            links.withColumn("eid", normalise_link_col(F.col("eid")))
            .join(m, F.col("eid") == F.col("__alias"), "left")
            .withColumn("eid", F.coalesce(F.col("__canon"), F.col("eid")))
            .drop("__alias", "__canon")
        )
    else:
        links = links.withColumn("eid", normalise_link_col(F.col("eid")))

    joined = queries.join(links, "qid", "inner")

    # span-dedup: reference sorts queries by (docid, beg, end) and
    # groups (tac.py:157-159); candidate order within a span group is
    # (query position, link-file order) — sort_array over the leading
    # ordinal fields — then the stable -score sort in
    # derive_mention_columns finishes the reference's ordering
    grouped = (
        joined.groupBy("docid", "start", "end")
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col("q_pos"),
                        F.col("line_ord"),
                        F.col("eid"),
                        F.col("score"),
                        F.col("type"),
                    )
                )
            ).alias("qcands")
        )
        .select(
            "docid", "start", "end",
            F.transform(
                F.col("qcands"),
                lambda x: F.struct(
                    x["eid"].alias("eid"),
                    x["score"].alias("score"),
                    x["type"].alias("type"),
                    F.lit(None).cast("map<string,string>").alias("attrs"),
                ),
            ).alias("candidates"),
        )
    )

    out = grouped.withColumn("start", F.col("start").cast("long")) \
                 .withColumn("end", F.col("end").cast("long"))
    out = derive_mention_columns(out, sort=True)
    return with_is_first(out)


def prepare_tac15(
    spark: SparkSession,
    path: str,
    excluded: DataFrame | None = None,
    mapping: DataFrame | None = None,
) -> DataFrame:
    """TAC 2015 single-file format (reference: neleval/tac.py:170-238).

    Offset field ``"doc: s - e"`` split via regexp_extract; candidates
    grouped per offset key and sorted by descending score; type is
    ``netype/mentiontype``.
    """
    raw = spark.read.csv(path, sep="\t", header=False, inferSchema=False)
    cols = raw.columns
    # columns: run, mention_id, text, offset, kbid, ne_type, mention_type,
    # score, ... (tac.py:174-186)
    key_re = r"^(\S+): ?(\d+) ?[-–] ?(\d+)$"
    df = raw.select(
        F.regexp_extract(F.col(cols[3]), key_re, 1).alias("docid"),
        F.regexp_extract(F.col(cols[3]), key_re, 2).cast("long").alias("start"),
        F.regexp_extract(F.col(cols[3]), key_re, 3).cast("long").alias("end"),
        F.col(cols[4]).alias("eid"),
        F.concat_ws("/", F.col(cols[5]), F.col(cols[6])).alias("type"),
        F.col(cols[7]).cast("double").alias("score"),
        # file order: equal-score tie-break matches the reference's
        # stable sorted(cand_data, key=-score) (tac.py:222-224)
        F.monotonically_increasing_id().alias("line_ord"),
    )
    if mapping is not None:
        m = F.broadcast(mapping.select(
            F.col("alias").alias("__alias"), F.col("canonical").alias("__canon")))
        df = (
            df.withColumn("eid", normalise_link_col(F.col("eid")))
            .join(m, F.col("eid") == F.col("__alias"), "left")
            .withColumn("eid", F.coalesce(F.col("__canon"), F.col("eid")))
            .drop("__alias", "__canon")
        )
    else:
        df = df.withColumn("eid", normalise_link_col(F.col("eid")))

    grouped = df.groupBy("docid", "start", "end").agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    (-F.col("score")).alias("neg_score"),
                    F.col("line_ord"),
                    F.col("eid"), F.col("score"), F.col("type"),
                )
            )
        ).alias("scands")
    ).select(
        "docid", "start", "end",
        F.transform(
            F.col("scands"),
            lambda x: F.struct(
                x["eid"].alias("eid"),
                x["score"].alias("score"),
                x["type"].alias("type"),
                F.lit(None).cast("map<string,string>").alias("attrs"),
            ),
        ).alias("candidates"),
    )
    out = filter_excluded_spans(grouped, excluded)
    out = derive_mention_columns(out, sort=True)
    return with_is_first(out)
