"""Fuzzy entity resolution: q-gram prefix-filter blocking, integer
edit-distance verification, transitive canonicalization.

The KG-merge primitive the exact-key NIL canonicalizer
(pipeline/canonicalize.py) deliberately does not attempt: match
entity NAMES that differ by typos, dropped characters or token order
("Acme Corp" / "Acme Corporation" territory).  The reference engine
has no fuzzy matcher (its KB joins are exact on kbid; cf.
reference/neleval/annotation.py mention equality) — this implements
the published string-similarity-join design instead:

* **SSJoin / prefix filtering** (Chaudhuri, Ganti & Kaushik, ICDE'06;
  Xiao et al., WWW'08 PPJoin): two strings within edit distance ``d``
  share at least ``max(|Ga|,|Gb|) - d*q`` of their positional q-gram
  multisets, so under ANY global gram order the ``d*q + 1`` rarest
  grams of each record (its *prefix*) must intersect the other's
  prefix.  Blocking therefore equi-joins on prefix grams only — never
  all-pairs, and the joined grams are each record's globally RAREST,
  so block sizes are small by construction (frequent grams never
  block).  Multisets become sets by suffixing each gram with its
  occurrence index ("abc#2" = second "abc"), the standard reduction.
* **Verification** is ``levenshtein(norm_a, norm_b) <= d`` — integer,
  JVM-side, and bit-identical across engines (DuckDB's levenshtein
  agrees exactly), after the free ``| |a|-|b| | <= d`` length filter.
* **Short-name completeness**: the count bound is vacuous only when
  BOTH records have at most ``d*q`` grams; those records additionally
  share a single ``#SHORT`` sentinel block.  With q-1 pad characters a
  record is "short" only when ``len(norm) <= d*q - q + 1`` (≤ 5 chars
  at q=3, d=2), so the sentinel block is bounded by the alphabet, not
  the corpus.
* **Resolution**: verified pairs feed the same large-star/small-star
  connected-components machinery CEAF and NIL canonicalization use;
  canonical id = component minimum, a pure function of the cluster.

Scale shape at 10^12 documents: per-record work is one gram explode
(O(len) rows) plus two narrow windows keyed by record id; the global
gram-frequency table is a map-side-combined aggregate; the blocking
join shuffles only (prefix gram -> record) rows.  No step is
quadratic in the corpus — only in individual block sizes, which the
rarest-gram prefix bounds.  Names are token-sorted before hashing so
word-order variants cost 0 edits (documented semantics: the distance
is measured on the normalized, token-sorted form).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..graph import connected_components

SHORT_SENTINEL = "#SHORT"


def normalize_name(col: Column) -> Column:
    """Lowercase, strip non-alphanumerics to spaces, drop empty
    tokens, token-sort, single-space join.  Pure ASCII-safe column
    expression; the DuckDB oracle mirrors it exactly."""
    toks = F.filter(
        F.split(F.regexp_replace(F.lower(F.trim(col)), "[^a-z0-9]+", " "),
                " "),
        lambda t: t != "")
    return F.array_join(F.sort_array(toks), " ")


def _keyed_grams(norm: DataFrame, id_col: str, q: int) -> DataFrame:
    """(id, norm, gram_key, gram_total): occurrence-keyed q-grams of
    the q-1-padded normalized name.  ``gram_total`` is the record's
    gram multiset size (the count the prefix bound needs)."""
    pad_lit = "#" * (q - 1)
    g = (norm
         .withColumn("_pad", F.concat(F.lit(pad_lit), F.col("norm"),
                                      F.lit(pad_lit)))
         # stage the array once (HOF note in docs/PLANS.md), then
         # explode; one row per positional gram
         .withColumn("_grams", F.expr(
             f"transform(sequence(1, length(_pad) - {q - 1}),"
             f" i -> substring(_pad, i, {q}))"))
         .select(id_col, "norm",
                 F.posexplode("_grams").alias("_pos", "_gram")))
    occ = Window.partitionBy(id_col, "_gram").orderBy("_pos")
    tot = Window.partitionBy(id_col)
    return (g.withColumn("gram_key",
                         F.concat_ws("#", "_gram",
                                     F.row_number().over(occ)))
            .withColumn("gram_total", F.count("*").over(tot))
            .drop("_pos", "_gram"))


def er_candidates(names: DataFrame, id_col: str = "id",
                  name_col: str = "name", q: int = 3,
                  max_dist: int = 2) -> DataFrame:
    """Blocked candidate pairs (id_a, norm_a, id_b, norm_b), each
    sharing a prefix gram (or the short sentinel).  Complete: every
    pair within ``max_dist`` on the normalized form is present."""
    norm = names.select(F.col(id_col).alias("id"),
                        normalize_name(F.col(name_col)).alias("norm"))
    keyed = _keyed_grams(norm, "id", q)
    prefix_len = max_dist * q + 1
    rk = Window.partitionBy("id").orderBy("df", "gram_key")
    df = keyed.groupBy("gram_key").agg(F.count("*").alias("df"))
    kept = (keyed.join(df, "gram_key")
            .withColumn("_rk", F.row_number().over(rk))
            .where(F.col("_rk") <= prefix_len)
            .select("id", "norm", "gram_key", "gram_total"))
    short = (kept.where(F.col("gram_total") <= max_dist * q)
             .select("id", "norm",
                     F.lit(SHORT_SENTINEL).alias("gram_key"))
             .distinct())
    blocks = kept.select("id", "norm", "gram_key").unionByName(short)
    a = blocks.select(F.col("id").alias("id_a"),
                      F.col("norm").alias("norm_a"), "gram_key")
    b = blocks.select(F.col("id").alias("id_b"),
                      F.col("norm").alias("norm_b"), "gram_key")
    # the length filter runs INSIDE the block join (lossless: a pair
    # within edit distance d never differs by more than d chars), so
    # length-mismatched block co-members are dropped before the
    # pair-distinct shuffle, not after it
    return (a.join(b, (a["gram_key"] == b["gram_key"])
                   & (F.abs(F.length(a["norm_a"])
                            - F.length(b["norm_b"])) <= max_dist))
            .where(F.col("id_a") < F.col("id_b"))
            .select("id_a", "norm_a", "id_b", "norm_b")
            .distinct())


def er_match(names: DataFrame, id_col: str = "id",
             name_col: str = "name", q: int = 3,
             max_dist: int = 2) -> DataFrame:
    """Verified fuzzy-match pairs (id_a, id_b, dist): normalized
    token-sorted edit distance at most ``max_dist``.  Records whose
    normalized names are identical match at dist 0."""
    cand = er_candidates(names, id_col, name_col, q, max_dist)
    return (cand
            .where(F.abs(F.length("norm_a") - F.length("norm_b"))
                   <= max_dist)
            .withColumn("dist", F.levenshtein("norm_a", "norm_b"))
            .where(F.col("dist") <= max_dist)
            .select("id_a", "id_b", F.col("dist").cast("int").alias("dist")))


def er_index(names: DataFrame, id_col: str = "id",
             name_col: str = "name", q: int = 3) -> DataFrame:
    """Persistable blocking index for :func:`er_increment`: ALL
    occurrence-keyed q-grams per record, ``(id, norm, gram_key)``.
    Keeping the FULL gram set (not a prefix) is what makes increments
    cheap AND complete: the prefix lemma only needs a prefix on ONE
    side when the other side keeps everything — if |A∩B| ≥ t and none
    of A's first |A|−t+1 grams were in B, at most t−1 shared grams
    would remain.  So the index never needs re-ranking when the
    corpus-wide gram frequencies drift; append new batches with a
    plain union."""
    norm = names.select(F.col(id_col).alias("id"),
                        normalize_name(F.col(name_col)).alias("norm"))
    return _keyed_grams(norm, "id", q).select("id", "norm", "gram_key")


def er_increment(new_names: DataFrame, index: DataFrame,
                 id_col: str = "id", name_col: str = "name",
                 q: int = 3, max_dist: int = 2) -> DataFrame:
    """Match a NEW batch of names against an existing
    :func:`er_index` (plus within-batch matches) without touching
    the index's blocking — the incremental-construction form of
    :func:`er_match` (same shape as dedup_index.check_increment).

    Returns ``(new_id, match_id, dist, is_index)``: ``match_id`` is
    an index record (``is_index`` true) or a SMALLER-id new record
    (first-wins within the batch, mirroring check_increment).

    Scale shape: the increment's prefix grams (``d*q+1`` per new
    record, ranked by the increment's OWN gram frequencies — any
    fixed order is correct, see :func:`er_index`) are distinct-
    collected and broadcast onto the index gram table, so the large
    index side is filtered to the increment's blocks BEFORE any
    exchange; the index is never re-scanned per gram order and
    existing records never pair with each other."""
    norm_new = new_names.select(
        F.col(id_col).alias("id"),
        normalize_name(F.col(name_col)).alias("norm"))
    keyed = _keyed_grams(norm_new, "id", q)
    prefix_len = max_dist * q + 1
    rk = Window.partitionBy("id").orderBy("df", "gram_key")
    df = keyed.groupBy("gram_key").agg(F.count("*").alias("df"))
    kept = (keyed.join(df, "gram_key")
            .withColumn("_rk", F.row_number().over(rk))
            .where(F.col("_rk") <= prefix_len)
            .select("id", "norm", "gram_key", "gram_total"))
    # short records keep all grams anyway (total <= d*q < prefix);
    # their sentinel only matters against OTHER short records, and
    # the index carries no sentinel — so block short new records
    # against short INDEX records via the index's full gram set OR
    # both being short.  A short-short pair can share zero grams, so
    # join short new records against short index rows explicitly.
    idx_len = index.groupBy("id").agg(
        F.count("*").alias("_ig"),
        F.first("norm").alias("norm"))
    short_new = (kept.where(F.col("gram_total") <= max_dist * q)
                 .select("id", "norm").distinct())
    short_idx = idx_len.where(F.col("_ig") <= max_dist * q) \
        .select(F.col("id").alias("match_id"),
                F.col("norm").alias("norm_b"))
    cand_short = (short_new.select(F.col("id").alias("new_id"),
                                   F.col("norm").alias("norm_a"))
                  .crossJoin(F.broadcast(short_idx)))

    active = kept.select("gram_key").distinct()
    idx = index.join(F.broadcast(active), "gram_key")
    cand_idx = (kept.select(F.col("id").alias("new_id"),
                            F.col("norm").alias("norm_a"), "gram_key")
                .join(idx.select(F.col("id").alias("match_id"),
                                 F.col("norm").alias("norm_b"),
                                 "gram_key"),
                      "gram_key")
                .select("new_id", "norm_a", "match_id", "norm_b"))
    vs_index = (cand_idx.unionByName(
                    cand_short.select("new_id", "norm_a",
                                      "match_id", "norm_b"))
                .distinct()
                # a re-submitted id must not match itself
                .where(F.col("new_id") != F.col("match_id"))
                .where(F.abs(F.length("norm_a") - F.length("norm_b"))
                       <= max_dist)
                .withColumn("dist", F.levenshtein("norm_a", "norm_b"))
                .where(F.col("dist") <= max_dist)
                .select("new_id", "match_id",
                        F.col("dist").cast("int").alias("dist"),
                        F.lit(True).alias("is_index")))
    within = (er_match(new_names, id_col, name_col, q, max_dist)
              .select(F.col("id_b").alias("new_id"),
                      F.col("id_a").alias("match_id"),
                      "dist", F.lit(False).alias("is_index")))
    return vs_index.unionByName(within)


def er_resolve(names: DataFrame, id_col: str = "id",
               name_col: str = "name", q: int = 3,
               max_dist: int = 2) -> DataFrame:
    """Transitive closure of er_match: (id, canonical, cluster_size)
    covering EVERY input record (non-matching records are their own
    singleton cluster).  canonical = min id of the component — stable
    across runs, partitionings and executor counts."""
    pairs = er_match(names, id_col, name_col, q, max_dist)
    member = connected_components(
        pairs.select(F.col("id_a").alias("src"),
                     F.col("id_b").alias("dst")))
    ids = names.select(F.col(id_col).alias("id")).distinct()
    resolved = (ids.join(member.withColumnRenamed("vertex", "id"),
                         "id", "left")
                .select("id", F.coalesce("component",
                                         F.col("id")).alias("canonical")))
    size = Window.partitionBy("canonical")
    return resolved.withColumn(
        "cluster_size", F.count("*").over(size).cast("long"))
