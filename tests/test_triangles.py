"""Triangle counting: known closed-form graphs (K4, star, bowtie),
input normalization (direction, duplicates, self-loops), and the
degree-orientation hub contract (a hub contributes no wedges)."""

from pyspark.sql import functions as F

from neleval_spark.graph.triangles import triangle_count


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def _one(df):
    r = df.collect()[0]
    return (r["n_vertices"], r["n_edges"], r["n_triangles"])


def test_k4_has_four_triangles(spark):
    vs = ["a", "b", "c", "d"]
    e = _edges(spark, [(x, y) for x in vs for y in vs if x < y])
    assert _one(triangle_count(e)) == (4, 6, 4)


def test_star_has_none(spark):
    e = _edges(spark, [("hub", f"v{i}") for i in range(10)])
    assert _one(triangle_count(e)) == (11, 10, 0)


def test_bowtie_two_triangles(spark):
    e = _edges(spark, [("a", "b"), ("b", "c"), ("a", "c"),
                       ("c", "d"), ("d", "e"), ("c", "e")])
    assert _one(triangle_count(e)) == (5, 6, 2)


def test_normalizes_direction_dups_loops(spark):
    e = _edges(spark, [("b", "a"), ("a", "b"), ("b", "c"),
                       ("a", "c"), ("c", "a"), ("a", "a")])
    assert _one(triangle_count(e)) == (3, 3, 1)


def test_hub_with_closures(spark):
    """Hub of degree 40 whose spokes form 20 rim edges → 20
    triangles; degree orientation points every spoke INTO the hub, so
    the hub's wedge set is empty and the count comes from the rim."""
    spokes = [("hub", f"v{i}") for i in range(40)]
    rim = [(f"v{2 * i}", f"v{2 * i + 1}") for i in range(20)]
    got = _one(triangle_count(_edges(spark, spokes + rim)))
    assert got == (41, 60, 20)


def test_matches_bruteforce_on_random_graph(spark):
    import itertools
    import random

    rng = random.Random(7)
    vs = [f"n{i}" for i in range(16)]
    pairs = sorted({tuple(sorted(rng.sample(vs, 2)))
                    for _ in range(60)})
    adj = set(pairs)
    brute = sum(
        1 for a, b, c in itertools.combinations(sorted(vs), 3)
        if (a, b) in adj and (b, c) in adj and (a, c) in adj)
    nv = len({v for p in pairs for v in p})
    assert _one(triangle_count(_edges(spark, pairs))) == \
        (nv, len(pairs), brute)


def test_hub_skew_adversarial_million_edges(spark):
    """10^6-spoke hub + 5*10^5 rim closures (1.5M edges, 5*10^5
    triangles).  The degree-orientation witness: the oriented wedge
    set is EXACTLY the 5*10^5 rim wedges — a naive neighbour-pair
    enumeration at the hub would generate ~5*10^11 wedges.  The hub
    receives all its edges inward and contributes none."""
    n = 1_000_000
    spokes = spark.range(n).select(
        F.lit("h").alias("src"),
        F.format_string("v%07d", F.col("id")).alias("dst"))
    rim = spark.range(n // 2).select(
        F.format_string("v%07d", 2 * F.col("id")).alias("src"),
        F.format_string("v%07d", 2 * F.col("id") + 1).alias("dst"))
    stats = {}
    r = triangle_count(spokes.union(rim), stats=stats).collect()[0]
    assert (r["n_vertices"], r["n_edges"], r["n_triangles"]) == \
        (n + 1, n + n // 2, n // 2)
    assert stats["n_wedges"] == n // 2, stats
