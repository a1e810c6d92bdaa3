"""Crawl-generation diff (functions/corpusops.crawl_diff)."""

from neleval_spark.functions.corpusops import crawl_diff


def test_statuses(spark):
    old = spark.createDataFrame(
        [("a", 1), ("b", 2), ("c", 3), ("d", None)],
        "url string, content_hash int")
    new = spark.createDataFrame(
        [("a", 1), ("b", 9), ("e", 5), ("d", None)],
        "url string, content_hash int")
    out = {r["url"]: r for r in crawl_diff(old, new).collect()}
    assert out["a"]["status"] == "unchanged"
    assert out["b"]["status"] == "changed"
    assert out["c"]["status"] == "removed"
    assert out["e"]["status"] == "added"
    # both-null content hashes compare equal (eqNullSafe), not changed
    assert out["d"]["status"] == "unchanged"
    assert out["b"]["old_content"] == 2 and out["b"]["new_content"] == 9


def test_narrow_projection(spark):
    # wide page bodies never enter the join: output schema is fixed
    old = spark.createDataFrame([("a", 1)], "url string, content_hash int")
    new = spark.createDataFrame([("a", 1)], "url string, content_hash int")
    out = crawl_diff(old, new)
    assert out.columns == ["url", "status", "old_content", "new_content"]
