"""End-to-end crawl-loop integration: corpus → WARC files on disk →
``read_warc`` → charset sniff → extraction → construction pipeline →
triples.  The WARC transport must be invisible: triples built from
ingested WARC files equal the direct-DataFrame build EXACTLY."""

import pytest

from pyspark.sql import functions as F

N = 120


@pytest.fixture(scope="module")
def corpus(spark):
    from neleval_spark.pipeline import synth_corpus

    df = synth_corpus(spark, N, seed=11).cache()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def warc_dir(spark, corpus, tmp_path_factory):
    """Shard the corpus into 3 member-gzipped WARC files (the Common
    Crawl layout) via the real serializer."""
    from neleval_spark.sources.warc import build_warc

    d = tmp_path_factory.mktemp("crawl")
    rows = corpus.select("url", "warc_ts", "html").collect()
    for shard in range(3):
        recs = [
            (r["url"],
             r["warc_ts"].strftime("%Y-%m-%dT%H:%M:%SZ"),
             bytes(r["html"]))
            for k, r in enumerate(rows) if k % 3 == shard
        ]
        (d / f"shard-{shard}.warc.gz").write_bytes(
            build_warc(recs, gzip_members=True))
    return str(d)


def test_warc_transport_preserves_pages(spark, corpus, warc_dir):
    from neleval_spark.functions.discovery import detect_charset
    from neleval_spark.sources.warc import read_warc

    got = read_warc(spark, warc_dir)
    assert got.count() == N
    # byte-identical html per url through serialize+gzip+parse
    joined = got.select("url", F.col("html").alias("rt")) \
        .join(corpus.select("url", "html"), "url")
    assert joined.where(F.col("rt") != F.col("html")).count() == 0
    # the synthetic corpus is ascii-clean: prescan finds no
    # declaration and falls back to utf-8 everywhere
    cs = got.select(detect_charset(F.col("html")).alias("c")) \
        .distinct().collect()
    assert {r["c"] for r in cs} == {"utf-8"}


def test_crawl_loop_triples_equal_direct_build(spark, corpus,
                                               warc_dir):
    from neleval_spark.pipeline import kb_table
    from neleval_spark.pipeline.run import build_mentions
    from neleval_spark.pipeline.triples import emit_triples
    from neleval_spark.sources.warc import read_warc

    kb = kb_table(spark)

    # crawl path: WARC bytes → pages; lang re-attached from the
    # corpus metadata by url (transport test — lang-ID quality has
    # its own oracle + accuracy pytest)
    pages = read_warc(spark, warc_dir) \
        .select("url", "warc_ts", "html") \
        .join(corpus.select("url", "lang"), "url")
    t_warc = emit_triples(build_mentions(pages, kb))

    t_direct = emit_triples(build_mentions(corpus, kb))

    cols = ["subj", "pred", "obj", "url"]
    assert sorted(map(tuple, t_warc.select(*cols).collect())) == \
        sorted(map(tuple, t_direct.select(*cols).collect()))
