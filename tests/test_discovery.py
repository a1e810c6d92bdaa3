"""Sitemap extraction + charset sniffing (functions/discovery.py)."""

from pyspark.sql import functions as F

from neleval_spark.functions.discovery import (
    detect_charset, extract_sitemap_urls)


def _sm(spark, body):
    return spark.createDataFrame(
        [("http://h/sitemap.xml", body)], "url string, body string")


def test_urlset_and_escapes(spark):
    body = ("<?xml version=\"1.0\"?><urlset>"
            "<url><loc>  http://h/a  </loc></url>"
            "<url><loc>http://h/b?x=1&amp;y=2&amp;lt</loc></url>"
            "<url><priority>0.1</priority></url>"
            "</urlset>")
    got = [(r.loc, r.kind)
           for r in extract_sitemap_urls(_sm(spark, body))
           .orderBy("loc").collect()]
    # &amp; unescaped LAST: '&amp;lt' is '&' + 'lt', not '<'
    assert got == [("http://h/a", "page"),
                   ("http://h/b?x=1&y=2&lt", "page")]


def test_sitemap_index_kind(spark):
    body = ("<sitemapindex><sitemap><loc>http://h/s1.xml</loc>"
            "<lastmod>2026-01-01</lastmod></sitemap>"
            "<sitemap><loc>http://h/s2.xml</loc></sitemap>"
            "</sitemapindex>")
    got = [(r.loc, r.kind)
           for r in extract_sitemap_urls(_sm(spark, body))
           .orderBy("loc").collect()]
    assert got == [("http://h/s1.xml", "sitemap"),
                   ("http://h/s2.xml", "sitemap")]


def test_locless_element_does_not_absorb_next(spark):
    """A loc-less element in the MIDDLE must not swallow the next
    element's <loc> (r4 ADVICE: the old non-anchored regex let
    <url><priority/></url> absorb a following <loc>, and a loc-less
    <sitemap> could misclassify the next page entry as 'sitemap')."""
    body = ("<urlset>"
            "<url><loc>http://h/a</loc></url>"
            "<url><priority>0.5</priority></url>"
            "<url><loc>http://h/b</loc></url>"
            "</urlset>")
    got = [(r.loc, r.kind)
           for r in extract_sitemap_urls(_sm(spark, body))
           .orderBy("loc").collect()]
    assert got == [("http://h/a", "page"), ("http://h/b", "page")]
    # loc-less <sitemap> entry followed by a page entry: kind intact
    body2 = ("<sitemapindex><sitemap><lastmod>x</lastmod></sitemap>"
             "</sitemapindex><urlset>"
             "<url><loc>http://h/c</loc></url></urlset>")
    got2 = [(r.loc, r.kind)
            for r in extract_sitemap_urls(_sm(spark, body2)).collect()]
    assert got2 == [("http://h/c", "page")]


def test_multiline_and_empty(spark):
    body = "<urlset>\n  <url>\n    <loc>\n http://h/n \n</loc>\n</url>\n</urlset>"
    got = extract_sitemap_urls(_sm(spark, body)).collect()
    assert [(r.loc, r.kind) for r in got] == [("http://h/n", "page")]
    assert extract_sitemap_urls(_sm(spark, "<urlset></urlset>")) \
        .count() == 0


def _charsets(spark, blobs):
    df = spark.createDataFrame([(b,) for b in blobs], "html binary")
    return [r.c for r in
            df.select(detect_charset(F.col("html")).alias("c"))
            .collect()]


def test_charset_cases(spark):
    plain = b"<html><body>x</body></html>"
    got = _charsets(spark, [
        b"\xef\xbb\xbf" + plain,                      # UTF-8 BOM
        b"\xff\xfe" + plain,                          # UTF-16 LE BOM
        b"\xfe\xff" + plain,                          # UTF-16 BE BOM
        b'<meta charset="EUC-JP">',                   # meta, case mix
        b"<meta charset='koi8-r'>",                   # single quotes
        b'<meta http-equiv="Content-Type" content="text/html; '
        b'charset=windows-1251">',
        plain,                                        # undeclared
        b"x" * 1030 + b'<meta charset="shift_jis">',  # past prescan
    ])
    assert got == ["utf-8", "utf-16-le", "utf-16-be", "euc-jp",
                   "koi8-r", "windows-1251", "utf-8", "utf-8"]


def test_charset_custom_default(spark):
    df = spark.createDataFrame([(b"<html>",)], "html binary")
    got = df.select(detect_charset(
        F.col("html"), default="Latin-1").alias("c")).collect()
    assert got[0].c == "latin-1"
