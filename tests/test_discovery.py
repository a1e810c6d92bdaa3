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


def test_link_rels_extraction_and_resolution(spark):
    html = ('<head>'
            '<link rel="canonical" href="/clean">'
            '<LINK HREF="https://m.ex.com/p" REL="alternate" '
            'HREFLANG="de-AT">'
            '<link rel="next" href="p2">'
            '<link rel="stylesheet" href="mailto:x@y">'
            '<link rel="icon">'            # no href: dropped
            '<link href="/bare">'          # no rel: dropped
            '</head>')
    pages = spark.createDataFrame(
        [("http://ex.com/dir/page", html)], "url string, html string")
    from neleval_spark.functions.discovery import link_rels
    got = {r["rel"]: (r["href"], r["href_abs"], r["hreflang"])
           for r in link_rels(pages).collect()}
    assert got == {
        "canonical": ("/clean", "http://ex.com/clean", ""),
        "alternate": ("https://m.ex.com/p", "https://m.ex.com/p",
                      "de-at"),
        "next": ("p2", "http://ex.com/dir/p2", ""),
        "stylesheet": ("mailto:x@y", None, ""),  # scheme dropped
    }


def test_canonical_map_orders_fallback_and_schemes(spark):
    from neleval_spark.functions.discovery import canonical_map
    pages = spark.createDataFrame([
        ("http://a.com/x?utm=1",
         '<link rel="canonical" href="http://a.com/x">'),
        ("http://b.com/p",
         '<link href="/main" rel="canonical">'),   # href-first order
        ("http://c.com/p", "<p>no canonical</p>"),  # fallback self
        ("http://d.com/p",
         '<link rel="canonical" href="javascript:void(0)">'),
    ], "url string, html string")
    got = {r["url"]: r["canonical"]
           for r in canonical_map(pages).collect()}
    assert got == {
        "http://a.com/x?utm=1": "http://a.com/x",
        "http://b.com/p": "http://b.com/main",
        "http://c.com/p": "http://c.com/p",
        "http://d.com/p": "http://d.com/p",  # unresolvable scheme
    }


def test_canonical_map_feeds_exact_dedup(spark):
    # the composition the op exists for: collapse variants by the
    # publisher-declared canonical
    from pyspark.sql import functions as F

    from neleval_spark.functions.discovery import canonical_map
    rows = [(f"http://s.com/art?ref={i}",
             '<link rel="canonical" href="http://s.com/art">')
            for i in range(3)]
    rows.append(("http://s.com/other", "<p>x</p>"))
    pages = spark.createDataFrame(rows, "url string, html string")
    groups = (canonical_map(pages).groupBy("canonical")
              .agg(F.count(F.lit(1)).alias("n"))
              .collect())
    got = {r["canonical"]: r["n"] for r in groups}
    assert got == {"http://s.com/art": 3, "http://s.com/other": 1}


def test_extract_feed_entries_rss_atom_cdata(spark):
    rss = ("<rss><channel><title>chan</title>"
           "<item><title><![CDATA[A & B]]></title>"
           "<link> http://s.com/a1 </link>"
           "<pubDate>Tue, 19 Aug 2025 10:00:00 GMT</pubDate></item>"
           "<item><title>T &amp; U</title>"
           "<link>http://s.com/a2</link></item>"
           "<item><title>linkless</title></item>"
           "</channel></rss>")
    atom = ('<feed><title>f</title>'
            '<entry><title>E1</title>'
            '<link rel="alternate" href="http://t.org/e1"/>'
            '<updated>2025-08-19T10:00:00Z</updated></entry>'
            '<entry><title>E2</title>'
            '<link href="http://t.org/e2"/>'
            '<published>2025-08-18T00:00:00Z</published></entry>'
            "</feed>")
    feeds = spark.createDataFrame(
        [("http://s.com/feed", rss), ("http://t.org/atom", atom)],
        "url string, body string")
    from neleval_spark.functions.discovery import extract_feed_entries
    got = {(r["feed_url"], r["entry"]):
           (r["kind"], r["title"], r["link"], r["published"])
           for r in extract_feed_entries(feeds).collect()}
    assert got == {
        ("http://s.com/feed", 0):
            ("rss", "A & B", "http://s.com/a1",
             "Tue, 19 Aug 2025 10:00:00 GMT"),
        ("http://s.com/feed", 1):
            ("rss", "T & U", "http://s.com/a2", ""),
        ("http://t.org/atom", 0):
            ("atom", "E1", "http://t.org/e1", "2025-08-19T10:00:00Z"),
        ("http://t.org/atom", 1):
            ("atom", "E2", "http://t.org/e2", "2025-08-18T00:00:00Z"),
    }  # the linkless item (entry 2) is dropped


def test_attr_lookalikes_do_not_win(spark):
    # data-href= / data-rel= must not be read as href/rel (a \b
    # matches after '-'), and data-content= must not shadow content=
    from neleval_spark.functions.discovery import (
        canonical_map, link_rels)
    from neleval_spark.pipeline.markup import meta_tags
    pages = spark.createDataFrame([
        ("http://a.com/p",
         '<link rel="alternate" data-href="WRONG" href="/right">'
         '<link data-rel="canonical" href="/notcanon">'
         '<meta name="og:t" data-content="WRONG" content="RIGHT">'),
    ], "url string, html string")
    lr = {r["rel"]: r["href"] for r in link_rels(pages).collect()}
    assert lr == {"alternate": "/right"}  # data-rel tag dropped
    cm = canonical_map(pages).collect()[0]
    assert cm["canonical"] == "http://a.com/p"  # no real canonical
    mt = {r["key"]: r["content"] for r in meta_tags(pages).collect()}
    assert mt == {"og:t": "RIGHT"}


def test_detect_charset_ignores_charset_in_content_values(spark):
    from neleval_spark.functions.discovery import detect_charset
    from pyspark.sql import functions as F
    rows = [
        # decoy in a description BEFORE the real declaration
        ('<meta name="d" content="set charset=koi8-r here">'
         '<meta charset="utf-16le">', "utf-16le"),
        # http-equiv refresh before the real http-equiv content-type
        ('<meta http-equiv="refresh" content="0;url=x">'
         '<meta http-equiv="Content-Type" '
         'content="text/html; charset=windows-1252">',
         "windows-1252"),
        # decoy only: fall back to default
        ('<meta name="d" content="charset=koi8-r">', "utf-8"),
    ]
    df = spark.createDataFrame([(h,) for h, _ in rows], "h string")
    got = [r["c"] for r in df.select(
        detect_charset(F.encode("h", "ISO-8859-1")).alias("c")
    ).collect()]
    assert got == [w for _, w in rows]


def test_feed_cdata_content_stays_literal(spark):
    # CDATA text is literal per XML: entities inside must NOT decode
    from neleval_spark.functions.discovery import extract_feed_entries
    feeds = spark.createDataFrame([
        ("f", "<rss><channel><item>"
              "<title><![CDATA[Tom &amp; Jerry &lt;3]]></title>"
              "<link>http://x/1</link></item></channel></rss>"),
    ], "url string, body string")
    r = extract_feed_entries(feeds).collect()[0]
    assert r["title"] == "Tom &amp; Jerry &lt;3"


def test_hreflang_reciprocity(spark):
    from neleval_spark.functions.discovery import (
        hreflang_reciprocity, link_rels)

    def page(url, *alts):
        tags = "".join(
            f'<link rel="alternate" href="{h}" hreflang="{l}">'
            for h, l in alts)
        return (url, tags)

    pages = spark.createDataFrame([
        page("http://a.com/en", ("http://a.com/de", "de"),
             ("http://a.com/fr", "fr"),
             ("http://a.com/en", "en")),     # self-ref: dropped
        page("http://a.com/de", ("http://a.com/en", "en")),
        # fr page exists but names nobody back
        page("http://a.com/fr"),
    ], "url string, html string")
    got = {(r["url"], r["alt_url"]): r["reciprocal"]
           for r in hreflang_reciprocity(link_rels(pages)).collect()}
    assert got == {
        ("http://a.com/en", "http://a.com/de"): True,
        ("http://a.com/en", "http://a.com/fr"): False,
        ("http://a.com/de", "http://a.com/en"): True,
    }
