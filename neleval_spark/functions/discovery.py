"""Crawl discovery & decoding helpers: sitemap URL extraction and
charset sniffing — the two steps between "fetched bytes" and "page
table rows" that every crawl pipeline needs and the reference (an
evaluation toolkit) never had.

Both are pure whole-stage-codegen column expressions — no UDF, no
shuffle; they scale with input splits like any narrow projection.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["extract_sitemap_urls", "detect_charset", "link_rels",
           "canonical_map", "extract_feed_entries",
           "hreflang_reciprocity"]


def extract_sitemap_urls(sitemaps: DataFrame, url: str = "url",
                         body: str = "body") -> DataFrame:
    """sitemap.xml rows (url, body) → one row per discovered url:
    (sitemap_url, loc, kind) where kind marks nested sitemap indexes
    (``<sitemap><loc>``) vs page entries (``<url><loc>``).

    ONE regexp_extract_all + explode per sitemap — the explode's
    output is the discovery list's own cardinality (the same
    "inherent explode" contract as linkgraph.extract_links).  Nested
    indexes are returned, not followed: fetching is the crawler
    loop's job; re-feed the fetched children through this function.
    XML entities in loc values are unescaped per the sitemap protocol
    (&amp; etc. — sitemap locs must be entity-escaped XML text).

    The match is anchored to ONE complete element
    (``<url>…</url>`` / ``<sitemap>…</sitemap>``, non-greedy to the
    matching close tag) so a loc-less element — e.g.
    ``<url><priority>…</priority></url>`` — can never absorb the
    NEXT element's ``<loc>`` (which would misclassify its kind and
    drop a discovered url).  Lookahead-free on purpose: the DuckDB
    oracle replays the identical pattern under RE2.
    """
    # one complete element per hit; loc-less elements yield loc=''
    pat = r"(?s)<sitemap>.*?</sitemap>|<url>.*?</url>"
    pairs = F.regexp_extract_all(
        F.col(body), F.lit(pat), F.lit(0))
    exploded = sitemaps.select(
        F.col(url).alias("sitemap_url"),
        F.explode(pairs).alias("hit"))
    kind = F.when(F.regexp_extract("hit", r"^<(\w+)>", 1) == "sitemap",
                  F.lit("sitemap")).otherwise(F.lit("page"))
    loc = F.regexp_extract("hit", r"(?s)<loc>\s*(.*?)\s*</loc>", 1)
    unescaped = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(
                    F.regexp_replace(loc, "&lt;", "<"),
                    "&gt;", ">"),
                "&quot;", "\""),
            "&apos;", "'"),
        "&amp;", "&")  # &amp; LAST so &amp;lt; round-trips correctly
    return exploded.select(
        "sitemap_url",
        unescaped.alias("loc"),
        kind.alias("kind"),
    ).where(F.col("loc") != "")


_FEED_ENTRY_RE = r"(?s)<item[\s>].*?</item>|<entry[\s>].*?</entry>"
_CDATA_RE = r"(?s)^<!\[CDATA\[(.*)\]\]>$"
# &amp; LAST so "&amp;lt;" decodes to the literal "&lt;"
_ENTITIES_XML = [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                 ("&apos;", "'"), ("&amp;", "&")]


def extract_feed_entries(feeds: DataFrame, url: str = "url",
                         body: str = "body") -> DataFrame:
    """RSS/Atom feed rows (url, body) → one row per entry:
    (feed_url, entry, kind, title, link, published) — the third
    discovery source next to sitemaps and <link> relations, and the
    freshness signal: a feed names exactly the urls that changed, so
    its links re-enter the crawl frontier without a full re-sweep.

    ``kind`` is rss (<item>) or atom (<entry>); ``link`` is the RSS
    <link> text or the Atom <link href>; ``published`` is the RAW
    <pubDate>/<published>/<updated> text (RFC-822 vs ISO-8601 parsing
    is the caller's policy — ``F.try_to_timestamp`` both, keep the
    one that lands).  Titles are CDATA-unwrapped and entity-decoded.
    Same one-regexp+posexplode narrow contract as
    ``extract_sitemap_urls``: anchored to ONE complete element so a
    link-less entry can never absorb its neighbor's fields.
    """
    entries = feeds.select(
        F.col(url).alias("feed_url"),
        F.posexplode(F.regexp_extract_all(
            F.col(body).cast("string"), F.lit(_FEED_ENTRY_RE),
            F.lit(0))).alias("entry", "_e"))
    # stage the raw title: branched below (CollapseProject keeps the
    # multi-referenced extract)
    entries = entries.withColumn("_traw", F.trim(F.regexp_extract(
        "_e", r"(?s)<title[^>]*>\s*(.*?)\s*</title>", 1)))
    kind = F.when(F.regexp_extract("_e", r"^<(\w+)", 1) == "item",
                  F.lit("rss")).otherwise(F.lit("atom"))
    # CDATA content is LITERAL text per XML — unwrap only; entity
    # decoding applies to the ordinary (parsed-text) branch alone
    decoded = F.col("_traw")
    for ent, ch in _ENTITIES_XML:
        decoded = F.replace(decoded, F.lit(ent), F.lit(ch))
    title = F.when(F.col("_traw").rlike(r"^<!\[CDATA\["),
                   F.regexp_replace("_traw", _CDATA_RE, "$1")
                   ).otherwise(decoded)
    link = F.coalesce(
        F.nullif(F.regexp_extract(
            "_e", r"(?s)<link\s*>\s*(.*?)\s*</link>", 1), F.lit("")),
        F.nullif(F.regexp_extract(
            "_e", r'(?is)<link\b[^>]*\bhref\s*=\s*["\']([^"\']*)'
                  r'["\']', 1), F.lit("")))
    published = F.trim(F.regexp_extract(
        "_e",
        r"(?s)<(?:pubDate|published|updated)[^>]*>\s*(.*?)\s*</", 1))
    return (entries.select(
        "feed_url", "entry", kind.alias("kind"),
        title.alias("title"), link.alias("link"),
        published.alias("published"))
        .where(F.col("link").isNotNull()))


_LINK_TAG_RE = r"(?is)<link\b[^>]*>"
# attribute names anchored to a preceding whitespace/quote — a \b
# matches after a hyphen, so data-href=/data-rel= lookalikes would
# otherwise win the first match.  hreflang is matched before the
# shorter href can (distinct patterns, no overlap issue), and
# rel/href never match inside another attribute's NAME.
_REL_RE = r'(?is)(?:^|[\s"\'])rel\s*=\s*["\']([^"\']+)["\']'
_HREF_RE = r'(?is)(?:^|[\s"\'])href\s*=\s*["\']([^"\']*)["\']'
_HREFLANG_RE = (r'(?is)(?:^|[\s"\'])hreflang\s*=\s*'
                r'["\']([^"\']+)["\']')


def link_rels(pages: DataFrame, url: str = "url",
              html: str = "html") -> DataFrame:
    """<link> relation extraction: one row per <link> element that
    carries both a quoted ``rel`` and ``href`` attribute —
    (url, tag, rel, href, href_abs, hreflang).  ``href`` is the raw
    attribute; ``href_abs`` resolves it against the page url
    (linkgraph's RFC-3986 common cases; NULL when unresolvable,
    e.g. other schemes).  Covers the crawl-relevant relations —
    canonical, alternate+hreflang, prev/next, amphtml — without
    filtering: the caller selects.

    Same narrow contract as extract_links: one regexp_extract_all +
    posexplode, attribute order free, zero shuffles.
    """
    from .linkgraph import _resolve

    tags = pages.select(
        F.col(url).alias("url"),
        F.posexplode(F.regexp_extract_all(
            F.col(html).cast("string"), F.lit(_LINK_TAG_RE),
            F.lit(0))).alias("tag", "_t"))
    out = tags.select(
        "url", "tag",
        F.lower(F.regexp_extract("_t", _REL_RE, 1)).alias("rel"),
        F.regexp_extract("_t", _HREF_RE, 1).alias("href"),
        F.lower(F.regexp_extract("_t", _HREFLANG_RE, 1))
         .alias("hreflang"))
    return (out.where((F.col("rel") != "") & (F.col("href") != ""))
            .withColumn("href_abs",
                        _resolve(F.col("href"), F.col("url")))
            .select("url", "tag", "rel", "href", "href_abs",
                    "hreflang"))


def canonical_map(pages: DataFrame, url: str = "url",
                  html: str = "html") -> DataFrame:
    """(url, canonical): the page's ``rel=canonical`` target resolved
    against the page url, falling back to the page url itself when
    absent or unresolvable — the join/group key for canonical
    consolidation (the crawl-side dedup the exact/near-dup family
    composes with: ``groupBy("canonical")`` collapses print views,
    tracking-parameter variants and mirrored paths the moment the
    publisher declares them).

    IN-ROW extraction, not an aggregate: the first match of each of
    the two attribute orders (rel-before-href, href-before-rel) is
    taken with rel-first preferred — one page yields one row with no
    exchange at any scale.  A page with several canonical tags in
    CONFLICTING attribute orders resolves by that preference rather
    than document order (pathological; deterministic either way).
    """
    from .linkgraph import _resolve

    h = F.col(html).cast("string")
    # [\s"'] anchors before rel/href, not \b: '-' is a word
    # boundary, so \b would let data-rel=/data-href= match
    pat1 = (r'(?is)<link\b[^>]*[\s"\']rel\s*=\s*["\']canonical["\']'
            r'[^>]*[\s"\']href\s*=\s*["\']([^"\']*)["\']')
    pat2 = (r'(?is)<link\b[^>]*[\s"\']href\s*=\s*["\']([^"\']*)'
            r'["\'][^>]*[\s"\']rel\s*=\s*["\']canonical["\']')
    href = F.coalesce(F.nullif(F.regexp_extract(h, pat1, 1), F.lit("")),
                      F.nullif(F.regexp_extract(h, pat2, 1), F.lit("")))
    staged = pages.select(F.col(url).alias("url"), href.alias("_href"))
    return staged.select(
        "url",
        F.coalesce(_resolve(F.col("_href"), F.col("url")),
                   F.col("url")).alias("canonical"))


def hreflang_reciprocity(links: DataFrame) -> DataFrame:
    """Validate hreflang clusters over `link_rels` output: one row
    per alternate annotation — (url, alt_url, hreflang, reciprocal).

    The hreflang contract (Google's documented requirement) is
    RECIPROCITY: if A names B as its de alternate, B must name A
    back (any language), or the annotation is ignored — a
    non-reciprocal row is the standard crawl-quality signal for
    broken language clusters, and the `reciprocal=false` slice is
    the fix-list.

    Scale shape: the check is ONE equi-join of the alternate edge
    set against its own reversal on the composite (url, alt_url)
    pair key — both sides are the same size, neither broadcast, and
    the pair key has no hub side (a hub PAGE fans out over distinct
    pairs).  Self-references are dropped (trivially reciprocal,
    pure noise).
    """
    alts = (links.where(
        (F.col("rel") == "alternate") & (F.col("hreflang") != "")
        & F.col("href_abs").isNotNull()
        & (F.col("href_abs") != F.col("url")))
        .select("url", F.col("href_abs").alias("alt_url"),
                "hreflang")
        .distinct())
    back = alts.select(F.col("alt_url").alias("url"),
                       F.col("url").alias("alt_url")).distinct() \
        .withColumn("_r", F.lit(1))
    return (alts.join(back, ["url", "alt_url"], "left")
            .select("url", "alt_url", "hreflang",
                    F.col("_r").isNotNull().alias("reciprocal")))


def detect_charset(html: Column, default: str = "utf-8") -> Column:
    """Sniff the charset of raw fetched bytes: BOM first (UTF-8 /
    UTF-16 LE/BE), then the HTML5 ``<meta charset>`` /
    ``http-equiv Content-Type`` declarations in the first 1024 bytes
    (the HTML5 prescan window), else ``default``.  Returns a
    lowercase charset name column.

    The byte prefix is decoded as latin-1 for the regex scan —
    every byte maps to a codepoint, so declarations survive whatever
    the true encoding is (ASCII-compatible encodings, which is what
    meta declarations are for).

    A ``charset=`` inside an unrelated attribute VALUE (e.g. a
    description mentioning one) must not win: candidate <meta> tags
    are quote-stripped first, and only a tag where ``charset=``
    survives outside every quoted span — i.e. a genuine charset
    attribute or an http-equiv content value (whose ``charset=`` is
    what the prescan honors) — is consulted.  The per-tag filter is
    a higher-order function over ≤ a handful of tags in the 1 KB
    window, so the interpreted-per-element cost is bounded."""
    prefix = F.substring(html, 1, 1024)
    head = F.lower(F.decode(prefix, "ISO-8859-1"))
    def _is_decl(t):
        stripped = F.regexp_replace(t, """\"[^\"]*\"|'[^']*'""", "")
        return (stripped.rlike(r"""[\s"']charset\s*=""")
                | (stripped.rlike("http-equiv")
                   & t.rlike(r"charset\s*=")))

    decl = F.filter(
        F.regexp_extract_all(head, F.lit(r"<meta[^>]*>"), F.lit(0)),
        _is_decl)
    meta = F.regexp_extract(
        F.coalesce(F.try_element_at(decl, F.lit(1)), F.lit("")),
        r"""charset\s*=\s*["']?\s*([a-z0-9_.:-]+)""", 1)
    bom8 = F.lit(bytes([0xEF, 0xBB, 0xBF]))
    bom16le = F.lit(bytes([0xFF, 0xFE]))
    bom16be = F.lit(bytes([0xFE, 0xFF]))
    return (
        F.when(F.substring(html, 1, 3) == bom8, F.lit("utf-8"))
        .when(F.substring(html, 1, 2) == bom16le, F.lit("utf-16-le"))
        .when(F.substring(html, 1, 2) == bom16be, F.lit("utf-16-be"))
        .when(meta != "", meta)
        .otherwise(F.lit(default.lower()))
    )
