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

__all__ = ["extract_sitemap_urls", "detect_charset"]


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


def detect_charset(html: Column, default: str = "utf-8") -> Column:
    """Sniff the charset of raw fetched bytes: BOM first (UTF-8 /
    UTF-16 LE/BE), then the HTML5 ``<meta charset>`` /
    ``http-equiv Content-Type`` declarations in the first 1024 bytes
    (the HTML5 prescan window), else ``default``.  Returns a
    lowercase charset name column.

    The byte prefix is decoded as latin-1 for the regex scan —
    every byte maps to a codepoint, so declarations survive whatever
    the true encoding is (ASCII-compatible encodings, which is what
    meta declarations are for)."""
    prefix = F.substring(html, 1, 1024)
    head = F.lower(F.decode(prefix, "ISO-8859-1"))
    meta = F.regexp_extract(
        head, r"""<meta[^>]*charset\s*=\s*["']?\s*([a-z0-9_.:-]+)""",
        1)
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
