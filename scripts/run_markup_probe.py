"""One-off scale probe for the markup-extraction family: 120k
synthetic pages (~6-8 KB each, realistic tag mix) through
jsonld_triples / meta_tags / html_tables. The extractors are pure
narrow maps, so the number that matters is per-core page throughput
— evidence for the PLANS.md "markup extraction" note.

Usage:
    python scripts/run_markup_probe.py [n_pages]
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
if os.path.isdir("/dev/shm"):
    os.environ.setdefault("SPARK_GRAFT_LOCAL_DIR",
                          "/dev/shm/spark_local")
os.environ["PYTHONPATH"] = os.pathsep.join(
    p for p in (os.environ.get("PYTHONPATH"), REPO) if p)

from pyspark.sql import functions as F

from neleval_spark import get_spark
from neleval_spark.functions.discovery import (
    canonical_map, extract_feed_entries, link_rels)
from neleval_spark.pipeline.markup import (
    html_tables, jsonld_triples, meta_tags)

n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 120_000
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

spark = get_spark(app_name="probe_markup", master=f"local[{CPUS}]",
                  shuffle_partitions=2 * CPUS, driver_memory="24g")
d = F.col("id")
ds = d.cast("string")

# ~6-8 KB page: filler prose, 2 JSON-LD blocks (one @graph), 4 meta
# tags, a 6x3 data table, a nested layout table the extractor must
# terminate early on
filler = F.concat(
    F.lit("<p>"),
    F.repeat(F.concat(F.lit("lorem ipsum w"), (d % 97).cast("string"),
                      F.lit(" ")), 120),
    F.lit("</p>"))
jsonld = F.concat(
    F.lit('<script type="application/ld+json">{"@id":"e'), ds,
    F.lit('","@type":"Article","name":"n'), (d % 7).cast("string"),
    F.lit('","words":'), (d % 1000).cast("string"),
    F.lit(',"author":{"@type":"Person","name":"a'),
    (d % 13).cast("string"),
    F.lit('"},"keywords":["k1","k2","k3"]}</script>'
          '<script type="application/ld+json">'
          '{"@graph":[{"@id":"g1","p":1},{"@id":"g2","q":"v"},'
          '{"r":[1,2,3]}]}</script>'))
meta = F.concat(
    F.lit('<meta property="og:title" content="T'), ds,
    F.lit('"/><meta name="description" content="d &amp; '),
    (d % 9).cast("string"),
    F.lit('"><meta charset="utf-8">'
          '<meta property="og:type" content="article">'
          '<link rel="canonical" href="https://c.org/p'),
    (d % 1000).cast("string"),
    F.lit('"><link href="https://c.org/de" rel="alternate" '
          'hreflang="de">'))
rows6 = F.concat(*[
    F.concat(F.lit(f"<tr><td>r{r}c0-"), (d % 11).cast("string"),
             F.lit(f"</td><td><b>r{r}c1</b></td><td>"),
             ((d + r) % 5).cast("string"), F.lit("</td></tr>"))
    for r in range(6)])
table = F.concat(
    F.lit("<table><tr><th>a</th><th>b</th><th>c</th></tr>"),
    rows6, F.lit("</table><table><tr><td>layout</td></tr></table>"))
pages = (spark.range(n_pages).repartition(2 * CPUS)
         .select(F.concat(F.lit("u"), ds).alias("url"),
                 F.concat(F.lit("<html><head>"), meta, jsonld,
                          F.lit("</head><body>"), filler, table,
                          F.lit("</body></html>")).alias("html")))
pages.write.mode("overwrite").parquet("/tmp/markup_probe_pages")
pages = spark.read.parquet("/tmp/markup_probe_pages")
sz = pages.agg(F.avg(F.length("html"))).collect()[0][0]
print(f"pages: {n_pages}, avg html {sz:.0f} B")

# a 10-item feed per "site" (n_pages/10 feeds)
feeds = (spark.range(max(n_pages // 10, 1)).repartition(2 * CPUS)
         .select(
             F.concat(F.lit("https://h"), F.col("id").cast("string"),
                      F.lit(".org/feed")).alias("url"),
             F.concat(
                 F.lit("<rss><channel>"),
                 F.concat(*[F.concat(
                     F.lit("<item><title><![CDATA[t"),
                     ((F.col("id") + i) % 31).cast("string"),
                     F.lit(" &amp; x]]></title><link>https://h"),
                     F.col("id").cast("string"), F.lit(".org/a"),
                     F.lit(str(i)),
                     F.lit("</link><pubDate>Tue, 19 Aug 2025 10:0"),
                     F.lit(str(i)),
                     F.lit(":00 GMT</pubDate></item>"))
                     for i in range(10)]),
                 F.lit("</channel></rss>")).alias("body")))
feeds.write.mode("overwrite").parquet("/tmp/markup_probe_feeds")
feeds = spark.read.parquet("/tmp/markup_probe_feeds")

# count() would let Catalyst PRUNE the value projections (only the
# explode chain would run); hash-aggregate over every output column
# to force full evaluation.  3 reps, fresh lineage each (salt), JIT
# warmup rep dropped, best reported (CLAUDE.md noise model).
for name, fn in (("jsonld_triples", jsonld_triples),
                 ("meta_tags", meta_tags),
                 ("html_tables", html_tables),
                 ("link_rels", link_rels),
                 ("canonical_map", canonical_map),
                 ("feed_entries",
                  lambda p: extract_feed_entries(feeds))):
    out = fn(pages)
    cols = out.columns
    times, n = [], None
    for rep in range(3):
        t0 = time.perf_counter()
        n = out.groupBy().agg(
            F.count(F.lit(1)).alias("n"),
            F.bit_xor(F.xxhash64(*cols, F.lit(rep))).alias("h")
        ).collect()[0]["n"]
        times.append(time.perf_counter() - t0)
    dt = min(times[1:])
    reps = [round(t, 1) for t in times]
    print(f"{name}: {n} rows, best {dt:.1f} s of {reps} "
          f"({n_pages / dt:.0f} pages/s, "
          f"{n_pages / dt / CPUS:.0f} pages/s/core)")

spark.stop()
