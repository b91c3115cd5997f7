"""Deterministic synthetic `pages` table — the engine's primary input shape.

Per BASELINE.json ``input_hint``: ``pages(url string, warc_ts timestamp,
html binary, text string, lang string)`` — a Common-Crawl-style lakehouse
table. Generated entirely with Spark-native expressions from ``spark.range``
(seedless: every column is a pure function of (url_id, sample_i) through md5,
so any scale factor regenerates bit-identically — FIXTURES.md F1).

Shape choices that exercise the engine:
 - domains are log-uniform over url ids → a few *hot* domains (skew/salting);
 - per-url sampling rate fs ∈ {1.0, 0.5} Hz-equivalent grids (off-nominal
   grids exercise the fractional bin law);
 - ~10% of grid points are deleted (md5-derived) → gap-fill has real gaps;
 - ``text`` is a pure function of the url ⇒ the per-row invariant "extracted
   text byte-identical per url" holds by construction and is asserted in
   tests;
 - ``html`` varies per crawl (text + per-fetch banner) so
   ``value = length(html)`` is a genuine per-row signal for rollups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EPOCH0 = 1_600_000_000  # 2020-09-13 UTC, fixed stream start


def _u01(col) -> "F.Column":
    """Deterministic pseudo-uniform in [0,1) from md5 of a column."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast("double") / F.lit(
        float(1 << 32)
    )


def generate_pages(
    spark: SparkSession,
    n_urls: int = 1000,
    samples_per_url: int = 120,
    n_domains: int = 50,
    gap_pct: int = 10,
    partitions: int | None = None,
) -> DataFrame:
    """Build the pages table: ~n_urls × samples_per_url rows (minus gaps)."""
    urls = spark.range(n_urls, numPartitions=partitions).select(
        F.col("id").alias("url_id"),
        # log-uniform domain → heavy skew toward low domain ids
        F.floor(
            F.exp(_u01(F.col("id") + F.lit(777)) * F.log(F.lit(float(n_domains)))) - 1
        ).cast("int").alias("domain_id"),
        # per-url sample period: 1s or 2s grids
        F.when((F.col("id") % 3) == 0, F.lit(2.0)).otherwise(F.lit(1.0)).alias("dt"),
    )
    urls = urls.select(
        "url_id",
        "dt",
        F.concat(
            F.lit("https://site"), F.col("domain_id").cast("string"), F.lit(".example/p/"),
            F.col("url_id").cast("string"),
        ).alias("url"),
        F.element_at(
            F.array(F.lit("en"), F.lit("de"), F.lit("fr"), F.lit("es"), F.lit("it")),
            (F.col("domain_id") % 5) + 1,
        ).alias("lang"),
        # text: pure function of url (byte-identical per url, invariant F1)
        F.concat(
            F.lit("the quick brown fox and the lazy dog of site "),
            F.col("url_id").cast("string"),
            F.lit(" "),
            F.repeat(F.md5(F.col("url_id").cast("string")), (F.col("url_id") % 20 + 1).cast("int")),
        ).alias("text"),
    )
    rows = urls.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(samples_per_url - 1))).alias("i")
    )
    # delete ~gap_pct% of grid points deterministically
    keep = (
        F.conv(F.substring(F.md5(F.concat_ws("_", "url_id", "i")), 1, 4), 16, 10).cast("int") % 100
    ) >= gap_pct
    rows = rows.filter(keep)
    ts = F.lit(EPOCH0) + F.col("i") * F.col("dt")
    html = F.concat(
        F.lit("<html><!-- crawl "),
        F.md5(F.concat_ws("#", "url_id", "i")),
        # variable-length crawl banner → per-row signal in length(html)
        F.repeat(F.lit("x"), (F.conv(F.substring(F.md5(F.concat_ws("@", "url_id", "i")), 1, 3), 16, 10) % 500).cast("int")),
        F.lit(" --><body>"),
        F.col("text"),
        F.lit("</body></html>"),
    )
    return rows.select(
        "url",
        F.timestamp_seconds(ts).alias("warc_ts"),
        html.cast("binary").alias("html"),
        "text",
        "lang",
    )
