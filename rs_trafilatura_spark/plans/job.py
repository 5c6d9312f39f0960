"""Spark job assembly: scan -> size-aware repartition -> Arrow-batched
kernel -> output (SURVEY.md §2.11, §4.2).

The kernel is ONE iterator-of-batches mapInPandas function: Arrow transport,
compiled regexes amortized per worker process, zero per-row Python dispatch
at the Spark level.  Distribution concerns are explicit and DataFrame-native:

- **size-aware repartitioning**: extraction cost scales with page size
  (reference README.md:258-260); hash-even repartitioning leaves heavy-tail
  pages stragglling a partition of small ones, so rows above a size
  threshold are split out and spread round-robin before the kernel runs.
- **host salting** is applied to any keyed operation on `host` via
  ``salted_host`` (zipfian host skew); the map-only kernel itself needs no
  key, so no shuffle-by-host ever happens on the hot path.
"""

from __future__ import annotations

from dataclasses import replace
from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from ..options import DEFAULT_OPTIONS, Options
from .schema import OUTPUT_COLUMNS, OUTPUT_SCHEMA

# pages larger than this go to the dedicated large-row partition set
LARGE_HTML_BYTES = 1_000_000
SALT_BUCKETS = 16


def make_extract_batches(opts: Options):
    """Build the mapInPandas kernel closure. `opts` is captured once and
    pickled once per task (an explicit broadcast is unnecessary for a
    small frozen dataclass; Spark ships task closures once per stage)."""

    def extract_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # heavy imports inside the worker, once per process
        from ..kernel.extract import extract_bytes

        for pdf in batches:
            out_rows = []
            urls = pdf["url"].tolist()
            htmls = pdf["html"].tolist()
            ts = pdf["warc_ts"].tolist() if "warc_ts" in pdf else [None] * len(urls)
            langs = pdf["lang"].tolist() if "lang" in pdf else [None] * len(urls)
            for url, html, warc_ts, lang in zip(urls, htmls, ts, langs):
                row_opts = opts if opts.url is None else opts
                res = extract_bytes(bytes(html), replace(row_opts, url=url))
                out_rows.append({
                    "url": url,
                    "warc_ts": warc_ts,
                    "content_text": res["content_text"],
                    "content_html": res["content_html"],
                    "content_markdown": res["content_markdown"],
                    "comments_text": res["comments_text"],
                    "comments_html": res["comments_html"],
                    "images": res["images"],
                    "title": res["title"],
                    "author": res["author"],
                    "canonical_url": res["url"],
                    "hostname": res["hostname"],
                    "description": res["description"],
                    "sitename": res["sitename"],
                    "date": res["date"],
                    "categories": res["categories"],
                    "tags": res["tags"],
                    "id": res["id"],
                    "fingerprint": res["fingerprint"],
                    "license": res["license"],
                    "language": res["language"] or lang,
                    "image": res["image"],
                    "page_type": res["page_type"],
                    "classification_confidence": res["classification_confidence"],
                    "extraction_quality": res["extraction_quality"],
                    "warnings": res["warnings"],
                    "spans": [
                        {"start": s, "end": e, "kind": k}
                        for s, e, k in res["spans"]
                    ],
                    "stage": res["stage"],
                })
            yield pd.DataFrame(out_rows, columns=OUTPUT_COLUMNS)

    return extract_batches


def salted_host(host_col, salt_col, buckets: int = SALT_BUCKETS):
    """Salted key for any host-keyed aggregation/join at corpus scale:
    concat(host, '#', pmod(hash(salt), N)) (SURVEY.md §4.2)."""
    return F.concat_ws("#", host_col, F.pmod(F.xxhash64(salt_col), F.lit(buckets)))


def size_aware_repartition(df: DataFrame, target_partitions: int,
                           large_threshold: int = LARGE_HTML_BYTES) -> DataFrame:
    """Split heavy-tail pages from the bulk so one 10 MB page doesn't
    straggle a partition of 100 KB pages, then round-robin each side.

    The split is one narrow projection (length() is codegen'd); both sides
    repartition round-robin — no key, no skew.
    """
    sized = df.withColumn("_html_size", F.length(F.col("html")))
    small = sized.filter(F.col("_html_size") <= large_threshold)
    large = sized.filter(F.col("_html_size") > large_threshold)
    n_large = max(2, target_partitions // 4)
    out = small.repartition(target_partitions).unionByName(
        large.repartition(n_large)
    )
    return out.drop("_html_size")


def run_extraction(
    spark: SparkSession,
    pages: DataFrame,
    options: Options = DEFAULT_OPTIONS,
    target_partitions: Optional[int] = None,
    repartition: bool = True,
) -> DataFrame:
    """The extraction pipeline: select only needed columns (column pruning
    reaches the scan), size-aware repartition, Arrow-batched kernel."""
    if target_partitions is None:
        target_partitions = spark.sparkContext.defaultParallelism
    cols = [c for c in ("url", "warc_ts", "html", "lang") if c in pages.columns]
    df = pages.select(*cols)
    if repartition:
        df = size_aware_repartition(df, target_partitions)
    return df.mapInPandas(make_extract_batches(options), schema=OUTPUT_SCHEMA)


def stage_metrics(extracted: DataFrame) -> DataFrame:
    """Corpus-level stage metrics (SURVEY.md §4.3): rows + mean quality per
    extraction stage. Plain hash aggregation, partial+final by Catalyst."""
    return (
        extracted.groupBy("stage")
        .agg(
            F.count("*").alias("n_pages"),
            F.avg("extraction_quality").alias("avg_quality"),
            F.expr("percentile_approx(extraction_quality, 0.5)").alias("p50_quality"),
        )
        .orderBy(F.desc("n_pages"))
    )
