"""Spark job assembly: scan -> size-aware repartition -> Arrow-batched
kernel -> output (SURVEY.md §2.11, §4.2).

The kernel is ONE iterator-of-batches function over Arrow record batches
(``mapInArrow``): Arrow transport, compiled regexes amortized per worker
process, zero per-row Python dispatch at the Spark level.  Output batches
are built DIRECTLY as ``pyarrow`` arrays — measured ~2x cheaper than
routing each batch through a pandas DataFrame (object-dtype string columns
pay an extra python-object pass on the worker before Arrow encoding).
Distribution concerns are explicit and DataFrame-native:

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


# kernel result key -> output column (canonical_url renames `url`)
_RESULT_KEYS = [
    ("content_text", "content_text"), ("content_html", "content_html"),
    ("content_markdown", "content_markdown"),
    ("comments_text", "comments_text"), ("comments_html", "comments_html"),
    ("images", "images"), ("title", "title"), ("author", "author"),
    ("url", "canonical_url"), ("hostname", "hostname"),
    ("description", "description"), ("sitename", "sitename"),
    ("date", "date"), ("categories", "categories"), ("tags", "tags"),
    ("id", "id"), ("fingerprint", "fingerprint"), ("license", "license"),
    ("image", "image"), ("page_type", "page_type"),
    ("classification_confidence", "classification_confidence"),
    ("extraction_quality", "extraction_quality"),
    ("warnings", "warnings"), ("stage", "stage"),
]


def make_extract_batches(opts: Options):
    """Build the mapInPandas kernel closure (used by the STREAMING pipeline;
    the batch path uses the cheaper Arrow-native variant below). `opts` is
    captured once and pickled once per task (an explicit broadcast is
    unnecessary for a small frozen dataclass; Spark ships task closures
    once per stage)."""

    def extract_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # heavy imports inside the worker, once per process
        from ..kernel.extract import _empty_result, extract_bytes

        def safe_extract(url: str, html) -> dict:
            # a single pathological page must never fail the task: at
            # 10^12 documents *something* will hit an unforeseen code path;
            # degrade to an empty row carrying the error as lineage
            try:
                return extract_bytes(bytes(html), replace(opts, url=url))
            except ImportError:
                # missing shipped module = broken deployment, not a bad
                # page: degrading 10^12 rows to 'error' would be far worse
                # than failing the task
                raise
            except Exception as exc:  # noqa: BLE001 - deliberate broad guard
                res = _empty_result(
                    [f"kernel error: {type(exc).__name__}: {exc}"[:500]]
                )
                res["stage"] = "error"
                return res

        for pdf in batches:
            urls = pdf["url"].tolist()
            htmls = pdf["html"].tolist()
            n = len(urls)
            ts = pdf["warc_ts"].tolist() if "warc_ts" in pdf else [None] * n
            langs = pdf["lang"].tolist() if "lang" in pdf else [None] * n
            results = [
                safe_extract(url, html) for url, html in zip(urls, htmls)
            ]
            # columnar assembly (dict-of-lists) — cheaper than row dicts
            data: dict = {"url": urls, "warc_ts": ts}
            for rkey, col in _RESULT_KEYS:
                data[col] = [r[rkey] for r in results]
            data["language"] = [
                r["language"] or lang for r, lang in zip(results, langs)
            ]
            data["spans"] = [
                [{"start": s, "end": e, "kind": k} for s, e, k in r["spans"]]
                for r in results
            ]
            yield pd.DataFrame(data, columns=OUTPUT_COLUMNS)

    return extract_batches


def _result_arrays(urls: list, ts, langs: list, results: list[dict],
                   schema) -> list:
    """Columnar assembly of kernel results as pyarrow arrays in
    OUTPUT_SCHEMA order.  ``ts`` may be a pyarrow array (zero-copy
    pass-through from the input batch) or a python list."""
    import pyarrow as pa

    by_name = {f.name: f.type for f in schema}
    cols: dict = {"url": pa.array(urls, pa.string())}
    if isinstance(ts, (pa.Array, pa.ChunkedArray)):
        # zero-copy pass-through; cast only when the source file stored a
        # different timestamp resolution/zone than Spark's session type
        cols["warc_ts"] = (
            ts if ts.type == by_name["warc_ts"] else ts.cast(by_name["warc_ts"])
        )
    else:
        cols["warc_ts"] = pa.array(ts, by_name["warc_ts"])
    for rkey, col in _RESULT_KEYS:
        typ = by_name[col]
        cols[col] = pa.array([r[rkey] for r in results], typ)
    cols["language"] = pa.array(
        [r["language"] or lang for r, lang in zip(results, langs)],
        pa.string(),
    )
    cols["spans"] = pa.array(
        [
            [{"start": s, "end": e, "kind": k} for s, e, k in r["spans"]]
            for r in results
        ],
        by_name["spans"],
    )
    return [cols[name] for name in OUTPUT_COLUMNS]


def make_extract_arrow_batches(opts: Options):
    """Arrow-native kernel for ``mapInArrow``: consumes input record
    batches (url, warc_ts?, html, lang?), emits OUTPUT_SCHEMA batches."""

    def extract_arrow_batches(batches):
        import pyarrow as pa
        from pyspark.sql.pandas.types import to_arrow_schema

        from ..kernel.extract import _empty_result, extract_bytes
        from .schema import OUTPUT_SCHEMA

        out_schema = to_arrow_schema(OUTPUT_SCHEMA)

        def safe_extract(url: str, html) -> dict:
            # a single pathological page must never fail the task (see
            # make_extract_batches)
            try:
                return extract_bytes(bytes(html), replace(opts, url=url))
            except ImportError:
                raise
            except Exception as exc:  # noqa: BLE001 - deliberate broad guard
                res = _empty_result(
                    [f"kernel error: {type(exc).__name__}: {exc}"[:500]]
                )
                res["stage"] = "error"
                return res

        for batch in batches:
            names = batch.schema.names
            urls = batch.column(names.index("url")).to_pylist()
            htmls = batch.column(names.index("html")).to_pylist()
            n = batch.num_rows
            ts = (
                batch.column(names.index("warc_ts"))
                if "warc_ts" in names else [None] * n
            )
            langs = (
                batch.column(names.index("lang")).to_pylist()
                if "lang" in names else [None] * n
            )
            results = [safe_extract(u, h) for u, h in zip(urls, htmls)]
            yield pa.RecordBatch.from_arrays(
                _result_arrays(urls, ts, langs, results, out_schema),
                schema=out_schema,
            )

    return extract_arrow_batches


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
    repartition: bool = False,
) -> DataFrame:
    """The extraction pipeline: select only needed columns (column pruning
    reaches the scan), then the Arrow-batched kernel.

    By default the kernel maps DIRECTLY on the scan's partitions: parquet
    splits are byte-bounded (spark.sql.files.maxPartitionBytes), so task
    cost is already balanced by input bytes — which is what extraction cost
    tracks (reference README.md:258-260) — and a full shuffle of page HTML
    at 100 TB is exactly the bottleneck to avoid.  Set ``repartition=True``
    for pathologically partitioned inputs (e.g. the output of a join or a
    few huge row-groups), which routes through size_aware_repartition.
    """
    if target_partitions is None:
        target_partitions = spark.sparkContext.defaultParallelism
    cols = [c for c in ("url", "warc_ts", "html", "lang") if c in pages.columns]
    df = pages.select(*cols)
    if repartition:
        df = size_aware_repartition(df, target_partitions)
    elif df.rdd.getNumPartitions() < max(2, target_partitions // 2):
        # too few input splits to use the cluster: one-time spread
        df = df.repartition(target_partitions)
    return df.mapInArrow(make_extract_arrow_batches(options),
                         schema=OUTPUT_SCHEMA)


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
