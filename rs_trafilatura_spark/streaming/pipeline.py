"""Structured Streaming variant of the extraction pipeline (SURVEY.md §2.10).

The reference has no streaming operators (its spider channel is the caller's
concern, README.md:196-212); this is the engine's forward path: readStream
on the pages table -> the SAME mapInPandas kernel -> sink, with a watermark
on warc_ts for late data and dropDuplicates(url) within the watermark as the
streaming generalization of the LRU dedup (SURVEY.md §2.12).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

from ..options import DEFAULT_OPTIONS, Options
from ..plans.job import make_extract_batches
from ..plans.schema import OUTPUT_SCHEMA

PAGES_SCHEMA = T.StructType([
    T.StructField("url", T.StringType(), False),
    T.StructField("warc_ts", T.TimestampType(), False),
    T.StructField("html", T.BinaryType(), False),
    T.StructField("text", T.StringType(), True),
    T.StructField("lang", T.StringType(), True),
])


def read_pages_stream(spark: SparkSession, input_path: str,
                      max_files_per_trigger: int = 8) -> DataFrame:
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_path)
    )


def extraction_stream(
    pages_stream: DataFrame,
    options: Options = DEFAULT_OPTIONS,
    watermark: str = "10 minutes",
    dedup_urls: bool = True,
) -> DataFrame:
    """Streaming extraction: watermark late crawls, drop duplicate urls
    within the watermark, then the batch kernel unchanged."""
    df = pages_stream.withWatermark("warc_ts", watermark)
    if dedup_urls:
        df = df.dropDuplicates(["url"])
    df = df.select("url", "warc_ts", "html", "lang")
    return df.mapInPandas(make_extract_batches(options), schema=OUTPUT_SCHEMA)


def run_stream_to_memory(spark: SparkSession, input_path: str,
                         query_name: str = "extracted",
                         options: Options = DEFAULT_OPTIONS):
    """Drive a bounded backlog to completion synchronously (local smoke);
    production sinks swap in .format('parquet')/foreachBatch."""
    stream = extraction_stream(read_pages_stream(spark, input_path), options)
    q = (
        stream.writeStream.outputMode("append")
        .format("memory").queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.sql(f"SELECT * FROM {query_name}")


def windowed_stage_metrics_stream(
    extracted_stream: DataFrame,
    window_len: str = "10 minutes",
    watermark: str = "10 minutes",
    set_watermark: bool = True,
) -> DataFrame:
    """Watermarked tumbling-window stage metrics over the extraction
    stream: the streaming form of plans.stage_metrics.  Late crawl records
    beyond the watermark are dropped; in append mode a window emits once,
    when the watermark passes its end — the standard late-data windowed
    aggregation shape (SURVEY.md §2.10).  Pass ``set_watermark=False`` when
    the upstream already watermarked warc_ts (e.g. ``extraction_stream``):
    Spark disallows redefining a watermark."""
    df = extracted_stream
    if set_watermark:
        df = df.withWatermark("warc_ts", watermark)
    return (
        df
        .groupBy(F.window("warc_ts", window_len), F.col("stage"))
        .agg(F.count("*").alias("n_pages"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "stage", "n_pages",
        )
    )


def read_warc_stream(spark: SparkSession, input_path: str,
                     max_files_per_trigger: int = 4) -> DataFrame:
    """readStream over a GROWING directory of ``*.warc.gz`` crawl archives
    — the live-crawler ingest: each micro-batch picks up newly landed
    archive files (binaryFile streaming source, one row per new file),
    parses them with the same bounded parser the batch WARC source uses,
    and emits pages rows (url, warc_ts, html, lang).

    Scale notes: ``maxFilesPerTrigger`` bounds a micro-batch to a few
    archives; one archive's bytes live in one task (the binaryFile
    contract — CC's ~1 GB files fit comfortably under Spark's 2 GB row
    limit, and the parse itself streams record-by-record).  Malformed
    records are skipped, never raised, so one truncated upload cannot
    wedge the stream."""
    from ..sources.warc import PAGES_SCHEMA as WARC_PAGES_SCHEMA
    from ..sources.warc import parse_warc_stream

    raw = (
        spark.readStream.format("binaryFile")
        .schema("path STRING, modificationTime TIMESTAMP, "
                "length LONG, content BINARY")
        .option("pathGlobFilter", "*.warc*")
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .load(input_path)
    )

    def parse(batches):
        import gzip as _gzip
        import io as _io

        import pyarrow as pa
        from pyspark.sql.pandas.types import to_arrow_schema

        arrow_schema = to_arrow_schema(WARC_PAGES_SCHEMA)
        buf: list[dict] = []
        for batch in batches:
            for content in batch.column(batch.schema.names.index("content")):
                blob = content.as_py()
                if blob[:2] == b"\x1f\x8b":
                    stream = _io.BufferedReader(
                        _gzip.GzipFile(fileobj=_io.BytesIO(blob)))
                else:
                    stream = _io.BufferedReader(_io.BytesIO(blob))
                with stream:
                    for rec in parse_warc_stream(stream):
                        buf.append(rec)
                        if len(buf) >= 256:
                            yield pa.RecordBatch.from_pylist(
                                buf, schema=arrow_schema)
                            buf = []
        if buf:
            yield pa.RecordBatch.from_pylist(buf, schema=arrow_schema)

    return raw.select("content").mapInArrow(parse, schema=WARC_PAGES_SCHEMA)


def run_warc_stream_to_memory(spark: SparkSession, input_path: str,
                              query_name: str = "warc_extracted",
                              options: Options = DEFAULT_OPTIONS):
    """Drive a bounded WARC-archive backlog to completion: archive files
    -> streaming parse -> watermark + url dedup -> the SAME kernel ->
    memory sink.  Production swaps the sink for parquet/foreachBatch."""
    stream = extraction_stream(read_warc_stream(spark, input_path), options)
    q = (
        stream.writeStream.outputMode("append")
        .format("memory").queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.sql(f"SELECT * FROM {query_name}")
