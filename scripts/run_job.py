#!/usr/bin/env python
"""Production job entry — run via spark-submit:

    zip -r pkg.zip rs_trafilatura_spark/
    spark-submit --py-files pkg.zip scripts/run_job.py \\
        --input  /data/pages_parquet_or_iceberg \\
        --output /data/extracted \\
        --chunks 256 --dedup --comments --target-lang en

Reads the pages table (url, warc_ts, html, lang [, text]), runs the
extraction cascade checkpointed chunk-by-chunk (resume-safe: re-running
skips completed chunks via the manifest), prints per-stage metrics.

Iceberg note: pass --format iceberg (or a catalog identifier like
prod.web.pages, which auto-detects) with the Iceberg runtime jar on the
classpath; this container has no jar, so parquet paths are the tested
default.  Both branches build the same plan (sources/tables.py).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description="rs_trafilatura_spark extraction job")
    ap.add_argument("--input", required=True, help="pages table path")
    ap.add_argument("--output", required=True, help="output table path")
    ap.add_argument("--chunks", type=int, default=64,
                    help="checkpoint chunks (resume granularity)")
    ap.add_argument("--parallelism", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--dedup", action="store_true")
    ap.add_argument("--comments", action="store_true")
    ap.add_argument("--images", action="store_true")
    ap.add_argument("--markdown", action="store_true")
    ap.add_argument("--precision", action="store_true")
    ap.add_argument("--recall", action="store_true")
    ap.add_argument("--target-lang", default=None)
    ap.add_argument("--format", default=None,
                    choices=("iceberg", "parquet", "warc"),
                    help="input format (default: auto — catalog "
                         "identifiers read as iceberg, paths as parquet; "
                         "warc reads *.warc/.warc.gz crawl archives)")
    args = ap.parse_args()

    from rs_trafilatura_spark.options import Options
    from rs_trafilatura_spark.session import get_spark
    from rs_trafilatura_spark.sources import (
        read_output,
        read_pages,
        run_extraction_checkpointed,
    )
    from rs_trafilatura_spark.plans import stage_metrics

    spark = get_spark(parallelism=args.parallelism)
    opts = Options(
        deduplicate=args.dedup,
        include_comments=args.comments,
        include_images=args.images,
        output_markdown=args.markdown,
        favor_precision=args.precision,
        favor_recall=args.recall,
        target_language=args.target_lang,
    )
    if args.format == "warc":
        # stage the archives as a pages table first: the checkpointed
        # runner filters by url-hash chunk at the SOURCE, and a mapInArrow
        # WARC scan would re-parse every archive once per chunk.  Ingest
        # once -> parquet staging table -> chunked, resumable extraction
        # (the same two-step every warehouse ingest uses).
        from rs_trafilatura_spark.sources.warc import read_warc

        # staging dir is keyed on the RESOLVED INPUT too, not just the
        # output path: otherwise re-running with the same --output but a
        # different --input would silently reuse stale staged pages and
        # extract the wrong corpus
        import hashlib

        input_key = hashlib.md5(
            os.path.abspath(args.input).encode("utf-8")
        ).hexdigest()[:12]
        staging = (args.output.rstrip("/")
                   + f"_staged_pages_{input_key}")
        if not os.path.exists(os.path.join(staging, "_SUCCESS")):
            read_warc(spark, args.input).write.mode("overwrite") \
                .parquet(staging)
        else:
            print(f"reusing staged pages at {staging} "
                  f"(input {args.input}); delete to restage",
                  file=sys.stderr)
        pages = spark.read.parquet(staging)
    else:
        pages = read_pages(spark, args.input, fmt=args.format)

    summary = run_extraction_checkpointed(
        spark, pages, args.output, opts, n_chunks=args.chunks,
    )
    out = read_output(spark, args.output)
    metrics = [r.asDict() for r in stage_metrics(out).collect()]
    print(json.dumps({"summary": summary, "stage_metrics": metrics}, default=str))
    spark.stop()


if __name__ == "__main__":
    main()
