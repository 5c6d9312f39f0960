#!/usr/bin/env python
"""Optimization-round helper bench (bench.py is FROZEN for measurement —
this file is for isolating single queries with the noop sink, guide §1.4).

Usage:
    python bench_extra.py q1 [q2 ...]        # declared queries, noop sink
    python bench_extra.py --curation         # curation_100k exact+estimate
    python bench_extra.py --extract          # extract passes only

Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32),
BENCH_REPEAT (default 2, best-of).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPEAT = int(os.environ.get("BENCH_REPEAT", "2"))


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    import __spark_entry__ as entry_mod
    from rs_trafilatura_spark.session import get_spark

    spark = get_spark(parallelism=CPUS, driver_memory="16g")
    entry_mod._ensure_pyfiles(spark)
    timings: dict[str, float] = {}
    args = [a for a in sys.argv[1:]]

    if "--curation" in args:
        from pyspark.sql import functions as F

        from rs_trafilatura_spark.datagen.corpus import (
            GENERATOR_VERSION, materialize_corpus,
        )
        from rs_trafilatura_spark.options import Options
        from rs_trafilatura_spark.plans.curate import (
            curate_pages, curation_report, mark_near_duplicates,
            release_cache,
        )

        n_pages = int(os.environ.get("BENCH_PAGES", "100000"))
        corpus = f"/tmp/rs_traf_bench_corpus_v{GENERATOR_VERSION}_{n_pages}_42_p256"
        if not os.path.exists(os.path.join(corpus, "_SUCCESS")):
            materialize_corpus(spark, corpus, n_pages, 42, partitions=256)
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(512 * 1024))
        spark.conf.set("spark.sql.files.openCostInBytes", str(64 * 1024))
        pages = spark.read.parquet(corpus)
        opts = Options(deduplicate=True)
        for method, key in (("exact", "curation_100k"),
                            ("estimate", "curation_100k_estimate")):
            best = float("inf")
            for _ in range(REPEAT):
                spark.sparkContext.setJobDescription(f"curation[{method}]")
                t0 = time.time()
                marked = mark_near_duplicates(
                    curate_pages(spark, pages, opts), method=method)
                curation_report(marked).collect()
                best = min(best, time.time() - t0)
                release_cache()
            timings[key] = round(best, 3)
        spark.sparkContext.setJobDescription(None)

    if "--extract" in args:
        from rs_trafilatura_spark.datagen.corpus import (
            GENERATOR_VERSION, materialize_corpus,
        )
        from rs_trafilatura_spark.options import Options
        from rs_trafilatura_spark.plans import run_extraction

        n_pages = int(os.environ.get("BENCH_PAGES", "100000"))
        corpus = f"/tmp/rs_traf_bench_corpus_v{GENERATOR_VERSION}_{n_pages}_42_p256"
        if not os.path.exists(os.path.join(corpus, "_SUCCESS")):
            materialize_corpus(spark, corpus, n_pages, 42, partitions=256)
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(512 * 1024))
        spark.conf.set("spark.sql.files.openCostInBytes", str(64 * 1024))
        pages = spark.read.parquet(corpus)
        opts = Options(deduplicate=True)
        run_extraction(spark, pages.limit(2000).repartition(CPUS), opts,
                       target_partitions=CPUS).groupBy("stage").count().collect()
        best = float("inf")
        for _ in range(REPEAT):
            t0 = time.time()
            run_extraction(spark, pages, opts, target_partitions=CPUS * 3) \
                .groupBy("stage").count().collect()
            best = min(best, time.time() - t0)
        timings["extract_pipeline"] = round(best, 3)

    names = [a for a in args if not a.startswith("--")]
    if names:
        q = entry_mod.queries()
        from pyspark.sql import functions as F

        for name in names:
            best = float("inf")
            for _ in range(REPEAT):
                spark.sparkContext.setJobDescription(name)
                t0 = time.time()
                df = q[name](spark, SF_DIR)
                df.select(
                    F.expr("bit_xor(xxhash64(" +
                           ", ".join(f"`{c}`" for c in df.columns) + "))")
                ).collect()
                best = min(best, time.time() - t0)
            timings[name] = round(best, 3)
        spark.sparkContext.setJobDescription(None)

    print(json.dumps({"queries": timings, "sf": SF_DIR, "cpus": CPUS}))
    spark.stop()


if __name__ == "__main__":
    main()
