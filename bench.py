#!/usr/bin/env python
"""Benchmark harness: headline extraction throughput + operator timings.

Runs at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ...,
   "pages_per_sec": ..., "n_pages": ..., "cpus": ...}

The extraction corpus is the deterministic synthetic fixture mix
(FIXTURES.md), materialized in parallel once and cached under /tmp, so
repeated runs (and the N-vs-4N scaling comparison in
scripts/scaling_bench.py) see identical input.  A small warmup batch runs
first so the timed number is steady-state throughput (Python workers
forked, package imported, regexes compiled) rather than JVM/worker
startup.  BENCH_PAGES overrides the page count.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_PAGES = int(os.environ.get("BENCH_PAGES", "100000"))
SEED = 42
# one split per ~0.5MB corpus file -> cores*4 partitions -> smooth task waves
FINE_SPLIT = str(512 * 1024)


def main() -> None:
    from rs_trafilatura_spark.datagen.corpus import materialize_corpus
    from rs_trafilatura_spark.options import Options
    from rs_trafilatura_spark.plans import run_extraction
    from rs_trafilatura_spark.session import get_spark, MAX_PARTITION_BYTES
    import __spark_entry__ as entry_mod

    # 16g, not 48g: local-mode driver heap IS the executor heap, and an
    # oversized heap turns post-extract garbage into multi-ten-second full
    # GC pauses that land on whatever query runs next (measured 33s vs 12s
    # for the same LSH query after the extract pass at 48g vs 16g)
    spark = get_spark(parallelism=CPUS, driver_memory="16g")
    entry_mod._ensure_pyfiles(spark)

    from rs_trafilatura_spark.datagen.corpus import GENERATOR_VERSION

    # fixed file count, independent of this run's CPUS: a parquet file is
    # one row group here, and a row group is the real split unit — byte
    # splits below row-group size don't create parallelism.  256 files =
    # 16 waves at 16 cores, enough to smooth heavy-tail pages.
    n_files = 256
    corpus = (
        f"/tmp/rs_traf_bench_corpus_v{GENERATOR_VERSION}_{N_PAGES}_{SEED}_p{n_files}"
    )
    if not os.path.exists(os.path.join(corpus, "_SUCCESS")):
        materialize_corpus(spark, corpus, N_PAGES, SEED, partitions=n_files)

    opts = Options(deduplicate=True)
    timings: dict[str, float] = {}

    # fine splits ONLY for the small-file bench corpus (production files are
    # ~1 GB; the session default 32 MB maxPartitionBytes gives the same
    # byte-bounded task balance there)
    spark.conf.set("spark.sql.files.maxPartitionBytes", FINE_SPLIT)
    spark.conf.set("spark.sql.files.openCostInBytes", str(64 * 1024))
    pages = spark.read.parquet(corpus)

    # warmup: fork workers, import the package, compile regexes
    run_extraction(spark, pages.limit(2000).repartition(CPUS), opts,
                   target_partitions=CPUS).groupBy("stage").count().collect()

    # two timed passes, keep the best: one pass's GC/IO hiccup should not
    # define the steady-state capability number
    t_extract = float("inf")
    for _ in range(2):
        t0 = time.time()
        out = run_extraction(spark, pages, opts, target_partitions=CPUS * 3)
        stage_counts = out.groupBy("stage").count().collect()
        t_extract = min(t_extract, time.time() - t0)
    timings["extract_pipeline"] = round(t_extract, 3)
    n_pages = sum(r["count"] for r in stage_counts)

    # the same 100k-page job through the python-side scan (the production
    # source for local/object-store files): parquet decode + kernel fused
    # in one stage, no JVM scan or JVM->Python Arrow hop.  This is the
    # path whose scaling the north-rule evidence cites — the JVM-scan
    # path above adds a fixed per-run plumbing floor that distorts the
    # single-box N vs 4N comparison once the kernel outruns it.
    from rs_trafilatura_spark.sources import extract_from_parquet

    t_fastpipe = float("inf")
    for _ in range(2):
        t0 = time.time()
        extract_from_parquet(spark, corpus, opts) \
            .groupBy("stage").count().collect()
        t_fastpipe = min(t_fastpipe, time.time() - t0)
    timings["extract_pipeline_fastscan"] = round(t_fastpipe, 3)

    # large-page corpus (~300 KB avg, matching the reference's 316 KB eval
    # average, README.md:258): the MB/s number vs BASELINE.md is measured
    # here on realistic page weight, not on the small fixture mix
    from rs_trafilatura_spark.datagen.corpus import (
        LARGE_GENERATOR_VERSION,
        materialize_large_corpus,
    )

    n_large = int(os.environ.get("BENCH_LARGE_PAGES", "2000"))
    large_corpus = (
        f"/tmp/rs_traf_bench_large_v{LARGE_GENERATOR_VERSION}_{n_large}_{SEED}"
    )
    if not os.path.exists(os.path.join(large_corpus, "_SUCCESS")):
        materialize_large_corpus(spark, large_corpus, n_large, SEED)
    # one ~4.7 MB file per task (a file is one row group = the real split
    # unit): the default 32 MB bins pack files into too few splits, which
    # trips run_extraction's too-few-partitions rebalance — a full shuffle
    # of the 600 MB corpus
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(4 * 1024 * 1024))
    spark.conf.set("spark.sql.files.openCostInBytes", str(1024 * 1024))
    large = spark.read.parquet(large_corpus)
    large_bytes = large.select(F.sum(F.length("html"))).collect()[0][0]
    t_large = float("inf")
    for _ in range(2):
        t0 = time.time()
        run_extraction(spark, large, opts).groupBy("stage").count().collect()
        t_large = min(t_large, time.time() - t0)
    timings["extract_large_pages"] = round(t_large, 3)

    # same corpus through the python-side parquet scan (sources/fastscan.py):
    # HTML bytes move disk -> extracting worker directly, skipping the
    # JVM scan + JVM->Python Arrow hop entirely
    t_fast = float("inf")
    for _ in range(2):
        t0 = time.time()
        extract_from_parquet(spark, large_corpus, opts) \
            .groupBy("stage").count().collect()
        t_fast = min(t_fast, time.time() - t0)
    timings["extract_large_fastscan"] = round(t_fast, 3)
    spark.conf.set("spark.sql.files.maxPartitionBytes", MAX_PARTITION_BYTES)
    spark.conf.unset("spark.sql.files.openCostInBytes")

    # operator benches at the sf dir, with the normal session split config
    q = entry_mod.queries()
    for name in ("extract_roundtrip", "dedup_exact", "minhash_lsh_pairs",
                 "ngram_jaccard", "ann_topk_methods", "text_quality_id",
                 "chunk_documents", "curation_audit", "near_dup_clusters",
                 "pack_shards", "write_shards", "corpus_quality_rules",
                 "per_host_quota", "token_stats_full", "redact_pii",
                 "doc_fingerprint", "corpus_datasheet"):
        # best-of-2: a single full-GC pause or scheduler hiccup shouldn't
        # define an operator's number (observed 12x outliers on one pass)
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            df = q[name](spark, SF_DIR)
            if name == "ann_topk_methods":
                df.collect()
            else:
                # hash-materialize EVERY output column: count(1) lets the
                # optimizer prune pure-projection queries down to a bare
                # scan (a language_id "benchmark" that never computes
                # language_id), while a bit_xor-of-xxhash64-of-all-columns
                # aggregate forces the full computation, returns one long,
                # and cannot overflow under ANSI mode (sum can)
                df.select(
                    F.expr("bit_xor(xxhash64(" +
                           ", ".join(f"`{c}`" for c in df.columns) + "))")
                ).collect()
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)

    # skew evidence: exact near-dup pairs over a corpus where ONE source
    # holds 50% of the docs.  The LSH path never keys on the skewed column
    # (candidates come from minhash band buckets; exact verify is
    # O(|pairs|)), so this must cost the same as the unskewed run — the
    # quadratic in-group ngram_jaccard path would straggle here.
    from rs_trafilatura_spark.operators.dedup import lsh_near_dup_pairs

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    skewed = docs.withColumn(
        "source",
        F.when(F.pmod(F.col("doc_id"), 2) == 0, F.lit("megahost"))
        .otherwise(F.col("source")),
    )
    t0 = time.time()
    lsh_near_dup_pairs(skewed, 800).select(F.count(F.lit(1))).collect()
    timings["near_dup_lsh_skewed"] = round(time.time() - t0, 3)

    # scale-step the curation pipeline (VERDICT r3 #5): the full composed
    # curate -> near-dup -> report plan over the 100k-page bench corpus —
    # ~1000x the driver-oracle row's input.  Proves the persist-before-
    # fan-out fix holds at scale: the kernel runs ONCE (the persist), not
    # once per report branch.
    from rs_trafilatura_spark.plans.curate import (
        curate_pages, curation_report, mark_near_duplicates, release_cache,
    )

    # BENCH_SKIP_CURATION: the scaling harness times only the extraction
    # job at two parallelism levels; the heavy 100k curation entries would
    # triple each leg without informing the scaling ratio
    if not os.environ.get("BENCH_SKIP_CURATION"):
        t0 = time.time()
        curated = curate_pages(spark, pages, opts)
        marked = mark_near_duplicates(curated)
        curation_report(marked).collect()
        timings["curation_100k"] = round(time.time() - t0, 3)
        release_cache()

        # the web-scale configuration: MinHashLSH estimate semantics —
        # nothing heavier than 64-slot signatures ever shuffles (the exact
        # run above pays the Sigma|shingles| verify volume this corpus
        # maximizes)
        t0 = time.time()
        marked = mark_near_duplicates(curate_pages(spark, pages, opts),
                                      method="estimate")
        curation_report(marked).collect()
        timings["curation_100k_estimate"] = round(time.time() - t0, 3)
        release_cache()

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "extraction+operators wall time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR.rstrip("/").rsplit("sf", 1)[-1],
        "pages_per_sec": round(n_pages / t_extract, 1),
        "n_pages": n_pages,
        "large_pages": n_large,
        "large_avg_kb": round(large_bytes / n_large / 1024, 1),
        "large_mb_per_sec": round(large_bytes / t_large / 1e6, 2),
        "fastscan_mb_per_sec": round(large_bytes / t_fast / 1e6, 2),
        "cpus": CPUS,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
