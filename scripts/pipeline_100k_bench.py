#!/usr/bin/env python
"""Fully-gated composed-pipeline measurement at 100k-page scale.

Runs ``plans/pipeline.py::pretraining_pipeline`` with EVERY optional
gate enabled — URL rules, cluster near-dup, Gopher repetition,
corpus-wide paragraph dedup, exact substring dedup, benchmark
decontamination, CCNet buckets, DSIR selection, per-host quota,
mixture downsampling, sequence packing AND shard writing — over the
same deterministic 100k-page corpus bench.py uses (~1000x the
driver-oracle row's input).  Prints ONE JSON line with per-stage row
counts and wall seconds (the pipeline's stage_seconds contract: every
report count is a forced materialization, so inter-count gaps are
per-stage cost).

This is the worst-case configuration a user can schedule — nobody
turns on all four dedup tiers at once in production — so it is the
upper bound on composed-pipeline cost, not the recommended recipe.

Usage: python scripts/pipeline_100k_bench.py [> json]
Env: SPARK_GRAFT_CPUS (default 32), BENCH_PAGES (default 100000),
     PIPELINE_BENCH_OUT (default /tmp/rs_traf_pipeline100k_shards)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_PAGES = int(os.environ.get("BENCH_PAGES", "100000"))
SEED = 42
FINE_SPLIT = str(512 * 1024)


def main() -> None:
    from pyspark.sql import functions as F

    from rs_trafilatura_spark.datagen.corpus import (
        GENERATOR_VERSION, materialize_corpus,
    )
    from rs_trafilatura_spark.kernel import extract_bytes
    from rs_trafilatura_spark.options import Options
    from rs_trafilatura_spark.plans.pipeline import pretraining_pipeline
    from rs_trafilatura_spark.session import get_spark
    import __spark_entry__ as entry_mod

    spark = get_spark(parallelism=CPUS, driver_memory="16g")
    entry_mod._ensure_pyfiles(spark)

    n_files = 256
    corpus_dir = (
        f"/tmp/rs_traf_bench_corpus_v{GENERATOR_VERSION}_{N_PAGES}_{SEED}"
        f"_p{n_files}"
    )
    if not os.path.exists(os.path.join(corpus_dir, "_SUCCESS")):
        materialize_corpus(spark, corpus_dir, N_PAGES, SEED,
                           partitions=n_files)

    spark.conf.set("spark.sql.files.maxPartitionBytes", FINE_SPLIT)
    spark.conf.set("spark.sql.files.openCostInBytes", str(64 * 1024))
    pages = spark.read.parquet(corpus_dir)

    # decontamination benchmark + DSIR target: opening 20-word grams of
    # 5 real extracted pages (the driver oracle's "docs 0-4" recipe) —
    # deterministic, and decontamination provably bites
    sample = pages.orderBy("url").limit(5).collect()
    bench_rows = []
    for i, r in enumerate(sample):
        text = extract_bytes(bytes(r["html"]))["content_text"]
        words = text.split()
        if len(words) >= 20:
            bench_rows.append((i, " ".join(words[:20])))
    # doc_id is required by the DSIR gram stream; decontamination only
    # reads the text column
    bench = spark.createDataFrame(bench_rows, ["doc_id", "text"])

    out_dir = os.environ.get("PIPELINE_BENCH_OUT",
                             "/tmp/rs_traf_pipeline100k_shards")
    shutil.rmtree(out_dir, ignore_errors=True)

    t0 = time.time()
    out = pretraining_pipeline(
        spark, pages, Options(deduplicate=True),
        benchmark=bench, decontam_n=13,
        near_dup_method="clusters",
        url_rules=True,
        repetition_filter=True,
        dedup_paragraphs=True,
        dedup_substrings=True,
        ccnet_keep=("head", "middle"),
        dsir_target=bench, dsir_top_frac_x100=90,
        max_pages_per_host=200,
        mixture_alpha_x100=70,
        seq_len=2048,
        shard_budget_tokens=1 << 20,
        shard_out_dir=out_dir,
        datasheet=True,
        split_weights_x100=(("train", 98), ("val", 1), ("test", 1)),
        on_stage=lambda s, n, sec: print(
            f"[stage] {s}: {n} rows in {sec}s", file=sys.stderr, flush=True),
    )
    # force the sequence-packing leg too (shards are already an action)
    t_seq = time.time()
    n_seq_rows = out["sequences"].count()
    out["stage_seconds"]["pack_sequences"] = round(time.time() - t_seq, 3)
    t_ds = time.time()
    datasheet_rows = out["datasheet"].count()
    out["stage_seconds"]["datasheet"] = round(time.time() - t_ds, 3)
    total = round(time.time() - t0, 3)
    out["release"]()

    report = dict(out["report"])
    final_docs = report.get("after_mixture_downsample",
                            report.get("after_host_quota"))
    print(json.dumps({
        "metric": "fully-gated pretraining pipeline, 100k pages",
        "value": total,
        "unit": "sec",
        "n_pages_in": N_PAGES,
        "final_docs": final_docs,
        "stages": out["report"],
        "stage_seconds": out["stage_seconds"],
        "sequence_rows": n_seq_rows,
        "datasheet_rows": datasheet_rows,
        "shards_written": len(out["shard_manifest"]),
        "pages_per_sec": round(N_PAGES / total, 1),
        "cpus": CPUS,
    }))


if __name__ == "__main__":
    main()
