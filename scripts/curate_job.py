#!/usr/bin/env python
"""Production curation job — the composed pretraining pipeline as a
spark-submit entry (the sibling of run_job.py's extraction entry):

    zip -r pkg.zip rs_trafilatura_spark/
    spark-submit --py-files pkg.zip scripts/curate_job.py \\
        --input  /data/pages_parquet \\
        --output /data/curated \\
        --benchmark /data/eval_texts_parquet \\
        --max-per-host 100000 --mixture-alpha 50 \\
        --seq-len 2048 --shard-tokens 100000000

Reads the pages table (url, warc_ts, html, lang), runs extraction ->
gates -> near-dup (clusters) -> decontamination -> host quota ->
mixture downsample, writes the final corpus parquet to
<output>/corpus, optional token shards to <output>/shards and the
sequence assignment to <output>/sequences, and prints the per-stage
audit report as one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description="composed curation pipeline")
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--benchmark", default=None,
                    help="parquet with a `text` column of eval examples")
    ap.add_argument("--decontam-n", type=int, default=13)
    ap.add_argument("--near-dup-method", default="clusters",
                    choices=("exact", "clusters", "estimate"))
    ap.add_argument("--url-rules", action="store_true",
                    help="apply URL blocklist/keyword/extension gates before extraction")
    ap.add_argument("--dedup-paragraphs", action="store_true",
                    help="corpus-wide duplicate-paragraph removal")
    ap.add_argument("--dedup-substrings", action="store_true",
                    help="Lee et al. exact substring dedup "
                         "(>=50-word duplicated spans cut)")
    ap.add_argument("--ccnet-keep", default=None,
                    help="comma list of CCNet buckets to keep, e.g. head,middle")
    ap.add_argument("--dsir-target", default=None,
                    help="parquet of (doc_id, text) target corpus for DSIR selection")
    ap.add_argument("--dsir-top-frac", type=int, default=50)
    ap.add_argument("--repetition-filter", action="store_true",
                    help="drop docs failing the Gopher A1.2 repetition rules")
    ap.add_argument("--min-quality", type=float, default=0.5)
    ap.add_argument("--min-chars", type=int, default=200)
    ap.add_argument("--languages", default=None,
                    help="comma-separated keep list, e.g. en,de")
    ap.add_argument("--max-per-host", type=int, default=None)
    ap.add_argument("--mixture-alpha", type=int, default=None,
                    help="alpha_x100 for mixture downsampling (0-100)")
    ap.add_argument("--seq-len", type=int, default=None)
    ap.add_argument("--shuffle-seed", type=int, default=None,
                    help="seeded-hash training-order shuffle before packing")
    ap.add_argument("--shard-tokens", type=int, default=None)
    ap.add_argument("--shard-format", default="tsv",
                    choices=("tsv", "jsonl"))
    ap.add_argument("--split", default=None,
                    help="leakage-safe url-keyed split column, e.g. "
                         "train:98,val:1,test:1 (percents sum to 100)")
    ap.add_argument("--quality-model", default=None,
                    help="path of a saved quality-classifier PipelineModel "
                         "(operators.quality_classifier); enables the "
                         "GPT-3 App. A score + Pareto keep gate")
    ap.add_argument("--quality-pareto-alpha", type=int, default=9)
    ap.add_argument("--tokenizer-merges", default=None,
                    help="path of a parquet merge table (rank,left,right,"
                         "pair_n) from bpe_train*; bills n_tokens in exact "
                         "BPE tokens for packing/shards/datasheet")
    ap.add_argument("--datasheet", action="store_true",
                    help="write the release datasheet (section,key,value) "
                         "to <output>/datasheet")
    ap.add_argument("--parallelism", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    from rs_trafilatura_spark.options import Options
    from rs_trafilatura_spark.plans.pipeline import pretraining_pipeline
    from rs_trafilatura_spark.session import get_spark

    spark = get_spark(parallelism=args.parallelism)
    pages = spark.read.parquet(args.input)
    benchmark = (spark.read.parquet(args.benchmark)
                 if args.benchmark else None)
    out = pretraining_pipeline(
        spark, pages, Options(),
        benchmark=benchmark,
        decontam_n=args.decontam_n,
        near_dup_method=args.near_dup_method,
        repetition_filter=args.repetition_filter,
        url_rules=args.url_rules,
        dedup_paragraphs=args.dedup_paragraphs,
        dedup_substrings=args.dedup_substrings,
        ccnet_keep=(tuple(b.strip() for b in args.ccnet_keep.split(','))
                    if args.ccnet_keep else None),
        dsir_target=(spark.read.parquet(args.dsir_target)
                     if args.dsir_target else None),
        dsir_top_frac_x100=args.dsir_top_frac,
        min_quality=args.min_quality,
        min_chars=args.min_chars,
        languages=(tuple(args.languages.split(","))
                   if args.languages else None),
        max_pages_per_host=args.max_per_host,
        mixture_alpha_x100=args.mixture_alpha,
        seq_len=args.seq_len,
        shuffle_seed=args.shuffle_seed,
        shard_budget_tokens=args.shard_tokens,
        shard_format=args.shard_format,
        shard_out_dir=(os.path.join(args.output, "shards")
                       if args.shard_tokens else None),
        quality_model=(
            __import__("rs_trafilatura_spark.operators.quality_classifier",
                       fromlist=["load_quality_classifier"])
            .load_quality_classifier(args.quality_model)
            if args.quality_model else None),
        quality_pareto_alpha=args.quality_pareto_alpha,
        tokenizer_merges=(
            [(r["left"], r["right"], r["pair_n"]) for r in
             spark.read.parquet(args.tokenizer_merges)
             .orderBy("rank").collect()]
            if args.tokenizer_merges else None),
        datasheet=args.datasheet,
        split_weights_x100=(
            tuple((n, int(p)) for n, p in
                  (kv.split(":") for kv in args.split.split(",")))
            if args.split else None),
    )
    corpus_path = os.path.join(args.output, "corpus")
    out["corpus"].write.mode("overwrite").parquet(corpus_path)
    result = {"report": out["report"], "corpus": corpus_path}
    if "sequences" in out:
        seq_path = os.path.join(args.output, "sequences")
        out["sequences"].write.mode("overwrite").parquet(seq_path)
        result["sequences"] = seq_path
    if "shard_manifest" in out:
        result["n_shards"] = len(out["shard_manifest"])
    if "datasheet" in out:
        ds_path = os.path.join(args.output, "datasheet")
        # coalesce(1): the sheet is O(sources + langs + percentiles) rows
        out["datasheet"].coalesce(1).write.mode("overwrite").parquet(ds_path)
        result["datasheet"] = ds_path
    out["release"]()
    print(json.dumps(result, default=str))
    spark.stop()


if __name__ == "__main__":
    main()
