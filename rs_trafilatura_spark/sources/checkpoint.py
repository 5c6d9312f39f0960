"""Resumable, lineage-carrying extraction runs (north rule: "resumable from
checkpoint with per-partition lineage + metrics").

Work is split into deterministic chunks by ``pmod(xxhash64(url), n_chunks)``.
Each chunk is written to ``<output>/chunk=<k>/`` and, on success, a manifest
line (chunk id, input fingerprint, row count, per-stage counters, wall time)
is appended atomically to ``_manifest/chunk-<k>.json``.  On restart the
driver lists completed chunk ids and anti-joins them away — equivalently a
left anti-join against the done set (SURVEY.md §2.3) — so only unfinished
chunks re-run.  At cluster scale chunks map to Iceberg partition writes; on
parquet the mechanism is identical.
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..options import DEFAULT_OPTIONS, Options
from ..plans.job import run_extraction


def _manifest_dir(output_path: str) -> str:
    return os.path.join(output_path, "_manifest")


def completed_chunks(output_path: str) -> dict[int, dict]:
    mdir = _manifest_dir(output_path)
    done: dict[int, dict] = {}
    if not os.path.isdir(mdir):
        return done
    for name in os.listdir(mdir):
        if name.startswith("chunk-") and name.endswith(".json"):
            try:
                with open(os.path.join(mdir, name)) as f:
                    entry = json.load(f)
                done[int(entry["chunk_id"])] = entry
            except (ValueError, KeyError, json.JSONDecodeError):
                continue
    return done


def _write_manifest_entry(output_path: str, entry: dict) -> None:
    mdir = _manifest_dir(output_path)
    os.makedirs(mdir, exist_ok=True)
    final = os.path.join(mdir, f"chunk-{entry['chunk_id']}.json")
    tmp = final + ".tmp"
    with open(tmp, "w") as f:
        json.dump(entry, f)
    os.replace(tmp, final)  # atomic on POSIX


def run_extraction_checkpointed(
    spark: SparkSession,
    pages: DataFrame,
    output_path: str,
    options: Options = DEFAULT_OPTIONS,
    n_chunks: int = 8,
    target_partitions: Optional[int] = None,
    verify_input_fingerprint: bool = False,
    chunk_col=None,
) -> dict:
    """Run extraction chunk-by-chunk with resume. Returns a run summary.

    The chunk column is a pure function of url, so a restarted run assigns
    identical chunks — provided n_chunks is unchanged, which is enforced
    against the manifest. ``verify_input_fingerprint=True`` additionally
    recomputes each skipped chunk's url-fingerprint and refuses to skip a
    chunk whose input changed (costs one extra scan of the skipped rows;
    off by default since at scale resume exists to avoid rescans).
    """
    # ``chunk_col``: optional callable url-Column -> chunk Column (any
    # deterministic pure function of url); default xxhash64-mod
    chunk_expr = (
        F.pmod(F.xxhash64(F.col("url")), F.lit(n_chunks)).cast("int")
        if chunk_col is None else chunk_col(F.col("url")).cast("int")
    )
    chunked = pages.withColumn("_chunk", chunk_expr)
    done = completed_chunks(output_path)
    # Chunk ids are only meaningful for the n_chunks they were computed
    # with: resuming a k=8 run with k=16 would silently skip half of every
    # old chunk and re-extract the rest. Refuse instead of corrupting.
    for k, entry in done.items():
        prev = entry.get("n_chunks")
        if prev is not None and prev != n_chunks:
            raise ValueError(
                f"manifest chunk {k} was written with n_chunks={prev}, "
                f"refusing to resume with n_chunks={n_chunks}; "
                "delete the manifest (full restart) or rerun with the "
                "original chunk count"
            )
    summary = {"chunks_total": n_chunks, "chunks_skipped": len(done),
               "chunks_run": 0, "rows_written": 0}

    for k in range(n_chunks):
        if k in done:
            if verify_input_fingerprint and "input_fingerprint" in done[k]:
                # xor-of-hashes alone is blind to even-multiplicity changes
                # (url added twice xors to zero), so cross-check the row
                # count too.  The manifest records the INPUT row count
                # explicitly (older manifests reused the output-row sum,
                # valid only while the kernel is row-preserving — accept it
                # as a fallback for resume of pre-upgrade runs).
                row = (
                    chunked.filter(F.col("_chunk") == k)
                    .select(F.xxhash64(F.col("url")).alias("h"))
                    .agg(F.expr("bit_xor(h)").alias("f"),
                         F.count("*").alias("n")).collect()[0]
                )
                expected_rows = done[k].get("input_rows", done[k].get("rows"))
                if (str(row["f"]) != done[k]["input_fingerprint"]
                        or (expected_rows is not None
                            and row["n"] != expected_rows)):
                    raise ValueError(
                        f"chunk {k} input changed since the manifest was "
                        f"written (fingerprint {row['f']}/rows {row['n']} vs "
                        f"{done[k]['input_fingerprint']}/"
                        f"{expected_rows}); refusing to skip"
                    )
            continue
        t0 = time.time()
        chunk_df = chunked.filter(F.col("_chunk") == k).drop("_chunk")
        extracted = run_extraction(
            spark, chunk_df, options, target_partitions=target_partitions
        )
        chunk_path = os.path.join(output_path, f"chunk={k}")
        extracted.write.mode("overwrite").parquet(chunk_path)

        # lineage + per-stage metrics from the files just written (cheap
        # re-scan of one chunk; avoids caching the kernel output)
        written = spark.read.parquet(chunk_path)
        stage_counts = {
            r["stage"]: r["n"]
            for r in written.groupBy("stage").agg(F.count("*").alias("n")).collect()
        }
        n_rows = sum(stage_counts.values())
        fp_row = (
            chunk_df.select(F.xxhash64(F.col("url")).alias("h"))
            .agg(F.expr("bit_xor(h)").alias("f"),
                 F.count("*").alias("n")).collect()[0]
        )
        _write_manifest_entry(output_path, {
            "chunk_id": k,
            "n_chunks": n_chunks,
            "rows": n_rows,
            "input_rows": fp_row["n"],
            "input_fingerprint": str(fp_row["f"]),
            "stages": stage_counts,
            "wall_time_sec": round(time.time() - t0, 3),
            "options_dedup": options.deduplicate,
        })
        summary["chunks_run"] += 1
        summary["rows_written"] += n_rows

    return summary


def read_output(spark: SparkSession, output_path: str) -> DataFrame:
    return spark.read.option("basePath", output_path).parquet(
        os.path.join(output_path, "chunk=*")
    )
