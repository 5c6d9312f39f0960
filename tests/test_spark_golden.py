"""Golden end-to-end gate (FIXTURES.md §2): deterministic synthetic corpus
-> Spark extraction job -> join on url -> BYTE-IDENTICAL text per row, plus
per-family metadata assertions and checkpoint/resume behavior.
"""

import os

import pytest
from pyspark.sql import functions as F

from rs_trafilatura_spark.datagen import (
    generate_expected_meta_df,
    generate_pages_df,
)
from rs_trafilatura_spark.options import Options
from rs_trafilatura_spark.plans import run_extraction, stage_metrics

N_ROWS = 200
OPTS = Options(deduplicate=True)


@pytest.fixture(scope="module")
def extracted(spark):
    pages = generate_pages_df(spark, N_ROWS)
    out = run_extraction(spark, pages, OPTS)
    out.cache()
    yield out
    out.unpersist()


def test_byte_identical_text(spark, extracted):
    pages = generate_pages_df(spark, N_ROWS).select("url", "text")
    joined = extracted.select("url", "content_text").join(pages, "url", "inner")
    assert joined.count() == N_ROWS
    mismatches = joined.filter(
        ~(F.col("content_text").eqNullSafe(F.col("text")))
    )
    bad = mismatches.limit(3).collect()
    assert not bad, f"byte mismatch for: {[r['url'] for r in bad]}"


def test_stage_and_metadata(spark, extracted):
    meta = generate_expected_meta_df(spark, N_ROWS)
    joined = extracted.join(meta, "url", "inner").cache()
    assert joined.count() == N_ROWS

    stage_bad = joined.filter(F.col("stage") != F.col("exp_stage")).count()
    assert stage_bad == 0

    ptype_bad = joined.filter(
        ~F.col("page_type").eqNullSafe(F.col("exp_page_type"))
    ).count()
    assert ptype_bad == 0

    author_bad = joined.filter(
        F.col("exp_author").isNotNull()
        & ~F.col("author").eqNullSafe(F.col("exp_author"))
    ).count()
    assert author_bad == 0

    date_bad = joined.filter(
        F.col("exp_date").isNotNull()
        & ~F.col("date").eqNullSafe(F.col("exp_date"))
    ).count()
    assert date_bad == 0

    lang_bad = joined.filter(
        ~F.col("language").eqNullSafe(F.col("exp_language"))
    ).count()
    assert lang_bad == 0
    joined.unpersist()


def test_stage_metrics_shape(extracted):
    rows = stage_metrics(extracted).collect()
    stages = {r["stage"] for r in rows}
    assert "main" in stages
    assert sum(r["n_pages"] for r in rows) == N_ROWS


def test_checkpoint_resume(spark, tmp_path):
    from rs_trafilatura_spark.sources import (
        completed_chunks,
        read_output,
        run_extraction_checkpointed,
    )

    out_dir = str(tmp_path / "out")
    pages = generate_pages_df(spark, 60)
    s1 = run_extraction_checkpointed(spark, pages, out_dir, OPTS, n_chunks=4)
    assert s1["chunks_run"] == 4 and s1["chunks_skipped"] == 0
    assert len(completed_chunks(out_dir)) == 4

    # wipe one chunk's manifest -> only that chunk re-runs
    os.remove(os.path.join(out_dir, "_manifest", "chunk-2.json"))
    s2 = run_extraction_checkpointed(spark, pages, out_dir, OPTS, n_chunks=4)
    assert s2["chunks_run"] == 1 and s2["chunks_skipped"] == 3

    total = read_output(spark, out_dir).count()
    assert total == 60

    # manifest carries lineage + stage metrics
    entry = completed_chunks(out_dir)[2]
    assert entry["rows"] > 0
    assert entry["input_fingerprint"]
    assert isinstance(entry["stages"], dict) and entry["stages"]
    assert entry["wall_time_sec"] >= 0


def test_output_schema_stable(extracted):
    from rs_trafilatura_spark.plans import OUTPUT_SCHEMA

    assert extracted.schema == OUTPUT_SCHEMA


def test_salted_host_agg_matches_direct(spark):
    """Two-stage salted aggregation == direct groupBy (the skew recipe)."""
    from rs_trafilatura_spark.plans import salted_host

    pages = generate_pages_df(spark, 150).withColumn(
        "host", F.regexp_extract("url", r"https://([^/]+)/", 1)
    )
    direct = {
        r["host"]: r["n"]
        for r in pages.groupBy("host").agg(F.count("*").alias("n")).collect()
    }
    salted = (
        pages.withColumn("skey", salted_host(F.col("host"), F.col("url")))
        .groupBy("skey").agg(F.count("*").alias("n1"))
        .withColumn("host", F.split(F.col("skey"), "#")[0])
        .groupBy("host").agg(F.sum("n1").alias("n"))
    )
    assert {r["host"]: r["n"] for r in salted.collect()} == direct


def test_kernel_error_degrades_to_row(spark, monkeypatch):
    """A page that crashes the kernel yields stage='error', not a dead task."""
    import importlib

    # attribute access resolves to the extract() FUNCTION re-exported by the
    # kernel package, so fetch the module through importlib
    kx = importlib.import_module("rs_trafilatura_spark.kernel.extract")
    from rs_trafilatura_spark.plans import run_extraction

    pages = generate_pages_df(spark, 8)
    # poison one row: html that decodes but has a NUL-bomb the kernel chokes
    # on is hard to craft, so simulate via a page whose url triggers a raise
    # inside the batch path by monkeypatching at the WORKER via a wrapper df:
    # simplest real-world probe — html=None-ish empty binary is handled, so
    # instead assert the guard exists by running a normal job and checking
    # no 'error' stage appears, then drive the guard directly in-process.
    out = run_extraction(spark, pages)
    assert out.filter(F.col("stage") == "error").count() == 0

    # in-process guard check (same function the workers run)
    from rs_trafilatura_spark.plans.job import make_extract_batches
    import pandas as pd

    fn = make_extract_batches(OPTS)
    real = kx.extract_bytes

    def boom(html, opts):
        raise RuntimeError("synthetic kernel failure")

    monkeypatch.setattr(kx, "extract_bytes", boom)
    pdf = pd.DataFrame({
        "url": ["https://x/1"], "warc_ts": [None],
        "html": [b"<html><body><p>x</p></body></html>"], "lang": ["en"],
    })
    result = list(fn(iter([pdf])))[0]
    monkeypatch.setattr(kx, "extract_bytes", real)
    assert result["stage"].iloc[0] == "error"
    assert "synthetic kernel failure" in result["warnings"].iloc[0][0]


def test_checkpoint_refuses_n_chunks_mismatch(spark, tmp_path):
    import pytest

    from rs_trafilatura_spark.sources import run_extraction_checkpointed

    out_dir = str(tmp_path / "out")
    pages = generate_pages_df(spark, 20)
    run_extraction_checkpointed(spark, pages, out_dir, OPTS, n_chunks=2)
    with pytest.raises(ValueError, match="n_chunks"):
        run_extraction_checkpointed(spark, pages, out_dir, OPTS, n_chunks=4)


def test_checkpoint_fingerprint_verify_detects_changed_input(spark, tmp_path):
    import pytest
    from pyspark.sql import functions as F

    from rs_trafilatura_spark.sources import run_extraction_checkpointed

    out_dir = str(tmp_path / "out")
    pages = generate_pages_df(spark, 20)
    run_extraction_checkpointed(spark, pages, out_dir, OPTS, n_chunks=2)
    changed = pages.withColumn("url", F.concat(F.col("url"), F.lit("-v2")))
    with pytest.raises(ValueError, match="input changed"):
        run_extraction_checkpointed(
            spark, changed, out_dir, OPTS, n_chunks=2,
            verify_input_fingerprint=True,
        )


def test_checkpoint_manifest_records_input_rows(spark, tmp_path):
    """The manifest stores the INPUT row count separately from the
    output-row sum (ADVICE r2), and unchanged input resumes clean under
    fingerprint verification."""
    from rs_trafilatura_spark.sources import run_extraction_checkpointed
    from rs_trafilatura_spark.sources.checkpoint import completed_chunks

    out_dir = str(tmp_path / "out")
    pages = generate_pages_df(spark, 20)
    run_extraction_checkpointed(spark, pages, out_dir, OPTS, n_chunks=2)
    manifest = completed_chunks(out_dir)
    assert set(manifest) == {0, 1}
    for entry in manifest.values():
        assert "input_rows" in entry
        assert entry["input_rows"] == entry["rows"]  # kernel is row-preserving
    assert sum(e["input_rows"] for e in manifest.values()) == 20
    s2 = run_extraction_checkpointed(
        spark, pages, out_dir, OPTS, n_chunks=2,
        verify_input_fingerprint=True,
    )
    assert s2["chunks_skipped"] == 2 and s2["chunks_run"] == 0
