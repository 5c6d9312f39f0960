"""End-to-end curation pipeline over the fixture corpus."""

from pyspark.sql import functions as F

from rs_trafilatura_spark.datagen import generate_pages_df
from rs_trafilatura_spark.options import Options
from rs_trafilatura_spark.plans.curate import (
    curate_pages,
    curation_report,
    mark_near_duplicates,
)


def test_curation_pipeline(spark):
    pages = generate_pages_df(spark, 120)
    curated = curate_pages(
        spark, pages, Options(deduplicate=True),
        min_quality=0.5, min_chars=120, languages=("en", "de"),
    ).cache()

    outcomes = {r["outcome"]: r["n"] for r in curation_report(curated).collect()}
    assert outcomes.get("KEPT", 0) > 60
    assert "empty" in outcomes or "too_short" in outcomes
    assert sum(outcomes.values()) == 120

    # duplicate injection: same content under two urls -> one exact_duplicate
    dup = pages.limit(1).withColumn("url", F.concat(F.col("url"), F.lit("-copy")))
    curated2 = curate_pages(spark, pages.unionByName(dup),
                            Options(deduplicate=True), min_chars=120)
    n_exact = curated2.filter(F.col("drop_reason") == "exact_duplicate").count()
    assert n_exact >= 1

    # near-dup marking runs and keeps schema + row count
    marked = mark_near_duplicates(curated)
    assert marked.count() == 120
    assert "drop_reason" in marked.columns
    curated.unpersist()
