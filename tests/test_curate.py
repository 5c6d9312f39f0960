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


def test_exact_dedup_gated_copy_cannot_shadow_good_copy(spark):
    """A gated copy of a fingerprint group must not claim rank 1 and get the
    surviving good copy dropped as exact_duplicate (ADVICE r1): same body
    text (= same fingerprint) under a wrong-language wrapper, with a url
    that sorts FIRST in the fingerprint window."""
    body = ("Shared article body with plenty of substantive words to pass "
            "every quality and length gate in the curation pipeline. " * 4)

    def page(url: str, lang: str) -> tuple:
        html = (f'<!doctype html><html lang="{lang}"><head><title>T</title>'
                f"</head><body><article><p>{body}</p></article></body></html>")
        return (url, html.encode("utf-8"), lang)

    pages = spark.createDataFrame(
        [page("https://0000.example/a", "zz"),  # gated (language), sorts first
         page("https://zzzz.example/b", "en")],  # the good copy
        "url string, html binary, lang string",
    ).withColumn("warc_ts", F.current_timestamp())

    curated = curate_pages(
        spark, pages, Options(deduplicate=True),
        min_chars=120, languages=("en", "de"),
    )
    rows = {r["url"]: r["drop_reason"] for r in
            curated.select("url", "drop_reason").collect()}
    assert rows["https://0000.example/a"] == "language"
    assert rows["https://zzzz.example/b"] is None  # not exact_duplicate


def test_empty_languages_tuple_means_no_filter(spark):
    pages = generate_pages_df(spark, 20)
    with_filter = curate_pages(spark, pages, Options(), languages=())
    dropped_lang = with_filter.filter(
        F.col("drop_reason") == "language"
    ).count()
    assert dropped_lang == 0


def test_mark_near_duplicates_clusters_vs_pairs_star(spark):
    """On a near-dup STAR whose center has the largest id, pairwise-loser
    marking keeps both leaves (they are not near-dups of each other);
    cluster marking keeps exactly ONE member per component (the min id)."""
    from pyspark.sql import functions as F
    from rs_trafilatura_spark.plans.curate import (
        mark_near_duplicates, release_cache,
    )

    t = " ".join(f"w{i:03d}" for i in range(120))
    x = " ".join(f"x{i:02d}" for i in range(16))
    y = " ".join(f"y{i:02d}" for i in range(16))
    # J(center, leaf) = 880 >= 800; J(leaf, leaf) = 786 < 800
    curated = spark.createDataFrame(
        [("center", t), ("leaf1", t + " " + x), ("leaf2", t + " " + y)],
        "url string, content_text string",
    ).withColumn("drop_reason", F.lit(None).cast("string"))

    # deterministic ids with the center LARGEST
    def id_col(url_col):
        return (
            F.when(url_col == "center", F.lit(900))
            .when(url_col == "leaf1", F.lit(100))
            .otherwise(F.lit(500))
            .cast("long")
        )

    def outcome(method):
        out = {r["url"]: r["drop_reason"] for r in mark_near_duplicates(
            curated, 800, id_col=id_col, method=method,
        ).collect()}
        release_cache()
        return out

    pairs = outcome("exact")
    assert pairs == {"center": "near_duplicate", "leaf1": None,
                     "leaf2": None}
    clusters = outcome("clusters")
    assert clusters == {"center": "near_duplicate", "leaf1": None,
                        "leaf2": "near_duplicate"}


def test_exact_dedup_hot_fingerprint_no_window(spark):
    """Skew contract of the exact dedup (VERDICT r5 #4): a hot
    fingerprint (the same kept text under 10^4 urls) must dedup through
    the map-side-combinable groupBy-min(struct) + join-back, NOT a
    row_number window on fingerprint — a window ships every copy of the
    hot key to one task with no partial aggregation and no AQE remedy."""
    from rs_trafilatura_spark.plans.curate import release_cache

    body = ("Hot parked-domain body with plenty of substantive words to "
            "pass every quality and length gate in the pipeline. " * 4)
    html = ("<!doctype html><html lang=\"en\"><head><title>T</title></head>"
            f"<body><article><p>{body}</p></article></body></html>"
            ).encode("utf-8")
    n = 10_000
    pages = spark.createDataFrame(
        [(f"https://h{i:05d}.example/p", html, "en") for i in range(n)],
        "url string, html binary, lang string",
    ).withColumn("warc_ts", F.current_timestamp())

    curated = curate_pages(spark, pages, Options(deduplicate=True),
                           min_chars=120)
    plan = curated._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, "exact dedup must not use a Window"

    out = curated.groupBy("drop_reason").count().collect()
    by_reason = {r["drop_reason"]: r["count"] for r in out}
    assert by_reason.get("exact_duplicate") == n - 1
    assert by_reason.get(None) == 1
    # min-url survivor (gated-rows-lose ordering preserved)
    survivor = curated.filter(F.col("drop_reason").isNull()) \
        .select("url").first()["url"]
    assert survivor == "https://h00000.example/p"
    release_cache()
