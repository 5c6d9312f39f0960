"""WebText-style quality classifier (GPT-3 App. A on pyspark.ml):
separability on planted corpora, exact deterministic Pareto-gate
arithmetic, and the composed pipeline stage."""

from pyspark.sql import functions as F

GOOD = ("a thoughtful well written article about science history and "
        "careful analysis of the documentary evidence")
SPAM = ("buy cheap viagra casino bonus click here xxx free spins "
        "lottery winner prize claim now")


def _model(spark):
    from rs_trafilatura_spark.operators.quality_classifier import (
        train_quality_classifier,
    )

    pos = spark.createDataFrame(
        [(i, GOOD) for i in range(40)], ["doc_id", "text"])
    neg = spark.createDataFrame(
        [(i, SPAM) for i in range(40)], ["doc_id", "text"])
    return train_quality_classifier(pos, neg)


def test_classifier_separates_and_scores_monotone(spark):
    from rs_trafilatura_spark.operators.quality_classifier import (
        score_quality,
    )

    m = _model(spark)
    docs = spark.createDataFrame(
        [(1, "careful analysis of the documentary evidence and history"),
         (2, "casino bonus lottery winner click here free spins"),
         (3, "entirely unrelated neutral words outside both vocabularies")],
        ["doc_id", "text"])
    s = {r["doc_id"]: r["quality_score"]
         for r in score_quality(docs, m).collect()}
    assert s[1] > 0.8 and s[2] < 0.2
    assert s[2] < s[3] < s[1]
    # intermediate feature columns must not leak into the output
    assert set(score_quality(docs, m).columns) == {
        "doc_id", "text", "quality_score"}


def test_pareto_gate_matches_python_replay_and_is_deterministic(spark):
    """The keep rule is pure arithmetic on xxhash64(key): replay it in
    Python (via Spark's own hash values, so only the gate math is under
    test) and require identical keep decisions; a second run keeps the
    identical set."""
    from rs_trafilatura_spark.operators.quality_classifier import (
        pareto_quality_filter,
    )

    rows = [(f"u{i}", (i % 100) / 100.0) for i in range(500)]
    scored = spark.createDataFrame(rows, ["url", "quality_score"])
    hashes = {r["url"]: r["h"] for r in scored.select(
        "url", F.pmod(F.xxhash64("url"), F.lit(1 << 53)).alias("h")
    ).collect()}

    def keep(url, score, alpha=9):
        u = hashes[url] / float(1 << 53)
        return (1.0 - u) ** (-1.0 / alpha) - 1.0 > 1.0 - score

    want = {u for u, s in rows if keep(u, s)}
    got1 = {r["url"] for r in pareto_quality_filter(
        scored, key_col="url").collect()}
    got2 = {r["url"] for r in pareto_quality_filter(
        scored, key_col="url").collect()}
    assert got1 == want
    assert got1 == got2
    # the gate is probabilistic in score: perfect scores always survive,
    # and survivors exist below any hard threshold (diversity property)
    perfect = spark.createDataFrame(
        [(f"p{i}", 1.0) for i in range(50)], ["url", "quality_score"])
    assert pareto_quality_filter(perfect, key_col="url").count() == 50
    # at alpha=2 the Pareto tail is fat enough (P(x > 0.7) ~ 0.35) that
    # low-score survivors must exist, yet never all of them
    got_a2 = {r["url"] for r in pareto_quality_filter(
        scored, key_col="url", alpha=2).collect()}
    low = {u for u, s in rows if s < 0.3}
    assert 0 < len(got_a2 & low) < len(low)


def test_pipeline_quality_classifier_stage(spark):
    from rs_trafilatura_spark.datagen.corpus import generate_pages_df
    from rs_trafilatura_spark.options import Options
    from rs_trafilatura_spark.plans.pipeline import pretraining_pipeline

    pages = generate_pages_df(spark, n_rows=40)
    m = _model(spark)
    out = pretraining_pipeline(spark, pages, Options(), quality_model=m)
    try:
        report = dict(out["report"])
        assert "after_quality_classifier" in report
        assert 0 < report["after_quality_classifier"] \
            <= report["after_curation_and_near_dup"]
        assert "quality_score" not in out["corpus"].columns
        assert out["corpus"].count() == report["after_quality_classifier"]
    finally:
        out["release"]()


def test_model_roundtrip_and_custom_text_col(spark, tmp_path):
    from rs_trafilatura_spark.operators.quality_classifier import (
        load_quality_classifier, save_quality_classifier, score_quality,
    )

    m = _model(spark)
    path = str(tmp_path / "qc_model")
    save_quality_classifier(m, path)
    m2 = load_quality_classifier(path)

    docs = spark.createDataFrame(
        [(1, "careful analysis of the documentary evidence"),
         (2, "casino bonus lottery click here")],
        ["doc_id", "content_text"])
    s1 = {r["doc_id"]: r["quality_score"] for r in
          score_quality(docs, m, text_col="content_text").collect()}
    s2 = {r["doc_id"]: r["quality_score"] for r in
          score_quality(docs, m2, text_col="content_text").collect()}
    assert s1 == s2
    # temp text column must not leak
    assert set(score_quality(docs, m, text_col="content_text").columns) \
        == {"doc_id", "content_text", "quality_score"}


def test_quality_scoring_composes_with_streaming(spark, tmp_path):
    """score_quality + the Pareto gate are stateless map transforms, so
    they compose onto the streaming extraction unchanged — the shape a
    live-crawl deployment would run (extract -> score -> gate -> sink)."""
    from rs_trafilatura_spark.datagen import generate_pages_df
    from rs_trafilatura_spark.operators.quality_classifier import (
        pareto_keep_col, score_quality,
    )
    from rs_trafilatura_spark.streaming.pipeline import (
        extraction_stream, read_pages_stream,
    )

    path = str(tmp_path / "pages")
    generate_pages_df(spark, 30).write.parquet(path)
    m = _model(spark)

    stream = extraction_stream(read_pages_stream(spark, path))
    scored = score_quality(
        stream.filter(F.col("content_text").isNotNull()),
        m, text_col="content_text",
    ).withColumn("kept", pareto_keep_col(key_col="url"))
    q = (scored.writeStream.outputMode("append")
         .format("memory").queryName("qc_stream")
         .trigger(availableNow=True).start())
    q.processAllAvailable()
    q.stop()
    out = spark.sql("SELECT * FROM qc_stream")
    assert out.count() > 0
    assert out.filter("quality_score < 0 OR quality_score > 1").count() == 0
    # batch and stream agree document-by-document (fresh lineage to
    # avoid a self-join on the memory sink's attributes)
    rows = out.select("url", "content_text", "quality_score").collect()
    fresh = spark.createDataFrame(
        [(r["url"], r["content_text"]) for r in rows],
        ["url", "content_text"])
    batch = {r["url"]: r["quality_score"] for r in score_quality(
        fresh, m, text_col="content_text").collect()}
    assert all(batch[r["url"]] == r["quality_score"] for r in rows)
