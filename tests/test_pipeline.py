"""End-to-end composed pretraining pipeline (plans/pipeline.py)."""

import gzip

from pyspark.sql import functions as F

from rs_trafilatura_spark.datagen.corpus import generate_pages_df
from rs_trafilatura_spark.options import Options
from rs_trafilatura_spark.plans.pipeline import pretraining_pipeline


def test_pretraining_pipeline_end_to_end(spark, tmp_path):
    pages = generate_pages_df(spark, n_rows=120)

    # benchmark built from two real extracted pages' opening words, so
    # decontamination provably bites
    from rs_trafilatura_spark.kernel import extract_bytes

    sample = pages.orderBy("url").limit(2).collect()
    bench_rows = []
    for r in sample:
        text = extract_bytes(bytes(r["html"]))["content_text"]
        words = text.split()
        if len(words) >= 20:
            bench_rows.append((" ".join(words[:20]),))
    assert bench_rows, "fixture pages must yield extractable text"
    bench = spark.createDataFrame(bench_rows, ["text"])

    out = pretraining_pipeline(
        spark, pages, Options(),
        benchmark=bench, decontam_n=13,
        near_dup_method="clusters",
        repetition_filter=True,
        max_pages_per_host=50,
        seq_len=64,
        shard_budget_tokens=500,
        shard_out_dir=str(tmp_path / "shards"),
        datasheet=True,
    )
    try:
        report = dict(out["report"])
        assert report["after_curation_and_near_dup"] > 50
        # the repetition gate ran and is bounded by the prior stage
        assert report["after_repetition_filter"] \
            <= report["after_curation_and_near_dup"]
        assert report["after_repetition_filter"] > 0
        # decontamination dropped at least the benchmark-source docs
        assert report["after_decontamination"] \
            < report["after_repetition_filter"]
        assert report["after_host_quota"] <= report["after_decontamination"]

        corpus = out["corpus"]
        n_final = corpus.count()
        assert n_final == report["after_host_quota"]

        # sequence assignment covers every corpus token exactly once
        seqs = out["sequences"]
        total_tokens = corpus.agg(F.sum("n_tokens")).collect()[0][0]
        assert seqs.agg(F.sum("n_tokens")).collect()[0][0] == total_tokens
        per_seq = {r["seq_id"]: r["s"] for r in
                   seqs.groupBy("seq_id").agg(
                       F.sum("n_tokens").alias("s")).collect()}
        full = [s for s in per_seq if s != max(per_seq)]
        assert all(per_seq[s] == 64 for s in full)

        # shards on disk match the manifest and cover the corpus
        manifest = out["shard_manifest"]
        assert sum(m["n_docs"] for m in manifest) == n_final
        assert sum(m["shard_tokens"] for m in manifest) == total_tokens
        for m in manifest[:3]:
            payload = gzip.decompress(open(m["file"], "rb").read())
            assert len(payload.decode().splitlines()) == m["n_docs"]

        # release datasheet agrees with the final corpus
        ds = {(r["section"], r["key"]): r["value"]
              for r in out["datasheet"].collect()}
        assert ds[("overview", "n_docs")] == n_final
        assert ds[("overview", "total_tokens")] == total_tokens
    finally:
        out["release"]()


def test_pipeline_selection_stages(spark):
    """url rules + paragraph dedup + CCNet buckets + DSIR selection as
    composed stages: every stage bounded by its predecessor, report rows
    in order, final corpus consistent."""
    from rs_trafilatura_spark.plans.pipeline import pretraining_pipeline
    from rs_trafilatura_spark.datagen.corpus import generate_pages_df
    from rs_trafilatura_spark.options import Options

    pages = generate_pages_df(spark, n_rows=60)
    # target = a handful of real pages' pages (self-similar selection)
    out = pretraining_pipeline(
        spark, pages, Options(),
        url_rules=True,
        dedup_paragraphs=True,
        dedup_substrings=True,
        ccnet_keep=("head", "middle"),
        dsir_target=None,
        near_dup_method="clusters",
    )
    try:
        report = dict(out["report"])
        assert report["after_url_rules"] == 60  # synthetic urls are clean
        n0 = report["after_curation_and_near_dup"]
        assert report["after_paragraph_dedup"] <= n0
        assert report["after_substring_dedup"] \
            <= report["after_paragraph_dedup"]
        # thirds: head+middle keeps ~2/3
        n_pd = report["after_substring_dedup"]
        n_cc = report["after_ccnet_buckets"]
        # ntile(3): the tail group holds exactly floor(n/3) rows, so
        # keeping head+middle keeps n - n//3 — an exact count, not a bound
        assert n_cc == n_pd - n_pd // 3
        assert out["corpus"].count() == n_cc
        # stage order in the report
        names = [s for s, _ in out["report"]]
        assert names.index("after_url_rules") < \
            names.index("after_paragraph_dedup") < \
            names.index("after_ccnet_buckets")
    finally:
        out["release"]()


def test_pipeline_dsir_stage(spark):
    from rs_trafilatura_spark.plans.pipeline import pretraining_pipeline
    from rs_trafilatura_spark.datagen.corpus import generate_pages_df
    from rs_trafilatura_spark.options import Options
    from rs_trafilatura_spark.kernel import extract_bytes

    pages = generate_pages_df(spark, n_rows=40)
    sample = pages.orderBy("url").limit(3).collect()
    target_rows = [(i, extract_bytes(bytes(r["html"]))["content_text"])
                   for i, r in enumerate(sample)]
    target = spark.createDataFrame(target_rows, ["doc_id", "text"])
    out = pretraining_pipeline(
        spark, pages, Options(),
        dsir_target=target, dsir_top_frac_x100=50,
        near_dup_method="clusters",
    )
    try:
        report = dict(out["report"])
        n0 = report["after_curation_and_near_dup"]
        assert report["after_dsir_selection"] == (n0 * 50) // 100
        assert out["corpus"].count() == report["after_dsir_selection"]
    finally:
        out["release"]()


def test_split_aware_packing_never_mixes_splits(spark, tmp_path):
    """With splits assigned, sequences and shard files are packed PER
    SPLIT — a training sequence or shard containing eval text would leak
    the eval split into training batches."""
    import gzip as _gzip

    pages = generate_pages_df(spark, n_rows=150)
    out = pretraining_pipeline(
        spark, pages,
        split_weights_x100=(("train", 90), ("val", 5), ("test", 5)),
        seq_len=64, shard_budget_tokens=500,
        shard_out_dir=str(tmp_path / "shards"),
    )
    try:
        split_of = {r["doc_id"]: r["split"] for r in
                    out["corpus"].select("doc_id", "split").collect()}
        seqs = out["sequences"].collect()
        assert seqs
        assert all(split_of[r["doc_id"]] == r["split"] for r in seqs)
        for m in out["shard_manifest"]:
            payload = _gzip.decompress(open(m["file"], "rb").read()).decode()
            for line in payload.splitlines():
                assert split_of[int(line.split("\t", 1)[0])] == m["split"]
        # per-split token conservation: packing loses/creates nothing
        for s in ("train", "val", "test"):
            t_corpus = (out["corpus"].filter(F.col("split") == s)
                        .agg(F.sum("n_tokens")).collect()[0][0] or 0)
            assert sum(r["n_tokens"] for r in seqs
                       if r["split"] == s) == t_corpus
    finally:
        out["release"]()


def test_pipeline_guess_language_datasheet(spark):
    """guess_language=True tags the corpus with a map-only lang_guess
    column and the release datasheet's by-language section reports the
    guessed distribution (not 'und')."""
    from rs_trafilatura_spark.datagen.corpus import generate_pages_df
    from rs_trafilatura_spark.options import Options
    from rs_trafilatura_spark.plans.pipeline import pretraining_pipeline

    pages = generate_pages_df(spark, n_rows=60)
    out = pretraining_pipeline(
        spark, pages, Options(), datasheet=True, guess_language=True,
    )
    try:
        corpus = out["corpus"]
        assert "lang_guess" in corpus.columns
        langs = {r["key"]: r["value"] for r in out["datasheet"]
                 .filter(F.col("section") == "docs_per_lang").collect()}
        assert "und" not in langs
        assert sum(langs.values()) == corpus.count()
        # the synthetic corpus is dominated by English prose
        assert max(langs, key=langs.get) == "en"
    finally:
        out["release"]()


def test_pipeline_semantic_dedup_stage(spark):
    """SemDeDup stage: docs whose embeddings are exact scale-copies of
    another doc's drop (one survivor per group, smallest doc_id under
    tied centroid sims); docs WITHOUT an embedding row are kept."""
    import numpy as np
    from pyspark.sql import functions as F

    from rs_trafilatura_spark.datagen.corpus import generate_pages_df
    from rs_trafilatura_spark.options import Options
    from rs_trafilatura_spark.plans.pipeline import pretraining_pipeline

    pages = generate_pages_df(spark, n_rows=40)
    ids = [r["doc_id"] for r in pages.select(
        F.xxhash64("url").alias("doc_id")).collect()]
    ids.sort()
    # distinct random embeddings; the last 6 ids become x2 copies of the
    # first 3 (two copies each -> 3 groups of 3, greedy keeps min id);
    # the 4th id gets NO embedding row at all
    rng = np.random.RandomState(7)
    rows = []
    no_emb = ids[3]
    twin_of = {}
    for i, d in enumerate(ids):
        if d == no_emb:
            continue
        if i >= len(ids) - 6:
            src = ids[(i - (len(ids) - 6)) % 3]
            twin_of[d] = src
            base = rows_by_id[src]
            rows.append((d, [float(x * 2.0) for x in base]))
        else:
            v = rng.randn(16)
            v = [float(x) for x in v / np.linalg.norm(v)]
            if i == 0:
                rows_by_id = {}
            rows_by_id[d] = v
            rows.append((d, v))
    embs = spark.createDataFrame(rows, ["doc_id", "embedding"])

    out = pretraining_pipeline(
        spark, pages, Options(),
        embeddings=embs, semdedup_threshold_x1000=950, semdedup_cells=4,
    )
    try:
        report = dict(out["report"])
        kept_ids = {r["doc_id"] for r in out["corpus"].select("doc_id").collect()}
        n_before = report["after_curation_and_near_dup"]
        # every surviving curated doc that is a scale-copy must be gone;
        # its source (smaller id, tied cent sim) must survive when curated
        survivors_before = set()
        # reconstruct which ids were still present before the stage: the
        # stage only removes, so kept_ids + dropped twins == before-set
        for d, src in twin_of.items():
            assert d not in kept_ids, "scale-copy survived semantic dedup"
        assert report["after_semantic_dedup"] == len(kept_ids)
        assert report["after_semantic_dedup"] <= n_before
        # the no-embedding doc is never dropped by this stage: if it was
        # curated in, it must still be present
        curated_only = pretraining_pipeline(spark, pages, Options())
        try:
            base_ids = {r["doc_id"] for r in
                        curated_only["corpus"].select("doc_id").collect()}
        finally:
            curated_only["release"]()
        if no_emb in base_ids:
            assert no_emb in kept_ids
        # originals of dropped twins survive when they were curated in
        for d, src in twin_of.items():
            if src in base_ids:
                assert src in kept_ids, "group survivor was dropped"
    finally:
        out["release"]()


def test_pipeline_bpe_token_billing(spark):
    """tokenizer_merges switches n_tokens from whitespace words to exact
    trained-BPE token counts; sequence packing then bills in the same
    currency (sum over sequences == sum over corpus)."""
    from rs_trafilatura_spark.datagen.corpus import generate_pages_df
    from rs_trafilatura_spark.options import Options
    from rs_trafilatura_spark.operators.tokenizer import bpe_encode, bpe_train
    from rs_trafilatura_spark.plans.pipeline import pretraining_pipeline

    pages = generate_pages_df(spark, n_rows=40)
    base = pretraining_pipeline(spark, pages, Options())
    try:
        merges = bpe_train(base["corpus"], n_merges=12)
    finally:
        base["release"]()
    assert len(merges) == 12

    out = pretraining_pipeline(
        spark, pages, Options(), tokenizer_merges=merges, seq_len=128,
    )
    try:
        corpus = out["corpus"]
        direct = bpe_encode(corpus.drop("n_tokens"), merges,
                            count_col="bpe_direct")
        joined = corpus.join(direct.select("doc_id", "bpe_direct"), "doc_id")
        assert joined.filter(
            F.col("n_tokens") != F.col("bpe_direct")).count() == 0
        # BPE merges compress: counts differ from whitespace words
        words = corpus.select(
            F.sum(F.size(F.split("text", " "))).alias("w")
        ).collect()[0]["w"]
        total = corpus.agg(F.sum("n_tokens")).collect()[0][0]
        assert total != words
        seqs = out["sequences"]
        assert seqs.agg(F.sum("n_tokens")).collect()[0][0] == total
    finally:
        out["release"]()


def test_pipeline_shuffle_seed_reorders_packing(spark):
    """shuffle_seed packs in seeded-hash order: same seed reproduces the
    identical sequence assignment, a different seed permutes it, and the
    token accounting (every corpus token exactly once, full sequences
    exactly seq_len) holds in shuffled order too."""
    from pyspark.sql import functions as F
    from rs_trafilatura_spark.datagen.corpus import generate_pages_df
    from rs_trafilatura_spark.options import Options
    from rs_trafilatura_spark.plans.pipeline import pretraining_pipeline

    pages = generate_pages_df(spark, n_rows=60)

    def run(**kw):
        out = pretraining_pipeline(spark, pages, Options(),
                                   seq_len=64, **kw)
        try:
            seqs = sorted(map(tuple, out["sequences"].collect()))
            corpus_tokens = out["corpus"].agg(
                F.sum("n_tokens")).collect()[0][0]
            # corpus column contract unchanged by the shuffle stage
            assert "shuffle_order" not in out["corpus"].columns
        finally:
            out["release"]()
        return seqs, corpus_tokens

    plain, total = run()
    s7a, total7 = run(shuffle_seed=7)
    s7b, _ = run(shuffle_seed=7)
    s8, _ = run(shuffle_seed=8)
    assert total7 == total
    assert s7a == s7b
    assert s7a != plain and s7a != s8
    # token conservation in shuffled order
    by_seq: dict = {}
    tok_sum = 0
    for row in s7a:
        d = dict(zip(("seq_id", "doc_id", "doc_off", "seq_off", "n_tokens"),
                     row))
        by_seq[d["seq_id"]] = by_seq.get(d["seq_id"], 0) + d["n_tokens"]
        tok_sum += d["n_tokens"]
    assert tok_sum == total
    last = max(by_seq)
    assert all(v == 64 for k, v in by_seq.items() if k != last)
