"""Physical-plan regression gates: the scale story is plan shape, not
vibes — these tests fail if a future change silently reintroduces a
single-task window, a wide shuffle, or a full-width scan.

Each assertion documents WHY the property matters at 100 TB.
"""

import pytest
from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_pack_shards_has_no_single_partition_exchange(spark):
    """The naive global-order cumsum serializes the corpus through ONE
    task (Exchange SinglePartition).  The distributed prefix sum must
    keep every exchange hash-partitioned."""
    from rs_trafilatura_spark.operators.packing import pack_shards

    docs = spark.createDataFrame(
        [(i, "w " * 20) for i in range(200)], ["doc_id", "text"]
    )
    plan = _plan(pack_shards(docs, budget_tokens=100, bucket_width=16))
    assert "Exchange SinglePartition" not in plan, plan
    assert "windowspecdefinition(_bucket" in plan.replace(" ", "") or \
        "_bucket" in plan  # window is partitioned by the bucket key


def test_token_stats_scan_prunes_columns(spark):
    """A projection query must not drag every column through the scan:
    at 100 TB the html/binary columns dominate bytes; ReadSchema shows
    what actually leaves the parquet reader."""
    from rs_trafilatura_spark.operators.textstats import token_stats

    out = token_stats(
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    )
    scan = out._jdf.queryExecution().executedPlan().toString()
    assert "ReadSchema" in scan
    read_schema = scan.split("ReadSchema:", 1)[1].splitlines()[0]
    assert "text" in read_schema and "doc_id" in read_schema
    for heavy in ("lang", "source"):
        assert heavy not in read_schema, read_schema


def test_dedup_exact_is_single_aggregate_with_partial(spark):
    """Exact dedup is one groupBy with a map-side partial aggregate —
    exactly one exchange, keyed on the group column."""
    from rs_trafilatura_spark.operators.dedup import dedup_exact

    docs = spark.createDataFrame(
        [(i, f"text {i % 7}") for i in range(50)], ["doc_id", "text"]
    )
    plan = _plan(dedup_exact(docs))
    assert plan.count("Exchange") == 1, plan
    assert "partial_" in plan  # map-side combine before the shuffle


def test_broadcast_offsets_join_in_pack_shards(spark):
    """The O(n/width) bucket-offset table must broadcast — a shuffle
    join on _bucket would re-shuffle the corpus a second time."""
    from rs_trafilatura_spark.operators.packing import pack_shards

    docs = spark.createDataFrame(
        [(i, "w " * 10) for i in range(300)], ["doc_id", "text"]
    )
    plan = _plan(pack_shards(docs, budget_tokens=64, bucket_width=32))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_capped_per_key_no_global_sort(spark):
    """The two-phase salted rank must never globally sort the corpus
    (rangepartitioning = the skew trap it exists to avoid)."""
    from rs_trafilatura_spark.operators.windows import capped_per_key

    docs = spark.createDataFrame(
        [(i, f"h{i % 5}") for i in range(100)], ["doc_id", "host"]
    )
    plan = _plan(capped_per_key(docs, "host", n=3, order_cols=("doc_id",)))
    assert "rangepartitioning" not in plan.lower(), plan


def test_gopher_repetition_is_shuffle_free_and_prunes(spark):
    """The repetition pass is one mapInPandas over (doc_id, text):
    at 100 TB any Exchange here would reshuffle the full text corpus
    for no reason, and the scan must not read html/lang."""
    from rs_trafilatura_spark.operators.textstats import gopher_repetition

    out = gopher_repetition(
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    )
    plan = _plan(out)
    assert "Exchange" not in plan, plan
    read_schema = plan.split("ReadSchema:", 1)[1].splitlines()[0]
    assert "text" in read_schema and "lang" not in read_schema


def test_lm_surprisal_broadcasts_vocab(spark):
    """The vocabulary join must be a broadcast: a sort-merge join here
    would shuffle the exploded token stream (O(corpus tokens) rows)
    on the token key."""
    from rs_trafilatura_spark.operators.lm import (
        lm_surprisal, train_token_counts,
    )

    docs = spark.createDataFrame(
        [(i, "alpha beta gamma " * 4) for i in range(40)],
        ["doc_id", "text"])
    plan = _plan(lm_surprisal(docs, train_token_counts(docs), 480))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    # doc_id agg combines map-side before its shuffle
    assert "partial_" in plan


def test_dsir_scores_broadcasts_both_count_tables(spark):
    """DSIR joins the gram stream against target and raw bucket counts:
    both are O(buckets) and must broadcast — any sort-merge join would
    shuffle the exploded gram stream twice."""
    from rs_trafilatura_spark.operators.dsir import (
        dsir_scores, hashed_bucket_counts,
    )

    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta " * 3) for i in range(40)],
        ["doc_id", "text"])
    target = hashed_bucket_counts(docs.filter(F.col("doc_id") < 5))
    raw = hashed_bucket_counts(docs)
    plan = _plan(dsir_scores(docs, target, raw))
    assert plan.count("BroadcastHashJoin") == 2, plan
    assert "SortMergeJoin" not in plan, plan


def test_paragraph_dedup_avoids_hash_window(spark):
    """Canonical-paragraph selection must be a partial-aggregated groupBy,
    not a row_number window over the paragraph hash: a window sends every
    instance of a hot paragraph (site footers repeat 10^9 times) to one
    task; the partial min collapses them map-side."""
    from rs_trafilatura_spark.operators.dedup import paragraph_dedup

    docs = spark.createDataFrame(
        [(i, "alpha.\n\nshared footer.\n\nbody %d." % i)
         for i in range(30)], ["doc_id", "text"])
    plan = _plan(paragraph_dedup(docs))
    assert "Exchange SinglePartition" not in plan, plan
    assert "partial_min" in plan or "partial_" in plan, plan
    # no window operator anywhere in this plan
    assert "Window" not in plan, plan


def test_substring_dedup_shuffles_only_fixed_width_prefilter(spark):
    """The hash prefilter's groupBy must partial-combine map-side, and no
    stage may collapse to a single partition: the gram stream is ~1 row
    per corpus word."""
    from rs_trafilatura_spark.operators.substring import (
        exact_substring_dedup,
    )

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{i}x{j}" for j in range(30))) for i in range(20)],
        ["doc_id", "text"])
    plan = _plan(exact_substring_dedup(docs, n=5))
    assert "Exchange SinglePartition" not in plan, plan
    assert "partial_" in plan, plan


def test_bloom_seen_filter_prefilter_is_map_side(spark):
    """The bloom probe must be a Filter over the new side (no join before
    the exact verify): only bloom-positive rows may reach a join."""
    from rs_trafilatura_spark.operators.bloom import seen_filter

    old = spark.createDataFrame(
        [(i, f"h{i}") for i in range(50)], ["doc_id", "text"])
    new = spark.createDataFrame(
        [(100 + i, f"h{i % 10}") for i in range(50)], ["doc_id", "text"])
    plan = _plan(seen_filter(new, old))
    # the probe appears as a python-UDF filter, not as a join of the
    # bitset table against the full new side
    assert "maybe_seen" in plan or "ArrowEvalPython" in plan, plan
    assert "Exchange SinglePartition" not in plan, plan


def test_datasheet_single_corpus_scan(spark, tmp_path):
    """The datasheet's roll-ups must read the checkpointed grouping-sets
    output, never re-scan the corpus: zero file-scan nodes in the final
    plan (the one corpus scan ran eagerly at checkpoint time), and the
    grouping-sets Expand is what fused the cube + distinct-fp passes."""
    from rs_trafilatura_spark.operators.datasheet import corpus_datasheet

    pq = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        [(i, f"w{i % 5} text", "en", f"s{i % 3}") for i in range(60)],
        ["doc_id", "text", "lang", "source"],
    ).write.parquet(pq)
    plan = _plan(corpus_datasheet(spark.read.parquet(pq)))
    assert "parquet" not in plan.lower(), plan
    assert "partial_" in plan, plan


def test_tokenizer_plan_shapes(spark):
    """word_vocab must map-side combine (partial+final HashAggregate
    around ONE word exchange — at 100 TB the partial agg is what keeps
    the shuffle at vocab-, not corpus-, volume); bpe_encode must be a
    map-only pass: ZERO exchanges, the merge list rides the closure."""
    from rs_trafilatura_spark.operators.tokenizer import (
        bpe_encode, char_pair_counts, word_vocab,
    )

    docs = spark.createDataFrame(
        [(i, "the cat sat on the mat") for i in range(50)],
        ["doc_id", "text"])

    vplan = _plan(word_vocab(docs))
    assert vplan.lower().count("exchange") == 1
    assert "partial_count" in vplan.lower() or "partial" in vplan.lower()

    pplan = _plan(char_pair_counts(word_vocab(docs)))
    # vocab shuffle + pair shuffle, nothing else
    assert pplan.lower().count("exchange") == 2

    eplan = _plan(bpe_encode(docs, [("t", "h", 100), ("th", "e", 90)]))
    assert "exchange" not in eplan.lower()
    assert "mapinpandas" in eplan.lower().replace(" ", "")

    # the distributed trainer's merge loop is pure Catalyst: pair counts
    # + whole-symbol replace over the delimited string, no Python eval
    from rs_trafilatura_spark.operators.tokenizer import (
        _apply_merge, _sym_pair_counts,
    )
    symtab = spark.createDataFrame([(" t  h  e ", 5)], ["s", "n"])
    loop_plan = _plan(_sym_pair_counts(_apply_merge(symtab, "t", "h")))
    low = loop_plan.lower().replace(" ", "")
    assert "python" not in low and "pandas" not in low and "arrow" not in low


def test_quality_scoring_is_map_only(spark):
    """score_quality + the Pareto gate must add ZERO exchanges: at 100 TB
    the classifier pass rides the existing scan — any shuffle here would
    re-partition the full text corpus for a per-row scalar."""
    from rs_trafilatura_spark.operators.quality_classifier import (
        pareto_quality_filter, score_quality, train_quality_classifier,
    )

    pos = spark.createDataFrame([(i, "good words here") for i in range(10)],
                                ["doc_id", "text"])
    neg = spark.createDataFrame([(i, "bad spam junk") for i in range(10)],
                                ["doc_id", "text"])
    m = train_quality_classifier(pos, neg, num_features=64, max_iter=5)
    docs = spark.createDataFrame(
        [(i, f"u{i}", "some words") for i in range(20)],
        ["doc_id", "url", "text"])
    plan = _plan(pareto_quality_filter(score_quality(docs, m),
                                       key_col="url"))
    assert "exchange" not in plan.lower()
