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
