"""Cross-crawl incremental dedup with a Bloom prefilter — the shape that
makes "have we seen this document before?" affordable at 10^12 documents.

A plain semi-join of the new crawl against the full history shuffles BOTH
sides on the content hash.  The Bloom path builds a compact bitset over
the history once, broadcasts it, and discards the vast majority of
genuinely-new documents map-side; only the bloom-positive sliver (true
repeats + fpp of the new side) reaches the exact verify join.  The final
answer is EXACT — false positives die in the verify join, and Bloom
filters have no false negatives — so the result equals the plain
semi-join while the shuffled volume drops from |new| to
|new ∩ history| + fpp·|new|.

Spark 4 keeps ``bloom_filter_agg`` internal (runtime-filter machinery,
not a public SQL function), so the filter is built the distributed way:
each TASK folds all its Arrow batches of history hashes into one local
numpy bitset (mapInPandas, exactly one binary row per partition), the
driver ORs the per-task bitsets (num_bits/8 bytes each — 1 MiB at 2^23,
O(partitions) total), and the probe side is an Arrow-batched vectorized
numpy bit test.  Hashing is double-hashed
md5 (h1 + i*h2 mod m, the standard k-probe construction) — fully
deterministic, no RNG.

At a real deployment the serialized bitset persists next to the crawl
manifest and new increments OR into it; sizing: fpp ≈ (1-e^{-kn/m})^k,
so 10^9 docs at k=4 want m ≈ 2^33 bits = 1 GiB, still one broadcast.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F, types as T

DEFAULT_NUM_BITS = 1 << 23
DEFAULT_K = 4


def _probe_indices(md5_hex, num_bits: int, k: int) -> np.ndarray:
    """(len, k) int64 probe positions from md5 hex strings (vectorized
    double hashing)."""
    a = np.array([int(h[:15], 16) for h in md5_hex], dtype=np.int64)
    b = np.array([int(h[15:30], 16) | 1 for h in md5_hex], dtype=np.int64)
    i = np.arange(k, dtype=np.int64)
    return (a[:, None] + i[None, :] * b[:, None]) % num_bits


def build_bloom(docs: DataFrame, num_bits: int = DEFAULT_NUM_BITS,
                k: int = DEFAULT_K,
                tree_fanin: int | None = None) -> bytes:
    """Distributed Bloom build over md5(text): ONE bitset per task —
    allocated before the Arrow-batch loop, every batch ORed into it,
    yielded exactly once when the partition is exhausted — so the driver
    collect is O(partitions x num_bits/8), independent of document count
    and of Arrow's maxRecordsPerBatch.  (The r5 shape allocated a bitset
    per BATCH: at 10k-row Arrow batches that made the collect ~250x
    larger, fatal at the 2^33-bit sizing below.)

    Scale rungs by filter size m: at m = 2^23 (1 MiB/part) the direct
    collect is nothing.  At m ≥ 2^30 (128 MiB/part) pass ``tree_fanin``
    (e.g. 8): per-task bitsets are OR-reduced through
    groupBy(row_id % n_groups) rounds — each reducer task materializes at
    most fanin x m/8 bytes, each round shrinks the row count by fanin,
    and the final driver collect is ≤ fanin bitsets instead of one per
    input partition.  Output is byte-identical to the direct build (OR is
    associative/commutative); the serialized result still broadcasts
    once."""
    parts = _task_bitsets(docs, num_bits, k)
    if tree_fanin is not None and tree_fanin > 1:
        parts = _tree_or(parts, num_bits,
                         n_rows=docs.rdd.getNumPartitions(),
                         fanin=tree_fanin)
    acc = np.zeros((num_bits + 7) // 8, dtype=np.uint8)
    for row in parts.collect():
        acc |= np.frombuffer(row["bits"], dtype=np.uint8)
    return acc.tobytes()


def _tree_or(parts: DataFrame, num_bits: int, n_rows: int,
             fanin: int) -> DataFrame:
    """OR-reduce a (bits binary) frame in rounds of ``fanin`` until at
    most ``fanin`` rows remain.  Each round groups by an EXACT unique row
    id modulo the round's group count — the first round's id is
    spark_partition_id() (one row per task by _task_bitsets' contract),
    and each round emits its group key as the next round's id — so group
    sizes are provably ≤ fanin and every reducer materializes at most
    fanin x num_bits/8 bytes.  (monotonically_increasing_id would NOT do:
    its (partition << 33 | row) ids collide modulo small group counts and
    can silently overfill a group.)"""
    import math

    import pandas as pd

    def or_group(key, pdf):
        acc = np.zeros((num_bits + 7) // 8, dtype=np.uint8)
        for b in pdf["bits"]:
            acc |= np.frombuffer(b, dtype=np.uint8)
        return pd.DataFrame({"_id": [int(key[0])], "bits": [acc.tobytes()]})

    tagged = parts.withColumn("_id", F.spark_partition_id().cast("long"))
    while n_rows > fanin:
        n_groups = math.ceil(n_rows / fanin)
        tagged = (
            tagged
            .withColumn("_g", F.col("_id") % n_groups)
            .groupBy("_g")
            .applyInPandas(or_group, "_id long, bits binary")
        )
        n_rows = n_groups
    return tagged.select("bits")


def _task_bitsets(docs: DataFrame, num_bits: int, k: int) -> DataFrame:
    """One (bits binary) row PER TASK — the collect volume contract of
    ``build_bloom``, split out so a test can pin rows == partitions."""
    hashed = docs.select(F.md5("text").alias("_h"))

    def per_task(it):
        import pandas as pd

        bits = np.zeros((num_bits + 7) // 8, dtype=np.uint8)
        for pdf in it:
            if len(pdf):
                idx = _probe_indices(pdf["_h"].tolist(), num_bits, k)
                flat = idx.ravel()
                np.bitwise_or.at(bits, flat // 8,
                                 (1 << (flat % 8)).astype(np.uint8))
        yield pd.DataFrame({"bits": [bits.tobytes()]})

    return hashed.mapInPandas(per_task, "bits binary")


def update_bloom(bits: bytes, new_docs: DataFrame,
                 k: int = DEFAULT_K,
                 tree_fanin: int | None = None) -> bytes:
    """OR a new crawl increment into an existing serialized filter — the
    cross-crawl maintenance step the module docstring describes: the
    bitset persists next to the crawl manifest and each increment folds
    in without rescanning history.  ``num_bits`` is implied by the
    serialized size (it must match the original build's, or probe
    positions would disagree); ``k`` likewise.  Union-of-builds equals
    build-of-union exactly (bitwise OR), so incremental maintenance
    never drifts from a from-scratch rebuild."""
    num_bits = len(bits) * 8
    inc = build_bloom(new_docs, num_bits, k, tree_fanin)
    acc = np.frombuffer(bits, dtype=np.uint8) | np.frombuffer(
        inc, dtype=np.uint8)
    return acc.tobytes()


def seen_filter(new_docs: DataFrame, old_docs: DataFrame,
                num_bits: int = DEFAULT_NUM_BITS,
                k: int = DEFAULT_K) -> DataFrame:
    """Append an exact ``seen`` flag to ``new_docs``: True iff the same
    text (by md5) appears in ``old_docs``.  Bloom prefilter + exact
    verify; identical output to a plain semi-join."""
    spark = new_docs.sparkSession
    bloom_bc = spark.sparkContext.broadcast(
        build_bloom(old_docs, num_bits, k)
    )

    @F.pandas_udf(T.BooleanType())
    def maybe_seen(h):
        import pandas as pd

        bits = np.frombuffer(bloom_bc.value, dtype=np.uint8)
        if not len(h):
            return pd.Series([], dtype=bool)
        idx = _probe_indices(h.tolist(), num_bits, k)
        hit = (bits[idx // 8] & (1 << (idx % 8)).astype(np.uint8)) != 0
        return pd.Series(hit.all(axis=1))

    hashed = new_docs.withColumn("_h", F.md5("text"))
    candidates = hashed.filter(maybe_seen(F.col("_h"))) \
        .select("doc_id", "_h")
    old_h = old_docs.select(F.md5("text").alias("_h"))
    seen = candidates.join(old_h, "_h", "left_semi") \
        .select("doc_id", F.lit(True).alias("seen"))
    return (
        hashed.drop("_h")
        .join(seen, "doc_id", "left")
        .withColumn("seen", F.coalesce("seen", F.lit(False)))
    )
