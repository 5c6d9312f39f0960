"""Window-function operators the surrounding pipeline needs (SURVEY.md §2.5
notes the reference has none in-kernel; these are the corpus-side
equivalents: per-key top-k and event sessionization)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def topk_docs_per_source(documents: DataFrame, k: int = 2) -> DataFrame:
    """Longest-k documents per source — Window.partitionBy + row_number.
    Ties broken by doc_id for determinism."""
    w = Window.partitionBy("source").orderBy(
        F.desc("n_chars"), F.asc("doc_id")
    )
    return (
        documents.select("doc_id", "source", "n_chars")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("source", "rank", "doc_id", "n_chars")
    )


def sessionize_events(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Classic sessionization: lag(ts) per user -> new-session flag on
    gap > threshold -> running sum = session id; then per-session aggregates.
    One shuffle on user_id; the windows reuse its partitioning."""
    w_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    epoch = F.unix_timestamp(F.col("ts").cast("timestamp"))
    gap = epoch - F.lag(epoch).over(w_user)
    with_flag = events.select(
        "user_id", "event_id", "ts", "value",
        F.when(gap.isNull() | (gap > gap_minutes * 60), 1)
        .otherwise(0).alias("new_session"),
    )
    with_session = with_flag.withColumn(
        "session_seq", F.sum("new_session").over(
            Window.partitionBy("user_id").orderBy("ts", "event_id")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
    )
    # total_value: sum as DECIMAL (order-independent, unlike float sums) and
    # emit as a x1e6-scaled BIGINT so the value representation is identical
    # across engines (doubles/decimals format differently; integers don't).
    return (
        with_session.groupBy("user_id", "session_seq")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            (F.sum(F.col("value").cast("decimal(38,6)")) * 1000000)
            .cast("long").alias("total_value_x1e6"),
        )
    )


def capped_per_key(df: DataFrame, key: str, n: int,
                   order_cols: tuple = ("doc_id",),
                   n_salts: int = 16) -> DataFrame:
    """Per-key quota cap — keep at most ``n`` rows per key (e.g. limit any
    single host to n pages so one zipfian mega-host cannot dominate the
    training mix).  Returns the input rows that survive, plus their
    within-key rank.

    The naive plan — ``row_number() over (partition by key)`` — funnels a
    mega-key's every row through ONE task.  This is the standard two-phase
    refinement: phase 1 ranks within (key, salt) and keeps each bucket's
    top n (map-side-bounded: at most n_salts*n rows per key survive,
    REGARDLESS of key skew); phase 2 ranks the survivors exactly.  The
    phase-2 window sees <= n_salts*n rows per key, so the single-task
    funnel is bounded by the quota, not by the key's corpus share.
    ``order_cols`` must be a deterministic total order for ranks to be
    reproducible."""
    if n <= 0:
        raise ValueError("n must be positive")
    order = [F.asc(c) for c in order_cols]
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in order_cols]),
                  F.lit(n_salts)).alias("_salt")
    w1 = Window.partitionBy(key, "_salt").orderBy(*order)
    phase1 = (
        df.withColumn("_salt", salt)
        .withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= n)
        .drop("_r1")
    )
    w2 = Window.partitionBy(key).orderBy(*order)
    return (
        phase1.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= n)
        .drop("_salt")
    )
