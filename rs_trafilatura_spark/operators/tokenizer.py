"""Tokenizer-training corpus statistics: distributed BPE primitives.

The expensive, corpus-sized parts of training a byte-pair-encoding
vocabulary (Sennrich et al. 2016, arXiv:1508.07909; the GPT-2 tokenizer
recipe) are (a) the word-frequency table and (b) the per-round adjacent
symbol-pair counts.  Both are plain shuffles here; the per-round merge
CHOICE is a single argmax row to the driver, and merge APPLICATION runs
over the (unique-words) vocabulary table, not the corpus.

Spark-first shapes:
- ``word_vocab``: split/explode + groupBy(word) — map-side combined, the
  only pass that touches corpus text.  At 100 TB this is the standard
  word-count shuffle (fixed-width (word, count) rows).
- ``char_pair_counts``: pure Catalyst — posexplode over character
  positions, no UDF; this is BPE round 1 exactly, and the SQL-mirrorable
  primitive the driver oracle pins.
- ``bpe_train``: k rounds of count-pairs -> argmax -> apply-merge.  Pair
  counting explodes the symbol arrays of the VOCAB (|V| rows, corpus-
  independent); application is an Arrow-batched pass over the same |V|
  rows.  One O(1) argmax row reaches the driver per round — the driver
  never sees the vocabulary itself.  (Production tokenizers train on a
  corpus sample; the point here is that nothing in the loop scales with
  corpus size once the vocab table exists.)

Determinism: ties in pair counts break on the pair's string form
(count DESC, left ASC, right ASC) — fixed across engines and runs.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F


def word_vocab(docs: DataFrame, text_col: str = "text",
               ascii_only: bool = False) -> DataFrame:
    """(word, n) frequency table over whitespace-split, lowercased words.
    ``ascii_only`` keeps ^[A-Za-z]+$ words — filtered on the RAW token
    and lowered only afterwards, so lower() never sees one-to-many
    Unicode case mappings and both engines produce identical words (the
    same order-of-operations rule canonical_fingerprint uses).  This is
    the engine-exact slice the driver oracle pins; general Unicode word
    forms stay available to the trainer but are not oracle-pinned."""
    if ascii_only:
        words = (
            docs.select(
                F.explode(F.split(F.col(text_col), " ")).alias("w")
            )
            .filter(F.col("w").rlike("^[A-Za-z]+$"))
            .select(F.lower(F.col("w")).alias("word"))
        )
    else:
        words = (
            docs.select(
                F.explode(
                    F.split(F.lower(F.col(text_col)), " ")
                ).alias("word")
            )
            .filter(F.col("word") != "")
        )
    return words.groupBy("word").agg(F.count(F.lit(1)).alias("n"))


def char_pair_counts(vocab: DataFrame) -> DataFrame:
    """BPE round-1 pair statistics: adjacent CHARACTER pairs inside each
    word, weighted by word count.  Pure Catalyst (posexplode over
    substring positions) — no UDF, and exactly mirrorable in SQL."""
    return (
        vocab.filter(F.length("word") >= 2)
        .select(
            "n",
            F.explode(
                F.sequence(F.lit(1), F.length("word") - 1)
            ).alias("i"),
            F.col("word"),
        )
        .select(
            F.substring(F.col("word"), F.col("i"), 1).alias("left"),
            F.col("word").substr(F.col("i") + 1, F.lit(1)).alias("right"),
            "n",
        )
        .groupBy("left", "right")
        .agg(F.sum("n").alias("pair_n"))
    )


def _sym_pair_counts(symtab: DataFrame) -> DataFrame:
    """Adjacent SYMBOL pairs over (syms array<string>, n) rows — the
    round >= 2 generalization of char_pair_counts (symbols may be
    multi-character after merges)."""
    return (
        symtab.filter(F.size("syms") >= 2)
        .select(
            "n",
            F.explode(
                F.arrays_zip(
                    F.slice("syms", 1, F.size("syms") - 1),
                    F.slice("syms", 2, F.size("syms") - 1),
                )
            ).alias("p"),
        )
        .select(F.col("p.0").alias("left"), F.col("p.1").alias("right"), "n")
        .groupBy("left", "right")
        .agg(F.sum("n").alias("pair_n"))
    )


def _apply_merge(symtab: DataFrame, left: str, right: str) -> DataFrame:
    """Replace every non-overlapping left-to-right (left, right) adjacency
    with the merged symbol — the BPE application step, Arrow-batched over
    the |V|-row symbol table."""
    from pyspark.sql import types as T

    merged = left + right

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def merge(syms: pd.Series) -> pd.Series:
        out = []
        for s in syms:
            s = list(s)
            res = []
            i = 0
            n = len(s)
            while i < n:
                if i + 1 < n and s[i] == left and s[i + 1] == right:
                    res.append(merged)
                    i += 2
                else:
                    res.append(s[i])
                    i += 1
            out.append(res)
        return pd.Series(out)

    return symtab.withColumn("syms", merge(F.col("syms")))


def bpe_train(docs: DataFrame, n_merges: int, text_col: str = "text",
              ascii_only: bool = False) -> list[tuple[str, str, int]]:
    """Train ``n_merges`` BPE merges; returns [(left, right, pair_n)] in
    merge order.  Tie-break: pair_n DESC, left ASC, right ASC."""
    vocab = word_vocab(docs, text_col=text_col, ascii_only=ascii_only)
    # Spark's split keeps trailing empty strings (limit=-1 default), so
    # "(?!^)" yields a phantom "" symbol after the last char — drop it.
    symtab = vocab.select(
        F.filter(
            F.split(F.col("word"), "(?!^)"), lambda s: s != ""
        ).alias("syms"),
        "n",
    )
    # the vocab table is reused every round: materialize it once
    symtab = symtab.localCheckpoint(eager=True)
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        top = (
            _sym_pair_counts(symtab)
            .orderBy(F.desc("pair_n"), F.asc("left"), F.asc("right"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        left, right, pair_n = top[0]["left"], top[0]["right"], top[0]["pair_n"]
        merges.append((left, right, int(pair_n)))
        symtab = _apply_merge(symtab, left, right).localCheckpoint(eager=True)
    return merges
