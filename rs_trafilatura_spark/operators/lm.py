"""CCNet-style language-model quality scoring + perplexity bucketing
(Wenzek et al. 2020, "CCNet: Extracting High Quality Monolingual
Datasets from Web Crawl Data").

CCNet scores each document with a KenLM 5-gram perplexity and splits the
corpus into head/middle/tail buckets at corpus-level percentiles; the
head bucket is the "high quality" slice.  This module reproduces that
recipe with a unigram LM whose surprisal is **integer-exact across
engines**: instead of float log-probabilities (whose libm rounding can
differ between the JVM and C and would break hash-pinned oracles), each
token's surprisal is the floor-log2 proxy

    s(token) = bitlen(N) - bitlen(count(token))

where ``bitlen(x) = length(bin(x))`` (identical in Spark and DuckDB) and
N is the training corpus' total token count.  A frequent token costs few
bits, a rare one close to bitlen(N); the per-document score is the mean
surprisal x1000, floored — a monotone, integer-exact stand-in for
perplexity that induces the same head/middle/tail ordering semantics.

Scale shape (100 TB):
- ``train_token_counts``: one groupBy over exploded tokens — map-side
  partial aggregation makes the shuffle O(distinct tokens per task), and
  the result is O(vocabulary), not O(corpus).
- ``lm_surprisal``: explode -> broadcast-join the vocabulary -> groupBy
  doc_id.  The vocab broadcast is explicit; the doc_id agg again
  combines map-side so the shuffle carries one row per (task, doc).
- ``ccnet_bucket``: ntile over a global sort — correct for oracle-scale
  exactness.  At web scale use ``bucket_by_thresholds`` with cutoffs
  trained on a sample (CCNet itself fits its buckets on a sample), which
  is a pure map pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

TOKEN_SEP = "[ \\t\\n\\r]+"


def _tokens(col):
    return F.filter(F.split(col, TOKEN_SEP), lambda t: F.length(t) > 0)


def train_token_counts(corpus: DataFrame) -> DataFrame:
    """Unigram counts over ``corpus.text``: (token, cnt).  One shuffle,
    combined map-side; output is O(vocabulary)."""
    return (
        corpus.select(F.explode(_tokens(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
    )


def lm_surprisal(documents: DataFrame, vocab: DataFrame,
                 total_tokens: int) -> DataFrame:
    """Mean floor-log2 surprisal per document against ``vocab``
    (token, cnt).  Out-of-vocabulary tokens cost the maximum
    ``bitlen(total_tokens)`` bits.  Returns (doc_id, n_tokens,
    surprisal_x1000)."""
    bits_n = len(bin(int(total_tokens))) - 2  # python bitlen == bin len
    toks = documents.select(
        "doc_id", F.explode(_tokens(F.col("text"))).alias("token")
    )
    scored = toks.join(F.broadcast(vocab), "token", "left").select(
        "doc_id",
        F.when(F.col("cnt").isNull(), F.lit(bits_n))
        .otherwise(F.lit(bits_n) - F.length(F.bin(F.col("cnt"))))
        .alias("bits"),
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.floor(F.lit(1000) * F.sum("bits") / F.count("*"))
        .cast("long")
        .alias("surprisal_x1000"),
    )


def ccnet_bucket(scored: DataFrame) -> DataFrame:
    """head/middle/tail by corpus-level thirds of ascending surprisal
    (ties broken by doc_id so both engines rank identically).  Exact
    global ntile — oracle configuration; see ``bucket_by_thresholds``
    for the sampled-cutoff map-only variant used at scale."""
    w = Window.orderBy("surprisal_x1000", "doc_id")
    return scored.withColumn("tile", F.ntile(3).over(w)).withColumn(
        "bucket",
        F.element_at(
            F.array(F.lit("head"), F.lit("middle"), F.lit("tail")),
            F.col("tile"),
        ),
    ).drop("tile")


def bucket_by_thresholds(scored: DataFrame, head_max: int,
                         middle_max: int) -> DataFrame:
    """Map-only bucketing with precomputed surprisal cutoffs — the 100 TB
    path (cutoffs fit on a sample, as CCNet does)."""
    s = F.col("surprisal_x1000")
    return scored.withColumn(
        "bucket",
        F.when(s <= head_max, F.lit("head"))
        .when(s <= middle_max, F.lit("middle"))
        .otherwise(F.lit("tail")),
    )


def ccnet_pipeline(corpus: DataFrame) -> DataFrame:
    """Self-trained CCNet scoring: train unigram counts on the corpus,
    score every document, bucket into thirds.  Returns (doc_id,
    n_tokens, surprisal_x1000, bucket)."""
    vocab = train_token_counts(corpus)
    total = vocab.agg(F.sum("cnt")).collect()[0][0] or 0
    return ccnet_bucket(lm_surprisal(corpus, vocab, int(total)))
