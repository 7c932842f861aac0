"""Corpus-trained n-gram language-model scoring — the perplexity
quality signal (CCNet-style: docs whose token sequences are improbable
under a corpus LM are boilerplate/garbled/foreign, filtered before
training).

Spark-first shape, all JVM expressions:
- TRAIN: one explode of per-doc bigram arrays -> groupBy counts
  (map-side combined), plus unigram counts and the vocabulary size
  scalar. The model is two count tables — at 100 TB these live as
  DataFrames and join, never driver-side dicts.
- SCORE: per-doc bigrams join the count tables (hot-token skew is
  AQE-splittable, same rationale as ranking.py's df join), Laplace
  smoothing, mean log-prob per doc. log(x) of identically-computed
  doubles on both engines; scores rounded.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from strawboat_spark.functions.text import tokens


def _doc_bigrams(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, w1, w2) per consecutive token pair. Empty/one-token docs
    produce no rows (sequence() descends when stop < start, so the
    size guard is semantic, not just an optimization)."""
    toked = df.select(
        F.col(id_col),
        F.filter(tokens(text_col), lambda t: t != "").alias("__toks"),
    )
    pairs = F.when(
        F.size("__toks") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("__toks") - 1),
            lambda i: F.struct(
                F.element_at("__toks", i).alias("w1"),
                F.element_at("__toks", i + 1).alias("w2"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    return toked.select(id_col, F.explode(pairs).alias("p")).select(
        id_col, "p.w1", "p.w2"
    )


def bigram_lm_scores(
    df: DataFrame, id_col: str, text_col: str, round_digits: int = 4
) -> DataFrame:
    """Per-doc mean log P(w2|w1) under the corpus's own Laplace-
    smoothed bigram model: P = (c(w1,w2) + 1) / (c(w1) + V), V the
    unigram vocabulary size. Output: (id, n_bigrams, avg_logprob) for
    docs with >= 1 bigram; ascending avg_logprob ranks docs most
    atypical first."""
    # Plan shape (the r8 rework): the regex tokenize + explode is the
    # dominant map-side cost, and the naive formulation (instance
    # stream consumed by both the count build AND the score join) runs
    # it FOUR times with zero ReusedExchange (verified on the executed
    # plan). Pre-aggregating to per-doc bigram counts makes every
    # downstream consumer read the SAME exchange subtree, so Spark
    # dedups it (ReusedExchange) and each explode executes once; the
    # score join also shrinks from bigram INSTANCES to distinct
    # (doc, w1, w2) triples — strictly smaller on any corpus with
    # repetition.
    bi = _doc_bigrams(df, id_col, text_col)
    doc_bi = bi.groupBy(id_col, "w1", "w2").agg(F.count(F.lit(1)).alias("k"))
    bi_counts = doc_bi.groupBy("w1", "w2").agg(F.sum("k").alias("c12"))
    uni = df.select(
        F.explode(F.filter(tokens(text_col), lambda t: t != "")).alias("w1")
    )
    # The vocab scalar's branch re-runs the unigram explode (the
    # optimizer specializes its aggregate shape, defeating exchange
    # reuse; a localCheckpoint that would share one materialization was
    # MEASURED SLOWER at sf1 — 10.3 s vs 9.0 s — because the
    # materialization barrier costs more than the duplicated map-side
    # explode). The duplicated pass is map-only over the distinct-token
    # stream; accepted.
    uni_counts = uni.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    vocab = uni_counts.agg(F.count(F.lit(1)).alias("V"))

    # Both count tables GROW WITH THE CORPUS (bigram types ~ O(corpus),
    # vocab sub-linearly), so neither may ever be broadcast: Catalyst's
    # post-aggregate size estimates sit under the broadcast threshold
    # and it builds a HashedRelation of the whole model — measured at
    # the r11 sf10 probe as the super-linearity source (sf1->sf10 was
    # 12.2x for 10x data; with shuffle_hash hints it is 10.3x ~ linear:
    # 96 -> 64 s at sf10, +0.07 s at sf0.1, -0.7 s at sf1).  The
    # shuffle-hash join keys (w1,w2)/(w1) are the same partitioning the
    # upstream aggregates already produce, and hot-token skew stays
    # AQE-splittable.
    scored = (
        doc_bi.join(bi_counts.hint("shuffle_hash"), ["w1", "w2"])
        .join(uni_counts.hint("shuffle_hash"), "w1")
        .crossJoin(F.broadcast(vocab))
        .withColumn(
            "logp",
            F.log(
                (F.col("c12") + F.lit(1)).cast("double")
                / (F.col("c1") + F.col("V")).cast("double")
            ),
        )
    )
    # weighted mean == instance mean (each distinct doc-bigram carries
    # its in-doc multiplicity k); fold-order float epsilon is absorbed
    # by the rounding, as before
    return (
        scored.groupBy(id_col)
        .agg(
            F.sum("k").alias("n_bigrams"),
            F.round(
                F.sum(F.col("k") * F.col("logp")) / F.sum("k"), round_digits
            ).alias("avg_logprob"),
        )
    )
