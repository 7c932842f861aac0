"""Corpus ranking operators: TF-IDF keyword extraction and BM25
retrieval scoring over the `documents` table (SURVEY.md §2C ⊕ text
analysis — the ranking side of the family started in functions/text.py).

Everything is DataFrame -> DataFrame with exact SQL-oracle-able
semantics (smoothed idf = ln((N+1)/(df+1)) + 1, the scikit-learn
formula; BM25 with the standard k1/b defaults).

Scale design (100 TB documents):
- tokenize/explode is NARROW — no shuffle until the (doc, term)
  aggregation, whose map-side partial agg absorbs in-document repeats.
- document frequency is a groupBy(term) + shuffle JOIN back on term,
  NOT a window over partitionBy(term): stopword terms appear in
  nearly every document, and a window partition cannot be split —
  AQE's skew-join splitting handles the hot terms, a window would
  serialize them on one core.
- corpus-level scalars (N, avgdl) are 1-row aggregates broadcast as
  cross joins.
- BM25 filters the exploded terms to the query vocabulary FIRST, so
  the df join for a query is over a bounded term set (broadcast).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window
from pyspark.sql.functions import broadcast

from strawboat_spark.functions.text import tokens


def term_frequencies(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, term, tf): whitespace-token term counts per document.
    One shuffle on (id, term); empty tokens dropped."""
    return (
        df.select(id_col, F.explode(tokens(text_col)).alias("term"))
        .filter(F.col("term") != "")
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def tfidf(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, term, tf, df, tfidf) with smoothed idf.

    idf = ln((N + 1) / (df + 1)) + 1 — always positive, so rare and
    common terms both score, and the formula is a plain SQL expression
    the DuckDB oracle replicates exactly."""
    tf = term_frequencies(df, id_col, text_col)
    docfreq = tf.groupBy(F.col("term").alias("df_term")).agg(
        F.count(F.lit(1)).alias("df")
    )
    n_docs = df.agg(F.count(F.lit(1)).alias("__n"))
    idf = F.log((F.col("__n") + 1.0) / (F.col("df") + 1.0)) + 1.0
    return (
        tf.join(docfreq, tf.term == F.col("df_term"))  # skew-splittable join
        .join(broadcast(n_docs))  # 1-row scalar
        .select(
            id_col,
            "term",
            "tf",
            "df",
            # scale-0 quantization: 2-arg ROUND(x, 4) diverges across
            # engines when x's shortest repr sits on a half at digit 5;
            # halves of x*10000 are exactly representable, so scale-0
            # rounding agrees (strawboat_merge_when r7 post-mortem)
            (F.round(F.col("tf") * idf * 10000).cast("long") / 10000.0).alias("tfidf"),
        )
    )


def top_keywords(df: DataFrame, id_col: str, text_col: str, k: int = 3) -> DataFrame:
    """Top-k TF-IDF terms per document, deterministic tiebreak
    (tfidf desc, term asc). One extra shuffle on the doc id — a
    bounded-cardinality partition key, so no skew concern."""
    scored = tfidf(df, id_col, text_col)
    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), "term")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "rank", "term", "tfidf")
    )


def bm25(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """(id, score): Okapi BM25 of each document against a bag of query
    terms. score = sum over matched terms of
    idf(t) * tf * (k1+1) / (tf + k1 * (1 - b + b * dl/avgdl)).

    The exploded term stream is filtered to the query vocabulary
    before any shuffle, so the per-query df table is bounded and
    broadcast; dl/avgdl come from the unfiltered token counts."""
    toks = df.select(id_col, F.explode(tokens(text_col)).alias("term")).filter(
        F.col("term") != ""
    )
    dl = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("dl"))
    avgdl = dl.agg(F.avg("dl").alias("avgdl"))
    qtf = (
        toks.filter(F.col("term").isin(query_terms))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    docfreq = qtf.groupBy(F.col("term").alias("df_term")).agg(
        F.count(F.lit(1)).alias("df")
    )
    n_docs = df.agg(F.count(F.lit(1)).alias("__n"))
    idf = F.log((F.col("__n") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
    norm = F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
    contrib = idf * F.col("tf") * (k1 + 1.0) / norm
    return (
        qtf.join(broadcast(docfreq), qtf.term == F.col("df_term"))
        .join(dl, id_col)
        .join(broadcast(avgdl))
        .join(broadcast(n_docs))
        .groupBy(id_col)
        .agg(F.round(F.sum(contrib), 4).alias("score"))
    )


def hashed_tf_features(
    df: DataFrame,
    text_col: str,
    id_col: str,
    dim: int = 1024,
    signed: bool = True,
) -> DataFrame:
    """Feature hashing (the "hashing trick", Weinberger et al. 2009):
    map each token to one of `dim` buckets with a hash and accumulate
    signed counts — the standard cheap text featurizer for quality /
    domain classifiers over a training corpus (no vocabulary build, no
    model, fixed dimensionality at ANY corpus size).

    Returns SPARSE rows (id, bucket, weight): bucket = 60 bits of
    md5(token) mod dim, sign = parity of the digest's 16th hex digit
    (the signed variant makes the estimator unbiased; signed=False
    gives plain hashed TF). Fully engine-portable — DuckDB replays it
    bit-exactly, which is what lets the gate be hash-compared — and
    the whole thing is one explode + one groupBy (map-side combined):
    shuffle volume is at most docs*dim rows regardless of vocabulary.

    100 TB shape: no driver state, no vocabulary broadcast (THE classic
    scale hazard of count-vectorizers), output bounded per doc by
    min(n_tokens, dim)."""
    tok = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("tok")).filter(
        F.col("tok") != ""
    )
    h = F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("bigint")
    bucket = F.pmod(h, F.lit(dim)).alias("bucket")
    if signed:
        sign = (
            F.when(
                F.conv(F.substring(F.md5("tok"), 16, 1), 16, 10).cast("bigint") % 2 == 0,
                F.lit(1),
            ).otherwise(F.lit(-1))
        ).cast("bigint")
    else:
        sign = F.lit(1).cast("bigint")
    return (
        tok.select(F.col(id_col), bucket, sign.alias("s"))
        .groupBy(id_col, "bucket")
        .agg(F.sum("s").alias("weight"))
        .filter(F.col("weight") != 0)  # signed collisions can cancel
    )
