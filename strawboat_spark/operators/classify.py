"""Distributed text classification & data selection over hashed
features — the model-training side of an LLM data pipeline.

Two operators, both pure aggregation-shaped (train = one groupBy,
score = bounded joins) with models whose size is FIXED by the hash
dimension, not the corpus — so unlike a corpus-derived count model
(operators/lm.py, where broadcasting was the measured r11
scale-killer), broadcasting these models is CORRECT at any corpus
size: |model| <= dim x n_labels rows by construction.

- multinomial Naive Bayes (McCallum & Nigam 1998) over hashed token
  buckets (Weinberger et al. 2009 hashing trick): the classic cheap
  quality / language / domain classifier. Train is one map-side-
  combined groupBy; predict is one bounded join + a per-doc argmax.
- DSIR-style importance weights (Xie et al. 2023, "Data Selection for
  Language Models via Importance Resampling"): log p_target(x) -
  log p_raw(x) under hashed-unigram bag models — the published recipe
  for selecting pretraining data that matches a target domain.

Both use the engine-portable md5 bucket hash (60 bits of md5(token)
mod dim — identical in Spark and DuckDB, same family as
ranking.hashed_tf_features), so every gate is hash-exact against its
SQL oracle. Log-sum floats follow the lm.py convention: per-doc sums
rounded to `round_digits`, absorbing fold-order epsilon; argmax ranks
the ROUNDED score with a label tie-break so the winner is
engine-stable.

Reference parity note: the reference engine (/root/reference/src) has
no classifier surface; these are ⊕ BASELINE additions for the
training-data pipeline (brief: text analysis / quality scoring as
first-class components).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from strawboat_spark.functions.text import tokens


def _bucket(tok_col, dim: int):
    """Engine-portable hash bucket: 60 bits of md5 mod dim (matches
    ranking.hashed_tf_features and the DuckDB replay
    ('0x' || substr(md5(t),1,15))::BIGINT % dim)."""
    h = F.conv(F.substring(F.md5(tok_col), 1, 15), 16, 10).cast("bigint")
    return F.pmod(h, F.lit(dim))


def _doc_buckets(df: DataFrame, text_col: str, id_col: str, dim: int) -> DataFrame:
    """(id, bucket, k): per-doc hashed-token multiplicities.

    The md5 runs once per DISTINCT (doc, token), not per token
    instance (the lm.py r8 rework, same rationale): natural text
    repeats tokens heavily, so pre-aggregating to per-doc token counts
    before hashing cuts the dominant map-side cost; the bucket sum of
    the counts is byte-identical to hashing every instance."""
    tok = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("tok")).filter(
        F.col("tok") != ""
    )
    tc = tok.groupBy(id_col, "tok").agg(F.count(F.lit(1)).alias("k"))
    return (
        tc.select(F.col(id_col), _bucket("tok", dim).alias("bucket"), "k")
        .groupBy(id_col, "bucket")
        .agg(F.sum("k").alias("k"))
    )


def nb_train(
    df: DataFrame, text_col: str, label_col: str, dim: int = 1024
) -> tuple[DataFrame, DataFrame]:
    """Train a multinomial NB model: returns (bucket_counts,
    label_stats) where bucket_counts = (label, bucket, c) token counts
    and label_stats = (label, n_docs, n_tokens). Both are bounded by
    (n_labels x dim) and n_labels respectively — model size is
    corpus-independent, the property that makes nb_predict's broadcast
    safe at 100 TB."""
    tok = df.select(
        F.col(label_col).alias("label"), F.explode(tokens(text_col)).alias("tok")
    ).filter(F.col("tok") != "")
    # one md5 per DISTINCT (label, token) — see _doc_buckets
    tc = tok.groupBy("label", "tok").agg(F.count(F.lit(1)).alias("k"))
    bucket_counts = (
        tc.select("label", _bucket("tok", dim).alias("bucket"), "k")
        .groupBy("label", "bucket")
        .agg(F.sum("k").alias("c"))
    )
    label_stats = df.groupBy(F.col(label_col).alias("label")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.filter(tokens(text_col), lambda t: t != ""))).alias("n_tokens"),
    )
    return bucket_counts, label_stats


def nb_predict(
    df: DataFrame,
    bucket_counts: DataFrame,
    label_stats: DataFrame,
    text_col: str,
    id_col: str,
    dim: int = 1024,
    round_digits: int = 4,
) -> DataFrame:
    """Score + argmax: for each doc and label,

        score = log(n_docs_l / N) - n_toks * log(n_tokens_l + dim)
                + sum_tok log(c_{l, bucket(tok)} + 1)

    (add-one smoothing over the dim-bucket space; a token bucket the
    label never saw contributes log(1) = 0, so the inner sum needs only
    the JOINED rows — missing (label, bucket) pairs cost nothing).
    The model joins are broadcast BY CONSTRUCTION-SIZE, not by
    Catalyst's estimate: bucket_counts <= n_labels x dim rows at any
    corpus size (contrast lm.py's corpus-growing model, where the same
    broadcast was the r11 measured scale-killer).

    Output: (id, pred_label, score, n_labels-way scores are reduced by
    argmax on the ROUNDED score, ties to the lexicographically first
    label — engine-stable, replayed exactly by the SQL oracle)."""
    db = _doc_buckets(df, text_col, id_col, dim)
    total_docs = label_stats.agg(F.sum("n_docs").alias("N"))

    # The label list is a MODEL property (bounded like the model
    # itself), so collecting it is a scalar-class collect; it lets the
    # model pivot to ONE row per bucket and the per-label log-count
    # sums become column arithmetic on the db stream. The naive
    # formulation joined db x bucket_counts on bucket — fanning the
    # per-doc bucket stream out x n_labels through the (id, label)
    # aggregate (160M rows at sf10 for 5 labels); this keeps the
    # stream at |db| rows with n_labels columns, then explodes only
    # the FINAL per-doc vector (n_labels rows per doc). Identical
    # sums: a (label, bucket) the model never saw is NULL in the
    # pivot and contributes log(0 + 1) = 0.
    labels = sorted(r["label"] for r in label_stats.select("label").collect())
    pivoted = (
        bucket_counts.groupBy("bucket")
        .pivot("label", labels)
        .agg(F.first("c"))
        # positional rename: label strings are DATA, not identifiers —
        # a label with a backtick/dot would break column references
        .toDF("bucket", *[f"__c_{i}" for i in range(len(labels))])
    )
    logc = [
        F.sum(
            F.col("k")
            * F.log(F.coalesce(F.col(f"__c_{i}"), F.lit(0)).cast("double") + F.lit(1.0))
        ).alias(f"__s1_{i}")
        for i in range(len(labels))
    ]
    s1_vec = (
        db.join(F.broadcast(pivoted), "bucket", "left")
        .groupBy(id_col)
        .agg(F.sum("k").alias("n_toks"), *logc)
    )
    per_label = s1_vec.select(
        F.col(id_col),
        F.col("n_toks"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(lab).alias("label"), F.col(f"__s1_{i}").alias("s1")
                    )
                    for i, lab in enumerate(labels)
                ]
            )
        ).alias("ls"),
    ).select(id_col, "n_toks", F.col("ls.label").alias("label"), F.col("ls.s1").alias("s1"))
    expanded = (
        per_label.join(F.broadcast(label_stats), "label")
        .crossJoin(F.broadcast(total_docs))
        .withColumn(
            "score",
            F.round(
                F.log(F.col("n_docs").cast("double") / F.col("N"))
                - F.col("n_toks") * F.log((F.col("n_tokens") + F.lit(dim)).cast("double"))
                + F.coalesce(F.col("s1"), F.lit(0.0)),
                round_digits,
            ),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.col("score").desc(), F.col("label").asc())
    return (
        expanded.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(F.col(id_col), F.col("label").alias("pred_label"), "score")
    )


def _nb_model_rows(df: DataFrame, text_col: str, label_col: str, dim: int) -> DataFrame:
    """A batch's ADDITIVE model rows, one unioned frame:
    ('b', label, bucket, c)   hashed token counts,
    ('d', label, -1, n_docs)  doc counts,
    ('t', label, -1, n_toks)  token totals.
    Every row kind is a sum — appending batch rows to the model table
    and re-summing reads IS batch training on the union (the property
    that makes the incremental model exact, not approximate)."""
    bc, ls = nb_train(df, text_col, label_col, dim)
    b = bc.select(
        F.lit("b").alias("kind"), "label", "bucket", F.col("c").cast("long").alias("c")
    )
    d = ls.select(
        F.lit("d").alias("kind"),
        "label",
        F.lit(-1).cast("long").alias("bucket"),
        F.col("n_docs").cast("long").alias("c"),
    )
    t = ls.select(
        F.lit("t").alias("kind"),
        "label",
        F.lit(-1).cast("long").alias("bucket"),
        F.col("n_tokens").cast("long").alias("c"),
    )
    return b.unionByName(d).unionByName(t)


def nb_model_init(
    spark, model_path: str, df: DataFrame, text_col: str, label_col: str, dim: int = 1024
):
    """Create the PERSISTENT incremental NB model: a strawboat table of
    additive count rows (see _nb_model_rows). The table is bounded at
    ~appends x (n_labels x dim + 2 x n_labels) rows between
    compactions — model size never scales with the corpus, only with
    the append count until maybe_compact_index folds it.

    Same contract as the incremental dedup indexes (dedup.py
    jaccard_index_init family): batches must be doc-disjoint; each
    append is one CAS generation flip; pinned readers keep their
    generation."""
    from strawboat_spark.table import Table

    Table(spark, model_path).overwrite(_nb_model_rows(df, text_col, label_col, dim))
    return Table(spark, model_path)


def nb_model_append(
    spark,
    model_path: str,
    batch: DataFrame,
    text_col: str,
    label_col: str,
    dim: int = 1024,
    compact_every: int = 0,
    **append_options,
) -> None:
    """Fold a new labeled batch into the model — ONE append (the
    count rows are additive; no read-modify-write, so concurrent
    appenders compose under the manifest CAS like any other table).
    compact_every=N folds the per-append file growth on the same
    cadence knob as the dedup indexes."""
    from strawboat_spark.operators.dedup import maybe_compact_index
    from strawboat_spark.table import Table

    Table(spark, model_path).append(
        _nb_model_rows(batch, text_col, label_col, dim), **append_options
    )
    maybe_compact_index(spark, model_path, compact_every)


def nb_model_read(spark, model_path: str) -> tuple[DataFrame, DataFrame]:
    """(bucket_counts, label_stats) summed from the model table —
    drop-in for nb_train's output, byte-identical to batch training on
    the union of every ingested batch."""
    from strawboat_spark.table import Table

    rows = Table(spark, model_path).read()
    bucket_counts = (
        rows.filter(F.col("kind") == "b")
        .groupBy("label", "bucket")
        .agg(F.sum("c").alias("c"))
    )
    label_stats = (
        rows.filter(F.col("kind") != "b")
        .groupBy("label")
        .agg(
            F.sum(F.when(F.col("kind") == "d", F.col("c"))).alias("n_docs"),
            F.sum(F.when(F.col("kind") == "t", F.col("c"))).alias("n_tokens"),
        )
    )
    return bucket_counts, label_stats


def dsir_importance_weights(
    raw: DataFrame,
    target: DataFrame,
    text_col: str,
    id_col: str,
    dim: int = 1024,
    round_digits: int = 4,
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023): per raw doc,

        log_w = sum_tok [ log p_target(bucket) - log p_raw(bucket) ]

    under add-one-smoothed hashed-unigram bag models of the target
    sample and the raw corpus. Resampling the raw corpus by these
    weights yields a target-matched pretraining subset — the published
    data-selection recipe, here as one DataFrame op.

    Shape: both models are (bucket, count) with <= dim rows — bounded
    by the hash dimension, NOT the corpus, so the broadcast joins are
    safe at any scale; everything else is the per-doc bucket groupBy.
    Output: (id, n_toks, log_w) for docs with >= 1 token; descending
    log_w ranks most target-like first."""

    def model(df: DataFrame, total_name: str):
        tok = df.select(F.explode(tokens(text_col)).alias("tok")).filter(
            F.col("tok") != ""
        )
        # one md5 per DISTINCT token — see _doc_buckets
        tc = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("k"))
        counts = (
            tc.select(_bucket("tok", dim).alias("bucket"), "k")
            .groupBy("bucket")
            .agg(F.sum("k").alias("c"))
        )
        total = counts.agg(F.sum("c").alias(total_name))
        return counts, total

    t_counts, t_total = model(target, "Tt")
    r_counts, r_total = model(raw, "Tr")

    db = _doc_buckets(raw, text_col, id_col, dim)
    scored = (
        db.join(F.broadcast(t_counts.withColumnRenamed("c", "ct")), "bucket", "left")
        .join(F.broadcast(r_counts.withColumnRenamed("c", "cr")), "bucket", "left")
        .crossJoin(F.broadcast(t_total))
        .crossJoin(F.broadcast(r_total))
        .withColumn(
            "contrib",
            F.col("k")
            * (
                F.log(
                    (F.coalesce(F.col("ct"), F.lit(0)) + F.lit(1)).cast("double")
                    / (F.col("Tt") + F.lit(dim)).cast("double")
                )
                - F.log(
                    (F.coalesce(F.col("cr"), F.lit(0)) + F.lit(1)).cast("double")
                    / (F.col("Tr") + F.lit(dim)).cast("double")
                )
            ),
        )
    )
    return scored.groupBy(id_col).agg(
        F.sum("k").alias("n_toks"),
        F.round(F.sum("contrib"), round_digits).alias("log_w"),
    )
