"""LLM training-data pipeline queries (dedup / similarity / text /
multimodal) over the documents + embeddings tables — SURVEY.md §2C ⊕.

Oracle policy: every gate in this module carries an exact DuckDB
oracle — the rows-only set has been empty since r11 (see COVERAGE.md).
Hash-dependent ops (minhash/simhash/LSH) use a portable hash family:
ONE md5 per shingle + Carter-Wegman affine transforms mod 2^61-1,
computed identically in Spark SQL and DuckDB SQL, so even the banding
paths are hash-exact under the driver's value-hash compare.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from strawboat_spark.functions.text import (
    LANG_MARKERS,
    fingerprint,
    lang_id,
    lang_scores,
    quality_score,
    repetition_ratio,
    token_count,
    tokens,
)
from strawboat_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_dedup,
    minhash_lsh_join,
    ngram_jaccard_pairs,
    simhash,
)
from strawboat_spark.operators.similarity import (
    cosine_neardup_pairs_blas,
    cosine_topk,
    lsh_cosine_topk,
    semdedup,
)
from strawboat_spark.queries import query
from strawboat_spark.tables import load_table


# r17 opt (guide §2.2): the multimodal gates fan a doc_id column into
# seconds-per-partition Python codec work, but a small parquet source
# yields ONE input split — so the map ran serially, and the trailing
# orderBy's range-sampling pass executed it TWICE (measured:
# multimodal_video_sampling 13.5 s warm, with the whole decode leg
# <0.5 s of distributed work). spread_small_input restores the
# parallelism the work was written for; no-op on at-scale layouts.
from strawboat_spark.queries import spread_small_input as _spread_ids  # noqa: E402


# --------------------------------------------------------------------------
# Deduplication
# --------------------------------------------------------------------------


@query(
    "dedup_exact_documents",
    oracle="""
    SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp,
           CAST(MIN(doc_id) AS BIGINT) AS survivor_doc_id,
           COUNT(*) AS n_copies
    FROM documents GROUP BY fp ORDER BY fp
    """,
    description="exact dedup by normalized-text fingerprint (1 shuffle on fp)",
)
def dedup_exact_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return exact_dedup(d, "text", "doc_id").orderBy("fp")



@query(
    "dedup_clusters",
    oracle="""
    WITH RECURSIVE tok AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS ts FROM documents
    ), sh0 AS (
      SELECT DISTINCT doc_id,
             unnest([array_to_string(ts[CAST(i AS INT) : CAST(i AS INT) + 2], ' ')
                     for i in range(1, greatest(len(ts) - 1, 1))]) AS shingle
      FROM tok WHERE len(ts) >= 3
    ), sh AS (
      -- df-cut mirror of ngram_jaccard_pairs(max_doc_freq=1000)
      SELECT * FROM sh0 QUALIFY COUNT(*) OVER (PARTITION BY shingle) <= 1000
    ), sizes AS (
      SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
    ), pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ), edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
      WHERE n_common / (sa.n + sb.n - n_common) >= 0.5
      UNION ALL
      SELECT id_b, id_a FROM pairs
      JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
      WHERE n_common / (sa.n + sb.n - n_common) >= 0.5
    ), walk(node, reach) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT w.node, e.dst FROM walk w JOIN edges e ON w.reach = e.src
    )
    SELECT node AS doc_id, CAST(MIN(reach) AS BIGINT) AS component
    FROM walk GROUP BY node ORDER BY doc_id
    """,
    description="duplicate clusters: connected components (min-label propagation) over jaccard>=0.5 edges",
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from strawboat_spark.operators.dedup import connected_components

    d = load_table(spark, sf_dir, "documents")
    edges = ngram_jaccard_pairs(d, "text", "doc_id", shingle_n=3, threshold=0.5)
    return connected_components(
        d.select("doc_id"), edges, id_col="doc_id", src_col="id_a", dst_col="id_b"
    ).orderBy("doc_id")



@query(
    "dedup_minhash_lsh",
    oracle="""
    WITH tok AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS ts FROM documents
    ), sh AS (
      SELECT DISTINCT doc_id,
             unnest([array_to_string(ts[CAST(i AS INT) : CAST(i AS INT) + 2], ' ')
                     for i in range(1, greatest(len(ts) - 1, 1))]) AS shingle
      FROM tok WHERE len(ts) >= 3
    ), hb AS (
      -- ONE md5 per shingle; members are Carter-Wegman transforms of
      -- the base over M = 2^61-1, multiplied via the Mersenne rotation
      -- identity (operators/dedup.py _md5_member_expr — identical
      -- signed-64 arithmetic, all intermediates < 2^63)
      SELECT doc_id, ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS hb FROM sh
    ), ht AS (
      SELECT doc_id, hb, r.i AS i,
             ((2654435761 * (r.i + 1)) % 2147483647 + 1) AS a,
             (3266489917 * (r.i + 13)) % 2147483647 AS c
      FROM hb CROSS JOIN range(0, 32) r(i)
    ), hu AS (
      SELECT doc_id, hb, i, a, c,
             (a * (hb // 1073741824)) % 2305843009213693951 AS t
      FROM ht
    ), hx AS (
      -- u and h stay UNREDUCED mod M (they fit signed 64; min/equality
      -- only need a consistent representative — see _md5_member_expr)
      SELECT doc_id, i,
             min((t % 2147483648) * 1073741824 + t // 2147483648
                + a * (hb % 1073741824) + c) AS h
      FROM hu
      GROUP BY doc_id, i
    ), sigs AS (
      SELECT doc_id, list(h ORDER BY i) AS sig FROM hx GROUP BY doc_id
    ), bands AS (
      SELECT doc_id, rb.b AS b,
             md5(array_to_string(
               sig[CAST(rb.b * 4 + 1 AS INT) : CAST(rb.b * 4 + 4 AS INT)], ',')) AS bucket
      FROM sigs CROSS JOIN range(0, 8) rb(b)
    ), ranked AS (
      SELECT doc_id, b, bucket,
             row_number() OVER (PARTITION BY b, bucket ORDER BY doc_id) AS rn
      FROM bands
    ), kept AS (
      SELECT * FROM ranked WHERE rn <= 256
    ), cand AS (
      SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
      FROM kept x
      JOIN kept y ON x.b = y.b AND x.bucket = y.bucket AND x.doc_id < y.doc_id
    )
    SELECT c.id_a, c.id_b,
           len(list_filter(range(1, 33),
               i -> sa.sig[CAST(i AS INT)] = sb.sig[CAST(i AS INT)])) / 32.0
             AS est_jaccard
    FROM cand c
    JOIN sigs sa ON sa.doc_id = c.id_a
    JOIN sigs sb ON sb.doc_id = c.id_b
    ORDER BY id_a, id_b
    """,
    description=(
        "MinHash (32 hashes) + LSH banding (8 bands) near-dup candidate "
        "pairs on the PORTABLE md5-derived hash family: ONE md5 per "
        "shingle (60 bits as BIGINT) + per-i affine transforms mod "
        "2^61-1, so the signature agg stays a HashAggregate and DuckDB "
        "replays the whole pipeline hash-exactly: signatures, band "
        "buckets, 256-cap, pair expansion, est_jaccard as an exact k/32 "
        "binary fraction.  xxhash64 stays the production default family "
        "— same plan, different leaf hash (r9 verdict item #1; one-md5 "
        "family replaced r10's 32-md5-per-shingle after BENCH_r10 showed "
        "the 1.6x cost)"
    ),
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return minhash_lsh_dedup(
        d, "text", "doc_id", n_hashes=32, n_bands=8, hash_family="md5"
    ).orderBy("id_a", "id_b")


@query(
    "text_feature_hashing",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok
      FROM documents WHERE doc_id < 1000
    ), t2 AS (
      SELECT doc_id,
             ('0x' || substr(md5(tok), 1, 15))::BIGINT % 32 AS bucket,
             CASE WHEN ('0x' || substr(md5(tok), 16, 1))::BIGINT % 2 = 0
                  THEN 1 ELSE -1 END AS s
      FROM tok WHERE tok <> ''
    )
    SELECT doc_id, bucket, CAST(SUM(s) AS BIGINT) AS weight
    FROM t2 GROUP BY doc_id, bucket
    HAVING SUM(s) <> 0
    ORDER BY doc_id, bucket
    """,
    description=(
        "feature hashing (hashing trick): signed hashed-TF sparse "
        "vectors, dim=32 — the vocabulary-free featurizer for quality/"
        "domain classifiers; md5-derived bucket+sign replayed "
        "bit-exactly by DuckDB; one explode + one groupBy, no "
        "vocabulary broadcast at any corpus size"
    ),
)
def text_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/ranking.py hashed_tf_features (Weinberger et al. 2009
    hashing trick)."""
    from strawboat_spark.operators.ranking import hashed_tf_features

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 1000)
    return hashed_tf_features(d, "text", "doc_id", dim=32).orderBy(
        "doc_id", "bucket"
    )


@query(
    "corpus_decontam_neardup",
    oracle="""
    WITH tok AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS ts FROM documents
    ), sh AS (
      SELECT DISTINCT doc_id,
             unnest([array_to_string(ts[CAST(i AS INT) : CAST(i AS INT) + 2], ' ')
                     for i in range(1, greatest(len(ts) - 1, 1))]) AS shingle
      FROM tok WHERE len(ts) >= 3
    ), hb AS (
      SELECT doc_id, ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS hb FROM sh
    ), ht AS (
      SELECT doc_id, hb, r.i AS i,
             ((2654435761 * (r.i + 1)) % 2147483647 + 1) AS a,
             (3266489917 * (r.i + 13)) % 2147483647 AS c
      FROM hb CROSS JOIN range(0, 32) r(i)
    ), hu AS (
      SELECT doc_id, hb, i, a, c,
             (a * (hb // 1073741824)) % 2305843009213693951 AS t
      FROM ht
    ), hx AS (
      SELECT doc_id, i,
             min((t % 2147483648) * 1073741824 + t // 2147483648
                + a * (hb % 1073741824) + c) AS h
      FROM hu
      GROUP BY doc_id, i
    ), sigs AS (
      SELECT doc_id, list(h ORDER BY i) AS sig FROM hx GROUP BY doc_id
    ), bands AS (
      SELECT doc_id, rb.b AS b,
             md5(array_to_string(
               sig[CAST(rb.b * 4 + 1 AS INT) : CAST(rb.b * 4 + 4 AS INT)], ',')) AS bucket
      FROM sigs CROSS JOIN range(0, 8) rb(b)
    ), lb AS (
      SELECT doc_id, b, bucket,
             row_number() OVER (PARTITION BY b, bucket ORDER BY doc_id) AS rn
      FROM bands WHERE doc_id % 10 <> 0
    ), rb2 AS (
      SELECT doc_id, b, bucket,
             row_number() OVER (PARTITION BY b, bucket ORDER BY doc_id) AS rn
      FROM bands WHERE doc_id % 10 = 0
    ), cand AS (
      SELECT DISTINCT x.doc_id AS lid, y.doc_id AS rid
      FROM lb x JOIN rb2 y ON x.b = y.b AND x.bucket = y.bucket
      WHERE x.rn <= 256 AND y.rn <= 256
    )
    SELECT lid AS left_doc_id, rid AS right_doc_id,
           len(list_filter(range(1, 33),
               i -> sa.sig[CAST(i AS INT)] = sb.sig[CAST(i AS INT)])) / 32.0
             AS est_jaccard
    FROM cand
    JOIN sigs sa ON sa.doc_id = lid
    JOIN sigs sb ON sb.doc_id = rid
    ORDER BY left_doc_id, right_doc_id
    """,
    description=(
        "FUZZY decontamination: cross-table minhash-LSH join — corpus "
        "docs (doc_id % 10 <> 0) that near-duplicate an eval-set doc "
        "(doc_id % 10 = 0) via any shared band bucket; catches paraphrases "
        "that escape exact n-gram overlap (corpus_decontamination). "
        "Equi-join on (band, bucket), per-side 256 caps, portable md5 "
        "family — DuckDB replays the pipeline hash-exactly"
    ),
)
def corpus_decontam_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/dedup.py minhash_lsh_join — the two-table lift of
    minhash_lsh_dedup. Scale shape: left = the 100 TB corpus, right =
    the small eval set; both band independently, candidates come from
    an equi-join on the bucket key (never all-pairs)."""
    d = load_table(spark, sf_dir, "documents")
    return minhash_lsh_join(
        d.filter(F.col("doc_id") % 10 != 0),
        d.filter(F.col("doc_id") % 10 == 0),
        "text",
        "doc_id",
        "doc_id",
        n_hashes=32,
        n_bands=8,
        hash_family="md5",
    ).orderBy("left_doc_id", "right_doc_id")


@query(
    "dedup_incremental_index",
    oracle="""
    WITH tok AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS ts FROM documents
    ), sh AS (
      SELECT DISTINCT doc_id,
             unnest([array_to_string(ts[CAST(i AS INT) : CAST(i AS INT) + 2], ' ')
                     for i in range(1, greatest(len(ts) - 1, 1))]) AS shingle
      FROM tok WHERE len(ts) >= 3
    ), sizes AS (
      SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
    ), dfc AS (
      SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) <= 1000
    ), kept AS (
      SELECT sh.* FROM sh JOIN dfc USING (shingle)
    ), newk AS (
      SELECT * FROM kept WHERE doc_id % 2 = 1
    ), common AS (
      SELECT a.doc_id AS ia, b.doc_id AS ib, COUNT(*) AS c
      FROM kept a JOIN newk b ON a.shingle = b.shingle AND a.doc_id <> b.doc_id
      WHERE (a.doc_id % 2 = 0) OR (a.doc_id < b.doc_id)
      GROUP BY 1, 2
    )
    SELECT least(ia, ib) AS id_a, greatest(ia, ib) AS id_b,
           -- scale-0 quantization (repo cross-engine ROUND convention)
           CAST(ROUND(c * 10000.0 / (sa.n + sb.n - c)) AS BIGINT) / 10000.0 AS jaccard
    FROM common
    JOIN sizes sa ON sa.doc_id = ia
    JOIN sizes sb ON sb.doc_id = ib
    WHERE c / (sa.n + sb.n - c) >= 0.12
    ORDER BY id_a, id_b
    """,
    description=(
        "incremental near-dup index gate: even-id documents build a "
        "persistent shingle-postings index (hash-bucketed by shingle), "
        "odd-id documents arrive as a batch and dedup against the "
        "corpus + themselves via a bucket-pruned join — NO old-document "
        "rescan; exact oracle over the equivalent batch computation"
    ),
)
def dedup_incremental_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production dedup shape at 100 TB: per new crawl batch, index
    IO is bounded by the batch's bucket fan-out (<= num_buckets dirs),
    candidate fan-out by the df-cut, and the index grows by ONE append
    (CAS flip).  operators/dedup.py jaccard_index_init/append."""
    import tempfile as _tf

    from strawboat_spark.operators.dedup import (
        jaccard_index_append,
        jaccard_index_init,
    )
    from strawboat_spark.sources.datasource import register

    register(spark)
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    index_path = f"{_tf.mkdtemp(prefix='strawboat_incdx_')}/shingles"
    jaccard_index_init(
        spark, index_path, d.filter("doc_id % 2 = 0"), "text", "doc_id", shingle_n=3
    )
    pairs = jaccard_index_append(
        spark,
        index_path,
        d.filter("doc_id % 2 = 1"),
        "text",
        "doc_id",
        shingle_n=3,
        threshold=0.12,
        max_doc_freq=1000,
    )
    return pairs.orderBy("id_a", "id_b")


@query(
    "dedup_ngram_suite",
    oracle="""
    WITH tok AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS ts FROM documents
    ), sh0 AS (
      SELECT DISTINCT doc_id,
             unnest([array_to_string(ts[CAST(i AS INT) : CAST(i AS INT) + 2], ' ')
                     for i in range(1, greatest(len(ts) - 1, 1))]) AS shingle
      FROM tok WHERE len(ts) >= 3
    ), sh AS (
      -- df-cut mirror of ngram_jaccard_pairs(max_doc_freq=1000)
      SELECT * FROM sh0 QUALIFY COUNT(*) OVER (PARTITION BY shingle) <= 1000
    ), sizes AS (
      SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
    ), common AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT * FROM (
      SELECT 'df_stats' AS gate, shingle AS k1, NULL AS k2,
             CAST(NULL AS DOUBLE) AS v,
             COUNT(*) AS l1,
             CAST(COUNT(*) * (COUNT(*) - 1) / 2 AS BIGINT) AS l2
      FROM sh0 GROUP BY shingle HAVING COUNT(*) > 5
      UNION ALL
      SELECT 'pairs', CAST(id_a AS VARCHAR), CAST(id_b AS VARCHAR),
             -- scale-0 quantization (cent convention): ROUND(x, 4) is
             -- engine-unstable on repr-halves; halves of x*10000 are exact
             CAST(ROUND(n_common * 10000.0 / (sa.n + sb.n - n_common)) AS BIGINT)
               / 10000.0,
             NULL, NULL
      FROM common
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b
      WHERE n_common / (sa.n + sb.n - n_common) >= 0.12
    ) ORDER BY gate, k1, k2
    """,
    description=(
        "composite n-gram dedup gate (r9 fold of dedup_ngram_jaccard/"
        "df_stats): exact word-3-gram Jaccard pairs via inverted-index "
        "join (no all-pairs) + the df-cut audit of dropped boilerplate "
        "shingles and avoided pair volume"
    ),
)
def dedup_ngram_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    from strawboat_spark.operators.dedup import ngram_df_stats

    d = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(d, "text", "doc_id", shingle_n=3, threshold=0.12).select(
        F.lit("pairs").alias("gate"),
        F.col("id_a").cast("string").alias("k1"),
        F.col("id_b").cast("string").alias("k2"),
        F.col("jaccard").alias("v"),
        F.lit(None).cast("bigint").alias("l1"),
        F.lit(None).cast("bigint").alias("l2"),
    )
    stats = ngram_df_stats(d, "text", "doc_id", shingle_n=3, max_doc_freq=5).select(
        F.lit("df_stats").alias("gate"),
        F.col("shingle").alias("k1"),
        F.lit(None).cast("string").alias("k2"),
        F.lit(None).cast("double").alias("v"),
        F.col("doc_freq").alias("l1"),
        F.col("n_pairs_avoided").alias("l2"),
    )
    return stats.unionByName(pairs).orderBy("gate", "k1", "k2")


@query(
    "dedup_ngram_capped",
    oracle="""
    WITH tok AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS ts FROM documents
    ), sh0 AS (
      SELECT DISTINCT doc_id,
             unnest([array_to_string(ts[CAST(i AS INT) : CAST(i AS INT) + 2], ' ')
                     for i in range(1, greatest(len(ts) - 1, 1))]) AS shingle
      FROM tok WHERE len(ts) >= 3
    ), sh AS (
      SELECT * FROM sh0 QUALIFY COUNT(*) OVER (PARTITION BY shingle) <= 1000
    ), kept AS (
      -- per-shingle pair budget: cap LOWEST ids, deterministic
      SELECT * FROM sh QUALIFY ROW_NUMBER() OVER (PARTITION BY shingle ORDER BY doc_id) <= 4
    ), cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM kept a JOIN kept b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    ), sets AS (
      SELECT doc_id, list(DISTINCT shingle) AS s FROM sh GROUP BY doc_id
    ), common AS (
      -- exact |A∩B| over the FULL df-filtered shingle sets
      SELECT id_a, id_b, len(list_intersect(sa.s, sb.s)) AS n_common
      FROM cand
      JOIN sets sa ON sa.doc_id = cand.id_a
      JOIN sets sb ON sb.doc_id = cand.id_b
    ), sizes AS (
      SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
    )
    SELECT * FROM (
      SELECT 'cap_stats' AS gate, shingle AS k1, NULL AS k2,
             CAST(NULL AS DOUBLE) AS v,
             COUNT(*) AS l1,
             CAST(COUNT(*) * (COUNT(*) - 1) / 2 - 6 AS BIGINT) AS l2
      FROM sh GROUP BY shingle HAVING COUNT(*) > 4
      UNION ALL
      SELECT 'pairs', CAST(id_a AS VARCHAR), CAST(id_b AS VARCHAR),
             CAST(ROUND(n_common * 10000.0 / (sa.n + sb.n - n_common)) AS BIGINT)
               / 10000.0,
             NULL, NULL
      FROM common
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b
      WHERE n_common / (sa.n + sb.n - n_common) >= 0.12
    ) ORDER BY gate, k1, k2
    """,
    description=(
        "bounded-work exact n-gram Jaccard (r12): per-shingle pair "
        "budget max_posting_size=4 — candidates from the 4 lowest ids "
        "per shingle (work <= #shingles*cap²), Jaccard still exact over "
        "the full df-filtered space for every surviving pair, plus the "
        "audited-drop rows (capped shingles + excluded pair mass)"
    ),
)
def dedup_ngram_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scale-bounded verification twin: same exact-Jaccard
    semantics as dedup_ngram_suite for every emitted pair, but
    candidate generation is capped per shingle so the job is bounded
    at any corpus size (the r11 audit measured the UNCAPPED operator at
    58x for 10x data — structural Σdf²; this gate's plan is
    Σ min(df, cap)²). The oracle replays the identical deterministic
    cap (ROW_NUMBER ... ORDER BY doc_id <= 4 == array_sort+slice)."""
    from strawboat_spark.operators.dedup import ngram_posting_cap_stats

    d = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(
        d, "text", "doc_id", shingle_n=3, threshold=0.12, max_posting_size=4
    ).select(
        F.lit("pairs").alias("gate"),
        F.col("id_a").cast("string").alias("k1"),
        F.col("id_b").cast("string").alias("k2"),
        F.col("jaccard").alias("v"),
        F.lit(None).cast("bigint").alias("l1"),
        F.lit(None).cast("bigint").alias("l2"),
    )
    stats = ngram_posting_cap_stats(
        d, "text", "doc_id", shingle_n=3, max_posting_size=4
    ).select(
        F.lit("cap_stats").alias("gate"),
        F.col("shingle").alias("k1"),
        F.lit(None).cast("string").alias("k2"),
        F.lit(None).cast("double").alias("v"),
        F.col("doc_freq").alias("l1"),
        F.col("n_pairs_dropped").alias("l2"),
    )
    return stats.unionByName(pairs).orderBy("gate", "k1", "k2")


_NB_LANGID_ORACLE = """
    WITH tok AS (
      SELECT doc_id, lang,
             unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok
      FROM documents
    ), tk AS (
      SELECT doc_id, lang,
             ('0x' || substr(md5(tok), 1, 15))::BIGINT % 64 AS bucket
      FROM tok WHERE tok <> ''
    ), db AS (
      SELECT doc_id, bucket, COUNT(*) AS k FROM tk GROUP BY 1, 2
    ), doc_stats AS (
      SELECT doc_id, SUM(k) AS n_toks FROM db GROUP BY 1
    ), bc AS (
      SELECT lang AS label, bucket, COUNT(*) AS c FROM tk GROUP BY 1, 2
    ), ls AS (
      SELECT d.lang AS label, COUNT(*) AS n_docs,
             COALESCE(SUM(t.n), 0) AS n_tokens
      FROM documents d
      LEFT JOIN (SELECT doc_id, COUNT(*) AS n FROM tk GROUP BY 1) t USING (doc_id)
      GROUP BY 1
    ), s1 AS (
      SELECT db.doc_id, bc.label, SUM(db.k * ln(bc.c + 1)) AS s1
      FROM db JOIN bc USING (bucket) GROUP BY 1, 2
    ), scored AS (
      SELECT ds.doc_id, l.label,
             ROUND(ln(l.n_docs::DOUBLE / (SELECT SUM(n_docs) FROM ls))
                   - ds.n_toks * ln((l.n_tokens + 64)::DOUBLE)
                   + COALESCE(s1.s1, 0), 4) AS score
      FROM doc_stats ds
      CROSS JOIN ls l
      LEFT JOIN s1 ON s1.doc_id = ds.doc_id AND s1.label = l.label
    ), pred AS (
      SELECT doc_id, label AS pred_label, score
      FROM scored
      QUALIFY ROW_NUMBER() OVER (PARTITION BY doc_id
                                 ORDER BY score DESC, label ASC) = 1
    )
    SELECT p.doc_id, d.lang AS actual, p.pred_label, p.score
    FROM pred p JOIN documents d USING (doc_id)
    ORDER BY p.doc_id
    """


def text_nb_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/classify.py multinomial NB (McCallum & Nigam 1998 +
    the Weinberger 2009 hashing trick): self-scored language ID over
    the documents corpus, per-doc argmax hash-exact vs DuckDB.
    Member of the text_nb_suite composite gate (r14 fold)."""
    from strawboat_spark.operators.classify import nb_predict, nb_train

    d = load_table(spark, sf_dir, "documents")
    bc, ls = nb_train(d, "text", "lang", dim=64)
    pred = nb_predict(d, bc, ls, "text", "doc_id", dim=64)
    return (
        pred.join(d.select("doc_id", F.col("lang").alias("actual")), "doc_id")
        .select("doc_id", "actual", "pred_label", "score")
        .orderBy("doc_id")
    )


def text_nb_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/classify.py nb_model_init/append/read: counts are
    additive, so incremental == batch EXACTLY — the gate shares
    text_nb_langid's oracle verbatim.
    Member of the text_nb_suite composite gate (r14 fold)."""
    import tempfile

    from strawboat_spark.operators.classify import (
        nb_model_append,
        nb_model_init,
        nb_model_read,
        nb_predict,
    )
    from strawboat_spark.sources.datasource import register

    register(spark)
    path = tempfile.mkdtemp(prefix="strawboat_nbm_") + "/model"
    d = load_table(spark, sf_dir, "documents")
    nb_model_init(spark, path, d.filter("doc_id % 3 = 0"), "text", "lang", dim=64)
    nb_model_append(spark, path, d.filter("doc_id % 3 = 1"), "text", "lang", dim=64)
    nb_model_append(
        spark, path, d.filter("doc_id % 3 = 2"), "text", "lang", dim=64, compact_every=2
    )
    bc, ls = nb_model_read(spark, path)
    pred = nb_predict(d, bc, ls, "text", "doc_id", dim=64)
    return (
        pred.join(d.select("doc_id", F.col("lang").alias("actual")), "doc_id")
        .select("doc_id", "actual", "pred_label", "score")
        .orderBy("doc_id")
    )


@query(
    "text_nb_suite",
    oracle=f"""
    SELECT 'batch' AS mode, q.* FROM ({_NB_LANGID_ORACLE}) q
    UNION ALL
    SELECT 'incremental' AS mode, q.* FROM ({_NB_LANGID_ORACLE}) q
    ORDER BY mode, doc_id
    """,
    description=(
        "composite Naive Bayes gate (r14 fold of text_nb_langid + "
        "text_nb_incremental): batch = multinomial NB over hashed "
        "token buckets (dim=64, model bounded at n_labels*dim rows, "
        "broadcast safe at ANY corpus size), incremental = three "
        "doc-disjoint CAS appends to a persistent additive model "
        "table — byte-identical to batch by construction, so both "
        "modes replay the SAME oracle, labeled per mode"
    ),
)
def text_nb_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One gate, both NB training paths (batch + persistent
    incremental); a red row's `mode` column names the broken member."""
    batch = text_nb_langid(spark, sf_dir).select(
        F.lit("batch").alias("mode"), "*"
    )
    inc = text_nb_incremental(spark, sf_dir).select(
        F.lit("incremental").alias("mode"), "*"
    )
    return batch.unionByName(inc).orderBy("mode", "doc_id")


@query(
    "corpus_dsir_selection",
    oracle="""
    WITH tok AS (
      SELECT doc_id, lang,
             unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok
      FROM documents
    ), tk AS (
      SELECT doc_id, lang,
             ('0x' || substr(md5(tok), 1, 15))::BIGINT % 128 AS bucket
      FROM tok WHERE tok <> ''
    ), db AS (
      SELECT doc_id, bucket, COUNT(*) AS k FROM tk GROUP BY 1, 2
    ), tmodel AS (
      SELECT bucket, COUNT(*) AS ct FROM tk WHERE lang = 'en' GROUP BY 1
    ), rmodel AS (
      SELECT bucket, COUNT(*) AS cr FROM tk GROUP BY 1
    ), w AS (
      SELECT db.doc_id, CAST(SUM(db.k) AS BIGINT) AS n_toks,
             ROUND(SUM(db.k * (
               ln((COALESCE(t.ct, 0) + 1)::DOUBLE
                  / ((SELECT SUM(ct) FROM tmodel) + 128))
               - ln((COALESCE(r.cr, 0) + 1)::DOUBLE
                    / ((SELECT SUM(cr) FROM rmodel) + 128))
             )), 4) AS log_w
      FROM db
      LEFT JOIN tmodel t USING (bucket)
      LEFT JOIN rmodel r USING (bucket)
      GROUP BY db.doc_id
    )
    SELECT doc_id, n_toks, log_w FROM w
    ORDER BY log_w DESC, doc_id LIMIT 100
    """,
    description=(
        "DSIR importance resampling (Xie et al. 2023, r12): per-doc "
        "log p_target/p_raw under hashed-unigram bag models (dim=128, "
        "target = lang='en' sample) — the published pretraining data-"
        "selection recipe; both models bounded by dim (broadcast safe), "
        "top-100 most target-like docs, deterministic tie-break"
    ),
)
def corpus_dsir_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/classify.py dsir_importance_weights: select raw-corpus
    docs matching the English target domain."""
    from strawboat_spark.operators.classify import dsir_importance_weights

    d = load_table(spark, sf_dir, "documents")
    target = d.filter(F.col("lang") == "en")
    w = dsir_importance_weights(d, target, "text", "doc_id", dim=128)
    return w.orderBy(F.col("log_w").desc(), "doc_id").limit(100)


@query(
    "multimodal_raw_image_decode",
    revised=18,  # r18 single-stage fuse of the two raw-codec legs
    oracle="""
    SELECT * FROM (
      SELECT 'bmp' AS codec, doc_id,
             CAST(8 + (doc_id % 4) * 4 AS INT) AS width,
             CAST(6 + doc_id % 7 AS INT) AS height,
             ROUND(list_avg(list_transform(
               generate_series(0, (8 + (doc_id % 4) * 4) * (6 + doc_id % 7) * 3 - 1),
               i -> CAST((i * 17 + doc_id) % 256 AS DOUBLE))), 4) AS mean_intensity,
             CAST(54 + (8 + (doc_id % 4) * 4) * (6 + doc_id % 7) * 3 AS BIGINT) AS n_bytes
      FROM documents
      UNION ALL
      SELECT 'ppm', doc_id,
             CAST(8 + doc_id % 8 AS INT),
             CAST(8 + doc_id % 5 AS INT),
             ROUND(list_avg(list_transform(
               generate_series(0, (8 + doc_id % 8) * (8 + doc_id % 5) * 3 - 1),
               i -> CAST((i * 31 + doc_id) % 256 AS DOUBLE))), 4),
             CAST(length('P6' || chr(10) || CAST(8 + doc_id % 8 AS VARCHAR) || ' ' ||
                         CAST(8 + doc_id % 5 AS VARCHAR) || chr(10) || '255' || chr(10))
                  + (8 + doc_id % 8) * (8 + doc_id % 5) * 3 AS BIGINT)
      FROM documents
    ) ORDER BY codec, doc_id
    """,
    description=(
        "composite raw-image gate (r9 fold of multimodal_image_decode/"
        "image_features): binary P6 PPM and uncompressed 24-bit BMP "
        "synthesized per doc, decoded by the numpy parsers, "
        "width/height/mean/n_bytes exact against the analytic oracle"
    ),
)
def multimodal_raw_image_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both native raw-image decoders hash-verified (pre-fold gates
    r4-r5).  JPEG/PNG library decode remains a declared seam
    (operators/multimodal.py:_decode_image_bytes); the COMPRESSED
    codecs are gated by multimodal_image_codecs."""
    from collections.abc import Iterator

    import pandas as pd

    from strawboat_spark.operators.multimodal import (
        _decode_image_bytes,
        synthesize_bmp_bytes,
        synthesize_ppm_bytes,
    )

    specs = {
        "bmp": (synthesize_bmp_bytes, lambda i: (8 + (i % 4) * 4, 6 + i % 7)),
        "ppm": (synthesize_ppm_bytes, lambda i: (8 + i % 8, 8 + i % 5)),
    }
    codecs = sorted(specs)

    # r18 opt (guide §1.2/§4.1, same fuse as multimodal_image_codecs):
    # ONE mapInPandas synthesizes AND decodes both raw codecs — the old
    # shape was 2 Python stages per codec + 2 scans + a union, with the
    # payload crossing a stage boundary it never needed to cross.
    # Rows/dtypes unchanged (codec + the IMAGE_FEATURES columns).
    def synth_decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["doc_id"]:
                i = int(i)
                for codec in codecs:
                    fn, dims = specs[codec]
                    b = fn(i, *dims(i))
                    w, h, mean = _decode_image_bytes(b, False)
                    rows.append((codec, i, w, h, mean, len(b)))
            yield pd.DataFrame(
                rows,
                columns=["codec", "doc_id", "width", "height", "mean_intensity", "n_bytes"],
            )

    d = _spread_ids(load_table(spark, sf_dir, "documents").select("doc_id"))
    return d.mapInPandas(
        synth_decode,
        schema="codec string, doc_id long, width int, height int, "
        "mean_intensity double, n_bytes long",
    ).orderBy("codec", "doc_id")


@query(
    "multimodal_video_sampling",
    revised=17,  # r17 rewrite not in the r17 driver sample (VERDICT r17 #7)
    oracle="""
    SELECT * FROM (
      SELECT 'mjpeg' AS gate, doc_id, CAST(k AS INT) AS frame_idx,
             CAST(8 * (1 + doc_id % 3) AS INT) AS width,
             CAST(8 * (1 + doc_id % 2) AS INT) AS height,
             CAST(NULL AS INT) AS n_frames,
             ROUND(list_avg(list_transform(
               generate_series(0, CAST((1 + doc_id % 3) * (1 + doc_id % 2) - 1 AS BIGINT)),
               j -> CAST((j * 41 + doc_id + 13 * k) % 256 AS DOUBLE))), 4) AS v
      FROM documents, UNNEST(generate_series(0, CAST(4 + doc_id % 3 AS BIGINT) - 1, 2)) AS t(k)
      UNION ALL
      SELECT 'sample', doc_id,
             CAST(unnest(generate_series(
               0, greatest(CAST(octet_length(encode(text)) / 1024 + 1 AS INT) - 1, 0),
               10)) AS INT),
             NULL, NULL, NULL, NULL
      FROM documents
      UNION ALL
      SELECT 'y4m', doc_id, CAST(k AS INT), CAST(16 AS INT), CAST(8 AS INT),
             CAST(4 + doc_id % 4 AS INT),
             ROUND(list_avg(list_transform(
               generate_series(0, 16 * 8 - 1),
               i -> CAST((i * 13 + k * 7 + doc_id) % 256 AS DOUBLE))), 4)
      FROM documents, UNNEST(generate_series(0, CAST(4 + doc_id % 4 AS BIGINT) - 1, 2)) AS t(k)
    ) ORDER BY gate, doc_id, frame_idx
    """,
    description=(
        "composite video gate (r9 fold of multimodal_video_frames/"
        "mjpeg_frames/frame_sample): Y4M uncompressed clip parse + "
        "AVI/RIFF MJPEG per-frame JPEG decode, every-2nd-frame luma/"
        "intensity means exact, plus the every-10th-frame sampling "
        "fan-out plan"
    ),
)
def multimodal_video_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Container walks and frame decodes per the pre-fold gates
    (r5-r7); frames are independent so extraction is batch-parallel
    with no inter-frame state (the H.264 seam's documented
    alternative)."""
    from collections.abc import Iterator

    import pandas as pd

    from strawboat_spark.operators.avi import (
        decode_avi_frames,
        synthesize_avi_mjpeg_bytes,
    )
    from strawboat_spark.operators.multimodal import (
        decode_y4m_frames,
        frame_sample_plan,
        synthesize_y4m_bytes,
    )

    d = _spread_ids(load_table(spark, sf_dir, "documents").select("doc_id"))

    def synth_decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["doc_id"]:
                did = int(i)
                clip = synthesize_y4m_bytes(did, 16, 8, 4 + did % 4)
                w, h, nf, frames = decode_y4m_frames(clip, every_n=2)
                rows += [("y4m", did, fi, w, h, nf, m) for fi, m in frames]
                payload = synthesize_avi_mjpeg_bytes(
                    did, 8 * (1 + did % 3), 8 * (1 + did % 2), 4 + did % 3
                )
                for k, w, h, mean in decode_avi_frames(payload, every_n=2):
                    rows.append(("mjpeg", did, k, w, h, None, mean))
            yield pd.DataFrame(
                rows,
                columns=["gate", "doc_id", "frame_idx", "width", "height", "n_frames", "v"],
            )

    decoded = d.mapInPandas(
        synth_decode,
        schema="gate string, doc_id long, frame_idx int, width int, height int, "
        "n_frames int, v double",
    )
    dp = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    sample = frame_sample_plan(dp, "doc_id", "payload", every_n=10).select(
        F.lit("sample").alias("gate"),
        "doc_id",
        F.col("frame_idx").cast("int").alias("frame_idx"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("int").alias("n_frames"),
        F.lit(None).cast("double").alias("v"),
    )
    return decoded.unionByName(sample).orderBy("gate", "doc_id", "frame_idx")


@query(
    "timeseries_suite",
    oracle="""
    WITH s AS (
      SELECT user_id, list(value ORDER BY ts, value) AS vs
      FROM events GROUP BY user_id
    ), obs AS (
      SELECT user_id AS k, epoch_us(ts) AS t, value AS v
      FROM events WHERE user_id < 5
    ), b AS (
      SELECT k, MIN(t) AS lo, MAX(t) AS hi FROM obs GROUP BY k
    ), grid AS (
      SELECT k,
             unnest(generate_series(
               CAST(FLOOR(lo / 3600000000) * 3600000000 AS BIGINT),
               hi, 3600000000)) AS t
      FROM b
    ), u AS (
      SELECT k, t, v, 1 AS is_obs FROM obs
      UNION ALL
      SELECT k, t, NULL AS v, 0 AS is_obs FROM grid
    ), f AS (
      SELECT k, t, is_obs,
        last_value(v IGNORE NULLS) OVER w_prev AS pv,
        last_value(CASE WHEN v IS NOT NULL THEN t END IGNORE NULLS) OVER w_prev AS pt,
        first_value(v IGNORE NULLS) OVER w_next AS nv,
        first_value(CASE WHEN v IS NOT NULL THEN t END IGNORE NULLS) OVER w_next AS nt
      FROM u
      WINDOW
        w_prev AS (PARTITION BY k ORDER BY t, is_obs DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        w_next AS (PARTITION BY k ORDER BY t, is_obs DESC
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT * FROM (
      SELECT 'ewma' AS gate, CAST(user_id AS VARCHAR) AS k1, NULL AS k2,
             CAST(len(vs) AS BIGINT) AS n,
             -- scale-0 quantization (same cross-engine ROUND rationale)
             CAST(ROUND(list_reduce(vs, (acc, x) -> 0.3 * x + 0.7 * acc) * 10000)
                  AS BIGINT) / 10000.0 AS v
      FROM s
      UNION ALL
      SELECT 'resample', CAST(k AS VARCHAR),
             strftime(make_timestamp(t), '%Y-%m-%d %H:%M:%S'),
             NULL,
             CAST(ROUND((CASE
               WHEN pv IS NULL THEN nv
               WHEN nv IS NULL THEN pv
               WHEN nt = pt THEN pv
               ELSE pv + (nv - pv) * (CAST(t - pt AS DOUBLE) / CAST(nt - pt AS DOUBLE))
             END) * 10000) AS BIGINT) / 10000.0
      FROM f WHERE is_obs = 0
    ) ORDER BY gate, k1, k2
    """,
    description=(
        "composite time-series gate (r9 fold of timeseries_ewma/"
        "resample_linear): per-key EWMA via the JVM F.aggregate fold "
        "(full-prefix recurrence) + hourly-grid linear interpolation, "
        "both bit-identical SQL replays"
    ),
)
def timeseries_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantics per member unchanged from the pre-fold gates (r5/r7
    ROUND hardening included — values quantized to 1e-4 on both
    sides).  Tie-break: events sharing a microsecond timestamp order
    by value on both sides."""
    from strawboat_spark.operators.timeseries import ewma_last, resample_linear

    e = load_table(spark, sf_dir, "events")
    ewma = ewma_last(e, "user_id", "ts", "value", alpha=0.3).select(
        F.lit("ewma").alias("gate"),
        F.col("user_id").cast("string").alias("k1"),
        F.lit(None).cast("string").alias("k2"),
        F.col("n_points").cast("bigint").alias("n"),
        F.col("ewma").alias("v"),
    )
    rs = resample_linear(
        e.filter(F.col("user_id") < 5), "user_id", "ts", "value", step="1 hour"
    ).select(
        F.lit("resample").alias("gate"),
        F.col("user_id").cast("string").alias("k1"),
        F.date_format("grid_ts", "yyyy-MM-dd HH:mm:ss").alias("k2"),
        F.lit(None).cast("bigint").alias("n"),
        F.col("value").alias("v"),
    )
    return ewma.unionByName(rs).orderBy("gate", "k1", "k2")


@query(
    "dedup_simhash",
    oracle="""
    SELECT doc_id, TRUE AS dup_invariant, TRUE AS perm_invariant
    FROM documents ORDER BY doc_id
    """,
    description="64-bit SimHash fingerprints gated by exact multiset invariants (dup/permutation)",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The raw xxhash64-based fingerprint has no DuckDB twin, but
    SimHash is a function of the token MULTISET, so two invariants hold
    EXACTLY and gate the implementation:
      dup_invariant  — simhash(text + ' ' + text) == simhash(text)
        (every per-bit vote count doubles along with the token count;
        the majority 2*ones > n is scale-invariant)
      perm_invariant — simhash over reversed token order == simhash
        (per-token hashes are summed, order never enters)
    A bug in vote packing, lane overflow, or majority assembly breaks
    these long before it breaks anything subtler."""
    d = load_table(spark, sf_dir, "documents")
    base = simhash(d, "text", "doc_id")
    doubled = simhash(
        d.select("doc_id", F.concat_ws(" ", "text", "text").alias("text")),
        "text",
        "doc_id",
    ).withColumnRenamed("simhash", "simhash_dup")
    reversed_ = simhash(
        d.select(
            "doc_id",
            F.concat_ws(" ", F.reverse(F.split(F.lower(F.trim("text")), r"\s+"))).alias("text"),
        ),
        "text",
        "doc_id",
    ).withColumnRenamed("simhash", "simhash_rev")
    return (
        base.join(doubled, "doc_id")
        .join(reversed_, "doc_id")
        .select(
            "doc_id",
            (F.col("simhash") == F.col("simhash_dup")).alias("dup_invariant"),
            (F.col("simhash") == F.col("simhash_rev")).alias("perm_invariant"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# Similarity search
# --------------------------------------------------------------------------


def _recall_gate(spark, sf_dir: str, approx_fn, metric: str, exact=None) -> DataFrame:
    """recall@10 of an ANN operator vs the exact top-k, computed
    entirely in-Spark (left-semi join on the two result sets) and
    gated at >= 0.8 — turning an un-oracle-able approximate operator
    into a hard driver-checkable pass/fail row.

    `exact` lets a composite caller compute the shared exact-top-k
    reference ONCE (r17 opt: similarity_ann_recall ran the identical
    brute-force reference 5x, once per leg)."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5)
    if exact is None:
        exact = cosine_topk(e, q, "vec_id", "embedding", k=10).select(
            "query_id", "neighbor_id"
        )
    approx = approx_fn(e, q).select("query_id", "neighbor_id", F.lit(1).alias("hit"))
    joined = exact.join(approx, ["query_id", "neighbor_id"], "left")
    return joined.agg(
        (F.sum(F.coalesce(F.col("hit"), F.lit(0))) / F.count(F.lit(1))).alias("recall")
    ).select(
        F.lit(metric).alias("metric"),
        (F.col("recall") >= 0.8).alias("recall_ge_080"),
    )


@query(
    "similarity_ann_recall",
    revised=17,  # distributed-trainer leg folded in (VERDICT r16 #1)
    oracle="""
    SELECT 'ivf_distributed_recall_at_10' AS metric, true AS recall_ge_080
    UNION ALL SELECT 'ivf_incremental_recall_at_10', true
    UNION ALL SELECT 'ivf_recall_at_10', true
    UNION ALL SELECT 'lsh_recall_at_10', true
    UNION ALL SELECT 'pq_recall_at_10', true
    ORDER BY metric
    """,
    description=(
        "composite ANN recall gate (r9 fold of the ivf/lsh/pq ann+recall "
        "pairs; r17 adds the distributed-trainer leg): each index runs "
        "end-to-end against the exact top-10 and must reach recall >= "
        "0.8 — IVF (kmeans++ coarse quantizer, nprobe cells, exact "
        "rerank), IVF with kmeans_trainer='distributed' (O(k) init + "
        "Spark-pass Lloyd, the paper-scale trainer — this leg puts "
        "kmeans_train_distributed under the driver's correctness "
        "signal), multi-probe LSH (4x8 planes, Hamming ball r=3), PQ "
        "(8-byte codes, ADC shortlist, exact rerank; measured 0.98), "
        "and the PERSISTENT incremental IVF index (half the corpus "
        "indexed, half appended, search prunes to nprobe cell "
        "directories)"
    ),
)
def similarity_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One gate, three ANN indexes (operators/similarity.py).  The
    synthetic near-random embeddings are the worst case for all three
    (no cluster structure); probe/candidate budgets carry the margin —
    parameters unchanged from the pre-fold gates (r5-r6)."""
    import tempfile as _tf
    from functools import reduce

    from strawboat_spark.operators.similarity import (
        ivf_cosine_topk,
        ivf_index_append,
        ivf_index_init,
        ivf_index_search,
        pq_cosine_topk,
    )
    from strawboat_spark.sources.datasource import register

    register(spark)

    def _incremental_ivf(e, q):
        p = f"{_tf.mkdtemp(prefix='strawboat_ivfidx_')}/emb"
        ivf_index_init(spark, p, e.filter("vec_id % 2 = 0"), "vec_id", "embedding",
                       n_centroids=16)
        ivf_index_append(spark, p, e.filter("vec_id % 2 = 1"), "vec_id", "embedding")
        return ivf_index_search(spark, p, q, "vec_id", "embedding", k=10, nprobe=12)

    gates = [
        ("ivf_incremental_recall_at_10", _incremental_ivf),
        (
            "ivf_recall_at_10",
            lambda e, q: ivf_cosine_topk(
                e, q, "vec_id", "embedding", k=10, n_centroids=16, nprobe=12
            ),
        ),
        (
            # VERDICT r16 #1: the paper-scale trainer
            # (kmeans_train_distributed — O(k) Bernoulli init, one
            # mapInPandas partial-sum pass + one bounded shuffle + one
            # k-row collect per Lloyd iteration) exercised under the
            # driver's hard correctness signal, same 0.8 floor and
            # probe budget as the driver-trainer leg above
            "ivf_distributed_recall_at_10",
            lambda e, q: ivf_cosine_topk(
                e, q, "vec_id", "embedding", k=10, n_centroids=16, nprobe=12,
                kmeans_trainer="distributed",
            ),
        ),
        (
            "lsh_recall_at_10",
            lambda e, q: lsh_cosine_topk(
                e, q, "vec_id", "embedding", k=10, dim=64, multiprobe_radius=3
            ),
        ),
        (
            "pq_recall_at_10",
            lambda e, q: pq_cosine_topk(
                e, q, "vec_id", "embedding", k=10, m=8, n_codes=64, n_candidates=100
            ),
        ),
    ]
    # r17 opt: ONE exact brute-force reference shared by all five legs
    # (it is the same (e, q, k=10) every time); localCheckpoint cuts
    # the 5-way plan duplication so the reference computes once.
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5)
    exact = (
        cosine_topk(e, q, "vec_id", "embedding", k=10)
        .select("query_id", "neighbor_id")
        .localCheckpoint(eager=True)
    )
    frames = [_recall_gate(spark, sf_dir, fn, name, exact=exact) for name, fn in gates]
    return reduce(lambda a, b: a.unionByName(b), frames).orderBy("metric")


@query(
    "similarity_topk_bruteforce",
    oracle="""
    WITH u AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), q AS (SELECT * FROM u WHERE vec_id < 5),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             ROUND(list_cosine_similarity(c.v, q.v), 6) AS score
      FROM u c, q WHERE c.vec_id <> q.vec_id
    )
    SELECT query_id, neighbor_id, score,
           CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                ORDER BY score DESC, neighbor_id) AS BIGINT) AS rank
    FROM scored QUALIFY rank <= 10 ORDER BY query_id, rank
    """,
    description="exact top-10 cosine neighbors (broadcast queries, JVM zip_with dot)",
)
def similarity_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    return cosine_topk(e, e.filter(F.col("vec_id") < 5), "vec_id", "embedding", k=10)





@query(
    "corpus_semdedup",
    oracle="""
    WITH u AS (
      SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    cents AS (
      SELECT ROW_NUMBER() OVER (ORDER BY id) - 1 AS cluster, v
      FROM (SELECT id, v FROM u ORDER BY id LIMIT 8)
    ),
    scored AS (
      SELECT u.id, c.cluster, list_cosine_similarity(u.v, c.v) AS s
      FROM u CROSS JOIN cents c
    ),
    assign AS (
      SELECT id, cluster FROM (
        SELECT id, cluster,
               ROW_NUMBER() OVER (PARTITION BY id ORDER BY s DESC, cluster) AS rn
        FROM scored
      ) WHERE rn = 1
    ),
    pairs AS (
      SELECT a.id AS x, b.id AS y,
             ROUND(list_cosine_similarity(ua.v, ub.v), 6) AS s
      FROM assign a
      JOIN assign b ON a.cluster = b.cluster AND b.id < a.id
      JOIN u ua ON ua.id = a.id
      JOIN u ub ON ub.id = b.id
    ),
    dom AS (SELECT x, MIN(y) AS dup_of FROM pairs WHERE s >= 0.35 GROUP BY x)
    SELECT a.id AS id, CAST(a.cluster AS INTEGER) AS cluster,
           dom.x IS NULL AS kept, dom.dup_of,
           CASE WHEN dom.dup_of IS NOT NULL
                THEN ROUND(list_cosine_similarity(uu.v, ud.v), 6) END AS score
    FROM assign a
    JOIN u uu ON uu.id = a.id
    LEFT JOIN dom ON dom.x = a.id
    LEFT JOIN u ud ON ud.id = dom.dup_of
    ORDER BY a.id
    """,
    description=(
        "SemDeDup (Abbas et al. 2023): cluster embeddings into cells, "
        "drop every member with a smaller-id same-cell neighbor at "
        ">= 0.35 cosine — pairs form only inside a cell (never "
        "all-pairs; n_clusters tunes |cell|^2). Gate runs the "
        "deterministic seed-centroid mode so assignment + drop rule "
        "replay exactly in SQL; kmeans is the production default"
    ),
)
def corpus_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/similarity.py semdedup (contract in
    tests/test_operators.py::test_semdedup_*)."""
    e = load_table(spark, sf_dir, "embeddings")
    return semdedup(
        e,
        "vec_id",
        "embedding",
        n_clusters=8,
        threshold=0.35,
        centroids="seed",
    ).orderBy("id")


@query(
    "embedding_neardup_cosine",
    oracle="""
    WITH u AS (
      SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND(list_cosine_similarity(a.v, b.v), 6) AS score
    FROM u a JOIN u b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.v, b.v) >= 0.5
    ORDER BY id_a, id_b
    """,
    description="embedding near-dup pairs >= 0.5 cosine, label-blocked (never all-pairs)",
)
def embedding_neardup_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    return cosine_neardup_pairs_blas(e, "vec_id", "embedding", "label", threshold=0.5).orderBy(
        "id_a", "id_b"
    )


# --------------------------------------------------------------------------
# Text analysis
# --------------------------------------------------------------------------


def _duck_count(pattern: str, col: str = "text") -> str:
    return f"len(regexp_extract_all(lower({col}), '{pattern}'))"


_S_EN = _duck_count(r"\b(the|and|of|to|a)\b")
_S_DE = _duck_count(r"\b(der|die|das|und|ist)\b")
_S_ES = _duck_count(r"\b(el|la|los|que|y)\b")
_S_FR = _duck_count(r"\b(le|la|les|et|est)\b")


@query(
    "text_language_id",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, lang AS label_lang,
             {_S_EN} AS s_en,
             {_S_DE} AS s_de,
             {_S_ES} AS s_es,
             {_S_FR} AS s_fr
      FROM documents
    )
    SELECT doc_id, label_lang,
           CASE WHEN s_en > 0 AND s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en'
                WHEN s_de > 0 AND s_de >= s_es AND s_de >= s_fr THEN 'de'
                WHEN s_es > 0 AND s_es >= s_fr THEN 'es'
                WHEN s_fr > 0 THEN 'fr'
                ELSE 'unknown' END AS predicted,
           CAST(s_en AS INT) AS s_en, CAST(s_de AS INT) AS s_de,
           CAST(s_es AS INT) AS s_es, CAST(s_fr AS INT) AS s_fr
    FROM scored ORDER BY doc_id
    """,
    description="marker-word language-ID heuristic (deterministic argmax CASE chain)",
)
def text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    langs = ["en", "de", "es", "fr"]
    scores = lang_scores(F.col("text"))
    return d.select(
        "doc_id",
        F.col("lang").alias("label_lang"),
        lang_id(F.col("text"), langs).alias("predicted"),
        *[scores[lg].cast("int").alias(f"s_{lg}") for lg in langs],
    ).orderBy("doc_id")


@query(
    "text_quality_scores",
    oracle="""
    WITH m AS (
      SELECT doc_id, lang,
             length(text) AS n_chars_c,
             len(regexp_extract_all(text, '\\S+')) AS n_words,
             len(regexp_extract_all(text, '[.,;:!?]')) AS n_punct,
             len(regexp_extract_all(lower(text), '\\b(the|and|of|to|a)\\b')) AS n_stop
      FROM documents
    )
    SELECT doc_id, lang,
           ROUND(CAST(
             (CASE WHEN n_chars_c >= 50 AND n_chars_c <= 10000 THEN 0.4 ELSE 0.0 END) +
             (CASE WHEN n_chars_c / greatest(n_words, 1) >= 2
                    AND n_chars_c / greatest(n_words, 1) <= 12 THEN 0.3 ELSE 0.0 END) +
             (CASE WHEN n_punct / greatest(n_words, 1) <= 0.3 THEN 0.2 ELSE 0.0 END) +
             (CASE WHEN n_stop > 0 THEN 0.1 ELSE 0.0 END) AS DOUBLE), 1) AS quality
    FROM m ORDER BY doc_id
    """,
    description="Gopher-style cheap quality heuristics, pure JVM expressions",
)
def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", "lang", quality_score("text").alias("quality")).orderBy("doc_id")


@query(
    "tokenizer_bpe",
    revised=17,  # r17 rewrite not in the r17 driver sample (VERDICT r17 #7)
    oracle="""
    WITH wc AS (
      SELECT word, CAST(COUNT(*) AS BIGINT) AS freq
      FROM (SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS word
            FROM documents)
      WHERE word <> '' GROUP BY word
    ), positions AS (
      SELECT word, freq,
             unnest(generate_series(1, length(word) - 1)) AS i
      FROM wc
    ), pairs AS (
      SELECT substr(word, i, 1) AS l, substr(word, i + 1, 1) AS r,
             SUM(freq) AS n
      FROM positions GROUP BY 1, 2
    ), best AS (SELECT l, r FROM pairs ORDER BY n DESC, l, r LIMIT 1)
    SELECT * FROM (
      SELECT 'encode' AS gate, CAST(doc_id AS VARCHAR) AS k,
             CAST(length(regexp_replace(trim(text), '\\s+', '', 'g')) AS BIGINT)
               AS v,
             TRUE AS ok
      FROM documents
      UNION ALL
      SELECT 'train', 'first_pair',
             NULL,
             (SELECT l FROM best) IS NOT NULL AND (SELECT r FROM best) IS NOT NULL
      FROM (SELECT 1)
      UNION ALL
      SELECT 'train', 'first_left_' || (SELECT l FROM best), NULL, TRUE
      UNION ALL
      SELECT 'train', 'first_right_' || (SELECT r FROM best), NULL, TRUE
      UNION ALL
      SELECT 'train', 'n_words',
             (SELECT CAST(COUNT(*) AS BIGINT) FROM wc), TRUE
      UNION ALL
      SELECT 'train', 'shrank_and_lossless', NULL, TRUE
    ) ORDER BY gate, k
    """,
    description=(
        "composite BPE gate (r9 fold of tokenizer_bpe_train/encode): 8 "
        "distributed merge rounds learned over documents, per-doc "
        "lossless reconcatenation + exact non-whitespace char counts, "
        "first learned pair and vocab size replayed exactly in SQL"
    ),
)
def tokenizer_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training is driver-coordinated rounds of ONE distributed pair
    count each (operators/bpe.py).  Encoding uses the Arrow-batched
    rank-dict encoder (r17 opt, guide §4.2): the JVM nested-fold form
    compiles one aggregate per merge and cost 62 s vs 5 s at sf0.1 for
    byte-identical output (parity-pinned in tests/test_bpe.py) — per-
    batch native loops beat a deeply nested codegen expression tree,
    and the merge list still rides to workers as plain Python state."""
    from strawboat_spark.operators.bpe import encode_bpe_pandas, train_bpe, word_counts

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    wc = word_counts(d, "text")
    merges = train_bpe(wc, 8)
    enc = encode_bpe_pandas(d, "doc_id", "text", merges)
    per_doc = enc.select(
        F.lit("encode").alias("gate"),
        F.col("doc_id").cast("string").alias("k"),
        F.col("n_chars").cast("bigint").alias("v"),
        F.col("roundtrip_ok").alias("ok"),
    )
    stats = enc.agg(
        F.min("roundtrip_ok").alias("all_ok"),
        (F.sum("n_tokens") < F.sum("n_chars")).alias("shrank"),
    )
    nw = wc.agg(F.count(F.lit(1)).cast("bigint").alias("n_words"))
    summary = (
        nw.join(F.broadcast(stats))
        .select(
            F.explode(
                F.array(
                    F.struct(
                        F.lit("first_pair").alias("k"),
                        F.lit(None).cast("bigint").alias("v"),
                        F.lit(merges[0][0] is not None and merges[0][1] is not None).alias("ok"),
                    ),
                    F.struct(
                        F.lit("first_left_" + merges[0][0]).alias("k"),
                        F.lit(None).cast("bigint").alias("v"),
                        F.lit(True).alias("ok"),
                    ),
                    F.struct(
                        F.lit("first_right_" + merges[0][1]).alias("k"),
                        F.lit(None).cast("bigint").alias("v"),
                        F.lit(True).alias("ok"),
                    ),
                    F.struct(
                        F.lit("n_words").alias("k"),
                        F.col("n_words").alias("v"),
                        F.lit(True).alias("ok"),
                    ),
                    F.struct(
                        F.lit("shrank_and_lossless").alias("k"),
                        F.lit(None).cast("bigint").alias("v"),
                        (F.col("all_ok") & F.col("shrank")).alias("ok"),
                    ),
                )
            ).alias("s")
        )
        .select(F.lit("train").alias("gate"), "s.k", "s.v", "s.ok")
    )
    return per_doc.unionByName(summary).orderBy("gate", "k")


@query(
    "text_token_stats",
    oracle="""
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(len(regexp_extract_all(text, '\\S+'))) AS BIGINT) AS total_tokens,
           ROUND(AVG(len(regexp_extract_all(text, '\\S+'))), 4) AS avg_tokens,
           CAST(MAX(n_chars) AS BIGINT) AS max_chars
    FROM documents GROUP BY lang ORDER BY lang
    """,
    description="token counting + corpus stats per language",
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        d.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(token_count("text")).cast("bigint").alias("total_tokens"),
            F.round(F.avg(token_count("text")), 4).alias("avg_tokens"),
            F.max("n_chars").cast("bigint").alias("max_chars"),
        )
        .orderBy("lang")
    )


@query(
    "doc_fingerprints",
    oracle="""
    SELECT source,
           CAST(COUNT(DISTINCT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))) AS BIGINT)
             AS n_unique_fp,
           COUNT(*) AS n_docs
    FROM documents GROUP BY source ORDER BY source
    """,
    description="document fingerprinting (md5 of normalized text) per source",
)
def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select("source", fingerprint("text").alias("fp"))
        .groupBy("source")
        .agg(
            F.countDistinct("fp").alias("n_unique_fp"),
            F.count(F.lit(1)).alias("n_docs"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# Multimodal (binary payload plumbing; decode stubbed — no media libs)
# --------------------------------------------------------------------------


@query(
    "multimodal_binary_stats",
    oracle="""
    SELECT source,
           COUNT(*) AS n_payloads,
           CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
           CAST(MAX(octet_length(encode(text))) AS BIGINT) AS max_bytes
    FROM documents GROUP BY source ORDER BY source
    """,
    description="binary payload columns: byte stats per source (payload stays opaque)",
)
def multimodal_binary_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    payload = F.encode("text", "utf-8")
    return (
        d.select("source", F.length(payload).cast("long").alias("nb"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_payloads"),
            F.sum("nb").cast("bigint").alias("total_bytes"),
            F.max("nb").cast("bigint").alias("max_bytes"),
        )
        .orderBy("source")
    )



@query(
    "multimodal_image_codecs",
    revised=18,  # r18 single-stage fuse of the five codec legs
    oracle="""
    SELECT * FROM (
      SELECT 'gif' AS codec, doc_id,
             CAST(6 + doc_id % 11 AS INT) AS width,
             CAST(4 + doc_id % 8 AS INT) AS height,
             ROUND(list_avg(list_transform(
               generate_series(0, CAST((6 + doc_id % 11) * (4 + doc_id % 8) - 1 AS BIGINT)),
               i -> CAST((i * 29 + doc_id) % 256 AS DOUBLE))), 4) AS mean_intensity
      FROM documents
      UNION ALL
      SELECT 'jpeg', doc_id,
             CAST(8 * (1 + doc_id % 3) AS INT),
             CAST(8 * (1 + doc_id % 2) AS INT),
             ROUND(list_avg(list_transform(
               generate_series(0, CAST((1 + doc_id % 3) * (1 + doc_id % 2) - 1 AS BIGINT)),
               j -> CAST((j * 41 + doc_id) % 256 AS DOUBLE))), 4)
      FROM documents
      UNION ALL
      SELECT 'png', doc_id,
             CAST(8 + doc_id % 9 AS INT),
             CAST(5 + doc_id % 6 AS INT),
             ROUND(list_avg(list_transform(
               generate_series(0, CAST((8 + doc_id % 9) * (5 + doc_id % 6) - 1 AS BIGINT)),
               i -> CAST((i * 23 + doc_id) % 256 AS DOUBLE))), 4)
      FROM documents
      UNION ALL
      SELECT 'qoi', doc_id,
             CAST(6 + doc_id % 11 AS INT),
             CAST(4 + doc_id % 7 AS INT),
             ROUND(list_avg(flatten(list_transform(
               generate_series(0, CAST((6 + doc_id % 11) * (4 + doc_id % 7) - 1 AS BIGINT)),
               i -> [CAST((3 * i + doc_id) % 256 AS DOUBLE),
                     CAST((5 * i + doc_id) % 256 AS DOUBLE),
                     CAST((7 * i + doc_id) % 256 AS DOUBLE)]))), 4)
      FROM documents
      UNION ALL
      SELECT 'tiff', doc_id,
             CAST(5 + doc_id % 12 AS INT),
             CAST(4 + doc_id % 9 AS INT),
             ROUND(list_avg(list_transform(
               generate_series(0, CAST((5 + doc_id % 12) * (4 + doc_id % 9) - 1 AS BIGINT)),
               i -> CAST((i * 31 + doc_id) % 256 AS DOUBLE))), 4)
      FROM documents
    ) ORDER BY codec, doc_id
    """,
    description=(
        "composite REAL image-codec gate (r9 fold of the jpeg/png/gif/"
        "tiff/qoi decode gates): per doc, five spec-valid images are "
        "synthesized and decoded by the pure-numpy parsers — JPEG "
        "Huffman+IDCT, PNG inflate+unfilter, GIF variable-width LZW, "
        "TIFF strip-LZW+predictor, QOI hash-cache ops — each exact "
        "against its analytic oracle, labeled so one red row names the "
        "broken codec"
    ),
)
def multimodal_image_codecs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One gate, five real decoders (operators/jpeg.py, png.py, gif.py,
    tiff.py, qoi.py).  Pixel formulas per codec match the per-codec
    docstrings of the pre-fold gates (git history r5-r8); JPEG uses
    DC-only blocks so the lossy path is bit-exact, the other four are
    lossless."""
    from collections.abc import Iterator

    import pandas as pd

    from strawboat_spark.operators.gif import synthesize_gif_bytes
    from strawboat_spark.operators.jpeg import synthesize_jpeg_bytes
    from strawboat_spark.operators.png import synthesize_png_bytes
    from strawboat_spark.operators.qoi import synthesize_qoi_bytes
    from strawboat_spark.operators.tiff import synthesize_tiff_bytes

    specs = {
        "gif": (synthesize_gif_bytes, lambda i: (6 + i % 11, 4 + i % 8)),
        "jpeg": (synthesize_jpeg_bytes, lambda i: (8 * (1 + i % 3), 8 * (1 + i % 2))),
        "png": (synthesize_png_bytes, lambda i: (8 + i % 9, 5 + i % 6)),
        "qoi": (synthesize_qoi_bytes, lambda i: (6 + i % 11, 4 + i % 7)),
        "tiff": (synthesize_tiff_bytes, lambda i: (5 + i % 12, 4 + i % 9)),
    }
    # r18 opt (guide §1.2/§4.1): ONE Python stage for all five codecs.
    # The old shape ran 2 mapInPandas stages per codec (synth, then
    # extract_image_features' decode) x 5 codecs = 10 Python stage
    # instances + 5 document scans + a 5-way union; profiled
    # single-thread CPU of ALL synth+decode work is only ~1.0 s
    # (decode: gif 0.21, tiff 0.17, jpeg 0.09, qoi 0.08, png 0.02 s per
    # 500 docs), so the gate's cost was stage fan-out, not codec CPU —
    # VERDICT r17 #9's JPEG-Huffman hypothesis is measured-refuted.
    # Synth + decode fuse into one generator (payload bytes never cross
    # a stage boundary at all); rows and dtypes are unchanged.
    # (r17's localCheckpoint-the-union attempt stays rejected: with one
    # cheap stage the orderBy sampling re-run costs even less.)
    from strawboat_spark.operators.multimodal import _decode_image_bytes

    codecs = sorted(specs)

    def synth_decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"codec": [], "doc_id": [], "width": [], "height": [], "mean": []}
            for i in pdf["doc_id"]:
                i = int(i)
                for codec in codecs:
                    fn, dims = specs[codec]
                    w, h, mean = _decode_image_bytes(fn(i, *dims(i)), False)
                    out["codec"].append(codec)
                    out["doc_id"].append(i)
                    out["width"].append(w)
                    out["height"].append(h)
                    out["mean"].append(mean)
            yield pd.DataFrame(out)

    d = _spread_ids(load_table(spark, sf_dir, "documents").select("doc_id"))
    return (
        d.mapInPandas(
            synth_decode,
            schema="codec string, doc_id long, width int, height int, mean double",
        )
        .select(
            "codec",
            "doc_id",
            "width",
            "height",
            F.col("mean").alias("mean_intensity"),
        )
        .orderBy("codec", "doc_id")
    )


@query(
    "multimodal_audio_chunk_suite",
    oracle="""
    -- documents.text is pure ASCII (verified: octet_length(encode(text))
    -- == length(text) for every row), so byte windows == char windows
    -- and ord(char) == byte value.
    WITH chunked AS (
      SELECT doc_id,
             CAST(unnest(generate_series(
               0, greatest(CAST(ceil(length(text) / 4096.0) AS INT) - 1, 0)
             )) AS INT) AS chunk_idx,
             text
      FROM documents
    ), sliced AS (
      SELECT doc_id, chunk_idx,
             substring(text, chunk_idx * 4096 + 1, 4096) AS chunk
      FROM chunked
    ), bytes AS (
      SELECT doc_id, chunk_idx, length(chunk) AS n_bytes,
             unnest(range(length(chunk))) AS i, chunk
      FROM sliced
    )
    SELECT doc_id, chunk_idx,
           CAST(chunk_idx * 4096 AS BIGINT) AS byte_start,
           CAST(max(n_bytes) AS BIGINT) AS byte_len,
           ROUND(sqrt(avg(ord(substring(chunk, CAST(i AS INT) + 1, 1)) ** 2)), 4) AS rms
    FROM bytes GROUP BY doc_id, chunk_idx
    ORDER BY doc_id, chunk_idx
    """,
    description=(
        "composite audio-chunk gate (r14 fold of multimodal_audio_chunks"
        " + multimodal_audio_features): payload → fixed 4KiB byte "
        "windows (JVM-side binary slicing) joined with the per-chunk "
        "RMS from the Arrow-batched feature extractor — window geometry "
        "AND feature values verified in one pass"
    ),
)
def multimodal_audio_chunk_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk plan (byte_start/byte_len) and chunk features (rms) over
    the same 4KiB windows, equi-joined on (doc_id, chunk_idx): a wrong
    slice boundary breaks byte_len, a wrong decode breaks rms."""
    from strawboat_spark.operators.multimodal import (
        audio_chunk_plan,
        extract_audio_features,
    )

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    chunks = audio_chunk_plan(d, "doc_id", "payload", chunk_bytes=4096)
    feats = extract_audio_features(chunks).select("doc_id", "chunk_idx", "rms")
    return (
        chunks.select("doc_id", "chunk_idx", "byte_start", "byte_len")
        .join(feats, ["doc_id", "chunk_idx"])
        .orderBy("doc_id", "chunk_idx")
    )


@query(
    "llm_corpus_pipeline",
    oracle="""
    -- The full training-data pipeline in one pass: quality filter ->
    -- exact dedup -> near-dup cluster dedup -> corpus stats.
    WITH RECURSIVE kept AS (
      SELECT doc_id, lang, text FROM (
        SELECT doc_id, lang, text,
               (CASE WHEN length(text) BETWEEN 50 AND 10000 THEN 0.4 ELSE 0.0 END) +
               (CASE WHEN length(text) / greatest(len(regexp_extract_all(text, '\\S+')), 1)
                       BETWEEN 2 AND 12 THEN 0.3 ELSE 0.0 END) +
               (CASE WHEN len(regexp_extract_all(text, '[.,;:!?]'))
                       / greatest(len(regexp_extract_all(text, '\\S+')), 1) <= 0.3
                     THEN 0.2 ELSE 0.0 END) +
               (CASE WHEN len(regexp_extract_all(lower(text), '\\b(the|and|of|to|a)\\b')) > 0
                     THEN 0.1 ELSE 0.0 END) AS q
        FROM documents)
      WHERE q >= 0.45
    ), exact_surv AS (
      SELECT CAST(MIN(doc_id) AS BIGINT) AS doc_id
      FROM kept
      GROUP BY md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
    ), surv AS (
      SELECT k.doc_id, k.lang, k.text FROM kept k JOIN exact_surv e USING (doc_id)
    ), tok AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS ts FROM surv
    ), sh0 AS (
      SELECT DISTINCT doc_id,
             unnest([array_to_string(ts[CAST(i AS INT) : CAST(i AS INT) + 2], ' ')
                     for i in range(1, greatest(len(ts) - 1, 1))]) AS shingle
      FROM tok WHERE len(ts) >= 3
    ), sh AS (
      -- df-cut mirror of ngram_jaccard_pairs(max_doc_freq=1000)
      SELECT * FROM sh0 QUALIFY COUNT(*) OVER (PARTITION BY shingle) <= 1000
    ), sizes AS (
      SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
    ), pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ), edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
      WHERE n_common / (sa.n + sb.n - n_common) >= 0.5
      UNION ALL
      SELECT id_b, id_a FROM pairs
      JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
      WHERE n_common / (sa.n + sb.n - n_common) >= 0.5
    ), walk(node, reach) AS (
      SELECT doc_id, doc_id FROM surv
      UNION
      SELECT w.node, e.dst FROM walk w JOIN edges e ON w.reach = e.src
    ), comp AS (
      SELECT node AS doc_id, MIN(reach) AS component FROM walk GROUP BY node
    ), final AS (
      SELECT s.doc_id, s.lang, s.text FROM surv s
      JOIN comp c USING (doc_id) WHERE c.doc_id = c.component
    )
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(len(regexp_extract_all(text, '\\S+'))) AS BIGINT) AS total_tokens,
           CAST(MIN(doc_id) AS BIGINT) AS first_doc
    FROM final GROUP BY lang ORDER BY lang
    """,
    description=(
        "end-to-end training-data pipeline: Gopher-style quality filter -> exact "
        "dedup (fingerprint min-id survivor) -> near-dup clusters (jaccard>=0.5 "
        "connected components, keep cluster min) -> per-language corpus stats"
    ),
)
def llm_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from strawboat_spark.functions.text import quality_score, token_count
    from strawboat_spark.operators.dedup import connected_components, exact_dedup

    d = load_table(spark, sf_dir, "documents")
    kept = d.filter(quality_score("text") >= 0.45).select("doc_id", "lang", "text")

    exact_surv = exact_dedup(kept, "text", "doc_id").select(
        F.col("survivor_doc_id").alias("doc_id")
    )
    surv = kept.join(exact_surv, "doc_id")

    edges = ngram_jaccard_pairs(surv, "text", "doc_id", shingle_n=3, threshold=0.5)
    comp = connected_components(
        surv.select("doc_id"), edges, id_col="doc_id", src_col="id_a", dst_col="id_b"
    )
    final = surv.join(
        comp.filter(F.col("doc_id") == F.col("component")).select("doc_id"), "doc_id"
    )
    return (
        final.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(token_count(F.col("text"))).cast("bigint").alias("total_tokens"),
            F.min("doc_id").alias("first_doc"),
        )
        .orderBy("lang")
    )


@query(
    "similarity_topk_vectorized",
    oracle="""
    WITH u AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), q AS (SELECT * FROM u WHERE vec_id < 5),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             ROUND(list_cosine_similarity(c.v, q.v), 6) AS score
      FROM u c, q WHERE c.vec_id <> q.vec_id
    )
    SELECT query_id, neighbor_id, score,
           CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                ORDER BY score DESC, neighbor_id) AS BIGINT) AS rank
    FROM scored QUALIFY rank <= 10 ORDER BY query_id, rank
    """,
    description="exact top-10 cosine neighbors, BLAS-scored via mapInPandas (Arrow batch matmul)",
)
def similarity_topk_vectorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    from strawboat_spark.operators.similarity import cosine_topk_vectorized

    e = load_table(spark, sf_dir, "embeddings")
    return cosine_topk_vectorized(e, e.filter(F.col("vec_id") < 5), "vec_id", "embedding", k=10)


# --------------------------------------------------------------------------
# Corpus preparation: decontamination, splits, packing, PII
# --------------------------------------------------------------------------


@query(
    "corpus_decontamination",
    oracle="""
    WITH tok AS (
      SELECT doc_id,
             string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS w
      FROM documents
    ),
    bench AS (
      SELECT DISTINCT doc_id AS bench_id,
             array_to_string(list_slice(w, i, i + 4), ' ') AS gram
      FROM tok, UNNEST(generate_series(1, greatest(len(w) - 4, 0))) AS u(i)
      WHERE doc_id < 20 AND len(w) >= 5
    ),
    corp AS (
      SELECT DISTINCT doc_id,
             array_to_string(list_slice(w, i, i + 4), ' ') AS gram
      FROM tok, UNNEST(generate_series(1, greatest(len(w) - 4, 0))) AS u(i)
      WHERE doc_id >= 20 AND len(w) >= 5
    )
    SELECT c.doc_id, b.bench_id, COUNT(*) AS n_shared_grams
    FROM corp c JOIN bench b USING (gram)
    GROUP BY c.doc_id, b.bench_id
    ORDER BY c.doc_id, b.bench_id
    """,
    description="benchmark decontamination: corpus docs sharing any word 5-gram with the eval set (inverted-index join, bench side broadcast)",
)
def corpus_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    from strawboat_spark.operators.corpus import benchmark_ngram_overlap

    d = load_table(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") < 20)
    corpus = d.filter(F.col("doc_id") >= 20)
    return benchmark_ngram_overlap(corpus, bench, "doc_id", "text", n=5).orderBy(
        "doc_id", "bench_id"
    )


@query(
    "corpus_train_test_split",
    oracle="""
    SELECT doc_id,
           CASE WHEN CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INT) < 6553
                THEN 'test' ELSE 'train' END AS split
    FROM documents ORDER BY doc_id
    """,
    description="deterministic hash train/test split (md5 bucket — engine-portable, map-only, no shuffle)",
)
def corpus_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from strawboat_spark.operators.corpus import train_test_split_hash

    d = load_table(spark, sf_dir, "documents")
    return train_test_split_hash(d, "doc_id", test_fraction=0.1).select(
        "doc_id", "split"
    ).orderBy("doc_id")


@query(
    "corpus_pack_sequences",
    oracle="""
    WITH t AS (
      SELECT lang, doc_id,
             CAST(len(regexp_extract_all(text, '\\S+')) AS INT) AS n_tokens
      FROM documents
    )
    SELECT lang, doc_id, n_tokens,
           CAST(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS BIGINT)
             AS stream_offset,
           CAST(FLOOR((SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens) / 512)
             AS BIGINT) AS bin
    FROM t ORDER BY lang, doc_id
    """,
    description="sequence packing: concatenated-stream context-window assignment (one cumsum window per lang shard)",
)
def corpus_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    from strawboat_spark.operators.corpus import pack_sequences

    d = load_table(spark, sf_dir, "documents")
    return pack_sequences(d, "doc_id", "text", ctx_len=512, shard_col="lang").orderBy(
        "lang", "doc_id"
    )


@query(
    "corpus_pii_redaction",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             concat(text, ' contact me at u', CAST(doc_id AS VARCHAR),
                    '@mail.example.com or +1 (415) 555-0', CAST(doc_id AS VARCHAR)) AS x
      FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(x, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS INT) AS n_email,
           CAST(len(regexp_extract_all(x, '\\+?[0-9][0-9()\\- ]{7,}[0-9]')) AS INT) AS n_phone,
           CAST(len(regexp_extract_all(x, '\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b')) AS INT) AS n_ipv4,
           regexp_replace(
             regexp_replace(
               regexp_replace(x, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
               '\\+?[0-9][0-9()\\- ]{7,}[0-9]', '[PHONE]', 'g'),
             '\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b', '[IPV4]', 'g') AS redacted
    FROM t ORDER BY doc_id
    """,
    description="PII redaction (email/phone/IPv4 regex chain, map-only) with per-kind counts; demo injects synthetic contacts",
)
def corpus_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    from strawboat_spark.operators.corpus import redact_pii

    d = load_table(spark, sf_dir, "documents").withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.lit(" contact me at u"),
            F.col("doc_id").cast("string"),
            F.lit("@mail.example.com or +1 (415) 555-0"),
            F.col("doc_id").cast("string"),
        ),
    )
    return redact_pii(d, "text").select(
        "doc_id", "n_email", "n_phone", "n_ipv4", "redacted"
    ).orderBy("doc_id")


@query(
    "corpus_domain_mix",
    oracle="""
    SELECT doc_id, lang FROM documents
    WHERE CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INT)
          < (CASE lang WHEN 'en' THEN 32768 WHEN 'zh' THEN 16384
                       WHEN 'de' THEN 49152 ELSE 65536 END)
    ORDER BY doc_id
    """,
    description="deterministic domain-mixture resampling: per-lang Bernoulli keep by md5 bucket (map-only, no shuffle, reproducible)",
)
def corpus_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from strawboat_spark.operators.corpus import domain_mix_sample

    d = load_table(spark, sf_dir, "documents")
    # powers-of-two rates so rate*65536 is exact in both engines
    return (
        domain_mix_sample(d, "lang", "doc_id", {"en": 0.5, "zh": 0.25, "de": 0.75})
        .select("doc_id", "lang")
        .orderBy("doc_id")
    )


@query(
    "corpus_global_shuffle",
    oracle="""
    SELECT doc_id, md5(concat('seed42', CAST(doc_id AS VARCHAR))) AS shuffle_key
    FROM documents ORDER BY shuffle_key
    """,
    description="deterministic global shuffle: md5(salt||id) key, realized as a range sort (reproducible, re-seedable; no single-partition window)",
)
def corpus_global_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    from strawboat_spark.operators.corpus import with_shuffle_key

    d = load_table(spark, sf_dir, "documents")
    return with_shuffle_key(d, "doc_id", salt="seed42").select(
        "doc_id", "shuffle_key"
    ).orderBy("shuffle_key")


@query(
    "corpus_quality_quota",
    oracle="""
    WITH t AS (
      SELECT lang, doc_id,
             CAST(len(regexp_extract_all(text, '\\S+')) AS INT) AS n_tokens
      FROM documents
    )
    SELECT lang, doc_id, n_tokens, quota_rank FROM (
      SELECT lang, doc_id, n_tokens,
             CAST(row_number() OVER (PARTITION BY lang
                  ORDER BY n_tokens DESC, doc_id) AS BIGINT) AS quota_rank
      FROM t
    ) WHERE quota_rank <= 20 ORDER BY lang, quota_rank
    """,
    description="per-domain quota selection: top-N docs per lang by token count (one bounded ranking window per domain)",
)
def corpus_quality_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    from strawboat_spark.operators.corpus import domain_quota_topn

    d = load_table(spark, sf_dir, "documents")
    scored = d.select("lang", "doc_id", token_count("text").alias("n_tokens"))
    return (
        domain_quota_topn(scored, "lang", "n_tokens", 20, "doc_id")
        .select("lang", "doc_id", "n_tokens", "quota_rank")
        .orderBy("lang", "quota_rank")
    )

@query(
    "text_repetition_ratio",
    oracle=r"""
    WITH toks AS (
      SELECT lang, str_split_regex(lower(trim(text)), '\s+') AS tk FROM documents
    ), grams AS (
      SELECT lang,
             list_transform(generate_series(1, len(tk) - 2),
                            i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]) AS tg
      FROM toks
    ), r AS (
      SELECT lang,
             CASE WHEN len(tg) > 0
                  THEN 1.0 - CAST(len(list_distinct(tg)) AS DOUBLE) / len(tg)
                  ELSE 0.0 END AS rep
      FROM grams
    )
    SELECT lang, COUNT(*) AS n_docs,
           ROUND(AVG(rep), 4) AS avg_rep,
           ROUND(MAX(rep), 4) AS max_rep,
           CAST(SUM(CASE WHEN rep > 0.1 THEN 1 ELSE 0 END) AS BIGINT) AS n_repetitive
    FROM r GROUP BY lang ORDER BY lang
    """,
    description="duplicate-trigram repetition filter (Gopher-style) per language",
)
def text_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition: fraction of duplicated word trigrams
    (boilerplate / keyword-stuffing / decode-loop detector). Pure JVM
    higher-order expressions over a pre-projected token array — no UDF,
    no shuffle beyond the final per-language aggregate."""
    d = load_table(spark, sf_dir, "documents")
    rep = (
        d.select("lang", tokens("text").alias("tk"))
        .select("lang", repetition_ratio("tk").alias("rep"))
    )
    return (
        rep.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("rep"), 4).alias("avg_rep"),
            F.round(F.max("rep"), 4).alias("max_rep"),
            F.sum(F.when(F.col("rep") > 0.1, 1).otherwise(0)).cast("bigint").alias("n_repetitive"),
        )
        .orderBy("lang")
    )


@query(
    "corpus_length_histogram",
    oracle="""
    SELECT lang,
           CAST(LEAST(FLOOR(n_chars / 500), 9) AS BIGINT) AS bucket,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents GROUP BY lang, bucket ORDER BY lang, bucket
    """,
    description="doc-length histogram per language (500-char buckets, capped at 9)",
)
def corpus_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length distribution per language — the sanity histogram every
    corpus build checks before/after filtering. Integer bucket math so
    the driver hash is exact; map-side combine only."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(
            "lang",
            F.least(F.floor(F.col("n_chars") / 500), F.lit(9)).cast("bigint").alias("bucket"),
            "n_chars",
        )
        .groupBy("lang", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
        .orderBy("lang", "bucket")
    )



@query(
    "multimodal_pcm_audio_decode",
    revised=17,  # r17 rewrite not in the r17 driver sample (VERDICT r17 #7)
    oracle="""
    SELECT * FROM (
      SELECT 'flac' AS codec, doc_id,
             CAST(8000 AS INT) AS sample_rate,
             CAST(3 + doc_id % 4 AS BIGINT) * 256 AS n_samples,
             ROUND(CAST((3 + doc_id % 4) * 256 AS DOUBLE) / 8000, 6) AS duration_sec,
             ROUND(sqrt(list_avg(list_transform(
               generate_series(0, CAST(3 + doc_id % 4 AS BIGINT) - 1),
               b -> CAST(((b * 53 + doc_id * 7) % 2048 - 1024) *
                         ((b * 53 + doc_id * 7) % 2048 - 1024) AS DOUBLE)))), 4) AS rms
      FROM documents
      UNION ALL
      SELECT 'wav', doc_id,
             CAST(8000 AS INT),
             CAST(400 + doc_id % 100 AS BIGINT),
             ROUND(CAST(400 + doc_id % 100 AS DOUBLE) / 8000, 6),
             ROUND(sqrt(list_avg(list_transform(
               generate_series(0, CAST(400 + doc_id % 100 AS BIGINT) - 1),
               i -> CAST(((i * 37 + doc_id * 11) % 2048 - 1024) *
                         ((i * 37 + doc_id * 11) % 2048 - 1024) AS DOUBLE)))), 4)
      FROM documents
    ) ORDER BY codec, doc_id
    """,
    description=(
        "composite REAL PCM-audio gate (r9 fold of the wav/flac decode "
        "gates): RIFF/PCM16 chunk-walk + FLAC frame/subframe/Rice parse "
        "per doc, rate/frames/duration/RMS exact against the analytic "
        "oracle, labeled per codec"
    ),
)
def multimodal_pcm_audio_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One gate, two real audio decoders: synthesized 16-bit mono WAVs
    (sample i = (i*37 + doc_id*11) % 2048 - 1024) through the numpy
    RIFF parser, and spec-valid constant-block FLACs (block b at
    (b*53 + doc_id*7) % 2048 - 1024, lossless => bit-exact) through
    operators/flac.py.  Fixed-predictor + Rice and stereo paths stay
    pinned by tests/test_flac.py."""
    from collections.abc import Iterator

    import pandas as pd

    from strawboat_spark.operators.flac import decode_flac, encode_flac_constant
    from strawboat_spark.operators.multimodal import decode_wav, synthesize_wav_bytes

    d = _spread_ids(load_table(spark, sf_dir, "documents").select("doc_id"))

    def synth_decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["doc_id"]:
                did = int(i)
                nb = 3 + did % 4
                vals = [(b * 53 + did * 7) % 2048 - 1024 for b in range(nb)]
                rate, n, dur, rms = decode_flac(
                    encode_flac_constant(vals, sample_rate=8000, block_size=256)
                )
                rows.append(("flac", did, rate, n, dur, rms))
                wav = synthesize_wav_bytes(did, 400 + did % 100)
                rate, n, dur, rms = decode_wav(wav)
                rows.append(("wav", did, rate, n, dur, rms))
            yield pd.DataFrame(
                rows,
                columns=["codec", "doc_id", "sample_rate", "n_samples", "duration_sec", "rms"],
            )

    return d.mapInPandas(
        synth_decode,
        schema="codec string, doc_id long, sample_rate int, n_samples long, "
        "duration_sec double, rms double",
    ).orderBy("codec", "doc_id")


@query(
    "multimodal_mp3_frames",
    oracle="""
    WITH dims AS (
      SELECT doc_id,
             CAST(20 + doc_id % 30 AS BIGINT) AS nf,
             [44100, 48000, 32000][CAST(doc_id % 3 AS INT) + 1] AS sr
      FROM documents
    ), per AS (
      SELECT doc_id, nf, sr,
        list_transform(generate_series(0, nf - 1),
          i -> [0,32,40,48,56,64,80,96,112,128,160,192,224,256,320]
               [CAST(1 + (doc_id * 7 + i * 13) % 14 AS INT) + 1]) AS kbps,
        list_transform(generate_series(0, nf - 1),
          i -> (doc_id + i) % 2) AS pads
      FROM dims
    )
    SELECT doc_id,
           CAST(sr AS INT) AS sample_rate,
           nf AS n_frames,
           CAST(nf * 1152 AS BIGINT) AS n_samples,
           -- scale-0 quantization at 1e-6 (cross-engine ROUND convention)
           CAST(ROUND(CAST(nf * 1152 AS DOUBLE) * 1000000 / sr) AS BIGINT)
             / 1000000.0 AS duration_sec,
           CAST(ROUND(CAST(list_sum(kbps) * 1000 AS DOUBLE) / nf) AS BIGINT)
             / 1000.0 AS mean_kbps,
           -- frame_size = 144000*kbps//sr + pad INCLUDES the 4-byte header
           CAST(list_sum(list_transform(generate_series(0, CAST(nf AS INT) - 1),
                  i -> (144000 * kbps[i + 1]) // sr + pads[i + 1]))
                + CASE WHEN doc_id % 4 = 0 THEN 47 ELSE 0 END
             AS BIGINT) AS n_bytes
    FROM per ORDER BY doc_id
    """,
    description=(
        "REAL MP3 frame-level parse: synthesized spec-valid MPEG-1 "
        "Layer III VBR streams (ID3v2 on every 4th doc) through the "
        "sync-walk parser — frame count, duration and VBR mean bitrate "
        "replayed analytically. PCM decode stays the documented seam "
        "(COVERAGE.md: float IMDCT is not exactly oracle-able)"
    ),
)
def multimodal_mp3_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MP3 seam, closed at its deterministic surface: executors
    synthesize valid Layer III VBR streams (frame i bitrate index
    1 + (doc_id*7 + i*13) % 14, padding (doc_id+i) % 2, rate table by
    doc_id % 3) and the sync-walking parser (operators/mp3.py) recovers
    rate/frames/duration/mean-bitrate/bytes, which DuckDB reproduces
    from the same closed-form parameters.  Malformed-stream rejection
    is pinned by tests/test_mp3.py."""
    from collections.abc import Iterator

    import pandas as pd

    from strawboat_spark.operators.mp3 import parse_mp3, synthesize_mp3_bytes

    d = _spread_ids(load_table(spark, sf_dir, "documents").select("doc_id"))

    def synth_parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["doc_id"]:
                did = int(i)
                wire = synthesize_mp3_bytes(
                    did, 20 + did % 30, with_id3=(did % 4 == 0)
                )
                rate, nf, ns, dur, kbps, nb = parse_mp3(wire)
                rows.append((did, rate, nf, ns, dur, kbps, nb))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "sample_rate", "n_frames", "n_samples",
                    "duration_sec", "mean_kbps", "n_bytes",
                ],
            )

    return d.mapInPandas(
        synth_parse,
        schema=(
            "doc_id long, sample_rate int, n_frames long, n_samples long, "
            "duration_sec double, mean_kbps double, n_bytes long"
        ),
    ).orderBy("doc_id")


@query(
    "shards_tar_members",
    revised=17,  # r17 rewrite not in the r17 driver sample (VERDICT r17 #7)
    oracle="""
    WITH shards AS (
      SELECT doc_id, CAST(2 + doc_id % 3 AS BIGINT) AS n_samples FROM documents
    ), samples AS (
      SELECT doc_id, CAST(unnest(generate_series(0, n_samples - 1)) AS BIGINT) AS s
      FROM shards
    ), members AS (
      SELECT doc_id AS shard_id,
             printf('%06d-%04d.bin', doc_id, s) AS member_name,
             CAST(64 + (s * 7) % 32 AS BIGINT) AS member_size,
             list_sum(list_transform(
               generate_series(0, 64 + (s * 7) % 32 - 1),
               j -> (j * 19 + doc_id + s) % 256)) AS bin_sum,
             CAST(NULL AS VARCHAR) AS txt_content
      FROM samples
      UNION ALL
      SELECT doc_id,
             printf('%06d-%04d.txt', doc_id, s),
             CAST(length(printf('doc-%d-%d', doc_id, s)) AS BIGINT),
             CAST(NULL AS BIGINT),
             printf('doc-%d-%d', doc_id, s)
      FROM samples
    )
    SELECT shard_id, member_name, member_size,
           CAST(bin_sum AS BIGINT) AS bin_sum, txt_content
    FROM members ORDER BY shard_id, member_name
    """,
    description="WebDataset tar shards: explode members relationally (stdlib tarfile), exact oracle",
)
def shards_tar_members(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training corpora ship as tar shards (WebDataset). Executors
    synthesize a deterministic ustar shard per doc (2 members per
    sample: .bin with formula bytes, .txt with a known string), the
    stdlib-tarfile explode fans members out into rows, and DuckDB
    re-derives names, sizes, byte sums and text analytically. Half the
    shards go through the gzip path (tarfile `r:*` sniffing)."""
    from collections.abc import Iterator

    import pandas as pd

    from strawboat_spark.operators.shards import explode_tar_members, synthesize_tar_bytes

    d = _spread_ids(load_table(spark, sf_dir, "documents").select("doc_id"))

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["doc_id"]
            payloads = [
                synthesize_tar_bytes(int(i), 2 + int(i) % 3, compress=bool(int(i) % 2))
                for i in ids
            ]
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    shards = d.mapInPandas(synth, schema="doc_id long, payload binary")
    members = explode_tar_members(shards, "doc_id", "payload")

    # no type hints: llm.py uses postponed annotations, and pyspark
    # cannot resolve the stringified `pd.Series` hint for a UDF defined
    # inside a function (pd is not in module globals)
    def _byte_sum(b):
        import numpy as np

        return b.map(
            lambda x: int(np.frombuffer(x, dtype=np.uint8).sum(dtype=np.int64))
        )

    byte_sum = F.pandas_udf(_byte_sum, "long")

    return members.select(
        "shard_id",
        "member_name",
        "member_size",
        F.when(F.col("member_name").endswith(".bin"), byte_sum("member_bytes")).alias(
            "bin_sum"
        ),
        F.when(
            F.col("member_name").endswith(".txt"),
            F.col("member_bytes").cast("string"),
        ).alias("txt_content"),
    ).orderBy("shard_id", "member_name")


@query(
    "shards_webdataset_group",
    revised=17,  # r17 rewrite not in the r17 driver sample (VERDICT r17 #7)
    oracle="""
    WITH shards AS (
      SELECT doc_id, CAST(2 + doc_id % 3 AS BIGINT) AS n_samples FROM documents
    )
    SELECT doc_id AS shard_id,
           printf('%06d-%04d', doc_id, CAST(unnest(generate_series(0, n_samples - 1)) AS BIGINT)) AS sample_key,
           CAST(2 AS BIGINT) AS n_parts,
           'bin,txt' AS exts
    FROM shards ORDER BY shard_id, sample_key
    """,
    description="WebDataset sample regrouping: members -> one row per key with ext->bytes map",
)
def shards_webdataset_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regroups exploded members into training samples by key prefix
    (map_from_entries over groupBy — JVM-side after the explode). The
    oracle pins sample keys, part counts and the sorted extension set;
    byte-level parity is already pinned by shards_tar_members."""
    from collections.abc import Iterator

    import pandas as pd

    from strawboat_spark.operators.shards import (
        explode_tar_members,
        group_webdataset_samples,
        synthesize_tar_bytes,
    )

    d = _spread_ids(load_table(spark, sf_dir, "documents").select("doc_id"))

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["doc_id"]
            payloads = [synthesize_tar_bytes(int(i), 2 + int(i) % 3) for i in ids]
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    shards = d.mapInPandas(synth, schema="doc_id long, payload binary")
    grouped = group_webdataset_samples(explode_tar_members(shards, "doc_id", "payload"))
    return grouped.select(
        "shard_id",
        "sample_key",
        "n_parts",
        F.array_join(F.array_sort(F.map_keys("parts")), ",").alias("exts"),
    ).orderBy("shard_id", "sample_key")



@query(
    "text_tfidf_keywords",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             unnest(string_split_regex(lower(trim(text)), '\\s+')) AS term
      FROM documents
    ), tf AS (
      SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
      FROM toks WHERE term <> '' GROUP BY doc_id, term
    ), docfreq AS (
      SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term
    ), n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term,
             -- scale-0 quantization (cross-engine ROUND stability)
             CAST(ROUND(tf.tf * (LN((n.n + 1.0) / (docfreq.df + 1.0)) + 1.0)
                        * 10000) AS BIGINT) / 10000.0 AS tfidf
      FROM tf, docfreq, n WHERE tf.term = docfreq.term
    ), ranked AS (
      SELECT doc_id, term, tfidf,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY doc_id ORDER BY tfidf DESC, term) AS INT) AS rank
      FROM scored
    )
    SELECT doc_id, rank, term, tfidf FROM ranked WHERE rank <= 3
    ORDER BY doc_id, rank
    """,
    description=(
        "TF-IDF keyword extraction: top-3 terms per document with smoothed "
        "idf (scikit-learn formula). df is a groupBy + skew-splittable join "
        "on term, NOT a per-term window — stopword partitions can't be split "
        "by AQE under a window, so the window formulation dies at corpus "
        "scale. Deterministic tiebreak (tfidf desc, term asc)"
    ),
)
def text_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    from strawboat_spark.operators.ranking import top_keywords

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return top_keywords(d, "doc_id", "text", k=3).orderBy("doc_id", "rank")


@query(
    "text_bm25_search",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             unnest(string_split_regex(lower(trim(text)), '\\s+')) AS term
      FROM documents
    ), toks2 AS (SELECT * FROM toks WHERE term <> ''),
    dl AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM toks2 GROUP BY doc_id
    ), avgdl AS (SELECT AVG(dl) AS avgdl FROM dl),
    qtf AS (
      SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
      FROM toks2 WHERE term IN ('filter', 'join', 'window')
      GROUP BY doc_id, term
    ), docfreq AS (
      SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM qtf GROUP BY term
    ), n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents)
    SELECT qtf.doc_id,
           ROUND(SUM(LN((n.n - docfreq.df + 0.5) / (docfreq.df + 0.5) + 1.0)
                     * qtf.tf * 2.2
                     / (qtf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / avgdl.avgdl))),
                 4) AS score
    FROM qtf, docfreq, dl, avgdl, n
    WHERE qtf.term = docfreq.term AND qtf.doc_id = dl.doc_id
    GROUP BY qtf.doc_id
    ORDER BY score DESC, qtf.doc_id
    LIMIT 20
    """,
    description=(
        "Okapi BM25 retrieval (k1=1.2, b=0.75): top-20 documents for a "
        "3-term query. The exploded term stream filters to the query "
        "vocabulary BEFORE any shuffle, so the per-query df table is "
        "bounded and broadcast; dl/avgdl come from unfiltered counts"
    ),
)
def text_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from strawboat_spark.operators.ranking import bm25

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return (
        bm25(d, "doc_id", "text", ["filter", "join", "window"])
        .orderBy(F.desc("score"), "doc_id")
        .limit(20)
    )



_G711_ORACLE = """
    WITH dims AS (
      SELECT doc_id, CAST(300 + doc_id % 150 AS BIGINT) AS n_samples
      FROM documents
    ), decoded AS (
      SELECT doc_id, n_samples,
             list_transform(
               generate_series(0, n_samples - 1),
               i -> CAST((CASE WHEN (255 - (i * 7 + doc_id) % 256) >= 128
                          THEN 132 - (((255 - (i * 7 + doc_id) % 256) % 16) * 8 + 132)
                               * (1 << (((255 - (i * 7 + doc_id) % 256) // 16) % 8))
                          ELSE (((255 - (i * 7 + doc_id) % 256) % 16) * 8 + 132)
                               * (1 << (((255 - (i * 7 + doc_id) % 256) // 16) % 8))
                               - 132
                          END) AS DOUBLE)) AS samples
      FROM dims
    )
    SELECT doc_id,
           CAST(8000 AS INT) AS sample_rate,
           n_samples,
           ROUND(sqrt(list_avg(list_transform(samples, s -> s * s))), 4) AS rms
    FROM decoded ORDER BY doc_id
    """


def multimodal_g711_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G.711 gate: executors synthesize μ-law WAVs (code byte i =
    (i*7 + doc_id) % 256), decode_wav dispatches format tag 7 through
    operators/g711.py's vectorized expansion, and DuckDB recomputes
    every decoded sample from the bit-field formula — the decode is
    pure integer arithmetic, so the oracle is exact to the LSB.
    Member of the multimodal_telephony_codecs composite (r14 fold)."""
    from collections.abc import Iterator

    import pandas as pd

    from strawboat_spark.operators.multimodal import (
        decode_wav,
        synthesize_g711_wav_bytes,
    )

    d = _spread_ids(load_table(spark, sf_dir, "documents").select("doc_id"))

    def synth_decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["doc_id"]:
                did = int(i)
                wav = synthesize_g711_wav_bytes(did, 300 + did % 150, "ulaw")
                rate, n, _dur, rms = decode_wav(wav)
                rows.append((did, rate, n, rms))
            yield pd.DataFrame(rows, columns=["doc_id", "sample_rate", "n_samples", "rms"])

    return d.mapInPandas(
        synth_decode,
        schema="doc_id long, sample_rate int, n_samples long, rms double",
    ).orderBy("doc_id")



@query(
    "text_compression_ratio",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           TRUE AS all_positive, TRUE AS all_below_cap
    FROM documents
    """,
    description=(
        "zlib information-density signal (Gopher/RefinedWeb quality rule): "
        "per-doc compressed/raw ratio, Arrow-batched. No SQL zlib twin, so "
        "the gate verifies the doc count exactly plus range invariants "
        "(every ratio in (0, 1.2]); the signal's direction is pinned by a "
        "unit test on constructed repetitive vs random text"
    ),
)
def text_compression_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    from strawboat_spark.operators.corpus import with_compression_ratio

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    r = with_compression_ratio(d, "text")
    return r.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min(F.col("zlib_ratio") > 0.0).alias("all_positive"),
        F.min(F.col("zlib_ratio") <= 1.2).alias("all_below_cap"),
    )


@query(
    "dedup_exact_substrings",
    oracle="""
    WITH grams AS (
      SELECT doc_id, text,
             unnest(generate_series(1, greatest(length(text) - 29, 0))) AS pos
      FROM documents
    ), g2 AS (SELECT doc_id, text, pos, substr(text, pos, 30) AS g FROM grams),
    dup AS (SELECT g FROM g2 GROUP BY g HAVING COUNT(*) > 1),
    spans AS (
      SELECT doc_id, text, pos AS s, pos + 30 AS e FROM g2 JOIN dup USING (g)
    ), flagged AS (
      SELECT doc_id, text, s, e,
             CASE WHEN s > COALESCE(MAX(e) OVER (
                    PARTITION BY doc_id ORDER BY s
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  THEN 1 ELSE 0 END AS brk
      FROM spans
    ), islands AS (
      SELECT doc_id, text, s, e,
             SUM(brk) OVER (PARTITION BY doc_id ORDER BY s
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS island
      FROM flagged
    ), merged AS (
      SELECT doc_id, text, island, MIN(s) AS s, MAX(e) AS e
      FROM islands GROUP BY doc_id, text, island
    ), pieces AS (
      SELECT doc_id, s,
             substr(text,
                    COALESCE(LAG(e) OVER (PARTITION BY doc_id ORDER BY s), 1),
                    s - COALESCE(LAG(e) OVER (PARTITION BY doc_id ORDER BY s), 1))
               AS piece
      FROM merged
      UNION ALL
      SELECT doc_id, 2147483647 AS s, substr(text, MAX(e)) AS piece
      FROM merged GROUP BY doc_id, text
    ), spliced AS (
      SELECT doc_id, STRING_AGG(piece, '' ORDER BY s) AS kept FROM pieces
      GROUP BY doc_id
    ), stats AS (
      SELECT doc_id, CAST(COUNT(*) AS INT) AS n_spans,
             CAST(SUM(e - s) AS INT) AS removed_chars
      FROM merged GROUP BY doc_id
    )
    SELECT d.doc_id,
           COALESCE(st.n_spans, 0) AS n_spans,
           COALESCE(st.removed_chars, 0) AS removed_chars,
           CAST(length(COALESCE(sp.kept, d.text)) AS INT) AS kept_len,
           md5(COALESCE(sp.kept, d.text)) AS kept_hash
    FROM documents d
    LEFT JOIN stats st USING (doc_id)
    LEFT JOIN spliced sp USING (doc_id)
    ORDER BY d.doc_id
    """,
    description=(
        "exact-substring dedup (Lee et al. treatment, char-30-gram "
        "formulation): every substring occurring twice anywhere in the "
        "corpus is cut from every document, overlapping cuts merged "
        "(gaps-and-islands) before splicing — the spliced text is "
        "hash-verified per document (md5) against the full SQL replay; "
        "one corpus shuffle on the gram, one window per doc, JVM fold "
        "splice, no Python"
    ),
)
def dedup_exact_substrings(spark: SparkSession, sf_dir: str) -> DataFrame:
    from strawboat_spark.operators.dedup import remove_duplicate_substrings

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return (
        remove_duplicate_substrings(d, "doc_id", "text", k=30)
        .select("doc_id", "n_spans", "removed_chars", "kept_len", "kept_hash")
        .orderBy("doc_id")
    )


def _adpcm_oracle() -> str:
    from strawboat_spark.operators.adpcm import ima_oracle_sql_fragment

    frag = ima_oracle_sql_fragment(64)
    return f"""
    SELECT doc_id,
           CAST(8000 AS INT) AS sample_rate,
           CAST(65 AS BIGINT) AS n_samples,
           ROUND((({frag}).s + ({frag}).p) / 65.0, 4) AS mean_sample
    FROM documents ORDER BY doc_id
    """


def multimodal_adpcm_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Member of the multimodal_telephony_codecs composite (r14 fold).

    IMA ADPCM gate: executors synthesize one-block fmt-0x11 WAVs
    (code k = (k*7 + doc_id) % 16, predictor/index 0), decode them with
    operators/adpcm.py's block decoder (dispatched through decode_wav's
    format-tag switch like G.711), and DuckDB replays the identical
    quantizer state machine with a list_reduce struct fold — the codec
    is pure integer arithmetic, so the oracle is exact. IMA blocks are
    self-contained (every block header carries predictor+index), which
    is the 100 TB story: a corpus of ADPCM audio decodes block-parallel
    inside Arrow batches with no cross-block or cross-row state."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    from strawboat_spark.operators.adpcm import (
        decode_ima_wav,
        synthesize_ima_wav_bytes,
    )

    d = _spread_ids(load_table(spark, sf_dir, "documents").select("doc_id"))

    def synth_decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["doc_id"]:
                did = int(i)
                rate, samples = decode_ima_wav(synthesize_ima_wav_bytes(did, 64))
                mean = round(float(samples.astype(np.int64).sum()) / len(samples), 4)
                rows.append((did, rate, len(samples), mean))
            yield pd.DataFrame(
                rows, columns=["doc_id", "sample_rate", "n_samples", "mean_sample"]
            )

    return d.mapInPandas(
        synth_decode,
        schema="doc_id long, sample_rate int, n_samples long, mean_sample double",
    ).orderBy("doc_id")


@query(
    "multimodal_telephony_codecs",
    revised=18,  # r18 single-stage fuse of the two telephony legs
    oracle=f"""
    SELECT * FROM (
      SELECT 'adpcm' AS codec, doc_id, sample_rate, n_samples,
             mean_sample AS metric
      FROM ({_adpcm_oracle()})
      UNION ALL
      SELECT 'g711' AS codec, doc_id, sample_rate, n_samples,
             rms AS metric
      FROM ({_G711_ORACLE})
    ) ORDER BY codec, doc_id
    """,
    description=(
        "composite telephony-codec gate (r14 fold of "
        "multimodal_adpcm_decode + multimodal_g711_decode): REAL IMA "
        "ADPCM (WAV fmt 0x11, 89-step predictor state machine replayed "
        "in SQL via list_reduce) and G.711 mu-law (fmt 7, "
        "complement/segment/mantissa bit arithmetic in SQL) — both "
        "pure-integer codecs, exact to the LSB, labeled per codec"
    ),
)
def multimodal_telephony_codecs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One gate, both telephony decoders; `metric` is the member's
    headline statistic (adpcm: mean_sample, g711: rms). A red row's
    `codec` column names the broken member; per-member mechanics stay
    pinned by tests/test_adpcm.py and operators/g711.py's unit tests.

    r18 opt (guide §1.2/§4.1, same fuse as the image gates): the
    composite used to UNION the two member plans — two scans, two
    spread exchanges, two mapInPandas stages, two member sorts, all
    run twice by the final orderBy's sampling pass — while the actual
    codec CPU for both members is ~0.14 s per 500 docs (profiled
    offline). One mapInPandas now emits both codecs' rows per doc;
    per-row arithmetic is copied verbatim from the members (which stay
    registered and individually gated). Rows/dtypes identical."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    from strawboat_spark.operators.adpcm import (
        decode_ima_wav,
        synthesize_ima_wav_bytes,
    )
    from strawboat_spark.operators.multimodal import (
        decode_wav,
        synthesize_g711_wav_bytes,
    )

    d = _spread_ids(load_table(spark, sf_dir, "documents").select("doc_id"))

    def synth_decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["doc_id"]:
                did = int(i)
                rate, samples = decode_ima_wav(synthesize_ima_wav_bytes(did, 64))
                mean = round(float(samples.astype(np.int64).sum()) / len(samples), 4)
                rows.append(("adpcm", did, rate, len(samples), mean))
                wav = synthesize_g711_wav_bytes(did, 300 + did % 150, "ulaw")
                grate, n, _dur, rms = decode_wav(wav)
                rows.append(("g711", did, grate, n, rms))
            yield pd.DataFrame(
                rows, columns=["codec", "doc_id", "sample_rate", "n_samples", "metric"]
            )

    return d.mapInPandas(
        synth_decode,
        schema="codec string, doc_id long, sample_rate int, n_samples long, metric double",
    ).orderBy("codec", "doc_id")



@query(
    "text_heavy_hitter_tokens",
    oracle="""
    WITH toks AS (
      SELECT unnest(regexp_extract_all(lower(trim(text)), '\\S+')) AS token
      FROM documents
    ), tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM toks)
    SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM toks, tot
    GROUP BY token, tot.n
    HAVING COUNT(*) * 100 >= tot.n
    ORDER BY cnt DESC, token
    """,
    description=(
        "exact two-pass heavy hitters (Misra-Gries candidates -> "
        "broadcast recount): tokens covering >= 1% of all occurrences"
    ),
)
def text_heavy_hitter_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter tokens via operators/sketches.py: per-partition
    Misra-Gries summaries (bounded k rows/partition — the full
    token-cardinality shuffle never happens), certified candidate
    superset, exact broadcast recount with an integer-rational
    threshold. The result is EXACT, so a sketch-based plan still
    hash-matches the plain GROUP BY/HAVING oracle."""
    from strawboat_spark.functions.text import tokens
    from strawboat_spark.operators.sketches import heavy_hitters

    d = load_table(spark, sf_dir, "documents")
    toks = d.select(F.explode(tokens("text")).alias("token")).filter(
        F.col("token") != ""
    )
    return heavy_hitters(toks, "token", 1, 100)


@query(
    "dedup_edit_distance",
    oracle="""
    WITH k AS (
      SELECT doc_id,
             substring(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), 1, 32) AS key
      FROM documents
    ), b AS (
      SELECT doc_id, key, substring(key, 1, 6) AS blk, len(key) AS l FROM k
    )
    SELECT a.doc_id AS id_a, c.doc_id AS id_b,
           CAST(levenshtein(a.key, c.key) AS INT) AS distance
    FROM b a JOIN b c
      ON a.blk = c.blk AND a.doc_id < c.doc_id AND abs(a.l - c.l) <= 2
    WHERE levenshtein(a.key, c.key) <= 4
    ORDER BY id_a, id_b
    """,
    description=(
        "character-level near-dup: prefix-blocked + length-banded "
        "exact Levenshtein pairs (JVM builtin, candidates only) — the "
        "typo/OCR similarity the token-level signatures miss"
    ),
)
def dedup_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from strawboat_spark.operators.dedup import edit_distance_pairs

    d = load_table(spark, sf_dir, "documents")
    return edit_distance_pairs(d, "doc_id", "text")



@query(
    "graph_triangle_counts",
    oracle="""
    WITH po AS (
      -- set semantics: one pair per order, regardless of how many
      -- lineitems each supplier has in it
      SELECT DISTINCT a.l_orderkey AS o, a.l_suppkey AS src, b.l_suppkey AS dst
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
    ), p AS (
      SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS weight
      FROM po GROUP BY 1, 2
    ), e AS (SELECT src, dst FROM p WHERE weight >= 30),
    tri AS (
      SELECT ab.src AS a, ab.dst AS b, bc.dst AS c
      FROM e ab JOIN e bc ON ab.dst = bc.src
      JOIN e ac ON ac.src = ab.src AND ac.dst = bc.dst
    ), nodes AS (
      SELECT a AS node FROM tri
      UNION ALL SELECT b FROM tri
      UNION ALL SELECT c FROM tri
    )
    SELECT node, CAST(COUNT(*) AS BIGINT) AS n_triangles
    FROM nodes GROUP BY node ORDER BY node
    """,
    description=(
        "triangle counting on the supplier co-occurrence graph "
        "(edge = >= 30 shared orders): single-shuffle bounded pair "
        "expansion + degree-ordered orientation (wedge fan-out bounded "
        "by arboricity, not hub degree) — exact oracle replays the "
        "orientation-invariant counts id-oriented"
    ),
)
def graph_triangle_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-supplier triangle participation in the >= 30-shared-orders
    co-occurrence graph. Edge building expands pairs inside each
    order's collected item array (one shuffle, group size bounded) —
    NOT a lineitem self-join; the triangle join then runs entirely on
    the thin edge list. Complements pagerank + connected components
    with the clustering-structure metric."""
    from strawboat_spark.operators.graph import cooccurrence_edges, triangle_counts

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    edges = cooccurrence_edges(li, "l_orderkey", "l_suppkey", min_weight=30)
    return triangle_counts(edges).withColumnRenamed("node", "node").orderBy("node")


@query(
    "corpus_stratified_sample",
    oracle="""
    SELECT lang, doc_id, sample_rank FROM (
      SELECT lang, doc_id,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY md5('s1:' || CAST(doc_id AS VARCHAR)), doc_id
             ) AS BIGINT) AS sample_rank
      FROM documents
    ) WHERE sample_rank <= 10
    ORDER BY lang, sample_rank
    """,
    description=(
        "deterministic stratified sampling: uniform 10-per-language "
        "sample via md5 ranking — reproducible across runs/engines/"
        "task retries, exact oracle"
    ),
)
def corpus_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uniform k=10 sample per language, hash-ranked (random-oracle
    uniform, but deterministic — no rand(), so task retries and
    re-runs select identical rows). WindowGroupLimit pushes the
    rank<=k cut into the per-stratum sort."""
    from strawboat_spark.operators.corpus import stratified_sample_k

    d = load_table(spark, sf_dir, "documents")
    return (
        stratified_sample_k(d, "lang", "doc_id", 10)
        .select("lang", "doc_id", "sample_rank")
        .orderBy("lang", "sample_rank")
    )


@query(
    "events_transition_matrix",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS prev_type
      FROM events
    )
    SELECT prev_type, event_type AS next_type,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM seq WHERE prev_type IS NOT NULL
    GROUP BY prev_type, next_type
    ORDER BY prev_type, next_type
    """,
    description=(
        "behavioral transition matrix: per-user consecutive event-type "
        "bigram counts (one lag window per user, deterministic "
        "(ts, event_id) ordering) — exact oracle"
    ),
)
def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov-style transition counts over per-user event sequences:
    one lag window partitioned by user (the sessionize/funnel shuffle
    key, reusable), then a global bigram aggregation. Deterministic
    within-timestamp ordering via the event_id tiebreak on both
    engines."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("prev_type", "next_type")
    )


@query(
    "events_scd2_history",
    oracle="""
    WITH obs AS (
      SELECT user_id, epoch_us(ts) AS t, event_id, event_type
      FROM events WHERE user_id < 30
    ), flagged AS (
      SELECT user_id, t, event_id, event_type,
             LAG(event_type) OVER w AS prev_type,
             ROW_NUMBER() OVER w AS rn
      FROM obs
      WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)
    ), starts AS (
      SELECT user_id, t, event_id, event_type
      FROM flagged
      WHERE rn = 1 OR NOT (event_type IS NOT DISTINCT FROM prev_type)
    )
    SELECT user_id,
           CAST(ROW_NUMBER() OVER w2 AS BIGINT) AS ver,
           event_type,
           t AS valid_from_us,
           LEAD(t) OVER w2 AS valid_to_us,
           LEAD(t) OVER w2 IS NULL AS is_current
    FROM starts
    WINDOW w2 AS (PARTITION BY user_id ORDER BY t, event_id)
    ORDER BY user_id, ver
    """,
    description=(
        "SCD type-2 dimension history from the event stream: per-user "
        "attribute runs become versioned validity intervals "
        "[valid_from, valid_to) with is_current — one key shuffle, "
        "change-detect lag + interval-close lead over change rows only"
    ),
)
def events_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/scd.py scd2_history over the events of 30 users:
    null-safe change detection, deterministic (ts, event_id) tiebreak,
    integer-microsecond validity bounds (exact across engines)."""
    from strawboat_spark.operators.scd import scd2_history

    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 30)
    return scd2_history(e, "user_id", "ts", "event_type", tiebreak_col="event_id").orderBy(
        "user_id", "ver"
    )


@query(
    "text_lm_perplexity",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_filter(regexp_extract_all(lower(trim(text)), '\\S+'),
                         t -> t != '') AS l
      FROM documents
    ), bi AS (
      SELECT doc_id,
             unnest(list_transform(generate_series(1, len(l) - 1),
                    i -> {'w1': l[i], 'w2': l[i + 1]})) AS p
      FROM toks WHERE len(l) >= 2
    ), b AS (SELECT doc_id, p.w1 AS w1, p.w2 AS w2 FROM bi),
    bc AS (SELECT w1, w2, COUNT(*) AS c12 FROM b GROUP BY 1, 2),
    u AS (SELECT unnest(l) AS w1 FROM toks),
    uc AS (SELECT w1, COUNT(*) AS c1 FROM u GROUP BY 1),
    v AS (SELECT CAST(COUNT(*) AS BIGINT) AS V FROM uc)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           ROUND(AVG(LN(CAST(c12 + 1 AS DOUBLE) / CAST(c1 + V AS DOUBLE))), 4)
             AS avg_logprob
    FROM b JOIN bc USING (w1, w2) JOIN uc USING (w1) CROSS JOIN v
    GROUP BY doc_id ORDER BY doc_id
    """,
    description=(
        "corpus-LM perplexity quality signal: per-doc mean log P(w2|w1) "
        "under the corpus's own Laplace-smoothed bigram model (count "
        "tables as DataFrames, AQE-splittable joins) — exact oracle"
    ),
)
def text_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity filtering signal: train the bigram model
    on the corpus itself (two groupBy count tables + a vocab scalar),
    score every doc by mean log-prob through skew-splittable joins —
    no driver-side model object at any scale."""
    from strawboat_spark.operators.lm import bigram_lm_scores

    d = load_table(spark, sf_dir, "documents")
    return bigram_lm_scores(d, "doc_id", "text").orderBy("doc_id")



@query(
    "text_rag_chunks",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_filter(regexp_extract_all(lower(trim(text)), '\\S+'),
                         t -> t != '') AS l
      FROM documents
    ), chunks AS (
      SELECT doc_id,
             unnest(list_transform(
               generate_series(0, CAST(FLOOR((len(l) - 1) / 48) AS BIGINT)),
               k -> {'chunk_idx': CAST(k AS INT),
                     'chunk': list_slice(l, k * 48 + 1, k * 48 + 64)}
             )) AS c
      FROM toks WHERE len(l) > 0
    )
    SELECT doc_id, c.chunk_idx AS chunk_idx,
           CAST(len(c.chunk) AS INT) AS n_tokens,
           md5(array_to_string(c.chunk, ' ')) AS chunk_fp
    FROM chunks ORDER BY doc_id, chunk_idx
    """,
    description=(
        "RAG chunking: overlapping 64-token windows (stride 48), "
        "map-only JVM HOFs, md5 chunk fingerprints — exact oracle"
    ),
)
def text_rag_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk every document into overlapping 64-token windows with a
    16-token overlap (functions/text.py token_chunks — pure HOFs, a
    map-only stage at any scale) and fingerprint each chunk for
    downstream chunk-level dedup. Every chunk row hash-matches the SQL
    replay."""
    from strawboat_spark.functions.text import token_chunks, tokens

    d = load_table(spark, sf_dir, "documents")
    toked = d.select(
        "doc_id", F.filter(tokens("text"), lambda t: t != "").alias("__toks")
    ).filter(F.size("__toks") > 0)
    return (
        toked.select("doc_id", F.explode(token_chunks("__toks", 64, 16)).alias("c"))
        .select(
            "doc_id",
            F.col("c.chunk_idx").alias("chunk_idx"),
            F.size("c.chunk").alias("n_tokens"),
            F.md5(F.concat_ws(" ", F.col("c.chunk"))).alias("chunk_fp"),
        )
        .orderBy("doc_id", "chunk_idx")
    )


@query(
    "dedup_survivor_policy",
    oracle="""
    WITH RECURSIVE tok AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS ts FROM documents
    ), sh0 AS (
      SELECT DISTINCT doc_id,
             unnest([array_to_string(ts[CAST(i AS INT) : CAST(i AS INT) + 2], ' ')
                     for i in range(1, greatest(len(ts) - 1, 1))]) AS shingle
      FROM tok WHERE len(ts) >= 3
    ), sh AS (
      SELECT * FROM sh0 QUALIFY COUNT(*) OVER (PARTITION BY shingle) <= 1000
    ), sizes AS (
      SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
    ), pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ), edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
      WHERE n_common / (sa.n + sb.n - n_common) >= 0.5
      UNION ALL
      SELECT id_b, id_a FROM pairs
      JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
      WHERE n_common / (sa.n + sb.n - n_common) >= 0.5
    ), walk(node, reach) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT w.node, e.dst FROM walk w JOIN edges e ON w.reach = e.src
    ), comp AS (
      SELECT node AS doc_id, CAST(MIN(reach) AS BIGINT) AS component
      FROM walk GROUP BY node
    ), ranked AS (
      SELECT c.doc_id, c.component, d.n_chars,
             ROW_NUMBER() OVER (PARTITION BY c.component
                                ORDER BY d.n_chars DESC, c.doc_id) AS rk
      FROM comp c JOIN documents d USING (doc_id)
    ), best AS (
      SELECT component, doc_id AS survivor_id FROM ranked WHERE rk = 1
    )
    SELECT r.doc_id, r.component, b.survivor_id,
           r.doc_id = b.survivor_id AS is_survivor
    FROM ranked r JOIN best b USING (component)
    ORDER BY r.doc_id
    """,
    description=(
        "survivor policy over duplicate clusters: keep the longest "
        "(n_chars) member per connected component via skew-safe "
        "groupBy max_by, never a per-cluster window — exact oracle"
    ),
)
def dedup_survivor_policy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from strawboat_spark.operators.dedup import (
        connected_components,
        dedup_survivors,
    )

    d = load_table(spark, sf_dir, "documents")
    edges = ngram_jaccard_pairs(d, "text", "doc_id", shingle_n=3, threshold=0.5)
    comp = connected_components(
        d.select("doc_id"), edges, id_col="doc_id", src_col="id_a", dst_col="id_b"
    )
    return dedup_survivors(
        comp, d.select("doc_id", "n_chars"), "doc_id", "n_chars"
    ).orderBy("doc_id")


@query(
    "llm_rag_pipeline",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_filter(regexp_extract_all(lower(trim(text)), '\\S+'),
                         t -> t != '') AS l
      FROM documents
    ), bi AS (
      SELECT doc_id,
             unnest(list_transform(generate_series(1, len(l) - 1),
                    i -> {'w1': l[i], 'w2': l[i + 1]})) AS p
      FROM toks WHERE len(l) >= 2
    ), b AS (SELECT doc_id, p.w1 AS w1, p.w2 AS w2 FROM bi),
    bc AS (SELECT w1, w2, COUNT(*) AS c12 FROM b GROUP BY 1, 2),
    u AS (SELECT unnest(l) AS w1 FROM toks),
    uc AS (SELECT w1, COUNT(*) AS c1 FROM u GROUP BY 1),
    v AS (SELECT CAST(COUNT(*) AS BIGINT) AS V FROM uc),
    lm AS (
      SELECT doc_id,
             ROUND(AVG(LN(CAST(c12 + 1 AS DOUBLE) / CAST(c1 + V AS DOUBLE))), 4)
               AS avg_logprob
      FROM b JOIN bc USING (w1, w2) JOIN uc USING (w1) CROSS JOIN v
      GROUP BY doc_id
    ), kept AS (
      SELECT t.doc_id, t.l, d.lang
      FROM toks t JOIN lm USING (doc_id) JOIN documents d USING (doc_id)
      WHERE lm.avg_logprob >= -7.0
    ), chunks AS (
      SELECT doc_id, lang,
             unnest(list_transform(
               generate_series(0, CAST(FLOOR((len(l) - 1) / 48) AS BIGINT)),
               k -> md5(array_to_string(list_slice(l, k * 48 + 1, k * 48 + 64), ' '))
             )) AS chunk_fp
      FROM kept WHERE len(l) > 0
    )
    SELECT lang,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs_kept,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(COUNT(DISTINCT chunk_fp) AS BIGINT) AS n_unique_chunks
    FROM chunks GROUP BY lang ORDER BY lang
    """,
    description=(
        "end-to-end RAG prep composition: corpus-LM perplexity filter "
        "-> overlapping chunking -> chunk-fingerprint dedup stats, all "
        "from the proven building blocks — exact oracle over the whole "
        "composition"
    ),
)
def llm_rag_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composition gate: documents scored by the corpus's own bigram
    LM (operators/lm.py), the atypical tail dropped (avg_logprob >=
    -7.0 on the rounded score — identical doubles both engines),
    survivors chunked into overlapping 64/16 windows
    (functions/text.py) and fingerprinted, then per-language corpus
    stats with chunk-level dedup counts. Each stage is individually
    gated; this pins the COMPOSITION."""
    from strawboat_spark.functions.text import token_chunks, tokens
    from strawboat_spark.operators.lm import bigram_lm_scores

    d = load_table(spark, sf_dir, "documents")
    lm = bigram_lm_scores(d, "doc_id", "text").filter(F.col("avg_logprob") >= -7.0)
    kept = d.join(lm.select("doc_id"), "doc_id").select(
        "doc_id", "lang", F.filter(tokens("text"), lambda t: t != "").alias("__toks")
    ).filter(F.size("__toks") > 0)
    chunks = kept.select(
        "doc_id",
        "lang",
        F.explode(token_chunks("__toks", 64, 16)).alias("c"),
    ).select(
        "doc_id", "lang", F.md5(F.concat_ws(" ", F.col("c.chunk"))).alias("chunk_fp")
    )
    return (
        chunks.groupBy("lang")
        .agg(
            F.countDistinct("doc_id").alias("n_docs_kept"),
            F.count(F.lit(1)).alias("n_chunks"),
            F.countDistinct("chunk_fp").alias("n_unique_chunks"),
        )
        .orderBy("lang")
    )
