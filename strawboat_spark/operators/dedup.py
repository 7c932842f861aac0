"""Deduplication operators for LLM training-data pipelines
(SURVEY.md §2C ⊕ dedup). Every operator is DataFrame -> DataFrame and
scales by construction: no driver-side materialization, no all-pairs
comparison — candidate generation always goes through a groupBy/join
on a bounded key (fingerprint, LSH band, shared shingle).

Shuffle inventory at 100 TB (the thing to audit before running wide):
  exact_dedup          1 shuffle on fingerprint
  minhash_signatures   1 shuffle (explode shingles -> groupBy doc)
  lsh_candidate_pairs  +1 shuffle on (band, band_hash); bucket join is
                       self-join within buckets, bounded by bucket size
  simhash              1 shuffle (explode tokens -> groupBy doc)
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from strawboat_spark.functions.text import (
    fingerprint,
    shingles_from_tokens,
    tokens,
)

# Mersenne prime 2^61-1: universal-hash modulus for minhash derivation.
_MERSENNE = (1 << 61) - 1


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact dedup by normalized-text fingerprint. Survivor = min id.
    Output: one row per distinct content with survivor id + copy count."""
    return (
        df.select(F.col(id_col), fingerprint(text_col).alias("fp"))
        .groupBy("fp")
        .agg(
            F.min(id_col).alias("survivor_" + id_col),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def _minhash_expr(hash_family: str, col: str, i: int, seed: int):
    """The i-th member of the minhash family as a Column.

    - 'xxhash64' (production): xxhash64(shingle, seed+i) — JVM-native
      long arithmetic, fastest, but has no DuckDB twin.
    - 'md5' (portable verification twin): ONE md5 per shingle (see
      _md5_base_expr) + a per-i affine transform (_md5_member_expr);
      that path is wired inside minhash_signatures because every i
      shares the base column (`seed` is not used; the family is fully
      determined by i).
    Both families ride the identical plan — only the leaf expressions
    differ."""
    if hash_family == "xxhash64":
        return F.xxhash64(col, F.lit(seed + i))
    raise ValueError(f"hash_family must be 'xxhash64' or 'md5', got {hash_family!r}")


# ---- the portable ('md5') hash family ---------------------------------
# r10's family was md5(shingle || ':' || i) — portable and exact, but 32
# md5 invocations PER SHINGLE made the flagship gate ~1.6x slower
# (BENCH_r10: 1.97 -> 3.08 s).  This family computes ONE md5 per shingle
# and derives the i-th member as a Carter-Wegman transform over the
# Mersenne prime M = 2^61-1:
#
#   hb  = 60 bits of md5(shingle)           -- one digest per row
#   h_i = (A_i * hb + C_i) mod M
#
# The multiply wraps M about A_i/2 times (~2^30), fully scrambling the
# order — a near-monotone transform (small coefficients, no wrap) would
# let one globally-small-base shingle win the argmin for EVERY i,
# collapsing signatures into band collisions (measured: 15x candidate-
# pair explosion).  (A_i * hb) mod M is computed in pure signed-64
# arithmetic both engines evaluate identically, via the Mersenne
# rotation identity  x * 2^30 ≡ rot61(x, 30) (mod M), since 2^61 ≡ 1:
#
#   h1 = hb >> 30, h2 = hb & (2^30-1)            # hb = h1*2^30 + h2
#   t  = (A_i * h1) mod M                        # A_i*h1 < 2^62
#   u  = (t & (2^31-1)) * 2^30 + (t >> 31)       # ≡ t*2^30 (mod M)
#   h_i = u + A_i * h2 + C_i                     # < 2^62: kept UNREDUCED
#
# u and h_i deliberately skip their `mod M` (they already fit signed
# 64): members only feed min() and equality, which any consistent
# representative serves, and one mod per member instead of three is
# measurably cheaper at 32 members per shingle row.
# A_i/C_i are < 2^31 and derived arithmetically from i, so the DuckDB
# oracle inlines the same formulas instead of embedding 64 constants.
_MERSENNE61 = (1 << 61) - 1
_MD5_BASE_COL = "__strawboat_hb"


def _md5_affine_consts(i: int) -> tuple[int, int]:
    a = (2654435761 * (i + 1)) % 2147483647 + 1
    c = (3266489917 * (i + 13)) % 2147483647
    return a, c


def _md5_base_expr(col: str):
    """60 bits of md5(col) as BIGINT (15 hex chars — fits signed 64, so
    min() stays a HashAggregate exactly like production; DuckDB twin:
    ('0x' || substr(md5(s), 1, 15))::BIGINT)."""
    return F.conv(F.substring(F.md5(F.col(col)), 1, 15), 16, 10).cast("bigint")


def _md5_member_expr(i: int):
    a, c = _md5_affine_consts(i)
    M = F.lit(_MERSENNE61)
    hb = F.col(_MD5_BASE_COL)
    h1 = F.shiftright(hb, 30)  # hb is non-negative: >>30 == div 2^30
    h2 = hb.bitwiseAND(F.lit((1 << 30) - 1))
    t = (F.lit(a) * h1) % M
    u = t.bitwiseAND(F.lit((1 << 31) - 1)) * F.lit(1 << 30) + F.shiftright(t, 31)
    return u + F.lit(a) * h2 + F.lit(c)


def minhash_signatures(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_hashes: int = 32,
    shingle_n: int = 3,
    seed: int = 42,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """MinHash signatures over word shingles.

    The i-th hash function is xxhash64(shingle, seed+i) — JVM-native
    long arithmetic (no Python, no wide decimals), one independent
    64-bit hash family member per i (hash_family='md5' swaps in the
    portable engine-independent family, see _minhash_expr). The whole
    signature costs ONE explode + ONE groupBy with n_hashes
    min-aggregates regardless of n_hashes (partial aggregation keeps
    the shuffle narrow: one row per (doc, 32 longs)).
    Output: (id_col, sig array of length n_hashes).
    """
    toked = df.select(F.col(id_col), tokens(text_col).alias("__toks"))
    exploded = toked.select(
        F.col(id_col),
        F.explode(F.array_distinct(shingles_from_tokens("__toks", shingle_n))).alias("shingle"),
    )
    if hash_family == "md5":
        # ONE digest per shingle row, materialized as a column so every
        # member expression shares it (no reliance on codegen CSE)
        exploded = exploded.withColumn(_MD5_BASE_COL, _md5_base_expr("shingle"))
        mins = [F.min(_md5_member_expr(i)).alias(f"h{i}") for i in range(n_hashes)]
    else:
        mins = [
            F.min(_minhash_expr(hash_family, "shingle", i, seed)).alias(f"h{i}")
            for i in range(n_hashes)
        ]
    sig = exploded.groupBy(id_col).agg(*mins)
    return sig.select(F.col(id_col), F.array(*[f"h{i}" for i in range(n_hashes)]).alias("sig"))


def _banded(signatures: DataFrame, id_col: str, n_bands: int, hash_family: str = "xxhash64") -> DataFrame:
    """(id, band, bucket) rows: one (band, band_hash) key per band."""
    sig = signatures.select(F.col(id_col), F.col("sig"))
    rows_per_band = F.floor(F.size("sig") / n_bands).cast("int")

    def _bucket(b):
        joined = F.concat_ws(
            ",",
            F.transform(
                F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band),
                lambda v: v.cast("string"),
            ),
        )
        # md5 family: the bucket key is itself portable (a hex string)
        return F.md5(joined) if hash_family == "md5" else F.xxhash64(joined)

    return sig.select(
        id_col,
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(n_bands - 1)),
                lambda b: F.struct(b.alias("band"), _bucket(b).alias("bucket")),
            )
        ).alias("bb"),
    ).select(id_col, "bb.band", "bb.bucket")


def lsh_bucket_stats(
    signatures: DataFrame,
    id_col: str,
    n_bands: int = 8,
    max_bucket_size: int = 256,
) -> DataFrame:
    """Audit companion to lsh_candidate_pairs: per-bucket membership
    counts with the overflow that the cap will drop. Run (or sink) this
    alongside a capped dedup so truncation is observed, never silent.
    Output: (band, bucket, n_members, capped, n_dropped)."""
    return (
        _banded(signatures, id_col, n_bands)
        .groupBy("band", "bucket")
        .agg(F.count(F.lit(1)).alias("n_members"))
        .select(
            "band",
            "bucket",
            "n_members",
            (F.col("n_members") > max_bucket_size).alias("capped"),
            F.greatest(F.lit(0), F.col("n_members") - max_bucket_size).alias("n_dropped"),
        )
    )


def lsh_candidate_pairs(
    signatures: DataFrame,
    id_col: str,
    n_bands: int = 8,
    max_bucket_size: int = 256,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """Band the signatures and emit candidate pairs sharing any band.

    Docs whose signature agrees on all rows of one band hash to the
    same (band, band_hash) bucket; the pair join happens per-bucket,
    never all-pairs. Output: (id_a, id_b) distinct, id_a < id_b.

    Degenerate buckets (mass-duplicated boilerplate — a real LLM-corpus
    phenomenon) would make a within-bucket self-join quadratic, so
    membership is capped at max_bucket_size per (band, bucket): the cap
    keeps the smallest ids (deterministic), the within-bucket work is
    bounded at cap², and lsh_bucket_stats reports exactly what was
    dropped. Mass-identical documents are unaffected in practice —
    they are removed by exact_dedup (same fingerprint) before near-dup
    LSH runs.

    Shuffle shape: ONE shuffle (the groupBy on the bucket key) — pairs
    are expanded inside each bucket's sorted-and-capped member array
    with higher-order functions, replacing the window + self-join
    formulation (2 shuffles) the naive version needs. A bucket's
    aggregation buffer holds its member ids (8 B each) before the
    slice, which is why the buffer is fine even for a million-member
    degenerate bucket (8 MB), while its pair OUTPUT stays capped.
    """
    banded = _banded(signatures, id_col, n_bands, hash_family)
    members = banded.groupBy("band", "bucket").agg(
        F.slice(F.array_sort(F.collect_list(id_col)), 1, max_bucket_size).alias("ids")
    )
    # all ordered pairs (i<j) inside the capped member array
    pairs_expr = F.flatten(
        F.transform(
            F.col("ids"),
            lambda x, i: F.transform(
                F.slice(F.col("ids"), i + 2, F.greatest(F.size("ids") - i - 1, F.lit(0))),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )
    return (
        members.filter(F.size("ids") >= 2)
        .select(F.explode(pairs_expr).alias("p"))
        .select("p.id_a", "p.id_b")
        .distinct()
    )


def minhash_lsh_dedup(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_hashes: int = 32,
    n_bands: int = 8,
    shingle_n: int = 3,
    seed: int = 42,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """End-to-end near-dedup: signatures -> LSH candidates.
    Output: candidate duplicate pairs with estimated jaccard (signature
    agreement fraction — an exact k/n_hashes binary fraction, so it
    compares bit-exactly across engines without rounding).

    hash_family='md5' runs the identical pipeline on the portable
    engine-independent hash family (_minhash_expr): that is the
    verification twin the driver hash-compares against DuckDB;
    'xxhash64' stays the production default."""
    # Signatures are referenced three times below (banding + both sides
    # of the pair join); persist so the shingle explode + 32-way min
    # aggregation runs once. Signatures are tiny relative to the corpus
    # (id + n_hashes longs per doc), so this holds at any scale.
    from pyspark import StorageLevel

    sigs = minhash_signatures(
        df, text_col, id_col, n_hashes, shingle_n, seed, hash_family
    ).persist(StorageLevel.MEMORY_AND_DISK)
    pairs = lsh_candidate_pairs(sigs, id_col, n_bands, hash_family=hash_family)
    a = sigs.select(F.col(id_col).alias("id_a"), F.col("sig").alias("sig_a"))
    b = sigs.select(F.col(id_col).alias("id_b"), F.col("sig").alias("sig_b"))
    # k/n_hashes with n_hashes a power of two is an EXACT binary
    # fraction — no rounding, bit-identical in any IEEE-754 engine
    est = F.aggregate(
        F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, v: acc + v,
    ) / F.size("sig_a")
    return (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .select("id_a", "id_b", est.alias("est_jaccard"))
    )


def minhash_lsh_join(
    left: DataFrame,
    right: DataFrame,
    text_col: str,
    left_id: str,
    right_id: str,
    n_hashes: int = 32,
    n_bands: int = 8,
    shingle_n: int = 3,
    seed: int = 42,
    hash_family: str = "xxhash64",
    max_bucket_size: int = 256,
) -> DataFrame:
    """Cross-TABLE near-duplicate join: (left_id, right_id,
    est_jaccard) for every left doc sharing an LSH band bucket with a
    right doc — the FUZZY DECONTAMINATION shape (corpus docs that
    near-duplicate an eval-set doc escape exact n-gram overlap checks
    when lightly paraphrased; reference scope: same near-dup semantics
    as minhash_lsh_dedup, lifted to two tables).

    Scale shape (the asymmetry is the point): `left` is the 100 TB
    corpus, `right` the small eval set. Both sides band independently
    (one explode + one groupBy each); the candidate join is an
    EQUI-join on (band, bucket) — never all-pairs — and each side's
    bucket membership is capped at max_bucket_size (deterministic
    smallest ids, same policy as lsh_candidate_pairs), so a degenerate
    boilerplate bucket costs at most cap*cap pairs. With the md5
    hash family the whole pipeline replays exactly in DuckDB."""
    from pyspark import StorageLevel

    ls = minhash_signatures(
        left, text_col, left_id, n_hashes, shingle_n, seed, hash_family
    ).persist(StorageLevel.MEMORY_AND_DISK)
    rs = minhash_signatures(
        right, text_col, right_id, n_hashes, shingle_n, seed, hash_family
    ).persist(StorageLevel.MEMORY_AND_DISK)
    lm = (
        _banded(ls, left_id, n_bands, hash_family)
        .groupBy("band", "bucket")
        .agg(F.slice(F.array_sort(F.collect_list(left_id)), 1, max_bucket_size).alias("ids_l"))
    )
    rm = (
        _banded(rs, right_id, n_bands, hash_family)
        .groupBy("band", "bucket")
        .agg(F.slice(F.array_sort(F.collect_list(right_id)), 1, max_bucket_size).alias("ids_r"))
    )
    pairs_expr = F.flatten(
        F.transform(
            F.col("ids_l"),
            lambda x: F.transform(
                F.col("ids_r"), lambda y: F.struct(x.alias("lid"), y.alias("rid"))
            ),
        )
    )
    pairs = (
        lm.join(rm, ["band", "bucket"])  # equi-join on the bucket key
        .select(F.explode(pairs_expr).alias("p"))
        .select("p.lid", "p.rid")
        .distinct()
    )
    a = ls.select(F.col(left_id).alias("lid"), F.col("sig").alias("sig_a"))
    b = rs.select(F.col(right_id).alias("rid"), F.col("sig").alias("sig_b"))
    est = F.aggregate(
        F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, v: acc + v,
    ) / F.size("sig_a")  # exact k/2^m binary fraction, engine-portable
    return (
        pairs.join(a, "lid")
        .join(b, "rid")
        .select(
            F.col("lid").alias(left_id if left_id != right_id else f"left_{left_id}"),
            F.col("rid").alias(right_id if left_id != right_id else f"right_{right_id}"),
            est.alias("est_jaccard"),
        )
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    shingle_n: int = 3,
    threshold: float = 0.5,
    max_doc_freq: int = 1000,
    max_posting_size: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for pairs sharing >=1 shingle.

    Inverted-index join: explode distinct shingles, self-join on the
    shingle (bounded by posting-list sizes), count intersections, and
    compute |A∩B| / (|A|+|B|-|A∩B|). SQL-expressible — this operator
    carries an exact DuckDB oracle, validating the minhash estimate.

    Boilerplate guard: a shingle shared by more than `max_doc_freq`
    documents (site chrome, license headers, template text) would make
    the self-join quadratic in its posting list — one trigram shared by
    1M docs is ~10^12 join rows. Such shingles are cut from the
    universe BEFORE the join, from both the intersection counts AND the
    set sizes, so `jaccard` stays a true set similarity over the
    df-filtered shingle space. The cut is an explicit, audited contract
    (ngram_df_stats reports every dropped shingle and the pair volume
    it avoided), mirroring lsh_candidate_pairs' bucket cap; per-shingle
    join fan-out is bounded at max_doc_freq^2.

    SCALE POSTURE (measured, BASELINE.md r11 audit): with
    max_posting_size=None total work is Σ_shingle min(df, max_doc_freq)²
    — duplicate clusters of size k contribute k² through their shared
    shingles until the cut bites, so heavily-replicated corpora grow
    SUPER-linearly (58x for 10x at sf0.1→sf1) even though the work is
    all executor-parallel shuffle joins with no driver state. Prefix
    filtering does not help at low thresholds (t=0.12 keeps ~88% of
    each set), and lowering the cut trades away dup-cluster recall.

    BOUNDED-WORK CONTRACT (r12): `max_posting_size` (the cap) gives the
    verification twin the same discipline as lsh_candidate_pairs'
    max_bucket_size. When set, candidate generation only pairs the
    cap LOWEST ids of each shingle's posting list (deterministic —
    array_sort + slice, exactly replayable in SQL via ROW_NUMBER), so
    pair-generation work is Σ_shingle min(df, cap)² ≤ #shingles · cap².
    The Jaccard reported for every SURVIVING pair stays EXACT over the
    full df-filtered shingle space (candidates fan back out to the
    uncapped posting lists to count |A∩B|); what the cap trades is
    candidate RECALL: a pair is missed only if every shingle it shares
    has one of the two members outside that shingle's cap window. The
    drop is audited, never silent — ngram_posting_cap_stats reports
    each capped shingle and the within-shingle pair mass excluded, so
    a 1 TB verification slice is a bounded job with a quantified
    recall statement. At 100 TB use minhash-LSH (minhash_lsh_dedup,
    sub-linear on the same corpus) for discovery; this exact operator
    is the verification twin and the moderate-scale / high-threshold
    tool."""
    toked = df.select(F.col(id_col), tokens(text_col).alias("__toks"))
    sh = toked.select(
        F.col(id_col),
        F.explode(F.array_distinct(shingles_from_tokens("__toks", shingle_n))).alias("shingle"),
    )
    # df as groupBy+join, NOT a per-shingle window: a window partition
    # cannot be split, so a boilerplate trigram shared by 1M docs would
    # serialize its whole posting list through one task. The groupBy is
    # map-side-combined and the join back is skew-splittable by AQE —
    # same shape (and rationale) as ranking.py's tfidf df computation.
    keep = (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("__df"))
        .filter(F.col("__df") <= max_doc_freq)
        .select("shingle")
    )
    sh = sh.join(keep, "shingle")
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_shingles"))
    if max_posting_size is None:
        a, b = sh.alias("a"), sh.alias("b")
        common = (
            a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
            .groupBy(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
            .agg(F.count(F.lit(1)).alias("n_common"))
        )
    else:
        # Capped candidate generation: cap LOWEST ids per shingle
        # (array_sort + slice == ROW_NUMBER ... ORDER BY id <= cap in
        # the SQL replay), pairs expanded ARRAY-side — the collect_list
        # is bounded by the df-cut (<= max_doc_freq rows per group) and
        # the pair arrays by cap², so no unbounded state anywhere.
        kept = sh.groupBy("shingle").agg(
            F.slice(F.array_sort(F.collect_list(id_col)), 1, max_posting_size).alias("ids")
        )
        cand = (
            kept.select(
                F.explode(
                    F.expr(
                        "flatten(transform(ids, (x, i) -> "
                        "transform(slice(ids, i + 2, size(ids)), "
                        "y -> struct(x AS id_a, y AS id_b))))"
                    )
                ).alias("p")
            )
            .select("p.id_a", "p.id_b")
            .distinct()
        )
        # Exact |A∩B| for each candidate via array_intersect over the
        # FULL df-filtered shingle sets: two equi-joins attach each
        # side's set, the intersection stays JVM-side, and — unlike a
        # candidate→posting-list fan-out join — the row count never
        # exceeds |candidates| (measured: 25.7 s → 15.4 s at sf0.1 vs
        # the fan-out formulation).
        doc_sets = sh.groupBy(id_col).agg(F.collect_set("shingle").alias("__set"))
        sa = doc_sets.select(F.col(id_col).alias("id_a"), F.col("__set").alias("__sa"))
        sb = doc_sets.select(F.col(id_col).alias("id_b"), F.col("__set").alias("__sb"))
        common = (
            cand.join(sa, "id_a")
            .join(sb, "id_b")
            .select(
                "id_a",
                "id_b",
                F.size(F.array_intersect("__sa", "__sb")).alias("n_common"),
            )
            .filter(F.col("n_common") > 0)
        )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_shingles").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_shingles").alias("n_b"))
    return (
        common.join(sa, "id_a")
        .join(sb, "id_b")
        # threshold on the RAW ratio (mirrors the SQL replays, which all
        # filter the unrounded ratio); the output column is quantized via
        # scale-0 ROUND — 2-arg ROUND(x, 4) is engine-unstable when the
        # double's shortest repr lands on a half at digit 5, while halves
        # of x*10000 are exactly representable so scale-0 rounding agrees
        # across engines (see the strawboat_merge_when r7 post-mortem)
        .filter(
            F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
            >= threshold
        )
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common") * 10000.0 / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
            ).cast("long")
            / 10000.0,
        )
        .select("id_a", "id_b", "jaccard")
    )


def ngram_df_stats(
    df: DataFrame,
    text_col: str,
    id_col: str,
    shingle_n: int = 3,
    max_doc_freq: int = 1000,
) -> DataFrame:
    """Audit companion to ngram_jaccard_pairs' df-cut (the analog of
    lsh_bucket_stats): one row per shingle the cut drops, with its
    document frequency and the self-join pair volume the cut avoided —
    run or sink alongside a capped run so truncation is observed,
    never silent. Output: (shingle, doc_freq, n_pairs_avoided)."""
    toked = df.select(F.col(id_col), tokens(text_col).alias("__toks"))
    sh = toked.select(
        F.col(id_col),
        F.explode(F.array_distinct(shingles_from_tokens("__toks", shingle_n))).alias("shingle"),
    )
    return (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("doc_freq"))
        .filter(F.col("doc_freq") > max_doc_freq)
        .select(
            "shingle",
            "doc_freq",
            (F.col("doc_freq") * (F.col("doc_freq") - 1) / 2).cast("bigint").alias("n_pairs_avoided"),
        )
    )


def ngram_posting_cap_stats(
    df: DataFrame,
    text_col: str,
    id_col: str,
    shingle_n: int = 3,
    max_doc_freq: int = 1000,
    max_posting_size: int = 64,
) -> DataFrame:
    """Audit companion to ngram_jaccard_pairs' per-shingle pair budget
    (`max_posting_size`) — the analog of ngram_df_stats for the cap
    tier (cap < df <= max_doc_freq; shingles above max_doc_freq are
    the df-cut's audit, not this one). One row per shingle whose
    posting list was truncated for candidate generation, with its
    document frequency, the kept count, and the within-shingle pair
    mass excluded: C(df,2) - C(cap,2). A pair counted here may still
    be discovered via another shared shingle — this is the per-shingle
    drop mass, the quantity a recall statement is built from.
    Output: (shingle, doc_freq, n_kept, n_pairs_dropped)."""
    toked = df.select(F.col(id_col), tokens(text_col).alias("__toks"))
    sh = toked.select(
        F.col(id_col),
        F.explode(F.array_distinct(shingles_from_tokens("__toks", shingle_n))).alias("shingle"),
    )
    cap_pairs = max_posting_size * (max_posting_size - 1) // 2
    return (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("doc_freq"))
        .filter((F.col("doc_freq") > max_posting_size) & (F.col("doc_freq") <= max_doc_freq))
        .select(
            "shingle",
            "doc_freq",
            F.lit(max_posting_size).cast("bigint").alias("n_kept"),
            (
                (F.col("doc_freq") * (F.col("doc_freq") - 1) / 2).cast("bigint")
                - F.lit(cap_pairs)
            ).alias("n_pairs_dropped"),
        )
    )


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """Duplicate-cluster assignment: min-label propagation over the
    near-dup pair graph. Output: (id_col, component) where component is
    the smallest id reachable from the node.

    Scale shape: each iteration is one join edges⋈labels + one min
    aggregation — the textbook large-scale CC loop. Converges in
    O(graph diameter) iterations (near-dup clusters are shallow:
    usually 2-3). localCheckpoint() truncates the lineage so the plan
    doesn't grow exponentially across iterations.
    """
    both = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).unionByName(edges.select(F.col(dst_col).alias("src"), F.col(src_col).alias("dst")))
    both = both.localCheckpoint(eager=True)

    labels = nodes.select(F.col(id_col).alias("node"), F.col(id_col).alias("label"))
    # Convergence check: labels only ever decrease under min-propagation,
    # so sum(label) strictly decreases until the fixpoint — one cheap
    # aggregate per iteration instead of a join-the-old-labels diff.
    prev_sum = None
    for _ in range(max_iter):
        neighbor_min = (
            both.join(labels, both.dst == labels.node)
            .groupBy("src")
            .agg(F.min("label").alias("nbr_label"))
        )
        labels = (
            labels.join(neighbor_min, labels.node == neighbor_min.src, "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))).alias(
                    "label"
                ),
            )
            .localCheckpoint(eager=True)
        )
        cur_sum = labels.agg(F.sum("label")).collect()[0][0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels.select(F.col("node").alias(id_col), F.col("label").alias("component"))


_SIMHASH_MAX_TOKENS = 30_000  # lane-overflow bound; signature saturates long before
_SIMHASH_LANES = 4  # 15-bit counters per packed long (shifts 0/15/30/45)


def simhash(df: DataFrame, text_col: str, id_col: str, bits: int = 64) -> DataFrame:
    """64-bit SimHash over whitespace tokens.

    Explode tokens -> per-token xxhash64 -> per-bit one-counts summed
    per doc -> majority bits reassembled into one BIGINT fingerprint.
    Near-dups then cluster by Hamming distance on the fingerprint.

    Shuffle shape: the 64 per-bit counters are PACKED four to a long
    (15-bit lanes), so the groupBy moves 17 longs per doc instead of
    64 — same single-shuffle plan, ~4x less aggregate state. Lanes
    cannot overflow because tokens are capped at 30k per doc (a SimHash
    majority vote is statistically saturated far earlier; bit i of a
    capped doc equals the uncapped bit with overwhelming probability,
    and near-dup clustering only compares fingerprints built the same
    way). Majority rule `2*ones > n` is exactly the old +1/-1 vote sign.
    """
    n_groups = (bits + _SIMHASH_LANES - 1) // _SIMHASH_LANES
    toked = df.select(
        F.col(id_col),
        F.explode(F.slice(tokens(text_col), 1, _SIMHASH_MAX_TOKENS)).alias("tok"),
    ).withColumn("h", F.xxhash64("tok"))
    packed = []
    for g in range(n_groups):
        expr = F.lit(0).cast("bigint")
        for j in range(_SIMHASH_LANES):
            i = g * _SIMHASH_LANES + j
            if i >= bits:
                break
            lane = F.shiftright("h", i).bitwiseAND(F.lit(1)).cast("bigint")
            expr = expr + F.shiftleft(lane, 15 * j)
        packed.append(F.sum(expr).alias(f"g{g}"))
    agg = toked.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_tok"), *packed)
    fp = F.lit(0).cast("bigint")
    for i in range(bits):
        g, j = divmod(i, _SIMHASH_LANES)
        ones = F.shiftright(F.col(f"g{g}"), 15 * j).bitwiseAND(F.lit(0x7FFF))
        bit_on = (ones * 2) > F.col("n_tok")
        fp = fp + F.when(
            bit_on,
            F.lit(1).cast("bigint") * (1 << i) if i < 63 else F.lit(-(1 << 63)),
        ).otherwise(F.lit(0))
    return agg.select(F.col(id_col), fp.alias("simhash"))


def remove_duplicate_substrings(
    df: DataFrame, id_col: str, text_col: str, k: int = 30
) -> DataFrame:
    """Exact-substring deduplication (the Lee-et-al. "Deduplicating
    Training Data Makes Language Models Better" treatment, char-gram
    formulation): every length-k character substring that occurs more
    than once ANYWHERE in the corpus is cut from every document; the
    overlapping cut spans merge per document (gaps-and-islands) before
    splicing the survivors back together.

    Returns (id, n_spans, removed_chars, kept_len, kept_hash, kept) —
    everything downstream of the gram table is exact integer/string
    algebra a SQL oracle replicates verbatim (kept_hash = md5 of the
    spliced text).

    Scale shape: the gram explode is |total_chars| rows — the inherent
    cost of the algorithm (a suffix array pays the same linear space);
    rows carry (id, pos, gram) and shuffle ONCE on the gram for the
    duplicate test (at 100 TB you'd shuffle an 8-byte xxhash64 of the
    gram instead of the k bytes — same plan shape, noted here because
    the exact-oracle gate needs the literal gram). Span merge is one
    window over (id, pos); the splice is a JVM sort+fold. No Python
    anywhere."""
    from pyspark.sql import Window

    t = F.col(text_col)
    # grams carry ONLY (id, pos, gram) — the document text must not ride
    # the per-gram rows (that would shuffle O(len^2) bytes per doc); it
    # rejoins once per doc after the islands merge.
    grams = df.select(
        F.col(id_col),
        F.explode(
            # guard: Spark's sequence(1, 0) is DESCENDING [1, 0], so
            # docs shorter than k must short-circuit to no grams
            F.when(
                F.length(t) >= k,
                F.transform(
                    F.sequence(F.lit(1), F.length(t) - (k - 1)),
                    lambda i: F.struct(
                        i.alias("pos"), F.substring(t, i, k).alias("g")
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<pos:int,g:string>>"))
        ).alias("pg"),
    ).select(id_col, F.col("pg.pos").alias("pos"), F.col("pg.g").alias("g"))
    dup = grams.groupBy("g").agg(F.count(F.lit(1)).alias("__n")).filter(F.col("__n") > 1)
    spans = grams.join(dup.select("g"), "g").select(
        id_col, F.col("pos").alias("s"), (F.col("pos") + k).alias("e")
    )
    # gaps-and-islands: a new island starts when this span begins after
    # every previous span has ended (strictly: touching spans merge)
    w = Window.partitionBy(id_col).orderBy("s").rowsBetween(
        Window.unboundedPreceding, -1
    )
    flagged = spans.withColumn(
        "brk", F.when(F.col("s") > F.coalesce(F.max("e").over(w), F.lit(0)), 1).otherwise(0)
    )
    wi = Window.partitionBy(id_col).orderBy("s").rowsBetween(
        Window.unboundedPreceding, 0
    )
    merged = (
        flagged.withColumn("island", F.sum("brk").over(wi))
        .groupBy(id_col, "island")
        .agg(F.min("s").alias("s"), F.max("e").alias("e"))
    )
    # splice: sort islands, emit the text between consecutive islands;
    # the text joins back here — once per affected doc
    per_doc = merged.groupBy(id_col).agg(
        F.sort_array(F.collect_list(F.struct("s", "e"))).alias("islands")
    ).join(df.select(id_col, t.alias("__text")), id_col)
    cut = F.aggregate(
        F.col("islands"),
        F.struct(F.lit("").alias("kept"), F.lit(1).alias("cursor")),
        lambda acc, isl: F.struct(
            F.concat(
                acc["kept"],
                F.substring(
                    F.col("__text"), acc["cursor"], isl["s"] - acc["cursor"]
                ),
            ).alias("kept"),
            isl["e"].alias("cursor"),
        ),
        lambda acc: F.concat(
            acc["kept"],
            F.col("__text").substr(acc["cursor"], F.length("__text")),
        ),
    )
    deduped = per_doc.select(
        id_col,
        F.size("islands").alias("n_spans"),
        F.aggregate(
            "islands", F.lit(0), lambda a, i: a + (i["e"] - i["s"])
        ).alias("removed_chars"),
        cut.alias("kept"),
    )
    untouched = df.join(per_doc.select(id_col), id_col, "left_anti").select(
        F.col(id_col),
        F.lit(0).alias("n_spans"),
        F.lit(0).alias("removed_chars"),
        t.alias("kept"),
    )
    return deduped.unionByName(untouched).select(
        id_col,
        "n_spans",
        "removed_chars",
        F.length("kept").alias("kept_len"),
        F.md5("kept").alias("kept_hash"),
        "kept",
    )


def edit_distance_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    key_len: int = 32,
    block_len: int = 6,
    length_band: int = 2,
    max_distance: int = 4,
    max_block_size: int = 1000,
) -> DataFrame:
    """Blocked exact edit-distance near-dup pairs: document keys are the
    first `key_len` chars of whitespace-normalized lowercased text;
    candidates share a `block_len`-char prefix AND differ in key length
    by at most `length_band` (a true Levenshtein lower bound — equal
    prefixes can't rescue a length gap). Distance is Spark's built-in
    levenshtein (JVM codegen, no Python), computed ONLY on blocked
    candidates — never all pairs.

    Scale guard: a prefix shared by B docs yields B^2/2 candidate
    pairs, so blocks larger than `max_block_size` (boilerplate
    prefixes: license headers, templates) are cut from the candidate
    universe BEFORE the self-join — the same audited-cut contract as
    ngram_jaccard_pairs' df-cut and lsh_candidate_pairs' bucket cap,
    and the same groupBy+join shape (a per-block window would
    serialize the hot block on one core).

    Complements the MinHash/SimHash/ngram family with character-level
    (typo/OCR) similarity the token-level signatures miss.
    Output: (id_a, id_b, distance), id_a < id_b."""
    key = F.substring(
        F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " "), 1, key_len
    )
    k = df.select(F.col(id_col), key.alias("__key")).select(
        id_col,
        "__key",
        F.substring("__key", 1, block_len).alias("__blk"),
        F.length("__key").alias("__l"),
    )
    keep = (
        k.groupBy("__blk")
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") <= max_block_size)
        .select("__blk")
    )
    k = k.join(keep, "__blk")
    a, b = k.alias("a"), k.alias("b")
    cand = a.join(
        b,
        (F.col("a.__blk") == F.col("b.__blk"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        & (F.abs(F.col("a.__l") - F.col("b.__l")) <= length_band),
    )
    return (
        cand.select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.levenshtein(F.col("a.__key"), F.col("b.__key")).alias("distance"),
        )
        .filter(F.col("distance") <= max_distance)
        .orderBy("id_a", "id_b")
    )


def dedup_survivors(
    components: DataFrame,
    scores: DataFrame,
    id_col: str,
    score_col: str,
    comp_col: str = "component",
) -> DataFrame:
    """Survivor selection policy for duplicate clusters: keep the
    HIGHEST-scoring member of each connected component (ties -> lowest
    id) instead of the arbitrary min-id — real pipelines keep the
    longest / highest-quality copy, not the first one crawled.

    Skew-safe by construction: the per-cluster argmax is a groupBy
    max_by (struct-ordered, map-side combined), never a per-component
    window — a boilerplate mega-cluster with a million members
    aggregates in parallel instead of serializing through one task.
    Output: (id, component, survivor_id, is_survivor)."""
    joined = components.join(scores, id_col)
    best = joined.groupBy(comp_col).agg(
        F.max_by(
            F.col(id_col),
            F.struct(
                F.col(score_col).alias("s"),
                (-F.col(id_col)).cast("long").alias("tie"),
            ),
        ).alias("survivor_id")
    )
    return joined.join(best, comp_col).select(
        F.col(id_col),
        F.col(comp_col),
        "survivor_id",
        (F.col(id_col) == F.col("survivor_id")).alias("is_survivor"),
    )


def shingle_postings(
    df: DataFrame, text_col: str, id_col: str, shingle_n: int = 3
) -> DataFrame:
    """Distinct (id, shingle) postings — the inverted-index rows both
    the batch Jaccard op and the incremental index build on."""
    toked = df.select(F.col(id_col), tokens(text_col).alias("__toks"))
    return toked.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(shingles_from_tokens("__toks", shingle_n))
        ).alias("shingle"),
    )


def jaccard_index_init(
    spark,
    index_path: str,
    df: DataFrame,
    text_col: str,
    id_col: str,
    shingle_n: int = 3,
    num_buckets: int = 32,
):
    """Build the PERSISTENT shingle-postings index for incremental
    near-dup detection: one strawboat table of (id, shingle, n_doc)
    rows — n_doc denormalized (the doc's total distinct shingles) so
    later batches never rescan old documents for sizes — hash-BUCKETED
    by shingle, so an incremental batch's lookups prune to the bucket
    directories its own shingles hash into at PLANNING time.

    The 100 TB shape this exists for: dedup a new crawl against an
    existing corpus without touching the corpus — per batch, the index
    IO is |matching buckets|, the join fan-out is bounded by the
    df-cut, and the index grows by one append (CAS flip)."""
    from strawboat_spark.table import Table

    post = shingle_postings(df, text_col, id_col, shingle_n)
    sizes = post.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_doc"))
    rows = post.join(sizes, id_col)
    Table(spark, index_path).overwrite(
        rows, bucket_by="shingle", num_buckets=num_buckets
    )
    return Table(spark, index_path)


def _jaccard_new_rows(new_df: DataFrame, text_col: str, id_col: str, shingle_n: int):
    post = shingle_postings(new_df, text_col, id_col, shingle_n)
    sizes = post.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_doc"))
    return post.join(sizes, id_col)


def jaccard_index_ingest(
    spark,
    index_path: str,
    new_df: DataFrame,
    text_col: str,
    id_col: str,
    shingle_n: int = 3,
    **append_options,
):
    """Append a batch's postings WITHOUT computing pairs — the
    streaming maintenance path, where the pairs leg already ran
    against the pre-append generation and this commit carries the
    caller's txn marker (append_options -> writer options)."""
    from strawboat_spark.table import Table

    Table(spark, index_path).append(
        _jaccard_new_rows(new_df, text_col, id_col, shingle_n), **append_options
    )


def maybe_compact_index(spark, index_path: str, every: int) -> bool:
    """Compaction cadence for the incremental indexes. Each append adds
    one file per touched bucket, so batch k's bucket-pruned lookup
    opens ~k files per bucket — the measured per-batch cost curve
    climbs ~+0.7 s/batch at sf1 and a compaction RESETS it
    (BASELINE.md r11 incremental-index table). With every=N, compact
    once N appends have landed since the last compact/overwrite
    (counted from the manifest history — no side state). Hive-layout-
    preserving (per-bucket-dir rewrite) and executor-parallel; pinned
    pre-append readers stay valid (generations are retained until
    vacuum). Returns True when a compaction ran."""
    if not every:
        return False
    from strawboat_spark.sources.datasource import list_generations
    from strawboat_spark.table import Table

    appends = 0
    for g in reversed(list_generations(index_path)):
        if g.get("operation") in ("append", "stream-append"):
            appends += 1
        else:
            break
    if appends < every:
        return False
    Table(spark, index_path).compact()
    return True


def jaccard_index_append(
    spark,
    index_path: str,
    new_df: DataFrame,
    text_col: str,
    id_col: str,
    shingle_n: int = 3,
    threshold: float = 0.5,
    max_doc_freq: int = 1000,
    ingest: bool = True,
    compact_every: int = 0,
    **append_options,
) -> DataFrame:
    """Incrementally dedup `new_df` against the indexed corpus AND
    within itself, then append its postings to the index (one CAS
    generation flip).  Ids must be unique across the whole corpus
    (caller contract).

    Returns (id_a, id_b, jaccard) with id_a < id_b and at least one
    side from `new_df`.  Semantics (each piece chosen to stay exact
    WITHOUT rescanning old documents):
    - candidate generation joins on shingles whose GLOBAL doc-freq is
      <= max_doc_freq (boilerplate cut; exact because a shingle's full
      posting list lives inside its bucket, and every bucket a new
      doc's shingles touch is read);
    - n_common counts the df-kept shared shingles;
    - set sizes are the docs' RAW distinct-shingle counts (the stored
      n_doc) — post-cut sizes would need every old doc's global dfs,
      which an incremental pass cannot know.  jaccard :=
      n_common / (n_a + n_b - n_common) is therefore a documented
      LOWER bound when a shared boilerplate shingle was cut —
      conservative for dedup.

    Plan shape per batch: ONE bounded metadata collect (the batch's
    distinct bucket ids, <= num_buckets), a directory-pruned index
    scan, df-cut groupBy + joins all skew-splittable by AQE, and one
    append."""
    from strawboat_spark.sources.datasource import bucket_spec
    from strawboat_spark.table import Table

    from strawboat_spark.sources.datasource import read_manifest

    t = Table(spark, index_path)
    new_rows = _jaccard_new_rows(new_df, text_col, id_col, shingle_n).persist()
    try:
        spec = bucket_spec(index_path)
        # PIN the pre-append generation: the returned pairs frame stays
        # lazy (no driver materialization of pair lists — they can be
        # huge) and snapshot isolation keeps it correct after the
        # append below flips the head
        gen = (read_manifest(index_path) or {}).get("generation")
        try:
            idx = t.read(at_generation=gen)
        except Exception:
            # an index seeded from an EMPTY corpus has no data files
            # yet — the first real batch dedups only against itself
            idx = spark.createDataFrame([], new_rows.schema)
            spec = None  # no layout to prune (and no __bucket column)
        if spec is not None:
            # bounded planner-side prune: the batch's shingles map to
            # <= num_buckets directories; everything outside them is
            # irrelevant to ANY shared-shingle candidate
            bucket_ids = [
                r[0]
                for r in new_rows.select(
                    F.pmod(
                        F.crc32(F.col("shingle").cast("string").cast("binary")),
                        F.lit(spec["n"]),
                    )
                    .cast("long")
                    .alias("b")
                )
                .distinct()
                .collect()
            ]
            idx = idx.filter(F.col(spec["dir_col"]).isin(bucket_ids))
        old_rows = idx.select(id_col, "shingle", "n_doc")
        universe = old_rows.select(
            F.col(id_col), F.col("shingle"), F.col("n_doc"), F.lit(False).alias("is_new")
        ).unionByName(
            new_rows.select(
                F.col(id_col), F.col("shingle"), F.col("n_doc"), F.lit(True).alias("is_new")
            )
        )
        keep = (
            universe.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("__df"))
            .filter(F.col("__df") <= max_doc_freq)
            .select("shingle")
        )
        kept = universe.join(keep, "shingle")
        new_kept = kept.filter(F.col("is_new"))
        a, b = kept.alias("a"), new_kept.alias("b")
        pair_cond = (F.col("a.shingle") == F.col("b.shingle")) & (
            F.col(f"a.{id_col}") != F.col(f"b.{id_col}")
        )
        common = (
            a.join(b, pair_cond)
            # old-vs-new pairs appear once (b is the new side); a
            # new-new pair would appear in both orientations — keep the
            # a<b one
            .filter(~F.col("a.is_new") | (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
            .groupBy(
                F.col(f"a.{id_col}").alias("ia"),
                F.col(f"b.{id_col}").alias("ib"),
                F.col("a.n_doc").alias("n_a"),
                F.col("b.n_doc").alias("n_b"),
            )
            .agg(F.count(F.lit(1)).alias("n_common"))
        )
        ratio = F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
        pairs = (
            common.filter(ratio >= threshold)
            .select(
                F.least("ia", "ib").alias("id_a"),
                F.greatest("ia", "ib").alias("id_b"),
                # scale-0 quantization (repo cross-engine ROUND convention)
                (
                    F.round(F.col("n_common") * 10000.0 / (F.col("n_a") + F.col("n_b") - F.col("n_common")))
                    .cast("long")
                    / 10000.0
                ).alias("jaccard"),
            )
        )
        if ingest:
            # append_options pass through to the writer — a streaming
            # caller attaches its txn marker here so the postings
            # append and the marker commit in ONE generation flip
            # (exactly-once under foreachBatch replays)
            t.append(new_rows, **append_options)
            maybe_compact_index(spark, index_path, compact_every)
        return pairs
    finally:
        new_rows.unpersist()


def minhash_index_init(
    spark,
    index_path: str,
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_hashes: int = 32,
    n_bands: int = 8,
    num_buckets: int = 64,
):
    """Persistent LSH band index — the APPROXIMATE twin of
    jaccard_index_init for corpus scales where even the df-cut shingle
    join is too wide: one row per (id, band, bucket), hash-bucketed by
    the LSH bucket key so an incremental batch prunes to its own
    bands' directories.  Candidates come from band-bucket equality
    (the same recall/precision trade as lsh_candidate_pairs; run the
    exact jaccard index when you need exactness)."""
    from strawboat_spark.table import Table

    sig = minhash_signatures(df, text_col, id_col, n_hashes=n_hashes)
    banded = _banded(sig, id_col, n_bands)
    Table(spark, index_path).overwrite(
        banded, bucket_by="bucket", num_buckets=num_buckets
    )
    return Table(spark, index_path)


def minhash_index_append(
    spark,
    index_path: str,
    new_df: DataFrame,
    text_col: str,
    id_col: str,
    n_hashes: int = 32,
    n_bands: int = 8,
    max_bucket_size: int = 256,
    compact_every: int = 0,
) -> DataFrame:
    """Band the new batch, join its (band, bucket) keys against the
    directory-pruned index + itself for candidate pairs (id_a < id_b,
    at least one side new), append the new bands (one CAS flip).
    Returns the DISTINCT candidate pairs, lazily (the index read pins
    the pre-append generation).  Degenerate buckets are capped like
    lsh_candidate_pairs: members beyond max_bucket_size smallest ids
    per (band, bucket) are dropped from pair EXPANSION (run
    lsh_bucket_stats on the index for the audit)."""
    from strawboat_spark.sources.datasource import bucket_spec, read_manifest
    from strawboat_spark.table import Table

    t = Table(spark, index_path)
    new_banded = _banded(
        minhash_signatures(new_df, text_col, id_col, n_hashes=n_hashes),
        id_col,
        n_bands,
    ).persist()
    try:
        spec = bucket_spec(index_path)
        gen = (read_manifest(index_path) or {}).get("generation")
        idx = t.read(at_generation=gen)
        if spec is not None:
            bucket_ids = [
                r[0]
                for r in new_banded.select(
                    F.pmod(
                        F.crc32(F.col("bucket").cast("string").cast("binary")),
                        F.lit(spec["n"]),
                    )
                    .cast("long")
                    .alias("b")
                )
                .distinct()
                .collect()
            ]
            idx = idx.filter(F.col(spec["dir_col"]).isin(bucket_ids))
        universe = idx.select(id_col, "band", "bucket", F.lit(False).alias("is_new")).unionByName(
            new_banded.select(id_col, "band", "bucket", F.lit(True).alias("is_new"))
        )
        # cap per (band, bucket) with the SAME deterministic rule as
        # lsh_candidate_pairs (smallest ids kept), computed over the
        # pruned universe — exact because a bucket's members all hash
        # to the same directory
        members = universe.groupBy("band", "bucket").agg(
            F.slice(
                F.array_sort(F.collect_list(F.struct(id_col, "is_new"))),
                1,
                max_bucket_size,
            ).alias("ms")
        )
        pairs_expr = F.flatten(
            F.transform(
                F.col("ms"),
                lambda x, i: F.transform(
                    F.slice(F.col("ms"), i + 2, F.greatest(F.size("ms") - i - 1, F.lit(0))),
                    lambda y: F.struct(
                        x[id_col].alias("id_a"),
                        y[id_col].alias("id_b"),
                        (x["is_new"] | y["is_new"]).alias("any_new"),
                    ),
                ),
            )
        )
        pairs = (
            members.filter(F.size("ms") >= 2)
            .select(F.explode(pairs_expr).alias("p"))
            .filter(F.col("p.any_new"))
            .select("p.id_a", "p.id_b")
            .distinct()
        )
        t.append(new_banded)
        maybe_compact_index(spark, index_path, compact_every)
        return pairs
    finally:
        new_banded.unpersist()


def fingerprint_index_init(
    spark,
    index_path: str,
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_buckets: int = 64,
):
    """Persistent EXACT-dedup index: one (fingerprint, survivor id) row
    per distinct content, hash-bucketed by fingerprint — the first
    filter of the incremental pipeline (exact copies are the bulk of
    crawl duplication; near-dup indexes run on what survives).

    WHEN THIS INDEX PAYS (measured crossover, BASELINE.md r14, sf10 =
    500k docs): per-batch appends are flat ~3-5 s, but a full rescan of
    that corpus is ALSO only ~3.0 s while the index's periodic
    compaction costs 97.6 s — at local-disk scan speeds the plain
    fingerprint groupBy over corpus+batch beats the index.  Use the
    index when re-reading the corpus is the expensive thing (object
    store at 100 TB: a rescan is petabyte-class IO while the index
    prunes to the batch's fingerprint buckets) or when per-batch
    latency must not grow with corpus size.  Below that, a groupBy is
    cheaper — don't pay the index's compaction for a corpus you can
    rescan in seconds."""
    from strawboat_spark.table import Table

    rows = (
        df.select(F.col(id_col), fingerprint(text_col).alias("fp"))
        .groupBy("fp")
        .agg(F.min(id_col).alias("survivor_id"))
    )
    Table(spark, index_path).overwrite(rows, bucket_by="fp", num_buckets=num_buckets)
    return Table(spark, index_path)


def fingerprint_index_append(
    spark,
    index_path: str,
    new_df: DataFrame,
    text_col: str,
    id_col: str,
    compact_every: int = 0,
) -> DataFrame:
    """Split a new batch into exact duplicates of the indexed corpus
    and genuinely-new content; append the new fingerprints (one CAS
    flip).  Returns (id, survivor_id, is_duplicate): duplicates point
    at the indexed survivor, new content points at itself (its batch's
    min id per content).  Per batch: the index scan prunes to the
    batch's fingerprint buckets; everything else is one groupBy + one
    join."""
    from strawboat_spark.sources.datasource import bucket_spec, read_manifest
    from strawboat_spark.table import Table

    t = Table(spark, index_path)
    new_fp = new_df.select(F.col(id_col), fingerprint(text_col).alias("fp")).persist()
    try:
        spec = bucket_spec(index_path)
        gen = (read_manifest(index_path) or {}).get("generation")
        try:
            idx = t.read(at_generation=gen)
        except Exception:
            idx = spark.createDataFrame([], "fp string, survivor_id long")
            spec = None
        if spec is not None:
            bucket_ids = [
                r[0]
                for r in new_fp.select(
                    F.pmod(
                        F.crc32(F.col("fp").cast("string").cast("binary")),
                        F.lit(spec["n"]),
                    )
                    .cast("long")
                    .alias("b")
                )
                .distinct()
                .collect()
            ]
            idx = idx.filter(F.col(spec["dir_col"]).isin(bucket_ids))
        old = idx.select("fp", F.col("survivor_id").alias("__old_survivor"))
        batch_min = new_fp.groupBy("fp").agg(F.min(id_col).alias("__batch_survivor"))
        resolved = (
            new_fp.join(batch_min, "fp")
            .join(old, "fp", "left")
            .select(
                F.col(id_col),
                F.coalesce("__old_survivor", "__batch_survivor").alias("survivor_id"),
                (
                    F.col("__old_survivor").isNotNull()
                    | (F.col(id_col) != F.col("__batch_survivor"))
                ).alias("is_duplicate"),
            )
        )
        # index grows by the batch's genuinely-new fingerprints only
        fresh = (
            batch_min.join(old.select("fp"), "fp", "left_anti")
            .select("fp", F.col("__batch_survivor").alias("survivor_id"))
        )
        t.append(fresh)
        maybe_compact_index(spark, index_path, compact_every)
        return resolved
    finally:
        new_fp.unpersist()
