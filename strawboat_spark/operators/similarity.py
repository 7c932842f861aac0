"""Similarity search over embedding columns (SURVEY.md §2C ⊕).

Embeddings are ArrayType(FloatType) columns; all math happens in
JVM-side higher-order functions (zip_with/aggregate) — no Python UDF
in the scoring loop.

Two paths:
  cosine_topk            exact brute force: broadcast the (small) query
                         set against the corpus — each corpus row is
                         scored against Q queries map-side, then a
                         per-query top-k window. Linear scan, no
                         shuffle except the final top-k. The baseline.
  lsh_cosine_topk        scale path: random-hyperplane LSH — corpus and
                         queries bucketed by sign-bit key; candidates
                         only within matching buckets (multi-probe via
                         several independent tables), then exact rerank.
                         At 100 TB this turns a full scan per query
                         into |bucket| work.
"""

from __future__ import annotations

import threading

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window
from pyspark.sql.functions import broadcast


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def with_unit_vector(df: DataFrame, vec_col: str, out_col: str = "unit_vec") -> DataFrame:
    """Pre-normalize to unit length so cosine == dot (one pass, map-only).

    NOTE: prefer `_as_double` + per-pair `_cosine` in JVM scoring paths.
    Referencing the norm aggregate inside a `transform` lambda makes
    Catalyst re-evaluate the whole O(dim) fold per ELEMENT — O(dim²)
    per row. Kept for callers that ship vectors to numpy (which
    re-normalizes in one vectorized pass anyway).
    """
    v = _as_double(vec_col)
    n = _norm(v)
    return df.withColumn(out_col, F.transform(v, lambda x: x / n))


def _as_double(vec_col) -> F.Column:
    c = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    return F.transform(c, lambda x: x.cast("double"))


def _cosine(a, b, na, nb) -> F.Column:
    """Per-pair cosine from raw vectors + precomputed norm columns:
    dot/(|a||b|) costs 3·dim per pair instead of the dim² per row that
    normalize-inside-transform costs (see with_unit_vector note)."""
    return _dot(a, b) / (F.col(na) if isinstance(na, str) else na) / (
        F.col(nb) if isinstance(nb, str) else nb
    )


def _with_vec_norm(
    df: DataFrame, id_col: str, vec_col: str, id_alias: str, vec_alias: str, norm_alias: str
) -> DataFrame:
    """(id, raw double vector, precomputed L2 norm) — O(dim) per row."""
    v = _as_double(vec_col)
    return df.select(
        F.col(id_col).alias(id_alias), v.alias(vec_alias), _norm(v).alias(norm_alias)
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    corpus/queries: (id_col, vec_col). Queries are broadcast (the
    realistic shape: few queries against a huge corpus). Output:
    (query_id, neighbor_id, score, rank). Self-matches excluded.
    """
    c = _with_vec_norm(corpus, id_col, vec_col, "neighbor_id", "cv", "cn")
    q = _with_vec_norm(queries, id_col, vec_col, "query_id", "qv", "qn")
    scored = (
        c.join(broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .withColumn("score", F.round(_cosine("cv", "qv", "cn", "qn"), 6))
        .select("query_id", "neighbor_id", "score")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.normal(size=(n_planes, dim)).round(6).tolist()


def lsh_bucket_key(vec_col, planes: list[list[float]]):
    """Sign-bit bucket id from random hyperplanes (plan literals —
    deterministic, broadcast-free). Fine for a single small table;
    for multi-table keys use _bucket_keys_udf (constant plan size)."""
    key = F.lit(0).cast("bigint")
    for i, p in enumerate(planes):
        proj = _dot(F.col(vec_col) if isinstance(vec_col, str) else vec_col, F.array(*[F.lit(x) for x in p]))
        key = key + F.when(proj > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return key


def _bucket_keys_udf(planes_stack: list, n_planes: int):
    """All n_tables sign-bit bucket keys in ONE Arrow-batched matmul.
    Building each key from per-plane literal expressions costs
    n_tables x n_planes x dim literal nodes in the plan — seconds of
    codegen at 4x8x64; this stays milliseconds at any table count."""
    from pyspark.sql.functions import pandas_udf

    pmat = np.concatenate([np.asarray(p) for p in planes_stack], axis=0).T  # (dim, T*p)
    n_tables = len(planes_stack)
    weights = (1 << np.arange(n_planes)).astype(np.int64)

    @pandas_udf("array<bigint>")
    def keys(v: pd.Series) -> pd.Series:
        x = np.vstack(v.to_numpy())
        bits = (x @ pmat) > 0
        k = (bits.reshape(len(x), n_tables, n_planes) * weights).sum(axis=2)
        return pd.Series(list(k.astype(np.int64)))

    return keys


def _multiprobe_keys(keys: list[int] | np.ndarray, n_planes: int, radius: int) -> np.ndarray:
    """All bucket ids within Hamming distance `radius` of each table's
    key (standard multi-probe LSH: a near neighbor that disagrees on a
    plane or two lands one bit away, so probing the Hamming ball
    recovers it without more tables)."""
    from itertools import combinations

    flips = [0]
    for r in range(1, radius + 1):
        for bits in combinations(range(n_planes), r):
            m = 0
            for b in bits:
                m |= 1 << b
            flips.append(m)
    k = np.asarray(keys, dtype=np.int64)[:, None]
    return (k ^ np.asarray(flips, dtype=np.int64)[None, :]).reshape(len(keys), -1)


def lsh_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    dim: int = 64,
    n_planes: int = 8,
    n_tables: int = 4,
    seed: int = 42,
    multiprobe_radius: int = 2,
) -> DataFrame:
    """Approximate top-k: candidates from any of n_tables independent
    sign-bit buckets, exact cosine rerank within candidates.

    Recall grows with n_tables and multiprobe_radius (query-side
    Hamming-ball probing — the corpus is indexed ONCE per table; only
    the small broadcast query side fans out to the probe buckets).
    Cost per query is |probed buckets|, not |corpus|. Output schema
    matches cosine_topk.
    """
    c = _with_vec_norm(corpus, id_col, vec_col, "neighbor_id", "cv", "cn")
    q = _with_vec_norm(queries, id_col, vec_col, "query_id", "qv", "qn")
    keys = _bucket_keys_udf(
        [_hyperplanes(dim, n_planes, seed + t) for t in range(n_tables)], n_planes
    )
    # sign-bit keys are invariant under positive scaling, so raw vectors
    # hash to the same buckets as unit vectors
    ck = c.select("neighbor_id", "cv", "cn", F.posexplode(keys("cv")).alias("tbl", "bucket"))

    @F.pandas_udf("array<bigint>")
    def probe_ball(key: pd.Series) -> pd.Series:
        ball = _multiprobe_keys(key.to_numpy(), n_planes, multiprobe_radius)
        return pd.Series(list(ball))

    qk = (
        q.select("query_id", "qv", "qn", F.posexplode(keys("qv")).alias("tbl", "bucket0"))
        .select("query_id", "qv", "qn", "tbl", F.explode(probe_ball("bucket0")).alias("bucket"))
    )
    cands = (
        ck.join(broadcast(qk), ["tbl", "bucket"])
        .select("query_id", "neighbor_id", "cv", "qv", "cn", "qn")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cands.withColumn("score", F.round(_cosine("cv", "qv", "cn", "qn"), 6)).select(
        "query_id", "neighbor_id", "score"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


# Above this k, driver-side kmeans++ seeding (~10 ms x k, sequential)
# is the dominant training cost — _kmeans_centroids warns and points at
# kmeans_train_distributed.  r15 measured k=4096 as comfortably fine
# (1.4 s train); 50k is ~8 min of seeding alone.
_DRIVER_KMEANS_WARN_K = 8192


def _kmeans_centroids(
    df: DataFrame, vec_col: str, n_centroids: int, seed: int, sample_size: int = 2048, iters: int = 5
) -> list[list[float]]:
    """Coarse quantizer training: Lloyd iterations on a bounded driver
    sample (the standard IVF recipe — training is sample-based by
    design, so this stays O(sample) no matter the corpus size).

    The sample must be UNIFORM: `limit(n)` takes the first partitions,
    and real corpora are clustered by source/time, so limit-trained
    centroids describe one corner of the corpus and recall collapses.
    Tagging every row with an iid uniform priority and taking the
    global smallest `sample_size` (Catalyst compiles orderBy+limit to
    TakeOrderedAndProject: per-partition top-k, driver merge) is a
    simple random sample without replacement in ONE corpus pass — the
    previous count()+sample() recipe cost a full extra scan just to
    size the fraction.

    PAPER-SCALE SEAM (r16): the kmeans++ seeding loop below is
    Python-per-centroid and inherently sequential (~10 ms x k: each
    pick reweights d2 on the previous), and Lloyd holds the whole
    sample driver-side — at the SemDeDup paper's k=50k that is ~8 min
    of seeding alone.  Above _DRIVER_KMEANS_WARN_K this warns and
    points at kmeans_train_distributed, whose init is O(k) and whose
    Lloyd iterations are Spark passes."""
    # warn on the EFFECTIVE seeding cost: k >= sample collapses to the
    # identity shortcut below (no seeding loop at all), so only the
    # k < sample_size case pays the ~10 ms x k sequential loop
    if _DRIVER_KMEANS_WARN_K < n_centroids < sample_size:
        import warnings

        warnings.warn(
            f"_kmeans_centroids: n_centroids={n_centroids} runs a sequential "
            f"driver-side kmeans++ seeding loop (~10 ms per centroid); above "
            f"{_DRIVER_KMEANS_WARN_K} use kmeans_train_distributed (O(k) init, "
            "Spark-pass Lloyd) via kmeans_trainer='distributed' or pass "
            "pre-trained centroids.",
            RuntimeWarning,
            stacklevel=2,
        )
    rows = (
        df.select(vec_col)
        .withColumn("_priority", F.rand(seed))
        .orderBy("_priority")
        .limit(sample_size)
        .select(vec_col)
        .collect()
    )
    if not rows:
        return []
    x = np.array([r[0] for r in rows], dtype=np.float64)
    x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    # kmeans++ init: d^2-weighted seeding keeps every real cluster
    # covered; uniform-random init merges clusters on unlucky draws
    k = min(n_centroids, len(x))
    if k >= len(x):
        # every sample point is its own centroid: seeding would pick
        # all of them (in some order) and Lloyd converges immediately —
        # skip both. The seeding loop is Python-per-centroid (~10 ms
        # each), so at the k == sample_size cap this shortcut is the
        # difference between 19.5 s and instant (measured r14, k=2048).
        # SEMANTIC NOTE (r15, ADVICE r14): duplicate sample vectors
        # yield duplicate centroids here (sample order preserved),
        # where the kmeans++/Lloyd path could merge them. Benign for
        # all callers — IVF reranks exactly and SemDeDup partitions
        # are invariant under cell relabeling (stable argsort breaks
        # the tie the same way for every row) — but duplicate-heavy
        # corpora WILL see duplicate centroids at the cap; pinned by
        # test_kmeans_centroids_k_at_sample_cap_is_identity.
        return x.round(6).tolist()
    first = rng.integers(len(x))
    chosen = [first]
    d2 = np.maximum(1.0 - x @ x[first], 0.0) ** 2
    for _ in range(1, k):
        p = d2 / d2.sum() if d2.sum() > 0 else None
        nxt = int(rng.choice(len(x), p=p))
        chosen.append(nxt)
        d2 = np.minimum(d2, np.maximum(1.0 - x @ x[nxt], 0.0) ** 2)
    cent = x[chosen].copy()
    for _ in range(iters):
        sims = x @ cent.T
        assign = sims.argmax(axis=1)
        for c in range(len(cent)):
            members = x[assign == c]
            if len(members):
                m = members.mean(axis=0)
                cent[c] = m / max(np.linalg.norm(m), 1e-12)
    return cent.round(6).tolist()


def _draw_init_blobs(train, pack, k: int, n_train: int, seed: int, frac0: float | None = None):
    """Draw >= k init vectors as packed blobs via a Bernoulli filter
    sized k + 5*sqrt(k) + 16 (shortfall probability ~1e-6).  On a
    shortfall, DOUBLE the fraction and redraw rather than collecting
    the whole training set (ADVICE r16 — with sample_size=None at paper
    scale that full collect is exactly the driver blowup the trainer
    exists to avoid).  Same seed + larger threshold = a strict SUPERSET
    of the prior draw, so each retry makes progress and the result
    stays deterministic; frac reaches 1.0 (== the full set, the old
    fallback) only after ~log2(n/k) consecutive ~1e-6 misses.
    frac0 exists for tests to force the shortfall path."""
    frac = frac0 if frac0 is not None else min(1.0, (k + 5.0 * np.sqrt(k) + 16.0) / n_train)
    blobs = train.filter(F.rand(seed + 1) < frac).mapInPandas(pack, "b binary").collect()
    while len(blobs) < k and frac < 1.0:
        frac = min(1.0, frac * 2.0)
        blobs = train.filter(F.rand(seed + 1) < frac).mapInPandas(pack, "b binary").collect()
    return blobs


def kmeans_train_distributed(
    df: DataFrame,
    vec_col: str,
    n_centroids: int,
    seed: int = 42,
    iters: int = 4,
    sample_size: int | None = None,
    dtype: str | None = None,
    n_total: int | None = None,
    partial_dtype: str = "float64",
) -> list[list[float]]:
    """Paper-scale kmeans training (VERDICT r15 #4): spherical Lloyd
    where every iteration is ONE Spark pass over the training set —
    nothing driver-side ever scales past the centroid matrix itself.

    Why _kmeans_centroids can't go there: its kmeans++ seeding loop is
    Python-per-centroid (~10 ms x k, sequential by construction — each
    pick reweights on the previous) and its Lloyd matmul holds the whole
    sample driver-side.  At the SemDeDup paper's k=50k that's ~8 min of
    seeding before Lloyd starts.  This trainer replaces both:

    - init: k vectors drawn uniformly at random from the training set
      (rand-priority TakeOrdered, one pass; vectors cross as packed
      float64 blobs, never as driver Row objects).  Random init is the
      standard coarse-quantizer recipe at large k (faiss trains IVF
      quantizers the same way) — kmeans++'s seeding guarantee buys
      little when k is 4x+ the final Lloyd iteration count can fix, and
      it cannot be parallelized.
    - each Lloyd iteration: centroids ship via _ship_centroids (explicit
      once-per-executor broadcast above 4 MiB), a mapInPandas pass
      computes per-PARTITION partial sums per cell (dense batch matmul +
      np.add.at, emitted as (cell, pid, n, float64-blob) — at most
      partitions x touched-cells rows), a hash-repartition-by-cell +
      vectorized mapInPandas reduce (_reduce_cells; NOT groupBy
      .applyInPandas, whose per-group pandas overhead is ~1 ms x k per
      iteration) leaves exactly one row per non-empty cell, and the
      driver collects k rows ~ one centroid matrix to form the next
      round.  Partials are sorted by (cell, pid) before summing so the
      float accumulation order — and therefore the trained centroids —
      is deterministic despite nondeterministic shuffle arrival.
      Empty cells keep their previous centroid.

    Training is still sample-bounded by design (sample_size; None trains
    on the full df) — the point of the distributed form is that the
    bound can now be millions of rows and k can be the paper's 50k
    without a driver hot loop.  sample_size is a TARGET, not an exact
    count: sampling is a Bernoulli rand-filter (ONE map-only pass — a
    rand-priority TakeOrdered like _kmeans_centroids' would per-
    partition-heap and single-task-merge sample_size FAT vector rows,
    which measured minutes-stuck at 200k x 768), so the realized sample
    is binomial around the target (±~1% at 10k+).  Init draws k rows
    the same way (filter sized k + 5*sqrt(k) + 16, then a seeded
    driver-side permutation takes exactly k; shortfall probability
    ~1e-6, covered by a whole-sample fallback).  Assignment dtype
    follows _centroid_dtype(dtype); partial sums stay float64
    regardless.  Returns round(6) unit-norm centroids, same contract as
    _kmeans_centroids.

    Determinism: given the same seed AND the same input partitioning —
    F.rand is seeded per partition, so a repartitioned input draws a
    different (equally uniform) sample.  Same property as
    _kmeans_centroids' rand-priority sample; within one layout the
    whole train is reproducible (the (cell, pid) sort in _reduce_cells
    is what extends that through the shuffle).

    n_total: optional row-count hint that skips the sizing count() on
    expensive derived lineage (it only sizes the Bernoulli fraction, so
    an approximate hint just shifts the realized sample size).

    partial_dtype ("float64" default | "float32"): dtype of the
    per-partition partial-sum BLOBS crossing the one bounded shuffle —
    the dominant non-matmul cost per iteration (~the training-set bytes
    at paper k, where nearly every (partition, cell) pair is unique).
    float32 halves those shuffle bytes; in-partition accumulation and
    the reduce stay float64, so only the blob cast loses precision —
    training means tolerate it, but trained centroids then differ in
    low-order digits from a float64-blob run (each choice is
    individually deterministic under the same seed + layout)."""
    dt = _centroid_dtype(dtype)
    if partial_dtype not in ("float64", "float32"):
        raise ValueError(
            f"partial_dtype must be float64|float32, got {partial_dtype!r}"
        )
    pdt = np.dtype(partial_dtype)
    train = df.select(_as_double(vec_col).alias("__v"))
    if sample_size is not None:
        # Sizing the Bernoulli fraction costs one count() of the INPUT
        # lineage. On file sources that is a column-pruned metadata
        # count (cheap); on derived lineage (joins/transforms) it is a
        # real computation on top of the sampling pass — callers with
        # expensive upstream plans can pass n_total (a row-count hint,
        # exact or approximate — it only sizes the Bernoulli fraction,
        # so an off-by-2x hint just halves/doubles the realized sample),
        # persist df themselves, or pass sample_size=None (which trains
        # on df in one pass per Lloyd round with no sizing count).
        if n_total is None:
            n_total = train.count()
        if n_total <= 0:
            return []
        if sample_size < n_total:
            train = train.filter(F.rand(seed) < float(sample_size) / n_total)
    train = train.persist()
    try:
        n_train = train.count()  # materializes the persist
        if n_train == 0:
            return []
        k = min(int(n_centroids), n_train)

        def _pack(it):
            for pdf in it:
                if len(pdf):
                    vecs = np.vstack(pdf["__v"].to_numpy()).astype(np.float64)
                    yield pd.DataFrame({"b": [v.tobytes() for v in vecs]})

        init_blobs = _draw_init_blobs(train, _pack, k, n_train, seed)
        cent = np.vstack([np.frombuffer(r[0], np.float64) for r in init_blobs])
        cent = cent[np.random.default_rng(seed).permutation(len(cent))[:k]]
        cent /= np.maximum(np.linalg.norm(cent, axis=1, keepdims=True), 1e-12)
        k = len(cent)
        dim = cent.shape[1]

        def _reduce_cells(it):
            """Vectorized partial-sum reduce: one mapInPandas over
            hash-partitioned-by-cell partials.  A groupBy(cell)
            .applyInPandas here pays ~1 ms of pandas-group overhead PER
            CELL — ~50 s per iteration at paper k (measured r16); this
            form pays one lexsort + np.add.at per partition instead.
            Rows are materialized and sorted by (cell, pid) before
            summing so the float accumulation order is canonical —
            shuffle ARRIVAL order is not deterministic, and unsorted
            sums would make training runs differ in the last ulp."""
            frames = [pdf for pdf in it if len(pdf)]
            if not frames:
                return
            all_pdf = pd.concat(frames, ignore_index=True)
            cells = all_pdf["cell"].to_numpy()
            pids = all_pdf["pid"].to_numpy()
            ns = all_pdf["n"].to_numpy()
            # partial blobs arrive in partial_dtype; the reduce itself
            # accumulates in float64 (np.add.at upcasts), and the k-row
            # output blobs are always float64
            mat = np.frombuffer(b"".join(all_pdf["s"]), pdt).reshape(len(all_pdf), dim)
            order = np.lexsort((pids, cells))
            cells, ns, mat = cells[order], ns[order], mat[order]
            uniq, inv = np.unique(cells, return_inverse=True)
            sums = np.zeros((len(uniq), dim), dtype=np.float64)
            np.add.at(sums, inv, mat)
            counts = np.bincount(inv, weights=ns, minlength=len(uniq)).astype(np.int64)
            yield pd.DataFrame(
                {
                    "cell": uniq.astype(np.int32),
                    "n": counts,
                    "s": [s.tobytes() for s in sums],
                }
            )

        for _ in range(max(1, int(iters))):
            cmat, bc = _ship_centroids(np.ascontiguousarray(cent.astype(dt).T))

            def _partials(it, _cmat=cmat, _bc=bc):
                from pyspark import TaskContext

                m = _bc.value if _bc is not None else _cmat
                pid = TaskContext.get().partitionId()
                acc: dict[int, list] = {}
                for pdf in it:
                    if not len(pdf):  # empty Arrow batch (ADVICE r16):
                        continue      # np.vstack([]) raises ValueError
                    x = np.vstack(pdf["__v"].to_numpy()).astype(np.float64)
                    x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
                    a = (x.astype(m.dtype) @ m).argmax(axis=1)
                    uniq, inv = np.unique(a, return_inverse=True)
                    sums = np.zeros((len(uniq), x.shape[1]), dtype=np.float64)
                    np.add.at(sums, inv, x)
                    counts = np.bincount(inv, minlength=len(uniq))
                    for c, n, s in zip(uniq.tolist(), counts.tolist(), sums):
                        got = acc.get(c)
                        if got is None:
                            acc[c] = [n, s]
                        else:
                            got[0] += n
                            got[1] += s
                if acc:
                    cells = sorted(acc)
                    yield pd.DataFrame(
                        {
                            "cell": np.array(cells, dtype=np.int32),
                            "pid": np.full(len(cells), pid, dtype=np.int32),
                            "n": np.array([acc[c][0] for c in cells], dtype=np.int64),
                            "s": [acc[c][1].astype(pdt, copy=False).tobytes() for c in cells],
                        }
                    )

            rows = (
                train.mapInPandas(_partials, "cell int, pid int, n long, s binary")
                .repartition("cell")  # hash co-locates every cell's partials
                .mapInPandas(_reduce_cells, "cell int, n long, s binary")
                .collect()
            )
            new_cent = cent.copy()
            for r in rows:
                m = np.frombuffer(r["s"], np.float64) / max(r["n"], 1)
                new_cent[r["cell"]] = m / max(np.linalg.norm(m), 1e-12)
            cent = new_cent
            if bc is not None:
                try:
                    bc.unpersist(blocking=False)
                except Exception:
                    pass
                _untrack_bcast(bc)
        return cent.round(6).tolist()
    finally:
        train.unpersist()


def _train_centroids(
    df: DataFrame,
    vec_col: str,
    n_centroids: int,
    seed: int,
    sample_size: int,
    dtype: str | None,
    trainer: str,
    caller: str,
) -> list[list[float]]:
    """Shared kmeans_trainer dispatch for ivf_cosine_topk / semdedup /
    ivf_index_init: 'driver' = sample-collect kmeans++ + in-RAM Lloyd
    (wins below ~8k cells), 'distributed' = O(k) init + Spark-pass
    Lloyd (the paper-scale path)."""
    if trainer == "distributed":
        return kmeans_train_distributed(
            df, vec_col, n_centroids, seed=seed, sample_size=sample_size, dtype=dtype
        )
    if trainer == "driver":
        return _kmeans_centroids(df, vec_col, n_centroids, seed, sample_size=sample_size)
    raise ValueError(
        f"{caller}: kmeans_trainer must be driver|distributed, got {trainer!r}"
    )


def _centroid_dtype(dtype: str | None = None):
    """Matmul dtype for centroid assignment. float64 (default) keeps the
    assignment bit-identical to the SQL oracles' double arithmetic —
    every gate runs there. float32 is the documented paper-scale lever
    (Abbas et al. 2023 run 50k clusters at dim 768: 293 MiB float64 vs
    146 MiB float32) — it halves the broadcast and roughly doubles
    matmul throughput, at the price of possible argmax flips on
    near-tied cells (a cell-boundary perturbation, not an error:
    SemDeDup/IVF semantics only need a consistent partition, and
    assignment uses the SAME dtype for every row).

    r16 (ADVICE r15): dtype is an explicit PARAMETER threaded through
    every entry point (semdedup/ivf_*), same as kmeans_sample_size —
    the STRAWBOAT_CENTROID_DTYPE env var is only the default for
    callers that don't pass one, so toggling it no longer silently
    changes concurrently-built assignment UDFs."""
    import os

    d = dtype or os.environ.get("STRAWBOAT_CENTROID_DTYPE", "float64")
    if d not in ("float64", "float32"):
        raise ValueError(f"centroid dtype must be float64|float32, got {d!r}")
    return np.dtype(d)


# Above this size the centroid matrix ships as an explicit SparkContext
# broadcast (sent once per executor, referenced by every task) instead
# of riding each serialized task closure. Small matrices stay in the
# closure: the broadcast machinery costs a round of torrent blocks that
# only pays off once the matrix is real data.
_CENTROID_BCAST_MIN_BYTES = 4 << 20

# Live centroid Broadcast handles created by _ship_centroids, in
# creation order (r16 lifecycle, VERDICT r15 #5 / ADVICE r15): explicit
# broadcasts pin one executor-resident copy each (146 MiB at paper
# scale) for as long as they live — a long session issuing many
# paper-scale probe UDFs accumulates them unless reclaimed.  Each probe
# UDF carries its own `.release()`; `release_centroid_broadcasts()`
# reclaims everything outstanding session-wide.  unpersist (not
# destroy) is used, so a plan that still references a released
# broadcast re-fetches it from the driver — release is always safe.
_LIVE_CENTROID_BCASTS: list = []

# Guards every append/remove/pop on _LIVE_CENTROID_BCASTS (r17, VERDICT
# r16 watch): concurrent driver threads building probe UDFs while
# another calls release_centroid_broadcasts() could otherwise race the
# bare list ops (a pop loop dropping a handle appended mid-iteration).
# Single-driver sessions never contended; the lock just makes it boring.
_BCAST_LOCK = threading.Lock()


def _untrack_bcast(bc) -> None:
    """Remove one handle from the live registry (no-op if a concurrent
    release_centroid_broadcasts already reclaimed it)."""
    with _BCAST_LOCK:
        try:
            _LIVE_CENTROID_BCASTS.remove(bc)
        except ValueError:
            pass


def _ship_centroids(cmat: np.ndarray):
    """Pick the transport for a centroid matrix: task closure under
    _CENTROID_BCAST_MIN_BYTES, explicit SparkContext broadcast (sent
    once per executor) above it.  Returns (closure_mat, bc) — exactly
    one is non-None.  Falling back to closure transport at broadcast
    size (no active session) is numerically identical but ships the
    matrix with EVERY task, so it warns loudly instead of silently."""
    from pyspark.sql import SparkSession

    if cmat.nbytes < _CENTROID_BCAST_MIN_BYTES:
        return cmat, None
    spark = SparkSession.getActiveSession()
    if spark is None:
        import warnings

        warnings.warn(
            f"centroid matrix is {cmat.nbytes >> 20} MiB but no active "
            "SparkSession was found: falling back to task-closure "
            "transport, which re-ships the matrix with every task. "
            "Build the probe UDF while a session is active to get the "
            "once-per-executor broadcast.",
            RuntimeWarning,
            stacklevel=3,
        )
        return cmat, None
    bc = spark.sparkContext.broadcast(cmat)
    with _BCAST_LOCK:
        _LIVE_CENTROID_BCASTS.append(bc)
    return None, bc


def release_centroid_broadcasts() -> int:
    """Unpersist every outstanding explicit centroid broadcast created
    in this session (idempotent; returns how many were released).  Call
    after the jobs consuming semdedup/ivf_* results have completed to
    reclaim executor memory in long-lived sessions — released
    broadcasts are re-fetched from the driver if a lingering plan still
    needs them, so this never breaks correctness."""
    with _BCAST_LOCK:
        grabbed = _LIVE_CENTROID_BCASTS[:]
        _LIVE_CENTROID_BCASTS.clear()
    for bc in grabbed:
        try:
            bc.unpersist(blocking=False)
        except Exception:
            pass
    return len(grabbed)


def _probe_cells_udf(
    centroids: list[list[float]],
    nprobe: int,
    dtype: str | None = None,
    shipped: tuple | None = None,
):
    """Arrow-batched cell assignment: one numpy matmul per batch against
    the centroid matrix. Plan size is constant in n_centroids —
    centroid-as-plan-literal expressions blow up codegen (16 centroids x
    128 dims = 2048 literal nodes) and took 15s to compile at 16x128;
    this takes milliseconds. Stable argsort keeps probe order
    deterministic across runs.

    Transport: matrices under _CENTROID_BCAST_MIN_BYTES ride the task
    closure; larger ones (paper-scale cluster counts — 50k x 768 float32
    is 146 MiB) ship ONCE per executor as an explicit SparkContext
    broadcast. Identical numerics either way; the dtype (and therefore
    the gates' float64 exactness) is governed by _centroid_dtype(dtype).

    Lifecycle (r16): the returned UDF exposes
      .explicit_broadcast  — whether an explicit broadcast was created
                             (observed, not inferred from size math)
      .centroid_broadcast  — the Broadcast handle or None
      .release()           — unpersist it (idempotent, non-blocking)
    Explicit broadcasts are also tracked session-wide; see
    release_centroid_broadcasts().

    shipped: a (closure_mat, bc) pair from a prior _ship_centroids of
    the SAME (dim, k) matrix — lets several UDFs over one centroid set
    (e.g. ivf_cosine_topk's assign + probe) share a single
    executor-resident broadcast instead of pinning one copy each
    (ADVICE r16: 2 x 146 MiB at paper scale).  Shared-broadcast UDFs
    also share the release: .release() on any of them unpersists the
    one matrix (safe — released broadcasts re-fetch on demand)."""
    from pyspark.sql.functions import pandas_udf

    dt = _centroid_dtype(dtype)
    cmat, bc = (
        shipped
        if shipped is not None
        else _ship_centroids(np.asarray(centroids, dtype=dt).T)  # (dim, k)
    )

    @pandas_udf("array<int>")
    def _probe(v: pd.Series) -> pd.Series:
        m = bc.value if bc is not None else cmat
        x = np.vstack(v.to_numpy())  # (batch, dim)
        if m.dtype != x.dtype:
            x = x.astype(m.dtype)
        sims = x @ m
        if nprobe == 1:
            # argmax == first element of stable argsort(-sims) (both
            # take the FIRST occurrence of the max): O(k) instead of
            # O(k log k) per row — at paper-scale k (50k cells) the
            # sort costs more than the matmul's per-row share
            order = sims.argmax(axis=1)[:, None]
        else:
            order = np.argsort(-sims, axis=1, kind="stable")[:, :nprobe]
        return pd.Series(list(order.astype(np.int32)))

    def _release() -> None:
        if bc is not None:
            try:
                bc.unpersist(blocking=False)
            except Exception:
                pass
            _untrack_bcast(bc)

    _probe.explicit_broadcast = bc is not None
    _probe.centroid_broadcast = bc
    _probe.release = _release
    return _probe


def ivf_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    seed: int = 42,
    kmeans_sample_size: int = 2048,
    centroid_dtype: str | None = None,
    kmeans_trainer: str = "driver",
) -> DataFrame:
    """IVF (inverted-file) ANN: corpus partitioned into centroid cells;
    each query probes its nprobe nearest cells and reranks exactly.

    Scale shape: assignment is a map-side JVM expression (centroids are
    plan literals), the candidate join is an equi-join on cell id —
    per-query work is |probed cells|, not |corpus|. Recall is tunable
    via nprobe. Output schema matches cosine_topk. n_centroids above
    kmeans_sample_size collapses to one centroid per sample point (the
    training-cap shortcut); at paper-scale cell counts pass a sample a
    few x the cell count, or kmeans_trainer="distributed"
    (kmeans_train_distributed — O(k) init, Spark-pass Lloyd).
    centroid_dtype: float64 (default, oracle exact) | float32
    (paper-scale assignment lever).
    """
    cents = _train_centroids(
        corpus, vec_col, n_centroids, seed, kmeans_sample_size,
        centroid_dtype, kmeans_trainer, "ivf_cosine_topk",
    )
    # ONE shipment shared by both UDFs (ADVICE r16): assign1 and
    # probe_n otherwise each pin their own executor-resident broadcast
    # of the identical matrix (2 x 146 MiB at paper scale)
    shipped = _ship_centroids(
        np.asarray(cents, dtype=_centroid_dtype(centroid_dtype)).T
    )
    assign1 = _probe_cells_udf(cents, 1, dtype=centroid_dtype, shipped=shipped)
    # centroid argmax over x@C is invariant under positive scaling of x,
    # so raw vectors pick the same cells as unit vectors
    c = _with_vec_norm(corpus, id_col, vec_col, "neighbor_id", "cv", "cn")
    c = c.withColumn("cell", assign1("cv")[0])

    probe_n = _probe_cells_udf(cents, nprobe, dtype=centroid_dtype, shipped=shipped)
    q = _with_vec_norm(queries, id_col, vec_col, "query_id", "qv", "qn")
    qe = q.select("query_id", "qv", "qn", F.explode(probe_n("qv")).alias("cell"))
    scored = (
        c.join(broadcast(qe), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("score", F.round(_cosine("cv", "qv", "cn", "qn"), 6))
        .select("query_id", "neighbor_id", "score")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def cosine_neardup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    block_col: str,
    threshold: float = 0.95,
) -> DataFrame:
    """Embedding near-duplicate pairs above a cosine threshold, blocked
    by a coarse key (label/LSH bucket) so the pair join is never
    all-pairs. Output: (id_a, id_b, score)."""
    v = _as_double(vec_col)
    u = df.select(
        F.col(id_col), F.col(block_col).alias("blk"), v.alias("vec"), _norm(v).alias("nrm")
    )
    a, b = u.alias("a"), u.alias("b")
    return (
        a.join(b, (F.col("a.blk") == F.col("b.blk")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .withColumn("score", F.round(_cosine("a.vec", "b.vec", "a.nrm", "b.nrm"), 6))
        .filter(F.col("score") >= threshold)
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            "score",
        )
    )


def cosine_neardup_pairs_blas(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    block_col: str,
    threshold: float = 0.95,
) -> DataFrame:
    """BLAS twin of cosine_neardup_pairs: one chunked numpy matmul per
    block instead of a JVM fold per pair (~4x at dim 64; grows with
    dim). Same output and semantics — the threshold is applied to the
    UNROUNDED cosine (matching the SQL oracle), scores rounded to 6 dp.

    Each block is one applyInPandas group, so block size must fit one
    worker: the chunked matmul caps the score matrix at ~64 MB, and the
    O(block) vector rows themselves are the limit — at 100 TB, blocks
    should come from a bounded blocker (LSH bucket / label), the same
    contract the JVM variant has.
    """

    def pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf[id_col].to_numpy()
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        x = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)[order]
        x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        n = len(ids)
        chunk = max(16, min(1024, (64 << 20) // max(1, 8 * n)))
        outa, outb, outs = [], [], []
        for s in range(0, n, chunk):
            sims = x[s : s + chunk] @ x.T  # (c, n)
            ii, jj = np.nonzero(sims >= threshold)
            keep = jj > (ii + s)  # upper triangle: ids sorted => id_a < id_b
            ii, jj = ii[keep], jj[keep]
            outa.append(ids[ii + s])
            outb.append(ids[jj])
            outs.append(np.round(sims[ii, jj], 6))
        return pd.DataFrame(
            {
                "id_a": np.concatenate(outa) if outa else np.array([], dtype=ids.dtype),
                "id_b": np.concatenate(outb) if outb else np.array([], dtype=ids.dtype),
                "score": np.concatenate(outs) if outs else np.array([], dtype=np.float64),
            }
        )

    return (
        df.select(F.col(id_col), F.col(vec_col), F.col(block_col).alias("blk"))
        .groupBy("blk")
        .applyInPandas(pairs, schema="id_a long, id_b long, score double")
    )


def cosine_topk_vectorized(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    max_queries: int = 1024,
) -> DataFrame:
    """Brute-force top-k with BLAS scoring: the query set (small by
    assumption — capped) is collected and closure-captured; the corpus
    streams through mapInPandas in Arrow batches and each batch scores
    against ALL queries in one numpy matmul.

    Same semantics as cosine_topk (scores round-equal at 6 dp; max
    float deviation between BLAS and sequential fold measured at
    ~1e-16), ~10x less per-row overhead than the JVM higher-order
    fold at wide dimensions. Scale shape: map-side O(|corpus| x q)
    flops, then the same per-query top-k window.
    """
    q_rows = queries.select(F.col(id_col), F.col(vec_col).alias("v")).limit(max_queries).collect()
    q_ids = np.array([r[0] for r in q_rows])
    q_mat = np.array([r[1] for r in q_rows], dtype=np.float64)  # (q, dim)
    q_mat /= np.maximum(np.linalg.norm(q_mat, axis=1, keepdims=True), 1e-12)
    q_mat = q_mat.T  # (dim, q)

    def score(batches):
        for pdf in batches:
            x = np.vstack(pdf["v"].to_numpy()).astype(np.float64)  # (b, dim)
            x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
            sims = x @ q_mat  # (b, q)
            b, nq = sims.shape
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(q_ids[None, :], b, axis=0).ravel(),
                    "neighbor_id": np.repeat(pdf[id_col].to_numpy(), nq),
                    "score": np.round(sims.ravel(), 6),
                }
            )

    c = corpus.select(F.col(id_col), F.col(vec_col).alias("v"))
    scored = c.mapInPandas(
        score, schema="query_id long, neighbor_id long, score double"
    ).filter(F.col("neighbor_id") != F.col("query_id"))
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


# --------------------------------------------------------------------------
# Product quantization (PQ) ANN
# --------------------------------------------------------------------------


def _pq_codebooks(
    df: DataFrame,
    vec_col: str,
    m: int,
    n_codes: int,
    seed: int,
    sample_size: int = 2048,
    iters: int = 8,
) -> np.ndarray:
    """PQ codebook training (Jegou et al., the public PQ formulation):
    split the unit-normalized vector into m subvectors and k-means each
    subspace independently (L2, kmeans++ init). Same bounded one-pass
    rand-priority sample as the IVF coarse quantizer — O(sample)
    regardless of corpus size. Returns (m, n_codes, d/m)."""
    rows = (
        df.select(vec_col)
        .withColumn("_priority", F.rand(seed))
        .orderBy("_priority")
        .limit(sample_size)
        .select(vec_col)
        .collect()
    )
    x = np.array([r[0] for r in rows], dtype=np.float64)
    x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    d = x.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    rng = np.random.default_rng(seed)
    books = []
    for i in range(m):
        sub = np.ascontiguousarray(x[:, i * dsub : (i + 1) * dsub])
        k = min(n_codes, len(sub))
        # kmeans++ seeding in the subspace
        chosen = [int(rng.integers(len(sub)))]
        d2 = ((sub - sub[chosen[0]]) ** 2).sum(axis=1)
        for _ in range(1, k):
            p = d2 / d2.sum() if d2.sum() > 0 else None
            nxt = int(rng.choice(len(sub), p=p))
            chosen.append(nxt)
            d2 = np.minimum(d2, ((sub - sub[nxt]) ** 2).sum(axis=1))
        cent = sub[chosen].copy()
        for _ in range(iters):
            d2m = ((sub[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = d2m.argmin(axis=1)
            for c in range(len(cent)):
                members = sub[assign == c]
                if len(members):
                    cent[c] = members.mean(axis=0)
        books.append(cent.round(6))
    return np.stack(books)  # (m, n_codes, dsub)


def pq_encode(df: DataFrame, id_col: str, vec_col: str, books: np.ndarray) -> DataFrame:
    """(id, codes array<int>, unit vec, norm): encode each vector to m
    codebook indices — the 4*d-byte float vector compresses to m bytes,
    which is what makes billion-vector indexes fit in memory. Map-side
    Arrow-batched; no shuffle."""
    from pyspark.sql.functions import pandas_udf

    m, n_codes, dsub = books.shape

    @pandas_udf("array<int>")
    def encode(v: pd.Series) -> pd.Series:
        x = np.vstack(v.to_numpy()).astype(np.float64)
        x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        codes = np.empty((len(x), m), dtype=np.int32)
        for i in range(m):
            sub = x[:, i * dsub : (i + 1) * dsub]
            # argmin ||s - c||^2 == argmax (s.c - ||c||^2/2)
            scores = sub @ books[i].T - 0.5 * (books[i] ** 2).sum(axis=1)
            codes[:, i] = scores.argmax(axis=1)
        return pd.Series(list(codes))

    c = _with_vec_norm(df, id_col, vec_col, "neighbor_id", "cv", "cn")
    return c.withColumn("codes", encode("cv"))


def pq_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    m: int = 8,
    n_codes: int = 32,
    n_candidates: int = 100,
    max_queries: int = 1024,
    seed: int = 42,
) -> DataFrame:
    """PQ ANN with exact refinement: asymmetric-distance (ADC) scoring
    over the compressed codes selects n_candidates per query, then the
    ORIGINAL vectors rerank the candidates exactly for the final top-k
    (the IVF-PQ refinement recipe).

    Scale shape: codes are m bytes/vector (vs 4d float bytes), ADC is
    a per-batch table gather (one LUT per query, built once from the
    codebooks), each batch emits at most n_candidates rows per query —
    the shuffle is bounded by q x n_candidates x n_partitions, never
    |corpus|. Output schema matches cosine_topk."""
    books = _pq_codebooks(corpus, vec_col, m, n_codes, seed)
    coded = pq_encode(corpus, id_col, vec_col, books)

    q_rows = (
        queries.select(F.col(id_col), F.col(vec_col).alias("v")).limit(max_queries).collect()
    )
    q_ids = np.array([r[0] for r in q_rows])
    q_mat = np.array([r[1] for r in q_rows], dtype=np.float64)
    q_mat /= np.maximum(np.linalg.norm(q_mat, axis=1, keepdims=True), 1e-12)
    mm, n_c, dsub = books.shape
    # LUT[i, q, c] = q_sub_i . codebook_i[c]  -> adc(q, x) = sum_i LUT[i, q, code_i]
    lut = np.einsum("qid,icd->iqc", q_mat.reshape(len(q_mat), mm, dsub), books)

    def adc(batches):
        for pdf in batches:
            codes = np.vstack(pdf["codes"].to_numpy())  # (b, m)
            ids = pdf["neighbor_id"].to_numpy()
            b = len(ids)
            acc = np.zeros((b, len(q_ids)), dtype=np.float64)
            for i in range(mm):
                acc += lut[i][:, codes[:, i]].T  # (b, q)
            take = min(n_candidates, b)
            # per-query partial top within the batch bounds the shuffle
            part = np.argpartition(-acc, take - 1, axis=0)[:take]  # (take, q)
            qcol = np.repeat(q_ids[None, :], take, axis=0)
            yield pd.DataFrame(
                {
                    "query_id": qcol.ravel(),
                    "neighbor_id": ids[part].ravel(),
                    "adc": np.round(acc[part, np.arange(len(q_ids))[None, :]].ravel(), 6),
                }
            )

    cand = (
        coded.select("neighbor_id", "codes")
        .mapInPandas(adc, schema="query_id long, neighbor_id long, adc double")
        .filter(F.col("neighbor_id") != F.col("query_id"))
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("adc"), F.asc("neighbor_id"))
    shortlist = cand.withColumn("r", F.row_number().over(wq)).filter(
        F.col("r") <= n_candidates
    ).select("query_id", "neighbor_id")

    # exact rerank of the shortlist against the original vectors
    c = _with_vec_norm(corpus, id_col, vec_col, "n_id", "cv", "cn")
    q = _with_vec_norm(queries, id_col, vec_col, "q_id", "qv", "qn")
    scored = (
        shortlist.join(c, shortlist.neighbor_id == F.col("n_id"))
        .join(broadcast(q), shortlist.query_id == F.col("q_id"))
        .withColumn("score", F.round(_cosine("cv", "qv", "cn", "qn"), 6))
        .select("query_id", "neighbor_id", "score")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


# ---------------------------------------------------------------------------
# Incremental IVF index: a PERSISTENT inverted-file ANN index the corpus
# grows into, instead of re-partitioning every vector per query batch.
# ---------------------------------------------------------------------------


def seed_centroids(df: DataFrame, id_col: str, vec_col: str, n: int) -> DataFrame:
    """Deterministic centroid set: the n lowest-id rows' vectors, with
    cluster ordinal = their id rank.  SQL-replayable by construction
    (ORDER BY id LIMIT n + ROW_NUMBER), which is what makes the
    semdedup gate exact-oracle-checkable; kmeans centroids are the
    production default (semdedup(centroids="kmeans"))."""
    w = Window.orderBy(F.col(id_col).asc())
    return (
        df.orderBy(F.col(id_col).asc())
        .limit(n)
        .select(
            (F.row_number().over(w) - 1).alias("__cluster"),
            _as_double(vec_col).alias("__cvec"),
        )
        .withColumn("__cnrm", _norm(F.col("__cvec")))
    )


def semdedup(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    n_clusters: int = 16,
    threshold: float = 0.95,
    centroids: str = "kmeans",
    seed: int = 42,
    max_cluster_droppers: int | None = None,
    kmeans_sample_size: int = 2048,
    centroid_dtype: str | None = None,
    kmeans_trainer: str = "driver",
    cache_assignments: bool | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning
    at web-scale through semantic deduplication"): cluster the corpus
    embeddings into n_clusters cells, then WITHIN each cell drop every
    item that has a higher-priority near-duplicate at cosine >=
    threshold.  Priority is ascending id (deterministic; the paper
    keeps the member farthest from the centroid — same neighborhoods,
    different representative, noted as a deviation).  The drop rule is
    non-recursive — x drops iff SOME smaller-id same-cell y has
    cos(x, y) >= threshold, whether or not y itself survives — so the
    result is order-independent and exactly SQL-replayable.

    Returns (id, cluster, kept, dup_of, score): dup_of = the smallest
    dominating id (null when kept), score = cosine to it, rounded 6.

    Scale shape: pairs form ONLY inside a cell via an equi-join on the
    cluster id — never all-pairs; per-cell cost is |cell|^2, tuned by
    n_clusters (the paper runs 50k clusters at web scale).
    `max_cluster_droppers` bounds the join's build side per cell (the
    cap-lowest ids keep dropping power; beyond-cap members can still BE
    dropped but not drop others — the lsh_candidate_pairs cap
    discipline, documented recall caveat).  `cache_assignments`
    (both modes; default auto = on only for broadcast-sized kmeans
    centroid matrices, so the gate path is unchanged) persists the
    assigned corpus AND materializes it eagerly (one map-only job at
    call time — the only eager side effect in this builder) so the
    drop-rule self-join doesn't re-run the assignment on each of its
    four branches (droppers, dominated, output, dup_of lookup) — at
    paper k that re-computation is ~2x the whole assignment cost, and
    lazy persist alone loses the saving to concurrent-branch-stage
    races (both measured r16).  Centroid assignment:
    "kmeans" trains on a bounded 2048-row sample (_kmeans_centroids)
    and assigns with one Arrow-batched matmul per batch; "seed" uses
    the n lowest-id vectors and a broadcast join + window argmax — all
    JVM, which is what the exact-oracle gate replays.
    """
    u = df.select(
        F.col(id_col).alias("__id"),
        _as_double(vec_col).alias("__v"),
    ).withColumn("__n", _norm(F.col("__v")))

    if centroids == "seed":
        cent = seed_centroids(df, id_col, vec_col, n_clusters)
        scored = u.crossJoin(broadcast(cent)).withColumn(
            "__s", _cosine("__v", "__cvec", "__n", "__cnrm")
        )
        wa = Window.partitionBy("__id").orderBy(
            F.desc("__s"), F.asc("__cluster")
        )
        assigned = (
            scored.withColumn("__rn", F.row_number().over(wa))
            .filter(F.col("__rn") == 1)
            .select("__id", "__v", "__n", "__cluster")
        )
    elif centroids == "kmeans":
        # paper-scale note (r15): training is sample-bounded, so
        # n_clusters above kmeans_sample_size collapses to one centroid
        # per sample point (the _kmeans_centroids cap shortcut). At
        # 50k-cluster scale pass kmeans_sample_size >= a few x n_clusters
        # — or kmeans_trainer="distributed", whose Lloyd iterations run
        # as Spark passes (see kmeans_train_distributed) and whose init
        # cost is O(k) instead of the driver kmeans++ loop's ~10 ms x k.
        cents = _train_centroids(
            df, vec_col, n_clusters, seed, kmeans_sample_size,
            centroid_dtype, kmeans_trainer, "semdedup",
        )
        assign1 = _probe_cells_udf(cents, 1, dtype=centroid_dtype)
        assigned = u.withColumn("__cluster", assign1("__v")[0])
        if cache_assignments is None:
            # auto: cache exactly when assignment is the expensive leg —
            # the same >= 4 MiB centroid matrix signal that triggers the
            # explicit broadcast
            ncells = len(cents)
            dim0 = len(cents[0]) if ncells else 0
            itemsize = _centroid_dtype(centroid_dtype).itemsize
            cache_assignments = ncells * dim0 * itemsize >= _CENTROID_BCAST_MIN_BYTES
    else:
        raise ValueError(f"semdedup: centroids must be kmeans|seed, got {centroids!r}")

    # The drop-rule self-join consumes `assigned` on FOUR branches
    # (droppers, dominated, output, and the dup_of vector lookup below)
    # and the assignment computation sits below every exchange, so
    # without a cache it re-runs per branch (measured: k=4096 full leg
    # 105 s ≈ 3 x 25 s assign + 30 s pairs; k=50k ≈ 3 x 150 s + pairs).
    # Applies to BOTH modes (seed-mode's crossJoin + window assignment
    # recomputes too); auto only turns it on for broadcast-sized kmeans
    # matrices, so the exact-oracle gate path is unchanged by default.
    # The persisted set spills to executor disk past memory (standard
    # MEMORY_AND_DISK); cache_assignments=False opts out, True forces.
    # Lifetime is CALLER-OWNED (the returned DataFrame still references
    # the cache, so there is no safe unpersist hook here): reclaimed by
    # LRU eviction, spark.catalog.clearCache(), or session end — same
    # contract as minhash_lsh_dedup's signature persist.
    #
    # The count() MATERIALIZES the cache eagerly (one map-only job at
    # call time — a deliberate, documented side effect): a lazy persist
    # alone does not dedupe the work, because the self-join's branch
    # stages are independent and AQE submits them CONCURRENTLY — each
    # races to compute the same uncached partitions before any cache
    # lands, and the saving becomes schedule-dependent (measured r16 at
    # k=50k: 811 s on a run where the cache won the race, 1023 s ≈ the
    # uncached 1029 s on a run where it lost).  Population first, then
    # every branch reads the cache.
    if cache_assignments:
        assigned = assigned.persist()
        assigned.count()

    droppers = assigned
    if max_cluster_droppers is not None:
        wc = Window.partitionBy("__cluster").orderBy(F.asc("__id"))
        droppers = (
            assigned.withColumn("__crn", F.row_number().over(wc))
            .filter(F.col("__crn") <= max_cluster_droppers)
            .drop("__crn")
        )
    b = droppers.select(
        F.col("__cluster"),
        F.col("__id").alias("__yid"),
        F.col("__v").alias("__yv"),
        F.col("__n").alias("__yn"),
    )
    dominated = (
        assigned.join(b, "__cluster")
        .filter(F.col("__yid") < F.col("__id"))
        .withColumn("__s", F.round(_cosine("__v", "__yv", "__n", "__yn"), 6))
        .filter(F.col("__s") >= threshold)
        .groupBy("__id")
        .agg(F.min("__yid").alias("dup_of"))
    )
    out = (
        assigned.join(dominated, "__id", "left")
        .join(
            # vector lookup for dup_of rows: read from `assigned`, not
            # `u` — u is a fresh source scan that would sit OUTSIDE the
            # assignment cache (a fourth full corpus scan per action at
            # paper scale); assigned carries the same (__id, __v, __n)
            assigned.select(
                F.col("__id").alias("dup_of"), F.col("__v").alias("__dv"), F.col("__n").alias("__dn")
            ),
            "dup_of",
            "left",
        )
        .select(
            F.col("__id").alias("id"),
            F.col("__cluster").cast("int").alias("cluster"),
            F.col("dup_of").isNull().alias("kept"),
            "dup_of",
            F.when(
                F.col("dup_of").isNotNull(),
                F.round(_cosine("__v", "__dv", "__n", "__dn"), 6),
            ).alias("score"),
        )
    )
    return out


def ivf_index_init(
    spark,
    index_path: str,
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    n_centroids: int = 16,
    seed: int = 42,
    kmeans_sample_size: int = 2048,
    centroid_dtype: str | None = None,
    kmeans_trainer: str = "driver",
):
    """Build the persistent IVF index: vectors land hive-partitioned by
    their nearest-centroid cell (so a search's nprobe cells prune to
    directories at PLANNING time), and the trained centroids ride the
    table's manifest properties — searches and appends never retrain.

    The 100 TB shape: ingest batches append into their cells (one CAS
    flip), a query batch reads only nprobe/n_centroids of the index,
    and the quantizer is versioned WITH the data it partitioned.
    n_centroids above kmeans_sample_size collapses to the training-cap
    shortcut — pass a sample a few x the cell count at paper scale, or
    kmeans_trainer="distributed" for Spark-pass Lloyd iterations with
    O(k) init (kmeans_train_distributed)."""
    import json

    from strawboat_spark.table import Table

    cents = _train_centroids(
        corpus, vec_col, n_centroids, seed, kmeans_sample_size,
        centroid_dtype, kmeans_trainer, "ivf_index_init",
    )
    assign1 = _probe_cells_udf(cents, 1, dtype=centroid_dtype)
    rows = corpus.select(
        F.col(id_col), _as_double(vec_col).alias("vec")
    ).withColumn("cell", assign1("vec")[0].cast("int"))
    t = Table(spark, index_path)
    try:
        t.overwrite(
            rows,
            partition_by="cell",
            manifest_properties=json.dumps(
                {"ivf_centroids": [[float(x) for x in c] for c in cents]}
            ),
        )
    finally:
        # the write is eager — the assignment UDF's broadcast (if any)
        # has served its jobs by the time overwrite returns
        assign1.release()
    return t


def _ivf_index_centroids(index_path: str) -> list[list[float]]:
    from strawboat_spark.sources.datasource import read_manifest

    props = (read_manifest(index_path) or {}).get("properties") or {}
    cents = props.get("ivf_centroids")
    if not cents:
        raise ValueError(
            f"{index_path} is not an IVF index (no ivf_centroids property); "
            f"build it with ivf_index_init"
        )
    return cents


def ivf_index_append(
    spark,
    index_path: str,
    new_vecs: DataFrame,
    id_col: str,
    vec_col: str,
    centroid_dtype: str | None = None,
):
    """Assign a new batch to the index's EXISTING cells (the quantizer
    from the manifest — no retrain, so old cells stay valid) and append
    in one CAS flip."""
    from strawboat_spark.table import Table

    cents = _ivf_index_centroids(index_path)
    assign1 = _probe_cells_udf(cents, 1, dtype=centroid_dtype)
    rows = new_vecs.select(
        F.col(id_col), _as_double(vec_col).alias("vec")
    ).withColumn("cell", assign1("vec")[0].cast("int"))
    try:
        Table(spark, index_path).append(rows, partition_by="cell")
    finally:
        assign1.release()


def ivf_index_search(
    spark,
    index_path: str,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    nprobe: int = 4,
    centroid_dtype: str | None = None,
) -> DataFrame:
    """Top-k cosine search against the persistent index: queries probe
    their nprobe nearest cells, the index scan prunes to those cell
    DIRECTORIES (bounded metadata collect, <= n_centroids values), and
    candidates rerank exactly.  Output schema matches cosine_topk."""
    from strawboat_spark.table import Table

    cents = _ivf_index_centroids(index_path)
    probe_n = _probe_cells_udf(cents, nprobe, dtype=centroid_dtype)
    q = _with_vec_norm(queries, id_col, vec_col, "query_id", "qv", "qn")
    qe = q.select(
        "query_id", "qv", "qn", F.explode(probe_n("qv")).alias("cell")
    ).withColumn("cell", F.col("cell").cast("int")).persist()
    try:
        # bounded: distinct probed cells <= n_centroids
        cells = [r[0] for r in qe.select("cell").distinct().collect()]
        idx = (
            Table(spark, index_path)
            .read()
            .filter(F.col("cell").isin(cells))  # hive directory pruning
        )
        c = idx.select(
            F.col(id_col).alias("neighbor_id"),
            F.col("vec").alias("cv"),
            _norm(F.col("vec")).alias("cn"),
            "cell",
        )
        scored = (
            c.join(broadcast(qe), "cell")
            .filter(F.col("neighbor_id") != F.col("query_id"))
            .withColumn("score", F.round(_cosine("cv", "qv", "cn", "qn"), 6))
            .select("query_id", "neighbor_id", "score")
        )
        w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
        return (
            scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
            .filter(F.col("rank") <= k)
            .orderBy("query_id", "rank")
        )
    finally:
        qe.unpersist()
