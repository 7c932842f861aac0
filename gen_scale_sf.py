"""Generate a larger scale factor from the driver testdata by
deterministic replication — the sf1 measurement input for BASELINE.md's
scaling table (VERDICT r7 item: convert the 100x design arguments into
measured scaling).

Each replica r offsets every key column by (max_key + 1) * r, so key
cardinalities, join fan-outs and group counts scale linearly with the
replication factor, like a larger TPC-H scale factor (customers, parts
and suppliers grow with SF; nation/region stay fixed).  Document text
gets a per-replica token appended so near-dup pipelines see 10x the
corpus, not 10 identical copies of it (which would degenerate every
minhash bucket); embeddings keep their values (ANN cost is
row-count-bound, value-independent).

Usage:  python gen_scale_sf.py [--src /root/testdata/sf0.1] \
            [--dst /tmp/strawboat_sf1] [--factor 10]
"""

from __future__ import annotations

import argparse
import os


def generate(src: str, dst: str, factor: int) -> None:
    import duckdb

    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 8}")

    def copy(sql: str, name: str) -> None:
        con.execute(
            f"COPY ({sql}) TO '{dst}/{name}.parquet' (FORMAT PARQUET, "
            f"COMPRESSION ZSTD)"
        )
        n = con.sql(f"SELECT COUNT(*) FROM '{dst}/{name}.parquet'").fetchone()[0]
        print(f"{name}: {n} rows")

    def mx(table: str, col: str) -> int:
        return con.sql(
            f"SELECT MAX({col}) + 1 FROM '{src}/{table}.parquet'"
        ).fetchone()[0]

    rep = f"(SELECT UNNEST(RANGE({factor})) AS r) reps"
    ok, ck, pk, sk = (
        mx("orders", "o_orderkey"),
        mx("customer", "c_custkey"),
        mx("part", "p_partkey"),
        mx("supplier", "s_suppkey"),
    )

    # fixed dimensions: nation/region do not grow with SF in TPC-H
    for t in ("nation", "region"):
        copy(f"SELECT * FROM '{src}/{t}.parquet'", t)

    copy(
        f"SELECT c_custkey + r * {ck} AS c_custkey, c_name, c_nationkey, "
        f"c_acctbal, c_mktsegment FROM '{src}/customer.parquet', {rep}",
        "customer",
    )
    copy(
        f"SELECT s_suppkey + r * {sk} AS s_suppkey, s_name, s_nationkey, "
        f"s_acctbal FROM '{src}/supplier.parquet', {rep}",
        "supplier",
    )
    copy(
        f"SELECT p_partkey + r * {pk} AS p_partkey, p_name, p_brand, p_type, "
        f"p_size, p_retailprice "
        f"FROM '{src}/part.parquet', {rep}",
        "part",
    )
    copy(
        f"SELECT o_orderkey + r * {ok} AS o_orderkey, "
        f"o_custkey + r * {ck} AS o_custkey, o_orderstatus, o_totalprice, "
        f"o_orderdate, o_orderpriority FROM '{src}/orders.parquet', {rep}",
        "orders",
    )
    copy(
        f"SELECT l_orderkey + r * {ok} AS l_orderkey, "
        f"l_partkey + r * {pk} AS l_partkey, "
        f"l_suppkey + r * {sk} AS l_suppkey, l_linenumber, l_quantity, "
        f"l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, "
        f"l_shipdate FROM '{src}/lineitem.parquet', {rep}",
        "lineitem",
    )

    ek, uk = mx("events", "event_id"), mx("events", "user_id")
    copy(
        f"SELECT event_id + r * {ek} AS event_id, ts, "
        f"user_id + r * {uk} AS user_id, event_type, value, props "
        f"FROM '{src}/events.parquet', {rep}",
        "events",
    )

    dk = mx("documents", "doc_id")
    copy(
        f"SELECT doc_id + r * {dk} AS doc_id, "
        f"CASE WHEN r = 0 THEN text "
        f"     ELSE text || ' replica' || r || 'tok' || (doc_id % 97) END AS text, "
        f"lang, source, "
        f"CAST(CASE WHEN r = 0 THEN n_chars "
        f"     ELSE n_chars + LENGTH(' replica' || r || 'tok' || (doc_id % 97)) "
        f"END AS BIGINT) AS n_chars "
        f"FROM '{src}/documents.parquet', {rep}",
        "documents",
    )

    vk = mx("embeddings", "vec_id")
    copy(
        f"SELECT vec_id + r * {vk} AS vec_id, embedding, label "
        f"FROM '{src}/embeddings.parquet', {rep}",
        "embeddings",
    )


def generate_wide_embeddings(
    dst: str,
    rows: int = 200_000,
    dim: int = 768,
    n_latent: int = 4096,
    dup_rate: float = 0.05,
    seed: int = 42,
    name: str | None = None,
    noise: float = 0.25,
) -> None:
    """Paper-dims embeddings fixture (r15, VERDICT r14 #2): the driver
    testdata embeddings are dim 64, which understates the centroid
    broadcast SemDeDup/IVF ship at Abbas et al. 2023 scale (dim 768:
    50k clusters = 293 MiB float64 / 146 MiB float32).  This writes
    `embeddings{dim}.parquet` with the SAME schema as the testdata
    table (vec_id int64, embedding list<float>, label int32) so
    load_table/bench_semdedup run unchanged against it.

    Structure matters for an honest SemDeDup measurement: vectors are
    latent-center + noise (n_latent true clusters, so kmeans has
    something to find) and dup_rate of rows COPY THE PREVIOUS ROW's
    vector with a tiny perturbation (cosine >= ~0.99, so the threshold
    actually drops rows) and INHERIT that row's latent cell/label, so
    label-conditioned analyses stay consistent with the embedding
    (r16, ADVICE r15 — previously the dup kept its own id-derived
    label while carrying the neighbor's vector).  The chunk-boundary
    guard (base >= lo) is DEFENSIVE: at the defaults the dup period
    round(1/dup_rate)=20 divides the 20k chunk, chunks start at
    id ≡ 0 (mod 20), so a dup row (id ≡ 1) is never chunk-initial and
    the effective dup rate is exactly dup_rate; the guard only bites
    for dup_rates whose period doesn't divide the chunk.  Deterministic
    in (seed, rows, dim); written in 20k-row chunks so peak memory
    stays ~60 MB at dim 768."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(dst, exist_ok=True)
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_latent, dim)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    out = os.path.join(dst, name or f"embeddings{dim}.parquet")
    schema = pa.schema(
        [
            ("vec_id", pa.int64()),
            ("embedding", pa.list_(pa.float32())),
            ("label", pa.int32()),
        ]
    )
    chunk = 20_000
    writer = pq.ParquetWriter(out, schema, compression="zstd")
    try:
        for lo in range(0, rows, chunk):
            hi = min(lo + chunk, rows)
            ids = np.arange(lo, hi, dtype=np.int64)
            cell = (ids * np.int64(2654435761)) % n_latent
            # per-dim noise scale: at the 0.25 default the noise NORM is
            # 0.25*sqrt(dim) (~6.9 at dim 768, ~87% of the vector) — a
            # stress fixture where generic neighbors are noise-driven.
            # noise ~0.02 keeps the latent structure dominant (norm
            # ~0.55), the regime where generic ANN recall is meaningful.
            vec = centers[cell] + rng.normal(size=(hi - lo, dim)).astype(np.float32) * noise
            # near-duplicates: a dup row copies the PREVIOUS row's
            # vector (slightly perturbed) and inherits its latent cell,
            # keeping label consistent with the embedding; chunk-initial
            # dups (base before lo) are skipped
            is_dup = (ids % max(2, round(1 / dup_rate))) == 1
            dup_j = np.flatnonzero(is_dup & (ids - 1 >= lo))
            for j in dup_j:
                vec[j] = vec[j - 1] + rng.normal(size=dim).astype(np.float32) * 0.01
            cell[dup_j] = cell[dup_j - 1]
            tbl = pa.table(
                {
                    "vec_id": ids,
                    "embedding": pa.array(list(vec), type=pa.list_(pa.float32())),
                    "label": (cell % 100).astype(np.int32),
                },
                schema=schema,
            )
            writer.write_table(tbl)
    finally:
        writer.close()
    n = pq.ParquetFile(out).metadata.num_rows
    print(f"{os.path.basename(out)}: {n} rows, dim {dim}, {n_latent} latent cells")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default="/tmp/strawboat_sf1")
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument(
        "--wide-dim",
        type=int,
        default=0,
        help="also write an embeddings{dim}.parquet paper-dims fixture "
        "(e.g. 768); 0 = skip",
    )
    ap.add_argument("--wide-rows", type=int, default=200_000)
    ap.add_argument("--wide-noise", type=float, default=0.25)
    ap.add_argument("--wide-name", default=None)
    ap.add_argument("--wide-only", action="store_true",
                    help="write only the wide-embeddings fixture")
    a = ap.parse_args()
    if not a.wide_only:
        generate(a.src, a.dst, a.factor)
    if a.wide_dim:
        generate_wide_embeddings(
            a.dst, rows=a.wide_rows, dim=a.wide_dim,
            noise=a.wide_noise, name=a.wide_name,
        )
