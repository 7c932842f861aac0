"""Iterative graph algorithms over derived edge tables (SURVEY.md §2C
⊕ — joins operators/dedup.py's connected components).

PageRank here runs in EXACT integer fixed-point arithmetic
(micro-units of SCALE = 1e12): every per-iteration quantity is a
bigint produced by integer division, so the distributed computation
is bit-reproducible and a SQL oracle can replay the iterations as
chained CTEs — the hash-match treatment usually impossible for
float iterative algorithms (summation order would drift the
low bits; integer sums are exact under any order).

Scale shape per iteration: one shuffle (contributions grouped by
destination) + a 1-row dangling-mass aggregate broadcast; ranks
persist each round and unpersist the previous (the classic
distributed PageRank loop). Driver traffic per round is zero rows —
the dangling scalar stays in the plan as a broadcast cross join.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.functions import broadcast

SCALE = 1_000_000_000_000  # integer micro-units: 1.0 of rank mass


def pagerank_fixed_point(
    nodes: DataFrame,  # (node bigint)
    edges: DataFrame,  # (src bigint, dst bigint), deduplicated
    n_iterations: int = 3,
    damping_pct: int = 85,
) -> DataFrame:
    """(node, rank) after n_iterations of damped PageRank in integer
    fixed point. rank_0 = SCALE div N; each round:

        share(u)   = rank(u) div outdeg(u)          (u with out-edges)
        dang       = sum(rank(u) : outdeg(u) = 0) div N
        rank'(v)   = ((100-d) * (SCALE div N)) div 100
                   + (d * (sum_in(v) + dang)) div 100

    All divisions are integer `div` on non-negative bigints, so Spark
    and any SQL engine agree exactly."""
    n_nodes = nodes.count()  # bounded scalar: the graph's node count
    base = SCALE // n_nodes
    # edges and outdeg are re-read every iteration (contribs + dangling
    # test x n_iterations); without persistence the caller's edge
    # lineage — often a fact-table join + distinct — would re-execute
    # up to 2 x n_iterations times.
    edges = edges.persist()
    outdeg = edges.groupBy(F.col("src").alias("od_node")).agg(
        F.count(F.lit(1)).alias("outdeg")
    ).persist()
    ranks = nodes.select("node", F.lit(base).cast("bigint").alias("rank")).persist()
    ranks.count()
    for _ in range(n_iterations):
        with_deg = ranks.join(outdeg, ranks.node == F.col("od_node"), "left").select(
            "node", "rank", "outdeg"
        )
        dang = with_deg.filter(F.col("outdeg").isNull()).agg(
            F.coalesce(F.sum("rank"), F.lit(0)).alias("__dang_total")
        )
        contribs = (
            with_deg.filter(F.col("outdeg").isNotNull())
            .join(edges, F.col("node") == edges.src)
            .select(
                F.col("dst").alias("in_node"),
                F.expr("rank div outdeg").alias("share"),
            )
            .groupBy("in_node")
            .agg(F.sum("share").alias("sum_in"))
        )
        nxt = (
            ranks.select("node")
            .join(contribs, F.col("node") == F.col("in_node"), "left")
            .join(broadcast(dang))  # 1-row scalar
            .select(
                "node",
                (
                    F.lit((100 - damping_pct) * base // 100).cast("bigint")
                    + F.expr(
                        f"({damping_pct} * (coalesce(sum_in, 0)"
                        f" + (__dang_total div {n_nodes}))) div 100"
                    )
                ).alias("rank"),
            )
            .persist()
        )
        nxt.count()
        ranks.unpersist()
        ranks = nxt
    # ranks is materialized (count above), so the inputs can release
    edges.unpersist()
    outdeg.unpersist()
    return ranks


def cooccurrence_edges(
    df, group_col: str, item_col: str, min_weight: int = 1, max_group_size: int = 256
):
    """Undirected co-occurrence edges: items sharing a group, weighted
    by the number of shared groups, edge kept if weight >= min_weight.

    Spark-first: ONE shuffle — groupBy(group) collects each group's
    distinct sorted items and expands ordered pairs with higher-order
    functions inside the aggregation row (the lsh_candidate_pairs
    shape), instead of the naive self-join that shuffles the fact
    table twice. Groups larger than max_group_size are truncated to
    the smallest ids (deterministic) — a group of B items yields B^2/2
    pairs, and a degenerate mega-group (viral order, boilerplate doc)
    must not quadratically explode the expansion. Output: (src, dst,
    weight), src < dst."""
    import pyspark.sql.functions as F

    members = df.groupBy(F.col(group_col).alias("g")).agg(
        F.slice(F.array_sort(F.collect_set(item_col)), 1, max_group_size).alias("ids")
    )
    pairs = F.flatten(
        F.transform(
            F.col("ids"),
            lambda x, i: F.transform(
                F.slice(F.col("ids"), i + 2, F.greatest(F.size("ids") - i - 1, F.lit(0))),
                lambda y: F.struct(x.alias("src"), y.alias("dst")),
            ),
        )
    )
    return (
        members.filter(F.size("ids") >= 2)
        .select(F.explode(pairs).alias("p"))
        .groupBy("p.src", "p.dst")
        .agg(F.count(F.lit(1)).alias("weight"))
        .filter(F.col("weight") >= min_weight)
    )


def degree_oriented_edges(edges):
    """Orient an undirected (src, dst) edge list from the LOWER-ranked
    to the HIGHER-ranked endpoint, rank = (degree, id).  This is the
    classic arboricity bound (Chiba–Nishizeki): every node's oriented
    out-degree is O(sqrt(m)), so the wedge expansion in
    triangle_counts is bounded per node no matter how large a hub's
    raw degree is — id-order orientation lets one mid-id hub generate
    O(deg^2) wedge candidates at scale.  Output: (u, v, vdeg) with
    rank(u) < rank(v); vdeg carried so wedge ordering needs no extra
    join."""
    import pyspark.sql.functions as F

    e = edges.select("src", "dst")
    deg = (
        e.select(F.col("src").alias("node"))
        .unionAll(e.select(F.col("dst").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    ed = e.join(deg.select(F.col("node").alias("src"), F.col("deg").alias("sdeg")), "src").join(
        deg.select(F.col("node").alias("dst"), F.col("deg").alias("ddeg")), "dst"
    )
    src_first = (F.col("sdeg") < F.col("ddeg")) | (
        (F.col("sdeg") == F.col("ddeg")) & (F.col("src") < F.col("dst"))
    )
    return ed.select(
        F.when(src_first, F.col("src")).otherwise(F.col("dst")).alias("u"),
        F.when(src_first, F.col("dst")).otherwise(F.col("src")).alias("v"),
        F.when(src_first, F.col("ddeg")).otherwise(F.col("sdeg")).alias("vdeg"),
    )


def triangle_counts(edges):
    """Per-node triangle participation counts from an (src, dst)
    edge list with src < dst, via DEGREE-ORDERED orientation: each
    triangle has exactly one node with two out-edges under the
    (degree, id) total order, so wedges (u -> v, u -> w, rank v <
    rank w) joined against the oriented edge v -> w enumerate each
    triangle once.  Join fan-out is bounded by the orientation's
    O(sqrt(m)) out-degree (arboricity), not by raw hub degree — the
    property that survives a 100x scale-up.  Two shuffles over the
    edge list plus one degree groupBy, never touching the fact table.
    The per-node counts are orientation-invariant, so the SQL oracle
    keeps the simpler id-oriented formulation — an independent replay.
    Output: (node, n_triangles) for nodes in >= 1 triangle."""
    import pyspark.sql.functions as F

    oe = degree_oriented_edges(edges)
    e1 = oe.select("u", "v", "vdeg")
    e2 = oe.select("u", F.col("v").alias("w"), F.col("vdeg").alias("wdeg"))
    wedge = e1.join(e2, "u").filter(
        (F.col("vdeg") < F.col("wdeg"))
        | ((F.col("vdeg") == F.col("wdeg")) & (F.col("v") < F.col("w")))
    )
    closer = oe.select(F.col("u").alias("v"), F.col("v").alias("w"))
    tri = wedge.join(closer, ["v", "w"])
    nodes = tri.select(
        F.explode(F.array(F.col("u"), F.col("v"), F.col("w"))).alias("node")
    )
    return nodes.groupBy("node").agg(F.count(F.lit(1)).alias("n_triangles"))
