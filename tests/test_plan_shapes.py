"""Plan-shape assertions: the properties that decide 100 TB behavior
must hold in the optimized plan — broadcast for dims, pushdown to the
scan, pruned read schemas, top-k without a global sort.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from strawboat_spark.plans.audit import audit
from strawboat_spark.queries import all_queries
from tests.conftest import SF_CORRECT


@pytest.fixture(scope="module")
def registry():
    return all_queries()


def _n_broadcast_hints(df) -> int:
    """Broadcast hints pinned in the logical plan (ResolvedHint nodes).
    A hint OVERRIDES AQE's size-based choice, so one on a table that
    grows with SF is a 100×-scale OOM wired into the query."""
    return df._jdf.queryExecution().analyzed().toString().count("ResolvedHint")


def test_q3_no_forced_fact_broadcast(spark, registry):
    df = registry["q3_shipping_priority"].fn(spark, SF_CORRECT)
    # orders/customer scale with SF: strategy must be AQE's, not pinned
    assert _n_broadcast_hints(df) == 0
    r = audit(df)
    assert "l_shipdate" in " ".join(r.pushed_filters)


def test_q5_broadcasts_only_bounded_dims(spark, registry):
    df = registry["q5_local_supplier_volume"].fn(spark, SF_CORRECT)
    # exactly nation + region are hinted (bounded at 25/5 rows at any SF)
    assert _n_broadcast_hints(df) == 2
    r = audit(df)
    assert r.n_broadcast_joins >= 2, r.text[:2000]


def test_q10_broadcasts_only_nation(spark, registry):
    df = registry["q10_returned_items"].fn(spark, SF_CORRECT)
    assert _n_broadcast_hints(df) == 1


def test_q6_filters_pushed_to_scan(spark, registry):
    r = audit(registry["q6_forecast_revenue"].fn(spark, SF_CORRECT))
    assert r.pushed_filters, "no PushedFilters at the parquet scan"
    joined = " ".join(r.pushed_filters)
    assert "l_discount" in joined and "l_quantity" in joined


def test_q6_prunes_columns(spark, registry):
    r = audit(registry["q6_forecast_revenue"].fn(spark, SF_CORRECT))
    # q6 needs 4 columns; the scan must not read the full 11-col table
    assert r.read_schemas and all("l_orderkey" not in s for s in r.read_schemas), r.read_schemas


def test_topk_uses_take_ordered(spark, registry):
    r = audit(registry["topk_orders"].fn(spark, SF_CORRECT))
    assert r.has_take_ordered, "top-k compiled to a global sort instead of TakeOrderedAndProject"


def test_asof_join_is_single_shuffle_no_join(spark, registry):
    r = audit(registry["join_asof_clicks"].fn(spark, SF_CORRECT))
    # union+window formulation: no join node at all
    assert r.n_sortmerge_joins == 0 and r.n_broadcast_joins == 0 and r.n_nested_loop_joins == 0


def test_range_band_is_broadcast_nested_loop(spark, registry):
    r = audit(registry["join_range_band"].fn(spark, SF_CORRECT))
    assert r.n_nested_loop_joins >= 1


def test_similarity_broadcasts_queries(spark, registry):
    r = audit(registry["similarity_topk_bruteforce"].fn(spark, SF_CORRECT))
    assert r.n_nested_loop_joins >= 1 or r.n_broadcast_joins >= 1  # broadcast of query side


def test_q1_single_agg_no_extra_shuffle(spark, registry):
    df = registry["q1_pricing_summary"].fn(spark, SF_CORRECT)
    r = audit(df)
    # one shuffle for the groupBy, one for the orderBy — nothing else
    assert r.n_exchanges <= 2, r.text[:1500]
    # partial + final aggregation (map-side combine before the shuffle)
    assert r.n_hash_aggregates == 2, r.text[:1500]


def test_q1_codegen_spans_executed_plan(spark, registry):
    from strawboat_spark.plans.audit import executed_plan_text

    df = registry["q1_pricing_summary"].fn(spark, SF_CORRECT)
    df.collect()
    txt = executed_plan_text(df)
    # codegen spans appear as *(N) markers in the executed plan
    assert "*(" in txt and "isFinalPlan=true" in txt, txt[:500]


def test_strawboat_scan_stays_columnar(spark):
    from strawboat_spark.sources.datasource import register

    register(spark)
    import tempfile

    d = tempfile.mkdtemp() + "/t"
    spark.read.parquet(f"{SF_CORRECT}/orders.parquet").write.format("strawboat").mode(
        "overwrite"
    ).save(d)
    df = spark.read.format("strawboat").load(d).filter(F.col("o_orderkey") < 100)
    r = audit(df)
    assert "BatchScan strawboat" in r.text


def test_nb_predict_broadcasts_only_bounded_models(spark, registry):
    """The NB model tables are bounded BY CONSTRUCTION (n_labels x dim
    rows at any corpus size) so their broadcasts are pinned as hints —
    the exact opposite posture from lm.py's corpus-growing model (the
    r11 measured scale-killer, which must NEVER broadcast). Three
    hinted broadcasts: bucket_counts, label_stats, total_docs."""
    # r14: text_nb_langid folded into text_nb_suite; the batch member
    # keeps its own fn — pin ITS plan (the suite unions both modes)
    from strawboat_spark.queries.llm import text_nb_langid

    df = text_nb_langid(spark, SF_CORRECT)
    assert _n_broadcast_hints(df) == 3
    r = audit(df)
    # the scalar crossJoins compile to BroadcastNestedLoopJoin
    assert r.n_broadcast_joins + r.n_nested_loop_joins >= 3, r.text[:2000]


def test_dsir_broadcasts_only_dim_bounded_models(spark, registry):
    """DSIR's two bag models and their totals are <= dim rows each —
    four hinted broadcasts, nothing corpus-sized on a build side."""
    df = registry["corpus_dsir_selection"].fn(spark, SF_CORRECT)
    assert _n_broadcast_hints(df) == 4
    r = audit(df)
    assert r.n_broadcast_joins + r.n_nested_loop_joins >= 4, r.text[:2000]


def test_ngram_capped_no_cartesian_no_python(spark, registry):
    """The bounded-work exact-Jaccard plan: candidate generation is an
    array-side explode (no self-join), intersection is array_intersect
    (JVM) — no nested-loop/cartesian join and no Python eval anywhere."""
    df = registry["dedup_ngram_capped"].fn(spark, SF_CORRECT)
    r = audit(df)
    assert r.n_nested_loop_joins == 0, r.text[:2000]
    assert "BatchEvalPython" not in r.text and "ArrowEvalPython" not in r.text


def test_salted_join_matches_plain_join(spark):
    import pyspark.sql.functions as F

    from strawboat_spark.operators.joins import salted_join

    # skewed: 90% of big rows share one key
    big = spark.range(20000).select(
        F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id") % 100).alias("k"),
        F.col("id").alias("v"),
    )
    small = spark.range(100).select(F.col("id").alias("k"), (F.col("id") * 10).alias("w"))
    got = salted_join(big, small, ["k"]).groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("w").alias("sw")
    )
    want = big.join(small, "k").groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("w").alias("sw")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))

    left_got = salted_join(big, small.filter(F.col("k") < 50), ["k"], how="left")
    left_want = big.join(small.filter(F.col("k") < 50), "k", "left")
    assert left_got.count() == left_want.count()


def test_q14_no_forced_broadcast_and_pushes_dates(spark, registry):
    df = registry["q14_promo_revenue"].fn(spark, SF_CORRECT)
    # part scales with SF: strategy must be AQE's, not pinned
    assert _n_broadcast_hints(df) == 0
    r = audit(df)
    joined = " ".join(r.pushed_filters)
    assert "l_shipdate" in joined, "ship-date range not pushed to scan"


def test_q18_q19_no_forced_broadcast(spark, registry):
    # customer/part scale with SF: zero ResolvedHints, AQE decides
    assert _n_broadcast_hints(registry["q18_large_orders"].fn(spark, SF_CORRECT)) == 0
    assert _n_broadcast_hints(registry["q19_disjunctive_bands"].fn(spark, SF_CORRECT)) == 0


def test_bucketed_join_avoids_shuffle(spark, tmp_path):
    """bucketBy(orderkey) tables join without any Exchange — the
    co-located big-big join pattern (pre-bucket once, join shuffle-free
    forever after). At 100 TB this converts every lineitem-orders join
    from a 2-sided shuffle into a local zip per bucket."""
    import pyspark.sql.functions as F

    from strawboat_spark.plans.audit import audit

    li = spark.read.parquet(f"{SF_CORRECT}/lineitem.parquet").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    o = spark.read.parquet(f"{SF_CORRECT}/orders.parquet").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    spark.sql("DROP TABLE IF EXISTS li_bkt")
    spark.sql("DROP TABLE IF EXISTS o_bkt")
    (
        li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").format("parquet").saveAsTable("li_bkt")
    )
    (
        o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").format("parquet").saveAsTable("o_bkt")
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = (
            spark.table("li_bkt")
            .join(spark.table("o_bkt"), F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderpriority")
            .agg(F.sum("l_quantity").alias("q"))
        )
        r = audit(j)
        # the join itself introduces no shuffle; only the final
        # aggregation exchanges (1) — and the SMJ reads bucketed sides
        assert r.n_sortmerge_joins == 1, r.text[:1500]
        assert "Exchange" not in r.text.split("SortMergeJoin")[-1] or r.n_exchanges <= 2
        plain = (
            li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderpriority")
            .agg(F.sum("l_quantity").alias("q"))
        )
        assert r.n_exchanges < audit(plain).n_exchanges, "bucketing did not remove shuffles"
        # correctness identical
        assert sorted(map(tuple, j.collect())) == sorted(map(tuple, plain.collect()))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS li_bkt")
        spark.sql("DROP TABLE IF EXISTS o_bkt")


def test_bucketed_join_has_no_join_exchange(spark, registry):
    """Co-located bucketed join: with broadcast disabled (forcing the
    100 TB fact-fact path), the SortMergeJoin consumes the bucketed
    scans DIRECTLY — zero Exchange below the join; the only shuffles
    left belong to the post-join agg/sort."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = registry["join_bucketed_colocated"].fn(spark, SF_CORRECT)
        r = audit(df)
        assert r.n_sortmerge_joins == 1, r.text
        # join inputs are pre-partitioned: <=2 exchanges total (agg +
        # final orderBy), so NONE feed the join — an unbucketed plan
        # would need 4 (two join-input shuffles on the key).
        assert r.n_exchanges <= 2, r.text
        # both scans really use the bucket layout
        assert r.text.count("Bucketed: true") == 2, r.text
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_sessionize_single_user_shuffle(spark, registry):
    """Both windows AND the session groupBy must reuse ONE hash
    exchange on user_id (plus the inherent single-partition final agg)
    — a second per-user shuffle would double the dominant cost at
    scale. No Python eval anywhere: pure window algebra."""
    df = registry["events_sessionize"].fn(spark, SF_CORRECT)
    plan = df._jdf.queryExecution().executedPlan().toString()
    hash_exchanges = plan.count("Exchange hashpartitioning")
    assert hash_exchanges == 1, plan
    assert plan.count("BatchEvalPython") + plan.count("ArrowEvalPython") == 0
    # the two logical windows fuse over one sort
    assert plan.count("Sort ") <= 1 or plan.count("+- Sort") <= 1


def test_repetition_ratio_stays_jvm(spark, registry):
    """The trigram repetition filter must compile to higher-order
    array expressions (JVM codegen), never a Python UDF."""
    df = registry["text_repetition_ratio"].fn(spark, SF_CORRECT)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BatchEvalPython") + plan.count("ArrowEvalPython") == 0


def test_round6_tpch_hints_bounded_dims_only(spark, registry):
    """The six round-6 TPC-H analogs pin broadcasts ONLY on tables
    bounded at every SF (nation=25, region=5, 1-row scalar aggs);
    part/supplier/lineitem joins are left to AQE."""
    expected = {
        "q2_min_cost_supplier": 2,  # nation + region
        "q9_product_profit": 1,  # nation
        # nation appears twice (the aggregated view v feeds both the
        # threshold scalar and the main branch) + the 1-row threshold
        "q11_important_parts": 3,
        "q12_shipping_delay": 0,
        "q16_parts_supplier_cnt": 0,
        "q20_promotion_suppliers": 1,  # nation
    }
    for name, n in expected.items():
        df = registry[name].fn(spark, SF_CORRECT)
        assert _n_broadcast_hints(df) == n, name


def test_round6_tpch_pushes_date_filters(spark, registry):
    from strawboat_spark.plans.audit import audit

    for name in ("q12_shipping_delay", "q20_promotion_suppliers"):
        r = audit(registry[name].fn(spark, SF_CORRECT))
        assert "l_shipdate" in " ".join(r.pushed_filters), name


def test_q2_catalog_single_shuffle_then_rejoin(spark, registry):
    """The derived supplier-part catalog aggregates once on
    (partkey, suppkey); the correlated-MIN rejoin must not rescan
    lineitem — exactly one scan of the fact table in the plan."""
    from strawboat_spark.plans.audit import audit

    r = audit(registry["q2_min_cost_supplier"].fn(spark, SF_CORRECT))
    assert r.text.count("lineitem.parquet") == 1, r.text[:2000]


def test_tfidf_df_join_not_term_window(spark, registry):
    """df-per-term must be a groupBy + join (AQE can split hot stopword
    partitions of a skewed join); the only Window allowed is the
    per-document top-k ranking."""
    df = registry["text_tfidf_keywords"].fn(spark, SF_CORRECT)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Window [") == 1, plan[:2000]
    # every window spec partitions by the doc id, never by term
    assert "windowspecdefinition(doc_id" in plan
    assert "windowspecdefinition(term" not in plan
    # rank<=k pushed down as WindowGroupLimit (partial top-k before the
    # shuffle — the window twin of TakeOrderedAndProject)
    assert "WindowGroupLimit" in plan
    assert plan.count("BatchEvalPython") + plan.count("ArrowEvalPython") == 0


def test_bm25_no_window_and_bounded_broadcasts(spark, registry):
    df = registry["text_bm25_search"].fn(spark, SF_CORRECT)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    # query-vocabulary df + the two 1-row scalars ride broadcasts
    assert _n_broadcast_hints(df) == 3


def test_funnel_single_user_shuffle_no_join(spark, registry):
    """The funnel state machine folds over one sorted per-user event
    list: exactly the user_id exchange + the stage re-agg — no join
    nodes at all (the SQL formulation needs three fact-table joins)."""
    df = registry["events_funnel"].fn(spark, SF_CORRECT)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 2, plan[:2000]
    for node in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin"):
        assert node not in plan
    assert plan.count("BatchEvalPython") + plan.count("ArrowEvalPython") == 0


def test_cohort_retention_no_forced_broadcast(spark, registry):
    # the first-day side scales with the user count: AQE decides
    df = registry["events_cohort_retention"].fn(spark, SF_CORRECT)
    assert _n_broadcast_hints(df) == 0


def test_ngram_df_cut_is_join_not_shingle_window(spark, registry):
    """The df-cut must be a groupBy + join back (AQE can split a hot
    boilerplate shingle's posting list), never a per-shingle window —
    same skew rationale as tfidf's df computation."""
    df = registry["dedup_ngram_suite"].fn(spark, SF_CORRECT)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "windowspecdefinition(shingle" not in plan
    assert "Window [" not in plan, plan[:2000]


def test_lm_perplexity_no_window_no_python(spark, registry):
    """Counts are groupBy tables joined back (skew-splittable), the
    vocab scalar rides a broadcast — no Window, no Python eval."""
    df = registry["text_lm_perplexity"].fn(spark, SF_CORRECT)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert plan.count("BatchEvalPython") + plan.count("ArrowEvalPython") == 0
    assert "BroadcastExchange" in plan  # the 1-row vocab scalar


def test_lm_perplexity_reuses_bigram_exchange(spark, registry):
    """The doc-bigram pre-aggregation exists so the corpus-wide count
    table and the score join read the SAME exchange — AQE must dedupe
    it (one regex tokenize+explode for bigrams, not two).  Reuse only
    appears in the FINAL adaptive plan, so execute first."""
    df = registry["text_lm_perplexity"].fn(spark, SF_CORRECT)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    assert plan.count("ReusedExchange") + plan.count("ReusedQueryStage") >= 1


def test_heavy_hitters_no_forced_candidate_broadcast(spark, registry):
    """The MG candidate superset is bounded by partitions * k — fine at
    sf0.1, ~1.6e8 strings at 100 TB — so the exact-recount semi-join
    must NOT pin a broadcast hint on it (AQE decides).  The only
    allowed hint is the 1-row total scalar on the threshold filter."""
    df = registry["text_heavy_hitter_tokens"].fn(spark, SF_CORRECT)
    assert _n_broadcast_hints(df) == 1  # the 1-row total only
    analyzed = df._jdf.queryExecution().analyzed().toString()
    # the hint must sit directly over the 1-row total aggregate (its
    # subtree starts with the sum(c) Aggregate), not a candidate set
    hint_idx = analyzed.index("ResolvedHint")
    assert "sum(c" in analyzed[hint_idx : hint_idx + 300]


def test_edit_distance_block_cut_is_join_not_window(spark, registry):
    df = registry["dedup_edit_distance"].fn(spark, SF_CORRECT)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "windowspecdefinition(__blk" not in plan
    assert "Window" not in plan
    assert plan.count("BatchEvalPython") + plan.count("ArrowEvalPython") == 0


def test_scd2_single_shuffle_single_sort(spark, registry):
    """SCD2 history: both window passes ride ONE key shuffle and ONE
    sort (change-detect lag, then interval-close lead over the
    filtered change rows) — no join, no Python, no second exchange."""
    import re

    import pyspark.sql.functions as F

    from strawboat_spark.operators.scd import scd2_history
    from strawboat_spark.tables import load_table

    e = load_table(spark, SF_CORRECT, "events").filter(F.col("user_id") < 30)
    out = scd2_history(e, "user_id", "ts", "event_type", tiebreak_col="event_id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1
    assert plan.count("Sort ") == 1
    assert plan.count("BatchEvalPython") + plan.count("ArrowEvalPython") == 0


def test_join_view_refresh_plan_no_python_no_cartesian(spark, registry):
    """Incremental join-view refresh: the delta fold stays JVM-side
    (no Python eval in the hot path) and every join is keyed
    (SMJ/BHJ/SHJ — never a CartesianProduct / BroadcastNestedLoop),
    so the |Δ|-driven refresh survives a 100x fact table."""
    import tempfile

    import pyspark.sql.functions as F

    from strawboat_spark.streaming.views import maintain_join_agg_view
    from strawboat_spark.table import Table

    root = tempfile.mkdtemp(prefix="jv_plan_")
    ap, bp, vp = f"{root}/a", f"{root}/b", f"{root}/v"
    A, B = Table(spark, ap), Table(spark, bp)
    A.overwrite(
        spark.range(500).select((F.col("id") % 50).alias("k"), F.col("id").alias("v"))
    )
    B.overwrite(
        spark.range(50).select(F.col("id").alias("k"), (F.col("id") % 5).alias("g"))
    )
    maintain_join_agg_view(spark, ap, bp, vp, ["k"], "g", "v")  # seed
    A.append(
        spark.range(500, 600).select((F.col("id") % 50).alias("k"), F.col("id").alias("v"))
    )
    B.delete("g = 3")
    plans = []
    maintain_join_agg_view(
        spark, ap, bp, vp, ["k"], "g", "v", _plan_hook=lambda df: plans.append(
            df._jdf.queryExecution().optimizedPlan().toString()
        )
    )
    assert plans, "refresh skipped the incremental path"
    p = plans[0]
    assert "CartesianProduct" not in p and "BroadcastNestedLoop" not in p
    assert "PythonUDF" not in p and "ArrowEval" not in p and "BatchEval" not in p


def test_incremental_jaccard_index_plan_pure_jvm(spark, registry):
    """The incremental dedup gate's pair plan stays JVM-side: no Python
    eval nodes (the strawboat scan is a DataSource, not a UDF) and no
    cartesian product — candidates come from the bucketed shingle join."""
    df = registry["dedup_incremental_index"].fn(spark, SF_CORRECT)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BatchEvalPython") + plan.count("ArrowEvalPython") == 0
    assert "Cartesian" not in plan
