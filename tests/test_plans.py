"""Plan-quality regression gate over the whole registry: no accidental
cartesian products, and broadcast-nested-loop joins only where a small-side
cross join is the intended algorithm."""

from __future__ import annotations

import pytest

from etl_master_spark.plans.registry import QUERIES

# intentional small-side cross joins: K-cutoff fanout (eval), broadcast
# query/hyperplane/centroid sets (ann/lsh/ivf), all-pairs kernels (mmd,
# cosine dedup), 1-row scalar aggregates joined onto every row (tfidf's
# corpus doc-count), generated dimension grids (gapfill's hour × type),
# 1-row min/max bounds (histogram bin edges), 1-row funnel-stage counts
# cross-joined into the single summary row (conversion_funnel), 1-row
# global totals/thresholds broadcast onto every group (Q11's total value,
# Q22's average positive balance)
BNLJ_OK = {
    "conversion_funnel",
    "events_hourly_gapfill",
    "price_histogram",
    "important_part_values",
    "dormant_customer_segments",
    "fk_integrity_audit",
    "ann_cosine_topk",
    "dedup_embedding_cosine",
    "eval_metrics_test",
    "eval_metrics_vali",
    "best_epoch_reeval",  # K-cutoff fanout (rn <= k vs a 2-row K table)
    "mmd_rbf",
    "ann_recall_audit",  # 1-row hit/truth aggregates cross-joined
    "neardup_topk_recall_audit",  # 1-row recall aggregates cross-joined
    "bm25_search",  # 1-row corpus-stats (N, avgdl) cross-joined in
    "triangle_count",  # three 1-row census aggregates cross-joined
    "mmd_rbf_multiscale",
    "mmd_rbf_fast",  # tile-grid block-nested-loop: the intended Gram shape
    "tfidf_top_terms",
    "lm_perplexity_scores",  # 1-row trigram total joined onto the vocab
    "dsir_weights",  # 1-row corpus totals cross-joined onto the D-row models
    "centroid_classify",  # 10-row class-centroid frame vs every holdout row
    "mmr_rerank",  # inherits ann_cosine_topk's broadcast-query corpus scan
    "heaps_fit",  # 1-row max-id / beta aggregates cross-joined
    "corpus_entropy",  # 1-row total-N aggregates cross-joined
    "pmi_collocations",  # 1-row unigram/bigram totals cross-joined
    "bloom_membership_audit",  # 1-row corpus-count/bits-set summary join
    "association_rules",  # 1-row basket total N cross-joined
    "knn_label_audit",  # broadcast holdout vs train corpus (audit twin)
    "hard_negatives_mine",  # inherits ann_cosine_topk's broadcast-query scan
    "corpus_drift_psi",  # 1-row reference-decile cut array cross-joined
    "hll_cardinality_audit",  # 1-row exact-count audit side cross-joined
    "prf_query_expansion",  # 1-row corpus stats cross-joined (bm25 shape)
    "distinctive_terms_llr",  # 1-row corpus-total N cross-joined
    "events_weekly_seasonality",  # 1-row volume total cross-joined
    "events_cusum_changepoint",  # 1-row series mean/count cross-joined
    "events_ewma_trailing",  # bounded hour-lag range join over |hours| rows
    "dim_truncation_recall",  # inherits ann_cosine_topk's broadcast-query scan
    "jackknife_revenue_ci",  # 1-row totals cross-joined onto 32 block rows
    "tfidf_doc_similarity",  # 1-row corpus doc-count cross-joined into idf
    "theil_sen_revenue_trend",  # pairwise slopes over the |days|-sized frame
    "dup_cluster_size_histogram",  # 1-row corpus total cross-joined
    "woe_priority_encoding",  # 1-row class totals cross-joined
    "event_hour_independence",  # r×c grid build + 1-row totals cross-joined
    "deletion_cascade_audit",  # four 1-row footprint legs cross-joined
    "shipping_survival_curve",  # 1-row at-risk total cross-joined
    "ab_conversion_ztest",  # two 1-row cohort frames cross-joined
    "events_trailing_dau",  # bounded hour-lag range join over |hours| grid
    "benford_price_audit",  # 1-row digit total cross-joined onto 9 rows
    "hash_collision_audit",  # 1-row vocab/mass totals cross-joined
    "join_cardinality_estimate",  # three 1-row stat legs cross-joined
    "events_above_mean_streaks",  # 1-row series total cross-joined
    "kcore_membership",  # 1-row converged self-report cross-joined
    "copurchase_communities",  # 1-row converged self-report cross-joined
    "minhash_band_calibration",  # 1-row candidate-count sample-rate join
}
# training loops, not one plan
SKIP = {"als_eval_test", "cdae_eval_test", "gan_eval_test"}


@pytest.mark.parametrize("name", sorted(set(QUERIES) - SKIP))
def test_no_accidental_cross_joins(spark, sf_dir, name):
    plan = QUERIES[name](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, name
    if name not in BNLJ_OK:
        assert "BroadcastNestedLoopJoin" not in plan, name


# filters that MUST reach the parquet scan (SCALE.md: "push down and
# prune" — a regression here silently turns a pruned scan into a full one)
PUSHDOWN = {
    "pricing_summary": "l_shipdate",
    "shipping_priority": "c_mktsegment",
    "returned_item_revenue": "l_returnflag",
    "customer_order_distribution": "o_orderpriority",
    "customers_without_urgent_orders": "o_orderpriority",
    "user_set_ops": "event_type",
    "conversion_funnel": "event_type",
    "dedup_embedding_cosine": "vec_id",
    "min_cost_supplier": "p_type",
    "forecast_revenue_delta": "l_discount",
    "supplier_variety": "p_brand",
    "disjunctive_bracket_revenue": "p_brand",
    "sole_late_suppliers": "o_orderstatus",
    "dormant_customer_segments": "o_orderdate",
    "mmd_rbf_fast": "label",  # side filters must prune at the scan
    "ann_lsh_topk": "vec_id",  # query-side filter prunes at the scan
}


@pytest.mark.parametrize("name", sorted(PUSHDOWN))
def test_filter_pushdown(spark, sf_dir, name):
    import re

    col = PUSHDOWN[name]
    plan = QUERIES[name](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert re.search(rf"PushedFilters: \[[^\]]*{col}", plan), (name, col)


def test_partition_pruning(spark, sf_dir, tmp_path):
    """Partition-pruning twin of the PushedFilters gate: a table written
    partitioned by a column must turn an equality predicate on it into a
    PartitionFilter (listing-level pruning — at 100 TB the difference
    between touching one partition directory and scanning the lake)."""
    from etl_master_spark.sources.io import load_table

    path = f"{tmp_path}/events_by_type"
    load_table(spark, sf_dir, "events").write.partitionBy("event_type").parquet(path)
    q = spark.read.parquet(path).filter("event_type = 'click'")
    plan = q._jdf.queryExecution().executedPlan().toString()
    import re

    m = re.search(r"PartitionFilters: \[[^\]]*event_type[^\]]*\]", plan)
    assert m, plan[:2000]
    # and the pruned read must not ship the partition column as data —
    # ReadSchema carries only the payload columns
    rs = re.search(r"ReadSchema: ([^\n]*)", plan)
    assert rs and "event_type" not in rs.group(1), rs and rs.group(1)


# star queries whose dimension joins MUST broadcast (a shuffle join on a
# 25-row nation / 5-row region side is a planning regression even when it
# is merely slow, because at 100 TB the fact-side exchange it drags in is
# the whole query cost)
BROADCAST_REQUIRED = {
    "local_supplier_volume",
    "nation_pair_trade",
    "nation_year_profit",
    "returned_item_revenue",
    # nation_trade_balance is excluded: FULL OUTER cannot BroadcastHashJoin
    # (and both its sides are nation-sized aggregates anyway)
    "shipping_priority",
    "contamination_screen",
}


@pytest.mark.parametrize("name", sorted(BROADCAST_REQUIRED))
def test_dimension_joins_broadcast(spark, sf_dir, name):
    plan = QUERIES[name](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, name
