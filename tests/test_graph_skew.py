"""Link prediction (CN / Jaccard / Adamic-Adar) and the join-key skew
audit — planted graphs with hand-computable scores. Engine-vs-oracle
equality is covered by test_oracle_parity.py."""

from __future__ import annotations

import pytest

import math

from etl_master_spark.operators.analytics import (
    TRIANGLE_MIN_COUNT,
    link_prediction,
)
from etl_master_spark.operators.warehouse import join_skew_audit


def _write_lineitem_baskets(spark, path, baskets):
    """Each basket = (orderkey, [partkeys]); rows duplicated enough to pass
    the TRIANGLE_MIN_COUNT support threshold when repeated."""
    rows = []
    for ok, parts in baskets:
        for pk in parts:
            rows.append((ok, pk))
    spark.createDataFrame(
        rows, "l_orderkey long, l_partkey long"
    ).write.mode("overwrite").parquet(f"{path}/lineitem.parquet")


def test_link_prediction_path_graph(spark, tmp_path):
    """Path 1-2-3 (each edge in TRIANGLE_MIN_COUNT baskets): the only
    non-adjacent wedge pair is (1,3) through hub 2. deg(1)=deg(3)=1,
    deg(2)=2 -> jaccard = 1/(1+1-1) = 1.0, adamic_adar = 1/ln 2."""
    baskets = []
    oid = 0
    for _ in range(TRIANGLE_MIN_COUNT):
        baskets.append((oid, [1, 2])); oid += 1
        baskets.append((oid, [2, 3])); oid += 1
    _write_lineitem_baskets(spark, str(tmp_path), baskets)
    rows = link_prediction(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["part_a"], r["part_b"], r["common_nbrs"]) == (1, 3, 1)
    assert r["jaccard"] == 1.0
    assert abs(r["adamic_adar"] - math.floor(1e6 / math.log(2)) / 1e6) < 1e-12


def test_link_prediction_excludes_existing_edges(spark, tmp_path):
    """Triangle 1-2-3: every wedge pair is already an edge -> no candidates."""
    baskets = []
    oid = 0
    for _ in range(TRIANGLE_MIN_COUNT):
        baskets.append((oid, [1, 2, 3])); oid += 1
    _write_lineitem_baskets(spark, str(tmp_path), baskets)
    assert link_prediction(spark, str(tmp_path)).count() == 0


def test_link_prediction_counts_multiple_hubs(spark, tmp_path):
    """1 and 4 connect through BOTH 2 and 3 -> common_nbrs = 2 and the AA
    terms sum over both hubs (deg 2 each)."""
    baskets = []
    oid = 0
    for _ in range(TRIANGLE_MIN_COUNT):
        for e in ([1, 2], [1, 3], [2, 4], [3, 4]):
            baskets.append((oid, e)); oid += 1
    _write_lineitem_baskets(spark, str(tmp_path), baskets)
    rows = {(r["part_a"], r["part_b"]): r for r in link_prediction(spark, str(tmp_path)).collect()}
    r = rows[(1, 4)]
    assert r["common_nbrs"] == 2
    assert r["jaccard"] == 1.0  # union of neighborhoods is exactly {2, 3}
    assert abs(r["adamic_adar"] - 2 * math.floor(1e6 / math.log(2)) / 1e6) < 1e-12
    # (2,3) also connect through hubs 1 and 4
    assert rows[(2, 3)]["common_nbrs"] == 2


def test_join_skew_audit_reports_heavy_key(spark, sf_dir):
    rows = {(r["rel"], r["key_col"]): r for r in join_skew_audit(spark, sf_dir).collect()}
    li = rows[("lineitem", "l_orderkey")]
    assert li["n_rows"] >= li["n_keys"] >= 1
    assert li["max_mult"] >= li["p99_mult"] >= li["p50_mult"] >= 1
    assert 0 < li["top_share"] <= 1
    # skew_factor is max/mean multiplicity, so >= 1 by construction
    assert all(r["skew_factor"] >= 1.0 for r in rows.values())
    assert set(rows) == {
        ("lineitem", "l_orderkey"),
        ("lineitem", "l_partkey"),
        ("orders", "o_custkey"),
        ("events", "user_id"),
    }


def test_degree_powerlaw_on_star_graph(spark, tmp_path):
    """Star 0-{1..5}: hub degree 5, leaves 1. n=6, mean=10/6, and the MLE
    uses floor(1e6*ln(2d)) micro-units summed exactly."""
    import math

    from etl_master_spark.operators.analytics import degree_powerlaw_fit

    baskets = []
    oid = 0
    for _ in range(TRIANGLE_MIN_COUNT):
        for leaf in range(1, 6):
            baskets.append((oid, [0, leaf])); oid += 1
    _write_lineitem_baskets(spark, str(tmp_path), baskets)
    r = degree_powerlaw_fit(spark, str(tmp_path)).collect()[0]
    assert r["n_nodes"] == 6 and r["max_deg"] == 5
    assert r["mean_deg"] == round(10 / 6, 6)
    logsum = 5 * math.floor(1e6 * math.log(2.0)) + math.floor(1e6 * math.log(10.0))
    assert r["alpha_mle"] == round(1.0 + 6 / (logsum / 1e6), 4)


def test_conversion_latency_planted(spark, tmp_path):
    """User 1: click at t, purchase at t+90s -> attributed, latency 90.
    User 2: purchase with no prior click -> unattributed, excluded from
    percentiles."""
    import datetime as dt

    from etl_master_spark.operators.analytics import conversion_latency_stats

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (t0, 1, "click"),
        (t0 + dt.timedelta(seconds=90), 1, "purchase"),
        (t0 + dt.timedelta(seconds=30), 2, "purchase"),
    ]
    spark.createDataFrame(
        [(i, ts, uid, et, 1.0, "{}") for i, (ts, uid, et) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    r = conversion_latency_stats(spark, str(tmp_path)).collect()[0]
    assert r["n_purchases"] == 2 and r["n_attributed"] == 1
    assert r["p50_latency_s"] == 90.0 == r["p99_latency_s"]


def test_embedding_clip_stats_planted(spark, tmp_path):
    """Dim 0 has one huge value among 200 -> exactly the outliers above
    p99 are counted (quantile over 200 values: 1-2 above p99)."""
    from etl_master_spark.operators.vectors import embedding_dim_clip_stats

    rows = []
    for i in range(200):
        v0 = 1000.0 if i == 0 else float(i % 7)
        rows.append((i, [v0] + [0.5] * 63, 0))
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(f"{tmp_path}/embeddings.parquet")
    got = {r["dim"]: r for r in embedding_dim_clip_stats(spark, str(tmp_path)).collect()}
    assert len(got) == 64
    assert got[0]["n_above"] >= 1 and got[0]["p99"] < 1000.0
    # constant dims clip nothing
    assert got[5]["n_below"] == 0 and got[5]["n_above"] == 0
    assert got[5]["clipped_share"] == 0.0


def test_kcore_peels_tree_keeps_clique(spark, tmp_path):
    """A 4-clique survives the 3-core; a pendant chain hanging off it is
    peeled entirely. Every survivor has within-core degree 3."""
    from etl_master_spark.operators.analytics import kcore_membership

    baskets = []
    oid = 0
    for _ in range(TRIANGLE_MIN_COUNT):
        for e in ([1, 2], [1, 3], [1, 4], [2, 3], [2, 4], [3, 4],  # clique
                  [4, 5], [5, 6]):  # pendant chain
            baskets.append((oid, e)); oid += 1
    _write_lineitem_baskets(spark, str(tmp_path), baskets)
    rows = kcore_membership(spark, str(tmp_path)).collect()
    assert sorted(r["v"] for r in rows) == [1, 2, 3, 4]
    assert all(r["deg_in_core"] == 3 and r["core_k"] == 3 for r in rows)


def test_kcore_rounds_reach_fixpoint_at_gate_scale(spark, sf_dir):
    """At gate scales the adaptive peel reaches the fixpoint within the
    ceiling, and the converged self-report must SAY so — and agree with
    the recomputed condition (min within-core degree >= K). The
    truncated polarity is pinned by the adversarial chain fixture
    above."""
    from pyspark.sql import functions as F

    from etl_master_spark.operators.analytics import (
        KCORE_K,
        KCORE_ROUNDS_MAX,
        kcore_membership,
    )

    core = kcore_membership(spark, sf_dir)
    # fixpoint <=> every surviving node already has deg >= K
    assert core.filter(F.col("deg_in_core") < KCORE_K).count() == 0
    rows = core.collect()
    assert rows and all(r["converged"] is True for r in rows)
    assert all(r["rounds_used"] <= KCORE_ROUNDS_MAX for r in rows)


# -- bounded-round convergence self-report (r4 verdict item 2) ----------------
# Each fixed-round kernel now OUTPUTS whether its bounded trajectory hit
# the fixpoint. These fixtures are adversarial by construction: graphs
# where the bounded rounds provably do NOT converge, and the output must
# say so — plus the converging twin to pin both polarities.


def _sym_edges(spark, pairs):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(list(pairs), "src long, dst long")
    return df.unionByName(
        df.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )


def test_kcore_peel_reports_nonconvergence_on_long_chain(spark):
    """k=2 peel of a 12-node path removes only the two endpoints per
    round (interior degrees stay 2), so 2 rounds leave degree-1 nodes:
    the self-report must say converged=false. With enough rounds the
    path is fully peeled down to the attached triangle (a true 2-core)
    and the report flips to converged=true."""
    from etl_master_spark.operators.analytics import kcore_peel

    chain = [(i, i + 1) for i in range(1, 12)]  # path 1..12
    tri = [(100, 101), (101, 102), (100, 102)]  # true 2-core, disjoint
    edges = _sym_edges(spark, chain + tri)

    short = kcore_peel(edges, k=2, rounds_max=2).collect()
    assert short and all(r["converged"] is False for r in short)
    assert all(r["rounds_used"] == 2 for r in short)
    assert any(r["deg_in_core"] < 2 for r in short)  # the visible truncation

    # ceiling lands exactly on the last shrinking round: converged=true
    # (final min degree >= k) even though no identity round was observed
    full = kcore_peel(edges, k=2, rounds_max=6).collect()
    assert sorted(r["v"] for r in full) == [100, 101, 102]
    assert all(r["converged"] is True and r["deg_in_core"] == 2 for r in full)
    assert all(r["rounds_used"] == 6 for r in full)

    # headroom past the fixpoint: the adaptive stop reports the first
    # identity round (7) instead of burning the whole ceiling
    slack = kcore_peel(edges, k=2, rounds_max=12).collect()
    assert sorted(r["v"] for r in slack) == [100, 101, 102]
    assert all(r["converged"] is True and r["rounds_used"] == 7 for r in slack)


@pytest.mark.slow
def test_lpa_semisync_converges_on_bipartite_cycle(spark):
    """Synchronous LPA 2-cycles forever on a bipartite 4-cycle (each side
    adopts the other side's min label every round) — the adversarial
    fixture the r6 kernel honestly reported converged=false on at every
    round budget. The semi-synchronous half-round schedule breaks the
    oscillation: the even half updates first (2 and 4 both adopt label
    1), then the odd half sees those fresh labels — fixpoint in 2 full
    rounds, one community. A triangle (odd cycle) converges too."""
    from etl_master_spark.operators.analytics import lpa_labels

    square = _sym_edges(spark, [(1, 2), (2, 3), (3, 4), (4, 1)])
    lbl = lpa_labels(square, 6).collect()
    assert all(r["converged"] is True for r in lbl)
    assert all(r["rounds_used"] == 2 for r in lbl)
    assert {r["label"] for r in lbl} == {1}  # one community, min label

    triangle = _sym_edges(spark, [(1, 2), (2, 3), (1, 3)])
    lbl = lpa_labels(triangle, 4).collect()
    assert all(r["converged"] is True for r in lbl)
    assert {r["label"] for r in lbl} == {1}  # min-label fixpoint


def test_lpa_reports_truncation_under_tight_ceiling(spark):
    """The self-report's other polarity: a label front crosses one hop
    per half-round, so an 8-node path under a 1-round ceiling is still
    moving — converged=false, rounds_used=1 — and a roomy ceiling
    converges with rounds_used < ceiling (the adaptive stop is real)."""
    from etl_master_spark.operators.analytics import lpa_labels

    path = _sym_edges(spark, [(i, i + 1) for i in range(1, 8)])
    short = lpa_labels(path, 1).collect()
    assert all(r["converged"] is False and r["rounds_used"] == 1 for r in short)

    full = lpa_labels(path, 16).collect()
    assert all(r["converged"] is True for r in full)
    assert all(r["rounds_used"] < 16 for r in full)


@pytest.mark.slow
def test_pagerank_reports_nonconvergence_under_few_rounds(spark):
    """Damped power iteration contracts at rate 0.85 per round: on a
    3-node star-and-return graph, 2 rounds leave per-node movement far
    above tol (converged=false); 40 rounds shrink it below a loose tol
    (converged=true). Deltas must be monotone in the round count."""
    from pyspark.sql import functions as F

    from etl_master_spark.operators.analytics import pagerank_ranks

    nodes = spark.createDataFrame([("a",), ("b",), ("c",)], "node string")
    trans = spark.createDataFrame(
        [("a", "b", 0.5), ("a", "c", 0.5), ("b", "a", 1.0), ("c", "a", 1.0)],
        "src string, dst string, p double",
    )
    short = pagerank_ranks(nodes, trans, 3, iters=2, damp=0.85, tol=1e-3)
    srows = short.collect()
    assert all(r["converged"] is False and r["rounds_used"] == 2 for r in srows)

    long = pagerank_ranks(
        nodes, trans, 3, iters=40, damp=0.85, tol=1e-3, checkpoint_every=10
    )
    lrows = long.collect()
    assert all(r["converged"] is True for r in lrows)
    assert max(r["delta"] for r in lrows) < max(r["delta"] for r in srows)
    # ranks sum to 1 (stochastic invariant survives the bounded rounds)
    assert abs(sum(r["rank"] for r in lrows) - 1.0) < 1e-6
