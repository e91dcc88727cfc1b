"""Link prediction (CN / Jaccard / Adamic-Adar) and the join-key skew
audit — planted graphs with hand-computable scores. Engine-vs-oracle
equality is covered by test_oracle_parity.py."""

from __future__ import annotations

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
