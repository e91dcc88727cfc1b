"""The portable hash must agree between Python, Spark SQL, and DuckDB —
it is the determinism primitive every seeded operator builds on."""

from __future__ import annotations

import duckdb

from etl_master_spark.functions.hashing import (
    PHASH_P,
    phash_col,
    phash_frag,
    phash_py,
)


def test_python_matches_duckdb():
    for u, i, seed in [(0, 0, 2020), (7, 93, 2020), (12345, 67890, 72), (2**40, 3, 7)]:
        frag = phash_frag(str(u), str(i), seed=seed)
        (duck,) = duckdb.sql(f"SELECT {frag}").fetchone()
        assert duck == phash_py(u, i, seed=seed)


def test_python_matches_spark_frag_and_col(spark):
    from pyspark.sql import functions as F

    rows = [(0, 0), (7, 93), (12345, 67890), (2**40, 3)]
    df = spark.createDataFrame(rows, "u long, i long")
    out = df.select(
        "u",
        "i",
        F.expr(phash_frag("u", "i", seed=2020)).alias("frag"),
        phash_col(F.col("u"), F.col("i"), seed=2020).alias("col"),
    ).collect()
    for r in out:
        expect = phash_py(r["u"], r["i"], seed=2020)
        assert r["frag"] == expect
        assert r["col"] == expect


def test_range_and_dispersion():
    vals = {phash_py(u, i) for u in range(30) for i in range(30)}
    assert all(0 <= v < PHASH_P for v in vals)
    # 900 keys -> expect essentially no collisions
    assert len(vals) >= 895


def test_last_column_unit_step_disperses():
    """Regression: the hash chain's per-column step ends with "+ col", so
    without the final mixing round two keys whose LAST column differs by 1
    hashed 1 apart — turning every seeded shuffle whose last key is a small
    sequential id (item_id, component index) into a near-identity mapping."""
    for base in (0, 7, 12345):
        diffs = {
            abs(phash_py(base, i + 1) - phash_py(base, i)) for i in range(50)
        }
        assert min(diffs) > PHASH_P // 1000


def test_seeded_order_is_a_real_shuffle():
    """Ordering items of one user by the hash must not be monotone in
    item_id (that was the observable symptom of the missing mixing round)."""
    items = list(range(100))
    order = sorted(items, key=lambda i: phash_py(42, i, seed=2020))
    inversions = sum(
        1 for a in range(99) if order[a] > order[a + 1]
    )
    assert inversions > 20  # a sorted list has 0; random permutations ~50


def test_hash_bucket_spark_matches_duckdb(spark):
    """The shared feature-hash bucket (`text._hash_bucket` and its SQL
    twin) must agree engine-to-engine on arbitrary strings — it defines
    the feature space hashed_tf_vectors and dsir_weights share."""
    from pyspark.sql import functions as F

    from etl_master_spark.operators.text import _hash_bucket, _hash_bucket_sql

    terms = [
        "", "a", "the", "Zürich", "naïve", "123", "  spaced  ",
        "long-token-" * 10, "emoji🙂", "tab\tsep",
    ]
    df = spark.createDataFrame([(t,) for t in terms], "term string")
    got = {
        r["term"]: r["b"]
        for r in df.select("term", _hash_bucket().alias("b")).collect()
    }
    con = duckdb.connect()
    for t in terms:
        # the SQL twin interpolates the term EXPRESSION; bind it twice
        # (the fragment references its argument twice)
        (want,) = con.execute(
            "SELECT " + _hash_bucket_sql("?"), [t, t]
        ).fetchone()
        assert got[t] == want, t
