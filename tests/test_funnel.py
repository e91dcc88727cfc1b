"""Hand-computed funnel semantics: the sequential constraint and the 12h
per-stage window must actually bind (parity alone can't show WHY a user
dropped out of a stage)."""

from __future__ import annotations

import datetime as dt

from etl_master_spark.operators.analytics import conversion_funnel


def _write_events(spark, path, rows):
    spark.createDataFrame(
        [
            (i, ts, uid, et, 1.0, "{}")
            for i, (ts, uid, et) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(f"{path}/events.parquet")


def test_funnel_sequential_and_window(spark, tmp_path):
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    h = dt.timedelta(hours=1)
    rows = [
        # user 1: full funnel inside the windows
        (t0, 1, "view"), (t0 + h, 1, "click"), (t0 + 2 * h, 1, "purchase"),
        # user 2: click BEFORE first view -> not a conversion; no later click
        (t0, 2, "click"), (t0 + h, 2, "view"), (t0 + 2 * h, 2, "purchase"),
        # user 3: click after view but outside the 12h window
        (t0, 3, "view"), (t0 + dt.timedelta(hours=13), 3, "click"),
        # user 4: view+click ok, purchase 13h after the click -> missed
        (t0, 4, "view"), (t0 + h, 4, "click"),
        (t0 + h + dt.timedelta(hours=13), 4, "purchase"),
        # user 5: never views
        (t0, 5, "signup"),
    ]
    _write_events(spark, str(tmp_path), rows)
    out = conversion_funnel(spark, str(tmp_path)).collect()[0]
    assert out["users_total"] == 5
    assert out["viewed"] == 4          # users 1-4
    assert out["clicked"] == 2         # users 1, 4 (2: wrong order; 3: late)
    assert out["purchased"] == 1       # user 1 only (4: late)
    assert abs(out["click_through"] - 0.5) < 1e-9
    assert abs(out["purchase_through"] - 0.5) < 1e-9


def test_weekly_retention_triangle(spark, tmp_path):
    """Hand-computed cohort triangle: 2024-01-01 is a Monday, so weeks are
    exactly w0=01-01, w1=01-08, w2=01-15."""
    from etl_master_spark.operators.analytics import weekly_retention

    t = dt.datetime
    rows = [
        # u1: cohort w0, active w0 and w2 (skips w1)
        (t(2024, 1, 2, 10), 1, "view"), (t(2024, 1, 16, 9), 1, "click"),
        # u2: cohort w0 only
        (t(2024, 1, 3, 8), 2, "view"),
        # u3: cohort w1, active w1 + w2
        (t(2024, 1, 8, 0), 3, "purchase"), (t(2024, 1, 19, 5), 3, "view"),
    ]
    _write_events(spark, str(tmp_path), rows)
    got = {
        (r["cohort_week"], r["week_offset"]): (
            r["active_users"],
            r["cohort_size"],
            r["retention"],
        )
        for r in weekly_retention(spark, str(tmp_path)).collect()
    }
    assert got == {
        ("2024-01-01", 0): (2, 2, 1.0),
        ("2024-01-01", 2): (1, 2, 0.5),
        ("2024-01-08", 0): (1, 1, 1.0),
        ("2024-01-08", 1): (1, 1, 1.0),
    }


def test_triangle_count_matches_pure_python_census(spark):
    """Recount the co-purchase triangle census independently: rebuild the
    thresholded edge set in Python from the raw lineitem rows and count
    triangles by neighbor-set intersection — the Spark three-way self-join
    must agree on all three census numbers."""
    from itertools import combinations

    from etl_master_spark.operators.analytics import (
        TRIANGLE_MIN_COUNT,
        triangle_count,
    )
    from etl_master_spark.sources.io import load_table

    sf = "/root/testdata/sf0.001"
    rows = (
        load_table(spark, sf, "lineitem")
        .select("l_orderkey", "l_partkey")
        .collect()
    )
    baskets: dict[int, set[int]] = {}
    for r in rows:
        baskets.setdefault(r["l_orderkey"], set()).add(r["l_partkey"])
    support: dict[tuple[int, int], int] = {}
    for parts in baskets.values():
        for a, b in combinations(sorted(parts), 2):
            support[(a, b)] = support.get((a, b), 0) + 1
    edges = {p for p, n in support.items() if n >= TRIANGLE_MIN_COUNT}
    nbrs: dict[int, set[int]] = {}
    for a, b in edges:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    n_tri = sum(
        1 for a, b in edges for c in (nbrs[a] & nbrs[b]) if b < c
    )
    got = triangle_count(spark, sf).collect()[0]
    assert got["n_edges"] == len(edges)
    assert got["n_nodes"] == len(nbrs)
    assert got["n_triangles"] == n_tri
