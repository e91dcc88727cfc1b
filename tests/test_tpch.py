"""Hand-computed semantics for the TPC-H remainder sweep's two rewrites
that change the classic spelling (oracle parity runs the SAME rewrite in
both engines, so only a constructed fixture can pin the semantics):

- sole_late_suppliers: Q21's exists/not-exists double self-join collapsed
  to one grouped pass — 'exactly one distinct late supplier in a
  multi-supplier finished order'.
- min_cost_supplier: Q2's correlated min decorrelated to agg+self-join —
  ties at the minimum must ALL survive.
"""

from __future__ import annotations

import datetime as dt

from etl_master_spark.operators.tpch import min_cost_supplier, sole_late_suppliers


def _write(spark, path, name, rows, schema):
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        f"{path}/{name}.parquet"
    )


def _base_dims(spark, path):
    _write(
        spark, path, "supplier",
        [(1, "Supp#1", 0, 100.0), (2, "Supp#2", 0, 200.0), (3, "Supp#3", 1, 300.0)],
        "s_suppkey long, s_name string, s_nationkey int, s_acctbal double",
    )
    _write(
        spark, path, "nation",
        [(0, "ALPHA", 0), (1, "BETA", 0)],
        "n_nationkey int, n_name string, n_regionkey int",
    )


def _li(orderkey, suppkey, shipdate, partkey=1, qty=1.0, price=10.0):
    return (orderkey, partkey, suppkey, 1, qty, price, 0.0, 0.0, "N", "O", shipdate)


LI_SCHEMA = (
    "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
    "l_quantity double, l_extendedprice double, l_discount double, "
    "l_tax double, l_returnflag string, l_linestatus string, l_shipdate timestamp"
)


def test_sole_late_supplier_semantics(spark, tmp_path):
    path = str(tmp_path)
    _base_dims(spark, path)
    t0 = dt.datetime(1997, 1, 1)
    late = t0 + dt.timedelta(days=90)   # > 60 days after order date
    ontime = t0 + dt.timedelta(days=10)
    _write(
        spark, path, "orders",
        [
            (1, 1, "F", 0.0, t0, "1-URGENT"),   # s1 late, s2 on time -> charge s1
            (2, 1, "F", 0.0, t0, "1-URGENT"),   # both late -> nobody charged
            (3, 1, "F", 0.0, t0, "1-URGENT"),   # single-supplier late -> not counted
            (4, 1, "O", 0.0, t0, "1-URGENT"),   # open order -> excluded entirely
            (5, 1, "F", 0.0, t0, "1-URGENT"),   # s2 late twice (1 distinct), s3 on time
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    _write(
        spark, path, "lineitem",
        [
            _li(1, 1, late), _li(1, 2, ontime),
            _li(2, 1, late), _li(2, 2, late),
            _li(3, 1, late),
            _li(4, 1, late), _li(4, 2, ontime),
            _li(5, 2, late), _li(5, 2, late), _li(5, 3, ontime),
        ],
        LI_SCHEMA,
    )
    out = {r["s_name"]: r["numwait"] for r in sole_late_suppliers(spark, path).collect()}
    assert out == {"Supp#1": 1, "Supp#2": 1}


def test_min_cost_supplier_keeps_ties(spark, tmp_path):
    path = str(tmp_path)
    _base_dims(spark, path)
    _write(
        spark, path, "part",
        [(1, "part1", "Brand#1", "STANDARD", 5, 10.0),
         (2, "part2", "Brand#1", "ECONOMY", 5, 10.0)],
        "p_partkey long, p_name string, p_brand string, p_type string, "
        "p_size int, p_retailprice double",
    )
    t0 = dt.datetime(1997, 1, 1)
    _write(
        spark, path, "lineitem",
        [
            # part 1: s1 and s2 tie at unit 5.0, s3 offers 6.0
            _li(1, 1, t0, partkey=1, qty=2.0, price=10.0),
            _li(1, 2, t0, partkey=1, qty=4.0, price=20.0),
            _li(1, 3, t0, partkey=1, qty=1.0, price=6.0),
            # part 2 is ECONOMY: filtered out even though cheaper
            _li(2, 3, t0, partkey=2, qty=1.0, price=1.0),
        ],
        LI_SCHEMA,
    )
    rows = min_cost_supplier(spark, path).collect()
    assert [(r["s_name"], r["p_partkey"], r["unit_price"]) for r in rows] == [
        ("Supp#2", 1, 5.0),   # acctbal 200 sorts first
        ("Supp#1", 1, 5.0),
    ]
