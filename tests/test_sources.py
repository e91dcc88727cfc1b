"""CSV / JSON-lines source connectors round-trip losslessly."""

from __future__ import annotations

from etl_master_spark.sources.io import (
    load_table,
    read_csv,
    read_jsonl,
    write_csv,
    write_jsonl,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_csv_roundtrip(spark, sf_dir, tmp_path):
    nation = load_table(spark, sf_dir, "nation")
    path = str(tmp_path / "nation_csv")
    write_csv(nation, path)
    back = read_csv(spark, path, nation.schema)
    assert back.schema == nation.schema
    assert _rows(back) == _rows(nation)


def test_jsonl_roundtrip(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    path = str(tmp_path / "docs_jsonl")
    write_jsonl(docs, path)
    back = read_jsonl(spark, path, docs.schema)
    assert back.schema == docs.schema
    assert _rows(back) == _rows(docs)


def test_orc_roundtrip_and_pushdown(spark, sf_dir, tmp_path):
    from pyspark.sql import functions as F

    from etl_master_spark.sources.io import read_orc, write_orc

    orders = load_table(spark, sf_dir, "orders")
    path = str(tmp_path / "orders_orc")
    write_orc(orders, path)
    back = read_orc(spark, path)
    assert back.schema == orders.schema
    assert _rows(back) == _rows(orders)
    # predicate + projection must reach the ORC scan like they do parquet
    plan = (
        back.filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [" in plan and "o_orderpriority" in plan.split("PushedFilters")[1][:200]
