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
