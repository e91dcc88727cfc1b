"""Mini replica of the driver's DuckDB-oracle correctness gate.

Runs a Spark query and its oracle SQL side-by-side, then compares row count,
column names, and an order-insensitive value comparison (sorted by all
columns). Used by tests/test_oracle_parity.py so the repo's own `pytest`
run predicts CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df.columns = [c.lower() for c in df.columns]
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns), ignore_index=True)


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> list[str]:
    """Return a list of mismatch descriptions (empty == pass)."""
    sp = _normalize(spark_df.toPandas())
    du = _normalize(con.sql(sql).df())
    problems: list[str] = []
    if list(sp.columns) != list(du.columns):
        problems.append(f"columns: spark={list(sp.columns)} duck={list(du.columns)}")
        return problems
    if len(sp) != len(du):
        problems.append(f"rowcount: spark={len(sp)} duck={len(du)}")
        return problems
    for c in sp.columns:
        a, b = sp[c], du[c]
        if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
            bad = [
                i
                for i, (x, y) in enumerate(zip(a, b))
                if not (
                    (pd.isna(x) and pd.isna(y))
                    or (x == y)
                    or math.isclose(float(x), float(y), rel_tol=1e-9, abs_tol=1e-9)
                )
            ]
        else:
            neq = ~(a.astype(str) == b.astype(str))
            bad = list(a.index[neq])
        if bad:
            i = bad[0]
            problems.append(
                f"col {c}: {len(bad)} mismatches, first at row {i}: "
                f"spark={a.iloc[i]!r} duck={b.iloc[i]!r}"
            )
    return problems
