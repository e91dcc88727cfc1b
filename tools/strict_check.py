"""Hash-strict replay of the round driver's correctness gate.

Differences from driver_replay.py (which keeps a float-tolerant compare):
- the Spark session is built PLAIN — no engine config, a non-UTC session
  timezone — to mimic the driver's unknown session and flush out any
  timezone- or reader-config-dependent expression;
- values compare STRICTLY: pandas dtype kinds must agree (int vs float is
  a failure: DuckDB HUGEINT→float64 coercion is exactly the bug class the
  driver's value-hash catches) and values must be exactly equal;
- every query runs in isolation; one failure never stops the sweep.

Usage: python tools/strict_check.py [sf_dir] [name_substring ...]

Caveat for non-default sf_dir: the three frozen-scores model evals
(als/cdae/gan_eval_test) freeze per-sf but their STATIC oracle strings
must name one path, and they name the driver's sf0.01 gate (see
ranking.frozen_eval_oracle) — at any other sf_dir those three report a
size mismatch BY CONSTRUCTION, not a correctness failure (pytest
replays other scales through frozen_eval_oracle(sf_name=...)).
"""

from __future__ import annotations

import importlib.util
import sys
import time
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd

REPO = Path(__file__).resolve().parent.parent
GATE_SF = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df.columns = [c.lower() for c in df.columns]
    df = df[sorted(df.columns)]
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def strict_match(a: pd.Series, b: pd.Series) -> tuple[bool, str]:
    ka, kb = a.dtype.kind, b.dtype.kind
    if (ka in "iu") != (kb in "iu") and {ka, kb} <= set("iuf"):
        return False, f"dtype kind mismatch: {a.dtype} vs {b.dtype}"
    if ka == "f" or kb == "f":
        av, bv = a.astype(float).values, b.astype(float).values
        ok = (av == bv) | (np.isnan(av) & np.isnan(bv))
        if not ok.all():
            i = int(np.argmin(ok))
            return False, f"row {i}: {av[i]!r} vs {bv[i]!r}"
        return True, ""
    neq = ~(a.astype(str) == b.astype(str))
    if neq.any():
        i = int(np.argmax(neq.values))
        return False, f"row {i}: {a.iloc[i]!r} vs {b.iloc[i]!r}"
    return True, ""


def main() -> int:
    args = [a for a in sys.argv[1:]]
    sf_dir = GATE_SF
    if args and Path(args[0]).is_dir():
        sf_dir = args.pop(0)
    name_filters = args

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", REPO / "__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    from pyspark.sql import SparkSession

    # deliberately plain + non-UTC: the driver's session is not ours
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "America/New_York")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    queries = mod.queries()
    oracles = mod.oracle_sql()
    if name_filters:
        queries = {
            k: v for k, v in queries.items()
            if any(f in k for f in name_filters)
        }

    # the frozen-scores model evals freeze per-sf but their STATIC oracle
    # strings name the driver's sf0.01 gate path (see module docstring) —
    # at any other sf_dir a compare would be frozen-vs-other-freeze noise
    frozen_gate_only = {"als_eval_test", "cdae_eval_test", "gan_eval_test"}
    # resolved-path compare: a basename match alone would treat any
    # directory named sf0.01 as the driver gate (r4 ADVICE)
    at_gate = Path(sf_dir).resolve() == Path(GATE_SF).resolve()

    n_fail = 0
    for name, fn in queries.items():
        if name in frozen_gate_only and not at_gate:
            print(
                f"skip {name}: frozen-scores oracle is gate-scale-only "
                f"(replaying at {Path(sf_dir).name}; pytest covers other "
                "scales via frozen_eval_oracle(sf_name=...))"
            )
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {str(e).splitlines()[0][:200]}")
            n_fail += 1
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"ok?  {name}: rows-only ({len(sdf)} rows, no oracle) "
                  f"[{time.time()-t0:.1f}s]")
            continue
        try:
            odf = con.execute(sql).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {str(e).splitlines()[0][:200]}")
            n_fail += 1
            continue
        s, o = normalize(sdf), normalize(odf)
        if len(s) != len(o):
            print(f"FAIL {name}: rows {len(s)} vs {len(o)}")
            n_fail += 1
            continue
        if list(s.columns) != list(o.columns):
            print(f"FAIL {name}: cols {list(s.columns)} vs {list(o.columns)}")
            n_fail += 1
            continue
        bad = []
        for c in s.columns:
            ok, msg = strict_match(s[c], o[c])
            if not ok:
                bad.append(f"{c}: {msg}")
        if bad:
            print(f"FAIL {name}: " + "; ".join(bad))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(s)} rows) [{time.time()-t0:.1f}s]")

    print(f"\n{n_fail} failures / {len(queries)} checked")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
