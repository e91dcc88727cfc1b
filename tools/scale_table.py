"""Measured-scaling harness: time registry queries at ×1 vs an on-disk ×N
replica of their input tables.

Round 3 measured a 10× table with an ad-hoc replica; this tool makes the
experiment repeatable and extends it to ×100 for the quadratic-risk
family (the scales where a bucket-occupancy blowup that ×10 hides would
surface). Replicas are key-shifted unions:

- documents: new doc_ids per copy, text suffixed with the copy index so
  copies are near- (shingle-overlapping) not exact duplicates;
- embeddings: new vec_ids per copy; copy k's vector is the original
  CIRCULARLY ROTATED by k (mod 64) components with a sign flip for
  k >= 64 — a rotation of a random vector is directionally uncorrelated
  with it, so dup DENSITY stays constant while the corpus grows ×N
  (small multiplicative noise turned out to preserve direction, which
  silently turned the replica into a ×N dup-density corpus and measured
  the quadratic dup-group regime instead of growth);
- lineitem: new orderkeys per copy, same part catalog — baskets ×N ⇒
  co-occurrence edges ×N, triangles ×N, linear by construction;
- orders: the SAME orderkey shift as lineitem (joins stay 1:1 correct —
  the round-5 lesson: shifting only lineitem breaks orders↔lineitem and
  silently measures a broken join), customer keys unchanged so every
  customer carries ×N fan-in (density scaling, the sf10 shape);
- events: new event ids AND new user ids per copy, same event-type
  catalog and time range — per-hour density grows ×N while per-user
  history stays realistic.

Other tables are copied through unchanged so `load_table` works.

Usage: python tools/scale_table.py [mult] [query ...]
  default: mult=100, queries = the quadratic-risk family.
Prints one JSON line: {"mult": N, "queries": {name: {"x1": s, "xN": s}}}
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
from pathlib import Path

import duckdb

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

BASE_SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
# v2: the replica now also rewrites orders (consistent orderkeys) and
# events — versioned dir so a v1 cache is never silently reused
WORK = Path("/tmp/etl_master_scale_table_v2")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]
DEFAULT_QUERIES = [
    "embedding_dedup_clusters",
    "duplicate_passages",
    "triangle_count",
    "dedup_embedding_cosine_lsh_p99",
]


def build_replica(mult: int) -> str:
    out = WORK / f"x{mult}"
    if (out / "embeddings.parquet").exists():
        return str(out)
    out.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 8}")

    def shift(table: str, col: str) -> int:
        """Key shift per copy = next power of 10 above the observed max id
        times the copy count — a FIXED shift silently collides once
        BASE_SF grows past it (copy k's ids overlapping copy k+1's turns
        the replica into a dup-density corpus, the failure mode this
        module's docstring recounts for documents)."""
        mx = con.execute(
            f"SELECT MAX({col}) FROM read_parquet('{BASE_SF}/{table}.parquet')"
        ).fetchone()[0]
        s = 10 ** len(str(int(mx)))
        assert s * mult < 2**62, (table, col, mx, mult)
        return s

    d_sh = shift("documents", "doc_id")
    v_sh = shift("embeddings", "vec_id")
    o_sh = max(
        shift("lineitem", "l_orderkey"), shift("orders", "o_orderkey")
    )
    e_sh = shift("events", "event_id")
    u_sh = shift("events", "user_id")
    rep = {
        "documents": f"""
            SELECT doc_id + {d_sh} * r.k AS doc_id,
                   CASE WHEN r.k = 0 THEN text
                        ELSE text || ' copy' || r.k END AS text,
                   lang, source, n_chars
            FROM read_parquet('{BASE_SF}/documents.parquet')
            CROSS JOIN (SELECT unnest(range(0, {mult})) AS k) r
        """,
        "embeddings": f"""
            SELECT vec_id + {v_sh} * r.k AS vec_id,
                   CASE WHEN r.k = 0 THEN embedding ELSE
                     list_transform(
                       range(1, len(embedding) + 1),
                       i -> CAST(
                         (CASE WHEN r.k >= 64 THEN -1.0 ELSE 1.0 END)
                         * embedding[
                             CAST(((i - 1 + r.k) % len(embedding)) + 1
                                  AS INT)]
                         AS FLOAT))
                   END AS embedding,
                   label
            FROM read_parquet('{BASE_SF}/embeddings.parquet')
            CROSS JOIN (SELECT unnest(range(0, {mult})) AS k) r
        """,
        "lineitem": f"""
            SELECT l_orderkey + {o_sh} * r.k AS l_orderkey,
                   l_partkey, l_suppkey, l_linenumber, l_quantity,
                   l_extendedprice, l_discount, l_tax, l_returnflag,
                   l_linestatus, l_shipdate
            FROM read_parquet('{BASE_SF}/lineitem.parquet')
            CROSS JOIN (SELECT unnest(range(0, {mult})) AS k) r
        """,
        "orders": f"""
            SELECT o_orderkey + {o_sh} * r.k AS o_orderkey,
                   o_custkey, o_orderstatus, o_totalprice, o_orderdate,
                   o_orderpriority
            FROM read_parquet('{BASE_SF}/orders.parquet')
            CROSS JOIN (SELECT unnest(range(0, {mult})) AS k) r
        """,
        "events": f"""
            SELECT event_id + {e_sh} * r.k AS event_id, ts,
                   user_id + {u_sh} * r.k AS user_id,
                   event_type, value, props
            FROM read_parquet('{BASE_SF}/events.parquet')
            CROSS JOIN (SELECT unnest(range(0, {mult})) AS k) r
        """,
    }
    for t in TABLES:
        dst = out / f"{t}.parquet"
        if t in rep:
            con.execute(f"COPY ({rep[t]}) TO '{dst}' (FORMAT PARQUET)")
        else:
            shutil.copyfile(f"{BASE_SF}/{t}.parquet", dst)
    return str(out)


def main() -> None:
    args = sys.argv[1:]
    # the multiplier may only be the FIRST argument; a numeric anywhere
    # else is almost certainly a misplaced multiplier — refuse instead of
    # silently running the default x100 replica
    mult = int(args[0]) if args and args[0].isdigit() else 100
    rest = args[1:] if args and args[0].isdigit() else args
    stray = [a for a in rest if a.isdigit()]
    if stray:
        raise SystemExit(
            f"scale_table: numeric argument(s) {stray} after the query "
            "names — the multiplier must come first: "
            "scale_table.py [mult] [query ...]"
        )
    names = rest or DEFAULT_QUERIES

    from etl_master_spark.plans.registry import QUERIES
    from etl_master_spark.session import get_spark

    sf_n = build_replica(mult)
    spark = get_spark(app_name="scale_table")
    # warm plan shapes at the small scale
    for name in names:
        QUERIES[name](spark, "/root/testdata/sf0.001").count()
    spark.catalog.clearCache()

    out: dict[str, dict[str, float]] = {n: {} for n in names}
    for tag, sf in (("x1", BASE_SF), (f"x{mult}", sf_n)):
        for _ in range(2):  # min of 2 warm passes (bench.py protocol)
            for name in names:
                t0 = time.time()
                QUERIES[name](spark, sf).count()
                e = round(time.time() - t0, 2)
                if tag not in out[name] or e < out[name][tag]:
                    out[name][tag] = e
                spark.catalog.clearCache()
    print(json.dumps({"mult": mult, "sf": BASE_SF, "queries": out}))


if __name__ == "__main__":
    main()
