"""Best-of-2 re-measure of named registry queries at ×1 / ×N against the
scale_sweep ledger: REPLACES each named query's ledger row in place (the
sweep's single-shot rows are triage; anything flagged gets this re-measure
before it is believed — and fixed queries get their post-fix numbers).

Usage: python tools/remeasure.py [--mult N] query [query ...]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

from tools.scale_sweep import LEDGER
from tools.scale_table import BASE_SF, build_replica


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=100)
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    from etl_master_spark.plans.registry import QUERIES
    from etl_master_spark.session import get_spark

    sf_n = build_replica(args.mult)
    spark = get_spark(app_name="remeasure")

    def force(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    def best2(name: str, sf: str) -> float:
        times = []
        for _ in range(2):
            t0 = time.time()
            force(QUERIES[name](spark, sf))
            times.append(time.time() - t0)
            spark.catalog.clearCache()
        return round(min(times), 3)

    rows = {
        json.loads(l)["query"]: json.loads(l)
        for l in LEDGER.read_text().splitlines()
        if l.strip()
    }
    for name in args.names:
        force(QUERIES[name](spark, "/root/testdata/sf0.001"))  # warm plan
        spark.catalog.clearCache()
        x1 = best2(name, BASE_SF)
        xn = best2(name, sf_n)
        rows[name] = {
            "query": name, "status": "ok", "x1": x1,
            f"x{args.mult}": xn, "ratio": round(xn / x1, 2),
            "protocol": "best-of-2",
        }
        print(json.dumps(rows[name]), flush=True)
    LEDGER.write_text("".join(json.dumps(r) + "\n" for r in rows.values()))


if __name__ == "__main__":
    main()
