"""Dump `.explain("formatted")` for benched queries to plans/$SPARK_GRAFT_PLANS_ROUND/ (default r11).

Usage: python tools/capture_plans.py before|after [substr ...]

Writes plans/<round>/<query>_<tag>.txt for each selected query at
$SPARK_GRAFT_SF_DIR (default sf0.1). Explain-only — no execution, so
timings elsewhere are unaffected; constructions that localCheckpoint
still run their materialization jobs (that IS part of the plan shape).
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    import bench
    from etl_master_spark.plans.registry import QUERIES
    from etl_master_spark.session import get_spark

    tag = sys.argv[1]
    subs = sys.argv[2:]
    names = [
        n for n in bench.BENCH_QUERIES if not subs or any(s in n for s in subs)
    ]
    out_dir = REPO / "plans" / os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r11")
    out_dir.mkdir(parents=True, exist_ok=True)
    spark = get_spark(app_name=f"capture_plans_{tag}")
    for n in names:
        try:
            df = QUERIES[n](spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001
            plan = f"ERROR constructing/explaining: {e}\n"
            print(f"FAIL {n}: {e}", file=sys.stderr)
        (out_dir / f"{n}_{tag}.txt").write_text(plan)
        print(f"wrote {n}_{tag}.txt")
    spark.stop()


if __name__ == "__main__":
    main()
