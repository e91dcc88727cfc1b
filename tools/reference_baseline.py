"""Single-node reference-architecture baseline for BASELINE.md.

The reference repo publishes no performance numbers (BASELINE.md), so the
"matches-or-beats the reference's single-node throughput" criterion needs a
measured stand-in. This script re-creates the reference's DATA ARCHITECTURE
— per-user Python dicts, per-user loops, numpy candidate scoring (semantics
per SURVEY.md §2; no reference code is copied) — on the SAME input the
engine uses (events→ratings at a given sf dir) and times the three pipeline
stages the engine benches:

  1. split    — leave-two-out per user per domain (shuffle, take 2)
                [reference shape: Dataset_CDAE.py:100-124 per-user loop]
  2. negatives— 99 never-interacted items per user per domain via
                set-difference + shuffle [Dataset_CDAE.py:110-111,123-124]
  3. eval     — 100-candidate popularity scoring, argsort top-10,
                HR/NDCG/MRR means [my_utils.py:70-152 batch numpy]

Prints one JSON line: {"stage_sec": {...}, "total_sec": N, "sf": ...,
"n_users": ..., "n_interactions": ...} for side-by-side comparison with
bench.py's splits_leave_two_out / negatives_sample / eval_metrics_test.

Usage: python tools/reference_baseline.py [sf_dir]
"""

from __future__ import annotations

import json
import re
import sys
import time

import duckdb
import numpy as np

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def load_ratings(sf_dir: str):
    """events→ratings exactly like the engine's RATINGS_SQL, but into the
    reference's native structure: one user→items dict per domain."""
    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT DISTINCT user_id,
               CAST(regexp_extract(props, '([0-9]+)', 1) AS BIGINT) AS item_id,
               CASE WHEN event_type IN ('click', 'view') THEN 'x' ELSE 'y' END AS domain
        FROM read_parquet('{sf_dir}/events.parquet')
        """
    ).fetchall()
    peo2item: dict[str, dict[int, list[int]]] = {"x": {}, "y": {}}
    for user, item, domain in rows:
        peo2item[domain].setdefault(user, []).append(item)
    return peo2item, len(rows)


def main() -> None:
    t0 = time.time()
    peo2item, n_inter = load_ratings(SF_DIR)
    load_sec = time.time() - t0

    rng_split = np.random.RandomState(2020)
    catalogs = {
        d: sorted({i for items in peo2item[d].values() for i in items})
        for d in ("x", "y")
    }

    # stage 1: leave-two-out split (per-user loop, like the reference)
    t0 = time.time()
    vali: dict[str, dict[int, int]] = {"x": {}, "y": {}}
    test: dict[str, dict[int, int]] = {"x": {}, "y": {}}
    for d in ("x", "y"):
        for user, items in peo2item[d].items():
            if len(items) >= 2:
                perm = rng_split.permutation(len(items))
                vali[d][user] = items[perm[0]]
                test[d][user] = items[perm[1]]
            else:
                vali[d][user] = test[d][user] = items[0]
    split_sec = time.time() - t0

    # stage 2: 99 negatives per user per domain (set difference + shuffle)
    t0 = time.time()
    nega: dict[str, dict[int, list[int]]] = {"x": {}, "y": {}}
    for d in ("x", "y"):
        catalog = set(catalogs[d])
        for user, items in peo2item[d].items():
            pool = list(catalog - set(items))
            perm = rng_split.permutation(len(pool))[:99]
            nega[d][user] = [pool[i] for i in perm]
    nega_sec = time.time() - t0

    # stage 3: popularity-scored 100-candidate eval, batch numpy
    t0 = time.time()
    metrics = {}
    for d in ("x", "y"):
        pop: dict[int, int] = {}
        for items in peo2item[d].values():
            for i in items:
                pop[i] = pop.get(i, 0) + 1
        users = sorted(nega[d])
        # pool can be < 99 on small catalogs: pad with a sentinel item of
        # popularity 0 so every row is 100 wide and the positive stays at
        # index 99 (the reference's convention)
        cand = np.array(
            [
                nega[d][u] + [-1] * (99 - len(nega[d][u])) + [test[d][u]]
                for u in users
            ],
            dtype=np.int64,
        )
        # dense popularity array + fancy indexing — the reference's own
        # gather style (score-matrix row indexing, my_utils.py:134-135);
        # sentinel -1 lands on the 0-popularity tail slot
        pop_arr = np.zeros(max(pop) + 2 if pop else 2, dtype=float)
        for i, c in pop.items():
            pop_arr[i] = float(c)
        scores = pop_arr[cand]
        order = np.argsort(-scores, kind="stable", axis=1)[:, :10]
        hit_pos = np.where(order == 99)  # positive is always index 99
        hr = np.zeros(len(users))
        ndcg = np.zeros(len(users))
        mrr = np.zeros(len(users))
        hr[hit_pos[0]] = 1.0
        ndcg[hit_pos[0]] = np.log(2.0) / np.log(hit_pos[1] + 2.0)
        mrr[hit_pos[0]] = 1.0 / (hit_pos[1] + 1.0)
        metrics[d] = (float(hr.mean()), float(ndcg.mean()), float(mrr.mean()))
    eval_sec = time.time() - t0

    sf = re.search(r"sf([0-9.]+)", SF_DIR)
    print(
        json.dumps(
            {
                "metric": "reference_singlenode_total_sec",
                "stage_sec": {
                    "load_dicts": round(load_sec, 3),
                    "split_leave_two_out": round(split_sec, 3),
                    "negatives_99": round(nega_sec, 3),
                    "eval_hr_ndcg_mrr": round(eval_sec, 3),
                },
                "total_sec": round(load_sec + split_sec + nega_sec + eval_sec, 3),
                "sf": float(sf.group(1)) if sf else SF_DIR,
                "n_users": {d: len(peo2item[d]) for d in ("x", "y")},
                "n_interactions": n_inter,
                "metrics_hr_ndcg_mrr": metrics,
            }
        )
    )


if __name__ == "__main__":
    main()
