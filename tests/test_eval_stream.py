"""Incremental streaming eval must equal the batch flagship on every
prefix — not just converge at the end (r6 verdict item 8).

The stream is the sf0.001 events table split into 3 arrival chunks
(one micro-batch each). After the run, the appended metrics row for
batch i must equal ``ranking.eval_metrics`` executed in batch mode on
the concatenation of chunks 0..i. This exercises the whole affected-set
machinery: chunk boundaries land mid-user (touched-user recompute),
introduce new items (domain-wide negative reshuffles), and move train
popularity (candidate-holder re-scoring).
"""

from __future__ import annotations

import math

import pyarrow.parquet as pq
import pytest

N_CHUNKS = 3


@pytest.fixture(scope="module")
def stream_setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("eval_stream")
    table = pq.read_table("/root/testdata/sf0.001/events.parquet")
    n = table.num_rows
    step = math.ceil(n / N_CHUNKS)
    stream_dir = root / "arrivals"
    stream_dir.mkdir()
    prefix_dirs = []
    for i in range(N_CHUNKS):
        chunk = table.slice(i * step, step)
        pq.write_table(chunk, stream_dir / f"chunk_{i}.parquet")
        pdir = root / f"prefix_{i}"
        pdir.mkdir()
        pq.write_table(table.slice(0, min(n, (i + 1) * step)),
                       pdir / "events.parquet")
        prefix_dirs.append(str(pdir))
    return str(stream_dir), prefix_dirs, str(root / "work")


@pytest.fixture(scope="module")
def metric_history(spark, stream_setup):
    from etl_master_spark.streaming.eval_stream import (
        incremental_eval_metrics,
        read_metric_history,
    )

    stream_dir, prefix_dirs, work_dir = stream_setup
    q = incremental_eval_metrics(
        spark, "/root/testdata/sf0.001", stream_dir, work_dir
    )
    q.awaitTermination(600)
    rows = read_metric_history(spark, work_dir).collect()
    return rows


def _key(r):
    return (r["domain"], r["k"])


def test_stream_emits_one_metrics_row_per_batch_domain_k(metric_history):
    batches = {r["batch_id"] for r in metric_history}
    assert batches == set(range(N_CHUNKS))
    for b in batches:
        keys = [_key(r) for r in metric_history if r["batch_id"] == b]
        assert len(keys) == len(set(keys))
        assert set(keys) == {("x", 5), ("x", 10), ("y", 5), ("y", 10)}


def test_stream_metrics_equal_batch_eval_on_every_prefix(
    spark, stream_setup, metric_history
):
    from etl_master_spark.operators.ranking import eval_metrics

    _, prefix_dirs, _ = stream_setup
    for i, pdir in enumerate(prefix_dirs):
        expected = {
            _key(r): r for r in eval_metrics(spark, pdir, mode="test").collect()
        }
        got = {
            _key(r): r for r in metric_history if r["batch_id"] == i
        }
        assert set(got) == set(expected), f"prefix {i}"
        for key, g in got.items():
            e = expected[key]
            assert g["n_users"] == e["n_users"], (i, key)
            for m in ("hr", "ndcg", "mrr"):
                assert g[m] == pytest.approx(e[m], abs=1e-9), (i, key, m)


@pytest.mark.slow
def test_affected_set_stays_bounded_on_wide_catalog(spark, tmp_path):
    """The steady-state contract: with |catalog| >> |candidates| a
    single-user micro-batch's affected set is that user plus the few
    holders of its popularity-delta'd items — NOT the user base. (The
    gate testdata cannot show this: its 100-item catalog vs 99 sampled
    negatives makes every user hold nearly every item, so any pop delta
    legitimately fans out to everyone — the degenerate regime the
    module docstring documents.) Also checks the bounded regime stays
    EXACT vs the batch eval on the final prefix."""
    import pandas as pd

    from etl_master_spark.operators.ranking import eval_metrics
    from etl_master_spark.streaming.eval_stream import (
        incremental_eval_metrics,
        read_metric_history,
    )

    n_users, items_per_user, catalog = 400, 30, 100_000
    rows = []
    eid = 0
    for u in range(1, n_users + 1):
        for j in range(items_per_user):
            item = (u * 37 + j * 101) % catalog  # spread across the catalog
            rows.append((eid, u, "click", f'{{"k": {item}}}'))
            eid += 1
    # the steady-state micro-batch: 2 fresh events of ONE user, items
    # ALREADY in the catalog (novel items trip the catalog-growth rule,
    # which correctly recomputes the whole domain — not this regime)
    tail = [(eid, 1, "click", '{"k": 488}'), (eid + 1, 1, "click", '{"k": 461}')]

    def write_chunk(path, data):
        pdf = pd.DataFrame(
            data, columns=["event_id", "user_id", "event_type", "props"]
        )
        pdf["ts"] = pd.to_datetime("2024-01-01") + pd.to_timedelta(
            pdf["event_id"], unit="s"
        )
        pdf["value"] = 1.0
        pdf[
            ["event_id", "ts", "user_id", "event_type", "value", "props"]
        ].to_parquet(path, index=False, coerce_timestamps="us")

    stream_dir = tmp_path / "arrivals"
    stream_dir.mkdir()
    write_chunk(stream_dir / "chunk_0.parquet", rows)
    write_chunk(stream_dir / "chunk_1.parquet", tail)
    full_dir = tmp_path / "full"
    full_dir.mkdir()
    write_chunk(full_dir / "events.parquet", rows + tail)

    stats: list = []
    q = incremental_eval_metrics(
        spark, str(full_dir), str(stream_dir), str(tmp_path / "work"),
        stats=stats,
    )
    q.awaitTermination(600)

    by_batch = {s["batch_id"]: s for s in stats}
    assert by_batch[0]["affected_users"] == n_users  # cold start: everyone
    # steady state: the touched user + holders of ~4 delta'd items among
    # 99-of-100k sampled negatives — orders of magnitude below n_users
    assert by_batch[1]["affected_users"] <= n_users // 10, by_batch[1]
    assert by_batch[1]["new_ratings"] == 2

    final = {
        (r["domain"], r["k"]): r
        for r in read_metric_history(spark, str(tmp_path / "work")).collect()
        if r["batch_id"] == 1
    }
    batch = {
        (r["domain"], r["k"]): r
        for r in eval_metrics(spark, str(full_dir), mode="test").collect()
    }
    assert set(final) == set(batch)
    for key, b in batch.items():
        g = final[key]
        assert g["n_users"] == b["n_users"]
        for m in ("hr", "ndcg", "mrr"):
            assert g[m] == pytest.approx(b[m], abs=1e-9)


def test_stream_final_equals_flagship_on_full_table(spark, metric_history):
    from etl_master_spark.operators.ranking import eval_metrics

    final = {
        _key(r): r
        for r in metric_history
        if r["batch_id"] == N_CHUNKS - 1
    }
    batch = {
        _key(r): r
        for r in eval_metrics(
            spark, "/root/testdata/sf0.001", mode="test"
        ).collect()
    }
    assert set(final) == set(batch)
    for key, b in batch.items():
        g = final[key]
        assert g["n_users"] == b["n_users"]
        for m in ("hr", "ndcg", "mrr"):
            assert g[m] == pytest.approx(b[m], abs=1e-9)


def test_prefix_compaction_folds_and_reads_identically(spark, tmp_path):
    """State-level contract of compact_chunks: after a fold, every
    epoch-bounded read returns exactly the rows it returned before; the
    folded e-dirs are gone; and a crash that leaves both the compacted
    dir AND its source chunks on disk never double-counts a row."""
    import shutil

    from etl_master_spark.streaming.eval_stream import _State

    st = _State(spark, str(tmp_path))
    chunks = {
        e: [(e * 10 + i, f"u{e}") for i in range(3)] for e in range(5)
    }
    for e, rows in chunks.items():
        st.append_chunk(
            "prefix", e, spark.createDataFrame(rows, "item_id long, u string")
        )

    def snap(epoch_lt):
        df = st.read_chunks("prefix", epoch_lt)
        return sorted(tuple(r) for r in df.collect()) if df is not None else None

    before = {lt: snap(lt) for lt in range(7)}
    # crash-state rehearsal: copy the chunk dirs aside before the fold
    saved = tmp_path / "saved"
    shutil.copytree(tmp_path / "prefix", saved)

    st.compact_chunks("prefix", epoch_cur=5, every=4)  # folds e0..e4 -> c4
    assert st._bounds("prefix") == [4]
    assert st._epochs("prefix") == []
    # the replay contract: folds run with epoch_cur = the running batch,
    # and streaming redelivers only that (uncommitted) epoch — so every
    # read a replay can issue (epoch_lt > bound) is content-identical.
    # Reads at-or-below the bound are subsumed by design.
    live = lambda: {lt: snap(lt) for lt in range(5, 7)}  # noqa: E731
    assert live() == {lt: before[lt] for lt in range(5, 7)}

    # idempotency: nothing left to fold
    st.compact_chunks("prefix", epoch_cur=5, every=1)
    assert st._bounds("prefix") == [4]

    # crash between rename and cleanup: c4 exists AND all source e-dirs
    # are back on disk -> reads must ignore the subsumed e-dirs (no
    # double-count)
    for e in range(5):
        shutil.copytree(saved / f"e{e}", tmp_path / "prefix" / f"e{e}")
    assert live() == {lt: before[lt] for lt in range(5, 7)}
    # the next fold attempt cleans the leftovers without changing content
    st.compact_chunks("prefix", epoch_cur=6, every=1)
    assert st._epochs("prefix") == []
    assert live() == {lt: before[lt] for lt in range(5, 7)}

    # strictly-below rule: a chunk AT the running epoch never folds
    st.append_chunk(
        "prefix", 5, spark.createDataFrame(chunks[0], "item_id long, u string")
    )
    st.compact_chunks("prefix", epoch_cur=5, every=1)
    assert st._epochs("prefix") == [5]  # e5 untouched
    assert st._bounds("prefix") == [4]


@pytest.mark.slow
def test_replay_across_compaction_boundary_equals_batch_eval(spark, tmp_path):
    """Crash/replay across a compaction boundary (r7 verdict item 3's
    done-bar): drive the batch processor directly with compact_every=2;
    batch 2 performs the first fold; replay batch 2 in full (models a
    crash after EVERYTHING in the batch ran — compaction included — but
    before the streaming checkpoint committed); then run batch 3. Every
    batch's metrics row must equal the batch flagship on that prefix."""
    import math

    import pyarrow.parquet as pq
    import pytest as _pytest

    from etl_master_spark.operators.ranking import eval_metrics
    from etl_master_spark.streaming.eval_stream import (
        make_batch_processor,
        read_metric_history,
    )

    table = pq.read_table("/root/testdata/sf0.001/events.parquet")
    n_chunks = 4
    step = math.ceil(table.num_rows / n_chunks)
    prefix_dirs = []
    for i in range(n_chunks):
        pdir = tmp_path / f"prefix_{i}"
        pdir.mkdir()
        pq.write_table(
            table.slice(0, min(table.num_rows, (i + 1) * step)),
            pdir / "events.parquet",
        )
        prefix_dirs.append(str(pdir))

    work = str(tmp_path / "work")
    process = make_batch_processor(spark, work, compact_every=2)
    batches = [
        spark.createDataFrame(table.slice(i * step, step).to_pandas())
        for i in range(n_chunks)
    ]
    process(batches[0], 0)
    process(batches[1], 1)
    process(batches[2], 2)  # folds e0,e1 -> c1
    from etl_master_spark.streaming.eval_stream import _State

    st = _State(spark, work)
    assert st._bounds("prefix") == [1], "test must cross a real fold"
    process(batches[2], 2)  # REPLAY the compacting batch
    process(batches[3], 3)

    history = read_metric_history(spark, work).collect()
    for i, pdir in enumerate(prefix_dirs):
        expected = {
            (r["domain"], r["k"]): r
            for r in eval_metrics(spark, pdir, mode="test").collect()
        }
        got = {
            (r["domain"], r["k"]): r for r in history if r["batch_id"] == i
        }
        assert set(got) == set(expected), f"prefix {i}"
        for key, g in got.items():
            e = expected[key]
            assert g["n_users"] == e["n_users"], (i, key)
            for m in ("hr", "ndcg", "mrr"):
                assert g[m] == _pytest.approx(e[m], abs=1e-9), (i, key, m)


@pytest.mark.slow
def test_approx_refresh_bounds_error_on_growth_heavy_stream(spark, tmp_path):
    """The approximate variant (r7 verdict item 8): on a growth-heavy
    stream (every batch introduces new catalog items, each tripping the
    full-domain negative reshuffle), refresh_fraction=p must (a) shrink
    the recomputed set vs the exact twin, (b) report its per-batch stale
    share, (c) keep every metric within the PROVABLE bound
    |approx - exact| <= stale_users / n_users, and (d) degenerate to the
    exact twin at p=1.0."""
    import math

    import pandas as pd
    import pytest as _pytest

    from etl_master_spark.streaming.eval_stream import (
        make_batch_processor,
        read_metric_history,
    )

    n_users, items_per_user, catalog = 300, 20, 50_000
    rows, eid = [], 0
    for u in range(1, n_users + 1):
        for j in range(items_per_user):
            item = (u * 37 + j * 101) % catalog
            rows.append((eid, u, "click", f'{{"k": {item}}}'))
            eid += 1
    # growth batches: two fresh users rate brand-NEW items each batch
    growth = []
    for b in range(2):
        batch = []
        for i in range(2):
            batch.append(
                (eid, 50 + b * 2 + i, "click", f'{{"k": {catalog + b * 10 + i}}}')
            )
            eid += 1
        growth.append(batch)

    def frame(data):
        pdf = pd.DataFrame(
            data, columns=["event_id", "user_id", "event_type", "props"]
        )
        pdf["ts"] = pd.to_datetime("2024-01-01") + pd.to_timedelta(
            pdf["event_id"], unit="s"
        )
        pdf["value"] = 1.0
        return spark.createDataFrame(
            pdf[["event_id", "ts", "user_id", "event_type", "value", "props"]]
        )

    batches = [frame(rows)] + [frame(b) for b in growth]

    def run(work, refresh, stats):
        p = make_batch_processor(
            spark, str(tmp_path / work), stats=stats, refresh_fraction=refresh
        )
        for i, b in enumerate(batches):
            p(b, i)
        return {
            (r["batch_id"], r["domain"], r["k"]): r
            for r in read_metric_history(spark, str(tmp_path / work)).collect()
        }

    s_exact, s_full, s_approx = [], [], []
    exact = run("exact", None, s_exact)
    full = run("full", 1.0, s_full)
    approx = run("approx", 0.3, s_approx)

    # (d) p=1.0 is the exact twin, bit for bit
    assert set(full) == set(exact)
    for key, e in exact.items():
        g = full[key]
        assert g["n_users"] == e["n_users"]
        for m in ("hr", "ndcg", "mrr"):
            assert g[m] == e[m], (key, m)

    ex_by, ap_by = (
        {s["batch_id"]: s for s in ss} for ss in (s_exact, s_approx)
    )
    for b in (1, 2):  # the growth batches
        # (a) strictly less recompute work than the exact twin
        assert ap_by[b]["affected_users"] < ex_by[b]["affected_users"], b
        # (b) the stale share is reported and non-trivial
        assert ap_by[b]["stale_users"] > 0, b
        # full-refresh twin reports zero staleness
        assert s_full[b]["stale_users"] == 0
        # (c) the provable bound, per (domain, k, metric)
        for (bb, domain, k), e in exact.items():
            if bb != b:
                continue
            g = approx[(bb, domain, k)]
            bound = ap_by[b]["stale_users"] / e["n_users"] + 1e-6
            for m in ("hr", "ndcg", "mrr"):
                assert abs(g[m] - e[m]) <= bound, (bb, domain, k, m)
    assert math.isfinite(sum(v["hr"] for v in approx.values()))


def test_read_chunks_raises_when_compacted_past_requested_epoch(
    spark, tmp_path
):
    """Out-of-sync guard (r8 advice item 1): a reset/deleted streaming
    checkpoint with a retained work dir asks for a prefix below the
    newest compaction bound. Silently returning None here would trigger
    the cold-start branch and compute metrics from only the current
    batch — the store must fail loudly instead. Reads ABOVE the bound
    and reads of a never-written prefix keep their existing semantics."""
    import pytest as _pytest

    from etl_master_spark.streaming.eval_stream import _State

    st = _State(spark, str(tmp_path))
    for e in range(4):
        st.append_chunk(
            "prefix",
            e,
            spark.createDataFrame([(e, "u")], "item_id long, u string"),
        )
    st.compact_chunks("prefix", epoch_cur=4, every=4)  # folds e0..e3 -> c3
    assert st._bounds("prefix") == [3]
    # a fresh-checkpoint replay would start again at epoch 0..3
    for lt in range(4):
        with _pytest.raises(RuntimeError, match="compacted past"):
            st.read_chunks("prefix", lt)
    # normal monotonic reads above the bound still work
    assert st.read_chunks("prefix", 4).count() == 4
    # an unwritten prefix still cold-starts with None
    assert st.read_chunks("other", 2) is None


@pytest.mark.slow
def test_stale_age_hard_bound_and_drain(spark, tmp_path):
    """Hard staleness-age bound (r8 verdict item 4): with
    refresh_fraction=p, any pair the epoch-salted sample leaves stale is
    force-refreshed after at most ceil(1/p) batches, so (a) the reported
    post-batch staleness age never reaches the bound, (b) staleness
    DRAINS — after >= ceil(1/p) quiet batches no stale pair survives and
    the approx metrics equal the exact twin's exactly — and (c) the
    cumulative error bound holds on every batch."""
    import pandas as pd

    from etl_master_spark.streaming.eval_stream import (
        make_batch_processor,
        read_metric_history,
    )

    n_users, items_per_user, catalog = 150, 20, 50_000
    rows, eid = [], 0
    for u in range(1, n_users + 1):
        for j in range(items_per_user):
            item = (u * 37 + j * 101) % catalog
            rows.append((eid, u, "click", f'{{"k": {item}}}'))
            eid += 1
    batches_raw = [rows]
    # growth batches 1..3: fresh users rate brand-NEW items (negative
    # reshuffle for the whole domain each time)
    for b in range(3):
        batch = []
        for i in range(2):
            batch.append(
                (eid, 60 + b * 2 + i, "click",
                 f'{{"k": {catalog + b * 10 + i}}}')
            )
            eid += 1
        batches_raw.append(batch)
    # quiet batches 4..7: existing users rate EXISTING items — no
    # growth, so the only refresh pressure left is the age sweep
    for b in range(4):
        u = 100 + b
        # user u+1's first item: guaranteed in-catalog (no growth), and
        # provably absent from user u's own history (37 != j*101 mod
        # catalog for j in 0..19) so the batch is non-empty
        item = ((u + 1) * 37) % catalog
        batches_raw.append([(eid, u, "click", f'{{"k": {item}}}')])
        eid += 1

    def frame(data):
        pdf = pd.DataFrame(
            data, columns=["event_id", "user_id", "event_type", "props"]
        )
        pdf["ts"] = pd.to_datetime("2024-01-01") + pd.to_timedelta(
            pdf["event_id"], unit="s"
        )
        pdf["value"] = 1.0
        return spark.createDataFrame(
            pdf[["event_id", "ts", "user_id", "event_type", "value", "props"]]
        )

    batches = [frame(b) for b in batches_raw]

    def run(work, refresh, stats):
        p = make_batch_processor(
            spark, str(tmp_path / work), stats=stats, refresh_fraction=refresh
        )
        for i, b in enumerate(batches):
            p(b, i)
        return {
            (r["batch_id"], r["domain"], r["k"]): r
            for r in read_metric_history(
                spark, str(tmp_path / work)
            ).collect()
        }

    s_exact, s_approx = [], []
    exact = run("exact", None, s_exact)
    approx = run("approx", 0.34, s_approx)  # ceil(1/0.34) = 3

    max_age = 3
    ap_by = {s["batch_id"]: s for s in s_approx}
    # (a) the hard bound: post-batch staleness age < max_stale_age always
    for b, s in ap_by.items():
        if "stale_age_max" in s:
            assert s["stale_age_max"] < max_age, (b, s)
    # staleness genuinely occurred on the growth batches
    assert any(ap_by[b].get("stale_users", 0) > 0 for b in (1, 2, 3))
    # (b) drain: >= max_age quiet batches after the last growth leave
    # nothing stale, and the final metrics equal the exact twin exactly
    last = max(ap_by)
    assert ap_by[last]["stale_users"] == 0
    for (b, domain, k), e in exact.items():
        if b != last:
            continue
        g = approx[(b, domain, k)]
        assert g["n_users"] == e["n_users"]
        for m in ("hr", "ndcg", "mrr"):
            assert g[m] == e[m], (b, domain, k, m)
    # (c) the cumulative bound on every batch
    for (b, domain, k), e in exact.items():
        g = approx[(b, domain, k)]
        bound = ap_by[b].get("stale_users", 0) / e["n_users"] + 1e-6
        for m in ("hr", "ndcg", "mrr"):
            assert abs(g[m] - e[m]) <= bound, (b, domain, k, m)
