"""RAKE keyword extraction, readability composites, and the closed-form
CUSUM changepoint — planted fixtures prove the semantics (phrase runs,
syllable proxy, prefix-extremum identity against the recursive textbook
CUSUM). Engine-vs-oracle equality is covered by test_oracle_parity.py."""

from __future__ import annotations

import datetime as dt

from etl_master_spark.operators.analytics import events_cusum_changepoint
from etl_master_spark.operators.text import (
    RAKE_TOP_PHRASES,
    rake_keywords,
    readability_scores,
)


def _write_docs(spark, path, docs):
    spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in docs],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{path}/documents.parquet")


def _write_events(spark, path, rows):
    spark.createDataFrame(
        [(i, ts, uid, et, 1.0, "{}") for i, (ts, uid, et) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(f"{path}/events.parquet")


# -- RAKE ---------------------------------------------------------------------

def test_rake_phrase_runs_and_scores(spark, tmp_path):
    """'fast scan the big table of fast scan': runs are ('fast scan'),
    ('big table'), ('fast scan'). freq(fast)=2, degree(fast)=4 (two
    2-word phrases) -> score 2.0; same for scan; big/table 2.0 each via
    degree 2 / freq 1. Phrase scores: 'fast scan' = 4.0, 'big table' =
    4.0. Both phrases surface, ranked by score then text."""
    _write_docs(
        spark, str(tmp_path), [(0, "fast scan the big table of fast scan")]
    )
    rows = rake_keywords(spark, str(tmp_path)).collect()
    got = {(r["rank"]): (r["phrase"], r["score"]) for r in rows}
    assert got[1] == ("big table", 4.0)  # tie broken by phrase text
    assert got[2] == ("fast scan", 4.0)
    assert len(rows) == 2


def test_rake_single_word_and_stopword_only(spark, tmp_path):
    """A stopword-only doc emits nothing; an isolated word scores
    degree/freq = 1.0."""
    _write_docs(
        spark, str(tmp_path), [(0, "the of a"), (1, "the vector of")]
    )
    rows = rake_keywords(spark, str(tmp_path)).collect()
    assert [(r["doc_id"], r["phrase"], r["score"]) for r in rows] == [
        (1, "vector", 1.0)
    ]


def test_rake_caps_phrases_per_doc(spark, tmp_path):
    text = " of ".join(f"w{i}" for i in range(10))  # 10 distinct runs
    _write_docs(spark, str(tmp_path), [(0, text)])
    rows = rake_keywords(spark, str(tmp_path)).collect()
    assert len(rows) == RAKE_TOP_PHRASES
    assert [r["rank"] for r in rows] == [1, 2, 3]


# -- readability --------------------------------------------------------------

def test_readability_counts_and_composites(spark, tmp_path):
    """'scan the table' -> 3 words, vowel runs: a, e, a, e = 4 syllables,
    no >=7-char words. One-sentence Flesch = 206.835 - 1.015*3 -
    84.6*(4/3)."""
    _write_docs(spark, str(tmp_path), [(0, "scan the table")])
    r = readability_scores(spark, str(tmp_path)).collect()[0]
    assert r["n_words"] == 3
    assert r["n_syll"] == 4
    assert r["long_share"] == 0.0
    assert abs(r["flesch"] - round(206.835 - 1.015 * 3 - 84.6 * (4 / 3), 6)) < 1e-9
    assert r["lix"] == 3.0


def test_readability_long_words_and_vowel_runs(spark, tmp_path):
    """'beautiful streaming' : 'eau'+'i'+'u' = 3 runs, 'ea'+'i' = 2 runs;
    both words >=7 chars -> long_share 1.0."""
    _write_docs(spark, str(tmp_path), [(0, "beautiful streaming")])
    r = readability_scores(spark, str(tmp_path)).collect()[0]
    assert r["n_syll"] == 5
    assert r["long_share"] == 1.0
    assert r["lix"] == 2.0 + 100.0


# -- CUSUM --------------------------------------------------------------------

def _recursive_cusum(xs):
    """Textbook recursion the closed form must reproduce (k=0 allowance)."""
    mean = sum(xs) / len(xs)
    sp, sn, out = 0.0, 0.0, []
    for x in xs:
        sp = max(0.0, sp + (x - mean))
        sn = max(0.0, sn - (x - mean))
        out.append((sp, sn))
    return out


def test_cusum_matches_recursive_definition(spark, tmp_path):
    t0 = dt.datetime(2024, 1, 1)
    counts = [4, 4, 4, 10, 10, 2, 2, 4]  # level shift up then down
    rows = []
    for h, n in enumerate(counts):
        for j in range(n):
            rows.append((t0 + dt.timedelta(hours=h, seconds=j), 1, "click"))
    _write_events(spark, str(tmp_path), rows)
    got = events_cusum_changepoint(spark, str(tmp_path)).collect()
    want = _recursive_cusum(counts)
    assert len(got) == len(want)
    for r, (sp, sn) in zip(got, want):
        assert abs(r["cusum_pos"] - sp) < 1e-6
        assert abs(r["cusum_neg"] - sn) < 1e-6
    # the peak flag marks the global argmax of the positive statistic
    peaks = [r["hour_start"] for r in got if r["is_peak"]]
    best = max(want, key=lambda t: t[0])[0]
    assert peaks == [r["hour_start"] for r, (sp, _) in zip(got, want) if sp == best]


def test_cusum_flat_series_has_no_peak(spark, tmp_path):
    t0 = dt.datetime(2024, 1, 1)
    rows = []
    for h in range(4):
        for j in range(5):
            rows.append((t0 + dt.timedelta(hours=h, seconds=j), 1, "view"))
    _write_events(spark, str(tmp_path), rows)
    got = events_cusum_changepoint(spark, str(tmp_path)).collect()
    assert all(r["cusum_pos"] == 0.0 and r["cusum_neg"] == 0.0 for r in got)
    assert not any(r["is_peak"] for r in got)


# -- trailing EWMA ------------------------------------------------------------

def test_ewma_trailing_weights(spark, tmp_path):
    """Three hours of counts [2, 4, 8]: hour 2's trailing EWMA =
    (8*2^23 + 4*2^22 + 2*2^21) / (2^23 + 2^22 + 2^21) = 44/7."""
    from etl_master_spark.operators.analytics import events_ewma_trailing

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    for h, n in enumerate([2, 4, 8]):
        for j in range(n):
            rows.append((t0 + dt.timedelta(hours=h, seconds=j), 1, "click"))
    _write_events(spark, str(tmp_path), rows)
    got = events_ewma_trailing(spark, str(tmp_path)).collect()
    assert [r["n_events"] for r in got] == [2, 4, 8]
    assert got[0]["ewma"] == 2.0  # window holds only itself
    assert got[1]["ewma"] == round((4 * 2 + 2) / 3, 6)
    assert got[2]["ewma"] == round((8 * 4 + 4 * 2 + 2) / 7, 6)
    assert got[2]["obs_over_exp"] == round(8 / ((8 * 4 + 4 * 2 + 2) / 7), 6)


def test_ewma_window_truncates_at_24h(spark, tmp_path):
    """An hour 30h after a burst must not see it: its window only holds
    itself, so ewma == own count."""
    from etl_master_spark.operators.analytics import events_ewma_trailing

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    for j in range(50):
        rows.append((t0 + dt.timedelta(seconds=j), 1, "click"))
    for j in range(3):
        rows.append((t0 + dt.timedelta(hours=30, seconds=j), 1, "click"))
    _write_events(spark, str(tmp_path), rows)
    got = {r["hour_start"]: r for r in events_ewma_trailing(spark, str(tmp_path)).collect()}
    late = [r for r in got.values() if r["n_events"] == 3][0]
    assert late["ewma"] == 3.0
    assert late["obs_over_exp"] == 1.0


# -- Matryoshka truncation recall ---------------------------------------------

def test_dim_truncation_recall_extremes(spark, tmp_path):
    """Corpus where the leading 16 dims carry ALL the signal -> recall 1.0
    for every query (the truncated rank equals the full rank because
    trailing dims are identical zeros)."""
    import random

    from etl_master_spark.operators.vectors import (
        N_QUERY_VECS,
        TOPK,
        dim_truncation_recall,
    )

    rng = random.Random(7)
    rows = []
    for i in range(40):
        head = [rng.uniform(-1, 1) for _ in range(16)]
        rows.append((i, [float(x) for x in head] + [0.0] * 48, i % 3))
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(f"{tmp_path}/embeddings.parquet")
    got = dim_truncation_recall(spark, str(tmp_path)).collect()
    assert len(got) == N_QUERY_VECS
    assert all(r["recall"] == 1.0 and r["n_overlap"] == TOPK for r in got)


# -- corpus-health trio -------------------------------------------------------

def _write_docs_src(spark, path, docs):
    spark.createDataFrame(
        [(i, t, lang, src, len(t)) for i, (t, lang, src) in enumerate(docs)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{path}/documents.parquet")


def test_source_lang_mix_planted(spark, tmp_path):
    """srcA: 3 en + 1 de -> top en 0.75, entropy = micro-floored
    (3·ln(4/3) + 1·ln4)/4. srcB: all fr -> entropy 0."""
    import math

    from etl_master_spark.operators.text import source_lang_mix

    docs = [("x", "en", "srcA")] * 3 + [("x", "de", "srcA")] + [
        ("x", "fr", "srcB")
    ] * 2
    _write_docs_src(spark, str(tmp_path), docs)
    got = {r["source"]: r for r in source_lang_mix(spark, str(tmp_path)).collect()}
    a = got["srcA"]
    assert (a["n_docs"], a["n_langs"], a["top_lang"], a["top_share"]) == (
        4, 2, "en", 0.75,
    )
    h_u = math.floor(1e6 * 3 * math.log(4 / 3)) + math.floor(1e6 * math.log(4))
    assert a["lang_entropy"] == round(h_u / (1e6 * 4), 6)
    b = got["srcB"]
    assert b["lang_entropy"] == 0.0 and b["top_share"] == 1.0


def test_cross_source_dup_matrix_planted(spark, tmp_path):
    """Two identical docs in different sources -> one cross-source pair;
    two identical docs in the same source -> one within-source pair."""
    from etl_master_spark.operators.text import cross_source_dup_matrix

    t1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    t2 = "one two three four five six seven eight nine ten eleven"
    docs = [
        (t1, "en", "srcA"), (t1, "en", "srcB"),
        (t2, "en", "srcC"), (t2, "en", "srcC"),
    ]
    _write_docs_src(spark, str(tmp_path), docs)
    got = {
        (r["source_a"], r["source_b"]): r
        for r in cross_source_dup_matrix(spark, str(tmp_path)).collect()
    }
    assert got[("srcA", "srcB")]["n_dup_pairs"] == 1
    assert got[("srcA", "srcB")]["is_cross_source"] is True
    assert got[("srcC", "srcC")]["n_dup_pairs"] == 1
    assert got[("srcC", "srcC")]["is_cross_source"] is False


def test_dup_cluster_histogram_accounts_every_doc(spark, sf_dir):
    """Σ n_docs over sizes == corpus size; deletable = docs - clusters."""
    from etl_master_spark.operators.text import dup_cluster_size_histogram
    from etl_master_spark.sources.io import load_table

    rows = dup_cluster_size_histogram(spark, sf_dir).collect()
    n_total = load_table(spark, sf_dir, "documents").count()
    assert sum(r["n_docs"] for r in rows) == n_total
    for r in rows:
        assert r["n_deletable"] == r["n_docs"] - r["n_clusters"]
        assert abs(r["doc_share"] - round(r["n_docs"] / n_total, 6)) < 1e-12
    assert rows[0]["size"] == 1  # singletons exist in real data


def test_hash_collision_audit_accounts_vocabulary(spark, sf_dir):
    """Bucket term counts sum to the vocabulary size; mass shares sum to
    1; a bucket's collided share is 0 iff it holds one term."""
    from etl_master_spark.operators.text import hash_collision_audit

    rows = hash_collision_audit(spark, sf_dir).collect()
    assert abs(sum(r["mass_share"] for r in rows) - 1.0) < 1e-4
    for r in rows:
        if r["n_terms"] == 1:
            assert r["collided_mass_share"] == 0.0
        assert 0.0 <= r["collided_mass_share"] < 1.0


def test_kfold_assignment_is_deterministic_partition(spark, sf_dir):
    """Every document lands in exactly one fold; per-stratum fold shares
    sum to 1; the assignment replays from the portable hash."""
    from etl_master_spark.functions.hashing import phash_py
    from etl_master_spark.operators.text import (
        KFOLD_K,
        stratified_kfold_assignment,
    )
    from etl_master_spark.sources.io import load_table

    rows = stratified_kfold_assignment(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang").collect()
    assert sum(r["n_docs"] for r in rows) == len(docs)
    import collections

    want = collections.Counter(
        (d["lang"], phash_py(d["doc_id"]) % KFOLD_K) for d in docs
    )
    got = {(r["lang"], r["fold"]): r["n_docs"] for r in rows}
    assert got == dict(want)
    by_lang = collections.defaultdict(float)
    for r in rows:
        by_lang[r["lang"]] += r["fold_share"]
    assert all(abs(v - 1.0) < 1e-4 for v in by_lang.values())
