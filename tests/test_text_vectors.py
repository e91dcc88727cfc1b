"""Unit tests for text/dedup and vector operators beyond the parity gate."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from etl_master_spark.operators import text, vectors


def test_shingles_of_short_doc(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b"), (3, "x y z")], "doc_id long, text string"
    )
    sh = {(r["doc_id"], r["shingle"]) for r in text._shingles(docs).collect()}
    assert sh == {(1, "a b c"), (1, "b c d"), (3, "x y z")}  # doc 2 too short


def test_simhash64_matches_python_reference(spark, sf_dir):
    rows = text.simhash64(spark, sf_dir).collect()
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }

    def ref(t: str) -> int:
        votes = [0] * 64
        for tok in t.split(" "):
            d = int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "big")
            for i in range(64):
                votes[i] += 1 if (d >> i) & 1 else -1
        v = 0
        for i in range(64):
            if votes[i] > 0:
                v |= 1 << i
        return v & 0x7FFFFFFFFFFFFFFF

    for r in rows[:20]:
        assert r["simhash"] == ref(docs[r["doc_id"]])


def test_exact_dedup_flags_duplicates(spark):
    docs = spark.createDataFrame(
        [(1, "same text"), (2, "same text"), (3, "other")],
        "doc_id long, text string",
    )
    docs.createOrReplaceTempView("___tmp")
    with_fp = docs.select("doc_id", F.md5("text").alias("fp"))
    from pyspark.sql import Window

    out = {
        r["doc_id"]: (r["canonical_id"], r["is_dup"])
        for r in with_fp.withColumn(
            "canonical_id", F.min("doc_id").over(Window.partitionBy("fp"))
        )
        .select(
            "doc_id",
            "canonical_id",
            (F.col("doc_id") != F.col("canonical_id")).cast("int").alias("is_dup"),
        )
        .collect()
    }
    assert out == {1: (1, 0), 2: (1, 1), 3: (3, 0)}


def test_minhash_similar_docs_collide(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = base.replace("today", "tomorrow")
    far = "completely different content with no overlap whatsoever in any way at all"
    docs = spark.createDataFrame(
        [(1, base), (2, near), (3, far)], "doc_id long, text string"
    )
    sh = text._shingles(docs)
    from etl_master_spark.functions.hashing import PHASH_P

    h = (
        F.conv(F.substring(F.md5("shingle"), 1, 14), 16, 10).cast("bigint")
        % F.lit(PHASH_P)
    )
    sig = sh.select("doc_id", h.alias("h")).groupBy("doc_id").agg(
        *[
            F.min((F.col("h") * F.lit(a) + F.lit(b)) % F.lit(PHASH_P)).alias(f"mh{j}")
            for j, (a, b) in enumerate(text._minhash_consts())
        ]
    )
    rows = {r["doc_id"]: [r[f"mh{j}"] for j in range(text.MINHASH_K)] for r in sig.collect()}
    agree_near = sum(a == b for a, b in zip(rows[1], rows[2]))
    agree_far = sum(a == b for a, b in zip(rows[1], rows[3]))
    assert agree_near > agree_far  # near-dup shares most minhashes
    assert agree_far == 0


def test_cosine_topk_self_excluded_and_sorted(spark, sf_dir):
    rows = vectors.ann_cosine_topk(spark, sf_dir).collect()
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == set(range(vectors.N_QUERY_VECS))
    for q, rs in by_q.items():
        rs = sorted(rs, key=lambda r: r["rnk"])
        assert all(r["neighbor_id"] != q for r in rs)
        scores = [r["cosine"] for r in rs]
        assert scores == sorted(scores, reverse=True)


def test_mmd_nonnegative_and_symmetric_zero(spark, sf_dir):
    same = vectors.mmd_rbf(spark, sf_dir, label_a=0, label_b=0).collect()[0]
    assert same["mmd2"] == pytest.approx(0.0, abs=1e-9)
    diff = vectors.mmd_rbf(spark, sf_dir, label_a=0, label_b=1).collect()[0]
    assert diff["mmd2"] >= 0.0


def test_mmd_fast_matches_relational(spark, sf_dir):
    """The BLAS tile path must agree with the oracle-checked relational
    spelling to 1e-6 — and (the round-2 verdict's top finding) it must do
    so WITHOUT collecting an embedding side to the driver: the tile grid
    is the distributed block-nested-loop, and only the two side counts
    ever leave the executors."""
    exact = vectors.mmd_rbf(spark, sf_dir, label_a=0, label_b=1).collect()[0]
    fast = vectors.mmd_rbf_fast(spark, sf_dir, label_a=0, label_b=1).collect()[0]
    assert fast["mmd2"] == pytest.approx(exact["mmd2"], abs=1e-6)
    # multi-tile path: force 4+ tiles per side so the grid join is real
    tiny = vectors.mmd_rbf_fast(spark, sf_dir, label_a=0, label_b=1, block=8)
    assert tiny.collect()[0]["mmd2"] == pytest.approx(exact["mmd2"], abs=1e-6)


def test_dedup_embedding_cosine_guard(spark, sf_dir):
    """The exact all-pairs demo must refuse large inputs instead of
    silently attempting an O(n²) cross product."""
    with pytest.raises(ValueError, match="dedup_embedding_cosine_lsh"):
        vectors.dedup_embedding_cosine(spark, sf_dir, 0.4, max_rows=10)


def test_lsh_buckets_disperse(spark, sf_dir):
    """Sign-LSH with 8 planes must actually use the bucket space: with the
    degenerate (pre-mixing-fix) planes every vector collapsed into 2
    buckets (sign of the component sum)."""
    rows = vectors.lsh_buckets(spark, sf_dir).collect()
    assert len(rows) >= 16  # sf0.001: 100 vectors over 256 buckets
    assert max(r["n_vecs"] for r in rows) < sum(r["n_vecs"] for r in rows) * 0.5


def test_ivf_cells_all_populated(spark, sf_dir):
    """IVF coarse quantization must spread the corpus across cells —
    degenerate near-constant centroids routed ~everything into one cell,
    destroying the |corpus|/cells scan reduction the index exists for."""
    from etl_master_spark.operators.vectors import IVF_CELLS, IVF_SEED, _dot, _phash_plane

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    best = F.array_max(
        F.array(
            *[
                F.struct(
                    _dot(F.col("embedding"), _phash_plane(c, 64, IVF_SEED)).alias("dot"),
                    F.lit(-c).cast("int").alias("negcell"),
                )
                for c in range(IVF_CELLS)
            ]
        )
    )
    counts = (
        emb.select((-best["negcell"]).alias("cell"))
        .groupBy("cell")
        .count()
        .collect()
    )
    assert len(counts) >= IVF_CELLS - 2
    assert max(c["count"] for c in counts) < sum(c["count"] for c in counts) * 0.6


def test_prior_sampler_moments(spark):
    """Box–Muller over the portable-hash uniforms must actually be N(0,1):
    affine-correlated u1/u2 streams (two seeds, same fold depth) biased the
    mean to 0.31; the degenerate pre-fix uniforms collapsed std to ~0."""
    from etl_master_spark.operators.analytics import prior_sample_stats

    for r in prior_sample_stats(spark, "/root/testdata/sf0.001").collect():
        assert abs(r["mean_z"]) < 0.1, r
        assert 0.9 < r["std_z"] < 1.1, r


def test_lsh_dedup_subset_of_exact_with_bounded_recall(spark, sf_dir):
    """The banded-LSH dedup must (a) never invent pairs the exact spelling
    doesn't have, and (b) keep recall in the S-curve's predicted range even
    at the low 0.4 gate threshold (at the 0.99 production threshold the
    predicted miss rate is < 1e-4)."""
    from etl_master_spark.operators.vectors import (
        dedup_embedding_cosine,
        dedup_embedding_cosine_lsh,
    )

    exact = {
        (r["id_a"], r["id_b"])
        for r in dedup_embedding_cosine(spark, sf_dir, 0.4).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"])
        for r in dedup_embedding_cosine_lsh(spark, sf_dir, 0.4).collect()
    }
    assert lsh <= exact
    assert exact  # fixture sanity: threshold low enough to produce pairs
    assert len(lsh) / len(exact) > 0.5


def test_lsh_dedup_p99_finds_planted_duplicates(spark):
    """The production 4×8 band shape must catch actual near-duplicates:
    plant perturbed copies (cosine > 0.999) among random vectors and
    require every planted pair at threshold 0.99, with no false
    positives (the exact verify guarantees precision by construction)."""
    import numpy as np

    from etl_master_spark.operators.vectors import (
        P99_LSH_BANDS,
        P99_LSH_ROWS,
        _dedup_lsh_pairs,
    )

    rng = np.random.default_rng(7)
    base = rng.normal(size=(50, 64)).astype("float32")
    rows = [(i, base[i].tolist()) for i in range(50)]
    # ids 100+i duplicate ids 0..4 with ~0.5% relative noise
    for i in range(5):
        dup = base[i] + 0.005 * rng.normal(size=64).astype("float32")
        rows.append((100 + i, dup.astype("float32").tolist()))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        (r["id_a"], r["id_b"])
        for r in _dedup_lsh_pairs(spark, emb, 0.99, P99_LSH_BANDS, P99_LSH_ROWS)
        .collect()
    }
    assert got == {(i, 100 + i) for i in range(5)}


def test_connected_components_multihop_chain(spark):
    """A 6-node path graph (0-1-2-3-4-5) needs ~diameter rounds of label
    propagation — proves the loop actually iterates to the fixpoint — and
    disconnected singletons must keep their own label."""
    from etl_master_spark.operators.text import _connected_components

    nodes = spark.createDataFrame([(i,) for i in range(8)], "doc_id long")
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(5)] + [(6, 7)], "doc_a long, doc_b long"
    )
    got = {
        (r["doc_id"], r["cluster"])
        for r in _connected_components(nodes, pairs).collect()
    }
    want = {(i, 0) for i in range(6)} | {(6, 6), (7, 6)}
    assert got == want


def test_balanced_mixture_sample_is_balanced_and_deterministic(spark, sf_dir):
    """Every language's kept count must land within binomial noise of the
    min-language count, and a second run must keep the identical doc set
    (resumable-pipeline determinism)."""
    import collections
    import math

    from etl_master_spark.operators.text import balanced_mixture_sample

    rows = balanced_mixture_sample(spark, sf_dir).collect()
    kept = collections.Counter(r["lang"] for r in rows)
    full = collections.Counter(
        r["lang"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("lang")
        .collect()
    )
    target = min(full.values())
    for lang in full:
        # 5-sigma binomial envelope around the target count
        assert abs(kept[lang] - target) <= 5 * math.sqrt(target) + 1, (lang, kept)
    again = {r["doc_id"] for r in balanced_mixture_sample(spark, sf_dir).collect()}
    assert again == {r["doc_id"] for r in rows}


def test_ann_pq_planted_clusters_recall(spark):
    """PQ effectiveness on its intended regime: a clustered corpus (the
    uniform-random testdata is PQ's worst case — near-equidistant, so the
    registry entry only proves the machinery + oracle). Plant 40 tight
    clusters; after per-subspace Lloyd training, every query's PQ top-5
    must come from the query's own cluster."""
    import numpy as np

    from etl_master_spark.operators.vectors import _ann_pq_core

    rng = np.random.default_rng(17)
    n_clusters, per = 40, 12
    centers = rng.normal(0.0, 1.0, (n_clusters, 64))
    rows = []
    for c in range(n_clusters):
        for i in range(per):
            v = centers[c] + rng.normal(0.0, 0.05, 64)
            rows.append((c * per + i, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = _ann_pq_core(spark, emb).collect()
    by_q: dict[int, list] = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r["neighbor_id"])
    assert set(by_q) == {0, 1, 2, 3, 4}  # queries all sit in cluster 0
    hits = sum(1 for q, ns in by_q.items() for n in ns if n < per)
    total = sum(len(ns) for ns in by_q.values())
    assert hits / total >= 0.9, (hits, total, by_q)


def test_ann_lsh_topk_subset_and_scores_match_exact(spark, sf_dir):
    """LSH-bucketed ANN must (a) never report a cosine the exact scan
    disagrees with — the rerank math is shared, so any pair present in
    both outputs carries the identical rounded score — and (b) retain a
    usable fraction of the exact top-10 even with only 16 buckets."""
    from etl_master_spark.operators.vectors import ann_cosine_topk, ann_lsh_topk

    exact = {
        (r["query_id"], r["neighbor_id"]): r["cosine"]
        for r in ann_cosine_topk(spark, sf_dir).collect()
    }
    lsh = {
        (r["query_id"], r["neighbor_id"]): r["cosine"]
        for r in ann_lsh_topk(spark, sf_dir).collect()
    }
    overlap = set(exact) & set(lsh)
    assert overlap  # the buckets catch some of the true top-10
    for pair in overlap:
        assert exact[pair] == lsh[pair], pair


def test_duplicate_passages_flags_real_repeats(spark, sf_dir):
    """Every flagged shingle must literally occur (space-tokenized) in at
    least n_docs distinct documents of the corpus — recompute containment
    in Python for the top rows."""
    from etl_master_spark.operators.text import SHINGLE_N, duplicate_passages
    from etl_master_spark.sources.io import load_table

    top = duplicate_passages(spark, sf_dir).limit(5).collect()
    assert top and all(r["n_docs"] >= 2 for r in top)
    docs = {
        r["doc_id"]: r["text"].split(" ")
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    for row in top:
        sh = tuple(row["shingle"].split(" "))
        assert len(sh) == SHINGLE_N
        holders = {
            d
            for d, toks in docs.items()
            if any(tuple(toks[i : i + SHINGLE_N]) == sh
                   for i in range(len(toks) - SHINGLE_N + 1))
        }
        assert len(holders) == row["n_docs"]
        assert min(holders) == row["first_doc"] and max(holders) == row["last_doc"]


def test_lsh_adaptive_shape_formula():
    """Occupancy adaptation: identity below the base, +1 row per corpus
    doubling past it, +1 band per two extra rows — and monotone."""
    from etl_master_spark.operators.vectors import (
        LSH_OCC_BASE,
        _lsh_adaptive_shape,
    )

    assert _lsh_adaptive_shape(0, 4, 8) == (4, 8)
    assert _lsh_adaptive_shape(2000, 4, 8) == (4, 8)
    assert _lsh_adaptive_shape(LSH_OCC_BASE - 1, 4, 8) == (4, 8)
    assert _lsh_adaptive_shape(LSH_OCC_BASE, 4, 8) == (5, 9)
    assert _lsh_adaptive_shape(8 * LSH_OCC_BASE, 4, 8) == (6, 12)
    assert _lsh_adaptive_shape(48 * LSH_OCC_BASE, 4, 8) == (7, 14)
    prev = (0, 0)
    for n in (0, 10, 4096, 10_000, 10**5, 10**6, 10**7):
        cur = _lsh_adaptive_shape(n, 4, 8)
        assert cur >= prev
        prev = cur
    # the 20-doubling cap keeps the engine in EXACT lockstep with the
    # oracle's unrolled CASE chain (e in 0..19) at any corpus size —
    # past LSH_OCC_BASE*2^20 both sides plateau at the same shape
    cap = _lsh_adaptive_shape(LSH_OCC_BASE * 2**19, 4, 8)
    assert cap == (14, 28)
    assert _lsh_adaptive_shape(LSH_OCC_BASE * 2**25, 4, 8) == cap
    assert _lsh_adaptive_shape(2**62, 4, 8) == cap


def test_lsh_dedup_adaptive_depth_keeps_planted_recall(spark):
    """Above LSH_OCC_BASE the effective shape deepens (occupancy-bounded
    candidates); the extra bands must keep planted near-duplicates at
    full recall. 5000 random vectors → extra=1 → effective 5×9."""
    import numpy as np

    from etl_master_spark.operators.vectors import (
        P99_LSH_BANDS,
        P99_LSH_ROWS,
        _dedup_lsh_pairs,
    )

    rng = np.random.default_rng(11)
    n = 5000
    base = rng.normal(size=(n, 64)).astype("float32")
    rows = [(i, base[i].tolist()) for i in range(n)]
    for i in range(5):
        dup = base[i] + 0.005 * rng.normal(size=64).astype("float32")
        rows.append((1_000_000 + i, dup.astype("float32").tolist()))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        (r["id_a"], r["id_b"])
        for r in _dedup_lsh_pairs(spark, emb, 0.99, P99_LSH_BANDS, P99_LSH_ROWS)
        .collect()
    }
    assert got == {(i, 1_000_000 + i) for i in range(5)}


def test_semantic_dedup_planted_near_duplicates(spark):
    """SemDeDup effectiveness at a production-like τ: plant clustered
    vectors where some members are near-identical copies (cos > 0.99) and
    others are merely same-cluster neighbors (cos well under τ). The
    prune must drop exactly the copies, keep the lowest-id representative
    of each copy set, and never cross cluster boundaries."""
    import numpy as np

    from etl_master_spark.operators.vectors import _semantic_dedup_core

    rng = np.random.default_rng(29)
    rows = []
    # cluster 0: ids 0,1 near-identical; id 2 orthogonal-ish neighbor
    base = rng.normal(0.0, 1.0, 64)
    rows.append((0, [float(x) for x in base], 0))
    rows.append((1, [float(x) for x in base + rng.normal(0, 1e-3, 64)], 0))
    rows.append((2, [float(x) for x in rng.normal(0.0, 1.0, 64)], 0))
    # cluster 1: id 3 is ANOTHER near-copy of base — different cluster, so
    # it must survive (the prune is intra-cluster by construction)
    rows.append((3, [float(x) for x in base + rng.normal(0, 1e-3, 64)], 1))
    rows.append((4, [float(x) for x in rng.normal(0.0, 1.0, 64)], 1))
    assigned = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, cluster int"
    )
    out = {r["vec_id"]: r for r in _semantic_dedup_core(assigned, tau=0.95).collect()}
    assert [out[i]["keep"] for i in range(5)] == [True, False, True, True, True]
    assert out[1]["n_dups"] == 1  # dropped by its lower-id twin only
    assert all(out[i]["n_dups"] == 0 for i in (0, 2, 3, 4))


def test_semantic_dedup_guard_raises_on_oversized_clusters(spark, sf_dir, monkeypatch):
    """The mean-cluster-population ceiling must fail loudly (pointing at
    the raise-k scaling rule) before the quadratic intra-cluster stream
    is ever planned."""
    import pytest as _pytest

    from etl_master_spark.operators import vectors as V

    monkeypatch.setattr(V, "SEMDEDUP_MAX_AVG_CLUSTER", 1)
    with _pytest.raises(ValueError, match="quadratic per cluster"):
        V.semantic_dedup(spark, sf_dir)


def test_semantic_dedup_chain_collapses_to_minimum(spark):
    """Pins the documented ONE-PASS dominated rule: in a similarity chain
    a–b–c (cos(a,b) ≥ τ, cos(b,c) ≥ τ, cos(a,c) < τ) BOTH b and c drop —
    c is dominated by the already-dropped b. Greedy keep-against-kept
    would keep c; the group-exact alternative is the CC kernel
    (embedding_dedup_clusters). The oracle replays the same rule."""
    import numpy as np

    from etl_master_spark.operators.vectors import _semantic_dedup_core

    rng = np.random.default_rng(41)
    a = rng.normal(0.0, 1.0, 64)
    d = rng.normal(0.0, 1.0, 64)
    d -= (d @ a) / (a @ a) * a  # orthogonal direction
    # b sits between a and c on the unit arc: cos(a,b)=cos(b,c)~0.97,
    # cos(a,c)~0.88 — a genuine chain at tau=0.95
    import math

    def on_arc(theta):
        na, nd = a / np.linalg.norm(a), d / np.linalg.norm(d)
        return math.cos(theta) * na + math.sin(theta) * nd

    rows = [
        (0, [float(x) for x in on_arc(0.0)], 0),
        (1, [float(x) for x in on_arc(0.25)], 0),
        (2, [float(x) for x in on_arc(0.5)], 0),
    ]
    assigned = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, cluster int"
    )
    out = {r["vec_id"]: r for r in _semantic_dedup_core(assigned, tau=0.95).collect()}
    assert [out[i]["keep"] for i in range(3)] == [True, False, False]
    assert out[2]["n_dups"] == 1  # dominated by b only (cos(a,c) < tau)


def test_centroid_classify_planted_separable(spark):
    """NCM effectiveness on its intended regime: 10 well-separated
    classes (orthogonal-ish far centers, small noise) → every holdout
    vector must be predicted as its own class (pure diagonal confusion,
    share 1.0)."""
    import numpy as np

    from etl_master_spark.operators.vectors import _centroid_classify_core

    rng = np.random.default_rng(23)
    centers = rng.normal(0.0, 1.0, (10, 64)) * 10.0
    rows = []
    for lbl in range(10):
        for i in range(30):
            v = centers[lbl] + rng.normal(0.0, 0.1, 64)
            rows.append((lbl * 30 + i, [float(x) for x in v], lbl))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = _centroid_classify_core(emb).collect()
    assert out, "holdout must be non-empty"
    for r in out:
        assert r["pred_label"] == r["label"], (r["label"], r["pred_label"])
        assert r["share"] == 1.0


def test_kcenter_coreset_covers_planted_clusters(spark):
    """Farthest-point traversal effectiveness: with KC_K well-separated
    tight clusters, greedy k-center must pick exactly one exemplar from
    EACH cluster (the 2-approximation guarantee is exact in this regime),
    and the per-cell coverage radius must stay at noise scale — far below
    the inter-cluster distance."""
    import numpy as np

    from etl_master_spark.operators.vectors import KC_K, _kcenter_core

    rng = np.random.default_rng(31)
    centers = rng.normal(0.0, 1.0, (KC_K, 64)) * 10.0
    per = 25
    rows = []
    for c in range(KC_K):
        for i in range(per):
            v = centers[c] + rng.normal(0.0, 0.05, 64)
            rows.append((c * per + i, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = _kcenter_core(spark, emb).collect()
    assert len(out) == KC_K
    picked_clusters = sorted({r["center_id"] // per for r in out})
    assert picked_clusters == list(range(KC_K)), picked_clusters
    assert sum(r["n_assigned"] for r in out) == KC_K * per
    for r in out:
        assert r["n_assigned"] == per, out
        # noise d2 ~ 64·(2·0.05)² ≪ inter-center d2 ~ 2·64·100
        assert r["max_d2"] < 10.0, r


def test_kcenter_coreset_real_data_invariants(spark, sf_dir):
    """On the real corpus: dense steps, full coverage, and the greedy
    invariant that the selection-time radius is non-increasing — checked
    indirectly: every cell's final coverage radius is positive and finite."""
    from etl_master_spark.operators.vectors import KC_K, kcenter_coreset

    out = kcenter_coreset(spark, sf_dir).collect()
    assert [r["step"] for r in out] == list(range(KC_K))
    assert len({r["center_id"] for r in out}) == KC_K
    n = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    assert sum(r["n_assigned"] for r in out) == n
    for r in out:
        assert r["max_d2"] >= 0.0


def test_ann_ivfpq_planted_clusters_recall(spark):
    """IVF-PQ effectiveness on its intended regime (clustered corpus):
    a tight cluster's members share a coarse cell, so the query's probe
    finds them, and residual-PQ distances must rank same-cluster members
    into the top-5 (the ann_pq planted test, composed with the IVF
    prune)."""
    import numpy as np

    from etl_master_spark.operators.vectors import _ann_ivfpq_core

    rng = np.random.default_rng(19)
    n_clusters, per = 40, 12
    centers = rng.normal(0.0, 1.0, (n_clusters, 64))
    rows = []
    for c in range(n_clusters):
        for i in range(per):
            v = centers[c] + rng.normal(0.0, 0.05, 64)
            rows.append((c * per + i, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = _ann_ivfpq_core(spark, emb).collect()
    by_q: dict[int, list] = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r["neighbor_id"])
    assert set(by_q) == {0, 1, 2, 3, 4}
    hits = sum(1 for q, ns in by_q.items() for n in ns if n < per)
    total = sum(len(ns) for ns in by_q.values())
    assert hits / total >= 0.9, (hits, total, by_q)


def test_mmr_rerank_diversifies_redundant_topk(spark):
    """MMR effectiveness: plant a top-k where 6 near-identical candidates
    dominate relevance and 4 mutually-dissimilar ones trail slightly.
    Plain top-5 would take 5 clones; MMR at λ=0.7 must keep the most
    relevant clone, then prefer the diverse candidates over the other
    clones (penalty ≈ 0.3·1.0 for a clone vs ≈ 0.3·sim_low for a
    diverse pick)."""
    import numpy as np

    from etl_master_spark.operators.vectors import MMR_K, _mmr_core

    rng = np.random.default_rng(53)
    base = rng.normal(0.0, 1.0, 64)
    rows = []
    for i in range(6):  # clones: ids 0-5, relevance ~0.99
        v = base + rng.normal(0.0, 0.01, 64)
        rows.append((0, i, 0.99 - i * 0.001, [float(x) for x in v]))
    for i in range(4):  # diverse: ids 10-13, relevance 0.9
        v = rng.normal(0.0, 1.0, 64)
        rows.append((0, 10 + i, 0.9, [float(x) for x in v]))
    withv = spark.createDataFrame(
        rows,
        "query_id long, neighbor_id long, cosine double,"
        " embedding array<float>",
    )
    out = sorted(_mmr_core(withv).collect(), key=lambda r: r["rnk"])
    assert len(out) == MMR_K
    assert out[0]["neighbor_id"] == 0  # most relevant clone first
    picked = {r["neighbor_id"] for r in out}
    assert len(picked & {10, 11, 12, 13}) >= 3, picked
    # selection-order scores are non-increasing (greedy argmax invariant)
    scores = [r["mmr_score"] for r in out]
    assert scores == sorted(scores, reverse=True), scores


def test_pq_index_append_accounts_for_whole_batch(spark, sf_dir):
    """Frozen-codebook append contract: every new-batch vector gets
    exactly one code per subspace (per-m occupancies each sum to the
    batch size), codes stay inside the codebook, and quantization error
    is non-negative."""
    from pyspark.sql import functions as F

    from etl_master_spark.operators.text import load_table
    from etl_master_spark.operators.vectors import (
        IDX_OLD_LT,
        IDX_OLD_MOD,
        IDX_SEED,
        PQ_K,
        PQ_M,
        pq_index_append,
    )
    from etl_master_spark.functions.hashing import phash_frag

    out = pq_index_append(spark, sf_dir).collect()
    n_new = (
        load_table(spark, sf_dir, "embeddings")
        .filter(
            F.expr(phash_frag("vec_id", seed=IDX_SEED)) % IDX_OLD_MOD
            >= IDX_OLD_LT
        )
        .count()
    )
    assert n_new > 0
    per_m: dict[int, int] = {}
    for r in out:
        assert 0 <= r["m"] < PQ_M
        assert 0 <= r["code"] < PQ_K
        assert r["avg_qerr"] >= 0.0
        per_m[r["m"]] = per_m.get(r["m"], 0) + r["n_new"]
    assert per_m == {m: n_new for m in range(PQ_M)}, per_m


def test_pca_whiten_identity_covariance_on_anisotropic_data(spark):
    """Whitening contract: on a planted anisotropic Gaussian (variances
    spanning 2 orders of magnitude along random directions), the
    whitened sample covariance must be ~I_k, components must come out
    variance-ordered, and the projection must be a pure function of the
    input set (layout-invariant)."""
    import numpy as np

    from etl_master_spark.operators.vectors import _pca_whiten_core

    rng = np.random.default_rng(67)
    dim, n, k = 64, 600, 8
    scales = np.ones(dim)
    scales[:8] = [30.0, 20.0, 14.0, 10.0, 7.0, 5.0, 3.5, 2.5]
    Q, _ = np.linalg.qr(rng.normal(0.0, 1.0, (dim, dim)))
    X = rng.normal(0.0, 1.0, (n, dim)) * scales[None, :] @ Q.T + 5.0
    rows = [(i, [float(x) for x in X[i]]) for i in range(n)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    out = _pca_whiten_core(spark, emb, k=k).collect()
    Y = np.array([r["wemb"] for r in sorted(out, key=lambda r: r["vec_id"])])
    assert Y.shape == (n, k)
    C = np.cov(Y, rowvar=False, bias=True)
    assert np.abs(C - np.eye(k)).max() < 0.15, np.abs(C - np.eye(k)).max()
    # variance ordering: raw projections before whitening are ordered, so
    # whitened variances are all ~1 — check the ORDER via the transform:
    # re-project without the lambda scaling is internal; instead assert
    # the first component aligns with the largest planted direction
    # component ORDER: whitening is permutation-invariant, so ~I_k alone
    # cannot catch a shuffled top-k — require coord r to align with the
    # r-th largest planted direction for the three well-separated leaders
    Xc = X - X.mean(axis=0)
    for r in range(3):
        corr = np.corrcoef(Xc @ Q[:, r], Y[:, r])[0, 1]
        assert abs(corr) > 0.9, (r, corr)

    # layout invariance
    out2 = _pca_whiten_core(spark, emb.repartition(13), k=k).collect()
    Y2 = np.array([r["wemb"] for r in sorted(out2, key=lambda r: r["vec_id"])])
    assert np.abs(Y - Y2).max() < 1e-6, np.abs(Y - Y2).max()


def test_embedding_covariance_matches_numpy(spark):
    """The distributed partial-Gram aggregation must reproduce the plain
    numpy moment estimates to rounding precision on a planted frame."""
    import numpy as np

    from etl_master_spark.operators.vectors import _cov_core

    rng = np.random.default_rng(71)
    X = rng.normal(0.0, 2.0, (300, 64))
    emb = spark.createDataFrame(
        [([float(x) for x in row],) for row in X], "embedding array<float>"
    )
    out = _cov_core(emb).collect()
    Xd = X.astype(np.float32).astype(np.float64)  # parquet-free float32 trip
    exy = (Xd.T @ Xd) / len(Xd)
    mu = Xd.mean(axis=0)
    cov = exy - np.outer(mu, mu)
    for r in out:
        assert abs(r["exy"] - round(exy[r["i"], r["j"]], 9)) <= 2e-9, r
        assert abs(r["cov"] - round(cov[r["i"], r["j"]], 9)) <= 4e-9, r


def test_semantic_dedup_scaled_matches_demo_below_threshold(spark, sf_dir):
    """At the gate the scaling formula yields k = IVF_CELLS, so the
    scaled face must equal the demo face row-for-row (same trajectory,
    same prune) — this is what lets one oracle certify both."""
    from etl_master_spark.operators.vectors import (
        semantic_dedup,
        semantic_dedup_scaled,
    )

    want = sorted(tuple(r) for r in semantic_dedup(spark, sf_dir).collect())
    got = sorted(
        tuple(r) for r in semantic_dedup_scaled(spark, sf_dir).collect()
    )
    assert got == want


def test_semantic_dedup_scaled_fine_k_still_prunes_identicals(spark, sf_dir):
    """Force the scaling rule to re-cluster finer than the demo face
    (tiny target_cell -> k >> IVF_CELLS): the face must complete, keep
    the demo schema, assign every vector, and still collapse exact
    duplicates — identical embeddings share an argmin cluster under ANY
    codebook, so the later twin always drops."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from etl_master_spark.operators.vectors import (
        IVF_CELLS,
        semantic_dedup,
        semantic_dedup_scaled,
    )
    from etl_master_spark.sources.io import load_table

    import tempfile, pathlib, shutil

    tmp = pathlib.Path(tempfile.mkdtemp())
    try:
        # corpus = the real sf table + one exact twin of an existing vector
        base = pq.read_table(f"{sf_dir}/embeddings.parquet")
        twin = base.slice(0, 1).to_pydict()
        orig_id = twin["vec_id"][0]
        twin["vec_id"] = [10_000_000]
        pq.write_table(
            pa.concat_tables([base, pa.table(twin, schema=base.schema)]),
            tmp / "embeddings.parquet",
        )
        n = load_table(spark, str(tmp), "embeddings").count()
        out = semantic_dedup_scaled(spark, str(tmp), target_cell=25)
        assert out.columns == semantic_dedup(spark, sf_dir).columns
        rows = {r["vec_id"]: r for r in out.collect()}
        assert len(rows) == n
        assert rows[10_000_000]["keep"] is False  # twin collapses
        assert rows[orig_id]["keep"] is True
        # finer than the demo face actually ran: enough vectors per 25
        assert n // 25 > IVF_CELLS
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
