"""Round-11 optimization equivalence pins.

Each test proves an r11 rewrite is value-identical to the spelling it
replaced (the r10 test file's pattern): the pointer-doubled connected
components must land on the same fixpoint in FEWER rounds, and the
recall audit's score-once-restrict-by-join faces must equal the
score-per-candidate-set spellings they replaced.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_master_spark.operators import text as T
from etl_master_spark.operators.text import (
    _capped_lsh_candidates,
    _connected_components,
    _pair_jaccard,
    _shingles,
    minhash_lsh_pairs,
)


def _rows(df, *cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


# -- _connected_components: pointer doubling — same fixpoint, fewer rounds ----

def test_cc_pointer_doubling_path_graph_fewer_rounds(spark):
    # a length-11 path needs 11 plain min-propagation rounds (labels
    # move one hop per round) + 1 confirming round; the label-of-label
    # shortcut engages after five plain rounds (shallow graphs never pay
    # for it) and then halves the remaining chain per round
    n = 12
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, n)], "doc_a bigint, doc_b bigint"
    )
    nodes = spark.createDataFrame([(i,) for i in range(1, n + 1)], "doc_id bigint")
    got = _rows(_connected_components(nodes, pairs), "doc_id", "cluster")
    assert got == [(i, 1) for i in range(1, n + 1)]
    assert T._CC_LAST_ROUNDS <= 8, (
        f"doubling should cut 12 plain rounds to <=8, used {T._CC_LAST_ROUNDS}"
    )


def test_cc_pointer_doubling_clique_and_isolate(spark):
    pairs = spark.createDataFrame(
        [(10, 11), (11, 12), (10, 12)], "doc_a bigint, doc_b bigint"
    )
    nodes = spark.createDataFrame(
        [(i,) for i in [10, 11, 12, 99]], "doc_id bigint"
    )
    got = _rows(_connected_components(nodes, pairs), "doc_id", "cluster")
    assert got == [(10, 10), (11, 10), (12, 10), (99, 99)]
    # a clique converges in 1 changing round + 1 confirming round
    assert T._CC_LAST_ROUNDS <= 2


# -- recall audit: scoring the superset then restricting == scoring the set --

def test_scored_superset_restriction_equals_direct_scoring(spark, sf_dir):
    # the audit's restriction identity on REAL data: jaccard scored over
    # the uncapped banded candidates, restricted to the capped set by
    # equi-join, must equal scoring the capped set directly (the retired
    # per-face spelling)
    cand_all = minhash_lsh_pairs(spark, sf_dir).select("doc_a", "doc_b")
    cand_cap = _capped_lsh_candidates(spark, sf_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sh = _shingles(docs)
    scored_all = _pair_jaccard(cand_all, sh).filter(F.col("jaccard") >= 0.1)
    restricted = scored_all.join(cand_cap, ["doc_a", "doc_b"])
    direct = _pair_jaccard(cand_cap, sh).filter(F.col("jaccard") >= 0.1)
    assert _rows(restricted, "doc_a", "doc_b", "jaccard") == _rows(
        direct, "doc_a", "doc_b", "jaccard"
    )
