"""Focused pins for the round-10 optimization respellings.

Each optimization below changed an operator's INTERNALS while claiming
value-identical output; these tests pin the equivalence against an
in-test reference implementation of the retired spelling (the oracle
hash checks pin the registered faces end-to-end; these pin the shared
kernels directly, including edge cases the registered data may not hit).
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_master_spark.operators.analytics import _pairs_of
from etl_master_spark.operators.text import _connected_components


def _rows(df, *cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


# -- _pairs_of: posexplode+slice generator vs the retired nested-transform ----

def test_pairs_of_matches_nested_transform_reference(spark):
    baskets = spark.createDataFrame(
        [
            (1, [10, 20, 30]),   # k=3 -> 3 pairs
            (2, [7]),            # singleton -> no pairs
            (3, []),             # empty -> no pairs
            (4, [10, 20]),       # repeat pair across orders -> n=2 with order 1
            (5, [10, 20, 30, 40, 50]),  # k=5 -> 10 pairs
        ],
        "l_orderkey int, parts array<int>",
    )
    got = _rows(_pairs_of(baskets), "part_a", "part_b", "n")

    # reference: the retired row-local nested transform/flatten spelling
    parts = F.col("parts")
    pair_arr = F.flatten(
        F.transform(
            parts,
            lambda x, i: F.transform(
                F.slice(parts, i + 2, F.size(parts)),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    ref = (
        baskets.select(F.explode(pair_arr).alias("p"))
        .groupBy(F.col("p.a").alias("part_a"), F.col("p.b").alias("part_b"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert got == _rows(ref, "part_a", "part_b", "n")
    # spot-check the combinatorics: 3 + 0 + 0 + 1 + 10 basket-pair
    # occurrences, with (10, 20) present in orders 1, 4 and 5
    assert sum(n for _, _, n in got) == 14
    assert (10, 20, 3) in got


# -- _connected_components: union-min rounds vs the retired join-back rounds --

def _reference_cc(nodes, pairs):
    """The retired spelling: per round, neighbor-min aggregate + left
    join-back + least(), run to the same sum-stable fixpoint."""
    edges = (
        pairs.unionByName(
            pairs.select(
                F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b")
            )
        )
        .distinct()
        .localCheckpoint()
    )
    touched = edges.select(F.col("doc_a").alias("doc_id")).distinct()
    labels = touched.select(
        "doc_id", F.col("doc_id").alias("cluster")
    ).localCheckpoint()
    prev = None
    for _ in range(20):
        nbr = (
            edges.join(labels, edges.doc_b == labels.doc_id)
            .groupBy(F.col("doc_a").alias("doc_id"))
            .agg(F.min("cluster").alias("nbr_min"))
        )
        labels = (
            labels.join(nbr, "doc_id", "left")
            .select(
                "doc_id",
                F.least(
                    F.col("cluster"), F.coalesce("nbr_min", F.col("cluster"))
                ).alias("cluster"),
            )
            .localCheckpoint()
        )
        cur = labels.agg(F.sum("cluster")).first()[0]
        if cur == prev:
            break
        prev = cur
    return nodes.join(labels, "doc_id", "left").select(
        "doc_id", F.coalesce("cluster", F.col("doc_id")).alias("cluster")
    )


def test_cc_union_min_matches_join_back_reference(spark):
    # path graph 1-2-3-4-5 (multi-hop), clique {10,11,12}, isolate 99
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (11, 12), (10, 12)],
        "doc_a bigint, doc_b bigint",
    )
    nodes = spark.createDataFrame(
        [(i,) for i in [1, 2, 3, 4, 5, 10, 11, 12, 99]], "doc_id bigint"
    )
    got = _rows(_connected_components(nodes, pairs), "doc_id", "cluster")
    ref = _rows(_reference_cc(nodes, pairs), "doc_id", "cluster")
    assert got == ref
    # and both equal the ground truth: component min, isolates label self
    truth = sorted(
        [(1, 1), (2, 1), (3, 1), (4, 1), (5, 1),
         (10, 10), (11, 10), (12, 10), (99, 99)]
    )
    assert got == truth
