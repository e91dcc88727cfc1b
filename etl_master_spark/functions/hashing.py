"""Portable deterministic hashing — the engine's seeded-shuffle primitive.

The reference repo derives every "random" decision (leave-two-out split,
99-negative sampling, percent subsampling) from ``sklearn.utils.shuffle(lst,
random_state=seed)`` with fixed seeds 2020/72 (reference
``Dataset_CDAE.py:79,103,111,116,124``). A Mersenne-Twister permutation cannot
be reproduced distributively, and SURVEY.md §7.4 mandates *semantic*
determinism instead: order rows by a seeded hash that any engine can compute.

Spark's native ``xxhash64`` is ideal for Spark-only paths, but the driver's
correctness gate replays every query in DuckDB, whose ``hash()`` is a
different function. So the shuffle key used in oracle-checked operators is a
64-bit-safe LCG-style mix chained over the key columns, emitted as a SQL
fragment that parses and evaluates identically in Spark SQL and DuckDB:

    h0 = seed % P;  h_{i+1} = (h_i * A + B + (col_i % P)) % P
    h   = (h_n * A + B) % P          -- final mixing round

with P = 2^31 - 1 (prime), A/B the classic glibc LCG constants. Every term is
cast to BIGINT explicitly: Spark 4 runs in ANSI mode and would otherwise plan
INT multiplication that overflows (max intermediate here is P*A ≈ 2.4e18,
comfortably inside signed-64 range 9.2e18).

The final round (no column folded in) is load-bearing: the per-column step
ENDS with "+ col", so without it two keys whose last column differs by 1 hash
1/P apart — and every caller whose last key column is a small sequential id
(item_id in the split shuffle, the component index in LSH planes, the row id
in the prior sampler) would get a near-identity mapping instead of a shuffle.
One more multiply turns a unit step in the last column into a ~0.51·P jump.

This is a *shuffle key*, not a cryptographic hash — the only requirements are
determinism, portability, and enough dispersion to decorrelate rank order
from insertion order, which an LCG mix over a prime modulus provides.
"""

from __future__ import annotations

PHASH_P = 2_147_483_647  # 2^31 - 1, prime modulus
PHASH_A = 1_103_515_245  # glibc LCG multiplier
PHASH_B = 12_345  # glibc LCG increment


def phash_frag(*cols: str, seed: int = 2020) -> str:
    """SQL fragment computing the portable hash of ``cols`` — valid verbatim
    in both Spark SQL and DuckDB. ``cols`` are column names or integer-typed
    SQL expressions; NULLs poison the hash (keys must be non-null).
    """
    h = f"(CAST({seed} AS BIGINT) % CAST({PHASH_P} AS BIGINT))"
    for c in cols:
        h = (
            f"((({h}) * CAST({PHASH_A} AS BIGINT) + CAST({PHASH_B} AS BIGINT)"
            f" + (CAST({c} AS BIGINT) % CAST({PHASH_P} AS BIGINT)))"
            f" % CAST({PHASH_P} AS BIGINT))"
        )
    return (
        f"((({h}) * CAST({PHASH_A} AS BIGINT) + CAST({PHASH_B} AS BIGINT))"
        f" % CAST({PHASH_P} AS BIGINT))"
    )


def phash_col(*cols, seed: int = 2020):
    """Column-expression form of the portable hash (same arithmetic as
    ``phash_frag``), usable inside higher-order-function lambdas where a SQL
    fragment can't reference the lambda variable."""
    from pyspark.sql import functions as F

    h = F.lit(seed % PHASH_P).cast("bigint")
    for c in cols:
        c = c if hasattr(c, "cast") else F.col(c)
        h = (
            h * F.lit(PHASH_A).cast("bigint")
            + F.lit(PHASH_B).cast("bigint")
            + (c.cast("bigint") % F.lit(PHASH_P).cast("bigint"))
        ) % F.lit(PHASH_P).cast("bigint")
    return (
        h * F.lit(PHASH_A).cast("bigint") + F.lit(PHASH_B).cast("bigint")
    ) % F.lit(PHASH_P).cast("bigint")


def phash_py(*vals: int, seed: int = 2020) -> int:
    """Python reference implementation (for unit tests / golden fixtures)."""
    h = seed % PHASH_P
    for v in vals:
        h = (h * PHASH_A + PHASH_B + (int(v) % PHASH_P)) % PHASH_P
    return (h * PHASH_A + PHASH_B) % PHASH_P


def hex_mix_frag(md5_expr: str, window: int, mod: int) -> str:
    """31-mix over hex chars 8·window+1..8·window+8 of ``md5_expr``, mod
    ``mod``, REDUCED at every step — identical SQL text in Spark and
    DuckDB. The per-step reduction is load-bearing: ascii() of a
    non-ASCII char is its full codepoint, so an unreduced fold overflows
    int64 (see operators.text._winnow_fp_sql for the original analysis).
    Shared by the Bloom positions, the Count-Min rows, and the DP noise
    key so the subtle fold lives in ONE place."""
    h = "CAST(0 AS BIGINT)"
    for j in range(8):
        h = (
            f"(({h} * 31 + CAST(ascii(substr({md5_expr}, {8 * window + j + 1}, 1))"
            f" AS BIGINT)) % {mod})"
        )
    return h
