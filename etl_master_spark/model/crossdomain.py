"""Cross-domain preference transfer — the reference's core contribution
(the "equivalent transformation" of ETL, arXiv:2009.06884), re-expressed as
a strategy-parameterized linear-map fit over distributed embeddings.

The reference couples two domain autoencoders with a (near-orthogonal)
linear map W trained adversarially (``model_my.py:41-50,62-70``), with
ablation variants: shared W/Wᵀ, independent W1/W2, and a 2-layer MLP
(SURVEY.md §2.7 — three near-copied codebases in the reference, ONE strategy
enum here).

Spark-first fit: the closed-form ridge solution W = (XᵀX + λI)⁻¹ XᵀY needs
only the E×E Gram matrices — computed DISTRIBUTEDLY by summing per-row outer
products via mapInPandas partial sums (numpy BLAS per Arrow batch), then a
tiny E×E solve on the driver. No row data ever leaves the executors; driver
traffic is O(E²), independent of user count — the pattern that scales to
100 TB of embeddings.

Inverse-consistency metric (reference T7, ``model_my.py:67-70``):
mean ‖zx − (zx·W)·Wᵀ‖₁ as a one-pass DataFrame aggregation.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Literal

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Strategy = Literal["shared", "two_maps", "mlp"]


def _gram_sums(pairs: DataFrame, dim: int) -> tuple[np.ndarray, np.ndarray]:
    """Distributed XᵀX and XᵀY over a DataFrame of (x ARRAY, y ARRAY) rows:
    per-partition BLAS partial sums, driver-side reduce of E×E blocks."""

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        xtx = np.zeros((dim, dim))
        xty = np.zeros((dim, dim))
        for pdf in batches:
            x = np.array(pdf["x"].tolist(), dtype=np.float64)
            y = np.array(pdf["y"].tolist(), dtype=np.float64)
            if len(x):
                xtx += x.T @ x
                xty += x.T @ y
        yield pd.DataFrame(
            {"xtx": [xtx.ravel().tolist()], "xty": [xty.ravel().tolist()]}
        )

    parts = pairs.mapInPandas(
        part, "xtx array<double>, xty array<double>"
    ).collect()
    xtx = sum(np.array(r["xtx"]).reshape(dim, dim) for r in parts)
    xty = sum(np.array(r["xty"]).reshape(dim, dim) for r in parts)
    return xtx, xty


def fit_linear_map(
    emb_x: DataFrame,
    emb_y: DataFrame,
    strategy: Strategy = "shared",
    reg: float = 1.0,
) -> dict[str, np.ndarray]:
    """Fit the cross-domain map on users shared between domains.

    - 'shared': one W with ẑy = zx·W and ẑx = zy·Wᵀ (reference full ETL) —
      fit W on x→y, reuse its transpose for the reverse direction.
    - 'two_maps': independent W1 (x→y), W2 (y→x) (variant2).
    - 'mlp': the 2-layer nonlinear variant (variant3) — requires an
      iterative trainer; stubbed pending the mapInPandas SGD kernel.
    """
    dim = len(emb_x.select("embedding").first()["embedding"])
    pairs = emb_x.alias("a").join(emb_y.alias("b"), "user_id").select(
        F.col("a.embedding").cast("array<double>").alias("x"),
        F.col("b.embedding").cast("array<double>").alias("y"),
    )
    xtx, xty = _gram_sums(pairs, dim)
    ridge = xtx + reg * np.eye(dim)
    w_xy = np.linalg.solve(ridge, xty)
    if strategy == "shared":
        return {"W": w_xy}
    if strategy == "two_maps":
        pairs_rev = pairs.select(F.col("y").alias("x"), F.col("x").alias("y"))
        ytx, ytyx = _gram_sums(pairs_rev, dim)
        w_yx = np.linalg.solve(ytx + reg * np.eye(dim), ytyx)
        return {"W1": w_xy, "W2": w_yx}
    if strategy == "mlp":
        raise NotImplementedError(
            "variant3 2-layer map needs the mapInPandas SGD kernel (planned)"
        )
    raise ValueError(f"unknown strategy {strategy!r}")


def transform_embeddings(emb: DataFrame, w: np.ndarray) -> DataFrame:
    """Apply the fitted map to an embedding DataFrame (z·W) via an
    Arrow-batched matmul — stays distributed, one batch at a time."""
    spark = emb.sparkSession
    bw = spark.sparkContext.broadcast(w)

    def apply(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            z = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            out = z @ bw.value if len(z) else np.zeros((0, bw.value.shape[1]))
            yield pd.DataFrame(
                {"user_id": pdf["user_id"], "embedding": out.tolist()}
            )

    return emb.select(
        "user_id", F.col("embedding").cast("array<double>").alias("embedding")
    ).mapInPandas(apply, "user_id long, embedding array<double>")


def inverse_consistency(emb_x: DataFrame, w: np.ndarray) -> float:
    """Reference T7 regularizer as a metric: mean L1 of zx − (zx·W)·Wᵀ,
    one distributed pass."""
    spark = emb_x.sparkSession
    bw = spark.sparkContext.broadcast(w)

    def apply(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            z = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            if len(z):
                resid = np.abs(z - (z @ bw.value) @ bw.value.T).sum(axis=1)
            else:
                resid = np.zeros(0)
            yield pd.DataFrame({"l1": resid})

    res = (
        emb_x.select(F.col("embedding").cast("array<double>").alias("embedding"))
        .mapInPandas(apply, "l1 double")
        .agg(F.avg("l1").alias("m"))
        .collect()
    )
    return float(res[0]["m"])
