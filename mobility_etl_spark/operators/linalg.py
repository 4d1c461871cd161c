"""Distributed dense linear algebra over embedding columns.

The pattern that scales: per-partition BLAS on Arrow batches, merging
tiny d×d partials — never a shuffle of the vectors themselves. A Gram
matrix (Xᵀ X) over N vectors of dimension d shuffles exactly
``partitions × d(d+1)/2`` scalar rows regardless of N; covariance,
PCA-by-eigendecomposition (d×d on the driver), and whitening all
derive from it. This is the standard map-reduce factorization of
covariance computation — the d×d result is a *control* structure, like
IVF centroids (operators/similarity.py), not data.

The exact explode-based formulation (queries/similarity.py:
``vector_gram_matrix``) is the DuckDB-checkable baseline: per-row
double products summed as DECIMAL so partial-aggregation order can't
change a bit. The BLAS path here is gated against it to ~1e-9 relative
error in tests/test_linalg.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def gram_matrix_partials(df: DataFrame, vec_col: str, dim: int) -> DataFrame:
    """Upper-triangle Gram matrix via partition-local ``numpy`` ``XᵀX``.

    One mapInPandas pass: each Arrow batch is stacked into an (n, d)
    float64 matrix and multiplied locally; a partition emits d(d+1)/2
    partial rows however many vectors it held. The merge is a tiny
    groupBy-sum on (i, j). Also emits per-partition row counts under
    (i=-1, j=-1) so downstream covariance/mean normalization needs no
    second pass.
    """
    import numpy as np
    import pandas as pd

    iu = None  # built lazily inside workers

    def partials(batches):
        nonlocal iu
        g = np.zeros((dim, dim))
        n = 0
        for pdf in batches:
            x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            g += x.T @ x
            n += x.shape[0]
        if n == 0:
            return
        ii, jj = np.triu_indices(dim)
        yield pd.DataFrame(
            {
                "i": np.concatenate([ii + 1, [-1]]),
                "j": np.concatenate([jj + 1, [-1]]),
                "s": np.concatenate([g[ii, jj], [float(n)]]),
            }
        )

    return df.select(vec_col).mapInPandas(partials, "i int, j int, s double")


def gram_matrix(df: DataFrame, vec_col: str, dim: int) -> DataFrame:
    """Merged upper-triangle Gram matrix: (i, j, s) with 1 ≤ i ≤ j ≤ d,
    plus the row count at (-1, -1). Shuffle volume is O(partitions·d²),
    independent of corpus size."""
    return (
        gram_matrix_partials(df, vec_col, dim)
        .groupBy("i", "j")
        .agg(F.sum("s").alias("s"))
    )
