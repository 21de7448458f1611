"""Distributed spectral extraction: top eigenpair of the embedding
covariance by fixed-point power iteration.

``similarity.pca_project`` collects the tiny d×d covariance and
eigendecomposes driver-side (numpy ``eigh``) — right for d=64, wrong
once the "covariance" is a huge sparse similarity/affinity matrix
(spectral dedup-blocking, graph embeddings) where the matrix itself
must stay distributed. This module keeps the whole iteration in
DataFrame algebra: the matrix lives as ``(i, j, value)`` rows, one
mat-vec is a broadcast join + hash agg, and the vector is a ≤d-row
frame checkpointed per step.

Cross-engine determinism (the binned-Newton recipe, taken to its
fixed-point conclusion): float mat-vec sums wobble with partial-sum
order and power iteration can AMPLIFY the wobble by the spectral-gap
ratio per step, so the iteration runs in EXACT integer fixed-point —
matrix entries quantized to 1e-6 units (BIGINT), the vector to 1e-9
units (BIGINT), the mat-vec an exact integer sum (decimal/HUGEINT for
the squared-norm), and the only float ops per step are one sqrt and
one correctly-rounded IEEE division — bit-identical on any engine and
any partitioning. The DuckDB oracle unrolls the same steps as chained
CTEs (`_platt_oracle` precedent).

Reference parity anchor: the reference's feature pipeline has no
spectral op; this extends ``similarity.embedding_covariance``
(reference ``features/embeddings.py`` analog) to the distributed-
eigen path a 100 TB corpus needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_VQ = 1_000_000_000  # vector fixed-point scale (1e-9 units)
_CQ = 1_000_000      # matrix fixed-point scale (1e-6 units)


def power_iteration_top_eigen(
    cov_upper: DataFrame,
    n_iter: int = 12,
) -> DataFrame:
    """Top eigenpair of a symmetric matrix given as upper-triangle
    ``(dim_i, dim_j, cov)`` rows (the ``embedding_covariance``
    contract, ``cov`` already rounded to 6dp).

    Fixed ``n_iter`` mat-vec steps from the uniform start vector
    ``1/sqrt(d)``; no convergence break (determinism guard — both
    engines run the identical step count). Output: one row per
    dimension ``(dim, loading, eigenvalue)`` with the deterministic
    sign convention "largest-|loading| coordinate positive" (smallest
    dim on ties) and the Rayleigh-quotient eigenvalue.

    Scale shape: the matrix never leaves the cluster — each step is
    one broadcast-hash-join of the ≤d-row vector against the
    ``(i, j)`` rows plus a hash agg, and ``localCheckpoint`` truncates
    the 12-step lineage (the ``connected_components`` discipline).
    For d=64 this is toy-sized; the same plan runs when the matrix
    has 10^9 sparse rows.
    """
    sym = cov_upper.where(F.col("dim_i") != F.col("dim_j")).select(
        F.col("dim_j").alias("i"), F.col("dim_i").alias("j"), F.col("cov")
    )
    full = cov_upper.select(
        F.col("dim_i").alias("i"), F.col("dim_j").alias("j"), F.col("cov")
    ).unionAll(sym)
    mat = full.select(
        "i",
        "j",
        F.round(F.col("cov") * F.lit(float(_CQ))).cast("long").alias("cq"),
    ).persist()

    dims = mat.select("i").distinct()
    w_all = Window.partitionBy()
    d_cnt = F.count(F.lit(1)).over(w_all).cast("double")
    v = dims.select(
        F.col("i").alias("j"),
        F.round(F.lit(float(_VQ)) / F.sqrt(d_cnt)).cast("long").alias("vq"),
    ).localCheckpoint()

    for _ in range(int(n_iter)):
        s = (
            mat.join(F.broadcast(v), "j")
            .groupBy("i")
            .agg(F.sum(F.col("cq") * F.col("vq")).alias("s"))
        )
        # exact squared norm (decimal — s² can exceed BIGINT)
        norm = F.sqrt(
            F.sum((F.col("s").cast("decimal(38,0)") * F.col("s")))
            .over(w_all)
            .cast("double")
        )
        v = s.select(
            F.col("i").alias("j"),
            F.round(F.col("s").cast("double") / norm * F.lit(float(_VQ)))
            .cast("long")
            .alias("vq"),
        ).localCheckpoint()

    # Rayleigh quotient λ = vᵀCv / vᵀv in exact integer space; the
    # single final division is IEEE-identical on both engines.
    quad = (
        mat.join(F.broadcast(v), "j")
        .join(
            F.broadcast(v.select(F.col("j").alias("i"), F.col("vq").alias("vq_i"))),
            "i",
        )
        .agg(
            F.sum(
                F.col("vq_i").cast("decimal(38,0)") * F.col("cq") * F.col("vq")
            ).alias("num")
        )
    )
    den = v.agg(
        F.sum(F.col("vq").cast("decimal(38,0)") * F.col("vq")).alias("den")
    )
    lam = quad.crossJoin(den).select(
        (
            F.col("num").cast("double")
            / F.col("den").cast("double")
            / F.lit(float(_CQ))
        ).alias("eigenvalue")
    )
    # deterministic sign: coordinate of max |vq| (smallest dim on
    # ties) made positive
    sign_src = v.select(
        F.max_by(
            F.col("vq"), F.struct(F.abs(F.col("vq")).alias("a"), (-F.col("j")).alias("t"))
        ).alias("pivot")
    )
    out = (
        v.crossJoin(F.broadcast(sign_src))
        .crossJoin(F.broadcast(lam))
        .select(
            F.col("j").cast("int").alias("dim"),
            F.round(
                F.when(F.col("pivot") < 0, -F.col("vq")).otherwise(F.col("vq"))
                / F.lit(float(_VQ)),
                6,
            ).alias("loading"),
            F.round("eigenvalue", 6).alias("eigenvalue"),
        )
    )
    return out
