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

from kkbox_churn_prediction_spark.operators.replay import driver_replay_max_rows

_VQ = 1_000_000_000  # vector fixed-point scale (1e-9 units)
_CQ = 1_000_000      # matrix fixed-point scale (1e-6 units)


def power_iteration_top_eigen(
    cov_upper: DataFrame,
    n_iter: int = 12,
    *,
    mode: str = "auto",
    max_driver_entries: int = 65536,
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

    Execution modes (the sessionize auto-switch pattern — results are
    bit-identical because every step is the same exact integer
    fixed point, pytest-asserted):

    - ``mode="driver"``: collect the quantized matrix once and replay
      the identical integer recursion in numpy-free Python scalars
      (exact ints), shipping only the pre-round doubles back; right
      whenever the matrix is BOUNDED by construction (a d×d
      covariance, a top-k×top-k PPMI block) — O(d²) driver memory,
      zero iteration jobs. Measured ~10× faster at sf0.1 on d=64.
    - ``mode="distributed"``: the matrix never leaves the cluster —
      each step is one broadcast-hash-join of the ≤d-row vector
      against the ``(i, j)`` rows plus a hash agg, with
      ``localCheckpoint`` truncating the 12-step lineage (the
      ``connected_components`` discipline). The only choice when the
      "matrix" is a 10^9-row sparse affinity/similarity graph.
    - ``mode="auto"`` (default): one count of the entry table picks —
      driver at ≤ ``max_driver_entries`` entries (further capped by
      the session-wide ``spark.kkbox_churn.driverReplayMaxRows`` conf
      when set, so a fleet can disable every replay at once), else
      distributed.
    """
    if mode not in ("auto", "driver", "distributed"):
        raise ValueError(f"unknown mode {mode!r}")
    if mode == "auto":
        cap = min(
            int(max_driver_entries),
            driver_replay_max_rows(
                cov_upper.sparkSession, int(max_driver_entries)
            ),
        )
        n_entries = cov_upper.count()
        mode = "driver" if n_entries <= cap else "distributed"
    if mode == "driver":
        return _power_iteration_driver(cov_upper, int(n_iter))
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


def _power_iteration_driver(cov_upper: DataFrame, n_iter: int) -> DataFrame:
    """Driver-side replay of :func:`power_iteration_top_eigen`'s exact
    integer fixed point over a BOUNDED collected matrix. Every
    arithmetic step mirrors the distributed path operation for
    operation — quantization ``round(cov·1e6)`` (half-away), exact
    integer mat-vec in arbitrary-precision Python ints (the
    decimal(38,0) analog), ``sqrt(float(Σs²))`` (decimal→double cast
    then sqrt), per-step re-quantization ``round(float(s)/norm·1e9)``
    — so the resulting integer vector is bit-identical. The final
    6dp formatting runs in Spark on the shipped pre-round doubles,
    the same expressions the distributed path uses."""
    import math

    spark = cov_upper.sparkSession

    def q(x: float) -> int:
        return (
            int(math.floor(x + 0.5)) if x >= 0 else -int(math.floor(-x + 0.5))
        )

    rows = cov_upper.select("dim_i", "dim_j", "cov").collect()
    ent: dict[tuple[int, int], int] = {}
    for r in rows:
        cq = q(float(r["cov"]) * float(_CQ))
        ent[(r["dim_i"], r["dim_j"])] = cq
        if r["dim_i"] != r["dim_j"]:
            ent[(r["dim_j"], r["dim_i"])] = cq
    dims = sorted({i for i, _ in ent})
    if not dims:
        return spark.createDataFrame(
            [], "dim int, loading double, eigenvalue double"
        )
    d = len(dims)
    vq = {i: q(float(_VQ) / math.sqrt(float(d))) for i in dims}
    by_i: dict[int, list[tuple[int, int]]] = {i: [] for i in dims}
    for (i, j), cq in ent.items():
        by_i[i].append((j, cq))
    for _ in range(int(n_iter)):
        s = {
            i: sum(cq * vq[j] for j, cq in pairs)
            for i, pairs in by_i.items()
        }
        norm = math.sqrt(float(sum(x * x for x in s.values())))
        vq = {i: q(float(s[i]) / norm * float(_VQ)) for i in dims}
    num = sum(
        vq[i] * cq * vq[j] for (i, j), cq in ent.items()
    )
    den = sum(x * x for x in vq.values())
    lam = float(num) / float(den) / float(_CQ)
    # tie rule of the distributed max_by: max (|vq|, -dim)
    best = max(vq.items(), key=lambda kv: (abs(kv[1]), -kv[0]))[1]
    sign = -1.0 if best < 0 else 1.0
    out_rows = [
        (int(i), sign * float(vq[i]) / float(_VQ), lam) for i in dims
    ]
    raw = spark.createDataFrame(
        out_rows, "dim int, loading_raw double, eigenvalue_raw double"
    )
    return raw.select(
        "dim",
        F.round("loading_raw", 6).alias("loading"),
        F.round("eigenvalue_raw", 6).alias("eigenvalue"),
    )


def _hits_fixed_point(mat: DataFrame, n_iter: int):
    """Shared HITS fixed point: returns the (hub, auth) quantized
    score frames after ``n_iter`` full iterations on the persisted
    ``(src, dst, w)`` edge frame. Exact integer half-steps, L2
    normalization + 1e-9 re-quantization per half-step,
    ``localCheckpoint`` per half-step (the power-iteration recipe)."""
    w_all = Window.partitionBy()
    d_cnt = F.count(F.lit(1)).over(w_all).cast("double")
    auth = (
        mat.select("dst")
        .distinct()
        .select(
            "dst",
            F.round(F.lit(float(_VQ)) / F.sqrt(d_cnt)).cast("long").alias("aq"),
        )
        .localCheckpoint()
    )
    hub = None
    for _ in range(int(n_iter)):
        hs = (
            mat.join(F.broadcast(auth), "dst")
            .groupBy("src")
            .agg(F.sum(F.col("w").cast("decimal(38,0)") * F.col("aq")).alias("s"))
        )
        hnorm = F.sqrt(F.sum(F.col("s") * F.col("s")).over(w_all).cast("double"))
        hub = hs.select(
            "src",
            F.round(F.col("s").cast("double") / hnorm * F.lit(float(_VQ)))
            .cast("long")
            .alias("hq"),
        ).localCheckpoint()
        as_ = (
            mat.join(F.broadcast(hub), "src")
            .groupBy("dst")
            .agg(F.sum(F.col("w").cast("decimal(38,0)") * F.col("hq")).alias("s"))
        )
        anorm = F.sqrt(F.sum(F.col("s") * F.col("s")).over(w_all).cast("double"))
        auth = as_.select(
            "dst",
            F.round(F.col("s").cast("double") / anorm * F.lit(float(_VQ)))
            .cast("long")
            .alias("aq"),
        ).localCheckpoint()
    return hub, auth


def _hits_fixed_point_driver(mat: DataFrame, n_iter: int):
    """Driver-side numpy replay of :func:`_hits_fixed_point` for
    graphs whose edge list fits on the driver (the
    autoBroadcastJoinThreshold idea applied to iteration): every
    half-step is one exact-int64 ``np.add.at`` scatter-sum (products
    ≤ w·1e9 ≪ 2^63), the squared norm accumulates in arbitrary-
    precision Python ints (the decimal(38,0) analog), and the
    re-quantization is the same float division + round-half-away —
    so the integer score trajectory is bit-identical to the
    distributed fixed point (pytest-asserted). Returns the same
    (hub, auth) quantized frames."""
    import math

    import numpy as np

    import pandas as pd

    spark = mat.sparkSession
    pdf = mat.toPandas()  # Arrow-accelerated bulk collect
    if len(pdf) == 0:
        # empty graph: no nodes, no scores — empty frames with the
        # output schemas (r5 empty-sweep: 1/sqrt(0) crashed here)
        hub = spark.createDataFrame(
            [], mat.select("src").schema.add("hq", "long")
        )
        auth = spark.createDataFrame(
            [], mat.select("dst").schema.add("aq", "long")
        )
        return hub, auth
    src_cat = pd.Categorical(pdf["src"])
    dst_cat = pd.Categorical(pdf["dst"])
    srcs = [x.item() if hasattr(x, "item") else x for x in src_cat.categories]
    dsts = [x.item() if hasattr(x, "item") else x for x in dst_cat.categories]
    e_s = np.asarray(src_cat.codes, dtype=np.int64)
    e_d = np.asarray(dst_cat.codes, dtype=np.int64)
    e_w = pdf["w"].to_numpy(dtype=np.int64)

    def q_vec(s: np.ndarray) -> np.ndarray:
        norm = math.sqrt(float(sum(int(x) * int(x) for x in s)))
        v = s.astype(np.float64) / norm * float(_VQ)
        return np.where(
            v >= 0, np.floor(v + 0.5), -np.floor(-v + 0.5)
        ).astype(np.int64)

    d_cnt = len(dsts)
    a0 = float(_VQ) / math.sqrt(float(d_cnt))
    aq = np.full(d_cnt, int(math.floor(a0 + 0.5)), dtype=np.int64)
    hq = np.zeros(len(srcs), dtype=np.int64)
    for _ in range(int(n_iter)):
        hs = np.zeros(len(srcs), dtype=np.int64)
        np.add.at(hs, e_s, e_w * aq[e_d])
        hq = q_vec(hs)
        as_ = np.zeros(d_cnt, dtype=np.int64)
        np.add.at(as_, e_d, e_w * hq[e_s])
        aq = q_vec(as_)
    hub = spark.createDataFrame(
        [(srcs[i], int(hq[i])) for i in range(len(srcs))],
        mat.select("src").schema.add("hq", "long"),
    )
    auth = spark.createDataFrame(
        [(dsts[i], int(aq[i])) for i in range(d_cnt)],
        mat.select("dst").schema.add("aq", "long"),
    )
    return hub, auth


# past this many edges the iteration stays distributed — the
# autoBroadcastJoinThreshold idea applied to fixed-point iteration
_HITS_DRIVER_MAX_EDGES = 2_000_000


def hits_scores(
    edges: DataFrame, n_iter: int = 12, *, mode: str = "auto"
) -> DataFrame:
    """HITS hubs (Kleinberg 1999) on a weighted bipartite edge list
    ``(src, dst, w)`` with integer weights — power iteration on A·Aᵀ
    in the same exact integer fixed-point as
    :func:`power_iteration_top_eigen`.

    Per full iteration: ``hub ∝ Σ_dst w·auth`` then
    ``auth ∝ Σ_src w·hub``, each half-step L2-normalized and
    re-quantized to the 1e-9 grid, so both engines enter every step
    with identical integers and the only float ops are one sqrt and
    one correctly-rounded division per half-step. Fixed ``n_iter``
    (no convergence break — the determinism guard).

    Execution modes (bit-identical, pytest-asserted):
    ``mode="distributed"`` keeps the edge list on the cluster — each
    half-step is one broadcast of the node-sized score table against
    the edges + a hash agg, ``localCheckpoint`` truncating the
    2·n_iter-step lineage; for web-scale node sets swap the broadcast
    for a shuffled equi-join, the algebra is unchanged.
    ``mode="driver"`` replays the identical integer fixed point as
    numpy scatter-sums over the collected edge list — right when the
    graph fits on the driver (measured 19.2s → ~2s at sf0.1).
    ``mode="auto"`` (default) counts edges once and picks driver at
    ≤ ``_HITS_DRIVER_MAX_EDGES`` — the autoBroadcastJoinThreshold
    idea applied to fixed-point iteration.

    Output: one row per src node ``(src, hub, n_dst, total_w)``.
    """
    mat = edges.select(
        F.col("src"), F.col("dst"), F.col("w").cast("long").alias("w")
    ).persist()
    hub, _ = _hits_dispatch(mat, n_iter, mode)
    deg = mat.groupBy("src").agg(
        F.countDistinct("dst").cast("long").alias("n_dst"),
        F.sum("w").cast("long").alias("total_w"),
    )
    return hub.join(deg, "src").select(
        "src",
        F.round(F.col("hq").cast("double") / F.lit(float(_VQ)), 6).alias("hub"),
        "n_dst",
        "total_w",
    )


def _hits_dispatch(mat: DataFrame, n_iter: int, mode: str):
    if mode not in ("auto", "driver", "distributed"):
        raise ValueError(f"unknown mode {mode!r}")
    if mode == "auto":
        max_rows = driver_replay_max_rows(
            mat.sparkSession, _HITS_DRIVER_MAX_EDGES
        )
        mode = "driver" if mat.count() <= max_rows else "distributed"
    if mode == "driver":
        return _hits_fixed_point_driver(mat, int(n_iter))
    return _hits_fixed_point(mat, int(n_iter))


def hits_authorities(
    edges: DataFrame, n_iter: int = 12, *, mode: str = "auto"
) -> DataFrame:
    """Authority side of :func:`hits_scores`: per dst node
    ``(dst, authority, n_src, total_w)`` from the identical half-step
    schedule, so the hub and authority frames are mutually
    consistent."""
    mat = edges.select(
        F.col("src"), F.col("dst"), F.col("w").cast("long").alias("w")
    ).persist()
    _, auth = _hits_dispatch(mat, n_iter, mode)
    deg = mat.groupBy("dst").agg(
        F.countDistinct("src").cast("long").alias("n_src"),
        F.sum("w").cast("long").alias("total_w"),
    )
    return auth.join(deg, "dst").select(
        "dst",
        F.round(F.col("aq").cast("double") / F.lit(float(_VQ)), 6).alias(
            "authority"
        ),
        "n_src",
        "total_w",
    )
