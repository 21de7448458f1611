"""Connected components over a near-duplicate pair graph.

The reference dedups by exact key only (GROUP BY + keep-first); a
web-scale corpus needs the TRANSITIVE closure of near-dup pairs —
A~B and B~C must land A, B, C in one cluster even when A~C was never
emitted by LSH. This module turns the pair list from
``operators/dedup.py`` (MinHash-LSH / embedding near-dup) into
cluster assignments.

Algorithm: iterative min-label propagation ("hash-min") on the
symmetrized edge list — each round every node adopts the minimum
label in its closed neighborhood; fixpoint = per-component minimum
id. Each round is ONE join (labels ⋈ edges, partitioned by node) +
ONE min-aggregate — no driver-side graph, no per-row Python.
Convergence needs O(diameter) rounds; near-dup clusters are
small-diameter by construction (a dup cluster's pairs all share
bands), so 3-5 rounds close real corpora. ``localCheckpoint`` after
each round truncates the lineage so the plan doesn't grow
exponentially across iterations, and the changed-label count that
decides termination reuses the SAME checkpointed result (one action
per round, no recompute). For adversarial long-chain graphs the
doubling variant (large-star/small-star, Kiveris et al. 2014) drops
rounds to O(log n); hash-min is the shipped default because dup
graphs are dense blobs, not paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kkbox_churn_prediction_spark.operators.replay import driver_replay_max_rows


# same threshold discipline as the PageRank/HITS fixed points below:
# under this many collected edge rows the min-label fixpoint runs as
# numpy gather-mins on the driver (exact integer semantics — output is
# hash-identical to the distributed rounds); past it the join+agg
# iteration is the web-scale path
_CC_DRIVER_MAX_EDGES = 2_000_000


def connected_components(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    *,
    algorithm: str = "hashmin",
    max_iter: int = 25,
    mode: str = "auto",
) -> DataFrame:
    """(node, component, component_size) for every node that appears
    in ``edges``; ``component`` is the minimum node id reachable via
    undirected pair edges.

    ``algorithm="hashmin"`` (default): closed-neighborhood min per
    round — O(diameter) rounds, cheapest per round, right for dup
    clusters (dense blobs). ``algorithm="doubling"``: adds a
    pointer-jump (label(v) ← label(label(v)), one self-join of the
    label table) per round — fast when node NUMBERING correlates with
    structure (paths/cycles in id order close in O(log n)), but the
    round-4 stress run measured it DEGRADING on adversarial
    permutation graphs (a → 31a+7 mod n: 41-80 rounds at n = 1000 —
    a single jump per round only helps once the label chain itself is
    deep, which adversarial numberings delay). ``algorithm="star"``:
    the two-phase large-star/small-star edge rewiring of Kiveris et
    al. 2014 — provably O(log² n) rounds on EVERY graph (each
    large-star halves the height of any tall structure regardless of
    numbering); the adversarial-graph scale path, converging in ≤ 8
    rounds on the same permutation graph.

    Raises after ``max_iter`` rounds without a fixpoint (a hash-min
    run on a high-diameter graph should fail loudly and be rerun
    with star, not silently truncate clusters).

    Execution modes (outputs hash-identical — min ids and counts are
    exact integers, pytest-asserted): ``mode="driver"`` Arrow-collects
    the raw pair list in ONE scan and runs the min-label fixpoint as
    numpy gather-mins with pointer jumping (O(log n) rounds, so chains
    converge too — no max_iter failure mode on this path).
    ``mode="distributed"`` keeps the join+agg rounds above.
    ``mode="auto"`` (default) bounds the collect with ``limit(max+1)``
    and picks driver under ``_CC_DRIVER_MAX_EDGES`` collected rows —
    past it, the distributed rounds are the web-scale path, unchanged.
    """
    if algorithm not in ("hashmin", "doubling", "star"):  # pragma: no cover
        raise ValueError(f"unknown algorithm {algorithm!r}")
    if mode not in ("auto", "driver", "distributed"):  # pragma: no cover
        raise ValueError(f"unknown mode {mode!r}")
    raw = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    if mode != "distributed":
        max_rows = driver_replay_max_rows(
            edges.sparkSession, _CC_DRIVER_MAX_EDGES
        )
        probe = raw.limit(max_rows + 1) if mode == "auto" else raw
        tbl = probe.toArrow()
        if mode == "driver" or tbl.num_rows <= max_rows:
            return _cc_driver(edges.sparkSession, tbl, raw.schema)
    if algorithm == "star":
        return _star_components(raw, max_iter)
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
    )
    sym = sym.localCheckpoint(eager=True)
    labels = (
        sym.select(F.col("u").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("label"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        # min over closed neighborhood: own label ∪ neighbors' labels
        neigh = (
            sym.join(labels.withColumnRenamed("node", "v"), "v")
            .select(F.col("u").alias("node"), "label")
        )
        new_labels = (
            labels.unionByName(neigh)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
        )
        if algorithm == "doubling":
            # pointer jump: chase one indirection — label(label(v)).
            # Left join: a label that is itself a component min has no
            # entry ≠ itself, coalesce keeps it. Halves chain depth
            # each round → fixpoint in O(log n) rounds.
            jumped = (
                new_labels.alias("a")
                .join(
                    new_labels.select(
                        F.col("node").alias("_ln"), F.col("label").alias("_ll")
                    ).alias("b"),
                    F.col("a.label") == F.col("b._ln"),
                    "left",
                )
                .select(
                    F.col("a.node").alias("node"),
                    F.least(
                        F.col("a.label"), F.coalesce(F.col("b._ll"), F.col("a.label"))
                    ).alias("label"),
                )
            )
            new_labels = jumped
        new_labels = new_labels.localCheckpoint(eager=True)
        changed = (
            new_labels.join(labels.withColumnRenamed("label", "old"), "node")
            .where(F.col("label") != F.col("old"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds"
        )
    sizes = labels.groupBy("label").agg(F.count(F.lit(1)).alias("component_size"))
    return (
        labels.join(sizes, "label")
        .select(
            F.col("node"),
            F.col("label").alias("component"),
            "component_size",
        )
    )


def _star_components(raw: DataFrame, max_iter: int) -> DataFrame:
    """Distributed two-phase large-star/small-star connected
    components (Kiveris et al. 2014, "Connected Components in
    MapReduce and Beyond") — the adversarial-graph path of
    :func:`connected_components`.

    Each round REWIRES the edge set (instead of propagating labels
    over fixed edges):

    - **large-star**: per node u with m = min(Γ(u) ∪ {u}), every
      neighbor v > u re-attaches to m → {(v, m)}. Tall structures
      halve in height regardless of how node ids are arranged — the
      property the single-pointer-jump "doubling" variant lacks.
    - **small-star**: per node u over its ≤-neighbors
      S = {v ∈ Γ(u): v ≤ u}, all of S ∪ {u} attach to min(S ∪ {u}).

    The fixpoint is a star forest (every edge = (member, component
    min)); convergence is detected when a full round leaves the
    canonical edge set unchanged (checked EXACTLY with two anti-joins
    — no hash signatures, the loud-correctness discipline), and
    ``max_iter`` still bounds the loop. Labels/sizes then read
    directly off the stars. Per round: two groupBy-min aggs + two
    joins + the fixpoint check, all on the current edge set, with
    ``localCheckpoint`` keeping lineage flat — the same per-round
    cost class as hash-min, in O(log² n) rounds on every graph.
    """

    def canon(e: DataFrame) -> DataFrame:
        return (
            e.where(F.col("a") != F.col("b"))
            .select(
                F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b")
            )
            .distinct()
        )

    nodes = (
        raw.select(F.col("u").alias("node"))
        .union(raw.select(F.col("v").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    e = canon(
        raw.select(F.col("u").alias("a"), F.col("v").alias("b"))
    ).localCheckpoint(eager=True)
    for _ in range(max_iter):
        adj = e.select(F.col("a").alias("u"), F.col("b").alias("v")).union(
            e.select(F.col("b").alias("u"), F.col("a").alias("v"))
        )
        # large-star: v > u re-attaches to min(closed neighborhood)
        mins = (
            adj.groupBy("u")
            .agg(F.min("v").alias("_mn"))
            .select("u", F.least("_mn", "u").alias("m"))
        )
        ls = (
            adj.join(mins, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("a"), F.col("m").alias("b"))
        )
        e1 = canon(ls).localCheckpoint(eager=True)
        # small-star on the rewired set: every <=-neighbor (and u)
        # attaches to the minimum of that group
        adj1 = e1.select(F.col("a").alias("u"), F.col("b").alias("v")).union(
            e1.select(F.col("b").alias("u"), F.col("a").alias("v"))
        )
        small = adj1.where(F.col("v") <= F.col("u"))
        smins = small.groupBy("u").agg(F.min("v").alias("m"))
        ss = (
            small.join(smins, "u")
            .select(F.col("v").alias("a"), F.col("m").alias("b"))
            .union(smins.select(F.col("u").alias("a"), F.col("m").alias("b")))
        )
        e2 = canon(ss).localCheckpoint(eager=True)
        # both sides are DISTINCT canonical sets, so equality is
        # |e| == |e2| plus ONE empty anti-join — and the cheap count
        # comparison short-circuits the anti-join in every shrinking
        # round (non-final rounds almost always change the count)
        unchanged = (
            e2.count() == e.count()
            and e2.exceptAll(e).limit(1).count() == 0
        )
        e = e2
        if unchanged:
            break
    else:
        raise RuntimeError(
            f"connected_components(star) did not converge in {max_iter} rounds"
        )
    # star forest: each edge is (member, root); roots label themselves
    member = e.select(
        F.col("b").alias("node"), F.col("a").alias("label")
    ).union(e.select(F.col("a").alias("node"), F.col("b").alias("label")))
    labels = (
        nodes.join(
            member.groupBy("node").agg(F.min("label").alias("_l")),
            "node",
            "left",
        )
        .select(
            "node",
            F.least(
                F.col("node"), F.coalesce(F.col("_l"), F.col("node"))
            ).alias("label"),
        )
        .localCheckpoint(eager=True)
    )
    sizes = labels.groupBy("label").agg(
        F.count(F.lit(1)).alias("component_size")
    )
    return labels.join(sizes, "label").select(
        F.col("node"), F.col("label").alias("component"), "component_size"
    )


def _cc_driver(spark, tbl, schema_in) -> DataFrame:
    """Driver-side replay of :func:`connected_components` over the
    Arrow-collected raw pair list. ``factorize(sort=True)`` makes code
    order equal value order, so min-code = min-id and the final labels
    are exactly the distributed fixpoint's; pointer jumping compresses
    chains in O(log n) vectorized rounds. All-integer — output is
    hash-identical to the distributed path, not merely close.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    node_type = schema_in["u"].dataType
    schema = T.StructType(
        [
            T.StructField("node", node_type),
            T.StructField("component", node_type),
            T.StructField("component_size", T.LongType(), False),
        ]
    )
    pdf = tbl.to_pandas()
    if len(pdf) == 0:
        return spark.createDataFrame([], schema)
    codes, uniques = pd.factorize(
        pd.concat([pdf["u"], pdf["v"]], ignore_index=True), sort=True
    )
    us = codes[: len(pdf)].astype(np.int64)
    vs = codes[len(pdf):].astype(np.int64)
    m = len(uniques)
    label = np.arange(m, dtype=np.int64)
    while True:
        new = label.copy()
        np.minimum.at(new, us, label[vs])
        np.minimum.at(new, vs, label[us])
        while True:  # pointer jump to full compression
            jumped = new[new]
            if np.array_equal(jumped, new):
                break
            new = jumped
        if np.array_equal(new, label):
            break
        label = new
    sizes = np.bincount(label, minlength=m)
    names = pd.Index(uniques).tolist()  # python natives for createDataFrame
    out = [
        (names[i], names[label[i]], int(sizes[label[i]])) for i in range(m)
    ]
    return spark.createDataFrame(out, schema)


# past this many (distinct, symmetrized) edges the power iteration
# stays distributed — the autoBroadcastJoinThreshold idea applied to
# fixed-point iteration, same threshold discipline as HITS
_PAGERANK_DRIVER_MAX_EDGES = 2_000_000


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    *,
    damping: float = 0.85,
    iters: int = 3,
    undirected: bool = True,
    mode: str = "auto",
) -> DataFrame:
    """Distributed PageRank by power iteration → ``(node, rank)``.

    The importance companion to :func:`connected_components`
    (membership): which hubs dominate an interaction graph —
    customer↔supplier, doc↔near-dup-cluster, conv↔tool. Exact power
    iteration, fixed ``iters`` (the oracle unrolls the same rounds;
    convergence-to-epsilon is a caller loop over this function).

    Each round is the canonical two-shuffle dataflow:
    ranks ⋈ degrees on node (co-partitioned equi-join), contributions
    shipped along the edge join on ``src``, summed by ``dst``
    (map-side combined), teleport added from a broadcast 1-row node
    count. The degree table is node-sized — joined, never broadcast.
    ``undirected=True`` symmetrizes the edge list first, which also
    eliminates dangling-mass bookkeeping (every node has out-degree
    ≥ 1), so Σ rank = 1 holds each round.

    Iteration discipline (same as ``connected_components``): the edge
    and degree tables persist — every round joins them, and without
    the pin each round re-derives them from the source scan (measured
    44 scans / 72 exchanges at iters=3 on the shipped gate) — and
    each round's ranks are ``localCheckpoint``ed so the plan is one
    round deep instead of growing multiplicatively. This is the
    standard iterative-graph shape (GraphX/Pregel cache per
    superstep); at 100 TB the persists spill via MEMORY_AND_DISK
    rather than re-reading the corpus per round.

    Execution modes (equal outputs at the gate's 1e-9 rounding,
    pytest-asserted): ``mode="driver"`` Arrow-collects the RAW input
    edge list in ONE scan — no distributed symmetrize/distinct/count
    jobs at all (those shuffles were the measured cost, not the
    3-round iteration) — dedupes and symmetrizes vectorized in
    pandas, and replays the identical power iteration as numpy
    scatter-sums; every round's float sums agree with the distributed
    hash agg (and the SQL oracle's sequential sums) to ~1e-15
    relative, far inside the 1e-9 grid both gates round to.
    ``mode="distributed"`` keeps the two-shuffle dataflow above.
    ``mode="auto"`` (default) bounds the one collect with
    ``limit(max+1)`` (the collect IS the size probe, pre-dedup, so
    conservative) and picks driver when the input fits under
    ``_PAGERANK_DRIVER_MAX_EDGES`` — past it, distributed is the
    web-scale path, unchanged.
    """
    if mode not in ("auto", "driver", "distributed"):  # pragma: no cover
        raise ValueError(f"unknown mode {mode!r}")
    raw = edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d"))
    if mode != "distributed":
        max_rows = driver_replay_max_rows(
            edges.sparkSession, _PAGERANK_DRIVER_MAX_EDGES
        )
        probe = raw.limit(max_rows + 1) if mode == "auto" else raw
        tbl = probe.toArrow()
        if mode == "driver" or tbl.num_rows <= max_rows:
            return _pagerank_driver(
                edges.sparkSession,
                tbl,
                raw.schema,
                float(damping),
                int(iters),
                undirected,
            )
    e = raw
    if undirected:
        e = e.unionAll(
            edges.select(F.col(dst).alias("_s"), F.col(src).alias("_d"))
        )
    e = e.distinct().persist()
    deg = e.groupBy("_s").agg(F.count(F.lit(1)).alias("_deg")).persist()
    n_total = deg.agg(F.count(F.lit(1)).alias("_n"))
    ranks = deg.select("_s").crossJoin(F.broadcast(n_total)).select(
        F.col("_s").alias("node"), (F.lit(1.0) / F.col("_n")).alias("rank")
    )
    d = float(damping)
    for _ in range(int(iters)):
        outflow = ranks.join(
            deg.select(F.col("_s").alias("node"), "_deg"), "node"
        ).select(
            F.col("node").alias("_s"),
            (F.col("rank") / F.col("_deg")).alias("_share"),
        )
        inflow = (
            e.join(outflow, "_s")
            .groupBy("_d")
            .agg(F.sum("_share").alias("_in"))
        )
        ranks = inflow.crossJoin(F.broadcast(n_total)).select(
            F.col("_d").alias("node"),
            ((1.0 - d) / F.col("_n") + d * F.col("_in")).alias("rank"),
        ).localCheckpoint(eager=True)
    return ranks


def _pagerank_driver(
    spark,
    tbl,
    schema_in,
    damping: float,
    iters: int,
    undirected: bool,
) -> DataFrame:
    """Driver-side replay of :func:`pagerank` over the RAW collected
    edge list (one Arrow scan — symmetrize and distinct happen here in
    pandas, not as distributed shuffles): numpy scatter-sums per
    round, edges iterated in sorted order (deterministic float sums).
    Semantics are join-for-join the distributed dataflow — out-degree
    over the distinct symmetrized list, uniform init over out-degree
    nodes, and the per-round presence rule (a node carries a rank
    after round t iff it received inflow in round t), so directed
    dropout matches too.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    node_type = schema_in["_s"].dataType
    schema = T.StructType(
        [
            T.StructField("node", node_type),
            T.StructField("rank", T.DoubleType()),
        ]
    )
    # Arrow transfer + vectorized factorize — a Row-object collect and
    # a per-edge Python loop cost more than the distributed iteration
    # they replace (measured at ~1M edges)
    pdf = tbl.to_pandas()
    if len(pdf) == 0:
        return spark.createDataFrame([], schema)
    if undirected:
        pdf = pd.concat(
            [pdf, pdf.rename(columns={"_s": "_d", "_d": "_s"})],
            ignore_index=True,
        )
    pdf = pdf.drop_duplicates(ignore_index=True)
    pdf = pdf.sort_values(["_s", "_d"], kind="mergesort", ignore_index=True)
    codes, uniques = pd.factorize(
        pd.concat([pdf["_s"], pdf["_d"]], ignore_index=True), sort=False
    )
    srcs = codes[: len(pdf)].astype(np.int64)
    dsts = codes[len(pdf):].astype(np.int64)
    m = len(uniques)
    deg = np.bincount(srcs, minlength=m).astype(np.float64)
    has_out = deg > 0
    n = int(has_out.sum())
    rank = np.where(has_out, 1.0 / n, 0.0)
    present = has_out.copy()
    d = float(damping)
    for _ in range(int(iters)):
        ok = present & has_out
        share = np.zeros(m)
        share[ok] = rank[ok] / deg[ok]
        mask = ok[srcs]
        inflow = np.zeros(m)
        np.add.at(inflow, dsts[mask], share[srcs[mask]])
        present = np.zeros(m, dtype=bool)
        present[dsts[mask]] = True
        rank = (1.0 - d) / n + d * inflow
    names = pd.Index(uniques).tolist()  # python natives for createDataFrame
    out = [(names[i], float(rank[i])) for i in np.flatnonzero(present)]
    return spark.createDataFrame(out, schema)


def triangle_stats(
    edges: DataFrame, src: str = "doc_a", dst: str = "doc_b"
) -> DataFrame:
    """Triangle census of an undirected graph → ONE summary row
    ``(n_nodes, n_edges, n_triangles, n_wedges, global_clustering)``
    where ``global_clustering = 3·triangles / wedges`` (the standard
    transitivity ratio; 0.0 when the graph has no wedges).

    Near-dup pair graphs (MinHash-LSH / embedding buckets) and term
    co-occurrence graphs are where this runs: transitivity close to
    1 means LSH pairs form clean cliques (safe to collapse via
    ``connected_components``); low transitivity means chains —
    collapsing would over-merge, so tighten the similarity threshold
    first. The audit to run BEFORE trusting transitive dedup.

    Scale shape — degree-ordered wedge counting (the MapReduce
    triangle standard, Suri & Vassilvitskii 2011): every edge is
    re-oriented from the endpoint with smaller ``(degree, id)`` to
    the larger, so wedges are generated only at their lowest-degree
    vertex; out-degree is then bounded by O(√m) on any graph, which
    caps the wedge self-join fan-out that a naive id-ordering hits
    on star graphs (one celebrity node = quadratic wedges). Three
    hash joins total (wedge build + closing-edge probe), all keyed
    partitions, no broadcast assumption on the edge list itself.
    Each triangle is counted exactly once (its unique degree-minimal
    vertex generates the wedge; the probe matches the closing edge
    in canonical orientation).
    """
    und = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .where(F.col("a") != F.col("b"))
        .select(F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b"))
        .distinct()
        # und is referenced by degrees, orientation, the closing-edge
        # probe, and the edge count; deg by four join probes; oriented
        # by three. Without cutting lineage each reference re-derives
        # the whole upstream (the LSH/co-occurrence pair join!) — the
        # composed plan re-scans the corpus >100×. localCheckpoint
        # materializes each once (same discipline as the component
        # iterations above).
        .localCheckpoint(eager=False)
    )
    sym = und.unionAll(und.select(F.col("b").alias("a"), F.col("a").alias("b")))
    deg = (
        sym.groupBy("a")
        .agg(F.count(F.lit(1)).alias("deg"))
        .withColumnRenamed("a", "node")
        .localCheckpoint(eager=False)
    )

    # orient every edge from the (degree, id)-smaller endpoint to the larger
    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("deg_b"))
    ranked = und.join(da, "a").join(db, "b")
    lo_first = (F.col("deg_a") < F.col("deg_b")) | (
        (F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))
    )
    oriented = ranked.select(
        F.when(lo_first, F.col("a")).otherwise(F.col("b")).alias("lo"),
        F.when(lo_first, F.col("b")).otherwise(F.col("a")).alias("hi"),
    ).localCheckpoint(eager=False)

    # wedges at the low vertex: (lo -> u), (lo -> v) with u before v in
    # the same (degree, id) order; triangle iff oriented edge u -> v exists
    e1 = oriented.select(F.col("lo").alias("pivot"), F.col("hi").alias("u"))
    e2 = oriented.select(F.col("lo").alias("pivot"), F.col("hi").alias("v"))
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("deg_u"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("deg_v"))
    wedges = (
        e1.join(e2, "pivot")
        .join(du, "u")
        .join(dv, "v")
        .where(
            (F.col("deg_u") < F.col("deg_v"))
            | ((F.col("deg_u") == F.col("deg_v")) & (F.col("u") < F.col("v")))
        )
        .select("u", F.col("v").alias("w_v"))
    )
    closing = oriented.select(F.col("lo").alias("u"), F.col("hi").alias("w_v"))
    tri = wedges.join(closing, ["u", "w_v"]).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_triangles")
    )

    # open-wedge total from degrees: Σ deg·(deg−1)/2 (orientation-free)
    summary = deg.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
        # COALESCE: SUM over an EMPTY edge set is NULL, but the census
        # must report 0 wedges (the oracle coalesces identically)
        (F.coalesce(F.sum(F.col("deg") * (F.col("deg") - 1)), F.lit(0)) / 2)
        .cast("bigint")
        .alias("n_wedges"),
    )
    n_edges = und.agg(F.count(F.lit(1)).cast("bigint").alias("n_edges"))
    return (
        summary.crossJoin(F.broadcast(n_edges))
        .crossJoin(F.broadcast(tri))
        .select(
            "n_nodes",
            "n_edges",
            "n_triangles",
            "n_wedges",
            F.round(
                F.when(
                    F.col("n_wedges") > 0,
                    F.lit(3.0) * F.col("n_triangles") / F.col("n_wedges"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("global_clustering"),
        )
    )


def duplication_weights(
    docs: DataFrame,
    assignments: DataFrame,
    *,
    id_col: str = "doc_id",
    node_col: str = "node",
    component_col: str = "component",
    size_col: str = "component_size",
    broadcast_assignments: bool = True,
) -> DataFrame:
    """Duplicate-aware sampling weight for EVERY corpus doc →
    ``(doc_id, component, cluster_size, weight)`` with
    ``weight = 1 / cluster_size`` (round 6).

    The soft alternative to :func:`select_canonical`'s hard drop:
    instead of deleting near-dups, downweight each cluster member so
    the cluster contributes ONE doc's worth of probability mass to
    the training mixture — repeated content stops dominating the
    sample without discarding the variation between near-dup copies.
    Docs outside every cluster are singletons: ``component = own id``,
    ``cluster_size = 1``, ``weight = 1``.

    Shape: one LEFT equi-join of the corpus id projection against the
    cluster assignments; weights are pure column algebra post-join,
    no window, no driver collect. The assignments side comes out of
    the components fixpoint as an RDD-backed frame with NO size
    stats, so Catalyst cannot pick broadcast on its own —
    ``broadcast_assignments=True`` (default) hints it explicitly and
    the corpus side never shuffles. Set it False when the near-dup
    subset is itself too big to broadcast (then the join shuffles
    both sides on doc id, which is the correct scale fallback).
    """
    a = assignments.select(
        F.col(node_col).alias(id_col),
        F.col(component_col).alias("_comp"),
        F.col(size_col).alias("_size"),
    )
    if broadcast_assignments:
        a = F.broadcast(a)
    return (
        docs.select(id_col)
        .join(a, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("_comp"), F.col(id_col)).alias("component"),
            F.coalesce(F.col("_size"), F.lit(1)).cast("bigint").alias("cluster_size"),
            F.round(
                F.lit(1.0) / F.coalesce(F.col("_size"), F.lit(1)).cast("double"), 6
            ).alias("weight"),
        )
    )


def select_canonical(
    assignments: DataFrame,
    scores: DataFrame,
    *,
    node_col: str = "node",
    component_col: str = "component",
    id_col: str = "doc_id",
    score_col: str = "score",
) -> DataFrame:
    """Collapse near-dup clusters to their best representative: given
    cluster ``assignments`` (from :func:`connected_components`) and a
    per-doc quality ``score``, pick one canonical doc per cluster →
    ``(component, canonical_id, n_members, n_removed)``. The final
    step of the dedup pipeline (detect pairs → cluster transitively →
    KEEP-BEST collapse), generalizing the reference's keep-first
    ``GROUP BY`` upsert (`sql/02_create_core_tables.sql:107-117`) from
    arrival order to an explicit quality policy.

    Ties break toward the LARGER doc id (``max_by`` on
    ``struct(score, id)``) — deterministic under any partitioning.

    Shape: one equi-join keyed by doc id (scores side is the corpus
    projection — Catalyst picks broadcast vs shuffle by size) and ONE
    algebraic ``max_by`` aggregate per component: map-side partials,
    no window sort of the membership table.
    """
    sc = scores.select(
        F.col(id_col).alias(node_col), F.col(score_col).alias("_score")
    )
    return (
        assignments.select(node_col, component_col)
        .join(sc, node_col)
        .groupBy(component_col)
        .agg(
            F.max_by(
                F.col(node_col), F.struct(F.col("_score"), F.col(node_col))
            ).alias("canonical_id"),
            F.count(F.lit(1)).cast("bigint").alias("n_members"),
        )
        .withColumn("n_removed", (F.col("n_members") - 1).cast("bigint"))
    )


def effective_sample_size(weighted_docs: DataFrame) -> DataFrame:
    """Effective sample size of the duplication-weighted corpus — the
    scalar that says what soft dedup actually bought: for weights
    ``1/cluster_size``, ``ESS = (Σw)²/Σw²``, which collapses to
    ``C² / Σ_k m_k/k`` over the cluster-size histogram (C = number of
    clusters, m_k = clusters of size k). Cauchy-Schwarz pins
    C ≤ ESS ≤ N (ESS = C iff all clusters share one size; ESS = N iff
    no duplication) — so ``ess / n_docs`` is the
    fraction of the corpus that is informationally distinct, and
    ``n_docs − ess`` is the mass hard dedup would have deleted and
    soft dedup merely down-weighted.

    Input: :func:`duplication_weights` output (needs only
    ``cluster_size``). Determinism: doc and cluster counts are exact
    longs (``m_k = n_docs_k / k`` is exact integer division); the one
    rational reduction ``Σ m_k/k`` runs over the size-ORDERED window
    of the bounded histogram (distinct cluster sizes), so the float
    order is pinned.

    Shape: ONE hash agg to the cluster-size histogram; everything
    after runs on ≤|distinct sizes| rows.
    """
    hist = weighted_docs.groupBy(F.col("cluster_size").alias("k")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs_k")
    )
    m_k = (F.col("n_docs_k") / F.col("k")).cast("long")
    w_ord = Window.orderBy("k").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    rows = hist.select(
        "k",
        "n_docs_k",
        m_k.alias("_m"),
        (m_k.cast("double") / F.col("k").cast("double")).alias("_inv"),
    )
    agg = rows.select(
        F.sum("n_docs_k").over(w_ord).cast("long").alias("n_docs"),
        F.sum("_m").over(w_ord).cast("long").alias("n_clusters"),
        F.sum("_inv").over(w_ord).alias("_inv_sum"),
    ).groupBy().agg(
        F.max("n_docs").alias("n_docs"),
        F.max("n_clusters").alias("n_clusters"),
        F.max("_inv_sum").alias("_inv_sum"),
    )
    c = F.col("n_clusters").cast("double")
    ess = c * c / F.col("_inv_sum")
    return agg.select(
        "n_docs",
        "n_clusters",
        F.round(ess, 6).alias("ess"),
        F.round(ess / F.col("n_docs").cast("double"), 6).alias("ess_ratio"),
        F.round(
            F.col("n_docs").cast("double") - ess, 6
        ).alias("redundant_mass"),
    )


def lsh_dbscan(
    emb: DataFrame,
    threshold: float = 0.35,
    min_pts: int = 3,
    bucket_bits: int | None = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_iter: int = 25,
) -> DataFrame:
    """Density-based clustering of embeddings (DBSCAN semantics with
    an LSH-bucketed ε-neighborhood): core points have ≥ ``min_pts``
    neighbors at cosine ≥ ``threshold`` (the point itself counted),
    clusters are connected components of the core-core graph, border
    points attach to the MINIMUM component id among their core
    neighbors (the deterministic stand-in for DBSCAN's order-dependent
    first-found assignment), everything else is noise (cluster −1).
    The clustering companion k-means can't be: no k, arbitrary
    shapes, explicit noise — the right tool for dup-blob discovery
    in embedding space.

    Scale shape: ε-neighbor pairs come from the sign-LSH bucket join
    (``dedup.embedding_cosine_pairs`` — never all-pairs; recall is
    measured by the `lsh_recall`-style eval family), degrees and
    border assignment are one hash agg each, and the component pass
    is the engine's hash-min label propagation with localCheckpoint
    lineage truncation. With bucketing the neighborhood graph is
    approximate-recall: a cluster split across buckets can fragment —
    the documented trade, tunable via ``bucket_bits``.

    Output: ``(vec_id, cluster, is_core, n_neighbors, cluster_size)``
    over the FULL input (noise rows carry cluster −1, size 0).
    """
    from kkbox_churn_prediction_spark.operators.dedup import (
        embedding_cosine_pairs,
    )

    pairs = (
        embedding_cosine_pairs(emb, vec_col, threshold, id_col, bucket_bits)
        .select("doc_a", "doc_b")
        .persist()
    )
    sym = pairs.union(
        pairs.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
    ).select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
    deg = sym.groupBy("u").agg(F.count(F.lit(1)).cast("long").alias("n_nb"))
    core = (
        deg.where(F.col("n_nb") >= int(min_pts) - 1)
        .select(F.col("u").alias("node"))
        .persist()
    )
    core_edges = (
        pairs.join(core.select(F.col("node").alias("doc_a")), "doc_a")
        .join(core.select(F.col("node").alias("doc_b")), "doc_b")
        .select("doc_a", "doc_b")
    )
    comp = connected_components(core_edges, max_iter=max_iter).select(
        "node", "component"
    )
    core_comp = core.join(comp, "node", "left").select(
        "node", F.coalesce("component", F.col("node")).alias("component")
    )
    border = (
        sym.join(
            core_comp.select(
                F.col("node").alias("v"), F.col("component").alias("_c")
            ),
            "v",
        )
        .join(core.select(F.col("node").alias("u")), "u", "left_anti")
        .groupBy("u")
        .agg(F.min("_c").alias("component"))
        .select(F.col("u").alias("node"), "component")
    )
    base = emb.select(F.col(id_col).alias("node"))
    lab = (
        base.join(
            core_comp.select("node", F.col("component").alias("_cc")), "node", "left"
        )
        .join(border.select("node", F.col("component").alias("_cb")), "node", "left")
        .join(deg.select(F.col("u").alias("node"), "n_nb"), "node", "left")
        .select(
            F.col("node").alias(id_col),
            F.coalesce(F.col("_cc"), F.col("_cb"), F.lit(-1))
            .cast("long")
            .alias("cluster"),
            F.when(F.col("_cc").isNotNull(), 1).otherwise(0).cast("int").alias(
                "is_core"
            ),
            F.coalesce("n_nb", F.lit(0)).cast("long").alias("n_neighbors"),
        )
    )
    sizes = (
        lab.where(F.col("cluster") != -1)
        .groupBy("cluster")
        .agg(F.count(F.lit(1)).cast("long").alias("cluster_size"))
    )
    return lab.join(sizes, "cluster", "left").select(
        id_col,
        "cluster",
        "is_core",
        "n_neighbors",
        F.coalesce("cluster_size", F.lit(0)).cast("long").alias("cluster_size"),
    )


def modularity(
    edges: DataFrame,
    membership: DataFrame,
    *,
    src: str = "doc_a",
    dst: str = "doc_b",
    node_col: str = "node",
    community_col: str = "community",
) -> DataFrame:
    """Newman modularity Q of a community partition on an undirected
    simple graph (one row per unordered edge): the standard "is this
    clustering better than chance" score for a dedup/similarity
    partition — Q = Σ_c [e_c/m − (d_c/2m)²].

    Exactness: with integer edge counts the whole score collapses to
    ONE integer expression over a common denominator,
    ``Q = (4m·Σe_c − Σd_c²) / (4m²)`` — exact BIGINT numerator, a
    single IEEE division, bit-identical on any engine and partition
    layout (no per-community float sum at all).

    Scale shape: two hash aggs (degrees, within-community edge
    counts) + two membership joins; the per-community table is never
    collected and the final reduce is a 1-row agg.
    """
    mem = membership.select(
        F.col(node_col).alias("_n"), F.col(community_col).alias("_c")
    )
    e = edges.select(F.col(src).alias("_u"), F.col(dst).alias("_v"))
    deg = (
        e.select(F.col("_u").alias("_n"))
        .unionAll(e.select(F.col("_v").alias("_n")))
        .groupBy("_n")
        .agg(F.count(F.lit(1)).cast("long").alias("_d"))
    )
    d_c = (
        deg.join(mem, "_n")
        .groupBy("_c")
        .agg(F.sum("_d").cast("long").alias("_dc"))
    )
    internal = (
        e.join(mem.select(F.col("_n").alias("_u"), F.col("_c").alias("_cu")), "_u")
        .join(mem.select(F.col("_n").alias("_v"), F.col("_c").alias("_cv")), "_v")
        .where(F.col("_cu") == F.col("_cv"))
        .groupBy(F.col("_cu").alias("_c"))
        .agg(F.count(F.lit(1)).cast("long").alias("_ec"))
    )
    per_c = d_c.join(internal, "_c", "left").select(
        "_c",
        "_dc",
        F.coalesce("_ec", F.lit(0)).cast("long").alias("_ec"),
    )
    m = e.agg(F.count(F.lit(1)).cast("long").alias("_m"))
    sums = per_c.agg(
        F.count(F.lit(1)).cast("long").alias("n_communities"),
        F.sum("_ec").cast("long").alias("_se"),
        F.sum(F.col("_dc") * F.col("_dc")).cast("long").alias("_sd2"),
    )
    nodes = deg.agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
    return (
        sums.crossJoin(F.broadcast(m))
        .crossJoin(F.broadcast(nodes))
        .select(
            "n_nodes",
            F.col("_m").alias("n_edges"),
            "n_communities",
            F.round(
                (
                    F.lit(4) * F.col("_m") * F.col("_se")
                    - F.col("_sd2")
                ).cast("double")
                / (F.lit(4) * F.col("_m") * F.col("_m")).cast("double"),
                6,
            ).alias("modularity"),
        )
    )


_KCORE_DRIVER_MAX_EDGES = 2_000_000


def k_core(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    *,
    k: int = 2,
    max_iter: int = 50,
    mode: str = "auto",
) -> DataFrame:
    """k-core decomposition: the maximal subgraph in which every node
    keeps degree >= k after iteratively peeling lower-degree nodes —
    the standard "dense backbone" extraction (Seidman 1983) that
    separates structurally-embedded dup clusters / trading hubs from
    peripheral one-off links. Output: ``(node, core_degree)`` for
    surviving nodes, where core_degree is the node's degree INSIDE the
    k-core (>= k by construction).

    Semantics: edges are symmetrized and de-duplicated (undirected
    simple graph, like :func:`connected_components`); peeling repeats
    until a fixpoint — each round removes every node whose current
    degree is < k, which can cascade (a chain peels end-in).

    Execution modes (exact integer output, hash-identical):
    ``mode="driver"`` Arrow-collects the pair list once and peels with
    numpy bincount rounds; ``mode="distributed"`` runs per-round
    degree agg + two LEFT SEMI joins with ``localCheckpoint`` lineage
    truncation (the connected-components discipline — one action per
    round); ``mode="auto"`` bounds the collect with limit(max+1) and
    picks driver under ``_KCORE_DRIVER_MAX_EDGES`` rows. Raises after
    ``max_iter`` distributed rounds without a fixpoint (peeling
    terminates in <= |V| rounds; a loud failure beats a truncated
    core).
    """
    if mode not in ("auto", "driver", "distributed"):  # pragma: no cover
        raise ValueError(f"unknown mode {mode!r}")
    spark = edges.sparkSession
    raw = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    if mode != "distributed":
        max_rows = driver_replay_max_rows(spark, _KCORE_DRIVER_MAX_EDGES)
        probe = raw.limit(max_rows + 1) if mode == "auto" else raw
        tbl = probe.toArrow()
        if mode == "driver" or tbl.num_rows <= max_rows:
            return _k_core_driver(spark, tbl, k)
    sym = (
        raw.union(raw.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .where(F.col("u") != F.col("v"))  # simple graph: drop self-loops
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_edges = sym.count()
    for _ in range(max_iter):
        deg = sym.groupBy("u").agg(F.count(F.lit(1)).alias("_d"))
        keep = deg.where(F.col("_d") >= k).select("u")
        nxt = (
            sym.join(keep, "u", "left_semi")
            .join(keep.withColumnRenamed("u", "v"), "v", "left_semi")
            .select("u", "v")
            .localCheckpoint(eager=True)
        )
        n_next = nxt.count()
        sym = nxt
        if n_next == n_edges:
            break
        n_edges = n_next
    else:
        raise RuntimeError(
            f"k_core did not converge in {max_iter} rounds"
        )
    return (
        sym.groupBy(F.col("u").alias("node"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("core_degree"))
        .orderBy("node")
    )


def _k_core_driver(spark, tbl, k: int) -> DataFrame:
    """Exact peel over the collected pair list: id-factorize both
    endpoint columns, symmetrize + dedup, then numpy bincount rounds
    until stable — integer degrees, so output is hash-identical to
    the distributed rounds (pytest-asserted)."""
    import numpy as np
    import pandas as pd

    # factorize both endpoint columns in one C-speed pass (the
    # _cc_driver discipline) — np.unique over object arrays is ~10x
    # slower at the 500k-edge scale this replay targets
    pdf = tbl.to_pandas()
    both = pd.concat(
        [pdf.iloc[:, 0], pdf.iloc[:, 1]], ignore_index=True
    )
    inv, names = pd.factorize(both, sort=True)
    n_edges_in = len(pdf)
    a = inv[:n_edges_in]
    b = inv[n_edges_in:]
    # undirected simple graph: canonical order + dedup, drop loops
    lo = np.minimum(a, b)
    hi = np.maximum(a, b)
    keep = lo != hi
    pairs = np.unique(np.stack([lo[keep], hi[keep]], axis=1), axis=0)
    n = len(names)
    alive_edge = np.ones(len(pairs), dtype=bool)
    while True:
        deg = np.bincount(pairs[alive_edge, 0], minlength=n) + np.bincount(
            pairs[alive_edge, 1], minlength=n
        )
        bad = deg < k
        drop = alive_edge & (bad[pairs[:, 0]] | bad[pairs[:, 1]])
        if not drop.any():
            break
        alive_edge &= ~drop
    deg = np.bincount(pairs[alive_edge, 0], minlength=n) + np.bincount(
        pairs[alive_edge, 1], minlength=n
    )
    rows = [
        (str(names[i]), int(deg[i])) for i in np.nonzero(deg >= k)[0]
    ]
    out = spark.createDataFrame(
        rows or [(None, None)], "node string, core_degree bigint"
    )
    if not rows:
        out = out.where(F.col("node").isNotNull())
    return out.orderBy("node")


def adamic_adar(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    *,
    k: int = 50,
    max_degree: int = 1000,
) -> DataFrame:
    """Adamic–Adar link prediction over an undirected graph: for
    node pairs NOT currently connected, score their affinity by the
    common-neighbor sum ``AA(u,v) = Σ_{w ∈ N(u)∩N(v)} 1/ln(deg w)``
    — rare shared neighbors count more than promiscuous hubs. The
    predictive complement to the descriptive graph family
    (:func:`pagerank` ranks nodes, :func:`triangle_stats` measures
    closure, this NOMINATES the edges closure will create next) —
    e.g. which customer–supplier trades the co-purchase graph
    implies but hasn't seen, or which near-dup cluster pairs LSH
    likely missed. Top-``k`` by score with deterministic (u, v)
    tiebreak; emits ``(u, v, n_common, score)``.

    Scale shape: the wedge build is the classic adjacency self-join
    on the CENTER node — cost Σ_w deg(w)², bounded by the
    ``max_degree`` hub cap (a 10^6-degree hub contributes 10^12
    wedges of near-zero 1/ln weight each; capping at 1000 drops
    only terms ≤ 1/ln(1000) ≈ 0.14 while removing the quadratic
    blowup — the shingle-frequency-cap discipline from the n-gram
    dedup family, mirrored in the oracle). Existing edges are
    removed with one LEFT ANTI join; everything is hash joins + one
    TakeOrdered.

    Determinism: per-center terms ``floor(10^9 / ln(deg_w))`` are
    integers (one fixed-shape double expression per DISTINCT degree
    value), summed exactly as longs — order-free; n_common is an
    exact count.
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).where(
        F.col(src) != F.col(dst)
    )
    und = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct()
    und = und.persist()
    deg = und.groupBy("a").agg(F.count(F.lit(1)).cast("long").alias("deg"))
    centers = deg.where((F.col("deg") >= 2) & (F.col("deg") <= max_degree)).select(
        F.col("a").alias("w"),
        F.floor(F.lit(1.0e9) / F.log(F.col("deg").cast("double")))
        .cast("long")
        .alias("term"),
    )
    adj = und.select(F.col("a").alias("w"), F.col("b").alias("n")).join(
        centers, "w"
    )
    left = adj.select("w", "term", F.col("n").alias("u"))
    right = adj.select("w", F.col("n").alias("v"))
    wedges = left.join(right, "w").where(F.col("u") < F.col("v"))
    scored = wedges.groupBy("u", "v").agg(
        F.count(F.lit(1)).cast("long").alias("n_common"),
        F.sum("term").cast("long").alias("_s"),
    )
    cand = scored.join(
        und.select(F.col("a").alias("u"), F.col("b").alias("v")),
        ["u", "v"],
        "left_anti",
    )
    out = (
        cand.orderBy(F.desc("_s"), "u", "v")
        .limit(int(k))
        .select(
            "u",
            "v",
            "n_common",
            F.round(F.col("_s").cast("double") / 1.0e9, 6).alias("score"),
        )
    )
    out = out.localCheckpoint(eager=True)
    und.unpersist()
    return out
