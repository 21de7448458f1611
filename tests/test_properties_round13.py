"""Property round 13 (VERDICT r4 task #6): the Kiveris star
connected-components and the FULL-outer range join get the same
algebraic-invariant treatment as the rest of the engine — the
discipline that caught the bootstrap/BPE/trim shared-engine bugs.

Star CC: component PARTITIONS (which nodes group together) must be
invariant under edge-direction flips, duplicate edges, and random
vertex relabeling, and must equal hashmin's and doubling's output on
seeded random graphs — all three run in distributed mode so the star
rewiring itself is exercised, not the driver replay.

Full join: per seed, the row algebra ``full = inner + u_nulls +
a_nulls`` against an independent pure-Python pairing reference.
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

ALGOS = ("hashmin", "doubling", "star")


def _rand_edges(seed: int, n: int = 60, m: int = 70):
    r = random.Random(seed)
    return [(r.randrange(n), r.randrange(n)) for _ in range(m)]


def _edges_df(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "doc_a long, doc_b long"
    )


def _groups(rows):
    """Partition structure: frozenset of frozensets of member nodes."""
    by_comp = {}
    for row in rows:
        by_comp.setdefault(row["component"], set()).add(row["node"])
    return frozenset(frozenset(s) for s in by_comp.values())


def _cc(spark, pairs, algorithm):
    from kkbox_churn_prediction_spark.operators.components import (
        connected_components,
    )

    return connected_components(
        _edges_df(spark, pairs),
        algorithm=algorithm,
        mode="distributed",
        max_iter=40,
    ).collect()


@pytest.mark.parametrize("seed", [3, 17, 4242])
def test_star_equals_hashmin_and_doubling(spark, seed):
    pairs = _rand_edges(seed)
    ref = None
    for algo in ALGOS:
        rows = _cc(spark, pairs, algo)
        # component id is the min member; size matches the group
        by_comp = {}
        for row in rows:
            by_comp.setdefault(row["component"], []).append(row)
        for comp, members in by_comp.items():
            assert comp == min(r["node"] for r in members)
            assert all(r["component_size"] == len(members) for r in members)
        key = sorted((r["node"], r["component"]) for r in rows)
        if ref is None:
            ref = key
        else:
            assert key == ref, f"{algo} disagrees on seed {seed}"


@pytest.mark.parametrize("seed", [11, 99])
def test_star_direction_and_duplicate_invariance(spark, seed):
    r = random.Random(seed)
    pairs = _rand_edges(seed)
    flipped = [(b, a) if r.random() < 0.5 else (a, b) for a, b in pairs]
    dup = flipped + [flipped[i % len(flipped)] for i in range(25)]
    base = sorted(
        (row["node"], row["component"]) for row in _cc(spark, pairs, "star")
    )
    for variant in (flipped, dup):
        got = sorted(
            (row["node"], row["component"])
            for row in _cc(spark, variant, "star")
        )
        assert got == base


@pytest.mark.parametrize("seed", [5, 23])
def test_star_vertex_relabeling_invariance(spark, seed):
    """Relabel nodes by a random permutation pi: the component
    PARTITION must map through pi exactly (ids change — they are min
    labels — but who-groups-with-whom cannot)."""
    r = random.Random(seed)
    pairs = _rand_edges(seed)
    nodes = sorted({x for p in pairs for x in p})
    perm = list(nodes)
    r.shuffle(perm)
    pi = dict(zip(nodes, perm))
    relabeled = [(pi[a], pi[b]) for a, b in pairs]
    base = _groups(_cc(spark, pairs, "star"))
    mapped_back = frozenset(
        frozenset(inv[x] for x in g)
        for inv in [{v: k for k, v in pi.items()}]
        for g in _groups(_cc(spark, relabeled, "star"))
    )
    assert mapped_back == base


def test_star_adversarial_permutation_converges(spark):
    """The a -> 31a+7 mod n permutation graph that measured 41-80
    doubling rounds: star must close it within its O(log^2 n) budget
    (max_iter=40 would raise otherwise) and match an independent
    pure-Python union-find (the permutation splits into cycles of
    the multiplicative order of 31 mod 211 — NOT one component)."""
    n = 211
    pairs = [(a, (31 * a + 7) % n) for a in range(n)]
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = sorted((i, find(i)) for i in range(n))
    star = sorted(
        (r["node"], r["component"]) for r in _cc(spark, pairs, "star")
    )
    assert star == want


# ---------------------------------------------------------- full join
def _turns_rows(seed: int, n_conv: int = 6, n_turns: int = 40):
    r = random.Random(seed)
    base = datetime(2024, 3, 1)
    rows = []
    for i in range(n_turns):
        rows.append((
            f"c{r.randrange(n_conv)}",
            i,
            r.choice(["user", "assistant", "assistant", "system"]),
            base + timedelta(minutes=r.randrange(0, 600)),
        ))
    return rows


def _py_full_join(rows, horizon_s=7200):
    """Independent reference: all (u, a) same-conv pairs with
    a_ts in (u_ts, u_ts + horizon]; unmatched of both sides."""
    users = [r for r in rows if r[2] == "user"]
    assts = [r for r in rows if r[2] == "assistant"]
    inner, matched_u, matched_a = [], set(), set()
    for uc, ui, _, uts in users:
        for ac, ai, _, ats in assts:
            if uc == ac and uts < ats <= uts + timedelta(seconds=horizon_s):
                inner.append((uc, ui, ai))
                matched_u.add((uc, ui))
                matched_a.add((ac, ai))
    u_nulls = [(c, i) for c, i, _, _ in users if (c, i) not in matched_u]
    a_nulls = [(c, i) for c, i, _, _ in assts if (c, i) not in matched_a]
    return inner, u_nulls, a_nulls


@pytest.mark.parametrize("seed", [2, 31, 777])
def test_full_join_row_algebra(spark, seed):
    """full = inner + u_nulls + a_nulls, with the matched/orphan
    flags partitioning the rows exactly — on a bounded batch frame
    (the streaming path equals this by the gate's flush contract)."""
    from kkbox_churn_prediction_spark.streaming.joins import (
        stream_full_pairs,
        stream_left_pairs,
    )

    rows = _turns_rows(seed)
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, ts timestamp"
    )
    inner, u_nulls, a_nulls = _py_full_join(rows)

    full = stream_full_pairs(df, horizon="2 hours").collect()
    assert len(full) == len(inner) + len(u_nulls) + len(a_nulls)

    got_inner = sorted(
        (r["conv_id"], r["u_idx"], r["a_idx"])
        for r in full
        if r["answered"] == 1
    )
    assert got_inner == sorted(inner)
    got_u = sorted(
        (r["conv_id"], r["u_idx"])
        for r in full
        if r["answered"] == 0 and r["orphan"] == 0
    )
    assert got_u == sorted(u_nulls)
    got_a = sorted(
        (r["conv_id"], r["a_idx"])
        for r in full
        if r["orphan"] == 1
    )
    assert got_a == sorted(a_nulls)
    # flags partition the output: answered+orphan never both set,
    # orphan rows carry NULL u_idx, unanswered rows NULL a_idx
    for r in full:
        assert not (r["answered"] == 1 and r["orphan"] == 1)
        if r["orphan"] == 1:
            assert r["u_idx"] is None
        if r["answered"] == 0 and r["orphan"] == 0:
            assert r["a_idx"] is None

    # left join = the full join minus orphan rows
    left = stream_left_pairs(df, horizon="2 hours").collect()
    assert len(left) == len(inner) + len(u_nulls)
