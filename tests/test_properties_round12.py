"""Algebraic invariants for the round-3 closing stats batch (VERDICT
r3 task #8): the event-study pre-trend detector and the pairwise KS
source matrix had goldens but no property round — the discipline that
caught the bootstrap and BPE shared-engine bugs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _units(spark, rows):
    return spark.createDataFrame(rows, "arm string, r int, y long")


def _event_rows(shift_t=0, effect=None):
    """(unit, period) panel: control mean 10+r, treated mean
    10+r+shift_t (+effect(r) for r>=0). Parallel trends by
    construction when effect is None."""
    rows = []
    for r in range(-4, 5):
        for i in range(6):
            rows.append(("c", r, 10 + r + i))  # control: trend + unit noise
            extra = (effect(r) if (effect and r >= 0) else 0)
            rows.append(("t", r, 10 + r + i + shift_t + extra))
    return rows


# ---------------------------------------------------------- event study
def test_event_study_zero_under_parallel_trends(spark):
    """Treated = control + constant (the DiD null with a level shift):
    every re-anchored coefficient must be exactly zero — pre AND post."""
    from kkbox_churn_prediction_spark.operators.abtest import event_study

    df = _units(spark, _event_rows(shift_t=3))
    out = event_study(df, "arm", "r", "y").collect()
    assert len(out) == 9
    assert all(row["coef"] == 0.0 for row in out)
    assert all(row["gap"] == 3.0 for row in out)


def test_event_study_shift_invariant_under_constant_outcome_shift(spark):
    """Adding a constant to EVERY outcome (both arms, all periods)
    changes neither gaps nor coefficients — the estimator is a
    difference of differences."""
    from kkbox_churn_prediction_spark.operators.abtest import event_study

    rows = _event_rows(shift_t=2, effect=lambda r: 5 * (r + 1))
    base = event_study(_units(spark, rows), "arm", "r", "y").collect()
    shifted_rows = [(a, r, y + 1000) for a, r, y in rows]
    shifted = event_study(_units(spark, shifted_rows), "arm", "r", "y").collect()
    for b, s in zip(base, shifted):
        assert b["rel_period"] == s["rel_period"]
        assert b["gap"] == s["gap"]
        assert b["coef"] == s["coef"]
    # and the dynamic path is recovered exactly: coef(r>=0) = 5(r+1),
    # coef(r<0) = 0 (anchor at r=-1 with clean pre-trends)
    for row in base:
        want = 5 * (row["rel_period"] + 1) if row["rel_period"] >= 0 else 0
        assert row["coef"] == float(want)


def test_event_study_anchor_coefficient_is_zero_by_construction(spark):
    """coef(anchor) = gap(anchor) - gap(anchor) = 0 whatever the data."""
    from kkbox_churn_prediction_spark.operators.abtest import event_study

    rows = [("t", r, (r * 17) % 23) for r in range(-4, 5) for _ in range(3)]
    rows += [("c", r, (r * 5) % 13) for r in range(-4, 5) for _ in range(2)]
    out = event_study(_units(spark, rows), "arm", "r", "y").collect()
    anchor = [row for row in out if row["rel_period"] == -1]
    assert anchor and anchor[0]["coef"] == 0.0


def test_event_study_treatment_relabel_negates_gaps(spark):
    """Swapping which arm counts as 'treated' negates every gap (and
    therefore every re-anchored coefficient)."""
    from kkbox_churn_prediction_spark.operators.abtest import event_study

    rows = _event_rows(shift_t=2, effect=lambda r: 3 * r)
    a = event_study(_units(spark, rows), "arm", "r", "y", treatment="t").collect()
    b = event_study(_units(spark, rows), "arm", "r", "y", treatment="c").collect()
    for ra, rb in zip(a, b):
        assert ra["rel_period"] == rb["rel_period"]
        assert ra["gap"] == -rb["gap"]
        assert ra["coef"] == -rb["coef"]


# ------------------------------------------------------- KS pair matrix
def _binned(spark, groups):
    """groups: {name: [count per bin]} -> one row per observation."""
    rows = []
    for g, counts in groups.items():
        for b, n in enumerate(counts):
            rows += [(g, b)] * n
    return spark.createDataFrame(rows, "src string, bin int")


def test_ks_matrix_identical_groups_have_zero_ks(spark):
    """The 'zero diagonal' invariant in pair form: two groups with the
    SAME distribution (any scale) have KS exactly 0."""
    from kkbox_churn_prediction_spark.operators.psi import ks_pair_matrix

    df = _binned(
        spark, {"a": [4, 1, 5, 2], "b": [8, 2, 10, 4], "c": [1, 1, 1, 9]}
    )
    out = {(r["group_a"], r["group_b"]): r["ks"] for r in
           ks_pair_matrix(df, "src", "bin").collect()}
    assert out[("a", "b")] == 0.0  # b = 2x a, same CDF
    assert out[("a", "c")] > 0.0 and out[("b", "c")] > 0.0


def test_ks_matrix_symmetric_under_group_relabel(spark):
    """KS(a,b) = KS(b,a): relabeling the groups so their sort order
    flips must leave every pair's statistic unchanged."""
    from kkbox_churn_prediction_spark.operators.psi import ks_pair_matrix

    dists = {"a": [7, 1, 2, 5], "b": [1, 6, 3, 2], "c": [2, 2, 8, 1]}
    base = {
        frozenset((r["group_a"], r["group_b"])): r["ks"]
        for r in ks_pair_matrix(_binned(spark, dists), "src", "bin").collect()
    }
    # reverse the label order: a->z, b->y, c->x (swaps every pair's
    # left/right role in the a < b join predicate)
    ren = {"a": "z", "b": "y", "c": "x"}
    back = {v: k for k, v in ren.items()}
    flipped = {
        frozenset({back[r["group_a"]], back[r["group_b"]]}): r["ks"]
        for r in ks_pair_matrix(
            _binned(spark, {ren[g]: c for g, c in dists.items()}), "src", "bin"
        ).collect()
    }
    assert base == flipped


def test_ks_matrix_invariant_under_monotone_bin_transform(spark):
    """KS depends only on the ORDER of bins: any strictly increasing
    transform of the bin ids leaves every statistic unchanged."""
    from kkbox_churn_prediction_spark.operators.psi import ks_pair_matrix

    dists = {"a": [7, 1, 2, 5], "b": [1, 6, 3, 2], "c": [2, 2, 8, 1]}
    df = _binned(spark, dists)
    base = sorted(
        (r["group_a"], r["group_b"], r["ks"])
        for r in ks_pair_matrix(df, "src", "bin").collect()
    )
    warped = df.select("src", (F.col("bin") * F.col("bin") * 10 + 3).alias("bin"))
    warp = sorted(
        (r["group_a"], r["group_b"], r["ks"])
        for r in ks_pair_matrix(warped, "src", "bin").collect()
    )
    assert base == warp


def test_ks_matrix_replication_invariance_and_bounds(spark):
    """Replicating one group k x leaves all its KS values unchanged
    (the statistic is CDF-valued), and every KS lies in [0, 1]."""
    from kkbox_churn_prediction_spark.operators.psi import ks_pair_matrix

    dists = {"a": [5, 0, 3, 2], "b": [0, 4, 0, 6]}
    one = ks_pair_matrix(_binned(spark, dists), "src", "bin").collect()
    rep = ks_pair_matrix(
        _binned(spark, {"a": [15, 0, 9, 6], "b": [0, 4, 0, 6]}), "src", "bin"
    ).collect()
    assert one[0]["ks"] == rep[0]["ks"]
    assert rep[0]["n_a"] == 3 * one[0]["n_a"]
    for r in one + rep:
        assert 0.0 <= r["ks"] <= 1.0


def test_ks_matrix_disjoint_supports_hit_one(spark):
    """Fully separated distributions attain the KS maximum of 1."""
    from kkbox_churn_prediction_spark.operators.psi import ks_pair_matrix

    out = ks_pair_matrix(
        _binned(spark, {"lo": [4, 6, 0, 0], "hi": [0, 0, 3, 7]}), "src", "bin"
    ).collect()
    assert out[0]["ks"] == 1.0


# -------------------------------------------- quality classifier
def _qm_docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


_QM_TEXTS = [
    "alpha beta gamma delta epsilon zeta eta theta",
    "one two three",
    "spark sql window join agg scan filter shuffle broadcast",
    "a b c d e f g h i j k l",
    "repeat repeat repeat repeat repeat repeat",
    "data quality filter classifier training corpus tokens here",
    "x y z",
    "lorem ipsum dolor sit amet consectetur adipiscing elit",
]


def _qm_label():
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.functions.text import (
        normalize_text,
        tokens,
    )

    return F.size(tokens(normalize_text(F.col("text")))) >= 5


def test_quality_fit_label_flip_negates_weights(spark):
    """Logistic symmetry: complementing the label negates every
    weight (up to the quantization grid — sigmoid(-z) and 1-sigmoid(z)
    differ by float round-off, which the 1e-9 grid absorbs)."""
    from kkbox_churn_prediction_spark.operators.quality_model import (
        hashed_doc_features,
        quality_classifier_fit,
    )

    docs = _qm_docs(spark, _QM_TEXTS)
    lab = _qm_label()
    pos = {
        r["feature"]: r["weight"]
        for r in quality_classifier_fit(
            hashed_doc_features(docs, lab), n_iter=8
        ).collect()
    }
    neg = {
        r["feature"]: r["weight"]
        for r in quality_classifier_fit(
            hashed_doc_features(docs, ~lab), n_iter=8
        ).collect()
    }
    for j in pos:
        assert pos[j] == pytest.approx(-neg[j], abs=1e-5), j


def test_quality_score_monotone_in_positive_bucket_mass(spark):
    """Adding more mass to a positively-weighted bucket (more copies
    of a word that hashes there) strictly raises the score, up to the
    count clip."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.operators.quality_model import (
        hashed_doc_features,
        quality_classifier_fit,
        quality_classifier_score,
    )

    docs = _qm_docs(spark, _QM_TEXTS)
    feats = hashed_doc_features(docs, _qm_label())
    fit = quality_classifier_fit(feats, n_iter=8)
    scored = quality_classifier_score(feats, fit)
    probs = {r["doc_id"]: r["quality_prob"] for r in scored.collect()}
    assert all(0.0 <= p <= 1.0 for p in probs.values())
    # the bias weight is positive here (majority-positive labels), so
    # a longer wordier doc generally scores higher than a 3-word one
    assert probs[2] > probs[6]  # 9 distinct words vs "x y z"


def test_quality_fit_duplication_with_scaled_ridge_is_exact(spark):
    """Duplicating the whole corpus k× while scaling the ridge by k
    reproduces the weight trajectory BIT-FOR-BIT: every per-doc zq/pq/
    hq is unchanged, the gradient and Hessian sums scale exactly by k
    (exact integers), and IEEE division of (kG)/(k(H+λ)) is correctly
    rounded to the same double as G/(H+λ) — so each step lands on the
    identical 1e-9 grid point. (With a FIXED ridge the weights drift
    toward the unregularized fit instead — that shrinkage is the
    regularizer working, not an invariance.)"""
    from kkbox_churn_prediction_spark.operators.quality_model import (
        hashed_doc_features,
        quality_classifier_fit,
    )

    lab = _qm_label()
    w1 = quality_classifier_fit(
        hashed_doc_features(_qm_docs(spark, _QM_TEXTS), lab),
        n_iter=8,
        ridge=1.0,
    ).collect()
    w3 = quality_classifier_fit(
        hashed_doc_features(_qm_docs(spark, _QM_TEXTS * 3), lab),
        n_iter=8,
        ridge=3.0,
    ).collect()
    assert [(r["feature"], r["weight"]) for r in w1] == [
        (r["feature"], r["weight"]) for r in w3
    ]
    # the duplicated run reports 3x the docs
    assert w3[0]["n_docs"] == 3 * w1[0]["n_docs"]
    assert w3[0]["n_pos"] == 3 * w1[0]["n_pos"]
