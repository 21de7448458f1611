"""Session-configurable budget for the driver-replay fast paths.

Several bounded fixed-point operators (connected components,
pagerank, k-core, HITS, the prefix-sum rank engine) ship an
``auto``-mode optimization: when the REDUCED iterate (edge list /
distinct-value table) fits under a row budget, they collect it once
with Arrow and replay the identical integer fixed point driver-side
— one Spark job instead of ~n_iter join+agg rounds — with the
distributed iteration auto-selected above the budget and
replay-equals-distributed equality pytest-asserted. This is the
``spark.sql.autoBroadcastJoinThreshold`` idea applied to iteration.

Memory math behind the 2M-row default: a replay collects at most
``max_rows`` rows of 2–3 long columns — 2M edges × 2 × 8 B ≈ 32 MB
on the driver (Arrow, before Python object expansion the replays
never perform: they stay in numpy/pandas) — far under any sane
driver heap, and the probe is ``limit(max_rows + 1)`` so an
over-budget input never collects more than the budget either.

A 100×-scale operator can retune or disable the replays FLEET-WIDE
without code edits::

    spark.conf.set("spark.kkbox_churn.driverReplayMaxRows", "0")

``0`` forces every ``mode="auto"`` operator onto its distributed
path; a larger value widens the replay window on fat drivers. Unset,
each operator keeps its module constant (2M everywhere today).
"""

from __future__ import annotations

DRIVER_REPLAY_CONF = "spark.kkbox_churn.driverReplayMaxRows"
DRIVER_REPLAY_DEFAULT = 2_000_000


def driver_replay_max_rows(spark, default: int = DRIVER_REPLAY_DEFAULT) -> int:
    """The session's driver-replay row budget: the value of
    ``spark.kkbox_churn.driverReplayMaxRows`` if set, else
    ``default`` (each call site passes its module constant so
    per-operator defaults stay greppable next to the operator)."""
    v = spark.conf.get(DRIVER_REPLAY_CONF, None)
    return int(v) if v not in (None, "") else int(default)
