"""Streaming point-in-time enrichment — the flagship as-of semantic
(``operators/asof.py``: features from STRICTLY-PRIOR turns, reference
leak guard ``features/features_comprehensive.sql:48-49``) in
Structured Streaming form: every arriving turn is emitted immediately
with its strictly-prior depth and recency —

- ``n_prior``:            count of same-conversation turns with
                          strictly earlier event time,
- ``micros_since_prior``: gap to the latest strictly-earlier turn
                          (NULL on a conversation's first event time).

Both are TIE-SAFE by construction: turns sharing an event time are
not "prior" to each other, so the result is independent of
arrival/processing order among ties — the same discipline that makes
the stateful sessionizer's bounds tie-invariant, required here
because a stream has no ``row_number`` to break ties with.

State per conversation is one fixed-width tuple
``(n_lt, n_eq, last_us, prev_us)``: how many turns sit strictly below
/ exactly at the latest seen event time, plus the latest and
second-latest DISTINCT event times. O(#live conversations), constant
per key — the smallest state that answers both questions across
micro-batch boundaries.

Robustness contract (mirrors ``streaming/stateful.py``):

- **Cross-batch out-of-order**: a turn older than the carried
  ``last_us`` gets depth = all seen turns strictly below the clock
  (turns AT the clock correctly excluded via the ``n_eq`` split) —
  an overcount only when other seen turns lie strictly between the
  late turn and the clock — and recency from the carried
  second-latest distinct time, which is event-time exact under
  single-step disorder. The state clock never moves backward. With
  the default watermark wiring, disorder deeper than the delay is
  dropped upstream by ``withWatermark``, so divergence from the
  batch oracle is bounded by the watermark.
- **Idle-state reclamation**: default wiring applies
  ``withWatermark + EventTimeTimeout``; a conversation idle past the
  delay has its state entry REMOVED (enrichment is stateless-per-row
  at emit time, so nothing needs flushing — the timeout only
  reclaims). ``watermark_delay=None`` = bounded-replay/test mode.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Any, Iterable, Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql.streaming.state import GroupState

OUT_SCHEMA = (
    "conv_id string, ts timestamp, n_prior long, micros_since_prior long"
)
STATE_SCHEMA = "n_lt long, n_eq long, last_us long, prev_us long"
_ABSENT = -1  # sentinel for "no such timestamp yet" (state is non-null longs)


def _enrich_frame(
    conv_id: Any, ts_us: np.ndarray, n_prior: np.ndarray, gap: "pd.array"
) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "conv_id": conv_id,
            "ts": pd.Series(ts_us, dtype="int64").astype("datetime64[us]"),
            "n_prior": pd.Series(n_prior, dtype="int64"),
            "micros_since_prior": pd.array(gap, dtype="Int64"),
        }
    )


def _asof_depth(
    key: tuple[Any, ...],
    pdf_iter: Iterable[pd.DataFrame],
    state: "GroupState",
    use_timeout: bool = False,
) -> Iterator[pd.DataFrame]:
    conv_id = key[0]

    if getattr(state, "hasTimedOut", False):
        # idle conversation: nothing to flush (per-row emission is
        # immediate) — just reclaim the state entry
        if state.exists:
            state.remove()
        yield _enrich_frame(conv_id, np.array([], dtype="int64"), np.array([], dtype="int64"), [])
        return

    parts = [pdf["ts"] for pdf in pdf_iter]
    if not parts:
        yield _enrich_frame(conv_id, np.array([], dtype="int64"), np.array([], dtype="int64"), [])
        return
    raw = pd.concat(parts).astype("datetime64[us]").astype("int64").to_numpy()
    if len(raw) == 0:
        yield _enrich_frame(conv_id, np.array([], dtype="int64"), np.array([], dtype="int64"), [])
        return
    order = np.argsort(raw, kind="stable")
    arr = raw[order]

    if state.exists:
        n_lt, n_eq, last_us, prev_us = state.get
    else:
        n_lt, n_eq, last_us, prev_us = 0, 0, _ABSENT, _ABSENT

    # vectorized per-row features over the batch-sorted array
    left = np.searchsorted(arr, arr, side="left")  # in-batch strict-prior
    gt = arr > last_us
    # rows AT the clock (arr == last_us) take neither n_eq (their
    # equal-ts peers are not prior) nor the gt branch — the n_eq
    # split is exactly what keeps cross-batch ties correct
    n_prior = n_lt + left + np.where(gt, n_eq, 0)

    # recency: largest strictly-smaller among (batch, carried state)
    batch_prev = np.where(left > 0, arr[np.maximum(left - 1, 0)], _ABSENT)
    state_prev = np.where(gt, last_us, prev_us)
    state_prev = np.where(
        (state_prev != _ABSENT) & (state_prev < arr), state_prev, _ABSENT
    )
    prior_ts = np.maximum(batch_prev, state_prev)
    gap = [
        (int(t) - int(p)) if p != _ABSENT else None
        for t, p in zip(arr, prior_ts)
    ]

    # state update relative to the new latest distinct event time
    batch_max = int(arr[-1])
    n_at_max = int(np.sum(arr == batch_max))
    below_max = arr[arr < batch_max]
    if last_us == _ABSENT or batch_max > last_us:
        new_last = batch_max
        new_n_lt = n_lt + n_eq + int(len(arr)) - n_at_max
        new_n_eq = n_at_max
        cand = int(below_max[-1]) if len(below_max) else _ABSENT
        new_prev = max(cand, last_us)
    elif batch_max == last_us:
        new_last = last_us
        new_n_lt = n_lt + int(len(arr)) - n_at_max
        new_n_eq = n_eq + n_at_max
        cand = int(below_max[-1]) if len(below_max) else _ABSENT
        new_prev = max(cand, prev_us)
    else:  # wholly-late batch: clock never moves backward
        new_last = last_us
        new_n_lt = n_lt + int(len(arr))
        new_n_eq = n_eq
        new_prev = max(batch_max, prev_us)
    state.update((new_n_lt, new_n_eq, new_last, new_prev))
    if use_timeout:
        # reclaim once the watermark passes the latest seen turn; must
        # stay ahead of the current watermark or Spark rejects it
        wm_ms = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max(new_last // 1000 + 1, wm_ms + 1))

    # emit in ARRIVAL order (undo the sort) — append-mode sinks don't
    # reorder, and downstream consumers see rows as they came
    inv = np.empty_like(order)
    inv[order] = np.arange(len(order))
    out = _enrich_frame(conv_id, arr, n_prior, gap)
    yield out.iloc[inv].reset_index(drop=True)


def stream_asof_depth(
    turns_stream: DataFrame,
    *,
    watermark_delay: str | None = "1 hour",
) -> DataFrame:
    """Per-turn strictly-prior depth + recency over a stream of
    ``(conv_id, ts)`` — see module docstring for semantics and the
    out-of-order / reclamation contract."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    use_timeout = watermark_delay is not None

    def fn(key, pdf_iter, state):
        return _asof_depth(key, pdf_iter, state, use_timeout)

    stream = turns_stream
    timeout = GroupStateTimeout.NoTimeout
    if use_timeout:
        stream = stream.withWatermark("ts", watermark_delay)
        timeout = GroupStateTimeout.EventTimeTimeout
    return stream.groupBy("conv_id").applyInPandasWithState(
        fn,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )
