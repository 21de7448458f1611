"""Custom stateful streaming operator via ``applyInPandasWithState``.

``streaming.sessions`` covers what Spark's built-ins express
(``session_window`` + watermark). This module is the escape hatch the
north star's operator set needs when built-ins DON'T suffice: an
arbitrary per-key state machine over Arrow batches —
``applyInPandasWithState`` (Arrow-batched per GROUP, never per row;
the per-batch work is vectorized numpy on the sorted timestamp
array).

The demonstrator is a gap-based sessionizer with custom
emit-on-close semantics (emit each CLOSED session immediately; keep
exactly one open session per conversation in state across
micro-batches — something ``session_window`` cannot do in append mode
before the watermark passes). State is a single fixed-width tuple per
conversation, so the state store stays O(#live conversations)
regardless of turn volume.

Robustness contract (the parts real streams need):

- **Cross-batch out-of-order**: a row older than the carried
  ``last_us`` merges into the OPEN session (``start = min``,
  ``last`` never moves backward) instead of corrupting the state
  clock — so an emitted session always has ``session_end >=
  session_start`` regardless of arrival order. Rows older than the
  watermark were already dropped upstream by ``withWatermark``.
- **Idle-state reclamation**: the DEFAULT wiring applies
  ``withWatermark(ts, watermark_delay)`` + ``EventTimeTimeout``; when
  the watermark passes an open session's close boundary
  (``last + gap``) the session flushes as closed and its state is
  REMOVED — without this, one state entry per ever-seen conversation
  lives forever. Pass ``watermark_delay=None`` only for bounded
  replays/tests where the stream ends (batch/stream-equivalence tests
  drive this mode and compare against ``operators.sessionize``).
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Any, Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql.streaming.state import GroupState

OUT_SCHEMA = (
    "conv_id string, session_start timestamp, session_end timestamp, n_turns long"
)
# (session_start_us, last_ts_us, n_turns) of the one open session
STATE_SCHEMA = "start_us long, last_us long, n_turns long"


def _session_frame(rows: list[tuple[int, int, int]], conv_id: Any) -> pd.DataFrame:
    out = pd.DataFrame(rows, columns=["session_start", "session_end", "n_turns"])
    out["conv_id"] = conv_id
    out["session_start"] = out["session_start"].astype("datetime64[us]")
    out["session_end"] = out["session_end"].astype("datetime64[us]")
    return out[["conv_id", "session_start", "session_end", "n_turns"]]


def _close_sessions(
    key: tuple[Any, ...],
    pdf_iter: Iterable[pd.DataFrame],
    state: "GroupState",
    gap_us: int,
    use_timeout: bool = False,
) -> Iterator[pd.DataFrame]:
    conv_id = key[0]

    # EventTimeTimeout fired: the watermark passed this open session's
    # close boundary — flush it as closed and reclaim the state entry
    if getattr(state, "hasTimedOut", False):
        if state.exists:
            start_us, last_us, n_turns = state.get
            state.remove()
            yield _session_frame([(start_us, last_us, n_turns)], conv_id)
        else:  # pragma: no cover — defensive
            yield _session_frame([], conv_id)
        return

    # gather this micro-batch's turns for the key, sorted by event
    # time; a timeout invocation delivers NO batches for the key
    # (pd.concat would raise on an empty list)
    parts = [pdf["ts"] for pdf in pdf_iter]
    ts_us = (
        pd.concat(parts).astype("datetime64[us]").astype("int64").sort_values().to_numpy()
        if parts
        else pd.Series([], dtype="int64").to_numpy()
    )
    if len(ts_us) == 0:
        yield _session_frame([], conv_id)
        return

    if state.exists:
        start_us, last_us, n_turns = state.get
        # cross-batch stragglers (t <= carried last_us) merge into the
        # open session: count them, widen the start if needed, never
        # move last_us backward — otherwise a later turn could emit a
        # session with end < start
        stale = ts_us[ts_us <= last_us]
        if len(stale):
            n_turns += int(len(stale))
            start_us = min(start_us, int(stale[0]))
            ts_us = ts_us[ts_us > last_us]
    else:
        start_us, last_us, n_turns = int(ts_us[0]), int(ts_us[0]) - 1, 0

    closed: list[tuple[int, int, int]] = []
    for t in ts_us:  # per SESSION-BOUNDARY work; the heavy lifting
        t = int(t)  # (concat/sort above) is vectorized per batch
        if n_turns > 0 and t - last_us > gap_us:
            closed.append((start_us, last_us, n_turns))
            start_us, n_turns = t, 0
        last_us, n_turns = t, n_turns + 1
    state.update((start_us, last_us, n_turns))
    if use_timeout:
        # flush when the watermark passes last + gap; must stay ahead
        # of the current watermark or Spark rejects the timestamp
        timeout_ms = (last_us + gap_us) // 1000 + 1
        wm_ms = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max(timeout_ms, wm_ms + 1))

    yield _session_frame(closed, conv_id)


def stateful_closed_sessions(
    turns_stream: DataFrame,
    gap_seconds: int = 1800,
    watermark_delay: str | None = "10 minutes",
) -> DataFrame:
    """Emit each closed session as soon as the closing turn arrives;
    hold the open session in per-key state. Gap boundary matches the
    batch sessionizer exactly (a gap of EXACTLY ``gap_seconds`` does
    not split).

    Default wiring is production-shaped: ``withWatermark(ts,
    watermark_delay)`` bounds how late a turn may arrive AND drives
    ``EventTimeTimeout`` — an open session whose close boundary
    (``last + gap``) falls behind the watermark is flushed as closed
    and its state entry reclaimed (idle conversations don't leak
    state). ``watermark_delay=None`` disables both (NoTimeout):
    closed sessions then come only from observed closing turns —
    bounded-replay/test mode.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    gap_us = int(gap_seconds) * 1_000_000
    use_timeout = watermark_delay is not None

    def fn(key, pdf_iter, state):
        return _close_sessions(key, pdf_iter, state, gap_us, use_timeout)

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
