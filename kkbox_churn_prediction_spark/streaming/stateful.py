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

Production notes: pair with an event-time watermark +
``GroupStateTimeout.EventTimeTimeout`` so idle conversations flush
and their state is reclaimed; here the test drives all data through
one availableNow batch and checks closed sessions against the batch
sessionizer (``operators.sessionize``), which is the engine's
batch/stream equivalence contract.
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


def _close_sessions(
    key: tuple[Any, ...],
    pdf_iter: Iterable[pd.DataFrame],
    state: "GroupState",
    gap_us: int,
) -> Iterator[pd.DataFrame]:
    conv_id = key[0]
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
        yield pd.DataFrame(columns=["conv_id", "session_start", "session_end", "n_turns"])
        return

    if state.exists:
        start_us, last_us, n_turns = state.get
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

    out = pd.DataFrame(closed, columns=["session_start", "session_end", "n_turns"])
    out["conv_id"] = conv_id
    out["session_start"] = out["session_start"].astype("datetime64[us]")
    out["session_end"] = out["session_end"].astype("datetime64[us]")
    yield out[["conv_id", "session_start", "session_end", "n_turns"]]


def stateful_closed_sessions(
    turns_stream: DataFrame, gap_seconds: int = 1800
) -> DataFrame:
    """Emit each closed session as soon as the closing turn arrives;
    hold the open session in per-key state. Gap boundary matches the
    batch sessionizer exactly (a gap of EXACTLY ``gap_seconds`` does
    not split)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    gap_us = int(gap_seconds) * 1_000_000

    def fn(key, pdf_iter, state):
        return _close_sessions(key, pdf_iter, state, gap_us)

    return turns_stream.groupBy("conv_id").applyInPandasWithState(
        fn,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
