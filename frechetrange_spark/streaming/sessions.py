"""Custom stateful streaming: gap-based sessionization with
``applyInPandasWithState`` (the north-rule's custom stateful operator —
the streaming twin of operators/events.sessionize beyond what
F.session_window can express, since it carries an explicit per-user open
session across micro-batches and re-emits it as it grows).

Contract: UPDATE-mode output — every micro-batch emits, per (user_id,
session_id) it touched, the session's CURRENT aggregate. The latest
update per key equals the batch sessionize row once the stream drains
(tested with multi-file micro-batches). Session ids are 1-based per user
in event-time order, exactly like the batch operator.

Out-of-order events (bounded lateness): events need NOT arrive in
event-time order across micro-batches. Per user, GroupState holds a
buffer of not-yet-final events plus the fold state of everything already
finalized; each batch advances a per-user event-time frontier
``max_seen - lateness_sec`` and

- FINALIZES buffered events at or below the frontier (folded, in
  (ts, event_id) order, into the running session state — these can never
  be reordered again),
- keeps newer events buffered and emits a PROVISIONAL view (finalized
  fold extended by the sorted buffer), re-emitted as the buffer evolves,
- DROPS events arriving strictly below the frontier (too late — the
  standard watermark contract; correctness is guaranteed only for
  disorder within ``lateness_sec``), and
- emits a tombstone (``n_events = 0``) for any previously-emitted
  session id that disappears when a late event bridges two provisional
  sessions into one (consumers keep the latest row per key and drop
  ``n_events = 0``).

``lateness_sec=0`` reproduces strict in-order semantics (everything
finalizes immediately; cross-batch stragglers are dropped instead of
silently mis-folded). State stays bounded: the buffer only holds events
within ``lateness_sec`` of the per-user max event time.

Checkpoint compatibility: the lateness buffer widened STATE_SCHEMA from
5 to 10 fields, so a streaming query checkpointed under the pre-buffer
schema cannot restart against this version (Spark's state-store schema
check rejects it). There is no migration path — discard the old
checkpoint and replay, or re-derive state by running the batch
``operators.events.sessionize`` up to the stream's resume point.
"""

from __future__ import annotations

from typing import Any, Callable, Iterator, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_GAP_SEC = 1800

OUTPUT_SCHEMA = (
    "user_id long, session_id long, n_events long, "
    "start_sec double, end_sec double, value_cents long"
)
STATE_SCHEMA = (
    "session_id long, start_sec double, last_sec double, "
    "n_events long, value_cents long, max_seen double, emitted_max long, "
    "buf_secs array<double>, buf_eids array<long>, buf_cents array<long>"
)

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)

_NEG_INF = float("-inf")


def _cents(values: np.ndarray) -> np.ndarray:
    # HALF_UP like Spark's round() (values are non-negative prices)
    return np.floor(values * 100.0 + 0.5).astype(np.int64)


def _fold(
    user_id: int,
    sid: int,
    start: float,
    last: float,
    n: int,
    cents: int,
    secs: np.ndarray,
    cent_arr: np.ndarray,
    closed: list[tuple],
) -> tuple[int, float, float, int, int]:
    """Fold (ts, event_id)-sorted events into the running session state,
    appending each CLOSED session's final aggregate to ``closed``."""
    for sec, c in zip(secs, cent_arr):
        if sid == 0 or sec - last > SESSION_GAP_SEC:
            if sid > 0:
                closed.append((user_id, sid, n, start, last, cents))
            sid += 1
            start, n, cents = sec, 0, 0
        last = sec
        n += 1
        cents += int(c)
    return sid, start, last, n, cents


def _make_session_func(lateness_sec: float) -> Callable:
    def _session_func(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        rows = pd.concat(list(pdfs))
        if len(rows) == 0:
            return
        # normalize to ns first: Arrow may hand pandas datetime64[us]
        secs = rows["ts"].astype("datetime64[ns]").astype("int64").to_numpy() / 1e9
        eids = rows["event_id"].to_numpy().astype(np.int64)
        cents = _cents(rows["value"].to_numpy())

        if state.exists:
            (sid, start, last, n, cent_sum, max_seen, emitted_max,
             b_secs, b_eids, b_cents) = state.get
            buf_secs = np.asarray(b_secs, dtype=np.float64)
            buf_eids = np.asarray(b_eids, dtype=np.int64)
            buf_cents = np.asarray(b_cents, dtype=np.int64)
        else:
            sid, start, last, n, cent_sum = 0, 0.0, _NEG_INF, 0, 0
            max_seen, emitted_max = _NEG_INF, 0
            buf_secs = np.empty(0, dtype=np.float64)
            buf_eids = np.empty(0, dtype=np.int64)
            buf_cents = np.empty(0, dtype=np.int64)

        # watermark drop: strictly below the PRE-batch frontier is too late
        frontier_old = max_seen - lateness_sec
        keep = secs >= frontier_old
        secs_k, eids_k, cents_k = secs[keep], eids[keep], cents[keep]

        buf_secs = np.concatenate([buf_secs, secs_k])
        buf_eids = np.concatenate([buf_eids, eids_k])
        buf_cents = np.concatenate([buf_cents, cents_k])
        max_seen = max(max_seen, float(secs.max()))
        frontier_new = max_seen - lateness_sec

        order = np.lexsort((buf_eids, buf_secs))
        buf_secs, buf_eids, buf_cents = (
            buf_secs[order], buf_eids[order], buf_cents[order]
        )
        n_final = int(np.searchsorted(buf_secs, frontier_new, side="right"))

        out: list[tuple] = []
        sid, start, last, n, cent_sum = _fold(
            user_id, sid, start, last, n, cent_sum,
            buf_secs[:n_final], buf_cents[:n_final], out,
        )
        buf_secs, buf_eids, buf_cents = (
            buf_secs[n_final:], buf_eids[n_final:], buf_cents[n_final:]
        )

        # provisional view: finalized fold extended by the pending buffer
        p_sid, p_start, p_last, p_n, p_cents = _fold(
            user_id, sid, start, last, n, cent_sum, buf_secs, buf_cents, out
        )
        if p_sid > 0:
            out.append((user_id, p_sid, p_n, p_start, p_last, p_cents))
        # tombstone session ids that vanished (late event merged sessions)
        for gone in range(p_sid + 1, emitted_max + 1):
            out.append((user_id, gone, 0, 0.0, 0.0, 0))
        emitted_max = max(p_sid, 0)

        state.update((
            int(sid), float(start), float(last), int(n), int(cent_sum),
            float(max_seen), int(emitted_max),
            [float(v) for v in buf_secs],
            [int(v) for v in buf_eids],
            [int(v) for v in buf_cents],
        ))
        if not out:
            return
        yield pd.DataFrame(
            out,
            columns=[
                "user_id",
                "session_id",
                "n_events",
                "start_sec",
                "end_sec",
                "value_cents",
            ],
        )

    return _session_func


def sessionize_stateful(events: DataFrame, lateness_sec: float = 0.0) -> DataFrame:
    """Apply the stateful sessionizer to a STREAMING events DataFrame
    (applyInPandasWithState is streaming-only — for batch inputs use
    operators.events.sessionize, the window-based twin). Each micro-batch
    updates the per-user state in ``GroupState`` and emits current
    aggregates; the latest non-tombstone row per (user_id, session_id)
    converges to the batch ``sessionize`` result for any stream whose
    event-time disorder is bounded by ``lateness_sec`` (tested with
    shuffled files)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _make_session_func(float(lateness_sec)),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def start_session_stream(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    query_name: str,
    max_files_per_trigger: int | None = None,
    lateness_sec: float = 0.0,
):
    """Stream event parquet files through the stateful sessionizer into
    an update-mode memory sink (bounded backfills / tests). Production:
    update-mode sink to a key-value store or CDC table."""
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", int(max_files_per_trigger))
    stream = reader.parquet(input_dir)
    return (
        sessionize_stateful(stream, lateness_sec=lateness_sec)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
