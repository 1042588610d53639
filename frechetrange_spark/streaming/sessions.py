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

State per user: (session_id, start_sec, last_sec, n_events, value_cents)
of the OPEN session. Events are assumed in event-time order ACROSS
micro-batches per user (file-arrival order in backfills; add a watermark
+ per-batch sort upstream for out-of-order sources), and each batch's
group rows are sorted here.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

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
    "n_events long, value_cents long"
)

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _cents(values: np.ndarray) -> np.ndarray:
    # HALF_UP like Spark's round() (values are non-negative prices)
    return np.floor(values * 100.0 + 0.5).astype(np.int64)


def _session_func(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    rows = pd.concat(list(pdfs))
    if len(rows) == 0:
        return
    rows = rows.sort_values(["ts", "event_id"])
    # normalize to ns first: Arrow may hand pandas datetime64[us]
    secs = rows["ts"].astype("datetime64[ns]").astype("int64").to_numpy() / 1e9
    cents = _cents(rows["value"].to_numpy())

    if state.exists:
        sid, start, last, n, cent_sum = state.get
    else:
        sid, start, last, n, cent_sum = 0, 0.0, -np.inf, 0, 0

    out: list[tuple] = []
    for sec, c in zip(secs, cents):
        if sec - last > SESSION_GAP_SEC or sid == 0:
            if sid > 0:
                # close the previous session (its final update)
                out.append((user_id, sid, n, start, last, cent_sum))
            sid += 1
            start, n, cent_sum = sec, 0, 0
        last = sec
        n += 1
        cent_sum += int(c)
    out.append((user_id, sid, n, start, last, cent_sum))
    state.update((sid, float(start), float(last), int(n), int(cent_sum)))
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


def sessionize_stateful(events: DataFrame) -> DataFrame:
    """Apply the stateful sessionizer to a STREAMING events DataFrame
    (applyInPandasWithState is streaming-only — for batch inputs use
    operators.events.sessionize, the window-based twin). Each micro-batch
    updates the open session in ``GroupState`` and emits current
    aggregates; the latest row per (user_id, session_id) converges to the
    batch ``sessionize`` result (tested)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _session_func,
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
):
    """Stream event parquet files through the stateful sessionizer into
    an update-mode memory sink (bounded backfills / tests). Production:
    update-mode sink to a key-value store or CDC table."""
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", int(max_files_per_trigger))
    stream = reader.parquet(input_dir)
    return (
        sessionize_stateful(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
