"""Custom STATEFUL streaming operator via ``applyInPandasWithState``
(SURVEY.md §2.10; driver brief: "applyInPandasWithState for custom
stateful operators").

Gap-based sessionization of an event stream, keyed by user: per key the
state holds the OPEN session (start, last-seen, count); every micro-batch
folds its events into that state and EMITS each session the moment a later
event proves its gap closed. Emission is therefore driven purely by event
content — independent of how events are chunked into micro-batches — which
is what makes exact stream==batch parity testable (and tested:
tests/test_sessionize_stream.py replays the same events in 1-file and
N-file streams and against the batch sessionizer).

The final still-open session per key stays in state and is never emitted
by this operator; a production deployment closes idle sessions with an
event-time timeout (``GroupStateTimeout.EventTimeTimeout`` + watermark) —
the emission rule for PROVEN-closed sessions is identical, so the parity
property pinned here carries over.

Assumption: per-key event time is non-decreasing ACROSS micro-batches
(within a batch any order is fine — events are sorted before folding).
The crawl's fetched stream satisfies this by construction (rounds commit
in order); a general deployment enforces it with a watermark + drop rule.

Scale: state is O(keys) rows of 3 longs; each micro-batch shuffles only
its own events by key (the state store is partition-local, exactly the
partitioned-state discipline the crawl's bloom/cuckoo blobs use).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = (
    "user_id long, session_start long, session_end long, n_events long"
)
_STATE_SCHEMA = "start_ts long, last_ts long, n long"


def _fold(
    key: Any,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    gap_s: int,
) -> Iterator[pd.DataFrame]:
    if state.exists:
        start_ts, last_ts, n = state.get
    else:
        start_ts = last_ts = None
        n = 0
    ts: list[int] = []
    for pdf in pdfs:
        ts.extend(int(t) for t in pdf["ts_unix"])
    ts.sort()
    closed: list[tuple[int, int, int, int]] = []
    uid = int(key[0])
    for t in ts:
        if last_ts is not None and t - last_ts > gap_s:
            closed.append((uid, start_ts, last_ts, n))
            start_ts, n = t, 0
        if start_ts is None:
            start_ts = t
        n += 1
        last_ts = t
    state.update((start_ts, last_ts, n))
    if closed:
        yield pd.DataFrame(
            closed,
            columns=["user_id", "session_start", "session_end", "n_events"],
        )


def sessionize_stream(
    events: DataFrame,
    gap_s: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """events (stream) → closed sessions (append stream). ``ts_col`` may be
    a timestamp (converted to unix seconds) or already a long."""
    ts_unix = (
        F.col(ts_col).cast("long")
        if dict(events.dtypes)[ts_col] in ("bigint", "long")
        else F.unix_seconds(F.col(ts_col).cast("timestamp"))
    )
    prepared = events.select(
        F.col(user_col).alias("user_id"), ts_unix.alias("ts_unix")
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        lambda key, pdfs, state: _fold(key, pdfs, state, gap_s),
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def sessionize_batch(
    events: DataFrame,
    gap_s: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    include_open: bool = False,
) -> DataFrame:
    """The identical sessionization as one batch window computation —
    the parity reference for the stream (and usable on its own). By
    default the last (still-open) session per user is EXCLUDED to match
    what the stream has provably closed."""
    from pyspark.sql import Window

    ts_unix = (
        F.col(ts_col).cast("long")
        if dict(events.dtypes)[ts_col] in ("bigint", "long")
        else F.unix_seconds(F.col(ts_col).cast("timestamp"))
    )
    w = Window.partitionBy(user_col).orderBy("ts_unix")
    sess = (
        events.select(F.col(user_col).alias("user_id"), ts_unix.alias("ts_unix"))
        .withColumn("prev", F.lag("ts_unix").over(w))
        .withColumn(
            "new_sess",
            (F.col("prev").isNull() | (F.col("ts_unix") - F.col("prev") > gap_s))
            .cast("int"),
        )
        .withColumn(
            "sess_id",
            F.sum("new_sess").over(
                Window.partitionBy("user_id")
                .orderBy("ts_unix")
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .groupBy("user_id", "sess_id")
        .agg(
            F.min("ts_unix").alias("session_start"),
            F.max("ts_unix").alias("session_end"),
            F.count("*").alias("n_events"),
        )
    )
    if not include_open:
        last = Window.partitionBy("user_id")
        sess = sess.withColumn(
            "_max_sess", F.max("sess_id").over(last)
        ).filter(F.col("sess_id") != F.col("_max_sess")).drop("_max_sess")
    return sess.select("user_id", "session_start", "session_end", "n_events")
