"""applyInPandasWithState sessionizer (SURVEY.md §2.10): the streaming
operator's closed sessions must equal the batch sessionizer's, and must be
INVARIANT to how the same events are chunked into micro-batches — the
emission rule depends only on event content."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aspseek_spark.streaming.sessionize_stream import (
    sessionize_batch,
    sessionize_stream,
)

GAP = 600


def _events():
    """40 users, gaps straddling the threshold, deterministic."""
    rows = []
    t0 = 1_767_225_600
    for u in range(40):
        t = t0 + u * 17
        for k in range(10):
            # alternate small intra-session gaps and session-breaking ones
            step = 45 + (u * 7 + k * 13) % 400
            if k in (3, 7) and u % 3 != 0:
                step = GAP + 1 + (u * 11 + k) % 900
            t += step
            rows.append((u, t))
    return rows


def _run_stream(spark, tmpdir, chunks, name):
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = tmpdir / f"src_{name}"
    src.mkdir()
    stream = spark.readStream.schema("user_id long, ts long").parquet(str(src))
    out = sessionize_stream(stream, gap_s=GAP, ts_col="ts")
    q = (
        out.writeStream.format("memory")
        .queryName(f"sess_{name}")
        .outputMode("append")
        .option("checkpointLocation", str(tmpdir / f"ckpt_{name}"))
        .start()
    )
    try:
        for i, chunk in enumerate(chunks):
            pq.write_table(
                pa.table(
                    {
                        "user_id": pa.array([r[0] for r in chunk], pa.int64()),
                        "ts": pa.array([r[1] for r in chunk], pa.int64()),
                    }
                ),
                str(src / f"chunk{i}.parquet"),
            )
            q.processAllAvailable()
    finally:
        q.stop()
    return {
        tuple(r)
        for r in spark.table(f"sess_{name}")
        .select("user_id", "session_start", "session_end", "n_events")
        .collect()
    }


def test_stream_matches_batch_and_is_chunking_invariant(spark, tmp_path):
    rows = _events()
    rows_sorted = sorted(rows, key=lambda r: r[1])
    cut = rows_sorted[len(rows_sorted) // 2][1]
    chunk_a = [r for r in rows if r[1] <= cut]
    chunk_b = [r for r in rows if r[1] > cut]
    assert chunk_a and chunk_b

    batch_df = spark.createDataFrame(rows, "user_id long, ts long")
    want = {
        tuple(r)
        for r in sessionize_batch(batch_df, gap_s=GAP, ts_col="ts").collect()
    }
    assert want, "fixture must produce closed sessions"

    got_two = _run_stream(spark, tmp_path, [chunk_a, chunk_b], "two")
    got_one = _run_stream(spark, tmp_path, [rows], "one")
    assert got_two == want
    assert got_one == want


def test_batch_include_open_counts_every_event(spark):
    rows = _events()
    df = spark.createDataFrame(rows, "user_id long, ts long")
    full = sessionize_batch(df, gap_s=GAP, ts_col="ts", include_open=True)
    assert full.agg(F.sum("n_events")).collect()[0][0] == len(rows)
    # closed-only is a strict subset: exactly one open session per user
    closed = sessionize_batch(df, gap_s=GAP, ts_col="ts")
    n_users = df.select("user_id").distinct().count()
    assert full.count() - closed.count() == n_users
