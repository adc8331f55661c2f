"""Event analytics tests: streaming windowed aggregation == batch,
and the applyInPandasWithState gap-sessionizer vs the batch
sessionize (every session except each user's open tail is emitted
in-stream)."""

from __future__ import annotations

import shutil

from conftest import SF_SMOKE

from ummon_spark.events import (
    load_events,
    run_windowed_counts_stream,
    sessionize,
    sessionize_stream,
    stream_events,
    windowed_event_counts,
)


def test_windowed_counts_stream_equals_batch(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    (tmp_path / "in").mkdir()
    shutil.copy(f"{SF_SMOKE}/events.parquet", in_dir)

    run_windowed_counts_stream(spark, in_dir, out_dir, ckpt, watermark="0 seconds")
    streamed = sorted(tuple(r) for r in spark.read.parquet(out_dir).collect())
    batch_rows = windowed_event_counts(load_events(spark, SF_SMOKE)).collect()
    # append mode emits a window once the watermark (here: max event
    # time) passes its END — every window except the one holding the
    # final event(s); those stay open in state by design
    from datetime import datetime

    max_ts = max(r["ts"] for r in load_events(spark, SF_SMOKE).collect())
    max_epoch = (max_ts - datetime(1970, 1, 1)).total_seconds()  # tz-free
    expected = sorted(
        tuple(r) for r in batch_rows if r["window_start"] + 600 <= max_epoch
    )
    assert streamed == expected
    assert len(expected) >= len(batch_rows) - 2  # only the tail stays open
    # replay with no new files: exactly-once (no duplicate windows)
    run_windowed_counts_stream(spark, in_dir, out_dir, ckpt, watermark="0 seconds")
    assert sorted(tuple(r) for r in spark.read.parquet(out_dir).collect()) == expected


def test_stateful_sessionizer_matches_batch_closed_sessions(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    (tmp_path / "in").mkdir()
    shutil.copy(f"{SF_SMOKE}/events.parquet", in_dir)

    q = (
        sessionize_stream(stream_events(spark, in_dir))
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = {
        (r["user_id"], r["session_idx"]): (
            r["n_events"],
            r["start_epoch"],
            r["end_epoch"],
            r["value_cents"],
        )
        for r in spark.read.parquet(out_dir).collect()
    }
    batch_rows = sessionize(load_events(spark, SF_SMOKE)).collect()
    batch = {
        (r["user_id"], r["session_idx"]): (
            r["n_events"],
            r["start_epoch"],
            r["end_epoch"],
            r["value_cents"],
        )
        for r in batch_rows
    }
    # the stream emits sessions CLOSED by an observed gap; each user's
    # final (still-open) session stays in state until the event-time
    # timeout, so streamed == batch minus each user's last session
    last_per_user = {}
    for user_id, idx in batch:
        last_per_user[user_id] = max(last_per_user.get(user_id, 0), idx)
    expected = {
        k: v for k, v in batch.items() if k[1] < last_per_user[k[0]]
    }
    assert streamed == expected
    assert expected, "corpus must contain closed sessions for the test to bite"


def test_asof_join_semantics(spark):
    """Hand-checked as-of semantics: inclusive <= at equal timestamps,
    null when nothing precedes, latest-preceding wins, ties inside the
    right side resolve to max tie_col."""
    from datetime import datetime

    from ummon_spark.events import asof_join

    def t(s):
        return datetime(2024, 1, 1, 0, 0, s)

    left = spark.createDataFrame(
        [(100, 1, t(5)), (101, 1, t(10)), (102, 1, t(1)), (103, 2, t(7))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (1, t(2), 10, 1.0),
            (1, t(5), 11, 2.0),   # equal ts as left 100 -> inclusive match
            (1, t(5), 12, 3.0),   # same (user, ts): max event_id (12) wins
            (1, t(9), 13, 4.0),
            (2, t(8), 14, 5.0),   # after left 103 -> no match for user 2
        ],
        "user_id long, ts timestamp, event_id long, value double",
    )
    got = {
        r["event_id"]: (r["matched_event_id"], r["matched_value"])
        for r in asof_join(left, right, right_cols=("event_id", "value")).collect()
    }
    assert got[100] == (12, 3.0)      # inclusive + in-tie max event_id
    assert got[101] == (13, 4.0)      # latest preceding
    assert got[102] == (None, None)   # nothing precedes t=1
    assert got[103] == (None, None)   # user 2's only click is later
    assert len(got) == 4              # every left row kept (left-join)


def test_asof_join_null_right_payload_not_torn(spark):
    """All matched_* columns must come from the SAME (latest preceding)
    right row: when that row carries a NULL payload column, the null is
    kept — not back-filled from an older right row (the torn-match bug
    of independent per-column last(ignorenulls) windows)."""
    from datetime import datetime

    from ummon_spark.events import asof_join

    def t(s):
        return datetime(2024, 1, 1, 0, 0, s)

    left = spark.createDataFrame(
        [(200, 1, t(6)), (201, 1, t(3))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(1, t(2), 10, 7.0), (1, t(5), 11, None)],
        "user_id long, ts timestamp, event_id long, value double",
    )
    got = {
        r["event_id"]: (r["matched_event_id"], r["matched_value"])
        for r in asof_join(left, right, right_cols=("event_id", "value")).collect()
    }
    # latest preceding row for t=6 is (11, NULL): value must be NULL,
    # not 7.0 torn from the older (10, 7.0) row
    assert got[200] == (11, None)
    assert got[201] == (10, 7.0)
