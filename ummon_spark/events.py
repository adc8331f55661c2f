"""Event-stream analytics over the driver's `events` table
(event_id, ts, user_id, event_type, value, props).

The reference engine is batch-only; this is the Structured-Streaming
side of the rebuild (SURVEY.md §2.7): tumbling-window aggregation with
a watermark for late data, and gap-based sessionization — batch
DataFrame implementations first (they are the correctness oracles and
run on historical data), then streaming twins that reuse the same
column expressions, plus an applyInPandasWithState stateful
sessionizer for the continuous path.

Cross-engine determinism: window starts are epoch-second bigints
(tumbling windows align to the epoch in both Spark and DuckDB) and
monetary sums are quantized to integer cents — no float accumulation
order can drift.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)

WINDOW_MINUTES = 10
SESSION_GAP_MINUTES = 30


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def _cents(col):
    return F.round(col * 100, 0).cast("bigint")


def epoch_seconds(ts):
    """Timezone-FREE epoch seconds of a (parquet-naive) TIMESTAMP_NTZ
    column: day count since 1970-01-01 plus the tz-free time-of-day
    fields. `unix_timestamp`/LTZ casts would re-interpret the naive
    value in the session timezone and drift against the DuckDB oracle
    (whose epoch() is tz-free) whenever a session isn't UTC."""
    days = F.datediff(F.to_date(ts), F.to_date(F.lit("1970-01-01")))
    return (
        days.cast("long") * 86400
        + F.hour(ts).cast("long") * 3600
        + F.minute(ts).cast("long") * 60
        + F.second(ts).cast("long")
    )


def windowed_event_counts(
    events: DataFrame, minutes: int = WINDOW_MINUTES
) -> DataFrame:
    """Tumbling-window counts + quantized value sums per event type.
    One shuffle on (window, event_type); map-side partial aggregation.
    The batch path buckets by epoch arithmetic (tz-free, equal to
    F.window's epoch-aligned tumbling start); the streaming twin uses
    F.window + watermark so state closes (run_windowed_counts_stream)."""
    bucket = (epoch_seconds(F.col("ts")) - epoch_seconds(F.col("ts")) % (minutes * 60))
    return (
        events.groupBy(bucket.alias("window_start"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(_cents(F.col("value"))).alias("value_cents"),
        )
        .select("window_start", "event_type", "n_events", "value_cents")
    )


def sessionize(
    events: DataFrame, gap_minutes: int = SESSION_GAP_MINUTES
) -> DataFrame:
    """Gap-based sessions per user: a new session starts when the gap
    since the previous event exceeds gap_minutes. Output one row per
    session: (user_id, session_idx, n_events, start_epoch, end_epoch,
    value_cents). Two window passes partitioned by user_id (uniform
    keys) + one groupBy — the standard distributed sessionization.
    Ordering ties break on event_id for determinism."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sec = epoch_seconds(F.col("ts"))
    prev = F.lag(sec).over(w)
    is_new = F.when(
        prev.isNull() | (sec - prev > gap_minutes * 60), F.lit(1)
    ).otherwise(F.lit(0))
    with_session = events.withColumn(
        "session_idx",
        F.sum(is_new).over(
            Window.partitionBy("user_id")
            .orderBy("ts", "event_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        with_session.groupBy("user_id", "session_idx")
        .agg(
            F.count("*").alias("n_events"),
            F.min(sec).alias("start_epoch"),
            F.max(sec).alias("end_epoch"),
            F.sum(_cents(F.col("value"))).alias("value_cents"),
        )
        .select(
            "user_id",
            F.col("session_idx").cast("bigint").alias("session_idx"),
            "n_events",
            "start_epoch",
            "end_epoch",
            "value_cents",
        )
    )


# --- streaming twins ---------------------------------------------------------


def stream_events(spark: SparkSession, input_dir: str) -> DataFrame:
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(input_dir)
    )


def run_windowed_counts_stream(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    minutes: int = WINDOW_MINUTES,
    watermark: str = "1 hour",
    block: bool = True,
):
    """Streaming tumbling-window aggregation: watermark bounds state
    (windows older than watermark close and emit exactly once in
    append mode). Grouping uses F.window so the engine can close
    windows; the emitted window_start is the same tz-free epoch as the
    batch path, so streamed == batch row-for-row."""
    ev = stream_events(spark, input_dir).withWatermark("ts", watermark)
    win = F.window("ts", f"{minutes} minutes")
    out = (
        ev.groupBy(win.alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(_cents(F.col("value"))).alias("value_cents"),
        )
        .select(
            epoch_seconds(F.col("w.start")).alias("window_start"),
            "event_type",
            "n_events",
            "value_cents",
        )
    )
    q = (
        out.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    if block:
        q.awaitTermination()
    return q


SESSION_OUT_SCHEMA = (
    "user_id long, session_idx long, n_events long, "
    "start_epoch long, end_epoch long, value_cents long"
)
SESSION_STATE_SCHEMA = (
    "session_idx long, n_events long, start_epoch long, "
    "end_epoch long, value_cents long"
)


def _session_fn(gap_seconds: int):
    """applyInPandasWithState update function: per user, fold arriving
    events into the open session; emit every session CLOSED by an
    observed gap; keep the still-open one in state (flushed by the
    event-time timeout in a long-running query)."""

    def update(key, pdfs, state):
        (user_id,) = key
        if state.hasTimedOut:
            if state.exists:
                s = state.get
                state.remove()
                yield pd.DataFrame(
                    [
                        {
                            "user_id": user_id,
                            "session_idx": s[0],
                            "n_events": s[1],
                            "start_epoch": s[2],
                            "end_epoch": s[3],
                            "value_cents": s[4],
                        }
                    ]
                )
            return
        rows = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
        secs = (rows["ts"].astype("int64") // 1_000_000_000).tolist()
        cents = [int(round(v * 100)) for v in rows["value"].tolist()]
        if state.exists:
            idx, n, start, end, val = state.get
        else:
            idx, n, start, end, val = 0, 0, None, None, 0
        closed = []
        for sec, c in zip(secs, cents):
            if n == 0:
                idx, n, start, end, val = idx + 1, 1, sec, sec, c
            elif sec - end > gap_seconds:
                closed.append((user_id, idx, n, start, end, val))
                idx, n, start, end, val = idx + 1, 1, sec, sec, c
            else:
                n, end, val = n + 1, sec, val + c
        state.update((idx, n, start, end, val))
        if closed:
            yield pd.DataFrame(
                closed,
                columns=[
                    "user_id",
                    "session_idx",
                    "n_events",
                    "start_epoch",
                    "end_epoch",
                    "value_cents",
                ],
            )

    return update


def sessionize_stream(
    events_stream: DataFrame,
    gap_minutes: int = SESSION_GAP_MINUTES,
    watermark: str = "1 hour",
) -> DataFrame:
    """Continuous gap-sessionization: custom stateful operator via
    applyInPandasWithState (per-user GroupState holds the open
    session; closed sessions emit as soon as a gap is observed; the
    event-time timeout flushes idle users)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    ev = events_stream.withWatermark("ts", watermark)
    return ev.groupBy("user_id").applyInPandasWithState(
        _session_fn(gap_minutes * 60),
        outputStructType=SESSION_OUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    right_cols: tuple[str, ...] = ("event_id", "value"),
    tie_col: str = "event_id",
) -> DataFrame:
    """As-of join: every left row paired with the LATEST right row at
    or before its timestamp, per key — `matched_{c}` columns (null
    when no right row precedes). The classic enrichment join Spark has
    no builtin for (and the one the driver prompt calls out); DuckDB's
    native ASOF JOIN is the oracle.

    Spark-first shape: tag both sides, union, and run ONE per-key
    window pass ordered by (ts, tag) carrying the last non-null right
    payload forward (`F.last(ignorenulls=True)` over unbounded
    preceding) — right rows sort before left rows at equal timestamps,
    giving the inclusive <= semantics. One shuffle on the key, no
    range-join blowup: cost is the merge-sort of each key's combined
    event history, exactly how a 1000-executor cluster wants it (hash
    by key, sort within partition — both sides co-partitioned by the
    SAME exchange). Right rows are first deduped to one per (key, ts)
    by max `tie_col` so the match is deterministic under ties.
    """
    from pyspark.sql import Window

    w_dedup = Window.partitionBy(key, ts_col).orderBy(F.col(tie_col).desc())
    r = (
        right.withColumn("_rn", F.row_number().over(w_dedup))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    rtag = r.select(
        key,
        ts_col,
        F.lit(0).alias("_q"),
        # ONE struct per right row: every matched_* column must come
        # from the SAME right row — independent per-column last()
        # windows would mix values from different right rows whenever a
        # right payload column is null (torn match; ADVICE r5). The
        # struct itself is never null for right rows, so last(...,
        # ignorenulls) carries the whole latest row forward even when
        # its payload fields are null.
        F.struct(
            *[F.col(c).alias(f"matched_{c}") for c in right_cols]
        ).alias("_match"),
    )
    ltag = left.withColumn("_q", F.lit(1))
    unioned = ltag.unionByName(rtag, allowMissingColumns=True)

    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts_col).asc(), F.col("_q").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        *[c for c in ltag.columns if c != "_q"],
        F.col("_q"),
        F.last("_match", ignorenulls=True).over(w).alias("_m"),
    )
    return (
        filled.filter(F.col("_q") == 1)
        .select(
            *[c for c in ltag.columns if c != "_q"],
            *[F.col(f"_m.matched_{c}").alias(f"matched_{c}") for c in right_cols],
        )
    )
