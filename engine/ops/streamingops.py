"""Streaming-tier operators (SURVEY.md §2 group J) over the events table
replayed through a file streaming source (engine/streaming.py).

Each op runs a REAL Structured Streaming query (readStream → transform →
writeStream, availableNow trigger, memory sink) and returns the sink as a
batch DataFrame, so the driver's DuckDB oracle can check the streaming
semantics against plain SQL: tumbling/sliding windows via time_bucket
arithmetic, session windows via gaps-and-islands, streaming dedup via
DISTINCT.  Timestamps cross the compare boundary as epoch seconds.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from engine.ops import op
from engine.streaming import run_foreach_batch, run_to_df, stream_table


@op(
    "tumbling_metrics",
    "SELECT CAST(epoch(time_bucket(INTERVAL '1 hour', ts)) AS BIGINT) AS win_start, "
    "event_type, COUNT(*) AS n, ROUND(SUM(value), 4) AS sum_value "
    "FROM events GROUP BY 1, 2",
    "J",
)
def tumbling_metrics(spark, sf):
    ev = stream_table(spark, sf, "events")
    agg = (
        ev.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            F.unix_timestamp(F.col("window.start")).alias("win_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )
    return run_to_df(agg, "complete")


@op(
    "sliding_rate",
    # each event lands in 2 overlapping 2h-wide windows sliding by 1h
    "SELECT CAST(epoch(time_bucket(INTERVAL '1 hour', ts) - k * INTERVAL '1 hour') "
    "AS BIGINT) AS win_start, COUNT(*) AS n "
    "FROM events, (VALUES (0), (1)) s(k) "
    "WHERE ts >= time_bucket(INTERVAL '1 hour', ts) - k * INTERVAL '1 hour' "
    "GROUP BY 1",
    "J",
)
def sliding_rate(spark, sf):
    ev = stream_table(spark, sf, "events")
    agg = (
        ev.groupBy(F.window("ts", "2 hours", "1 hour"))
        .agg(F.count("*").alias("n"))
        .select(
            F.unix_timestamp(F.col("window.start")).alias("win_start"), "n"
        )
    )
    return run_to_df(agg, "complete")


@op(
    "watermark_late_pages",
    # one-shot replay: nothing is behind the watermark, so the result is
    # the plain tumbling count — the op exercises the watermark plumbing
    "SELECT CAST(epoch(time_bucket(INTERVAL '1 hour', ts)) AS BIGINT) AS win_start, "
    "COUNT(*) AS n FROM events GROUP BY 1",
    "J",
)
def watermark_late_pages(spark, sf):
    ev = stream_table(spark, sf, "events")
    agg = (
        ev.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.count("*").alias("n"))
        .select(
            F.unix_timestamp(F.col("window.start")).alias("win_start"), "n"
        )
    )
    return run_to_df(agg, "complete")


@op(
    "session_per_host",
    # gaps-and-islands: a new session starts after a >=30min silence per
    # user — >= matches Spark's session_window boundary semantics, where
    # windows [t, t+30) and [t+30, t+60) do NOT overlap, so an event
    # exactly 30 minutes after the previous one opens a NEW session
    "WITH g AS (SELECT user_id, ts, CASE WHEN ts - LAG(ts) OVER w >= INTERVAL "
    "'30 minutes' OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_s "
    "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), "
    "s AS (SELECT user_id, ts, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts "
    "ROWS UNBOUNDED PRECEDING) AS sid FROM g) "
    "SELECT user_id, CAST(FLOOR(epoch(MIN(ts))) AS BIGINT) AS session_start, "
    "COUNT(*) AS n_events FROM s GROUP BY user_id, sid",
    "J",
)
def session_per_host(spark, sf):
    ev = stream_table(spark, sf, "events")
    agg = (
        ev.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.unix_timestamp(F.col("session_window.start")).alias(
                "session_start"
            ),
            "n_events",
        )
    )
    return run_to_df(agg, "complete")


@op(
    "stream_dedup",
    "SELECT DISTINCT user_id, event_type FROM events",
    "J",
)
def stream_dedup(spark, sf):
    # stateful streaming dedup; keys only (SURVEY.md §2 J 'stateful dedup'
    # + engine/streaming.py determinism note).  The batch seen-table stays
    # the crawl's authority — this is the streaming-tier analog.
    ev = stream_table(spark, sf, "events")
    dedup = (
        ev.withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        .select("user_id", "event_type")
    )
    return run_to_df(dedup, "append")


def _user_stats_fn(key, pdfs, state):
    """Custom stateful operator body (applyInPandasWithState): per-user
    running (count, sum, last-seen) carried in explicit GroupState across
    micro-batches.  Arrow-batched — the iterator yields pandas chunks, so
    the per-row work is vectorized (no per-row Python)."""
    import pandas as pd

    n, s, last = state.get if state.exists else (0, 0.0, 0)
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].sum())
        # ns → epoch seconds; events.ts is non-null by construction
        last = max(last, int(pdf["ts"].astype("int64").max() // 1_000_000_000))
    state.update((n, s, last))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "sum_value": [round(s, 4)],
            "last_epoch": [last],
        }
    )


def stateful_user_stats_stream(ev):
    """Shared plan for the op and the multi-batch pytest: per-user running
    stats via an explicit-GroupState stateful operator.

    Scale shape: state is partitioned by the group key across executors
    (one shuffle on user_id), each key's state is a 3-field tuple — O(keys)
    state total, no driver involvement.  In 'update' mode each batch emits
    the keys it touched with their CUMULATIVE totals, so the latest
    emission per key is the final answer regardless of batch count."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return ev.groupBy("user_id").applyInPandasWithState(
        _user_stats_fn,
        outputStructType="user_id long, n_events long, sum_value double, last_epoch long",
        stateStructType="n long, s double, last long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


@op(
    "stateful_user_stats",
    "SELECT user_id, COUNT(*) AS n_events, ROUND(SUM(value), 4) AS sum_value, "
    "CAST(FLOOR(epoch(MAX(ts))) AS BIGINT) AS last_epoch "
    "FROM events GROUP BY user_id",
    "J",
)
def stateful_user_stats(spark, sf):
    """Custom stateful streaming operator (task brief: applyInPandasWithState
    for custom stateful operators).  The single-file stage replays in one
    micro-batch, so each key emits exactly once with its final totals and
    the plain GROUP BY oracle applies; cross-batch state carry is pinned by
    tests/test_operators.py::test_stateful_user_stats_multibatch."""
    ev = stream_table(spark, sf, "events")
    return run_to_df(stateful_user_stats_stream(ev), "update")


@op("stream_rounds", None, "J")
def stream_rounds(spark, sf):
    """foreachBatch driver (SURVEY.md §2 J 'stream_rounds'): micro-batches
    of seed deltas feed the batch round pipeline; here each micro-batch is
    summarized exactly as run_round's metrics hook would."""
    ev = stream_table(spark, sf, "events")
    acc: list[tuple[int, int, int]] = []

    def one_round(batch_df, batch_id: int) -> None:
        row = batch_df.agg(
            F.count("*").alias("n"),
            F.countDistinct("user_id").alias("users"),
        ).collect()[0]
        acc.append((int(batch_id), int(row["n"]), int(row["users"])))

    run_foreach_batch(ev, one_round)
    return spark.createDataFrame(
        acc, "batch_id long, n long, users long"
    )
