"""Custom stateful streaming operator: per-user sessionization with
``applyInPandasWithState`` (SURVEY.md §2.10 extension).

Windowed aggregation can't express sessions (gap-based grouping has
data-dependent boundaries), so this is the genuine custom-stateful
case: per user, a session id counter + the open session's
(start, last_ts, n_events) live in the state store — executor-side,
partitioned by the grouping key, checkpointed — and survive across
micro-batches.  A session that starts in batch N and continues in
batch N+1 is stitched together by the carried state, which a
batch-per-file rerun could never do.

Semantics match the batch ``ev_sessionize`` battery query **provided
events arrive in event-time order across micro-batches** (within a
batch they are sorted; the batch query globally sorts).  Ordering
discipline for cross-batch stragglers:

* the stream carries ``withWatermark`` on the event time, so rows
  later than the watermark delay are dropped by Spark before the
  operator ever sees them;
* rows inside the watermark but older than the group's carried
  ``last_ts`` (which would move session time backwards and mis-split
  or merge sessions) are counted and dropped by the operator — they
  are reported in the emitted ``n_late`` column rather than silently
  corrupting state.

Idle sessions are closed by an **event-time timeout**: when the
watermark passes ``last_ts + gap``, the open session is emitted one
final time and its state removed — so per-user state cannot grow
without bound in a long-running stream (r2 used ``NoTimeout``, which
never expired state).

Each batch emits (update mode) one row per session TOUCHED in that
batch — closed sessions are final, the open session is a snapshot
superseded by a later emit with the same (user_id, sess_id).  Readers
keep, per (user_id, sess_id), the row with the LARGEST ``last_ts_us``
marker (ties are value-identical): a monotone merge rule that does not
depend on any sink scan order.

The operator returns the streaming DataFrame; the SINK is the
caller's choice (tests use a memory sink in update mode; production
pairs it with ``foreachBatch`` parquet upserts or a kafka sink —
never a complete-mode memory sink).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)

from wikiextractor_spark.streaming.stream import (
    event_time_expr,
    event_time_micros_expr,
    events_schema_for,
    events_ts_type,
)

SESSION_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("sess_id", LongType()),
        StructField("n_events", LongType()),
        StructField("duration_s", LongType()),
        # monotone emit marker: readers keep max per (user_id, sess_id)
        StructField("last_ts_us", LongType()),
        # cross-batch stragglers dropped by the operator this emit
        StructField("n_late", LongType()),
    ]
)

# (last_ts_us, sess_id, sess_start_us, sess_n)
SESSION_STATE = StructType(
    [
        StructField("last_ts_us", LongType()),
        StructField("sess_id", LongType()),
        StructField("sess_start_us", LongType()),
        StructField("sess_n", LongType()),
    ]
)


def _make_sessionizer(gap_us: int):
    def sessionize(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        user_id = key[0]

        if state.hasTimedOut:
            # watermark passed last_ts + gap: the open session can
            # never be extended — emit its final form, drop the state
            last_ts, sess_id, start, n = state.get
            state.remove()
            yield pd.DataFrame(
                [(user_id, sess_id, n, (last_ts - start) // 1_000_000,
                  last_ts, 0)],
                columns=[f.name for f in SESSION_OUTPUT.fields],
            )
            return

        if state.exists:
            last_ts, sess_id, start, n = state.get
        else:
            last_ts, sess_id, start, n = None, 0, None, 0

        # a batch arrives as several Arrow chunks: order is only
        # meaningful after concatenating and sorting the WHOLE batch
        all_ts = pd.concat([pdf["ts_us"] for pdf in pdfs]).sort_values()

        out: list[tuple[int, int, int, int, int, int]] = []
        n_late = 0
        for ts in all_ts:
            ts = int(ts)
            if last_ts is not None and ts < last_ts:
                # cross-batch straggler inside the watermark: applying
                # it would move session time backwards — drop + count
                n_late += 1
                continue
            if last_ts is None or ts - last_ts > gap_us:
                if last_ts is not None:
                    # close the previous session (final emit)
                    out.append(
                        (user_id, sess_id, n,
                         (last_ts - start) // 1_000_000, last_ts, 0)
                    )
                sess_id += 1
                start = ts
                n = 1
            else:
                n += 1
            last_ts = ts
        if last_ts is None:  # all rows were stragglers and no state
            return
        state.update((last_ts, sess_id, start, n))
        # close the open session once the watermark passes last_ts+gap
        # (timestamp must stay ahead of the current watermark)
        timeout_ms = max(
            (last_ts + gap_us) // 1000 + 1,
            state.getCurrentWatermarkMs() + 1,
        )
        state.setTimeoutTimestamp(timeout_ms)
        # snapshot of the still-open session; superseded by a later
        # emit with the same (user_id, sess_id) and larger last_ts_us
        out.append(
            (user_id, sess_id, n, (last_ts - start) // 1_000_000,
             last_ts, n_late)
        )
        yield pd.DataFrame(
            out, columns=[f.name for f in SESSION_OUTPUT.fields]
        )

    return sessionize


def sessionize_stream(
    spark: SparkSession, input_dir: str, gap_s: int = 1800,
    path_glob: str | None = None, max_files_per_trigger: int | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming per-user sessionization; see module docstring.
    ``max_files_per_trigger`` forces multi-micro-batch processing so
    tests can prove state survives batch boundaries; ``watermark`` is
    the lateness budget (rows later than it never reach the operator,
    and idle sessions expire once it passes ``last_ts + gap``)."""
    ts_type = events_ts_type(spark, input_dir, path_glob)
    reader = spark.readStream.schema(events_schema_for(ts_type))
    if path_glob:
        reader = reader.option("pathGlobFilter", path_glob)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    events = (
        reader.parquet(input_dir)
        .select(
            "user_id",
            event_time_micros_expr(ts_type).alias("ts_us"),
            event_time_expr(ts_type).alias("event_time"),
        )
        .withWatermark("event_time", watermark)
    )
    return events.groupBy("user_id").applyInPandasWithState(
        _make_sessionizer(gap_s * 1_000_000),
        outputStructType=SESSION_OUTPUT,
        stateStructType=SESSION_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def sessionize_to_parquet(
    spark: SparkSession, input_dir: str, out_dir: str, checkpoint_dir: str,
    **kwargs,
):
    """Production sink for the stateful sessionizer: ``foreachBatch``
    appends each micro-batch's update rows to a parquet LOG (the
    parquet file sink only accepts append-mode streams, and a stateful
    update stream needs exactly this escape hatch).

    The log is merge-on-read (:func:`read_sessions`): per-batch work
    is one bounded append — never a rewrite of the whole table, which
    is the scale-killer a naive "read + merge + overwrite" upsert
    pays every batch.  Long-running streams periodically compact by
    writing ``read_sessions()`` out as a fresh log generation (or land
    the log in a table format with real upserts — Delta/Iceberg — on
    clusters that have one).

    ``kwargs`` pass through to :func:`sessionize_stream`.
    """
    sess = sessionize_stream(spark, input_dir, **kwargs)

    def _append_updates(batch_df: DataFrame, _batch_id: int) -> None:
        batch_df.write.mode("append").parquet(out_dir)

    return (
        sess.writeStream.foreachBatch(_append_updates)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )


def read_sessions(spark: SparkSession, out_dir: str) -> DataFrame:
    """Merge-on-read over the :func:`sessionize_to_parquet` log: keep,
    per (user_id, sess_id), the emit with the largest monotone
    ``last_ts_us`` marker — later snapshots supersede earlier ones
    regardless of file/scan order."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy("user_id", "sess_id")
        .orderBy(F.desc("last_ts_us"), F.desc("n_events"))
    )
    return (
        spark.read.parquet(out_dir)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
