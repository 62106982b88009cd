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

Semantics match the batch ``ev_sessionize`` battery query: a new
session opens when the gap since the user's previous event exceeds
``gap_s``; ids count from 1 in event-time order.  Each batch emits
(update mode) one row per session TOUCHED in that batch — closed
sessions are final, the open session is a snapshot superseded by a
later emit with the same (user_id, sess_id).  Readers keep the last
emit per key (tests pin stream == batch after that dedup).

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

from wikiextractor_spark.streaming.stream import EVENTS_SCHEMA

SESSION_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("sess_id", LongType()),
        StructField("n_events", LongType()),
        StructField("duration_s", LongType()),
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
        if state.exists:
            last_ts, sess_id, start, n = state.get
        else:
            last_ts, sess_id, start, n = None, 0, None, 0

        # a batch arrives as several Arrow chunks: order is only
        # meaningful after concatenating and sorting the WHOLE batch
        all_ts = pd.concat([pdf["ts_us"] for pdf in pdfs]).sort_values()

        out: list[tuple[int, int, int, int]] = []
        for ts in all_ts:
            ts = int(ts)
            if last_ts is None or ts - last_ts > gap_us:
                if last_ts is not None:
                    # close the previous session (final emit)
                    out.append(
                        (user_id, sess_id, n, (last_ts - start) // 1_000_000)
                    )
                sess_id += 1
                start = ts
                n = 1
            else:
                n += 1
            last_ts = ts
        if last_ts is None:  # defensive: no data and no prior state
            return
        state.update((last_ts, sess_id, start, n))
        # snapshot of the still-open session; superseded by a later
        # emit with the same (user_id, sess_id) if it grows
        out.append((user_id, sess_id, n, (last_ts - start) // 1_000_000))
        yield pd.DataFrame(
            out, columns=["user_id", "sess_id", "n_events", "duration_s"]
        )

    return sessionize


def sessionize_stream(
    spark: SparkSession, input_dir: str, gap_s: int = 1800,
    path_glob: str | None = None, max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming per-user sessionization; see module docstring.
    ``max_files_per_trigger`` forces multi-micro-batch processing so
    tests can prove state survives batch boundaries."""
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if path_glob:
        reader = reader.option("pathGlobFilter", path_glob)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    events = reader.parquet(input_dir).select(
        "user_id", F.expr("ts DIV 1000").alias("ts_us")
    )
    return events.groupBy("user_id").applyInPandasWithState(
        _make_sessionizer(gap_s * 1_000_000),
        outputStructType=SESSION_OUTPUT,
        stateStructType=SESSION_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
