"""Streaming execution: the reference's unbounded semantics on
Structured Streaming.

Reference mapping (SURVEY.md §3.3):
- bounded/unbounded unification -> same DataFrame code via readStream
  + Trigger.AvailableNow (drain-and-terminate ≡ bounded root closing
  its channel, reference graph.go:45-81);
- Fold emitting accumulator snapshots per trigger (context.go:332-455)
  -> global aggregation in update output mode with a processing-time
  trigger;
- the ack/watermark/commit protocol (context.go:462-642) -> the
  micro-batch offset/commit logs under checkpointLocation;
- TriggerEvery(d) -> Trigger.ProcessingTime(d); TriggerEach(n) has no
  Spark analog — approximated by maxOffsetsPerTrigger/maxFilesPerTrigger
  (bounded batch size, not exact element count; documented gap).

Beyond the reference (it has event time on every element but no
operator that uses it — SURVEY.md §2.8): real event-time windows with
watermark lateness, session windows, and streaming dedup.
"""

from __future__ import annotations

from typing import Optional, Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery


def streaming_fold(
    stream: DataFrame,
    aggs: Sequence,
    sink_name: str,
    trigger: Optional[dict] = None,
    keys: Sequence[str] = (),
) -> StreamingQuery:
    """Global (or keyed) running aggregate emitted per trigger in
    update mode — reference Fold/Count parity."""
    agg = stream.groupBy(*keys).agg(*aggs) if keys else stream.agg(*aggs)
    w = agg.writeStream.format("memory").queryName(sink_name).outputMode("update")
    if trigger:
        w = w.trigger(**trigger)
    return w.start()


def windowed_counts(
    stream: DataFrame,
    event_time_col: str = "event_time",
    window: str = "1 hour",
    watermark: str = "2 hours",
    keys: Sequence[str] = (),
):
    """Event-time tumbling window aggregation with late-data watermark.
    Returns the (unstarted) aggregated streaming DataFrame."""
    return (
        stream.withWatermark(event_time_col, watermark)
        .groupBy(F.window(event_time_col, window), *keys)
        .agg(F.count(F.lit(1)).alias("n"))
    )


def session_counts(
    stream: DataFrame,
    event_time_col: str = "event_time",
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    keys: Sequence[str] = ("user_id",),
):
    """Session-window aggregation (gap-based) — the streaming twin of
    queries.analytics.user_sessions."""
    return (
        stream.withWatermark(event_time_col, watermark)
        .groupBy(F.session_window(F.col(event_time_col), gap), *keys)
        .agg(F.count(F.lit(1)).alias("session_events"))
    )


def streaming_dedup(
    stream: DataFrame,
    key_cols: Sequence[str],
    event_time_col: str = "event_time",
    watermark: str = "1 hour",
) -> DataFrame:
    """Exact streaming dedup within the watermark horizon
    (dropDuplicatesWithinWatermark keeps state bounded — the 100 TB
    streaming-dedup primitive)."""
    return stream.withWatermark(event_time_col, watermark).dropDuplicatesWithinWatermark(list(key_cols))


def run_bounded(stream_df: DataFrame, sink_name: str, output_mode: str = "append") -> None:
    """Drain a bounded stream to a memory sink and wait (AvailableNow):
    the reference's 'bounded source terminates the pipeline' contract."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(sink_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
