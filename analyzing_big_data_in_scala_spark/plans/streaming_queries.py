"""Streaming queries (SURVEY.md §2.10 T1-T6), drained deterministically via
`availableNow` so they are batch-comparable — the windowed aggregate's
oracle is the SAME SQL as the batch tumbling-window query, proving
stream/batch equivalence (SURVEY.md §5.6).
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..streaming import stream as ST
from .registry import query


@query(
    "streaming_tumbling_counts",
    oracle="""
        SELECT CAST(FLOOR(epoch(ts) / 600) AS BIGINT) AS bucket,
               event_type,
               COUNT(*) AS n,
               ROUND(SUM(value), 4) AS sum_value
        FROM events
        GROUP BY bucket, event_type
    """,
    description="Structured Streaming tumbling window + watermark == batch result (T1-T5 + extension)",
)
def streaming_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = ST.events_stream(spark, sf_dir)
    result = ST.windowed_counts(stream)
    table = f"stream_tumbling_{uuid.uuid4().hex[:8]}"
    return ST.run_available_now(result, table)


@query(
    "streaming_first_seen_per_user",
    oracle="""
        SELECT user_id, MIN(event_id) AS first_event_id
        FROM events
        GROUP BY user_id
    """,
    description="Custom stateful streaming dedup via applyInPandasWithState: first event per user",
)
def streaming_first_seen_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.stateful import first_seen_per_user

    stream = ST.events_stream(spark, sf_dir)
    result = first_seen_per_user(stream)
    table = f"stream_firstseen_{uuid.uuid4().hex[:8]}"
    q = (
        result.writeStream.outputMode("update")
        .format("memory")
        .queryName(table)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(table)


@query(
    "streaming_sentiment_counts",
    oracle="""
        SELECT CASE WHEN event_type IN ('error') THEN 'NEGATIVE'
                    ELSE 'NEUTRAL' END AS sentiment,
               COUNT(*) AS n
        FROM events
        GROUP BY sentiment
        ORDER BY sentiment
    """,
    description="T2/T3 stateless sentiment transform over the stream, counted per label",
)
def streaming_sentiment_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = ST.events_stream(spark, sf_dir)
    labeled = ST.sentiment_stream(stream, text_col="event_type")
    result = labeled.groupBy("sentiment").agg(F.count("*").alias("n"))
    table = f"stream_sentiment_{uuid.uuid4().hex[:8]}"
    return ST.run_available_now(result, table).orderBy("sentiment")
