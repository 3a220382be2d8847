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


@query(
    "streaming_kafka_feed",
    # The producer contract is deterministic (to_json of a 2-field struct,
    # constant topic, NULL key), so the Kafka path is VALUE-checked, not
    # rows-only: the oracle rebuilds the exact JSON payload per event.
    oracle="""
        SELECT 'sentiments' AS topic,
               CAST(NULL AS VARCHAR) AS key,
               '{"text":"' || event_type || '","sentiment":"' ||
                   CASE WHEN event_type IN ('fast', 'small', 'big') THEN 'POSITIVE'
                        WHEN event_type IN ('slow', 'error') THEN 'NEGATIVE'
                        ELSE 'NEUTRAL' END || '"}' AS value
        FROM events
    """,
    description="T5/S10: sentiment stream -> Kafka producer records (topic, key, value-JSON) via executor-side foreachBatch",
)
def streaming_kafka_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = ST.events_stream(spark, sf_dir)
    labeled = ST.sentiment_stream(stream, text_col="event_type")
    records: list = []
    ST.kafka_sink_via_foreach_batch(labeled, "sentiments", records)
    # records were serialized executor-side; this materialization exists
    # only to hand the driver a comparable DataFrame.
    return spark.createDataFrame(records, "topic string, key string, value string")
