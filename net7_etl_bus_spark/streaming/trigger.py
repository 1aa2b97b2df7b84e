"""Event-driven trigger source (reference S1: the Service Bus queue).

The reference parks a worker on an Azure Service Bus queue; each
message ``{"ForceRun": bool}`` fires one ETL run
(ServiceBusWorker.cs:53-57, 87-94). The Spark-native equivalent is a
Structured Streaming source of trigger messages consumed in
``foreachBatch`` — each micro-batch's messages each fire one run of
:func:`net7_etl_bus_spark.pipeline.run_etl`.

Transport: in production this is ``spark.readStream.format("kafka")``
(or the Event Hubs connector) — swap ``read_trigger_stream``'s format
and the ``value`` extraction; everything downstream is identical. In
this container (no broker) the queue is a drop-directory of JSON-lines
files, which is itself a legitimate Spark queue pattern (file source
tracks processed files exactly-once in the checkpoint).

Delivery semantics: the file-source checkpoint gives at-least-once
delivery into foreachBatch; the run body is idempotent (checksum gate
+ keyed MERGE), so replays converge — strictly stronger than the
reference, which completes the message even when the run throws
(at-most-once, ServiceBusWorker.cs:150-155).
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..pipeline import RunResult, run_etl
from ..schemas import TRIGGER_MESSAGE_SCHEMA


def send_trigger(queue_dir: str, force_run: bool = False) -> str:
    """Producer side: enqueue one trigger message (a one-line JSON
    file — the Service Bus ``SendMessageAsync`` analog)."""
    os.makedirs(queue_dir, exist_ok=True)
    path = os.path.join(queue_dir, f"trigger-{time.time_ns()}.json")
    tmp = path + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        f.write(json.dumps({"ForceRun": force_run}) + "\n")
    os.rename(tmp, path)  # atomic publish: the stream never sees partial files
    return path


KAFKA_TRIGGER_TOPIC = "etl-bus-triggers"
KAFKA_BOOTSTRAP_ENV = "ETL_BUS_KAFKA_BOOTSTRAP"


def parse_trigger_frame(raw: DataFrame) -> DataFrame:
    """``value`` payload column -> ``ForceRun`` boolean rows.

    The one transform both transports share: Kafka delivers
    ``value: binary``, the file queue delivers ``value: string`` —
    everything from here down (foreachBatch, run_etl dispatch) is
    transport-agnostic. Unparseable or null payloads coalesce to
    ForceRun=false, the reference's default message body
    (ServiceBusWorker.cs:87-94)."""
    return raw.select(
        F.from_json(F.col("value").cast("string"), TRIGGER_MESSAGE_SCHEMA).alias("m")
    ).select(F.coalesce(F.col("m.ForceRun"), F.lit(False)).alias("ForceRun"))


def kafka_trigger_options(bootstrap: str, topic: str = KAFKA_TRIGGER_TOPIC) -> dict:
    """The broker-path reader options (unit-testable without a broker)."""
    return {
        "kafka.bootstrap.servers": bootstrap,
        "subscribe": topic,
        "startingOffsets": "earliest",
        # replays are safe: the run body is idempotent (gate + MERGE)
        "failOnDataLoss": "false",
    }


def read_trigger_stream(
    spark: SparkSession,
    queue_dir: str | None = None,
    kafka_bootstrap: str | None = None,
    kafka_topic: str = KAFKA_TRIGGER_TOPIC,
) -> DataFrame:
    """The queue as an unbounded DataFrame of parsed trigger messages.

    Transport is flag-selected: pass ``kafka_bootstrap`` (or set
    $ETL_BUS_KAFKA_BOOTSTRAP) for the broker path —
    ``readStream.format("kafka")`` with the options from
    :func:`kafka_trigger_options`, requiring the spark-sql-kafka
    connector on the cluster — else ``queue_dir`` for the file-drop
    queue (the container/test default). Both feed the identical
    :func:`parse_trigger_frame` wiring."""
    kafka_bootstrap = kafka_bootstrap or os.environ.get(KAFKA_BOOTSTRAP_ENV)
    if kafka_bootstrap:
        raw = (
            spark.readStream.format("kafka")
            .options(**kafka_trigger_options(kafka_bootstrap, kafka_topic))
            .load()
        )
        return parse_trigger_frame(raw)
    if queue_dir is None:
        raise ValueError("either queue_dir or kafka_bootstrap is required")
    os.makedirs(queue_dir, exist_ok=True)
    raw = (
        spark.readStream
        .option("maxFilesPerTrigger", 16)  # backpressure: bounded runs per batch
        .text(queue_dir)
    )
    return parse_trigger_frame(raw)


def process_triggers_available_now(
    spark: SparkSession,
    queue_dir: str,
    checkpoint_dir: str,
    csv_path: str,
    target_path: str,
    control_path: str,
    on_run: Callable[[RunResult], None] | None = None,
    **run_kwargs,
) -> list[RunResult]:
    """Drain the queue with Trigger.AvailableNow and fire one ETL run
    per message (the reference's message->run mapping). Returns the
    RunResults in processing order.

    foreachBatch collects only the tiny trigger rows — never data —
    and the per-message run bodies execute as normal batch jobs on the
    cluster, exactly like the reference's worker loop but with Spark's
    checkpointed exactly-once file tracking instead of queue peeks.
    """
    results: list[RunResult] = []

    def handle_batch(batch_df: DataFrame, batch_id: int) -> None:
        for row in batch_df.collect():  # trigger messages: O(handful)
            res = run_etl(
                spark,
                csv_path,
                target_path,
                control_path,
                force_run=bool(row["ForceRun"]),
                **run_kwargs,
            )
            results.append(res)
            if on_run:
                on_run(res)

    q = (
        read_trigger_stream(spark, queue_dir)
        .writeStream.foreachBatch(handle_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return results


# --- incremental aggregation into a keyed sink ------------------------


def stream_counts_upsert(
    spark: SparkSession,
    events_dir: str,
    target_path: str,
    checkpoint: str,
    schema=None,
) -> None:
    """Streaming incremental aggregation: per-micro-batch partial
    counts MERGEd into a keyed table, replay-idempotent.

    Pattern: each batch writes rows keyed by (event_type, batch_id) —
    a REPLAYED batch (failure between sink write and checkpoint commit,
    the at-least-once window) recomputes the identical partial and the
    MERGE overwrites it with the same values instead of double
    counting. Readers aggregate partials with :func:`read_counts`.
    This is the scalable form of "foreachBatch maintains an aggregate
    table": the state lives in the (partition-prunable) sink, not in
    unbounded stream state, and each batch touches only its own keys.
    """
    from ..schemas import EVENTS_SCHEMA
    from ..sources.sinks import upsert_parquet

    stream = spark.readStream.schema(schema or EVENTS_SCHEMA).json(events_dir)

    def merge_batch(batch_df, batch_id: int) -> None:
        partial = (
            batch_df.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n_events"))
            .withColumn("batch_id", F.lit(batch_id).cast("bigint"))
            .withColumn(
                "merge_key", F.concat_ws("#", "event_type", F.lit(str(batch_id)))
            )
        )
        upsert_parquet(
            spark, partial, target_path, key="merge_key", preserve_on_update=()
        )

    q = (
        stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_counts(spark: SparkSession, target_path: str) -> DataFrame:
    """Aggregate the per-batch partials to current totals."""
    return (
        spark.read.parquet(target_path)
        .groupBy("event_type")
        .agg(F.sum("n_events").alias("n_events"))
    )
