"""Kafka streaming source & sink (SURVEY.md §2.1 S1/S2/S3).

Reference behavior being reproduced:
- source: topic ``payment_msg`` exposed as an unbounded table with
  ``scan.startup.mode = earliest-offset`` and JSON value format
  (reference: window_aggregation.py:35-42, 44-51);
- sink: result rows serialized as JSON objects to topic ``sink``
  (reference: window_aggregation.py:61-70, 83).

Spark-first design: ``spark.readStream.format("kafka")`` yields the fixed
Kafka schema (key/value binary, topic, partition, offset, timestamp); we
``from_json`` the value against a DECLARED schema with the reference's wire
timestamp format ``yyyy-MM-dd HH:mm:ss.SSS`` (generate_source_data.py:20) —
never schema inference. The sink is ``to_json(struct(...))`` + writeStream
with a checkpoint location (Spark's Kafka sink is at-least-once; the
reference does not configure exactly-once either — SURVEY.md §2.9 T5).

Scale: source parallelism = topic partitions (1 executor core per partition;
the reference used 1 partition + parallelism 1, compose.yaml:56). Use
``minPartitions`` to fan out hot topics beyond their partition count.

Requires the spark-sql-kafka package on the classpath
(``--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version>``);
no broker exists in the test container, so tests exercise the identical
parse/serialize plumbing through file/memory streams instead
(sources/files.py, tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ibis_flink_example_spark.session import REFERENCE_TIMESTAMP_FORMAT


def add_connector_jar(spark: SparkSession, jar_path: str) -> None:
    """Raw-SQL connector registration parity: the reference loads its Kafka
    connector with ``ADD JAR`` through the SQL surface
    (window_aggregation.py:20-22, ``t_env.execute_sql("ADD JAR ...")``).
    Spark exposes the identical statement; for a cluster deployment prefer
    ``--packages``/``--jars`` at submit time so executors fetch the jar
    before tasks schedule, but the runtime statement exists for session-
    scoped additions (e.g. a notebook attaching the Kafka connector)."""
    spark.sql(f"ADD JAR {jar_path}")


def read_kafka_json(
    spark: SparkSession,
    *,
    bootstrap_servers: str,
    topic: str,
    schema: T.StructType,
    starting_offsets: str = "earliest",
    timestamp_format: str = REFERENCE_TIMESTAMP_FORMAT,
    fail_on_data_loss: bool = False,
    min_partitions: int | None = None,
) -> DataFrame:
    """Kafka topic → typed streaming DataFrame (columns = declared schema).

    Mirrors the reference source table registration
    (window_aggregation.py:44-51): earliest offsets, JSON value decoded
    against an explicit schema.
    """
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .option("failOnDataLoss", str(fail_on_data_loss).lower())
    )
    if min_partitions is not None:
        reader = reader.option("minPartitions", str(min_partitions))
    raw = reader.load()
    return decode_json_value(raw, schema, timestamp_format)


def decode_json_value(
    raw: DataFrame, schema: T.StructType, timestamp_format: str = REFERENCE_TIMESTAMP_FORMAT
) -> DataFrame:
    """The S2 format layer: binary Kafka value → declared columns.

    Separated from the reader so the exact same decode path is testable
    without a broker (feed it any DataFrame with a ``value`` column).
    """
    parsed = F.from_json(
        F.col("value").cast("string"),
        schema,
        {"timestampFormat": timestamp_format},
    )
    return raw.select(parsed.alias("v")).select("v.*")


def encode_json_value(df: DataFrame, timestamp_format: str = REFERENCE_TIMESTAMP_FORMAT) -> DataFrame:
    """Row → single JSON ``value`` column (the sink's S2 dual,
    reference sink format config window_aggregation.py:65)."""
    return df.select(
        F.to_json(
            F.struct(*df.columns), {"timestampFormat": timestamp_format}
        ).alias("value")
    )


def write_kafka_json(
    df: DataFrame,
    *,
    bootstrap_servers: str,
    topic: str,
    checkpoint_location: str,
    output_mode: str = "append",
    trigger_available_now: bool = False,
):
    """Streaming JSON sink to a Kafka topic (reference sink table +
    INSERT INTO, window_aggregation.py:61-70,83). Returns the started
    StreamingQuery."""
    writer = (
        encode_json_value(df)
        .writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint_location)
        .outputMode(output_mode)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
