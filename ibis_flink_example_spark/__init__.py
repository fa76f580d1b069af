"""ibis_flink_example_spark — a PySpark-native analytics engine with the
capabilities of the ``claypotai/ibis-flink-example`` reference pipeline.

The reference (see /root/reference, SURVEY.md) is an Ibis-on-Flink streaming
example whose flagship computation is a per-row, event-time, range-bounded
over-window SUM over a Kafka JSON stream
(reference: window_aggregation.py:73-80).

This package re-expresses that surface — and a much wider operator inventory
(SURVEY.md §2) — Spark-first:

- ``session``    : SparkSession construction conventions (AQE, Arrow, UTC).
- ``schema``     : declared-schema utilities (ibis-style type strings → Spark).
- ``catalog``    : fixture/catalog table registration (parquet star schema).
- ``sources``    : batch + streaming sources/sinks (files, Kafka, rate, memory).
- ``operators``  : over-windows, time windows, joins (as-of/range), dedup,
                   similarity search, text analysis, multimodal columns.
- ``functions``  : scalar expression helpers (JVM-side built-ins only).
- ``streaming``  : Structured Streaming runtime (watermarks, the streaming
                   emulation of the flagship over-window, foreachBatch utils).
- ``plans``      : plan inspection/assertion helpers (pushdown, broadcast).
- ``queries``    : the query registry consumed by ``__spark_entry__.py``.

Everything operates on DataFrames in → DataFrames out; no collects inside
operators, state bounded by watermarks, shuffles always keyed — the 100 TB
posture is "never break Spark's parallelism".
"""

__version__ = "0.1.0"

from ibis_flink_example_spark.session import get_spark  # noqa: F401
