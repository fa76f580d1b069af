"""File sources (SURVEY.md §2.1 S8): batch + streaming parquet/CSV/JSON with
declared schemas, plus a normalizing parquet reader for nanosecond timestamps.

Nanosecond handling: parquet TIMESTAMP(NANOS) (pandas-written fixtures like
``events.ts``) is rejected by Spark's vectorized reader. We flip the session
conf ``spark.sql.legacy.parquet.nanosAsLong`` to read such columns as int64
epoch-nanos, then convert with integer division to µs TimestampType —
truncation toward negative infinity on positive epochs, exactly matching what
DuckDB does when it lowers ns→µs for its TIMESTAMP. Integer ``div`` (not
float ``/``) is essential: epoch-ns ≈ 1.7e18 > 2^53 loses µs precision as a
double.
"""

from __future__ import annotations

import functools

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ibis_flink_example_spark.session import REFERENCE_TIMESTAMP_FORMAT


@functools.lru_cache(maxsize=256)
def _nanos_timestamp_columns(path: str) -> tuple[str, ...]:
    """Columns PHYSICALLY stored as INT64 TIMESTAMP(NANOS) in the parquet
    footer (driver-side metadata read — one footer, not data).

    The physical type matters: pyarrow reports Spark's default INT96
    timestamps as ``timestamp[ns]`` too, but Spark reads INT96 natively as
    TimestampType — routing INT96 files down the nanosAsLong+div-1000
    lowering would crash on a TIMESTAMP/BIGINT type mismatch. Only the
    INT64-nanos annotation (what the round-≤3 fixtures used) needs the
    lowering."""
    import pyarrow.dataset as ds
    import pyarrow.parquet as pq
    import pyarrow.types as pt

    dataset = ds.dataset(path, format="parquet")
    ns_logical = {
        f.name for f in dataset.schema if pt.is_timestamp(f.type) and f.type.unit == "ns"
    }
    if not ns_logical:
        return ()

    def physical_int64(file_path: str) -> frozenset[str]:
        meta = pq.ParquetFile(file_path).metadata.schema
        return frozenset(
            meta.column(i).name
            for i in range(len(meta))
            if meta.column(i).physical_type == "INT64"
        ) & ns_logical

    # Every footer must agree on which ns-logical columns are physically
    # INT64: a multi-file dataset with heterogeneous writers (some INT96,
    # some INT64-nanos) cannot take a single decode path — half the files
    # would crash or silently corrupt timestamps. Footer reads are
    # driver-side metadata only (no data I/O); at 100 TB this is one
    # ~KB-scale read per file, the same cost planning already pays for
    # row-group pruning. Raising beats guessing.
    decisions = {f: physical_int64(f) for f in dataset.files}
    distinct = set(decisions.values())
    if len(distinct) > 1:
        raise ValueError(
            f"heterogeneous parquet timestamp physical types under {path}: "
            f"files disagree on INT64-nanos columns "
            f"({dict(list(decisions.items())[:4])} ...); re-write the "
            "dataset with one writer configuration"
        )
    int64_cols = next(iter(distinct)) if distinct else frozenset()
    return tuple(c for c in ns_logical if c in int64_cols)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Parquet scan that transparently normalizes timestamps to Spark µs
    TimestampType (LTZ).

    Two parquet shapes need lowering:

    - TIMESTAMP(NANOS): rejected by the vectorized reader; read as int64
      epoch-nanos via ``nanosAsLong`` then integer-divided to µs (see module
      docstring).
    - TIMESTAMP(MICROS, isAdjustedToUTC=false): Spark 4 infers TIMESTAMP_NTZ
      by default, which breaks every ``unix_micros``/range-frame consumer in
      this package. We disable NTZ inference so naive-µs columns read as
      plain TIMESTAMP — with the session pinned to UTC (session.py) the
      stored micros ARE the epoch micros, which is exactly how the DuckDB
      oracle treats the same naive values.

    The conversions are conf + a codegen'd projection on top of the scan;
    column pruning and predicate pushdown on all other columns are unaffected.
    """
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    ns_cols = _nanos_timestamp_columns(path)
    if not ns_cols:
        df = spark.read.parquet(path)
    else:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        for c in ns_cols:
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    # Defense-in-depth: if any column still analyzed as NTZ (e.g. a session
    # where the conf landed after schema inference), cast it; with a UTC
    # session timezone this is value-preserving.
    ntz = [f.name for f in df.schema.fields if isinstance(f.dataType, T.TimestampNTZType)]
    for c in ntz:
        df = df.withColumn(c, F.col(c).cast(T.TimestampType()))
    return df


def read_csv(
    spark: SparkSession, path: str, schema: T.StructType, header: bool = True
) -> DataFrame:
    """CSV with a declared schema — never inferSchema (SURVEY.md §1.4)."""
    return (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("timestampFormat", REFERENCE_TIMESTAMP_FORMAT)
        .csv(path)
    )


def read_jsonl(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """JSON-lines with a declared schema and the reference wire format for
    timestamps (reference: generate_source_data.py:20)."""
    return (
        spark.read.schema(schema)
        .option("timestampFormat", REFERENCE_TIMESTAMP_FORMAT)
        .json(path)
    )


def read_orc(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """ORC with a declared schema (S8 family; same never-infer contract as
    CSV/JSONL). ORC stores µs timestamps with zone metadata — under the
    UTC-pinned session (session.py) values round-trip bit-exactly, and the
    columnar reader keeps pruning/pushdown like parquet."""
    return spark.read.schema(schema).orc(path)


def stream_parquet_dir(
    spark: SparkSession, path: str, schema: T.StructType, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Streaming file source: treats a directory of parquet files as an
    unbounded table (the batch analog of the reference's Kafka source S1)."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(path)


def stream_jsonl_dir(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    return (
        spark.readStream.schema(schema)
        .option("timestampFormat", REFERENCE_TIMESTAMP_FORMAT)
        .json(path)
    )
