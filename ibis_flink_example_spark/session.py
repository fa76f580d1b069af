"""SparkSession construction conventions.

The reference configures its engine via ``EnvironmentSettings.in_streaming_mode()``
and ``parallelism.default`` (reference: window_aggregation.py:11-14). Our analog
is a SparkSession builder that bakes in the conventions every query in this
package assumes:

- AQE on (runtime re-planning, partition coalescing, skew-join splitting);
- Arrow on (vectorized Python<->JVM transfer for the few pandas-UDF paths);
- UTC session timezone (fixture timestamps are naive/UTC; keeps DuckDB-oracle
  comparisons and Kafka JSON round-trips stable);
- bounded shuffle partitions for local runs (overridable; on a real cluster AQE
  coalesces from a high initial number).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import SparkSession

# The reference wire format for timestamps in Kafka JSON messages
# (reference: generate_source_data.py:20).
REFERENCE_TIMESTAMP_FORMAT = "yyyy-MM-dd HH:mm:ss.SSS"

def _default_driver_mem() -> str:
    """Driver heap for LOCAL-mode sessions (r15, guide §5): unset, Spark
    defaults to 1g — a local[32] run then executes 32 concurrent tasks,
    every shuffle/broadcast/codegen cache, AND the scheduler inside ONE
    1 GiB JVM. Measured on the bench host (128 GiB RAM): constant GC
    pressure, 2-10x run-to-run timing swings, and spurious "Not enough
    memory to build and broadcast" failures. The default is
    min(24g, half of physical RAM) (ADVICE r15: an unconditional 24g
    would let the OS OOM-kill the JVM on smaller hosts instead of
    GC-throttling). Static conf — applies when this builder launches the
    JVM (bench.py, tests, examples); a cluster deployment sizes
    driver/executor memory in spark-submit and this value is ignored
    there. Overridable via SPARK_GRAFT_DRIVER_MEM."""
    env = os.environ.get("SPARK_GRAFT_DRIVER_MEM")
    if env:
        return env
    try:
        total = os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES")
        half_gib = int(total // (2 * 1024**3))
    except (ValueError, OSError, AttributeError):  # non-POSIX fallback
        half_gib = 24
    return f"{max(1, min(24, half_gib))}g"


DEFAULT_CONF = {
    "spark.driver.memory": _default_driver_mem(),
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    # Fixture parquet stores naive-µs timestamps (isAdjustedToUTC=false);
    # read them as plain TIMESTAMP, not TIMESTAMP_NTZ — the whole package
    # (range frames over unix_micros, watermarks, the DuckDB oracle) assumes
    # epoch-µs semantics under the UTC session timezone.
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
    # Files: pack small fixture files; on 100 TB this is the knob that sizes
    # scan tasks (128 MB default is right for a cluster; harmless locally).
    "spark.sql.files.maxPartitionBytes": "134217728",
    # Broadcast threshold: dims (region/nation/supplier/part) stay broadcast
    # even at sf100; AQE will also convert to broadcast at runtime.
    "spark.sql.autoBroadcastJoinThreshold": "64MB",
    "spark.sql.shuffle.partitions": "32",
}


def get_spark(
    app_name: str = "ibis-flink-example-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the conventional SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env) or ``local[*]``.
    On a cluster deployment the master comes from spark-submit and this builder
    only contributes conf.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    builder = SparkSession.builder.appName(app_name).master(master)
    conf = dict(DEFAULT_CONF)
    if shuffle_partitions is not None:
        conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def ship_package_to_workers(spark: SparkSession) -> None:
    """Make ``ibis_flink_example_spark`` importable inside Python workers.

    Worker processes don't inherit the driver's sys.path mutations, so any
    pandas-UDF / mapInPandas closure that (transitively) references this
    package by module would fail to unpickle when the driver's cwd is not
    the repo root. ``addPyFile`` distributes a zip of the package and puts
    it on every worker's sys.path — the same mechanism a spark-submit
    deployment would use (--py-files).
    """
    import zipfile

    global _SHIPPED
    if _SHIPPED:
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zip_path = os.path.join(
        tempfile.gettempdir(), f"ibis_flink_example_spark_{os.getpid()}.zip"
    )
    if not os.path.exists(zip_path):
        with zipfile.ZipFile(zip_path, "w") as zf:
            for root, _dirs, files in os.walk(pkg_dir):
                for fn in files:
                    if fn.endswith(".py"):
                        full = os.path.join(root, fn)
                        rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                        zf.write(full, rel)
    spark.sparkContext.addPyFile(zip_path)
    _SHIPPED = True


_SHIPPED = False


def apply_session_conf(spark: SparkSession) -> None:
    """Apply the runtime-settable subset of our conventions to an existing
    session (the driver hands us its own SparkSession for ``entry``/``queries``;
    static conf like memory can't change, but these can)."""
    for k in (
        "spark.sql.adaptive.enabled",
        "spark.sql.adaptive.coalescePartitions.enabled",
        "spark.sql.adaptive.skewJoin.enabled",
        "spark.sql.execution.arrow.pyspark.enabled",
        "spark.sql.session.timeZone",
        "spark.sql.parquet.inferTimestampNTZ.enabled",
    ):
        spark.conf.set(k, DEFAULT_CONF[k])
    ship_package_to_workers(spark)
