"""Custom Python Data Source (Spark 4 `pyspark.sql.datasource` API): the
reference's payment workload generator re-expressed as a FIRST-CLASS Spark
source instead of an external Kafka producer script.

Reference basis: generate_source_data.py:12-33 builds one payment record per
loop iteration (orderId from epoch-seconds, payAmount uniform 0-100000,
payPlatform 90/10 skew, provinceId in [0,7)) and pushes it through Kafka.
This source produces the same record SHAPE, but derives every field with
pure integer arithmetic from the global row index — fully deterministic
across machines, partitionings, and engines, so a registered query over it
carries a complete DuckDB value oracle (`range()` + the same arithmetic)
rather than pinned literals.

Scale notes: partitions are independent index ranges (no coordination, no
driver data); a 1000-executor read generates rows in parallel exactly like
any splittable source. This is also the template for wrapping REAL custom
feeds (internal APIs, bespoke formats) as Spark sources: implement
``partitions()`` + ``read(partition)``, declare the schema, register.

Pickling contract (why the classes are built INSIDE factory functions):
registered DataSource classes are cloudpickled to separate Python
processes — executors for batch reads, and the driver-side streaming
source runner for stream reads. A module-top-level class is pickled BY
REFERENCE and the receiving process must be able to import this package;
the streaming runner (unlike executors, which get the package via
ship_package_to_workers) has no such path and fails with
ModuleNotFoundError. Defining the classes in a function body makes
cloudpickle serialize them BY VALUE — fully self-contained, importable
nowhere, runnable everywhere.
"""

from __future__ import annotations

# Field derivations (all integer arithmetic on the global row index i):
#   orderId     = 1_700_000_000 + i
#   pay_cents   = (i * 9973) % 1_000_000_000   -> payAmount = cents / 100
#   payPlatform = 1 if i % 10 == 0 else 0      (the reference's 90/10 skew)
#   provinceId  = (i * 31) % 7                 (uniform over 7 provinces)
#   createTime  = 2024-01-01T00:00:00Z + i seconds (epoch 1_704_067_200)
BASE_ORDER_ID = 1_700_000_000
BASE_EPOCH_S = 1_704_067_200


def _make_rows_fn():
    """Returns the record-derivation function as a CLOSURE-LOCAL function:
    module-level functions (like module-level classes) are cloudpickled by
    reference and would re-trigger the ModuleNotFoundError this module's
    pickling contract exists to avoid — a function defined inside a
    function serializes by value. One definition, shared by both factories
    through this helper."""
    base_order_id, base_epoch_s = BASE_ORDER_ID, BASE_EPOCH_S

    def payment_rows(lo: int, hi: int) -> list:
        import datetime

        utc = datetime.timezone.utc
        return [
            (
                # tz-aware (utcfromtimestamp is deprecated in 3.12+); the
                # session is pinned to UTC so the instant is identical
                datetime.datetime.fromtimestamp(base_epoch_s + i, tz=utc),
                base_order_id + i,
                ((i * 9973) % 1_000_000_000) / 100.0,
                1 if i % 10 == 0 else 0,
                (i * 31) % 7,
            )
            for i in range(lo, hi)
        ]

    return payment_rows


_PAYMENTS_SCHEMA = (
    "createTime timestamp, orderId long, payAmount double, "
    "payPlatform int, provinceId int"
)


def make_payments_source():
    """Factory for the BATCH source class (see module docstring for why
    the class is function-local)."""
    from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

    _payment_rows = _make_rows_fn()

    class PaymentsReader(DataSourceReader):
        def __init__(self, n_rows: int, n_partitions: int):
            self.n_rows = n_rows
            self.n_partitions = n_partitions

        def partitions(self):
            return [InputPartition(p) for p in range(self.n_partitions)]

        def read(self, partition):
            p = partition.value
            # contiguous index ranges; the last partition takes the remainder
            per = self.n_rows // self.n_partitions
            lo = p * per
            hi = self.n_rows if p == self.n_partitions - 1 else lo + per
            return iter(_payment_rows(lo, hi))

    class PaymentsDataSource(DataSource):
        """``spark.read.format("payments_gen").option("n_rows", N)`` — the
        reference workload as a deterministic, splittable Spark source."""

        @classmethod
        def name(cls) -> str:
            return "payments_gen"

        def schema(self) -> str:
            # the reference source schema (window_aggregation.py:25-33)
            return _PAYMENTS_SCHEMA

        def reader(self, schema) -> PaymentsReader:
            return PaymentsReader(
                n_rows=int(self.options.get("n_rows", 10_000)),
                n_partitions=int(self.options.get("n_partitions", 8)),
            )

    return PaymentsDataSource


def make_payments_stream_source():
    """Factory for the STREAMING source class: offsets are plain row
    indices, ``read`` serves [start, start+batch) and advances,
    ``readBetweenOffsets`` replays deterministically for recovery. An
    availableNow drain captures what ``read`` returns from the initial
    offset — one batch — so the registered query sets batch = n_rows for
    a complete deterministic drain; incremental multi-batch semantics are
    exercised by the file-source streaming family instead."""
    from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

    _payment_rows = _make_rows_fn()

    class PaymentsStreamReader(SimpleDataSourceStreamReader):
        def __init__(self, n_rows: int, batch: int):
            self.n_rows = n_rows
            self.batch = batch

        def initialOffset(self):
            return {"i": 0}

        def read(self, start):
            # the returned iterator is PICKLED onward — a concrete list
            # iterator, never a generator (unpicklable)
            lo = start["i"]
            hi = min(lo + self.batch, self.n_rows)
            return iter(_payment_rows(lo, hi)), {"i": hi}

        def readBetweenOffsets(self, start, end):
            return iter(_payment_rows(start["i"], end["i"]))

    class PaymentsStreamDataSource(DataSource):
        """``spark.readStream.format("payments_stream_gen")`` — the
        workload generator as a custom STREAMING source with replayable
        offsets."""

        @classmethod
        def name(cls) -> str:
            return "payments_stream_gen"

        def schema(self) -> str:
            return _PAYMENTS_SCHEMA

        def simpleStreamReader(self, schema) -> PaymentsStreamReader:
            return PaymentsStreamReader(
                n_rows=int(self.options.get("n_rows", 10_000)),
                batch=int(self.options.get("batch", 10_000)),
            )

    return PaymentsStreamDataSource


def register(spark) -> None:
    """Idempotent registration of the batch source on a session."""
    spark.dataSource.register(make_payments_source())


def register_stream(spark) -> None:
    """Idempotent registration of the streaming source on a session."""
    spark.dataSource.register(make_payments_stream_source())
