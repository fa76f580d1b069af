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
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

# Field derivations (all integer arithmetic on the global row index i):
#   orderId     = 1_700_000_000 + i
#   pay_cents   = (i * 9973) % 1_000_000_000   -> payAmount = cents / 100
#   payPlatform = 1 if i % 10 == 0 else 0      (the reference's 90/10 skew)
#   provinceId  = (i * 31) % 7                 (uniform over 7 provinces)
#   createTime  = 2024-01-01T00:00:00Z + i seconds (epoch 1_704_067_200)
BASE_ORDER_ID = 1_700_000_000
BASE_EPOCH_S = 1_704_067_200


class PaymentsReader(DataSourceReader):
    def __init__(self, n_rows: int, n_partitions: int):
        self.n_rows = n_rows
        self.n_partitions = n_partitions

    def partitions(self):
        return [InputPartition(p) for p in range(self.n_partitions)]

    def read(self, partition):
        import datetime

        p = partition.value
        # contiguous index ranges; the last partition takes the remainder
        per = self.n_rows // self.n_partitions
        lo = p * per
        hi = self.n_rows if p == self.n_partitions - 1 else lo + per
        for i in range(lo, hi):
            yield (
                datetime.datetime.utcfromtimestamp(BASE_EPOCH_S + i),
                BASE_ORDER_ID + i,
                ((i * 9973) % 1_000_000_000) / 100.0,
                1 if i % 10 == 0 else 0,
                (i * 31) % 7,
            )


class PaymentsDataSource(DataSource):
    """``spark.read.format("payments_gen").option("n_rows", N)`` — the
    reference workload as a deterministic, splittable Spark source."""

    @classmethod
    def name(cls) -> str:
        return "payments_gen"

    def schema(self) -> str:
        # the reference source schema (window_aggregation.py:25-33)
        return (
            "createTime timestamp, orderId long, payAmount double, "
            "payPlatform int, provinceId int"
        )

    def reader(self, schema) -> PaymentsReader:
        return PaymentsReader(
            n_rows=int(self.options.get("n_rows", 10_000)),
            n_partitions=int(self.options.get("n_partitions", 8)),
        )


def register(spark) -> None:
    """Idempotent registration of the source on a session."""
    spark.dataSource.register(PaymentsDataSource)
