"""Scalar/aggregate expression helpers. JVM-side built-ins only — Python UDFs
are banned from hot paths (SURVEY.md §2.10; whole-stage codegen stays intact)."""

from ibis_flink_example_spark.functions.exact import (  # noqa: F401
    dec_avg,
    dec_sum,
    money,
)
