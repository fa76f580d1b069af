#!/usr/bin/env python
"""Kafka payment-message generator — the compose-demo twin of the
reference's ``generate_source_data.py`` (reference basis:
generate_source_data.py:12-33 pushes one JSON payment per loop iteration
into the ``payment_msg`` topic).

Two differences, both deliberate:

- Records are DETERMINISTIC: every field derives from the global record
  index with the exact integer arithmetic of
  ibis_flink_example_spark/sources/python_datasource.py (one definition of
  the workload, shared by the in-engine Python Data Source, its DuckDB
  oracle, and this producer) instead of ``random.*`` — so a compose run is
  reproducible end to end.
- The Kafka client is ``kafka-python`` (what the reference's generator
  uses), import-guarded: this script is meant for the
  ``docker-compose.yml`` generator container (which pip-installs it), not
  for the library environment, which has no broker to talk to anyway.

Env: KAFKA_BOOTSTRAP (default kafka:29092), TOPIC (default payment_msg),
RATE (records/s, default 2 — the reference's pace), N (total records,
default unbounded).
"""

from __future__ import annotations

import datetime
import json
import os
import sys
import time

# INLINED from ibis_flink_example_spark/sources/python_datasource.py —
# importing the package would pull in pyspark, which the slim generator
# container deliberately does not install. tests/test_sources_api.py pins
# these copies equal to the package constants, so they cannot drift.
BASE_ORDER_ID = 1_700_000_000
BASE_EPOCH_S = 1_704_067_200

REFERENCE_TS_FMT = "%Y-%m-%d %H:%M:%S.%f"  # the reference's wire format


def payment_record(i: int) -> dict:
    """Record i — identical arithmetic to the in-engine payments source."""
    ts = datetime.datetime.fromtimestamp(
        BASE_EPOCH_S + i, tz=datetime.timezone.utc
    )
    return {
        "createTime": ts.strftime(REFERENCE_TS_FMT)[:-3],  # millis, like ref
        "orderId": BASE_ORDER_ID + i,
        "payAmount": ((i * 9973) % 1_000_000_000) / 100.0,
        "payPlatform": 1 if i % 10 == 0 else 0,
        "provinceId": (i * 31) % 7,
    }


def main() -> int:
    try:
        from kafka import KafkaProducer  # type: ignore[import-not-found]
    except ImportError:
        print(
            "kafka-python is not installed — this generator runs inside the "
            "docker-compose data-generator container (see docker-compose.yml)",
            file=sys.stderr,
        )
        return 2
    bootstrap = os.environ.get("KAFKA_BOOTSTRAP", "kafka:29092")
    topic = os.environ.get("TOPIC", "payment_msg")
    rate = float(os.environ.get("RATE", "2"))
    n = int(os.environ.get("N", "0")) or None
    producer = KafkaProducer(
        bootstrap_servers=bootstrap,
        value_serializer=lambda d: json.dumps(d).encode("utf-8"),
    )
    i = 0
    while n is None or i < n:
        producer.send(topic, payment_record(i))
        i += 1
        if i % 100 == 0:
            producer.flush()
        time.sleep(1.0 / rate)
    producer.flush()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
