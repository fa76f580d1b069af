"""Declared-schema utilities.

The reference declares every schema explicitly with ``ibis.schema({...})``
(reference: window_aggregation.py:25-33, 54-59) and never infers from data.
We keep that discipline: a tiny ibis-style type-string grammar → Spark types,
plus the canonical schemas of the reference's two stream tables.

At 100 TB explicit schemas are not a style choice: they save a full inference
pass, keep plans stable across runs, and let nested-column pruning work.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Scalar ibis-style type names → Spark types (SURVEY.md §1.3 mapping).
_SCALARS: dict[str, T.DataType] = {
    "int8": T.ByteType(),
    "int16": T.ShortType(),
    "int32": T.IntegerType(),
    "int64": T.LongType(),
    "float32": T.FloatType(),
    "float64": T.DoubleType(),
    "string": T.StringType(),
    "boolean": T.BooleanType(),
    "bool": T.BooleanType(),
    "date": T.DateType(),
    "binary": T.BinaryType(),
    "timestamp": T.TimestampType(),
    # Flink's timestamp(3) is ms-precision; Spark timestamps are µs — a strict
    # superset (SURVEY.md §1.3), so all precisions map to TimestampType.
    "timestamp(0)": T.TimestampType(),
    "timestamp(3)": T.TimestampType(),
    "timestamp(6)": T.TimestampType(),
}


def parse_type(name: str) -> T.DataType:
    """Parse an ibis-style type string (``int64``, ``array<float32>``,
    ``map<string,int64>``, ``decimal(18,2)``, ``struct<a:int64,b:string>``)."""
    s = name.strip().lower()
    if s in _SCALARS:
        return _SCALARS[s]
    if s.startswith("decimal(") and s.endswith(")"):
        p, sc = s[len("decimal(") : -1].split(",")
        return T.DecimalType(int(p), int(sc))
    if s.startswith("array<") and s.endswith(">"):
        return T.ArrayType(parse_type(s[len("array<") : -1]))
    if s.startswith("map<") and s.endswith(">"):
        k, v = _split_top(s[len("map<") : -1])
        return T.MapType(parse_type(k), parse_type(v))
    if s.startswith("struct<") and s.endswith(">"):
        fields = []
        for part in _split_all(s[len("struct<") : -1]):
            fname, ftype = part.split(":", 1)
            fields.append(T.StructField(fname.strip(), parse_type(ftype)))
        return T.StructType(fields)
    raise ValueError(f"unsupported type string: {name!r}")


def schema(cols: dict[str, str]) -> T.StructType:
    """ibis.schema analog: ordered name→type-string mapping → StructType."""
    return T.StructType([T.StructField(n, parse_type(t)) for n, t in cols.items()])


def _split_top(s: str) -> tuple[str, str]:
    parts = _split_all(s)
    if len(parts) != 2:
        raise ValueError(f"expected two type args in {s!r}")
    return parts[0], parts[1]


def _split_all(s: str) -> list[str]:
    """Split on top-level commas (not inside <> or ())."""
    parts, depth, cur = [], 0, []
    for ch in s:
        if ch in "<(":
            depth += 1
        elif ch in ">)":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur))
    return parts


# The reference's source stream schema (reference: window_aggregation.py:25-33).
PAYMENT_MSG_SCHEMA = schema(
    {
        "createTime": "timestamp(3)",
        "orderId": "int64",
        "payAmount": "float64",
        "payPlatform": "int32",
        "provinceId": "int32",
    }
)

# The reference's sink schema (reference: window_aggregation.py:54-59).
TOTAL_AMOUNT_SCHEMA = schema({"province_id": "int32", "pay_amount": "float64"})

# Driver fixture `events` — the streaming analog of payment_msg (FIXTURES.md B2).
EVENTS_SCHEMA = schema(
    {
        "event_id": "int64",
        "ts": "timestamp",
        "user_id": "int64",
        "event_type": "string",
        "value": "float64",
        "props": "string",
    }
)
