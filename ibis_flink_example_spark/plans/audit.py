"""Physical-plan audit helpers — the 100 TB review checklist as code.

Every operator in this engine is reviewed against the same questions
(SURVEY.md §4 / the scale design rules in README): did the filter reach the
scan? are only the needed columns read? did the dim side broadcast? how many
exchanges does the keyed pipeline pay? These helpers turn those reviews into
assertions (see tests/test_plan_audits.py) so regressions in plan shape fail
CI instead of surfacing as a 3 a.m. shuffle explosion at scale.

All functions take a DataFrame and inspect its *optimized physical* plan via
``explain("formatted")``'s underlying string (cost-free — nothing executes).
"""

from __future__ import annotations

import re
from collections import Counter

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The formatted physical plan as a string (equivalent to
    ``df.explain("formatted")`` without printing)."""
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(mode)


def plan_ops_from_string(plan: str) -> Counter:
    """Physical operator histogram from an already-formatted plan string —
    the ONE definition of the node-line grammar (callers that already hold
    the string, like the fleet hygiene audit, must share it: a private
    copy would silently stop matching if the explain format ever changes
    while this one gets fixed)."""
    return Counter(re.findall(r"\(\d+\) ([A-Za-z]+)", plan))


def plan_ops(df: DataFrame) -> Counter:
    """Physical operator histogram, e.g. {'Exchange': 2, 'BroadcastHashJoin': 3}."""
    return plan_ops_from_string(formatted_plan(df))


def exchange_count(df: DataFrame) -> int:
    """Shuffle exchanges only (BroadcastExchange excluded — broadcasting a
    dim is the cheap alternative we WANT to see)."""
    return plan_ops(df)["Exchange"]


def broadcast_join_count(df: DataFrame) -> int:
    return plan_ops(df)["BroadcastHashJoin"] + plan_ops(df)["BroadcastNestedLoopJoin"]


def pushed_filter_scan_count(df: DataFrame) -> int:
    """Number of scans with at least one pushed-down filter."""
    return len(re.findall(r"PushedFilters: \[[^\]]", formatted_plan(df)))


def scan_columns(df: DataFrame) -> list[list[str]]:
    """Per-scan ReadSchema column lists — the column-pruning audit: a scan
    reading 16 columns for a 2-column projection is a bug at 100 TB."""
    out = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", formatted_plan(df)):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()]
        out.append(cols)
    return out


def executed_scan_metrics(df: DataFrame) -> list[dict]:
    """RUNTIME scan metrics (one dict per file scan) from an already-executed
    DataFrame — walks the adaptive executed plan into its query stages via
    py4j. Keys of interest for partition-pruning audits: ``numPartitions`` /
    ``numFiles`` (what the scan actually read after static + dynamic
    pruning) vs ``staticFilesNum`` (the pre-pruning file count). Unlike the
    ``formatted_plan`` helpers this requires the query to have RUN (dynamic
    pruning only resolves at execution time)."""
    out: list[dict] = []

    def walk(node):
        cls = node.getClass().getSimpleName()
        if "FileSourceScan" in cls or ("Scan" in node.nodeName() and "Batch" in cls):
            metrics = node.metrics()
            it = metrics.keysIterator()
            d = {}
            while it.hasNext():
                k = it.next()
                d[k] = metrics.apply(k).value()
            out.append(d)
        # adaptive wrappers hide the materialized plan behind accessors
        for accessor in ("executedPlan", "plan"):
            if "AdaptiveSparkPlan" in cls and accessor == "executedPlan" or (
                "QueryStage" in cls and accessor == "plan"
            ):
                try:
                    walk(getattr(node, accessor)())
                except Exception:
                    pass
        it = node.children().iterator()
        while it.hasNext():
            walk(it.next())

    walk(df._jdf.queryExecution().executedPlan())
    return out
