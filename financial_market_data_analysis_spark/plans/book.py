"""Deterministic synthetic order book derived from the generic event
stream — the oracle-testable stand-in for the reference's IEX DEEP feed
(getMarketData.py:82-136; schema spark_consumer.py:281-291).

The driver's correctness gate only provides the TPC-H-ish tables, so
the 7-level book (FIXTURES.md §B1) is *derived* from ``events`` with
expressions simple enough to mirror exactly in ANSI SQL: both engines
evaluate the identical IEEE expression tree, so the downstream feature
operators (F2-F7) can be hash-compared bit-for-bit.

Shapes exercised on purpose: ``size = id % k`` hits zero sizes (the
reference's zero-guards, spark_consumer.py:368-377) and occasionally
``bid_0_size + ask_0_size = 0`` (division-by-zero → NULL → fillna,
spark_consumer.py:347).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

LEVELS = 7  # 7 bid + 7 ask levels, config.py:36-37


def book_from_events(events: DataFrame, levels: int = LEVELS) -> DataFrame:
    """events → 7-level order book: prices fan out ±(i+1)/100 around
    ``value``; sizes are small deterministic moduli of the id columns.

    Price offsets are written as ``(i+1) / 100.0`` (not the Python
    literal ``0.01 * (i+1)``) so both engines derive the constant from
    one correctly-rounded IEEE division and the downstream doubles are
    bit-identical.
    """
    cols = {}
    for i in range(levels):
        off = F.lit(float(i + 1)) / F.lit(100.0)
        cols[f"bid_{i}"] = F.col("value") - off
        cols[f"ask_{i}"] = F.col("value") + off
        cols[f"bid_{i}_size"] = (F.col("event_id") % (7 + i)).cast("int")
        cols[f"ask_{i}_size"] = (F.col("user_id") % (5 + i)).cast("int")
    return events.select("event_id", "ts", "ts_us", "user_id", "value").withColumns(cols)


def book_oracle_cte(levels: int = LEVELS) -> str:
    """DuckDB CTE body mirroring ``book_from_events`` expression-for-
    expression (same IEEE constant derivation → same rounding)."""
    parts = []
    for i in range(levels):
        off = f"(CAST({i + 1} AS DOUBLE) / 100.0)"
        parts.append(f"value - {off} AS bid_{i}")
        parts.append(f"value + {off} AS ask_{i}")
        parts.append(f"CAST(event_id % {7 + i} AS INT) AS bid_{i}_size")
        parts.append(f"CAST(user_id % {5 + i} AS INT) AS ask_{i}_size")
    cols = ",\n        ".join(parts)
    return f"""
    SELECT event_id, ts, user_id, value,
        {cols}
    FROM events
    """
