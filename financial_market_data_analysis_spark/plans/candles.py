"""Candle (OHLCV bar) construction from the generic event stream.

The reference receives pre-built bars from AlphaVantage
(getMarketData.py:139-248) and buckets every feed onto a 5-minute
tumbling key with ``floor(unix_timestamp(ts)/300)*300``
(spark_consumer.py:110-111 — operator F10). The engine generalizes
that: any (ts, value) stream → OHLCV bars via one partial-aggregatable
groupBy, which is how a 100 TB tick table becomes bars in one shuffle.

Determinism: open/close are selected with ``min_by``/``max_by`` on a
unique sequence column (event_id), not on ts, so results are stable
under duplicate timestamps in any engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BUCKET_SECONDS = 300  # 5-minute tumbling key, spark_consumer.py:110-111


def time_bucket(ts_col: str | Column, seconds: int = BUCKET_SECONDS) -> Column:
    """F10 — tumbling bucket key as epoch seconds (BIGINT).

    Kept as a long, not a timestamp, so the key is timezone-proof and
    cheap to hash-partition on.
    """
    c = F.col(ts_col) if isinstance(ts_col, str) else ts_col
    return (F.floor(F.unix_timestamp(c) / seconds) * seconds).cast("long")


def time_bucket_us(ts_us_col: str, seconds: int = BUCKET_SECONDS) -> Column:
    """F10 over an epoch-microseconds long column. Integer ``div`` keeps
    the arithmetic exact — epoch micros exceed double's 2^53 integer
    range, so float division could mis-bucket values near a boundary."""
    us = seconds * 1_000_000
    return F.expr(f"CAST(({ts_us_col} div {us}) * {seconds} AS BIGINT)")


def candles_from_events(
    events: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    seq_col: str = "event_id",
    bucket_seconds: int = BUCKET_SECONDS,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Aggregate a (seq, ts, value) stream into OHLCV bars per bucket.

    All six aggregates are partial-aggregatable (map-side combine), so
    the plan is scan → partial agg → single shuffle on bucket → final
    agg; no window functions, no sort. ``group_cols`` adds per-series
    keys (symbol) — the shape a 100 TB multi-symbol tick table needs so
    every downstream window can partition by symbol.
    """
    if "ts_us" in events.columns:
        bucket = time_bucket_us("ts_us", bucket_seconds).alias("bucket_start")
    else:
        bucket = time_bucket(ts_col, bucket_seconds).alias("bucket_start")
    return events.groupBy(*group_cols, bucket).agg(
        F.min_by(value_col, seq_col).alias("open"),
        F.max(value_col).alias("high"),
        F.min(value_col).alias("low"),
        F.max_by(value_col, seq_col).alias("close"),
        F.sum(value_col).alias("volume"),
        F.count(F.lit(1)).alias("n_events"),
    )


def candles_oracle_sql(bucket_seconds: int = BUCKET_SECONDS) -> str:
    """DuckDB-equivalent CTE body for ``candles_from_events`` over the
    pre-registered ``events`` view; reused by every indicator oracle."""
    return f"""
    SELECT
        CAST(epoch(time_bucket(INTERVAL '{bucket_seconds} seconds', ts)) AS BIGINT) AS bucket_start,
        arg_min(value, event_id) AS open,
        max(value) AS high,
        min(value) AS low,
        arg_max(value, event_id) AS close,
        sum(value) AS volume,
        count(*) AS n_events
    FROM events
    GROUP BY 1
    """
