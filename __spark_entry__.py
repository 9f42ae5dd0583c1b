"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Query keys map to SURVEY.md §2 operator IDs (W1-W8 window indicators,
F-features, J1 interval join, A aggregates, D dedup) plus the scale
extensions (dedup / similarity / text over documents+embeddings).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from financial_market_data_analysis_spark.operators import windows as W
from financial_market_data_analysis_spark.plans.candles import (
    candles_from_events,
    candles_oracle_sql,
)
from financial_market_data_analysis_spark.sources.batch import load_table

# ---------------------------------------------------------------------------
# helpers


def _candles(spark: SparkSession, sf_dir: str) -> DataFrame:
    return candles_from_events(load_table(spark, "events", sf_dir))


_ORDER = ["bucket_start"]

# DuckDB CTE prefix shared by every indicator oracle.
_CANDLES_CTE = f"WITH candles AS ({candles_oracle_sql()})"


# ---------------------------------------------------------------------------
# queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: TPC-H-Q1-style pricing summary
    (A2/A3-class grouped aggregation, SURVEY.md §2.5) — one shuffle,
    map-side partial aggregation."""
    return _q1_pricing_summary(spark, "/root/testdata/sf0.001")


def _q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum("l_extendedprice").alias("sum_base_price"),
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("sum_disc_price"),
            F.sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
            ).alias("sum_charge"),
            F.avg("l_quantity").alias("avg_qty"),
            F.avg("l_extendedprice").alias("avg_price"),
            F.avg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def _candles_5min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F10 time bucketing + deterministic OHLCV aggregation."""
    return _candles(spark, sf_dir)


def _w1_vol_ma(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = W.moving_average(_candles(spark, sf_dir), "volume", (6, 20), _ORDER, prefix="vol")
    return df.select("bucket_start", "volume", "vol_MA6", "vol_MA20")


def _w2_price_ma(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = W.moving_average(_candles(spark, sf_dir), "close", (20,), _ORDER, prefix="price")
    return df.select("bucket_start", "close", "price_MA20")


def _w4_bollinger(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = W.bollinger_bands(_candles(spark, sf_dir), "close", _ORDER)
    return df.select("bucket_start", "close", "upper_BB_dist", "lower_BB_dist")


def _w5_stochastic(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = W.stochastic_oscillator(_candles(spark, sf_dir), "close", _ORDER)
    return df.select("bucket_start", "close", "stoch")


def _w6_price_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = W.price_change(_candles(spark, sf_dir), "close", _ORDER)
    return df.select("bucket_start", "close", "price_change")


def _w7_atr(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = W.average_true_range(_candles(spark, sf_dir), "high", "low", _ORDER)
    return df.select("bucket_start", "high", "low", "ATR")


def _w8_targets(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = W.average_true_range(_candles(spark, sf_dir), "high", "low", _ORDER)
    df = W.forward_targets(df, "close", "ATR", _ORDER)
    return df.select("bucket_start", "close", "up1", "down1", "up2", "down2")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "q1_pricing_summary": _q1_pricing_summary,
        "candles_5min": _candles_5min,
        "w1_vol_ma": _w1_vol_ma,
        "w2_price_ma": _w2_price_ma,
        "w4_bollinger": _w4_bollinger,
        "w5_stochastic": _w5_stochastic,
        "w6_price_change": _w6_price_change,
        "w7_atr": _w7_atr,
        "w8_targets": _w8_targets,
    }


# ---------------------------------------------------------------------------
# oracles (DuckDB ANSI SQL over pre-registered views)


def oracle_sql() -> dict[str, str]:
    return {
        "q1_pricing_summary": """
            SELECT
                l_returnflag,
                l_linestatus,
                sum(l_quantity) AS sum_qty,
                sum(l_extendedprice) AS sum_base_price,
                sum(l_extendedprice * (1 - l_discount)) AS sum_disc_price,
                sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)) AS sum_charge,
                avg(l_quantity) AS avg_qty,
                avg(l_extendedprice) AS avg_price,
                avg(l_discount) AS avg_disc,
                count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
        """,
        "candles_5min": candles_oracle_sql(),
        "w1_vol_ma": f"""
            {_CANDLES_CTE}
            SELECT bucket_start, volume,
                avg(volume) OVER (ORDER BY bucket_start
                    ROWS BETWEEN 5 PRECEDING AND CURRENT ROW) AS vol_MA6,
                avg(volume) OVER (ORDER BY bucket_start
                    ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS vol_MA20
            FROM candles
        """,
        "w2_price_ma": f"""
            {_CANDLES_CTE}
            SELECT bucket_start, close,
                avg(close) OVER (ORDER BY bucket_start
                    ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS price_MA20
            FROM candles
        """,
        "w4_bollinger": f"""
            {_CANDLES_CTE}
            SELECT bucket_start, close,
                (avg(close) OVER w20 + 2 * stddev_pop(close) OVER w20) - close AS upper_BB_dist,
                close - (avg(close) OVER w20 - 2 * stddev_pop(close) OVER w20) AS lower_BB_dist
            FROM candles
            WINDOW w20 AS (ORDER BY bucket_start ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
        """,
        "w5_stochastic": f"""
            {_CANDLES_CTE}
            SELECT bucket_start, close,
                (close - min(close) OVER w15) / (max(close) OVER w15 - min(close) OVER w15) AS stoch
            FROM candles
            WINDOW w15 AS (ORDER BY bucket_start ROWS BETWEEN 14 PRECEDING AND CURRENT ROW)
        """,
        "w6_price_change": f"""
            {_CANDLES_CTE}
            SELECT bucket_start, close,
                close - lag(close, 1) OVER (ORDER BY bucket_start) AS price_change
            FROM candles
        """,
        "w7_atr": f"""
            {_CANDLES_CTE}
            SELECT bucket_start, high, low,
                avg(high - low) OVER (ORDER BY bucket_start
                    ROWS BETWEEN 14 PRECEDING AND CURRENT ROW) AS ATR
            FROM candles
        """,
        "w8_targets": f"""
            {_CANDLES_CTE},
            atr AS (
                SELECT *, avg(high - low) OVER (ORDER BY bucket_start
                    ROWS BETWEEN 14 PRECEDING AND CURRENT ROW) AS ATR
                FROM candles
            )
            SELECT bucket_start, close,
                CASE WHEN lead(close, 8) OVER w >= close + 1.5 * ATR THEN 1 ELSE 0 END AS up1,
                CASE WHEN lead(close, 8) OVER w <= close - 1.5 * ATR THEN 1 ELSE 0 END AS down1,
                CASE WHEN lead(close, 15) OVER w >= close + 3 * ATR THEN 1 ELSE 0 END AS up2,
                CASE WHEN lead(close, 15) OVER w <= close - 3 * ATR THEN 1 ELSE 0 END AS down2
            FROM atr
            WINDOW w AS (ORDER BY bucket_start)
        """,
    }
