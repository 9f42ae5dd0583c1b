"""The flagship warehouse-assembly pipeline — the engine's equivalent of
the reference's whole dataflow (SURVEY.md §3.1-3.2) in one batch plan:

    5 pseudo-feeds (split from ``events`` by event_type)
      → per-bucket feed aggregation                (F10 + producer cadence)
      → 4-way equi-join on the bucket              (J1/J2 assembly)
      → order-book + candle + calendar features    (F1-F9)
      → W1-W8 indicator suite + forward targets    (the 8 MariaDB views)
      → fillna(0)                                  (P4)

One wide row per bucket — the ``stock_data_joined`` + ``join_statement``
analog (create_database.py:240-258), with every half of the reference's
split engine expressed in the same Spark plan.

Scale shape: feed aggregation is partial-aggregatable (one shuffle per
feed on the bucket key); the joins are equi-joins on that same key, so
with the feeds co-partitioned AQE collapses them into co-located joins;
the window suite is the only ordered stage (partition it by symbol/day
at real scale — here one series, reference parity).

The 6-hour bucket (vs the reference's 5 minutes) matches the driver
data's event density so every feed has rows in most buckets; the
operator chain is bucket-size-agnostic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from financial_market_data_analysis_spark.functions import features as FE
from financial_market_data_analysis_spark.operators.windows import indicator_suite
from financial_market_data_analysis_spark.plans.book import book_from_events, book_oracle_cte
from financial_market_data_analysis_spark.plans.candles import time_bucket_us
from financial_market_data_analysis_spark.sources.batch import load_table

PIPELINE_BUCKET_SECONDS = 21_600  # 6 h — see module docstring

_FEED_TYPES = {
    "deep": "purchase",
    "candle": "click",
    "vix": "view",
    "cot": "signup",
    "ind": "error",
}


def _feed(events: DataFrame, kind: str, group_cols: tuple[str, ...] = ()) -> DataFrame:
    """Per-bucket feed aggregation. ``group_cols`` prepends series keys
    (e.g. a symbol) to every groupBy — the partitioned-scale path where
    each series aggregates and windows independently instead of one
    global ordered stream (SURVEY.md §7.3)."""
    b = time_bucket_us("ts_us", PIPELINE_BUCKET_SECONDS).alias("bucket_start")
    keys = [F.col(c) for c in group_cols] + [b]
    f = events.filter(F.col("event_type") == _FEED_TYPES[kind])
    if kind == "deep":
        # representative snapshot per bucket (earliest event), then the
        # synthetic 7-level book is derived from it
        return f.groupBy(*keys).agg(
            F.min("event_id").alias("event_id"),
            F.min_by("value", "event_id").alias("value"),
            F.min_by("user_id", "event_id").alias("user_id"),
        )
    if kind == "candle":
        return f.groupBy(*keys).agg(
            F.min_by("value", "event_id").alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", "event_id").alias("close"),
            F.count(F.lit(1)).alias("volume"),
        )
    if kind == "vix":
        return f.groupBy(*keys).agg(F.min_by("value", "event_id").alias("vix"))
    if kind == "cot":
        return f.groupBy(*keys).agg(
            F.min_by("value", "event_id").alias("cot_pos"),
            F.avg("value").alias("cot_chg"),
        )
    if kind == "ind":
        return f.groupBy(*keys).agg(
            F.sum("value").alias("ind_actual"),
            F.count(F.lit(1)).alias("ind_count"),
        )
    raise ValueError(kind)


def bars_joined(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)

    deep = _feed(ev, "deep")
    # book columns + book-derived features from the deep snapshot
    book = book_from_events(
        deep.withColumns({"ts": F.timestamp_seconds("bucket_start"), "ts_us": F.col("bucket_start") * 1_000_000})
    ).drop("ts", "ts_us")
    book = deep.select("bucket_start", "event_id").join(
        book, "event_id"
    )
    book = FE.book_weighted_average(book, "bid")
    book = FE.book_weighted_average(book, "ask")
    book = FE.order_volume_imbalance(book)
    book = FE.delta_indicator(book)
    book = FE.micro_price(book)
    book = FE.bid_ask_spread(book)
    deep_feats = book.select(
        "bucket_start", "bids_ord_WA", "asks_ord_WA", "vol_imbalance",
        "delta", "micro_price", "spread",
    )

    candle = FE.wick_features(_feed(ev, "candle"))
    bars = (
        candle.join(deep_feats, "bucket_start")
        .join(_feed(ev, "vix"), "bucket_start")
        .join(_feed(ev, "cot"), "bucket_start")
        .join(_feed(ev, "ind"), "bucket_start")
    )

    bars = FE.one_hot_calendar(
        FE.calendar_features(
            bars.withColumn("ts", F.timestamp_seconds("bucket_start"))
        )
    ).drop("ts")

    bars = indicator_suite(bars, ["bucket_start"], delta_col="delta")
    out_cols = [
        "bucket_start", "open", "high", "low", "close", "volume",
        "candle_size", "wick_size", "wick_prct",
        "bids_ord_WA", "asks_ord_WA", "vol_imbalance", "delta",
        "micro_price", "spread",
        "vix", "cot_pos", "cot_chg", "ind_actual", "ind_count",
        "day_of_week", "week_of_month", "session_start",
        "day_1", "day_2", "day_3", "day_4",
        "week_1", "week_2", "week_3", "week_4",
        "vol_MA6", "vol_MA20", "price_MA20", "delta_MA12",
        "upper_BB_dist", "lower_BB_dist",
        "stoch", "price_change", "ATR", "up1", "down1", "up2", "down2",
    ]
    return bars.select(*out_cols).na.fill(0)


def bars_joined_oracle() -> str:
    """DuckDB mirror, CTE for CTE."""
    bs = PIPELINE_BUCKET_SECONDS
    bkt = f"CAST(epoch(time_bucket(INTERVAL '{bs} seconds', ts)) AS BIGINT)"
    book_inner = book_oracle_cte().replace("FROM events", "FROM deep_snap")
    wa_bid = _wa_sql("bid")
    wa_ask = _wa_sql("ask")
    asks = " + ".join(f"COALESCE(ask_{i}_size, 0)" for i in range(7))
    bids = " + ".join(f"COALESCE(bid_{i}_size, 0)" for i in range(7))
    imb = "(bid_0_size / (bid_0_size + ask_0_size))"
    return f"""
        WITH deep_snap AS (
            SELECT {bkt} AS bucket_start,
                   min(event_id) AS event_id,
                   arg_min(value, event_id) AS value,
                   arg_min(user_id, event_id) AS user_id,
                   make_timestamp({bkt} * 1000000) AS ts
            FROM events WHERE event_type = 'purchase' GROUP BY 1
        ),
        book AS (
            SELECT b.*, d.bucket_start FROM ({book_inner}) b
            JOIN deep_snap d ON b.event_id = d.event_id
        ),
        deep_feats AS (
            SELECT bucket_start,
                {wa_bid} AS bids_ord_WA,
                {wa_ask} AS asks_ord_WA,
                (bid_0_size - ask_0_size) / (bid_0_size + ask_0_size) AS vol_imbalance,
                ({asks}) - ({bids}) AS delta,
                {imb} * ask_0 + (1 - {imb}) * bid_0 AS micro_price,
                CASE WHEN bid_0 <> 0 AND ask_0 <> 0 THEN bid_0 - ask_0
                     ELSE 0 END AS spread
            FROM book
        ),
        candle AS (
            SELECT {bkt} AS bucket_start,
                   arg_min(value, event_id) AS open,
                   max(value) AS high,
                   min(value) AS low,
                   arg_max(value, event_id) AS close,
                   count(*) AS volume
            FROM events WHERE event_type = 'click' GROUP BY 1
        ),
        vix AS (
            SELECT {bkt} AS bucket_start, arg_min(value, event_id) AS vix
            FROM events WHERE event_type = 'view' GROUP BY 1
        ),
        cot AS (
            SELECT {bkt} AS bucket_start,
                   arg_min(value, event_id) AS cot_pos, avg(value) AS cot_chg
            FROM events WHERE event_type = 'signup' GROUP BY 1
        ),
        ind AS (
            SELECT {bkt} AS bucket_start,
                   sum(value) AS ind_actual, count(*) AS ind_count
            FROM events WHERE event_type = 'error' GROUP BY 1
        ),
        bars AS (
            SELECT c.bucket_start, c.open, c.high, c.low, c.close, c.volume,
                   c.high - c.low AS candle_size,
                   CASE WHEN c.close >= c.open THEN c.high - c.close
                        ELSE c.low - c.close END AS wick_size,
                   (CASE WHEN c.close >= c.open THEN c.high - c.close
                         ELSE c.low - c.close END) / (c.high - c.low) AS wick_prct,
                   d.bids_ord_WA, d.asks_ord_WA, d.vol_imbalance, d.delta,
                   d.micro_price, d.spread,
                   v.vix, t.cot_pos, t.cot_chg, i.ind_actual, i.ind_count
            FROM candle c
            JOIN deep_feats d USING (bucket_start)
            JOIN vix v USING (bucket_start)
            JOIN cot t USING (bucket_start)
            JOIN ind i USING (bucket_start)
        ),
        cal AS (
            SELECT *,
                CAST(isodow(make_timestamp(bucket_start * 1000000)) AS INT)
                    AS day_of_week,
                CAST(ceil(date_part('day', make_timestamp(bucket_start * 1000000))
                     / 7) AS INT) AS week_of_month,
                CASE WHEN hour(make_timestamp(bucket_start * 1000000)) >= 11
                      AND minute(make_timestamp(bucket_start * 1000000)) >= 30
                     THEN 0 ELSE 1 END AS session_start
            FROM bars
        ),
        onehot AS (
            SELECT *,
                CAST(day_of_week = 1 AS INT) AS day_1,
                CAST(day_of_week = 2 AS INT) AS day_2,
                CAST(day_of_week = 3 AS INT) AS day_3,
                CAST(day_of_week = 4 AS INT) AS day_4,
                CAST(week_of_month = 1 AS INT) AS week_1,
                CAST(week_of_month = 2 AS INT) AS week_2,
                CAST(week_of_month = 3 AS INT) AS week_3,
                CAST(week_of_month = 4 AS INT) AS week_4
            FROM cal
        ),
        ind_w AS (
            SELECT *,
                avg(volume) OVER (ORDER BY bucket_start
                    ROWS BETWEEN 5 PRECEDING AND CURRENT ROW) AS vol_MA6,
                avg(volume) OVER (ORDER BY bucket_start
                    ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS vol_MA20,
                avg(delta) OVER (ORDER BY bucket_start
                    ROWS BETWEEN 11 PRECEDING AND CURRENT ROW) AS delta_MA12,
                avg(close) OVER w20 AS price_MA20,
                (avg(close) OVER w20 + 2 * stddev_pop(close) OVER w20) - close
                    AS upper_BB_dist,
                close - (avg(close) OVER w20 - 2 * stddev_pop(close) OVER w20)
                    AS lower_BB_dist,
                (close - min(close) OVER w15)
                    / (max(close) OVER w15 - min(close) OVER w15) AS stoch,
                close - lag(close, 1) OVER (ORDER BY bucket_start) AS price_change,
                avg(high - low) OVER w15 AS ATR
            FROM onehot
            WINDOW
                w20 AS (ORDER BY bucket_start ROWS BETWEEN 19 PRECEDING AND CURRENT ROW),
                w15 AS (ORDER BY bucket_start ROWS BETWEEN 14 PRECEDING AND CURRENT ROW)
        ),
        tgt AS (
            SELECT *,
                CASE WHEN lead(close, 8) OVER w >= close + 1.5 * ATR
                     THEN 1 ELSE 0 END AS up1,
                CASE WHEN lead(close, 8) OVER w <= close - 1.5 * ATR
                     THEN 1 ELSE 0 END AS down1,
                CASE WHEN lead(close, 15) OVER w >= close + 3 * ATR
                     THEN 1 ELSE 0 END AS up2,
                CASE WHEN lead(close, 15) OVER w <= close - 3 * ATR
                     THEN 1 ELSE 0 END AS down2
            FROM ind_w
            WINDOW w AS (ORDER BY bucket_start)
        )
        SELECT bucket_start, open, high, low, close, volume,
               candle_size, wick_size, COALESCE(wick_prct, 0) AS wick_prct,
               COALESCE(bids_ord_WA, 0) AS bids_ord_WA,
               COALESCE(asks_ord_WA, 0) AS asks_ord_WA,
               COALESCE(vol_imbalance, 0) AS vol_imbalance,
               delta, COALESCE(micro_price, 0) AS micro_price, spread,
               vix, cot_pos, cot_chg, ind_actual, ind_count,
               day_of_week, week_of_month, session_start,
               day_1, day_2, day_3, day_4, week_1, week_2, week_3, week_4,
               vol_MA6, vol_MA20, price_MA20, delta_MA12,
               upper_BB_dist, lower_BB_dist,
               COALESCE(stoch, 0) AS stoch,
               COALESCE(price_change, 0) AS price_change, ATR,
               up1, down1, up2, down2
        FROM tgt
    """


def _wa_sql(side: str, levels: int = 7) -> str:
    num = " + ".join(
        f"COALESCE(({side}_0 - {side}_{i}) * {side}_{i}_size, 0)" for i in range(levels)
    )
    den = " + ".join(f"COALESCE({side}_{i}_size, 0)" for i in range(levels))
    return f"(({num}) / ({den}))"
