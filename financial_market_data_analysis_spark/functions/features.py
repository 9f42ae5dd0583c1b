"""F1-F13: row-level derived features (SURVEY.md §2.7).

Every function is a pure projection built from native Column
expressions — no UDFs — so the whole feature stack stays inside
whole-stage codegen and Catalyst can prune/push down around it
(mirroring the reference's deliberate UDF-avoidance,
spark_consumer.py:320-432).

Division-by-zero: the reference's MySQL half yields NULL and then
``fillna(0)`` (spark_consumer.py:311,480); Spark 4 ANSI mode would
throw, so every ratio here uses ``safe_div`` (→ NULL), preserving
NULL → ``fillna(0)`` ordering (SURVEY.md §7.4).
"""

from __future__ import annotations

import operator
from collections.abc import Sequence
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from financial_market_data_analysis_spark.functions.core import safe_div


# ---------------------------------------------------------------------------
# F1 — candle wick


def wick_features(
    df: DataFrame,
    open_col: str = "open",
    high_col: str = "high",
    low_col: str = "low",
    close_col: str = "close",
) -> DataFrame:
    """F1 — candle/wick geometry (spark_consumer.py:186-193).

    ``candle_size = high - low``; wick measured from close toward the
    extreme on the candle's direction; doji (high == low) → NULL ratio
    (division by zero), to be zero-filled downstream.
    """
    o, h, lo, c = (F.col(x) for x in (open_col, high_col, low_col, close_col))
    candle = h - lo
    wick = F.when(c >= o, h - c).otherwise(lo - c)
    return df.withColumns(
        {
            "candle_size": candle,
            "wick_size": wick,
            "wick_prct": safe_div(wick, candle),
        }
    )


# ---------------------------------------------------------------------------
# F2-F7 — order-book features


def _guarded(col: Column) -> Column:
    """Null-guarded term: NULL contributes 0 (spark_consumer.py:326,336).
    ``coalesce`` keeps the column's natural type (int stays int) and is
    the exact twin of SQL ``COALESCE(x, 0)``."""
    return F.coalesce(col, F.lit(0))


def _hsum(terms) -> Column:
    """Horizontal (across-columns) left-associative sum without a
    leading ``0 +`` term, so the expression tree mirrors a plain SQL
    ``t0 + t1 + ...`` chain."""
    return reduce(operator.add, terms)


def book_weighted_average(
    df: DataFrame,
    side: str,
    levels: int = 7,
    out_col: str | None = None,
) -> DataFrame:
    """F2 — size-weighted average distance from the best price for one
    book side: ``Σᵢ (best − pᵢ)·sizeᵢ / Σᵢ sizeᵢ`` with null-guarded
    terms (spark_consumer.py:320-340). ``side`` is ``"bid"``/``"ask"``;
    columns follow the fixture naming ``{side}_{i}`` / ``{side}_{i}_size``.

    The fold is horizontal — a Python ``sum`` over Column expressions,
    one row at a time — so it's pure codegen arithmetic, no aggregation.

    Documented deviation from the reference: spark_consumer.py:327
    guards price and size separately but leaves ``best`` un-guarded, so
    a NULL best price with a populated deeper level poisons its sum to
    NULL; here the whole ``(best − pᵢ)·sizeᵢ`` term coalesces to 0 —
    a NULL best simply contributes nothing. Deliberate fix (the
    reference behavior is a bug its synthetic feeds never hit), kept
    consistent with the oracle's ``COALESCE((best − pᵢ)·sizeᵢ, 0)``.
    """
    out_col = out_col or f"{side}s_ord_WA"
    best = F.col(f"{side}_0")
    num = _hsum(
        _guarded((best - F.col(f"{side}_{i}")) * F.col(f"{side}_{i}_size"))
        for i in range(levels)
    )
    den = _hsum(_guarded(F.col(f"{side}_{i}_size")) for i in range(levels))
    return df.withColumn(out_col, safe_div(num, den))


def order_volume_imbalance(
    df: DataFrame, out_col: str = "vol_imbalance"
) -> DataFrame:
    """F3 — ``(bid₀size − ask₀size) / (bid₀size + ask₀size)``
    (spark_consumer.py:342-347); empty top-of-book → NULL → fillna(0)."""
    b, a = F.col("bid_0_size"), F.col("ask_0_size")
    return df.withColumn(out_col, safe_div(b - a, b + a))


def delta_indicator(df: DataFrame, levels: int = 7, out_col: str = "delta") -> DataFrame:
    """F4 — ``Σ ask sizes − Σ bid sizes`` (orientation preserved,
    spark_consumer.py:349-353)."""
    asks = _hsum(_guarded(F.col(f"ask_{i}_size")) for i in range(levels))
    bids = _hsum(_guarded(F.col(f"bid_{i}_size")) for i in range(levels))
    return df.withColumn(out_col, asks - bids)


def micro_price(df: DataFrame, out_col: str = "micro_price") -> DataFrame:
    """F5 — Gatheral–Oomen micro-price ``I·ask₀ + (1−I)·bid₀`` with
    ``I = bid₀size/(bid₀size+ask₀size)`` (spark_consumer.py:355-364)."""
    bs, as_ = F.col("bid_0_size"), F.col("ask_0_size")
    imb = safe_div(bs, bs + as_)
    return df.withColumn(out_col, imb * F.col("ask_0") + (1 - imb) * F.col("bid_0"))


def bid_ask_spread(df: DataFrame, out_col: str = "spread") -> DataFrame:
    """F6 — ``bid₀ − ask₀`` when both non-zero else 0. The reference's
    sign convention (bid minus ask, negative in normal markets) is kept
    (spark_consumer.py:366-368)."""
    b, a = F.col("bid_0"), F.col("ask_0")
    return df.withColumn(
        out_col, F.when((b != 0) & (a != 0), b - a).otherwise(F.lit(0.0))
    )


def relative_price_levels(df: DataFrame, levels: int = 7) -> DataFrame:
    """F7 — re-express depth prices relative to the best level:
    ``ask_i ← ask₀ − ask_i`` (and bids), 0-guarded; level-0 prices are
    dropped afterwards (always 0) — spark_consumer.py:370-400. The
    reference's temp-column/drop/rename dance collapses into one
    ``withColumns`` map."""
    cols: dict[str, Column] = {}
    for side in ("bid", "ask"):
        best = F.col(f"{side}_0")
        for i in range(1, levels):
            c = F.col(f"{side}_{i}")
            cols[f"{side}_{i}"] = F.when(c != 0, best - c).otherwise(F.lit(0.0))
    return df.withColumns(cols).drop("bid_0", "ask_0")


# ---------------------------------------------------------------------------
# F8/F9 — calendar features + manual one-hot


def calendar_features(
    df: DataFrame, ts_col: str = "ts", strict_reference_semantics: bool = True
) -> DataFrame:
    """F8 — day-of-week (Monday=1, the reference's ``date_format(u)``
    convention), week-of-month (``ceil(day/7)``), and the session-start
    flag (spark_consumer.py:402-415).

    Spark 3+ rejects the legacy ``u``/``W`` datetime patterns; the same
    values come from ``weekday()+1`` and ``ceil(dayofmonth/7)``.

    ``strict_reference_semantics`` (SURVEY.md §7.5 — the promised v2
    toggle; default True because every oracle and the driver contract
    compare against reference behavior):

    * True — the reference's quirky session logic verbatim:
      ``hour ≥ 11 AND minute ≥ 30 → 0 else 1``, which calls e.g. 12:15
      a session start because its minute is below 30.
    * False — the evidently intended comparison, *time-of-day ≥ 11:30*
      (``hour > 11 OR (hour = 11 AND minute ≥ 30) → 0``): 12:15 is no
      longer a session start; 11:00-11:29 still is.
    """
    ts = F.col(ts_col)
    if strict_reference_semantics:
        session = F.when(
            (F.hour(ts) >= 11) & (F.minute(ts) >= 30), F.lit(0)
        ).otherwise(F.lit(1))
    else:
        session = F.when(
            (F.hour(ts) > 11) | ((F.hour(ts) == 11) & (F.minute(ts) >= 30)),
            F.lit(0),
        ).otherwise(F.lit(1))
    return df.withColumns(
        {
            "day_of_week": (F.weekday(ts) + 1).cast("int"),
            "week_of_month": F.ceil(F.dayofmonth(ts) / 7).cast("int"),
            "session_start": session,
        }
    )


def one_hot_calendar(
    df: DataFrame, strict_reference_semantics: bool = True
) -> DataFrame:
    """F9 — manual one-hot of day (1-4; Friday = all-zeros baseline) and
    week-of-month (spark_consumer.py:417-432).

    ``strict_reference_semantics`` (SURVEY.md §7.5 v2 toggle):

    * True — weeks one-hot as 1-4 only: a 5th calendar week collides
      with the Friday-style all-zeros baseline (the reference quirk —
      week 5 and week "none" are indistinguishable downstream).
    * False — adds ``week_5``, so the all-zeros code means only the
      deliberate dropped-category baseline.
    """
    cols: dict[str, Column] = {}
    for d in range(1, 5):
        cols[f"day_{d}"] = (F.col("day_of_week") == d).cast("int")
    top_week = 5 if strict_reference_semantics else 6
    for w in range(1, top_week):
        cols[f"week_{w}"] = (F.col("week_of_month") == w).cast("int")
    return df.withColumns(cols)


# ---------------------------------------------------------------------------
# F13/A1 — min-max normalization


def minmax_normalize(
    df: DataFrame, cols: Sequence[str], suffix: str = "_norm"
) -> DataFrame:
    """F13 + A1 — ``(x − min)/(max − min)`` with params computed over the
    frame (sql_pytorch_dataloader.py:93-144, 239).

    Scale shape: one global aggregate (partial-aggregatable, tiny
    result) broadcast-joined back — no window-over-everything, no
    second scan of a sorted partition. ``min == max`` → NULL (the
    reference patches an epsilon; we keep NULL → fillna downstream).
    """
    aggs = []
    for c in cols:
        aggs.append(F.min(c).alias(f"__min_{c}"))
        aggs.append(F.max(c).alias(f"__max_{c}"))
    params = df.agg(*aggs)
    out = df.crossJoin(F.broadcast(params))
    norm = {
        f"{c}{suffix}": safe_div(
            F.col(c) - F.col(f"__min_{c}"), F.col(f"__max_{c}") - F.col(f"__min_{c}")
        )
        for c in cols
    }
    out = out.withColumns(norm)
    return out.drop(*[f"__min_{c}" for c in cols], *[f"__max_{c}" for c in cols])
