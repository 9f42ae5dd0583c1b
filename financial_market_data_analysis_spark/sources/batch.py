"""Batch sources: parquet table loaders over the driver's test tables.

Maps the reference's JDBC point/range scans (S7 — predict.py:144-165,
sql_pytorch_dataloader.py:97-105) onto parquet scans with Catalyst
predicate pushdown; the table registry replaces the reference's
``DESCRIBE``-based introspection (create_database.py:193-238) with
``df.schema``.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    """Columnar parquet scan; filters/projections push down via Catalyst.

    ``events.ts`` is exposed two ways regardless of the file's physical
    type: ``ts_us`` (epoch-microseconds long — the engine's exact
    event-time key) and ``ts`` (TimestampType — for watermarks/windows).
    The loader adapts to either on-disk layout the driver has shipped:

    * parquet TIMESTAMP(NANOS) — Spark rejects it by default, so it is
      read as nanosecond longs (``nanosAsLong``) and ``div 1000``-ed,
      reproducing exactly the nanos→µs truncation TIMESTAMP engines
      (DuckDB oracle included) apply;
    * parquet timestamp[us] (isAdjustedToUTC either way) — read as
      TIMESTAMP/TIMESTAMP_NTZ and cast under the UTC session timezone
      (an instant-preserving identity), ``ts_us`` via ``unix_micros``.
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Calendar fields (hour/weekday/...) read TimestampType through
        # the session timezone; event-time semantics require UTC. The
        # engine's own get_spark pins it at session build; a foreign
        # session (e.g. the driver's vanilla one) gets it pinned here
        # too — loudly, not silently, if it had a different deliberate
        # setting (r2 advice: no hidden config mutation).
        tz = spark.conf.get("spark.sql.session.timeZone", None)
        if tz not in (None, "UTC", "Etc/UTC"):
            import warnings

            warnings.warn(
                f"load_table('events') overrides session timeZone {tz!r} -> 'UTC' "
                "(event-time operators assume UTC); build the session via "
                "get_spark() to pin it up front",
                stacklevel=2,
            )
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
        ts_type = df.schema["ts"].dataType.typeName()
        if ts_type in ("long", "bigint"):  # TIMESTAMP(NANOS) read as nanos longs
            return df.withColumns(
                {
                    "ts_us": F.expr("ts div 1000"),
                    "ts": F.timestamp_micros(F.expr("ts div 1000")),
                }
            )
        if ts_type not in ("timestamp", "timestamp_ntz"):
            # An unexpected physical layout (string, int32, ...) would
            # cast to all-NULL timestamps downstream — fail loudly with
            # the observed type instead (r3 advice).
            raise TypeError(
                f"events.ts has unsupported parquet type {ts_type!r}; "
                "expected TIMESTAMP(NANOS) (read as nanos longs), "
                "timestamp, or timestamp_ntz"
            )
        ts = F.col("ts").cast("timestamp")  # NTZ→TS is identity under UTC session tz
        return df.withColumns({"ts_us": F.unix_micros(ts), "ts": ts})
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 32,
    path: str | None = None,
) -> None:
    """Persist a table hash-bucketed (and sorted) on its join key.

    Two tables bucketed on the same key with the same bucket count join
    WITHOUT an Exchange — the co-located join the reference's MariaDB
    side can't express and the single biggest shuffle eliminator for a
    repeatedly-joined 100 TB fact table (asserted shuffle-free in
    tests). ``path`` makes it an external table (files land there, only
    metadata in the session catalog).
    """
    w = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, key).sortBy(key)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {name: load_table(spark, name, sf_dir) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register every table as a temp view so all operators are
    SQL-addressable (SURVEY.md §3.2: the reference's view layer becomes
    Spark temp views)."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)


Z_BITS = 16  # bits per dimension in the interleaved key


def z_value(x: Column, y: Column, bits: int = Z_BITS) -> Column:
    """Morton/Z-order key: interleave the low ``bits`` of two
    non-negative int columns (x even positions, y odd). Sorting/range-
    partitioning data by this key before writing clusters rows that are
    close in BOTH dimensions into the same files, so parquet min/max
    stats prune scans filtered on either column — the data-layout
    optimization behind multi-dimensional OPTIMIZE ZORDER commands,
    expressed as a plain deterministic column (pure integer shifts/
    masks, bit-identical in any engine).
    """
    x, y = x.cast("long"), y.cast("long")  # 2*bits exceeds int32
    terms = []
    for b in range(bits):
        xb = F.shiftright(x, b).bitwiseAND(F.lit(1).cast("long"))
        yb = F.shiftright(y, b).bitwiseAND(F.lit(1).cast("long"))
        terms.append(F.shiftleft(xb, 2 * b).bitwiseOR(F.shiftleft(yb, 2 * b + 1)))
    out = terms[0]
    for t in terms[1:]:
        out = out.bitwiseOR(t)
    return out


def z_value_sql(x_expr: str, y_expr: str, bits: int = Z_BITS) -> str:
    xb, yb = f"CAST({x_expr} AS BIGINT)", f"CAST({y_expr} AS BIGINT)"
    terms = [
        f"((({xb} >> {b}) & 1) << {2 * b}) | ((({yb} >> {b}) & 1) << {2 * b + 1})"
        for b in range(bits)
    ]
    return "(" + " | ".join(f"({t})" for t in terms) + ")"
