"""SparkSession factory tuned for the engine.

The reference runs ``master("local")`` with 1 thread and
``spark.sql.shuffle.partitions = 5`` "for testing"
(spark_consumer.py:29-43). The engine instead targets a multi-executor
cluster: AQE owns runtime partition coalescing and skew-join splitting,
shuffle partitions default to the local core count, and Arrow is enabled
for every pandas interop path.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def get_spark(
    app_name: str = "financial-market-data-analysis-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
    rocksdb_state_store: bool = False,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's default tuning.

    Defaults are scale-oriented: adaptive query execution (runtime shuffle
    coalescing + skew-join handling), broadcast threshold large enough to
    broadcast dimension tables, Arrow for pandas UDFs, UTC session timezone
    so results compare bit-for-bit against naive-UTC oracles (DuckDB).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus.isdigit() else 32

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    if rocksdb_state_store:
        # Scale path for long-running stateful streams (join/dedup state
        # at SURVEY.md §4 'State management'): RocksDB spills state off
        # the JVM heap instead of growing an in-memory HashMap per
        # partition. Also settable per-query via the same SQL conf.
        builder = builder.config(
            "spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER
        )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    return spark
