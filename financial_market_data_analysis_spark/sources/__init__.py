from financial_market_data_analysis_spark.sources.batch import (
    TABLE_NAMES,
    load_table,
    load_tables,
    register_views,
)
from financial_market_data_analysis_spark.sources.files import (
    ingest_report,
    load_csv,
    load_jsonl,
)

__all__ = [
    "TABLE_NAMES",
    "ingest_report",
    "load_csv",
    "load_jsonl",
    "load_table",
    "load_tables",
    "register_views",
]
