from financial_market_data_analysis_spark.sources.batch import (
    TABLE_NAMES,
    load_table,
    load_tables,
    register_views,
)

__all__ = ["TABLE_NAMES", "load_table", "load_tables", "register_views"]
