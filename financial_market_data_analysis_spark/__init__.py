"""PySpark-native analytics engine with the query/data-processing
capabilities of ``radoslawkrolikowski/financial-market-data-analysis``.

Design stance (SURVEY.md §7.1): one transform library, every capability a
``DataFrame -> DataFrame`` function built from native Column expressions
(no row-at-a-time UDFs in the hot path), runnable in batch and under
Structured Streaming. Storage is Parquet; all window analytics that the
reference pushed to MariaDB views (create_database.py:76-190) live here as
Spark window expressions, healing the reference's two-engine split
(README.md:137-141).
"""

from financial_market_data_analysis_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
