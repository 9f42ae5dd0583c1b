"""Shared pytest fixtures: one SparkSession per test session, and a
DuckDB oracle runner mirroring the driver's correctness harness."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

from financial_market_data_analysis_spark import get_spark
from financial_market_data_analysis_spark.sources.batch import TABLE_NAMES

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECTNESS = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    s = get_spark(master="local[4]", shuffle_partitions=4, app_name="fmda-tests")
    # Deterministic session-global checkpoint baseline: without it,
    # whether a test that passes an explicit checkpoint_dir sees a
    # prior-dir-override warning depends on which test ran first
    # (SparkContext.setCheckpointDir is global). Pin it up front so
    # the warning contract is order-independent and tests can restore
    # a real directory afterwards.
    s.sparkContext.setCheckpointDir(
        str(tmp_path_factory.mktemp("session_ckpt"))
    )
    yield s


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{SF_SMOKE}/{t}.parquet'"
        )
    yield con
    con.close()


def run_duck(con: duckdb.DuckDBPyConnection, sql: str) -> pd.DataFrame:
    return con.execute(sql).fetchdf()


def assert_frame_parity(spark_df, oracle_pdf: pd.DataFrame, rtol: float = 1e-9) -> None:
    """Order-insensitive compare: column names (case-insensitive, like the
    driver's sort-by-name), row counts, then values with float tolerance."""
    spdf = spark_df.toPandas()
    assert sorted(c.lower() for c in spdf.columns) == sorted(
        c.lower() for c in oracle_pdf.columns
    ), f"columns differ: {sorted(spdf.columns)} vs {sorted(oracle_pdf.columns)}"

    spdf = spdf.reindex(sorted(spdf.columns, key=str.lower), axis=1)
    oracle_pdf = oracle_pdf.reindex(sorted(oracle_pdf.columns, key=str.lower), axis=1)
    oracle_pdf.columns = spdf.columns
    assert len(spdf) == len(oracle_pdf), f"row counts differ: {len(spdf)} vs {len(oracle_pdf)}"

    sort_cols = list(spdf.columns)
    spdf = spdf.sort_values(sort_cols, na_position="last").reset_index(drop=True)
    oracle_pdf = oracle_pdf.sort_values(sort_cols, na_position="last").reset_index(drop=True)

    for col in spdf.columns:
        a, b = spdf[col], oracle_pdf[col]
        if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
            np.testing.assert_allclose(
                a.astype(float).to_numpy(),
                b.astype(float).to_numpy(),
                rtol=rtol,
                equal_nan=True,
                err_msg=f"column {col}",
            )
        else:
            pd.testing.assert_series_equal(
                a, b, check_dtype=False, check_names=False, obj=f"column {col}"
            )
