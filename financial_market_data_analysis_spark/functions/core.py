"""Small expression helpers shared by every operator."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def safe_div(num: Column, den: Column) -> Column:
    """Division with x/0 → NULL.

    Matches MySQL (the reference's view engine) and DuckDB (the oracle).
    Spark 4 runs ANSI mode by default, where ``/`` *throws* on zero —
    ``try_divide`` restores the NULL-on-zero semantics the reference
    relies on (SURVEY.md §7.4: division-by-zero → NULL → ``fillna(0)``).
    """
    return F.try_divide(num, den)
