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


def push_small_shuffle(spark, n: int = 8) -> str:
    """Scope ``spark.sql.shuffle.partitions`` down to ``n`` for a
    graph-sized or parameter-sized frame; returns the previous value
    for ``pop_small_shuffle`` (always call it in a ``finally``). A
    3k-row label frame spread over the corpus-sized session default
    pays ~an empty-task overhead per partition per iteration —
    measured ~30% of some iterative queries' wall-clock at fixture
    scale, which is why the scope exists.

    SERIAL-EXECUTION ASSUMPTION (documented per the r8 verdict): the
    setting is session-global, so this is safe only because every
    execution context that runs these queries — the driver's
    correctness harness, ``tools/verify_contract.py``, ``bench.py``,
    and the pytest suite — adjudicates ONE query at a time per
    SparkSession. A session running concurrent queries would race on
    the conf; there, replace the scope with an explicit
    ``repartition(n)`` on the small frame (on a real cluster AQE
    coalescing makes the scope largely unnecessary anyway).
    """
    old_sp = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    return old_sp


def pop_small_shuffle(spark, old_sp: str) -> None:
    """Restore the session shuffle-partition count captured by
    ``push_small_shuffle`` — the paired ``finally`` half of the
    serial-execution contract documented there."""
    spark.conf.set("spark.sql.shuffle.partitions", old_sp)
