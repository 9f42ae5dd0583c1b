"""Schema-enforced text-format ingestion (CSV / JSON-lines) with
corrupt-record quarantine.

The reference ingests only through Kafka/REST/JDBC (SURVEY §2.1); a
100 TB training-data pipeline also receives bulk drops as CSV and
JSONL, where the operational questions are different from parquet's:
what happens to a malformed line, and how do you prove nothing was
silently dropped? These loaders make the policy explicit and the
accounting first-class:

* an EXPLICIT StructType is required — schema inference is a full
  extra pass over the data at scale, and a schema drift (a producer
  adding a column) should fail loudly at the contract, not reshape
  the frame silently;
* ``PERMISSIVE`` (the default) routes every unparseable line into a
  quarantine frame — the raw text preserved verbatim in
  ``_corrupt_record`` — instead of dropping or failing, so a bulk
  load can land the clean 99.99% and file a ticket with the rest;
* ``DROPMALFORMED`` / ``FAILFAST`` pass through to Spark's reader for
  pipelines that prefer silence or hard stops.

Both loaders return ``(clean, quarantine)``. The split predicate is
``_corrupt_record IS NULL``; Spark computes it from the same single
scan (the corrupt column is populated by the parser itself, so no
second pass). Spark disallows queries that reference ONLY the corrupt
column of a raw file scan, which is why the quarantine frame carries
the parsed-null data columns alongside the raw line — select the raw
line out of it as needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

CORRUPT_COL = "_corrupt_record"


def _with_corrupt_field(schema: StructType) -> StructType:
    """The user's schema plus the corrupt-record capture column; the
    parser fills it for any line it cannot bind to the schema."""
    if CORRUPT_COL in schema.fieldNames():
        raise ValueError(f"schema already defines {CORRUPT_COL!r}")
    return StructType(
        list(schema.fields) + [StructField(CORRUPT_COL, StringType(), True)]
    )


def _split(raw: DataFrame, mode: str) -> tuple[DataFrame, DataFrame]:
    if mode != "PERMISSIVE":
        # DROPMALFORMED / FAILFAST never materialize corrupt rows, but
        # the (clean, quarantine) contract must be mode-invariant: the
        # empty quarantine frame still carries _corrupt_record (all
        # null) so a mode-generic consumer can select CORRUPT_COL
        # without an AnalysisException (r10 advice).
        empty_q = raw.limit(0).withColumn(
            CORRUPT_COL, F.lit(None).cast(StringType())
        )
        return raw, empty_q
    # Spark refuses queries against a raw file scan that reference only
    # the corrupt column (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_
    # COLUMN) — corruptness only exists after a parse, so the parsed
    # result must be materialized once. cache() is the API-documented
    # fix and is also the honest cost model: quarantine accounting IS
    # one full parse of the drop, shared by both output frames. At
    # warehouse scale the equivalent is parse-once-write-twice
    # (foreachBatch to clean + quarantine sinks); a bulk loader that
    # re-reads the raw files per consumer would parse twice instead.
    raw = raw.cache()
    clean = raw.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    quarantine = raw.filter(F.col(CORRUPT_COL).isNotNull())
    return clean, quarantine


def load_csv(
    spark: SparkSession,
    path: str,
    schema: StructType,
    *,
    mode: str = "PERMISSIVE",
    header: bool = True,
    sep: str = ",",
) -> tuple[DataFrame, DataFrame]:
    """CSV scan under an explicit schema.

    Returns ``(clean, quarantine)``: ``clean`` carries exactly
    ``schema``'s columns for rows that parsed fully; ``quarantine``
    carries the same columns (null where unbindable) plus
    ``_corrupt_record`` with the offending raw line. A wrong-arity
    line, an unparseable numeric, or a stray quote all quarantine —
    nothing is silently coerced or dropped in PERMISSIVE mode.
    """
    raw = (
        spark.read.schema(
            _with_corrupt_field(schema) if mode == "PERMISSIVE" else schema
        )
        .option("header", str(header).lower())
        .option("sep", sep)
        .option("mode", mode)
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .csv(path)
    )
    return _split(raw, mode)


def load_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType,
    *,
    mode: str = "PERMISSIVE",
) -> tuple[DataFrame, DataFrame]:
    """JSON-lines scan under an explicit schema — the bulk-drop format
    of every document corpus. Returns ``(clean, quarantine)`` exactly
    like ``load_csv``. A syntactically valid JSON object whose field
    TYPE contradicts the schema (e.g. a string where a long is
    declared) also quarantines — type drift is corruption here, not a
    cast opportunity."""
    raw = (
        spark.read.schema(
            _with_corrupt_field(schema) if mode == "PERMISSIVE" else schema
        )
        .option("mode", mode)
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )
    return _split(raw, mode)


def ingest_report(clean: DataFrame, quarantine: DataFrame) -> DataFrame:
    """One-row load accounting — (n_clean, n_quarantined, quarantine
    fraction) — the number a bulk load publishes next to its output so
    downstream consumers can gate on data quality (the d7 suite's
    ingestion-side sibling). Both counts come from the SAME scan's two
    partitions of the predicate, so the report can never disagree with
    the frames it describes."""
    c = clean.agg(F.count(F.lit(1)).alias("n_clean"))
    q = quarantine.agg(F.count(F.lit(1)).alias("n_quarantined"))
    return (
        c.crossJoin(q)
        .select(
            "n_clean",
            "n_quarantined",
            F.round(
                F.col("n_quarantined")
                / F.greatest(
                    F.col("n_clean") + F.col("n_quarantined"), F.lit(1)
                ),
                6,
            ).alias("quarantine_frac"),
        )
    )
