"""s3: auxiliary delimited/JSON ingestion with explicit schemas
(SURVEY.md §2.1). Unit-tested in tests/test_sources.py.

100 TB notes: explicit schema = no inference pass; PERMISSIVE mode with a
corrupt-record column quarantines bad rows instead of failing the job —
at scale there are ALWAYS bad rows. multiLine JSON is non-splittable;
prefer JSON-lines for parallel scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def scan_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    header: bool = True,
    delimiter: str = ",",
) -> DataFrame:
    return (
        spark.read.schema(schema)
        .option("header", header)
        .option("sep", delimiter)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .csv(path)
    )


def scan_jsonl(spark: SparkSession, path: str, schema: StructType | str) -> DataFrame:
    return (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .json(path)
    )


def scan_csv_quarantine(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    header: bool = True,
    delimiter: str = ",",
) -> tuple[DataFrame, DataFrame]:
    """s19: production CSV ingest with a QUARANTINE channel — one pass,
    two frames: (good_rows_typed, quarantined_raw_lines).

    PERMISSIVE mode parses what it can; any row that fails the schema
    lands with its RAW LINE in the ``_corrupt`` column and NULLs
    elsewhere. This splitter returns the clean typed frame (corrupt
    column dropped) and the quarantine frame (raw line only) so the
    pipeline can land good rows and route bad ones to a dead-letter
    sink for re-parse — the shape every large-scale feed needs, because
    at 100 TB there are ALWAYS bad rows and FAILFAST means the job
    never finishes (one bad line in the last file kills hours of work)
    while silent DROPMALFORMED destroys the evidence needed to fix the
    feed.

    The schema MUST declare ``_corrupt STRING`` (added here if the
    caller passed a DDL string without it). Spark caveat encoded in the
    test: a filter on ``_corrupt`` alone would be pushed into the parser
    and raises AnalysisException ("referenced columns only include the
    internal corrupt record column") unless the frame is checkpointed —
    we select the corrupt column THROUGH a cached projection, the
    documented workaround.

    100 TB: one scan, no shuffle; the quarantine frame is tiny by
    construction (bad-row rate) and the good frame inherits the scan's
    splits. No second read of the source."""
    ddl = schema if isinstance(schema, str) else schema.simpleString()[7:-1]
    if "_corrupt" not in ddl:
        ddl = f"{ddl}, _corrupt STRING"
    raw = (
        spark.read.schema(ddl)
        .option("header", header)
        .option("sep", delimiter)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .csv(path)
    )
    # cache() materializes the parse once and detaches the corrupt-column
    # filter from the parser (SPARK-21610 class restriction).
    raw = raw.cache()
    good = raw.filter(raw["_corrupt"].isNull()).drop("_corrupt")
    quarantine = raw.filter(raw["_corrupt"].isNotNull()).select(
        raw["_corrupt"].alias("raw_line")
    )
    return good, quarantine


def scan_csv_dropmalformed(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    header: bool = True,
    delimiter: str = ",",
) -> DataFrame:
    """s19 companion: DROPMALFORMED contract — bad rows silently removed
    (for feeds where the quarantine channel is handled upstream)."""
    return (
        spark.read.schema(schema)
        .option("header", header)
        .option("sep", delimiter)
        .option("mode", "DROPMALFORMED")
        .csv(path)
    )


def scan_csv_failfast(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    header: bool = True,
    delimiter: str = ",",
) -> DataFrame:
    """s19 companion: FAILFAST contract — the first malformed row raises
    (for small trusted dims where a bad row means a broken publish)."""
    return (
        spark.read.schema(schema)
        .option("header", header)
        .option("sep", delimiter)
        .option("mode", "FAILFAST")
        .csv(path)
    )
