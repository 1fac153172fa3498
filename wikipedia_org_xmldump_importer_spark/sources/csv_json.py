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
