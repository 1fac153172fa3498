"""SparkSession construction for tests / bench / local runs.

The driver's harness supplies its own session to ``__spark_entry__`` —
engine code must therefore never *require* a session built here. This
builder is for our own tests and bench runs (SURVEY.md §7 M0).

100 TB notes: on a real cluster these same settings apply, plus
``spark.sql.shuffle.partitions`` sized to ~128 MB per shuffle partition
(AQE coalesces down at runtime), executor-side Arrow batches for pandas
UDFs, and CBO stats collected on the fact tables.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(
    app_name: str = "wikipedia-xmldump-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # AQE: runtime partition coalescing + skew-join splitting (Spark 4
        # default-on; pinned here so the plan survives config drift).
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Deterministic timezone: oracle parity (DuckDB is tz-naive).
        .config("spark.sql.session.timeZone", "UTC")
        # events.parquet carries TIMESTAMP(NANOS) which Spark cannot map;
        # read as epoch-nanos long, converted in io.load_table.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Arrow for pandas UDF / toPandas round-trips.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or int(cpus)),
        )
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
