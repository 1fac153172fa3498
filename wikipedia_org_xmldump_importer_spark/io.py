"""Table IO: scans over the driver-generated parquet tables + sinks.

SURVEY.md §2.1 (s1 scan_parquet, s4 sink_parquet, s5 sink_jdbc).

100 TB notes: parquet scans here are plain ``spark.read.parquet`` so Catalyst
DSv2 pushdown (predicates, column pruning, partition pruning) applies
untouched — every downstream operator's filters reach the row-group level.
Schema inference on parquet is footer-only (no data pass), so no explicit
StructType is needed for these tables; XML ingestion (sources/xml_pages.py)
DOES pin an explicit schema because XML inference is a full extra pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

_EPOCH_NTZ = "CAST('1970-01-01 00:00:00' AS TIMESTAMP_NTZ)"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one of the ten driver tables from ``{sf_dir}/{name}.parquet``.

    ``events.ts`` has shipped as parquet TIMESTAMP(NANOS) in some testdata
    generations and TIMESTAMP(MICROS) in others, so the branch below is
    type-driven. NANOS cannot map to a Catalyst type (PARQUET_TYPE_ILLEGAL);
    we read it as epoch-nanos int64 via
    ``spark.sql.legacy.parquet.nanosAsLong`` and rebuild. MICROS reads
    natively as TIMESTAMP_NTZ and only needs the companion long. Either way
    callers see the same two columns:

      * ``ts``    — TIMESTAMP_NTZ at microsecond precision, truncated exactly
                    like DuckDB truncates ns->us (integer ``div``, no float
                    rounding), and timezone-independent (pure epoch
                    arithmetic on the NTZ epoch — no session-tz dependence).
      * ``ts_us`` — the epoch-microseconds long, kept as a convenience column
                    for range-frame windows (SURVEY §2.5 w5) and lag deltas
                    (w3), where integer arithmetic is cheaper and
                    deterministic across engines.

    The legacy conf is set on the *runtime* conf so this works on any caller
    session (incl. the driver's); it only affects how NANOS columns read.

    When ``cbo.register_tables_with_stats`` has registered this (session,
    sf_dir), the scan resolves to the stats-bearing catalog table instead of
    the bare path — same files, same schema, but Catalyst sees rowCount /
    size / column stats, so CBO join reordering and stats-based broadcast
    decisions fire. Unregistered sessions (the driver's harness) take the
    path branch — plans unchanged.
    """
    from .cbo import registered_dir  # noqa: PLC0415 — io<->cbo cycle at import

    path = f"{sf_dir}/{name}.parquet"
    from_catalog = registered_dir(spark, name) == sf_dir
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.table(name) if from_catalog else spark.read.parquet(path)
        if isinstance(df.schema["ts"].dataType, LongType):
            # TIMESTAMP(NANOS) footer → epoch-nanos long; truncate ns→us
            # exactly like DuckDB (integer div, no float rounding).
            df = df.withColumn("ts_us", F.expr("ts div 1000")).withColumn(
                "ts",
                F.expr(f"timestampadd(MICROSECOND, ts div 1000, {_EPOCH_NTZ})"),
            )
        else:
            # TIMESTAMP(MICROS) footer → native TIMESTAMP_NTZ; derive the
            # epoch-µs long by pure integer arithmetic on the NTZ epoch
            # (timezone-independent, exact on both engines).
            df = df.withColumn(
                "ts_us", F.expr(f"timestampdiff(MICROSECOND, {_EPOCH_NTZ}, ts)")
            )
        return df.select(
            "event_id", "ts", "user_id", "event_type", "value", "props", "ts_us"
        )
    if from_catalog:
        return spark.table(name)
    return spark.read.parquet(path)


def sink_parquet(
    df: DataFrame, path: str, partition_by: list[str] | None = None, mode: str = "overwrite"
) -> None:
    """s4: partitioned columnar sink.

    100 TB notes: partition columns should be low-cardinality (date, lang,
    namespace); high-cardinality partitioning creates a small-file explosion.
    Writers should generally ``repartition(partition_cols)`` first so each
    task writes one file per partition value rather than P×N fragments.
    """
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def sink_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    batchsize: int = 10_000,
    num_partitions: int | None = None,
    properties: dict | None = None,
) -> None:
    """s5: the reference's DB-load step re-expressed as Spark's JDBC sink
    (BASELINE.json "Spark XML reader + DataFrame write to JDBC").

    No database *server* exists in this sandbox, but Spark's distribution
    ships the Derby embedded engine, so tests/test_jdbc_sink.py executes a
    real round-trip through this function (write → in-memory Derby table →
    read.jdbc → value equality). On a real cluster:

    100 TB notes: ``numPartitions`` bounds concurrent connections (each task
    opens one); ``batchsize`` amortizes per-row round trips (10k is the
    classic sweet spot); ``mode=append`` with idempotent staging tables +
    rename beats truncate-write for restartability at scale. This write is
    NON-TRANSACTIONAL per partition: run it with ``spark.speculation=false``
    (NOT under ``session.cluster_conf()``, which enables speculation) or a
    speculative duplicate task attempt can commit a partition twice.
    """
    writer = df.write.format("jdbc").option("url", url).option("dbtable", table)
    writer = writer.option("batchsize", str(batchsize))
    if num_partitions:
        writer = writer.option("numPartitions", str(num_partitions))
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    writer.mode(mode).save()


def sink_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 16,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Bucketed managed-table sink: pre-shuffles rows into ``n_buckets``
    hash buckets on ``bucket_cols`` at WRITE time, so every later join or
    aggregation on those keys is co-located and shuffle-free (plan-asserted
    in tests: two tables bucketed the same way sort-merge-join with ZERO
    Exchange).

    100 TB notes: bucketing is the standing answer to "this fact table is
    joined on this key every day" — pay the shuffle once at ingest, never
    again. Pick n_buckets so a bucket ≈ one task's memory (128-512 MB);
    bucket counts must match (or divide) across tables for co-located
    joins. ``sortBy`` within buckets additionally enables merge-join
    without a per-task sort. Bucketed tables require saveAsTable (the
    bucket metadata lives in the catalog, not the files).
    """
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path:
        writer = writer.option("path", path)
    writer.format("parquet").saveAsTable(table)
