"""s6: replay the events table as a Structured Stream (SURVEY.md §2.1, §5.3).

The batch-equivalence harness: re-chunk events.parquet into N ts-ordered
parquet files in a staging dir, then readStream over it with
maxFilesPerTrigger + an availableNow trigger so streaming queries process
the chunks as ordered micro-batches and terminate.

100 TB notes: a file-source stream is exactly how late-arriving hourly drops
land in production lakes; maxFilesPerTrigger bounds per-batch work, and the
watermark (set by the query, not the source) bounds state.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table

EVENTS_STREAM_SCHEMA = (
    "event_id long, ts timestamp_ntz, user_id long, event_type string, "
    "value double, props string, ts_us long"
)


def stage_event_chunks(
    spark: SparkSession, sf_dir: str, out_dir: str, n_chunks: int = 8
) -> str:
    """Write events as n_chunks ts-ordered parquet files under out_dir."""
    ev = load_table(spark, sf_dir, "events")
    # ntile over ts => chunk i holds an ordered time slice, like hourly drops
    from pyspark.sql import Window  # noqa: PLC0415

    w = F.ntile(n_chunks).over(Window.orderBy("ts"))
    chunked = ev.withColumn("__chunk", w)
    for i in range(1, n_chunks + 1):
        (
            chunked.filter(F.col("__chunk") == i)
            .drop("__chunk")
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(os.path.join(out_dir, f"chunk_{i:02d}"))
        )
    return out_dir


def read_event_stream(spark: SparkSession, staged_dir: str) -> DataFrame:
    """File-source stream over staged chunks, one file per micro-batch."""
    return (
        spark.readStream.schema(EVENTS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(staged_dir)
    )


def run_to_completion(
    stream_df: DataFrame, query_name: str = "q", output_mode: str = "complete"
) -> DataFrame:
    """Execute a streaming DataFrame with availableNow into an in-memory
    sink and return the final result as a batch DataFrame.

    output_mode: 'complete' for unwatermarked aggregations, 'append' for
    watermarked/window-final and row-wise queries.
    """
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.sql(f"SELECT * FROM {query_name}")


DOCS_STREAM_SCHEMA = "doc_id long, ts timestamp_ntz, text string"

_DOCS_EPOCH = "CAST('2024-01-01 00:00:00' AS TIMESTAMP_NTZ)"


def stage_document_chunks(
    spark: SparkSession, sf_dir: str, out_dir: str, n_chunks: int = 6
) -> str:
    """Replay harness for the DOCUMENT stream (st17): documents carry no
    event time, so arrival is synthesized deterministically (doc_id seconds
    past a fixed epoch — ingest order == doc_id order, like a crawler feed)
    and chunked into n_chunks ordered parquet files."""
    from pyspark.sql import Window  # noqa: PLC0415

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr(f"timestampadd(SECOND, doc_id, {_DOCS_EPOCH})").alias("ts"),
        "text",
    )
    w = F.ntile(n_chunks).over(Window.orderBy("doc_id"))
    chunked = docs.withColumn("__chunk", w)
    for i in range(1, n_chunks + 1):
        (
            chunked.filter(F.col("__chunk") == i)
            .drop("__chunk")
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(os.path.join(out_dir, f"chunk_{i:02d}"))
        )
    return out_dir


def read_document_stream(spark: SparkSession, staged_dir: str) -> DataFrame:
    """File-source stream over staged document chunks, one per micro-batch."""
    return (
        spark.readStream.schema(DOCS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(staged_dir)
    )
