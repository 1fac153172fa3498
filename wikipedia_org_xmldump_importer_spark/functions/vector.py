"""Vector kernels over array<float> embedding columns (SURVEY.md §2.11).

All pure Catalyst higher-order functions — dot products and norms run inside
whole-stage codegen on the JVM; no Python, no UDF, no Arrow hop.

100 TB notes: the brute-force cosine path is O(|probe|·|corpus|·d). The scale
strategy (SURVEY §4.3) is: (1) keep the probe side small and broadcast it,
(2) pre-compute norms once per side, (3) per-partition top-k before the
global top-k re-rank so the shuffle carries k rows per (partition, query),
not the full score matrix. For corpus×corpus (threshold self-join), LSH
bucketing (operators in llm queries / ml MinHashLSH) prunes candidates first.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    return vec.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product — same evaluation order as DuckDB's
    list kernels, so double results are bit-stable across engines."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def with_norm(df: DataFrame, vec_col: str = "embedding", out: str = "norm") -> DataFrame:
    return df.withColumn(out, l2_norm(as_double(F.col(vec_col))))


def cosine(a: Column, b: Column, norm_a: Column, norm_b: Column) -> Column:
    return dot(a, b) / (norm_a * norm_b)
