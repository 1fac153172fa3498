"""Chunked-probe brute-force top-k — the 'chunk the broadcast probe matrix
and union' scale path the shared GEMM kernel documents
(queries/llm.py:31, sim_topk_bruteforce's 100 TB note).

The registered l3/l8 kernels broadcast ONE probe matrix — fine to ~1e4
probes (a 1e4 x 64 float64 matrix is 5 MB). Past that the broadcast and
the per-batch k·|probes| emission both grow linearly; the documented
answer is to partition the probe set into bounded chunks, run the SAME
kernel once per chunk, and union. Chunking only partitions the probe
axis — each probe's scores, rounding, tie-breaks and re-rank are computed
by the identical code against the identical corpus — so results are
EXACTLY the single-broadcast kernel's, probe for probe
(tests/test_ann_chunked.py).

100 TB notes: the trade is explicit — one corpus scan PER CHUNK in
exchange for O(chunk) broadcast memory and O(k·chunk) shuffle rows per
batch. The default chunk_size=5000 keeps a 64-dim float64 probe matrix
at ~2.5 MB; raise/lower it to hold that few-MB bound at other dims.
Two large-probe-count cliffs to respect: (1) each chunk is a full corpus
scan, so probes/chunk_size IS the scan count — a tiny chunk_size at 1e6
probes means thousands of scans; (2) the result is a unionAll CHAIN, so
plan depth grows linearly with chunk count and Catalyst analysis time
with it — past a few hundred chunks flip the asymmetry instead
(broadcast the corpus blocks, or go to the x16/x19 bucketed ANN paths,
which exist precisely for that regime)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..queries.llm import _collect_probe_matrix, _gemm_local_topk, as_double

__all__ = ["sim_topk_chunked"]


def sim_topk_chunked(
    spark: SparkSession,
    emb: DataFrame,
    probe_pred,
    k: int = 5,
    chunk_size: int = 5000,
) -> DataFrame:
    """Exact cosine top-k per probe, probes processed in bounded chunks.

    ``probe_pred`` selects the probe rows; probe ids are collected ONCE
    (ids only — 8 bytes each, not vectors) to derive deterministic
    chunk boundaries, then each chunk reuses the registered kernel
    verbatim: broadcast chunk matrix -> Arrow-batch GEMM with
    batch-local top-k -> rank-filtered window re-rank."""
    ids = sorted(
        r.vec_id for r in emb.filter(probe_pred).select("vec_id").collect()
    )
    corpus = emb.select("vec_id", as_double(F.col("embedding")).alias("v"))
    w = Window.partitionBy("qid").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id").asc()
    )
    out: DataFrame | None = None
    for lo in range(0, len(ids), chunk_size):
        chunk = ids[lo : lo + chunk_size]
        b_probe = _collect_probe_matrix(
            spark, emb, F.col("vec_id").isin(chunk)
        )
        scored = corpus.mapInPandas(
            _gemm_local_topk(b_probe, k, exclude_self=True),
            schema="qid bigint, vec_id bigint, cos_sim double",
        )
        ranked = (
            scored.withColumn("rn", F.row_number().over(w).cast("long"))
            .filter(F.col("rn") <= k)
        )
        out = ranked if out is None else out.unionAll(ranked)
    if out is None:
        raise ValueError("probe_pred selected no rows")
    return out
