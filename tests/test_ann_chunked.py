"""Exact equivalence of the chunked-probe top-k driver
(operators/ann_chunked.py) against the single-broadcast registered kernel
(l3 sim_topk_bruteforce): chunking partitions only the probe axis, so
every probe's neighbors, rounded similarities and tie-breaks must be
identical — at ANY chunk size."""

from __future__ import annotations

import pytest
from conftest import SF_SMOKE
from pyspark.sql import functions as F

from wikipedia_org_xmldump_importer_spark.io import load_table
from wikipedia_org_xmldump_importer_spark.operators.ann_chunked import (
    sim_topk_chunked,
)
from wikipedia_org_xmldump_importer_spark.queries.llm import sim_topk_bruteforce


def _keyed(df):
    return {
        (r.qid, r.rn): (r.vec_id, r.cos_sim) for r in df.collect()
    }


@pytest.mark.parametrize("chunk_size", [5, 7, 20])
def test_chunked_matches_single_broadcast(spark, chunk_size):
    want = _keyed(sim_topk_bruteforce(spark, SF_SMOKE))
    emb = load_table(spark, SF_SMOKE, "embeddings")
    got = _keyed(
        sim_topk_chunked(
            spark, emb, F.col("vec_id") < 20, k=5, chunk_size=chunk_size
        )
    )
    assert got == want


def test_empty_probe_set_raises(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    with pytest.raises(ValueError):
        sim_topk_chunked(spark, emb, F.col("vec_id") < 0)


def test_default_chunk_size_is_production_scale():
    """The default must be the documented few-MB probe-matrix bound
    (~2.5 MB at 64 dims), not a test-scale value: a tiny default at 1e6
    probes would mean thousands of full corpus scans and an unbounded
    unionAll plan chain."""
    import inspect

    default = inspect.signature(sim_topk_chunked).parameters["chunk_size"].default
    assert default >= 1000
    # 64-dim float64 probe matrix stays under ~8 MB broadcast
    assert default * 64 * 8 <= 8 * 1024 * 1024
