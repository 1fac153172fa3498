"""Exact equivalence of the single-task multi-source BFS kernel
(operators/bfs_local.py, k5) against the registered join-loop form (x313
graph_closeness_hubs): BFS distances are tie-free integers, so the
in-task BFS must reproduce the min-aggregated frontier joins row for row
— including the 6dp-pinned closeness epilogue — plus synthetic-graph
edge cases (disconnected components, hop truncation, ring/star shapes)."""

from __future__ import annotations

import pandas as pd
from conftest import SF_SMOKE

from wikipedia_org_xmldump_importer_spark.operators.bfs_local import (
    closeness_hubs_local,
    multi_source_bfs_local,
)
from wikipedia_org_xmldump_importer_spark.queries.graph_ops import (
    graph_closeness_hubs,
)


def _keyed(df):
    return {
        r.hub: (r.degree, r.n_reached, r.sum_dist, r.closeness_wf)
        for r in df.collect()
    }


def test_kernel_matches_registered_closeness_exactly(spark):
    want = _keyed(graph_closeness_hubs(spark, SF_SMOKE))
    got = _keyed(closeness_hubs_local(spark, SF_SMOKE))
    assert got == want
    assert len(got) == 12


def test_kernel_generalizes_to_shortest_hops(spark):
    """Second registered shape (x226 graph_shortest_hops): min hop
    distance over 5 top-degree seeds = the kernel's per-hub distances
    min-collapsed per node — proves k5 is the BFS middle of the whole
    driver-loop family, not a closeness one-off."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from wikipedia_org_xmldump_importer_spark.io import load_table
    from wikipedia_org_xmldump_importer_spark.queries.graph_ops import (
        graph_shortest_hops,
    )

    want = {(r.node, r.dist) for r in graph_shortest_hops(spark, SF_SMOKE).collect()}

    o = load_table(spark, SF_SMOKE, "orders")
    li = load_table(spark, SF_SMOKE, "lineitem")
    eb = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(
            F.col("o_custkey").alias("src"),
            (-(F.col("l_suppkey") + 1)).alias("dst"),
        )
        .distinct()
    )
    e = eb.unionByName(
        eb.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    deg = e.groupBy(F.col("src").alias("node")).agg(F.count(F.lit(1)).alias("d"))
    seeds = (
        deg.select(
            "node",
            F.row_number().over(Window.orderBy(F.col("d").desc(), "node")).alias("rk"),
        )
        .filter(F.col("rk") <= 5)
        .select(F.col("node").alias("hub"), F.col("node").alias("node"))
    )
    got_df = (
        multi_source_bfs_local(e, seeds, max_hops=4)
        .groupBy("node")
        .agg(F.min("dist").cast("long").alias("dist"))
    )
    got = {(r.node, r.dist) for r in got_df.collect()}
    assert got == want


def _bfs_out(spark, edges, sources, max_hops):
    e = spark.createDataFrame(pd.DataFrame(edges, columns=["src", "dst"]))
    s = spark.createDataFrame(pd.DataFrame(sources, columns=["hub", "node"]))
    return {
        (r.hub, r.node): r.dist
        for r in multi_source_bfs_local(e, s, max_hops).collect()
    }


def test_synthetic_shapes(spark):
    # ring 0-1-2-3-4-0 (undirected: both directions), star 10->{11,12,13},
    # plus an isolated pair 20-21 (disconnected from both)
    ring = [(i, (i + 1) % 5) for i in range(5)]
    ring += [(b, a) for a, b in ring]
    star = [(10, 11), (10, 12), (10, 13), (11, 10), (12, 10), (13, 10)]
    pair = [(20, 21), (21, 20)]
    edges = ring + star + pair
    out = _bfs_out(spark, edges, [(0, 0), (10, 10), (20, 20)], max_hops=6)
    # ring distances from 0: the two arcs meet at node 2/3
    assert out[(0, 0)] == 0 and out[(0, 1)] == 1 and out[(0, 4)] == 1
    assert out[(0, 2)] == 2 and out[(0, 3)] == 2
    # star: all leaves at 1
    assert out[(10, 11)] == out[(10, 12)] == out[(10, 13)] == 1
    # disconnection: hub 0 never reaches the star or the pair
    assert (0, 10) not in out and (0, 20) not in out
    assert out[(20, 21)] == 1
    # nothing beyond its component
    assert {n for (h, n) in out if h == 20} == {20, 21}


def test_hop_truncation(spark):
    # path 0-1-2-3-4 (undirected); max_hops=2 must stop at node 2
    path = [(i, i + 1) for i in range(4)]
    path += [(b, a) for a, b in path]
    out = _bfs_out(spark, path, [(0, 0)], max_hops=2)
    assert out == {(0, 0): 0, (0, 1): 1, (0, 2): 2}


def test_source_with_no_edges_emits_self(spark):
    out = _bfs_out(spark, [(1, 2), (2, 1)], [(99, 99)], max_hops=3)
    assert out == {(99, 99): 0}


def test_dispatch_threshold_derived_from_measurements():
    """r10 verdict task 6: the kernel/loop boundary is a constant DERIVED
    from the two measured (edges, seconds) points, and the dispatch rule
    picks the measured winner at each point."""
    from wikipedia_org_xmldump_importer_spark.operators.bfs_local import (
        BFS_LOCAL_MAX_EDGES,
        _MEASURED_POINTS,
        choose_bfs_backend,
    )

    (e1, k1, l1), (e2, k2, l2) = _MEASURED_POINTS
    # the measured winners at the two points
    assert k1 < l1 and choose_bfs_backend(e1) == "local"
    assert k2 > l2 and choose_bfs_backend(e2) == "loop"
    # the boundary sits strictly between the points and matches the
    # two-line intersection algebra
    assert e1 < BFS_LOCAL_MAX_EDGES < e2
    ks = (k2 - k1) / (e2 - e1)
    ls = (l2 - l1) / (e2 - e1)
    expected = int(((l1 - ls * e1) - (k1 - ks * e1)) / (ks - ls))
    assert BFS_LOCAL_MAX_EDGES == expected
    # at the intersection both cost models agree (sanity of the fit)
    assert abs(
        (k1 + ks * (BFS_LOCAL_MAX_EDGES - e1))
        - (l1 + ls * (BFS_LOCAL_MAX_EDGES - e1))
    ) < ks * 2  # within the integer-truncation slack of the edge unit
