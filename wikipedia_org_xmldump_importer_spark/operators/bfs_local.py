"""Single-task multi-source BFS kernel — the small-graph fast path for the
driver-loop graph family (k5, SURVEY §2.18; the x313/x63-class contract).

The registered iterative graph queries (x313 closeness, x226 shortest
hops, x63 pagerank, ...) run O(rounds) keyed joins with localCheckpoint
lineage cuts. That shape is the correct ≥1M-edge path — state linear in
V, one shuffle per round — but below ``SMALL_GRAPH_EDGES`` the edge list
fits ONE task and the loop's cost is pure scheduling: ~7 exchanges × AQE
stage latency PER ROUND regardless of data (trap #8). operators/graph.py
already solves that regime for connected components with in-partition
union-find; this module is the same adaptation for bounded multi-source
BFS: one shuffle moves the edges (plus the tagged source rows — no
driver collect) into a single Arrow batch, a dict-adjacency BFS runs all
sources to ``max_hops``, and the output is the exact (hub, node, dist)
relation the join loop converges to.

Exactness: BFS distances are integers and ties cannot exist (a node's
distance IS its discovery round), so the in-task BFS is row-for-row
integer-identical to the min-aggregated frontier joins —
tests/test_bfs_local.py asserts equality against the registered x313
output INCLUDING its 6dp-pinned closeness epilogue, plus synthetic
graphs (disconnected, ring, star, hop-truncated).

100 TB notes: this kernel is for graphs that FIT A TASK (two long
columns at 1M edges ≈ 16 MB; the BFS state is |sources|×|reached|
longs). Past that, stay on the registered join-loop — the adaptation
mirrors what AQE cannot do (it never sees across a driver loop's
rounds, so the operator adapts itself). The crossover is MEASURED, not
hypothetical (BENCH_SF1.json note): on x313's customer↔supplier graph
the kernel wins at sf0.1 (7.1 s vs 9.0 s — the 6-round scheduling floor
collapses) and LOSES at the sf1 replica (47.9 s vs 24.3 s — one task's
Python BFS against 10x the edges), so callers should gate on edge count
exactly as operators/graph.py does for union-find.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .graph import SMALL_GRAPH_EDGES

__all__ = [
    "multi_source_bfs_local",
    "closeness_hubs_local",
    "choose_bfs_backend",
    "BFS_LOCAL_MAX_EDGES",
    "SMALL_GRAPH_EDGES",
]

# ---------------------------------------------------------------------------
# Measured dispatch boundary (r10 verdict task 6: a constant DERIVED from the
# two measured points, not prose). Both backends are ~linear in edge count in
# the measured range — the kernel is one task's Python BFS (steep slope, tiny
# intercept), the join loop pays a per-round scheduling floor (large
# intercept, shallow slope) — so fit each through its two (edges, seconds)
# points and take the intersection.
# ---------------------------------------------------------------------------

#: (edge_count, kernel_seconds, join_loop_seconds) — BENCH_SF1.json, the
#: x313 customer↔supplier graph: symmetrized distinct edges 1_173_742 at
#: sf0.1 (kernel 7.1 s vs loop 9.0 s — kernel wins) and the 10× sf1 replica
#: (47.9 s vs 24.3 s — loop wins).
_MEASURED_POINTS = (
    (1_173_742, 7.1, 9.0),
    (11_737_420, 47.9, 24.3),
)


def _crossover_edges() -> int:
    (e1, k1, l1), (e2, k2, l2) = _MEASURED_POINTS
    k_slope = (k2 - k1) / (e2 - e1)
    l_slope = (l2 - l1) / (e2 - e1)
    k_icpt = k1 - k_slope * e1
    l_icpt = l1 - l_slope * e1
    return int((l_icpt - k_icpt) / (k_slope - l_slope))


#: Edge-count boundary: at or below, the single-task kernel is measured
#: faster; above, use the registered join-loop form. ≈1.96M edges on this
#: box — re-derive by editing _MEASURED_POINTS if the hardware changes.
BFS_LOCAL_MAX_EDGES = _crossover_edges()


def choose_bfs_backend(edge_count: int) -> str:
    """Dispatch rule for bounded multi-source BFS: ``"local"`` (this
    module's single-task kernel) iff the graph is at or under the measured
    crossover, else ``"loop"`` (the keyed-join frontier loop)."""
    return "local" if edge_count <= BFS_LOCAL_MAX_EDGES else "loop"


def multi_source_bfs_local(
    edges: DataFrame, sources: DataFrame, max_hops: int
) -> DataFrame:
    """Exact bounded BFS from every source over a single-task graph.

    ``edges``: (src long, dst long) DIRECTED edge rows (symmetrize first
    for undirected semantics, as the callers do). ``sources``:
    (hub long, node long) start rows — dist(hub, node)=0. Returns
    (hub, node, dist) for every node within ``max_hops`` of each hub,
    min-distance semantics, exactly the fixpoint of the join-loop form.

    The edge and source rows are UNIONED with a marker column and
    shuffled into one group — no ``.collect()``, the ledger stays clean;
    caller guarantees the graph is under ``SMALL_GRAPH_EDGES``.
    """
    tagged = edges.select(
        F.lit(0).alias("kind"), F.col("src").alias("a"), F.col("dst").alias("b")
    ).unionAll(
        sources.select(
            F.lit(1).alias("kind"), F.col("hub").alias("a"), F.col("node").alias("b")
        )
    )

    def _bfs(pdf):
        import pandas as pd  # noqa: PLC0415

        edges_pd = pdf[pdf["kind"] == 0]
        srcs_pd = pdf[pdf["kind"] == 1]
        adj: dict[int, list[int]] = {}
        for a, b in zip(edges_pd["a"].to_numpy(), edges_pd["b"].to_numpy()):
            adj.setdefault(int(a), []).append(int(b))
        out_h: list[int] = []
        out_n: list[int] = []
        out_d: list[int] = []
        for hub, start in zip(srcs_pd["a"].to_numpy(), srcs_pd["b"].to_numpy()):
            hub, start = int(hub), int(start)
            dist = {start: 0}
            frontier = [start]
            for d in range(1, max_hops + 1):
                nxt = []
                for u in frontier:
                    for v in adj.get(u, ()):
                        if v not in dist:
                            dist[v] = d
                            nxt.append(v)
                if not nxt:
                    break
                frontier = nxt
            out_h.extend([hub] * len(dist))
            out_n.extend(dist.keys())
            out_d.extend(dist.values())
        return pd.DataFrame({"hub": out_h, "node": out_n, "dist": out_d})

    return (
        tagged.groupBy(F.lit(0).alias("g"))
        .applyInPandas(_bfs, schema="hub long, node long, dist long")
    )


def closeness_hubs_local(spark, sf_dir: str) -> DataFrame:
    """x313's output via the single-task BFS: identical hub selection,
    identical distances, identical Wasserman-Faust epilogue (6dp-pinned
    ratio). tests/test_bfs_local.py asserts exact row equality with the
    registered ``graph_closeness_hubs`` — the two epilogues must never
    drift (queries/graph_ops.py:1431)."""
    from pyspark.sql import Window  # noqa: PLC0415

    from ..io import load_table  # noqa: PLC0415

    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    eb = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(
            F.col("o_custkey").alias("src"),
            (-(F.col("l_suppkey") + 1)).alias("dst"),
        )
        .distinct()
    )
    e = eb.union(
        eb.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    e = e.localCheckpoint(eager=True)
    nn = e.select("src").distinct().count()
    deg = e.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("degree")
    )
    hubs = (
        deg.select(
            "node",
            "degree",
            F.row_number()
            .over(Window.orderBy(F.col("degree").desc(), "node"))
            .alias("rk"),
        )
        .filter(F.col("rk") <= 12)
        .drop("rk")
    )
    cur = multi_source_bfs_local(
        e, hubs.select(F.col("node").alias("hub"), "node"), max_hops=6
    )
    return (
        cur.join(F.broadcast(hubs.select(F.col("node").alias("hub"), "degree")), "hub")
        .groupBy("hub")
        .agg(
            F.max("degree").alias("degree"),
            F.count(F.lit(1)).cast("long").alias("n_reached"),
            F.sum("dist").cast("long").alias("sum_dist"),
            F.round(
                (F.count(F.lit(1)) - 1).cast("double")
                * (F.count(F.lit(1)) - 1)
                / (F.lit(float(nn - 1)) * F.sum("dist")),
                6,
            ).alias("closeness_wf"),
        )
    )
