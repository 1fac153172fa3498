"""Iterative connected components over a pair graph (SURVEY §2 x29).

The missing last step of every dedup pipeline: near-dup PAIRS (minhash /
simhash / jaccard candidates) must become duplicate CLUSTERS before a keeper
can be chosen per cluster — i.e. union-find, expressed as min-label
propagation so it runs as pure DataFrame joins/aggregations.

Algorithm: every vertex starts labeled with its own id; each round, every
vertex takes the min of its label and its neighbors' labels; at the fixpoint
every vertex carries the min id of its component. Convergence needs
O(diameter) rounds — and because the edge-builder below emits STAR edges
(each fingerprint group links to the group's min doc, never pairwise), the
diameter stays small by construction.

100 TB notes: each round is one join (edges ⋈ labels, shuffle on vertex id —
both sides can be pre-partitioned on id so the partitioning is reused
round-to-round) + one partial-aggregated groupBy. ``localCheckpoint`` after
every round truncates the lineage so round k does not replay rounds 1..k-1
(the classic iterative-algorithm trap). For web-scale graphs swap the plain
propagation for the large-star/small-star variant (Kiveris et al., "Connected
Components in MapReduce and Beyond") — same DataFrame machinery, O(log n)
rounds on adversarial diameters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Below this many edges the whole graph fits ONE task (two long columns at
# 1M edges ≈ 16 MB), and the iterative join loop's cost is pure scheduling:
# each round is ~7 exchanges × AQE stage latency regardless of data size.
# Solve those single-task graphs with in-partition union-find instead —
# same result, one shuffle + one Arrow batch. This mirrors AQE's own
# adaptivity (e.g. SMJ→BHJ on observed size), which cannot see across the
# rounds of a driver loop, so the operator must adapt itself.
SMALL_GRAPH_EDGES = 1_000_000


def _solve_single_task(vertices: DataFrame, edges_mat: DataFrame) -> DataFrame:
    """Union-find (path compression) inside one applyInPandas task.

    Correct only because the caller guarantees edges_mat fits a single
    group; the groupBy(lit(0)) shuffles every edge into that one group.
    Vertices absent from every edge are isolated → comp = own id, via the
    left join + coalesce (keeps the vertex side fully distributed).
    """
    import pandas as pd  # noqa: PLC0415

    def _uf(pdf: pd.DataFrame) -> pd.DataFrame:
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            r = x
            while parent.get(r, r) != r:
                r = parent[r]
            while parent.get(x, x) != x:
                parent[x], x = r, parent[x]
            return r

        for a, b in zip(pdf["a"].to_numpy(), pdf["b"].to_numpy()):
            ra, rb = find(int(a)), find(int(b))
            if ra != rb:
                parent[ra] = rb
        nodes = set(map(int, pdf["a"])) | set(map(int, pdf["b"]))
        root_min: dict[int, int] = {}
        roots = {n: find(n) for n in nodes}
        for n, r in roots.items():
            root_min[r] = min(root_min.get(r, n), n)
        return pd.DataFrame(
            {"id": list(roots), "comp": [root_min[r] for r in roots.values()]}
        )

    found = (
        edges_mat.groupBy(F.lit(0).alias("g"))
        .applyInPandas(lambda pdf: _uf(pdf), "id long, comp long")
    )
    return (
        vertices.select("id")
        .join(found, "id", "left")
        .select("id", F.coalesce("comp", "id").alias("comp"))
    )


def connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    max_iter: int = 25,
    small_graph_edges: int = SMALL_GRAPH_EDGES,
) -> DataFrame:
    """Min-label propagation to fixpoint.

    vertices: one column ``id`` (long). edges: columns ``a``, ``b`` — an
    undirected edge per row (either orientation; symmetrized here).
    Returns (id, comp) with comp = min vertex id in the component.
    """
    # Materialize the (possibly expensive) edge pipeline ONCE — without this
    # every propagation round replays the upstream plan that produced the
    # edges (fingerprint hashing, windows, ...), which dominated the loop.
    edges_mat = edges.select("a", "b").localCheckpoint(eager=True)
    if edges_mat.count() <= small_graph_edges:
        return _solve_single_task(vertices, edges_mat)
    sym = (
        edges_mat
        .union(edges_mat.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .localCheckpoint(eager=True)
    )
    # Right-size the loop's parallelism to the materialized graph: a few
    # thousand edges do not need 32 tasks × ~4 jobs × ~6 rounds of
    # scheduling overhead. At real scale (≥ ~1M edges per 32 slots) this
    # keeps full parallelism — the knob scales with the data, like AQE
    # coalescing, which cannot see across the rounds of a driver loop.
    n_edges = sym.count()
    slots = max(sym.sparkSession.sparkContext.defaultParallelism, 1)
    parts = max(1, min(slots, n_edges // 30_000 + 1))
    if parts < sym.rdd.getNumPartitions():
        sym = sym.repartition(parts).localCheckpoint(eager=True)
    # Seed labels with the neighbor-min already — equivalent to running the
    # first propagation round during init, one join cheaper than a loop
    # round (no pointer jump, no change check needed yet).
    seed_min = sym.groupBy(F.col("a").alias("id")).agg(F.min("b").alias("nbr0"))
    labels = (
        vertices.select("id")
        .join(seed_min, "id", "left")
        .select("id", F.least("id", F.coalesce("nbr0", "id")).alias("comp"))
        .repartition(parts)
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        # (1) neighbor-min: pull the smallest label across each edge.
        nbr_min = (
            sym.join(labels, sym.a == labels.id)
            .groupBy(F.col("b").alias("id"))
            .agg(F.min("comp").alias("nbr_comp"))
        )
        stepped = labels.join(nbr_min, "id", "left").select(
            "id",
            F.col("comp").alias("old_comp"),
            F.least(F.col("comp"), F.coalesce("nbr_comp", F.col("comp"))).alias(
                "comp1"
            ),
        )
        # (2) pointer jump (path halving): follow comp1 to ITS current
        # label, so label distance doubles per round — a 2^k-hop chain
        # resolves in O(log diameter) rounds instead of O(diameter), the
        # same acceleration trick as union-find path compression.
        ptr = labels.select(
            F.col("id").alias("p_id"), F.col("comp").alias("p_comp")
        )
        new_labels = (
            stepped.join(ptr, stepped.comp1 == ptr.p_id, "left")
            .select(
                "id",
                "old_comp",
                F.least(
                    F.col("comp1"), F.coalesce("p_comp", F.col("comp1"))
                ).alias("comp"),
            )
            .localCheckpoint(eager=True)
        )
        # Change detection rides on the SAME materialized frame (old_comp
        # was carried through) — no extra join job per round.
        changed = new_labels.filter(F.col("comp") != F.col("old_comp")).limit(1).count()
        labels = new_labels.select("id", "comp")
        if changed == 0:
            break
    else:
        # Pointer jumping doubles label distance per round, so max_iter=25
        # covers diameters up to ~2^25 — reaching here means the graph (or a
        # bug) defeated that bound. Returning partial labels would silently
        # merge/split clusters downstream; fail loudly instead.
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds; "
            "raise max_iter or check the edge pipeline for pathological input"
        )
    return labels
