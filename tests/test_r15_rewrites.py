"""Equivalence locks for the r15 optimization rewrites.

Each rewrite here has two row-identical plan shapes (a local/broadcast
branch and an at-scale branch, or a restructured single shape proven
against the oracle); these tests pin the identities so future edits cannot
silently diverge them.
"""

from pyspark.sql import functions as F

from wikipedia_org_xmldump_importer_spark.io import table_broadcastable
from wikipedia_org_xmldump_importer_spark.registry import REGISTRY, _ensure_loaded

SF = "/root/testdata/sf0.001"

_ensure_loaded()


def _rows(df):
    return sorted(map(str, df.collect()))


def test_table_broadcastable_small_table_true(spark):
    assert table_broadcastable(spark, SF, "orders") is True


def test_table_broadcastable_disabled_threshold_false(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        assert table_broadcastable(spark, SF, "orders") is False
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_table_broadcastable_missing_path_false(spark):
    assert table_broadcastable(spark, "/nonexistent", "orders") is False


def test_flagship_branches_row_identical(spark):
    """flagship_star_revenue: the join-first (broadcastable-orders) branch
    and the order-grain pre-agg (at-scale) branch must emit identical rows.
    The branch is driven by table_broadcastable, which reads the session's
    autoBroadcastJoinThreshold at call time."""
    fn = REGISTRY["flagship_star_revenue"].fn
    local = _rows(fn(spark, SF))
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        at_scale_df = fn(spark, SF)
        # the pre-agg branch is recognizable by its order-grain rev_u partial
        plan = at_scale_df._jdf.queryExecution().optimizedPlan().toString()
        assert "rev_u" in plan
        at_scale = _rows(at_scale_df)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert local == at_scale and len(local) > 0


def test_pagerank_contribution_form_matches_edge_division(spark):
    """x63 r15: per-node contribution w = p/outdeg on the broadcast side
    must reproduce the per-edge division exactly (same divisions, same
    addend multiset). Replays one propagation round both ways on sf0.001
    and compares the rounded rank maps."""
    from wikipedia_org_xmldump_importer_spark.io import load_table

    orders = load_table(spark, SF, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_suppkey")
    eb = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            F.col("o_custkey").alias("src"),
            (-(F.col("l_suppkey") + 1)).alias("dst"),
        )
        .distinct()
    )
    sym = eb.unionByName(
        eb.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint()
    deg = sym.groupBy("src").agg(F.count("*").alias("outdeg")).localCheckpoint()
    n = deg.count()
    ranks = deg.select(
        F.col("src").alias("node"), F.round(F.lit(1.0 / n), 10).alias("p")
    )
    # edge-grain division (old form)
    edges = sym.join(deg, "src")
    old_form = (
        edges.join(ranks, edges.src == ranks.node)
        .groupBy(F.col("dst").alias("node"))
        .agg(
            F.round(
                F.lit(0.15 / n) + 0.85 * F.sum(F.col("p") / F.col("outdeg")), 10
            ).alias("p")
        )
    )
    # vertex-grain contribution (new form)
    contrib = ranks.join(deg, ranks.node == deg.src).select(
        "node", (F.col("p") / F.col("outdeg")).alias("w")
    )
    new_form = (
        sym.join(contrib, sym.src == contrib.node)
        .groupBy(F.col("dst").alias("node"))
        .agg(F.round(F.lit(0.15 / n) + 0.85 * F.sum("w"), 10).alias("p"))
    )
    assert _rows(old_form) == _rows(new_form)
