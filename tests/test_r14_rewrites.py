"""Focused internals tests for the r14 batch-13/14/15 rewrites.

Each rewrite in this round is oracle-hash-proven end-to-end at three SFs;
these tests additionally lock the EQUIVALENCE ARGUMENT each rewrite rests
on, on small constructed frames where the old spelling can run next to the
new one — so a future edit that breaks the argument (not just the current
data) fails fast.
"""

from __future__ import annotations

from pyspark.sql import functions as F, Window

from tests.conftest import SF_CORRECT
from wikipedia_org_xmldump_importer_spark.registry import REGISTRY, _ensure_loaded

_ensure_loaded()


def test_gap_memory_lead_pairs_match_self_join(spark):
    """events_gap_memory r14: LEAD over the (type, ts, id) window produces
    exactly the consecutive-gap pairs the old (type, i+1) self-join built —
    including a 1-event type (no pairs) and a 2-event type (one gap, still
    no pair)."""
    rows = [
        ("a", 10, 1), ("a", 13, 2), ("a", 19, 3), ("a", 20, 4),
        ("b", 5, 5), ("b", 9, 6),
        ("c", 7, 7),
    ]
    ev = spark.createDataFrame(rows, "event_type string, ts_us long, event_id long")
    w = Window.partitionBy("event_type").orderBy("ts_us", "event_id")
    gaps = ev.select(
        "event_type",
        "ts_us",
        "event_id",
        (F.col("ts_us") - F.lag("ts_us").over(w)).alias("g"),
        F.row_number().over(w).alias("i"),
    )
    # old spelling: join row i with row i+1
    a = gaps.filter(F.col("g").isNotNull())
    b = gaps.filter(F.col("g").isNotNull()).select(
        F.col("event_type").alias("bet"), F.col("g").alias("g2"), F.col("i").alias("bi")
    )
    old = (
        a.join(b, (F.col("bet") == F.col("event_type")) & (F.col("bi") == F.col("i") + 1))
        .select("event_type", F.col("g").alias("g1"), "g2")
    )
    # new spelling: lead over the same window
    new = (
        gaps.select("event_type", F.col("g").alias("g1"), F.lead("g").over(w).alias("g2"))
        .filter(F.col("g1").isNotNull() & F.col("g2").isNotNull())
    )
    assert sorted(map(tuple, old.collect())) == sorted(map(tuple, new.collect()))
    # type 'a': gaps 3,6,1 -> pairs (3,6),(6,1); 'b': one gap -> none
    assert sorted(map(tuple, new.collect())) == [("a", 3, 6), ("a", 6, 1)]


def test_mood_median_value_grain_equals_row_grain(spark):
    """agg_mood_median r14: the first cents whose cumulative count reaches
    rank floor((N+1)/2) IS the row-grain rank-discrete lower median —
    exercised with heavy ties straddling the median rank and both parities
    of N."""
    for values in (
        [5, 5, 5, 1, 9],            # N=5 target rank 3 inside the 5-block
        [2, 2, 7, 7],               # N=4 target rank 2 at a block edge
        [3],                        # N=1
        [4, 4, 4, 4, 8, 8, 1, 1],   # N=8 target rank 4 ends the 4-block
    ):
        df = spark.createDataFrame([(v,) for v in values], "cents long")
        rk = df.select(
            "cents",
            F.row_number().over(Window.orderBy("cents")).alias("rn"),
            F.count(F.lit(1)).over(Window.partitionBy()).alias("nn"),
        )
        old = rk.agg(
            F.min(
                F.when(F.col("rn") == F.floor((F.col("nn") + 1) / 2), F.col("cents"))
            ).alias("med")
        ).collect()[0]["med"]
        gv = df.groupBy("cents").agg(F.count(F.lit(1)).alias("c"))
        w_ord = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, 0)
        cum = gv.select(
            "cents",
            F.sum("c").over(w_ord).alias("cc"),
            F.sum("c").over(Window.partitionBy()).alias("nn"),
        )
        new = cum.agg(
            F.min(
                F.when(F.col("cc") >= F.floor((F.col("nn") + 1) / 2), F.col("cents"))
            ).alias("med")
        ).collect()[0]["med"]
        assert old == new, values


def test_orphans_chained_left_joins_preserve_row_count(spark):
    """dq_referential_orphans r14: chaining DISTINCT key-only dim left
    joins preserves the fact row count exactly (the property the one-scan
    multi-edge agg rests on) — including a dim side that arrives with
    duplicate keys and a fact row orphaned on one edge but not another."""
    fact = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 99), (4, 10)], "fk1 long, fk2 long"
    )
    d1 = spark.createDataFrame([(1,), (2,), (2,), (3,)], "k1 long")  # dup key
    d2 = spark.createDataFrame([(10,), (20,)], "k2 long")
    j = fact.join(
        F.broadcast(d1.select("k1").distinct()), fact.fk1 == F.col("k1"), "left"
    ).join(F.broadcast(d2.select("k2").distinct()), fact.fk2 == F.col("k2"), "left")
    agg = j.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("k1").isNull(), 1).otherwise(0)).alias("o1"),
        F.sum(F.when(F.col("k2").isNull(), 1).otherwise(0)).alias("o2"),
    ).collect()[0]
    assert agg["n"] == 4          # dup dim key did NOT multiply rows
    assert agg["o1"] == 1         # fk1=4 orphan
    assert agg["o2"] == 1         # fk2=99 orphan


def test_orphans_emits_every_fk_edge_once(spark):
    """The stack() unpivot must reproduce one row per declared FK edge."""
    from wikipedia_org_xmldump_importer_spark.queries.quality_ops import _FK_EDGES

    out = REGISTRY["dq_referential_orphans"].fn(spark, SF_CORRECT).collect()
    assert sorted(r["fk_edge"] for r in out) == sorted(n for n, *_ in _FK_EDGES)
    assert all(r["n_orphans"] == 0 for r in out)  # clean TPC-H data


def test_keep_best_vmax_count_equals_snapshot_max_version(spark):
    """scd2_merge_batch r14: COUNT(*) per key over pre-cutoff rows equals
    max(version) from the snapshot window (version is a gapless
    row_number)."""
    from wikipedia_org_xmldump_importer_spark.operators.merge import scd2_snapshot

    rows = [(1, "2020-01-01", 100), (1, "2020-02-01", 101),
            (1, "2020-03-01", 102), (2, "2020-01-15", 103)]
    df = spark.createDataFrame(rows, "k long, ts string, tb long")
    hist = scd2_snapshot(df, key="k", ts_col="ts", tiebreak="tb")
    vmax_old = {
        r["k"]: r["m"]
        for r in hist.groupBy("k").agg(F.max("version").alias("m")).collect()
    }
    vmax_new = {
        r["k"]: r["m"]
        for r in df.groupBy("k").agg(F.count(F.lit(1)).alias("m")).collect()
    }
    assert vmax_old == vmax_new == {1: 3, 2: 1}


def test_association_rules_mask_path_matches_selfjoin_fallback(spark):
    """x299 r14: the ≤62-brand mask-histogram path must emit row-for-row
    the same directed rules/support/confidence/lift as the per-basket
    self-join fallback (the pre-r14 spelling, kept as the >62-brand
    path)."""
    from pyspark.sql import functions as F

    from wikipedia_org_xmldump_importer_spark.io import load_table
    from wikipedia_org_xmldump_importer_spark.queries.aggregates import (
        _basket_association_rules_selfjoin,
    )

    sf = "/root/testdata/sf0.001"
    li = load_table(spark, sf, "lineitem")
    part = load_table(spark, sf, "part")
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    old = (
        _basket_association_rules_selfjoin(joined)
        .toPandas()
        .sort_values(["antecedent", "consequent"])
        .reset_index(drop=True)
    )
    new = (
        REGISTRY["basket_association_rules"].fn(spark, sf)
        .toPandas()
        .sort_values(["antecedent", "consequent"])
        .reset_index(drop=True)
    )
    assert old.equals(new)


def test_grid_2d_one_sided_explode_emits_pairs_once(spark):
    """join_grid_2d r14: with only side A exploded to its 9 distinct
    neighbor cells and side B on its home cell, every qualifying pair is
    emitted exactly once — the proof the dropped .distinct() rested on.
    Constructed so pairs span same-cell AND adjacent-cell matches."""
    out = REGISTRY["join_grid_2d"].fn(spark, SF_CORRECT)
    pairs = out.select("key_a", "key_b").collect()
    assert len(pairs) == len(set((r["key_a"], r["key_b"]) for r in pairs))
