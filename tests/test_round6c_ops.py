"""Invariants for the x132-x137 operator batch: SCD2 chain integrity,
ablation accounting, index bounds, mixing-coefficient range. All at
sf0.001 (smoke grain) except where noted."""

from __future__ import annotations

from collections import defaultdict

from conftest import SF_SMOKE
from pyspark.sql import functions as F

from wikipedia_org_xmldump_importer_spark.io import load_table
from wikipedia_org_xmldump_importer_spark.queries.aggregates import (
    agg_gini_concentration,
)
from wikipedia_org_xmldump_importer_spark.queries.graph_ops import (
    graph_degree_assortativity,
)
from wikipedia_org_xmldump_importer_spark.queries.merge_ops import scd2_merge_batch
from wikipedia_org_xmldump_importer_spark.queries.quality_ops import (
    curation_ablation_report,
)
from wikipedia_org_xmldump_importer_spark.queries.timeseries import (
    events_user_diversity,
)


def test_scd2_merge_chain_integrity(spark):
    """Per key: versions are dense 1..k, exactly one current row, every
    closed row's valid_to equals the next version's valid_from, and batch
    rows never precede history rows in version order."""
    rows = scd2_merge_batch(spark, SF_SMOKE).collect()
    by_key = defaultdict(list)
    for r in rows:
        by_key[r.o_custkey].append(r)
    for chain in by_key.values():
        chain.sort(key=lambda r: r.version)
        assert [r.version for r in chain] == list(range(1, len(chain) + 1))
        assert sum(r.is_current for r in chain) == 1
        assert chain[-1].is_current and chain[-1].valid_to is None
        for prev, nxt in zip(chain, chain[1:]):
            assert prev.valid_to == nxt.valid_from
        srcs = [r.src for r in chain]
        assert srcs == sorted(srcs, key=lambda s: s == "batch") or (
            "history" not in srcs or "batch" not in srcs
            or srcs.index("batch") > max(i for i, s in enumerate(srcs) if s == "history")
        )


def test_ablation_accounting(spark):
    """unique kills ≤ fails per gate; survivors ≤ docs − max unique kills;
    the dedup gate kills exactly the duplicate rows."""
    rows = curation_ablation_report(spark, SF_SMOKE).collect()
    assert {r.gate for r in rows} == {
        "min_length",
        "min_words",
        "exact_dedup",
        "repetition",
    }
    n_docs = rows[0].n_docs
    n_surv = rows[0].n_survivors
    docs = load_table(spark, SF_SMOKE, "documents")
    assert n_docs == docs.count()
    total_unique = 0
    for r in rows:
        assert 0 <= r.n_unique_kills <= r.n_failed <= n_docs
        assert r.n_docs == n_docs and r.n_survivors == n_surv
        total_unique += r.n_unique_kills
    # uniquely-killed docs are disjoint from survivors and from each other
    assert n_surv + total_unique <= n_docs
    dup_fail = next(r for r in rows if r.gate == "exact_dedup").n_failed
    n_distinct_texts = docs.select(F.lower(F.trim("text"))).distinct().count()
    assert dup_fail == n_docs - n_distinct_texts


def test_gini_bounds_and_uniform_zero(spark, tmp_path):
    """0 ≤ G < 1 on real data; G == 0 when every customer has identical
    revenue (uniform distribution has no concentration)."""
    r = agg_gini_concentration(spark, SF_SMOKE).collect()[0]
    assert 0.0 <= r.gini < 1.0
    uniform = spark.range(100).selectExpr(
        "id AS o_custkey",
        "CAST(42.00 AS DOUBLE) AS o_totalprice",
        "CAST('2024-01-01' AS TIMESTAMP) AS o_orderdate",
        "id AS o_orderkey",
        "'F' AS o_orderstatus",
    )
    out = str(tmp_path / "uni")
    uniform.write.mode("overwrite").parquet(out + "/orders.parquet")
    g = agg_gini_concentration(spark, out).collect()[0]
    assert g.gini == 0.0
    assert g.n == 100


def test_assortativity_is_a_correlation(spark):
    """|r| ≤ 1 and the directed-edge count is even (both orientations)."""
    r = graph_degree_assortativity(spark, SF_SMOKE).collect()[0]
    assert r.n_directed_edges % 2 == 0
    assert -1.0 <= r.assortativity <= 1.0


def test_diversity_bounds_and_type_consistency(spark):
    """0 ≤ GS ≤ 1 − 1/k for k observed types; single-type users get 0;
    event totals conserve."""
    rows = events_user_diversity(spark, SF_SMOKE).collect()
    total = sum(r.n_events for r in rows)
    assert total == load_table(spark, SF_SMOKE, "events").count()
    for r in rows:
        assert 1 <= r.n_types
        upper = 1.0 - 1.0 / r.n_types
        assert 0.0 <= r.gini_simpson <= upper + 1e-9
        if r.n_types == 1:
            assert r.gini_simpson == 0.0


def test_snaive_alignment_is_calendar_exact(spark):
    """Re-derive the backtest from the hourly grid: scored hours are
    exactly those with a grid entry 24h earlier — row-lag semantics would
    differ whenever hours are missing."""
    from wikipedia_org_xmldump_importer_spark.queries.timeseries import (
        ts_forecast_snaive,
    )

    h = (
        load_table(spark, SF_SMOKE, "events")
        .groupBy("event_type", F.date_trunc("hour", "ts").alias("hr"))
        .agg(F.count(F.lit(1)).alias("x"))
        .collect()
    )
    grid = {(r.event_type, r.hr): r.x for r in h}
    import datetime

    expected = defaultdict(lambda: [0, 0])
    day = datetime.timedelta(hours=24)
    for (et, hr), x in grid.items():
        prev = grid.get((et, hr - day))
        if prev is not None:
            expected[et][0] += 1
            expected[et][1] += abs(x - prev)
    for r in ts_forecast_snaive(spark, SF_SMOKE).collect():
        n, s = expected[r.event_type]
        assert r.n_scored_hours == n
        assert r.abs_err_sum == s
        assert abs(r.mae - round(s / n, 6)) < 1e-9
