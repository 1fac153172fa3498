"""Training-data pipeline operators (SURVEY §2.15, x45-x48): plan shapes
and the invariants the oracle hash can't express (proportions, budgets,
broadcast sides)."""

from __future__ import annotations

from conftest import SF_SMOKE

from wikipedia_org_xmldump_importer_spark.plans import (
    executed_plan,
    has_broadcast_hash_join,
)
from wikipedia_org_xmldump_importer_spark.queries.pipeline import (
    _PACK_BUDGET,
    _STRATA_RATES,
    decontaminate_ngram,
    pack_sequences,
    sample_stratified,
    split_train_hash,
)


def test_decontaminate_broadcasts_eval_side(spark):
    # The 100 TB contract: the (tiny) eval n-gram set is the broadcast side;
    # the corpus never shuffles against itself.
    df = decontaminate_ngram(spark, SF_SMOKE)
    assert has_broadcast_hash_join(df)
    assert "SortMergeJoin" not in executed_plan(df)


def test_decontaminate_flags_share_real_grams(spark):
    flagged = decontaminate_ngram(spark, SF_SMOKE).collect()
    for row in flagged:
        assert row.doc_id % 97 != 0  # eval docs never flag themselves
        assert row.n_shared_grams >= 1
        assert row.n_eval_docs >= 1


def test_split_is_narrow_and_proportioned(spark):
    df = split_train_hash(spark, SF_SMOKE)
    assert "Exchange" not in executed_plan(df), "split must be a narrow map"
    counts = {r.split: r.n for r in df.groupBy("split").count().withColumnRenamed("count", "n").collect()}
    total = sum(counts.values())
    assert total == 500
    # 90/5/5 within sampling noise of a 500-row corpus
    assert 0.85 <= counts["train"] / total <= 0.95
    assert counts.get("valid", 0) > 0 and counts.get("test", 0) > 0


def test_split_is_deterministic_across_runs(spark):
    a = {r.doc_id: r.split for r in split_train_hash(spark, SF_SMOKE).collect()}
    b = {r.doc_id: r.split for r in split_train_hash(spark, SF_SMOKE).collect()}
    assert a == b


def test_stratified_rates_per_lang(spark):
    df = sample_stratified(spark, SF_SMOKE)
    assert "Exchange" not in executed_plan(df), "sampling must be a narrow map"
    kept = {r.lang: r.n for r in df.groupBy("lang").count().withColumnRenamed("count", "n").collect()}
    # loose per-stratum rate check: observed keep rate tracks the configured one
    from wikipedia_org_xmldump_importer_spark.io import load_table

    totals = {
        r.lang: r.n
        for r in load_table(spark, SF_SMOKE, "documents")
        .groupBy("lang")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    for lang, n_kept in kept.items():
        rate = _STRATA_RATES.get(lang, 500) / 1000
        observed = n_kept / totals[lang]
        assert abs(observed - rate) < 0.2, (lang, observed, rate)


def test_pack_respects_budget_and_covers_all_docs(spark):
    rows = pack_sequences(spark, SF_SMOKE).collect()
    assert len(rows) == 500  # every doc is packed exactly once
    for r in rows:
        assert 0 <= r.seq_offset < _PACK_BUDGET
        assert r.seq_id >= 0
    # within a shard, seq_ids are dense from 0
    shards = {}
    for r in rows:
        shards.setdefault((r.lang, r.source), []).append(r)
    for members in shards.values():
        seq_ids = {m.seq_id for m in members}
        assert min(seq_ids) == 0


def test_merge_upsert_rejects_reserved_marker_columns(spark):
    """The presence markers __b_present/__d_present are appended to the
    inputs; an identically-named input column would be silently
    overwritten, corrupting presence detection (r4 ADVICE)."""
    import pytest
    from pyspark.sql import functions as F

    from wikipedia_org_xmldump_importer_spark.operators.merge import merge_upsert

    df = spark.range(3).withColumn("__b_present", F.lit(1))
    with pytest.raises(ValueError, match="reserved column"):
        merge_upsert(df, df, keys=["id"])
