"""x368 pipeline_e2e_manifest — stage reconciliation (r12 verdict task 3).

The composed curation flagship chains quality -> dedup -> pack -> manifest
(+ the x304 mixture epilogue) in ONE plan; these tests assert that the
composition reconciles with the standalone stage queries it fuses and with
its own conservation laws, at sf0.01 (the driver's correctness SF):

* every manifest row's pack_reconciles flag holds (the packing window's
  final running total equals the aggregate's conditional token sum —
  packed token mass equals deduped corpus mass; the earlier
  max(seq_id)+1 == ceil spelling was straddle-broken, see the x368
  docstring);
* raw doc counts conserve the corpus;
* the quality population equals the registered quality_gopher_rules count;
* dedup is ACTIVE (kept < quality) yet never inverts (kept <= quality);
* mixture weights respect the no-upsampling cap and never overfill the
  token budget (water-filling can only underfill).

Plus the x367 tie: the bitmap-kernel decontamination flags exactly the
doc set x317's relational bloom audit counts.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wikipedia_org_xmldump_importer_spark.registry import REGISTRY, _ensure_loaded

_ensure_loaded()

SF_001 = "/root/testdata/sf0.01"
_PACK_BUDGET = 2048


@pytest.fixture(scope="module")
def manifest(spark):
    return REGISTRY["pipeline_e2e_manifest"].fn(spark, SF_001).collect()


def test_pack_reconciles_everywhere(manifest):
    assert manifest, "empty manifest"
    bad = [r for r in manifest if r.pack_reconciles != 1]
    assert not bad, f"packing failed to reconcile in shards: {bad[:3]}"
    for r in manifest:
        want = -(-r.tokens_kept // _PACK_BUDGET)  # ceil
        assert r.n_sequences == want, (r.lang, r.source, r.n_sequences, want)


def test_raw_counts_conserve_corpus(spark, manifest):
    n_docs = spark.read.parquet(f"{SF_001}/documents.parquet").count()
    assert sum(r.n_docs_raw for r in manifest) == n_docs


def test_quality_population_matches_stage_query(spark, manifest):
    gopher = REGISTRY["quality_gopher_rules"].fn(spark, SF_001)
    n_pass = gopher.filter(F.col("passes_gopher")).count()
    assert sum(r.n_docs_quality for r in manifest) == n_pass


def test_dedup_active_and_monotone(manifest):
    kept = sum(r.n_docs_kept for r in manifest)
    quality = sum(r.n_docs_quality for r in manifest)
    assert kept < quality, "dedup stage dropped nothing — fixture regression"
    for r in manifest:
        assert r.n_docs_kept <= r.n_docs_quality <= r.n_docs_raw


def test_mixture_weights_capped_and_within_budget(manifest):
    per_source: dict[str, int] = {}
    weights: dict[str, float] = {}
    for r in manifest:
        per_source[r.source] = per_source.get(r.source, 0) + r.tokens_kept
        weights[r.source] = r.source_weight
    total = sum(per_source.values())
    budget = total // 2
    for s, w in weights.items():
        assert 0.0 <= w <= 1.0, (s, w)
    expected = sum(weights[s] * a for s, a in per_source.items())
    # water-filling only ever underfills; allow round-6 slack on the sum
    assert expected <= budget * (1 + 1e-6), (expected, budget)
    # and it should not underfill pathologically (the lambda rounds
    # converged on this corpus): at least 90% of the budget is allocated
    assert expected >= 0.9 * budget, (expected, budget)


def test_bitmap_decontamination_matches_relational_audit(spark):
    bitmap = REGISTRY["decontaminate_bitmap"].fn(spark, SF_001)
    n_flagged = bitmap.filter(F.col("is_contaminated") == 1).count()
    audit = REGISTRY["decontaminate_bloom"].fn(spark, SF_001).collect()[0]
    assert n_flagged == audit.n_docs_flagged_bloom
