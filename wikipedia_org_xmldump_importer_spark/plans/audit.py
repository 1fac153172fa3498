"""Registry-wide physical-plan audit — the automated "explain and iterate"
gate (SURVEY §5.4 at fleet scale).

Sweeps every registered query's physical plan for the anti-patterns that
are survivable at sf0.1 but fatal at 100 TB, with an explicit per-query
allowlist for the operators whose SURVEY §2 row *declares* the pattern as
bounded-by-construction. A new query that introduces an unbounded
cartesian, a BroadcastNestedLoopJoin, or a row-at-a-time Python UDF fails
tests/test_plan_audit.py until it is either fixed or explicitly declared
here with a justification — silent scale regressions can't land.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import SparkSession

from ..registry import REGISTRY, _ensure_loaded
from .inspect import executed_plan

#: plan substrings that are red flags at scale, and why
RED_FLAGS: dict[str, str] = {
    "CartesianProduct": "unbounded O(n*m) pair materialization",
    "BroadcastNestedLoopJoin": (
        "per-pair predicate evaluation outside codegen'd hash/sort joins"
    ),
    "BatchEvalPython": "row-at-a-time Python UDF (no Arrow batching)",
}

#: (query, flag) pairs that are DECLARED acceptable, with the reason the
#: SURVEY row / docstring gives. Keep justifications honest — this list is
#: audited by humans, not just tests.
ALLOWLIST: dict[tuple[str, str], str] = {
    ("basket_association_rules", "BroadcastNestedLoopJoin"): (
        "1-row basket-total frame broadcast-crossed onto the rule "
        "candidates for the integer-sided support gate — bounded by "
        "construction (x299)"
    ),
    ("agg_design_effect_icc", "BroadcastNestedLoopJoin"): (
        "two 1-row global-moment frames crossed for the ANOVA/DEFF "
        "epilogue — bounded by construction (x320)"
    ),
    ("agg_kruskal_wallis", "BroadcastNestedLoopJoin"): (
        "1-row tie-term frame crossed onto the 1-row H accumulator "
        "epilogue — bounded by construction (x329)"
    ),
    ("agg_mood_median", "BroadcastNestedLoopJoin"): (
        "1-row grand-median / totals / chi2-sum frames broadcast-crossed "
        "onto the |types|-row table — bounded by construction (x330)"
    ),
    ("ml_naive_bayes_lang", "BroadcastNestedLoopJoin"): (
        "1-row vocab-size frame crossed onto the |langs| denominators, "
        "and the |langs|(=5)-row model frame crossed onto doc scores "
        "(deliberate 5x scoring expansion) — bounded by construction "
        "(x305)"
    ),
    ("ml_classifier_metrics", "BroadcastNestedLoopJoin"): (
        "1-row N / chance-agreement frames broadcast-crossed onto the "
        "<=(|langs|+1)^2 confusion matrix — bounded by construction "
        "(x323)"
    ),
    ("ts_croston", "BroadcastNestedLoopJoin"): (
        "1-row forecast-origin frame broadcast-crossed onto the "
        "day-grain demand folds — bounded by construction (x294)"
    ),
    ("events_mcnemar", "BroadcastNestedLoopJoin"): (
        "1-row period-midpoint frame crossed onto the event scan for "
        "the before/after split, then a 1-row reduce — bounded by "
        "construction (x312)"
    ),
    ("events_effect_sizes", "BroadcastNestedLoopJoin"): (
        "1-row pooled-moment frame broadcast-crossed onto the 2-group "
        "panel for the d/g/CLES epilogue — bounded by construction "
        "(x313)"
    ),
    ("events_session_stats", "BroadcastNestedLoopJoin"): (
        "1-row global session-total frame broadcast-crossed onto the "
        "duration-bucket panel — bounded by construction (x314)"
    ),
    ("ngram_llr_collocations", "BroadcastNestedLoopJoin"): (
        "1-row grand-bigram-total frame broadcast-crossed onto the "
        "candidate pair frame for the G2 margins — bounded by "
        "construction (x321)"
    ),
    ("tpch_q11_important_volume", "BroadcastNestedLoopJoin"): (
        "1-row grand-total frame broadcast-crossed onto the per-part "
        "values for the HAVING-vs-scalar gate (the Q11 topology itself) "
        "— bounded by construction (x334)"
    ),
    ("corr_kendall_tau", "CartesianProduct"): (
        "the day-pair grid of the SINGLE joint daily series (x260's "
        "bounded quadratic: collapse to |days| rows FIRST, then pair; "
        "a decade is ~6.7M pairs) — no equi key exists because there is "
        "exactly one series"
    ),
    ("corr_kendall_tau", "BroadcastNestedLoopJoin"): (
        "1-row n_days frame broadcast-crossed onto the 1-row tau "
        "aggregate — bounded by construction (x277)"
    ),
    ("embed_cos_histogram", "BroadcastNestedLoopJoin"): (
        "1-row count-derived modulus frame broadcast-crossed onto the "
        "scan for the hash-sample filter — bounded by construction "
        "(x280)"
    ),
    ("graph_degree_powerlaw", "BroadcastNestedLoopJoin"): (
        "1-row d_(k+1) cutoff and 1-row Hill-alpha frames broadcast-"
        "crossed onto k-row / degree-grain frames — bounded by "
        "construction (x284)"
    ),
    ("agg_qq_normal", "BroadcastNestedLoopJoin"): (
        "19-row z-literal table crossed with the 1-row moment frame "
        "before probing ranks — bounded by construction (x263); the "
        "rank probe itself is an equi hash join"
    ),
    ("vocab_growth_heaps", "BroadcastNestedLoopJoin"): (
        "10-row decile probe BNLJ onto the |docs|-grain curve (rank = "
        "ceil(k/10*nd) mixes sides, not equi-joinable) — 10 predicate "
        "evals per curve row, linear; plus the 1-row beta-fit cross "
        "(x269)"
    ),
    ("ts_theta_forecast", "BroadcastNestedLoopJoin"): (
        "1-row SES-level and 1-row drift frames broadcast-crossed onto "
        "the 7-row horizon frame — bounded by construction (x265)"
    ),
    ("ts_hurst_rs", "BroadcastNestedLoopJoin"): (
        "3-row block-size constant broadcast-crossed onto the day-grain "
        "series (3 rows out per day) — bounded by construction (x266)"
    ),
    ("join_theta_range", "BroadcastNestedLoopJoin"): (
        "j5 is a non-equi band join against a broadcast-size bounded "
        "band table; BNLJ over the broadcast side is the intended plan"
    ),
    ("join_cross", "BroadcastNestedLoopJoin"): (
        "j6 spells crossJoin; Catalyst compiles it to BNLJ when one side "
        "fits broadcast — same bounded region x nation contract"
    ),
    ("agg_hll_mergeable", "BroadcastNestedLoopJoin"): (
        "1-row sketch-estimate frames crossed for the merge==direct "
        "comparison — bounded by construction"
    ),
    ("agg_heavy_hitters", "BroadcastNestedLoopJoin"): (
        "1-row totals frame broadcast-crossed onto per-key counts — "
        "bounded by construction"
    ),
    ("sample_temperature", "BroadcastNestedLoopJoin"): (
        "1-row sum-of-weights frame broadcast-crossed onto the per-lang "
        "counts (|langs| rows) to derive keep rates — bounded by "
        "construction; the corpus side is a hash join on lang"
    ),
    ("ngram_pmi", "BroadcastNestedLoopJoin"): (
        "1-row (n_uni, n_bg) totals frame broadcast-crossed onto the "
        "min-count-filtered bigram table — bounded by construction"
    ),
    ("vocab_coverage_curve", "BroadcastNestedLoopJoin"): (
        "1-row corpus-total frame and the 4-row threshold probe are both "
        "broadcast-crossed onto the vocab frequency table — bounded by "
        "construction (x130)"
    ),
    ("search_bm25", "BroadcastNestedLoopJoin"): (
        "1-row (n_docs, avgdl) corpus frame broadcast-crossed onto the "
        "term-filtered tf table — bounded by construction (x142)"
    ),
    ("dq_skew_report", "BroadcastNestedLoopJoin"): (
        "3-number global stats frame broadcast-crossed onto the 10-row "
        "top-N key table — bounded by construction (x148)"
    ),
    ("ts_acf", "BroadcastNestedLoopJoin"): (
        "1-row (n, s1, s2) totals frame broadcast-crossed onto the "
        "5-row per-lag aggregate table — bounded by construction (x147)"
    ),
    ("events_ab_ratio_delta", "BroadcastNestedLoopJoin"): (
        "the two 1-row arm frames cross for the final z — bounded by "
        "construction (x159)"
    ),
    ("events_rate_compare", "BroadcastNestedLoopJoin"): (
        "1-row (t1, t2) totals frame broadcast-crossed onto the |types|-"
        "row count table — bounded by construction (x163)"
    ),
    ("ts_weekday_index", "BroadcastNestedLoopJoin"): (
        "1-row (all_days, all_cents) totals frame broadcast-crossed onto "
        "the 7-row weekday table — bounded by construction (x167)"
    ),
    ("ngram_lm_kneser_ney", "BroadcastNestedLoopJoin"): (
        "1-row distinct-pair total frame broadcast-crossed onto the "
        "min-count-filtered bigram table — bounded by construction (x168)"
    ),
    ("vec_pca_power", "BroadcastNestedLoopJoin"): (
        "1-row norm frame broadcast-crossed onto the 64-row iterate each "
        "power-iteration round — bounded by construction (x169)"
    ),
    ("agg_median_ci", "BroadcastNestedLoopJoin"): (
        "1-row rank frame (n, r_lo, r_med, r_hi) broadcast-crossed onto "
        "the value-grain CDF table — bounded by construction (x158)"
    ),
    ("privacy_t_closeness", "BroadcastNestedLoopJoin"): (
        "the ~|segments|-row global-distribution frame and the 1-row "
        "big_n frame broadcast-cross onto the |classes| table to zero-"
        "fill the TVD grid — bounded by construction (x189)"
    ),
    ("orders_aging_buckets", "BroadcastNestedLoopJoin"): (
        "1-row snapshot-date frame broadcast-crossed into the open-order "
        "scan — bounded by construction (x191)"
    ),
    ("ts_anomaly_deseasonal", "BroadcastNestedLoopJoin"): (
        "1-row (n, s1, s2) residual-moment frame broadcast-crossed onto "
        "the |days| residual table — bounded by construction (x194)"
    ),
    ("sample_class_balance", "BroadcastNestedLoopJoin"): (
        "1-row min-class-size frame broadcast-crossed onto the ranked "
        "rows — bounded by construction (x197)"
    ),
    ("supply_single_source_risk", "BroadcastNestedLoopJoin"): (
        "1-row portfolio-totals frame broadcast-crossed onto the part-"
        "grain table for the share denominators — bounded by "
        "construction (x201)"
    ),
    ("graph_clustering_coeff", "BroadcastNestedLoopJoin"): (
        "two 1-row frames (wedge totals x triangle count) cross for the "
        "final ratio — bounded by construction (x206)"
    ),
    ("customers_winback", "BroadcastNestedLoopJoin"): (
        "1-row snapshot-date frame broadcast-crossed onto the per-"
        "customer cadence table — bounded by construction (x207)"
    ),
    ("dq_freshness_panel", "BroadcastNestedLoopJoin"): (
        "1-row freshest-feed frame broadcast-crossed onto the 3-row "
        "per-table panel — bounded by construction (x208)"
    ),
    ("events_wau_wilson_ci", "BroadcastNestedLoopJoin"): (
        "1-row all-time distinct-user base broadcast-crossed onto the "
        "per-week counts — bounded by construction (x211)"
    ),
    ("quantile_normalize", "BroadcastNestedLoopJoin"): (
        "|event_types|-row group frame and 1-row n_glob frame broadcast-"
        "crossed onto the value-grain CDF tables — bounded by the price "
        "grid, never row count (x155)"
    ),
    ("ts_holt_linear", "BroadcastNestedLoopJoin"): (
        "1-row folded (level, trend) state broadcast-crossed onto the "
        "7-row horizon frame — bounded by construction (x224)"
    ),
    ("agg_bootstrap_ci", "BroadcastNestedLoopJoin"): (
        "1-row replicate-order-statistics frame broadcast-crossed onto "
        "the 1-row full-data mean — bounded by construction (x248)"
    ),
    ("events_causal_impact", "BroadcastNestedLoopJoin"): (
        "1-row pre-period OLS fit broadcast-crossed onto the |post-days| "
        "grid — bounded by construction (x250)"
    ),
    ("ts_holt_winters", "BroadcastNestedLoopJoin"): (
        "1-row folded (level, trend, seasonal[7]) state broadcast-crossed "
        "onto the 7-row horizon frame — bounded by construction (x253)"
    ),
    ("agg_hill_tail_index", "BroadcastNestedLoopJoin"): (
        "1-row k+1-st order-statistic frame broadcast-crossed onto the "
        "k-row tail — bounded by construction (x243)"
    ),
    ("source_jsd_matrix", "BroadcastNestedLoopJoin"): (
        "|sources| x |sources| non-equi pair frame and the (pair x top-V "
        "vocab) grid — both bounded by the source/vocab dims, never corpus "
        "size (x252)"
    ),
}


@dataclass
class AuditHit:
    query: str
    flag: str
    why_flagged: str


def audit_all(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> tuple[list[AuditHit], set[tuple[str, str]]]:
    """Build every registered query's plan against ``sf_dir`` and return
    ``(hits, waived)``: the non-allowlisted red-flag hits (empty ==
    fleet is clean) and the allowlist entries that actually fired — a
    listed entry that never fires is stale and waives nothing, so the
    test requires ``waived == set(ALLOWLIST)``.

    Plans are inspected WITHOUT materialization — join strategy, python
    eval mode, and cartesian nodes are all visible pre-execution, so the
    sweep costs plan-build time only (iterative operators that run jobs at
    plan-build time, e.g. IVF training, still pay those)."""
    _ensure_loaded()
    hits: list[AuditHit] = []
    waived: set[tuple[str, str]] = set()
    for name in names or list(REGISTRY):
        plan = executed_plan(REGISTRY[name].fn(spark, sf_dir))
        for flag, why in RED_FLAGS.items():
            if flag not in plan:
                continue
            if (name, flag) in ALLOWLIST:
                waived.add((name, flag))
            else:
                hits.append(AuditHit(name, flag, why))
    return hits, waived
