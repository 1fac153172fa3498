"""Corpus-statistics / mixture operators (SURVEY §2.17, x54-x56): plan
shapes and the invariants the oracle hash can't express (score bounds,
rate monotonicity, broadcast sides)."""

from __future__ import annotations

from conftest import SF_SMOKE
from pyspark.sql import functions as F

from wikipedia_org_xmldump_importer_spark.io import load_table
from wikipedia_org_xmldump_importer_spark.plans import (
    executed_plan,
    has_broadcast_hash_join,
)
from wikipedia_org_xmldump_importer_spark.queries.index_ops import (
    _PMI_MIN_COUNT,
    _PPLX_OOV_U,
    doc_lm_perplexity,
    ngram_pmi,
)
from wikipedia_org_xmldump_importer_spark.queries.pipeline import sample_temperature


def test_doc_lm_perplexity_score_bounds(spark):
    """Scores live in (0, OOV_penalty]; a doc can't have more OOV bigrams
    than bigrams; every doc with >= 2 tokens is scored."""
    pdf = doc_lm_perplexity(spark, SF_SMOKE).toPandas()
    cap = _PPLX_OOV_U / 1_000_000.0
    assert (pdf["avg_neg_log2"] > 0).all()
    assert (pdf["avg_neg_log2"] <= cap).all()
    assert (pdf["n_oov"] <= pdf["n_bigrams"]).all()
    n_docs = (
        load_table(spark, SF_SMOKE, "documents")
        .filter(F.size(F.split("text", " ")) >= 2)
        .count()
    )
    assert len(pdf) == n_docs


def test_ngram_pmi_min_count_and_symmetric_marginals(spark):
    """Pair filter applies to the pair only; marginal counts stay full
    (n_w1/n_w2 >= n_bigram always — a pair can't outnumber its words)."""
    pdf = ngram_pmi(spark, SF_SMOKE).toPandas()
    assert (pdf["n_bigram"] >= _PMI_MIN_COUNT).all()
    assert (pdf["n_w1"] >= pdf["n_bigram"]).all()
    assert (pdf["n_w2"] >= pdf["n_bigram"]).all()
    assert pdf["pmi"].notna().all()


def test_sample_temperature_broadcasts_rates_no_corpus_shuffle_join(spark):
    """The rates side must broadcast (the corpus is never sort-merge
    joined), and keep rates must be monotone non-increasing in language
    frequency — the whole point of temperature sampling."""
    df = sample_temperature(spark, SF_SMOKE)
    assert has_broadcast_hash_join(df)
    assert "SortMergeJoin" not in executed_plan(df)
    pdf = df.toPandas()
    counts = (
        load_table(spark, SF_SMOKE, "documents")
        .groupBy("lang")
        .count()
        .toPandas()
        .set_index("lang")["count"]
    )
    rates = pdf.groupby("lang")["keep_permille"].first()
    ordered = [rates[lang] for lang in counts.sort_values().index if lang in rates]
    assert all(a >= b for a, b in zip(ordered, ordered[1:])), (counts, rates)
