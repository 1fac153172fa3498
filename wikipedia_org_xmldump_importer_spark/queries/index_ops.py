"""SURVEY.md §2 rows x51-x53 — corpus indexing / LM-statistics operators.

Three more training-data-pipeline stages over ``documents`` (driver-mandated
extension surface, BASELINE.json [B:6]):

* x51 ``ngram_lm_counts`` — bigram counts + conditional probabilities, the
  classic n-gram LM table (and the statistic behind contamination and
  repetition analyses).
* x52 ``inverted_index`` — term → bounded, sorted posting list + document
  frequency: the search-index build every corpus-inspection tool needs.
* x53 ``sample_reservoir_group`` — deterministic per-group k-sample by md5
  rank: "give me 10 uniform-ish docs per language" without RNG, so it is
  reproducible across engines and runs (same trick as x47's hash split).

All three carry full DuckDB SQL oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import register

# --------------------------------------------------------------------------
# x51 — bigram LM counts
# --------------------------------------------------------------------------

_LM_MIN_COUNT = 3

_LM_ORACLE = f"""
WITH tok AS (
  SELECT string_split(text, ' ') AS t FROM documents
),
bg AS (
  SELECT t[i] AS w1, t[i + 1] AS w2
  FROM (
    SELECT t, unnest(generate_series(1, len(t) - 1)) AS i
    FROM tok WHERE len(t) >= 2
  )
),
cnt AS (SELECT w1, w2, COUNT(*) AS n_bigram FROM bg GROUP BY w1, w2)
SELECT w1, w2, n_bigram, p_cond FROM (
  SELECT w1, w2, n_bigram,
         round(n_bigram / SUM(n_bigram) OVER (PARTITION BY w1), 6) AS p_cond
  FROM cnt
) WHERE n_bigram >= {_LM_MIN_COUNT}
"""


@register("ngram_lm_counts", oracle=_LM_ORACLE)
def ngram_lm_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x51: bigram counts and conditional probability P(w2|w1).

    Shape: materialize the token array in its own projection (NOTES trap #1),
    explode index-paired bigrams, ONE hash agg (map-side partial) for the
    counts, then a JOIN against the per-w1 totals instead of a window —
    a windowed SUM OVER (PARTITION BY w1) would sort every w1 partition and
    cannot partial-aggregate, while the totals table is |vocab|-sized and
    hash-joins with partial aggs on both sides. The denominator is computed
    BEFORE the min-count filter (rare continuations still weigh in P).

    100 TB: explode is narrow; the two aggs shuffle (w1,w2) then w1; AQE
    picks broadcast for the totals side when the vocabulary fits.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.split("text", " ").alias("t")).filter(F.size("t") >= 2)
    bg = toks.select(
        F.explode(
            F.expr("transform(sequence(0, size(t) - 2), i -> struct(t[i] AS w1, t[i + 1] AS w2))")
        ).alias("bg")
    ).select("bg.w1", "bg.w2")
    cnt = bg.groupBy("w1", "w2").agg(F.count("*").alias("n_bigram"))
    totals = cnt.groupBy("w1").agg(F.sum("n_bigram").alias("n_w1"))
    return (
        cnt.join(totals, "w1")
        .select(
            "w1",
            "w2",
            "n_bigram",
            F.round(F.col("n_bigram") / F.col("n_w1"), 6).alias("p_cond"),
        )
        .filter(F.col("n_bigram") >= _LM_MIN_COUNT)
    )


# --------------------------------------------------------------------------
# x52 — inverted index with bounded posting lists
# --------------------------------------------------------------------------

_IDX_MIN_DF = 3
_IDX_MAX_POSTINGS = 20

_IDX_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
pairs AS (SELECT DISTINCT term, doc_id FROM tok WHERE term <> ''),
ranked AS (
  SELECT term, doc_id,
         row_number() OVER (PARTITION BY term ORDER BY doc_id) AS rn,
         count(*) OVER (PARTITION BY term) AS df
  FROM pairs
)
SELECT term, CAST(max(df) AS BIGINT) AS df,
       CAST(count(*) AS BIGINT) AS n_postings,
       string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
FROM ranked WHERE rn <= {_IDX_MAX_POSTINGS}
GROUP BY term HAVING max(df) >= {_IDX_MIN_DF}
"""


@register("inverted_index", oracle=_IDX_ORACLE)
def inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x52: term → (df, first-K sorted posting list as CSV).

    The posting list is BOUNDED ({_IDX_MAX_POSTINGS} lowest doc_ids) via a
    RANK-ONLY window + filter — Spark 4 rewrites that to WindowGroupLimit,
    so each task keeps ≤K rows per term BEFORE the shuffle; an unbounded
    collect_set-then-slice would ship every hot term's full posting list to
    one reducer first (the minhash bucket-cap lesson, VERDICT r2 #3). df is
    a separate groupBy('term').count() joined back: stacking it as an
    unordered COUNT window on the same frame would block
    InferWindowGroupLimit (ADVICE r3) and ship hot terms' full lists anyway.
    The df agg partial-aggregates map-side, so its shuffle carries
    |vocab|-sized partials, not postings.

    100 TB: three key-local shuffles (pair-dedup; capped window; vocab-sized
    df agg whose join AQE broadcasts); stop-word-grade terms are exactly the
    hot keys the cap bounds.
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    ).filter(F.col("term") != "")
    pairs = tok.distinct()
    df_tbl = (
        pairs.groupBy("term")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") >= _IDX_MIN_DF)
    )
    w = Window.partitionBy("term").orderBy("doc_id")
    capped = (
        pairs.select("term", "doc_id", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= _IDX_MAX_POSTINGS)
        .groupBy("term")
        .agg(
            F.count("*").alias("n_postings"),
            F.expr(
                "concat_ws(',', transform(array_sort(collect_list(doc_id)),"
                " x -> cast(x AS string)))"
            ).alias("postings"),
        )
    )
    return capped.join(df_tbl, "term").select(
        "term", "df", "n_postings", "postings"
    )


# --------------------------------------------------------------------------
# x53 — deterministic per-group reservoir-style sample
# --------------------------------------------------------------------------

_RES_K = 10

_RES_ORACLE = f"""
SELECT lang, doc_id, CAST(rnk AS BIGINT) AS rnk FROM (
  SELECT lang, doc_id,
         row_number() OVER (
           PARTITION BY lang ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
         ) AS rnk
  FROM documents
) WHERE rnk <= {_RES_K}
"""


@register("sample_reservoir_group", oracle=_RES_ORACLE)
def sample_reservoir_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x53: k deterministic "random" docs per language — rank by md5 of the
    key and keep the first k. md5 rank is uniform over the key space, so
    this is reservoir sampling with a fixed, engine-portable seed (compare
    o3 sample_frac, whose RNG is engine-specific and rows-only).

    100 TB: rn<=k compiles to WindowGroupLimit — every map task keeps ≤k
    rows per lang before the shuffle, so the exchange carries O(tasks × k),
    not the corpus; the 5-partition skew of lang never materializes.
    """
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        docs.select("lang", "doc_id", F.row_number().over(w).alias("rnk"))
        .filter(F.col("rnk") <= _RES_K)
        .withColumn("rnk", F.col("rnk").cast("long"))
    )
