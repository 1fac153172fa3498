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
    counts, then the per-w1 denominator as a WINDOW over the aggregated
    counts — not a join against a separately-aggregated totals table. The
    window runs on the |observed-vocab²| cnt output (already tiny relative
    to the corpus), whereas the totals-join approach duplicates the whole
    scan→explode→agg lineage per join branch: Catalyst plans each branch
    independently and (measured, round 5) performs SIX corpus scans with
    zero exchange reuse for the join form vs ONE scan for the window form.
    A full re-scan of 100 TB to build a megabyte-scale totals table is the
    wrong trade in every regime. The denominator is computed BEFORE the
    min-count filter (rare continuations still weigh in P).

    100 TB: explode is narrow; one (w1,w2) shuffle for the agg, one
    |vocab|-keyed exchange for the window frame. Hot w1 partitions (stop
    words) hold at most |vocab| rows after aggregation — no skew risk.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.split("text", " ").alias("t")).filter(F.size("t") >= 2)
    bg = toks.select(
        F.explode(
            F.expr("transform(sequence(0, size(t) - 2), i -> struct(t[i] AS w1, t[i + 1] AS w2))")
        ).alias("bg")
    ).select("bg.w1", "bg.w2")
    cnt = bg.groupBy("w1", "w2").agg(F.count("*").alias("n_bigram"))
    w1_frame = Window.partitionBy("w1")
    return (
        cnt.select(
            "w1",
            "w2",
            "n_bigram",
            F.round(
                F.col("n_bigram") / F.sum("n_bigram").over(w1_frame), 6
            ).alias("p_cond"),
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


# --------------------------------------------------------------------------
# x54 — LM-based document quality score (perplexity proxy)
# --------------------------------------------------------------------------

# -log2 penalty for bigrams absent from the (min-count-filtered) LM, in
# integer micro-units. Fixed-point per-bigram scores make the per-doc SUM
# exact integer arithmetic on both engines — only the final single division
# is float, so cross-engine summation order cannot flip the rounded result.
_PPLX_OOV_U = 20_000_000

_PPLX_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
bg AS (
  SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
  FROM (
    SELECT doc_id, t, unnest(generate_series(1, len(t) - 1)) AS i
    FROM tok WHERE len(t) >= 2
  )
),
cnt AS (SELECT w1, w2, COUNT(*) AS n_bigram FROM bg GROUP BY w1, w2),
lm AS (
  SELECT w1, w2, p_cond FROM (
    SELECT w1, w2, n_bigram,
           round(n_bigram / SUM(n_bigram) OVER (PARTITION BY w1), 6) AS p_cond
    FROM cnt
  ) WHERE n_bigram >= {_LM_MIN_COUNT}
),
scored AS (
  SELECT b.doc_id,
         CASE WHEN lm.p_cond IS NOT NULL
              THEN CAST(round(-log2(greatest(lm.p_cond, 9.5367431640625e-07))
                         * 1000000) AS BIGINT)
              ELSE {_PPLX_OOV_U} END AS u,
         CASE WHEN lm.p_cond IS NULL THEN 1 ELSE 0 END AS oov
  FROM bg b LEFT JOIN lm ON b.w1 = lm.w1 AND b.w2 = lm.w2
)
SELECT doc_id, COUNT(*) AS n_bigrams, CAST(SUM(oov) AS BIGINT) AS n_oov,
       round(CAST(SUM(u) AS DOUBLE) / (COUNT(*) * 1000000.0), 6) AS avg_neg_log2
FROM scored GROUP BY doc_id
"""


@register("doc_lm_perplexity", oracle=_PPLX_ORACLE)
def doc_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x54: per-document LM quality score — average -log2 P(w2|w1) over the
    doc's bigrams under the corpus bigram LM (x51), with a fixed penalty
    for out-of-LM bigrams. THE classic perplexity-based training-data
    quality filter (docs scoring far above the corpus mean are boilerplate,
    noise, or wrong-language; far below are repetition).

    Determinism across engines: each bigram's score is fixed-point integer
    micro-units (round(-log2(p)*1e6), or the OOV penalty), the per-doc SUM
    is exact integer math, and only the final division is float — so the
    result is independent of summation order on both engines. p_cond is
    clamped to 2^-20 before the log: a hot w1 with > ~2M continuations
    rounds rare pairs' p_cond to 0.000000, where Spark's log2 yields NULL
    (silently under-counting) but DuckDB's RAISES — the clamp caps in-LM
    surprisal at exactly the 20-bit OOV penalty on both engines instead.

    100 TB: the LM table is |vocab²-observed| — orders of magnitude smaller
    than the corpus bigram stream it joins; AQE broadcasts it when it fits,
    else the join shuffles on (w1,w2) with map-side partials on the doc agg.
    Retune knobs: _LM_MIN_COUNT trades LM size vs OOV rate; the OOV penalty
    should sit above the max in-LM surprisal (20 bits here ⇒ p < 1e-6).
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.split("text", " ").alias("t")).filter(
        F.size("t") >= 2
    )
    bg = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(0, size(t) - 2), i -> struct(t[i] AS w1, t[i + 1] AS w2))"
            )
        ).alias("bg"),
    ).select("doc_id", "bg.w1", "bg.w2")
    lm = ngram_lm_counts(spark, sf_dir).select("w1", "w2", "p_cond")
    scored = bg.join(lm, ["w1", "w2"], "left").select(
        "doc_id",
        F.when(
            F.col("p_cond").isNotNull(),
            F.round(
                -F.log2(F.greatest(F.col("p_cond"), F.lit(2.0**-20)))
                * F.lit(1_000_000.0)
            ).cast("long"),
        )
        .otherwise(F.lit(_PPLX_OOV_U))
        .alias("u"),
        F.col("p_cond").isNull().cast("int").alias("oov"),
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"),
        F.sum("oov").cast("long").alias("n_oov"),
        F.round(F.sum("u") / (F.count("*") * F.lit(1_000_000.0)), 6).alias(
            "avg_neg_log2"
        ),
    )


# --------------------------------------------------------------------------
# x56 — pointwise mutual information over bigrams (collocation strength)
# --------------------------------------------------------------------------

_PMI_MIN_COUNT = 5

_PMI_ORACLE = f"""
WITH tok AS (SELECT string_split(text, ' ') AS t FROM documents),
uni AS (SELECT unnest(t) AS w FROM tok),
ucnt AS (SELECT w, COUNT(*) AS n_w FROM uni GROUP BY w),
bg AS (
  SELECT t[i] AS w1, t[i + 1] AS w2
  FROM (
    SELECT t, unnest(generate_series(1, len(t) - 1)) AS i
    FROM tok WHERE len(t) >= 2
  )
),
cnt AS (SELECT w1, w2, COUNT(*) AS n_bigram FROM bg GROUP BY w1, w2),
tot AS (
  SELECT (SELECT COUNT(*) FROM uni) AS n_uni, (SELECT COUNT(*) FROM bg) AS n_bg
)
SELECT c.w1, c.w2, c.n_bigram, u1.n_w AS n_w1, u2.n_w AS n_w2,
       round(log2(CAST(c.n_bigram AS DOUBLE) * t.n_uni * t.n_uni /
                  (CAST(t.n_bg AS DOUBLE) * u1.n_w * u2.n_w)), 6) AS pmi
FROM cnt c
CROSS JOIN tot t
JOIN ucnt u1 ON c.w1 = u1.w
JOIN ucnt u2 ON c.w2 = u2.w
WHERE c.n_bigram >= {_PMI_MIN_COUNT}
"""


@register("ngram_pmi", oracle=_PMI_ORACLE)
def ngram_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x56: PMI(w1,w2) = log2(P(w1,w2) / (P(w1)·P(w2))) over corpus bigrams —
    collocation strength, the standard statistic behind phrase mining and
    tokenizer-merge candidates (high PMI = the pair co-occurs far above
    chance).

    All probabilities come from exact integer counts; the single log2 input
    is built with an identical association order on both engines, so the
    rounded result is reproducible. Min-count filter applies to the PAIR
    only — unigram denominators keep full counts.

    100 TB: three vocab-keyed hash aggs (unigrams, bigrams, pair filter) +
    two joins that AQE broadcasts when the vocabulary fits; the two 1-row
    totals ride a broadcast cross join. No window, no sort anywhere.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.split("text", " ").alias("t"))
    uni = toks.select(F.explode("t").alias("w"))
    ucnt = uni.groupBy("w").agg(F.count("*").alias("n_w"))
    bg = (
        toks.filter(F.size("t") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(0, size(t) - 2), i -> struct(t[i] AS w1, t[i + 1] AS w2))"
                )
            ).alias("bg")
        )
        .select("bg.w1", "bg.w2")
    )
    # r15 (guide §2.4/§6 — scan volume): the two 1-row totals used to
    # re-count the RAW streams, re-deriving the corpus split+explode a
    # third and fourth time; n_uni ≡ Σ n_w over ucnt and n_bg ≡ Σ
    # n_bigram over the unfiltered bigram table, so both now ride the
    # count tables — corpus explodes 4 -> 2 (one per stream,
    # irreducible). Local wash (interleaved 1.04 vs 0.98 s in a noisy
    # window); kept for the halved corpus-scan term. Pinning the count
    # tables A/B'd 0.65 -> 0.83 — REJECTED, ReuseExchange already shares
    # the groupBy exchanges.
    bcnt = bg.groupBy("w1", "w2").agg(F.count("*").alias("n_bigram"))
    cnt = bcnt.filter(F.col("n_bigram") >= _PMI_MIN_COUNT)
    tot = ucnt.agg(F.sum("n_w").cast("long").alias("n_uni")).crossJoin(
        bcnt.agg(F.sum("n_bigram").cast("long").alias("n_bg"))
    )
    u1 = ucnt.select(F.col("w").alias("w1"), F.col("n_w").alias("n_w1"))
    u2 = ucnt.select(F.col("w").alias("w2"), F.col("n_w").alias("n_w2"))
    return (
        cnt.crossJoin(F.broadcast(tot))
        .join(u1, "w1")
        .join(u2, "w2")
        .select(
            "w1",
            "w2",
            "n_bigram",
            "n_w1",
            "n_w2",
            F.round(
                F.log2(
                    F.col("n_bigram").cast("double")
                    * F.col("n_uni")
                    * F.col("n_uni")
                    / (
                        F.col("n_bg").cast("double")
                        * F.col("n_w1")
                        * F.col("n_w2")
                    )
                ),
                6,
            ).alias("pmi"),
        )
    )


# --------------------------------------------------------------------------
# x69 — positional phrase search (the inverted_index story completed)
# --------------------------------------------------------------------------

_PHRASE_W1, _PHRASE_W2 = "table", "hash"

_PHRASE_ORACLE = f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
hits AS (
  SELECT doc_id,
         CASE WHEN len(w) < 2 THEN []
              ELSE list_filter(generate_series(1, len(w) - 1),
                               i -> w[i] = '{_PHRASE_W1}'
                                AND w[i + 1] = '{_PHRASE_W2}') END AS idx
  FROM t
)
SELECT doc_id, len(idx) AS n_hits, idx[1] AS first_pos
FROM hits WHERE len(idx) > 0
"""


@register("phrase_search", oracle=_PHRASE_ORACLE)
def phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x69: exact phrase query ("{_PHRASE_W1} {_PHRASE_W2}") with POSITIONS
    — the capability x52's document-level inverted index cannot answer
    (it knows WHICH docs contain both words, not whether they are
    adjacent). Per-doc positional scan via a filter() HOF over the token
    array: one pass, integer compares, whole-stage codegen, no explode
    and no join.

    The classic IR shape (positional postings for w1 ⋈ w2 on doc_id and
    pos+1) is what a precomputed index serves; for a single ad-hoc phrase
    over a corpus the direct scan does strictly less work — the join form
    would explode EVERY doc's tokens and shuffle two full postings lists
    to answer one phrase. Build the positional index (x52 + pos arrays)
    when amortizing over many queries.

    100 TB: embarrassingly parallel scan, predicate-prunable by any doc
    metadata, zero shuffle; 1-based positions match the oracle's
    generate_series. The match-index array is named in its own projection
    so the two downstream refs (count, first) read one evaluation
    (NOTES.md trap #4). Expression shape matters 10x here (trap #15):
    iterating the token array itself with transform(w, (tok, i) -> ...)
    and ONE try_element_at peek runs 0.19 s at sf0.1, while the
    index-space form filter(sequence(1, n), i -> element_at(w, i) ...)
    measured 1.84 s — per-lambda element_at lookups against a sibling
    array dominate; keep the lambda iterating the data array."""
    docs = load_table(spark, sf_dir, "documents")
    staged = docs.select("doc_id", F.split("text", " ").alias("w"))
    idx = F.expr(
        f"filter(transform(w, (tok, i) -> "
        f"IF(tok = '{_PHRASE_W1}' AND try_element_at(w, i + 2) <=> '{_PHRASE_W2}', "
        f"i + 1, -1)), p -> p > 0)"
    )
    hits = staged.select("doc_id", idx.alias("idx"))
    return hits.filter(F.size("idx") > 0).select(
        "doc_id",
        F.size("idx").alias("n_hits"),
        F.element_at("idx", 1).alias("first_pos"),
    )


# --------------------------------------------------------------------------
# x142 — BM25 ranked retrieval (fixed-point Okapi scoring, exact top-k)
# --------------------------------------------------------------------------

_BM25_TERMS = ("spark", "window", "hash")
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TOPK = 20

_BM25_TERMS_SQL = ", ".join(f"'{t}'" for t in _BM25_TERMS)

_BM25_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
dl AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS dl FROM tok),
corpus AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
  FROM dl
),
tf AS (
  SELECT doc_id, w AS term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, unnest(t) AS w FROM tok)
  WHERE w IN ({_BM25_TERMS_SQL})
  GROUP BY doc_id, w
),
df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id,
         CAST(ROUND(
           (ln((((c.n_docs - df.df) + 0.5) / (df.df + 0.5)) + 1.0)
            * ((CAST(tf.tf AS DOUBLE) * {_BM25_K1 + 1.0!r})
               / (tf.tf + {_BM25_K1!r} * ({1.0 - _BM25_B!r}
                  + {_BM25_B!r} * (CAST(dl.dl AS DOUBLE) / c.avgdl)))))
           * 1000000.0) AS BIGINT) AS score_u
  FROM tf
  JOIN df ON tf.term = df.term
  JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN corpus c
),
total AS (
  SELECT doc_id, CAST(SUM(score_u) AS BIGINT) AS score_u
  FROM scored GROUP BY doc_id
)
SELECT doc_id,
       ROUND(CAST(score_u AS DOUBLE) / 1000000.0, 6) AS bm25,
       CAST(rk AS BIGINT) AS rank
FROM (
  SELECT doc_id, score_u,
         ROW_NUMBER() OVER (ORDER BY score_u DESC, doc_id) AS rk
  FROM total
)
WHERE rk <= {_BM25_TOPK}
"""


@register("search_bm25", oracle=_BM25_ORACLE)
def search_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x142: BM25 ranked retrieval — Okapi BM25 (k1={_BM25_K1}, b={_BM25_B})
    over a fixed multi-term query, exact top-{_BM25_TOPK} by score. The
    scoring half of the search stack whose build half is x52's
    inverted_index: tf per (doc, term), df per term, document-length
    normalization against the corpus mean, IDF with the +1 floor so hot
    terms (df ≈ N, as in this synthetic vocab) still score positive.

    Determinism across engines (NOTES trap #18): the per-(doc,term) score
    is pinned to integer micro-units with ONE identically-parenthesized
    float expression on both sides — integer tf/df/dl feed correctly-
    rounded IEEE ops; ln carries the same measure-zero round-boundary
    exposure doc_lm_perplexity accepts; avgdl is exact-integer-sum / count
    (one rounding). Per-doc totals are exact BIGINT sums; ORDER BY uses the
    integer score, never a float compare.

    100 TB: the term filter prunes the token stream BEFORE any shuffle
    (predicate on the exploded word — a |terms|-membership scan filter);
    tf groupBy shuffles only matching (doc, term) rows; df and the corpus
    stats are tiny broadcast sides; top-k is a TakeOrderedAndProject on
    the integer key, never a full sort."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.split("text", " ").alias("t"))
    dl = toks.select("doc_id", F.size("t").cast("long").alias("dl"))
    corpus = dl.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    tf = (
        toks.select("doc_id", F.explode("t").alias("term"))
        .filter(F.col("term").isin(*_BM25_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    idf = F.log(
        (
            ((F.col("n_docs") - F.col("df")) + F.lit(0.5))
            / (F.col("df") + F.lit(0.5))
        )
        + F.lit(1.0)
    )
    ratio = (F.col("tf").cast("double") * F.lit(_BM25_K1 + 1.0)) / (
        F.col("tf")
        + F.lit(_BM25_K1)
        * (
            F.lit(1.0 - _BM25_B)
            + F.lit(_BM25_B) * (F.col("dl").cast("double") / F.col("avgdl"))
        )
    )
    scored = (
        tf.join(F.broadcast(df), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(corpus))
        .select(
            "doc_id",
            F.round((idf * ratio) * F.lit(1_000_000.0)).cast("long").alias("score_u"),
        )
    )
    total = scored.groupBy("doc_id").agg(F.sum("score_u").cast("long").alias("score_u"))
    w = Window.orderBy(F.col("score_u").desc(), "doc_id")
    return (
        total.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= _BM25_TOPK)
        .select(
            "doc_id",
            F.round(F.col("score_u").cast("double") / F.lit(1_000_000.0), 6).alias(
                "bm25"
            ),
            "rank",
        )
    )


# --------------------------------------------------------------------------
# x168 — Kneser-Ney smoothed bigram LM
# --------------------------------------------------------------------------

_KN_D = 0.75
_KN_MIN_COUNT = 3

_KN_ORACLE = f"""
WITH tok AS (SELECT string_split(text, ' ') AS t FROM documents),
bg AS (
  SELECT t[i] AS w1, t[i + 1] AS w2
  FROM (SELECT t, unnest(generate_series(1, len(t) - 1)) AS i
        FROM tok WHERE len(t) >= 2)
),
cnt AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c FROM bg GROUP BY w1, w2),
lhs AS (
  SELECT w1, CAST(SUM(c) AS BIGINT) AS c_w1,
         CAST(COUNT(*) AS BIGINT) AS n1p_fwd
  FROM cnt GROUP BY w1
),
rhs AS (SELECT w2, CAST(COUNT(*) AS BIGINT) AS n1p_bwd FROM cnt GROUP BY w2),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs FROM cnt)
SELECT c.w1, c.w2, c.c AS c_bigram,
       ROUND((GREATEST(CAST(c.c AS DOUBLE) - {_KN_D!r}, 0.0) / l.c_w1)
             + ((({_KN_D!r} * l.n1p_fwd) / l.c_w1)
                * (CAST(r.n1p_bwd AS DOUBLE) / t.n_pairs)), 6) AS p_kn
FROM cnt c
JOIN lhs l ON c.w1 = l.w1
JOIN rhs r ON c.w2 = r.w2
CROSS JOIN tot t
WHERE c.c >= {_KN_MIN_COUNT}
"""


@register("ngram_lm_kneser_ney", oracle=_KN_ORACLE)
def ngram_lm_kneser_ney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x168: KNESER-NEY smoothed bigram LM — the best classical n-gram
    smoother, and the one whose backoff term is famously NOT a unigram
    frequency: P_KN(w2|w1) = max(c−D,0)/c(w1) + λ(w1)·P_cont(w2), where
    P_cont(w2) = |{{w1: c(w1,w2)>0}}| / |distinct bigrams| counts how many
    CONTEXTS a word completes ("Francisco" is frequent but only follows
    "San" — continuation probability correctly crushes it), and
    λ(w1) = D·|{{w2: c(w1,w2)>0}}|/c(w1) redistributes exactly the
    discounted mass (Σ_w2 P_KN = 1 per context). Upgrades x51's raw MLE
    table; x54's perplexity scorer can swap this in for OOV-robustness.

    Every ingredient is an exact integer count (bigram counts, left/right
    continuation fan-outs, distinct-pair total); the D=0.75 discount and
    assembly run in ONE identically-parenthesized float expression.

    100 TB: one bigram groupBy, two fan-out aggs that partial-aggregate
    map-side, a hash join back on each side, and a 1-row total — the
    exact shape of x51 plus two broadcast-size side tables."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.split("text", " ").alias("t")).filter(F.size("t") >= 2)
    bg = toks.select(
        F.explode(
            F.expr(
                "transform(sequence(0, size(t) - 2), i -> struct(t[i] AS w1, t[i + 1] AS w2))"
            )
        ).alias("bg")
    ).select("bg.w1", "bg.w2")
    # r15 (guide §2.4; the x321 llr device one function down): cnt feeds
    # FOUR consumers (lhs, rhs, tot, the final join) and each re-derived
    # the corpus token explode + bigram agg. One eager pin — distinct-pair
    # grain, vocab²-bounded/zipf-sublinear, NOT the per-occurrence stream
    # doc_lm_perplexity's rejected checkpoint covered. Interleaved 5-shot
    # medians 0.75 -> 0.66 s at sf0.1; corpus explodes 4 -> 1.
    cnt = (
        bg.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .localCheckpoint()
    )
    lhs = cnt.groupBy("w1").agg(
        F.sum("c").cast("long").alias("c_w1"),
        F.count(F.lit(1)).cast("long").alias("n1p_fwd"),
    )
    rhs = cnt.groupBy("w2").agg(F.count(F.lit(1)).cast("long").alias("n1p_bwd"))
    tot = cnt.agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
    p_kn = (
        F.greatest(F.col("c").cast("double") - F.lit(_KN_D), F.lit(0.0))
        / F.col("c_w1")
    ) + (
        ((F.lit(_KN_D) * F.col("n1p_fwd")) / F.col("c_w1"))
        * (F.col("n1p_bwd").cast("double") / F.col("n_pairs"))
    )
    return (
        cnt.filter(F.col("c") >= _KN_MIN_COUNT)
        .join(lhs, "w1")
        .join(rhs, "w2")
        .crossJoin(F.broadcast(tot))
        .select("w1", "w2", F.col("c").alias("c_bigram"), F.round(p_kn, 6).alias("p_kn"))
    )


# --------------------------------------------------------------------------
# x321 — Dunning log-likelihood-ratio collocations (the robust PMI)
# --------------------------------------------------------------------------

_LLR_MIN_COUNT = 5
_LLR_TOP = 50

_LLR_ORACLE = f"""
WITH t AS (SELECT string_split(text, ' ') AS w FROM documents),
bg AS (
  SELECT w[i] AS w1, w[i + 1] AS w2
  FROM (SELECT w, unnest(generate_series(1, len(w) - 1)) AS i
        FROM t WHERE len(w) >= 2)
),
cnt AS (
  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS k11
  FROM bg GROUP BY w1, w2
),
m1 AS (SELECT w1, CAST(SUM(k11) AS BIGINT) AS r FROM cnt GROUP BY w1),
m2 AS (SELECT w2, CAST(SUM(k11) AS BIGINT) AS c FROM cnt GROUP BY w2),
nn AS (SELECT CAST(SUM(k11) AS BIGINT) AS n FROM cnt),
cells AS (
  SELECT cnt.w1, cnt.w2, cnt.k11,
         m1.r - cnt.k11 AS k12, m2.c - cnt.k11 AS k21,
         nn.n - m1.r - m2.c + cnt.k11 AS k22,
         m1.r AS r, m2.c AS c, nn.n AS n
  FROM cnt JOIN m1 ON m1.w1 = cnt.w1
           JOIN m2 ON m2.w2 = cnt.w2
           CROSS JOIN nn
  WHERE cnt.k11 >= {_LLR_MIN_COUNT}
),
g2 AS (
  SELECT w1, w2, k11, r, c, n,
    2.0 * (
      (CASE WHEN k11 = 0 THEN 0.0 ELSE k11 * LN(CAST(k11 AS DOUBLE) * n
        / (CAST(r AS DOUBLE) * c)) END)
      + (CASE WHEN k12 = 0 THEN 0.0 ELSE k12 * LN(CAST(k12 AS DOUBLE) * n
        / (CAST(r AS DOUBLE) * (n - c))) END)
      + (CASE WHEN k21 = 0 THEN 0.0 ELSE k21 * LN(CAST(k21 AS DOUBLE) * n
        / (CAST(n - r AS DOUBLE) * c)) END)
      + (CASE WHEN k22 = 0 THEN 0.0 ELSE k22 * LN(CAST(k22 AS DOUBLE) * n
        / (CAST(n - r AS DOUBLE) * (n - c))) END)
    ) AS llr
  FROM cells
)
SELECT w1, w2, k11 AS n_bigram, ROUND(llr, 6) AS llr_g2,
       CAST(ROW_NUMBER() OVER (ORDER BY llr DESC, w1, w2) AS BIGINT) AS rk
FROM g2
QUALIFY rk <= {_LLR_TOP}
"""


@register("ngram_llr_collocations", oracle=_LLR_ORACLE)
def ngram_llr_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x321: DUNNING'S LOG-LIKELIHOOD-RATIO collocations — G² over the
    2×2 bigram contingency (Dunning 1993), top-50: the statistic that
    replaced PMI for phrase mining because it doesn't explode on rare
    pairs (x56's PMI ranks a 5-count exotic pair above a 5000-count
    real collocation; G² weighs the EVIDENCE). Margins are the bigram
    table's own (first-position, second-position) sums — the standard
    contingency for adjacent pairs.

    Exactness: all four cells are exact integers; G² is one fixed-
    parenthesization double expression per pair with 0·ln0 = 0 guards;
    the top-50 rank is (G² DESC, w1, w2)-pinned — identical doubles
    from identical integers order identically (x300's argmin
    argument).

    100 TB: three vocab-keyed hash aggs + two joins AQE broadcasts when
    vocab fits; the rank is WindowGroupLimit-pruned to the top-k heap,
    never a full sort."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.split("text", " ").alias("t"))
    bg = (
        toks.filter(F.size("t") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(0, size(t) - 2),"
                    " i -> struct(t[i] AS w1, t[i + 1] AS w2))"
                )
            ).alias("bg")
        )
        .select("bg.w1", "bg.w2")
    )
    # The bigram-count table feeds FOUR consumers (both margins, the grand
    # total, the cells join) and runtime ReuseExchange does not share the
    # explode+agg subtree across them — one eager pin makes the corpus
    # explode run once (interleaved 0.91 -> 0.73 s at sf0.1, r14). Unlike
    # doc_lm_perplexity's REJECTED bigram-stream checkpoint this is the
    # DISTINCT-pair count table (vocab²-bounded, zipf-sublinear in corpus
    # size), not a per-occurrence stream.
    cnt = (
        bg.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("long").alias("k11"))
        .localCheckpoint()
    )
    m1 = cnt.groupBy("w1").agg(F.sum("k11").cast("long").alias("r"))
    m2 = cnt.groupBy("w2").agg(F.sum("k11").cast("long").alias("c"))
    nn = cnt.agg(F.sum("k11").cast("long").alias("n"))
    cells = (
        cnt.join(m1, "w1")
        .join(m2, "w2")
        .crossJoin(F.broadcast(nn))
        .filter(F.col("k11") >= _LLR_MIN_COUNT)
        .select(
            "w1",
            "w2",
            "k11",
            (F.col("r") - F.col("k11")).alias("k12"),
            (F.col("c") - F.col("k11")).alias("k21"),
            (F.col("n") - F.col("r") - F.col("c") + F.col("k11")).alias("k22"),
            "r",
            "c",
            "n",
        )
    )

    def term(k, num_margin, den_margin):
        return F.when(k == 0, F.lit(0.0)).otherwise(
            k
            * F.log(
                k.cast("double") * F.col("n") / (num_margin.cast("double") * den_margin)
            )
        )

    r, c, n = F.col("r"), F.col("c"), F.col("n")
    llr = 2.0 * (
        term(F.col("k11"), r, c)
        + term(F.col("k12"), r, n - c)
        + term(F.col("k21"), n - r, c)
        + term(F.col("k22"), n - r, n - c)
    )
    g2 = cells.select("w1", "w2", "k11", llr.alias("llr"))
    return (
        g2.select(
            "w1",
            "w2",
            F.col("k11").alias("n_bigram"),
            F.round("llr", 6).alias("llr_g2"),
            F.row_number()
            .over(Window.orderBy(F.col("llr").desc(), "w1", "w2"))
            .cast("long")
            .alias("rk"),
        )
        .filter(F.col("rk") <= _LLR_TOP)
    )
