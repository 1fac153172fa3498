"""SURVEY.md §2.11 — LLM-data-pipeline operators (l1-l8): dedup, similarity
search, embedding math, kNN classification.

These are the driver-mandated extensions (BASELINE.json north_star): the ops
a 100 TB training-data pipeline runs over its corpus. Everything except the
MinHash-LSH candidate generator (spark.ml, randomized) is pure Catalyst HOF
math with a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.vector import as_double, cosine, with_norm
from ..io import load_table
from ..registry import register

# --------------------------------------------------------------------------
# l1 — exact dedup by normalized-content hash
# --------------------------------------------------------------------------

_L1_ORACLE = """
SELECT md5(lower(trim(text))) AS content_md5,
       MIN(doc_id) AS keeper_doc_id,
       COUNT(*) AS n_copies
FROM documents
GROUP BY md5(lower(trim(text)))
"""


@register("dedup_exact", oracle=_L1_ORACLE)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: group by content hash, keep lowest doc_id.

    100 TB notes: ONE shuffle on a 128-bit hash (uniformly distributed — no
    skew by construction). This group-min spelling beats
    row_number-over-window (no sort, partial agg combines map-side) and
    dropDuplicates (which cannot express 'keep smallest id')."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.withColumn("content_md5", F.md5(F.lower(F.trim(F.col("text")))))
        .groupBy("content_md5")
        .agg(
            F.min("doc_id").alias("keeper_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


# --------------------------------------------------------------------------
# l2 — near-dup candidates via shingling + MinHash-LSH (spark.ml)
# --------------------------------------------------------------------------


@register("dedup_near_minhash", oracle=None)  # LSH randomized even when seeded
def dedup_near_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup candidate pairs (Jaccard distance ≤ 0.9 on
    2-shingle sets). Recall vs the brute-force oracle is property-tested in
    tests/test_llm_ops.py (SURVEY §5.5).

    100 TB notes: approxSimilarityJoin hash-partitions by LSH band — the
    candidate join is equi on (band, bucket), never all-pairs. numHashTables
    trades recall for candidate volume; 8 tables ≈ 95% recall at 0.5 sim."""
    from pyspark.ml.feature import (  # noqa: PLC0415
        HashingTF,
        MinHashLSH,
        NGram,
        RegexTokenizer,
    )

    docs = load_table(spark, sf_dir, "documents")
    tok = RegexTokenizer(inputCol="text", outputCol="tokens", pattern=r"\s+")
    ng = NGram(n=2, inputCol="tokens", outputCol="shingles")
    tf = HashingTF(inputCol="shingles", outputCol="features", numFeatures=1 << 18)
    staged = tf.transform(ng.transform(tok.transform(docs)))
    # drop empty-feature docs (MinHash requires ≥1 non-zero entry)
    staged = staged.filter(F.expr("size(shingles) > 0")).cache()
    mh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=8, seed=42)
    model = mh.fit(staged)
    pairs = model.approxSimilarityJoin(staged, staged, 0.9, distCol="jaccard_dist")
    return (
        pairs.filter(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("doc_a"),
            F.col("datasetB.doc_id").alias("doc_b"),
            F.round("jaccard_dist", 3).alias("jaccard_dist"),
        )
    )


# --------------------------------------------------------------------------
# l3 — exact cosine top-k neighbors per probe vector
# --------------------------------------------------------------------------

_L3_ORACLE = """
WITH probe AS (
  SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE vec_id < 20
),
cand AS (
  SELECT p.qid, e.vec_id,
         round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), p.qv), 6) AS cos_sim
  FROM embeddings e CROSS JOIN probe p
  WHERE e.vec_id <> p.qid
)
SELECT qid, vec_id, cos_sim, rn FROM (
  SELECT *, CAST(row_number() OVER (
      PARTITION BY qid ORDER BY cos_sim DESC, vec_id) AS BIGINT) AS rn
  FROM cand
) WHERE rn <= 5
"""


@register("sim_topk_bruteforce", oracle=_L3_ORACLE)
def sim_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 per probe vector (probe = vec_id < 20).

    Ranking is on the ROUNDED similarity with vec_id tiebreak, so the top-k
    frontier is deterministic across engines (SURVEY §4.3).

    100 TB notes: probe side is broadcast (small by construction); corpus
    streams through executors once; per-query top-k runs as a rank-filtered
    window (WindowGroupLimit keeps a k-heap, never the full sort). For large
    probe sets: chunk the probe side and union — each chunk stays under the
    broadcast threshold. This brute-force kernel is also the recall oracle
    for the ANN variants (sim_ann_lsh, dedup_near_minhash)."""
    emb = with_norm(load_table(spark, sf_dir, "embeddings"))
    probe = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("qid"),
        as_double(F.col("embedding")).alias("qv"),
        F.col("norm").alias("qnorm"),
    )
    cand = (
        emb.join(F.broadcast(probe), F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            F.round(
                cosine(as_double(F.col("embedding")), F.col("qv"), F.col("norm"), F.col("qnorm")),
                6,
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc())
    return (
        cand.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 5)
    )


# --------------------------------------------------------------------------
# l4 — all pairs with cosine ≥ τ (threshold self-join)
# --------------------------------------------------------------------------

_L4_ORACLE = """
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                    CAST(b.embedding AS DOUBLE[])), 6) AS cos_sim
FROM embeddings a CROSS JOIN embeddings b
WHERE a.vec_id < b.vec_id
  AND round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                   CAST(b.embedding AS DOUBLE[])), 6) >= 0.3
"""


@register("sim_threshold_join", oracle=_L4_ORACLE)
def sim_threshold_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (cos ≥ 0.3).

    100 TB notes: the all-pairs form is O(n²) — correct only for bounded
    corpora. The scale path is sim_ann_lsh's bucketed variant (hyperplane
    LSH prunes candidates to same-bucket pairs) with this kernel as the
    per-bucket scorer; same results for pairs the buckets retain."""
    emb = with_norm(load_table(spark, sf_dir, "embeddings"))
    a = emb.select(
        F.col("vec_id").alias("vec_a"),
        as_double(F.col("embedding")).alias("va"),
        F.col("norm").alias("na"),
    )
    b = emb.select(
        F.col("vec_id").alias("vec_b"),
        as_double(F.col("embedding")).alias("vb"),
        F.col("norm").alias("nb"),
    )
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .withColumn(
            "cos_sim",
            F.round(cosine(F.col("va"), F.col("vb"), F.col("na"), F.col("nb")), 6),
        )
        .filter(F.col("cos_sim") >= 0.3)
        .select("vec_a", "vec_b", "cos_sim")
    )


# --------------------------------------------------------------------------
# l5 — per-document text statistics
# --------------------------------------------------------------------------

_L5_ORACLE = """
SELECT
  doc_id,
  CAST(length(text) AS INTEGER) AS n_chars_actual,
  CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
  CAST(len(list_distinct(string_split(text, ' '))) AS INTEGER) AS n_uniq_tokens,
  round(length(replace(text, ' ', '')) * 1.0 / len(string_split(text, ' ')), 6) AS avg_token_len,
  round(len(list_distinct(string_split(text, ' '))) * 1.0
        / len(string_split(text, ' ')), 6) AS ttr
FROM documents
"""


@register("text_stats", oracle=_L5_ORACLE)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token/char counts, type-token ratio — the quality-scoring substrate.
    100 TB: shuffle-free narrow map; split() once via a shared subexpression
    (Catalyst CSE handles the repeated split under whole-stage codegen)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return docs.select(
        "doc_id",
        F.length("text").alias("n_chars_actual"),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_uniq_tokens"),
        F.round(
            F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))) / F.size(toks), 6
        ).alias("avg_token_len"),
        F.round(F.size(F.array_distinct(toks)) / F.size(toks), 6).alias("ttr"),
    )


# --------------------------------------------------------------------------
# l6 — per-language corpus routing stats
# --------------------------------------------------------------------------

_L6_ORACLE = """
SELECT lang,
       COUNT(*) AS n_docs,
       ROUND(AVG(n_chars), 6) AS avg_chars,
       COUNT(DISTINCT source) AS n_sources,
       ROUND(AVG(len(string_split(text, ' '))), 6) AS avg_tokens
FROM documents
GROUP BY lang
"""


@register("lang_partition", oracle=_L6_ORACLE)
def lang_partition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language routing stats — the partition key audit before
    sink_parquet(partition_by=['lang']) at scale."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("n_chars"), 6).alias("avg_chars"),
        F.countDistinct("source").alias("n_sources"),
        F.round(F.avg(F.size(F.split(F.col("text"), " "))), 6).alias("avg_tokens"),
    )


# --------------------------------------------------------------------------
# l7 — L2-normalize embeddings; per-label centroids
# --------------------------------------------------------------------------

_L7_ORACLE = """
WITH normed AS (
  SELECT label,
         CAST(embedding AS DOUBLE[]) AS v,
         sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x))) AS nrm
  FROM embeddings
)
SELECT label,
       CAST(unnest(generate_series(1, len(v))) - 1 AS INTEGER) AS pos,
       unnest(list_transform(v, x -> x / nrm)) AS nval
FROM normed WHERE nrm > 0
"""

_L7_ORACLE_AGG = """
WITH normed AS (
  SELECT label,
         CAST(embedding AS DOUBLE[]) AS v,
         sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x))) AS nrm
  FROM embeddings
),
flat AS (
  SELECT label,
         CAST(unnest(generate_series(1, len(v))) - 1 AS INTEGER) AS pos,
         unnest(list_transform(v, x -> x / nrm)) AS nval
  FROM normed WHERE nrm > 0
)
SELECT label, pos, ROUND(AVG(nval), 6) AS centroid_val, COUNT(*) AS n_vecs
FROM flat GROUP BY label, pos
"""


@register("embed_norm_centroid", oracle=_L7_ORACLE_AGG)
def embed_norm_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2-normalize then per-(label, dimension) centroid.

    100 TB notes: posexplode produces n×d rows but partial aggregation
    combines map-side down to |labels|×d before the shuffle — the exchange
    carries only the centroid matrix. For very wide d, aggregate the array
    directly with zip_with-accumulating agg (no explode) instead."""
    emb = with_norm(load_table(spark, sf_dir, "embeddings")).filter(F.col("norm") > 0)
    normed = emb.select(
        "label",
        F.posexplode(
            F.transform(as_double(F.col("embedding")), lambda x: x / F.col("norm"))
        ).alias("pos", "nval"),
    )
    return normed.groupBy("label", "pos").agg(
        F.round(F.avg("nval"), 6).alias("centroid_val"),
        F.count(F.lit(1)).alias("n_vecs"),
    )


# --------------------------------------------------------------------------
# l8 — kNN label vote
# --------------------------------------------------------------------------

_L8_ORACLE = """
WITH probe AS (
  SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE vec_id < 20
),
scored AS (
  SELECT p.qid, e.vec_id, e.label,
         round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), p.qv), 6) AS cos_sim
  FROM embeddings e CROSS JOIN probe p
  WHERE e.vec_id >= 20
),
knn AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cos_sim DESC, vec_id) AS rn
    FROM scored
  ) WHERE rn <= 10
),
votes AS (
  SELECT qid, label, COUNT(*) AS votes FROM knn GROUP BY qid, label
)
SELECT qid, label AS pred_label, votes FROM (
  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY votes DESC, label) AS vr
  FROM votes
) WHERE vr = 1
"""


@register("classify_knn", oracle=_L8_ORACLE)
def classify_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-NN majority label per probe vector (ties → smallest label).
    Composes the l3 kernel + group-count + argmax window."""
    emb = with_norm(load_table(spark, sf_dir, "embeddings"))
    probe = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("qid"),
        as_double(F.col("embedding")).alias("qv"),
        F.col("norm").alias("qnorm"),
    )
    train = emb.filter(F.col("vec_id") >= 20)
    scored = train.join(F.broadcast(probe)).select(
        "qid",
        "vec_id",
        "label",
        F.round(
            cosine(as_double(F.col("embedding")), F.col("qv"), F.col("norm"), F.col("qnorm")),
            6,
        ).alias("cos_sim"),
    )
    w_knn = Window.partitionBy("qid").orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc())
    knn = scored.withColumn("rn", F.row_number().over(w_knn)).filter(F.col("rn") <= 10)
    votes = knn.groupBy("qid", "label").agg(F.count(F.lit(1)).alias("votes"))
    w_vote = Window.partitionBy("qid").orderBy(F.col("votes").desc(), F.col("label").asc())
    return (
        votes.withColumn("vr", F.row_number().over(w_vote))
        .filter(F.col("vr") == 1)
        .select("qid", F.col("label").alias("pred_label"), "votes")
    )


# --------------------------------------------------------------------------
# ANN scale path: seeded random-hyperplane LSH bucketing
# --------------------------------------------------------------------------


_N_PLANES = 6
_N_DIMS = 64


def _hyperplanes() -> list[list[float]]:
    """Deterministic ±1 hyperplane weights: parity of md5(f"{plane}:{dim}").
    Computed driver-side once and embedded as literals — no RNG, no per-row
    hashing; reruns and engines agree bit-for-bit."""
    import hashlib  # noqa: PLC0415

    return [
        [
            1.0 if hashlib.md5(f"{p}:{d}".encode()).digest()[0] % 2 == 0 else -1.0
            for d in range(_N_DIMS)
        ]
        for p in range(_N_PLANES)
    ]


@register("sim_ann_lsh", oracle=None)  # bucketing is engine-specific; recall tested
def sim_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-k via random-hyperplane (SimHash) LSH bucketing with
    multi-probe — the 100 TB scale path next to sim_topk_bruteforce.

    Corpus rows land in ONE bucket (their 6-bit signature); probes expand to
    their own bucket + the 6 Hamming-distance-1 neighbors (multi-probe), so
    recall survives near-boundary vectors. Recall vs brute force is
    property-tested in tests/test_llm_ops.py.

    100 TB notes: one narrow map for signatures, one equi-join on bucket id
    (hash-partitioned — the corpus is never broadcast or crossed), cosine
    kernel only within candidate buckets. Dense-region bucket skew → AQE
    skew split; recall knob = more probes (flip 2 bits) or more tables."""
    planes = _hyperplanes()
    emb = with_norm(load_table(spark, sf_dir, "embeddings"))
    dvec = as_double(F.col("embedding"))

    def bit(p: int):
        w = F.array(*[F.lit(x) for x in planes[p]])
        proj = F.aggregate(
            F.zip_with(dvec, w, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
        )
        return F.when(proj > 0, F.lit(1)).otherwise(F.lit(0))

    bucket = bit(0)
    for p in range(1, _N_PLANES):
        bucket = bucket + bit(p) * F.lit(1 << p)

    sig = emb.select(
        "vec_id", "label", dvec.alias("v"), "norm", bucket.alias("bucket")
    )
    # multi-probe: probe's bucket plus each 1-bit flip
    probe = (
        sig.filter(F.col("vec_id") < 20)
        .select(
            F.col("vec_id").alias("qid"),
            F.col("v").alias("qv"),
            F.col("norm").alias("qnorm"),
            F.explode(
                F.array(
                    F.col("bucket"),
                    *[
                        F.col("bucket").bitwiseXOR(F.lit(1 << p))
                        for p in range(_N_PLANES)
                    ],
                )
            ).alias("qbucket"),
        )
    )
    cand = sig.join(
        F.broadcast(probe),
        (F.col("bucket") == F.col("qbucket")) & (F.col("vec_id") != F.col("qid")),
    ).select(
        "qid",
        "vec_id",
        F.round(cosine(F.col("v"), F.col("qv"), F.col("norm"), F.col("qnorm")), 6).alias(
            "cos_sim"
        ),
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc())
    return cand.withColumn("rn", F.row_number().over(w).cast("long")).filter(
        F.col("rn") <= 5
    )
