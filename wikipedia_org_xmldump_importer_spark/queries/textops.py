"""Text-analysis + dedup extensions beyond SURVEY §2.11's l-rows, plus the
multimodal binary-column plumbing (driver mandate: language-ID, quality
scoring, token counting, document fingerprinting, SimHash / n-gram-Jaccard
dedup, opaque binary columns with typed metadata).

Everything here except the mapInPandas decode stub is pure Catalyst — and
even the hash-heavy SimHash is exact-integer math with a full SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table, load_table_spread
from ..registry import register

# --------------------------------------------------------------------------
# corpus term frequencies (token explode — the l5 companion)
# --------------------------------------------------------------------------

_TF_ORACLE = """
SELECT token, COUNT(*) AS tf, COUNT(DISTINCT doc_id) AS df
FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
GROUP BY token
"""


@register("text_tf", oracle=_TF_ORACLE)
def text_tf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus term/document frequency. 100 TB: explode-then-aggregate with
    map-side combine; token skew (stopwords) is absorbed by partial aggs —
    the shuffle carries one row per (partition, token). Repartition first:
    few input splits would serialize the explode + partial agg."""
    docs = load_table_spread(spark, sf_dir, "documents", "doc_id")
    return (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("tf"), F.countDistinct("doc_id").alias("df"))
    )


# --------------------------------------------------------------------------
# document fingerprint: min-hash over 3-token shingles
# --------------------------------------------------------------------------

_FP_ORACLE = """
SELECT doc_id,
  CASE WHEN len(string_split(text, ' ')) < 3 THEN md5(text)
       ELSE list_min(list_transform(
              generate_series(1, len(string_split(text, ' ')) - 2),
              i -> md5(string_split(text, ' ')[i] || ' ' ||
                       string_split(text, ' ')[i+1] || ' ' ||
                       string_split(text, ' ')[i+2])))
  END AS fingerprint
FROM documents
"""


@register("text_fingerprint", oracle=_FP_ORACLE)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling shingle fingerprint: lexicographic min of md5(3-gram). Two
    docs sharing any minimal shingle collide — a one-column near-dup key.
    100 TB: narrow map, no shuffle; fingerprint is groupable downstream."""
    docs = load_table(spark, sf_dir, "documents")
    # Materialize the token array as a named column FIRST: referencing the
    # raw split() expression inside the transform() lambda would inline (and
    # re-evaluate) the full split per element access — O(tokens²) per doc.
    staged = docs.select(
        "doc_id", "text", F.split(F.col("text"), " ").alias("toks")
    )
    toks = F.col("toks")
    # greatest(.., 1) + try_element_at (r13 advisor hardening): the short-doc
    # value is discarded by the when(size<3) branch below, but codegen's
    # common-subexpression elimination can evaluate this array BEFORE the
    # branch, and sequence(1, -1)/element_at past the end throw under ANSI.
    shingle_hashes = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - 2, F.lit(1))),
        lambda i: F.md5(
            F.concat_ws(
                " ",
                F.try_element_at(toks, i),
                F.try_element_at(toks, i + 1),
                F.try_element_at(toks, i + 2),
            )
        ),
    )
    return staged.select(
        "doc_id",
        F.when(F.size(toks) < 3, F.md5(F.col("text")))
        .otherwise(F.array_min(shingle_hashes))
        .alias("fingerprint"),
    )


# --------------------------------------------------------------------------
# SimHash (48-bit, md5-derived) — exact integer parity with DuckDB
# --------------------------------------------------------------------------

_SIMHASH_ORACLE = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
),
h AS (
  SELECT doc_id,
         ('0x' || substring(md5(token), 1, 12))::BIGINT AS th
  FROM tok
),
bits AS (
  SELECT doc_id, b,
         SUM(CASE WHEN (th >> b) & 1 = 1 THEN 1 ELSE -1 END) AS s
  FROM h CROSS JOIN (SELECT unnest(generate_series(0, 47)) AS b)
  GROUP BY doc_id, b
)
SELECT doc_id,
       CAST(SUM(CASE WHEN s > 0 THEN (1::BIGINT << b) ELSE 0 END) AS BIGINT)
         AS simhash48
FROM bits GROUP BY doc_id
"""
# ^ the outer CAST matters: DuckDB SUM(BIGINT) returns HUGEINT (int128),
# which the driver's value-hash canonicalizes differently from Spark's
# int64 even when every value is equal (r03 hash_match=false root cause).


@register("dedup_simhash", oracle=_SIMHASH_ORACLE)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """48-bit SimHash per document (token hashes = first 12 hex of md5 — the
    portable stand-in for xxhash64, which DuckDB lacks). Near-dups differ in
    few bits; pairing = group by bands of the simhash.

    100 TB notes: tokens×48 intermediate rows, but partial aggregation
    collapses to doc×48 before the shuffle and doc×1 after; integer-only
    math stays in whole-stage codegen end-to-end. Repartition first: few
    input splits would serialize the tokens×48 expansion. Retune knobs:
    48 bits balances collision rate against the tokens×bits expansion —
    64 bits halves random collisions at +33% map-side rows; downstream
    pairing groups on simhash BANDS (e.g. 4×12-bit), where wider bands
    admit fewer Hamming-distance neighbors (stricter) and narrower bands
    more (fuzzier) — the same s-curve trade as dedup_near_minhash."""
    docs = load_table_spread(spark, sf_dir, "documents", "doc_id")
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    h = tok.select(
        "doc_id",
        F.conv(F.substring(F.md5("token"), 1, 12), 16, 10).cast("long").alias("th"),
    )
    bits = (
        h.select("doc_id", "th", F.explode(F.sequence(F.lit(0), F.lit(47))).alias("b"))
        .groupBy("doc_id", "b")
        .agg(
            F.sum(
                F.when(F.expr("(th >> b) & 1") == 1, 1).otherwise(-1)
            ).alias("s")
        )
    )
    return bits.groupBy("doc_id").agg(
        F.sum(
            F.when(F.col("s") > 0, F.expr("shiftleft(CAST(1 AS BIGINT), b)")).otherwise(
                F.lit(0)
            )
        ).alias("simhash48")
    )


# --------------------------------------------------------------------------
# n-gram Jaccard near-dup pairs (within-source candidates)
# --------------------------------------------------------------------------

_JACCARD_ORACLE = """
WITH sh AS (
  SELECT doc_id, source,
         list_distinct(list_transform(
           generate_series(1, greatest(len(string_split(text, ' ')) - 2, 1)),
           i -> string_split(text, ' ')[i] || ' ' ||
                coalesce(string_split(text, ' ')[i+1], '') || ' ' ||
                coalesce(string_split(text, ' ')[i+2], ''))) AS shingles
  FROM documents
),
flat AS (SELECT doc_id, source, len(shingles) AS n_sh, unnest(shingles) AS s FROM sh),
hot AS (SELECT s FROM flat GROUP BY s HAVING COUNT(*) > 256),
pruned AS (SELECT * FROM flat WHERE s NOT IN (SELECT s FROM hot)),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.n_sh AS na, b.n_sh AS nb, COUNT(*) AS n_common
  FROM pruned a JOIN pruned b
    ON a.s = b.s AND a.source = b.source AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id, a.n_sh, b.n_sh
)
SELECT doc_a, doc_b,
       ROUND(n_common * 1.0 / (na + nb - n_common), 6) AS jaccard
FROM inter
WHERE n_common * 1.0 / (na + nb - n_common) >= 0.05
"""


_JACCARD_DF_CAP = 256  # shingles in more docs than this are boilerplate


def _shingle_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared 3-gram candidate generator: (doc_a, doc_b, na, nb, n_common)
    for same-source pairs sharing ≥1 surviving shingle — the bucket-emission
    pipeline dedup_ngram_jaccard documents; x198's evidence panel reuses it
    verbatim so both rows stay plan-identical."""
    # Repartition up front: the corpus may arrive as few (here: one) input
    # splits, and every downstream stage before the first shuffle inherits
    # that parallelism — the CPU-heavy shingle hashing must spread across
    # cores/executors, not run on one task.
    docs = load_table_spread(spark, sf_dir, "documents", "doc_id")
    # Shingles are represented as 8-byte integer hashes end-to-end: hash each
    # token once, then combine consecutive token-hash triples with xxhash64.
    # Collision-equivalent to the oracle's string shingles (~n²/2⁶⁴ odds;
    # tokens are space-free so triple→string is injective, and the missing
    # trailing token is identified with '' exactly as the oracle's coalesce
    # does). Avoids per-shingle string allocation, and the token-hash array
    # is materialized as a named column first — inlining an expression into
    # a transform() lambda re-evaluates it per element (O(tokens²) per doc).
    staged = docs.select(
        "doc_id",
        "source",
        F.transform(F.split(F.col("text"), " "), lambda t: F.xxhash64(t)).alias("th"),
    )
    th = F.col("th")
    empty_h = F.xxhash64(F.lit(""))
    # try_element_at (r13 advisor): ANSI element_at throws past the end
    # before coalesce can pad with the empty-token hash.
    shingles = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(th) - 2, F.lit(1))),
            lambda i: F.xxhash64(
                F.try_element_at(th, i),
                F.coalesce(F.try_element_at(th, i + 1), empty_h),
                F.coalesce(F.try_element_at(th, i + 2), empty_h),
            ),
        )
    )
    sh = staged.select("doc_id", "source", shingles.alias("shingles")).withColumn(
        "n_sh", F.size("shingles")
    )
    # explode_outer, not explode: plain explode makes Catalyst infer a
    # size(shingles) > 0 filter (InferFiltersFromGenerate) and push it below
    # the repartition exchange — serially re-evaluating the whole shingle
    # pipeline in the narrow scan stage. The arrays here are never empty
    # (sequence lower bound 1), so outer semantics are identical.
    # No .cache() for the self-join reuse: both sides shuffle on the same
    # canonicalized plan, so ReuseExchange computes the shingle pipeline ONCE
    # and the build side reads the same shuffle files (verified in the
    # executed plan). Caching on top of that only added block-manager writes
    # and GC pressure (NOTES.md trap #7).
    flat = sh.select(
        "doc_id", "source", "n_sh", F.explode_outer("shingles").alias("sh")
    )
    # Per-shingle posting list. size(docs) == document frequency, so the
    # boilerplate drop (df > cap) and the no-pair skip (df < 2) are one
    # post-agg filter. Struct field order (doc_id first) makes the pair
    # inequality below a plain field comparison.
    grp = (
        flat.groupBy("sh")
        .agg(F.collect_list(F.struct("doc_id", "source", "n_sh")).alias("docs"))
        .filter(F.size("docs").between(2, _JACCARD_DF_CAP))
    )
    # Bucket pair emission: double-explode of a ≤cap-element array — bounded
    # ≤ cap²/2 rows per bucket, all JVM-side. n_common for a pair is the
    # number of surviving buckets both docs appear in.
    inter = (
        grp.select(F.explode("docs").alias("a"), F.col("docs"))
        .select("a", F.explode("docs").alias("b"))
        .filter(
            (F.col("a.doc_id") < F.col("b.doc_id"))
            & (F.col("a.source") == F.col("b.source"))
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.n_sh").alias("na"),
            F.col("b.n_sh").alias("nb"),
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return inter


@register("dedup_ngram_jaccard", oracle=_JACCARD_ORACLE)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard similarity for same-source candidate pairs.

    Candidate generation + pair counting live in _shingle_pair_counts
    (shared with x198); the long-form 100 TB/plan-shape notes sit on that
    helper's body comments. This row keeps the jaccard threshold contract.
    """
    inter = _shingle_pair_counts(spark, sf_dir)
    jac = F.col("n_common") / (F.col("na") + F.col("nb") - F.col("n_common"))
    return (
        inter.withColumn("jaccard", F.round(jac, 6))
        .filter(jac >= 0.05)
        .select("doc_a", "doc_b", "jaccard")
    )


# --------------------------------------------------------------------------
# language-ID heuristic (stopword voting)
# --------------------------------------------------------------------------

_STOPWORDS = {
    "en": ["the", "a", "of", "and"],
    "de": ["der", "die", "das", "und"],
    "fr": ["le", "la", "et", "les"],
    "es": ["el", "los", "y", "que"],
}


def _langid_sql() -> str:
    score_cols = ",\n  ".join(
        "len(list_filter(string_split(text, ' '), t -> list_contains(["
        + ", ".join(f"'{w}'" for w in ws)
        + f"], t))) AS s_{lang}"
        for lang, ws in _STOPWORDS.items()
    )
    langs = list(_STOPWORDS)
    pred = "CASE "
    pred += " ".join(
        f"WHEN s_{lang} >= greatest({', '.join('s_' + o for o in langs)}) "
        f"AND s_{lang} > 0 THEN '{lang}'"
        for lang in langs
    )
    pred += " ELSE 'und' END"
    return f"""
WITH scored AS (
  SELECT doc_id, lang AS actual_lang,
  {score_cols}
  FROM documents
)
SELECT doc_id, actual_lang, {pred} AS pred_lang,
       CAST(s_en AS INTEGER) AS s_en
FROM scored
"""


@register("text_langid", oracle=_langid_sql())
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram/stopword language-ID heuristic: per-language stopword hit
    counts, argmax with first-match tie-break (CASE order = dict order on
    both engines). 100 TB: narrow map, constant word lists, no shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")

    def stopword_hits(ws: list[str]):
        # closure factory: a default-arg lambda would be parsed by PySpark as
        # the two-arg (element, index) HOF form
        wlist = F.array(*[F.lit(w) for w in ws])
        return F.size(F.filter(toks, lambda t: F.array_contains(wlist, t)))

    scored = docs.select(
        "doc_id",
        F.col("lang").alias("actual_lang"),
        *[stopword_hits(ws).alias(f"s_{lang}") for lang, ws in _STOPWORDS.items()],
    )
    langs = list(_STOPWORDS)
    pred = F.lit("und")
    for lang in reversed(langs):
        cond = (F.col(f"s_{lang}") > 0) & (
            F.col(f"s_{lang}") >= F.greatest(*[F.col(f"s_{o}") for o in langs])
        )
        pred = F.when(cond, F.lit(lang)).otherwise(pred)
    # CASE order: earliest lang in dict order wins ties -> build reversed
    return scored.select("doc_id", "actual_lang", pred.alias("pred_lang"), "s_en")


# --------------------------------------------------------------------------
# quality scoring
# --------------------------------------------------------------------------

_QUALITY_ORACLE = """
SELECT doc_id,
  CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
  ROUND(length(regexp_replace(text, '[^a-z ]', '', 'g')) * 1.0
        / greatest(length(text), 1), 6) AS alpha_ratio,
  ROUND(len(list_filter(string_split(text, ' '),
        t -> list_contains(['the','a','of','and','value','table'], t))) * 1.0
        / greatest(len(string_split(text, ' ')), 1), 6) AS stopword_ratio,
  CASE WHEN len(string_split(text, ' ')) BETWEEN 20 AND 500
        AND length(regexp_replace(text, '[^a-z ]', '', 'g')) * 1.0
            / greatest(length(text), 1) > 0.8
       THEN 1 ELSE 0 END AS quality_pass
FROM documents
"""


@register("text_quality", oracle=_QUALITY_ORACLE)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length / character-class / stopword-ratio quality gates — the classic
    pre-training corpus filter. 100 TB: narrow map; the quality_pass flag is
    the partition-pruning key for the downstream sink."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n_tokens = F.size(toks)
    alpha_ratio = F.round(
        F.length(F.regexp_replace(F.col("text"), "[^a-z ]", ""))
        / F.greatest(F.length("text"), F.lit(1)),
        6,
    )
    stop = F.array(*[F.lit(w) for w in ["the", "a", "of", "and", "value", "table"]])
    stopword_ratio = F.round(
        F.size(F.filter(toks, lambda t: F.array_contains(stop, t)))
        / F.greatest(n_tokens, F.lit(1)),
        6,
    )
    quality_pass = F.when(
        n_tokens.between(20, 500)
        & (
            F.length(F.regexp_replace(F.col("text"), "[^a-z ]", ""))
            / F.greatest(F.length("text"), F.lit(1))
            > 0.8
        ),
        1,
    ).otherwise(0)
    return docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        alpha_ratio.alias("alpha_ratio"),
        stopword_ratio.alias("stopword_ratio"),
        quality_pass.alias("quality_pass"),
    )


# --------------------------------------------------------------------------
# multimodal: opaque binary column + typed metadata + mapInPandas decode stub
# --------------------------------------------------------------------------

_MM_ORACLE = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
       md5(text) AS content_md5,
       CAST(octet_length(encode(text)) % 640 AS BIGINT) AS fake_width,
       CAST((octet_length(encode(text)) // 640) + 1 AS BIGINT) AS fake_height
FROM documents
"""


@register("mm_binary_meta", oracle=_MM_ORACLE)
def mm_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal columns: payloads as opaque binary + typed metadata.

    The binary column here is the utf-8 encoding of text (the sandbox has no
    image/audio libs — TESTDATA has no real media), but the plumbing is the
    real thing: binary type, length/hash metadata, derived shape fields.
    100 TB notes: binary payloads ride Parquet as byte arrays; metadata
    columns let every filter run WITHOUT touching payload bytes (column
    pruning keeps the scan narrow until decode time)."""
    docs = load_table(spark, sf_dir, "documents")
    blob = F.encode(F.col("text"), "utf-8")
    byte_len = F.octet_length(blob).cast("long")
    return docs.select(
        "doc_id",
        byte_len.alias("byte_len"),
        F.md5("text").alias("content_md5"),
        (byte_len % 640).alias("fake_width"),
        (F.expr("octet_length(encode(text, 'utf-8')) div 640") + 1).alias("fake_height"),
    )


@register("mm_decode_stub", oracle=None)  # exercises mapInPandas plumbing
def mm_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode / feature-extract stub over binary media columns via
    mapInPandas (Arrow batches). The decode itself is a deterministic fake —
    real image/audio libs are absent in this container (clearly marked
    below) — but the Spark-side plumbing (binary column in, struct-ish
    feature columns out, arrow batching, partition preservation) is real and
    tested in tests/test_llm_ops.py.

    100 TB notes: decode is the one legitimately-Python stage in a media
    pipeline; mapInPandas streams Arrow record batches (no per-row pickling)
    and keeps partitioning intact, so the expensive stage parallelizes to
    exactly the input partition count — repartition upstream to size batches
    to decoder memory."""
    import pandas as pd  # noqa: PLC0415

    docs = load_table(spark, sf_dir, "documents")
    blobs = docs.select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )

    def decode_batch(batches):
        for pdf in batches:
            # STUB: a real implementation would call PIL / torchaudio /
            # pyav here. Deterministic fake: derive "decoded" shape stats
            # from the payload bytes themselves.
            payload = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": payload.str.len().astype("int64"),
                    "first_byte": payload.str[0].apply(
                        lambda b: int(b) if b is not None else -1
                    ),
                    "decoded_ok": True,
                }
            )

    return blobs.mapInPandas(
        decode_batch, schema="doc_id long, n_bytes long, first_byte int, decoded_ok boolean"
    )


# --------------------------------------------------------------------------
# BPE-ish token counting (the training-data pipeline's cost estimator)
# --------------------------------------------------------------------------

_TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

_TOKCOUNT_ORACLE = f"""
SELECT doc_id,
  CAST(len(string_split(text, ' ')) AS INTEGER) AS n_ws_tokens,
  CAST(len(regexp_extract_all(text, '{_TOKEN_REGEX}')) AS INTEGER) AS n_bpe_pieces,
  CAST(list_sum(list_transform(
         regexp_extract_all(text, '{_TOKEN_REGEX}'),
         t -> CAST(ceil(length(t) / 4.0) AS BIGINT))) AS BIGINT) AS n_subwords
FROM documents
"""


@register("text_token_regex", oracle=_TOKCOUNT_ORACLE)
def text_token_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting, both ways a data pipeline needs it: whitespace tokens
    (shell-cheap) and a BPE-ish pre-tokenizer regex (letter runs / digit
    runs / single punctuation — the GPT-2 pre-tokenizer shape) plus a
    subword estimate (≈4 chars per merged piece), the standard proxy for
    "how many LLM tokens does this corpus cost".

    100 TB notes: pure per-row narrow projection — no shuffle, fully
    codegen'd, pushdown-friendly. The regex runs once per row (top-level
    projection, not per-element lambda)."""
    docs = load_table(spark, sf_dir, "documents")
    staged = docs.select(
        "doc_id",
        F.split(F.col("text"), " ").alias("ws"),
        F.regexp_extract_all(F.col("text"), F.lit(_TOKEN_REGEX), F.lit(0)).alias("bpe"),
    )
    return staged.select(
        "doc_id",
        F.size("ws").alias("n_ws_tokens"),
        F.size("bpe").alias("n_bpe_pieces"),
        F.aggregate(
            F.transform("bpe", lambda t: F.ceil(F.length(t) / 4.0)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("n_subwords"),
    )


# --------------------------------------------------------------------------
# multimodal: deterministic frame sampling over "video" payloads
# --------------------------------------------------------------------------

_FRAME_ORACLE = """
WITH v AS (
  SELECT doc_id,
         md5(text) AS content_md5,
         CAST((octet_length(encode(text)) // 1000) + 1 AS BIGINT) AS n_frames
  FROM documents
)
SELECT doc_id, n_frames,
       CAST(unnest(generate_series(0, n_frames - 1, 4)) AS BIGINT) AS frame_idx,
       md5(content_md5 || ':' || CAST(unnest(generate_series(0, n_frames - 1, 4)) AS VARCHAR)) AS frame_key
FROM v
"""


@register("mm_frame_sample", oracle=_FRAME_ORACLE)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over video-like binary payloads: every 4th frame of a
    payload treated as 1000-bytes-per-frame video. The decode is a
    deterministic fake (no media libs in this container — frame_key stands
    in for decoded frame bytes); the PLUMBING is the real pattern: compute
    per-row frame counts from metadata, explode a bounded sequence, and key
    each sampled frame for the downstream (Python) decode stage.

    100 TB notes: explode multiplies rows by sampled-frame count — sample
    BEFORE decode (this op), never after; the sequence is bounded by
    metadata so no payload bytes are touched until the Python stage, and
    partition sizing stays metadata-driven."""
    docs = load_table(spark, sf_dir, "documents")
    v = docs.select(
        "doc_id",
        F.md5("text").alias("content_md5"),
        (F.expr("octet_length(encode(text, 'utf-8')) div 1000") + 1).alias("n_frames"),
    )
    return v.select(
        "doc_id",
        "content_md5",
        "n_frames",
        F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(4))).alias("frame_idx"),
    ).select(
        "doc_id",
        "n_frames",
        "frame_idx",
        F.md5(F.concat_ws(":", "content_md5", "frame_idx")).alias("frame_key"),
    )


# --------------------------------------------------------------------------
# real binary image-header decoding (PNG IHDR / JPEG SOF0 / GIF LSD)
# --------------------------------------------------------------------------

_MM_MAX_SCAN = 4096  # JPEG segment walk cap: dims must appear in the head


def mm_parse_image_header(buf):
    """Parse (fmt, width, height, dims_offset) from real image file headers.

    Pure public file-format knowledge (no media libs needed — dims live in
    fixed-layout header structures):

    - PNG: 8-byte signature ``89 50 4E 47 0D 0A 1A 0A``; first chunk must be
      IHDR (type bytes at offset 12); width/height are 4-byte BIG-endian at
      offsets 16/20.
    - JPEG: ``FF D8`` SOI, then a marker-segment walk — every segment is
      ``FF <marker> <len:2 BE>`` where len counts itself; dims sit in the
      first SOF marker (C0-CF minus C4/C8/CC): height then width, 2-byte
      BIG-endian, after the 1-byte precision. The walk is REQUIRED: SOF's
      offset depends on preceding APP/COM segment lengths, and payloads may
      contain ``FF C0`` decoy bytes a naive scan would trip on.
    - GIF: ``GIF87a``/``GIF89a``, then the logical screen descriptor:
      width/height 2-byte LITTLE-endian at offsets 6/8.

    Returns dims_offset = byte offset of the height/width block actually
    read, so the oracle can verify the segment-walk arithmetic, not just
    the final dims. Unknown/corrupt headers -> ("unknown", None, None, None).
    """
    if buf is None:
        return ("unknown", None, None, None)
    if buf[:8] == b"\x89PNG\r\n\x1a\n" and buf[12:16] == b"IHDR":
        return (
            "png",
            int.from_bytes(buf[16:20], "big"),
            int.from_bytes(buf[20:24], "big"),
            16,
        )
    if buf[:2] == b"\xff\xd8":
        i = 2
        limit = min(len(buf), _MM_MAX_SCAN)
        while i + 4 <= limit:
            if buf[i] != 0xFF:
                break  # desynced: corrupt stream
            marker = buf[i + 1]
            if marker in (0x01, 0xD8) or 0xD0 <= marker <= 0xD7:
                i += 2  # standalone markers carry no length field
                continue
            seg_len = int.from_bytes(buf[i + 2 : i + 4], "big")
            if seg_len < 2:
                break
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                return (
                    "jpeg",
                    int.from_bytes(buf[i + 7 : i + 9], "big"),
                    int.from_bytes(buf[i + 5 : i + 7], "big"),
                    i + 5,
                )
            i += 2 + seg_len
        return ("jpeg", None, None, None)
    if buf[:6] in (b"GIF87a", b"GIF89a"):
        return (
            "gif",
            int.from_bytes(buf[6:8], "little"),
            int.from_bytes(buf[8:10], "little"),
            6,
        )
    return ("unknown", None, None, None)


_MM_DIMS_ORACLE = """
SELECT doc_id,
       CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'gif' END
         AS fmt,
       CAST(16 + (doc_id * 31) % 625 AS BIGINT) AS width,
       CAST(16 + (doc_id * 17) % 465 AS BIGINT) AS height,
       CAST(CASE doc_id % 3
              WHEN 0 THEN 16
              -- SOI(2) + APP0(2+len0) + COM(2+len1) + SOF0 marker(2)
              -- + len(2) + precision(1) => dims at 11 + len0 + len1
              WHEN 1 THEN 11 + (16 + doc_id % 8) + (4 + doc_id % 5)
              ELSE 6
            END AS BIGINT) AS dims_offset
FROM documents
"""


@register("mm_image_dims", oracle=_MM_DIMS_ORACLE)
def mm_image_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL binary decode over media payloads: build structurally-valid
    PNG/JPEG/GIF file headers JVM-side (the sandbox ships no image files —
    TESTDATA has no media — so payloads are synthesized with spec-correct
    byte layouts from documents columns), then parse width/height/format
    back out of the raw bytes in an Arrow-batched Python stage.

    The parse is NOT a fake: PNG dims are 4-byte big-endian IHDR fields,
    GIF dims are 2-byte little-endian screen-descriptor fields, and JPEG
    dims require walking marker segments to a variable SOF0 offset (APP0
    and COM lengths vary per doc, and their payloads embed FF C0 decoy
    bytes, so fixed-offset or scan-for-marker shortcuts produce wrong dims
    and fail the oracle). mm_parse_image_header is additionally pinned to
    the PUBLIC spec byte layouts by fixture tests on hand-built real
    headers (tests/test_llm_ops.py), so builder and parser cannot share a
    compensating endianness bug.

    100 TB notes: the decode stage sees only (doc_id, payload) — metadata
    columns stay in the narrow JVM scan until after the Python stage, and
    the parser touches at most _MM_MAX_SCAN bytes per payload regardless of
    blob size (headers live in the first KB; an unbounded segment walk over
    a corrupt 100 MB blob would be a per-row DoS). mapInPandas streams
    Arrow batches — no per-row pickling — and preserves partitioning, so
    decode parallelism equals upstream partition count."""
    import pandas as pd  # noqa: PLC0415

    docs = load_table(spark, sf_dir, "documents")
    doc_id = F.col("doc_id")
    w = (F.lit(16) + (doc_id * 31) % 625).cast("long")
    h = (F.lit(16) + (doc_id * 17) % 465).cast("long")

    def be(col, nbytes):
        return F.unhex(F.lpad(F.hex(col), 2 * nbytes, "0"))

    def le2(col):
        return F.unhex(
            F.concat(
                F.lpad(F.hex(col.bitwiseAND(F.lit(255))), 2, "0"),
                F.lpad(F.hex(F.shiftright(col, 8)), 2, "0"),
            )
        )

    def filler(n_bytes):
        # Decoy filler: repeated FF C0 bytes INSIDE APP0/COM payloads — a
        # parser that greps for the SOF0 marker instead of walking segment
        # lengths reads garbage dims here and hash-fails.
        return F.unhex(F.substring(F.repeat(F.lit("FFC0"), 16), F.lit(1), n_bytes * 2))

    l0 = (F.lit(16) + doc_id % 8).cast("int")  # APP0 segment length (varies)
    l1 = (F.lit(4) + doc_id % 5).cast("int")  # COM segment length (varies)
    png = F.concat(
        F.unhex(F.lit("89504E470D0A1A0A" + "0000000D" + "49484452")),
        be(w, 4),
        be(h, 4),
        F.unhex(F.lit("0802000000" + "DEADBEEF")),
    )
    jpeg = F.concat(
        F.unhex(F.lit("FFD8FFE0")),
        be(l0, 2),
        filler(l0 - 2),
        F.unhex(F.lit("FFFE")),
        be(l1, 2),
        filler(l1 - 2),
        F.unhex(F.lit("FFC0001108")),
        be(h, 2),
        be(w, 2),
        F.unhex(F.lit("03" + "011100" + "021101" + "031101")),
    )
    gif = F.concat(
        F.unhex(F.lit("474946383961")),
        le2(w),
        le2(h),
        F.unhex(F.lit("910000")),
    )
    blobs = docs.select(
        "doc_id",
        F.when(doc_id % 3 == 0, png)
        .when(doc_id % 3 == 1, jpeg)
        .otherwise(gif)
        .alias("payload"),
    )

    def decode(batches):
        for pdf in batches:
            parsed = [mm_parse_image_header(b) for b in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "fmt": [p[0] for p in parsed],
                    "width": pd.array([p[1] for p in parsed], dtype="Int64"),
                    "height": pd.array([p[2] for p in parsed], dtype="Int64"),
                    "dims_offset": pd.array([p[3] for p in parsed], dtype="Int64"),
                }
            )

    return blobs.mapInPandas(
        decode,
        schema="doc_id long, fmt string, width long, height long, dims_offset long",
    )


# --------------------------------------------------------------------------
# real binary audio-header decoding (RIFF/WAVE chunk walk)
# --------------------------------------------------------------------------

_WAV_RATES = (8000, 16000, 22050, 44100, 48000)
_WAV_MAX_SCAN = 4096


def mm_parse_wav_header(buf):
    """Parse (sample_rate, channels, bits, n_frames, fmt_offset) from a
    RIFF/WAVE header by walking chunks — pure public spec knowledge:

    - Container: ``RIFF`` + total size (4B LITTLE-endian) + ``WAVE``, then
      a sequence of chunks, each ``<id:4> <size:4 LE> <payload:size>``.
    - Chunk order is NOT fixed (LIST/INFO chunks commonly precede fmt), so
      a fixed-offset read is wrong in general — the walker is required.
    - ODD-sized chunk payloads are followed by a pad byte the walker must
      skip (RIFF word alignment); forgetting the pad desyncs every
      subsequent chunk id.
    - ``fmt `` payload (PCM): format(2) channels(2 LE) sample_rate(4 LE)
      byte_rate(4) block_align(2 LE) bits(2 LE).
    - n_frames = data chunk size / block_align.

    Returns None-tuple on anything that is not a well-formed PCM WAV.
    """
    bad = (None, None, None, None, None)
    if buf is None or len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        return bad
    i = 12
    limit = min(len(buf), _WAV_MAX_SCAN)
    channels = rate = bits = block_align = fmt_off = n_frames = None
    while i + 8 <= limit:
        cid = buf[i : i + 4]
        size = int.from_bytes(buf[i + 4 : i + 8], "little")
        if cid == b"fmt " and size >= 16:
            p = i + 8
            channels = int.from_bytes(buf[p + 2 : p + 4], "little")
            rate = int.from_bytes(buf[p + 4 : p + 8], "little")
            block_align = int.from_bytes(buf[p + 12 : p + 14], "little")
            bits = int.from_bytes(buf[p + 14 : p + 16], "little")
            fmt_off = i
        elif cid == b"data":
            if block_align:
                n_frames = size // block_align
            # payload bytes themselves are not present/needed: header-only
            # metadata pass — a real decode pipeline would stop reading here
            # and hand (offset, size) to the sample decoder.
            break
        i += 8 + size + (size % 2)  # odd payloads carry a pad byte
    if None in (channels, rate, bits, n_frames, fmt_off):
        return bad
    return (rate, channels, bits, n_frames, fmt_off)


_WAV_ORACLE = f"""
SELECT doc_id,
       CAST(CASE doc_id % 5 WHEN 0 THEN 8000 WHEN 1 THEN 16000
            WHEN 2 THEN 22050 WHEN 3 THEN 44100 ELSE 48000 END AS BIGINT)
         AS sample_rate,
       CAST(1 + doc_id % 2 AS BIGINT) AS channels,
       CAST(CASE WHEN doc_id % 3 = 0 THEN 8 ELSE 16 END AS BIGINT) AS bits,
       CAST(100 + doc_id % 900 AS BIGINT) AS n_frames,
       -- even doc_id: fmt directly after the 12-byte RIFF/WAVE prologue;
       -- odd: behind a LIST chunk of payload 9 + doc_id % 7 (+ pad byte
       -- when that payload length is odd — RIFF word alignment)
       CAST(CASE WHEN doc_id % 2 = 0 THEN 12
            ELSE 12 + 8 + (9 + doc_id % 7) + ((9 + doc_id % 7) % 2)
            END AS BIGINT) AS fmt_offset
FROM documents
"""


@register("mm_audio_meta", oracle=_WAV_ORACLE)
def mm_audio_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio-header decode, the WAV sibling of mm_image_dims:
    spec-correct RIFF/WAVE headers assembled JVM-side (sample rate /
    channels / bit depth / frame count derived from doc_id; odd docs get a
    variable-length LIST chunk BEFORE fmt, and LIST payload lengths are
    chosen to exercise the odd-size pad-byte rule), then parsed back from
    raw bytes by a chunk walker in an Arrow-batched Python stage.

    The walker is pinned to the public RIFF spec by fixture tests on a
    hand-built canonical 44-byte PCM header plus pad-byte and truncation
    edges (tests/test_llm_ops.py), so builder and parser cannot share a
    compensating layout bug; the arithmetic oracle re-checks every parsed
    field cross-engine.

    100 TB notes: identical plumbing economics to mm_image_dims — metadata
    derivation stays in the narrow JVM scan, the Python stage sees only
    (doc_id, payload), the walk is capped at _WAV_MAX_SCAN bytes, and the
    data chunk is consumed as (offset, size) metadata, never as payload
    bytes — the shape that lets a 100 TB audio lake be profiled without
    decoding a single sample."""
    import pandas as pd  # noqa: PLC0415

    docs = load_table(spark, sf_dir, "documents")
    doc_id = F.col("doc_id")
    rate = (
        F.when(doc_id % 5 == 0, 8000)
        .when(doc_id % 5 == 1, 16000)
        .when(doc_id % 5 == 2, 22050)
        .when(doc_id % 5 == 3, 44100)
        .otherwise(48000)
    )
    channels = (F.lit(1) + doc_id % 2).cast("int")
    bits = F.when(doc_id % 3 == 0, 8).otherwise(16)
    block_align = (channels * bits / 8).cast("int")
    byte_rate = (rate * block_align).cast("int")
    n_frames = (F.lit(100) + doc_id % 900).cast("int")
    data_size = (n_frames * block_align).cast("int")

    def le(col, nbytes):
        # little-endian byte string of an int column: hex, pad, reverse pairs
        padded = F.lpad(F.hex(col), 2 * nbytes, "0")
        return F.unhex(
            F.concat(
                *[
                    F.substring(padded, 2 * (nbytes - 1 - k) + 1, 2)
                    for k in range(nbytes)
                ]
            )
        )

    list_payload = (F.lit(9) + doc_id % 7).cast("int")
    list_chunk = F.concat(
        F.encode(F.lit("LIST"), "utf-8"),
        le(list_payload, 4),
        # payload (repeated 'I') + pad byte when the payload length is odd
        F.unhex(
            F.substring(
                F.repeat(F.lit("49"), 16),
                F.lit(1),
                (list_payload + list_payload % 2) * 2,
            )
        ),
    )
    fmt_chunk = F.concat(
        F.encode(F.lit("fmt "), "utf-8"),
        le(F.lit(16), 4),
        le(F.lit(1), 2),  # PCM
        le(channels, 2),
        le(rate, 4),
        le(byte_rate, 4),
        le(block_align, 2),
        le(bits, 2),
    )
    data_hdr = F.concat(F.encode(F.lit("data"), "utf-8"), le(data_size, 4))
    body = F.concat(
        F.when(doc_id % 2 == 1, list_chunk).otherwise(F.unhex(F.lit(""))),
        fmt_chunk,
        data_hdr,
    )
    riff = F.concat(
        F.encode(F.lit("RIFF"), "utf-8"),
        le(F.octet_length(body) + 4, 4),
        F.encode(F.lit("WAVE"), "utf-8"),
        body,
    )
    blobs = docs.select("doc_id", riff.alias("payload"))

    def decode(batches):
        for pdf in batches:
            parsed = [mm_parse_wav_header(b) for b in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "sample_rate": pd.array([p[0] for p in parsed], dtype="Int64"),
                    "channels": pd.array([p[1] for p in parsed], dtype="Int64"),
                    "bits": pd.array([p[2] for p in parsed], dtype="Int64"),
                    "n_frames": pd.array([p[3] for p in parsed], dtype="Int64"),
                    "fmt_offset": pd.array([p[4] for p in parsed], dtype="Int64"),
                }
            )

    return blobs.mapInPandas(
        decode,
        schema=(
            "doc_id long, sample_rate long, channels long, bits long, "
            "n_frames long, fmt_offset long"
        ),
    )


# --------------------------------------------------------------------------
# real binary video-container decoding (MP4 / ISO BMFF box walk)
# --------------------------------------------------------------------------

_MP4_TIMESCALES = (600, 1000, 90000, 48000)
_MP4_MAX_SCAN = 4096


def mm_parse_mp4_meta(buf):
    """Parse (timescale, duration, n_tracks, moov_offset, mvhd_version)
    from an ISO BMFF (MP4) header — public spec knowledge:

    - The file is a sequence of boxes: ``<size:4 BE> <type:4>``, size
      INCLUDING the 8-byte header. size == 1 means a 64-bit ``largesize``
      follows the type (header becomes 16 bytes); size == 0 means the box
      runs to the end of its container.
    - ``moov`` is a pure container whose payload is itself a box sequence;
      movie-level metadata sits in its ``mvhd`` child. Version 0 mvhd
      carries timescale/duration as 4-byte fields at payload offsets
      12/16; version 1 widens the times to 8 bytes, moving them to 20/24
      (duration itself 8-byte). Both versions occur in the wild, so a
      v0-only reader corrupts durations on v1 files.
    - Track count = number of ``trak`` children of moov (walked by box
      size at moov level, never by scanning for the fourcc — trak
      payloads may contain 'trak' bytes).

    Returns a None-tuple for anything not parseable as BMFF.
    """
    bad = (None, None, None, None, None)
    if buf is None or len(buf) < 16:
        return bad

    def boxes(start, end):
        i = start
        while i + 8 <= end:
            size = int.from_bytes(buf[i : i + 4], "big")
            btype = buf[i + 4 : i + 8]
            payload = i + 8
            if size == 1:
                if i + 16 > end:
                    return
                size = int.from_bytes(buf[i + 8 : i + 16], "big")
                payload = i + 16
            elif size == 0:
                size = end - i
            if size < payload - i or i + size > end:
                return  # corrupt size: stop rather than misread
            yield btype, i, payload, i + size
            i += size

    limit = min(len(buf), _MP4_MAX_SCAN)
    saw_ftyp = False
    timescale = duration = n_tracks = moov_off = version = None
    for btype, off, payload, bend in boxes(0, limit):
        if btype == b"ftyp":
            saw_ftyp = True
        elif btype == b"moov":
            moov_off = off
            n_tracks = 0
            for ctype, _coff, cpayload, _cend in boxes(payload, bend):
                if ctype == b"trak":
                    n_tracks += 1
                elif ctype == b"mvhd":
                    version = buf[cpayload]
                    if version == 0:
                        timescale = int.from_bytes(
                            buf[cpayload + 12 : cpayload + 16], "big"
                        )
                        duration = int.from_bytes(
                            buf[cpayload + 16 : cpayload + 20], "big"
                        )
                    elif version == 1:
                        timescale = int.from_bytes(
                            buf[cpayload + 20 : cpayload + 24], "big"
                        )
                        duration = int.from_bytes(
                            buf[cpayload + 24 : cpayload + 32], "big"
                        )
    if not saw_ftyp or None in (timescale, duration, n_tracks, moov_off, version):
        return bad
    return (timescale, duration, n_tracks, moov_off, version)


_MP4_ORACLE = f"""
SELECT doc_id,
       CAST(CASE doc_id % 4 WHEN 0 THEN 600 WHEN 1 THEN 1000
            WHEN 2 THEN 90000 ELSE 48000 END AS BIGINT) AS timescale,
       CAST((CASE doc_id % 4 WHEN 0 THEN 600 WHEN 1 THEN 1000
             WHEN 2 THEN 90000 ELSE 48000 END) * (1 + doc_id % 120)
            AS BIGINT) AS duration,
       CAST(1 + doc_id % 3 AS BIGINT) AS n_tracks,
       -- ftyp box (16) + free box (8 + doc_id % 9 payload)
       CAST(16 + 8 + doc_id % 9 AS BIGINT) AS moov_offset,
       CAST(CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END AS BIGINT)
         AS mvhd_version
FROM documents
"""


@register("mm_video_meta", oracle=_MP4_ORACLE)
def mm_video_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video-container decode completing the multimodal trio (x218
    image, x219 audio, this video): ISO BMFF headers assembled JVM-side —
    ftyp + a variable-size free box (so moov's offset is not fixed) + a
    moov container holding an mvhd (VERSION 0 or 1 per doc: v1 widens the
    time fields, a layout change real parsers must branch on) and 1-3 trak
    child stubs — then timescale/duration/track-count/offset/version
    parsed back by a recursive box walk in Arrow-batched Python.

    The walker advances strictly by declared box sizes (trak payloads are
    NOT scanned for fourcc strings), handles the largesize escape and
    corrupt-size truncation, and is pinned to the public BMFF layout by
    fixture tests (hand-built v0 + v1 + largesize + decoy-fourcc headers,
    tests/test_llm_ops.py); the arithmetic oracle re-checks every parsed
    field cross-engine.

    100 TB notes: same economics as x218/x219 — header-only metadata pass,
    walk capped at _MP4_MAX_SCAN bytes, payload bytes never decoded; the
    trak child walk is the part that matters at scale, because container
    boxes nest and a fourcc-grep shortcut corrupts counts exactly when
    payloads embed box-like bytes."""
    import pandas as pd  # noqa: PLC0415

    docs = load_table(spark, sf_dir, "documents")
    doc_id = F.col("doc_id")
    timescale = (
        F.when(doc_id % 4 == 0, 600)
        .when(doc_id % 4 == 1, 1000)
        .when(doc_id % 4 == 2, 90000)
        .otherwise(48000)
    )
    duration = (timescale * (F.lit(1) + doc_id % 120)).cast("long")
    n_tracks = (F.lit(1) + doc_id % 3).cast("int")
    v1 = doc_id % 5 == 0

    def be(col, nbytes):
        return F.unhex(F.lpad(F.hex(col), 2 * nbytes, "0"))

    ftyp = F.concat(
        be(F.lit(16), 4), F.encode(F.lit("ftypisom"), "utf-8"), be(F.lit(0x200), 4)
    )
    free_payload = (doc_id % 9).cast("int")
    free = F.concat(
        be(free_payload + 8, 4),
        F.encode(F.lit("free"), "utf-8"),
        F.unhex(F.substring(F.repeat(F.lit("6D6F"), 8), F.lit(1), free_payload * 2)),
    )
    # mvhd v0: ver/flags(4) ctime(4) mtime(4) timescale(4) duration(4) +
    # 80 spec-filler bytes (rate..next_track_id) = 100-byte payload.
    # v1: ver/flags(4) ctime(8) mtime(8) timescale(4) duration(8) + 80
    # = 112-byte payload. The 'decoy' filler embeds 'trak' fourcc bytes —
    # a fourcc-grep counter would overcount tracks.
    filler80 = F.unhex(F.lit(("7472616B" + "00000000") * 10))
    mvhd_v0 = F.concat(
        be(F.lit(108), 4),
        F.encode(F.lit("mvhd"), "utf-8"),
        be(F.lit(0), 4),
        be(F.lit(0), 4),
        be(F.lit(0), 4),
        be(timescale, 4),
        be(duration, 4),
        filler80,
    )
    mvhd_v1 = F.concat(
        be(F.lit(120), 4),
        F.encode(F.lit("mvhd"), "utf-8"),
        be(F.lit(0x01000000), 4),
        be(F.lit(0), 8),
        be(F.lit(0), 8),
        be(timescale, 4),
        be(duration, 8),
        filler80,
    )
    mvhd = F.when(v1, mvhd_v1).otherwise(mvhd_v0)
    trak = F.concat(be(F.lit(12), 4), F.encode(F.lit("trak"), "utf-8"), be(F.lit(0), 4))
    traks = F.unhex(
        F.substring(F.repeat(F.hex(trak), 3), F.lit(1), n_tracks * 24)
    )
    moov_payload_len = F.octet_length(mvhd) + n_tracks * 12
    moov = F.concat(
        be(moov_payload_len + 8, 4), F.encode(F.lit("moov"), "utf-8"), mvhd, traks
    )
    blobs = docs.select("doc_id", F.concat(ftyp, free, moov).alias("payload"))

    def decode(batches):
        for pdf in batches:
            parsed = [mm_parse_mp4_meta(b) for b in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "timescale": pd.array([p[0] for p in parsed], dtype="Int64"),
                    "duration": pd.array([p[1] for p in parsed], dtype="Int64"),
                    "n_tracks": pd.array([p[2] for p in parsed], dtype="Int64"),
                    "moov_offset": pd.array([p[3] for p in parsed], dtype="Int64"),
                    "mvhd_version": pd.array([p[4] for p in parsed], dtype="Int64"),
                }
            )

    return blobs.mapInPandas(
        decode,
        schema=(
            "doc_id long, timescale long, duration long, n_tracks long, "
            "moov_offset long, mvhd_version long"
        ),
    )


# --------------------------------------------------------------------------
# document chunking with overlap (the pre-tokenization training-data step)
# --------------------------------------------------------------------------

_CHUNK_SIZE = 200
_CHUNK_STRIDE = 150  # 50-char overlap between consecutive chunks

_CHUNK_ORACLE = f"""
SELECT doc_id,
       CAST(off / {_CHUNK_STRIDE} AS BIGINT) AS chunk_id,
       off AS char_start,
       substring(text, off + 1, {_CHUNK_SIZE}) AS chunk,
       CAST(length(substring(text, off + 1, {_CHUNK_SIZE})) AS INTEGER) AS chunk_len
FROM (
  SELECT doc_id, text,
         unnest(generate_series(0, greatest(length(text) - 1, 0), {_CHUNK_STRIDE})) AS off
  FROM documents
)
"""


@register("doc_chunk_overlap", oracle=_CHUNK_ORACLE)
def doc_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size character chunking with overlap — the standard step that
    turns long documents into training/RAG windows (chunk 200, stride 150,
    so consecutive chunks share 50 chars and no byte is lost at borders).

    100 TB notes: pure narrow explode — zero shuffles; output rows ≈
    total_chars/stride, so the op is scan-bound and parallelism = input
    splits. The offset sequence is bounded by the row's own length (no
    driver-side max), and substring on the JVM never copies the whole text
    per chunk. Downstream tokenizer stages consume (doc_id, chunk_id) as
    the stable chunk key."""
    docs = load_table(spark, sf_dir, "documents")
    n = F.length("text")
    off = F.explode(
        F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(_CHUNK_STRIDE))
    ).alias("char_start")
    staged = docs.select("doc_id", "text", off)
    chunk = F.substring(F.col("text"), F.col("char_start") + 1, _CHUNK_SIZE)
    return staged.select(
        "doc_id",
        (F.col("char_start") / _CHUNK_STRIDE).cast("long").alias("chunk_id"),
        "char_start",
        chunk.alias("chunk"),
        F.length(chunk).alias("chunk_len"),
    )


# --------------------------------------------------------------------------
# corpus TF-IDF, top terms per document
# --------------------------------------------------------------------------

_TFIDF_ORACLE = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
),
tf AS (
  SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY doc_id, token
),
df AS (
  SELECT token, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY token
),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.token, tf.tf, df.df,
         ROUND(tf.tf * ln(n.n_docs * 1.0 / df.df), 6) AS tfidf
  FROM tf JOIN df USING (token) CROSS JOIN n
)
SELECT doc_id, token, tf, df, tfidf FROM (
  SELECT *, row_number() OVER (
      PARTITION BY doc_id ORDER BY tfidf DESC, token) AS rn
  FROM scored
) WHERE rn <= 5
"""


@register("text_tfidf", oracle=_TFIDF_ORACLE)
def text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 TF-IDF terms per document — the classic relevance/quality
    signal over a corpus (text_tf's df output composed into a per-doc
    ranking).

    100 TB notes: two aggregations + one join, all on the token key. The
    document-frequency side collapses to |vocab| rows before the join, so
    Catalyst broadcast it here (vocab ≪ corpus); at web scale the tf⋈df
    join falls back to shuffle-on-token, where stopword skew is absorbed by
    partial aggs upstream and AQE skew-split at the join. The per-doc top-5
    runs as a rank-filtered window (WindowGroupLimit keeps a 5-heap per
    doc, never a full sort)."""
    docs = load_table_spread(spark, sf_dir, "documents", "doc_id")
    n_docs = docs.count()  # one cheap count job; a literal keeps ln() foldable
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    # df derives from tf (one row per distinct doc-token pair): COUNT(*)
    # over tf == COUNT(DISTINCT doc_id) over raw tokens. Without the cut,
    # Catalyst re-scans and re-explodes the corpus for the df branch (no
    # exchange reuse across the differing aggregates); the localCheckpoint
    # materializes the collapsed tf frame once so both consumers read it.
    # Measured isolated at sf0.1 (5-repeat medians, r11): two-explode
    # 1.43 s -> df-from-tf 1.36 s -> checkpointed 1.21 s. At 100 TB tf is
    # orders smaller than the token stream (one row per distinct doc-term),
    # so the materialization is the cheap side of the trade.
    tf = (
        tok.groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint()
    )
    df = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    scored = tf.join(F.broadcast(df), "token").select(
        "doc_id",
        "token",
        "tf",
        "df",
        F.round(F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6).alias(
            "tfidf"
        ),
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("token").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("doc_id", "token", "tf", "df", "tfidf")
    )


# --------------------------------------------------------------------------
# PII masking (regex scrub before training)
# --------------------------------------------------------------------------

_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_NUM_RE = "[0-9]{6,}"

_PII_ORACLE = f"""
WITH staged AS (
  SELECT doc_id,
         text || ' contact user' || doc_id || '@example.com ref '
              || CAST(doc_id * 7919 + 1000000 AS VARCHAR) AS raw
  FROM documents
)
SELECT doc_id,
       regexp_replace(regexp_replace(raw, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                      '{_NUM_RE}', '<NUM>', 'g') AS masked,
       CAST(len(regexp_extract_all(raw, '{_EMAIL_RE}')) AS INTEGER) AS n_emails,
       CAST(len(regexp_extract_all(raw, '{_NUM_RE}')) AS INTEGER) AS n_nums
FROM staged
"""


@register("pii_mask", oracle=_PII_ORACLE)
def pii_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex PII scrub (emails, long digit runs) + per-doc match counts —
    the mandatory pre-training redaction pass. The corpus is word-soup, so
    a deterministic synthetic email/number tail is appended first (both
    engines compute the same tail) to make the masking observable.

    100 TB notes: narrow projection, no shuffle; regexes are RE2/Java-
    compatible (no lookbehind). At scale this runs fused with the scan —
    the regex cost is the whole cost, so anchor patterns and avoid
    catastrophic-backtracking constructs (both patterns are linear)."""
    docs = load_table(spark, sf_dir, "documents")
    raw = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com ref "),
        (F.col("doc_id") * 7919 + 1000000).cast("string"),
    )
    staged = docs.select("doc_id", raw.alias("raw"))
    masked = F.regexp_replace(
        F.regexp_replace(F.col("raw"), _EMAIL_RE, "<EMAIL>"), _NUM_RE, "<NUM>"
    )
    return staged.select(
        "doc_id",
        masked.alias("masked"),
        F.size(F.regexp_extract_all("raw", F.lit(_EMAIL_RE), F.lit(0))).alias("n_emails"),
        F.size(F.regexp_extract_all("raw", F.lit(_NUM_RE), F.lit(0))).alias("n_nums"),
    )


# --------------------------------------------------------------------------
# dedup cluster resolution: fingerprint star edges + connected components
# --------------------------------------------------------------------------

_CC_ORACLE = """
WITH RECURSIVE toks AS (
  SELECT doc_id, text, string_split(text, ' ') AS t FROM documents
),
fp AS (
  SELECT doc_id,
    CASE WHEN len(t) < 3 THEN md5(text)
         ELSE list_min(list_transform(generate_series(1, len(t) - 2),
                i -> md5(t[i] || ' ' || t[i+1] || ' ' || t[i+2])))
    END AS fp_min,
    CASE WHEN len(t) < 3 THEN md5(text)
         ELSE list_max(list_transform(generate_series(1, len(t) - 2),
                i -> md5(t[i] || ' ' || t[i+1] || ' ' || t[i+2])))
    END AS fp_max
  FROM toks
),
e1 AS (SELECT doc_id AS a, MIN(doc_id) OVER (PARTITION BY fp_min) AS b FROM fp),
e2 AS (SELECT doc_id AS a, MIN(doc_id) OVER (PARTITION BY fp_max) AS b FROM fp),
edges AS (
  SELECT a, b FROM e1 WHERE a <> b
  UNION
  SELECT a, b FROM e2 WHERE a <> b
),
sym AS (SELECT a, b FROM edges UNION SELECT b AS a, a AS b FROM edges),
reach AS (
  SELECT doc_id AS doc, doc_id AS lab FROM fp
  UNION
  SELECT s.a AS doc, r.lab FROM sym s JOIN reach r ON r.doc = s.b
),
lab AS (SELECT doc, MIN(lab) AS cluster_id FROM reach GROUP BY doc)
SELECT doc AS doc_id, cluster_id,
       CAST(COUNT(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS cluster_size
FROM lab
"""


@register("dedup_cluster_cc", oracle=_CC_ORACLE)
def dedup_cluster_cc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster resolution: the union-find step that turns
    fingerprint collisions into clusters so one keeper survives per cluster
    — pairs alone (dedup_near_minhash etc.) can't dedup A≈B≈C without it.

    Candidate edges come from TWO fingerprints per doc (min- and max-md5
    3-gram — the same kernel as text_fingerprint), so clusters genuinely
    chain across hops: A~B via the min-shingle, B~C via the max-shingle ⇒
    {A,B,C} is one cluster. Each fingerprint group contributes STAR edges
    (every doc → the group's min doc), never pairwise — |group| edges, no
    quadratic blowup on boilerplate groups. Components are resolved by
    operators/graph.py min-label propagation run to fixpoint; the DuckDB
    oracle recomputes them independently with a recursive CTE, so the
    iterative Spark machinery is hash-checked end-to-end.

    100 TB notes: fingerprints are a narrow scan-fused map; the star-edge
    build is one window (or group-join) per fingerprint; each CC round is
    one equi-join + partial-agg groupBy with lineage cut by
    localCheckpoint. Diameter (= rounds) stays small because star edges
    flatten every group to depth 1; see graph.py for the O(log n)
    large-star variant at web scale."""
    from ..operators.graph import connected_components  # noqa: PLC0415

    # Repartition: the md5-shingle hashing is the CPU-heavy stage and must
    # spread across cores, not inherit one input split (NOTES.md trap #3).
    docs = load_table_spread(spark, sf_dir, "documents", "doc_id")
    staged = docs.select("doc_id", "text", F.split(F.col("text"), " ").alias("toks"))
    toks = F.col("toks")
    # greatest(.., 1) + try_element_at: same r13 advisor hardening as
    # text_fingerprint — the short-doc array value is dead (when(short)
    # below), but subexpression elimination may evaluate it anyway and
    # ANSI element_at/sequence(1, -1) would throw.
    shingle_hashes = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - 2, F.lit(1))),
        lambda i: F.md5(
            F.concat_ws(
                " ",
                F.try_element_at(toks, i),
                F.try_element_at(toks, i + 1),
                F.try_element_at(toks, i + 2),
            )
        ),
    )
    # Name the shingle array so min AND max read ONE evaluation —
    # CollapseProject keeps the alias because it is referenced twice
    # (trap #4 would otherwise hash every shingle twice).
    hashed = staged.select(
        "doc_id", "text", F.size(toks).alias("n_toks"), shingle_hashes.alias("sh")
    )
    short = F.col("n_toks") < 3
    # Materialize the fingerprints ONCE: the two star-edge windows partition
    # by DIFFERENT keys (fp_min vs fp_max), so ReuseExchange cannot share
    # them and each would replay the full md5-shingle pipeline — as would
    # the vertex list. One narrow (doc_id, fp_min, fp_max) frame is tiny
    # relative to the hashing it saves, at any scale.
    fps = hashed.select(
        "doc_id",
        F.when(short, F.md5(F.col("text"))).otherwise(F.array_min("sh")).alias("fp_min"),
        F.when(short, F.md5(F.col("text"))).otherwise(F.array_max("sh")).alias("fp_max"),
    ).localCheckpoint(eager=True)
    edges = None
    for fp_col in ("fp_min", "fp_max"):
        grp_min = F.min("doc_id").over(Window.partitionBy(fp_col))
        e = (
            fps.select(F.col("doc_id").alias("a"), grp_min.alias("b"))
            .filter(F.col("a") != F.col("b"))
        )
        edges = e if edges is None else edges.union(e)
    edges = edges.distinct()
    labels = connected_components(
        fps.select(F.col("doc_id").alias("id")), edges
    )
    sizes = labels.groupBy("comp").agg(F.count(F.lit(1)).alias("cluster_size"))
    return labels.join(sizes, "comp").select(
        F.col("id").alias("doc_id"),
        F.col("comp").alias("cluster_id"),
        "cluster_size",
    )


# --------------------------------------------------------------------------
# x44 — end-to-end curation pipeline composite (quality gate → dedup →
# chunk accounting), per-language report
# --------------------------------------------------------------------------

_CURATION_ORACLE = """
WITH scored AS (
  SELECT doc_id, lang, n_chars,
         len(string_split(text, ' ')) AS words,
         ROW_NUMBER() OVER (
           PARTITION BY md5(lower(trim(text))) ORDER BY doc_id) AS dup_rn
  FROM documents
),
gated AS (
  SELECT *,
         (n_chars >= 200 AND words >= 30) AS passes_quality,
         (dup_rn = 1) AS is_canonical
  FROM scored
)
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN NOT is_canonical THEN 1 ELSE 0 END) AS BIGINT) AS n_dups_dropped,
       CAST(SUM(CASE WHEN is_canonical AND NOT passes_quality THEN 1 ELSE 0 END) AS BIGINT) AS n_quality_dropped,
       CAST(SUM(CASE WHEN is_canonical AND passes_quality THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN is_canonical AND passes_quality THEN words ELSE 0 END) AS BIGINT) AS kept_tokens,
       CAST(SUM(CASE WHEN is_canonical AND passes_quality
                THEN CAST(CEIL(GREATEST(n_chars - 500, 0) / 400.0) AS BIGINT) + 1
                ELSE 0 END) AS BIGINT) AS kept_chunks
FROM gated
GROUP BY lang
"""


@register("curation_pipeline", oracle=_CURATION_ORACLE)
def curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x44: the training-data curation funnel as ONE composed plan —
    exact-dedup canonical choice (dedup_exact's hash + keep-first), quality
    gate (text_quality's length/word thresholds), token accounting
    (text_token_regex's whitespace count) and chunk-count arithmetic
    (doc_chunk_overlap's 500/400 stride, closed-form instead of explode) —
    reported per language.

    The point of the row: the §2.11-2.12 operators COMPOSE into the real
    pipeline a 100 TB corpus runs nightly, inside one Catalyst plan (one
    shuffle for the dedup window on the hash, one for the lang rollup) —
    not as N materialized intermediate tables. Counts are disjoint stages
    of the funnel (docs = dups + quality-dropped + kept), so the oracle
    also cross-checks the funnel's accounting."""
    from pyspark.sql import Window  # noqa: PLC0415

    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy(F.md5(F.lower(F.trim("text")))).orderBy("doc_id")
    scored = docs.select(
        "doc_id",
        "lang",
        "n_chars",
        F.size(F.split("text", " ")).alias("words"),
        F.row_number().over(w).alias("dup_rn"),
    )
    gated = scored.select(
        "lang",
        "words",
        "n_chars",
        ((F.col("n_chars") >= 200) & (F.col("words") >= 30)).alias("passes_quality"),
        (F.col("dup_rn") == 1).alias("is_canonical"),
    )
    keep = F.col("is_canonical") & F.col("passes_quality")
    chunks = (
        F.ceil(F.greatest(F.col("n_chars") - 500, F.lit(0)) / 400.0) + 1
    ).cast("long")
    zero = F.lit(0).cast("long")
    return gated.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(~F.col("is_canonical"), 1).otherwise(0)).alias("n_dups_dropped"),
        F.sum(
            F.when(F.col("is_canonical") & ~F.col("passes_quality"), 1).otherwise(0)
        ).alias("n_quality_dropped"),
        F.sum(F.when(keep, 1).otherwise(0)).alias("n_kept"),
        F.sum(F.when(keep, F.col("words").cast("long")).otherwise(zero)).alias(
            "kept_tokens"
        ),
        F.sum(F.when(keep, chunks).otherwise(zero)).alias("kept_chunks"),
    )


# --------------------------------------------------------------------------
# x60 — fuzzy adjacent-pair screen (edit distance)
# --------------------------------------------------------------------------

_FUZZY_PREFIX_LEN = 24
_FUZZY_NEAR_DIST = 8

_FUZZY_ORACLE = f"""
WITH p AS (
  SELECT doc_id, lang, source, substring(text, 1, {_FUZZY_PREFIX_LEN}) AS pfx
  FROM documents
),
paired AS (
  SELECT doc_id, lang, source, pfx,
         lead(doc_id) OVER w AS next_doc_id,
         lead(pfx) OVER w AS next_pfx
  FROM p WINDOW w AS (PARTITION BY lang, source ORDER BY doc_id)
)
SELECT doc_id, next_doc_id,
       CAST(levenshtein(pfx, next_pfx) AS INTEGER) AS lev_dist,
       levenshtein(pfx, next_pfx) <= {_FUZZY_NEAR_DIST} AS near_dup
FROM paired WHERE next_doc_id IS NOT NULL
"""


@register("fn_fuzzy_levenshtein", oracle=_FUZZY_ORACLE)
def fn_fuzzy_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x60: edit-distance fuzzy screen — Levenshtein distance between each
    document's prefix and its (lang, source)-shard successor's. The
    bounded-pair pattern for fuzzy matching: comparing ADJACENT rows in a
    deterministic order is O(n) pairs (contrast an all-pairs fuzzy join's
    n²); production pipelines sort by a clustering key (URL, title,
    simhash) so near-identical rows land adjacent, then screen with edit
    distance exactly like this.

    100 TB: one shuffle on the shard key for the lead() window; levenshtein
    on fixed {_FUZZY_PREFIX_LEN}-char prefixes bounds per-row cost to
    O(prefix²) JVM-side. Retune knobs: prefix length trades discrimination
    vs cost; the near threshold is domain-calibrated (8/24 chars here)."""
    docs = load_table(spark, sf_dir, "documents")
    p = docs.select(
        "doc_id",
        "lang",
        "source",
        F.substring("text", 1, _FUZZY_PREFIX_LEN).alias("pfx"),
    )
    w = Window.partitionBy("lang", "source").orderBy("doc_id")
    paired = p.select(
        "doc_id",
        "pfx",
        F.lead("doc_id").over(w).alias("next_doc_id"),
        F.lead("pfx").over(w).alias("next_pfx"),
    ).filter(F.col("next_doc_id").isNotNull())
    dist = F.levenshtein("pfx", "next_pfx")
    return paired.select(
        "doc_id",
        "next_doc_id",
        dist.alias("lev_dist"),
        (dist <= _FUZZY_NEAR_DIST).alias("near_dup"),
    )


# --------------------------------------------------------------------------
# x64 — SimHash band pairing + Hamming verify (closes the x6 dedup loop)
# --------------------------------------------------------------------------

_SH_BANDS = 4  # 4 bands x 12 bits over the 48-bit simhash
_SH_BAND_BITS = 12
_SH_MAX_HAMMING = 6
_SH_BUCKET_CAP = 64  # same skew bound as the minhash/jaccard bucket caps

_SIMHASH_PAIRS_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
),
h AS (
  SELECT doc_id,
         ('0x' || substring(md5(token), 1, 12))::BIGINT AS th
  FROM tok
),
bits AS (
  SELECT doc_id, b,
         SUM(CASE WHEN (th >> b) & 1 = 1 THEN 1 ELSE -1 END) AS s
  FROM h CROSS JOIN (SELECT unnest(generate_series(0, 47)) AS b)
  GROUP BY doc_id, b
),
sh AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN s > 0 THEN (1::BIGINT << b) ELSE 0 END) AS BIGINT)
           AS simhash48
  FROM bits GROUP BY doc_id
),
bands AS (
  SELECT doc_id, simhash48, band,
         (simhash48 >> ({_SH_BAND_BITS} * band)) & {(1 << _SH_BAND_BITS) - 1}
           AS bv
  FROM sh CROSS JOIN (SELECT unnest(generate_series(0, {_SH_BANDS - 1})) AS band)
),
ok AS (
  SELECT band, bv FROM bands GROUP BY band, bv
  HAVING COUNT(*) BETWEEN 2 AND {_SH_BUCKET_CAP}
),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, c.doc_id AS doc_b,
         a.simhash48 AS ha, c.simhash48 AS hb
  FROM bands a
  JOIN ok ON a.band = ok.band AND a.bv = ok.bv
  JOIN bands c ON c.band = ok.band AND c.bv = ok.bv AND a.doc_id < c.doc_id
)
SELECT doc_a, doc_b, CAST(bit_count(xor(ha, hb)) AS INTEGER) AS hamming
FROM pairs WHERE bit_count(xor(ha, hb)) <= {_SH_MAX_HAMMING}
"""


@register("dedup_simhash_pairs", oracle=_SIMHASH_PAIRS_ORACLE)
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x64: the pairing half x6's docstring promises — near-dup candidate
    pairs from {_SH_BANDS}x{_SH_BAND_BITS}-bit bands of the 48-bit SimHash
    (two docs within Hamming distance {_SH_MAX_HAMMING} of each other must
    agree exactly on at least one band when up to {_SH_BANDS - 1} band
    boundaries are crossed — the pigeonhole guarantee behind band LSH),
    then an exact popcount-of-XOR verify.

    100 TB: candidates materialize per shared band bucket, never all-pairs;
    buckets are CAPPED at {_SH_BUCKET_CAP} docs (mirrored HAVING in the
    oracle) so a degenerate boilerplate bucket is bounded exactly like the
    minhash/jaccard caps; the Hamming verify is two integer ops in
    whole-stage codegen. Retune: wider bands admit fewer false candidates
    but tolerate fewer bit flips (threshold ~ bands-1 boundaries crossed);
    raise the cap only with executor memory (pairs <= cap^2/2 per bucket).

    Round-6 reshape (NOTES.md trap #11, same lesson as dedup_ngram_jaccard):
    the original cap-filter + two-branch self-join recomputed the ENTIRE
    upstream simhash pipeline three times (branches a, c, and the cap agg —
    reuse happens at exchanges, not arbitrary plan nodes). Bucket-emission
    computes it once: one groupBy(band, bv) collect_list behind a single
    exchange, cap as a post-agg size filter, pairs via the bounded (<= cap)
    double-explode. Isolated 5-repeat median: 2.32 s -> 0.91 s at sf0.1."""
    sh = dedup_simhash(spark, sf_dir)
    band_vals = F.explode_outer(  # sequence is non-empty; avoid trap #2
        F.expr(
            f"transform(sequence(0, {_SH_BANDS - 1}), band -> struct(band, "
            f"shiftright(simhash48, {_SH_BAND_BITS} * band) & {(1 << _SH_BAND_BITS) - 1} AS bv))"
        )
    )
    bands = sh.select("doc_id", "simhash48", band_vals.alias("bb")).select(
        "doc_id", "simhash48", "bb.band", "bb.bv"
    )
    buckets = (
        bands.groupBy("band", "bv")
        .agg(F.collect_list(F.struct("doc_id", "simhash48")).alias("docs"))
        .filter((F.size("docs") >= 2) & (F.size("docs") <= _SH_BUCKET_CAP))
    )
    pairs = (
        buckets.select(F.explode("docs").alias("a"), "docs")
        .select("a", F.explode("docs").alias("b"))
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash48").alias("ha"),
            F.col("b.simhash48").alias("hb"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return pairs.select(
        "doc_a", "doc_b", ham.alias("hamming")
    ).filter(F.col("hamming") <= _SH_MAX_HAMMING)


# --------------------------------------------------------------------------
# x72 — within-doc repetition score (3-gram duplication ratio)
# --------------------------------------------------------------------------

_REP_ORACLE = """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
sh AS (
  SELECT doc_id,
         list_transform(generate_series(1, greatest(len(w) - 2, 0)),
                        i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2]) AS s
  FROM t
)
SELECT doc_id,
       len(s) AS n_shingles,
       len(list_distinct(s)) AS n_distinct,
       CASE WHEN len(s) > 0
            THEN round(1.0 - len(list_distinct(s)) * 1.0 / len(s), 6)
            ELSE 0.0 END AS rep_ratio
FROM sh
"""


@register("text_repetition_score", oracle=_REP_ORACLE)
def text_repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x72: within-document repetition — duplicate-3-gram ratio per doc,
    the curation signal behind "remove documents that repeat themselves"
    quality rules (boilerplate, keyword stuffing, decoding loops score
    high; x7's Jaccard finds CROSS-doc near-dups, this finds INTERNAL
    redundancy). rep_ratio = 1 - distinct/total shingles.

    Single narrow pass: shingle array built by iterating the token array
    (trap #15 shape — lambda subject IS the data array, neighbor peeks via
    try_element_at), counted with size/array_distinct; no explode, no
    shuffle, embarrassingly parallel.

    100 TB: scan-bound and prunable; pairs with x9/x73 as pushdown-able
    per-doc quality predicates ahead of any shuffle-heavy dedup stage."""
    docs = load_table(spark, sf_dir, "documents")
    staged = docs.select("doc_id", F.split("text", " ").alias("w"))
    shingles = F.expr(
        "slice(transform(w, (tok, i) -> concat_ws(' ', tok, "
        "try_element_at(w, i + 2), try_element_at(w, i + 3))), "
        "1, greatest(size(w) - 2, 0))"
    )
    sh = staged.select("doc_id", shingles.alias("s"))
    n = F.size("s")
    nd = F.size(F.array_distinct("s"))
    return sh.select(
        "doc_id",
        n.alias("n_shingles"),
        nd.alias("n_distinct"),
        F.when(n > 0, F.round(F.lit(1.0) - nd.cast("double") / n, 6))
        .otherwise(F.lit(0.0))
        .alias("rep_ratio"),
    )


# --------------------------------------------------------------------------
# x73 — Gopher-style document quality rules
# --------------------------------------------------------------------------

_GOPHER_MIN_WORDS, _GOPHER_MAX_WORDS = 50, 10000
_GOPHER_MIN_MWL, _GOPHER_MAX_MWL = 3.0, 10.0
_GOPHER_MAX_SYMBOL = 0.10

_GOPHER_ORACLE = f"""
WITH t AS (
  SELECT doc_id, text, string_split(text, ' ') AS w FROM documents
),
m AS (
  SELECT doc_id,
         len(w) AS n_words,
         round(list_sum(list_transform(w, x -> len(x))) * 1.0 / len(w), 6)
           AS mean_word_len,
         CASE WHEN len(text) > 0
              THEN round(len(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g'))
                         * 1.0 / len(text), 6)
              ELSE 0.0 END AS symbol_ratio
  FROM t
)
SELECT doc_id, n_words, mean_word_len, symbol_ratio,
       n_words BETWEEN {_GOPHER_MIN_WORDS} AND {_GOPHER_MAX_WORDS} AS word_count_ok,
       mean_word_len BETWEEN {_GOPHER_MIN_MWL} AND {_GOPHER_MAX_MWL} AS mean_len_ok,
       symbol_ratio < {_GOPHER_MAX_SYMBOL} AS symbol_ok,
       (n_words BETWEEN {_GOPHER_MIN_WORDS} AND {_GOPHER_MAX_WORDS})
         AND (mean_word_len BETWEEN {_GOPHER_MIN_MWL} AND {_GOPHER_MAX_MWL})
         AND symbol_ratio < {_GOPHER_MAX_SYMBOL} AS passes_gopher
FROM m
"""


@register("quality_gopher_rules", oracle=_GOPHER_ORACLE)
def quality_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x73: Gopher-style heuristic quality gates (published web-corpus
    curation rules: word-count bounds, mean-word-length bounds, symbol
    ratio cap) as per-doc boolean columns + a combined pass flag — the
    filter stage run BEFORE any expensive dedup/embedding work. Extends
    x9's scores into actionable accept/reject rules with thresholds as
    module constants (retune per corpus).

    100 TB: narrow scan-fused projection, no shuffle; the boolean columns
    are exactly what a curation pipeline pushes down as partition-pruning
    predicates on a second pass. Mean word length via pure length
    arithmetic (Σ len(token) ≡ len(text) − (n_tokens − 1) for the
    single-space split), symbol ratio via one global regexp_replace
    length delta."""
    docs = load_table(spark, sf_dir, "documents")
    staged = docs.select("doc_id", "text", F.split("text", " ").alias("w"))
    n_words = F.size("w")
    # r14 (guide §4.1): Σ len(token) ≡ len(text) − (n_tokens − 1) for a
    # single-char split (delimiters are the only non-token chars; empty
    # tokens contribute 0 both ways) — replaces the interpreted per-token
    # aggregate() lambda with codegen integer arithmetic, same integer.
    sum_len = F.length("text") - (n_words - F.lit(1))
    m = staged.select(
        "doc_id",
        n_words.alias("n_words"),
        F.round(sum_len.cast("double") / n_words, 6).alias("mean_word_len"),
        F.when(
            F.length("text") > 0,
            F.round(
                F.length(F.regexp_replace("text", "[A-Za-z0-9 ]", "")).cast("double")
                / F.length("text"),
                6,
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("symbol_ratio"),
    )
    word_ok = F.col("n_words").between(_GOPHER_MIN_WORDS, _GOPHER_MAX_WORDS)
    mwl_ok = F.col("mean_word_len").between(_GOPHER_MIN_MWL, _GOPHER_MAX_MWL)
    sym_ok = F.col("symbol_ratio") < _GOPHER_MAX_SYMBOL
    return m.select(
        "doc_id", "n_words", "mean_word_len", "symbol_ratio",
        word_ok.alias("word_count_ok"),
        mwl_ok.alias("mean_len_ok"),
        sym_ok.alias("symbol_ok"),
        (word_ok & mwl_ok & sym_ok).alias("passes_gopher"),
    )


# --------------------------------------------------------------------------
# x95 — deterministic MinHash near-dup pairs (full SQL oracle)
# --------------------------------------------------------------------------

# Constants + signature/band construction live in operators/minhash.py,
# shared with the streaming twin (st17 near_dedup_stream) so the two
# surfaces cannot drift.
from ..operators.minhash import (  # noqa: E402
    MHD_BAND_ROWS as _MHD_BAND_ROWS,
    MHD_CAP as _MHD_CAP,
    MHD_K as _MHD_K,
    MHD_TAU as _MHD_TAU,
    estimate_jaccard,
    minhash_bands,
)

_MHD_ORACLE = f"""
WITH sh AS (
  SELECT doc_id,
         list_distinct(list_transform(
           generate_series(1, greatest(len(string_split(text, ' ')) - 2, 1)),
           i -> string_split(text, ' ')[i] || ' ' ||
                coalesce(string_split(text, ' ')[i+1], '') || ' ' ||
                coalesce(string_split(text, ' ')[i+2], ''))) AS shingles
  FROM documents
),
flat AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
sig AS (
  SELECT doc_id, k.k AS k,
         MIN(md5(CAST(k.k AS VARCHAR) || '|' || s)) AS mh
  FROM flat CROSS JOIN (SELECT unnest(generate_series(0, {_MHD_K - 1})) AS k) k
  GROUP BY doc_id, k.k
),
bands AS (
  SELECT doc_id, k // {_MHD_BAND_ROWS} AS band,
         md5(string_agg(mh, ',' ORDER BY k)) AS bkey
  FROM sig GROUP BY doc_id, k // {_MHD_BAND_ROWS}
),
buckets AS (
  SELECT band, bkey, list(doc_id ORDER BY doc_id) AS ds
  FROM bands GROUP BY band, bkey
  HAVING COUNT(*) BETWEEN 2 AND {_MHD_CAP}
),
pairs AS (
  SELECT DISTINCT a.d AS doc_a, b.d AS doc_b
  FROM (SELECT unnest(ds) AS d, band, bkey FROM buckets) a
  JOIN (SELECT unnest(ds) AS d, band, bkey FROM buckets) b
    ON a.band = b.band AND a.bkey = b.bkey AND a.d < b.d
)
SELECT p.doc_a, p.doc_b,
       ROUND(SUM(CASE WHEN sa.mh = sb.mh THEN 1 ELSE 0 END) / {_MHD_K}.0, 6)
         AS est_jaccard
FROM pairs p
JOIN sig sa ON sa.doc_id = p.doc_a
JOIN sig sb ON sb.doc_id = p.doc_b AND sb.k = sa.k
GROUP BY p.doc_a, p.doc_b
HAVING SUM(CASE WHEN sa.mh = sb.mh THEN 1 ELSE 0 END) / {_MHD_K}.0 >= {_MHD_TAU}
"""


@register("dedup_minhash_det", oracle=_MHD_ORACLE)
def dedup_minhash_det(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x95: DETERMINISTIC MinHash near-dup pairs with a full SQL oracle —
    the hash-attested counterpart to l2's ml.feature.MinHashLSH path
    (rows-only by declaration because Spark ML's perfect-hash seeds are
    engine-private). Here every permutation is md5(k || '|' || shingle),
    identical text→hex on both engines, so the signature, the band keys,
    the candidate set, and the similarity ESTIMATE are all bit-exact and
    the driver can hash-compare them.

    Shape — the signature never leaves the row: all 16 per-permutation
    minima are array_min(transform(...)) expressions in ONE projection, so
    signature construction needs NO explode, NO groupBy and NO shuffle at
    all (a first cut fanned out ×16 rows through an aggregate: 3.5 s at
    sf0.1; this form measures 2.1 s, and the residue is the 16M md5 calls
    themselves). Bands explode WITH the 16-hash array attached, buckets
    (capped 64 docs) collect (doc_id, sig) structs, and pairs score by
    zip_with inside the bucket row — md5 is computed exactly once, no
    signature re-join, no reliance on AQE exchange reuse.

    100 TB: no all-pairs shape anywhere — candidates exist only where a
    full band collides (P ≈ j^4 per band, vanishing for dissimilar docs);
    the md5-per-shingle CPU cost is the honest price of cross-engine
    attestability (prod would swap xxhash64 at 5× less CPU, same
    topology — that variant is l2/x7's)."""
    docs = load_table_spread(spark, sf_dir, "documents", "doc_id")
    bands = minhash_bands(docs.select("doc_id", "text"))
    buckets = (
        bands.groupBy("band", "bkey")
        .agg(F.collect_list(F.struct("doc_id", "sig")).alias("ds"))
        .filter(F.size("ds").between(2, _MHD_CAP))
    )
    scored = (
        buckets.select(F.explode("ds").alias("a"), "ds")
        .select("a", F.explode("ds").alias("b"))
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            estimate_jaccard(F.col("a.sig"), F.col("b.sig")).alias("est_jaccard"),
        )
    )
    return scored.distinct().filter(F.col("est_jaccard") >= _MHD_TAU)


# --------------------------------------------------------------------------
# x96 — exact-duplicate cluster resolution: keep the best representative
# --------------------------------------------------------------------------

_KEEP_ORACLE = """
WITH sh AS (
  SELECT doc_id, n_chars, list_transform(
    generate_series(1, greatest(len(string_split(text, ' ')) - 2, 1)),
    i -> string_split(text, ' ')[i] || ' ' ||
         coalesce(string_split(text, ' ')[i+1], '') || ' ' ||
         coalesce(string_split(text, ' ')[i+2], '')) AS gs
  FROM documents
),
fp AS (
  SELECT doc_id, MIN(n_chars) AS n_chars, MIN(md5(s)) AS content_key
  FROM (SELECT doc_id, n_chars, unnest(gs) AS s FROM sh) f
  GROUP BY doc_id
),
ranked AS (
  SELECT doc_id, n_chars, content_key,
         COUNT(*) OVER (PARTITION BY content_key) AS cluster_size,
         ROW_NUMBER() OVER (PARTITION BY content_key
                            ORDER BY n_chars DESC, doc_id) AS rk
  FROM fp
)
SELECT doc_id, content_key, cluster_size,
       CASE WHEN rk = 1 THEN 'keep' ELSE 'drop' END AS decision
FROM ranked
WHERE cluster_size > 1
"""


@register("dedup_keep_best", oracle=_KEEP_ORACLE)
def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x96: the RESOLUTION half of dedup — candidate generators (l1,
    x5's fingerprint, x29's components) find clusters, this decides which
    member survives: rank every member of a multi-doc cluster by
    (n_chars DESC, doc_id) and mark exactly one 'keep', the rest 'drop'.
    Cluster key here is x5's min-3gram-md5 fingerprint (this corpus has
    near-dups but zero byte-identical dups, so an exact-content key would
    produce an empty, assertion-free result); a production pipeline feeds
    whatever cluster id its generator emits. A training pipeline applies
    the decision as a semi-join filter; emitting the per-doc decision
    table (not the filtered corpus) keeps the operator auditable.

    Deterministic by construction: the tie-break chain ends in the unique
    doc_id, so the keep choice can never depend on partition order.

    100 TB: one shuffle on content_key (the window and the cluster-size
    count share the same partitioning — Spark evaluates both in a single
    sort); singleton clusters are filtered AFTER the window but they cost
    no pair materialization, just their one row through the shuffle."""
    docs = load_table_spread(spark, sf_dir, "documents", "doc_id")
    toks = F.split(F.col("text"), " ")
    # try_element_at (r13 advisor): ANSI element_at throws past the array
    # end, so a 1-2-token doc would crash the fingerprint; the oracle's
    # w[i+1] pads NULL -> coalesce ''. try_element_at matches that.
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - 2, F.lit(1))),
        lambda i: F.concat_ws(
            " ",
            F.try_element_at(toks, i),
            F.coalesce(F.try_element_at(toks, i + 1), F.lit("")),
            F.coalesce(F.try_element_at(toks, i + 2), F.lit("")),
        ),
    )
    hashed = docs.select(
        "doc_id",
        "n_chars",
        F.array_min(F.transform(grams, F.md5)).alias("content_key"),
    )
    w = Window.partitionBy("content_key")
    rk = F.row_number().over(
        w.orderBy(F.col("n_chars").desc(), F.col("doc_id"))
    )
    return (
        hashed.select(
            "doc_id",
            "content_key",
            F.count(F.lit(1)).over(w).alias("cluster_size"),
            rk.alias("rk"),
        )
        .filter(F.col("cluster_size") > 1)
        .select(
            "doc_id",
            "content_key",
            "cluster_size",
            F.when(F.col("rk") == 1, F.lit("keep")).otherwise(F.lit("drop")).alias(
                "decision"
            ),
        )
    )


# --------------------------------------------------------------------------
# x97 — exact mode with pinned tie-break
# --------------------------------------------------------------------------

_MODE_ORACLE = """
WITH counts AS (
  SELECT source, lang, COUNT(*) AS n
  FROM documents GROUP BY source, lang
),
ranked AS (
  SELECT source, lang, n,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY n DESC, lang) AS rk
  FROM counts
)
SELECT source, lang AS modal_lang, n AS n_docs
FROM ranked WHERE rk = 1
"""


@register("agg_mode_exact", oracle=_MODE_ORACLE)
def agg_mode_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x97: exact per-group MODE with a PINNED tie-break — the modal lang
    per source. Neither engine's built-in mode() is usable for attested
    results (Spark's F.mode and DuckDB's mode() both break frequency ties
    arbitrarily), so the operator is spelled count + rank with the tie
    chain ending in the value itself: identical answers at any partition
    count, on any engine.

    100 TB: two-level aggregation — groupBy(source, lang) combines
    map-side to a tiny count grid, then the rank window partitions on
    (source) over |sources|×|langs| rows, not the corpus."""
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("n"))
    rk = F.row_number().over(
        Window.partitionBy("source").orderBy(F.col("n").desc(), F.col("lang"))
    )
    return (
        counts.withColumn("rk", rk)
        .filter(F.col("rk") == 1)
        .select("source", F.col("lang").alias("modal_lang"), F.col("n").alias("n_docs"))
    )


# --------------------------------------------------------------------------
# x102 — per-document keyword extraction (log-free tf-idf ranking)
# --------------------------------------------------------------------------

_KW_TOPK = 3

_KW_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
),
tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY doc_id, tok),
df AS (SELECT tok, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY tok),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT t.doc_id, t.tok, t.tf, d.df,
         ROUND(CAST(t.tf AS DOUBLE) * (SELECT n_docs FROM n) / d.df, 6) AS score
  FROM tf t JOIN df d ON t.tok = d.tok
),
ranked AS (
  SELECT doc_id, tok, tf, df, score,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, tok) AS rk
  FROM scored
)
SELECT doc_id, tok AS keyword, tf, df, score
FROM ranked WHERE rk <= {_KW_TOPK}
"""


@register("text_keyword_extract", oracle=_KW_ORACLE)
def text_keyword_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x102: top-{_KW_TOPK} distinctive keywords per document, ranked by a
    LOG-FREE tf-idf variant: score = tf × N / df. x26 computes the classic
    ln-idf matrix for downstream math; THIS op is the extraction step, and
    it deliberately avoids ln() because libm logs are not correctly
    rounded — a 1-ulp disagreement at a rank boundary would flip the
    extracted keyword set between engines. tf × N / df is a ratio of
    exact integers: same ORDERING power for top-k extraction, zero float
    provenance. Tie-break ends in the token itself.

    100 TB: tf is one shuffle on (doc, token); df one on token; the join
    back is token-keyed with the df side orders of magnitude smaller
    (broadcast after AQE stats); the rank window partitions per doc over
    its own vocabulary only. N folds in as a literal after one bounded
    count."""
    docs = load_table_spread(spark, sf_dir, "documents", "doc_id")
    n_docs = docs.count()
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    # df derives from tf exactly as in text_tfidf (r14): tf has one row per
    # distinct (doc, tok), so COUNT(*) per tok over tf == COUNT(DISTINCT
    # doc_id) over the raw token stream. Without the cut the df branch
    # re-scanned and re-exploded the whole corpus (no exchange reuse across
    # the differing aggregates); the localCheckpoint materializes the
    # collapsed tf frame once for both consumers, and df (vocab-grain,
    # orders smaller than tf) broadcasts explicitly because the checkpoint
    # erases the stats AQE used to pick the broadcast.
    tf = (
        toks.groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint()
    )
    df = tf.groupBy("tok").agg(F.count(F.lit(1)).cast("long").alias("df"))
    scored = tf.join(F.broadcast(df), "tok").select(
        "doc_id",
        "tok",
        "tf",
        "df",
        F.round(F.col("tf").cast("double") * F.lit(n_docs) / F.col("df"), 6).alias(
            "score"
        ),
    )
    rk = F.row_number().over(
        Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("tok"))
    )
    return (
        scored.withColumn("rk", rk)
        .filter(F.col("rk") <= _KW_TOPK)
        .select("doc_id", F.col("tok").alias("keyword"), "tf", "df", "score")
    )


# --------------------------------------------------------------------------
# x107 — asymmetric containment near-dup pairs (snippet-inclusion dedup)
# --------------------------------------------------------------------------

_CONT_DF_CAP = 256
_CONT_TAU = 0.5

_CONT_ORACLE = f"""
WITH sh AS (
  SELECT doc_id,
         list_distinct(list_transform(
           generate_series(1, greatest(len(string_split(text, ' ')) - 2, 1)),
           i -> string_split(text, ' ')[i] || ' ' ||
                coalesce(string_split(text, ' ')[i+1], '') || ' ' ||
                coalesce(string_split(text, ' ')[i+2], ''))) AS shingles
  FROM documents
),
flat AS (SELECT doc_id, len(shingles) AS n_sh, unnest(shingles) AS s FROM sh),
hot AS (SELECT s FROM flat GROUP BY s HAVING COUNT(*) > {_CONT_DF_CAP}),
pruned AS (SELECT * FROM flat WHERE s NOT IN (SELECT s FROM hot)),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.n_sh AS na, b.n_sh AS nb, COUNT(*) AS n_common
  FROM pruned a JOIN pruned b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id, a.n_sh, b.n_sh
)
SELECT doc_a, doc_b,
       ROUND(CAST(n_common AS DOUBLE) / na, 6) AS cont_a_in_b,
       ROUND(CAST(n_common AS DOUBLE) / nb, 6) AS cont_b_in_a
FROM inter
WHERE n_common >= {_CONT_TAU} * na OR n_common >= {_CONT_TAU} * nb
"""


@register("dedup_containment", oracle=_CONT_ORACLE)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x107: ASYMMETRIC containment pairs — |A∩B|/|A| and |A∩B|/|B| per
    candidate pair. Jaccard (x7) under-scores snippet inclusion: a short
    doc fully embedded in a long one has tiny Jaccard but containment
    ≈ 1 on the short side — the case that matters when boilerplate-
    wrapped copies pollute a training corpus. Candidates come from the
    same capped shared-shingle buckets as x7 (cross-source allowed here);
    the threshold keeps a pair when EITHER direction crosses τ=0.5,
    spelled in integers (n_common ≥ τ·n) so no float enters the filter.

    100 TB: identical shape and caps to x7 — posting-list groupBy with
    df-capped buckets, bounded double-explode, one pair aggregation; the
    directed ratios are a projection on the pair row."""
    docs = load_table_spread(spark, sf_dir, "documents", "doc_id")
    toks = F.split(F.col("text"), " ")
    # try_element_at (r13 advisor): ANSI element_at throws past the array
    # end; the oracle's w[i+1] pads NULL -> coalesce ''.
    shingles = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(toks) - 2, F.lit(1))),
            lambda i: F.concat_ws(
                " ",
                F.try_element_at(toks, i),
                F.coalesce(F.try_element_at(toks, i + 1), F.lit("")),
                F.coalesce(F.try_element_at(toks, i + 2), F.lit("")),
            ),
        )
    )
    sh = docs.select("doc_id", shingles.alias("shingles")).withColumn(
        "n_sh", F.size("shingles")
    )
    flat = sh.select("doc_id", "n_sh", F.explode_outer("shingles").alias("s"))
    grp = (
        flat.groupBy("s")
        .agg(F.collect_list(F.struct("doc_id", "n_sh")).alias("ds"))
        .filter(F.size("ds").between(2, _CONT_DF_CAP))
    )
    # Pair generation: explode x explode + a<b filter. An r13 A/B tried the
    # "obvious" improvement — a positional-slice higher-order function
    # emitting exactly C(n,2) structs (half the exploded rows, no filter) —
    # and it measured WORSE at sf1 (24.97 s vs 20.5 s isolated 5-repeat):
    # slice() copies the array tail for every element, so the HOF form pays
    # O(n^2) array COPYING per bucket row in interpreted expression code,
    # while the double explode streams through whole-stage codegen and the
    # (doc_a, doc_b) partial agg combines map-side before the exchange.
    # Keep the codegen'd form; the pair mass itself is capped by
    # _CONT_DF_CAP (<= C(256,2) per bucket) either way.
    pairs = (
        grp.select(F.explode("ds").alias("a"), "ds")
        .select("a", F.explode("ds").alias("b"))
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.n_sh").alias("na"),
            F.col("b.n_sh").alias("nb"),
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        pairs.filter(
            (F.col("n_common") >= _CONT_TAU * F.col("na"))
            | (F.col("n_common") >= _CONT_TAU * F.col("nb"))
        )
        .select(
            "doc_a",
            "doc_b",
            F.round(F.col("n_common").cast("double") / F.col("na"), 6).alias(
                "cont_a_in_b"
            ),
            F.round(F.col("n_common").cast("double") / F.col("nb"), 6).alias(
                "cont_b_in_a"
            ),
        )
    )


# --------------------------------------------------------------------------
# x108 — tokenizer vocabulary coverage / OOV rate
# --------------------------------------------------------------------------

_VOCAB_TOPK = 64

_OOV_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
),
freq AS (SELECT tok, COUNT(*) AS n FROM toks GROUP BY tok),
vocab AS (
  SELECT tok FROM (
    SELECT tok, ROW_NUMBER() OVER (ORDER BY n DESC, tok) AS rk FROM freq
  ) r WHERE rk <= {_VOCAB_TOPK}
)
SELECT t.doc_id,
       COUNT(*) AS n_tokens,
       CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
       ROUND(CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS oov_rate
FROM toks t LEFT JOIN vocab v ON t.tok = v.tok
GROUP BY t.doc_id
"""


@register("vocab_oov_rate", oracle=_OOV_ORACLE)
def vocab_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x108: out-of-vocabulary rate per document against a corpus-derived
    top-{_VOCAB_TOPK} vocabulary — the coverage check run before
    committing to a tokenizer/vocab: docs with high OOV either get
    routed to a different tokenizer or flagged as noise.

    The vocab is itself data-derived (frequency rank with a pinned
    token tie-break), so the whole operator is corpus-in, report-out
    with no external artifact; counts are integers, the rate an exact
    integer ratio.

    100 TB: token explode + one groupBy(token) for frequencies; the
    top-k vocab is tiny by construction -> broadcast LEFT join marks
    membership; per-doc aggregation combines map-side. The explode runs
    twice (vocab build + coverage) — at scale persist the tokenized
    projection once for both consumers."""
    docs = load_table_spread(spark, sf_dir, "documents", "doc_id")
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
    vocab = (
        freq.withColumn(
            "rk",
            F.row_number().over(Window.orderBy(F.col("n").desc(), F.col("tok"))),
        )
        .filter(F.col("rk") <= _VOCAB_TOPK)
        .select("tok", F.lit(True).alias("in_vocab"))
    )
    return (
        toks.join(F.broadcast(vocab), "tok", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0)).alias("n_oov"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_oov",
            F.round(
                F.col("n_oov").cast("double") / F.col("n_tokens"), 6
            ).alias("oov_rate"),
        )
    )


# --------------------------------------------------------------------------
# x113 — per-source language-mix entropy + KL divergence to the corpus mix
# --------------------------------------------------------------------------

# Fixed-point micro-unit discipline (same as x54): every log2 term is
# computed over 6dp-PINNED probabilities and immediately rounded to an
# integer micro-unit, so the per-source SUM is exact integer arithmetic on
# both engines; only the final display division is float.
_ENTROPY_ORACLE = """
WITH sl AS (
  SELECT source, lang, COUNT(*) AS n
  FROM documents GROUP BY source, lang
),
src AS (SELECT source, SUM(n) AS n_src FROM sl GROUP BY source),
corpus AS (
  SELECT lang, round(SUM(n) / (SELECT CAST(COUNT(*) AS DOUBLE) FROM documents), 6) AS q
  FROM sl GROUP BY lang
),
terms AS (
  SELECT sl.source,
         round(sl.n / CAST(src.n_src AS DOUBLE), 6) AS p,
         corpus.q AS q
  FROM sl
  JOIN src ON sl.source = src.source
  JOIN corpus ON sl.lang = corpus.lang
),
units AS (
  SELECT source,
         CAST(round(-p * log2(p) * 1000000) AS BIGINT) AS h_u,
         CAST(round(p * log2(p / q) * 1000000) AS BIGINT) AS kl_u
  FROM terms WHERE p > 0
)
SELECT source,
       round(CAST(SUM(h_u) AS DOUBLE) / 1000000.0, 6) AS lang_entropy_bits,
       round(CAST(SUM(kl_u) AS DOUBLE) / 1000000.0, 6) AS kl_to_corpus_bits
FROM units GROUP BY source
"""


@register("source_lang_entropy", oracle=_ENTROPY_ORACLE)
def source_lang_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x113: per-source language-mix ENTROPY (how diverse is this source?)
    and KL DIVERGENCE to the corpus-wide mix (how atypical is it?) — the
    curation diagnostic for spotting sources whose language distribution
    will skew a training mixture.

    Determinism is x54's fixed-point discipline: probabilities pin to 6dp
    first, every -p·log2(p) / p·log2(p/q) term rounds to integer
    micro-units immediately, the per-source sum is exact integers, and
    only the final /1e6 display division is float. (A raw float Σ p·log p
    would be summation-order-dependent AND ride each libm's uncorrected
    log2.)

    100 TB: the whole operator runs on the (source × lang) count grid —
    two tiny aggregates off one corpus scan, a broadcast join of the
    corpus mix, and a grid-sized groupBy. Nothing heavy ever shuffles."""
    docs = load_table(spark, sf_dir, "documents")
    sl = docs.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("n"))
    n_total = docs.count()
    src = sl.groupBy("source").agg(F.sum("n").alias("n_src"))
    corpus = sl.groupBy("lang").agg(
        F.round(F.sum("n") / F.lit(float(n_total)), 6).alias("q")
    )
    terms = (
        sl.join(src, "source")
        .join(F.broadcast(corpus), "lang")
        .select(
            "source",
            F.round(F.col("n") / F.col("n_src").cast("double"), 6).alias("p"),
            "q",
        )
        .filter(F.col("p") > 0)
    )
    units = terms.select(
        "source",
        F.round(-F.col("p") * F.log2("p") * 1_000_000)
        .cast("long")
        .alias("h_u"),
        F.round(F.col("p") * F.log2(F.col("p") / F.col("q")) * 1_000_000)
        .cast("long")
        .alias("kl_u"),
    )
    return units.groupBy("source").agg(
        F.round(F.sum("h_u").cast("double") / 1_000_000.0, 6).alias(
            "lang_entropy_bits"
        ),
        F.round(F.sum("kl_u").cast("double") / 1_000_000.0, 6).alias(
            "kl_to_corpus_bits"
        ),
    )


# --------------------------------------------------------------------------
# x128 — first-occurrence n-gram novelty per document
# --------------------------------------------------------------------------

_NOVELTY_ORACLE = """
WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
grams AS (
  SELECT DISTINCT doc_id, array_to_string(t[i : i + 2], ' ') AS gram
  FROM (SELECT doc_id, t,
               unnest(generate_series(1, greatest(len(t) - 2, 0))) AS i
        FROM tok)
),
first AS (SELECT gram, MIN(doc_id) AS first_doc FROM grams GROUP BY gram)
SELECT g.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_distinct_grams,
       CAST(SUM(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END)
            AS BIGINT) AS n_novel,
       ROUND(CAST(SUM(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END)
                  AS DOUBLE) / COUNT(*), 6) AS novelty_rate
FROM grams g JOIN first f ON g.gram = f.gram
GROUP BY g.doc_id
"""


@register("doc_ngram_novelty", oracle=_NOVELTY_ORACLE)
def doc_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x128: per-document n-gram NOVELTY — what fraction of a doc's
    distinct word 3-grams occur for the FIRST time in this doc (first = by
    doc_id order, the ingest order)? The corpus-growth diagnostic behind
    "is new crawl data adding anything": dedup (x6/x7) answers whether a
    whole doc repeats; novelty measures marginal content at the n-gram
    grain — low-novelty docs are recombinations of seen text even when no
    single document matches them.

    100 TB: shingle once (x45's explode device), distinct per (doc,gram),
    groupBy(gram) min(doc_id) for the first-occurrence table, then ONE
    big-big hash join back on gram + a per-doc agg. The gram join is the
    honest cost — both sides hash-partition on gram, no broadcast
    pretense; min(doc_id) is a partial agg, so the first-occurrence table
    never materializes per-row duplicates."""
    docs = load_table_spread(spark, sf_dir, "documents", "doc_id")
    toks = docs.select("doc_id", F.split("text", " ").alias("t"))
    t = F.col("t")
    grams_arr = F.when(
        F.size(t) >= 3,
        F.transform(
            F.sequence(F.lit(1), F.size(t) - 2),
            lambda i: F.array_join(F.slice(t, i, 3), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = (
        toks.select("doc_id", grams_arr.alias("grams"))
        .select("doc_id", F.explode_outer("grams").alias("gram"))
        .filter(F.col("gram").isNotNull())
        .distinct()
    )
    # r14: first-occurrence via MIN over a gram-partitioned window instead
    # of groupBy(gram) + join-back — the join's SMJ probe side already
    # placed every row of a gram in one partition, so the window has the
    # IDENTICAL skew exposure while deriving the explode+distinct subtree
    # ONCE instead of twice (2 corpus scans -> 1; zero runtime
    # ReusedExchange in the old executed plan, verified).
    fd = grams.select(
        "doc_id",
        F.min("doc_id").over(Window.partitionBy("gram")).alias("first_doc"),
    )
    novel = F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
    return (
        fd.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_distinct_grams"),
            F.sum(novel).cast("long").alias("n_novel"),
            F.round(
                F.sum(novel).cast("double") / F.count(F.lit(1)), 6
            ).alias("novelty_rate"),
        )
    )


# --------------------------------------------------------------------------
# x130 — vocabulary coverage curve (tokens needed for p% of the corpus)
# --------------------------------------------------------------------------

_COVERAGE_ORACLE = """
WITH tf AS (
  SELECT unnest(string_split(text, ' ')) AS token FROM documents
),
freq AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS n FROM tf GROUP BY token),
tot AS (SELECT SUM(n) AS total FROM freq),
r AS (SELECT token, n,
             ROW_NUMBER() OVER (ORDER BY n DESC, token) AS rank,
             SUM(n) OVER (ORDER BY n DESC, token
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum
      FROM freq)
SELECT p.pct,
       CAST(MIN(CASE WHEN 100 * r.cum >= p.pct * t.total THEN r.rank END)
            AS BIGINT) AS k_tokens
FROM r CROSS JOIN tot t
CROSS JOIN (VALUES (50), (90), (95), (99)) AS p(pct)
GROUP BY p.pct
"""


@register("vocab_coverage_curve", oracle=_COVERAGE_ORACLE)
def vocab_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x130: vocabulary COVERAGE curve — the smallest top-k vocabulary
    (tokens by descending frequency, name tie-break) whose occurrences
    cover ≥50/90/95/99% of the corpus token stream. THE tokenizer-sizing
    diagnostic (complement of x78 vocab_oov_rate, which scores a FIXED
    vocab): coverage thresholds as exact integer cross-multiplication
    (100·cum ≥ pct·total — no percentage float ever materializes).

    100 TB: token-frequency agg (map-side partial), then the running sum
    runs over the |vocab| frequency table, not the corpus. The global
    window is safe at vocab cardinality (x98's rationale); for a
    billion-type vocab, bin by frequency first (x116's two-level device).
    The threshold probe is a 4-row broadcast cross join — constant."""
    docs = load_table(spark, sf_dir, "documents")
    freq = (
        docs.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.orderBy(F.col("n").desc(), "token")
    r = freq.select(
        "n",
        F.row_number().over(w).alias("rank"),
        F.sum("n").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("cum"),
    )
    tot = freq.agg(F.sum("n").alias("total"))
    pcts = spark.range(1).select(
        F.explode(F.array(F.lit(50), F.lit(90), F.lit(95), F.lit(99))).alias("pct")
    )
    return (
        r.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(pcts))
        .groupBy("pct")
        .agg(
            F.min(
                F.when(
                    100 * F.col("cum") >= F.col("pct") * F.col("total"),
                    F.col("rank"),
                )
            )
            .cast("long")
            .alias("k_tokens")
        )
    )


# --------------------------------------------------------------------------
# x143 — duplicated-span coverage per document (exact-substring dedup metric)
# --------------------------------------------------------------------------

_SPAN_K = 8

_SPAN_ORACLE = f"""
WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
grams AS (
  SELECT doc_id, i AS pos, i + {_SPAN_K - 1} AS pos_end,
         array_to_string(t[i : i + {_SPAN_K - 1}], ' ') AS gram
  FROM (SELECT doc_id, t,
               unnest(generate_series(1, greatest(len(t) - {_SPAN_K - 1}, 0))) AS i
        FROM tok)
),
dup AS (
  SELECT gram FROM grams GROUP BY gram HAVING COUNT(DISTINCT doc_id) >= 2
),
spans AS (
  SELECT g.doc_id, g.pos, g.pos_end,
         MAX(g.pos_end) OVER (PARTITION BY g.doc_id ORDER BY g.pos
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
  FROM grams g JOIN dup d ON g.gram = d.gram
),
cov AS (
  SELECT doc_id,
         CAST(SUM(GREATEST(0, pos_end
              - GREATEST(pos, COALESCE(prev_end, 0) + 1) + 1)) AS BIGINT)
           AS covered_tokens
  FROM spans GROUP BY doc_id
)
SELECT tok.doc_id,
       CAST(len(tok.t) AS BIGINT) AS n_tokens,
       COALESCE(cov.covered_tokens, 0) AS covered_tokens,
       ROUND(CAST(COALESCE(cov.covered_tokens, 0) AS DOUBLE) / len(tok.t), 6)
         AS dup_span_frac
FROM tok LEFT JOIN cov ON tok.doc_id = cov.doc_id
"""


@register("dedup_span_coverage", oracle=_SPAN_ORACLE)
def dedup_span_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x143: duplicated-SPAN coverage — for each document, the exact
    fraction of token positions covered by at least one {_SPAN_K}-gram that
    also occurs in ANOTHER document. This is the doc-grain readout of
    exact-substring training-data dedup (the metric behind "deduplicating
    training data makes LMs better"-style span removal): x6/x7/l2 decide
    whole-doc duplication, x128 counts first-occurrence grams — this one
    measures how much of each doc's BODY is copied text, which is the
    quantity a span-scrubbing cleaner would actually delete.

    Position coverage is an interval-UNION, computed with the sweep: spans
    sorted by start, carry the running max end over preceding spans, and
    each span contributes max(0, end - max(start, prev_end + 1) + 1)
    tokens — overlap-exact, all integer arithmetic, bit-equal everywhere.

    100 TB: shingle once; r14 (guide §2.3/§2.4) collapsed the old
    "groupBy(gram) then big-big join back on gram" into ONE gram-keyed
    shuffle — occurrences ride the same exchange as the dup test
    (collect_list per gram), survivors re-explode, so the k-gram STRINGS
    cross the network once instead of twice and the explode subtree is
    derived once instead of twice. Hot grams are the skew knob: a
    pathological million-occurrence gram lands in one task's
    collect_list — cap or salt per-gram occurrence lists past a bound
    (x7's mitigation) before re-exploding. The sweep then runs inside a
    per-doc sort that reuses the doc_id exchange of the final agg. No
    caps needed at these corpus shapes: the sweep is linear in spans and
    coverage saturates at the doc length."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.split("text", " ").alias("t"))
    t = F.col("t")
    grams_arr = F.when(
        F.size(t) >= _SPAN_K,
        F.transform(
            F.sequence(F.lit(1), F.size(t) - (_SPAN_K - 1)),
            lambda i: F.struct(
                i.alias("pos"), F.array_join(F.slice(t, i, _SPAN_K), " ").alias("gram")
            ),
        ),
    ).otherwise(F.expr("array()").cast("array<struct<pos:int,gram:string>>"))
    grams = (
        toks.select("doc_id", F.explode(grams_arr).alias("g"))
        .select("doc_id", F.col("g.pos").alias("pos"), F.col("g.gram").alias("gram"))
        .withColumn("pos_end", F.col("pos") + F.lit(_SPAN_K - 1))
    )
    occ = (
        grams.groupBy("gram")
        .agg(F.collect_list(F.struct("doc_id", "pos", "pos_end")).alias("occ"))
        .filter(F.size(F.array_distinct(F.col("occ.doc_id"))) >= 2)
        .select(F.explode("occ").alias("o"))
        .select("o.doc_id", "o.pos", "o.pos_end")
    )
    wprev = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    spans = occ.select(
        "doc_id", "pos", "pos_end", F.max("pos_end").over(wprev).alias("prev_end")
    )
    contrib = F.greatest(
        F.lit(0),
        F.col("pos_end")
        - F.greatest(F.col("pos"), F.coalesce(F.col("prev_end"), F.lit(0)) + 1)
        + 1,
    )
    cov = spans.groupBy("doc_id").agg(
        F.sum(contrib).cast("long").alias("covered_tokens")
    )
    base = toks.select("doc_id", F.size("t").cast("long").alias("n_tokens"))
    return base.join(cov, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        F.coalesce(F.col("covered_tokens"), F.lit(0)).alias("covered_tokens"),
        F.round(
            F.coalesce(F.col("covered_tokens"), F.lit(0)).cast("double")
            / F.col("n_tokens"),
            6,
        ).alias("dup_span_frac"),
    )


# --------------------------------------------------------------------------
# x161 — Zipf rank-frequency slope of the corpus vocabulary
# --------------------------------------------------------------------------

_ZIPF_TOP = 1000

_ZIPF_ORACLE = f"""
WITH tf AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS f
  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
  GROUP BY w
),
ranked AS (
  SELECT f, ROW_NUMBER() OVER (ORDER BY f DESC, w) AS r
  FROM tf
),
u AS (
  SELECT CAST(ROUND(log2(CAST(r AS DOUBLE)) * 10000.0) AS BIGINT) AS ur,
         CAST(ROUND(log2(CAST(f AS DOUBLE)) * 10000.0) AS BIGINT) AS uf
  FROM ranked WHERE r <= {_ZIPF_TOP}
),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(ur) AS BIGINT) AS sur, CAST(SUM(uf) AS BIGINT) AS suf,
         CAST(SUM(ur * ur) AS BIGINT) AS sur2,
         CAST(SUM(ur * uf) AS BIGINT) AS suruf
  FROM u
)
SELECT n AS n_terms,
       ROUND(CAST(n * suruf - sur * suf AS DOUBLE)
             / CAST(n * sur2 - sur * sur AS DOUBLE), 6) AS zipf_slope,
       ROUND(((CAST(suf AS DOUBLE)
               - ((CAST(n * suruf - sur * suf AS DOUBLE)
                   / CAST(n * sur2 - sur * sur AS DOUBLE)) * sur)) / n)
             / 10000.0, 6) AS log2_intercept
FROM s
"""


@register("text_zipf_slope", oracle=_ZIPF_ORACLE)
def text_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x161: ZIPF rank-frequency fit — least-squares slope of
    log2(frequency) on log2(rank) over the top-{_ZIPF_TOP} vocabulary
    terms. Natural corpora fit slope ≈ −1; a much flatter slope is the
    fingerprint of synthetic/templated text (this synthetic vocab is
    near-uniform — exactly what the diagnostic is for), a steeper one of
    heavy boilerplate. The corpus-level companion to x130's coverage
    curve and x113's source entropy.

    Fixed-point discipline: both logs are pinned to integer 1e4-units
    (trap #18), the regression reduces to five exact BIGINT sums, and the
    slope is a ratio of integer-differences — the 1e4 units CANCEL in the
    slope, so no unit correction appears; the intercept divides out once.
    Rank ties break on the token string, pinned in both spellings.

    100 TB: token-count agg collapses map-side to |vocab|; the rank
    window and regression run on the top-{_ZIPF_TOP} table. The top-k
    rank over |vocab| is WindowGroupLimit-pruned, not a full sort."""
    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("f"))
    )
    wr = Window.orderBy(F.col("f").desc(), "w")
    ranked = tf.withColumn("r", F.row_number().over(wr)).filter(
        F.col("r") <= _ZIPF_TOP
    )
    u = ranked.select(
        F.round(F.log2(F.col("r").cast("double")) * 10000.0).cast("long").alias("ur"),
        F.round(F.log2(F.col("f").cast("double")) * 10000.0).cast("long").alias("uf"),
    )
    s = u.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("ur").cast("long").alias("sur"),
        F.sum("uf").cast("long").alias("suf"),
        F.sum(F.col("ur") * F.col("ur")).cast("long").alias("sur2"),
        F.sum(F.col("ur") * F.col("uf")).cast("long").alias("suruf"),
    )
    num = (F.col("n") * F.col("suruf") - F.col("sur") * F.col("suf")).cast("double")
    den = (F.col("n") * F.col("sur2") - F.col("sur") * F.col("sur")).cast("double")
    slope = num / den
    return s.select(
        F.col("n").alias("n_terms"),
        F.round(slope, 6).alias("zipf_slope"),
        F.round(
            ((F.col("suf").cast("double") - (slope * F.col("sur"))) / F.col("n"))
            / 10000.0,
            6,
        ).alias("log2_intercept"),
    )


# --------------------------------------------------------------------------
# x172 — language-ID confusion matrix (declared vs predicted)
# --------------------------------------------------------------------------

_CONFUSION_ORACLE = f"""
WITH l AS ({_langid_sql()})
SELECT actual_lang, pred_lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND(CAST(COUNT(*) AS DOUBLE)
             / SUM(COUNT(*)) OVER (PARTITION BY actual_lang), 6) AS row_frac
FROM l GROUP BY actual_lang, pred_lang
"""


@register("lang_confusion_matrix", oracle=_CONFUSION_ORACLE)
def lang_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x172: language-ID CONFUSION MATRIX — declared lang × predicted lang
    (x8's stopword-voting classifier) with per-declared-row fractions: the
    evaluation harness for the classifier itself AND the metadata-trust
    audit (a heavy en→und row means short docs defeat stopword voting; a
    de→en row means the declared labels are dirty — x44's curation gate
    needs to know which). Composes x8 as a subroutine — same expression,
    same tie-break, shared constants.

    100 TB: x8's scoring is a narrow map; the matrix agg collapses
    map-side to ≤ (|langs|+1)² cells; the row-fraction window runs on
    that tiny matrix."""
    l = text_langid(spark, sf_dir)
    g = l.groupBy("actual_lang", "pred_lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    wrow = Window.partitionBy("actual_lang")
    return g.select(
        "actual_lang",
        "pred_lang",
        "n_docs",
        F.round(
            F.col("n_docs").cast("double") / F.sum("n_docs").over(wrow), 6
        ).alias("row_frac"),
    )


# --------------------------------------------------------------------------
# x173 — hapax rate / lexical richness per source
# --------------------------------------------------------------------------

_HAPAX_ORACLE = """
WITH tok AS (
  SELECT source, unnest(string_split(text, ' ')) AS w FROM documents
),
tf AS (
  SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c
  FROM tok GROUP BY source, w
)
SELECT source,
       CAST(SUM(c) AS BIGINT) AS n_tokens,
       CAST(COUNT(*) AS BIGINT) AS vocab_size,
       CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
       ROUND(CAST(COUNT(*) AS DOUBLE) / SUM(c), 6) AS type_token_ratio,
       ROUND(CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS hapax_rate
FROM tf GROUP BY source
"""


@register("text_hapax_rate", oracle=_HAPAX_ORACLE)
def text_hapax_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x173: HAPAX rate + type-token ratio per source — the fraction of a
    source's vocabulary occurring exactly once, and vocab/tokens: the
    lexical-richness fingerprint next to x161's Zipf slope. Natural text
    runs ~40-60 % hapax; near-zero screams templated generation, near-one
    screams OCR noise or binary spill — both are curation signals x44
    cannot see from doc-level stats.

    All-integer counts and two exact ratios per source.

    100 TB: (source, token) agg partial-aggregates map-side; the richness
    agg runs at |sources| × |vocab| grain collapsing to |sources| rows.
    TTR is length-biased across very different source sizes — compare at
    matched token budgets (x48's sampler) when that matters."""
    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select("source", F.explode(F.split("text", " ")).alias("w"))
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    return tf.groupBy("source").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("vocab_size"),
        F.sum((F.col("c") == 1).cast("int")).cast("long").alias("n_hapax"),
        F.round(F.count(F.lit(1)).cast("double") / F.sum("c"), 6).alias(
            "type_token_ratio"
        ),
        F.round(
            F.sum((F.col("c") == 1).cast("int")).cast("double") / F.count(F.lit(1)),
            6,
        ).alias("hapax_rate"),
    )


# --------------------------------------------------------------------------
# x192 — BPE tokenizer training (the merge-table loop, distributed)
# --------------------------------------------------------------------------

_BPE_MERGES = 10
_EOW = "</w>"  # end-of-word marker, per the original BPE formulation


@register("tokenizer_bpe_train", oracle=None)  # iterative re-tokenization is
# not SQL-expressible (each round's pair counts depend on the previous
# round's merges applied to every word); rows-only by declaration, verified
# by an exact Python replay of the classical algorithm incl. tie-breaks.
def tokenizer_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x192: BYTE-PAIR-ENCODING tokenizer training (Sennrich et al., ACL
    2016) — the canonical LLM-tokenizer loop, distributed: compress the
    corpus to a (word, freq) table, then {_BPE_MERGES} rounds of [count
    adjacent symbol pairs weighted by word freq → take the most frequent
    pair (ties: lexicographic) → greedily merge it left-to-right inside
    every word]. Output is the merge table (round, left, right, merged,
    pair_count) — the artifact a tokenizer ships.

    Every round is fully distributed: pair counts via zip_with over each
    word's current symbol array + one hash agg; the winning pair is ONE
    driver-collected row per round (bounded, like x63's n_nodes scalar);
    the merge-apply is a Catalyst aggregate() fold — left-greedy adjacent
    replacement, no Python in the loop. localCheckpoint per round cuts
    lineage (trap #8).

    100 TB: the word-freq compression is the big win (web corpora have
    ~1e8 unique words vs 1e12 tokens — the pair counting runs on the
    SMALL table); real trainers batch multiple merges per sweep once
    counts stabilize — same plan shape, fewer rounds; vocab-size runs
    need ~30k rounds of this loop, which is where the batching matters."""
    docs = load_table(spark, sf_dir, "documents")
    words = (
        docs.select(
            F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("w")
        )
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
        .select(
            F.concat(
                F.split(F.col("w"), ""), F.array(F.lit(_EOW))
            ).alias("syms"),
            "freq",
        )
        .localCheckpoint()
    )
    merges = []
    for rnd in range(1, _BPE_MERGES + 1):
        n = F.size("syms")
        pairs = words.select(
            F.explode(
                F.zip_with(
                    F.slice("syms", 1, n - 1),
                    F.slice("syms", 2, n - 1),
                    lambda a, b: F.struct(a.alias("l"), b.alias("r")),
                )
            ).alias("p"),
            "freq",
        )
        top = (
            pairs.groupBy("p")
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("p.l"), F.col("p.r"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        left, right, cnt = top[0].p.l, top[0].p.r, top[0].cnt
        merged = left + right
        merges.append((rnd, left, right, merged, int(cnt)))
        # left-greedy adjacent merge as a Catalyst fold: append each symbol,
        # collapsing it into the accumulator tail when (tail, sym) == pair
        fold = F.aggregate(
            "syms",
            F.array().cast("array<string>"),
            lambda acc, x: F.when(
                (F.size(acc) > 0)
                & (F.element_at(acc, -1) == F.lit(left))
                & (x == F.lit(right)),
                F.concat(
                    F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
                ),
            ).otherwise(F.concat(acc, F.array(x))),
        )
        words = words.select(fold.alias("syms"), "freq").localCheckpoint()
    return spark.createDataFrame(
        merges, "rnd long, left string, right string, merged string, pair_count long"
    )


# --------------------------------------------------------------------------
# x198 — near-dup EVIDENCE PANEL (jaccard + containment + overlap, one pass)
# --------------------------------------------------------------------------

_EVIDENCE_MIN_COMMON = 3  # integer gate: a float threshold can never flip it

_EVIDENCE_ORACLE = """
WITH sh AS (
  SELECT doc_id, source,
         list_distinct(list_transform(
           generate_series(1, greatest(len(string_split(text, ' ')) - 2, 1)),
           i -> string_split(text, ' ')[i] || ' ' ||
                coalesce(string_split(text, ' ')[i+1], '') || ' ' ||
                coalesce(string_split(text, ' ')[i+2], ''))) AS shingles
  FROM documents
),
flat AS (SELECT doc_id, source, len(shingles) AS n_sh, unnest(shingles) AS s FROM sh),
hot AS (SELECT s FROM flat GROUP BY s HAVING COUNT(*) > 256),
pruned AS (SELECT * FROM flat WHERE s NOT IN (SELECT s FROM hot)),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.n_sh AS na, b.n_sh AS nb, CAST(COUNT(*) AS BIGINT) AS n_common
  FROM pruned a JOIN pruned b
    ON a.s = b.s AND a.source = b.source AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id, a.n_sh, b.n_sh
)
SELECT doc_a, doc_b, n_common,
       CAST(na AS BIGINT) AS na, CAST(nb AS BIGINT) AS nb,
       ROUND(n_common * 1.0 / (na + nb - n_common), 6) AS jaccard,
       ROUND(n_common * 1.0 / na, 6) AS containment_a,
       ROUND(n_common * 1.0 / nb, 6) AS containment_b,
       ROUND(n_common * 1.0 / least(na, nb), 6) AS overlap
FROM inter WHERE n_common >= 3
"""


@register("dedup_evidence_panel", oracle=_EVIDENCE_ORACLE)
def dedup_evidence_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x198: near-dup EVIDENCE PANEL — for every candidate pair with ≥
    {_EVIDENCE_MIN_COMMON} shared shingles, ALL the set-similarity signals
    a dedup decision review needs in one pass: jaccard (symmetric),
    containment both directions (ASYMMETRIC — the quote-inclusion case
    jaccard under-scores: a tweet quoted inside an article has
    containment_a ≈ 1 with tiny jaccard), and the overlap coefficient
    (containment against the smaller doc). x7 emits the jaccard DECISION;
    this row emits the evidence behind it — the audit table a human (or
    the x72 keep-best resolver) reads before tuning thresholds.

    The pair gate is the INTEGER n_common ≥ {_EVIDENCE_MIN_COMMON} —
    every ratio is display-only, so no float threshold can flip row
    membership. Candidate generation is byte-shared with x7
    (_shingle_pair_counts): same df-capped bucket emission, same two
    shuffles; the panel adds zero scans."""
    inter = _shingle_pair_counts(spark, sf_dir)
    c = F.col("n_common").cast("double")
    return inter.filter(F.col("n_common") >= _EVIDENCE_MIN_COMMON).select(
        "doc_a",
        "doc_b",
        F.col("n_common").cast("long").alias("n_common"),
        F.col("na").cast("long").alias("na"),
        F.col("nb").cast("long").alias("nb"),
        F.round(c / (F.col("na") + F.col("nb") - F.col("n_common")), 6).alias(
            "jaccard"
        ),
        F.round(c / F.col("na"), 6).alias("containment_a"),
        F.round(c / F.col("nb"), 6).alias("containment_b"),
        F.round(c / F.least("na", "nb"), 6).alias("overlap"),
    )


# --------------------------------------------------------------------------
# x227 — token burstiness / index of dispersion (corpus statistics)
# --------------------------------------------------------------------------

_BURST_MIN_TF = 50

_BURST_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
),
per_doc AS (
  SELECT token, doc_id, COUNT(*) AS c FROM tok GROUP BY token, doc_id
),
nd AS (SELECT COUNT(*) AS n FROM documents),
agg AS (
  SELECT token,
         COUNT(*) AS n_docs,
         SUM(c) AS total,
         SUM(c * c) AS sum_sq
  FROM per_doc GROUP BY token
)
SELECT token, CAST(n_docs AS BIGINT) AS n_docs, CAST(total AS BIGINT) AS total,
       ROUND(CAST((SELECT n FROM nd) * sum_sq - total * total AS DOUBLE)
             / ((SELECT n FROM nd) * total), 6) AS dispersion,
       ROUND(CAST(((SELECT n FROM nd) * sum_sq - total * total)
                  - (SELECT n FROM nd) * total AS DOUBLE)
             / (((SELECT n FROM nd) * sum_sq - total * total)
                + (SELECT n FROM nd) * total), 6) AS burstiness
FROM agg
WHERE total >= {_BURST_MIN_TF}
"""


@register("text_burstiness", oracle=_BURST_ORACLE)
def text_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x227: token BURSTINESS — the variance-to-mean (index of dispersion)
    of each token's per-document count over ALL corpus documents, plus the
    bounded Church-Gale burstiness score (D-1)/(D+1). Content words clump
    (one doc mentions them many times: D >> 1); function words spread
    (D ≈ 1, Poisson-like) — the corpus diagnostic separating topical terms
    from glue, complementary to x161's Zipf slope and x173's hapax rate.

    Exactness device: with per-doc counts c (zeros implicit), N docs,
    T = Σc, S = Σc², dispersion = var/mean = (N·S - T²)/(N·T) and
    burstiness = ((N·S - T²) - N·T)/((N·S - T²) + N·T) — both ONE float
    division of EXACT BIGINT products, so no summation-order exposure at
    all (the naive E[x²]-µ² spelling would ride float accumulation on both
    engines). Zero-count docs contribute nothing to S or T, so the
    all-docs moments come free from the nonzero grain.

    100 TB: explode -> (token, doc) partial-agg -> token agg, the x4 tf
    shape with map-side combine absorbing stopword skew; N is one
    metadata-cheap scalar. The >= {_BURST_MIN_TF}-occurrence floor keeps
    the report on the statistically meaningful vocabulary."""
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    per_doc = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token", "doc_id")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    agg = per_doc.groupBy("token").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("c").cast("long").alias("total"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("sum_sq"),
    )
    num = n_docs * F.col("sum_sq") - F.col("total") * F.col("total")
    den = n_docs * F.col("total")
    return agg.filter(F.col("total") >= _BURST_MIN_TF).select(
        "token",
        "n_docs",
        "total",
        F.round(num.cast("double") / den, 6).alias("dispersion"),
        F.round((num - den).cast("double") / (num + den), 6).alias("burstiness"),
    )


# --------------------------------------------------------------------------
# x228 — byte-entropy triage over binary payloads
# --------------------------------------------------------------------------

_ENTROPY_ORACLE = """
WITH chars AS (
  SELECT doc_id, substr(text, g.i, 1) AS ch
  FROM documents, UNNEST(generate_series(1, length(text))) AS g(i)
),
hist AS (SELECT doc_id, ch, COUNT(*) AS c FROM chars GROUP BY doc_id, ch),
docn AS (SELECT doc_id, SUM(c) AS n FROM hist GROUP BY doc_id),
terms AS (
  SELECT h.doc_id,
         CAST(ROUND(-ROUND(CAST(h.c AS DOUBLE) / d.n, 6)
                    * log2(ROUND(CAST(h.c AS DOUBLE) / d.n, 6))
                    * 1000000) AS BIGINT) AS t_u
  FROM hist h JOIN docn d USING (doc_id)
)
SELECT d.doc_id,
       CAST(d.n AS BIGINT) AS n_bytes,
       CAST(COUNT(*) AS BIGINT) AS n_distinct,
       ROUND(CAST(SUM(t.t_u) AS DOUBLE) / 1000000, 6) AS entropy_bits
FROM terms t
JOIN docn d ON t.doc_id = d.doc_id
GROUP BY d.doc_id, d.n
"""


@register("mm_payload_entropy", oracle=_ENTROPY_ORACLE)
def mm_payload_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x228: BYTE-ENTROPY triage over an opaque binary column — the
    first-pass classifier every blob-lake pipeline runs before decode
    (x218-x220 siblings): Shannon entropy of the byte histogram separates
    plaintext (~4-4.5 bits) from structured binary from compressed/
    encrypted payloads (~8 bits), with n_distinct as the cheap second
    feature. Payload here is the document's UTF-8 byte stream (the
    sandbox's only real bytes), so DuckDB can replay the SAME histogram
    from the string side and the oracle is a true cross-engine check, not
    an arithmetic twin.

    Python side is Arrow-batched numpy (np.bincount over a frombuffer
    view — one vectorized pass per payload, no per-byte Python). The
    micro-unit device (x113): p pins to 6dp, each -p·log2(p) term rounds
    HALF-UP to an integer micro-bit (np.floor(x*1e6+0.5) — numpy's own
    round() is banker's and would diverge from Spark/DuckDB ROUND), the
    per-doc sum is exact integers, display division last.

    100 TB: decode stage sees (doc_id, payload) only; one Arrow pass per
    partition, output is 4 atomic columns per blob regardless of blob
    size. Entropy of a 100 MB blob is the same 256-bin reduce — bounded
    state per row."""
    import numpy as np  # noqa: PLC0415
    import pandas as pd  # noqa: PLC0415

    docs = load_table(spark, sf_dir, "documents")
    blobs = docs.select("doc_id", F.encode("text", "UTF-8").alias("payload"))

    def entropy(batches):
        for pdf in batches:
            n_bytes, n_distinct, ent = [], [], []
            for buf in pdf["payload"]:
                arr = np.frombuffer(bytes(buf), dtype=np.uint8)
                c = np.bincount(arr, minlength=256)
                c = c[c > 0]
                n = int(arr.size)
                p = np.floor(c / n * 1e6 + 0.5) / 1e6  # ROUND(p, 6), half-up
                t_u = np.floor(-p * np.log2(p) * 1e6 + 0.5).astype(np.int64)
                n_bytes.append(n)
                n_distinct.append(int(c.size))
                ent.append(round(int(t_u.sum()) / 1e6, 6))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pd.array(n_bytes, dtype="int64"),
                    "n_distinct": pd.array(n_distinct, dtype="int64"),
                    "entropy_bits": pd.array(ent, dtype="float64"),
                }
            )

    return blobs.mapInPandas(
        entropy,
        schema="doc_id long, n_bytes long, n_distinct long, entropy_bits double",
    )


# --------------------------------------------------------------------------
# x234 — ustar (tar) archive member walk over binary payloads
# --------------------------------------------------------------------------


def mm_parse_tar_members(buf):
    """Walk a POSIX ustar archive: 512-byte header blocks (name@0:100,
    size@124:12 as NUL/space-terminated OCTAL, typeflag@156, magic
    'ustar' @257), each followed by the member data padded up to a
    512-byte boundary; the archive ends with two all-zero blocks. Pure
    public file-format knowledge — this is the container WebDataset-style
    multimodal training shards actually use.

    Returns (n_members, total_data_bytes, second_data_offset,
    end_marker_offset); (0, 0, None, None) for non-tar payloads. The
    walk advances by DECLARED sizes only — a member whose data embeds
    'ustar' decoy bytes never desyncs it (same argument as x218's JPEG
    segment walk vs marker-grepping)."""
    if buf is None or len(buf) < 1024:
        return (0, 0, None, None)
    n_members = 0
    total = 0
    second_off = None
    o = 0
    while o + 512 <= len(buf):
        block = bytes(buf[o : o + 512])
        if block.count(0) == 512:
            return (n_members, total, second_off, o)
        if block[257:262] != b"ustar":
            return (0, 0, None, None)
        field = block[124:136].split(b"\x00")[0].strip(b" ")
        try:
            size = int(field, 8)
        except ValueError:
            return (0, 0, None, None)
        n_members += 1
        total += size
        if n_members == 2:
            second_off = o + 512
        o += 512 + ((size + 511) // 512) * 512
    return (n_members, total, second_off, None)


_TAR_ORACLE = """
-- sizes are UTF-8 OCTET lengths of what the builder actually writes
-- (encode(text) and encode(substring(text,1,40))), not n_chars: FIXTURES.md
-- warns n_chars may differ from byte length, and any non-ASCII text would
-- otherwise desync the declared size from the written payload (r7 advisor
-- note). substring is char-based in both engines; byte length is taken
-- after encoding, so the closed forms match the builder exactly.
WITH sized AS (
  SELECT doc_id,
         octet_length(encode(text)) AS b1,
         octet_length(encode(substring(text, 1, 40))) AS b2
  FROM documents
)
SELECT doc_id,
       CAST(2 AS BIGINT) AS n_members,
       CAST(b1 + b2 AS BIGINT) AS total_data_bytes,
       CAST(512 + ((b1 + 511) // 512) * 512 + 512 AS BIGINT)
         AS second_data_offset,
       CAST(512 + ((b1 + 511) // 512) * 512 + 512
            + ((b2 + 511) // 512) * 512 AS BIGINT)
         AS end_marker_offset
FROM sized
"""


@register("mm_tar_members", oracle=_TAR_ORACLE)
def mm_tar_members(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x234: TAR-SHARD member walk — the container decode for
    WebDataset-style multimodal training shards (a 100 TB image/audio
    corpus ships as tar shards of paired members, not loose files). Each
    doc becomes a structurally-valid 2-member POSIX ustar archive built
    JVM-side (full text as doc{id}.txt + a 40-byte .meta sibling, real
    octal size fields, magic/version, 512-padding, double zero-block end
    marker), and the Arrow-batched parser walks it back by declared
    sizes. The checksum field is left as spaces (disclosed: the parser
    family validates magic + octal structure; stdlib-generated archives
    with real checksums are covered by the tarfile fixture test, which
    pins this walker against Python's own tar writer).

    Oracle is the x218-style arithmetic twin: every output is closed-form
    in the UTF-8 octet lengths of the written members (offsets are
    512-block arithmetic), so DuckDB checks the walk's arithmetic without
    parsing bytes.

    100 TB: (doc_id, payload)-only mapInPandas; the walk reads 512 bytes
    per member header and SKIPS data by arithmetic — listing a shard's
    members never streams the members themselves (the property that makes
    tar indexable at scale)."""
    import pandas as pd  # noqa: PLC0415

    docs = load_table(spark, sf_dir, "documents")
    nul = lambda n: F.unhex(F.repeat(F.lit("00"), n))  # noqa: E731

    def octal12(col):
        return F.concat(
            F.encode(F.lpad(F.conv(col.cast("string"), 10, 8), 11, "0"), "UTF-8"),
            nul(1),
        )

    def header(name_col, size_col):
        return F.concat(
            F.encode(F.rpad(name_col, 100, "\x00"), "UTF-8"),
            F.encode(F.lit("0000644"), "UTF-8"), nul(1),
            F.encode(F.lit("0000000"), "UTF-8"), nul(1),
            F.encode(F.lit("0000000"), "UTF-8"), nul(1),
            octal12(size_col),
            F.encode(F.lit("00000000000"), "UTF-8"), nul(1),
            F.encode(F.lit("        "), "UTF-8"),  # chksum: spaces (disclosed)
            F.encode(F.lit("0"), "UTF-8"),
            nul(100),
            F.encode(F.lit("ustar"), "UTF-8"), nul(1),
            F.encode(F.lit("00"), "UTF-8"),
            nul(32), nul(32), nul(8), nul(8), nul(155), nul(12),
        )

    def pad_to_block(data_col, size_col):
        # pad data up to the next 512 boundary with NULs; pmod, not `%` —
        # Spark's `%` keeps the dividend's sign, and a negative repeat
        # count silently yields an empty pad (walker desync)
        pad_len = F.pmod(F.lit(512) - F.pmod(size_col, F.lit(512)), F.lit(512))
        return F.concat(data_col, F.unhex(F.repeat(F.lit("00"), pad_len)))

    # declared sizes = UTF-8 byte lengths of the written payloads (NOT
    # n_chars — a multi-byte char would desync the walker; r7 advisor note)
    size1 = F.octet_length("text").cast("int")
    size2 = F.octet_length(F.substring("text", 1, 40)).cast("int")
    name1 = F.concat(F.lit("doc"), F.col("doc_id").cast("string"), F.lit(".txt"))
    name2 = F.concat(F.lit("doc"), F.col("doc_id").cast("string"), F.lit(".meta"))
    payload = F.concat(
        header(name1, size1),
        pad_to_block(F.encode(F.col("text"), "UTF-8"), size1),
        header(name2, size2),
        pad_to_block(F.encode(F.substring("text", 1, 40), "UTF-8"), size2),
        nul(512), nul(512),
    )
    blobs = docs.select("doc_id", payload.alias("payload"))

    def walk(batches):
        for pdf in batches:
            parsed = [mm_parse_tar_members(b) for b in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_members": pd.array([p[0] for p in parsed], dtype="int64"),
                    "total_data_bytes": pd.array(
                        [p[1] for p in parsed], dtype="int64"
                    ),
                    "second_data_offset": pd.array(
                        [p[2] for p in parsed], dtype="Int64"
                    ),
                    "end_marker_offset": pd.array(
                        [p[3] for p in parsed], dtype="Int64"
                    ),
                }
            )

    return blobs.mapInPandas(
        walk,
        schema=(
            "doc_id long, n_members long, total_data_bytes long, "
            "second_data_offset long, end_marker_offset long"
        ),
    )


# --------------------------------------------------------------------------
# x235 — simhash band-candidate calibration curve (threshold tuning)
# --------------------------------------------------------------------------

_SH_CALIB_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
),
h AS (
  SELECT doc_id,
         ('0x' || substring(md5(token), 1, 12))::BIGINT AS th
  FROM tok
),
bits AS (
  SELECT doc_id, b,
         SUM(CASE WHEN (th >> b) & 1 = 1 THEN 1 ELSE -1 END) AS s
  FROM h CROSS JOIN (SELECT unnest(generate_series(0, 47)) AS b)
  GROUP BY doc_id, b
),
sh AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN s > 0 THEN (1::BIGINT << b) ELSE 0 END) AS BIGINT)
           AS simhash48
  FROM bits GROUP BY doc_id
),
bands AS (
  SELECT doc_id, simhash48, band,
         (simhash48 >> ({_SH_BAND_BITS} * band)) & {(1 << _SH_BAND_BITS) - 1}
           AS bv
  FROM sh CROSS JOIN (SELECT unnest(generate_series(0, {_SH_BANDS - 1})) AS band)
),
ok AS (
  SELECT band, bv FROM bands GROUP BY band, bv
  HAVING COUNT(*) BETWEEN 2 AND {_SH_BUCKET_CAP}
),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, c.doc_id AS doc_b,
         a.simhash48 AS ha, c.simhash48 AS hb
  FROM bands a
  JOIN ok ON a.band = ok.band AND a.bv = ok.bv
  JOIN bands c ON c.band = ok.band AND c.bv = ok.bv AND a.doc_id < c.doc_id
),
hist AS (
  SELECT CAST(bit_count(xor(ha, hb)) AS INTEGER) AS hamming,
         COUNT(*) AS n_pairs
  FROM pairs GROUP BY bit_count(xor(ha, hb))
)
SELECT hamming, CAST(n_pairs AS BIGINT) AS n_pairs,
       ROUND(1 - CAST(hamming AS DOUBLE) / 48, 6) AS sim_est,
       CAST(CASE WHEN hamming <= {_SH_MAX_HAMMING} THEN 1 ELSE 0 END AS INTEGER)
         AS would_pass,
       CAST(SUM(n_pairs) OVER (ORDER BY hamming
                               ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS cum_pairs
FROM hist
"""


@register("dedup_simhash_calibration", oracle=_SH_CALIB_ORACLE)
def dedup_simhash_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x235: THRESHOLD CALIBRATION for the simhash near-dup stage — the
    Hamming-distance histogram over ALL band candidates (x64 with the
    verify threshold removed): n_pairs and cumulative pairs per distance,
    the implied cosine-ish similarity 1 - d/48, and whether x64's current
    τ={_SH_MAX_HAMMING} would pass each bucket. THIS is how the threshold
    gets chosen in practice — find the valley between the near-dup mode
    and the random-collision mode (E[d] = 24 for unrelated docs) and set
    τ below it; shipping a dedup stage without this curve means τ is
    folklore.

    Same banding/caps/candidate plan as x64 (one groupBy + bounded
    double-explode); the histogram collapses candidates to ≤ 49 rows, so
    the calibration adds ONE map-combined agg + a 49-row window to the
    pipeline it tunes.

    100 TB: identical to x64's bounds — the curve is computable on the
    same candidate volume the dedup itself pays, or on a hash-mod doc
    sample for a cheap preview (note: sampling UNDER-counts the near-dup
    mode exactly like l2's recall note)."""
    sh = dedup_simhash(spark, sf_dir)
    band_vals = F.explode_outer(
        F.expr(
            f"transform(sequence(0, {_SH_BANDS - 1}), band -> struct(band, "
            f"shiftright(simhash48, {_SH_BAND_BITS} * band) & {(1 << _SH_BAND_BITS) - 1} AS bv))"
        )
    )
    bands = sh.select("doc_id", "simhash48", band_vals.alias("bb")).select(
        "doc_id", "simhash48", "bb.band", "bb.bv"
    )
    buckets = (
        bands.groupBy("band", "bv")
        .agg(F.collect_list(F.struct("doc_id", "simhash48")).alias("docs"))
        .filter((F.size("docs") >= 2) & (F.size("docs") <= _SH_BUCKET_CAP))
    )
    pairs = (
        buckets.select(F.explode("docs").alias("a"), "docs")
        .select("a", F.explode("docs").alias("b"))
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash48").alias("ha"),
            F.col("b.simhash48").alias("hb"),
        )
        .distinct()
    )
    hist = (
        pairs.select(
            F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
            .cast("int")
            .alias("hamming")
        )
        .groupBy("hamming")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
    )
    w_cum = Window.orderBy("hamming").rowsBetween(Window.unboundedPreceding, 0)
    return hist.select(
        "hamming",
        "n_pairs",
        F.round(1 - F.col("hamming").cast("double") / 48, 6).alias("sim_est"),
        F.when(F.col("hamming") <= _SH_MAX_HAMMING, 1)
        .otherwise(0)
        .cast("int")
        .alias("would_pass"),
        F.sum("n_pairs").over(w_cum).cast("long").alias("cum_pairs"),
    )


# --------------------------------------------------------------------------
# x252 — Jensen-Shannon divergence matrix between source distributions
# --------------------------------------------------------------------------

_JSD_TOP_V = 200  # restrict to the top-V corpus vocabulary

_JSD_ORACLE = f"""
WITH tok AS (
  SELECT source, unnest(string_split(text, ' ')) AS token FROM documents
),
vocab AS MATERIALIZED (
  SELECT token FROM (
    SELECT token, COUNT(*) AS n,
           ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, token) AS r
    FROM tok GROUP BY token
  ) WHERE r <= {_JSD_TOP_V}
),
cnt AS (
  SELECT t.source, t.token, COUNT(*) AS c
  FROM tok t JOIN vocab v ON v.token = t.token
  GROUP BY t.source, t.token
),
dist AS MATERIALIZED (
  SELECT source, token,
         ROUND(CAST(c AS DOUBLE) / SUM(c) OVER (PARTITION BY source), 6) AS p
  FROM cnt
),
srcs AS (SELECT DISTINCT source FROM dist),
grid AS (
  -- explicit (pair x vocab) grid: a token one feed lacks still contributes
  -- its p bits to the divergence (an inner/full join keyed on token would
  -- silently drop the asymmetric-vocab terms)
  SELECT a.source AS src_a, b.source AS src_b, v.token
  FROM srcs a JOIN srcs b ON a.source < b.source, vocab v
),
pairs AS (
  SELECT g.src_a, g.src_b, g.token,
         COALESCE(da.p, 0) AS p, COALESCE(db.p, 0) AS q
  FROM grid g
  LEFT JOIN dist da ON da.source = g.src_a AND da.token = g.token
  LEFT JOIN dist db ON db.source = g.src_b AND db.token = g.token
),
st0 AS (
  SELECT src_a, src_b, p, q,
         CASE WHEN p > 0 THEN p / ((p + q) / 2) ELSE 1.0 END AS yp,
         CASE WHEN q > 0 THEN q / ((p + q) / 2) ELSE 1.0 END AS yq,
         0.0 AS ep, 0.0 AS eq_, 0.0 AS ap, 0.0 AS aq, 0.5 AS w
  FROM pairs
),
st1 AS (
  SELECT src_a, src_b, p, q,
         CASE WHEN yp < 1 THEN yp * 2 ELSE yp END AS yp,
         CASE WHEN yq < 1 THEN yq * 2 ELSE yq END AS yq,
         CASE WHEN yp < 1 THEN ep - 1 ELSE ep END AS ep,
         CASE WHEN yq < 1 THEN eq_ - 1 ELSE eq_ END AS eq_,
         ap, aq, w
  FROM st0
),
st2 AS (
  SELECT src_a, src_b, p, q,
         CASE WHEN yp < 1 THEN yp * 2 ELSE yp END AS yp,
         CASE WHEN yq < 1 THEN yq * 2 ELSE yq END AS yq,
         CASE WHEN yp < 1 THEN ep - 1 ELSE ep END AS ep,
         CASE WHEN yq < 1 THEN eq_ - 1 ELSE eq_ END AS eq_,
         ap, aq, w
  FROM st1
),
st3 AS (
  SELECT src_a, src_b, p, q,
         CASE WHEN yp < 1 THEN yp * 2 ELSE yp END AS yp,
         CASE WHEN yq < 1 THEN yq * 2 ELSE yq END AS yq,
         CASE WHEN yp < 1 THEN ep - 1 ELSE ep END AS ep,
         CASE WHEN yq < 1 THEN eq_ - 1 ELSE eq_ END AS eq_,
         ap, aq, w
  FROM st2
),
st4 AS (
  SELECT src_a, src_b, p, q,
         CASE WHEN yp < 1 THEN yp * 2 ELSE yp END AS yp,
         CASE WHEN yq < 1 THEN yq * 2 ELSE yq END AS yq,
         CASE WHEN yp < 1 THEN ep - 1 ELSE ep END AS ep,
         CASE WHEN yq < 1 THEN eq_ - 1 ELSE eq_ END AS eq_,
         ap, aq, w
  FROM st3
),
st5 AS (
  SELECT src_a, src_b, p, q,
         CASE WHEN yp < 1 THEN yp * 2 ELSE yp END AS yp,
         CASE WHEN yq < 1 THEN yq * 2 ELSE yq END AS yq,
         CASE WHEN yp < 1 THEN ep - 1 ELSE ep END AS ep,
         CASE WHEN yq < 1 THEN eq_ - 1 ELSE eq_ END AS eq_,
         ap, aq, w
  FROM st4
),
st6 AS (
  SELECT src_a, src_b, p, q,
         CASE WHEN yp < 1 THEN yp * 2 ELSE yp END AS yp,
         CASE WHEN yq < 1 THEN yq * 2 ELSE yq END AS yq,
         CASE WHEN yp < 1 THEN ep - 1 ELSE ep END AS ep,
         CASE WHEN yq < 1 THEN eq_ - 1 ELSE eq_ END AS eq_,
         ap, aq, w
  FROM st5
),
st7 AS (
  SELECT src_a, src_b, p, q,
         CASE WHEN yp < 1 THEN yp * 2 ELSE yp END AS yp,
         CASE WHEN yq < 1 THEN yq * 2 ELSE yq END AS yq,
         CASE WHEN yp < 1 THEN ep - 1 ELSE ep END AS ep,
         CASE WHEN yq < 1 THEN eq_ - 1 ELSE eq_ END AS eq_,
         ap, aq, w
  FROM st6
),
st8 AS (
  SELECT src_a, src_b, p, q,
         CASE WHEN yp < 1 THEN yp * 2 ELSE yp END AS yp,
         CASE WHEN yq < 1 THEN yq * 2 ELSE yq END AS yq,
         CASE WHEN yp < 1 THEN ep - 1 ELSE ep END AS ep,
         CASE WHEN yq < 1 THEN eq_ - 1 ELSE eq_ END AS eq_,
         ap, aq, w
  FROM st7
),
st9 AS (
  SELECT src_a, src_b, p, q,
         CASE WHEN yp < 1 THEN yp * 2 ELSE yp END AS yp,
         CASE WHEN yq < 1 THEN yq * 2 ELSE yq END AS yq,
         CASE WHEN yp < 1 THEN ep - 1 ELSE ep END AS ep,
         CASE WHEN yq < 1 THEN eq_ - 1 ELSE eq_ END AS eq_,
         ap, aq, w
  FROM st8
),
st10 AS (
  SELECT src_a, src_b, p, q,
         CASE WHEN yp < 1 THEN yp * 2 ELSE yp END AS yp,
         CASE WHEN yq < 1 THEN yq * 2 ELSE yq END AS yq,
         CASE WHEN yp < 1 THEN ep - 1 ELSE ep END AS ep,
         CASE WHEN yq < 1 THEN eq_ - 1 ELSE eq_ END AS eq_,
         ap, aq, w
  FROM st9
),
st11 AS (
  SELECT src_a, src_b, p, q,
         CASE WHEN yp < 1 THEN yp * 2 ELSE yp END AS yp,
         CASE WHEN yq < 1 THEN yq * 2 ELSE yq END AS yq,
         CASE WHEN yp < 1 THEN ep - 1 ELSE ep END AS ep,
         CASE WHEN yq < 1 THEN eq_ - 1 ELSE eq_ END AS eq_,
         ap, aq, w
  FROM st10
),
st12 AS (
  SELECT src_a, src_b, p, q,
         CASE WHEN yp < 1 THEN yp * 2 ELSE yp END AS yp,
         CASE WHEN yq < 1 THEN yq * 2 ELSE yq END AS yq,
         CASE WHEN yp < 1 THEN ep - 1 ELSE ep END AS ep,
         CASE WHEN yq < 1 THEN eq_ - 1 ELSE eq_ END AS eq_,
         ap, aq, w
  FROM st11
),
st13 AS (
  SELECT src_a, src_b, p, q,
         CASE WHEN yp < 1 THEN yp * 2 ELSE yp END AS yp,
         CASE WHEN yq < 1 THEN yq * 2 ELSE yq END AS yq,
         CASE WHEN yp < 1 THEN ep - 1 ELSE ep END AS ep,
         CASE WHEN yq < 1 THEN eq_ - 1 ELSE eq_ END AS eq_,
         ap, aq, w
  FROM st12
),
st14 AS (
  SELECT src_a, src_b, p, q,
         CASE WHEN yp < 1 THEN yp * 2 ELSE yp END AS yp,
         CASE WHEN yq < 1 THEN yq * 2 ELSE yq END AS yq,
         CASE WHEN yp < 1 THEN ep - 1 ELSE ep END AS ep,
         CASE WHEN yq < 1 THEN eq_ - 1 ELSE eq_ END AS eq_,
         ap, aq, w
  FROM st13
),
st15 AS (
  SELECT src_a, src_b, p, q,
         CASE WHEN yp < 1 THEN yp * 2 ELSE yp END AS yp,
         CASE WHEN yq < 1 THEN yq * 2 ELSE yq END AS yq,
         CASE WHEN yp < 1 THEN ep - 1 ELSE ep END AS ep,
         CASE WHEN yq < 1 THEN eq_ - 1 ELSE eq_ END AS eq_,
         ap, aq, w
  FROM st14
),
st16 AS (
  SELECT src_a, src_b, p, q,
         CASE WHEN yp < 1 THEN yp * 2 ELSE yp END AS yp,
         CASE WHEN yq < 1 THEN yq * 2 ELSE yq END AS yq,
         CASE WHEN yp < 1 THEN ep - 1 ELSE ep END AS ep,
         CASE WHEN yq < 1 THEN eq_ - 1 ELSE eq_ END AS eq_,
         ap, aq, w
  FROM st15
),
st17 AS (
  SELECT src_a, src_b, p, q,
         CASE WHEN yp < 1 THEN yp * 2 ELSE yp END AS yp,
         CASE WHEN yq < 1 THEN yq * 2 ELSE yq END AS yq,
         CASE WHEN yp < 1 THEN ep - 1 ELSE ep END AS ep,
         CASE WHEN yq < 1 THEN eq_ - 1 ELSE eq_ END AS eq_,
         ap, aq, w
  FROM st16
),
st18 AS (
  SELECT src_a, src_b, p, q,
         CASE WHEN yp < 1 THEN yp * 2 ELSE yp END AS yp,
         CASE WHEN yq < 1 THEN yq * 2 ELSE yq END AS yq,
         CASE WHEN yp < 1 THEN ep - 1 ELSE ep END AS ep,
         CASE WHEN yq < 1 THEN eq_ - 1 ELSE eq_ END AS eq_,
         ap, aq, w
  FROM st17
),
st19 AS (
  SELECT src_a, src_b, p, q,
         CASE WHEN yp < 1 THEN yp * 2 ELSE yp END AS yp,
         CASE WHEN yq < 1 THEN yq * 2 ELSE yq END AS yq,
         CASE WHEN yp < 1 THEN ep - 1 ELSE ep END AS ep,
         CASE WHEN yq < 1 THEN eq_ - 1 ELSE eq_ END AS eq_,
         ap, aq, w
  FROM st18
),
st20 AS (
  SELECT src_a, src_b, p, q,
         CASE WHEN yp < 1 THEN yp * 2 ELSE yp END AS yp,
         CASE WHEN yq < 1 THEN yq * 2 ELSE yq END AS yq,
         CASE WHEN yp < 1 THEN ep - 1 ELSE ep END AS ep,
         CASE WHEN yq < 1 THEN eq_ - 1 ELSE eq_ END AS eq_,
         ap, aq, w
  FROM st19
),
st21 AS (
  SELECT src_a, src_b, p, q,
         CASE WHEN yp < 1 THEN yp * 2 ELSE yp END AS yp,
         CASE WHEN yq < 1 THEN yq * 2 ELSE yq END AS yq,
         CASE WHEN yp < 1 THEN ep - 1 ELSE ep END AS ep,
         CASE WHEN yq < 1 THEN eq_ - 1 ELSE eq_ END AS eq_,
         ap, aq, w
  FROM st20
),
st22 AS (
  SELECT src_a, src_b, p, q,
         CASE WHEN yp < 1 THEN yp * 2 ELSE yp END AS yp,
         CASE WHEN yq < 1 THEN yq * 2 ELSE yq END AS yq,
         CASE WHEN yp < 1 THEN ep - 1 ELSE ep END AS ep,
         CASE WHEN yq < 1 THEN eq_ - 1 ELSE eq_ END AS eq_,
         ap, aq, w
  FROM st21
),
st23 AS (
  SELECT src_a, src_b, p, q,
         CASE WHEN yp < 1 THEN yp * 2 ELSE yp END AS yp,
         CASE WHEN yq < 1 THEN yq * 2 ELSE yq END AS yq,
         CASE WHEN yp < 1 THEN ep - 1 ELSE ep END AS ep,
         CASE WHEN yq < 1 THEN eq_ - 1 ELSE eq_ END AS eq_,
         ap, aq, w
  FROM st22
),
st24 AS (
  SELECT src_a, src_b, p, q,
         CASE WHEN yp < 1 THEN yp * 2 ELSE yp END AS yp,
         CASE WHEN yq < 1 THEN yq * 2 ELSE yq END AS yq,
         CASE WHEN yp < 1 THEN ep - 1 ELSE ep END AS ep,
         CASE WHEN yq < 1 THEN eq_ - 1 ELSE eq_ END AS eq_,
         ap, aq, w
  FROM st23
),
st25 AS (
  SELECT src_a, src_b, p, q,
         CASE WHEN yp * yp >= 2 THEN yp * yp / 2 ELSE yp * yp END AS yp,
         CASE WHEN yq * yq >= 2 THEN yq * yq / 2 ELSE yq * yq END AS yq,
         ep, eq_,
         CASE WHEN yp * yp >= 2 THEN ap + w ELSE ap END AS ap,
         CASE WHEN yq * yq >= 2 THEN aq + w ELSE aq END AS aq,
         w / 2 AS w
  FROM st24
),
st26 AS (
  SELECT src_a, src_b, p, q,
         CASE WHEN yp * yp >= 2 THEN yp * yp / 2 ELSE yp * yp END AS yp,
         CASE WHEN yq * yq >= 2 THEN yq * yq / 2 ELSE yq * yq END AS yq,
         ep, eq_,
         CASE WHEN yp * yp >= 2 THEN ap + w ELSE ap END AS ap,
         CASE WHEN yq * yq >= 2 THEN aq + w ELSE aq END AS aq,
         w / 2 AS w
  FROM st25
),
st27 AS (
  SELECT src_a, src_b, p, q,
         CASE WHEN yp * yp >= 2 THEN yp * yp / 2 ELSE yp * yp END AS yp,
         CASE WHEN yq * yq >= 2 THEN yq * yq / 2 ELSE yq * yq END AS yq,
         ep, eq_,
         CASE WHEN yp * yp >= 2 THEN ap + w ELSE ap END AS ap,
         CASE WHEN yq * yq >= 2 THEN aq + w ELSE aq END AS aq,
         w / 2 AS w
  FROM st26
),
st28 AS (
  SELECT src_a, src_b, p, q,
         CASE WHEN yp * yp >= 2 THEN yp * yp / 2 ELSE yp * yp END AS yp,
         CASE WHEN yq * yq >= 2 THEN yq * yq / 2 ELSE yq * yq END AS yq,
         ep, eq_,
         CASE WHEN yp * yp >= 2 THEN ap + w ELSE ap END AS ap,
         CASE WHEN yq * yq >= 2 THEN aq + w ELSE aq END AS aq,
         w / 2 AS w
  FROM st27
),
st29 AS (
  SELECT src_a, src_b, p, q,
         CASE WHEN yp * yp >= 2 THEN yp * yp / 2 ELSE yp * yp END AS yp,
         CASE WHEN yq * yq >= 2 THEN yq * yq / 2 ELSE yq * yq END AS yq,
         ep, eq_,
         CASE WHEN yp * yp >= 2 THEN ap + w ELSE ap END AS ap,
         CASE WHEN yq * yq >= 2 THEN aq + w ELSE aq END AS aq,
         w / 2 AS w
  FROM st28
),
st30 AS (
  SELECT src_a, src_b, p, q,
         CASE WHEN yp * yp >= 2 THEN yp * yp / 2 ELSE yp * yp END AS yp,
         CASE WHEN yq * yq >= 2 THEN yq * yq / 2 ELSE yq * yq END AS yq,
         ep, eq_,
         CASE WHEN yp * yp >= 2 THEN ap + w ELSE ap END AS ap,
         CASE WHEN yq * yq >= 2 THEN aq + w ELSE aq END AS aq,
         w / 2 AS w
  FROM st29
),
st31 AS (
  SELECT src_a, src_b, p, q,
         CASE WHEN yp * yp >= 2 THEN yp * yp / 2 ELSE yp * yp END AS yp,
         CASE WHEN yq * yq >= 2 THEN yq * yq / 2 ELSE yq * yq END AS yq,
         ep, eq_,
         CASE WHEN yp * yp >= 2 THEN ap + w ELSE ap END AS ap,
         CASE WHEN yq * yq >= 2 THEN aq + w ELSE aq END AS aq,
         w / 2 AS w
  FROM st30
),
st32 AS (
  SELECT src_a, src_b, p, q,
         CASE WHEN yp * yp >= 2 THEN yp * yp / 2 ELSE yp * yp END AS yp,
         CASE WHEN yq * yq >= 2 THEN yq * yq / 2 ELSE yq * yq END AS yq,
         ep, eq_,
         CASE WHEN yp * yp >= 2 THEN ap + w ELSE ap END AS ap,
         CASE WHEN yq * yq >= 2 THEN aq + w ELSE aq END AS aq,
         w / 2 AS w
  FROM st31
),
st33 AS (
  SELECT src_a, src_b, p, q,
         CASE WHEN yp * yp >= 2 THEN yp * yp / 2 ELSE yp * yp END AS yp,
         CASE WHEN yq * yq >= 2 THEN yq * yq / 2 ELSE yq * yq END AS yq,
         ep, eq_,
         CASE WHEN yp * yp >= 2 THEN ap + w ELSE ap END AS ap,
         CASE WHEN yq * yq >= 2 THEN aq + w ELSE aq END AS aq,
         w / 2 AS w
  FROM st32
),
st34 AS (
  SELECT src_a, src_b, p, q,
         CASE WHEN yp * yp >= 2 THEN yp * yp / 2 ELSE yp * yp END AS yp,
         CASE WHEN yq * yq >= 2 THEN yq * yq / 2 ELSE yq * yq END AS yq,
         ep, eq_,
         CASE WHEN yp * yp >= 2 THEN ap + w ELSE ap END AS ap,
         CASE WHEN yq * yq >= 2 THEN aq + w ELSE aq END AS aq,
         w / 2 AS w
  FROM st33
),
st35 AS (
  SELECT src_a, src_b, p, q,
         CASE WHEN yp * yp >= 2 THEN yp * yp / 2 ELSE yp * yp END AS yp,
         CASE WHEN yq * yq >= 2 THEN yq * yq / 2 ELSE yq * yq END AS yq,
         ep, eq_,
         CASE WHEN yp * yp >= 2 THEN ap + w ELSE ap END AS ap,
         CASE WHEN yq * yq >= 2 THEN aq + w ELSE aq END AS aq,
         w / 2 AS w
  FROM st34
),
st36 AS (
  SELECT src_a, src_b, p, q,
         CASE WHEN yp * yp >= 2 THEN yp * yp / 2 ELSE yp * yp END AS yp,
         CASE WHEN yq * yq >= 2 THEN yq * yq / 2 ELSE yq * yq END AS yq,
         ep, eq_,
         CASE WHEN yp * yp >= 2 THEN ap + w ELSE ap END AS ap,
         CASE WHEN yq * yq >= 2 THEN aq + w ELSE aq END AS aq,
         w / 2 AS w
  FROM st35
),
st37 AS (
  SELECT src_a, src_b, p, q,
         CASE WHEN yp * yp >= 2 THEN yp * yp / 2 ELSE yp * yp END AS yp,
         CASE WHEN yq * yq >= 2 THEN yq * yq / 2 ELSE yq * yq END AS yq,
         ep, eq_,
         CASE WHEN yp * yp >= 2 THEN ap + w ELSE ap END AS ap,
         CASE WHEN yq * yq >= 2 THEN aq + w ELSE aq END AS aq,
         w / 2 AS w
  FROM st36
),
st38 AS (
  SELECT src_a, src_b, p, q,
         CASE WHEN yp * yp >= 2 THEN yp * yp / 2 ELSE yp * yp END AS yp,
         CASE WHEN yq * yq >= 2 THEN yq * yq / 2 ELSE yq * yq END AS yq,
         ep, eq_,
         CASE WHEN yp * yp >= 2 THEN ap + w ELSE ap END AS ap,
         CASE WHEN yq * yq >= 2 THEN aq + w ELSE aq END AS aq,
         w / 2 AS w
  FROM st37
),
st39 AS (
  SELECT src_a, src_b, p, q,
         CASE WHEN yp * yp >= 2 THEN yp * yp / 2 ELSE yp * yp END AS yp,
         CASE WHEN yq * yq >= 2 THEN yq * yq / 2 ELSE yq * yq END AS yq,
         ep, eq_,
         CASE WHEN yp * yp >= 2 THEN ap + w ELSE ap END AS ap,
         CASE WHEN yq * yq >= 2 THEN aq + w ELSE aq END AS aq,
         w / 2 AS w
  FROM st38
),
st40 AS (
  SELECT src_a, src_b, p, q,
         CASE WHEN yp * yp >= 2 THEN yp * yp / 2 ELSE yp * yp END AS yp,
         CASE WHEN yq * yq >= 2 THEN yq * yq / 2 ELSE yq * yq END AS yq,
         ep, eq_,
         CASE WHEN yp * yp >= 2 THEN ap + w ELSE ap END AS ap,
         CASE WHEN yq * yq >= 2 THEN aq + w ELSE aq END AS aq,
         w / 2 AS w
  FROM st39
),
st41 AS (
  SELECT src_a, src_b, p, q,
         CASE WHEN yp * yp >= 2 THEN yp * yp / 2 ELSE yp * yp END AS yp,
         CASE WHEN yq * yq >= 2 THEN yq * yq / 2 ELSE yq * yq END AS yq,
         ep, eq_,
         CASE WHEN yp * yp >= 2 THEN ap + w ELSE ap END AS ap,
         CASE WHEN yq * yq >= 2 THEN aq + w ELSE aq END AS aq,
         w / 2 AS w
  FROM st40
),
st42 AS (
  SELECT src_a, src_b, p, q,
         CASE WHEN yp * yp >= 2 THEN yp * yp / 2 ELSE yp * yp END AS yp,
         CASE WHEN yq * yq >= 2 THEN yq * yq / 2 ELSE yq * yq END AS yq,
         ep, eq_,
         CASE WHEN yp * yp >= 2 THEN ap + w ELSE ap END AS ap,
         CASE WHEN yq * yq >= 2 THEN aq + w ELSE aq END AS aq,
         w / 2 AS w
  FROM st41
),
st43 AS (
  SELECT src_a, src_b, p, q,
         CASE WHEN yp * yp >= 2 THEN yp * yp / 2 ELSE yp * yp END AS yp,
         CASE WHEN yq * yq >= 2 THEN yq * yq / 2 ELSE yq * yq END AS yq,
         ep, eq_,
         CASE WHEN yp * yp >= 2 THEN ap + w ELSE ap END AS ap,
         CASE WHEN yq * yq >= 2 THEN aq + w ELSE aq END AS aq,
         w / 2 AS w
  FROM st42
),
st44 AS (
  SELECT src_a, src_b, p, q,
         CASE WHEN yp * yp >= 2 THEN yp * yp / 2 ELSE yp * yp END AS yp,
         CASE WHEN yq * yq >= 2 THEN yq * yq / 2 ELSE yq * yq END AS yq,
         ep, eq_,
         CASE WHEN yp * yp >= 2 THEN ap + w ELSE ap END AS ap,
         CASE WHEN yq * yq >= 2 THEN aq + w ELSE aq END AS aq,
         w / 2 AS w
  FROM st43
),
st45 AS (
  SELECT src_a, src_b, p, q,
         CASE WHEN yp * yp >= 2 THEN yp * yp / 2 ELSE yp * yp END AS yp,
         CASE WHEN yq * yq >= 2 THEN yq * yq / 2 ELSE yq * yq END AS yq,
         ep, eq_,
         CASE WHEN yp * yp >= 2 THEN ap + w ELSE ap END AS ap,
         CASE WHEN yq * yq >= 2 THEN aq + w ELSE aq END AS aq,
         w / 2 AS w
  FROM st44
),
st46 AS (
  SELECT src_a, src_b, p, q,
         CASE WHEN yp * yp >= 2 THEN yp * yp / 2 ELSE yp * yp END AS yp,
         CASE WHEN yq * yq >= 2 THEN yq * yq / 2 ELSE yq * yq END AS yq,
         ep, eq_,
         CASE WHEN yp * yp >= 2 THEN ap + w ELSE ap END AS ap,
         CASE WHEN yq * yq >= 2 THEN aq + w ELSE aq END AS aq,
         w / 2 AS w
  FROM st45
),
st47 AS (
  SELECT src_a, src_b, p, q,
         CASE WHEN yp * yp >= 2 THEN yp * yp / 2 ELSE yp * yp END AS yp,
         CASE WHEN yq * yq >= 2 THEN yq * yq / 2 ELSE yq * yq END AS yq,
         ep, eq_,
         CASE WHEN yp * yp >= 2 THEN ap + w ELSE ap END AS ap,
         CASE WHEN yq * yq >= 2 THEN aq + w ELSE aq END AS aq,
         w / 2 AS w
  FROM st46
),
st48 AS (
  SELECT src_a, src_b, p, q,
         CASE WHEN yp * yp >= 2 THEN yp * yp / 2 ELSE yp * yp END AS yp,
         CASE WHEN yq * yq >= 2 THEN yq * yq / 2 ELSE yq * yq END AS yq,
         ep, eq_,
         CASE WHEN yp * yp >= 2 THEN ap + w ELSE ap END AS ap,
         CASE WHEN yq * yq >= 2 THEN aq + w ELSE aq END AS aq,
         w / 2 AS w
  FROM st47
),
terms AS (
  -- engine-independent log2 by square-and-compare (steps above): only
  -- IEEE *, /, >= touch the value, so Spark and DuckDB produce BIT-equal
  -- logs by construction (F.log2 is JVM log(x)/log(2), a different
  -- algorithm than libm log2 — removing the libm dependence entirely
  -- beats auditing its ulp behavior); abs err <= 6e-8 after 24 fraction
  -- steps, and the SAME value on both engines
  SELECT src_a, src_b,
         CAST(CASE WHEN p > 0
              THEN ROUND(p * (ep + ap) * 1000000) ELSE 0 END AS BIGINT)
           AS kp_u,
         CAST(CASE WHEN q > 0
              THEN ROUND(q * (eq_ + aq) * 1000000) ELSE 0 END AS BIGINT)
           AS kq_u
  FROM st48
)
SELECT src_a, src_b,
       CAST(SUM(kp_u) + SUM(kq_u) AS BIGINT) AS jsd2_u,
       -- one exact-integer division, NO display round: the sum is odd half
       -- the time, (k/2)/1e6 then sits exactly on a decimal .5 where Spark
       -- ROUND (BigDecimal HALF_UP on the shortest-decimal string) and
       -- DuckDB ROUND (binary double) disagree — trap #28
       (CAST(SUM(kp_u) + SUM(kq_u) AS DOUBLE) / 2000000.0) AS jsd_bits
FROM terms GROUP BY src_a, src_b
"""


@register("source_jsd_matrix", oracle=_JSD_ORACLE)
def source_jsd_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x252: JENSEN-SHANNON DIVERGENCE matrix between per-source unigram
    distributions over the shared top-{_JSD_TOP_V} vocabulary — the
    DISTRIBUTION-level duplicate-feed detector: doc-level dedup (x6/x95)
    catches copied documents, THIS catches two feeds scraping the same
    underlying population even when no single document repeats (near-zero
    JSD = redundant source; the symmetric, bounded [0,1]-bit alternative
    to x113's one-sided KL). Feeds mixture design: merging two low-JSD
    sources adds bytes, not diversity.

    Determinism: per-source probabilities pin 6dp over the restricted
    vocab; m = (p+q)/2 is exact halving of pinned values; each KL term
    rounds to micro-bits (x113), so every pair's JSD is an exact integer
    sum halved once.

    100 TB: the vocab restriction is the scale device — distributions
    collapse to |sources| x {_JSD_TOP_V} rows BEFORE the pair join, so
    the pair volume is |sources|²·V/2 regardless of corpus size (20
    sources x 200 tokens here). Full-vocab JSD over millions of types
    would instead sketch with hashed buckets (same plan, bucketed
    token).

    r14 optimization (guide §4.2 — hand whole batches to vectorized
    native code): the 48 unrolled square-and-compare layers used to be 48
    stacked Catalyst Projects of nested CASE WHENs — per-row interpreted
    expression work that dominated the query (~4 s of its 5.1 s at
    sf0.1). They are now ONE mapInPandas kernel running the identical
    IEEE-754 loop over numpy float64 arrays. Bit-exactness is preserved
    by construction: the loop touches the value with only *, /2 and >=
    comparisons — operations the IEEE standard defines exactly, so numpy,
    Spark codegen and DuckDB agree bit-for-bit (the whole point of the
    square-and-compare device: no libm anywhere). The final micro-bit
    rounding stays in Spark SQL, unchanged. Measured (interleaved 3-shot
    medians, sf0.1): 5.1-5.3 s -> 1.1 s, rows bit-identical; the kernel
    auto-joins the Arrow batch-size invariance sweep
    (tools/check_invariance.py discovers mapInPandas callers)."""
    import pandas as pd  # noqa: PLC0415
    import numpy as np  # noqa: PLC0415

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("source", F.explode(F.split("text", " ")).alias("token"))
    vocab = (
        tok.groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "token",
            F.row_number()
            .over(Window.orderBy(F.col("n").desc(), "token"))
            .alias("r"),
        )
        .filter(F.col("r") <= _JSD_TOP_V)
        .select("token")
    )
    cnt = (
        tok.join(F.broadcast(vocab), "token")
        .groupBy("source", "token")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    dist = cnt.select(
        "source",
        "token",
        F.round(
            F.col("c").cast("double")
            / F.sum("c").over(Window.partitionBy("source")),
            6,
        ).alias("p"),
    ).localCheckpoint(eager=True)
    # explicit (pair x vocab) grid — a token one feed lacks still
    # contributes its p bits (join-on-token would drop asymmetric terms)
    srcs = dist.select("source").distinct()
    spair = srcs.select(F.col("source").alias("src_a")).join(
        srcs.select(F.col("source").alias("src_b")),
        F.col("src_a") < F.col("src_b"),
    )
    grid = spair.crossJoin(F.broadcast(vocab))
    da = dist.select(
        F.col("source").alias("src_a"), "token", F.col("p").alias("pa")
    )
    db = dist.select(
        F.col("source").alias("src_b"), "token", F.col("p").alias("pb")
    )
    pairs = (
        grid.join(F.broadcast(da), ["src_a", "token"], "left")
        .join(F.broadcast(db), ["src_b", "token"], "left")
        .select(
            "src_a",
            "src_b",
            F.coalesce("pa", F.lit(0.0)).alias("p"),
            F.coalesce("pb", F.lit(0.0)).alias("q"),
        )
    )
    # engine-independent log2 by square-and-compare (see oracle comment):
    # only IEEE *, /, >= touch the value — no libm anywhere. One vectorized
    # numpy pass replaces the former 48 stacked Catalyst Projects; the ops
    # are IEEE-exact, so the values are bit-identical to the SQL unroll.
    def _log2_bits(batches):
        for pdf in batches:
            p = pdf["p"].to_numpy(dtype="float64")
            q = pdf["q"].to_numpy(dtype="float64")
            m = (p + q) / 2
            with np.errstate(divide="ignore", invalid="ignore"):
                yp = np.where(p > 0, p / m, 1.0)
                yq = np.where(q > 0, q / m, 1.0)
            ep = np.zeros_like(yp)
            eq = np.zeros_like(yq)
            ap = np.zeros_like(yp)
            aq = np.zeros_like(yq)
            w = 0.5
            for _ in range(24):  # normalize into [1, 2)
                mk = yp < 1
                ep = np.where(mk, ep - 1, ep)
                yp = np.where(mk, yp * 2, yp)
                mk = yq < 1
                eq = np.where(mk, eq - 1, eq)
                yq = np.where(mk, yq * 2, yq)
            for _ in range(24):  # fraction bits by square-and-compare
                yp2 = yp * yp
                mk = yp2 >= 2
                ap = np.where(mk, ap + w, ap)
                yp = np.where(mk, yp2 / 2, yp2)
                yq2 = yq * yq
                mk = yq2 >= 2
                aq = np.where(mk, aq + w, aq)
                yq = np.where(mk, yq2 / 2, yq2)
                w = w / 2
            yield pd.DataFrame(
                {
                    "src_a": pdf["src_a"],
                    "src_b": pdf["src_b"],
                    "p": pdf["p"],
                    "q": pdf["q"],
                    "bits_p": ep + ap,
                    "bits_q": eq + aq,
                }
            )

    st = pairs.mapInPandas(
        _log2_bits,
        schema=(
            "src_a string, src_b string, p double, q double,"
            " bits_p double, bits_q double"
        ),
    )
    kp = (
        F.when(
            F.col("p") > 0,
            F.round(F.col("p") * F.col("bits_p") * 1_000_000),
        )
        .otherwise(0)
        .cast("long")
    )
    kq = (
        F.when(
            F.col("q") > 0,
            F.round(F.col("q") * F.col("bits_q") * 1_000_000),
        )
        .otherwise(0)
        .cast("long")
    )
    return (
        st.select("src_a", "src_b", kp.alias("kp_u"), kq.alias("kq_u"))
        .groupBy("src_a", "src_b")
        .agg(
            (F.sum("kp_u") + F.sum("kq_u")).cast("long").alias("jsd2_u"),
            # exact integer / one division, NO display round (trap #28: the
            # odd-sum /2 sits exactly on a decimal .5 at micro scale, where
            # Spark's decimal-string HALF_UP and DuckDB's binary-double
            # ROUND disagree)
            (
                (F.sum("kp_u") + F.sum("kq_u")).cast("double") / 2_000_000.0
            ).alias("jsd_bits"),
        )
    )


# --------------------------------------------------------------------------
# x269 — Heaps'-law vocabulary growth curve (first-occurrence device)
# --------------------------------------------------------------------------

_HEAPS_ORACLE = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
),
first_occ AS (
  SELECT token, MIN(doc_id) AS first_doc FROM tok GROUP BY token
),
per_doc AS (
  -- n_new counts DISTINCT first-seen tokens (an occurrence count would
  -- overstate V by each new token's in-doc frequency)
  SELECT t.doc_id, COUNT(*) AS n_tok,
         COUNT(DISTINCT CASE WHEN f.first_doc = t.doc_id THEN t.token END)
           AS n_new
  FROM tok t JOIN first_occ f ON f.token = t.token
  GROUP BY t.doc_id
),
curve AS (
  SELECT doc_id,
         ROW_NUMBER() OVER (ORDER BY doc_id) AS r,
         COUNT(*) OVER () AS nd,
         SUM(n_tok) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum_tok,
         SUM(n_new) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum_voc
  FROM per_doc
),
chk AS (
  SELECT k, c.r, c.cum_tok, c.cum_voc,
         CAST(ROUND(ln(c.cum_tok) * 1000000) AS BIGINT) AS lnt_u,
         CAST(ROUND(ln(c.cum_voc) * 1000000) AS BIGINT) AS lnv_u
  FROM (SELECT UNNEST(generate_series(1, 10)) AS k) g
  JOIN curve c ON c.r = CAST(CEIL(k / 10.0 * c.nd) AS BIGINT)
),
fit AS (
  -- Exact INTEGER OLS moments (r10 driver-red fix): the micro-nat logs are
  -- already pinned BIGINTs, so n*Sxy - Sx*Sy and n*Sxx - Sx*Sx are exact
  -- integers (~1e14, exactly representable as DOUBLE) computed identically
  -- by both engines; ONE division then a micro-int emission. The previous
  -- spelling summed DOUBLE products whose accumulation order differs across
  -- engines/partitionings — display round(x, 6) straddled in the driver's
  -- env while passing every local sweep (trap #28's multi-term class).
  SELECT CAST(ROUND(
           CAST(COUNT(*) * SUM(lnt_u * lnv_u) - SUM(lnt_u) * SUM(lnv_u)
                AS DOUBLE)
           / CAST(COUNT(*) * SUM(lnt_u * lnt_u) - SUM(lnt_u) * SUM(lnt_u)
                  AS DOUBLE)
           * 1000000) AS BIGINT) AS heaps_beta_u
  FROM chk
)
SELECT CAST(c.k AS INTEGER) AS decile, CAST(c.r AS BIGINT) AS n_docs,
       CAST(c.cum_tok AS BIGINT) AS cum_tokens,
       CAST(c.cum_voc AS BIGINT) AS cum_vocab,
       CAST(ROUND(CAST(c.cum_voc AS DOUBLE) * 1000000.0 / CAST(c.cum_tok AS DOUBLE))
            AS BIGINT) AS ttr_u,
       f.heaps_beta_u
FROM chk c JOIN fit f ON TRUE
"""


@register("vocab_growth_heaps", oracle=_HEAPS_ORACLE)
def vocab_growth_heaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x269: HEAPS'-LAW vocabulary growth — distinct vocabulary V as a
    function of tokens seen T at ten corpus checkpoints (doc-id order),
    with the fitted exponent β from V ≈ K·T^β. THE corpus-health
    fingerprint the curation loop watches: natural text grows β≈0.5;
    β falling off a cliff mid-corpus means a duplicated feed stopped
    contributing vocabulary (x252's distribution-level signal seen
    longitudinally), β near 1 means id-like noise tokens.

    The cumulative-distinct problem is made one-pass by the
    FIRST-OCCURRENCE device: V(d) = #tokens whose min(doc_id) ≤ d, so
    "running distinct" becomes a running SUM of per-doc new-token counts
    (x75's trick at corpus scale — no per-prefix re-aggregation).
    Checkpoints are rank-discrete doc deciles; β fits on micro-nat
    integer logs (x113) with EXACT integer OLS moments, and both `ttr_u`
    and `heaps_beta_u` are emitted as micro-scaled BIGINTs (value × 1e6)
    — the r10 driver round caught the float-moment spelling straddling
    a display round under a different partition layout.

    100 TB: token explode + (token) min-agg + (doc) agg — all map-
    combined on their keys; the running sums act on the |docs| curve,
    and the decile probe + 10-point fit are constant-size epilogue."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    first_occ = tok.groupBy("token").agg(F.min("doc_id").alias("first_doc"))
    per_doc = (
        tok.join(first_occ, "token")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tok"),
            # distinct first-seen tokens, not occurrences (a new token's
            # in-doc repeats must count once toward V)
            F.countDistinct(
                F.when(F.col("first_doc") == F.col("doc_id"), F.col("token"))
            ).alias("n_new"),
        )
    )
    w_ord = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    curve = per_doc.select(
        F.row_number().over(Window.orderBy("doc_id")).alias("r"),
        F.count(F.lit(1)).over(w_all).alias("nd"),
        F.sum("n_tok").over(w_ord).alias("cum_tok"),
        F.sum("n_new").over(w_ord).alias("cum_voc"),
    )
    ks = spark.range(1, 11).select(F.col("id").cast("int").alias("decile"))
    chk = F.broadcast(ks).join(
        curve,
        F.col("r") == F.ceil(F.col("decile") / 10.0 * F.col("nd")).cast("long"),
    ).select(
        "decile",
        "r",
        "cum_tok",
        "cum_voc",
        F.round(F.log("cum_tok") * 1_000_000).cast("long").alias("lnt_u"),
        F.round(F.log("cum_voc") * 1_000_000).cast("long").alias("lnv_u"),
    )
    # Exact integer OLS moments (r10 driver-red fix): lnt_u/lnv_u are pinned
    # BIGINT micro-nats, so every moment below is exact 64-bit integer math
    # (products ~2e14, n·Σ ~2e16 — far inside long range) identical across
    # engines and partition layouts; ONE double division, then the micro-int
    # emission device (x113/x106). The previous spelling summed DOUBLES
    # (accumulation-order-sensitive) and display-rounded the ratio — green in
    # every local sweep, red under the driver's layout (trap #28's
    # multi-term-float class; see oracle header comment).
    n = F.count(F.lit(1))
    s_t = F.sum("lnt_u")
    s_v = F.sum("lnv_u")
    s_tv = F.sum(F.col("lnt_u") * F.col("lnv_u"))
    s_tt = F.sum(F.col("lnt_u") * F.col("lnt_u"))
    fit = chk.agg(
        F.round(
            (n * s_tv - s_t * s_v).cast("double")
            / (n * s_tt - s_t * s_t).cast("double")
            * 1_000_000
        )
        .cast("long")
        .alias("heaps_beta_u")
    )
    return chk.join(F.broadcast(fit)).select(
        "decile",
        F.col("r").cast("long").alias("n_docs"),
        F.col("cum_tok").cast("long").alias("cum_tokens"),
        F.col("cum_voc").cast("long").alias("cum_vocab"),
        F.round(
            F.col("cum_voc").cast("double") * 1_000_000.0
            / F.col("cum_tok").cast("double")
        )
        .cast("long")
        .alias("ttr_u"),
        "heaps_beta_u",
    )


# --------------------------------------------------------------------------
# x270 — zlib compression-ratio quality signal (rows-only: stdlib codec)
# --------------------------------------------------------------------------

_ZLIB_LEVEL = 6


@register("text_zlib_ratio", oracle=None)
def text_zlib_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x270: ZLIB COMPRESSION RATIO per document — the crude-but-
    unreasonably-effective quality filter every big web-corpus pipeline
    ships (CCNet/RefinedWeb class): compressed/raw byte ratio is a
    model-free proxy for information density. Near-zero = degenerate
    repetition (x72's repetition score seen by an actual coder), near 1
    = random/encrypted junk; natural prose sits in a stable band, and
    BOTH tails get culled.

    Rows-only by declaration (SURVEY §2): DEFLATE output is
    library-internal (bit-stream depends on zlib's matcher), so no SQL
    engine can replay the byte count; correctness is property-tested
    (ratio bounds, repetition ⇒ lower ratio than shuffled text,
    round-trip identity) against Python's stdlib zlib at a FIXED level
    {_ZLIB_LEVEL} — pinned so any zlib build change is a visible test
    diff, not silent drift.

    100 TB: (doc_id, text)-projected mapInPandas — Arrow-batched, no
    shuffle at all; compression is embarrassingly parallel and CPU-bound
    exactly like production curation. Binary/multimodal columns reuse
    the same shape on raw bytes (x228's entropy is the no-codec
    fallback)."""
    import pandas as pd  # noqa: PLC0415
    import zlib  # noqa: PLC0415

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def comp(batches):
        for pdf in batches:
            raw = [t.encode("utf-8") for t in pdf["text"]]
            cz = [len(zlib.compress(b, _ZLIB_LEVEL)) for b in raw]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pd.array([len(b) for b in raw], dtype="int64"),
                    "n_compressed": pd.array(cz, dtype="int64"),
                    "zlib_ratio": [
                        round(c / len(b), 6) if len(b) else 1.0
                        for c, b in zip(cz, raw)
                    ],
                }
            )

    return docs.mapInPandas(
        comp,
        schema="doc_id long, n_bytes long, n_compressed long, zlib_ratio double",
    )


# --------------------------------------------------------------------------
# x279 — data-driven stopword profile per source
# --------------------------------------------------------------------------

_STOPK = 20

_STOPPROF_ORACLE = f"""
WITH tok AS (
  SELECT source, unnest(string_split(text, ' ')) AS token FROM documents
),
df_ AS (
  SELECT token, COUNT(*) AS n FROM tok GROUP BY token
),
stop AS (
  SELECT token FROM (
    SELECT token, ROW_NUMBER() OVER (ORDER BY n DESC, token) AS r FROM df_
  ) WHERE r <= {_STOPK}
),
per AS (
  SELECT t.source, COUNT(*) AS n_tok,
         SUM(CASE WHEN s.token IS NOT NULL THEN 1 ELSE 0 END) AS n_stop
  FROM tok t LEFT JOIN stop s ON s.token = t.token
  GROUP BY t.source
)
SELECT source, CAST(n_tok AS BIGINT) AS n_tokens,
       CAST(n_stop AS BIGINT) AS n_stopword_tokens,
       ROUND(CAST(n_stop AS DOUBLE) / n_tok, 6) AS stopword_density
FROM per
"""


@register("text_stopword_profile", oracle=_STOPPROF_ORACLE)
def text_stopword_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x279: DATA-DRIVEN STOPWORD PROFILE per source — the corpus's own
    top-{_STOPK} highest-frequency tokens (rank-pinned: frequency desc,
    token asc) play the stopword list, and each source is scored by its
    stopword token density. The language-agnostic version of the classic
    quality gate (x9/x73 use fixed heuristics): machine text and keyword
    spam sit far BELOW the natural-prose density band, template boiler-
    plate far above — and because the list derives from the corpus, the
    gate needs no per-language dictionary (Zipf guarantees the top-k IS
    the function-word set in any natural language).

    100 TB: token df agg (map-combined) → a {_STOPK}-row rank probe →
    broadcast LEFT join back onto the token stream — the stream is
    scanned twice (df pass + profile pass), both passes map-side
    combined, no row-grain shuffle. The rank window runs at vocab grain
    (x98's rationale)."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("source", F.explode(F.split("text", " ")).alias("token"))
    df_ = tok.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    stop = (
        df_.select(
            "token",
            F.row_number()
            .over(Window.orderBy(F.col("n").desc(), "token"))
            .alias("r"),
        )
        .filter(F.col("r") <= _STOPK)
        .select("token", F.lit(1).alias("is_stop"))
    )
    per = (
        tok.join(F.broadcast(stop), "token", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_tok"),
            F.sum(F.coalesce("is_stop", F.lit(0))).alias("n_stop"),
        )
    )
    return per.select(
        "source",
        F.col("n_tok").cast("long").alias("n_tokens"),
        F.col("n_stop").cast("long").alias("n_stopword_tokens"),
        F.round(F.col("n_stop").cast("double") / F.col("n_tok"), 6).alias(
            "stopword_density"
        ),
    )


# --------------------------------------------------------------------------
# x303 — FORCAST readability panel per source (sentence-free formula)
# --------------------------------------------------------------------------

_FORCAST_ORACLE = """
WITH tok AS (
  SELECT doc_id, source, unnest(string_split(text, ' ')) AS token
  FROM documents
),
syl AS (
  SELECT doc_id, source, token,
         len(regexp_extract_all(token, '[aeiouy]+')) AS ng
  FROM tok WHERE token <> ''
)
SELECT source,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(ng) AS BIGINT) AS n_syllable_groups,
       CAST(SUM(CASE WHEN ng = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_mono,
       CAST(SUM(CASE WHEN ng >= 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_poly,
       ROUND(CAST(SUM(ng) AS DOUBLE) / COUNT(*), 6) AS syllables_per_word,
       ROUND(CAST(SUM(CASE WHEN ng >= 3 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS poly_rate,
       ROUND(20.0
             - 15.0 * CAST(SUM(CASE WHEN ng = 1 THEN 1 ELSE 0 END) AS DOUBLE)
               / COUNT(*), 6) AS forcast_grade
FROM syl
GROUP BY source
"""


@register("docs_readability_forcast", oracle=_FORCAST_ORACLE)
def docs_readability_forcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x303: FORCAST READABILITY per source — grade = 20 − 150·M/(10·W)
    with M = monosyllabic words in a W-word sample (Caylor et al. 1973):
    the one published readability formula that needs NO sentence
    boundaries, which is exactly this corpus (x9's quality score already
    measured punctuation ~ absent). Syllables are approximated by vowel
    -group runs [aeiouy]+ per token — the standard proxy when no
    dictionary is allowed; the panel adds syllables/word and the
    polysyllabic rate (the SMOG/Gunning-Fog numerator) so a curation
    gate can threshold on either.

    Exactness: counts are exact integers off one token explode; the
    three ratios are single integer divisions pinned at 6dp; the grade
    is one identically-parenthesized expression (20.0 − 15.0·M/W).

    100 TB: explode → map-combined source-grain agg; |sources| rows
    out. Same shuffle class as text_tf, no vocabulary state at all."""
    docs = load_table_spread(spark, sf_dir, "documents", "doc_id")
    tok = docs.select(
        "doc_id", "source", F.explode(F.split("text", " ")).alias("token")
    ).filter(F.col("token") != "")
    syl = tok.select(
        "doc_id",
        "source",
        F.size(F.expr("regexp_extract_all(token, '[aeiouy]+', 0)")).alias("ng"),
    )
    mono = F.sum(F.when(F.col("ng") == 1, 1).otherwise(0)).cast("long")
    poly = F.sum(F.when(F.col("ng") >= 3, 1).otherwise(0)).cast("long")
    return syl.groupBy("source").agg(
        F.countDistinct("doc_id").cast("long").alias("n_docs"),
        F.count(F.lit(1)).cast("long").alias("n_words"),
        F.sum("ng").cast("long").alias("n_syllable_groups"),
        mono.alias("n_mono"),
        poly.alias("n_poly"),
        F.round(
            F.sum("ng").cast("double") / F.count(F.lit(1)), 6
        ).alias("syllables_per_word"),
        F.round(poly.cast("double") / F.count(F.lit(1)), 6).alias("poly_rate"),
        F.round(
            F.lit(20.0) - 15.0 * mono.cast("double") / F.count(F.lit(1)), 6
        ).alias("forcast_grade"),
    )


# --------------------------------------------------------------------------
# x323 — classifier evaluation metrics (per-class P/R/F1 + Cohen's kappa)
# --------------------------------------------------------------------------

_METRICS_ORACLE = f"""
WITH l AS ({{langid_sql}}),
cell AS (
  SELECT actual_lang, pred_lang, CAST(COUNT(*) AS BIGINT) AS n
  FROM l GROUP BY actual_lang, pred_lang
),
classes AS (
  SELECT actual_lang AS cl FROM cell
  UNION SELECT pred_lang FROM cell
),
rowm AS (SELECT actual_lang AS cl, CAST(SUM(n) AS BIGINT) AS r
         FROM cell GROUP BY actual_lang),
colm AS (SELECT pred_lang AS cl, CAST(SUM(n) AS BIGINT) AS c
         FROM cell GROUP BY pred_lang),
diag AS (SELECT actual_lang AS cl, n AS tp FROM cell
         WHERE actual_lang = pred_lang),
tot AS (
  SELECT CAST(SUM(n) AS BIGINT) AS nn,
         CAST(SUM(CASE WHEN actual_lang = pred_lang THEN n ELSE 0 END)
              AS BIGINT) AS ntp
  FROM cell
),
pe AS (
  SELECT CAST(SUM(COALESCE(rowm.r, 0) * COALESCE(colm.c, 0)) AS BIGINT)
    AS rc
  FROM classes
  LEFT JOIN rowm ON rowm.cl = classes.cl
  LEFT JOIN colm ON colm.cl = classes.cl
)
SELECT classes.cl AS lang_class,
       COALESCE(rowm.r, 0) AS n_actual,
       COALESCE(colm.c, 0) AS n_predicted,
       COALESCE(diag.tp, 0) AS tp,
       ROUND(CASE WHEN COALESCE(colm.c, 0) = 0 THEN 0.0
                  ELSE CAST(COALESCE(diag.tp, 0) AS DOUBLE) / colm.c END, 6)
         AS precision_,
       ROUND(CASE WHEN COALESCE(rowm.r, 0) = 0 THEN 0.0
                  ELSE CAST(COALESCE(diag.tp, 0) AS DOUBLE) / rowm.r END, 6)
         AS recall_,
       ROUND(CASE WHEN COALESCE(diag.tp, 0) = 0 THEN 0.0
                  ELSE 2.0 * COALESCE(diag.tp, 0)
                       / (COALESCE(rowm.r, 0) + COALESCE(colm.c, 0)) END, 6)
         AS f1,
       ROUND(CAST(tot.ntp AS DOUBLE) / tot.nn, 6) AS accuracy,
       ROUND((CAST(tot.ntp AS DOUBLE) / tot.nn
              - CAST(pe.rc AS DOUBLE) / (CAST(tot.nn AS DOUBLE) * tot.nn))
             / (1.0 - CAST(pe.rc AS DOUBLE)
                / (CAST(tot.nn AS DOUBLE) * tot.nn)), 6) AS cohens_kappa
FROM classes
LEFT JOIN rowm ON rowm.cl = classes.cl
LEFT JOIN colm ON colm.cl = classes.cl
LEFT JOIN diag ON diag.cl = classes.cl
CROSS JOIN tot CROSS JOIN pe
"""


@register(
    "ml_classifier_metrics",
    oracle=_METRICS_ORACLE.format(langid_sql=_langid_sql()),
)
def ml_classifier_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x323: CLASSIFIER EVALUATION METRICS for x8's language identifier
    — per-class precision / recall / F1 (harmonic, the 2TP/(R+C)
    identity avoids the p+r=0 guard) over the declared-vs-predicted
    matrix, with overall accuracy and COHEN'S KAPPA (chance-corrected
    agreement, pe = Σr·c/N²) carried on every row: the metrics layer
    x172's raw confusion matrix feeds — and the harness any classifier
    in this repo (x305's NB, x300's stump) evaluates through. Classes
    are the UNION of actual and predicted labels ('und' never occurs
    as truth but needs a precision row).

    Exactness: every margin is an exact integer; the five ratios are
    single 6dp-pinned divisions; Σr·c stays int64 to ~3e9 docs
    (DECIMAL(38) past that).

    100 TB: x8's scoring is a narrow map; everything after runs on the
    ≤(|langs|+1)² matrix."""
    l = text_langid(spark, sf_dir)
    # The ≤(|langs|+1)² confusion-matrix frame feeds SIX consumers
    # (classes, row/col margins, diagonal, totals, pe) — without the pin
    # each one re-derives x8's full per-row scoring pass over the corpus
    # (36 Exchanges / 691-row plan measured r14). One eager localCheckpoint
    # on the bounded cell table collapses that to a single corpus scan;
    # everything downstream runs on dim-grain rows.
    cell = (
        l.groupBy("actual_lang", "pred_lang")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .localCheckpoint()
    )
    classes = (
        cell.select(F.col("actual_lang").alias("cl"))
        .union(cell.select("pred_lang"))
        .distinct()
    )
    rowm = cell.groupBy(F.col("actual_lang").alias("cl")).agg(
        F.sum("n").cast("long").alias("r")
    )
    colm = cell.groupBy(F.col("pred_lang").alias("cl")).agg(
        F.sum("n").cast("long").alias("c")
    )
    diag = cell.filter(F.col("actual_lang") == F.col("pred_lang")).select(
        F.col("actual_lang").alias("cl"), F.col("n").alias("tp")
    )
    tot = cell.agg(
        F.sum("n").cast("long").alias("nn"),
        F.sum(
            F.when(F.col("actual_lang") == F.col("pred_lang"), F.col("n")).otherwise(0)
        )
        .cast("long")
        .alias("ntp"),
    )
    pe = (
        classes.join(rowm, "cl", "left")
        .join(colm, "cl", "left")
        .agg(
            F.sum(
                F.coalesce(F.col("r"), F.lit(0))
                * F.coalesce(F.col("c"), F.lit(0))
            )
            .cast("long")
            .alias("rc")
        )
    )
    j = (
        classes.join(rowm, "cl", "left")
        .join(colm, "cl", "left")
        .join(diag, "cl", "left")
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(pe))
    )
    r0 = F.coalesce(F.col("r"), F.lit(0))
    c0 = F.coalesce(F.col("c"), F.lit(0))
    tp0 = F.coalesce(F.col("tp"), F.lit(0))
    po = F.col("ntp").cast("double") / F.col("nn")
    pex = F.col("rc").cast("double") / (
        F.col("nn").cast("double") * F.col("nn")
    )
    return j.select(
        F.col("cl").alias("lang_class"),
        r0.alias("n_actual"),
        c0.alias("n_predicted"),
        tp0.alias("tp"),
        F.round(
            F.when(c0 == 0, F.lit(0.0)).otherwise(tp0.cast("double") / F.col("c")),
            6,
        ).alias("precision_"),
        F.round(
            F.when(r0 == 0, F.lit(0.0)).otherwise(tp0.cast("double") / F.col("r")),
            6,
        ).alias("recall_"),
        F.round(
            F.when(tp0 == 0, F.lit(0.0)).otherwise(2.0 * tp0 / (r0 + c0)), 6
        ).alias("f1"),
        F.round(po, 6).alias("accuracy"),
        F.round((po - pex) / (F.lit(1.0) - pex), 6).alias("cohens_kappa"),
    )


# --------------------------------------------------------------------------
# x349 — Yule's K + Simpson's D lexical concentration per source
# --------------------------------------------------------------------------

_YULE_ORACLE = """
WITH tok AS (
  SELECT source, unnest(string_split(text, ' ')) AS w FROM documents
),
tf AS (
  SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c
  FROM tok GROUP BY source, w
),
mom AS (
  SELECT source,
         CAST(SUM(c) AS BIGINT) AS n,
         CAST(COUNT(*) AS BIGINT) AS v,
         CAST(SUM(CAST(c AS HUGEINT) * c) AS HUGEINT) AS scc
  FROM tf GROUP BY source
)
SELECT source, n AS n_tokens, v AS vocab_size,
       ROUND(10000.0 * CAST(scc - n AS DOUBLE)
             / (CAST(n AS HUGEINT) * n), 6) AS yule_k,
       ROUND(CAST(scc - n AS DOUBLE)
             / (CAST(n AS HUGEINT) * (n - 1)), 6) AS simpson_d
FROM mom
"""


@register("text_yule_simpson", oracle=_YULE_ORACLE)
def text_yule_simpson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x349: YULE'S K + SIMPSON'S D per source — the repeat-rate pair of
    lexical concentration measures (Yule 1944; Simpson 1949): K =
    1e4*(SUM(c^2) - N)/N^2 and D = SUM(c(c-1))/(N(N-1)), the probability
    two random tokens are the same type. Unlike x173's length-biased TTR,
    K and D are (asymptotically) length-INVARIANT — templated/generated
    text shows K far above natural prose (~100-200), so the pair is the
    curation screen that survives mixed document lengths, completing the
    x161/x173/x227 lexical panel.

    Exactness: N, V, SUM(c^2) are exact BIGINT/HUGEINT-DECIMAL(38)
    integers (SUM(c(c-1)) = SUM(c^2) - N reuses the same moment); each
    statistic is ONE identically-parenthesized division, 6dp.

    100 TB: the (source, token) agg partial-aggregates map-side; the
    moment agg collapses |sources| x |vocab| to |sources| rows. No
    second pass, no sort, no window."""
    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select("source", F.explode(F.split("text", " ")).alias("w"))
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    mom = tf.groupBy("source").agg(
        F.sum("c").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("v"),
        F.sum(dec(F.col("c")) * F.col("c")).alias("scc"),
    )
    n, scc = F.col("n"), F.col("scc")
    return mom.select(
        "source",
        n.alias("n_tokens"),
        F.col("v").alias("vocab_size"),
        F.round(
            10000.0 * (scc - n).cast("double") / (dec(n) * n), 6
        ).alias("yule_k"),
        F.round((scc - n).cast("double") / (dec(n) * (n - 1)), 6).alias(
            "simpson_d"
        ),
    )


# --------------------------------------------------------------------------
# x358 — ASCII / non-ASCII script-mix audit per language
# --------------------------------------------------------------------------

_SCRIPTMIX_ORACLE = """
WITH d AS (
  SELECT lang,
         CAST(length(text) AS BIGINT) AS n_all,
         CAST(length(regexp_replace(text, '[^ -~]', '', 'g')) AS BIGINT)
           AS n_ascii
  FROM documents
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_all) AS BIGINT) AS n_chars,
       ROUND(CAST(SUM(n_ascii) AS DOUBLE) / SUM(n_all), 6) AS ascii_share,
       CAST(SUM(CASE WHEN n_ascii < n_all THEN 1 ELSE 0 END) AS BIGINT)
         AS n_docs_nonascii,
       ROUND(CAST(SUM(CASE WHEN n_ascii < n_all THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS nonascii_doc_rate
FROM d GROUP BY lang
"""


@register("docs_script_mix", oracle=_SCRIPTMIX_ORACLE)
def docs_script_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x358: SCRIPT-MIX audit per language — printable-ASCII character
    share and the rate of docs containing ANY non-ASCII byte: the
    mojibake / wrong-decoder screen (an 'en' shard with a falling ASCII
    share means double-encoded UTF-8 or binary spill upstream; a 'zh'
    shard with a RISING one means the CJK feed started serving English
    error pages) — the encoding-level companion to x8's statistical
    langid and x9's quality score, which both assume the bytes decode
    sanely first.

    Exactness: both counts are exact integer string lengths (the
    character class [^ -~] — printable ASCII — is identical in Java
    regex and RE2); the two ratios are single exact-integer divisions.

    100 TB: one narrow projection + map-combined lang-grain agg;
    |langs| rows out. The regexp runs once per doc in codegen — no
    explode, no Python."""
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "lang",
        F.length("text").cast("long").alias("n_all"),
        F.length(F.regexp_replace("text", "[^ -~]", "")).cast("long").alias(
            "n_ascii"
        ),
    )
    n_docs = F.count(F.lit(1)).cast("long")
    nonascii = F.sum(
        F.when(F.col("n_ascii") < F.col("n_all"), 1).otherwise(0)
    ).cast("long")
    return d.groupBy("lang").agg(
        n_docs.alias("n_docs"),
        F.sum("n_all").cast("long").alias("n_chars"),
        F.round(
            F.sum("n_ascii").cast("double") / F.sum("n_all"), 6
        ).alias("ascii_share"),
        nonascii.alias("n_docs_nonascii"),
        F.round(nonascii.cast("double") / n_docs, 6).alias("nonascii_doc_rate"),
    )


# --------------------------------------------------------------------------
# x360 — cross-source signature-trigram coverage matrix
# --------------------------------------------------------------------------

_XCOV_TOP = 200

_XCOV_ORACLE = f"""
WITH tok AS (
  SELECT source, string_split(text, ' ') AS t FROM documents
),
tg AS (
  SELECT source,
         t[i] || ' ' || t[i + 1] || ' ' || t[i + 2] AS g
  FROM tok, unnest(generate_series(1, len(t) - 2)) AS u(i)
  WHERE len(t) >= 3
),
cnt AS (
  SELECT source, g, CAST(COUNT(*) AS BIGINT) AS c
  FROM tg GROUP BY source, g
),
top AS (
  SELECT source, g FROM (
    SELECT source, g,
           ROW_NUMBER() OVER (PARTITION BY source
                              ORDER BY c DESC, g) AS rk
    FROM cnt
  ) WHERE rk <= {_XCOV_TOP}
),
have AS (SELECT DISTINCT source, g FROM cnt)
SELECT a.source AS src_a, h.source AS src_b,
       CAST(COUNT(*) AS BIGINT) AS n_shared,
       ROUND(CAST(COUNT(*) AS DOUBLE) / {_XCOV_TOP}, 6) AS coverage
FROM top a JOIN have h ON a.g = h.g
GROUP BY a.source, h.source
"""


@register("text_ngram_coverage_crossdomain", oracle=_XCOV_ORACLE)
def text_ngram_coverage_crossdomain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x360: CROSS-SOURCE SIGNATURE-TRIGRAM COVERAGE matrix — for each
    source pair (A, B), the fraction of A's top-200 trigrams (its
    'signature phrases', rank-pinned count DESC then trigram) present
    ANYWHERE in B: the domain-overlap map that drives mixture design
    (two sources covering each other's signatures are redundant — split
    their budget; x252's JSD compares unigram DISTRIBUTIONS, this
    catches phrase-level overlap JSD smooths away) and the
    train-on-A/eval-on-B transfer prior.

    Exactness: counts exact integers; the top-k is (count DESC, trigram)
    rank-pinned; coverage = exact count / literal — one division.
    Asymmetric by design (A's signatures in B != B's in A); the
    diagonal is the 1.0 sanity row.

    100 TB: trigram counting map-combines on (source, g); the 200/source
    signature set (|sources|*200 rows) broadcast-joins against the
    distinct (source, g) frame hashed on g — never a corpus-grain pair
    join. The rank window partitions by source over the count frame —
    the same |vocab|-bounded state as x102's keyword ranks."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("source", F.split("text", " ").alias("t"))
    tg = toks.filter(F.size("t") >= 3).select(
        "source",
        F.explode(
            F.expr(
                "transform(sequence(0, size(t) - 3),"
                " i -> concat(t[i], ' ', t[i + 1], ' ', t[i + 2]))"
            )
        ).alias("g"),
    )
    # r14 (guide §2.4): cnt feeds BOTH the top-k window and the coverage
    # probe side — without the eager checkpoint the whole corpus subtree
    # (scan + explode + count) is derived once per consumer (4 parquet
    # scans in the before-plan). cnt is |sources x vocab|-bounded, so the
    # materialization is the cheap side of the trade at any corpus size.
    cnt = (
        tg.groupBy("source", "g")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .localCheckpoint(eager=True)
    )
    w = Window.partitionBy("source").orderBy(F.col("c").desc(), "g")
    top = (
        cnt.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _XCOV_TOP)
        .select(F.col("source").alias("src_a"), "g")
    )
    # r14 (guide §2.2): no .distinct() — cnt is the output of
    # groupBy(source, g), so (source, g) is already unique and the
    # distinct was a provably-redundant second |source x vocab| exchange.
    have = cnt.select(F.col("source").alias("src_b"), "g")
    return (
        F.broadcast(top)
        .join(have, "g")
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
        .select(
            "src_a",
            "src_b",
            "n_shared",
            F.round(F.col("n_shared").cast("double") / _XCOV_TOP, 6).alias(
                "coverage"
            ),
        )
    )


# --------------------------------------------------------------------------
# x364 — matched-budget type-token ratio per source (x173's caveat closed)
# --------------------------------------------------------------------------

_MTTR_BUDGET = 20_000  # tokens per source

_MTTR_ORACLE = f"""
WITH sized AS (
  SELECT source, doc_id, text,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS ntok
  FROM documents
),
cum AS (
  SELECT source, doc_id, text, ntok,
         SUM(ntok) OVER (PARTITION BY source ORDER BY doc_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cumtok
  FROM sized
),
prefix AS (
  SELECT source, doc_id, text, ntok, cumtok FROM cum
  WHERE cumtok - ntok < {_MTTR_BUDGET}
),
tok AS (
  SELECT source, unnest(string_split(text, ' ')) AS w FROM prefix
)
SELECT t.source,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(COUNT(DISTINCT t.w) AS BIGINT) AS vocab_size,
       ROUND(CAST(COUNT(DISTINCT t.w) AS DOUBLE) / COUNT(*), 6)
         AS matched_ttr,
       CAST(MAX(p.n_docs) AS BIGINT) AS n_docs_used
FROM tok t
JOIN (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM prefix GROUP BY source) p
  ON t.source = p.source
GROUP BY t.source
"""


@register("text_ttr_matched_budget", oracle=_MTTR_ORACLE)
def text_ttr_matched_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x364: MATCHED-BUDGET type-token ratio per source — TTR computed
    over each source's first ~20k tokens (doc_id-ordered prefix; the
    crossing doc is included, so budgets match to within one doc): the
    apples-to-apples lexical-richness compare x173's own docstring
    says its raw TTR cannot give (TTR falls with length, so comparing
    a 1M-token source to a 50k-token source on raw TTR is comparing
    lengths, not richness). Read next to x349's length-invariant K/D.

    Exactness: token counts and the prefix gate (cumtok - ntok <
    budget) are exact integers off a doc_id-pinned cumulative window;
    vocab is an exact distinct; ONE display division.

    100 TB: doc sizes from one codegen'd split-length pass; the prefix
    gate needs only the cumulative window per source (the corpus never
    re-sorts); only PREFIX docs explode to tokens — the budget bounds
    that to |sources| * ~budget tokens regardless of corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    sized = docs.select(
        "source",
        "doc_id",
        "text",
        F.size(F.split("text", " ")).cast("long").alias("ntok"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = sized.withColumn("cumtok", F.sum("ntok").over(w))
    prefix = cum.filter(F.col("cumtok") - F.col("ntok") < _MTTR_BUDGET)
    tok = prefix.select("source", F.explode(F.split("text", " ")).alias("w"))
    n_docs = prefix.groupBy(F.col("source").alias("p_source")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    return (
        tok.join(F.broadcast(n_docs), tok.source == F.col("p_source"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.countDistinct("w").cast("long").alias("vocab_size"),
            F.round(
                F.countDistinct("w").cast("double") / F.count(F.lit(1)), 6
            ).alias("matched_ttr"),
            F.max("n_docs").cast("long").alias("n_docs_used"),
        )
    )
