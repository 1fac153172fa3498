"""Short-document robustness (r13 review findings 1/2) + the pack straddle.

Every fixture doc has >= 10 words, so the ANSI element_at / sequence(1, 0)
crashes in the token-gram kernels were latent: under Spark 4's default ANSI
mode, out-of-bounds ``element_at`` THROWS before ``coalesce`` can pad, and
``sequence(1, size-2)`` expands DESCENDING to [1, 0] for a 2-token doc (then
``slice(toks, 0, n)`` / ``element_at(toks, 0)`` is a runtime error), while
the DuckDB oracles' ``generate_series(1, 0)`` / ``w[i]`` quietly produce
empty sets / NULLs. These tests run every gram-kernel operator against a
synthetic corpus of 0/1/2-token documents — plus a straddle shard proving
the x368 pack_reconciles mass-conservation flag where the rejected
``max(seq_id)+1 == ceil`` spelling reports a false failure.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import types as T

from wikipedia_org_xmldump_importer_spark.registry import REGISTRY, _ensure_loaded

_ensure_loaded()

_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

# 2000-word + 100-word docs in ONE (lang, source) shard: both pass the
# Gopher gates (50..10000 words, mean word len 8, zero symbols), are not
# near-dups, and their combined 2100 tokens straddle the 2048 boundary —
# the last doc STARTS in sequence 0 but spills into sequence 1.
_BULK_A = " ".join(f"aw{i:06d}" for i in range(2000))
_BULK_B = " ".join(f"bw{i:06d}" for i in range(100))

_DOCS = [
    (0, "", "en", "web", 0),  # eval-split member (0 % 97), EMPTY text
    (1, "solo", "en", "web", 4),  # 1 token
    (2, "two tokens", "de", "web", 10),  # 2 tokens
    (3, "alpha beta gamma delta", "en", "book", 22),  # 4 tokens, dup of 4
    (4, "alpha beta gamma delta", "en", "book", 22),
    (97, "alpha beta gamma", "fr", "web", 16),  # eval-split member w/ grams
    (10, _BULK_A, "en", "bulk", len(_BULK_A)),
    (11, _BULK_B, "en", "bulk", len(_BULK_B)),
]

# Every registered op whose plan runs a token-gram kernel over documents.
_GRAM_OPS = (
    "text_fingerprint",
    "dedup_keep_best",
    "dedup_containment",
    "dedup_cluster_cc",
    "dedup_minhash_det",
    "dedup_near_minhash",
    "dedup_ngram_jaccard",
    "dedup_evidence_panel",
    "dedup_simhash",
    "decontaminate_ngram",
    "decontaminate_bloom",
    "decontaminate_bitmap",
    "quality_gopher_rules",
    "pack_sequences",
    "pipeline_e2e_manifest",
)


@pytest.fixture(scope="module")
def short_sf(spark, tmp_path_factory):
    sf_dir = tmp_path_factory.mktemp("short_docs_sf")
    df = spark.createDataFrame(_DOCS, schema=_SCHEMA)
    df.coalesce(1).write.mode("overwrite").parquet(
        str(sf_dir / "documents.parquet")
    )
    return str(sf_dir)


@pytest.mark.parametrize("name", _GRAM_OPS)
def test_gram_ops_survive_short_docs(spark, short_sf, name):
    # the assertion is "does not raise" — ANSI element_at / sequence(1, 0)
    # crashes abort the whole job, so .count() is a sufficient probe
    REGISTRY[name].fn(spark, short_sf).count()


def test_bitmap_parity_on_short_docs(spark, short_sf):
    """Full engine-vs-oracle parity for x367 on the short-doc corpus:
    all-integer output, so equality is exact."""
    got = {
        r.doc_id: (r.n_grams, r.n_bloom_hits, r.is_contaminated)
        for r in REGISTRY["decontaminate_bitmap"].fn(spark, short_sf).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{short_sf}/documents.parquet/*.parquet')"
    )
    want = {
        row[0]: (row[1], row[2], row[3])
        for row in con.execute(REGISTRY["decontaminate_bitmap"].oracle).fetchall()
    }
    assert got == want
    # the 'alpha beta gamma' eval doc leaks its gram into docs 3/4
    assert any(v[2] == 1 for v in got.values()), "fixture lost its leak"


def test_pack_straddle_reconciles(spark, short_sf):
    """The (en, bulk) shard's last doc straddles the 2048 boundary:
    tokens_kept = 2100 -> n_sequences = 2, but max(seq_id)+1 = 1 (seq_id
    marks where a doc STARTS). The rejected ceil-vs-max spelling flags
    this correctly-packed shard as broken; the mass-conservation flag
    must hold."""
    rows = {
        (r.lang, r.source): r
        for r in REGISTRY["pipeline_e2e_manifest"].fn(spark, short_sf).collect()
    }
    bulk = rows[("en", "bulk")]
    assert bulk.n_docs_kept == 2
    assert bulk.tokens_kept == 2100
    assert bulk.n_sequences == 2  # ceil(2100/2048)
    assert bulk.pack_reconciles == 1
    # every other shard reconciles too (incl. all-reject shards w/ 0 kept)
    assert all(r.pack_reconciles == 1 for r in rows.values())


def test_manifest_parity_on_short_docs(spark, short_sf):
    """x368 engine-vs-oracle parity on the short-doc corpus — covers the
    empty/1/2-token docs flowing through quality, fingerprint, packing
    and the mixture epilogue on both engines."""
    got = sorted(
        tuple(r) for r in REGISTRY["pipeline_e2e_manifest"].fn(spark, short_sf).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{short_sf}/documents.parquet/*.parquet')"
    )
    want = sorted(
        tuple(row)
        for row in con.execute(REGISTRY["pipeline_e2e_manifest"].oracle).fetchall()
    )
    assert got == want
