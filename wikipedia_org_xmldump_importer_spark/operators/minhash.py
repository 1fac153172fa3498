"""Deterministic MinHash signature/band construction, shared by the batch
near-dup operator (queries/textops.dedup_minhash_det, x95) and its
streaming twin (streaming/ops.near_dedup_stream, st17) so the two surfaces
can never drift — the same sharing pattern as operators/patterns.py for the
MATCH_RECOGNIZE pair.

Every permutation is md5(k || '|' || shingle): identical text→hex on any
engine, so signatures, band keys, candidate sets and similarity estimates
are bit-exact cross-engine (the property the batch op's full SQL oracle
attests). All construction is narrow projections — no explode until bands,
no shuffle, streaming-safe.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MHD_K = 16  # signature length: 4 bands x 4 rows
MHD_BAND_ROWS = 4
MHD_CAP = 64  # band-bucket cap, mirrored in the batch oracle
MHD_TAU = 0.5
MHD_BANDS = MHD_K // MHD_BAND_ROWS


def shingle_col(text_col: str | Column = "text") -> Column:
    """Distinct word-trigram shingles of a text column (missing trailing
    tokens identified with '' exactly as the oracle's coalesce does)."""
    toks = F.split(text_col if isinstance(text_col, Column) else F.col(text_col), " ")
    # try_element_at, NOT element_at (r13 advisor): under Spark 4's default
    # ANSI mode an out-of-bounds element_at THROWS before coalesce can pad,
    # so a < 3-token doc would crash the signature instead of getting the
    # ''-identified trailing shingles this docstring promises.
    return F.array_distinct(
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


def minhash_bands(df: DataFrame, passthrough: tuple[str, ...] = ()) -> DataFrame:
    """(doc_id, text, *passthrough) -> (doc_id, *passthrough, sig, band, bkey).

    The signature never leaves the row: all MHD_K per-permutation minima are
    array_min(transform(...)) expressions in ONE projection (no explode, no
    groupBy, no shuffle — a fan-out-by-K first cut was 1.7x slower at
    sf0.1), then bands explode WITH the full signature attached so
    downstream bucket logic never re-joins or recomputes the md5 pipeline.

    The shingle array materializes as a named column first: inlining it
    into each of the 16 transform() lambdas re-evaluates the whole
    tokenize+shingle pipeline per permutation (trap #11).
    """
    staged = df.select("doc_id", *passthrough, shingle_col("text").alias("sh"))

    def _minhash(k: int) -> Column:
        return F.array_min(
            F.transform(F.col("sh"), lambda s: F.md5(F.concat(F.lit(f"{k}|"), s)))
        ).alias(f"mh{k}")

    sig = staged.select(
        "doc_id", *passthrough, F.array(*[_minhash(k) for k in range(MHD_K)]).alias("sig")
    )
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(
                    F.concat_ws(
                        ",",
                        *[
                            F.element_at("sig", k + 1)
                            for k in range(b * MHD_BAND_ROWS, (b + 1) * MHD_BAND_ROWS)
                        ],
                    )
                ).alias("bkey"),
            )
            for b in range(MHD_BANDS)
        ]
    )
    return (
        sig.select("doc_id", *passthrough, "sig", F.explode(band_structs).alias("bs"))
        .select(
            "doc_id",
            *passthrough,
            "sig",
            F.col("bs.band").alias("band"),
            F.col("bs.bkey").alias("bkey"),
        )
    )


def estimate_jaccard(sig_a: Column, sig_b: Column) -> Column:
    """Fraction of agreeing signature positions, 6dp-pinned like the oracle."""
    return F.round(
        F.size(F.filter(F.zip_with(sig_a, sig_b, lambda x, y: x == y), lambda eq: eq))
        / F.lit(float(MHD_K)),
        6,
    )
