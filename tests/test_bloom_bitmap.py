"""Decision-equivalence of the broadcast-bitmap Bloom kernel
(functions/bloom.py) against x317's relational 3-semi-join form: same
hash family, same k=3 positions, therefore byte-for-byte identical
verdicts on every train gram — the docstring's 'production swaps in an
actual broadcast bitmap with identical decisions' claim as a test."""

from __future__ import annotations

from conftest import SF_SMOKE
from pyspark.sql import functions as F

from wikipedia_org_xmldump_importer_spark.functions.bloom import (
    bloom_positions,
    build_bitmap,
    screen_with_bitmap,
)
from wikipedia_org_xmldump_importer_spark.io import load_table

_M = 262144  # x317's 2^18
_MOD = 97  # x317's eval split


def _gram_hashes(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    toks = F.split("text", " ")
    grams = docs.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.greatest(F.size(toks) - 2, F.lit(0))),
                lambda i: F.array_join(F.slice(toks, i, 3), " "),
            )
        ).alias("gram"),
    )
    return grams.select(
        "doc_id",
        "gram",
        F.conv(F.substring(F.md5("gram"), 1, 12), 16, 10)
        .cast("long")
        .alias("h"),
    ).distinct()


def test_bitmap_screen_matches_relational_form(spark):
    gh = _gram_hashes(spark)
    is_ev = F.col("doc_id") % _MOD == 0
    ev = gh.filter(is_ev).select("h").distinct()
    tr = gh.filter(~is_ev).select("gram", "h").distinct()

    bitmap = build_bitmap(ev, _M)
    got = {
        r.gram: r.bloom_hit
        for r in screen_with_bitmap(tr, bitmap, _M).collect()
    }

    # relational twin: the x317 spelling (3 semi-joins on positions)
    pos = bloom_positions(F.col("h"), _M)
    bloom = (
        ev.select(pos[0].alias("p"))
        .unionAll(ev.select(pos[1].alias("p")))
        .unionAll(ev.select(pos[2].alias("p")))
        .distinct()
    )
    b = [bloom.select(F.col("p").alias(f"p{i}")) for i in range(3)]
    want_df = (
        tr.join(F.broadcast(b[0]), pos[0] == F.col("p0"), "left")
        .join(F.broadcast(b[1]), pos[1] == F.col("p1"), "left")
        .join(F.broadcast(b[2]), pos[2] == F.col("p2"), "left")
        .select(
            "gram",
            F.when(
                F.col("p0").isNotNull()
                & F.col("p1").isNotNull()
                & F.col("p2").isNotNull(),
                1,
            )
            .otherwise(0)
            .alias("hit"),
        )
    )
    want = {r.gram: r.hit for r in want_df.collect()}
    assert got == want
    # sanity on the fixture: the screen actually separates (some hits,
    # some misses) and no eval member is ever missed (zero false negatives
    # is Bloom's defining guarantee)
    assert 0 < sum(got.values()) < len(got)
    ev_grams = {r.gram for r in gh.filter(is_ev).select("gram").collect()}
    member_train = [g for g in got if g in ev_grams]
    assert member_train, "fixture has no train/eval gram overlap"
    assert all(got[g] == 1 for g in member_train)


def test_bitmap_build_is_bounded_by_m(spark):
    # the driver hop is O(m) bytes no matter how many members go in
    gh = _gram_hashes(spark)
    bitmap = build_bitmap(gh.select("h"), _M)
    assert len(bitmap) == _M // 8  # 32 KB


def test_negative_hashes_are_masked_consistently(spark):
    """The module is advertised for ANY membership screen, so arbitrary
    (possibly negative) long hashes must work: Spark's % is sign-
    preserving while numpy's floors, and an unmasked negative position
    would corrupt the bytearray near its END via Python negative
    indexing. The 48-bit mask must make both paths agree — and every
    member must still screen as a hit (zero false negatives)."""
    vals = [-1, -(1 << 62), -123456789, 0, 1, (1 << 47) - 1,
            -97, 7 << 40, -(7 << 40)]
    members = spark.createDataFrame([(v,) for v in vals], "h long")
    bitmap = build_bitmap(members, _M)
    got = {
        r.h: r.bloom_hit
        for r in screen_with_bitmap(members, bitmap, _M).collect()
    }
    assert all(got[v] == 1 for v in vals)
    # a value whose masked positions were never inserted must miss
    probe = spark.createDataFrame([(424242,)], "h long")
    miss = screen_with_bitmap(probe, bitmap, _M).collect()[0]
    assert miss.bloom_hit == 0
