"""Broadcast-bitmap Bloom filter kernel — the production form of
x317 decontaminate_bloom's relational screen (queries/pipeline.py).

x317 spells Bloom membership as three semi-joins against a distinct-
positions table so the decision is DuckDB-oracle-checkable. At scale the
same decisions come cheaper from an actual bitmap: pack the ≤m set bits
into m/8 bytes once, broadcast them (32 KB at m=2^18 — smaller than the
positions table's shuffle footprint), and test candidates with a
vectorized numpy bit-AND inside mapInPandas, zero joins. This module is
that swap, with the decision-equivalence proven by test
(tests/test_bloom_bitmap.py): identical hash family, identical k=3
position derivation, identical verdicts on every train gram.

100 TB notes: the bitmap build collects ONLY distinct bit positions —
bounded by m (the filter's own size), never by corpus rows — so the
driver hop is O(m) regardless of eval-set cardinality; the screen side is
map-local (one Arrow batch in, one bit-test per row, no shuffle). The
same shape serves any membership screen whose filter fits a broadcast
(URL blocklists, eval-set decontamination, seen-ID suppression).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["bloom_positions", "build_bitmap", "screen_with_bitmap"]


#: Hash inputs are masked to 48 bits before position derivation. Spark's
#: ``%`` is sign-preserving while numpy's floors, so a negative h would
#: yield DIFFERENT positions on the two paths (and a negative Python
#: index into the bytearray — silent near-end corruption). The mask makes
#: the non-negativity contract enforced, not assumed; it is a no-op for
#: x317's md5-derived 48-bit hashes.
_HASH_MASK = (1 << 48) - 1


def bloom_positions(h, m: int):
    """The k=3 bit positions of a 48-bit gram hash — the EXACT x317
    family (pure shifts/mods, no RNG, engine-portable). ``h`` is masked
    to 48 bits first so arbitrary long inputs stay non-negative."""
    h = h.bitwiseAND(F.lit(_HASH_MASK))
    return [h % m, F.shiftright(h, 15) % m, F.shiftright(h, 30) % m]


def build_bitmap(member_hashes: DataFrame, m: int) -> bytes:
    """Pack the member set's k·n bit positions into an m-bit bitmap.

    ``member_hashes`` must carry a long column ``h``. Collects only the
    DISTINCT positions (≤ m rows by construction) — the bounded driver
    hop the module docstring prices."""
    h = F.col("h")
    pos = bloom_positions(h, m)
    rows = (
        member_hashes.select(F.explode(F.array(*pos)).alias("p"))
        .distinct()
        .collect()
    )
    bitmap = bytearray(m // 8)
    for r in rows:
        p = int(r.p)
        if not 0 <= p < m:  # masked hashes make this unreachable
            raise ValueError(f"bloom bit position {p} outside [0, {m})")
        bitmap[p >> 3] |= 1 << (p & 7)
    return bytes(bitmap)


def screen_with_bitmap(
    candidates: DataFrame, bitmap: bytes, m: int, hash_col: str = "h"
) -> DataFrame:
    """Append an int ``bloom_hit`` column: 1 iff ALL k positions of
    ``hash_col`` are set in ``bitmap``. Map-local, no shuffle — the
    bitmap ships once per executor via a Spark broadcast."""
    spark = candidates.sparkSession
    b_bits = spark.sparkContext.broadcast(bitmap)
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in candidates.schema.fields
    )
    out_schema += ", bloom_hit int"

    def _screen(batches):
        import numpy as np  # noqa: PLC0415

        bits = np.frombuffer(b_bits.value, dtype=np.uint8)
        for pdf in batches:
            # same 48-bit mask as bloom_positions: keeps numpy's flooring
            # % and Spark's sign-preserving % on identical positions
            h = pdf[hash_col].to_numpy(dtype=np.int64) & _HASH_MASK
            hit = np.ones(len(pdf), dtype=bool)
            for p in (h % m, (h >> 15) % m, (h >> 30) % m):
                hit &= (bits[p >> 3] >> (p & 7).astype(np.uint8)) & 1 == 1
            pdf = pdf.copy()
            pdf["bloom_hit"] = hit.astype("int32")
            yield pdf

    return candidates.mapInPandas(_screen, schema=out_schema)
