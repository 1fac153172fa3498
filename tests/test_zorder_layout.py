"""s18 sink_zordered: the Z-order layout actually prunes (SURVEY §2.1).

The claim behind x119's projection is that sorting the lake by the
interleaved key makes 2-D predicates skip row groups. This test measures
that from parquet FOOTER METADATA (deterministic, engine-independent):
count row groups whose [min,max] stats overlap a conjunctive
customer-range AND date-range predicate, natural layout vs z-ordered.
"""

from __future__ import annotations

import glob
from datetime import date

import pyarrow.parquet as pq
from conftest import SF_SMOKE  # noqa: F401  (fixture import convention)
from pyspark.sql import functions as F

from wikipedia_org_xmldump_importer_spark.io import load_table, sink_zordered

SF = "/root/testdata/sf0.1"
Z_BITS = 8


def _with_z(df):
    # RANGE bucketing (divide), not modulo: a modulo bucket contains
    # custkeys {a, a+256, ...} spanning the whole domain, so row-group
    # min/max on the RAW column never tightens and nothing prunes (the
    # first run of this test measured exactly that: 136/136 groups hit).
    # Division keeps each bucket a contiguous raw range.
    a = F.floor(F.col("o_custkey") / 64).cast("long")
    b = F.floor(
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp_ntz"))
        / 8
    ).cast("long")
    z = None
    for i in range(Z_BITS):
        term = (F.shiftright(a, i).bitwiseAND(1) * (1 << (2 * i))) + (
            F.shiftright(b, i).bitwiseAND(1) * (1 << (2 * i + 1))
        )
        z = term if z is None else z + term
    return df.withColumn("z", z.cast("long"))


def _overlapping_row_groups(path: str, lo_cust, hi_cust, lo_day, hi_day):
    total = overlap = 0
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        cols = {md.schema.column(i).name: i for i in range(md.num_columns)}
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            total += 1
            c = g.column(cols["o_custkey"]).statistics
            d = g.column(cols["o_orderdate"]).statistics
            if c is None or d is None:
                overlap += 1
                continue
            dmin = d.min.date() if hasattr(d.min, "date") else d.min
            dmax = d.max.date() if hasattr(d.max, "date") else d.max
            if c.max >= lo_cust and c.min <= hi_cust and dmax >= lo_day and dmin <= hi_day:
                overlap += 1
    return total, overlap


def test_zorder_layout_prunes_2d_predicates(spark, tmp_path):
    orders = _with_z(load_table(spark, SF, "orders"))
    natural = str(tmp_path / "natural")
    zord = str(tmp_path / "zorder")
    # natural = time-ordered ingestion (sorted by order key)
    orders.repartitionByRange(8, "o_orderkey").sortWithinPartitions(
        "o_orderkey"
    ).write.option("parquet.block.size", str(64 << 10)).parquet(natural)
    sink_zordered(orders, zord, "z", n_files=8, row_group_bytes=64 << 10)

    # a selective 2-D box: one customer-bucket stripe x one quarter
    lo_c, hi_c = 1000, 1064
    lo_d, hi_d = date(1996, 1, 1), date(1996, 3, 31)
    nat_total, nat_hit = _overlapping_row_groups(natural, lo_c, hi_c, lo_d, hi_d)
    z_total, z_hit = _overlapping_row_groups(zord, lo_c, hi_c, lo_d, hi_d)
    assert nat_total > 20 and z_total > 20, "fixture must produce many row groups"
    # natural layout: custkey is uncorrelated with order key -> every
    # group spans the full custkey range -> ~all groups overlap.
    assert nat_hit >= nat_total * 0.9
    # z-ordered: the box touches a contiguous z-range -> most groups skip
    # (measured 9/136 vs 135/135; assert a conservative 5x margin).
    assert z_hit * 5 <= nat_hit, (z_hit, nat_hit)

    # correctness: both layouts return identical filtered results
    pred = (
        (F.col("o_custkey").between(lo_c, hi_c))
        & (F.col("o_orderdate") >= str(lo_d))
        & (F.col("o_orderdate") <= str(hi_d) + " 23:59:59")
    )
    a = spark.read.parquet(natural).filter(pred).count()
    b = spark.read.parquet(zord).filter(pred).count()
    assert a == b and a > 0
