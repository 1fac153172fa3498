"""Invariant + pure-Python replay tests for the round-8 tenth batch
(x332-x335): the TPC-H completion set — Q1 verbatim plus the Q2/Q11/Q20
adapted shapes.
"""

from __future__ import annotations

from collections import defaultdict
from datetime import date

import pytest
from conftest import SF_SMOKE

from wikipedia_org_xmldump_importer_spark.io import load_table


def test_q1_pricing_summary_python_replay(spark):
    from wikipedia_org_xmldump_importer_spark.queries.flagship import (
        tpch_q1_pricing_summary,
    )

    li = load_table(spark, SF_SMOKE, "lineitem").collect()
    cells: dict[tuple, list] = defaultdict(list)
    for r in li:
        if r.l_shipdate.date() <= date(2001, 9, 2):
            cells[(r.l_returnflag, r.l_linestatus)].append(r)
    rows = {
        (r.l_returnflag, r.l_linestatus): r
        for r in tpch_q1_pricing_summary(spark, SF_SMOKE).collect()
    }
    assert set(rows) == set(cells)
    for key, items in cells.items():
        r = rows[key]
        n = len(items)
        assert r.count_order == n
        assert r.sum_qty == pytest.approx(sum(i.l_quantity for i in items), abs=0.011)
        assert r.sum_base_price == pytest.approx(
            sum(i.l_extendedprice for i in items), abs=0.011
        )
        disc = sum(i.l_extendedprice * (1 - i.l_discount) for i in items)
        assert r.sum_disc_price == pytest.approx(disc, abs=0.011)
        charge = sum(
            i.l_extendedprice * (1 - i.l_discount) * (1 + i.l_tax) for i in items
        )
        assert r.sum_charge == pytest.approx(charge, abs=0.011)
        assert r.avg_qty == pytest.approx(
            sum(i.l_quantity for i in items) / n, abs=2e-6
        )
        assert r.avg_disc == pytest.approx(
            sum(i.l_discount for i in items) / n, abs=2e-6
        )


def test_q2_min_cost_supplier_invariants(spark):
    from wikipedia_org_xmldump_importer_spark.queries.flagship import (
        tpch_q2_min_cost_supplier,
    )

    rows = tpch_q2_min_cost_supplier(spark, SF_SMOKE).collect()
    assert 0 < len(rows) <= 100
    # every surviving row is a EUROPE supplier on a qualifying part
    nations = {
        r.n_nationkey: r.n_regionkey
        for r in load_table(spark, SF_SMOKE, "nation").collect()
    }
    europe = {
        r.r_regionkey
        for r in load_table(spark, SF_SMOKE, "region").collect()
        if r.r_name == "EUROPE"
    }
    supp_nation = {
        r.s_suppkey: r.s_nationkey
        for r in load_table(spark, SF_SMOKE, "supplier").collect()
    }
    parts = {
        r.p_partkey: r
        for r in load_table(spark, SF_SMOKE, "part").collect()
    }
    supp_by_name = defaultdict(list)
    for r in load_table(spark, SF_SMOKE, "supplier").collect():
        supp_by_name[r.s_name].append(r.s_suppkey)
    # recompute the min cost per part over EUROPE suppliers from lineitem
    unit: dict[tuple, float] = {}
    for r in load_table(spark, SF_SMOKE, "lineitem").collect():
        c = round(r.l_extendedprice / r.l_quantity, 2)
        key = (r.l_partkey, r.l_suppkey)
        if key not in unit or c < unit[key]:
            unit[key] = c
    min_eu: dict[int, float] = {}
    for (pk, sk), c in unit.items():
        if nations.get(supp_nation.get(sk)) in europe:
            if pk not in min_eu or c < min_eu[pk]:
                min_eu[pk] = c
    # descending-acctbal order is respected
    bals = [r.s_acctbal for r in rows]
    assert bals == sorted(bals, reverse=True)
    for r in rows:
        p = parts[r.p_partkey]
        assert p.p_size <= 25 and p.p_type == "LARGE"
        assert r.unit_cost == pytest.approx(min_eu[r.p_partkey], abs=1e-9)
        sks = supp_by_name[r.s_name]
        assert any(nations.get(supp_nation[sk]) in europe for sk in sks)


def test_q11_important_volume_python_replay(spark):
    from wikipedia_org_xmldump_importer_spark.queries.flagship import (
        tpch_q11_important_volume,
    )

    supp_nation = {
        r.s_suppkey: r.s_nationkey
        for r in load_table(spark, SF_SMOKE, "supplier").collect()
    }
    nat7 = {
        r.n_nationkey
        for r in load_table(spark, SF_SMOKE, "nation").collect()
        if r.n_name == "NATION_7"
    }
    per_part: dict[int, float] = defaultdict(float)
    for r in load_table(spark, SF_SMOKE, "lineitem").collect():
        if supp_nation.get(r.l_suppkey) in nat7:
            per_part[r.l_partkey] += r.l_extendedprice * (1 - r.l_discount)
    total = round(sum(per_part.values()), 2)
    want = {
        pk: round(v, 2)
        for pk, v in per_part.items()
        if round(v, 2) > total * 0.001
    }
    rows = {r.p_partkey: r for r in tpch_q11_important_volume(spark, SF_SMOKE).collect()}
    assert set(rows) == set(want)
    for pk, v in want.items():
        assert rows[pk].part_value == pytest.approx(v, abs=0.011)
        assert rows[pk].value_share == pytest.approx(v / total, abs=2e-6)


def test_q20_dominant_supplier_python_replay(spark):
    from wikipedia_org_xmldump_importer_spark.queries.flagship import (
        tpch_q20_dominant_supplier,
    )

    parts_small = {
        r.p_partkey
        for r in load_table(spark, SF_SMOKE, "part").collect()
        if r.p_name.startswith("small")
    }
    qty: dict[tuple, float] = defaultdict(float)
    for r in load_table(spark, SF_SMOKE, "lineitem").collect():
        if (
            r.l_partkey in parts_small
            and date(1996, 1, 1) <= r.l_shipdate.date() < date(1997, 1, 1)
        ):
            qty[(r.l_partkey, r.l_suppkey)] += r.l_quantity
    part_tot: dict[int, float] = defaultdict(float)
    for (pk, _), q in qty.items():
        part_tot[pk] += q
    supp = {
        r.s_suppkey: (r.s_name, r.s_nationkey)
        for r in load_table(spark, SF_SMOKE, "supplier").collect()
    }
    nations = {
        r.n_nationkey: (r.n_name, r.n_regionkey)
        for r in load_table(spark, SF_SMOKE, "nation").collect()
    }
    want: dict[tuple, int] = defaultdict(int)
    for (pk, sk), q in qty.items():
        if 2 * q > part_tot[pk]:
            name, nk = supp[sk]
            n_name, rk = nations[nk]
            if rk == 1:
                want[(name, n_name)] += 1
    rows = {
        (r.s_name, r.nation): r.n_parts_dominated
        for r in tpch_q20_dominant_supplier(spark, SF_SMOKE).collect()
    }
    assert rows == dict(want)
