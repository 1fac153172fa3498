"""Executed coverage for s5 ``sink_jdbc`` (SURVEY §2.1).

The sandbox has no database *server*, but Spark's own distribution ships
the Derby embedded engine (``jars/derby*.jar`` — it backs the Hive
metastore), so an in-memory Derby database gives a real, executed JDBC
round-trip: ``df.write.format("jdbc")`` → Derby table → ``spark.read.jdbc``
→ row/value equality. If the driver class is absent (a slimmed Spark
build), the test skips with a reason rather than silently passing —
mirroring the st6 protobuf skip in test_streaming.py.
"""

from __future__ import annotations

import pytest
from conftest import SF_SMOKE

from wikipedia_org_xmldump_importer_spark.io import (
    load_table,
    scan_jdbc,
    sink_jdbc,
)

_DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"
_DERBY_URL = "jdbc:derby:memory:sinktest;create=true"


def _derby_available(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(_DERBY_DRIVER)
        return True
    except Exception:  # noqa: BLE001 — Py4J wraps ClassNotFoundException
        return False


def test_sink_jdbc_roundtrip(spark):
    if not _derby_available(spark):
        pytest.skip(
            f"no JDBC driver jar on the Spark classpath ({_DERBY_DRIVER} "
            "not loadable); sink_jdbc code path covered by config test only"
        )
    src = (
        load_table(spark, SF_SMOKE, "nation")
        .select("n_nationkey", "n_name", "n_regionkey")
        .orderBy("n_nationkey")
        .limit(100)
    )
    sink_jdbc(
        src,
        url=_DERBY_URL,
        table="nation_sink",
        mode="overwrite",
        batchsize=50,
        num_partitions=2,
        properties={"driver": _DERBY_DRIVER},
    )
    back = (
        spark.read.format("jdbc")
        .option("url", _DERBY_URL)
        .option("dbtable", "nation_sink")
        .option("driver", _DERBY_DRIVER)
        .load()
    )
    exp = {tuple(r) for r in src.collect()}
    got = {tuple(r) for r in back.collect()}
    assert got == exp
    assert back.count() == src.count()


def test_sink_jdbc_partitioned_write_and_parallel_read(spark):
    """The production shape (r9 verdict task 4): a multi-partition
    parallel write with explicit batchsize/isolationLevel, then a
    predicate-partitioned parallel READ back — asserting the read plan
    actually carries the requested partition count (one JDBC query per
    partition), not a single-connection scan."""
    if not _derby_available(spark):
        pytest.skip(
            f"no JDBC driver jar on the Spark classpath ({_DERBY_DRIVER} "
            "not loadable); sink_jdbc code path covered by config test only"
        )
    url = "jdbc:derby:memory:sinkpar;create=true"
    # Uppercase column names: Spark's JDBC writer CREATEs quoted (case-
    # preserved) columns, but the partition-column / predicate WHERE
    # clauses are embedded unquoted and Derby folds unquoted identifiers
    # to UPPERCASE — lowercase columns would be unreachable from them.
    src = (
        load_table(spark, SF_SMOKE, "customer")
        .selectExpr(
            "c_custkey as C_CUSTKEY",
            "c_name as C_NAME",
            "c_acctbal as C_ACCTBAL",
            "c_nationkey as C_NATIONKEY",
        )
        .repartition(4, "C_CUSTKEY")  # genuinely parallel write tasks
    )
    n_src = src.count()
    assert n_src > 100  # the fixture is big enough to mean something
    sink_jdbc(
        src,
        url=url,
        table="customer_sink",
        mode="overwrite",
        batchsize=64,
        num_partitions=4,
        properties={
            "driver": _DERBY_DRIVER,
            # non-transactional per-partition write: the isolation level
            # governs each task's transaction, not cross-task atomicity
            "isolationLevel": "READ_COMMITTED",
        },
    )
    lo, hi = 0, int(src.agg({"C_CUSTKEY": "max"}).collect()[0][0]) + 1
    back = scan_jdbc(
        spark,
        url,
        "customer_sink",
        partition_column="C_CUSTKEY",
        lower_bound=lo,
        upper_bound=hi,
        num_partitions=4,
        properties={"driver": _DERBY_DRIVER},
    )
    # the parallel-read contract: 4 stride partitions, one query each
    assert back.rdd.getNumPartitions() == 4
    assert {tuple(r) for r in back.collect()} == {tuple(r) for r in src.collect()}
    # explicit predicate partitioning (the other production read shape:
    # caller-owned WHERE clauses, e.g. date slices)
    mid = (lo + hi) // 2
    preds = [f"C_CUSTKEY < {mid}", f"C_CUSTKEY >= {mid}"]
    back2 = scan_jdbc(
        spark,
        url,
        "customer_sink",
        predicates=preds,
        properties={"driver": _DERBY_DRIVER},
    )
    assert back2.rdd.getNumPartitions() == len(preds)
    assert back2.count() == n_src


def test_scan_jdbc_auto_bounds_and_contracts(spark):
    """s21 (r13 verdict task 3): the stride form with OMITTED bounds must
    derive them from one MIN/MAX probe and still return every row — the
    +1 on MAX is load-bearing (Spark's last stride is ``col >= hi`` of the
    second-to-last boundary; a MAX that lands exactly on upperBound's
    boundary arithmetic must stay inside). Also pins the API contracts:
    mutually-exclusive forms, empty predicate list, and the deliberate
    single-connection fallback shape."""
    if not _derby_available(spark):
        pytest.skip(
            f"no JDBC driver jar on the Spark classpath ({_DERBY_DRIVER} "
            "not loadable)"
        )
    url = "jdbc:derby:memory:scanauto;create=true"
    src = (
        load_table(spark, SF_SMOKE, "nation")
        .selectExpr(
            "n_nationkey as N_NATIONKEY",
            "n_name as N_NAME",
            "n_regionkey as N_REGIONKEY",
        )
    )
    sink_jdbc(
        src,
        url=url,
        table="nation_auto",
        mode="overwrite",
        properties={"driver": _DERBY_DRIVER},
    )
    back = scan_jdbc(
        spark,
        url,
        "nation_auto",
        partition_column="N_NATIONKEY",
        num_partitions=3,
        properties={"driver": _DERBY_DRIVER},
    )
    assert back.rdd.getNumPartitions() == 3
    assert {tuple(r) for r in back.collect()} == {tuple(r) for r in src.collect()}

    # single-connection fallback: explicit, 1 partition, full table
    solo = scan_jdbc(
        spark, url, "nation_auto", properties={"driver": _DERBY_DRIVER}
    )
    assert solo.rdd.getNumPartitions() == 1
    assert solo.count() == src.count()

    with pytest.raises(ValueError, match="mutually"):
        scan_jdbc(
            spark,
            url,
            "nation_auto",
            partition_column="N_NATIONKEY",
            predicates=["N_NATIONKEY < 5"],
        )
    with pytest.raises(ValueError, match="non-empty"):
        scan_jdbc(spark, url, "nation_auto", predicates=[])
    with pytest.raises(ValueError, match="num_partitions"):
        scan_jdbc(spark, url, "nation_auto", partition_column="N_NATIONKEY")
