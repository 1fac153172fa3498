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

from wikipedia_org_xmldump_importer_spark.io import load_table, sink_jdbc

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
