"""JDBC sink/source throughput probe (r10 verdict task 7).

The engine's two I/O endpoints beyond parquet are the XML dump source
(priced by tools/bench_xml.py's scaling curve) and the JDBC destination
sink (SURVEY §2.1 s8). This probe prices the second one: push the sf0.1
``lineitem`` fact (the largest fixture table) through the production
write shape — multi-partition parallel JDBC write with explicit
batchsize/isolationLevel — into an embedded Derby database, then read it
back through the stride-partitioned parallel read, and print ONE JSON
line::

    {"metric": "jdbc_sink_mb_per_s", "value": ..., "rows": ...,
     "write_sec": ..., "read_sec": ..., "mb_logical": ...,
     "partitions": ..., "rows_per_s_write": ..., "rows_per_s_read": ...}

MB accounting: the table's parquet footprint on disk (the same "logical
payload" convention the XML curve uses for its input bytes). Derby
embedded is single-JVM — the numbers price the Spark-side JDBC machinery
(task parallelism, batching, type mapping), not a network database; a
server-grade target would shift the constant, not the shape.

Caveats (NOTES.md #31/#35 still apply): per-partition transactions, no
cross-task atomicity; Derby folds unquoted identifiers to uppercase, so
the probe writes uppercase columns exactly as the production tests do.
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

_DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def main() -> int:
    from wikipedia_org_xmldump_importer_spark.io import (
        load_table,
        scan_jdbc,
        sink_jdbc,
    )
    from wikipedia_org_xmldump_importer_spark.session import build_session

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    parts = int(os.environ.get("SPARK_GRAFT_JDBC_PARTS", "8"))
    spark = build_session(app_name="bench-jdbc")
    try:
        try:
            spark._jvm.java.lang.Class.forName(_DERBY_DRIVER)
        except Exception:
            print(json.dumps({"metric": "jdbc_sink_mb_per_s", "value": None,
                              "error": "no Derby driver on classpath"}))
            return 0
        url = "jdbc:derby:memory:benchjdbc;create=true"
        src = load_table(spark, sf_dir, "lineitem").selectExpr(
            *[f"{c} as {c.upper()}" for c in
              load_table(spark, sf_dir, "lineitem").columns]
        ).repartition(parts, "L_ORDERKEY")
        n = src.count()  # materializes the shuffle so the write times JDBC
        mb = os.path.getsize(os.path.join(sf_dir, "lineitem.parquet")) / 1e6

        t0 = time.monotonic()
        sink_jdbc(
            src,
            url=url,
            table="lineitem_sink",
            mode="overwrite",
            batchsize=1000,
            num_partitions=parts,
            properties={"driver": _DERBY_DRIVER,
                        "isolationLevel": "READ_COMMITTED"},
        )
        write_sec = time.monotonic() - t0

        t0 = time.monotonic()
        # s21 endpoint with AUTO-DERIVED bounds: the probe's MIN/MAX query
        # is part of what a production read pays, so it stays in the timing.
        back = scan_jdbc(
            spark, url, "lineitem_sink",
            partition_column="L_ORDERKEY", num_partitions=parts,
            properties={"driver": _DERBY_DRIVER},
        )
        n_back = back.count()
        read_sec = time.monotonic() - t0
        read_parts = back.rdd.getNumPartitions()
        assert n_back == n, f"row-count mismatch: wrote {n}, read {n_back}"
        assert read_parts == parts, f"read fan-out {read_parts} != {parts}"

        print(json.dumps({
            "metric": "jdbc_sink_mb_per_s",
            "value": round(mb / write_sec, 3),
            "rows": n,
            "write_sec": round(write_sec, 3),
            "read_sec": round(read_sec, 3),
            "mb_logical": round(mb, 3),
            "partitions": parts,
            "rows_per_s_write": int(n / write_sec),
            "rows_per_s_read": int(n / read_sec),
            "sf_dir": sf_dir,
        }))
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
