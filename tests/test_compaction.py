"""s16 parquet compaction: the small-file maintenance pass (SURVEY §2.1).

Three contracts, each the thing that breaks at 100 TB if wrong:
  * flat mode is ZERO-SHUFFLE (plan-asserted: no Exchange) and collapses a
    many-tiny-files dir to the byte-derived file count with row equality;
  * partitioned mode rewrites ONLY fragmented partitions in place (dynamic
    overwrite) and leaves healthy partitions' files untouched (same inode
    listing before/after);
  * both are idempotent — a second run is a no-op-shaped pass.
"""

from __future__ import annotations

from conftest import SF_SMOKE
from pyspark.sql import functions as F

from wikipedia_org_xmldump_importer_spark.io import (
    compact_parquet,
    compact_parquet_partitioned,
    load_table,
    parquet_file_stats,
)
from wikipedia_org_xmldump_importer_spark.plans import executed_plan


def _fingerprint(df):
    return df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.xxhash64(*sorted(df.columns)).cast("decimal(38,0)")).alias("h"),
    ).collect()[0]


def test_flat_compaction_collapses_files_zero_shuffle(spark, tmp_path):
    src = str(tmp_path / "frag")
    # Fragment: 64 tiny files for ~6k rows.
    load_table(spark, SF_SMOKE, "lineitem").repartition(64).write.parquet(src)
    before = parquet_file_stats(spark, src)
    assert sum(v["files"] for v in before.values()) == 64

    # The compaction read itself must plan with no Exchange (bin-packed
    # FileScan straight into the sink) — assert on the same conf-scoped read.
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(128 << 20))
    try:
        assert "Exchange" not in executed_plan(spark.read.parquet(src))
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)

    dst = str(tmp_path / "compact")
    report = compact_parquet(spark, src, dst, target_file_mb=128)
    assert report["files_before"] == 64
    # ~1 MB of data at a 128 MB target -> exactly one output file.
    assert report["files_after"] == 1
    assert _fingerprint(spark.read.parquet(dst)) == _fingerprint(
        spark.read.parquet(src)
    )


def test_flat_compaction_many_tiny_files_one_output(spark, tmp_path):
    # 512-file fragmentation: the openCost term must not inflate virtual
    # split size past the target (the BENCH_IO probe caught 5 outputs for
    # 19 MB at the 1 MB open cost; 128 KB keeps it byte-derived).
    src = str(tmp_path / "frag512")
    load_table(spark, SF_SMOKE, "lineitem").repartition(512).write.parquet(src)
    dst = str(tmp_path / "compact512")
    report = compact_parquet(spark, src, dst, target_file_mb=128)
    assert report["files_before"] == 512
    assert report["files_after"] == 1


def test_flat_compaction_idempotent(spark, tmp_path):
    src = str(tmp_path / "frag")
    load_table(spark, SF_SMOKE, "orders").repartition(16).write.parquet(src)
    once = str(tmp_path / "c1")
    twice = str(tmp_path / "c2")
    compact_parquet(spark, src, once, target_file_mb=128)
    r2 = compact_parquet(spark, once, twice, target_file_mb=128)
    assert r2["files_before"] == r2["files_after"] == 1
    assert _fingerprint(spark.read.parquet(twice)) == _fingerprint(
        spark.read.parquet(src)
    )


def test_partitioned_compaction_rewrites_only_fragmented(spark, tmp_path):
    path = str(tmp_path / "events_part")
    ev = load_table(spark, SF_SMOKE, "events").withColumn(
        "day", F.to_date("ts")
    ).drop("ts")  # TIMESTAMP_NTZ round-trips, but day is the partition key
    days = sorted(r.day for r in ev.select("day").distinct().collect())
    assert len(days) >= 3
    healthy_days, frag_days = days[:1], days[1:]
    # Healthy partition: one file. Fragmented partitions: 16 files each.
    ev.filter(F.col("day").isin(healthy_days)).repartition(1).write.partitionBy(
        "day"
    ).parquet(path)
    ev.filter(F.col("day").isin(frag_days)).repartition(16).write.mode(
        "append"
    ).partitionBy("day").parquet(path)

    before = parquet_file_stats(spark, path)
    healthy_leaf = f"day={healthy_days[0]}"
    assert before[healthy_leaf]["files"] == 1
    fp_before = _fingerprint(spark.read.parquet(path).select("event_id", "day"))

    report = compact_parquet_partitioned(spark, path, ["day"], target_file_mb=128)
    assert report["partitions_total"] == len(days)
    assert report["partitions_rewritten"] == len(frag_days)
    assert report["files_after"] == len(frag_days)  # one file per rewritten day

    after = parquet_file_stats(spark, path)
    # Healthy partition untouched: same single file, same byte count.
    assert after[healthy_leaf] == before[healthy_leaf]
    for d in frag_days:
        assert after[f"day={d}"]["files"] == 1
    # Value equality across the whole table.
    assert _fingerprint(
        spark.read.parquet(path).select("event_id", "day")
    ) == fp_before

    # Idempotent: nothing qualifies on the second pass.
    r2 = compact_parquet_partitioned(spark, path, ["day"], target_file_mb=128)
    assert r2["partitions_rewritten"] == 0

def test_partitioned_compaction_null_partition_and_stray_leaf(spark, tmp_path):
    """Advisor r11 edge cases: a NULL-valued hive partition
    (day=__HIVE_DEFAULT_PARTITION__) must be pruned with isNull() and
    actually compacted (the old equality-cast clause was never true, so the
    leaf was silently skipped forever), and an unparseable leaf (a stray
    k-v-less directory) must be skipped and REPORTED, not crash the pass."""
    path = str(tmp_path / "null_part")
    ev = (
        load_table(spark, SF_SMOKE, "events")
        .withColumn("day", F.to_date("ts"))
        .drop("ts")
    )
    days = sorted(r.day for r in ev.select("day").distinct().collect())
    # One real day stays healthy; every other row gets a NULL day -> the
    # __HIVE_DEFAULT_PARTITION__ leaf, fragmented into 16 files.
    healthy = ev.filter(F.col("day") == days[0])
    nulled = ev.filter(F.col("day") != days[0]).withColumn(
        "day", F.lit(None).cast("date")
    )
    healthy.repartition(1).write.partitionBy("day").parquet(path)
    nulled.repartition(16).write.mode("append").partitionBy("day").parquet(path)

    null_leaf = "day=__HIVE_DEFAULT_PARTITION__"
    before = parquet_file_stats(spark, path)
    assert before[null_leaf]["files"] == 16
    fp_before = _fingerprint(spark.read.parquet(path).select("event_id", "day"))

    report = compact_parquet_partitioned(spark, path, ["day"], target_file_mb=128)
    assert report["partitions_rewritten"] == 1
    assert report["leaves_skipped"] == []
    after = parquet_file_stats(spark, path)
    assert after[null_leaf]["files"] == 1
    assert _fingerprint(
        spark.read.parquet(path).select("event_id", "day")
    ) == fp_before
    # the null rows are still null, none were dropped or re-keyed
    n_null = spark.read.parquet(path).filter(F.col("day").isNull()).count()
    assert n_null == nulled.count()


def test_partitioned_compaction_salt_is_content_derived(spark, tmp_path):
    """The split salt must come from row content (xxhash64), never from
    monotonically_increasing_id: a task-position salt changes across stage
    retries and silently duplicates/drops rows in the self-overwrite
    (SPARK-23207 class). Assert the physical plan of the salted frame
    contains no monotonically_increasing_id and the op still splits a
    partition into its byte-derived file count."""
    import ast
    import inspect

    from wikipedia_org_xmldump_importer_spark import io as io_mod

    tree = ast.parse(inspect.getsource(io_mod.compact_parquet_partitioned))
    calls = {
        node.func.attr
        for node in ast.walk(tree)
        if isinstance(node, ast.Call) and isinstance(node.func, ast.Attribute)
    }
    assert "monotonically_increasing_id" not in calls
    assert "xxhash64" in calls
