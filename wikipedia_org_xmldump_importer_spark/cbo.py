"""Cost-based optimization: catalog registration + statistics (SURVEY.md §4.2).

Spark's CBO (join reordering, stats-based broadcast decisions, better
cardinality estimates through filters) only fires when (a)
``spark.sql.cbo.enabled`` is on AND (b) the relations carry catalog
statistics — which path-based ``spark.read.parquet`` scans never do. This
module closes that loop for our own bench/test sessions:

  * ``register_tables_with_stats`` creates EXTERNAL parquet tables over the
    driver-generated files (metadata only — no data copy) and runs
    ``ANALYZE TABLE ... COMPUTE STATISTICS [FOR ALL COLUMNS]`` so rowCount /
    sizeInBytes / per-column NDV+min/max land in the catalog.
  * ``io.load_table`` then transparently resolves to the stats-bearing
    catalog table when (and only when) the same ``sf_dir`` was registered on
    the calling session — the driver's harness session never registers, so
    its plans are byte-identical to before.

100 TB notes: on a real cluster this is the standing "ANALYZE after load"
discipline — stats are what let Catalyst put the small side of every join on
the build/broadcast side and reorder a star join so the most selective
dimension folds into the fact table first. Column stats (NDV, min/max)
additionally drive filter-cardinality estimates; histogram stats
(``spark.sql.statistics.histogram.enabled``) sharpen skewed columns at the
cost of one extra pass — we leave histograms off by default, matching the
common production setting.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from .io import TABLES

# (applicationId, table) -> sf_dir it was registered for. Module-global is
# correct here: sessions are process-local, and the guard in registered_dir
# re-checks the catalog so a dropped table never resolves stale.
_REGISTERED: dict[tuple[str, str], str] = {}


def enable_cbo(spark: SparkSession) -> None:
    """Turn on cost-based optimization + join reordering for this session.

    Both are runtime SQL confs in Spark 4, so this works on an existing
    session (no restart). Harmless without stats — Catalyst silently falls
    back to the rule-based estimates.
    """
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")


def register_tables_with_stats(
    spark: SparkSession,
    sf_dir: str,
    tables: tuple[str, ...] = TABLES,
    column_stats: bool = True,
) -> None:
    """Register ``{sf_dir}/{name}.parquet`` as external catalog tables and
    collect statistics, enabling CBO for every subsequent ``load_table`` on
    this session at this ``sf_dir``.

    Column stats (NDV, min/max, null count) exist only for atomic types —
    Spark 4's ``FOR ALL COLUMNS`` *throws* on array/map/struct columns
    (UNSUPPORTED_FEATURE.ANALYZE_UNSUPPORTED_COLUMN_TYPE) rather than
    skipping them, so we enumerate the supported columns per table
    ourselves. Table-level stats are one count; column stats are one extra
    aggregate pass per table; both are a one-time setup cost, amortized over
    every query that follows.
    """
    enable_cbo(spark)
    # events.ts is parquet TIMESTAMP(NANOS); schema inference at CREATE time
    # must map it to bigint exactly like the path-read branch does.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    app = spark.sparkContext.applicationId
    for name in tables:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        spark.sql(
            f"CREATE TABLE {name} USING parquet LOCATION '{sf_dir}/{name}.parquet'"
        )
        spark.sql(f"ANALYZE TABLE {name} COMPUTE STATISTICS")
        if column_stats:
            cols = [
                f.name
                for f in spark.table(name).schema.fields
                if _supports_column_stats(f.dataType)
            ]
            if cols:
                col_list = ", ".join(f"`{c}`" for c in cols)
                spark.sql(
                    f"ANALYZE TABLE {name} COMPUTE STATISTICS FOR COLUMNS {col_list}"
                )
        _REGISTERED[(app, name)] = sf_dir


def _supports_column_stats(dt: T.DataType) -> bool:
    """Mirror of Catalyst's AnalyzeColumnCommand supported set: atomic
    numeric/string/binary/boolean/datetime types; no complex types.

    TIMESTAMP_NTZ is deliberately EXCLUDED even though ANALYZE accepts it:
    Spark 4.1's FilterEstimation throws ``scala.MatchError:
    TimestampNTZType`` when a predicate hits an NTZ column that carries
    min/max stats (optimization-phase INTERNAL_ERROR — observed on
    tpch_q3's o_orderdate/l_shipdate filters). The parquet fixtures read
    their timestamps as NTZ, so NTZ columns keep only table-level stats;
    the cardinality loss is limited to date-range filters.
    """
    if isinstance(dt, T.TimestampNTZType):
        return False
    return isinstance(
        dt,
        (
            T.NumericType,
            T.StringType,
            T.BinaryType,
            T.BooleanType,
            T.DateType,
            T.TimestampType,
        ),
    )


def drop_tables(spark: SparkSession, tables: tuple[str, ...] = TABLES) -> None:
    """Drop the registered catalog tables and forget the registration —
    returns the session to pure path-based reads (used by tests that share a
    session so CBO state never leaks across test modules)."""
    app = spark.sparkContext.applicationId
    for name in tables:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        _REGISTERED.pop((app, name), None)


def registered_dir(spark: SparkSession, name: str) -> str | None:
    """The sf_dir ``name`` was registered for on this session, if any and if
    the catalog table still exists (None otherwise)."""
    sf_dir = _REGISTERED.get((spark.sparkContext.applicationId, name))
    if sf_dir is None:
        return None
    if not spark.catalog.tableExists(name):
        return None
    return sf_dir
