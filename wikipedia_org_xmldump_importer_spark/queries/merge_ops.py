"""SURVEY.md §2 rows x49 (merge_scd1) and x50 (scd2_history).

The reference class's "truncate-or-upsert" load semantics (SURVEY §1.2 [K])
re-expressed as distributed plans: an SCD1 upsert merge and an SCD2
valid-range history — the two canonical ways an importer reconciles a new
dump against an existing snapshot. Kernels live in operators/merge.py; this
module binds them to the driver tables with DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from ..operators.merge import merge_upsert, scd2_snapshot
from ..registry import register
from .flagship import _ratio_pin

# --------------------------------------------------------------------------
# x49 — SCD1 upsert merge (deterministic synthetic delta over orders)
# --------------------------------------------------------------------------
# base  = orders with o_orderkey % 7 != 0   (the existing snapshot)
# delta = orders with o_orderkey % 3 == 0, repriced +5% and restatused 'U'
#         (the incoming dump: some rows update the base, the %7==0 ones are
#         brand-new keys → inserts)

# Money math is integer cents end-to-end: double rounding (round(x*1.05, 2))
# diverges between Spark and DuckDB by 1 cent at half-cent FP representation
# boundaries (judge-verified at sf0.01). Integer cents removes the FP
# rounding step from BOTH engines; the +5% reprice is (cents*105+50) DIV 100
# (exact HALF_UP for non-negative amounts).
_MERGE_ORACLE = """
WITH base AS (
  SELECT o_orderkey, o_custkey, o_orderstatus,
         CAST(round(o_totalprice * 100) AS BIGINT) AS total_cents
  FROM orders WHERE o_orderkey % 7 <> 0
),
delta AS (
  SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
         CAST((CAST(round(o_totalprice * 100) AS BIGINT) * 105 + 50) // 100
              AS BIGINT) AS total_cents
  FROM orders WHERE o_orderkey % 3 = 0
)
SELECT COALESCE(d.o_orderkey, b.o_orderkey) AS o_orderkey,
       CASE WHEN d.o_orderkey IS NOT NULL THEN d.o_custkey
            ELSE b.o_custkey END AS o_custkey,
       CASE WHEN d.o_orderkey IS NOT NULL THEN d.o_orderstatus
            ELSE b.o_orderstatus END AS o_orderstatus,
       CASE WHEN d.o_orderkey IS NOT NULL THEN d.total_cents
            ELSE b.total_cents END AS total_cents,
       CASE WHEN b.o_orderkey IS NULL THEN 'insert'
            WHEN d.o_orderkey IS NULL THEN 'keep'
            ELSE 'update' END AS action
FROM base b FULL JOIN delta d ON b.o_orderkey = d.o_orderkey
"""


@register("merge_scd1", oracle=_MERGE_ORACLE)
def merge_scd1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x49: distributed upsert — the importer's truncate-or-upsert load as
    ONE full-outer shuffle join (operators/merge.py merge_upsert).

    100 TB: the base snapshot is the big side; bucket it on the merge key at
    ingest (s7 sink_bucketed) and only the delta (a daily adds-changes dump,
    orders of magnitude smaller) shuffles; AQE broadcasts the delta when it
    fits. The action column gives the audit counts (inserted/updated/kept)
    for free in the same pass.
    """
    orders = load_table(spark, sf_dir, "orders")
    # Integer cents, not round(x*1.05, 2) on double — see _MERGE_ORACLE note.
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    base = orders.filter(F.col("o_orderkey") % 7 != 0).select(
        "o_orderkey", "o_custkey", "o_orderstatus", cents.alias("total_cents")
    )
    delta = (
        orders.filter(F.col("o_orderkey") % 3 == 0)
        .select(
            "o_orderkey",
            "o_custkey",
            F.lit("U").alias("o_orderstatus"),
            cents.alias("snap_cents"),
        )
        .select(
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            F.expr("(snap_cents * 105 + 50) DIV 100").alias("total_cents"),
        )
    )
    return merge_upsert(base, delta, keys=["o_orderkey"])


# --------------------------------------------------------------------------
# x50 — SCD2 valid-range history (revision-history shape)
# --------------------------------------------------------------------------

_SCD2_ORACLE = """
SELECT o_custkey, o_orderkey,
       CAST(row_number() OVER w AS BIGINT) AS version,
       strftime(o_orderdate, '%Y-%m-%d') AS valid_from,
       strftime(lead(o_orderdate) OVER w, '%Y-%m-%d') AS valid_to,
       lead(o_orderdate) OVER w IS NULL AS is_current
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


@register("scd2_history", oracle=_SCD2_ORACLE)
def scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x50: SCD2 versioning of each customer's order stream — the MediaWiki
    revision-history shape (a row is superseded at its successor's
    timestamp) derived in ONE window pass, no self-join
    (operators/merge.py scd2_snapshot).

    100 TB: one shuffle on the partition key; the sort inside each partition
    is the only extra cost over a scan. valid_to via lead() beats the
    join-to-next-version formulation by an entire shuffle.
    """
    orders = load_table(spark, sf_dir, "orders")
    hist = scd2_snapshot(
        orders.select("o_custkey", "o_orderkey", "o_orderdate"),
        key="o_custkey",
        ts_col="o_orderdate",
        tiebreak="o_orderkey",
    )
    return hist.select(
        "o_custkey",
        "o_orderkey",
        F.col("version").cast("long").alias("version"),
        F.date_format("valid_from", "yyyy-MM-dd").alias("valid_from"),
        F.date_format("valid_to", "yyyy-MM-dd").alias("valid_to"),
        "is_current",
    )


# --------------------------------------------------------------------------
# x74 — dump-refresh snapshot diff (added / removed / changed / unchanged)
# --------------------------------------------------------------------------
# old = customer with c_custkey % 5 != 0           (pre-refresh snapshot)
# new = customer with c_custkey % 7 != 0, balance restated +10 cents for
#       c_custkey % 3 == 0                         (the fresh dump)
# Integer cents throughout (the x49 lesson).

_DIFF_ORACLE = """
WITH old AS (
  SELECT c_custkey, CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
  FROM customer WHERE c_custkey % 5 <> 0
),
new AS (
  SELECT c_custkey,
         CAST(round(c_acctbal * 100) AS BIGINT)
           + CASE WHEN c_custkey % 3 = 0 THEN 10 ELSE 0 END AS bal_cents
  FROM customer WHERE c_custkey % 7 <> 0
)
SELECT COALESCE(o.c_custkey, n.c_custkey) AS c_custkey,
       o.bal_cents AS old_cents, n.bal_cents AS new_cents,
       CASE WHEN o.c_custkey IS NULL THEN 'added'
            WHEN n.c_custkey IS NULL THEN 'removed'
            WHEN o.bal_cents <> n.bal_cents THEN 'changed'
            ELSE 'unchanged' END AS action
FROM old o FULL JOIN new n ON o.c_custkey = n.c_custkey
"""


@register("snapshot_diff", oracle=_DIFF_ORACLE)
def snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x74: dump-to-dump diff — the refresh question every periodic importer
    answers before loading: which keys appeared, vanished, or changed
    between two snapshots (x49 APPLIES a delta; this DERIVES one). One
    full-outer shuffle join on the key with null-presence + value-compare
    classification; the action column aggregates to the refresh audit
    report for free.

    100 TB: same shape as x49 — bucket both snapshots on the key at ingest
    (s7) and the diff is a zero-shuffle sort-merge; a value HASH per row
    (f10) replaces wide-column compares when schemas are fat. Deletes are
    first-class here, unlike upsert merges that never see them."""
    cust = load_table(spark, sf_dir, "customer")
    cents = F.round(F.col("c_acctbal") * 100).cast("long")
    old = cust.filter(F.col("c_custkey") % 5 != 0).select(
        "c_custkey", cents.alias("bal_cents")
    )
    new = cust.filter(F.col("c_custkey") % 7 != 0).select(
        "c_custkey",
        (
            cents
            + F.when(F.col("c_custkey") % 3 == 0, F.lit(10)).otherwise(F.lit(0))
        ).alias("bal_cents"),
    )
    o = old.alias("o")
    n = new.alias("n")
    joined = o.join(n, F.col("o.c_custkey") == F.col("n.c_custkey"), "full_outer")
    action = (
        F.when(F.col("o.c_custkey").isNull(), "added")
        .when(F.col("n.c_custkey").isNull(), "removed")
        .when(F.col("o.bal_cents") != F.col("n.bal_cents"), "changed")
        .otherwise("unchanged")
    )
    return joined.select(
        F.coalesce(F.col("o.c_custkey"), F.col("n.c_custkey")).alias("c_custkey"),
        F.col("o.bal_cents").alias("old_cents"),
        F.col("n.bal_cents").alias("new_cents"),
        action.alias("action"),
    )


# --------------------------------------------------------------------------
# x117 — point-in-time (as-of) lookup over the SCD2 history
# --------------------------------------------------------------------------

_PIT_DATE = "1998-06-15"

_PIT_ORACLE = f"""
WITH hist AS (
  SELECT o_custkey, o_orderkey, o_orderdate AS valid_from,
         lead(o_orderdate) OVER (PARTITION BY o_custkey
                                 ORDER BY o_orderdate, o_orderkey) AS valid_to
  FROM orders
)
SELECT h.o_custkey,
       h.o_orderkey AS version_orderkey,
       strftime(h.valid_from, '%Y-%m-%d') AS valid_from,
       c.c_mktsegment
FROM hist h
JOIN customer c ON c.c_custkey = h.o_custkey
WHERE h.valid_from <= TIMESTAMP '{_PIT_DATE}'
  AND (h.valid_to IS NULL OR h.valid_to > TIMESTAMP '{_PIT_DATE}')
"""


@register("scd2_point_in_time", oracle=_PIT_ORACLE)
def scd2_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x117: point-in-time query over the SCD2 history — "which version of
    each key was live on {_PIT_DATE}?": the AS-OF DIMENSION LOOKUP every
    warehouse report against versioned dimensions runs (x50 BUILDS the
    history; this consumes it). Exactly one version per key qualifies by
    construction — the half-open [valid_from, valid_to) intervals
    partition the timeline, with the open current version catching the
    tail; keys whose first version starts after the PIT date correctly
    vanish.

    100 TB: the validity filter collapses the history to ≤ one row per
    key BEFORE the dimension join (never join-then-filter — the filter is
    on the history side of the shuffle); with the history bucketed by key
    the PIT read is a pruned scan + broadcast-size join per partition."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    hist = scd2_snapshot(
        orders.select("o_custkey", "o_orderkey", "o_orderdate"),
        key="o_custkey",
        ts_col="o_orderdate",
        tiebreak="o_orderkey",
    )
    pit = F.lit(_PIT_DATE).cast("timestamp_ntz")
    live = hist.filter(
        (F.col("valid_from") <= pit)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > pit))
    )
    return live.join(cust, live.o_custkey == cust.c_custkey).select(
        "o_custkey",
        F.col("o_orderkey").alias("version_orderkey"),
        F.date_format("valid_from", "yyyy-MM-dd").alias("valid_from"),
        "c_mktsegment",
    )


# --------------------------------------------------------------------------
# x134 — incremental SCD2 merge (batch append == full recompute)
# --------------------------------------------------------------------------

_SCD2_CUTOFF = "1999-01-01"

# The oracle is the FULL-HISTORY recompute (x50's window over ALL orders).
# The Spark side never recomputes: it touches only the affected keys'
# current rows + the batch. Hash equality between the two IS the operator's
# contract — incremental maintenance must be indistinguishable from a
# rebuild.
_SCD2_MERGE_ORACLE = f"""
SELECT o_custkey, o_orderkey,
       CAST(row_number() OVER w AS BIGINT) AS version,
       strftime(o_orderdate, '%Y-%m-%d') AS valid_from,
       strftime(lead(o_orderdate) OVER w, '%Y-%m-%d') AS valid_to,
       lead(o_orderdate) OVER w IS NULL AS is_current,
       CASE WHEN o_orderdate >= DATE '{_SCD2_CUTOFF}'
            THEN 'batch' ELSE 'history' END AS src
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


@register("scd2_merge_batch", oracle=_SCD2_MERGE_ORACLE)
def scd2_merge_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x134: INCREMENTAL SCD2 maintenance — merge an incoming batch (orders
    on/after the cutoff) into an existing history (x50 built on the
    pre-cutoff snapshot) WITHOUT rebuilding it: close each affected key's
    current version at the key's first batch timestamp, then append batch
    versions numbered from the key's old max. Unaffected keys' rows pass
    through untouched. The oracle is the full recompute over everything —
    the hash match proves incremental == rebuild, the invariant every
    warehouse MERGE must satisfy.

    Correctness precondition (and why it holds here): every batch ts ≥
    cutoff > every history ts, so batch rows always append AFTER a key's
    history in (ts, tiebreak) order — the load pattern of an
    append-arriving dump feed. Out-of-order (backfill) batches need the
    rebuild path on the affected keys instead.

    100 TB: the history scan is filter + one left join against the tiny
    per-key batch stats (first_new, base version); only the batch runs a
    rank window. Cost is O(|history| + |batch| log |batch|) with no
    history re-sort — vs the rebuild's full re-window. In a lakehouse this
    pairs with MERGE INTO / copy-on-write at the file level; the plan
    shape is engine-native here."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate"
    )
    old = orders.filter(F.col("o_orderdate") < _SCD2_CUTOFF)
    batch = orders.filter(F.col("o_orderdate") >= _SCD2_CUTOFF)
    hist = scd2_snapshot(old, key="o_custkey", ts_col="o_orderdate",
                         tiebreak="o_orderkey")

    bstat = batch.groupBy("o_custkey").agg(
        F.min("o_orderdate").alias("first_new")
    )
    # version is row_number per key inside scd2_snapshot, so max(version)
    # == COUNT(*) per key over the pre-cutoff rows — computing it from
    # `old` directly (map-combined count, no window) spares the appended
    # branch a second full derivation of the snapshot's per-key sort (r14).
    vmax = old.groupBy(F.col("o_custkey").alias("v_custkey")).agg(
        F.count(F.lit(1)).alias("base_ver")
    )
    closed = hist.join(bstat, "o_custkey", "left").select(
        "o_custkey",
        "o_orderkey",
        F.col("version").cast("long").alias("version"),
        F.date_format("valid_from", "yyyy-MM-dd").alias("valid_from"),
        F.date_format(
            F.when(
                F.col("is_current") & F.col("first_new").isNotNull(),
                F.col("first_new"),
            ).otherwise(F.col("valid_to")),
            "yyyy-MM-dd",
        ).alias("valid_to"),
        (F.col("is_current") & F.col("first_new").isNull()).alias("is_current"),
        F.lit("history").alias("src"),
    )
    wb = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    appended = (
        batch.join(vmax, batch.o_custkey == F.col("v_custkey"), "left")
        .select(
            "o_custkey",
            "o_orderkey",
            (
                F.coalesce(F.col("base_ver"), F.lit(0))
                + F.row_number().over(wb)
            )
            .cast("long")
            .alias("version"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("valid_from"),
            F.date_format(F.lead("o_orderdate").over(wb), "yyyy-MM-dd").alias(
                "valid_to"
            ),
            F.lead("o_orderdate").over(wb).isNull().alias("is_current"),
            F.lit("batch").alias("src"),
        )
    )
    return closed.unionByName(appended)


# --------------------------------------------------------------------------
# x176 — incremental aggregate-cube refresh (merge == full rebuild)
# --------------------------------------------------------------------------

# Same cutoff as x134: everything before it plays the stored base cube,
# everything on/after it is the newly-landed delta partition. The oracle is
# the one-shot GROUP BY over ALL orders — hash equality proves that
# coalesce-sum merging of mergeable partials is indistinguishable from a
# rebuild, the invariant behind every continuous aggregate / materialized
# rollup refresh.
_CUBE_MERGE_ORACLE = f"""
SELECT o_orderstatus, o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) / 100.0, 2)
         AS revenue
FROM orders
GROUP BY o_orderstatus, o_orderpriority
"""


@register("cube_incremental_refresh", oracle=_CUBE_MERGE_ORACLE)
def cube_incremental_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x176: INCREMENTAL CUBE REFRESH — maintain a (status × priority)
    revenue/count cube by merging the stored base cube (orders before the
    x134 cutoff) with the delta partition's cube (orders on/after it):
    full-outer join on the grain, measures coalesce-summed. The oracle is
    the full one-shot GROUP BY; the hash match proves merge == rebuild.
    x134 maintains row-grain history incrementally; this is the same
    contract one level up, at aggregate grain — the pair covers the two
    halves of a warehouse's nightly load.

    COUNT and SUM are the mergeable partials here; exact integer cents
    make the re-aggregation associative in BIGINT (float partial sums
    would make merge-order observable). AVG would ship (sum, count) and
    divide at the end; MIN/MAX merge directly; exact DISTINCT does NOT
    merge — that's what x144's bitmap partials and x21's HLL sketches are
    for (both registered).

    100 TB: the base cube is a stored ~|cells|-row table (recomputed here
    only because the test has no persisted state); the delta agg scans
    ONLY the newly-landed partition (partition pruning on the date
    predicate); the merge join is |cells| rows — broadcast-trivial. A
    refresh therefore costs O(|delta|), never O(|history|)."""
    orders = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")

    def cube(df: DataFrame) -> DataFrame:
        return df.groupBy("o_orderstatus", "o_orderpriority").agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum(cents).cast("long").alias("cents"),
        )

    base = cube(orders.filter(F.col("o_orderdate") < _SCD2_CUTOFF))
    delta = cube(orders.filter(F.col("o_orderdate") >= _SCD2_CUTOFF))
    merged = base.alias("b").join(
        delta.alias("d"),
        ["o_orderstatus", "o_orderpriority"],
        "full_outer",
    )
    zero = F.lit(0).cast("long")
    return merged.select(
        "o_orderstatus",
        "o_orderpriority",
        (
            F.coalesce(F.col("b.n_orders"), zero)
            + F.coalesce(F.col("d.n_orders"), zero)
        ).alias("n_orders"),
        F.round(
            (
                F.coalesce(F.col("b.cents"), zero)
                + F.coalesce(F.col("d.cents"), zero)
            )
            / 100.0,
            2,
        ).alias("revenue"),
    )


# --------------------------------------------------------------------------
# x191 — open-order AGING report (snapshot bucketed by days outstanding)
# --------------------------------------------------------------------------

_AGING_ORACLE = """
WITH snap AS (SELECT MAX(o_orderdate) AS s FROM orders),
o AS (
  SELECT o_orderpriority,
         date_diff('day', CAST(o_orderdate AS DATE),
                   CAST((SELECT s FROM snap) AS DATE)) AS age_days,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders WHERE o_orderstatus = 'O'
)
SELECT o_orderpriority,
       CASE WHEN age_days <= 30 THEN '0-30'
            WHEN age_days <= 90 THEN '31-90'
            WHEN age_days <= 365 THEN '91-365'
            ELSE '365+' END AS age_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(SUM(cents) / 100.0, 2) AS open_value
FROM o GROUP BY 1, 2
"""


@register("orders_aging_buckets", oracle=_AGING_ORACLE)
def orders_aging_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x191: open-order AGING snapshot — the accounts-receivable-style
    report: every still-open order bucketed by days outstanding at the
    data's own latest order date (data-derived snapshot: deterministic,
    no wall clock — scripts must never call now()), value and count per
    (priority, bucket). x106 (orders_open_backlog) tracks the backlog
    LEVEL through time; this row decomposes one snapshot by staleness —
    the pair answers "how big" and "how rotten".

    Integer day diffs against an exact date; bucket edges integer
    compares; money exact cents.

    100 TB: the snapshot scalar is a 1-row agg broadcast into the scan
    filter's projection; one partial-agg groupBy to |priorities|×4
    cells. Partition pruning applies when orders is date-partitioned."""
    orders = load_table(spark, sf_dir, "orders")
    snap = orders.agg(F.max("o_orderdate").alias("s"))
    o = (
        orders.filter(F.col("o_orderstatus") == "O")
        .crossJoin(F.broadcast(snap))
        .select(
            "o_orderpriority",
            F.datediff(
                F.col("s").cast("date"), F.col("o_orderdate").cast("date")
            ).alias("age_days"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
    )
    bucket = (
        F.when(F.col("age_days") <= 30, "0-30")
        .when(F.col("age_days") <= 90, "31-90")
        .when(F.col("age_days") <= 365, "91-365")
        .otherwise("365+")
    )
    return o.groupBy("o_orderpriority", bucket.alias("age_bucket")).agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.round(F.sum("cents") / 100.0, 2).alias("open_value"),
    )


# --------------------------------------------------------------------------
# x201 — single-sourcing supply risk panel
# --------------------------------------------------------------------------

_SSRC_ORACLE = """
WITH ps AS (
  SELECT l_partkey,
         CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_suppliers,
         CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM lineitem GROUP BY l_partkey
),
t AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_parts,
         CAST(SUM(cents) AS BIGINT) AS all_cents
  FROM ps
)
SELECT CASE WHEN n_suppliers = 1 THEN 'single'
            WHEN n_suppliers = 2 THEN 'dual'
            ELSE 'multi' END AS sourcing,
       CAST(COUNT(*) AS BIGINT) AS n_parts,
       ROUND(SUM(cents) / 100.0, 2) AS revenue,
       (CAST((((COUNT(*) * CAST(2000000 AS HUGEINT) + MAX(t.n_parts)) - (((COUNT(*) * CAST(2000000 AS HUGEINT) + MAX(t.n_parts)) % (2 * CAST(MAX(t.n_parts) AS HUGEINT)) + (2 * CAST(MAX(t.n_parts) AS HUGEINT))) % (2 * CAST(MAX(t.n_parts) AS HUGEINT)))) // (2 * CAST(MAX(t.n_parts) AS HUGEINT))) AS BIGINT) / 1000000.0) AS part_share,
       (CAST((((SUM(cents) * CAST(2000000 AS HUGEINT) + MAX(t.all_cents)) - (((SUM(cents) * CAST(2000000 AS HUGEINT) + MAX(t.all_cents)) % (2 * CAST(MAX(t.all_cents) AS HUGEINT)) + (2 * CAST(MAX(t.all_cents) AS HUGEINT))) % (2 * CAST(MAX(t.all_cents) AS HUGEINT)))) // (2 * CAST(MAX(t.all_cents) AS HUGEINT))) AS BIGINT) / 1000000.0)
         AS revenue_share
FROM ps CROSS JOIN t
GROUP BY 1
"""


@register("supply_single_source_risk", oracle=_SSRC_ORACLE)
def supply_single_source_risk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x201: SINGLE-SOURCING RISK panel — parts bucketed by how many
    distinct suppliers ship them (single / dual / multi), with the part
    count and the exact-cents revenue share riding on each bucket: the
    supply-chain review's first slide, because revenue concentrated on
    single-sourced parts is the failure mode (one supplier outage stops
    the line). x142's Herfindahl scores concentration per part; this row
    rolls the exposure up to the portfolio.

    100 TB: one (part, supplier)-grain distinct expand + part-grain agg
    (two map-combined shuffles), a 3-row bucket agg, and the portfolio
    totals taken from the BUCKET frame itself (every part lands in
    exactly one bucket, so sum-over-buckets of the exact-long counts and
    cents IS the ps-grain total) — the part-grain subtree is derived once
    instead of twice (r14: was ps → totals agg + ps → bucket agg with a
    totals cross join; 10 Exchanges → 8, BroadcastNestedLoopJoin and the
    second part-grain derivation gone). The global window runs over the
    ≤3-row bucket frame, bounded by the bucket domain at any scale.
    Exact integers everywhere but the two display shares."""
    li = load_table(spark, sf_dir, "lineitem")
    ps = li.groupBy("l_partkey").agg(
        F.countDistinct("l_suppkey").cast("long").alias("n_suppliers"),
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
        .cast("long")
        .alias("cents"),
    )
    bucket = (
        F.when(F.col("n_suppliers") == 1, "single")
        .when(F.col("n_suppliers") == 2, "dual")
        .otherwise("multi")
    )
    b = ps.groupBy(bucket.alias("sourcing")).agg(
        F.count(F.lit(1)).cast("long").alias("bn"),
        F.sum("cents").cast("long").alias("bc"),
    )
    w = Window.partitionBy()
    return b.select(
        "sourcing",
        F.col("bn").alias("n_parts"),
        F.round(F.col("bc") / 100.0, 2).alias("revenue"),
        _ratio_pin(F.col("bn"), F.sum("bn").over(w), 1, 6).alias("part_share"),
        _ratio_pin(F.col("bc"), F.sum("bc").over(w), 1, 6).alias(
            "revenue_share"
        ),
    )


# --------------------------------------------------------------------------
# x204 — matched-part price indices (Laspeyres / Paasche / Fisher)
# --------------------------------------------------------------------------
# Per matched part, p_t = cents_t / qty_t. The index sums cross terms
# p₂·q₁ — a ratio per part, and a SUM of doubles is summation-order-
# dependent. Discipline: each cross term is pinned to an integer
# MICRO-CENT value (ROUND(c₂·q₁/qty₂ · 1e6) → BIGINT; the c·q product is
# ≤ ~5e14 here, exact in a double — DECIMAL once per-part volume passes
# 2⁵³), so the sums are exact integers. The convenient identities
# p₁·q₁ = cents₁ and p₂·q₂ = cents₂ make the other two sums pure cents.

_PRICE_IDX_CUTOFF = "1998-05-01"

_PRICE_IDX_ORACLE = f"""
WITH pp AS (
  SELECT l_partkey,
         CAST(SUM(CASE WHEN l_shipdate < TIMESTAMP '{_PRICE_IDX_CUTOFF}'
             THEN CAST(ROUND(l_extendedprice * 100) AS BIGINT) ELSE 0 END)
           AS BIGINT) AS c1,
         CAST(SUM(CASE WHEN l_shipdate < TIMESTAMP '{_PRICE_IDX_CUTOFF}'
             THEN CAST(ROUND(l_quantity * 100) AS BIGINT) ELSE 0 END)
           AS BIGINT) AS q1,
         CAST(SUM(CASE WHEN l_shipdate >= TIMESTAMP '{_PRICE_IDX_CUTOFF}'
             THEN CAST(ROUND(l_extendedprice * 100) AS BIGINT) ELSE 0 END)
           AS BIGINT) AS c2,
         CAST(SUM(CASE WHEN l_shipdate >= TIMESTAMP '{_PRICE_IDX_CUTOFF}'
             THEN CAST(ROUND(l_quantity * 100) AS BIGINT) ELSE 0 END)
           AS BIGINT) AS q2
  FROM lineitem GROUP BY l_partkey
),
m AS (SELECT * FROM pp WHERE q1 > 0 AND q2 > 0),
s AS (
  -- 128-bit accumulators (HUGEINT / Spark DECIMAL(38)): the micro-cent
  -- terms are ~1e14 per part, so a BIGINT total overflows near ~1e5
  -- matched parts — the sf1 scaling sweep (BENCH_SF1) caught exactly
  -- that long-overflow at 2e5 parts. Per-part terms stay BIGINT.
  SELECT CAST(COUNT(*) AS BIGINT) AS n_parts,
         CAST(SUM(c1) AS HUGEINT) AS sum_c1,
         CAST(SUM(c2) AS HUGEINT) AS sum_c2,
         CAST(SUM(CAST(ROUND(CAST(c2 AS DOUBLE) * q1 / q2 * 1000000)
                       AS BIGINT)) AS HUGEINT) AS num_l,
         CAST(SUM(CAST(ROUND(CAST(c1 AS DOUBLE) * q2 / q1 * 1000000)
                       AS BIGINT)) AS HUGEINT) AS den_p
  FROM m
),
idx AS (
  SELECT n_parts,
         (CAST((((num_l * CAST(2000000 AS HUGEINT) + sum_c1 * 1000000) - (((num_l * CAST(2000000 AS HUGEINT) + sum_c1 * 1000000) % (2 * sum_c1 * 1000000) + (2 * sum_c1 * 1000000)) % (2 * sum_c1 * 1000000))) // (2 * sum_c1 * 1000000)) AS BIGINT) / 1000000.0) AS laspeyres,
         (CAST((((sum_c2 * CAST(2000000000000 AS HUGEINT) + den_p) - (((sum_c2 * CAST(2000000000000 AS HUGEINT) + den_p) % (2 * den_p) + (2 * den_p)) % (2 * den_p))) // (2 * den_p)) AS BIGINT) / 1000000.0) AS paasche
  FROM s
)
SELECT n_parts, laspeyres, paasche,
       ROUND(sqrt(laspeyres * paasche), 6) AS fisher
FROM idx
"""


@register("price_index_laspeyres", oracle=_PRICE_IDX_ORACLE)
def price_index_laspeyres(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x204: PRICE INDICES over matched parts across the two halves of the
    ship-date range — Laspeyres (period-1 basket at period-2 prices),
    Paasche (period-2 basket), Fisher (geometric mean): the econ-grade
    answer to "did prices move, volume-mix held constant?" that x89's raw
    YoY revenue growth conflates. Integer-pinned cross-term sums per the
    module comment; p·q identities keep two of the four sums pure cents.

    100 TB: ONE conditional part-grain agg (map-combined; partition-
    pruned on ship date), a 5-number reduce, 1-row epilogue."""
    li = load_table(spark, sf_dir, "lineitem")
    in1 = F.col("l_shipdate") < F.lit(_PRICE_IDX_CUTOFF).cast("timestamp_ntz")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    qty = F.round(F.col("l_quantity") * 100).cast("long")
    pp = li.groupBy("l_partkey").agg(
        F.sum(F.when(in1, cents).otherwise(0)).cast("long").alias("c1"),
        F.sum(F.when(in1, qty).otherwise(0)).cast("long").alias("q1"),
        F.sum(F.when(~in1, cents).otherwise(0)).cast("long").alias("c2"),
        F.sum(F.when(~in1, qty).otherwise(0)).cast("long").alias("q2"),
    )
    m = pp.filter((F.col("q1") > 0) & (F.col("q2") > 0))
    term_l = F.round(
        F.col("c2").cast("double") * F.col("q1") / F.col("q2") * 1000000
    ).cast("long")
    term_p = F.round(
        F.col("c1").cast("double") * F.col("q2") / F.col("q1") * 1000000
    ).cast("long")
    # DECIMAL(38) accumulators, not long: per-part micro-cent terms are
    # ~1e14, so a long SUM overflows once matched parts pass ~1e5 — the
    # sf1 scaling sweep caught this at 2e5 parts (ANSI overflow abort).
    # Mirrored as HUGEINT in the oracle; epilogue divisions are double
    # either way, so the 6dp-pinned outputs are unchanged.
    s = m.agg(
        F.count(F.lit(1)).cast("long").alias("n_parts"),
        F.sum(F.col("c1").cast("decimal(38,0)")).alias("sum_c1"),
        F.sum(F.col("c2").cast("decimal(38,0)")).alias("sum_c2"),
        F.sum(term_l.cast("decimal(38,0)")).alias("num_l"),
        F.sum(term_p.cast("decimal(38,0)")).alias("den_p"),
    )
    # 6dp displays via the integer ratio pin (flagship._ratio_pin): the
    # accumulators are > 2^53, where float(int) conversions can differ by
    # an ULP between engines — only the SMALL pinned quotient may touch
    # float. Fisher keeps a terminal round(): sqrt outputs are irrational,
    # so a display-grid tie is measure-zero (unlike money-grid ratios).
    lasp = _ratio_pin(F.col("num_l"), F.col("sum_c1") * F.lit(1_000_000), 1, 6)
    paas = _ratio_pin(F.col("sum_c2"), F.col("den_p"), 1_000_000, 6)
    return s.select(
        "n_parts",
        lasp.alias("laspeyres"),
        paas.alias("paasche"),
        F.round(F.sqrt(lasp * paas), 6).alias("fisher"),
    )


# --------------------------------------------------------------------------
# x245 — margin waterfall: gross -> discount -> tax decomposition per brand
# --------------------------------------------------------------------------

_WATERFALL_ORACLE = """
WITH cell AS (
  SELECT p.p_brand AS brand,
         CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
           AS gross_c,
         CAST(ROUND(CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
                             * CAST(ROUND(l.l_discount * 100) AS BIGINT))
                         AS DOUBLE) / 100.0) AS BIGINT) AS discount_c,
         CAST(ROUND(CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
                             * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT))
                             * CAST(ROUND(l.l_tax * 100) AS BIGINT))
                         AS DOUBLE) / 10000.0) AS BIGINT) AS tax_c
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY p.p_brand
)
SELECT brand,
       gross_c,
       discount_c,
       CAST(gross_c - discount_c AS BIGINT) AS net_c,
       tax_c,
       CAST(gross_c - discount_c + tax_c AS BIGINT) AS charged_c,
       ROUND(CAST(discount_c AS DOUBLE) / gross_c, 6) AS discount_rate,
       ROUND(CAST(tax_c AS DOUBLE) / (gross_c - discount_c), 6)
         AS effective_tax_rate
FROM cell
"""


@register("finance_margin_waterfall", oracle=_WATERFALL_ORACLE)
def finance_margin_waterfall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x245: MARGIN WATERFALL per brand — the finance bridge report that
    decomposes the invoice arithmetic every TPC-H query embeds
    (price·(1-disc)·(1+tax)) into its ADDITIVE steps: gross -> -discount
    -> net -> +tax -> charged, plus the two effective rates. Waterfalls
    are how revenue movements get EXPLAINED ("how much of the delta is
    discounting vs mix") — the flagship queries compute the endpoints,
    this exposes the bridge.

    Exactness (r11 sweep): every step total is an exact integer-unit sum
    (cents / cents·pct / cents·pct·pct) rounded to cents with ONE
    division — no float accumulation; the bridge identities
    net = gross - discount and charged = net + tax hold EXACTLY in
    integer cents. Rates are pinned divisions of those integers.

    100 TB: one fact scan, brand-grain map-combined agg; the part join
    broadcasts (dim-sized). Period-over-period bridge = two such frames
    joined on brand, all at grid size."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    cell = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias(
                "gross_c"
            ),
            F.round(
                F.sum(
                    F.round(F.col("l_extendedprice") * 100).cast("long")
                    * F.round(F.col("l_discount") * 100).cast("long")
                ).cast("double")
                / 100.0
            )
            .cast("long")
            .alias("discount_c"),
            F.round(
                F.sum(
                    F.round(F.col("l_extendedprice") * 100).cast("long")
                    * (100 - F.round(F.col("l_discount") * 100).cast("long"))
                    * F.round(F.col("l_tax") * 100).cast("long")
                ).cast("double")
                / 10000.0
            )
            .cast("long")
            .alias("tax_c"),
        )
    )
    return cell.select(
        "brand",
        "gross_c",
        "discount_c",
        (F.col("gross_c") - F.col("discount_c")).cast("long").alias("net_c"),
        "tax_c",
        (F.col("gross_c") - F.col("discount_c") + F.col("tax_c"))
        .cast("long")
        .alias("charged_c"),
        F.round(F.col("discount_c").cast("double") / F.col("gross_c"), 6).alias(
            "discount_rate"
        ),
        F.round(
            F.col("tax_c").cast("double") / (F.col("gross_c") - F.col("discount_c")),
            6,
        ).alias("effective_tax_rate"),
    )


# --------------------------------------------------------------------------
# x306 — log-log demand elasticity per brand (grouped OLS on pinned logs)
# --------------------------------------------------------------------------

_ELAST_ORACLE = """
WITH pq AS (
  SELECT l_partkey AS pk,
         CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS qty
  FROM lineitem GROUP BY l_partkey
),
pts AS (
  SELECT p.p_brand AS brand,
         CAST(ROUND(LN(CAST(ROUND(p.p_retailprice * 100) AS DOUBLE)) * 1e6)
              AS BIGINT) AS x,
         CAST(ROUND(LN(CAST(q.qty AS DOUBLE)) * 1e6) AS BIGINT) AS y
  FROM part p JOIN pq q ON q.pk = p.p_partkey
  WHERE q.qty >= 1
),
mo AS (
  SELECT brand, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         SUM(CAST(x AS DECIMAL(38, 0)) * y) AS sxy,
         SUM(CAST(x AS DECIMAL(38, 0)) * x) AS sxx,
         SUM(CAST(y AS DECIMAL(38, 0)) * y) AS syy
  FROM pts GROUP BY brand
),
sl AS (
  SELECT brand, n, sx, sy,
         CAST(n * sxy - CAST(sx AS DECIMAL(38, 0)) * sy AS DOUBLE) AS covn,
         CAST(n * sxx - CAST(sx AS DECIMAL(38, 0)) * sx AS DOUBLE) AS varxn,
         CAST(n * syy - CAST(sy AS DECIMAL(38, 0)) * sy AS DOUBLE) AS varyn
  FROM mo
)
SELECT brand, n AS n_parts,
       ROUND(covn / varxn, 6) AS elasticity,
       ROUND((CAST(sy AS DOUBLE) - covn / varxn * sx) / n / 1e6, 6)
         AS intercept_ln,
       ROUND(covn * covn / (varxn * varyn), 6) AS r2
FROM sl
"""


@register("part_price_elasticity", oracle=_ELAST_ORACLE)
def part_price_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x306: PRICE ELASTICITY OF DEMAND per brand — OLS slope of
    ln(total quantity) on ln(retail price) across the brand's parts
    (the log-log regression whose slope IS the elasticity, scale-free):
    the econometric readout beside x204's price index (which measures
    price movement, not response). Also emits the ln-space intercept
    and R² so a pricing model can judge the fit before trusting the
    slope.

    Determinism: both logs are INTEGER MICRO-NAT pins of integer
    inputs (price cents, summed quantity — x305's lnµ device), so all
    five OLS moments are exact integers (DECIMAL(38)/HUGEINT: the
    micro-nat products reach ~1.4e14 per part and overflow int64 by
    ~1e4 parts per group); slope/intercept/R² are one double epilogue
    per brand on those exact moments — and the µ-nat scale cancels in
    both slope and R² (elasticity is dimensionless).

    100 TB: one map-combined part-grain demand agg, one part→brand
    equi-join, one map-combined 6-moment agg → |brands| rows."""
    li = load_table(spark, sf_dir, "lineitem")
    pt = load_table(spark, sf_dir, "part")
    pq = (
        li.select(
            F.col("l_partkey").alias("pk"),
            F.round("l_quantity").cast("long").alias("qi"),
        )
        .groupBy("pk")
        .agg(F.sum("qi").cast("long").alias("qty"))
        .filter(F.col("qty") >= 1)
    )
    lnmu = lambda c: F.round(F.log(c.cast("double")) * 1e6).cast("long")  # noqa: E731
    pts = pt.join(pq, pt.p_partkey == pq.pk).select(
        F.col("p_brand").alias("brand"),
        lnmu(F.round(F.col("p_retailprice") * 100)).alias("x"),
        lnmu(F.col("qty")).alias("y"),
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    mo = pts.groupBy("brand").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(dec("x") * F.col("y")).alias("sxy"),
        F.sum(dec("x") * F.col("x")).alias("sxx"),
        F.sum(dec("y") * F.col("y")).alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    covn = (n * F.col("sxy") - dec("sx") * sy).cast("double")
    varxn = (n * F.col("sxx") - dec("sx") * sx).cast("double")
    varyn = (n * F.col("syy") - dec("sy") * sy).cast("double")
    sl = mo.select(
        "brand",
        "n",
        "sx",
        "sy",
        covn.alias("covn"),
        varxn.alias("varxn"),
        varyn.alias("varyn"),
    )
    return sl.select(
        F.col("brand"),
        n.alias("n_parts"),
        F.round(F.col("covn") / F.col("varxn"), 6).alias("elasticity"),
        F.round(
            (sy.cast("double") - F.col("covn") / F.col("varxn") * sx)
            / n
            / 1e6,
            6,
        ).alias("intercept_ln"),
        F.round(
            F.col("covn") * F.col("covn") / (F.col("varxn") * F.col("varyn")),
            6,
        ).alias("r2"),
    )


# --------------------------------------------------------------------------
# x312 — SCD Type 3 build (current + previous attribute value columns)
# --------------------------------------------------------------------------

_SCD3_ORACLE = """
WITH seq AS (
  SELECT o_custkey AS ck, o_orderpriority AS val,
         CAST(epoch_us(o_orderdate) AS BIGINT) // 86400000000 AS day,
         o_orderkey AS ok,
         LAG(o_orderpriority) OVER w AS prev_val,
         CASE WHEN o_orderpriority IS DISTINCT FROM LAG(o_orderpriority)
                   OVER w THEN 1 ELSE 0 END AS chg
  FROM orders
  WINDOW w AS (PARTITION BY o_custkey
               ORDER BY epoch_us(o_orderdate), o_orderkey)
),
last_chg AS (
  SELECT ck, val, prev_val, day, ok,
         ROW_NUMBER() OVER (PARTITION BY ck ORDER BY day DESC, ok DESC) AS rk
  FROM seq WHERE chg = 1
),
nchg AS (
  SELECT ck, CAST(SUM(chg) - 1 AS BIGINT) AS n_changes FROM seq GROUP BY ck
)
SELECT l.ck AS custkey,
       l.val AS current_priority,
       l.prev_val AS prev_priority,
       CAST(l.day AS BIGINT) AS changed_at_day,
       n.n_changes
FROM last_chg l JOIN nchg n ON n.ck = l.ck
WHERE l.rk = 1
"""


@register("scd3_prev_column", oracle=_SCD3_ORACLE)
def scd3_prev_column(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x312: SCD TYPE 3 BUILD — the current/previous-value dimension
    variant that completes the SCD ladder (x49 type 1 overwrite, x50
    type 2 history, this one keeps exactly ONE prior value in-row):
    per customer, the latest order priority, the value it replaced,
    the change day and the lifetime change count, derived from the
    order stream in one pass. prev is NULL for never-changed customers
    (their only "change" is the initial value; n_changes counts real
    transitions, Σflags − 1).

    Determinism: ordering is (epoch-day-exact order date, orderkey) —
    the same tiebreak contract as x58; the last-change row is a rank
    pick over that total order; IS DISTINCT FROM makes the first row a
    flagged change in both engines.

    100 TB: ONE shuffle on custkey serves the lag window, the rank and
    the change count (Catalyst shares the sort); output is dimension-
    grain. The incremental form merges this output with yesterday's
    dim exactly like x49."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("ck").orderBy("ots", "ok")
    seq = o.select(
        F.col("o_custkey").alias("ck"),
        F.col("o_orderpriority").alias("val"),
        F.expr(
            "timestampdiff(DAY, CAST('1970-01-01 00:00:00' AS TIMESTAMP_NTZ),"
            " o_orderdate)"
        )
        .cast("long")
        .alias("day"),
        F.expr(
            "timestampdiff(MICROSECOND, CAST('1970-01-01 00:00:00' AS"
            " TIMESTAMP_NTZ), o_orderdate)"
        ).alias("ots"),
        F.col("o_orderkey").alias("ok"),
    ).select(
        "ck",
        "val",
        "day",
        "ok",
        F.lag("val").over(w).alias("prev_val"),
        F.when(
            ~F.col("val").eqNullSafe(F.lag("val").over(w)), 1
        )
        .otherwise(0)
        .alias("chg"),
    )
    # r15 (guide §2.4): the change count rides the SAME ck partition as
    # the lag window (unbounded sum over chg — no new exchange) instead of
    # a second orders scan + lag-window derivation + join back. Every ck's
    # first row has chg=1 (lag NULL, priority non-null), so the row set is
    # unchanged and n_changes = tot_chg - 1 is the same integer.
    # Interleaved 5-shot medians 0.82 -> 0.51 s at sf0.1; corpus window
    # derivations 2 -> 1, join gone.
    seq = seq.withColumn(
        "tot_chg", F.sum("chg").over(Window.partitionBy("ck"))
    )
    last_chg = (
        seq.filter(F.col("chg") == 1)
        .select(
            "ck",
            "val",
            "prev_val",
            "day",
            "tot_chg",
            F.row_number()
            .over(
                Window.partitionBy("ck").orderBy(
                    F.col("day").desc(), F.col("ok").desc()
                )
            )
            .alias("rk"),
        )
        .filter(F.col("rk") == 1)
    )
    return last_chg.select(
        F.col("ck").alias("custkey"),
        F.col("val").alias("current_priority"),
        F.col("prev_val").alias("prev_priority"),
        F.col("day").cast("long").alias("changed_at_day"),
        (F.col("tot_chg") - 1).cast("long").alias("n_changes"),
    )


# --------------------------------------------------------------------------
# x324 — TOPSIS multi-criteria supplier scorecard
# --------------------------------------------------------------------------

_TOPSIS_TOP = 25

_TOPSIS_ORACLE = f"""
WITH base AS (
  SELECT l.l_suppkey AS sk,
         CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100)
                       AS BIGINT)) AS BIGINT) AS rev_cents,
         CAST(COUNT(DISTINCT l.l_orderkey) AS BIGINT) AS n_orders,
         CAST(SUM(CAST(epoch_us(l.l_shipdate) AS BIGINT) // 86400000000
                  - CAST(epoch_us(o.o_orderdate) AS BIGINT) // 86400000000)
              AS BIGINT) AS lag_days,
         CAST(COUNT(*) AS BIGINT) AS n_lines
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
  GROUP BY l.l_suppkey
),
nrm AS (
  SELECT sk, rev_cents, n_orders,
         CAST(lag_days AS DOUBLE) / n_lines AS avg_lag,
         CAST(rev_cents AS DOUBLE)
           / sqrt(SUM(CAST(rev_cents AS DOUBLE) * rev_cents) OVER ()) AS r1,
         CAST(n_orders AS DOUBLE)
           / sqrt(SUM(CAST(n_orders AS DOUBLE) * n_orders) OVER ()) AS r2,
         (CAST(lag_days AS DOUBLE) / n_lines)
           / sqrt(SUM((CAST(lag_days AS DOUBLE) / n_lines)
                      * (CAST(lag_days AS DOUBLE) / n_lines)) OVER ()) AS r3
  FROM base
),
ideal AS (
  SELECT sk, rev_cents, n_orders, avg_lag, r1, r2, r3,
         MAX(r1) OVER () AS b1, MIN(r1) OVER () AS w1,
         MAX(r2) OVER () AS b2, MIN(r2) OVER () AS w2,
         MIN(r3) OVER () AS b3, MAX(r3) OVER () AS w3
  FROM nrm
),
sc AS (
  SELECT sk, rev_cents, n_orders, avg_lag,
         sqrt((r1 - b1) * (r1 - b1) + (r2 - b2) * (r2 - b2)
              + (r3 - b3) * (r3 - b3)) AS dp,
         sqrt((r1 - w1) * (r1 - w1) + (r2 - w2) * (r2 - w2)
              + (r3 - w3) * (r3 - w3)) AS dm
  FROM ideal
)
SELECT sk AS suppkey, rev_cents, n_orders,
       ROUND(avg_lag, 6) AS avg_lag_days,
       ROUND(dm / (dp + dm), 6) AS topsis_score,
       CAST(ROW_NUMBER() OVER (ORDER BY dm / (dp + dm) DESC, sk) AS BIGINT)
         AS rk
FROM sc
QUALIFY rk <= {_TOPSIS_TOP}
"""


@register("supplier_scorecard_topsis", oracle=_TOPSIS_ORACLE)
def supplier_scorecard_topsis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x324: TOPSIS SUPPLIER SCORECARD (Hwang-Yoon 1981) — rank
    suppliers by closeness to the ideal across three criteria (revenue
    ↑, distinct orders ↑, mean ship lag ↓): the multi-criteria
    decision method that beats a weighted sum because it punishes
    being worst-in-class on ANY axis; top-25 with the score. x201
    flags single-source risk; this ranks who to consolidate INTO.

    Determinism: criterion inputs are exact integers (revenue cents,
    order counts, signed lag-day sums); vector normalization, the two
    Euclidean distances and the closeness ratio are one shared-
    parenthesization double chain, rank (score DESC, suppkey)-pinned
    (x300's argument). Unweighted = equal weights; a weights argument
    scales r_i identically in both engines.

    100 TB: one map-combined supplier-grain agg; every window after
    runs on the |suppliers| frame (unpartitioned-window bound =
    supplier count; shard by region first if suppliers outgrow one
    partition)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    # r14 (guide §4.1-adjacent: cheaper built-in for the same value): both
    # columns are midnight TIMESTAMP_NTZ, so timestampdiff(DAY, epoch, a) −
    # timestampdiff(DAY, epoch, b) ≡ datediff(date(a), date(b)) exactly —
    # one integer date subtraction instead of two µs-arithmetic day
    # divisions per row (A/B'd: rows identical, ~5-10% off the agg stage).
    lag = F.expr(
        "datediff(CAST(l_shipdate AS DATE), CAST(o_orderdate AS DATE))"
    ).cast("long")
    base = (
        li.join(o, o.o_orderkey == li.l_orderkey)
        .groupBy(F.col("l_suppkey").alias("sk"))
        .agg(
            F.sum(
                F.round(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
                ).cast("long")
            )
            .cast("long")
            .alias("rev_cents"),
            F.countDistinct("l_orderkey").cast("long").alias("n_orders"),
            F.sum(lag)
            .cast("long")
            .alias("lag_days"),
            F.count(F.lit(1)).cast("long").alias("n_lines"),
        )
    )
    w_all = Window.partitionBy()
    avg_lag = F.col("lag_days").cast("double") / F.col("n_lines")
    r1 = F.col("rev_cents").cast("double") / F.sqrt(
        F.sum(F.col("rev_cents").cast("double") * F.col("rev_cents")).over(w_all)
    )
    r2 = F.col("n_orders").cast("double") / F.sqrt(
        F.sum(F.col("n_orders").cast("double") * F.col("n_orders")).over(w_all)
    )
    r3 = avg_lag / F.sqrt(F.sum(avg_lag * avg_lag).over(w_all))
    nrm = base.select(
        "sk",
        "rev_cents",
        "n_orders",
        avg_lag.alias("avg_lag"),
        r1.alias("r1"),
        r2.alias("r2"),
        r3.alias("r3"),
    )
    ideal = nrm.select(
        "*",
        F.max("r1").over(w_all).alias("b1"),
        F.min("r1").over(w_all).alias("w1"),
        F.max("r2").over(w_all).alias("b2"),
        F.min("r2").over(w_all).alias("w2"),
        F.min("r3").over(w_all).alias("b3"),
        F.max("r3").over(w_all).alias("w3"),
    )
    dp = F.sqrt(
        (F.col("r1") - F.col("b1")) * (F.col("r1") - F.col("b1"))
        + (F.col("r2") - F.col("b2")) * (F.col("r2") - F.col("b2"))
        + (F.col("r3") - F.col("b3")) * (F.col("r3") - F.col("b3"))
    )
    dm = F.sqrt(
        (F.col("r1") - F.col("w1")) * (F.col("r1") - F.col("w1"))
        + (F.col("r2") - F.col("w2")) * (F.col("r2") - F.col("w2"))
        + (F.col("r3") - F.col("w3")) * (F.col("r3") - F.col("w3"))
    )
    sc = ideal.select(
        "sk",
        "rev_cents",
        "n_orders",
        "avg_lag",
        dp.alias("dp"),
        dm.alias("dm"),
    )
    score = F.col("dm") / (F.col("dp") + F.col("dm"))
    return (
        sc.select(
            F.col("sk").alias("suppkey"),
            "rev_cents",
            "n_orders",
            F.round("avg_lag", 6).alias("avg_lag_days"),
            F.round(score, 6).alias("topsis_score"),
            F.row_number()
            .over(Window.orderBy(score.desc(), "sk"))
            .cast("long")
            .alias("rk"),
        )
        .filter(F.col("rk") <= _TOPSIS_TOP)
    )


# --------------------------------------------------------------------------
# x351 — bullwhip-effect ratio: order volatility vs demand volatility
# --------------------------------------------------------------------------

_BULLWHIP_ORACLE = """
WITH om AS (
  SELECT year(o_orderdate) * 12 + month(o_orderdate) AS mth,
         CAST(COUNT(*) AS BIGINT) AS x
  FROM orders GROUP BY 1
),
qm AS (
  SELECT year(l_shipdate) * 12 + month(l_shipdate) AS mth,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS x
  FROM lineitem GROUP BY 1
),
mo AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS s,
         SUM(CAST(x AS HUGEINT) * x) AS ss
  FROM om
),
mq AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS s,
         SUM(CAST(x AS HUGEINT) * x) AS ss
  FROM qm
)
SELECT mo.n AS n_months_orders, mq.n AS n_months_demand,
       ROUND(CAST(mo.n * mo.ss - CAST(mo.s AS HUGEINT) * mo.s AS DOUBLE)
             / CAST(CAST(mo.s AS HUGEINT) * mo.s AS DOUBLE), 6) AS cv2_orders,
       ROUND(CAST(mq.n * mq.ss - CAST(mq.s AS HUGEINT) * mq.s AS DOUBLE)
             / CAST(CAST(mq.s AS HUGEINT) * mq.s AS DOUBLE), 6) AS cv2_demand,
       ROUND((CAST(mo.n * mo.ss - CAST(mo.s AS HUGEINT) * mo.s AS DOUBLE)
              / CAST(CAST(mo.s AS HUGEINT) * mo.s AS DOUBLE))
             / (CAST(mq.n * mq.ss - CAST(mq.s AS HUGEINT) * mq.s AS DOUBLE)
                / CAST(CAST(mq.s AS HUGEINT) * mq.s AS DOUBLE)), 6)
         AS bullwhip,
       CAST(CASE WHEN (mo.n * mo.ss - CAST(mo.s AS HUGEINT) * mo.s)
                      * (CAST(mq.s AS HUGEINT) * mq.s) >
                      (mq.n * mq.ss - CAST(mq.s AS HUGEINT) * mq.s)
                      * (CAST(mo.s AS HUGEINT) * mo.s)
                 THEN 1 ELSE 0 END AS INTEGER) AS amplifying
FROM mo CROSS JOIN mq
"""


@register("orders_bullwhip", oracle=_BULLWHIP_ORACLE)
def orders_bullwhip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x351: BULLWHIP-EFFECT ratio — CV^2 of monthly ORDER counts over
    CV^2 of monthly SHIPPED demand (lineitem quantity): > 1 means order
    placement amplifies demand volatility up the chain (Lee et al.
    1997's measure, the standard CV-squared form used in supply-chain
    econometrics); the chain-level companion to x201/x335's
    supplier-grain risk views.

    Exactness: both monthly series are exact integers (counts; integral
    l_quantity sums); CV^2 = (n*SS - S^2)/S^2 is a ratio of exact
    HUGEINT/DECIMAL(38) integers, each published double ONE identically-
    parenthesized division; the amplifying verdict cross-multiplies the
    two CV^2 fractions entirely in integer land — no float on the
    decision path.

    100 TB: each series map-combines to |months| rows at the first agg;
    the moment aggs are 1-row; the final join is 1x1. Nothing after the
    two monthly aggs scales with the corpus."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    om = orders.groupBy(
        (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("mth")
    ).agg(F.count(F.lit(1)).cast("long").alias("x"))
    qm = li.groupBy(
        (F.year("l_shipdate") * 12 + F.month("l_shipdate")).alias("mth")
    ).agg(F.sum(F.col("l_quantity").cast("long")).cast("long").alias("x"))

    def moments(df, pfx):
        return df.agg(
            F.count(F.lit(1)).cast("long").alias(f"{pfx}_n"),
            F.sum("x").cast("long").alias(f"{pfx}_s"),
            F.sum(dec(F.col("x")) * F.col("x")).alias(f"{pfx}_ss"),
        )

    mo, mq = moments(om, "o"), moments(qm, "q")
    j = mo.crossJoin(F.broadcast(mq))
    num_o = F.col("o_n") * F.col("o_ss") - dec(F.col("o_s")) * F.col("o_s")
    den_o = dec(F.col("o_s")) * F.col("o_s")
    num_q = F.col("q_n") * F.col("q_ss") - dec(F.col("q_s")) * F.col("q_s")
    den_q = dec(F.col("q_s")) * F.col("q_s")
    cv2_o = num_o.cast("double") / den_o.cast("double")
    cv2_q = num_q.cast("double") / den_q.cast("double")
    return j.select(
        F.col("o_n").alias("n_months_orders"),
        F.col("q_n").alias("n_months_demand"),
        F.round(cv2_o, 6).alias("cv2_orders"),
        F.round(cv2_q, 6).alias("cv2_demand"),
        F.round(cv2_o / cv2_q, 6).alias("bullwhip"),
        F.when(num_o * den_q > num_q * den_o, 1)
        .otherwise(0)
        .cast("int")
        .alias("amplifying"),
    )
