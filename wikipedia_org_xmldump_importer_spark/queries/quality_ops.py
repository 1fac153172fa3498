"""Data-quality operators: column profiling, declarative constraint checks,
and a period-over-period audit composite (SURVEY.md §2 rows x92-x94).

A 100 TB lake ingests nothing without a profile + constraint gate in front
of it; these are the engine-native forms — single-scan aggregates whose
output is a tiny report table, never a second copy of the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import register
from .flagship import _pin2, _ratio_pin

# --------------------------------------------------------------------------
# x92 — per-column profile of the orders table
# --------------------------------------------------------------------------

# min/max travel as strings: doubles go through DECIMAL(18,2) so both
# engines print identical fixed-point text (raw double→varchar formatting
# diverges: DuckDB may print 1e+07, the JVM prints 1.0E7).
_PROFILE_ORACLE = """
WITH s AS (
  SELECT
    COUNT(*) AS n_rows,
    COUNT(o_orderkey) AS nn_orderkey, COUNT(DISTINCT o_orderkey) AS nd_orderkey,
      CAST(MIN(o_orderkey) AS VARCHAR) AS mn_orderkey,
      CAST(MAX(o_orderkey) AS VARCHAR) AS mx_orderkey,
    COUNT(o_custkey) AS nn_custkey, COUNT(DISTINCT o_custkey) AS nd_custkey,
      CAST(MIN(o_custkey) AS VARCHAR) AS mn_custkey,
      CAST(MAX(o_custkey) AS VARCHAR) AS mx_custkey,
    COUNT(o_orderstatus) AS nn_status, COUNT(DISTINCT o_orderstatus) AS nd_status,
      CAST(MIN(o_orderstatus) AS VARCHAR) AS mn_status,
      CAST(MAX(o_orderstatus) AS VARCHAR) AS mx_status,
    COUNT(o_totalprice) AS nn_price, COUNT(DISTINCT o_totalprice) AS nd_price,
      CAST(CAST(ROUND(MIN(o_totalprice), 2) AS DECIMAL(18,2)) AS VARCHAR) AS mn_price,
      CAST(CAST(ROUND(MAX(o_totalprice), 2) AS DECIMAL(18,2)) AS VARCHAR) AS mx_price,
    COUNT(o_orderdate) AS nn_date, COUNT(DISTINCT o_orderdate) AS nd_date,
      strftime(MIN(o_orderdate), '%Y-%m-%d') AS mn_date,
      strftime(MAX(o_orderdate), '%Y-%m-%d') AS mx_date,
    COUNT(o_orderpriority) AS nn_prio, COUNT(DISTINCT o_orderpriority) AS nd_prio,
      CAST(MIN(o_orderpriority) AS VARCHAR) AS mn_prio,
      CAST(MAX(o_orderpriority) AS VARCHAR) AS mx_prio
  FROM orders
)
SELECT 'o_orderkey' AS column_name, n_rows, n_rows - nn_orderkey AS n_null,
       nd_orderkey AS n_distinct, mn_orderkey AS min_str, mx_orderkey AS max_str FROM s
UNION ALL SELECT 'o_custkey', n_rows, n_rows - nn_custkey, nd_custkey, mn_custkey, mx_custkey FROM s
UNION ALL SELECT 'o_orderstatus', n_rows, n_rows - nn_status, nd_status, mn_status, mx_status FROM s
UNION ALL SELECT 'o_totalprice', n_rows, n_rows - nn_price, nd_price, mn_price, mx_price FROM s
UNION ALL SELECT 'o_orderdate', n_rows, n_rows - nn_date, nd_date, mn_date, mx_date FROM s
UNION ALL SELECT 'o_orderpriority', n_rows, n_rows - nn_prio, nd_prio, mn_prio, mx_prio FROM s
"""


@register("dq_profile", oracle=_PROFILE_ORACLE)
def dq_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x92: one-scan column profile of `orders` — row count, null count,
    exact distinct count, and min/max (as canonical strings) for every
    column, reshaped to one report row per column.

    ONE aggregate node computes all 6×4 statistics (Spark plans the
    multi-COUNT(DISTINCT) with an `expand` — each input row fans out once
    per distinct-column, partial-aggregated map-side), then a 1-row-wide
    unpivot emits the report. Never six scans.

    100 TB: this is the exact-profile variant; swap COUNT(DISTINCT) for
    approx_count_distinct when a 2% error is acceptable and the expand
    factor hurts (documented knob, same report schema)."""
    o = load_table(spark, sf_dir, "orders")
    dec_min = F.round(F.min("o_totalprice"), 2).cast("decimal(18,2)").cast("string")
    dec_max = F.round(F.max("o_totalprice"), 2).cast("decimal(18,2)").cast("string")
    s = o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[
            e
            for c, mn, mx in (
                ("o_orderkey", F.min("o_orderkey").cast("string"), F.max("o_orderkey").cast("string")),
                ("o_custkey", F.min("o_custkey").cast("string"), F.max("o_custkey").cast("string")),
                ("o_orderstatus", F.min("o_orderstatus"), F.max("o_orderstatus")),
                ("o_totalprice", dec_min, dec_max),
                ("o_orderdate", F.date_format(F.min("o_orderdate"), "yyyy-MM-dd"), F.date_format(F.max("o_orderdate"), "yyyy-MM-dd")),
                ("o_orderpriority", F.min("o_orderpriority"), F.max("o_orderpriority")),
            )
            for e in (
                F.count(c).alias(f"nn_{c}"),
                F.countDistinct(c).alias(f"nd_{c}"),
                mn.alias(f"mn_{c}"),
                mx.alias(f"mx_{c}"),
            )
        ],
    )
    rows = []
    for c in (
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    ):
        rows.append(
            s.select(
                F.lit(c).alias("column_name"),
                F.col("n_rows"),
                (F.col("n_rows") - F.col(f"nn_{c}")).alias("n_null"),
                F.col(f"nd_{c}").alias("n_distinct"),
                F.col(f"mn_{c}").alias("min_str"),
                F.col(f"mx_{c}").alias("max_str"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


# --------------------------------------------------------------------------
# x93 — declarative constraint violations report
# --------------------------------------------------------------------------

_CONSTRAINT_ORACLE = """
SELECT 'pk_unique_orderkey' AS constraint_name,
       (SELECT COUNT(*) - COUNT(DISTINCT o_orderkey) FROM orders) AS n_violations
UNION ALL
SELECT 'fk_orders_customer',
       (SELECT COUNT(*) FROM orders o WHERE NOT EXISTS (
          SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
UNION ALL
SELECT 'chk_totalprice_positive',
       (SELECT COUNT(*) FROM orders WHERE o_totalprice <= 0)
UNION ALL
SELECT 'set_orderstatus_valid',
       (SELECT COUNT(*) FROM orders WHERE o_orderstatus NOT IN ('F', 'O', 'P'))
UNION ALL
SELECT 'nonnull_orderdate',
       (SELECT COUNT(*) FROM orders WHERE o_orderdate IS NULL)
"""


@register("dq_constraints", oracle=_CONSTRAINT_ORACLE)
def dq_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x93: violation counts for a declared constraint suite over `orders`
    — primary-key uniqueness, referential integrity to `customer`, a value
    range, an accepted set, and a non-null gate. The report shape (one row
    per constraint, zero is the passing value) is what a CI data gate
    asserts on before publishing a partition.

    The four single-table checks fold into ONE aggregate over one scan
    (conditional sums + count-distinct); only the FK check needs a second
    input — an anti join against the dimension's key column, counted.

    100 TB: the anti join broadcasts the ~key-only dim side; everything
    else is map-side partial aggregation. No data copy, no row-level
    quarantine here — chain filter_pred on the violating predicate to
    extract offenders."""
    o = load_table(spark, sf_dir, "orders")
    cust_keys = load_table(spark, sf_dir, "customer").select("c_custkey")
    single = o.agg(
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias("pk_unique_orderkey"),
        F.sum(F.when(F.col("o_totalprice") <= 0, 1).otherwise(0)).alias(
            "chk_totalprice_positive"
        ),
        F.sum(
            F.when(~F.col("o_orderstatus").isin("F", "O", "P"), 1).otherwise(0)
        ).alias("set_orderstatus_valid"),
        F.sum(F.when(F.col("o_orderdate").isNull(), 1).otherwise(0)).alias(
            "nonnull_orderdate"
        ),
    )
    fk = (
        o.join(cust_keys, o.o_custkey == cust_keys.c_custkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.lit("fk_orders_customer").alias("constraint_name"),
            F.col("n").alias("n_violations"),
        )
    )
    parts = [
        single.select(
            F.lit(name).alias("constraint_name"),
            F.col(name).cast("long").alias("n_violations"),
        )
        for name in (
            "pk_unique_orderkey",
            "chk_totalprice_positive",
            "set_orderstatus_valid",
            "nonnull_orderdate",
        )
    ]
    out = parts[0].unionByName(fk)
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# --------------------------------------------------------------------------
# x94 — year-over-year revenue growth per nation
# --------------------------------------------------------------------------

_YOY_ORACLE = """
WITH yearly AS (
  SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS INTEGER) AS yr,
         CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
                  * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT)))
              AS BIGINT) AS rev_u
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY n.n_name, year(o.o_orderdate)
),
lagged AS (
  SELECT nation, yr, rev_u,
         LAG(rev_u) OVER (PARTITION BY nation ORDER BY yr) AS prev_u
  FROM yearly
)
SELECT nation, yr,
       (CAST((((rev_u + 50) - (((rev_u + 50) % 100 + 100) % 100)) // 100) AS BIGINT) / 100.0) AS revenue,
       (CAST((((prev_u + 50) - (((prev_u + 50) % 100 + 100) % 100)) // 100) AS BIGINT) / 100.0) AS prev_revenue,
       CASE WHEN prev_u IS NULL THEN NULL
            ELSE (CAST(((((rev_u - prev_u) * CAST(2000000 AS HUGEINT) + prev_u) - ((((rev_u - prev_u) * CAST(2000000 AS HUGEINT) + prev_u) % (2 * CAST(prev_u AS HUGEINT)) + (2 * CAST(prev_u AS HUGEINT))) % (2 * CAST(prev_u AS HUGEINT)))) // (2 * CAST(prev_u AS HUGEINT))) AS BIGINT) / 1000000.0)
       END AS yoy_growth
FROM lagged
"""


@register("rev_yoy_growth", oracle=_YOY_ORACLE)
def rev_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x94: year-over-year revenue growth per nation — the standard
    period-over-period report: star-join aggregate to (nation, year)
    grain, then LAG within nation and a growth ratio. First fiscal year
    emits NULL growth (no fabricated zero).

    Determinism (r11 sweep): yearly revenue is an exact integer
    1e-4-dollar sum; the lag, the growth numerator, and both displayed
    dollar values are integer operations with ONE division each.

    100 TB: the join/agg reuses the flagship star shape (fact shuffles
    on its FK chain, dims broadcast); the window partitions on the tiny
    (nation) grain AFTER aggregation — it sorts |nations|×|years| rows,
    not the fact table."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    # Aggregate BEFORE the join chain (r14): the exact integer rev_u sum
    # is associative, so lineitem collapses to per-order partials map-side
    # first and the star joins probe order-grain rows instead of the full
    # fact (interleaved 1.05 -> 0.94 s at sf0.1; at scale the orders join
    # shuffles 4x fewer, narrower rows).
    lo = li.groupBy("l_orderkey").agg(
        F.sum(
            F.round(F.col("l_extendedprice") * 100).cast("long")
            * (100 - F.round(F.col("l_discount") * 100).cast("long"))
        ).alias("rev_u")
    )
    yearly = (
        lo.join(orders, lo.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("yr")
        )
        .agg(F.sum("rev_u").alias("rev_u"))
    )
    w = Window.partitionBy("nation").orderBy("yr")
    prev_u = F.lag("rev_u").over(w)
    return yearly.select(
        "nation",
        "yr",
        _pin2(F.col("rev_u"), 10000).alias("revenue"),
        _pin2(prev_u, 10000).alias("prev_revenue"),
        F.when(prev_u.isNull(), F.lit(None).cast("double"))
        .otherwise(_ratio_pin(F.col("rev_u") - prev_u, prev_u, 1, 6))
        .alias("yoy_growth"),
    )


# --------------------------------------------------------------------------
# x133 — curation ablation report: per-gate kill attribution
# --------------------------------------------------------------------------

_ABLATION_ORACLE = """
WITH f AS (
  SELECT doc_id,
         n_chars >= 200 AS g_len,
         len(string_split(text, ' ')) >= 30 AS g_words,
         ROW_NUMBER() OVER (PARTITION BY md5(lower(trim(text)))
                            ORDER BY doc_id) = 1 AS g_dup,
         CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
           / len(string_split(text, ' ')) >= 0.3 AS g_rep
  FROM documents
),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(CASE WHEN g_len AND g_words AND g_dup AND g_rep
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_survivors,
         CAST(SUM(CASE WHEN NOT g_len THEN 1 ELSE 0 END) AS BIGINT) AS f_len,
         CAST(SUM(CASE WHEN NOT g_words THEN 1 ELSE 0 END) AS BIGINT) AS f_words,
         CAST(SUM(CASE WHEN NOT g_dup THEN 1 ELSE 0 END) AS BIGINT) AS f_dup,
         CAST(SUM(CASE WHEN NOT g_rep THEN 1 ELSE 0 END) AS BIGINT) AS f_rep,
         CAST(SUM(CASE WHEN NOT g_len AND g_words AND g_dup AND g_rep
                       THEN 1 ELSE 0 END) AS BIGINT) AS u_len,
         CAST(SUM(CASE WHEN g_len AND NOT g_words AND g_dup AND g_rep
                       THEN 1 ELSE 0 END) AS BIGINT) AS u_words,
         CAST(SUM(CASE WHEN g_len AND g_words AND NOT g_dup AND g_rep
                       THEN 1 ELSE 0 END) AS BIGINT) AS u_dup,
         CAST(SUM(CASE WHEN g_len AND g_words AND g_dup AND NOT g_rep
                       THEN 1 ELSE 0 END) AS BIGINT) AS u_rep
  FROM f
)
SELECT 'min_length' AS gate, f_len AS n_failed, u_len AS n_unique_kills,
       n_docs, n_survivors FROM agg
UNION ALL SELECT 'min_words', f_words, u_words, n_docs, n_survivors FROM agg
UNION ALL SELECT 'exact_dedup', f_dup, u_dup, n_docs, n_survivors FROM agg
UNION ALL SELECT 'repetition', f_rep, u_rep, n_docs, n_survivors FROM agg
"""


@register("curation_ablation_report", oracle=_ABLATION_ORACLE)
def curation_ablation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x133: per-gate ABLATION of the curation funnel — for each quality
    gate (min length, min words, exact dedup, repetition ratio): how many
    docs it fails outright, and how many it UNIQUELY kills (docs every
    other gate passes). Unique kills are the gate's marginal contribution
    — a gate with n_failed ≫ 0 but n_unique_kills ≈ 0 is redundant and a
    candidate for removal; this is the report a data-curation team reads
    before retuning thresholds (x44 reports the funnel totals; this row
    attributes them).

    100 TB: flags need one scan + the dedup-window shuffle; everything
    collapses to a 1-row aggregate, and the 4-row long form is a stack()
    over that row — no second pass, no join. Gate set + thresholds are
    the retune knobs; adding a gate adds two CASE sums, not a scan."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy(F.md5(F.lower(F.trim("text")))).orderBy("doc_id")
    words = F.size(F.split("text", " "))
    f = docs.select(
        (F.col("n_chars") >= 200).alias("g_len"),
        (words >= 30).alias("g_words"),
        (F.row_number().over(w) == 1).alias("g_dup"),
        (
            F.size(F.array_distinct(F.split("text", " "))).cast("double") / words
            >= 0.3
        ).alias("g_rep"),
    )

    def fails(c):
        return F.sum(F.when(~F.col(c), 1).otherwise(0)).cast("long")

    def unique_kill(c):
        others = [o for o in ("g_len", "g_words", "g_dup", "g_rep") if o != c]
        cond = ~F.col(c)
        for o in others:
            cond = cond & F.col(o)
        return F.sum(F.when(cond, 1).otherwise(0)).cast("long")

    agg = f.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(
            F.when(
                F.col("g_len") & F.col("g_words") & F.col("g_dup") & F.col("g_rep"),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_survivors"),
        fails("g_len").alias("f_len"),
        fails("g_words").alias("f_words"),
        fails("g_dup").alias("f_dup"),
        fails("g_rep").alias("f_rep"),
        unique_kill("g_len").alias("u_len"),
        unique_kill("g_words").alias("u_words"),
        unique_kill("g_dup").alias("u_dup"),
        unique_kill("g_rep").alias("u_rep"),
    )
    return agg.select(
        F.expr(
            "stack(4, "
            "'min_length', f_len, u_len, "
            "'min_words', f_words, u_words, "
            "'exact_dedup', f_dup, u_dup, "
            "'repetition', f_rep, u_rep) AS (gate, n_failed, n_unique_kills)"
        ),
        "n_docs",
        "n_survivors",
    )


# --------------------------------------------------------------------------
# x145 — k-anonymity audit over quasi-identifiers
# --------------------------------------------------------------------------

_KANON_K = 5

_KANON_ORACLE = f"""
WITH q AS (
  SELECT c_nationkey,
         c_mktsegment,
         CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT) AS bal_bucket
  FROM customer
),
g AS (
  SELECT c_nationkey, c_mktsegment, bal_bucket,
         CAST(COUNT(*) AS BIGINT) AS group_size
  FROM q GROUP BY c_nationkey, c_mktsegment, bal_bucket
)
SELECT c_nationkey, c_mktsegment, bal_bucket, group_size,
       CAST(group_size < {_KANON_K} AS BOOLEAN) AS violates_k
FROM g
"""


@register("privacy_k_anonymity", oracle=_KANON_ORACLE)
def privacy_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x145: k-ANONYMITY audit — group the customer table by its
    quasi-identifier tuple (nation, market segment, account-balance
    thousand-bucket) and flag every equivalence class smaller than
    k={_KANON_K}. This is the release gate privacy law actually asks of a
    data publisher: any flagged class re-identifies its members by QI
    alone; the remediation (suppress or coarsen the bucket) follows
    directly from the report. The balance bucket is FLOOR over a double
    divide — identical correctly-rounded IEEE ops on both engines, with
    the usual measure-zero boundary note (cents that are exact multiples
    of 100000 divide exactly).

    100 TB: one partial-agg groupBy on the QI tuple — the report is
    |classes| rows, never a data copy; generalization ladders (coarser
    buckets) re-run the same single scan."""
    cust = load_table(spark, sf_dir, "customer")
    q = cust.select(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / F.lit(1000.0)).cast("long").alias("bal_bucket"),
    )
    g = q.groupBy("c_nationkey", "c_mktsegment", "bal_bucket").agg(
        F.count(F.lit(1)).cast("long").alias("group_size")
    )
    return g.select(
        "c_nationkey",
        "c_mktsegment",
        "bal_bucket",
        "group_size",
        (F.col("group_size") < _KANON_K).alias("violates_k"),
    )


# --------------------------------------------------------------------------
# x148 — join-key skew diagnostic (the salting-decision report)
# --------------------------------------------------------------------------

_SKEW_TOPN = 10

_SKEW_ORACLE = f"""
WITH k AS (
  SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n
  FROM orders GROUP BY o_custkey
),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
         CAST(SUM(n) AS BIGINT) AS n_rows,
         CAST(MAX(n) AS BIGINT) AS max_n
  FROM k
)
SELECT rk AS hot_rank, o_custkey, n,
       ROUND(CAST(n AS DOUBLE) / (CAST(n_rows AS DOUBLE) / n_keys), 6)
         AS skew_factor
FROM (
  SELECT o_custkey, n, ROW_NUMBER() OVER (ORDER BY n DESC, o_custkey) AS rk
  FROM k
) CROSS JOIN s
WHERE rk <= {_SKEW_TOPN}
"""


@register("dq_skew_report", oracle=_SKEW_ORACLE)
def dq_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x148: join-key SKEW diagnostic — per-key row counts on the orders
    customer key, top-{_SKEW_TOPN} hottest keys with their skew factor
    (key count ÷ mean rows-per-key). This is the report that DECIDES the
    mitigation x20 (join_skew_salted) implements and that AQE's skew-join
    threshold needs tuning against: a skew factor ≫ 1 on a join key means
    one reducer owns that key's entire partition at shuffle time.

    100 TB: key-grain partial agg (map-side combine collapses hot keys
    per task), a 3-number global frame broadcast onto the key table, and
    an integer-ordered top-N — TakeOrderedAndProject, no full sort. The
    mean in the skew factor is exact-integer-sum ÷ exact count, spelled
    identically on both engines."""
    orders = load_table(spark, sf_dir, "orders")
    k = orders.groupBy("o_custkey").agg(F.count(F.lit(1)).cast("long").alias("n"))
    s = k.agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum("n").cast("long").alias("n_rows"),
        F.max("n").cast("long").alias("max_n"),
    )
    w = Window.orderBy(F.col("n").desc(), "o_custkey")
    ranked = k.withColumn("hot_rank", F.row_number().over(w).cast("long")).filter(
        F.col("hot_rank") <= _SKEW_TOPN
    )
    return ranked.crossJoin(F.broadcast(s)).select(
        "hot_rank",
        "o_custkey",
        "n",
        F.round(
            F.col("n").cast("double")
            / (F.col("n_rows").cast("double") / F.col("n_keys")),
            6,
        ).alias("skew_factor"),
    )


# --------------------------------------------------------------------------
# x162 — l-diversity audit (the sensitive-attribute companion to x145)
# --------------------------------------------------------------------------

_LDIV_L = 3

_LDIV_ORACLE = f"""
WITH q AS (
  SELECT c_nationkey,
         CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT) AS bal_bucket,
         c_mktsegment
  FROM customer
),
g AS (
  SELECT c_nationkey, bal_bucket,
         CAST(COUNT(*) AS BIGINT) AS group_size,
         CAST(COUNT(DISTINCT c_mktsegment) AS BIGINT) AS n_sensitive
  FROM q GROUP BY c_nationkey, bal_bucket
)
SELECT c_nationkey, bal_bucket, group_size, n_sensitive,
       CAST(n_sensitive < {_LDIV_L} AS BOOLEAN) AS violates_l
FROM g
"""


@register("privacy_l_diversity", oracle=_LDIV_ORACLE)
def privacy_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x162: l-DIVERSITY audit — x145's necessary companion: a QI class
    can be k-anonymous yet still leak if every member shares the same
    SENSITIVE value (homogeneity attack). Here QI = (nation,
    balance-thousand bucket), sensitive = market segment; flag classes
    with fewer than l={_LDIV_L} distinct sensitive values. Together the
    two reports are the minimal release gate: x145 bounds
    re-identification, this bounds attribute disclosure.

    100 TB: one groupBy with a distinct-count — the distinct expands to
    (QI, sensitive) grain map-side; report is |classes| rows. Entropy
    l-diversity upgrades via x113's fixed-point entropy device."""
    cust = load_table(spark, sf_dir, "customer")
    q = cust.select(
        "c_nationkey",
        F.floor(F.col("c_acctbal") / F.lit(1000.0)).cast("long").alias("bal_bucket"),
        "c_mktsegment",
    )
    g = q.groupBy("c_nationkey", "bal_bucket").agg(
        F.count(F.lit(1)).cast("long").alias("group_size"),
        F.countDistinct("c_mktsegment").cast("long").alias("n_sensitive"),
    )
    return g.select(
        "c_nationkey",
        "bal_bucket",
        "group_size",
        "n_sensitive",
        (F.col("n_sensitive") < _LDIV_L).alias("violates_l"),
    )


# --------------------------------------------------------------------------
# x189 — t-closeness audit (completes the x145/x162 privacy release gate)
# --------------------------------------------------------------------------

_TCLOSE_NUM, _TCLOSE_DEN = 1, 4  # t = 1/4

_TCLOSE_ORACLE = """
WITH q AS (
  SELECT c_nationkey,
         CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT) AS bal_bucket,
         c_mktsegment
  FROM customer
),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS big_n FROM q),
segs AS (SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS g FROM q
         GROUP BY c_mktsegment),
cls AS (SELECT c_nationkey, bal_bucket, CAST(COUNT(*) AS BIGINT) AS n_c
        FROM q GROUP BY c_nationkey, bal_bucket),
cs AS (SELECT c_nationkey, bal_bucket, c_mktsegment,
              CAST(COUNT(*) AS BIGINT) AS a
       FROM q GROUP BY c_nationkey, bal_bucket, c_mktsegment),
grid AS (
  SELECT cls.c_nationkey, cls.bal_bucket, cls.n_c, segs.c_mktsegment, segs.g,
         COALESCE(cs.a, 0) AS a
  FROM cls CROSS JOIN segs
  LEFT JOIN cs ON cs.c_nationkey = cls.c_nationkey
              AND cs.bal_bucket = cls.bal_bucket
              AND cs.c_mktsegment = segs.c_mktsegment
),
d AS (
  SELECT c_nationkey, bal_bucket, n_c,
         CAST(SUM(ABS(a * (SELECT big_n FROM tot) - g * n_c)) AS BIGINT)
           AS num
  FROM grid GROUP BY c_nationkey, bal_bucket, n_c
)
SELECT c_nationkey, bal_bucket, n_c AS group_size,
       ROUND(CAST(num AS DOUBLE)
             / (2.0 * n_c * (SELECT big_n FROM tot)), 6) AS tvd,
       CAST(num * 4 > 2 * n_c * (SELECT big_n FROM tot) AS BOOLEAN)
         AS violates_t
FROM d
"""


@register("privacy_t_closeness", oracle=_TCLOSE_ORACLE)
def privacy_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x189: t-CLOSENESS audit — the third leg of the release gate: x145
    bounds re-identification (class size), x162 bounds homogeneity
    (distinct sensitive values), but a class can pass both while its
    sensitive DISTRIBUTION still leaks (99% of one segment where the
    population holds 20%: skewness attack). t-closeness bounds the
    total-variation distance between each class's sensitive distribution
    and the global one: TVD = ½Σ|aᵢ/n_c − gᵢ/N|, flagged when > t=1/4.

    Exactness: 2·TVD·n_c·N = Σ|aᵢ·N − gᵢ·n_c| is ALL-INTEGER, so the
    violation flag is the exact compare 4·Σ > 2·n_c·N — a float ulp can
    never flip an audit verdict; the reported TVD is display-only 6dp.
    (a·N needs DECIMAL past ~3e9 rows — the x144 upgrade note applies.)

    100 TB: three partial aggs over one scan (class, class×segment,
    segment); the zero-filling grid is |classes| × |segments| with the
    segment side broadcast; the audit is one more |grid|-row agg."""
    cust = load_table(spark, sf_dir, "customer")
    q = cust.select(
        "c_nationkey",
        F.floor(F.col("c_acctbal") / F.lit(1000.0)).cast("long").alias("bal_bucket"),
        "c_mktsegment",
    )
    segs = q.groupBy("c_mktsegment").agg(F.count(F.lit(1)).cast("long").alias("g"))
    big_n = q.agg(F.count(F.lit(1)).cast("long").alias("big_n"))
    cls = q.groupBy("c_nationkey", "bal_bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_c")
    )
    cs = q.groupBy("c_nationkey", "bal_bucket", "c_mktsegment").agg(
        F.count(F.lit(1)).cast("long").alias("a")
    )
    grid = (
        cls.crossJoin(F.broadcast(segs))
        .join(cs, ["c_nationkey", "bal_bucket", "c_mktsegment"], "left")
        .select(
            "c_nationkey",
            "bal_bucket",
            "n_c",
            "g",
            F.coalesce(F.col("a"), F.lit(0)).alias("a"),
        )
        .crossJoin(F.broadcast(big_n))
    )
    d = grid.groupBy("c_nationkey", "bal_bucket", "n_c", "big_n").agg(
        F.sum(
            F.abs(F.col("a") * F.col("big_n") - F.col("g") * F.col("n_c"))
        )
        .cast("long")
        .alias("num")
    )
    return d.select(
        "c_nationkey",
        "bal_bucket",
        F.col("n_c").alias("group_size"),
        F.round(
            F.col("num").cast("double")
            / (2.0 * F.col("n_c") * F.col("big_n")),
            6,
        ).alias("tvd"),
        (F.col("num") * 4 > 2 * F.col("n_c") * F.col("big_n")).alias(
            "violates_t"
        ),
    )


# --------------------------------------------------------------------------
# x208 — cross-table FRESHNESS panel (the staleness-at-a-glance report)
# --------------------------------------------------------------------------

_FRESH_ORACLE = """
WITH per AS (
  SELECT 'orders' AS tbl, CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(MAX(o_orderdate) AS DATE) AS latest FROM orders
  UNION ALL
  SELECT 'lineitem', CAST(COUNT(*) AS BIGINT),
         CAST(MAX(l_shipdate) AS DATE) FROM lineitem
  UNION ALL
  SELECT 'events', CAST(COUNT(*) AS BIGINT),
         CAST(MAX(ts) AS DATE) FROM events
),
g AS (SELECT MAX(latest) AS world FROM per)
SELECT per.tbl, per.n_rows,
       strftime(per.latest, '%Y-%m-%d') AS latest_day,
       CAST(date_diff('day', per.latest, g.world) AS BIGINT) AS lag_days
FROM per CROSS JOIN g
"""


@register("dq_freshness_panel", oracle=_FRESH_ORACLE)
def dq_freshness_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x208: cross-table FRESHNESS panel — per fact table its row count,
    latest business date, and staleness against the freshest table in
    the warehouse. The first page of every data-ops dashboard, and the
    gate in front of x176's incremental refresh (refreshing a cube from
    a feed whose upstream stalled silently backfills zeros). Lag is
    RELATIVE to the freshest feed — no wall clock (scripts must never
    call now(); the x191 argument).

    100 TB: three count/max aggs — each a metadata-cheap scan (max on a
    partition column prunes to the last partition in a date-partitioned
    lake) — and a 3-row epilogue."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    ev = load_table(spark, sf_dir, "events")

    def one(df: DataFrame, name: str, col: str) -> DataFrame:
        return df.agg(
            F.lit(name).alias("tbl"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.max(F.col(col).cast("date")).alias("latest"),
        )

    per = (
        one(orders, "orders", "o_orderdate")
        .unionByName(one(li, "lineitem", "l_shipdate"))
        .unionByName(one(ev, "events", "ts"))
    )
    g = per.agg(F.max("latest").alias("world"))
    return per.crossJoin(F.broadcast(g)).select(
        "tbl",
        "n_rows",
        F.date_format("latest", "yyyy-MM-dd").alias("latest_day"),
        F.datediff("world", "latest").cast("long").alias("lag_days"),
    )


# --------------------------------------------------------------------------
# x214 — k-anonymity generalization ladder (does coarsening heal the leak?)
# --------------------------------------------------------------------------

_LADDER_WIDTHS = (1000, 2000, 4000)  # bucket-width generalization steps

_LADDER_ORACLE = f"""
WITH steps AS (
"""
_LADDER_ORACLE += "\n  UNION ALL\n".join(
    f"""  SELECT {w} AS width, c_nationkey, c_mktsegment,
         CAST(FLOOR(c_acctbal / {w}.0) AS BIGINT) AS bal_bucket
  FROM customer"""
    for w in _LADDER_WIDTHS
)
_LADDER_ORACLE += f"""
),
g AS (
  SELECT width, c_nationkey, c_mktsegment, bal_bucket,
         CAST(COUNT(*) AS BIGINT) AS group_size
  FROM steps GROUP BY 1, 2, 3, 4
)
SELECT width,
       CAST(COUNT(*) AS BIGINT) AS n_classes,
       CAST(SUM(CASE WHEN group_size < {_KANON_K} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_violating,
       CAST(SUM(CASE WHEN group_size < {_KANON_K} THEN group_size ELSE 0 END)
            AS BIGINT) AS n_exposed_rows
FROM g GROUP BY width
"""


@register("privacy_generalization_ladder", oracle=_LADDER_ORACLE)
def privacy_generalization_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x214: the GENERALIZATION LADDER for x145's k-anonymity audit — the
    same QI tuple at 1000/2000/4000-wide balance buckets, with class,
    violation and exposed-row counts per rung: the remediation table that
    says how much COARSENING buys how much safety (x145 finds the leak;
    this prices the fix; x189/x162 then re-audit the distributional
    leaks at the chosen rung). Monotonicity (coarser ⇒ fewer violating
    classes is NOT guaranteed row-wise, only typical — merging two safe
    classes can't violate, but merging small ones can stay small) is why
    the ladder must be MEASURED, not assumed; the invariant test checks
    the exposed-row count against a Python replay per rung.

    100 TB: the 3-width union is one scan per rung over a narrow
    projection (or one scan with an explode over widths — spelled as a
    union so each rung's agg partial-aggregates independently); every
    agg is map-combined integer counting."""
    cust = load_table(spark, sf_dir, "customer")
    rungs = []
    for w in _LADDER_WIDTHS:
        rungs.append(
            cust.select(
                F.lit(w).cast("long").alias("width"),
                "c_nationkey",
                "c_mktsegment",
                F.floor(F.col("c_acctbal") / float(w)).cast("long").alias(
                    "bal_bucket"
                ),
            )
        )
    steps = rungs[0]
    for r in rungs[1:]:
        steps = steps.unionByName(r)
    g = steps.groupBy(
        "width", "c_nationkey", "c_mktsegment", "bal_bucket"
    ).agg(F.count(F.lit(1)).cast("long").alias("group_size"))
    viol = F.col("group_size") < _KANON_K
    return g.groupBy("width").agg(
        F.count(F.lit(1)).cast("long").alias("n_classes"),
        F.sum(F.when(viol, 1).otherwise(0)).cast("long").alias("n_violating"),
        F.sum(F.when(viol, F.col("group_size")).otherwise(0))
        .cast("long")
        .alias("n_exposed_rows"),
    )


# --------------------------------------------------------------------------
# x221 — Benford first-digit conformance audit (fraud/data-entry screen)
# --------------------------------------------------------------------------

# log10(1 + 1/d) pinned to 6dp literals (trap #18: never call a transcendental
# at query time when the operand set is a 9-value constant — each engine's
# libm may differ in the last ulp, and a pinned table is also what a real
# audit would ship for review).
_BENFORD_EXPECTED = {
    1: 0.301030,
    2: 0.176091,
    3: 0.124939,
    4: 0.096910,
    5: 0.079181,
    6: 0.066947,
    7: 0.057992,
    8: 0.051153,
    9: 0.045757,
}

_BENFORD_CASE = "CASE digit " + " ".join(
    f"WHEN {d} THEN {p}" for d, p in _BENFORD_EXPECTED.items()
) + " END"

_BENFORD_ORACLE = f"""
WITH digits AS (
  SELECT CAST(substr(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) AS VARCHAR),
                     1, 1) AS BIGINT) AS digit
  FROM orders
),
cnt AS (SELECT digit, COUNT(*) AS n_obs FROM digits GROUP BY digit),
ex AS (
  SELECT digit, n_obs,
         SUM(n_obs) OVER () AS n_total,
         {_BENFORD_CASE} AS exp_share
  FROM cnt
)
SELECT digit, n_obs,
       ROUND(CAST(n_obs AS DOUBLE) / n_total, 6) AS obs_share,
       exp_share,
       ROUND((n_obs - n_total * exp_share) * (n_obs - n_total * exp_share)
             / (n_total * exp_share), 4) AS chi2_term
FROM ex
"""


@register("dq_benford", oracle=_BENFORD_ORACLE)
def dq_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x221: BENFORD'S LAW first-digit audit over order totals — the classic
    fabricated-numbers screen (expenses, invoices, sensor feeds): natural
    multiplicative amounts put digit d first with probability log10(1+1/d);
    hand-typed or synthesized amounts don't. Emits, per leading digit, the
    observed share, the pinned expected share, and the per-digit chi-square
    contribution (sum them for the 8-dof test statistic).

    Determinism: the leading digit is extracted from the EXACT cents
    integer's decimal string — never floor(x/10^floor(log10 x)), whose
    nested float log/pow can mis-bin a price sitting on a power-of-ten
    boundary. Expected shares are 6dp literals on both engines; obs_share
    and chi2_term are each ONE identically-parenthesized float expression
    over (exact integer, pinned literal) operands, then display-rounded.

    100 TB: map-side combine onto a 9-row digit grid, then an unpartitioned
    window over those 9 rows for the grand total — safe ONLY because the
    grain is a constant-size digit domain (pareto_abc's rule), never the
    row grain."""
    orders = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    digit = F.substring(cents.cast("string"), 1, 1).cast("long")
    cnt = (
        orders.select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n_obs"))
    )
    exp_share = F.coalesce(
        *[
            F.when(F.col("digit") == d, F.lit(p))
            for d, p in _BENFORD_EXPECTED.items()
        ]
    )
    w_all = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    ex = cnt.select(
        "digit",
        "n_obs",
        F.sum("n_obs").over(w_all).alias("n_total"),
        exp_share.alias("exp_share"),
    )
    dev = F.col("n_obs") - F.col("n_total") * F.col("exp_share")
    return ex.select(
        "digit",
        "n_obs",
        F.round(F.col("n_obs").cast("double") / F.col("n_total"), 6).alias(
            "obs_share"
        ),
        "exp_share",
        F.round(dev * dev / (F.col("n_total") * F.col("exp_share")), 4).alias(
            "chi2_term"
        ),
    )


# --------------------------------------------------------------------------
# x230 — PSI population-drift panel (period-over-period distribution shift)
# --------------------------------------------------------------------------

_PSI_BUCKET_CENTS = 5000  # 50-unit value bins, exact integer binning
_PSI_B = 10  # Laplace smoothing denominator add (bucket-domain size)

_PSI_ORACLE = f"""
WITH binned AS (
  SELECT event_type,
         CASE WHEN day(ts) <= 15 THEN 1 ELSE 2 END AS period,
         CAST(ROUND(value * 100) AS BIGINT) // {_PSI_BUCKET_CENTS} AS bucket,
         COUNT(*) AS c
  FROM events
  GROUP BY 1, 2, 3
),
p1 AS (SELECT event_type, bucket, c FROM binned WHERE period = 1),
p2 AS (SELECT event_type, bucket, c FROM binned WHERE period = 2),
n1 AS (SELECT event_type, SUM(c) AS n FROM p1 GROUP BY event_type),
n2 AS (SELECT event_type, SUM(c) AS n FROM p2 GROUP BY event_type),
grid AS (
  SELECT COALESCE(p1.event_type, p2.event_type) AS event_type,
         COALESCE(p1.bucket, p2.bucket) AS bucket,
         COALESCE(p1.c, 0) AS c1, COALESCE(p2.c, 0) AS c2
  FROM p1 FULL JOIN p2
    ON p1.event_type = p2.event_type AND p1.bucket = p2.bucket
),
shares AS (
  -- LEFT joins + COALESCE(n,0): a type seen in only one half-month keeps its
  -- rows with the empty period's denominator = 0 + smoothing, matching the
  -- Spark side's per-type window sum over all-zero counts (r7 advisor note).
  SELECT g.event_type, g.bucket, g.c1, g.c2,
         ROUND(CAST(g.c1 + 1 AS DOUBLE) / (COALESCE(n1.n, 0) + {_PSI_B}), 6) AS s1,
         ROUND(CAST(g.c2 + 1 AS DOUBLE) / (COALESCE(n2.n, 0) + {_PSI_B}), 6) AS s2
  FROM grid g
  LEFT JOIN n1 ON n1.event_type = g.event_type
  LEFT JOIN n2 ON n2.event_type = g.event_type
)
SELECT event_type, CAST(bucket AS BIGINT) AS bucket,
       CAST(c1 AS BIGINT) AS c1, CAST(c2 AS BIGINT) AS c2, s1, s2,
       CAST(ROUND((s1 - s2) * ln(s1 / s2) * 1000000) AS BIGINT) AS psi_term_u
FROM shares
"""


@register("dq_psi_drift", oracle=_PSI_ORACLE)
def dq_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x230: POPULATION STABILITY INDEX drift panel — the model-monitoring
    standard for "has this feature's distribution shifted?": per event
    type, the value distribution of the first half-month vs the second,
    binned on an EXACT integer grid (cents // {_PSI_BUCKET_CENTS} — float
    binning would let a boundary value flip bins cross-engine), Laplace
    +1 smoothing so a bucket empty in one period contributes a finite
    term instead of a division blow-up. Σ psi_term_u / 1e6 per type is
    the PSI; the panel keeps per-bucket terms because the actionable
    question is WHERE the mass moved (>0.25 = retrain-grade shift by the
    usual rule of thumb).

    Determinism: x113's micro-unit device — smoothed shares pinned 6dp,
    each (s1-s2)·ln(s1/s2) term rounds to integer micro-units, so the
    per-type PSI is an exact integer sum under any partitioning.

    100 TB: one map-combined (type, period, bucket) agg off one scan;
    the FULL-JOIN bucket alignment runs on the collapsed grid (|types| ×
    |buckets| × 2 rows). Periods generalize to week-over-week by swapping
    the CASE."""
    ev = load_table(spark, sf_dir, "events")
    binned = (
        ev.select(
            "event_type",
            F.when(F.dayofmonth("ts") <= 15, 1).otherwise(2).alias("period"),
            (
                F.round(F.col("value") * 100).cast("long") / _PSI_BUCKET_CENTS
            )
            .cast("long")
            .alias("bucket"),
        )
        .groupBy("event_type", "period", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    p1 = binned.filter(F.col("period") == 1).select(
        "event_type", "bucket", F.col("c").alias("c1")
    )
    p2 = binned.filter(F.col("period") == 2).select(
        F.col("event_type").alias("event_type2"),
        F.col("bucket").alias("bucket2"),
        F.col("c").alias("c2"),
    )
    grid = p1.join(
        p2,
        (p1.event_type == p2.event_type2) & (p1.bucket == p2.bucket2),
        "full",
    ).select(
        F.coalesce("event_type", "event_type2").alias("event_type"),
        F.coalesce("bucket", "bucket2").alias("bucket"),
        F.coalesce("c1", F.lit(0)).alias("c1"),
        F.coalesce("c2", F.lit(0)).alias("c2"),
    )
    w_t = Window.partitionBy("event_type")
    shares = grid.select(
        "event_type",
        "bucket",
        "c1",
        "c2",
        F.round(
            (F.col("c1") + 1).cast("double")
            / (F.sum("c1").over(w_t) + _PSI_B),
            6,
        ).alias("s1"),
        F.round(
            (F.col("c2") + 1).cast("double")
            / (F.sum("c2").over(w_t) + _PSI_B),
            6,
        ).alias("s2"),
    )
    return shares.select(
        "event_type",
        F.col("bucket").cast("long").alias("bucket"),
        F.col("c1").cast("long").alias("c1"),
        F.col("c2").cast("long").alias("c2"),
        "s1",
        "s2",
        F.round((F.col("s1") - F.col("s2")) * F.log(F.col("s1") / F.col("s2")) * 1_000_000)
        .cast("long")
        .alias("psi_term_u"),
    )


# --------------------------------------------------------------------------
# x241 — Laplace-mechanism DP histogram release (deterministic test seed)
# --------------------------------------------------------------------------

_DP_EPS = 1.0  # epsilon; count queries have sensitivity 1 => scale b = 1/eps

_DP_ORACLE = f"""
WITH cells AS (
  SELECT c_nationkey, c_mktsegment, COUNT(*) AS true_n
  FROM customer GROUP BY c_nationkey, c_mktsegment
),
seeded AS (
  SELECT c_nationkey, c_mktsegment, true_n,
         (('0x' || substring(md5('dp:' || c_nationkey || ':' || c_mktsegment),
                             1, 8))::BIGINT + 0.5) / 4294967296.0 AS u
  FROM cells
),
noised AS (
  SELECT c_nationkey, c_mktsegment, true_n,
         CASE WHEN u >= 0.5 THEN -1.0 ELSE 1.0 END
           * ln(1 - 2 * ABS(u - 0.5)) * (1.0 / {_DP_EPS}) AS noise
  FROM seeded
)
SELECT c_nationkey, c_mktsegment, CAST(true_n AS BIGINT) AS true_n,
       ROUND(true_n + noise, 6) AS noised_n,
       ROUND(ABS(noise), 6) AS abs_err
FROM noised
"""


@register("privacy_dp_hist", oracle=_DP_ORACLE)
def privacy_dp_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x241: LAPLACE-MECHANISM differentially-private histogram release —
    the (ε=1)-DP count table over (nation, segment) with the exact
    inverse-CDF noise draw Lap(b=Δ/ε): noise = -sign(u-½)·ln(1-2|u-½|)·b.
    Completes the privacy family's release side (x145/x162/x189 AUDIT a
    release; this PRODUCES one) and publishes the per-cell realized error
    so consumers can calibrate.

    The uniform u is md5-derived from the CELL KEY — deterministic, so
    re-runs, engines, and backfills release IDENTICAL noise (one noise
    draw per cell is exactly what parallel composition prescribes; fresh
    randomness per RERUN would burn budget per execution). That makes
    this the test/CI-grade mechanism by construction — production swaps
    the seed string for a launch-scoped secret salt, same plan. u offsets
    by half an ulp-of-2³² so the CDF never sees 0 or 1.

    100 TB: one map-combined cell agg; noise is a narrow projection on
    the collapsed grid. ln() rides the x113 acceptance (6dp display
    rounding over libm)."""
    cust = load_table(spark, sf_dir, "customer")
    cells = cust.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("true_n")
    )
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("dp:"),
                        F.col("c_nationkey"),
                        F.lit(":"),
                        F.col("c_mktsegment"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        + 0.5
    ) / 4294967296.0
    noise = (
        F.when(u >= 0.5, F.lit(-1.0)).otherwise(F.lit(1.0))
        * F.log(1 - 2 * F.abs(u - 0.5))
        * (1.0 / _DP_EPS)
    )
    return cells.select(
        "c_nationkey",
        "c_mktsegment",
        F.col("true_n").cast("long").alias("true_n"),
        F.round(F.col("true_n") + noise, 6).alias("noised_n"),
        F.round(F.abs(noise), 6).alias("abs_err"),
    )


# --------------------------------------------------------------------------
# x282 — functional-dependency discovery audit (candidate FD panel)
# --------------------------------------------------------------------------

# Candidate determinant -> dependent pairs probed on the customer table.
# A held FD has violation_rate 0; near-FDs (the interesting ones for
# schema docs and DQ rules) sit just above.
_FD_PAIRS = (
    ("c_nationkey", "c_mktsegment"),
    ("c_mktsegment", "c_nationkey"),
    ("c_custkey", "c_nationkey"),
    ("c_nationkey", "c_custkey"),
)


def _fd_leg_sql(det: str, dep: str) -> str:
    return f"""
SELECT '{det}' AS determinant, '{dep}' AS dependent,
       CAST(COUNT(DISTINCT {det}) AS BIGINT) AS n_det_values,
       CAST(SUM(mx) AS BIGINT) AS n_conforming,
       CAST(SUM(n) AS BIGINT) AS n_rows,
       ROUND(1 - CAST(SUM(mx) AS DOUBLE) / SUM(n), 6) AS violation_rate
FROM (
  SELECT {det}, MAX(c) AS mx, SUM(c) AS n
  FROM (SELECT {det}, {dep}, COUNT(*) AS c FROM customer GROUP BY 1, 2)
  GROUP BY {det}
)"""


_FD_ORACLE = "\nUNION ALL\n".join(_fd_leg_sql(a, b) for a, b in _FD_PAIRS)


@register("dq_fd_discovery", oracle=_FD_ORACLE)
def dq_fd_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x282: FUNCTIONAL-DEPENDENCY DISCOVERY audit — for each candidate
    determinant→dependent pair, the g3-style conformance measure from
    the FD-mining literature (TANE/HyFD's error): keep the modal
    dependent value per determinant value, count everything else as a
    violation. violation_rate 0 ⇒ the FD holds exactly (a key you can
    document and enforce with x93's constraint gate); small-but-nonzero
    ⇒ a dirty near-key worth x275's fuzzy resolution. Probing BOTH
    directions of each pair distinguishes key→attr from attr→key.

    Determinism: counts all the way down — the modal count per
    determinant is MAX over exact integers (no tie-breaking needed:
    ties change which value is modal, never the max count itself).

    100 TB: per pair, one (det, dep) map-combined agg collapsed to a
    (det) agg — grain is the determinant's cardinality, never rows. The
    candidate list is static here; full FD mining prunes the lattice by
    these same measures level by level."""
    cust = load_table(spark, sf_dir, "customer")
    legs = []
    for det, dep in _FD_PAIRS:
        cell = cust.groupBy(det, dep).agg(F.count(F.lit(1)).alias("c"))
        leg = (
            cell.groupBy(det)
            .agg(F.max("c").alias("mx"), F.sum("c").alias("n"))
            .agg(
                F.countDistinct(det).cast("long").alias("n_det_values"),
                F.sum("mx").cast("long").alias("n_conforming"),
                F.sum("n").cast("long").alias("n_rows"),
                F.round(
                    1 - F.sum("mx").cast("double") / F.sum("n"), 6
                ).alias("violation_rate"),
            )
            .select(
                F.lit(det).alias("determinant"),
                F.lit(dep).alias("dependent"),
                "n_det_values",
                "n_conforming",
                "n_rows",
                "violation_rate",
            )
        )
        legs.append(leg)
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    return out


# --------------------------------------------------------------------------
# x311 — full referential-integrity orphan audit (every FK edge)
# --------------------------------------------------------------------------

_FK_EDGES = (
    ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("customer.c_nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier.s_nationkey->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation.n_regionkey->region", "nation", "n_regionkey", "region", "r_regionkey"),
)

_ORPHAN_ORACLE = "\nUNION ALL\n".join(
    f"""
SELECT '{name}' AS fk_edge,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN d.{dk} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_orphans,
       ROUND(CAST(SUM(CASE WHEN d.{dk} IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS orphan_rate
FROM {ft} f LEFT JOIN (SELECT DISTINCT {dk} FROM {dt}) d
  ON d.{dk} = f.{fk}
"""
    for name, ft, fk, dt, dk in _FK_EDGES
)


@register("dq_referential_orphans", oracle=_ORPHAN_ORACLE)
def dq_referential_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x311: FULL REFERENTIAL-INTEGRITY AUDIT — orphan count and rate
    for EVERY foreign-key edge of the star schema (7 edges, lineitem's
    three, orders→customer, the two nation edges, nation→region):
    x93 gates one FK as part of its constraint suite; this is the
    schema-wide report a warehouse loader publishes per batch, one row
    per edge, zero the passing value everywhere.

    All counts are exact integers from broadcast left joins against
    DISTINCT dimension keys (dedup first so a duplicated dim key can
    never double-count fact rows); rate is one 6dp-pinned division.

    100 TB: each edge is one scan + one broadcast-hash left join on a
    key-only dim projection + map-combined conditional agg — the
    7-edge union shares nothing and parallelizes as 7 independent
    2-stage jobs; a dimension too big to broadcast falls back to a
    shuffled left join on the key, same plan class as j1."""
    # ONE scan per FACT table (r14): lineitem carries three FK edges and
    # was scanned three times, once per edge. Grouping edges by fact table
    # chains the (distinct, key-only, broadcast) dim left joins onto a
    # single scan — each dim side is DISTINCT so every left join preserves
    # the fact row count exactly, making the per-edge null-flags
    # independent columns of one pass — then ONE agg emits all of the
    # table's orphan counts and a stack() unpivots them to the per-edge
    # rows. Counts and rates are bit-identical to the per-edge spelling.
    by_fact: dict[str, list[tuple[str, str, str, str]]] = {}
    for name, ft, fk, dt, dk in _FK_EDGES:
        by_fact.setdefault(ft, []).append((name, fk, dt, dk))
    parts = []
    for ft, edges in by_fact.items():
        j = load_table(spark, sf_dir, ft)
        flags = []
        for name, fk, dt, dk in edges:
            d = load_table(spark, sf_dir, dt).select(dk).distinct()
            j = j.join(F.broadcast(d), j[fk] == d[dk], "left")
            flags.append((name, d[dk]))
        agg = j.agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            *[
                F.sum(F.when(dkc.isNull(), 1).otherwise(0))
                .cast("long")
                .alias(f"o{i}")
                for i, (_, dkc) in enumerate(flags)
            ],
        )
        stack_args = ", ".join(
            f"'{name}', o{i}" for i, (name, _) in enumerate(flags)
        )
        parts.append(
            agg.select(
                F.expr(
                    f"stack({len(flags)}, {stack_args})"
                    " AS (fk_edge, n_orphans)"
                ),
                "n_rows",
            ).select(
                "fk_edge",
                "n_rows",
                "n_orphans",
                F.round(
                    F.col("n_orphans").cast("double") / F.col("n_rows"), 6
                ).alias("orphan_rate"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


# --------------------------------------------------------------------------
# x356 — monthly categorical drift of the order-priority mix (chi-square)
# --------------------------------------------------------------------------

_PRIO = ("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")


def _prio_chi2_terms(o_cols: list[str], r_cols: list[str]) -> str:
    """Shared-parenthesization chi2: sum_p (O_p*N - C*R_p)^2 / (N*R_p*C),
    the 5 terms written in the FIXED priority order (never a float agg
    across rows — the sum is one expression)."""
    terms = [
        f"(CAST({o} AS DOUBLE) * n - CAST(c_m AS DOUBLE) * {r})"
        f" * ((CAST({o} AS DOUBLE) * n - CAST(c_m AS DOUBLE) * {r}))"
        f" / (CAST(n AS DOUBLE) * {r} * c_m)"
        for o, r in zip(o_cols, r_cols)
    ]
    return " + ".join(terms)


_PRIOMIX_ORACLE = f"""
WITH m AS (
  SELECT year(o_orderdate) * 12 + month(o_orderdate) AS mth,
         {", ".join(
             f"CAST(SUM(CASE WHEN o_orderpriority = '{p}' THEN 1 ELSE 0 END) AS BIGINT) AS o{i}"
             for i, p in enumerate(_PRIO)
         )},
         CAST(COUNT(*) AS BIGINT) AS c_m
  FROM orders GROUP BY 1
),
g AS (
  SELECT {", ".join(f"CAST(SUM(o{i}) AS BIGINT) AS r{i}" for i in range(5))},
         CAST(SUM(c_m) AS BIGINT) AS n
  FROM m
)
SELECT m.mth AS month_key, m.c_m AS n_orders,
       ROUND({_prio_chi2_terms([f"m.o{i}" for i in range(5)],
                               [f"g.r{i}" for i in range(5)])}, 6) AS chi2,
       CAST(CASE WHEN {_prio_chi2_terms([f"m.o{i}" for i in range(5)],
                                        [f"g.r{i}" for i in range(5)])}
                      > 9.487729 THEN 1 ELSE 0 END AS INTEGER) AS drifted_05
FROM m CROSS JOIN g
"""


@register("orders_priority_mix_drift", oracle=_PRIOMIX_ORACLE)
def orders_priority_mix_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x356: MONTHLY CATEGORICAL DRIFT of the order-priority mix — per
    month, the chi-square distance between that month's 5-way priority
    distribution and the all-time mix (df = 4, 5% critical 9.487729):
    the categorical sibling of x230's PSI (which bins a NUMERIC column)
    — the order-intake monitor that pages when a feed starts writing
    '4-NOT SPECIFIED' for everything.

    Exactness: the 5 cells per month and the 5 global margins are exact
    integers pivoted to COLUMNS (the priority domain is the fixed TPC-H
    5-value set), so chi2 is ONE fixed-parenthesization double
    expression per month — never a float sum across rows; the verdict
    compares that identical double to a literal.

    100 TB: one map-combined month-grain pivot agg; the 1-row global
    frame broadcasts; |months| rows out."""
    orders = load_table(spark, sf_dir, "orders")
    m = orders.groupBy(
        (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("month_key")
    ).agg(
        *[
            F.sum(F.when(F.col("o_orderpriority") == p, 1).otherwise(0))
            .cast("long")
            .alias(f"o{i}")
            for i, p in enumerate(_PRIO)
        ],
        F.count(F.lit(1)).cast("long").alias("c_m"),
    )
    g = m.agg(
        *[F.sum(f"o{i}").cast("long").alias(f"r{i}") for i in range(5)],
        F.sum("c_m").cast("long").alias("n"),
    )
    j = m.crossJoin(F.broadcast(g))
    chi2 = None
    for i in range(5):
        diff = (
            F.col(f"o{i}").cast("double") * F.col("n")
            - F.col("c_m").cast("double") * F.col(f"r{i}")
        )
        term = diff * diff / (
            F.col("n").cast("double") * F.col(f"r{i}") * F.col("c_m")
        )
        chi2 = term if chi2 is None else chi2 + term
    return j.select(
        "month_key",
        F.col("c_m").alias("n_orders"),
        F.round(chi2, 6).alias("chi2"),
        F.when(chi2 > 9.487729, 1).otherwise(0).cast("int").alias("drifted_05"),
    )
