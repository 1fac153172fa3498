"""SURVEY.md §2.8 — scalar functions f1-f10 (strings, dates, math,
conditionals, casts; arrays/maps/JSON/hash arrive with M3).

All expressions are Catalyst built-ins (JVM-side, whole-stage-codegen'd) —
zero Python in the row path. Oracle parity notes are inline where Spark and
DuckDB disagree on spelling or result type (length() width, dayofweek()
origin, double→int cast rounding).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import register

# DuckDB has no initcap(); single-word segments let the oracle rebuild it.
# DuckDB length() returns BIGINT vs Spark INT -> oracle casts to INTEGER.
_F1_ORACLE = """
SELECT
  c_custkey,
  concat_ws('|', c_name, c_mktsegment) AS full_label,
  substring(c_name, 10, 8) AS name_digits,
  upper(c_mktsegment) AS seg_up,
  lower(c_mktsegment) AS seg_lo,
  lpad(CAST(c_custkey AS VARCHAR), 12, '0') AS padded_key,
  replace(c_name, 'Customer', 'Cust') AS short_name,
  string_split(c_name, '#')[1] AS name_prefix,
  regexp_extract(c_name, '([0-9]+)', 1) AS digits,
  CAST(length(c_name) AS INTEGER) AS name_len,
  upper(substring(lower(c_mktsegment), 1, 1))
    || substring(lower(c_mktsegment), 2) AS seg_title,
  trim(concat('  ', c_mktsegment, '  ')) AS seg_trim
FROM customer
"""


@register("fn_string", oracle=_F1_ORACLE)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.concat_ws("|", "c_name", "c_mktsegment").alias("full_label"),
        F.substring("c_name", 10, 8).alias("name_digits"),
        F.upper("c_mktsegment").alias("seg_up"),
        F.lower("c_mktsegment").alias("seg_lo"),
        F.lpad(F.col("c_custkey").cast("string"), 12, "0").alias("padded_key"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias("short_name"),
        F.split("c_name", "#").getItem(0).alias("name_prefix"),
        F.regexp_extract("c_name", "([0-9]+)", 1).alias("digits"),
        F.length("c_name").alias("name_len"),
        F.initcap(F.lower("c_mktsegment")).alias("seg_title"),
        F.trim(F.concat(F.lit("  "), F.col("c_mktsegment"), F.lit("  "))).alias("seg_trim"),
    )


# Spark dayofweek(): 1=Sunday; DuckDB dayofweek(): 0=Sunday -> Spark side -1.
# DuckDB year()/month() return BIGINT -> oracle casts to INTEGER.
_F2_ORACLE = """
SELECT
  o_orderkey,
  CAST(year(o_orderdate) AS INTEGER) AS yr,
  CAST(month(o_orderdate) AS INTEGER) AS mo,
  CAST(dayofweek(o_orderdate) AS INTEGER) AS dow,
  date_trunc('month', o_orderdate) AS month_start,
  o_orderdate + INTERVAL 7 DAY AS plus_week,
  CAST(date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS INTEGER) AS days_since,
  strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
  strftime(o_orderdate, '%Y-%m-%d') AS iso_day,
  CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
FROM orders
"""


@register("fn_date", oracle=_F2_ORACLE)
def fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        (F.dayofweek("o_orderdate") - 1).alias("dow"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 7 DAY")).alias("plus_week"),
        F.datediff(
            F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp_ntz")
        ).alias("days_since"),
        F.date_format(F.last_day(F.col("o_orderdate").cast("date")), "yyyy-MM-dd").alias(
            "month_end"
        ),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("iso_day"),
        F.unix_timestamp(F.col("o_orderdate").cast("timestamp")).alias("epoch_s"),
    )


# DuckDB floor()/ceil() return DOUBLE; Spark return LONG -> oracle casts.
# Integer division: Spark `div`, DuckDB `//`.
_F3_ORACLE = """
SELECT
  l_orderkey,
  l_linenumber,
  ROUND(l_extendedprice, 1) AS price_r1,
  CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
  CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
  ROUND(abs(l_discount - 0.05), 6) AS disc_dev,
  ROUND(pow(l_quantity, 2), 2) AS qty_sq,
  ROUND(sqrt(l_extendedprice), 6) AS price_sqrt,
  ROUND(ln(l_extendedprice), 6) AS price_ln,
  ROUND(exp(l_discount), 6) AS disc_exp,
  l_orderkey // 7 AS key_div7,
  l_orderkey % 7 AS key_mod7,
  CAST(sign(l_discount - 0.05) AS INTEGER) AS disc_sign
FROM lineitem
"""


@register("fn_math", oracle=_F3_ORACLE)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 1).alias("price_r1"),
        F.floor("l_extendedprice").alias("price_floor"),
        F.ceil("l_extendedprice").alias("price_ceil"),
        F.round(F.abs(F.col("l_discount") - 0.05), 6).alias("disc_dev"),
        F.round(F.pow("l_quantity", F.lit(2)), 2).alias("qty_sq"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("price_sqrt"),
        F.round(F.log("l_extendedprice"), 6).alias("price_ln"),
        F.round(F.exp("l_discount"), 6).alias("disc_exp"),
        F.expr("l_orderkey div 7").alias("key_div7"),
        (F.col("l_orderkey") % 7).alias("key_mod7"),
        F.signum(F.col("l_discount") - 0.05).cast("int").alias("disc_sign"),
    )


_F4_ORACLE = """
SELECT
  o_orderkey,
  CASE WHEN o_totalprice < 100000 THEN 'low'
       WHEN o_totalprice < 300000 THEN 'mid'
       ELSE 'high' END AS bucket,
  coalesce(nullif(o_orderstatus, 'O'), 'open') AS status_label,
  ROUND(least(o_totalprice, 250000.0), 2) AS capped,
  ROUND(greatest(o_totalprice, 50000.0), 2) AS floored
FROM orders
"""


@register("fn_cond_null", oracle=_F4_ORACLE)
def fn_cond_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") < 100000, "low")
        .when(F.col("o_totalprice") < 300000, "mid")
        .otherwise("high")
        .alias("bucket"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("open")).alias(
            "status_label"
        ),
        F.round(F.least(F.col("o_totalprice"), F.lit(250000.0)), 2).alias("capped"),
        F.round(F.greatest(F.col("o_totalprice"), F.lit(50000.0)), 2).alias("floored"),
    )


# double→int: Spark truncates, DuckDB rounds -> both sides trunc() first.
# DECIMAL and DATE results are emitted as strings: pandas/arrow materialize
# Decimal/date differently per engine, which would break the value hash even
# when the typed values agree.
_F5_ORACLE = """
SELECT
  o_orderkey,
  CAST(o_orderkey AS VARCHAR) AS key_str,
  CAST(CAST(ROUND(o_totalprice, 2) AS DECIMAL(12, 2)) AS VARCHAR) AS price_dec_str,
  CAST(trunc(o_totalprice) AS BIGINT) AS price_int,
  CAST(o_orderkey AS DOUBLE) AS key_dbl,
  CAST(strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS TIMESTAMP) AS reparsed_ts,
  strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS order_date_str
FROM orders
"""


@register("fn_cast", oracle=_F5_ORACLE)
def fn_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.col("o_orderkey").cast("string").alias("key_str"),
        F.round("o_totalprice", 2)
        .cast("decimal(12,2)")
        .cast("string")
        .alias("price_dec_str"),
        F.expr("CAST(o_totalprice - (o_totalprice % 1) AS BIGINT)").alias("price_int"),
        F.col("o_orderkey").cast("double").alias("key_dbl"),
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss")
        .cast("timestamp_ntz")
        .alias("reparsed_ts"),
        F.col("o_orderdate").cast("date").cast("string").alias("order_date_str"),
    )


# ---------------------------------------------------------------------------
# M3 — nested / array / map / JSON / hash (f6-f10)
# ---------------------------------------------------------------------------

# posexplode oracle: DuckDB zips multiple unnest()s in one SELECT, and
# scalar generate_series(1, len(l)) yields the ordinality list.
_F6_ORACLE = """
SELECT
  vec_id,
  CAST(len(embedding) AS INTEGER) AS dim,
  CAST(unnest(generate_series(1, len(list_slice(embedding, 1, 8)))) - 1 AS INTEGER) AS pos,
  round(CAST(unnest(list_slice(embedding, 1, 8)) AS DOUBLE), 4) AS val,
  round(CAST(list_max(embedding) AS DOUBLE), 4) AS vmax,
  round(list_sort(list_transform(list_slice(embedding, 1, 3), x -> round(CAST(x AS DOUBLE), 4)))[1], 4) AS min_head3
FROM embeddings
"""


@register("fn_array", oracle=_F6_ORACLE)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array ops: size/slice/sort/max + posexplode (the revision-array
    flattening analog from the MediaWiki model, SURVEY §1.3). 100 TB:
    posexplode multiplies row count by slice length — always slice/prune the
    array *before* exploding so the shuffle carries the narrow form."""
    emb = load_table(spark, sf_dir, "embeddings")
    head8 = F.slice(F.col("embedding").cast("array<double>"), 1, 8)
    head3r = F.transform(
        F.slice(F.col("embedding").cast("array<double>"), 1, 3),
        lambda x: F.round(x, 4),
    )
    return emb.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.posexplode(head8).alias("pos", "raw_val"),
        F.round(F.array_max(F.col("embedding").cast("array<double>")), 4).alias("vmax"),
        F.round(F.array_sort(head3r).getItem(0), 4).alias("min_head3"),
    ).select(
        "vec_id", "dim", "pos", F.round("raw_val", 4).alias("val"), "vmax", "min_head3"
    )


_F7_ORACLE = """
WITH t AS (
  SELECT vec_id,
         CAST(len(list_filter(embedding, x -> x > 0)) AS INTEGER) AS n_pos,
         round(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE))), 4) AS sum_all,
         round(sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 4) AS l2,
         list_transform(list_slice(embedding, 1, 3), x -> round(CAST(x AS DOUBLE) * 2 + 1, 4)) AS sh
  FROM embeddings
)
SELECT vec_id, n_pos, sum_all, l2,
       sh[1] AS scaled_h0, sh[2] AS scaled_h1, sh[3] AS scaled_h2
FROM t
"""


@register("fn_array_hof", oracle=_F7_ORACLE)
def fn_array_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order lambdas (transform/filter/aggregate) — all JVM-side
    Catalyst expressions; this is the no-UDF vector math path that the
    similarity operators (l3/l4) build on.

    Output-schema contract: the transformed head is UNPACKED into scalar
    double columns — the verification harness canonicalizes results with
    pandas sort_values, which cannot hash list cells, so no registered query
    may emit array/map/struct columns (tests/test_registry.py enforces)."""
    emb = load_table(spark, sf_dir, "embeddings")
    dvec = F.col("embedding").cast("array<double>")
    sh = F.transform(F.slice(dvec, 1, 3), lambda x: F.round(x * 2 + 1, 4))
    return emb.select(
        "vec_id",
        F.size(F.filter("embedding", lambda x: x > 0)).alias("n_pos"),
        F.round(F.aggregate(dvec, F.lit(0.0), lambda a, x: a + x), 4).alias("sum_all"),
        F.round(
            F.sqrt(F.aggregate(dvec, F.lit(0.0), lambda a, x: a + x * x)), 4
        ).alias("l2"),
        sh.getItem(0).alias("scaled_h0"),
        sh.getItem(1).alias("scaled_h1"),
        sh.getItem(2).alias("scaled_h2"),
    )


# DuckDB 1.0 map[key] yields a LIST -> [1] extracts the scalar.
_F8_ORACLE = """
WITH m AS (
  SELECT doc_id, map {'lang': lang, 'source': source} AS meta FROM documents
)
SELECT doc_id,
       array_to_string(list_sort(map_keys(meta)), ',') AS keys_sorted,
       meta['lang'][1] AS lang_val,
       meta['source'][1] AS source_val,
       CAST(cardinality(meta) AS INTEGER) AS n_keys,
       list_contains(map_keys(meta), 'lang') AS has_lang
FROM m
"""


@register("fn_map", oracle=_F8_ORACLE)
def fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map build/inspect (f8). The map itself never leaves the operator —
    raw map cells are engine-ordered (not canonical) AND unhashable by the
    harness's pandas canonicalizer; every emitted column is a deterministic
    scalar DERIVED from the map, which upgrades f8 from rows-only to a full
    SQL oracle."""
    docs = load_table(spark, sf_dir, "documents")
    m = F.create_map(
        F.lit("lang"), F.col("lang"), F.lit("source"), F.col("source")
    )
    return docs.select(
        "doc_id",
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("keys_sorted"),
        F.element_at(m, F.lit("lang")).alias("lang_val"),
        F.element_at(m, F.lit("source")).alias("source_val"),
        F.size(m).alias("n_keys"),
        F.array_contains(F.map_keys(m), "lang").alias("has_lang"),
    )


_F9_ORACLE = """
SELECT
  event_id,
  json_extract_string(props, '$.k') AS k_str,
  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int,
  CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) >= 50
       THEN 'high' ELSE 'low' END AS k_bucket
FROM events
"""


@register("fn_json", oracle=_F9_ORACLE)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from events.props — both the stringly
    get_json_object path and the schema-ized from_json path."""
    ev = load_table(spark, sf_dir, "events")
    parsed = F.from_json(F.col("props"), "k BIGINT")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        parsed.getField("k").alias("k_int"),
        F.when(parsed.getField("k") >= 50, "high").otherwise("low").alias("k_bucket"),
    )


_F10_ORACLE = """
SELECT doc_id, md5(text) AS text_md5, sha256(text) AS text_sha256
FROM documents
"""


@register("fn_hash", oracle=_F10_ORACLE)
def fn_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cryptographic content hashes (the revision sha1 analog, SURVEY §1.1).
    DuckDB 1.0 lacks sha1 — it lives in fn_hash_noncrypto (rows-only)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.sha2("text", 256).alias("text_sha256"),
    )


@register("fn_hash_noncrypto", oracle=None)  # xxhash64/crc32/sha1 absent in DuckDB 1.0
def fn_hash_noncrypto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-portable hashes: sha1, xxhash64, crc32 (Spark-native). 100 TB:
    xxhash64 is the cheap partitioning/fingerprint hash of choice — it's
    what Spark's own shuffle hashing uses."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.sha1("text").alias("text_sha1"),
        F.xxhash64("text").alias("text_xx64"),
        F.crc32("text").alias("text_crc32"),
    )


_BITWISE_ORACLE = """
SELECT o_orderkey,
       o_orderkey & 255 AS low_byte,
       o_orderkey | 4096 AS with_flag,
       xor(o_orderkey, o_custkey) AS keys_xor,
       o_orderkey << 2 AS shl2,
       o_orderkey >> 3 AS shr3,
       CAST(bit_count(o_orderkey) AS INTEGER) AS popcount
FROM orders
"""


@register("fn_bitwise", oracle=_BITWISE_ORACLE)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise ops — flags, shards, bloom/bitmap arithmetic. Narrow
    codegen'd projection, no shuffle."""
    orders = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    return orders.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).alias("low_byte"),
        k.bitwiseOR(F.lit(4096)).alias("with_flag"),
        k.bitwiseXOR(F.col("o_custkey")).alias("keys_xor"),
        F.shiftleft(k, 2).alias("shl2"),
        F.shiftright(k, 3).alias("shr3"),
        F.bit_count(k).alias("popcount"),
    )


_DATEPART_ORACLE = """
SELECT o_orderkey,
       CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
       CAST(weekofyear(o_orderdate) AS INTEGER) AS iso_week,
       CAST(dayofyear(o_orderdate) AS INTEGER) AS doy,
       CAST(o_orderdate + INTERVAL 3 MONTH AS VARCHAR) AS plus_3mo,
       CAST(o_orderdate - INTERVAL 90 DAY AS VARCHAR) AS minus_90d
FROM orders
"""


@register("fn_datepart", oracle=_DATEPART_ORACLE)
def fn_datepart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar parts + interval arithmetic (f2 companion): quarter / ISO
    week / day-of-year extraction and month-granular interval shifts, the
    partition-key derivations a time-partitioned lake uses."""
    orders = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return orders.select(
        "o_orderkey",
        F.quarter(d).alias("qtr"),
        F.weekofyear(d).alias("iso_week"),
        F.dayofyear(d).alias("doy"),
        F.date_format(d + F.expr("INTERVAL 3 MONTH"), "yyyy-MM-dd HH:mm:ss").alias(
            "plus_3mo"
        ),
        F.date_format(d - F.expr("INTERVAL 90 DAY"), "yyyy-MM-dd HH:mm:ss").alias(
            "minus_90d"
        ),
    )


_F11_ORACLE = """
SELECT c_nationkey,
       string_agg(c_name, ',' ORDER BY c_name) AS members,
       COUNT(*) AS n
FROM customer
WHERE c_custkey <= 300
GROUP BY c_nationkey
"""


@register("fn_string_agg", oracle=_F11_ORACLE)
def fn_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """f11: ordered string aggregation (LISTAGG / string_agg) — spelled as
    array_sort(collect_list) + array_join so the concatenation order is
    pinned (collect order is partition-dependent, SURVEY §4.3).

    100 TB notes: string aggregation is only sane over BOUNDED groups (the
    filter keeps ≤300 members here); an unbounded group concatenates a
    partition's worth of text into one row — use collect with slice caps
    or explode-side processing instead. The agg itself is one shuffle with
    map-side partial collect."""
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 300)
    return cust.groupBy("c_nationkey").agg(
        F.array_join(F.array_sort(F.collect_list("c_name")), ",").alias("members"),
        F.count(F.lit(1)).alias("n"),
    )


# f12: timezone conversions. Both engines carry full IANA tzdata (Spark via
# the JVM, DuckDB via bundled ICU), so wall-clock strings hash-match exactly
# — including across DST boundaries (the -300 vs -240 minute offsets below).
# DuckDB spelling: `ts AT TIME ZONE 'UTC'` pins the naive timestamp to the
# UTC instant; `timezone(tz, tstz)` re-reads that instant as tz wall time.
_F12_ORACLE = """
SELECT o_orderkey,
  strftime(timezone('America/New_York', o_orderdate AT TIME ZONE 'UTC'),
           '%Y-%m-%d %H:%M:%S') AS ny_wall,
  strftime(timezone('Asia/Tokyo', o_orderdate AT TIME ZONE 'UTC'),
           '%Y-%m-%d %H:%M:%S') AS tokyo_wall,
  CAST(hour(timezone('America/New_York', o_orderdate AT TIME ZONE 'UTC'))
       AS INTEGER) AS ny_hour,
  strftime(CAST(timezone('America/New_York', o_orderdate AT TIME ZONE 'UTC')
                AS DATE), '%Y-%m-%d') AS ny_date,
  CAST((epoch(timezone('America/New_York', o_orderdate AT TIME ZONE 'UTC'))
        - epoch(o_orderdate)) // 60 AS INTEGER) AS ny_off_min,
  strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS roundtrip
FROM orders
"""


@register("fn_timezone", oracle=_F12_ORACLE)
def fn_timezone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """f12: timezone conversion matrix — UTC instants rendered as
    America/New_York and Asia/Tokyo wall clocks (`from_utc_timestamp`),
    the local hour/date they land in (date shifts across midnight), the
    UTC-offset in minutes (DST-aware: NY flips -300/-240), and the
    to_utc_timestamp round-trip proving the conversion is lossless.

    100 TB notes: pure narrow projection, zero shuffles; timezone math is
    JVM-side whole-stage codegen (no Python). This is the ingestion-time
    normalization step for any multi-region event lake: store UTC, derive
    local wall fields at query time — never store local wall clocks."""
    orders = load_table(spark, sf_dir, "orders")
    ts = F.col("o_orderdate").cast("timestamp")
    ny = F.from_utc_timestamp(ts, "America/New_York")
    return orders.select(
        "o_orderkey",
        F.date_format(ny, "yyyy-MM-dd HH:mm:ss").alias("ny_wall"),
        F.date_format(F.from_utc_timestamp(ts, "Asia/Tokyo"), "yyyy-MM-dd HH:mm:ss")
        .alias("tokyo_wall"),
        F.hour(ny).alias("ny_hour"),
        F.date_format(ny.cast("date"), "yyyy-MM-dd").alias("ny_date"),
        ((F.unix_timestamp(ny.cast("timestamp")) - F.unix_timestamp(ts)) / 60)
        .cast("int")
        .alias("ny_off_min"),
        F.date_format(
            F.to_utc_timestamp(ny, "America/New_York"), "yyyy-MM-dd HH:mm:ss"
        ).alias("roundtrip"),
    )


# --------------------------------------------------------------------------
# x57 — URL parsing (the importer's interwiki/external-link handling analog)
# --------------------------------------------------------------------------

_URL_ORACLE = """
WITH u AS (
  SELECT doc_id,
         'https://' || lang || '.wikipedia.org/wiki/' || source || '_' ||
           CAST(doc_id AS VARCHAR) || '?id=' || CAST(doc_id AS VARCHAR) ||
           '&ref=' || source AS url
  FROM documents
)
SELECT doc_id, url,
       regexp_extract(url, '^([a-z]+)://', 1) AS protocol,
       regexp_extract(url, '^[a-z]+://([^/?#]+)', 1) AS host,
       regexp_extract(url, '^[a-z]+://[^/?#]+([^?#]*)', 1) AS path,
       regexp_extract(url, '[?&]id=([^&#]*)', 1) AS q_id,
       regexp_extract(url, '[?&]ref=([^&#]*)', 1) AS q_ref
FROM u
"""


@register("fn_url_parse", oracle=_URL_ORACLE)
def fn_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x57: URL decomposition with Spark's native ``parse_url`` — protocol /
    host / path / individual query parameters. The MediaWiki importer's
    external-link and interwiki handling analog (SURVEY §1.1 [SPEC]): link
    tables store parsed components, not raw strings. The oracle replicates
    each component with anchored regexes, proving the parse is portable.

    100 TB: narrow codegen'd projection, no shuffle; parse_url is JVM-side
    (no Python hop), so link extraction rides the scan."""
    docs = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("lang"),
        F.lit(".wikipedia.org/wiki/"),
        F.col("source"),
        F.lit("_"),
        F.col("doc_id").cast("string"),
        F.lit("?id="),
        F.col("doc_id").cast("string"),
        F.lit("&ref="),
        F.col("source"),
    )
    u = docs.select("doc_id", url.alias("url"))
    return u.select(
        "doc_id",
        "url",
        F.parse_url("url", F.lit("PROTOCOL")).alias("protocol"),
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY"), F.lit("id")).alias("q_id"),
        F.parse_url("url", F.lit("QUERY"), F.lit("ref")).alias("q_ref"),
    )


# --------------------------------------------------------------------------
# x187 — error-safe function family (try_*): ANSI mode without the crashes
# --------------------------------------------------------------------------
# This engine runs under ANSI semantics (Spark 4 default), where bad casts,
# /0 and out-of-range element_at RAISE. The try_* family is the contracted
# escape hatch: NULL instead of error, per value. The oracle spells the
# same semantics in portable SQL (TRY_CAST; NULLIF-guarded division; DuckDB
# list_extract is already NULL-on-out-of-bounds where ANSI Spark needs
# try_element_at — an engine-default difference this row pins explicitly).

_TRY_ORACLE = """
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN TRY_CAST(o_orderpriority AS INTEGER) IS NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_cast_null,
       CAST(SUM(CASE WHEN TRY_CAST(substring(o_orderpriority, 1, 1) AS INTEGER)
                          IS NOT NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_prefix_ok,
       CAST(SUM(CASE WHEN o_custkey % 3 = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_div_null,
       ROUND(SUM(CASE WHEN o_custkey % 3 <> 0
                      THEN CAST(ROUND(o_totalprice * 100) AS BIGINT)
                           // (o_custkey % 3)
                      ELSE 0 END) / 100.0, 2) AS safe_div_total
FROM orders
GROUP BY o_orderpriority
"""


@register("fn_try_safe", oracle=_TRY_ORACLE)
def fn_try_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x187: the TRY_* error-safe family under ANSI mode — try_cast on a
    non-numeric string (NULL, counted), try_cast on its numeric prefix
    (succeeds, counted), and try_divide by a modulus that hits zero (NULL,
    counted; the surviving quotients integer-summed). Under ANSI (this
    engine's default) the unguarded spellings of all three RAISE — this
    row pins the recover-don't-crash contract the ingest layer depends on
    when a dump carries malformed fields.

    The division is integer (cents DIV k) so the safe-total is exact;
    DuckDB lacks try_divide, so the oracle spells the identical semantic
    with a zero-guard CASE — same NULL pattern, same values.

    100 TB: one partial-aggregated scan; try_* are per-value codegen
    expressions — but NOT zero-cost on failing input: a FAILING ANSI cast
    raises internally and TryEval catches it, ~12 µs/row (measured: the
    always-failing try_cast aggregate alone was 2.0 s of this query's
    2.2 s at sf0.1; the always-succeeding one is free). r14 (guide §1.2
    step 2): short-circuit rows containing an ASCII letter to NULL before
    the real try_cast — no integer-parseable string contains a letter
    (Spark's cast grammar is [ws][+-]digits[ws]), so the guarded form is
    value-identical for EVERY input while only plausibly-numeric strings
    pay the parse. Measured: 2.1 s -> 0.3 s for the aggregate, full query
    1.9 s -> ~0.4 s, identical rows."""
    orders = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    k = F.col("o_custkey") % 3
    safe_q = F.try_divide(cents, F.nullif(k, F.lit(0)))
    guarded_cast = F.when(
        F.col("o_orderpriority").rlike("[A-Za-z]"), F.lit(None).cast("int")
    ).otherwise(F.col("o_orderpriority").try_cast("int"))
    return orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(
            F.when(guarded_cast.isNull(), 1)
            .otherwise(0)
        )
        .cast("long")
        .alias("n_cast_null"),
        F.sum(
            F.when(
                F.substring("o_orderpriority", 1, 1).try_cast("int").isNotNull(),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_prefix_ok"),
        F.sum(F.when(k == 0, 1).otherwise(0)).cast("long").alias("n_div_null"),
        F.round(
            F.sum(
                F.when(k != 0, F.floor(safe_q).cast("long")).otherwise(0)
            )
            / 100.0,
            2,
        ).alias("safe_div_total"),
    )


# --------------------------------------------------------------------------
# x256 — binary codec round-trips (base64 / hex) as a checked surface
# --------------------------------------------------------------------------

_CODEC_ORACLE = """
SELECT doc_id,
       to_base64(CAST(substr(text, 1, 24) AS BLOB)) AS b64,
       hex(CAST(substr(text, 1, 12) AS BLOB)) AS hx,
       CASE WHEN CAST(from_base64(to_base64(CAST(substr(text, 1, 24) AS BLOB)))
                      AS VARCHAR) = substr(text, 1, 24)
            THEN 1 ELSE 0 END AS b64_roundtrip_ok,
       CASE WHEN CAST(unhex(hex(CAST(substr(text, 1, 12) AS BLOB)))
                      AS VARCHAR) = substr(text, 1, 12)
            THEN 1 ELSE 0 END AS hex_roundtrip_ok,
       CAST(octet_length(CAST(substr(text, 1, 24) AS BLOB)) AS BIGINT)
         AS n_bytes
FROM documents
"""


@register("fn_binary_codecs", oracle=_CODEC_ORACLE)
def fn_binary_codecs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x256: BINARY CODEC surface — base64 and hex encodings of document
    prefixes with EXPLICIT round-trip verification columns, completing
    §2.8's string/binary coverage (f10 hashes content; this moves it
    between representations losslessly — the wire-format conversions
    every ingest/egress boundary performs). The round-trip flags make the
    op self-auditing: a padding or case bug on either engine fails the
    hash oracle AND shows up as a 0 flag.

    Cross-engine notes: base64 of a 24-byte prefix never emits '=' padding
    ambiguity differences (24 % 3 == 0 — chosen deliberately; 22-byte
    prefixes would expose Spark's RFC 4648 padding vs any chunked-MIME
    variant); hex() is uppercase on both engines.

    100 TB: narrow per-row projection, zero shuffles — the codec cost is
    the bytes themselves."""
    docs = load_table(spark, sf_dir, "documents")
    p24 = F.encode(F.substring("text", 1, 24), "UTF-8")
    p12 = F.encode(F.substring("text", 1, 12), "UTF-8")
    return docs.select(
        "doc_id",
        F.base64(p24).alias("b64"),
        F.hex(p12).alias("hx"),
        F.when(
            F.decode(F.unbase64(F.base64(p24)), "UTF-8")
            == F.substring("text", 1, 24),
            1,
        )
        .otherwise(0)
        .alias("b64_roundtrip_ok"),
        F.when(
            F.decode(F.unhex(F.hex(p12)), "UTF-8") == F.substring("text", 1, 12),
            1,
        )
        .otherwise(0)
        .alias("hex_roundtrip_ok"),
        F.octet_length(p24).cast("long").alias("n_bytes"),
    )


# --------------------------------------------------------------------------
# x319 — business-day arithmetic (closed-form weekday counting)
# --------------------------------------------------------------------------

# C(d) = number of WEEKDAYS in epoch days [0, d): 5 per full week plus a
# remainder lookup anchored on 1970-01-01 being a THURSDAY (epoch day 0:
# Thu, 1: Fri, 2: Sat, 3: Sun, 4: Mon, 5: Tue, 6: Wed) — so the partial
# week contributes [0,1,2,2,2,3,4][d mod 7] weekdays. Pure integers; no
# calendar/session-timezone/locale surface at all (trap: dayofweek
# numbering differs across engines — this never calls it).
_BDAY_REM = (0, 1, 2, 2, 2, 3, 4)


def _bday_c_sql(d: str) -> str:
    rem = " ".join(
        f"WHEN {k} THEN {v}" for k, v in enumerate(_BDAY_REM) if k
    )
    return f"(5 * (({d}) // 7) + CASE ({d}) % 7 {rem} ELSE 0 END)"


_BDAY_ORACLE = f"""
WITH lag AS (
  SELECT o.o_orderpriority AS priority,
         CAST(epoch_us(o.o_orderdate) AS BIGINT) // 86400000000 AS d1,
         CAST(epoch_us(MAX(l.l_shipdate)) AS BIGINT) // 86400000000 AS d2
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY o.o_orderkey, o.o_orderpriority, o.o_orderdate
),
bd AS (
  SELECT priority, d2 - d1 AS cal_days,
         {_bday_c_sql("d2")} - {_bday_c_sql("d1")} AS bus_days
  FROM lag
)
SELECT priority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(CAST(SUM(cal_days) AS DOUBLE) / COUNT(*), 6) AS avg_cal_days,
       ROUND(CAST(SUM(bus_days) AS DOUBLE) / COUNT(*), 6) AS avg_bus_days,
       CAST(MIN(bus_days) AS BIGINT) AS min_bus_days,
       CAST(MAX(bus_days) AS BIGINT) AS max_bus_days
FROM bd GROUP BY priority
"""


@register("fn_business_days", oracle=_BDAY_ORACLE)
def fn_business_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x319: BUSINESS-DAY ARITHMETIC — order-to-final-ship lag in
    WEEKDAYS per priority class (the SLA unit contracts are written
    in), next to x210's calendar-day percentiles. NETWORKDAYS-style
    counting via the closed form C(d2) − C(d1) with C(d) = 5·(d div 7)
    + rem[d mod 7] anchored on epoch day 0 = Thursday: one integer
    expression per row, no generate_series-per-row explode, no
    engine dayofweek() (whose numbering differs across engines —
    the classic cross-engine calendar trap this formula sidesteps).
    The distance is SIGNED: this synthetic corpus ships on both sides
    of the order date, and C(d2) − C(d1) handles reversed spans as
    −(weekdays between) with no case split (test-verified against a
    day-by-day calendar walk).

    100 TB: the per-order max-shipdate agg is the only shuffle; the
    weekday math is codegen-resident integer arithmetic; |priorities|
    rows out."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    day = (
        lambda c: F.expr(
            f"timestampdiff(DAY, CAST('1970-01-01 00:00:00' AS"
            f" TIMESTAMP_NTZ), {c})"
        ).cast("long")
    )  # noqa: E731
    # Aggregate BEFORE the join (r14, the orders_open_backlog device):
    # lineitem collapses to its per-order max(shipdate) map-side first —
    # o_orderkey is unique, so grouping the joined rows by (orderkey,
    # priority, date) was the same per-order max with a 3-column group key
    # and a fact-grain probe; this form probes/joins order-grain rows
    # (interleaved 0.97 -> 0.63 s at sf0.1).
    per_order = li.groupBy("l_orderkey").agg(
        F.max("l_shipdate").alias("max_ship")
    )
    lag = o.join(per_order, per_order.l_orderkey == o.o_orderkey).select(
        F.col("o_orderpriority").alias("priority"),
        day("o_orderdate").alias("d1"),
        day("max_ship").alias("d2"),
    )

    def c_of(col: str):
        rem = F.lit(0)
        for k, v in enumerate(_BDAY_REM):
            if k:
                rem = F.when(F.col(col) % 7 == k, v).otherwise(rem)
        return 5 * F.expr(f"{col} div 7") + rem

    bd = lag.select(
        "priority",
        (F.col("d2") - F.col("d1")).alias("cal_days"),
        (c_of("d2") - c_of("d1")).alias("bus_days"),
    )
    return bd.groupBy("priority").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.round(F.sum("cal_days").cast("double") / F.count(F.lit(1)), 6).alias(
            "avg_cal_days"
        ),
        F.round(F.sum("bus_days").cast("double") / F.count(F.lit(1)), 6).alias(
            "avg_bus_days"
        ),
        F.min("bus_days").cast("long").alias("min_bus_days"),
        F.max("bus_days").cast("long").alias("max_bus_days"),
    )
