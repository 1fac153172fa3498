"""SURVEY.md §2.10 — the UDF/UDAF/UDTF surface (ud1-ud3).

Engine policy (SURVEY §3.3): Python touches data ONLY here and in the
multimodal decode stub — always through Arrow batches (pandas UDF /
mapInPandas / arrow-optimized UDTF), never row-at-a-time pickling. Each
operator's logic is deliberately SQL-replicable so the DuckDB oracle can
verify the Arrow round-trip end-to-end.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..io import load_table, load_table_spread
from ..registry import register

_UD1_ORACLE = """
SELECT doc_id,
       trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                           ' +', ' ', 'g')) AS norm_text
FROM documents
"""


@register("udf_scalar_arrow", oracle=_UD1_ORACLE)
def udf_scalar_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized scalar pandas UDF: text normalization (lower, strip
    non-alnum, collapse whitespace).

    100 TB notes: Arrow-batched transfer amortizes the JVM↔Python hop to
    ~free per row; still ~10× slower than the equivalent Catalyst regexp
    chain (the oracle shows the built-in spelling) — UDFs are for logic
    Catalyst can't express, and this one exists to *verify the plumbing*."""

    @pandas_udf("string")
    def normalize(s: pd.Series) -> pd.Series:
        return (
            s.str.lower()
            .str.replace(r"[^a-z0-9 ]", "", regex=True)
            .str.replace(r" +", " ", regex=True)
            .str.strip()
        )

    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", normalize(F.col("text")).alias("norm_text"))


_UD2_ORACLE = """
SELECT c_nationkey,
       (CAST((((SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)
                 * ((c_custkey % 5) + 1)) * 20000 + SUM((c_custkey % 5) + 1))
          - (((SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)
                 * ((c_custkey % 5) + 1)) * 20000 + SUM((c_custkey % 5) + 1)) % (2 * SUM((c_custkey % 5) + 1)) + (2 * SUM((c_custkey % 5) + 1))) % (2 * SUM((c_custkey % 5) + 1)))) // (2 * SUM((c_custkey % 5) + 1))) AS BIGINT) / 1000000.0)
         AS weighted_bal
FROM customer
GROUP BY c_nationkey
"""


@register("udaf_grouped_agg", oracle=_UD2_ORACLE)
def udaf_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-agg pandas UDF: weighted mean of account balance.

    100 TB notes: GROUPED_AGG materializes each group as one pandas Series
    in a Python worker — group sizes must fit worker memory. For unbounded
    groups prefer the two-sum Catalyst spelling (the oracle's form) or a
    partial-aggregating applyInPandas."""

    @pandas_udf("double")
    def wmean(v: pd.Series, w: pd.Series) -> float:
        # exact integer-cent moments inside the worker (r11 sweep): the
        # int64 dot product is order-independent, so the result doesn't
        # depend on which partition layout fed this group's Series
        vu = (v * 100).round().astype("int64")
        wi = w.astype("int64")
        # half-up 6dp pin in arbitrary-precision Python ints (the _pin2
        # device; Python // IS floor-division, matching the SQL spelling)
        t = 20000 * int((vu * wi).sum()) + int(wi.sum())
        n2 = 2 * int(wi.sum())
        return float((t - t % n2) // n2) / 1e6

    cust = load_table(spark, sf_dir, "customer").withColumn(
        "weight", (F.col("c_custkey") % 5 + 1).cast("long")
    )
    return cust.groupBy("c_nationkey").agg(
        wmean(F.col("c_acctbal"), F.col("weight")).alias("weighted_bal")
    )


_UD3_ORACLE = """
SELECT doc_id,
       CAST(unnest(generate_series(1, len(string_split(text, ' ')))) - 1 AS INTEGER) AS pos,
       unnest(string_split(text, ' ')) AS token
FROM documents
"""


@register("udtf_table", oracle=_UD3_ORACLE)
def udtf_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 4) exploding documents into (pos, token) rows via
    a LATERAL join.

    100 TB notes: UDTFs evaluate per-row in Python workers — fine for
    fan-out transforms whose output dwarfs the compute (tokenization),
    wrong for hot scalar math. ``useArrow=True`` moves the executor↔worker
    transfer onto Arrow batches (ArrowEvalPythonUDTF, asserted by the plan
    audit) instead of pickled rows — the eval loop is still Python, but
    serialization stops dominating. The built-in posexplode spelling is
    preferred when the split logic is expressible (here it is; the UDTF
    exists to exercise the surface, and the oracle checks it
    row-for-row)."""
    from pyspark.sql.functions import udtf  # noqa: PLC0415

    @udtf(returnType="pos int, token string", useArrow=True)
    class Tokenize:
        def eval(self, text: str):  # noqa: ANN001
            if text is None:
                return
            for i, tok in enumerate(text.split(" ")):
                yield i, tok

    spark.udtf.register("tokenize_udtf", Tokenize)
    # r14: the per-row Python eval loop inherits the scan partitioning — a
    # single local parquet split ran the whole UDTF serially. The spread
    # guard parallelizes locally and is a no-op once the scan has >=
    # defaultParallelism splits (io.load_table_spread).
    docs = load_table_spread(spark, sf_dir, "documents", "doc_id")
    docs.createOrReplaceTempView("docs_udtf_v")
    return spark.sql(
        """
        SELECT d.doc_id, t.pos, t.token
        FROM docs_udtf_v d, LATERAL tokenize_udtf(d.text) t
        """
    )


# --------------------------------------------------------------------------
# ud4 / x193 — mapInArrow: the zero-copy record-batch API
# --------------------------------------------------------------------------

_UD4_ORACLE = """
SELECT doc_id,
       CAST(strlen(text) AS BIGINT) AS n_bytes,
       md5(text) AS payload_md5
FROM documents
"""


@register("udf_map_arrow", oracle=_UD4_ORACLE)
def udf_map_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ud4/x193: mapInArrow — the fourth Python-boundary API next to ud1
    (pandas scalar), ud2 (grouped agg) and ud3 (UDTF): the udf receives
    RAW pyarrow RecordBatches, no pandas materialization at all — the
    right boundary when the Python side is itself Arrow-native (Polars,
    DuckDB, vectorized tokenizers) and a pandas hop would copy every
    string. Logic (UTF-8 byte length + md5 of the payload) is
    SQL-replicable so the oracle verifies the Arrow round-trip exactly,
    per engine policy (module header).

    100 TB: one narrow map — no shuffle; batch size rides
    spark.sql.execution.arrow.maxRecordsPerBatch. Of the four APIs this
    one has the lowest per-batch overhead; it is still Python — keep hot
    paths in Catalyst (the oracle IS the Catalyst spelling)."""
    import hashlib  # noqa: PLC0415

    import pyarrow as pa  # noqa: PLC0415

    def per_batch(batches):
        for batch in batches:
            ids = batch.column("doc_id")
            texts = batch.column("text")
            py_texts = texts.to_pylist()
            yield pa.RecordBatch.from_arrays(
                [
                    ids,
                    pa.array(
                        [len(t.encode("utf-8")) for t in py_texts], pa.int64()
                    ),
                    pa.array(
                        [hashlib.md5(t.encode("utf-8")).hexdigest() for t in py_texts],
                        pa.string(),
                    ),
                ],
                names=["doc_id", "n_bytes", "payload_md5"],
            )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return docs.mapInArrow(
        per_batch, schema="doc_id bigint, n_bytes bigint, payload_md5 string"
    )
