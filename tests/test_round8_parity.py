"""Round-8 oracle-parity regression tests for the r7 advisor findings.

Each r7 advisory named an input class the sf fixtures never exercise
(non-ASCII text, a half-month-only event type, a dst-only Markov state)
where the Spark query and its DuckDB oracle would have diverged. These
tests build exactly that adversarial input in a tmp dir and assert the
two engines agree cell-for-cell under the same canonicalization the
driver's hash check uses (columns sorted by name, rows sorted, values
compared exactly) — so the fixes stay fixed even if the shipped
testdata never grows such rows.
"""

from __future__ import annotations

import math
from datetime import datetime

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq


def _duck(tmp, tables):
    con = duckdb.connect()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{tmp}/{t}.parquet')"
        )
    return con


def _norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else round(v, 9)
    if isinstance(v, datetime):
        return v.isoformat()
    item = getattr(v, "item", None)
    if item is not None and not isinstance(v, (int, str, bool, bytes)):
        return _norm(item())
    return v


def _rows(pdf):
    cols = sorted(pdf.columns)
    rows = [
        tuple(_norm(v) for v in r)
        for r in pdf[cols].itertuples(index=False, name=None)
    ]
    rows.sort(key=lambda r: tuple((x is None, str(type(x)), str(x)) for x in r))
    return cols, rows


def _assert_parity(spark_df, con, oracle_sql):
    s_cols, s_rows = _rows(spark_df.toPandas())
    d_cols, d_rows = _rows(con.execute(oracle_sql).fetch_df())
    assert s_cols == d_cols
    assert s_rows == d_rows


def _write_events(tmp, rows):
    """rows: (event_id, ts_us, user_id, event_type, value)."""
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array(
                    [datetime.utcfromtimestamp(r[1] / 1e6) for r in rows],
                    pa.timestamp("us"),
                ),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows], pa.string()),
                "value": pa.array([r[4] for r in rows], pa.float64()),
                "props": pa.array(["{}"] * len(rows), pa.string()),
            }
        ),
        f"{tmp}/events.parquet",
    )


def test_tar_members_nonascii_parity(spark, tmp_path):
    """r7 advisory 3: multi-byte text makes octet_length > n_chars; the
    declared member sizes must come from the encoded bytes or the walker
    desyncs. Greek/CJK/emoji docs, incl. one whose 40-char meta prefix is
    >40 bytes."""
    from wikipedia_org_xmldump_importer_spark.queries.textops import (
        _TAR_ORACLE,
        mm_tar_members,
    )

    texts = [
        "ascii only doc",
        "héllo wörld " * 10,  # 2-byte chars sprinkled
        "δ" * 100,  # every char 2 bytes; meta prefix 40 chars = 80 bytes
        "中文文本" * 30,  # 3-byte chars
        "🎉" * 45,  # 4-byte chars, > 512-byte payload
        "",  # empty text edge
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["xx"] * len(texts), pa.string()),
                "source": pa.array(["t"] * len(texts), pa.string()),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        f"{tmp_path}/documents.parquet",
    )
    out = mm_tar_members(spark, str(tmp_path))
    # every archive must walk cleanly (2 members, no desync -> no 0/None rows)
    pdf = out.toPandas()
    assert (pdf["n_members"] == 2).all()
    _assert_parity(out, _duck(tmp_path, ["documents"]), _TAR_ORACLE)


def test_psi_drift_one_sided_type_parity(spark, tmp_path):
    """r7 advisory 1: an event type present in only ONE half-month must
    survive with the empty period's denominator = 0 + smoothing in both
    engines (the old oracle inner-join dropped it)."""
    from wikipedia_org_xmldump_importer_spark.queries.quality_ops import (
        _PSI_ORACLE,
        dq_psi_drift,
    )

    day = 86_400_000_000
    rows = []
    eid = 0
    # "both": lives in both halves; "early": first half only; "late": second only
    for d, typ, val in [
        (2, "both", 10.0), (20, "both", 60.0), (3, "both", 10.0),
        (4, "early", 25.0), (5, "early", 75.0),
        (18, "late", 33.0), (19, "late", 99.0),
    ]:
        rows.append((eid, d * day + eid, 1 + eid % 3, typ, val))
        eid += 1
    _write_events(tmp_path, rows)
    out = dq_psi_drift(spark, str(tmp_path))
    types = {r.event_type for r in out.select("event_type").distinct().collect()}
    assert types == {"both", "early", "late"}  # one-sided types retained
    _assert_parity(out, _duck(tmp_path, ["events"]), _PSI_ORACLE)


def test_markov_stationary_dst_only_state_parity(spark, tmp_path):
    """r7 advisory 2: a state that only ever appears as a sequence
    TERMINATOR (dst-only) must not appear in one engine's output and not
    the other's. Both now report the distribution over src states."""
    from wikipedia_org_xmldump_importer_spark.queries.timeseries import (
        _MKSTAT_ORACLE,
        events_markov_stationary,
    )

    day = 86_400_000_000
    rows = []
    eid = 0
    # users cycle a<->b; user 3's sequence ends in "exit", which never has
    # an outgoing transition anywhere -> dst-only state
    for uid, seq in [
        (1, ["a", "b", "a", "b", "a"]),
        (2, ["b", "a", "b", "a"]),
        (3, ["a", "b", "exit"]),
    ]:
        for i, typ in enumerate(seq):
            rows.append((eid, (1 + i) * day + uid * 1000, uid, typ, 1.0))
            eid += 1
    _write_events(tmp_path, rows)
    out = events_markov_stationary(spark, str(tmp_path))
    states = {r.state for r in out.collect()}
    assert "exit" not in states and states == {"a", "b"}
    _assert_parity(out, _duck(tmp_path, ["events"]), _MKSTAT_ORACLE)
