"""Events-analytics composites (x58-x63): the invariants the oracle hash
can't express — probability-mass conservation, session separation, hop
latency bounds."""

from __future__ import annotations

from conftest import SF_SMOKE

from wikipedia_org_xmldump_importer_spark.queries.graph_ops import (
    graph_pagerank_iter,
)
from wikipedia_org_xmldump_importer_spark.queries.timeseries import (
    _ATTR_WINDOW_US,
    events_funnel_attribution,
)
from wikipedia_org_xmldump_importer_spark.queries.windows import (
    _SESSION_GAP_US,
    win_sessionize,
)


def test_pagerank_mass_conserved_and_positive(spark):
    """PageRank is a probability distribution: total mass 1 (modulo the
    per-iteration rounding), every node strictly positive."""
    pdf = graph_pagerank_iter(spark, SF_SMOKE).toPandas()
    assert abs(pdf["pagerank"].sum() - 1.0) < 1e-3, pdf["pagerank"].sum()
    assert (pdf["pagerank"] > 0).all()
    # bipartite: customer ids >= 0, supplier ids <= -1 (sign-disjoint)
    assert (pdf["node"] >= 0).any() and (pdf["node"] <= -1).any()


def test_sessionize_sessions_are_separated_and_numbered(spark):
    """Consecutive sessions of one user are separated by MORE than the gap
    (else they'd be one session), and session ids are 1..k dense."""
    pdf = (
        win_sessionize(spark, SF_SMOKE)
        .toPandas()
        .sort_values(["user_id", "session_id"])
    )
    assert (pdf["session_end_us"] >= pdf["session_start_us"]).all()
    for _, g in pdf.groupby("user_id"):
        starts = g["session_start_us"].to_numpy()
        ends = g["session_end_us"].to_numpy()
        assert (starts[1:] - ends[:-1] > _SESSION_GAP_US).all()
        assert list(g["session_id"]) == list(range(1, len(g) + 1))


def test_attribution_hop_latencies_within_window(spark):
    """Every attributed hop is strictly causal and inside the attribution
    window — the join predicates, re-checked on the output."""
    pdf = events_funnel_attribution(spark, SF_SMOKE).toPandas()
    assert len(pdf) > 0
    for col in ("click_to_purchase_us", "view_to_click_us"):
        assert (pdf[col] > 0).all()
        assert (pdf[col] <= _ATTR_WINDOW_US).all()
    # one attributed chain per purchase
    assert pdf["purchase_id"].is_unique
