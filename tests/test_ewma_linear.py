"""Bit-equivalence of the linear applyInPandas EWMA-volatility kernel
(operators/ewma.py) against the registered quadratic prefix-fold form
(x302 ts_ewvol) — the docstring's 'past ~4e4 days, the linear single-pass
form is the same fold from applyInPandas' claim as a test. The linear
recurrence replays the identical IEEE op sequence every prefix fold runs,
so equality is EXACT, not approximate."""

from __future__ import annotations

from conftest import SF_SMOKE

from wikipedia_org_xmldump_importer_spark.operators.ewma import ewvol_linear
from wikipedia_org_xmldump_importer_spark.queries.timeseries import ts_ewvol


def _keyed(df):
    return {
        (r.event_type, r.day): (r.d_count, r.sigma2, r.ew_vol)
        for r in df.collect()
    }


def test_linear_kernel_matches_quadratic_fold_exactly(spark):
    quad = _keyed(ts_ewvol(spark, SF_SMOKE))
    lin = _keyed(ewvol_linear(spark, SF_SMOKE))
    assert lin == quad  # exact: same keys, same rounded trajectories


def test_linear_kernel_is_single_pass_shape(spark):
    # the scale claim: no quadratic HOF anywhere — the plan carries ONE
    # FlatMapGroupsInPandas and no aggregate()-over-slice expression
    from wikipedia_org_xmldump_importer_spark.plans.inspect import executed_plan

    plan = executed_plan(ewvol_linear(spark, SF_SMOKE))
    assert "FlatMapGroupsInPandas" in plan
    assert "slice(" not in plan
