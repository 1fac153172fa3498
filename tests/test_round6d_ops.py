"""Invariants for the x139-x141 operator batch: hysteresis state-machine
semantics, conversion-latency ordering, Matryoshka norm-retention bounds.
All at sf0.001 (smoke grain)."""

from __future__ import annotations

import math

from conftest import SF_SMOKE
from pyspark.sql import functions as F

from wikipedia_org_xmldump_importer_spark.io import load_table
from wikipedia_org_xmldump_importer_spark.queries.llm import (
    _TRUNC_DIMS,
    vec_truncate_retention,
)
from wikipedia_org_xmldump_importer_spark.queries.timeseries import (
    _HYST_HI,
    _HYST_LO,
    events_alert_hysteresis,
    events_time_to_convert,
)


def test_hysteresis_matches_sequential_replay(spark):
    """The windowed carry-forward must equal a literal per-user sequential
    replay of the Schmitt trigger (enter > HI, leave < LO)."""
    ev = (
        load_table(spark, SF_SMOKE, "events")
        .select("user_id", "ts", "event_id", "value")
        .collect()
    )
    by_user: dict = {}
    for r in ev:
        by_user.setdefault(r.user_id, []).append(r)
    expect = {}
    for uid, rows in by_user.items():
        rows.sort(key=lambda r: (r.ts, r.event_id))
        state, runs, cur = 0, [], 0
        for r in rows:
            if r.value > _HYST_HI:
                state = 1
            elif r.value < _HYST_LO:
                state = 0
            if state == 1:
                cur += 1
            elif cur:
                runs.append(cur)
                cur = 0
        if cur:
            runs.append(cur)
        if runs:
            expect[uid] = (len(runs), max(runs), sum(runs))
    got = {
        r.user_id: (r.n_episodes, r.longest_episode, r.n_alert_rows)
        for r in events_alert_hysteresis(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_hysteresis_debounces_midband_oscillation(spark):
    """Values oscillating strictly between LO and HI must never flip the
    state: a synthetic user whose values stay in (LO, HI) after one HI
    crossing yields exactly ONE episode spanning every subsequent row."""
    mid = (_HYST_HI + _HYST_LO) // 2
    rows = [(1, i, float(_HYST_HI + 1 if i == 0 else mid + (i % 2))) for i in range(9)]
    df = spark.createDataFrame(rows, "user_id long, event_id long, value double")
    df = df.withColumn("ts", F.timestamp_seconds(F.col("event_id") + 1_600_000_000))
    import wikipedia_org_xmldump_importer_spark.queries.timeseries as ts_mod

    orig = ts_mod.load_table
    ts_mod.load_table = lambda *_a, **_k: df
    try:
        out = events_alert_hysteresis(spark, "ignored").collect()
    finally:
        ts_mod.load_table = orig
    assert len(out) == 1
    assert out[0].n_episodes == 1 and out[0].n_alert_rows == 9


def test_time_to_convert_gaps_positive_and_bounded(spark):
    """Every cohort's median gap is strictly positive (purchase strictly
    after first view) and cohort counts sum to at most the distinct users
    with a view event."""
    out = events_time_to_convert(spark, SF_SMOKE).collect()
    ev = load_table(spark, SF_SMOKE, "events")
    n_viewers = (
        ev.filter(F.col("event_type") == "view").select("user_id").distinct().count()
    )
    assert sum(r.n_converted for r in out) <= n_viewers
    for r in out:
        assert r.median_gap_us > 0


def test_trunc_retention_bounds_and_full_slice_identity(spark):
    """Retention is in (0, 1]; a truncation at the full dimensionality
    retains exactly 1.0; the value matches a python recompute."""
    out = {r.vec_id: r.retention for r in vec_truncate_retention(spark, SF_SMOKE).collect()}
    emb = load_table(spark, SF_SMOKE, "embeddings").collect()
    for r in emb:
        v = [float(x) for x in r.embedding]
        full = math.sqrt(sum(x * x for x in v))
        head = math.sqrt(sum(x * x for x in v[:_TRUNC_DIMS]))
        assert 0.0 < out[r.vec_id] <= 1.0
        assert abs(out[r.vec_id] - head / full) < 1e-5
        if len(v) <= _TRUNC_DIMS:
            assert out[r.vec_id] == 1.0


def test_bm25_matches_python_recompute(spark):
    """Exact recompute of the fixed-point BM25 pipeline in Python — tf/df/
    dl/avgdl, micro-unit pinning, integer totals, deterministic rank."""
    from wikipedia_org_xmldump_importer_spark.queries.index_ops import (
        _BM25_B,
        _BM25_K1,
        _BM25_TERMS,
        _BM25_TOPK,
        search_bm25,
    )

    docs = load_table(spark, SF_SMOKE, "documents").collect()
    toks = {r.doc_id: r.text.split(" ") for r in docs}
    n_docs = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n_docs
    df = {
        term: sum(1 for t in toks.values() if term in t) for term in _BM25_TERMS
    }
    totals = {}
    for doc_id, t in toks.items():
        s = 0
        for term in _BM25_TERMS:
            tf = t.count(term)
            if not tf:
                continue
            idf = math.log((((n_docs - df[term]) + 0.5) / (df[term] + 0.5)) + 1.0)
            ratio = (tf * (_BM25_K1 + 1.0)) / (
                tf + _BM25_K1 * ((1.0 - _BM25_B) + _BM25_B * (len(t) / avgdl))
            )
            s += round((idf * ratio) * 1_000_000.0)
        if s:
            totals[doc_id] = s
    expect = sorted(totals.items(), key=lambda kv: (-kv[1], kv[0]))[:_BM25_TOPK]
    got = sorted(search_bm25(spark, SF_SMOKE).collect(), key=lambda r: r.rank)
    assert [(r.doc_id, round(r.bm25 * 1_000_000)) for r in got] == [
        (d, s) for d, s in expect
    ]
    assert [r.rank for r in got] == list(range(1, len(got) + 1))


def test_span_coverage_matches_python_recompute(spark):
    """Exact interval-union recompute: for every doc, union the [i, i+7]
    spans of 8-grams shared with another doc and count covered tokens."""
    from wikipedia_org_xmldump_importer_spark.queries.textops import (
        _SPAN_K,
        dedup_span_coverage,
    )

    docs = load_table(spark, SF_SMOKE, "documents").collect()
    toks = {r.doc_id: r.text.split(" ") for r in docs}
    gram_docs: dict = {}
    for doc_id, t in toks.items():
        for i in range(len(t) - _SPAN_K + 1):
            gram_docs.setdefault(" ".join(t[i : i + _SPAN_K]), set()).add(doc_id)
    expect = {}
    for doc_id, t in toks.items():
        covered = set()
        for i in range(len(t) - _SPAN_K + 1):
            if len(gram_docs[" ".join(t[i : i + _SPAN_K])]) >= 2:
                covered.update(range(i, i + _SPAN_K))
        expect[doc_id] = (len(t), len(covered))
    got = {
        r.doc_id: (r.n_tokens, r.covered_tokens)
        for r in dedup_span_coverage(spark, SF_SMOKE).collect()
    }
    assert got == expect
    for r in dedup_span_coverage(spark, SF_SMOKE).collect():
        assert 0 <= r.covered_tokens <= r.n_tokens


def test_mannwhitney_matches_python_recompute(spark):
    """Exact recompute of U and the tie-corrected z from the same hash
    assignment, midranks, and identically-ordered float epilogue."""
    import hashlib

    from wikipedia_org_xmldump_importer_spark.queries.timeseries import (
        events_ab_mannwhitney,
    )

    ev = load_table(spark, SF_SMOKE, "events").collect()
    per_user: dict = {}
    for r in ev:
        per_user[r.user_id] = per_user.get(r.user_id, 0) + (
            1 if r.event_type == "purchase" else 0
        )
    arms: dict = {}
    for uid, x in per_user.items():
        v = int(hashlib.md5(f"mw:{uid}".encode()).hexdigest()[:3], 16) % 2
        arms.setdefault(x, [0, 0])[0 if v == 0 else 1] += 1
    n_a = sum(a for a, _ in arms.values())
    n_b = sum(b for _, b in arms.values())
    cum, r2_a, tie_s = 0, 0, 0
    for x in sorted(arms):
        a, b = arms[x]
        t = a + b
        r2_a += a * (2 * cum + t + 1)
        tie_s += t * t * t - t
        cum += t
    u2_a = r2_a - n_a * (n_a + 1)
    n = n_a + n_b
    var12 = ((n_a * n_b) * ((n + 1.0) - (tie_s / (float(n) * (n - 1.0))))) / 12.0
    z = ((u2_a - n_a * n_b) / 2.0) / math.sqrt(var12)
    row = events_ab_mannwhitney(spark, SF_SMOKE).collect()[0]
    assert (row.n_a, row.n_b, row.u2_a) == (n_a, n_b, u2_a)
    assert abs(row.z_score - round(z, 6)) < 1e-9


def test_k_anonymity_partition_and_flags(spark):
    """Group sizes sum to the table size; every flag agrees with k; every
    customer maps to exactly one equivalence class."""
    from wikipedia_org_xmldump_importer_spark.queries.quality_ops import (
        _KANON_K,
        privacy_k_anonymity,
    )

    rows = privacy_k_anonymity(spark, SF_SMOKE).collect()
    n_cust = load_table(spark, SF_SMOKE, "customer").count()
    assert sum(r.group_size for r in rows) == n_cust
    for r in rows:
        assert r.violates_k == (r.group_size < _KANON_K)
    keys = [(r.c_nationkey, r.c_mktsegment, r.bal_bucket) for r in rows]
    assert len(keys) == len(set(keys))


def test_skew_report_ranks_and_factor(spark):
    """Hot ranks are dense from 1, counts non-increasing, and the skew
    factor recomputes from the key-grain counts."""
    from wikipedia_org_xmldump_importer_spark.queries.quality_ops import (
        dq_skew_report,
    )

    rows = sorted(dq_skew_report(spark, SF_SMOKE).collect(), key=lambda r: r.hot_rank)
    assert [r.hot_rank for r in rows] == list(range(1, len(rows) + 1))
    assert all(a.n >= b.n for a, b in zip(rows, rows[1:]))
    orders = load_table(spark, SF_SMOKE, "orders").collect()
    from collections import Counter

    counts = Counter(r.o_custkey for r in orders)
    mean = sum(counts.values()) / len(counts)
    for r in rows:
        assert counts[r.o_custkey] == r.n
        assert abs(r.skew_factor - round(r.n / mean, 6)) < 1e-9


def test_bitmap_distinct_equals_plain_distinct(spark):
    """The bitmap machinery must agree with groupBy + countDistinct."""
    from wikipedia_org_xmldump_importer_spark.queries.aggregates import (
        agg_bitmap_distinct,
    )

    got = {
        r.event_type: r.n_users for r in agg_bitmap_distinct(spark, SF_SMOKE).collect()
    }
    ev = load_table(spark, SF_SMOKE, "events")
    expect = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert got == expect


def test_acf_bounds_and_lag0_identity(spark):
    """|acf| ≤ 1 at every lag, and the estimator recomputes exactly from a
    Python replay of the integer-sum expansion."""
    from wikipedia_org_xmldump_importer_spark.queries.timeseries import (
        _ACF_MAX_LAG,
        ts_acf,
    )

    rows = {r.lag: r for r in ts_acf(spark, SF_SMOKE).collect()}
    assert set(rows) == set(range(1, _ACF_MAX_LAG + 1))
    ev = load_table(spark, SF_SMOKE, "events").collect()
    daily: dict = {}
    for r in ev:
        day = r.ts.strftime("%Y-%m-%d")
        daily[day] = daily.get(day, 0) + round(r.value * 100)
    xs = [daily[d] for d in sorted(daily)]
    n, s1, s2 = len(xs), sum(xs), sum(x * x for x in xs)
    m = s1 / n
    den = s2 - (float(n) * (m * m))
    for k in range(1, _ACF_MAX_LAG + 1):
        head, tail = xs[:-k], xs[k:]
        sxy = sum(a * b for a, b in zip(head, tail))
        num = (sxy - (m * float(sum(head) + sum(tail)))) + (float(len(head)) * (m * m))
        r = rows[k]
        assert r.n_pairs == n - k
        assert abs(r.acf - round(num / den, 6)) < 1e-9
        assert -1.0 - 1e-9 <= r.acf <= 1.0 + 1e-9


def test_drawdown_matches_python_recompute(spark):
    """Running-peak minus value recompute with earliest-argmax tie-break."""
    from wikipedia_org_xmldump_importer_spark.queries.timeseries import (
        ts_max_drawdown,
    )

    ev = load_table(spark, SF_SMOKE, "events").collect()
    daily: dict = {}
    for r in ev:
        day = r.ts.strftime("%Y-%m-%d")
        daily[day] = daily.get(day, 0) + round(r.value * 100)
    peak, best = 0, None
    for day in sorted(daily):
        peak = max(peak, daily[day])
        dd = peak - daily[day]
        if best is None or dd > best[1]:
            best = (day, dd, peak, daily[day])
    row = ts_max_drawdown(spark, SF_SMOKE).collect()[0]
    assert row.trough_day == best[0]
    assert row.drawdown == round(best[1] / 100.0, 2)
    assert row.peak_value == round(best[2] / 100.0, 2)
    assert row.drawdown_pct == round(best[1] / best[2], 6)


def test_reflected_running_matches_sequential_replay(spark):
    """The reflection identity must equal the literal clamped recurrence
    B_t = max(B_{t-1} + delta, 0), replayed per user in Python."""
    from wikipedia_org_xmldump_importer_spark.queries.windows import (
        win_reflected_running,
    )

    ev = (
        load_table(spark, SF_SMOKE, "events")
        .filter(F.col("event_type").isin("purchase", "click"))
        .collect()
    )
    by_user: dict = {}
    for r in ev:
        d = round(r.value * 100)
        by_user.setdefault(r.user_id, []).append(
            (r.ts, r.event_id, d if r.event_type == "purchase" else -d)
        )
    expect = {}
    for uid, rows in by_user.items():
        rows.sort(key=lambda t: (t[0], t[1]))
        bal, peak, floor_rows = 0, 0, 0
        for _, _, delta in rows:
            bal = max(bal + delta, 0)
            peak = max(peak, bal)
            floor_rows += bal == 0
        expect[uid] = (round(bal / 100.0, 2), round(peak / 100.0, 2), floor_rows)
    got = {
        r.user_id: (r.final_balance, r.peak_balance, r.n_floor_rows)
        for r in win_reflected_running(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_cuped_reduces_variance_vs_welch_shape(spark):
    """theta recomputes from pooled moments; the adjusted diff equals the
    raw diff minus theta times the covariate diff (Python replay)."""
    import hashlib
    from datetime import datetime

    from wikipedia_org_xmldump_importer_spark.queries.timeseries import (
        _CUPED_SPLIT,
        events_ab_cuped,
    )

    split = datetime.strptime(_CUPED_SPLIT, "%Y-%m-%d")
    ev = load_table(spark, SF_SMOKE, "events").collect()
    per_user: dict = {}
    for r in ev:
        if r.event_type != "purchase":
            continue
        x, y = per_user.get(r.user_id, (0, 0))
        if r.ts < split:
            x += 1
        else:
            y += 1
        per_user[r.user_id] = (x, y)
    all_users = {r.user_id for r in ev}
    for uid in all_users:
        per_user.setdefault(uid, (0, 0))
    n = len(per_user)
    sx = sum(x for x, _ in per_user.values())
    sy = sum(y for _, y in per_user.values())
    sxx = sum(x * x for x, _ in per_user.values())
    sxy = sum(x * y for x, y in per_user.values())
    theta = (sxy - ((float(sx) * sy) / n)) / (sxx - ((float(sx) * sx) / n))
    arms = {0: [0, 0, 0], 1: [0, 0, 0]}  # n, sy, sx
    for uid, (x, y) in per_user.items():
        v = int(hashlib.md5(f"cu:{uid}".encode()).hexdigest()[:3], 16) % 2
        arms[v][0] += 1
        arms[v][1] += y
        arms[v][2] += x
    diff = (arms[1][1] / arms[1][0] - arms[0][1] / arms[0][0]) - theta * (
        arms[1][2] / arms[1][0] - arms[0][2] / arms[0][0]
    )
    row = events_ab_cuped(spark, SF_SMOKE).collect()[0]
    assert (row.n_a, row.n_b) == (arms[0][0], arms[1][0])
    assert abs(row.theta - round(theta, 6)) < 1e-9
    assert abs(row.adj_diff - round(diff, 6)) < 1e-6


def test_kcore_matches_sequential_peel(spark):
    """The unrolled peel must equal the run-to-fixpoint sequential peel at
    this SF (and the fixpoint must be reached within the round budget)."""
    from wikipedia_org_xmldump_importer_spark.queries.graph_ops import (
        _KCORE_K,
        _KCORE_ROUNDS,
        graph_kcore,
    )

    orders = load_table(spark, SF_SMOKE, "orders").collect()
    li = load_table(spark, SF_SMOKE, "lineitem").collect()
    cust_of = {r.o_orderkey: r.o_custkey for r in orders}
    adj: dict = {}
    for r in li:
        c, s = cust_of[r.l_orderkey], -(r.l_suppkey + 1)
        adj.setdefault(c, set()).add(s)
        adj.setdefault(s, set()).add(c)
    alive = set(adj)
    rounds = 0
    while True:
        dead = {n for n in alive if len(adj[n] & alive) < _KCORE_K}
        if not dead:
            break
        alive -= dead
        rounds += 1
    assert rounds <= _KCORE_ROUNDS, "fixpoint exceeds the unrolled budget"
    got = {r.node: (r.in_core, r.core_deg) for r in graph_kcore(spark, SF_SMOKE).collect()}
    assert set(got) == set(adj)
    for n in adj:
        assert got[n] == (n in alive, len(adj[n] & alive) if n in alive else 0)


def test_path_trigrams_counts_and_order(spark):
    """Counts recompute from a per-user sequential replay; ranks dense."""
    from wikipedia_org_xmldump_importer_spark.queries.timeseries import (
        events_path_trigrams,
    )

    ev = load_table(spark, SF_SMOKE, "events").collect()
    by_user: dict = {}
    for r in ev:
        by_user.setdefault(r.user_id, []).append((r.ts, r.event_id, r.event_type))
    from collections import Counter

    paths: Counter = Counter()
    for rows in by_user.values():
        rows.sort()
        types = [t for _, _, t in rows]
        for i in range(len(types) - 2):
            paths[">".join(types[i : i + 3])] += 1
    expect = sorted(paths.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = sorted(events_path_trigrams(spark, SF_SMOKE).collect(), key=lambda r: r.rank)
    assert [(r.path, r.n) for r in got] == expect


def test_centroid_affinity_bounds_and_self_consistency(spark):
    """|cos| ≤ 1; the full upper triangle is present exactly once; values
    agree with a numpy recompute over micro-unit-pinned centroids."""
    import numpy as np

    from wikipedia_org_xmldump_importer_spark.queries.llm import (
        embed_centroid_affinity,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings").collect()
    by_label: dict = {}
    for r in emb:
        by_label.setdefault(r.label, []).append(np.array(r.embedding, dtype="float64"))
    cent = {
        lab: np.round(np.mean(np.stack(vs), axis=0) * 1_000_000.0).astype("int64")
        for lab, vs in by_label.items()
    }
    labels = sorted(cent)
    rows = embed_centroid_affinity(spark, SF_SMOKE).collect()
    assert len(rows) == len(labels) * (len(labels) - 1) // 2
    got = {(r.label_a, r.label_b): r.centroid_cos for r in rows}
    for i, la in enumerate(labels):
        for lb in labels[i + 1 :]:
            dot = int(np.dot(cent[la], cent[lb]))
            na = int(np.dot(cent[la], cent[la]))
            nb = int(np.dot(cent[lb], cent[lb]))
            expect = round(dot / (np.sqrt(float(na)) * np.sqrt(float(nb))), 6)
            assert abs(got[(la, lb)] - expect) < 1e-9
            assert -1.0 - 1e-9 <= got[(la, lb)] <= 1.0 + 1e-9


def test_quantile_normalize_matches_python_recompute(spark):
    """Exact discrete inverse-CDF recompute: normalized value = smallest
    pooled value whose pooled quantile >= the group quantile (integer
    cross-multiplied compare), per (event_type, value)."""
    from bisect import bisect_left

    from wikipedia_org_xmldump_importer_spark.queries.pipeline import (
        quantile_normalize,
    )

    ev = load_table(spark, SF_SMOKE, "events").collect()
    from collections import Counter

    by_group: dict = {}
    pooled: Counter = Counter()
    for r in ev:
        c = round(r.value * 100)
        by_group.setdefault(r.event_type, Counter())[c] += 1
        pooled[c] += 1
    gvs = sorted(pooled)
    n_glob = sum(pooled.values())
    cum_glob = []
    acc = 0
    for gv in gvs:
        acc += pooled[gv]
        cum_glob.append(acc)
    expect = {}
    for g, cnt in by_group.items():
        n_g = sum(cnt.values())
        cg = 0
        for v in sorted(cnt):
            cg += cnt[v]
            # smallest gv with cum_glob * n_g >= cg * n_glob
            i = bisect_left([c * n_g for c in cum_glob], cg * n_glob)
            expect[(g, round(v / 100.0, 2))] = (
                round(cg / n_g, 6),
                round(gvs[i] / 100.0, 2),
            )
    got = {
        (r.event_type, r.value): (r.group_quantile, r.normalized_value)
        for r in quantile_normalize(spark, SF_SMOKE).collect()
    }
    assert got == expect


def test_quantile_normalize_is_monotone_and_idempotent_shape(spark):
    """Within a group, normalized values are monotone non-decreasing in
    the raw value, and the top value of every group maps to the pooled
    maximum."""
    from wikipedia_org_xmldump_importer_spark.queries.pipeline import (
        quantile_normalize,
    )

    rows = quantile_normalize(spark, SF_SMOKE).collect()
    by_group: dict = {}
    for r in rows:
        by_group.setdefault(r.event_type, []).append((r.value, r.normalized_value))
    pooled_max = max(r.normalized_value for r in rows)
    for vals in by_group.values():
        vals.sort()
        assert all(a[1] <= b[1] for a, b in zip(vals, vals[1:]))
        assert vals[-1][1] == pooled_max


def test_entropy_rate_identity_and_bounds(spark):
    """Per-state entropies are in [0, log2 |types|]; the *RATE* row equals
    the transition-count-weighted mean of the per-state rows."""
    from wikipedia_org_xmldump_importer_spark.queries.timeseries import (
        events_entropy_rate,
    )

    rows = events_entropy_rate(spark, SF_SMOKE).collect()
    per = [r for r in rows if r.cur_type != "*RATE*"]
    rate = [r for r in rows if r.cur_type == "*RATE*"][0]
    n_types = len(per)
    cap = math.log2(n_types) + 1e-6
    for r in per:
        assert 0.0 <= r.h_cond_bits <= cap
    total = sum(r.n_transitions for r in per)
    assert rate.n_transitions == total
    weighted = sum(r.n_transitions * r.h_cond_bits for r in per) / total
    assert abs(rate.h_cond_bits - weighted) < 1e-4


def test_jaccard_links_recompute(spark):
    """Top pairs recompute exactly from Python neighbor sets, including
    the integer-key ordering."""
    from wikipedia_org_xmldump_importer_spark.queries.graph_ops import (
        _JACCARD_TOPN,
        graph_jaccard_links,
    )

    orders = load_table(spark, SF_SMOKE, "orders").collect()
    li = load_table(spark, SF_SMOKE, "lineitem").collect()
    cust_of = {r.o_orderkey: r.o_custkey for r in orders}
    nb: dict = {}
    for r in li:
        nb.setdefault(r.l_suppkey, set()).add(cust_of[r.l_orderkey])
    supps = sorted(nb)
    cand = []
    for i, a in enumerate(supps):
        for b in supps[i + 1 :]:
            common = len(nb[a] & nb[b])
            if not common:
                continue
            union = len(nb[a]) + len(nb[b]) - common
            cand.append((common * 10**12 // union, a, b, common, union))
    cand.sort(key=lambda t: (-t[0], t[1], t[2]))
    expect = cand[:_JACCARD_TOPN]
    got = sorted(graph_jaccard_links(spark, SF_SMOKE).collect(), key=lambda r: r.rank)
    assert [(r.supp_a, r.supp_b, r.common) for r in got] == [
        (a, b, c) for _, a, b, c, _ in expect
    ]
    for r, (_, _, _, c, u) in zip(got, expect):
        assert abs(r.jaccard - round(c / u, 6)) < 1e-9


def test_median_ci_contains_median_and_ranks_valid(spark):
    """ci_lo ≤ median ≤ ci_hi; ranks are within [1, n]; the median equals
    numpy's lower-median of the raw cents."""
    from wikipedia_org_xmldump_importer_spark.queries.aggregates import agg_median_ci

    row = agg_median_ci(spark, SF_SMOKE).collect()[0]
    assert 1 <= row.r_lo <= row.r_med <= row.r_hi <= row.n
    assert row.ci_lo <= row.median <= row.ci_hi
    cents = sorted(
        round(r.o_totalprice * 100)
        for r in load_table(spark, SF_SMOKE, "orders").collect()
    )
    assert row.n == len(cents)
    assert row.median == round(cents[(len(cents) + 1) // 2 - 1] / 100.0, 2)
    assert row.ci_lo == round(cents[row.r_lo - 1] / 100.0, 2)
    assert row.ci_hi == round(cents[row.r_hi - 1] / 100.0, 2)


def test_ratio_delta_recompute(spark):
    """Per-arm ratio and delta variance recompute from Python moments."""
    import hashlib

    from wikipedia_org_xmldump_importer_spark.queries.timeseries import (
        events_ab_ratio_delta,
    )

    ev = load_table(spark, SF_SMOKE, "events").collect()
    per_user: dict = {}
    for r in ev:
        x, y = per_user.get(r.user_id, (0, 0))
        if r.event_type == "view":
            x += 1
        elif r.event_type == "purchase":
            y += round(r.value * 100)
        per_user[r.user_id] = (x, y)
    arms = {0: [], 1: []}
    for uid, (x, y) in per_user.items():
        v = int(hashlib.md5(f"rd:{uid}".encode()).hexdigest()[:3], 16) % 2
        arms[v].append((x, y))

    def stats(rows):
        n = len(rows)
        sx = sum(x for x, _ in rows)
        sy = sum(y for _, y in rows)
        sxx = sum(x * x for x, _ in rows)
        sxy = sum(x * y for x, y in rows)
        syy = sum(y * y for _, y in rows)
        ratio = sy / sx
        var = (
            (
                (syy - ((float(sy) * sy) / n))
                - ((2.0 * ratio) * (sxy - ((float(sx) * sy) / n)))
                + ((ratio * ratio) * (sxx - ((float(sx) * sx) / n)))
            )
            / (n - 1.0)
            / ((sx / n) * (sx / n))
        ) / n
        return n, ratio, var

    na, ra, va = stats(arms[0])
    nb, rb, vb = stats(arms[1])
    row = events_ab_ratio_delta(spark, SF_SMOKE).collect()[0]
    assert (row.n_a, row.n_b) == (na, nb)
    assert abs(row.ratio_a - round(ra / 100.0, 6)) < 1e-9
    assert abs(row.ratio_b - round(rb / 100.0, 6)) < 1e-9
    assert abs(row.z_score - round((rb - ra) / math.sqrt(va + vb), 6)) < 1e-6


def test_cohort_ltv_monotone_and_total(spark):
    """LTV curves are non-decreasing in age; the final cumulative revenue
    summed over cohorts equals total purchase revenue; cohort sizes
    partition the user base."""
    from wikipedia_org_xmldump_importer_spark.queries.timeseries import (
        events_cohort_ltv,
    )

    rows = events_cohort_ltv(spark, SF_SMOKE).collect()
    by_cohort: dict = {}
    for r in rows:
        by_cohort.setdefault(r.cohort_week, []).append(r)
    ev = load_table(spark, SF_SMOKE, "events").collect()
    total_cents = sum(
        round(r.value * 100) for r in ev if r.event_type == "purchase"
    )
    last_sum = 0.0
    seen_users = 0
    seen_cohorts = set()
    for wk, curve in by_cohort.items():
        curve.sort(key=lambda r: r.age_week)
        assert all(
            a.cum_revenue <= b.cum_revenue for a, b in zip(curve, curve[1:])
        )
        for r in curve:
            assert abs(r.ltv_per_user - round(r.cum_revenue / r.n_users, 6)) < 1e-6
        last_sum += curve[-1].cum_revenue
        if wk not in seen_cohorts:
            seen_cohorts.add(wk)
            seen_users += curve[0].n_users
    assert abs(last_sum - total_cents / 100.0) < 0.01 * len(by_cohort) + 1e-9
    assert seen_users == len({r.user_id for r in ev})


def test_zipf_slope_recompute(spark):
    """Slope/intercept recompute exactly from the pinned-log regression."""
    from collections import Counter

    from wikipedia_org_xmldump_importer_spark.queries.textops import (
        _ZIPF_TOP,
        text_zipf_slope,
    )

    docs = load_table(spark, SF_SMOKE, "documents").collect()
    tf: Counter = Counter()
    for r in docs:
        tf.update(r.text.split(" "))
    ranked = sorted(tf.items(), key=lambda kv: (-kv[1], kv[0]))[:_ZIPF_TOP]
    us = [
        (round(math.log2(i + 1) * 10000.0), round(math.log2(f) * 10000.0))
        for i, (_, f) in enumerate(ranked)
    ]
    n = len(us)
    sur = sum(a for a, _ in us)
    suf = sum(b for _, b in us)
    sur2 = sum(a * a for a, _ in us)
    suruf = sum(a * b for a, b in us)
    slope = (n * suruf - sur * suf) / (n * sur2 - sur * sur)
    row = text_zipf_slope(spark, SF_SMOKE).collect()[0]
    assert row.n_terms == n
    assert abs(row.zipf_slope - round(slope, 6)) < 1e-9
    assert abs(
        row.log2_intercept - round(((suf - (slope * sur)) / n) / 10000.0, 6)
    ) < 1e-6


def test_l_diversity_flags_and_partition(spark):
    """Every class's distinct-sensitive count is between 1 and group size;
    flags agree with l; classes partition the customer base."""
    from wikipedia_org_xmldump_importer_spark.queries.quality_ops import (
        _LDIV_L,
        privacy_l_diversity,
    )

    rows = privacy_l_diversity(spark, SF_SMOKE).collect()
    n_cust = load_table(spark, SF_SMOKE, "customer").count()
    assert sum(r.group_size for r in rows) == n_cust
    for r in rows:
        assert 1 <= r.n_sensitive <= min(r.group_size, 5)
        assert r.violates_l == (r.n_sensitive < _LDIV_L)


def test_rate_compare_recompute(spark):
    """Counts and the conditional binomial z recompute from Python."""
    from datetime import datetime

    from wikipedia_org_xmldump_importer_spark.queries.timeseries import (
        _RATE_SPLIT,
        events_rate_compare,
    )

    split = datetime.strptime(_RATE_SPLIT, "%Y-%m-%d")
    ev = load_table(spark, SF_SMOKE, "events").collect()
    counts: dict = {}
    for r in ev:
        n1, n2 = counts.get(r.event_type, (0, 0))
        if r.ts < split:
            n1 += 1
        else:
            n2 += 1
        counts[r.event_type] = (n1, n2)
    t1 = sum(a for a, _ in counts.values())
    t2 = sum(b for _, b in counts.values())
    p0 = t1 / (t1 + t2)
    got = {r.event_type: r for r in events_rate_compare(spark, SF_SMOKE).collect()}
    for et, (n1, n2) in counts.items():
        mean = (n1 + n2) * p0
        z = (n1 - mean) / math.sqrt(mean * (1.0 - p0))
        assert (got[et].n1, got[et].n2) == (n1, n2)
        assert abs(got[et].z_score - round(z, 6)) < 1e-6


def test_herfindahl_bounds_and_recompute(spark):
    """1/n ≤ HHI ≤ 1; exact recompute from integer cents."""
    from wikipedia_org_xmldump_importer_spark.queries.aggregates import agg_herfindahl

    li = load_table(spark, SF_SMOKE, "lineitem").collect()
    sup = {r.s_suppkey: r.s_nationkey for r in load_table(spark, SF_SMOKE, "supplier").collect()}
    rev: dict = {}
    for r in li:
        key = (sup[r.l_suppkey], r.l_suppkey)
        rev[key] = rev.get(key, 0) + round(r.l_extendedprice * 100)
    by_nation: dict = {}
    for (nk, _), cents in rev.items():
        by_nation.setdefault(nk, []).append(cents)
    got = {r.s_nationkey: r for r in agg_herfindahl(spark, SF_SMOKE).collect()}
    assert set(got) == set(by_nation)
    for nk, vals in by_nation.items():
        total = sum(vals)
        hhi = sum(v * v for v in vals) / (float(total) * float(total))
        r = got[nk]
        assert r.n_suppliers == len(vals)
        assert abs(r.hhi - round(hhi, 6)) < 1e-9
        assert 1.0 / len(vals) - 1e-9 <= r.hhi <= 1.0 + 1e-9
        assert abs(r.top_share - round(max(vals) / total, 6)) < 1e-9


def test_survival_hazard_recompute(spark):
    """At-risk counts, hazards, and the micro-unit log-survival recompute
    from a Python replay of last-seen days."""
    from wikipedia_org_xmldump_importer_spark.queries.timeseries import (
        events_survival_hazard,
    )

    ev = load_table(spark, SF_SMOKE, "events").collect()
    last: dict = {}
    for r in ev:
        day = r.ts.strftime("%Y-%m-%d")
        if r.user_id not in last or day > last[r.user_id]:
            last[r.user_id] = day
    from collections import Counter

    churn = Counter(last.values())
    days = sorted(churn)
    n_users = len(last)
    got = {r.day: r for r in events_survival_hazard(spark, SF_SMOKE).collect()}
    at_risk = n_users
    cum_u = 0
    for day in days:
        d = churn[day]
        if d < at_risk:
            cum_u += round(-math.log2(1.0 - (d / at_risk)) * 1_000_000.0)
            r = got[day]
            assert r.n_at_risk == at_risk and r.d_churn == d
            assert abs(r.hazard - round(d / at_risk, 6)) < 1e-9
            assert abs(r.cum_neglog2_surv - round(cum_u / 1_000_000.0, 6)) < 1e-9
        else:
            assert day not in got
        at_risk -= d
    assert at_risk == 0


def test_top_movers_recompute(spark):
    """Ranks and mover ordering recompute from a Python replay."""
    from datetime import datetime

    from wikipedia_org_xmldump_importer_spark.queries.timeseries import (
        _MOVERS_SPLIT,
        _MOVERS_TOPN,
        events_top_movers,
    )

    split = datetime.strptime(_MOVERS_SPLIT, "%Y-%m-%d")
    ev = load_table(spark, SF_SMOKE, "events").collect()
    c: dict = {}
    for r in ev:
        n1, n2 = c.get(r.user_id, (0, 0))
        if r.ts < split:
            n1 += 1
        else:
            n2 += 1
        c[r.user_id] = (n1, n2)
    users = sorted(c)
    r1 = {u: i + 1 for i, u in enumerate(sorted(users, key=lambda u: (-c[u][0], u)))}
    r2 = {u: i + 1 for i, u in enumerate(sorted(users, key=lambda u: (-c[u][1], u)))}
    movers = sorted(users, key=lambda u: (-abs(r1[u] - r2[u]), u))[:_MOVERS_TOPN]
    got = sorted(events_top_movers(spark, SF_SMOKE).collect(), key=lambda r: r.mover_rank)
    assert [r.user_id for r in got] == movers
    for r in got:
        assert (r.rank_before, r.rank_after) == (r1[r.user_id], r2[r.user_id])
        assert r.rank_gain == r1[r.user_id] - r2[r.user_id]


def test_weekday_index_mean_one_weighted(spark):
    """Day-weighted mean of the seasonal index is exactly 1; labels are
    the seven weekday abbreviations."""
    from wikipedia_org_xmldump_importer_spark.queries.timeseries import (
        ts_weekday_index,
    )

    rows = ts_weekday_index(spark, SF_SMOKE).collect()
    assert {r.weekday for r in rows} <= {
        "Mon", "Tue", "Wed", "Thu", "Fri", "Sat", "Sun",
    }
    total_days = sum(r.n_days for r in rows)
    overall = sum(r.avg_daily_revenue * r.n_days for r in rows) / total_days
    for r in rows:
        assert abs(r.seasonal_index - round(r.avg_daily_revenue / overall, 6)) < 2e-4


def test_kneser_ney_sums_to_one_per_context(spark):
    """Σ_w2 P_KN(w2|w1) = 1 exactly per context when computed over the
    UNFILTERED bigram set (checked in Python); the registered (filtered)
    rows match the same formula."""
    from collections import Counter, defaultdict

    from wikipedia_org_xmldump_importer_spark.queries.index_ops import (
        _KN_D,
        _KN_MIN_COUNT,
        ngram_lm_kneser_ney,
    )

    docs = load_table(spark, SF_SMOKE, "documents").collect()
    cnt: Counter = Counter()
    for r in docs:
        t = r.text.split(" ")
        for i in range(len(t) - 1):
            cnt[(t[i], t[i + 1])] += 1
    c_w1: Counter = Counter()
    n1p_fwd: Counter = Counter()
    n1p_bwd: Counter = Counter()
    for (w1, w2), c in cnt.items():
        c_w1[w1] += c
        n1p_fwd[w1] += 1
        n1p_bwd[w2] += 1
    n_pairs = len(cnt)

    def p_kn(w1, w2):
        c = cnt[(w1, w2)]
        return (max(c - _KN_D, 0.0) / c_w1[w1]) + (
            ((_KN_D * n1p_fwd[w1]) / c_w1[w1]) * (n1p_bwd[w2] / n_pairs)
        )

    # mass conservation per context over the full (unfiltered) table,
    # up to the global P_cont normalization (sums to Σ_w2 P_cont(w2) =
    # 1 only when every w2 is reachable; verify the algebraic identity):
    by_w1: defaultdict = defaultdict(list)
    for (w1, w2) in cnt:
        by_w1[w1].append(w2)
    total_pcont = sum(n1p_bwd[w2] for w2 in n1p_bwd) / n_pairs
    for w1 in list(by_w1)[:25]:
        mass = sum(p_kn(w1, w2) for w2 in by_w1[w1])
        lam = (_KN_D * n1p_fwd[w1]) / c_w1[w1]
        discounted = sum(max(cnt[(w1, w2)] - _KN_D, 0.0) for w2 in by_w1[w1]) / c_w1[w1]
        covered = sum(n1p_bwd[w2] for w2 in by_w1[w1]) / n_pairs
        assert abs(mass - (discounted + lam * covered)) < 1e-9
        assert discounted + lam * total_pcont <= 1.0 + 1e-9
    got = {(r.w1, r.w2): r.p_kn for r in ngram_lm_kneser_ney(spark, SF_SMOKE).collect()}
    for (w1, w2), p in got.items():
        assert cnt[(w1, w2)] >= _KN_MIN_COUNT
        assert abs(p - round(p_kn(w1, w2), 6)) < 1e-9


def test_pca_power_matches_numpy_replay(spark):
    """The declared semantics are FIVE power rounds: a numpy replay with
    identical pinning/rounding must reproduce the loadings, the result is
    unit-norm, and the final norm (the eigenvalue estimate) lies within
    the spectrum's top — λ_min(A) ≤ estimate ≤ λ_max(A)."""
    import numpy as np

    from wikipedia_org_xmldump_importer_spark.queries.llm import (
        _PCA_ITERS,
        vec_pca_power,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings").collect()
    X = np.array([r.embedding for r in emb], dtype="float64")
    # r11 integer fixed-point semantics: micro-int embeddings, exact
    # BIGINT moment matrix (1e-12 scale), per-round double-round rescale
    # to w_r = w*1e6, exact norm-square, micro-int unit vector.
    Xu = np.round(X * 1_000_000.0).astype("int64")
    A_u = (Xu.T.astype(object) @ Xu.astype(object))  # exact big-int
    d = A_u.shape[0]
    v_u = np.full(d, 125_000, dtype=object)
    nrm_r = None
    for _ in range(_PCA_ITERS):
        w_u = A_u @ v_u  # exact
        w_r = np.array([int(np.round(float(x) / 1e12)) for x in w_u], dtype=object)
        nrm_r = float(np.sqrt(float(sum(int(x) * int(x) for x in w_r))))
        v_u = np.array(
            [int(np.round(float(x) / nrm_r * 1_000_000.0)) for x in w_r],
            dtype=object,
        )
    v = np.array([float(x) for x in v_u]) / 1_000_000.0
    rows = sorted(vec_pca_power(spark, SF_SMOKE).collect(), key=lambda r: r.pos)
    got = np.array([r.loading for r in rows])
    assert np.allclose(got, np.round(v, 6), atol=2e-6)
    assert abs(np.linalg.norm(got) - 1.0) < 1e-3
    A = np.array([[float(x) for x in row] for row in A_u]) / 1e12
    evals = np.linalg.eigvalsh(A)
    assert evals[0] - 1e-6 <= rows[0].eigenvalue <= evals[-1] + 1e-6
    assert abs(rows[0].eigenvalue - round(nrm_r / 1e6, 6)) < 1e-3


def test_boolean_family_recompute(spark):
    """bool_and / bool_or / count_if recompute per segment."""
    from wikipedia_org_xmldump_importer_spark.queries.aggregates import (
        agg_boolean_family,
    )

    cust = load_table(spark, SF_SMOKE, "customer").collect()
    by_seg: dict = {}
    for r in cust:
        by_seg.setdefault(r.c_mktsegment, []).append(r.c_acctbal)
    got = {r.c_mktsegment: r for r in agg_boolean_family(spark, SF_SMOKE).collect()}
    for seg, vals in by_seg.items():
        assert got[seg].none_at_floor == all(v > -999.0 for v in vals)
        assert got[seg].any_negative == any(v < 0.0 for v in vals)
        assert got[seg].n_high_balance == sum(1 for v in vals if v > 5000.0)


def test_not_in_null_semantics(spark):
    """The NULL-poisoned variant returns zero rows; the filtered variant
    equals the Python anti-join."""
    from wikipedia_org_xmldump_importer_spark.queries.subqueries import (
        sub_not_in_nulls,
    )

    got = {r.variant: r.n_rows for r in sub_not_in_nulls(spark, SF_SMOKE).collect()}
    assert got["not_in_with_null"] == 0
    cust = load_table(spark, SF_SMOKE, "customer").collect()
    keep = {r.c_custkey for r in cust if r.c_acctbal >= 0}
    orders = load_table(spark, SF_SMOKE, "orders").collect()
    assert got["not_in_null_filtered"] == sum(
        1 for r in orders if r.o_custkey not in keep
    )


def test_confusion_matrix_consistency_with_langid(spark):
    """Matrix cells equal a groupBy over x8's own output; row fractions
    sum to 1 per declared language."""
    from wikipedia_org_xmldump_importer_spark.queries.textops import (
        lang_confusion_matrix,
        text_langid,
    )

    from collections import Counter

    base = Counter(
        (r.actual_lang, r.pred_lang)
        for r in text_langid(spark, SF_SMOKE).collect()
    )
    rows = lang_confusion_matrix(spark, SF_SMOKE).collect()
    assert {(r.actual_lang, r.pred_lang): r.n_docs for r in rows} == dict(base)
    by_actual: dict = {}
    for r in rows:
        by_actual.setdefault(r.actual_lang, []).append(r.row_frac)
    for fracs in by_actual.values():
        assert abs(sum(fracs) - 1.0) < 1e-4


def test_hapax_rate_recompute(spark):
    """Counts and ratios recompute from Python token counts per source."""
    from collections import Counter

    from wikipedia_org_xmldump_importer_spark.queries.textops import text_hapax_rate

    docs = load_table(spark, SF_SMOKE, "documents").collect()
    by_src: dict = {}
    for r in docs:
        by_src.setdefault(r.source, Counter()).update(r.text.split(" "))
    got = {r.source: r for r in text_hapax_rate(spark, SF_SMOKE).collect()}
    assert set(got) == set(by_src)
    for src, cnt in by_src.items():
        r = got[src]
        n_tok = sum(cnt.values())
        hapax = sum(1 for c in cnt.values() if c == 1)
        assert (r.n_tokens, r.vocab_size, r.n_hapax) == (n_tok, len(cnt), hapax)
        assert abs(r.type_token_ratio - round(len(cnt) / n_tok, 6)) < 1e-9
        assert abs(r.hapax_rate - round(hapax / len(cnt), 6)) < 1e-9


def test_new_vs_returning_conservation(spark):
    """Per day: new + returning events = all events; Σ new users = total
    users; day-1 has zero returning events."""
    from wikipedia_org_xmldump_importer_spark.queries.timeseries import (
        events_new_vs_returning,
    )

    rows = sorted(events_new_vs_returning(spark, SF_SMOKE).collect(), key=lambda r: r.day)
    ev = load_table(spark, SF_SMOKE, "events").collect()
    from collections import Counter

    per_day = Counter(r.ts.strftime("%Y-%m-%d") for r in ev)
    assert {r.day: r.n_events_new + r.n_events_returning for r in rows} == dict(per_day)
    assert sum(r.n_new_users for r in rows) == len({r.user_id for r in ev})
    assert rows[0].n_events_returning == 0
