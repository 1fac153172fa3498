"""Registry-wide output contracts (SURVEY §5.1).

The verification harness canonicalizes every query result with pandas
``sort_values`` before hashing. List-like cells (array/map/struct columns)
are unhashable there — ONE such column crashed the round-1 sweep at query 50
of 91 and voided 41 correctness rows. These tests make the contract
structural: no registered query may emit a non-atomic column, with or
without an oracle (even rows-only results flow through the harness).
"""

from __future__ import annotations

import json
import os

from conftest import SF_SMOKE
from pyspark.sql import types as T

from wikipedia_org_xmldump_importer_spark.registry import REGISTRY, _ensure_loaded

_ensure_loaded()

_NON_ATOMIC = (T.ArrayType, T.MapType, T.StructType)


def test_every_query_output_is_atomic(spark):
    """Schema-only check: builds each plan (no execution) and rejects any
    array/map/struct output column anywhere in the registry."""
    offenders = []
    for name, qd in REGISTRY.items():
        df = qd.fn(spark, SF_SMOKE)
        for f in df.schema.fields:
            if isinstance(f.dataType, _NON_ATOMIC):
                offenders.append(f"{name}.{f.name}: {f.dataType.simpleString()}")
    assert not offenders, (
        "non-atomic output columns would crash the harness canonicalizer: "
        + "; ".join(offenders)
    )


def test_driver_window_is_priority_ordered():
    """The driver's correctness sweep checks only the first 50 registry
    entries (rounds 1-2 empirics). The first 50 must be exactly
    DRIVER_PRIORITY, and all 50 must carry full SQL oracles so no
    hash-check slot is spent on a rows-only entry."""
    from wikipedia_org_xmldump_importer_spark.queries import DRIVER_PRIORITY

    names = list(REGISTRY)
    assert len(DRIVER_PRIORITY) == 50
    assert len(set(DRIVER_PRIORITY)) == 50
    assert tuple(names[:50]) == DRIVER_PRIORITY
    assert all(REGISTRY[n].oracle is not None for n in names[:50])


def test_driver_window_covers_oldest_never_attested():
    """STANDING ROTATION POLICY, machine-derived (r6 verdict task 2): the
    window must be exactly the 50 oldest (registration-order) SQL-oracle
    queries with no green driver row in any committed CORRECTNESS_r*.json.
    Attestation claims live in the artifacts, never in comments — this test
    recomputes the never-attested set each run, so the window comment in
    queries/__init__.py cannot silently drift the way the r6 one did.

    Queue age is REGISTRATION_LEDGER order (append-only; module order is
    not stable against a query added to an early module), so the derivation
    is stable across rotations and registrations.
    """
    import json
    from pathlib import Path

    from wikipedia_org_xmldump_importer_spark.queries import (
        DRIVER_PRIORITY,
        REGISTRATION_LEDGER,
    )

    assert len(REGISTRATION_LEDGER) == len(set(REGISTRATION_LEDGER))
    assert set(REGISTRATION_LEDGER) == set(REGISTRY), (
        "ledger/registry drift — append new query names to "
        "REGISTRATION_LEDGER at registration time: "
        f"ledger-only={set(REGISTRATION_LEDGER) - set(REGISTRY)}, "
        f"registry-only={set(REGISTRY) - set(REGISTRATION_LEDGER)}"
    )

    root = Path(__file__).resolve().parent.parent
    attested = set()
    # r10 regression: the old CORRECTNESS_r0*.json glob silently dropped
    # round-10+ artifacts, re-proposing already-attested queries. r12
    # regression: the driver drops CORRECTNESS_r{N}.json UNTRACKED after the
    # round-final commit, so a worktree glob ages the derivation by one round
    # at judge time. Use the tool's own artifact discovery (git ls-files with
    # a glob fallback for non-git checkouts — r13 review: an inline check=True
    # subprocess here would ERROR on tarball exports and could silently drift
    # from the production derivation; see test_correctness_glob_sees_two_
    # digit_rounds and test_untracked_correctness_decoy_ignored for the
    # fixture-based regression tests).
    import sys as _sys

    _tools = str(root / "tools")
    if _tools not in _sys.path:
        _sys.path.insert(0, _tools)
    import next_window as _nw

    arts = _nw.correctness_artifacts(root)
    for art in sorted(arts):
        for name, row in json.loads(art.read_text()).items():
            if (
                isinstance(row, dict)
                and row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
            ):
                attested.add(name)
    assert attested, "no committed CORRECTNESS artifacts found"

    never = [
        n
        for n in REGISTRATION_LEDGER
        if REGISTRY[n].oracle is not None and n not in attested
    ]
    if len(never) >= 50:
        expected = tuple(never[:50])
    else:
        # Fewer than 50 never-attested: fill tail slots by re-confirming the
        # oldest previously-attested SQL-oracle rows.
        refill = [
            n
            for n in REGISTRATION_LEDGER
            if REGISTRY[n].oracle is not None and n in attested
        ]
        expected = tuple(never + refill[: 50 - len(never)])
    assert DRIVER_PRIORITY == expected, (
        "DRIVER_PRIORITY must be the 50 oldest never-attested SQL-oracle "
        f"queries; expected head: {expected[:5]} ..., "
        f"got head: {DRIVER_PRIORITY[:5]} ..."
    )


def test_next_window_tool_matches_policy():
    """r7 verdict task 6: the rotation pre-flight tool must derive exactly
    the window the policy test above enforces, so running it before a
    round-final commit is sufficient to prevent a stale tuple."""
    import sys
    from pathlib import Path

    tools = str(Path(__file__).resolve().parent.parent / "tools")
    if tools not in sys.path:
        sys.path.insert(0, tools)
    import next_window

    from wikipedia_org_xmldump_importer_spark.queries import DRIVER_PRIORITY

    exp = next_window.expected_window()
    assert len(exp) == 50
    assert exp == DRIVER_PRIORITY, "tool derivation drifted from committed window"
    assert next_window.main(["--check"]) == 0


def test_correctness_glob_sees_two_digit_rounds(tmp_path):
    """r10 judge + advisor regression: the rotation derivation globbed
    ``CORRECTNESS_r0*.json``, which matches rounds 01-09 but NOT r10+, so
    round-10 attestations were invisible and the next window re-proposed
    already-green queries. Fixture proof with a two-digit round artifact,
    plus a decoy name the validator must skip."""
    import sys
    from pathlib import Path

    tools = str(Path(__file__).resolve().parent.parent / "tools")
    if tools not in sys.path:
        sys.path.insert(0, tools)
    import next_window

    green = {"rows_match": True, "schema_match": True, "hash_match": True}
    red = {"rows_match": True, "schema_match": True, "hash_match": False}
    (tmp_path / "CORRECTNESS_r02.json").write_text(
        json.dumps({"q_old": green, "q_red_then_green": red})
    )
    (tmp_path / "CORRECTNESS_r10.json").write_text(
        json.dumps({"q_two_digit": green, "q_red_then_green": green})
    )
    # Decoy: right prefix, wrong shape — the name validator must skip it.
    (tmp_path / "CORRECTNESS_r10_sf01.json").write_text(json.dumps({"q_decoy": green}))

    attested = next_window.attested_names(tmp_path)
    assert attested == {"q_old", "q_two_digit", "q_red_then_green"}

    arts = next_window.correctness_artifacts(tmp_path)
    assert [p.name for p in arts] == [
        "CORRECTNESS_r02.json",
        "CORRECTNESS_r10.json",
    ]


def test_untracked_correctness_decoy_ignored(tmp_path):
    """r12 judge regression: the driver writes CORRECTNESS_r{N}.json to the
    worktree UNTRACKED after the round-final commit. The window derivation
    must not see it — otherwise the committed DRIVER_PRIORITY tuple (correct
    at commit time) reads as stale one artifact-drop later.

    r13 advisor: drive the scenario through a throwaway git-init fixture
    instead of mutating the live checkout (the old in-repo decoy leaked on a
    hard kill and could race parallel window-deriving tests). Also pins the
    r13-advisor pathspec fix: a decoy NESTED under a tracked subdirectory
    must not join the ledger either (git globs cross '/' by default)."""
    import subprocess
    import sys
    from pathlib import Path

    tools = str(Path(__file__).resolve().parent.parent / "tools")
    if tools not in sys.path:
        sys.path.insert(0, tools)
    import next_window

    def git(*args):
        subprocess.run(
            ["git", "-C", str(tmp_path), *args],
            check=True,
            capture_output=True,
            env={
                "PATH": os.environ.get("PATH", ""),
                "GIT_AUTHOR_NAME": "t",
                "GIT_AUTHOR_EMAIL": "t@t",
                "GIT_COMMITTER_NAME": "t",
                "GIT_COMMITTER_EMAIL": "t@t",
                "HOME": str(tmp_path),
            },
        )

    green = {"rows_match": True, "schema_match": True, "hash_match": True}
    git("init", "-q")
    (tmp_path / "CORRECTNESS_r01.json").write_text(
        json.dumps({"q_committed": green})
    )
    git("add", "CORRECTNESS_r01.json")
    git("commit", "-qm", "r01 artifact")

    # Untracked root-level decoy — the driver's post-commit drop shape.
    (tmp_path / "CORRECTNESS_r98.json").write_text(
        json.dumps({"q_untracked": green})
    )
    # TRACKED decoy nested under a subdirectory — the r13-advisor latent
    # hole: an unanchored 'CORRECTNESS_r*.json' pathspec matches it.
    nested = tmp_path / "fixtures"
    nested.mkdir()
    (nested / "CORRECTNESS_r97.json").write_text(json.dumps({"q_nested": green}))
    git("add", "fixtures/CORRECTNESS_r97.json")
    git("commit", "-qm", "nested decoy")

    arts = [p.name for p in next_window.correctness_artifacts(tmp_path)]
    assert arts == ["CORRECTNESS_r01.json"]
    assert next_window.attested_names(tmp_path) == {"q_committed"}


def test_survey_registry_sync():
    """SURVEY.md §2 is the declared contract; REGISTRY is the machine-checked
    mirror. Parse the §2 tables and fail on drift in either direction
    (r3/r4 verdicts both caught the registry running ahead of the doc)."""
    import re
    from pathlib import Path

    text = Path(__file__).resolve().parent.parent.joinpath("SURVEY.md").read_text()
    start = text.index("## §2")
    end = text.index("## §3")
    names: set[str] = set()
    for line in text[start:end].splitlines():
        if not line.startswith("|"):
            continue
        cells = line.split("|")
        if len(cells) < 3:
            continue
        names.update(re.findall(r"`([a-z][a-z0-9_]*)`", cells[2]))
    # §2 rows exercised only via entry()/tests (oracle column `n/a`), never
    # registered in queries(): sources/sinks without oracle views and the
    # live-streaming halves whose batch twins carry the registry entry.
    test_only = {
        "import_dump_full",
        "stream_import_dump",
        "shard_dump",
        "scan_jdbc",
        "scan_multistream",
        "scan_multistream_siteinfo",
        "read_multistream_index",
        "write_multistream",
        "sink_orc",
        "scan_orc",
        "compact_parquet",
        "compact_parquet_partitioned",
        "scan_parquet_evolving",
        "union_vintages",
        "sink_zordered",
        "scan_csv_quarantine",
        "scan_csv_dropmalformed",
        "scan_csv_failfast",
        "bloom_bitmap_kernel",
        "ewvol_linear",
        "matrix_profile_linear_memory",
        "sim_topk_chunked",
        "multi_source_bfs_local",
        "scan_xml_pages",
        "scan_csv_json",
        "sink_parquet",
        "sink_jdbc",
        "source_stream_events",
        "sink_bucketed",
        "scan_xml_siteinfo",
        "extract_wikilinks",
        "resolve_redirect_chains",
        "revision_deltas",
        "namespaces_dim",
        "resolve_namespaces",
        "filter_namespace",
        "stream_watermark_late",
        "stream_stateful_custom",
        "stream_upsert_sink",
        "stream_ohlc_bars",
        "content_dedup",
        "match_steps_stream",
        "inter_arrival_gaps",
        "alert_hysteresis_stream",
        "near_dedup_stream",
        "stream_cms_cells",
        "ewvol_stream",
    }
    declared = names - test_only
    registered = set(REGISTRY)
    assert declared == registered, (
        f"SURVEY §2 vs registry drift: survey-only={sorted(declared - registered)}, "
        f"registry-only={sorted(registered - declared)}"
    )
    assert test_only <= names, f"stale test_only allowlist: {sorted(test_only - names)}"


def test_survey_oracle_mode_sync():
    """r5 verdict task 5: §2's per-row `oracle` cell must agree with the
    registry's oracle MODE, not just the row's existence — a row declared
    `SQL` must be registered with an oracle, one declared `rows` must be
    registered without, and an `n/a` row must not be registered at all
    (it lives in tests). Every §2 table carries the oracle column (the
    §2.9 streaming table gained per-row modes in round 6 after its blanket
    n/a header drifted below what the batch twins actually provide)."""
    import re
    from pathlib import Path

    text = Path(__file__).resolve().parent.parent.joinpath("SURVEY.md").read_text()
    start = text.index("## §2")
    end = text.index("## §3")
    modes: dict[str, str] = {}
    for line in text[start:end].splitlines():
        if not line.startswith("|"):
            continue
        cells = [c.strip() for c in line.split("|")]
        if len(cells) < 7:
            continue
        name_cell, oracle_cell = cells[2], cells[-2]
        if oracle_cell in ("oracle", "") or set(oracle_cell) == {"-"}:
            continue
        if oracle_cell.startswith("SQL"):
            mode = "sql"
        elif oracle_cell.startswith("rows"):
            mode = "rows"
        else:
            mode = "na"
        for n in re.findall(r"`([a-z][a-z0-9_]*)`", name_cell):
            modes[n] = mode
    assert len(modes) > 100, "oracle-mode parse collapsed — check §2 table shape"
    for name, qd in REGISTRY.items():
        assert name in modes, f"{name} registered but no §2 row has an oracle cell for it"
        actual = "sql" if qd.oracle is not None else "rows"
        assert modes[name] == actual, (
            f"{name}: SURVEY declares oracle mode '{modes[name]}', registry has '{actual}'"
        )
    unregistered_claiming_checks = [
        n for n, m in modes.items() if n not in REGISTRY and m != "na"
    ]
    assert not unregistered_claiming_checks, (
        f"§2 rows declare SQL/rows oracles but are not registered: "
        f"{sorted(unregistered_claiming_checks)}"
    )


def test_oracle_coverage_accounted():
    """Every rows-only query (oracle=None) must be an op SURVEY §2 marks as
    not-SQL-expressible; catches accidentally-dropped oracles."""
    rows_only = sorted(name for name, qd in REGISTRY.items() if qd.oracle is None)
    expected = sorted(
        [
            "agg_approx_distinct",  # a4: estimator internals engine-specific
            "agg_hll_mergeable",  # x21: sketch bytes engine-specific
            "sample_frac",  # o3: RNG engine-specific
            "dedup_near_minhash",  # l2: banding prune not SQL-expressible
            "sim_ann_lsh",  # x16: bucketing engine-specific
            "sim_ann_ivf",  # x19: cell assignment engine-specific
            "sim_ann_pq",  # x132: codebooks engine-specific; recall-tested
            "fn_hash_noncrypto",  # x15: sha1/xxhash64/crc32 absent in DuckDB 1.0
            "mm_decode_stub",  # x13: stub decode output is declared fake
            "agg_percentile_sketch",  # x184: GK sketch engine-specific
            "tokenizer_bpe_train",  # x192: iterative re-tokenization
            "text_zlib_ratio",  # x270: DEFLATE byte count is library-internal
        ]
    )
    assert rows_only == expected, (
        f"rows-only set drifted: unexpected={set(rows_only) - set(expected)}, "
        f"missing={set(expected) - set(rows_only)}"
    )


def test_bench_budget_rows_in_lockstep():
    """Every registered query must have a per-query budget row in the
    committed BENCH.json (r6 verdict task 7): the 2x-regression budget is
    only enforceable if registration and benching move together. New
    operators must land with a same-session isolated-median row merged into
    BENCH.json (BASELINE.md re-record policy)."""
    import json
    from pathlib import Path

    bench = json.loads(
        Path(__file__).resolve().parent.parent.joinpath("BENCH.json").read_text()
    )
    budgeted = set(bench["queries"])
    registered = set(REGISTRY)
    missing = sorted(registered - budgeted)
    stale = sorted(budgeted - registered)
    assert not missing, f"registered queries with no BENCH.json budget row: {missing}"
    assert not stale, f"BENCH.json rows for unregistered queries: {stale}"


def test_bench_sf1_rows_in_lockstep():
    """r7 verdict task 5: the sf1 (10x replica) scaling sweep is the scale
    evidence for every operator, so BENCH_SF1.json must track registration
    the same way BENCH.json does — a new operator lands with an sf1 row
    from tools/make_scale_data.py data, or the 100x-survival claim has a
    hole exactly where the newest (least battle-tested) code is."""
    import json
    from pathlib import Path

    sf1 = json.loads(
        Path(__file__).resolve().parent.parent.joinpath("BENCH_SF1.json").read_text()
    )
    swept = set(sf1["queries"])
    registered = set(REGISTRY)
    missing = sorted(registered - swept)
    stale = sorted(swept - registered)
    assert not missing, f"registered queries with no BENCH_SF1.json row: {missing}"
    assert not stale, f"BENCH_SF1.json rows for unregistered queries: {stale}"
