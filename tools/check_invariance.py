"""Parallelism-invariance audit (round 9): every query's RESULT must be
independent of the shuffle layout.

A distributed engine that is only correct at one partition count is not
correct: float summation order, collect_list element order, unstable
tie-breaks and per-partition RNG all shift when the shuffle topology
changes, and the house rules (round-pinning, array_sort, total-order
tie-breaks) exist precisely to make results layout-independent. This tool
PROVES that fleet-wide: each registered SQL-oracle query runs twice in one
session —

  conf A: the standard shape (AQE on, spark.sql.shuffle.partitions=32), and
  conf B: an adversarial shape (AQE OFF — no runtime coalescing to hide
          behind — with a deliberately awkward prime partition count 7),

and the two results are compared exactly (same normalization as
tools/check_oracle.py: columns sorted, rows sorted, cells normalized).

Queries registered WITHOUT an oracle are skipped: the rows-only set is
declared engine/layout-specific (per-partition RNG in sample_frac, sketch
internals, banding order) and is covered by property tests instead.

Usage::

    python tools/check_invariance.py [--sf /root/testdata/sf0.001] [name ...]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

from check_oracle import to_rows  # noqa: E402  (same dir)

from wikipedia_org_xmldump_importer_spark.registry import (  # noqa: E402
    REGISTRY,
    _ensure_loaded,
)
from wikipedia_org_xmldump_importer_spark.session import build_session  # noqa: E402

CONF_A = {"spark.sql.adaptive.enabled": "true", "spark.sql.shuffle.partitions": "32"}
CONF_B = {"spark.sql.adaptive.enabled": "false", "spark.sql.shuffle.partitions": "7"}


def run_once(spark, name: str, sf_dir: str):
    pdf = REGISTRY[name].fn(spark, sf_dir).toPandas()
    return to_rows(pdf)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    _ensure_loaded()
    names = args.names or [n for n in REGISTRY if REGISTRY[n].oracle is not None]
    spark = build_session(app_name="invariance")

    n_ok = n_fail = n_skip = 0
    for name in names:
        if REGISTRY[name].oracle is None:
            print(f"skip  {name}: rows-only (declared layout-specific)")
            n_skip += 1
            continue
        t0 = time.time()
        try:
            for k, v in CONF_A.items():
                spark.conf.set(k, v)
            cols_a, rows_a = run_once(spark, name, args.sf)
            for k, v in CONF_B.items():
                spark.conf.set(k, v)
            cols_b, rows_b = run_once(spark, name, args.sf)
        except Exception as e:  # noqa: BLE001
            print(f"ERR   {name}: {str(e).splitlines()[0][:160]}")
            n_fail += 1
            continue
        finally:
            for k, v in CONF_A.items():
                spark.conf.set(k, v)
        if cols_a != cols_b:
            print(f"FAIL  {name}: columns differ across layouts")
            n_fail += 1
        elif rows_a != rows_b:
            diff_i = next(
                (i for i, (x, y) in enumerate(zip(rows_a, rows_b)) if x != y),
                min(len(rows_a), len(rows_b)),
            )
            print(
                f"FAIL  {name}: {len(rows_a)} vs {len(rows_b)} rows; first "
                f"diff at sorted-row {diff_i}"
            )
            n_fail += 1
        else:
            print(f"OK    {name}: {len(rows_a)} rows [{time.time() - t0:.1f}s]")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_fail} fail, {n_skip} skipped")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
