"""Interleaved same-session A/B harness (r15; the /tmp/ab14.py methodology,
committed this time).

Loads two DataFrame builders from a python file passed as --variants (must
define ``variant_a(spark, sf_dir)`` and ``variant_b(spark, sf_dir)``), or
A/B's two registered queries by name. Runs them ALTERNATELY in one session
(a, b, a, b, ...) for --shots rounds, timing build+noop-materialize (the
bench's exact timed region), and prints per-variant medians.

Interleaving is the r14 drift lesson: this sandbox shows bursty external
interference, so cross-time comparisons lie; alternating shots in one
window subject both variants to the same noise.

Usage:
    python tools/ab_inline.py --variants /tmp/exp.py [--shots 5]
    python tools/ab_inline.py --names flagship_star_revenue,other [--shots 5]
    # optional row-identity check first (collect+sort both, compare):
    python tools/ab_inline.py --variants /tmp/exp.py --check-identity
"""

from __future__ import annotations

import argparse
import importlib.util
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wikipedia_org_xmldump_importer_spark.cbo import (  # noqa: E402
    register_tables_with_stats,
)
from wikipedia_org_xmldump_importer_spark.registry import (  # noqa: E402
    REGISTRY,
    _ensure_loaded,
)
from wikipedia_org_xmldump_importer_spark.session import build_session  # noqa: E402


def _materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default=None, help="py file with variant_a/variant_b")
    ap.add_argument("--names", default=None, help="two registered query names, comma-sep")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--shots", type=int, default=5)
    ap.add_argument("--check-identity", action="store_true")
    args = ap.parse_args()

    _ensure_loaded()
    if args.variants:
        spec = importlib.util.spec_from_file_location("abexp", args.variants)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        builders = {"a": mod.variant_a, "b": mod.variant_b}
    else:
        na, nb = args.names.split(",")
        builders = {"a": REGISTRY[na].fn, "b": REGISTRY[nb].fn}

    spark = build_session(app_name="ab_inline")
    for warm_q in ("scan_parquet", "flagship_star_revenue", "udf_scalar_arrow"):
        try:
            _materialize(REGISTRY[warm_q].fn(spark, "/root/testdata/sf0.001"))
        except Exception:
            pass
    register_tables_with_stats(spark, args.sf)

    if args.check_identity:
        rows_a = sorted(map(str, builders["a"](spark, args.sf).collect()))
        rows_b = sorted(map(str, builders["b"](spark, args.sf).collect()))
        ident = rows_a == rows_b
        print(f"IDENTITY: {'MATCH' if ident else 'MISMATCH'} "
              f"({len(rows_a)} vs {len(rows_b)} rows)")
        if not ident:
            for x in list(set(rows_a) ^ set(rows_b))[:6]:
                print("  diff:", x[:200])
            sys.exit(1)

    # one untimed warm shot each
    for key in ("a", "b"):
        _materialize(builders[key](spark, args.sf))

    samples: dict[str, list[float]] = {"a": [], "b": []}
    for _ in range(args.shots):
        for key in ("a", "b"):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            _materialize(builders[key](spark, args.sf))
            samples[key].append(time.perf_counter() - t0)
    for key in ("a", "b"):
        med = statistics.median(samples[key])
        print(f"{key}: median {med:.3f}s  shots "
              + " ".join(f"{s:.3f}" for s in samples[key]))


if __name__ == "__main__":
    main()
