"""Build-time sweep (r15, guide §1): time ONLY ``fn(spark, sf_dir)`` for
every registered query — the Python/py4j DataFrame-construction half of the
bench's timed region (plus any eager localCheckpoint jobs a query runs at
build time). Ranks queries by construction cost so driver-side overhead
(which the 8-core-vs-32-core bench identity proved dominates at sf0.1) can
be attacked where it pays.

Usage: python tools/build_sweep.py [--sf DIR] [--out FILE]
"""

from __future__ import annotations

import argparse
import json
import os
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--out", default="/tmp/build_sweep.json")
    ap.add_argument("--repeats", type=int, default=2)
    args = ap.parse_args()

    _ensure_loaded()
    spark = build_session(app_name="build_sweep")
    for warm_q in ("scan_parquet", "flagship_star_revenue", "udf_scalar_arrow"):
        try:
            REGISTRY[warm_q].fn(spark, "/root/testdata/sf0.001").write.format(
                "noop"
            ).mode("overwrite").save()
        except Exception:
            pass
    register_tables_with_stats(spark, args.sf)

    out: dict[str, float] = {}
    for name, qd in REGISTRY.items():
        best = None
        try:
            for _ in range(args.repeats):
                t0 = time.perf_counter()
                qd.fn(spark, args.sf)
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
        except Exception as e:
            print(f"BUILD FAIL {name}: {e}", file=sys.stderr)
            best = -1.0
        out[name] = round(best, 4)
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    total = sum(v for v in out.values() if v > 0)
    top = sorted(out.items(), key=lambda kv: -kv[1])[:25]
    print(f"build total {total:.1f}s across {len(out)} queries -> {args.out}")
    for n, v in top:
        print(f"{v:7.3f}  {n}")


if __name__ == "__main__":
    main()
