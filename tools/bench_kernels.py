"""Price the §2.18 scale-path kernels directly (r9 verdict task 6).

k1–k4 are component rows (``oracle: n/a``) priced only through their host
queries in the registry sweeps; this tool times the KERNELS themselves at
an arbitrary SF dir and (with ``--merge``) folds the rows into
BENCH_SF1.json under ``kernel:``-prefixed keys so the sf1 artifact carries
them explicitly:

  * ``kernel:bloom_bitmap``  — build_bitmap over the eval grams + full
    train-gram screen (functions/bloom.py), the production form of x317.
  * ``kernel:ewvol_linear``  — one-pass EWMA variance trajectories
    (operators/ewma.py), the linear swap for x302.
  * ``kernel:matrix_profile_linear`` — diagonal-recurrence matrix profile
    (operators/matrix_profile.py), the O(m) memory swap for x315.
  * ``kernel:sim_topk_chunked_10x`` — chunked-probe exact top-k
    (operators/ann_chunked.py) at a 10x probe set (200 probes vs the
    registered kernel's 20), chunk_size=50 so the run exercises 4 real
    chunk rounds, not one degenerate chunk.
  * ``kernel:bfs_local_closeness`` — the k5 single-task BFS run through
    x313's closeness epilogue; its sf1 row deliberately measures the
    small-graph regime's UPPER boundary (see BENCH_SF1.json note).

Timing protocol matches bench.py: per-kernel median of ``--repeats``
measured executions (count() to materialize), after one untimed warm-up
of the first kernel to absorb JVM/codegen start-up.

Usage::

    python tools/bench_kernels.py                      # sf1, print only
    python tools/bench_kernels.py --sf /root/testdata/sf0.1
    python tools/bench_kernels.py --merge              # + update BENCH_SF1.json
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_SF1 = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "benchdata", "sf1",
)


def _grams(spark, sf_dir):
    from pyspark.sql import functions as F

    from wikipedia_org_xmldump_importer_spark.io import load_table

    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    grams = docs.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.greatest(F.size(toks) - 2, F.lit(0))),
                lambda i: F.array_join(F.slice(toks, i, 3), " "),
            )
        ).alias("gram"),
    )
    return grams.select(
        "doc_id",
        F.conv(F.substring(F.md5("gram"), 1, 12), 16, 10)
        .cast("long")
        .alias("h"),
    )


def bench_bloom(spark, sf_dir) -> int:
    """x317's production shape: bitmap build (eval side) + map-local screen
    (train side). Returns screened-row count so the work can't be elided."""
    from pyspark.sql import functions as F

    from wikipedia_org_xmldump_importer_spark.functions.bloom import (
        build_bitmap,
        screen_with_bitmap,
    )

    gh = _grams(spark, sf_dir)
    is_ev = F.col("doc_id") % 97 == 0
    bitmap = build_bitmap(gh.filter(is_ev).select("h").distinct(), 262144)
    screened = screen_with_bitmap(
        gh.filter(~is_ev).select("h"), bitmap, 262144
    )
    return screened.filter(F.col("bloom_hit") == 1).count()


def bench_ewvol(spark, sf_dir) -> int:
    from wikipedia_org_xmldump_importer_spark.operators.ewma import (
        ewvol_linear,
    )

    return ewvol_linear(spark, sf_dir).count()


def bench_matrix_profile(spark, sf_dir) -> int:
    from wikipedia_org_xmldump_importer_spark.operators.matrix_profile import (
        matrix_profile_linear_memory,
    )

    return matrix_profile_linear_memory(spark, sf_dir).count()


def bench_chunked_topk(spark, sf_dir) -> int:
    from pyspark.sql import functions as F

    from wikipedia_org_xmldump_importer_spark.io import load_table
    from wikipedia_org_xmldump_importer_spark.operators.ann_chunked import (
        sim_topk_chunked,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    out = sim_topk_chunked(
        spark, emb, F.col("vec_id") < 200, k=5, chunk_size=50
    )
    return out.count()


def bench_bfs_local(spark, sf_dir) -> int:
    from wikipedia_org_xmldump_importer_spark.operators.bfs_local import (
        closeness_hubs_local,
    )

    return closeness_hubs_local(spark, sf_dir).count()


KERNELS = {
    "kernel:bloom_bitmap": bench_bloom,
    "kernel:ewvol_linear": bench_ewvol,
    "kernel:matrix_profile_linear": bench_matrix_profile,
    "kernel:sim_topk_chunked_10x": bench_chunked_topk,
    "kernel:bfs_local_closeness": bench_bfs_local,
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=_SF1)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--merge", action="store_true",
                    help="fold rows into BENCH_SF1.json (sf1 runs only)")
    args = ap.parse_args()

    from wikipedia_org_xmldump_importer_spark.session import build_session

    spark = build_session("bench-kernels")
    next(iter(KERNELS.values()))(spark, args.sf)  # untimed warm-up

    rows: dict[str, dict] = {}
    for name, fn in KERNELS.items():
        times, n = [], 0
        for _ in range(args.repeats):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            n = fn(spark, args.sf)
            times.append(time.perf_counter() - t0)
        rows[name] = {"sec": round(statistics.median(times), 3), "rows": n}
        print(f"{name}: {rows[name]['sec']}s ({n} rows)", file=sys.stderr)

    print(json.dumps({"sf_dir": args.sf, "kernels": rows}))

    if args.merge:
        if os.path.abspath(args.sf) != _SF1:
            print("--merge only applies to sf1 runs", file=sys.stderr)
            return 2
        path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "BENCH_SF1.json")
        doc = json.load(open(path))
        # separate top-level key: "queries" is test-enforced to mirror the
        # registry exactly (test_bench_sf1_rows_in_lockstep), and kernels
        # are component rows, not registered queries
        doc["kernels"] = {name: row["sec"] for name, row in rows.items()}
        doc["note"] += (
            " r10: the §2.18 kernels priced directly at sf1 via "
            "tools/bench_kernels.py (kernel:-prefixed rows; "
            "sim_topk_chunked at a 10x probe set, 200 probes / 4 chunks)."
        )
        with open(path, "w") as f:
            json.dump(doc, f)
        print(f"merged {len(rows)} kernel rows into BENCH_SF1.json",
              file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
