"""CLI for the import pipeline — the reference's invocation surface
(`importer <dump> <dsn>`, SURVEY.md §3.1) re-expressed:

    python -m wikipedia_org_xmldump_importer_spark \
        --xml dump.xml[.bz2] --out /data/wiki \
        [--namespace 0] [--keep-redirects] \
        [--jdbc-url jdbc:postgresql://... --jdbc-table-prefix wiki_]

Writes the four destination tables (page / revision / contributor / text)
as Parquet under --out; with --jdbc-url, additionally loads each table via
the JDBC sink (the reference's DB-load step).
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="wikipedia_org_xmldump_importer_spark")
    p.add_argument("--xml", required=True, help="MediaWiki dump path (.xml/.xml.bz2/.xml.gz)")
    p.add_argument("--out", required=True, help="output directory for Parquet tables")
    p.add_argument("--namespace", type=int, default=0, help="keep only this ns (-1 = all)")
    p.add_argument("--keep-redirects", action="store_true")
    p.add_argument("--jdbc-url", default=None, help="optional JDBC DSN for the DB-load step")
    p.add_argument("--jdbc-table-prefix", default="")
    p.add_argument("--master", default=None, help="Spark master (default local[$SPARK_GRAFT_CPUS])")
    args = p.parse_args(argv)

    from .io import sink_jdbc
    from .session import build_session
    from .sources.xml_pages import import_dump

    spark = build_session(app_name="xmldump-import", master=args.master)
    tables = import_dump(
        spark,
        args.xml,
        args.out,
        namespace=None if args.namespace == -1 else args.namespace,
        drop_redirects=not args.keep_redirects,
    )
    for name, df in tables.items():
        n = df.count()
        print(f"{name}: {n} rows -> {args.out}/{name}.parquet", file=sys.stderr)
        if args.jdbc_url:
            sink_jdbc(df, args.jdbc_url, f"{args.jdbc_table_prefix}{name}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
