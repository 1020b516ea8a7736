"""Catalog query runner CLI.

    python -m hdfs2cass_spark.query --list
    python -m hdfs2cass_spark.query --name q1_pricing_summary [--sf-dir DIR]
        [--explain] [--limit N] [--json]
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="hdfs2cass_spark.query")
    p.add_argument("--list", action="store_true", help="list catalog queries")
    p.add_argument("--name", help="query name to run")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    p.add_argument("--explain", action="store_true", help="print the physical plan")
    p.add_argument("--limit", type=int, default=20)
    p.add_argument("--json", action="store_true", help="rows as JSON lines")
    args = p.parse_args(argv)

    from .plans import CATALOG

    if args.list:
        w = max(len(n) for n in CATALOG)
        for n, q in sorted(CATALOG.items()):
            tag = "oracle" if q.oracle else "rows-only"
            print(f"{n:<{w}}  [{tag}]  {q.doc.split('.')[0]}.")
        return 0

    if not args.name:
        p.error("--name or --list required")
    if args.name not in CATALOG:
        p.error(f"unknown query {args.name!r}; see --list")

    from .session import get_session

    spark = get_session(f"query:{args.name}")
    df = CATALOG[args.name].fn(spark, args.sf_dir)
    if args.explain:
        df.explain("formatted")
    if args.json:
        for row in df.limit(args.limit).toJSON().collect():
            print(row)
    else:
        df.show(args.limit, truncate=40)
    return 0


if __name__ == "__main__":
    sys.exit(main())
