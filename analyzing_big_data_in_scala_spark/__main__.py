"""CLI: run any registry query against a fixture directory.

    python -m analyzing_big_data_in_scala_spark --list
    python -m analyzing_big_data_in_scala_spark pricing_summary
    python -m analyzing_big_data_in_scala_spark search_multi_word_cosine \
        --sf-dir /root/testdata/sf0.01 --limit 5 --explain
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="analyzing_big_data_in_scala_spark")
    parser.add_argument("query", nargs="?", help="registry query name")
    parser.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    parser.add_argument("--limit", type=int, default=20, help="rows to show")
    parser.add_argument("--explain", action="store_true", help="print the formatted physical plan")
    parser.add_argument("--list", action="store_true", help="list available queries")
    args = parser.parse_args(argv)

    from .plans.registry import QUERIES
    from . import plans  # noqa: F401  (populates the registry)

    if args.list or not args.query:
        for name, spec in QUERIES.items():
            oracle = "oracle" if spec.oracle else "rows-only"
            print(f"{name:36s} [{oracle}] {spec.description}")
        return 0

    if args.query not in QUERIES:
        print(f"unknown query: {args.query} (use --list)", file=sys.stderr)
        return 2

    from .session import get_spark

    spark = get_spark(f"abds-{args.query}")
    spark.sparkContext.setLogLevel("ERROR")
    df = QUERIES[args.query].fn(spark, args.sf_dir)
    if args.explain:
        df.explain("formatted")
    df.show(args.limit, truncate=False)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
