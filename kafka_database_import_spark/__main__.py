"""CLI entry point — run catalog queries like the reference binary.

The reference is a run-to-completion command-line program (``go run
kafka-database-import.go`` with env-var config, ``kafka-database-
import.go:41-50``). The Spark engine exposes the same ergonomics over
the whole catalog::

    python -m kafka_database_import_spark                 # flagship q48
    python -m kafka_database_import_spark --query q16_agg_hash \
        --sf-dir /root/testdata/sf0.1 --output /tmp/out.parquet
    python -m kafka_database_import_spark --list

Config resolution (brokers/topic/JDBC URL) still comes from the
environment via ``EngineConfig`` — the reference's exact surface.
Output goes to parquet when ``--output`` is given, else the first rows
print to stdout (``show``).
"""

from __future__ import annotations

import argparse
import sys
import time


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(
        prog="kafka_database_import_spark",
        description="PySpark-native analytics engine — run a catalog query",
    )
    parser.add_argument(
        "--query",
        default="q48_reference_pipeline",
        help="catalog query name (default: the reference pipeline)",
    )
    parser.add_argument(
        "--sf-dir",
        default="/root/testdata/sf0.01",
        help="fixture directory with the parquet tables",
    )
    parser.add_argument(
        "--output",
        default=None,
        help="write the result as parquet here instead of printing",
    )
    parser.add_argument(
        "--list", action="store_true", help="list catalog queries and exit"
    )
    parser.add_argument(
        "--rows", type=int, default=20, help="rows to print without --output"
    )
    parser.add_argument(
        "--lint",
        action="store_true",
        help="lint the query's physical plan for scale anti-patterns "
        "(operators/plan_lint) instead of executing it",
    )
    args = parser.parse_args(argv)

    from kafka_database_import_spark.plans.registry import all_queries

    catalog = all_queries()
    if args.list:
        for name, q in catalog.items():
            flag = "oracle" if q.oracle else "rows-only"
            print(f"{name}\t[{flag}]")
        return 0

    if args.query not in catalog:
        print(f"unknown query: {args.query!r} (use --list)", file=sys.stderr)
        return 2

    from kafka_database_import_spark.session import get_spark

    spark = get_spark()
    t0 = time.perf_counter()
    df = catalog[args.query].fn(spark, args.sf_dir)
    if args.lint:
        from kafka_database_import_spark.operators.plan_lint import lint

        findings = lint(df)
        for f in findings:
            print(f"{f.rule}: {f.detail}")
        print(
            f"{args.query}: {len(findings)} finding(s) "
            f"in {time.perf_counter() - t0:.2f}s"
        )
        return 1 if findings else 0
    if args.output:
        df.write.mode("overwrite").parquet(args.output)
        n = spark.read.parquet(args.output).count()
        print(f"{args.query}: wrote {n} rows to {args.output} "
              f"in {time.perf_counter() - t0:.2f}s")
    else:
        df.show(args.rows, truncate=False)
        print(f"{args.query}: {time.perf_counter() - t0:.2f}s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
