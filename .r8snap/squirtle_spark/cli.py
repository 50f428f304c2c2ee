"""Command-line driver — flock-cli parity (nexmark/ysb/tpch subcommands).

The reference ships ``flock-cli`` with per-benchmark runners
(flock-cli/src/{nexmark,ysb}.rs, main at flock-cli/src/main.rs); the
Spark-native equivalents:

    python -m squirtle_spark.cli list [--tag TAG]
    python -m squirtle_spark.cli run -q NAME [--sf-dir D] [--limit N]
                                     [--explain] [--oracle]
    python -m squirtle_spark.cli nexmark -q N [--sf-dir D]
    python -m squirtle_spark.cli ysb [--sf-dir D]
    python -m squirtle_spark.cli tpch -q N [--sf-dir D]
    python -m squirtle_spark.cli sql "SELECT ..." [--sf-dir D]
    python -m squirtle_spark.cli repl [--sf-dir D]
    python -m squirtle_spark.cli table versions|rollback|vacuum|compact
                                     --path P [-v N] [--keep K] [--dst D]

``run --oracle`` executes the query on Spark AND its DuckDB oracle and
prints the comparison — the same gate the driver applies. ``sql`` runs
one arbitrary SQL statement over the full catalog (fixture tables +
derived NEXMark/YSB/TPC-H views); ``repl`` is the interactive form —
the working version of the ``fsql`` shell the reference stubs out
(flock-cli/src/fsql.rs:30-68 prompts but executes nothing).
"""

from __future__ import annotations

import argparse
import os
import sys

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="squirtle-spark", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    sp = sub.add_parser("list", help="list registered queries")
    sp.add_argument("--tag", default=None, help="filter by tag substring")

    for name in ("run", "nexmark", "ysb", "tpch"):
        sp = sub.add_parser(name)
        if name != "ysb":
            sp.add_argument("-q", required=True, help="query name or number")
        sp.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
        sp.add_argument("--limit", type=int, default=20)
        sp.add_argument("--explain", action="store_true")
        sp.add_argument("--oracle", action="store_true")

    sp = sub.add_parser("sql", help="run arbitrary SQL over the catalog")
    sp.add_argument("query", help="SQL text (fixture tables + derived views)")
    sp.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    sp.add_argument("--limit", type=int, default=20)
    sp.add_argument("--explain", action="store_true")

    sp = sub.add_parser(
        "repl", help="interactive SQL shell over the catalog (fsql parity)"
    )
    sp.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    sp.add_argument("--limit", type=int, default=20)

    sp = sub.add_parser(
        "table", help="versioned-table lifecycle (maintenance operators)"
    )
    sp.add_argument(
        "action", choices=["versions", "rollback", "vacuum", "compact"]
    )
    sp.add_argument("--path", required=True, help="table path")
    sp.add_argument("-v", "--version", type=int, help="rollback target")
    sp.add_argument("--keep", type=int, default=3, help="vacuum keep window")
    sp.add_argument("--dst", help="compact destination path")
    sp.add_argument("--target-mb", type=int, default=128)
    return p


def _resolve(cmd: str, q: str | None) -> str:
    if cmd == "run":
        return q
    if cmd == "nexmark":
        return f"nexmark_q{int(q)}"
    if cmd == "tpch":
        return f"tpch_q{int(q)}"
    return "ysb_campaign_views"


def repl(spark, sf_dir: str, limit: int = 20, stdin=None) -> int:
    """Interactive SQL shell: the WORKING form of the reference's ``fsql``
    REPL (flock-cli/src/fsql.rs:30-68 prompts for SQL but executes
    nothing). Statements end with ``;`` and may span lines. Dot-commands:
    ``.list [substr]`` (registry queries), ``.run NAME`` (execute a
    registry entry), ``.explain`` toggles formatted plans, ``.quit``.
    Reads from ``stdin`` (any iterable of lines — tests feed a list;
    piped input works: ``echo 'SELECT 1;' | python -m squirtle_spark.cli
    repl``). Errors print and the loop continues, as a shell should."""
    from . import catalog
    from .registry import load_all

    catalog.register_all(spark, sf_dir)
    queries = load_all()
    lines = iter(stdin) if stdin is not None else iter(sys.stdin)
    show_plans = False
    buf: list[str] = []
    print("squirtle-spark SQL shell — `;` ends a statement, `.quit` exits")
    while True:
        sys.stdout.write("fsql> " if not buf else "  ... ")
        sys.stdout.flush()
        line = next(lines, None)
        if line is None:
            return 0
        stripped = line.strip()
        if not buf and stripped.startswith("."):
            parts = stripped.split()
            if parts[0] in (".quit", ".q", ".exit"):
                return 0
            if parts[0] == ".explain":
                show_plans = not show_plans
                print(f"explain {'on' if show_plans else 'off'}")
            elif parts[0] == ".list":
                pat = parts[1] if len(parts) > 1 else ""
                for name, q in queries.items():
                    if pat in name:
                        print(f"{name:32s} {q.doc}")
            elif parts[0] == ".run" and len(parts) > 1:
                name = parts[1]
                if name not in queries:
                    print(f"unknown query {name!r}; .list shows all")
                    continue
                try:
                    df = queries[name].spark_fn(spark, sf_dir)
                    if show_plans:
                        df.explain("formatted")
                    df.show(limit, truncate=False)
                except Exception as e:  # keep the shell alive
                    print(f"error: {e}")
            else:
                print("commands: .list [substr] | .run NAME | .explain | .quit")
            continue
        buf.append(line)
        if not stripped.endswith(";"):
            continue
        stmt = "\n".join(buf).strip().rstrip(";")
        buf = []
        if not stmt:
            continue
        try:
            df = spark.sql(stmt)
            if show_plans:
                df.explain("formatted")
            df.show(limit, truncate=False)
        except Exception as e:
            print(f"error: {e}")


def main(argv: list[str] | None = None, spark=None, stdin=None) -> int:
    args = _build_parser().parse_args(argv)
    from .registry import load_all

    queries = load_all()

    if args.cmd == "list":
        for name, q in queries.items():
            if args.tag and args.tag not in (q.tags or []) and args.tag not in name:
                continue
            kind = "oracle" if q.oracle else "rows-only"
            print(f"{name:32s} [{kind}] {q.doc}")
        return 0

    if args.cmd == "sql":
        if spark is None:
            from .session import get_spark

            spark = get_spark(app_name="squirtle-cli-sql")
        from . import catalog

        catalog.register_all(spark, args.sf_dir)
        df = spark.sql(args.query)
        if args.explain:
            df.explain("formatted")
        df.show(args.limit, truncate=False)
        return 0

    if args.cmd == "repl":
        if spark is None:
            from .session import get_spark

            spark = get_spark(app_name="squirtle-cli-repl")
        return repl(spark, args.sf_dir, limit=args.limit, stdin=stdin)

    if args.cmd == "table":
        if spark is None:
            from .session import get_spark

            spark = get_spark(app_name="squirtle-cli-table")
        from .operators import maintenance

        if args.action == "versions":
            latest = maintenance.latest_version(spark, args.path)
            print(f"committed version: {latest}")
            return 0
        if args.action == "rollback":
            if args.version is None:
                print("rollback needs -v/--version", file=sys.stderr)
                return 2
            try:
                maintenance.rollback(spark, args.path, args.version)
            except FileNotFoundError as e:
                print(str(e), file=sys.stderr)
                return 2
            print(f"pointer -> v={args.version}")
            return 0
        if args.action == "vacuum":
            removed = maintenance.vacuum_versions(spark, args.path, keep=args.keep)
            print(f"removed versions: {removed}")
            return 0
        if args.dst is None:
            print("compact needs --dst", file=sys.stderr)
            return 2
        n = maintenance.compact_parquet(
            spark, args.path, args.dst, target_file_bytes=args.target_mb * 1024 * 1024
        )
        print(f"compacted to {n} files")
        return 0

    name = _resolve(args.cmd, getattr(args, "q", None))
    if name not in queries:
        print(f"unknown query {name!r}; `list` shows all", file=sys.stderr)
        return 2

    if spark is None:
        from .session import get_spark

        spark = get_spark(app_name=f"squirtle-cli-{name}")

    if args.oracle:
        from .oracle import check_query

        res = check_query(spark, name, args.sf_dir)
        print(res.message())
        return 0 if res.ok else 1

    df = queries[name].spark_fn(spark, args.sf_dir)
    if args.explain:
        df.explain("formatted")
    df.show(args.limit, truncate=False)
    return 0


if __name__ == "__main__":
    sys.exit(main())
