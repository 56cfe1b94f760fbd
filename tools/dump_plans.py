"""Dump `.explain("formatted")` for declared queries and audit plan shape.

Usage:
    python tools/dump_plans.py [--sf DIR] [--out plans/r13] [--suffix _before]
                               [--audit] [name ...]

With explicit names, writes plans/<out>/<name><suffix>.txt for each.
With --audit (no names), walks EVERY registry entry, captures its
formatted plan, and prints a one-line-per-query audit: #Exchange,
join strategies, Python-eval nodes, CartesianProduct, scans whose
PushedFilters is empty while the query filters that table. Plans are
built at the given sf dir but never executed (plan-only; cheap).
"""

from __future__ import annotations

import argparse
import io
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def formatted_plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


RED_NODES = (
    "BatchEvalPython",
    "ArrowEvalPython",
    "CartesianProduct",
    "BroadcastNestedLoopJoin",
)


def audit_line(name: str, plan: str) -> str:
    n_exch = len(re.findall(r"\bExchange\b", plan))
    n_reuse = len(re.findall(r"ReusedExchange", plan))
    joins = sorted(
        set(
            re.findall(
                r"(SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin"
                r"|CartesianProduct|BroadcastNestedLoopJoin)",
                plan,
            )
        )
    )
    flags = [n for n in RED_NODES if n in plan]
    n_python = len(re.findall(r"MapInPandas|MapInArrow|FlatMapGroupsInPandas", plan))
    empty_pushed = len(re.findall(r"PushedFilters: \[\]", plan))
    n_scans = len(re.findall(r"Scan parquet", plan))
    return (
        f"{name}\texch={n_exch}(+{n_reuse}r)\tjoins={','.join(joins) or '-'}"
        f"\tarrow={n_python}\tred={','.join(flags) or '-'}"
        f"\tscans={n_scans}\tscan_nofilter={empty_pushed}"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default="plans/r13")
    ap.add_argument("--suffix", default="_before")
    ap.add_argument("--audit", action="store_true")
    args = ap.parse_args()

    from lakeshack_spark.session import get_spark
    from lakeshack_spark.queries import queries

    spark = get_spark(app_name="dump_plans")
    qs = queries()
    names = args.names or (sorted(qs) if args.audit else [])
    os.makedirs(args.out, exist_ok=True)
    report = io.StringIO()
    for name in names:
        try:
            df = qs[name](spark, args.sf)
            plan = formatted_plan(df)
        except Exception as exc:  # noqa: BLE001 - audit must cover the rest
            print(f"{name}\tERROR\t{str(exc)[:200]}")
            continue
        if args.names:
            path = os.path.join(args.out, f"{name}{args.suffix}.txt")
            with open(path, "w") as fh:
                fh.write(plan)
            print(f"wrote {path} ({len(plan)} chars)")
        line = audit_line(name, plan)
        print(line)
        report.write(line + "\n")
    if args.audit and not args.names:
        with open(os.path.join(args.out, "audit.tsv"), "w") as fh:
            fh.write(report.getvalue())
    spark.stop()


if __name__ == "__main__":
    main()
