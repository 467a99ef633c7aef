"""Dump .explain("formatted") for a set of corpus queries to files.

Usage: python tools/plan_dump.py <out_dir> <suffix> [q1,q2,... | --bench]

Writes <out_dir>/<query>_<suffix>.txt for each query. --bench selects the
HEADLINE + HEAVY bench sets (the queries whose plan claims the
optimization round must evidence). The formatted plan is the initial
AQE plan (isFinalPlan=false) — the same artifact explain_audit checks.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from es_to_clickhouse_spark.corpus import all_queries
from es_to_clickhouse_spark.session import get_spark


def main() -> None:
    if len(sys.argv) < 3:  # ADVICE r14: usage, not a bare IndexError
        print(__doc__.strip(), file=sys.stderr)
        raise SystemExit(2)
    out_dir, suffix = sys.argv[1], sys.argv[2]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if len(sys.argv) > 3 and sys.argv[3] != "--bench":
        names = [n for n in sys.argv[3].split(",") if n]
    else:
        import bench

        names = list(bench.HEADLINE) + list(bench.HEAVY)
    qs = all_queries()
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("plan_dump")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        if name not in qs:
            print(f"SKIP {name}: not a corpus query")
            continue
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
