"""Capture .explain('formatted') output for named queries.

Usage:
    python tools/explain_capture.py SUFFIX name1 name2 ...
    python tools/explain_capture.py SUFFIX --top N     # N slowest from BENCH_LOCAL_r17_clean.json

Writes plans/r17/<name>_<SUFFIX>.txt for each query (SUFFIX is
'before' or 'after'). Uses the same session shape as bench.py so the
captured plan is the plan the bench times. Explain does not execute
the query, but some query builders run small actions (store builds,
adaptive sizing counts); those run here as they do in the bench.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    suffix = sys.argv[1]
    args = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    if args and args[0] == "--top":
        import json

        n = int(args[1])
        art = json.load(open(os.path.join(REPO, "BENCH_LOCAL_r17_clean.json")))
        names = [
            k
            for k, _ in sorted(
                art["queries"].items(), key=lambda kv: -kv[1]
            )[:n]
        ]
    else:
        names = args

    import bench

    spark = bench._build_session(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    out_dir = os.path.join(REPO, "plans", "r17")
    os.makedirs(out_dir, exist_ok=True)

    from smart_contract_database_builder_spark import plans

    qs = plans.queries()
    for name in names:
        fn = qs.get(name)
        if fn is None:
            print(f"SKIP unknown {name}", file=sys.stderr)
            continue
        try:
            df = fn(spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001
            txt = f"EXPLAIN FAILED: {type(e).__name__}: {e}"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({len(txt)} chars)", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
