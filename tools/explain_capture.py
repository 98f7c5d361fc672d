"""Capture .explain('formatted') output for named queries.

Usage:
    python tools/explain_capture.py --suffix before name1 name2 ...
    python tools/explain_capture.py --suffix before --top N [--bench PATH]
    python tools/explain_capture.py --suffix after --round r18 name1 ...

Writes plans/<round>/<name>_<suffix>.txt for each query. Uses the same
session shape as bench.py so the captured plan is the plan the bench
times. Explain does not execute the query, but some query builders run
small actions (store builds, adaptive sizing counts); those run here as
they do in the bench.

``--top N`` picks the N slowest queries from a bench artifact:
``--bench PATH`` names it explicitly; the default is the newest
``BENCH_LOCAL_*.json`` in the repo root that carries a ``queries`` map.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _newest_bench_artifact() -> str:
    cands = sorted(
        glob.glob(os.path.join(REPO, "BENCH_LOCAL_*.json")),
        key=os.path.getmtime,
        reverse=True,
    )
    for path in cands:
        try:
            art = json.load(open(path))
        except (OSError, json.JSONDecodeError):
            continue
        if isinstance(art.get("queries"), dict) and art["queries"]:
            return path
    raise SystemExit(
        "no usable BENCH_LOCAL_*.json found in the repo root; "
        "pass --bench PATH"
    )


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument(
        "--suffix", required=True, help="'before' or 'after' (file suffix)"
    )
    ap.add_argument(
        "--round",
        default="r18",
        help="plans/<round>/ output subdirectory (default r18)",
    )
    ap.add_argument(
        "--top",
        type=int,
        default=None,
        help="capture the N slowest queries from the bench artifact",
    )
    ap.add_argument(
        "--bench",
        default=None,
        help="bench artifact for --top (default: newest BENCH_LOCAL_*.json)",
    )
    ap.add_argument("names", nargs="*", help="query names to capture")
    opts = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if opts.top is not None:
        art_path = opts.bench or _newest_bench_artifact()
        art = json.load(open(art_path))
        names = [
            k
            for k, _ in sorted(
                art["queries"].items(), key=lambda kv: -kv[1]
            )[: opts.top]
        ]
        print(f"--top {opts.top} from {art_path}", file=sys.stderr)
    else:
        names = opts.names
    if not names:
        ap.error("no query names given (pass names or --top N)")

    import bench

    spark = bench._build_session(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    out_dir = os.path.join(REPO, "plans", opts.round)
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
        path = os.path.join(out_dir, f"{name}_{opts.suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({len(txt)} chars)", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
