#!/usr/bin/env python
"""Standalone per-query timing + plan-dump helper for optimization work.

NOT part of the driver contract (bench.py is) — this is the workbench:

    python tools/qtime.py q72c_minhash_portable qp5_dedup_funnel \
        --repeat 3 --sf /root/testdata/sf0.1 --plan plans/r11/x_before.txt

Times each named query standalone (streams stopped, caches dropped,
full GC between queries, best-of-N collect — the judge's adjudication
protocol), optionally writing .explain('formatted') output per query.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_ml_optimization_spark import registry  # noqa: E402
from spark_ml_optimization_spark.session import get_spark  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--repeat", type=int, default=3)
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--plan-dir", default=None, help="write <name>_<suffix>.txt plan dumps here")
    ap.add_argument("--plan-suffix", default="before")
    args = ap.parse_args()

    spark = get_spark("qtime")
    qs = registry.all_queries()
    # Warm scans once (bench.py does the same) so best-of-N measures
    # the computation, not the cold footer read.
    from spark_ml_optimization_spark.sources import TABLES, load_table

    for t in TABLES:
        load_table(spark, args.sf, t).count()

    out = {}
    for name in args.queries:
        q = qs[name]
        if args.plan_dir:
            os.makedirs(args.plan_dir, exist_ok=True)
            df = q.fn(spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(
                os.path.join(args.plan_dir, f"{name}_{args.plan_suffix}.txt"), "w"
            ) as fh:
                fh.write(plan)
        best = None
        times = []
        for _ in range(args.repeat):
            try:
                for sq in spark.streams.active:
                    sq.stop()
                spark.catalog.clearCache()
                spark.sparkContext._jvm.System.gc()
            except Exception:
                pass
            spark.sparkContext.setJobDescription(f"qtime:{name}")
            t0 = time.perf_counter()
            q.fn(spark, args.sf).collect()
            dt = time.perf_counter() - t0
            times.append(round(dt, 3))
            best = dt if best is None else min(best, dt)
        out[name] = {"best": round(best, 3), "runs": times}
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
