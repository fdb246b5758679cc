"""Per-query optimization measurement harness (r13).

For each named query: capture `.explain("formatted")` to a file and time the
computation through the noop sink (guide §1.4 — computes every column of
every row, no sink cost, full plan in the SQL tab), min over --reps reps.

Usage::

    python scripts/opt_measure.py q1 q2 ... [--sf DIR] [--reps N]
        [--plans-dir plans/r13] [--suffix before]

Prints one JSON line {name: {"noop_s": min, "reps": [...]}} and writes
plans/<suffix> files when --plans-dir is given.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--plans-dir", default=None)
    ap.add_argument("--suffix", default="before")
    args = ap.parse_args()

    from incremental_datapipeline_using_snowflake_spark.queries import (
        all_queries,
        release_session_frames,
    )
    from incremental_datapipeline_using_snowflake_spark.queries import (
        memo_evict_new,
        memo_snapshot,
    )
    from incremental_datapipeline_using_snowflake_spark.session import get_session

    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    os.environ["SPARK_GRAFT_CPUS"] = cpus
    spark = get_session("opt_measure", shuffle_partitions=int(cpus))
    qs = all_queries()

    # same warmers as bench.py so first-query JIT doesn't pollute rep 1
    for warm in ("q6_forecast_revenue", "region_revenue", "pandas_udf_normalize",
                 "window_family", "text_profile", "ann_bruteforce_topk",
                 "calendar_gapfill"):
        if warm in qs:
            try:
                qs[warm][0](spark, args.sf).count()
            except Exception:
                pass
    spark.catalog.clearCache()

    out: dict[str, dict] = {}
    for name in args.names:
        if name not in qs:
            out[name] = {"error": "unknown query"}
            continue
        fn, _sql = qs[name]
        reps = []
        for r in range(args.reps):
            snap = memo_snapshot()
            spark.sparkContext.setJobDescription(f"{name} rep{r}")
            t0 = time.time()
            df = fn(spark, args.sf)
            df.write.format("noop").mode("overwrite").save()
            reps.append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
            if args.plans_dir and r == 0:
                import contextlib
                import io

                os.makedirs(args.plans_dir, exist_ok=True)
                buf = io.StringIO()
                with contextlib.redirect_stdout(buf):
                    df.explain("formatted")
                with open(
                    os.path.join(args.plans_dir, f"{name}_{args.suffix}.txt"), "w"
                ) as f:
                    f.write(buf.getvalue())
            spark.catalog.clearCache()
            memo_evict_new(snap)
            release_session_frames(spark)
        out[name] = {"noop_s": min(reps), "reps": reps}
        print(f"  {name}: {min(reps)}s {reps}", file=sys.stderr)
    print(json.dumps(out, sort_keys=True))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
