"""CLI pipeline runner — the engine's operational entry point.

Replaces the reference's task-DAG + deployer CLI surface
(``snowflake_deployer.py`` subcommands, ``EXECUTE TASK`` — SURVEY.md §3.3)
with a single driver command; scheduling stays external (cron/Airflow):

    python scripts/run_pipeline.py --warehouse /path/wh --feed-file feed.txt
    python scripts/run_pipeline.py --warehouse /path/wh --fetch          # live HTTP
    python scripts/run_pipeline.py --warehouse /path/wh --feed-file f --streaming
    python scripts/run_pipeline.py --warehouse /path/wh --history       # TASK_HISTORY

Exit code 0 iff every executed stage succeeded.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description="Run the incremental CO2 pipeline")
    ap.add_argument("--warehouse", required=True, help="table-store root directory")
    ap.add_argument("--feed-file", help="path to a feed text file (test/replay mode)")
    ap.add_argument("--fetch", action="store_true", help="fetch the live NOAA feed")
    ap.add_argument(
        "--streaming", action="store_true",
        help="run the harmonized stage as a Structured Streaming drain",
    )
    ap.add_argument("--checkpoint", help="checkpoint dir (default <warehouse>/_checkpoints)")
    ap.add_argument("--history", action="store_true", help="print the run log and exit")
    args = ap.parse_args()

    from incremental_datapipeline_using_snowflake_spark.operators import TableStore
    from incremental_datapipeline_using_snowflake_spark.plans import Orchestrator, bootstrap
    from incremental_datapipeline_using_snowflake_spark.session import get_session

    spark = get_session("pipeline_cli")
    store = TableStore(root=args.warehouse)

    if args.history:
        from incremental_datapipeline_using_snowflake_spark.plans.orchestrator import RUN_LOG_TABLE

        if store.exists(RUN_LOG_TABLE):
            store.read(spark, RUN_LOG_TABLE).orderBy("run_at").show(100, truncate=False)
        else:
            print("no run history")
        return 0

    if not args.feed_file and not args.fetch:
        ap.error("one of --feed-file or --fetch is required")

    feed_text = None
    if args.feed_file:
        with open(args.feed_file) as f:
            feed_text = f.read()

    bootstrap(store)
    orch = Orchestrator(
        spark,
        store,
        streaming_harmonize=args.streaming,
        checkpoint_dir=args.checkpoint
        or os.path.join(args.warehouse, "_checkpoints", "harmonize"),
    )
    results = orch.run(feed_text=feed_text)
    print(json.dumps(results, indent=2))
    failed = any(
        rec["status"] == "FAILED" for rec in orch.task_history()
    )
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
