"""Driver-side orchestrator — the reference's 3-node task DAG re-expressed.

Reference: root task on ``USING CRON 0 10 * * * UTC`` with ``AFTER`` edges
RAW -> HARMONIZED -> ANALYTICS and a ``SYSTEM$STREAM_HAS_DATA`` gate
(``templates/orchestrate_tasks.sql.j2:18-75``). Here the DAG is sequential
Python with the same gating; scheduling stays external (cron / Airflow), and
``TASK_HISTORY`` becomes a per-stage run-log table.
"""

from __future__ import annotations

import time
import traceback
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import SparkSession

from ..operators.table_store import TableStore
from . import pipeline as P

RUN_LOG_TABLE = "analytics_co2._run_log"


@dataclass
class Orchestrator:
    spark: SparkSession
    store: TableStore
    suspended: bool = False  # task suspend/resume lifecycle
    streaming_harmonize: bool = False  # SP2 via Structured Streaming drain
    checkpoint_dir: str | None = None  # required when streaming_harmonize
    # auto-compact the changelog when its file count exceeds this (0 = off).
    # Daily appends leave one small file per batch; unchecked, a year of
    # runs makes every pending() scan listing-bound.
    compact_after_files: int = 64
    # SP3 via churn-proportional recompute (analytics as its own changelog
    # consumer); falls back to full recompute on first run / bounds moves.
    incremental_analytics: bool = True
    _history: list[dict] = field(default_factory=list)
    _pending_log: list[dict] = field(default_factory=list)

    def suspend(self) -> None:
        self.suspended = True

    def resume(self) -> None:
        self.suspended = False

    def _log(self, stage: str, status: str, message: str, seconds: float) -> None:
        rec = {
            "stage": stage,
            "status": status,
            "message": message,
            "seconds": round(seconds, 3),
            "run_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        self._history.append(rec)
        self._pending_log.append(rec)

    def _flush_log(self) -> None:
        """Persist buffered stage records in ONE append per DAG run — a
        1-row Spark write job per stage (round 1) tripled the fixed job
        overhead of every run for pure metadata."""
        if not self._pending_log:
            return
        from ..session import local_rows_df

        df = local_rows_df(  # one slice from the start — never 32 write tasks
            self.spark,
            [
                (r["stage"], r["status"], r["message"], r["seconds"], r["run_at"])
                for r in self._pending_log
            ],
            schema="stage string, status string, message string, seconds double, run_at string",
        )
        self.store.append(df, RUN_LOG_TABLE)
        self._pending_log = []

    def _run_stage(self, name: str, fn: Callable[[], str]) -> tuple[bool, str]:
        t0 = time.time()
        try:
            msg = fn()
            self._log(name, "SUCCEEDED", msg, time.time() - t0)
            return True, msg
        except Exception as exc:  # log-and-halt like a failed task node
            self._log(name, "FAILED", f"{exc}\n{traceback.format_exc()[-1500:]}", time.time() - t0)
            return False, str(exc)

    def run(self, feed_text: str | None = None, fetcher=None) -> dict[str, str]:
        """One DAG execution (``EXECUTE TASK`` equivalent)."""
        if self.suspended:
            return {"status": "suspended"}
        try:
            return self._run_dag(feed_text=feed_text, fetcher=fetcher)
        finally:
            self._flush_log()

    def _run_dag(self, feed_text: str | None = None, fetcher=None) -> dict[str, str]:
        results: dict[str, str] = {}

        ok, msg = self._run_stage(
            "co2_raw_data_task",
            lambda: P.load_raw(self.spark, self.store, feed_text=feed_text, fetcher=fetcher),
        )
        results["raw"] = msg
        if not ok:
            return results

        if self.streaming_harmonize:
            # Streaming mode: the checkpoint IS the offset, so the drain
            # itself is the gate — an empty backlog runs zero micro-batches.
            from ..streaming.incremental import stream_harmonize

            if not self.checkpoint_dir:
                raise ValueError("streaming_harmonize requires checkpoint_dir")
            ok, msg = self._run_stage(
                "co2_harmonized_task",
                lambda: stream_harmonize(self.spark, self.store, self.checkpoint_dir),
            )
        else:
            # Batch mode: the WHEN SYSTEM$STREAM_HAS_DATA(...) gate lives
            # inside harmonize's single pending-count action — probing it
            # here too would double the gate's job cost for no information.
            ok, msg = self._run_stage(
                "co2_harmonized_task", lambda: P.harmonize(self.spark, self.store)
            )
        results["harmonized"] = msg
        if not ok:
            return results
        if msg == "No data in stream to process":
            results["analytics"] = "skipped (stream empty)"
            return results

        # works in both modes: the streaming drain mirrors its consumed
        # high-water mark into the named "harmonize" offset that
        # incremental analytics caps its window at
        analytics_fn = (
            P.analytics_incremental if self.incremental_analytics else P.analytics
        )
        ok, msg = self._run_stage(
            "co2_analytics_task", lambda: analytics_fn(self.spark, self.store)
        )
        results["analytics"] = msg

        maint = self._maybe_compact_changelog()
        if maint is not None:
            results["maintenance"] = maint
        return results

    def _maybe_compact_changelog(self) -> str | None:
        """Compact the changelog when micro-batch appends have fragmented
        it. The gate is a driver-side file listing (no Spark job); the
        rewrite keeps ``_row_id`` range-sorted so consumer offset seeks
        stay row-group-prunable."""
        if not self.compact_after_files:
            return None
        # Streaming mode is compaction-safe since round 4: the drain drops
        # rows at or below the committed named offset, so the checkpoint's
        # path-based replay of compacted files merges nothing and the
        # empty-stream gate still reports honestly.
        import os

        from ..operators.changelog import Changelog

        log = Changelog(self.store, P.RAW_TABLE, embedded=True)
        if not self.store.exists(log.log_table):
            return None
        data_dir = self.store.data_path(log.log_table)
        n_files = sum(
            1 for r, _, fs in os.walk(data_dir) for f in fs if f.endswith(".parquet")
        )
        if n_files <= self.compact_after_files:
            return None
        # the changelog is embedded in RAW: the rewrite must keep the
        # year-partitioned layout (watermark pruning) while range-sorting
        # _row_id within it (offset-seek pruning)
        ok, msg = self._run_stage(
            "changelog_compaction",
            lambda: str(
                self.store.compact(
                    self.spark,
                    log.log_table,
                    sort_by=["_row_id"],
                    partition_by=["YEAR"],
                )
            ),
        )
        # A failed compaction must be distinguishable from a success payload
        # without parsing the run log.
        return msg if ok else f"FAILED: {msg}"

    def task_history(self) -> list[dict]:
        """INFORMATION_SCHEMA.TASK_HISTORY equivalent for this orchestrator."""
        return list(self._history)
