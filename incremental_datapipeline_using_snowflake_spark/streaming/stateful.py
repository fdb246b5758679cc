"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference has no stateful streaming (SURVEY.md §2.7); these are the
Spark-native extension for state that built-in aggregations can't express:
per-key state lives in the state store, survives across micro-batches, and
is evicted by timeout. Two operators:

- ``running_stats``: per-key running count/sum/max with cross-batch state —
  the shape for per-user counters, rate limits, cumulative metrics.
- ``dedup_with_state``: cross-batch exact dedup — emits only first-seen
  (key, fingerprint) rows, remembering fingerprints in state. This is the
  streaming form of exact dedup (ops.dedup) for unbounded corpora, where
  ``dropDuplicates`` state would need a watermark bound.

Both run identically over a batch DataFrame via the ``*_batch`` twins (used
by tests to cross-check the stateful path against a plain aggregation).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

RUNNING_STATS_SCHEMA = T.StructType(
    [
        T.StructField("key", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
        T.StructField("max_value", T.DoubleType()),
    ]
)

_RUNNING_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("s", T.DoubleType()),
        T.StructField("mx", T.DoubleType()),
    ]
)


def _running_stats_fn(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, s, mx = state.get if state.exists else (0, 0.0, None)
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].sum())
        batch_max = float(pdf["value"].max()) if len(pdf) else None
        if batch_max is not None:
            mx = batch_max if mx is None else max(mx, batch_max)
    state.update((n, s, mx))
    yield pd.DataFrame(
        [{"key": key[0], "n_events": n, "sum_value": s, "max_value": mx}]
    )


def running_stats(grouped_stream: DataFrame, key_col: str, value_col: str) -> DataFrame:
    """Per-key running stats across micro-batches. Input: any streaming
    DataFrame with ``key_col`` and a numeric ``value_col``."""
    src = grouped_stream.select(
        F.col(key_col).alias("key"), F.col(value_col).cast("double").alias("value")
    )
    return src.groupBy("key").applyInPandasWithState(
        _running_stats_fn,
        outputStructType=RUNNING_STATS_SCHEMA,
        stateStructType=_RUNNING_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def running_stats_batch(df: DataFrame, key_col: str, value_col: str) -> DataFrame:
    """Batch twin of :func:`running_stats` (final state per key)."""
    v = F.col(value_col).cast("double")
    return df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(v).alias("n_events"),
        F.sum(v).alias("sum_value"),
        F.max(v).alias("max_value"),
    )


DEDUP_SCHEMA = T.StructType(
    [
        T.StructField("key", T.LongType()),
        T.StructField("fp", T.StringType()),
        T.StructField("first_seen_batch_rows", T.LongType()),
    ]
)

_DEDUP_STATE_SCHEMA = T.StructType([T.StructField("seen", T.ArrayType(T.StringType()))])


def _dedup_fn(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    seen = set(state.get[0]) if state.exists else set()
    fresh: list[str] = []
    total = 0
    for pdf in pdfs:
        total += len(pdf)
        for fp in pdf["fp"]:
            if fp not in seen:
                seen.add(fp)
                fresh.append(fp)
    state.update((sorted(seen),))
    yield pd.DataFrame(
        [{"key": key[0], "fp": fp, "first_seen_batch_rows": total} for fp in fresh]
    )


def tws_available() -> bool:
    """Spark 4's arbitrary-state-v2 API (``transformWithStateInPandas``)
    needs ``protobuf`` on the Python workers; report whether this
    environment can run it.

    Environment probe (re-run r10, 2026-08-15): ``import google.protobuf``
    still fails in this container (ModuleNotFoundError: google) and package
    installs are out of scope, so the gate stays and the live-equality twin
    test skips here; on any cluster with protobuf installed (every real
    Spark 4 deployment), the gate opens and ``tests/test_stateful.py`` runs
    the v2 path live with no code change.
    """
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def running_stats_tws(
    grouped_stream: DataFrame, key_col: str, value_col: str
) -> DataFrame:
    """Spark-4-native twin of :func:`running_stats` on the arbitrary-state
    v2 API (``transformWithStateInPandas`` + ``StatefulProcessor`` +
    ``ValueState``). Same output schema and semantics; the v2 API adds
    composable state variables, TTL, and timers over the single-tuple
    state of ``applyInPandasWithState``, and requires the RocksDB state
    store provider (``session.get_session(rocksdb_state_store=True)``).

    Raises ``ImportError`` where ``protobuf`` is missing (the v2 state
    client serializes over protobuf); :func:`tws_available` gates callers.
    """
    if not tws_available():
        raise ImportError(
            "transformWithStateInPandas requires the 'protobuf' package on "
            "the Python workers; use running_stats (applyInPandasWithState) "
            "in this environment"
        )
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _RunningStats(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("stats", "n long, s double, mx double")

        def handleInputRows(self, key, rows, timer_values):  # noqa: ANN001
            got = self._state.get()
            n, s, mx = got if got else (0, 0.0, None)
            for pdf in rows:
                n += len(pdf)
                s += float(pdf["value"].sum())
                batch_max = float(pdf["value"].max()) if len(pdf) else None
                if batch_max is not None:
                    mx = batch_max if mx is None else max(mx, batch_max)
            self._state.update((n, s, mx))
            yield pd.DataFrame(
                [{"key": key[0], "n_events": n, "sum_value": s, "max_value": mx}]
            )

        def close(self) -> None:
            pass

    src = grouped_stream.select(
        F.col(key_col).alias("key"), F.col(value_col).cast("double").alias("value")
    )
    return src.groupBy("key").transformWithStateInPandas(
        statefulProcessor=_RunningStats(),
        outputStructType=RUNNING_STATS_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


def dedup_with_state(stream: DataFrame, key_col: str, fp_col: str) -> DataFrame:
    """Emit only first-seen (key, fingerprint) pairs across all batches.

    State per key is the set of seen fingerprints — at scale, partition the
    key space so each group's set stays bounded (e.g. key = fingerprint
    prefix), or move to a bloom-filter state encoding.
    """
    src = stream.select(
        F.col(key_col).alias("key"), F.col(fp_col).alias("fp")
    )
    return src.groupBy("key").applyInPandasWithState(
        _dedup_fn,
        outputStructType=DEDUP_SCHEMA,
        stateStructType=_DEDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
