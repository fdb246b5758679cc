"""Stateful streaming (applyInPandasWithState) driven through a real
multi-batch file stream, cross-checked against batch twins; and full-CDC
apply_changes (INSERT+DELETE) semantics."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from incremental_datapipeline_using_snowflake_spark.operators.merge import apply_changes
from incremental_datapipeline_using_snowflake_spark.streaming import (
    dedup_with_state,
    running_stats,
    running_stats_batch,
)


def _write_batches(spark, path: str) -> list[list[tuple]]:
    """Two parquet files -> two micro-batches (maxFilesPerTrigger=1)."""
    batches = [
        [(1, 10.0, "a"), (1, 20.0, "b"), (2, 5.0, "a")],
        [(1, 30.0, "a"), (2, 7.0, "c"), (3, 1.0, "a")],
    ]
    for i, rows in enumerate(batches):
        spark.createDataFrame(
            rows, schema="key long, value double, fp string"
        ).coalesce(1).write.parquet(os.path.join(path, f"b{i}"))
    return batches


def _drain(stream_df, ckpt: str, sink: list, mode: str = "append") -> None:
    q = (
        stream_df.writeStream.outputMode(mode)
        .foreachBatch(lambda bdf, bid: sink.append((bid, bdf.collect())))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_running_stats_accumulates_across_batches(spark, tmp_path):
    data_dir = str(tmp_path / "data")
    os.makedirs(data_dir)
    _write_batches(spark, data_dir)

    src = (
        spark.readStream.schema("key long, value double, fp string")
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(data_dir)
    )
    sink: list = []
    _drain(running_stats(src, "key", "value"), str(tmp_path / "ck1"), sink, mode="update")

    # final state must equal the batch aggregation over everything
    final: dict = {}
    for _bid, rows in sink:
        for r in rows:
            final[r["key"]] = (r["n_events"], r["sum_value"], r["max_value"])
    all_df = spark.read.option("recursiveFileLookup", "true").parquet(data_dir)
    expected = {
        r["key"]: (r["n_events"], r["sum_value"], r["max_value"])
        for r in running_stats_batch(all_df, "key", "value").collect()
    }
    assert final == expected
    # state really crossed batches: key 1 ended with 3 events over 2 batches
    assert final[1] == (3, 60.0, 30.0)


def test_dedup_with_state_emits_first_seen_only(spark, tmp_path):
    data_dir = str(tmp_path / "data")
    os.makedirs(data_dir)
    _write_batches(spark, data_dir)

    src = (
        spark.readStream.schema("key long, value double, fp string")
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(data_dir)
    )
    sink: list = []
    _drain(dedup_with_state(src, "key", "fp"), str(tmp_path / "ck2"), sink)

    emitted = [(r["key"], r["fp"]) for _bid, rows in sink for r in rows]
    # each (key, fp) exactly once, despite (1,'a') appearing in both batches
    assert len(emitted) == len(set(emitted))
    assert emitted.count((1, "a")) == 1
    assert set(emitted) == {(1, "a"), (1, "b"), (2, "a"), (2, "c"), (3, "a")}


def test_apply_changes_insert_delete(spark, store):
    base = spark.createDataFrame(
        [(1, "x"), (2, "y"), (3, "z")], schema="k long, v string"
    )
    store.overwrite(base, "ns.cdc")

    changes = spark.createDataFrame(
        [
            (2, "y2", "INSERT", 10),   # update key 2
            (3, None, "DELETE", 11),   # delete key 3
            (4, "w", "INSERT", 12),    # new key 4
            (5, "t", "INSERT", 13),    # insert then delete -> absent
            (5, None, "DELETE", 14),
            (6, None, "DELETE", 15),   # delete then re-insert -> present
            (6, "u", "INSERT", 16),
        ],
        schema="k long, v string, _action string, _row_id long",
    )
    apply_changes(spark, store, "ns.cdc", changes, keys=["k"])

    got = {r["k"]: r["v"] for r in store.read(spark, "ns.cdc").collect()}
    assert got == {1: "x", 2: "y2", 4: "w", 6: "u"}



def test_running_stats_under_rocksdb_state_store(tmp_path):
    """The applyInPandasWithState operators must run unchanged on the
    RocksDB state store (the at-scale provider — local-disk state with
    incremental checkpointing) and produce the same final state.

    Runs in a subprocess: the state-store provider is a cluster conf, so it
    needs its own SparkSession and must not touch the shared test session."""
    import subprocess
    import sys

    script = f'''
import os
from incremental_datapipeline_using_snowflake_spark.session import get_session
from incremental_datapipeline_using_snowflake_spark.streaming import running_stats

# tiny dedicated session: the subprocess pays a full JVM spin-up already,
# and 2 keyed micro-batches need neither 32 cores nor 32 shuffle
# partitions — the provider under test is the same either way (r14)
spark = get_session("rocksdb_test", rocksdb_state_store=True,
                    master="local[2]", shuffle_partitions=2)
assert "RocksDB" in spark.conf.get("spark.sql.streaming.stateStore.providerClass")
data = r"{tmp_path}/data"; os.makedirs(data)
batches = [
    [(1, 10.0, "a"), (1, 20.0, "b"), (2, 5.0, "a")],
    [(1, 30.0, "a"), (2, 7.0, "c"), (3, 1.0, "a")],
]
for i, rows in enumerate(batches):
    spark.createDataFrame(rows, schema="key long, value double, fp string").coalesce(1).write.parquet(os.path.join(data, f"b{{i}}"))
src = (spark.readStream.schema("key long, value double, fp string")
       .option("maxFilesPerTrigger", "1").option("recursiveFileLookup", "true").parquet(data))
sink = []
q = (running_stats(src, "key", "value").writeStream.outputMode("update")
     .foreachBatch(lambda b, i: sink.append(b.collect()))
     .option("checkpointLocation", r"{tmp_path}/ck").trigger(availableNow=True).start())
q.awaitTermination()
final = {{}}
for rows in sink:
    for r in rows:
        final[r["key"]] = (r["n_events"], r["sum_value"])
assert final == {{1: (3, 60.0), 2: (2, 12.0), 3: (1, 1.0)}}, final
print("ROCKSDB_OK")
'''
    out = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True, timeout=300,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert "ROCKSDB_OK" in out.stdout, out.stderr[-2000:]


def test_running_stats_tws_gate_and_twin(spark):
    """The Spark-4 arbitrary-state-v2 twin: runs (and must agree with the
    batch aggregation) where protobuf is available; raises the documented
    ImportError where it is not — either way the gate itself is exercised."""
    import pytest

    from incremental_datapipeline_using_snowflake_spark.streaming.stateful import (
        running_stats_tws,
        tws_available,
    )

    df = spark.createDataFrame(
        [(1, 1.0), (1, 2.0), (2, 3.0)], "user_id long, value double"
    )
    if not tws_available():
        with pytest.raises(ImportError, match="protobuf"):
            running_stats_tws(df, "user_id", "value")
        return
    got = {
        r["key"]: (r["n_events"], r["sum_value"], r["max_value"])
        for r in running_stats_tws(df, "user_id", "value").collect()
    }
    assert got == {1: (2, 3.0, 2.0), 2: (1, 3.0, 3.0)}
