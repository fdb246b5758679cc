"""MERGE (upsert) as a DataFrame rewrite.

The reference's only join-shaped operator is Snowflake ``MERGE`` (SURVEY.md
§2.3 J1-J3, e.g. ``co2_harmonized_sp/function.py:135-153``): match on a key,
UPDATE matched rows, INSERT unmatched source rows. Vanilla parquet has no
transactional MERGE, so we decompose it —

    result =   target ⟕anti source        (rows untouched by the merge)
             ∪ (target ⋈ source)          (matched -> updated column values)
             ∪ (source ⟕anti target)      (brand-new rows -> inserted)

— and commit with the store's atomic stage-and-swap.

Scale notes (100 TB): the incremental source batch is orders of magnitude
smaller than the target, so the source side is broadcast (no shuffle of the
target for the anti-join or the inner join; the target is scanned once and
streamed through two broadcast joins). For a huge source, pass
``broadcast_source=False`` and AQE picks sort-merge with skew handling.
The rewrite is idempotent on replay: re-merging the same source against the
merged target yields the identical table (C4 semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .table_store import TableStore


def merge_upsert(
    spark: SparkSession,
    store: TableStore,
    target_table: str,
    source: DataFrame,
    keys: list[str],
    update_cols: list[str] | None = None,
    insert_cols: list[str] | None = None,
    partition_by: list[str] | None = None,
    count_rows: bool = True,
    broadcast_source: bool = True,
    observe_metrics: dict | None = None,
    prune_partitions: bool = False,
    validate_pruning: bool = True,
    txn=None,
) -> dict:
    """Upsert ``source`` into ``target_table`` on ``keys``.

    - ``update_cols``: non-key columns taken from the source for matched rows
      (default: every target column present in the source). Mirrors the
      reference's update dict that excludes helper columns
      (``co2_analytical_sp/function.py:127-141``).
    - ``insert_cols``: columns populated for inserted rows (default: same as
      update set + keys); target columns absent from the source become NULL.
    - ``count_rows``: when False, skip the updated/inserted count jobs (two
      extra actions over the join branches) — the hot path for pipeline
      stages that only need the merge side effect.
    - ``observe_metrics``: ``{name: aggregate Column}`` collected over the
      FULL merged table during the write job itself (``Observation`` — no
      post-merge re-scan); values returned under ``"observed"``. The
      pipeline's min/max scalar-cache refresh rides the merge this way.
    - ``txn``: a :meth:`TableStore.transaction` handle — the merged table
      is STAGED through it instead of committed immediately, so the merge
      publishes atomically with the caller's other writes (the pipeline
      pairs HARMONIZED with its min/max scalar cache this way).
    - ``prune_partitions``: the 100 TB merge path for partitioned targets.
      The touched first-level partition values are read off the (small)
      source; the target scan is partition-pruned to them, the merge runs
      over ONLY those partitions, and the store links every untouched
      partition into the new version unchanged
      (:meth:`TableStore.overwrite_partitions`) — merge cost becomes
      proportional to the churned partitions, not the table. Requires
      ``partition_by``; the first partition column must exist in the
      source and must not be updated (a row changing partition would need
      its destination partition rewritten too); incompatible with
      ``observe_metrics`` (which promises full-table aggregates) and
      ``txn`` (partition links commit directly).
    - ``validate_pruning``: enforce the pruned path's precondition that no
      source key already exists in the target under an UNTOUCHED partition
      (such a row would be misclassified as an insert and its old image
      would survive via the linked untouched partition — silent duplicate
      keys). Skipped automatically when the partition column is part of
      ``keys`` (a key match then implies the same partition). The check is
      one key-column-pruned scan of the untouched partitions semi-joined
      against the broadcast source keys — no shuffle; pass ``False`` only
      when the caller structurally guarantees partition stability.

    Returns ``{"updated": n, "inserted": n}`` row counts (-1 when skipped),
    plus ``"observed"`` when requested.
    """
    from pyspark.sql import Observation

    sink = txn if txn is not None else store

    if not store.exists(target_table):
        init_cols = insert_cols or source.columns
        out = source.select(*[F.col(c) for c in init_cols]).dropDuplicates(keys)
        res: dict = {"updated": 0}
        if observe_metrics:
            obs = Observation()
            out = out.observe(obs, *[c.alias(k) for k, c in observe_metrics.items()])
            sink.overwrite(out, target_table, partition_by=partition_by)
            res["observed"] = dict(obs.get)
            res["inserted"] = -1
        else:
            sink.overwrite(out, target_table, partition_by=partition_by)
            res["inserted"] = out.count() if count_rows else -1
        return res

    target = store.read(spark, target_table)
    if prune_partitions:
        if not partition_by:
            raise ValueError("prune_partitions requires partition_by")
        if observe_metrics or txn is not None:
            raise ValueError(
                "prune_partitions is incompatible with observe_metrics/txn"
            )
        pcol = partition_by[0]
        if pcol not in source.columns:
            raise ValueError(f"source lacks partition column {pcol!r}")
        if update_cols and pcol in update_cols:
            raise ValueError(f"partition column {pcol!r} cannot be updated")
        # the partition column must never enter the update set — even the
        # DEFAULT one (update_cols=None would otherwise include it since it
        # exists on both sides): under the path's contract source pcol ==
        # target pcol for matched rows, but if the contract is violated an
        # updated pcol would silently move rows across partition dirs.
        upd_eff = update_cols or [
            c
            for c in target.columns
            if c not in keys and c != pcol and c in source.columns
        ]
        # inserted rows MUST carry the partition column (the default
        # insert set is keys + update set, which usually excludes it; a
        # NULL partition would land outside every replaced dir and corrupt
        # the link set)
        ins = insert_cols
        if ins is None:
            ins = list(dict.fromkeys(keys + upd_eff))
        if pcol not in ins:
            ins = [pcol, *ins]
        # the touched partition set is a bounded scalar list (days/years of
        # one batch), not a data collect
        pvals = [r[0] for r in source.select(pcol).distinct().collect()]
        if any(v is None for v in pvals):
            raise ValueError(
                f"merge_upsert({target_table}): source has NULL values in "
                f"partition column {pcol!r} — the pruned scan cannot match "
                f"the NULL partition (isin semantics); merge without "
                f"prune_partitions or filter the NULLs"
            )
        pruned = target.filter(F.col(pcol).isin(pvals))
        if validate_pruning and pcol not in keys:
            # precondition check: a source key living in an UNTOUCHED target
            # partition would be misclassified as an insert (the pruned scan
            # can't see its match) and duplicated via the partition links.
            # Key-column-pruned scan + broadcast semi-join, no shuffle.
            src_keys = F.broadcast(source.select(*keys).dropDuplicates(keys))
            # NULL-partition target rows are untouched too (isin is NULL
            # for them, and plain ~isin would drop them from the check)
            n_moved = (
                target.filter(~F.coalesce(F.col(pcol).isin(pvals), F.lit(False)))
                .select(*keys)
                .join(src_keys, on=keys, how="left_semi")
                .count()
            )
            if n_moved:
                raise ValueError(
                    f"merge_upsert({target_table}): {n_moved} source key(s) "
                    f"already exist in the target under partitions outside "
                    f"the touched set {sorted(map(str, pvals))[:10]} — a "
                    f"row's partition value may not change under "
                    f"prune_partitions; merge without pruning or delete the "
                    f"old rows first (validate_pruning=False skips this "
                    f"check when partition stability is guaranteed)"
                )
        matched, inserted, result = merge_branches(
            pruned,
            source,
            keys,
            update_cols=upd_eff,
            insert_cols=ins,
            broadcast_source=broadcast_source,
        )
        n_upd = matched.count() if count_rows else -1
        n_ins = inserted.count() if count_rows else -1
        # replaced partition specs are DERIVED from the directory names the
        # staged write actually produces (overwrite_partitions(replaced=None))
        # rather than formatted from collected Python values — str(v) does
        # not reproduce Spark's partition-dir encoding for booleans
        # ('True' vs 'true') or Hive percent-escaped characters (':' '/').
        store.overwrite_partitions(result, target_table, partition_by, None)
        return {"updated": n_upd, "inserted": n_ins}
    matched, inserted, result = merge_branches(
        target,
        source,
        keys,
        update_cols=update_cols,
        insert_cols=insert_cols,
        broadcast_source=broadcast_source,
    )
    n_upd = matched.count() if count_rows else -1
    n_ins = inserted.count() if count_rows else -1
    res = {"updated": n_upd, "inserted": n_ins}
    if observe_metrics:
        obs = Observation()
        result = result.observe(obs, *[c.alias(k) for k, c in observe_metrics.items()])
        sink.overwrite(result, target_table, partition_by=partition_by)
        res["observed"] = dict(obs.get)
    else:
        sink.overwrite(result, target_table, partition_by=partition_by)
    return res


def merge_branches(
    target: DataFrame,
    source: DataFrame,
    keys: list[str],
    update_cols: list[str] | None = None,
    insert_cols: list[str] | None = None,
    broadcast_source: bool = True,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """The broadcast-hinted merge plan as pure DataFrames:
    ``(matched, inserted, result)``. The target side is scanned (up to three
    column-pruned times) but never shuffled and never broadcast.

    ``broadcast_source=False`` drops every hint (a source batch too big to
    broadcast): AQE then plans shuffle joins keyed on ``keys``, with skew
    splitting if a key is hot.
    """
    target_cols = target.columns
    src = source.dropDuplicates(keys)
    upd = update_cols or [c for c in target_cols if c not in keys and c in src.columns]
    ins = insert_cols or list(dict.fromkeys(keys + upd))

    bsrc = F.broadcast(src) if broadcast_source else src

    untouched = target.join(bsrc.select(*keys), on=keys, how="left_anti")

    matched = target.alias("t").join(bsrc.alias("s"), on=keys, how="inner").select(
        *[F.col(f"t.{k}").alias(k) for k in keys],
        *[
            (F.col(f"s.{c}") if c in upd else F.col(f"t.{c}")).alias(c)
            for c in target_cols
            if c not in keys
        ],
    )

    # Inserted rows = source keys absent from the target. Anti-joining src
    # against the full target keyset would need either a broadcast of the
    # target's keys (billions of rows at scale — driver/executor OOM) or a
    # full shuffle of them (sort-merge). Instead anti-join against the
    # MATCHED keys — computed from the same source-broadcast inner join as
    # the `matched` branch, so it is ≤|src| rows and broadcastable. The
    # target is scanned once more (pruned to key columns) but never
    # shuffled or broadcast.
    matched_keys = target.select(*keys).join(bsrc.select(*keys), on=keys, how="inner")
    if broadcast_source:
        matched_keys = F.broadcast(matched_keys)
    inserted = src.join(matched_keys, on=keys, how="left_anti").select(
        *[
            (F.col(c) if c in ins and c in src.columns else F.lit(None)).alias(c)
            for c in target_cols
        ]
    )

    result = untouched.select(*target_cols).unionByName(
        matched.select(*target_cols)
    ).unionByName(inserted)
    return matched, inserted, result


def apply_changes(
    spark: SparkSession,
    store: TableStore,
    target_table: str,
    changes: DataFrame,
    keys: list[str],
    action_col: str = "_action",
    partition_by: list[str] | None = None,
) -> None:
    """Apply a full CDC batch (INSERT + DELETE rows, changelog order by
    ``_row_id``) to the target — the ``APPEND_ONLY=false`` stream shape
    (reference ``02_create_rawco2data_stream.py:50-56``; the reference's own
    merges only consume INSERTs, this completes the operator family).

    Per key, only the LAST action in the batch wins (a key deleted then
    re-inserted ends present). Single pass: the target is scanned once,
    anti-joined against ALL touched keys (broadcast), and the surviving
    rows are unioned with the batch's final INSERT images — one atomic
    overwrite, no separate delete rewrite.
    """
    from pyspark.sql import Window as W

    w = W.partitionBy(*keys).orderBy(F.desc("_row_id"))
    last = (
        changes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    ).cache()
    upserts = last.filter(F.col(action_col) == "INSERT").drop(action_col, "_row_id")

    if not store.exists(target_table):
        store.overwrite(upserts, target_table, partition_by=partition_by)
        last.unpersist()
        return

    target = store.read(spark, target_table)
    untouched = target.join(
        F.broadcast(last.select(*keys)), on=keys, how="left_anti"
    )
    result = untouched.unionByName(
        upserts.select(*target.columns), allowMissingColumns=False
    )
    store.overwrite(result, target_table, partition_by=partition_by)
    last.unpersist()


def upsert_dataframe(
    target: DataFrame,
    source: DataFrame,
    keys: list[str],
    update_cols: list[str] | None = None,
) -> DataFrame:
    """Pure (side-effect-free) upsert of two DataFrames; same semantics as
    :func:`merge_upsert` but returns the merged DataFrame. Used by the
    oracle-checked ``merge_upsert`` query and by tests."""
    target_cols = target.columns
    src = source.dropDuplicates(keys)
    upd = update_cols or [c for c in target_cols if c not in keys and c in src.columns]
    untouched = target.join(src.select(*keys), on=keys, how="left_anti")
    matched = target.alias("t").join(src.alias("s"), on=keys, how="inner").select(
        *[F.col(f"t.{k}").alias(k) for k in keys],
        *[
            (F.col(f"s.{c}") if c in upd else F.col(f"t.{c}")).alias(c)
            for c in target_cols
            if c not in keys
        ],
    )
    inserted = src.join(target.select(*keys), on=keys, how="left_anti").select(
        *[
            (F.col(c) if c in src.columns else F.lit(None)).alias(c)
            for c in target_cols
        ]
    )
    return (
        untouched.select(*target_cols)
        .unionByName(matched.select(*target_cols))
        .unionByName(inserted)
    )


def delete_where(
    spark: SparkSession,
    store: TableStore,
    name: str,
    condition: Column | str,
    partition_by: list[str] | None = None,
) -> int:
    """Standalone ``DELETE FROM <name> WHERE <condition>`` (the DML half
    Snowflake users reach for outside MERGE; reference deployer scripts
    issue these against staging tables).

    One scan: the survivor set is staged through the store's atomic
    overwrite, and the deleted-row count rides an ``Observation`` on the
    same pass — no second count job. Time travel still sees the pre-delete
    version until GC; call :func:`purge_versions` after a privacy-motivated
    delete so retained history cannot resurrect the rows.
    """
    from pyspark.sql import Observation

    # three-valued logic: DELETE removes only rows where the predicate is
    # TRUE — NULL-valued predicates keep their rows (SQL semantics)
    cond = F.expr(condition) if isinstance(condition, str) else condition
    cond = F.coalesce(cond, F.lit(False))
    obs = Observation()
    kept = store.read(spark, name).observe(
        obs, F.sum(cond.cast("long")).alias("n_deleted")
    ).filter(~cond)
    # preserve the table's recorded partition layout unless the caller
    # overrides it — an unpartitioned rewrite of a partitioned table would
    # silently flatten the layout
    store.overwrite(
        kept, name, partition_by=partition_by or store.partitioning(name)
    )
    n = obs.get["n_deleted"]
    return int(n) if n is not None else 0


def update_where(
    spark: SparkSession,
    store: TableStore,
    name: str,
    condition: Column | str,
    assignments: dict[str, Column],
    partition_by: list[str] | None = None,
) -> int:
    """Standalone ``UPDATE <name> SET col = expr, ... WHERE <condition>``.

    Row-preserving rewrite: every assigned column becomes
    ``CASE WHEN cond THEN new ELSE old END``; unmatched rows pass through
    byte-identical. Same single-scan Observation counting and atomic
    commit as :func:`delete_where`.
    """
    from pyspark.sql import Observation

    cond = F.expr(condition) if isinstance(condition, str) else condition
    cond = F.coalesce(cond, F.lit(False))  # NULL predicate -> row untouched
    df = store.read(spark, name)
    missing = [c for c in assignments if c not in df.columns]
    if missing:
        raise ValueError(f"update_where({name}): unknown column(s) {missing}")
    obs = Observation()
    updated = df.observe(obs, F.sum(cond.cast("long")).alias("n_updated")).select(
        *[
            (
                F.when(cond, assignments[c]).otherwise(F.col(c)).alias(c)
                if c in assignments
                else F.col(c)
            )
            for c in df.columns
        ]
    )
    store.overwrite(
        updated, name, partition_by=partition_by or store.partitioning(name)
    )
    n = obs.get["n_updated"]
    return int(n) if n is not None else 0


def purge_versions(store: TableStore, name: str) -> list[int]:
    """Erase all RETAINED HISTORY of a table, keeping only the current
    version — the right-to-be-forgotten companion to :func:`delete_where`
    (a privacy delete is incomplete while time travel / RESTORE can
    resurrect the rows). Returns the purged version numbers."""
    import os
    import shutil

    current = store.current_version(name)
    purged = []
    for v in store.versions(name):
        if v != current:
            shutil.rmtree(
                os.path.join(store.table_dir(name), f"v={v:06d}"),
                ignore_errors=True,
            )
            purged.append(v)
    live = set(store._all_version_dirs(name))
    store._write_committed_set(name, store._committed_set(name) & live)
    return purged
