"""MERGE / SCD2 emulation — upserts without Delta.

The reference persists via Delta `saveAsTable` overwrites only
(/root/reference/01_var_market_etl.py:56-64) but anticipates
incremental upserts (application.yaml:2-3). On plain parquet the
idiomatic emulation is anti-join + union (CDC upsert) and
close-out-and-append (SCD2), both pure shuffles on the merge key.

Scale: one hash shuffle of each side on the key; with bucketed tables
on the key both joins become shuffle-free. The rewrite is
partition-overwrite-friendly (write only partitions containing touched
keys when the table is partitioned by a stable key prefix).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def upsert(target: DataFrame, updates: DataFrame, keys: list[str]) -> DataFrame:
    """MERGE semantics: rows from `updates` win on key collision;
    unmatched target rows pass through (anti-join + union)."""
    survivors = target.join(updates.select(*keys), on=keys, how="left_anti")
    return survivors.unionByName(updates)


def scd2_apply(
    target: DataFrame,
    updates: DataFrame,
    keys: list[str],
    effective_col: str,
    end_col: str = "valid_to",
    current_col: str = "is_current",
    open_end: str = "9999-12-31",
) -> DataFrame:
    """Slowly-changing-dimension type 2: close out current versions of
    changed keys (valid_to = new effective date, is_current = false)
    and append the new versions as current.

    target schema: keys..., payload..., effective_col, end_col, current_col.
    updates schema: keys..., payload..., effective_col.
    """
    changed = updates.select(
        *keys, F.col(effective_col).alias("_new_eff")
    )
    closed = (
        target.join(F.broadcast(changed), on=keys, how="inner")
        .filter(F.col(current_col))
        .withColumn(end_col, F.col("_new_eff"))
        .withColumn(current_col, F.lit(False))
        .drop("_new_eff")
    )
    untouched = target.join(changed.select(*keys), on=keys, how="left_anti")
    still_current_hist = (
        target.join(changed.select(*keys), on=keys, how="left_semi")
        .filter(~F.col(current_col))
    )
    fresh = updates.withColumn(end_col, F.lit(open_end).cast("date")).withColumn(
        current_col, F.lit(True)
    )
    return untouched.unionByName(still_current_hist).unionByName(
        closed
    ).unionByName(fresh)


def merge_into_delta(
    spark,
    target_path: str,
    updates: DataFrame,
    keys: list[str],
) -> None:
    """MERGE pushdown for Delta targets: when the environment ships
    delta-spark (sources.registry.delta_available), the upsert runs as
    a transactional ``DeltaTable.merge`` — file-level rewrite of only
    the touched files, concurrent-writer safe — instead of the full
    anti-join + union rewrite above. Same row-level semantics as
    ``upsert`` (updates win on key collision, unmatched rows pass
    through), asserted by the import-gated roundtrip test.

    ``DeltaTable.merge`` throws at RUNTIME when multiple source rows
    match one target row, and an empty key list would render an empty
    (invalid) merge condition — so keys are validated here and
    ``updates`` is deduplicated to one row per key (latest wins is the
    caller's job; ties are arbitrary, same as ``upsert``'s union).
    """
    if not keys:
        raise ValueError("merge_into_delta: keys must be non-empty")
    missing = [k for k in keys if k not in updates.columns]
    if missing:
        raise ValueError(f"merge_into_delta: keys not in updates: {missing}")

    from delta.tables import DeltaTable  # gated: ImportError if absent

    updates = updates.dropDuplicates(keys)
    cond = " AND ".join(f"t.{k} = u.{k}" for k in keys)
    (
        DeltaTable.forPath(spark, target_path)
        .alias("t")
        .merge(updates.alias("u"), cond)
        .whenMatchedUpdateAll()
        .whenNotMatchedInsertAll()
        .execute()
    )


def merge_into_delta_native(
    spark,
    target_path: str,
    updates: DataFrame,
    keys: list[str],
) -> int:
    """MERGE against a NATIVE delta-log table (sources/deltalog.py) —
    the no-delta-spark counterpart of ``merge_into_delta``: same row
    semantics as ``upsert`` (deduped updates win on key collision,
    unmatched target rows pass through), committed as one
    copy-on-write OVERWRITE version, so readers flip atomically from
    pre-merge to post-merge state and time travel keeps the pre-merge
    snapshot. Returns the committed version. Copy-on-write rewrites
    the whole active set (file-level pruning of untouched files is
    delta-spark's edge, documented, not silently approximated).

    On a CDF table (``delta.enableChangeDataFeed``) the commit also
    records exact row-level changes as cdc actions — matched target
    rows as update_preimage/update_postimage pairs, unmatched update
    rows as insert — so table_changes readers see MERGE semantics,
    not the overwrite's remove-all/add-all derivation (which would
    misreport every untouched row as deleted + reinserted)."""
    if not keys:
        raise ValueError("merge_into_delta_native: keys must be non-empty")
    missing = [k for k in keys if k not in updates.columns]
    if missing:
        raise ValueError(
            f"merge_into_delta_native: keys not in updates: {missing}"
        )
    from value_at_risk_spark.sources.deltalog import (
        DeltaConcurrentModification,
        _mapping_planes,
        _stage_cdc,
        cdf_enabled,
        read_delta,
        snapshot,
        write_delta,
    )

    deduped = updates.dropDuplicates(keys)
    # read-modify-write with a conditional commit: a concurrent append
    # landing between our read snapshot and the overwrite would be
    # silently erased by an unconditional rewrite (MERGE promises
    # key-level semantics, not last-writer-wins) — so pin the commit
    # to the read version and re-read + re-merge on conflict
    for _attempt in range(16):
        snap0 = snapshot(target_path)
        read_v = snap0.version
        target = read_delta(spark, target_path, version=read_v)
        merged = upsert(target, deduped, keys)
        extra = None
        if cdf_enabled(snap0):
            aligned = deduped.select(
                *[
                    F.col(f.name).cast(f.dataType).alias(f.name)
                    for f in snap0.schema.fields
                ]
            )
            target_keys = target.select(*keys)
            pre = target.join(
                deduped.select(*keys), on=keys, how="left_semi"
            ).withColumn("_change_type", F.lit("update_preimage"))
            post = aligned.join(
                target_keys, on=keys, how="left_semi"
            ).withColumn("_change_type", F.lit("update_postimage"))
            ins = aligned.join(
                target_keys, on=keys, how="left_anti"
            ).withColumn("_change_type", F.lit("insert"))
            # cdc files carry PHYSICAL names on column-mapped tables,
            # like any data file (identity planes when unmapped)
            io_snap, _to_log, to_phys, _l2p = _mapping_planes(spark, snap0)
            extra = _stage_cdc(
                to_phys(pre.unionByName(post).unionByName(ins)),
                target_path,
                io_snap.partition_columns,
            )
        try:
            return write_delta(
                spark,
                merged,
                target_path,
                mode="overwrite",
                expected_version=read_v,
                extra_actions=extra,
            )
        except DeltaConcurrentModification:
            continue
    raise RuntimeError(
        f"merge_into_delta_native: conflicted 16 times at {target_path}"
    )
