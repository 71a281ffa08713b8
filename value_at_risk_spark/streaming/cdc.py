"""Streaming CDC apply — change feed -> queryable table (SURVEY §2.9).

The reference anticipates incremental upserts into its Delta market
table (application.yaml:2-3, 01_var_market_etl.py:56-64) but only ever
overwrites; batch MERGE lives in ``operators/merge.py``. This module is
the STREAMING half: a ``foreachBatch`` sink that folds an
insert/update/delete change feed into a versioned parquet table with
exactly-once semantics — the Hudi/Delta "apply changes" pattern on
plain files.

Correctness model (all three properties pytest-pinned):

1. **Sequence-ordered, not arrival-ordered.** Every change carries a
   monotone per-key ``seq`` (the CDC log position). The apply keeps,
   per key, the max-``seq`` record seen SO FAR — state rows rejoin
   each fold — so a change delivered late (an earlier-seq update
   arriving after a delete) can never resurrect a newer state. This is
   what makes the final table independent of micro-batch boundaries.
2. **Tombstones are state.** A delete is stored as an ``op='D'`` row
   with its seq, not dropped — dropping it would un-delete the key on
   any out-of-order or replayed earlier change. ``read()`` filters
   tombstones; ``vacuum_tombstones`` reclaims them once the feed's
   ordering horizon has passed (same contract as Delta VACUUM).
3. **Exactly-once via batchId versioning.** Each fold writes a full
   new table version under ``v=<batchId>`` (staged + atomic rename,
   skip-if-committed), mirroring ``IdempotentParquetSink``: redelivery
   of a crashed batch re-folds from the previous committed version —
   never double-applies.

Scale: each fold is one shuffle of (previous state ∪ batch) hash-
partitioned on the key — the batch side is a micro-batch (small), and
at 100 TB the full-state rewrite becomes partition-overwrite on a
stable key prefix (only partitions containing touched keys rewrite),
or the same fold expressed as a MERGE into a transactional table; the
seq/tombstone semantics are unchanged.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class CdcTableSink:
    """``foreachBatch`` callable applying a CDC feed to a table.

    Feed schema: ``keys..., seq (numeric, per-key monotone),
    op ('I'/'U'/'D'), payload...``. Stored state keeps ``seq`` and
    ``op`` alongside the payload (tombstones included); ``read()``
    returns the live rows (payload only).
    """

    def __init__(
        self,
        out_dir: str,
        keys: list[str],
        seq_col: str = "seq",
        op_col: str = "op",
    ):
        self.out_dir = out_dir
        self.keys = list(keys)
        self.seq_col = seq_col
        self.op_col = op_col
        os.makedirs(out_dir, exist_ok=True)
        self.skipped: list[int] = []

    # -- version bookkeeping ------------------------------------------------

    def _version_dir(self, batch_id: int) -> str:
        return os.path.join(self.out_dir, f"v={batch_id}")

    def committed_versions(self) -> list[int]:
        return sorted(
            int(e.name.split("=", 1)[1])
            for e in os.scandir(self.out_dir)
            if e.is_dir() and e.name.startswith("v=")
        )

    def committed(self, batch_id: int) -> bool:
        return os.path.isdir(self._version_dir(batch_id))

    # -- the fold -----------------------------------------------------------

    def _fold(self, state: DataFrame | None, batch_df: DataFrame) -> DataFrame:
        """max-seq-per-key over (state ∪ batch); one hash aggregate."""
        k, s, o = self.keys, self.seq_col, self.op_col
        payload = [c for c in batch_df.columns if c not in {*k, s, o}]
        cols = [*k, s, o, *payload]
        both = batch_df.select(*cols)
        if state is not None:
            both = state.select(*cols).unionByName(both)
        # struct comparison orders by seq first; ties (a key re-stating
        # the same log position — malformed, but must not resurrect a
        # deleted key) resolve by an explicit op priority with the
        # tombstone highest (D > U > I), then payload. Lexicographic op
        # order alone would let 'U' beat 'D'.
        pri = (
            F.when(F.col(o) == "D", 2)
            .when(F.col(o) == "U", 1)
            .otherwise(0)
            .alias("_pri")
        )
        packed = F.max(F.struct(F.col(s), pri, F.col(o), *payload)).alias(
            "_m"
        )
        return (
            both.groupBy(*k).agg(packed).select(*k, "_m.*").drop("_pri")
        )

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        final = self._version_dir(batch_id)
        if os.path.isdir(final):
            self.skipped.append(batch_id)  # replayed delivery: skip
            return
        spark = batch_df.sparkSession
        versions = self.committed_versions()
        state = (
            spark.read.parquet(self._version_dir(versions[-1]))
            if versions
            else None
        )
        new_state = self._fold(state, batch_df)
        tmp = os.path.join(self.out_dir, f"_tmp_v_{batch_id}")
        shutil.rmtree(tmp, ignore_errors=True)
        new_state.write.mode("overwrite").parquet(tmp)
        os.rename(tmp, final)  # atomic promote

    # -- readers ------------------------------------------------------------

    def read_state(
        self, spark: SparkSession, at: int | None = None
    ) -> DataFrame:
        """A committed version, tombstones included. ``at`` time-
        travels to the state as of batch ``at`` (the newest committed
        version <= at, since empty triggers may skip batchIds);
        default is the latest."""
        versions = self.committed_versions()
        if at is not None:
            versions = [v for v in versions if v <= at]
        if not versions:
            raise ValueError(
                f"CdcTableSink.read_state: no committed version"
                f"{f' at or before batch {at}' if at is not None else ''} "
                f"under {self.out_dir}"
            )
        return spark.read.parquet(self._version_dir(versions[-1]))

    def read(self, spark: SparkSession, at: int | None = None) -> DataFrame:
        """Live rows: a version minus tombstones, payload only.
        ``at`` gives Delta-style time travel across retained versions
        (vacuumed versions are gone — retention bounds the horizon)."""
        return self.read_state(spark, at=at).filter(
            F.col(self.op_col) != F.lit("D")
        ).drop(self.seq_col, self.op_col)

    # -- retention ----------------------------------------------------------

    def vacuum(self, keep_last: int = 1) -> list[int]:
        """Drop all but the newest ``keep_last`` versions (+ staging
        garbage). Never vacuum versions a checkpoint could replay."""
        versions = self.committed_versions()
        doomed = versions[:-keep_last] if keep_last > 0 else versions
        for v in doomed:
            shutil.rmtree(self._version_dir(v))
        for e in os.scandir(self.out_dir):
            if e.is_dir() and e.name.startswith("_tmp_v_"):
                shutil.rmtree(e.path)
        return doomed
