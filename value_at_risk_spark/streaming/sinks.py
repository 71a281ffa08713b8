"""Exactly-once sinks for streaming queries — SURVEY §2.9.

Spark's streaming contract is exactly-once STATE plus at-least-once
SINK delivery for non-transactional sinks: after a crash between "batch
written" and "offsets committed", the restarted query re-executes the
last batch and a plain append sink duplicates it. The reference runs on
Delta, whose transactional log absorbs this (txnAppId/txnVersion); this
module gives the same guarantee on plain parquet by keying every commit
on ``batchId`` — the stable replay identity Spark hands foreachBatch.

``IdempotentParquetSink`` implements the standard recipe:

1. each micro-batch lands in its own ``batch_id=N`` directory;
2. the write is staged to a temp dir and promoted with an atomic
   ``os.rename`` — a crash mid-write leaves only unpromoted temp
   garbage, never a half-visible batch;
3. a replayed batchId whose directory already exists is SKIPPED — the
   dedup that turns at-least-once redelivery into exactly-once output.

At 100 TB this is the same pattern, with the rename swapped for the
object store's atomic commit (or a manifest file); the batchId key and
skip-if-committed logic are unchanged.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame


class IdempotentParquetSink:
    """A ``foreachBatch`` callable with transactional batchId commits.

    Usage::

        sink = IdempotentParquetSink(out_dir)
        stream.writeStream.foreachBatch(sink).option(
            "checkpointLocation", ckpt
        ).start()

    ``read(spark)`` scans all committed batches as one DataFrame.
    """

    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        os.makedirs(out_dir, exist_ok=True)
        self.skipped: list[int] = []  # replayed batchIds (observability)

    def _batch_dir(self, batch_id: int) -> str:
        return os.path.join(self.out_dir, f"batch_id={batch_id}")

    def committed(self, batch_id: int) -> bool:
        return os.path.isdir(self._batch_dir(batch_id))

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        final = self._batch_dir(batch_id)
        if os.path.isdir(final):
            # replayed delivery of an already-committed batch: skip —
            # this is what makes redelivery exactly-once at the sink
            self.skipped.append(batch_id)
            return
        tmp = os.path.join(self.out_dir, f"_tmp_batch_{batch_id}")
        shutil.rmtree(tmp, ignore_errors=True)  # leftover from a crash
        batch_df.write.mode("overwrite").parquet(tmp)
        os.rename(tmp, final)  # atomic promote

    def read(self, spark) -> DataFrame:
        """All committed batches (basePath keeps batch_id a column out
        of the data schema via partition discovery).

        With ZERO committed batches there is no schema to return a
        DataFrame with, so this raises a clear ``ValueError`` instead
        of the opaque path-not-found AnalysisException the empty glob
        used to surface."""
        if not any(
            e.name.startswith("batch_id=")
            for e in os.scandir(self.out_dir)
            if e.is_dir()
        ):
            raise ValueError(
                f"IdempotentParquetSink.read: no committed batches under "
                f"{self.out_dir} (the sink has not processed any "
                f"micro-batch yet, so no schema exists to read)"
            )
        return (
            spark.read.option("basePath", self.out_dir)
            .parquet(os.path.join(self.out_dir, "batch_id=*"))
            .drop("batch_id")
        )


    def vacuum(self, keep_last: int = None, before_batch_id: int = None) -> list[int]:
        """Retention cleanup — the VACUUM half of the transactional-sink
        contract: drop committed batch directories either older than
        ``before_batch_id`` or beyond the newest ``keep_last`` batches
        (exactly one of the two must be given).

        Also sweeps unpromoted ``_tmp_batch_*`` staging garbage left by
        crashes mid-write (always safe: a temp dir is by definition
        uncommitted). NOTE the interaction with exactly-once replay:
        never vacuum a batch the streaming checkpoint could still
        replay (i.e. keep everything at or past the checkpoint's
        committed offset) — vacuuming it would let a replay RE-COMMIT
        the batch as new output. Downstream readers see vacuumed
        batches disappear, which is the retention semantics (same as
        Delta VACUUM past the retention horizon).

        Returns the batchIds removed, ascending.
        """
        if (keep_last is None) == (before_batch_id is None):
            raise ValueError("vacuum: pass exactly one of keep_last / before_batch_id")
        ids = sorted(
            int(e.name.split("=", 1)[1])
            for e in os.scandir(self.out_dir)
            if e.is_dir() and e.name.startswith("batch_id=")
        )
        if keep_last is not None:
            doomed = ids[:-keep_last] if keep_last > 0 else ids
        else:
            doomed = [i for i in ids if i < before_batch_id]
        for i in doomed:
            shutil.rmtree(self._batch_dir(i))
        for e in os.scandir(self.out_dir):
            if e.is_dir() and e.name.startswith("_tmp_batch_"):
                shutil.rmtree(e.path)
        return doomed


class DeltaTxnSink:
    """``foreachBatch`` sink committing each micro-batch to a NATIVE
    delta-log table (sources/deltalog.py) with the protocol's ``txn``
    action — exactly-once the way real Delta streaming sinks do it:
    the (appId, batchId) transaction identifier rides in the SAME
    atomic commit as the data, and the dedup check runs inside the
    commit attempt against a freshly replayed snapshot, so a
    re-delivered batch (sink crash after commit, before the stream
    checkpoint advanced — or a zombie driver racing its replacement)
    is detected by ``batchId <= snapshot.txns[appId]`` and skipped. Unlike
    IdempotentParquetSink's dir-per-batch layout, readers get a real
    table: snapshot isolation, time travel, OPTIMIZE/VACUUM.

    Usage::

        sink = DeltaTxnSink(table_dir, app_id="events-ingest")
        stream.writeStream.foreachBatch(sink).option(
            "checkpointLocation", ckpt
        ).start()
    """

    def __init__(
        self,
        path: str,
        app_id: str,
        partition_by: list[str] | None = None,
    ):
        self.path = path
        self.app_id = app_id
        self.partition_by = partition_by
        self.skipped: list[int] = []  # replayed batchIds (observability)

    def last_committed(self) -> int | None:
        from value_at_risk_spark.sources.deltalog import (
            delta_versions,
            snapshot,
        )

        if not delta_versions(self.path):
            return None
        return (snapshot(self.path).txns or {}).get(self.app_id)

    #: a parquet checkpoint is written every N commits so log replay
    #: (and therefore per-batch commit cost) stays O(N), not O(total
    #: batches ever committed)
    checkpoint_every = 16

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        from value_at_risk_spark.sources.deltalog import (
            checkpoint_delta,
            write_delta,
        )

        # the txn dedup runs INSIDE write_delta's commit loop against a
        # fresh snapshot — a zombie writer racing a recovered one on the
        # same appId cannot double-commit (the loser re-reads and sees
        # the winner's txn); -1 = already committed, skip
        v = write_delta(
            batch_df.sparkSession,
            batch_df,
            self.path,
            mode="append",
            partition_by=self.partition_by,
            txn={"appId": self.app_id, "version": batch_id},
        )
        if v == -1:
            self.skipped.append(batch_id)
        elif v > 0 and v % self.checkpoint_every == 0:
            checkpoint_delta(self.path)

    def read(self, spark) -> DataFrame:
        from value_at_risk_spark.sources.deltalog import read_delta

        return read_delta(spark, self.path)


class DeltaMergeSink:
    """``foreachBatch`` sink UPSERTING each micro-batch into a native
    delta-log table via MERGE — the canonical streaming-CDC-into-delta
    pattern (stream of key-level changes, table holds current state),
    with the same exactly-once contract as DeltaTxnSink: the
    (appId, batchId) ``txn`` action rides in the SAME atomic commit as
    the merge, so a re-delivered batch is detected inside the commit
    attempt and skipped unwritten.

    ``matched`` / ``not_matched`` / ``not_matched_by_source`` are the
    clause lists of merge_into_delta_native; the default is the
    upsert-star form. With an ORDER-INDEPENDENT matched condition
    (e.g. ``s.ts > t.ts`` keep-the-latest), the final table state is a
    pure function of the event set — independent of how the stream was
    batched, which is what makes the result oracle-checkable.

    ``batch_prep`` (optional) reduces each micro-batch before the
    merge (e.g. latest-per-key within the batch) — REQUIRED when a
    batch may carry several rows per key, since MERGE semantics demand
    at most one source match and the engine's dedup pick is otherwise
    arbitrary. The first batch creates an EMPTY v0 and then merges
    through the same clause engine as every later batch, so
    conditional not_matched clauses apply uniformly regardless of
    which batch a row arrived in. Empty batches skip — except when
    ``not_matched_by_source`` clauses are configured, where an empty
    batch is still a full merge (every target row is
    by-source-unmatched: the snapshot-reconciliation shape)."""

    def __init__(
        self,
        path: str,
        keys: list[str],
        app_id: str,
        *,
        matched: list[dict] | None = None,
        not_matched: list[dict] | None = None,
        not_matched_by_source: list[dict] | None = None,
        batch_prep=None,
        partition_by: list[str] | None = None,
    ):
        self.path = path
        self.keys = list(keys)
        self.app_id = app_id
        self.matched = matched
        self.not_matched = not_matched
        self.not_matched_by_source = not_matched_by_source
        self.batch_prep = batch_prep
        self.partition_by = partition_by
        self.skipped: list[int] = []  # replayed batchIds (observability)

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        from value_at_risk_spark.operators.merge import (
            merge_into_delta_native,
        )
        from value_at_risk_spark.sources.deltalog import (
            delta_versions,
            write_delta,
        )

        if self.batch_prep is not None:
            batch_df = self.batch_prep(batch_df)
        exists = bool(delta_versions(self.path))
        if batch_df.isEmpty() and (
            not exists or not self.not_matched_by_source
        ):
            # nothing to merge; skipping without a txn commit is safe
            # (an empty re-delivery is idempotent by vacuity). With
            # not_matched_by_source clauses an empty batch is STILL a
            # merge — every target row is by-source-unmatched (the
            # full-snapshot-reconciliation shape), so fall through.
            return
        txn = {"appId": self.app_id, "version": batch_id}
        if not exists:
            # create an EMPTY v0 first so batch rows go through the
            # SAME clause engine as every later batch — a blind first
            # append would bypass conditional not_matched clauses and
            # make the final state depend on batch boundaries. A crash
            # between create and merge is safe: the empty table simply
            # merges the re-delivered batch.
            write_delta(
                batch_df.sparkSession,
                batch_df.limit(0),
                self.path,
                mode="append",
                partition_by=self.partition_by,
            )
        v = merge_into_delta_native(
            batch_df.sparkSession,
            self.path,
            batch_df,
            self.keys,
            matched=self.matched,
            not_matched=self.not_matched,
            not_matched_by_source=self.not_matched_by_source,
            txn=txn,
        )
        if v == -1:
            self.skipped.append(batch_id)

    def read(self, spark) -> DataFrame:
        from value_at_risk_spark.sources.deltalog import read_delta

        return read_delta(spark, self.path)
