"""Streaming maintenance of the exact all-corpus top-k table —
SURVEY §2.9 extension; batch twin: operators/similarity.
knn_topk_incremental (its natural deployment: an embeddings stream
feeding the daily-ingest maintenance loop, VERDICT r14 #5).

Unlike the additive corpus-stats partials (streaming/corpus.py), the
kNN artifact is FULL-STATE per version: each micro-batch produces the
complete updated (query_id, neighbor_id, cosine, rank) table for the
corpus-so-far, in O(N·|batch|) work via the incremental merge — never
the O(N²) rebuild. Exactly-once therefore rides VERSIONED commits, not
additive ones:

- the arriving batch's vectors commit to ``corpus/batch_id=N``
  (IdempotentParquetSink: skip-if-committed, atomic rename);
- the updated top-k table commits to ``topk/batch_id=N`` through a
  second sink keyed on the SAME batchId — a replayed batch recomputes
  the same deterministic table (every stage is rounded/tie-broken) and
  is then skipped by the commit marker, so at-least-once redelivery
  can neither double-apply nor fork the artifact;
- the read side takes the HIGHEST committed version only.

At 100 TB the per-version table is large but the pattern is unchanged:
the versioned directory becomes a snapshot-committed table (e.g. the
engine's delta sink) and the incremental merge's shuffle volume stays
N·|batch|·k candidate rows.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from value_at_risk_spark.streaming.sinks import IdempotentParquetSink

_TOPK_SCHEMA = T.StructType(
    [
        T.StructField("query_id", T.LongType()),
        T.StructField("neighbor_id", T.LongType()),
        T.StructField("cosine", T.DoubleType()),
        T.StructField("rank", T.IntegerType()),
    ]
)


class KnnMaintenanceSink:
    """foreachBatch callable maintaining the exact top-k table.

    State layout under ``state_dir``::

        corpus/batch_id=N/   vectors ingested in batch N
        topk/batch_id=N/     full top-k table AFTER applying batch N

    STORAGE CONTRACT (ADVICE r15): version discovery and commit
    markers use ``os.listdir``/atomic ``os.rename`` via
    IdempotentParquetSink, which requires ``state_dir`` on a local or
    POSIX-rename filesystem (local disk, NFS). On object storage the
    state dir belongs behind a transactional table — the engine's own
    delta sink (sources/deltalog) provides the same skip-if-committed
    txn semantics via ``txn`` actions; this sink keeps the local-FS
    form so the maintenance loop is testable without a metastore.
    """

    def __init__(
        self,
        state_dir: str,
        k: int = 3,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ):
        self.state_dir = state_dir
        self.k = k
        self.id_col = id_col
        self.vec_col = vec_col
        self.corpus_sink = IdempotentParquetSink(
            os.path.join(state_dir, "corpus")
        )
        self.topk_sink = IdempotentParquetSink(
            os.path.join(state_dir, "topk")
        )

    def _latest_version(self) -> int | None:
        base = self.topk_sink.out_dir
        versions = [
            int(d.split("=", 1)[1])
            for d in os.listdir(base)
            if d.startswith("batch_id=")
        ]
        return max(versions) if versions else None

    def current_topk(self, spark: SparkSession) -> DataFrame:
        """The maintained artifact at its highest committed version."""
        v = self._latest_version()
        if v is None:
            return spark.createDataFrame([], _TOPK_SCHEMA)
        return spark.read.parquet(
            os.path.join(self.topk_sink.out_dir, f"batch_id={v}")
        )

    def current_corpus(self, spark: SparkSession) -> DataFrame | None:
        base = self.corpus_sink.out_dir
        if not any(d.startswith("batch_id=") for d in os.listdir(base)):
            return None
        return spark.read.parquet(base).select(self.id_col, self.vec_col)

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        from value_at_risk_spark.operators.similarity import (
            cosine_allpairs_topk_blocked,
            knn_topk_incremental,
        )

        spark = batch_df.sparkSession
        batch = batch_df.select(self.id_col, self.vec_col)
        if self.topk_sink.committed(batch_id):
            # replayed delivery after the top-k version committed: do
            # NOT recompute (current_topk already reads version N);
            # just finish the possibly-missing corpus part — its sink
            # skips if that half also committed
            self.topk_sink.skipped.append(batch_id)
            self.corpus_sink(batch, batch_id)
            return
        old_corpus = self.current_corpus(spark)
        if old_corpus is None:
            # bootstrap: the first batch's table IS the from-scratch
            # blocked top-k over the batch alone
            updated = cosine_allpairs_topk_blocked(
                batch, k=self.k, id_col=self.id_col, vec_col=self.vec_col
            )
        else:
            updated = knn_topk_incremental(
                self.current_topk(spark),
                old_corpus,
                batch,
                k=self.k,
                id_col=self.id_col,
                vec_col=self.vec_col,
            )
        # commit ORDER matters for crash-recovery: the top-k version
        # (the derived artifact) lands first, the corpus part last —
        # a crash between the two leaves topk/batch_id=N present but
        # corpus/batch_id=N absent; the replay recomputes from the
        # same inputs (old corpus unchanged) and the topk sink skips,
        # then the corpus part commits. The reverse order would make
        # the replay treat the batch's own vectors as OLD corpus.
        self.topk_sink(
            updated.select("query_id", "neighbor_id", "cosine", "rank"),
            batch_id,
        )
        self.corpus_sink(batch, batch_id)


def start_incremental_knn(
    embeddings_stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    available_now: bool = True,
):
    """Run the maintenance query over an embeddings stream. Returns
    (StreamingQuery, KnnMaintenanceSink)."""
    sink = KnnMaintenanceSink(
        state_dir, k=k, id_col=id_col, vec_col=vec_col
    )
    writer = embeddings_stream.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start(), sink
