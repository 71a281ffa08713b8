"""Streaming maintenance of the sparse TF-IDF near-duplicate pair
table — SURVEY §2.9 extension; batch twin: operators/dedup.
tfidf_cosine_pairs (r16, VERDICT #6: the postings-join near-dup leg
wired into the same versioned foreachBatch pattern as streaming/knn).

Incremental shape (dedup.tfidf_postings / tfidf_pairs_from_postings):

- POSTINGS are additive: each arriving document batch pays
  tokenization + its per-(doc, token) tf hash-agg ONCE and commits to
  ``postings/batch_id=N`` — the per-batch linear work;
- PAIRS are full-state per version: smoothed IDF weights depend on
  the GLOBAL (n_docs, df), so a new batch shifts every weight — the
  pair stage re-runs over the ACCUMULATED postings (never re-reading
  or re-tokenizing raw text) and commits the complete updated table
  to ``pairs/batch_id=N``. Candidate volume stays the operator's
  Σ_t min(df_t, df_cap)² bound per refresh.

Exactly-once rides the same versioned-commit recipe as the kNN
maintenance sink: both halves key on Spark's stable batchId, a
replayed batch recomputes the same deterministic table and is skipped
by the commit marker, and readers take only the highest committed
version. Because the pair stage is literally the batch operator's
stage-2 over the union of committed postings, replaying every batch
and then reading ``current_pairs`` equals ``tfidf_cosine_pairs`` over
the full corpus BIT-FOR-BIT (pinned by
tests/test_streaming.test_incremental_tfidf_stream_matches_batch).

STORAGE CONTRACT: same local/POSIX-rename requirement as
streaming/knn.KnnMaintenanceSink — on object storage the state dirs
belong behind the engine's delta sink (txn actions give the same
skip-if-committed semantics).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from value_at_risk_spark.streaming.sinks import IdempotentParquetSink

_PAIRS_SCHEMA = T.StructType(
    [
        T.StructField("id_a", T.LongType()),
        T.StructField("id_b", T.LongType()),
        T.StructField("cosine", T.DoubleType()),
    ]
)


class TfidfDedupSink:
    """foreachBatch callable maintaining the near-dup pair table.

    State layout under ``state_dir``::

        postings/batch_id=N/   (_id, _t, _tf) rows of batch N
        pairs/batch_id=N/      full pair table AFTER applying batch N
    """

    def __init__(
        self,
        state_dir: str,
        threshold: float = 0.5,
        df_cap: int = 50,
        id_col: str = "doc_id",
        text_col: str = "text",
    ):
        self.state_dir = state_dir
        self.threshold = threshold
        self.df_cap = df_cap
        self.id_col = id_col
        self.text_col = text_col
        self.postings_sink = IdempotentParquetSink(
            os.path.join(state_dir, "postings")
        )
        self.pairs_sink = IdempotentParquetSink(
            os.path.join(state_dir, "pairs")
        )

    def _latest_version(self) -> int | None:
        versions = [
            int(d.split("=", 1)[1])
            for d in os.listdir(self.pairs_sink.out_dir)
            if d.startswith("batch_id=")
        ]
        return max(versions) if versions else None

    def current_pairs(self, spark: SparkSession) -> DataFrame:
        """The maintained artifact at its highest committed version."""
        v = self._latest_version()
        if v is None:
            return spark.createDataFrame([], _PAIRS_SCHEMA)
        return spark.read.parquet(
            os.path.join(self.pairs_sink.out_dir, f"batch_id={v}")
        )

    def _all_postings(self, spark: SparkSession) -> DataFrame | None:
        base = self.postings_sink.out_dir
        if not any(d.startswith("batch_id=") for d in os.listdir(base)):
            return None
        return spark.read.parquet(base).select("_id", "_t", "_tf")

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        from value_at_risk_spark.operators.dedup import (
            tfidf_pairs_from_postings,
            tfidf_postings,
        )

        spark = batch_df.sparkSession
        if self.pairs_sink.committed(batch_id):
            # replayed delivery after the pair version committed: just
            # finish the possibly-missing postings half (skip-if-
            # committed there too)
            self.pairs_sink.skipped.append(batch_id)
            self.postings_sink(
                tfidf_postings(batch_df, self.id_col, self.text_col),
                batch_id,
            )
            return
        # commit ORDER (same crash-recovery argument as streaming/knn):
        # the derived pair version lands first, the postings part last.
        # A crash between the two replays the batch against the OLD
        # accumulated postings — the pair sink skips (already
        # committed), then the postings half commits. The reverse
        # order would double-count the batch's own postings on replay.
        new_postings = tfidf_postings(batch_df, self.id_col, self.text_col)
        old = self._all_postings(spark)
        tf = (
            new_postings
            if old is None
            else old.unionByName(new_postings)
        )
        # re-agg: a document delivered across two batches (or a source
        # that re-chunks) must merge its tf rows before df counting,
        # exactly as the batch operator's single groupBy would
        tf = tf.groupBy("_id", "_t").agg(F.sum("_tf").alias("_tf"))
        n_docs = tf.select("_id").distinct().count()
        pairs = tfidf_pairs_from_postings(
            tf,
            n_docs,
            threshold=self.threshold,
            df_cap=self.df_cap,
        )
        self.pairs_sink(pairs.select("id_a", "id_b", "cosine"), batch_id)
        self.postings_sink(new_postings, batch_id)


def start_incremental_tfidf(
    docs_stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    threshold: float = 0.5,
    df_cap: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
    available_now: bool = True,
):
    """Run the maintenance query over a documents stream. Returns
    (StreamingQuery, TfidfDedupSink)."""
    sink = TfidfDedupSink(
        state_dir,
        threshold=threshold,
        df_cap=df_cap,
        id_col=id_col,
        text_col=text_col,
    )
    writer = docs_stream.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start(), sink
