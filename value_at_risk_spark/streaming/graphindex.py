"""Exactly-once STREAMING ingest for the persisted IVF graph index —
SURVEY §2.9 extension; batch twin: operators/annindex.
append_to_ivf_graph_index.

The plain append path writes straight into the cell-partitioned
vector table, which is correct for a driver-invoked batch job but NOT
replay-safe under foreachBatch's at-least-once delivery: a redelivered
batch would double-append its vectors. This sink gives the graph
index the same versioned-commit recipe the kNN and TF-IDF maintenance
sinks use:

- each arriving batch assigns cells against the FROZEN centroids
  (similarity.assign_cells_arrow — zero training, one scan) and
  commits to ``ann_vectors_inc/batch_id=N`` through an
  IdempotentParquetSink (atomic rename, skip-if-committed);
- ``annindex.load_ivf_graph_index`` unions the committed increments
  with the cell-partitioned base table, so searches and graph builds
  see streamed vectors immediately;
- ``annindex.compact_graph_index`` folds the increments into the base
  layout with a staging full-rewrite + atomic swap (the OPTIMIZE-style
  maintenance arm): a crash mid-compaction leaves either the old
  base + increments (nothing lost) or the new base with the increment
  dirs removed — never duplicates.

STORAGE CONTRACT: local/POSIX-rename filesystem, same as the sibling
sinks; on object storage the state belongs behind the engine's delta
sink (txn actions).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from value_at_risk_spark.streaming.sinks import IdempotentParquetSink

INC_DIR = "ann_vectors_inc"


class GraphIndexAppendSink:
    """foreachBatch callable streaming embeddings into a prebuilt
    graph index (frozen coarse structure; drift is the retrain
    signal, exactly as for the batch append path)."""

    def __init__(
        self,
        base_dir: str,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ):
        self.base_dir = base_dir
        self.id_col = id_col
        self.vec_col = vec_col
        self.inc_sink = IdempotentParquetSink(
            os.path.join(base_dir, INC_DIR)
        )
        self._cents = None  # frozen; loaded once per sink

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        from value_at_risk_spark.operators.annindex import (
            load_ivf_graph_index,
        )
        from value_at_risk_spark.operators.similarity import (
            assign_cells_arrow,
        )

        if self.inc_sink.committed(batch_id):
            self.inc_sink.skipped.append(batch_id)
            return
        if self._cents is None:
            self._cents, _ = load_ivf_graph_index(
                batch_df.sparkSession, self.base_dir
            )
        base = batch_df.select(
            F.col(self.id_col).cast("long").alias("_id"),
            F.col(self.vec_col).cast("array<double>").alias("_v"),
        )
        assigned = assign_cells_arrow(base, self._cents).select(
            F.col("_id").alias(self.id_col),
            F.col("_v").alias(self.vec_col),
            "_cell",
        )
        self.inc_sink(assigned, batch_id)


def start_graph_index_ingest(
    embeddings_stream: DataFrame,
    base_dir: str,
    checkpoint_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    available_now: bool = True,
):
    """Run the ingest query over an embeddings stream against an
    EXISTING index (build_ivf_graph_index first). Returns
    (StreamingQuery, GraphIndexAppendSink)."""
    sink = GraphIndexAppendSink(base_dir, id_col=id_col, vec_col=vec_col)
    writer = embeddings_stream.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start(), sink
