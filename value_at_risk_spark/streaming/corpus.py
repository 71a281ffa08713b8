"""Incremental corpus statistics — streaming maintenance of the
curation tables (SURVEY §2.9 extension; batch twin: queries.
source_mix_report).

A daily crawl doesn't recompute corpus composition from scratch: each
arriving batch contributes its per-(source, lang) doc/token partials,
and the mix table is the SUM of all committed partials. Exactly-once
matters — a replayed batch that double-counted its partials would
silently skew every sampling weight downstream — so partials commit
through IdempotentParquetSink (batchId-keyed, skip-if-committed), and
the read side is one small aggregate over the committed partials.

The partials are ADDITIVE (counts and sums), which is what makes the
incremental form equal the batch recompute exactly — the same
mergeability contract as cms_build/mg_candidates. Non-additive stats
(quantiles, distinct counts) would ride a mergeable sketch instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from value_at_risk_spark.streaming.sinks import IdempotentParquetSink


def corpus_batch_partials(batch: DataFrame) -> DataFrame:
    """Per-(source, lang) additive partials for one document batch."""
    from value_at_risk_spark.functions.text import tokens

    return (
        batch.select(
            "source", "lang", F.size(tokens("text")).alias("n_toks")
        )
        .groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_toks").alias("n_tokens"),
        )
    )


def start_incremental_corpus_stats(
    docs_stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Run the maintenance query: each micro-batch reduces to its
    partials (kilobytes) and commits exactly-once. Returns
    (StreamingQuery, sink)."""
    sink = IdempotentParquetSink(out_dir)

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        sink(corpus_batch_partials(batch_df), batch_id)

    writer = docs_stream.writeStream.foreachBatch(_write).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start(), sink


def read_corpus_stats(spark: SparkSession, out_dir: str) -> DataFrame:
    """The current mix table: sum the committed partials — equal to
    the batch recompute over everything ingested so far."""
    sink = IdempotentParquetSink(out_dir)
    return (
        sink.read(spark)
        .groupBy("source", "lang")
        .agg(
            F.sum("n_docs").alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
        )
    )
