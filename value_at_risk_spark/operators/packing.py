"""Sequence packing — the token-budget bin-packing pass of an LLM
training-data pipeline (between chunking and batch assembly).

Greedy next-fit packing is inherently sequential (the running token
total resets when a document would overflow the budget), so it cannot
be expressed as a window function. The distributed form used here is
the standard one at corpus scale:

1. shard documents into ``buckets`` deterministic hash buckets — ONE
   shuffle, keyed on the bucket id;
2. pack each bucket independently with a sequential next-fit pass in
   an Arrow-batched ``applyInPandas`` (state: one running counter);
3. a sequence is identified by (bucket, seq_in_bucket) — stable and
   reproducible because the within-bucket order is the sort on the id
   column, not arrival order.

Guarantees (pytest-asserted in tests/test_operators.py):
- every input row appears in exactly one sequence;
- no sequence's token sum exceeds ``max_tokens`` unless it holds a
  single oversize document (emitted alone, ``oversize = true``);
- next-fit is a 2-approximation, so per bucket
  ``n_seqs <= ceil(2 * bucket_tokens / max_tokens) + 1``;
- output is invariant under input repartitioning (determinism).

At 100 TB: buckets scale with cluster width (each packs in O(rows) with
O(1) state); packing quality is per-bucket next-fit regardless of
bucket count. Cross-bucket waste is at most one underfull sequence per
bucket — bounded by ``buckets * max_tokens`` tokens total, negligible
against a corpus that fills millions of sequences.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def pack_sequences(
    docs: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    max_tokens: int = 2048,
    buckets: int = 256,
    bucket_by=None,
) -> DataFrame:
    """Assign each document to a packed sequence.

    Returns (id_col, bucket, seq_in_bucket, seq_tokens_so_far,
    oversize): one row per input document, where (bucket,
    seq_in_bucket) names the packed sequence.

    ``bucket_by``: optional Column for the bucket id (must land in
    [0, buckets)). Default is ``abs(xxhash64(id)) % buckets`` — the
    fastest JVM-side hash. Pass an md5-derived expression when the
    assignment must be reproducible in another engine (the oracle-
    checked gate query does; DuckDB has no xxhash64).
    """
    if max_tokens <= 0:
        raise ValueError("pack_sequences: max_tokens must be positive")

    schema = (
        f"{id_col} long, bucket int, seq_in_bucket long, "
        "seq_tokens_so_far long, oversize boolean"
    )

    # Whole-group form, NOT the Iterator[pd.DataFrame] chunked form: the
    # iterator variant hands a large group over as one chunk per Arrow
    # batch (spark.sql.execution.arrow.maxRecordsPerBatch, default 10k
    # rows), and next-fit state (seq counter, running total, the
    # within-bucket sort) must span the whole bucket — per-chunk resets
    # would emit duplicate (bucket, seq_in_bucket) ids and chunk-
    # boundary-dependent output. Memory is bounded by bucket size:
    # `buckets` scales with corpus width, keeping each bucket's rows
    # O(corpus / buckets), and each row is two scalars.
    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="mergesort")
        ids = pdf[id_col].to_numpy()
        toks = pdf[tokens_col].to_numpy()
        bkt = int(pdf["_bucket"].iloc[0]) if len(pdf) else 0
        seq_ids, running, oversize = [], [], []
        seq, acc = 0, 0
        for t in toks:
            t = int(t)
            if t > max_tokens:
                # oversize doc: its own (flagged) sequence
                if acc > 0:
                    seq += 1
                seq_ids.append(seq)
                running.append(t)
                oversize.append(True)
                seq += 1
                acc = 0
                continue
            if acc + t > max_tokens:
                seq += 1
                acc = 0
            acc += t
            seq_ids.append(seq)
            running.append(acc)
            oversize.append(False)
        return pd.DataFrame(
            {
                id_col: ids,
                "bucket": bkt,
                "seq_in_bucket": seq_ids,
                "seq_tokens_so_far": running,
                "oversize": oversize,
            }
        )

    if bucket_by is None:
        bucket_by = F.abs(F.xxhash64(F.col(id_col))) % buckets
    bucketed = docs.select(
        F.col(id_col), F.col(tokens_col),
        bucket_by.cast("int").alias("_bucket"),
    )
    return bucketed.groupBy("_bucket").applyInPandas(_pack, schema=schema)


def packing_stats(packed: DataFrame, max_tokens: int) -> DataFrame:
    """Corpus-level packing summary: sequences, fill rate, oversizes."""
    per_seq = packed.groupBy("bucket", "seq_in_bucket").agg(
        F.max("seq_tokens_so_far").alias("seq_tokens"),
        F.max(F.col("oversize").cast("int")).alias("has_oversize"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    return per_seq.groupBy().agg(
        F.count(F.lit(1)).alias("n_sequences"),
        F.sum("n_docs").alias("n_docs"),
        F.round(
            F.avg(
                F.when(F.col("has_oversize") == 0, F.col("seq_tokens"))
                / max_tokens
            ),
            4,
        ).alias("avg_fill"),
        F.sum("has_oversize").alias("n_oversize_seqs"),
    )


def balanced_shards(
    df: DataFrame,
    n_shards: int,
    weight_col: str,
    id_col: str = "doc_id",
    boundaries: list[float] | None = None,
) -> DataFrame:
    """Deterministic balanced shard assignment (the export step of a
    training-data pipeline: N shard files with near-equal token mass).
    Longest-first round-robin: rank rows by (weight desc, id asc),
    shard = (rank − 1) mod N — the classic LPT approximation.

    The rank is computed with the DISTRIBUTED two-phase global rank
    (ranks.global_row_number) — value-bucketed local windows plus a
    broadcast bucket-offset join — NOT a global unpartitioned window
    (a single serial task at 100 TB), and NOT a per-weight histogram
    collected to the driver (distinct token counts are effectively
    unbounded on real corpora, so a plan-literal offset map and the
    collect feeding it grow with weight cardinality — the r14 ADVICE
    hazard this replaced). Ties share a bucket (strict boundary
    comparison), so rank is identical to the naive global ROW_NUMBER
    over (weight desc, id asc) by construction, which is what lets a
    SQL oracle replay it with the single-window form.

    Reproducibility contract: with ``boundaries`` supplied (any sorted
    list of weight values — balance is the caller's problem, ranks are
    exact under ANY boundary set), the plan contains no boundary
    aggregate and the result is exactly reproducible under any
    partitioning on any cluster. With ``boundaries=None`` the bucket
    boundaries come from a lazily-checkpointed ``percentile_approx``,
    which is airtight in local/single-executor mode but carries the
    multi-executor first-compute race documented in
    ranks._with_value_bucket — a cluster export job that must be
    bit-reproducible should pass precomputed boundaries (e.g. an
    up-front ``df.approxQuantile(weight_col, ...)``).

    Raises on empty input (an empty export manifest is a pipeline bug
    upstream, not a zero-shard fact to propagate silently).

    Returns df's (id_col, weight_col) plus ``shard`` (0-based int)."""
    from value_at_risk_spark.operators.ranks import global_row_number

    base = df.select(
        F.col(id_col).alias("_id"),
        F.col(weight_col).cast("long").alias("_w"),
    )
    if base.isEmpty():
        raise ValueError("balanced_shards: empty input")
    ranked = global_row_number(
        base,
        [("_w", False), ("_id", True)],
        out="_rank",
        boundaries=boundaries,
    )
    return ranked.select(
        F.col("_id").alias(id_col),
        F.col("_w").alias(weight_col),
        F.pmod(F.col("_rank") - 1, F.lit(n_shards)).cast("int").alias("shard"),
    )
