"""BPE tokenizer training — iterative byte-pair-merge induction
(Sennrich et al., ACL 2016) as a distributed loop.

The LLM-pipeline pillar the corpus operators feed: induce a merge
table from corpus statistics. The distributed shape exploits BPE's
word-locality — merges never cross word boundaries — so the working
set is the DISTINCT-WORD table with frequencies (Zipf: tiny relative
to the corpus), built by one corpus-wide reduction. Each merge round
is then:

1. one hash-agg over the word table: adjacent symbol pairs, weighted
   by word frequency, map-side combined;
2. ONE ROW to the driver (the argmax pair — ties broken by
   lexicographic pair order for run-to-run determinism);
3. a pure-projection rewrite of the symbol arrays (an ``F.aggregate``
   left-fold that greedily merges the chosen pair — exactly
   left-to-right greedy BPE), localCheckpointed to keep lineage flat
   across rounds.

Driver traffic is num_merges rows total; corpus bytes are touched
once. At 100 TB the word-frequency reduction is the only big shuffle
and everything after runs on the vocabulary table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def word_frequencies(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(word, freq) over the corpus — the one corpus-sized reduction."""
    from value_at_risk_spark.functions.text import tokens

    return (
        docs.select(F.explode(tokens(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _merge_pair_expr(col, a: str, b: str, joined: str):
    """Greedy left-to-right merge of adjacent (a, b) inside a symbol
    array: a left fold that either extends the accumulator or replaces
    its last element with the merged symbol."""
    return F.aggregate(
        col,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(joined))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_train(
    docs: DataFrame,
    num_merges: int = 10,
    text_col: str = "text",
) -> list[tuple[str, str, int]]:
    """Induce ``num_merges`` BPE merges. Returns [(left, right,
    weighted_pair_count), ...] in merge order. Deterministic: ties on
    count break by lexicographic (left, right)."""
    words = word_frequencies(docs, text_col)
    seg = words.select(
        "freq", F.split("word", "").alias("sym")
    ).localCheckpoint()
    merges: list[tuple[str, str, int]] = []
    for _ in range(num_merges):
        pairs = seg.filter(F.size("sym") >= 2).select(
            "freq",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("sym") - 1),
                    lambda i: F.struct(
                        F.element_at("sym", i).alias("a"),
                        F.element_at("sym", i + 1).alias("b"),
                    ),
                )
            ).alias("p"),
        )
        top = (
            pairs.groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("freq").alias("n"))
            .orderBy(F.desc("n"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b, n = top[0].a, top[0].b, int(top[0].n)
        merges.append((a, b, n))
        seg = seg.select(
            "freq", _merge_pair_expr(F.col("sym"), a, b, a + b).alias("sym")
        )
        # Checkpoint every 3rd round, not every round: the eager
        # per-round materialization doubled the job count (12 argmax +
        # 12 checkpoint jobs), and at vocab size the driver/job floor —
        # not compute — dominates the round. In between, the next
        # round's pair-count job just re-executes <=2 pending
        # vocab-sized fold projections (same trade bpe_segment_words
        # already makes at stride 4).
        if len(merges) % 3 == 0:
            seg = seg.localCheckpoint()
    return merges


def bpe_merge_table(
    docs: DataFrame, num_merges: int = 10, text_col: str = "text"
) -> DataFrame:
    """The induced merge table as a DataFrame: (rank, left, right,
    pair_count) — what a tokenizer ships as its vocab artifact."""
    spark = docs.sparkSession
    merges = bpe_train(docs, num_merges=num_merges, text_col=text_col)
    rows = [(i + 1, a, b, n) for i, (a, b, n) in enumerate(merges)]
    return spark.createDataFrame(
        rows, "rank int, left string, right string, pair_count long"
    )


def bpe_segment_words(
    words: DataFrame,
    merges: list[tuple[str, str, int]] | list[tuple[str, str]],
    word_col: str = "word",
) -> DataFrame:
    """Apply a merge table to a word table: (word, sym array<string>).
    Merges apply in rank order, each a greedy left-to-right fold —
    identical semantics to training, so encoding the training corpus
    reproduces the training segmentation. Checkpointed every few
    merges to keep the fold-chain expression tree flat."""
    seg = words.select(word_col, F.split(word_col, "").alias("sym"))
    for idx, m in enumerate(merges):
        a, b = m[0], m[1]
        seg = seg.select(
            word_col, _merge_pair_expr(F.col("sym"), a, b, a + b).alias("sym")
        )
        if (idx + 1) % 4 == 0:
            seg = seg.localCheckpoint()
    return seg


def bpe_token_counts(
    docs: DataFrame,
    merges: list[tuple[str, str, int]] | list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document BPE token counts under a merge table: the corpus
    explodes to (doc, word), the segmentation JOINS IN from the
    distinct-word table (broadcast — the vocabulary is small relative
    to any corpus worth tokenizing), and a doc-keyed sum reduces.
    Output: (doc_id, n_words, n_bpe_tokens)."""
    from value_at_risk_spark.functions.text import tokens

    dw = docs.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("word")
    )
    seg = bpe_segment_words(dw.select("word").distinct(), merges)
    return (
        dw.join(F.broadcast(seg), "word")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum(F.size("sym")).cast("long").alias("n_bpe_tokens"),
        )
    )
