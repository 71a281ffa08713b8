"""Text-analysis column expressions (north-star surface, BASELINE.json).

Not present in the reference (its string surface is equality only —
SURVEY §2.8 "Not present"); these are the engine's training-data-
pipeline additions: tokenization, quality scoring, language-ID
heuristics, token counting. All pure Catalyst expressions — at 100 TB
these run inside whole-stage codegen with zero Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# A small, fixed English-stopword list (deterministic; mirrored in the
# DuckDB oracle SQL verbatim).
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")

# Word-ish tokens: runs of lowercase alphanumerics.
TOKEN_PATTERN = "[a-z0-9]+"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization of lowercased text, empty strings removed."""
    return F.filter(F.split(F.lower(_c(text)), r"\s+"), lambda t: t != "")


def token_count(text: Column | str) -> Column:
    """Whitespace token count."""
    return F.size(tokens(text))


def regex_token_count(text: Column | str, pattern: str = TOKEN_PATTERN) -> Column:
    """BPE-ish token proxy: count of regex token matches (JVM-side)."""
    return F.regexp_count(F.lower(_c(text)), F.lit(pattern))


def distinct_token_count(text: Column | str) -> Column:
    return F.size(F.array_distinct(tokens(text)))


def stopword_ratio(text: Column | str) -> Column:
    """Fraction of tokens that are stopwords — a classic quality signal."""
    toks = tokens(text)
    sw = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return n_stop / F.greatest(F.size(toks), F.lit(1))


def avg_token_length(text: Column | str) -> Column:
    toks = tokens(text)
    total = F.aggregate(
        F.transform(toks, lambda t: F.length(t).cast("double")),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    return total / F.greatest(F.size(toks), F.lit(1))


def quality_score(text: Column | str, rounded: bool = True) -> Column:
    """Deterministic [0,1] quality heuristic: length band + stopword
    presence + type/token ratio. A stand-in for trained quality
    classifiers in LLM data pipelines.

    ``rounded=False`` returns the raw double — use it when the score
    feeds a threshold predicate that must agree bit-for-bit with an
    unrounded oracle filter."""
    n = token_count(text)
    ttr = distinct_token_count(text) / F.greatest(n, F.lit(1))
    length_ok = F.when((n >= 10) & (n <= 10_000), F.lit(1.0)).otherwise(F.lit(0.0))
    sw = stopword_ratio(text)
    sw_ok = F.when((sw >= 0.05) & (sw <= 0.6), F.lit(1.0)).otherwise(F.lit(0.0))
    raw = (length_ok + sw_ok + ttr) / F.lit(3.0)
    return F.round(raw, 6) if rounded else raw


def gopher_quality_flags(text: Column | str) -> Column:
    """The published Gopher document-quality rule set (Rae et al. 2021,
    "Scaling Language Models: ... Gopher", Appendix A — the same rules
    FineWeb/Dolma ship) as one struct of booleans, all pure Catalyst
    expressions:

    - ``word_count_ok``     50 <= words <= 100,000
    - ``mean_word_len_ok``  3 <= mean word length <= 10
    - ``symbol_ratio_ok``   ('#' + '...') per word <= 0.1
    - ``alpha_ratio_ok``    >= 80% of words contain an alphabetic char
    - ``stopwords_ok``      >= 2 distinct stopwords present

    The line-based Gopher rules (bullet/ellipsis line starts) are
    omitted: the ``documents`` fixture is single-line. A keep decision
    is the conjunction; pipelines also read the individual flags to
    attribute WHY a document was dropped (the per-rule failure mix is
    the tuning signal at 100 TB).
    """
    t = F.lower(_c(text))
    toks = tokens(t)
    n = F.size(toks)
    nd = F.greatest(n, F.lit(1))
    mean_len = avg_token_length(t)
    hash_cnt = F.length(t) - F.length(F.replace(t, F.lit("#"), F.lit("")))
    ellipsis_cnt = (
        F.length(t) - F.length(F.replace(t, F.lit("..."), F.lit("")))
    ) / F.lit(3)
    symbol_ratio = (hash_cnt + ellipsis_cnt) / nd
    alpha_frac = F.size(F.filter(toks, lambda x: x.rlike("[a-z]"))) / nd
    sw = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop_distinct = F.size(F.array_intersect(F.array_distinct(toks), sw))
    return F.struct(
        ((n >= 50) & (n <= 100_000)).alias("word_count_ok"),
        ((mean_len >= 3.0) & (mean_len <= 10.0)).alias("mean_word_len_ok"),
        (symbol_ratio <= 0.1).alias("symbol_ratio_ok"),
        (alpha_frac >= 0.8).alias("alpha_ratio_ok"),
        (n_stop_distinct >= 2).alias("stopwords_ok"),
    )


def shingles(text: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles as strings (dedup fingerprint input).

    The token array is LET-BOUND through a one-element-array transform
    before the per-position lambda uses it (r16, guide §4): a HOF
    lambda re-evaluates every non-bound subexpression per element, so
    referencing ``tokens(text)`` (a regex split of the whole document)
    directly inside the position lambda costs O(tokens²) regex work
    per doc — measured 4.1 s → 0.45 s on the sf0.1 corpus for the bare
    shingle projection, bit-identical output. A lambda-bound variable
    is a BoundReference (O(1) per use); the outer transform's input
    array is evaluated once per row.
    """
    return F.flatten(
        F.transform(
            F.array(tokens(text)),
            lambda ts: F.transform(
                F.sequence(
                    F.lit(1), F.greatest(F.size(ts) - (n - 1), F.lit(1))
                ),
                lambda i: F.concat_ws(" ", F.slice(ts, i, n)),
            ),
        )
    )


def chunk_tokens(
    text: Column | str, chunk_size: int = 64, overlap: int = 16
) -> Column:
    """Split text into overlapping token-window chunks (LLM training-
    data prep: fixed-size context chunks with stride = size − overlap).

    Returns array<struct<chunk_id:int, chunk:string>> built entirely
    with higher-order functions — per-row, shuffle-free, linear in
    tokens. Chunk i covers tokens [i·stride+1, i·stride+chunk_size];
    the last chunk may be shorter; a doc shorter than chunk_size yields
    exactly one chunk.
    """
    if overlap >= chunk_size:
        raise ValueError("chunk_tokens: overlap must be < chunk_size")
    stride = chunk_size - overlap

    # token array let-bound via a one-element-array transform (r16):
    # same O(tokens²)-lambda hazard and fix as ``shingles``
    def _chunks(ts: Column) -> Column:
        n_chunks = F.greatest(
            F.ceil((F.size(ts) - F.lit(overlap)) / F.lit(stride)).cast(
                "int"
            ),
            F.lit(1),
        )
        return F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.struct(
                i.cast("int").alias("chunk_id"),
                F.concat_ws(
                    " ", F.slice(ts, i * stride + 1, chunk_size)
                ).alias("chunk"),
            ),
        )

    return F.flatten(F.transform(F.array(tokens(text)), _chunks))


# Gopher repetition thresholds (Rae et al. 2021, Appendix A): max
# share of characters in the single most frequent word n-gram
# (n = 2..4) and in ALL duplicated word n-grams (n = 5..10).
REPETITION_TOP_THRESHOLDS = {2: 0.20, 3: 0.18, 4: 0.16}
REPETITION_DUP_THRESHOLDS = {5: 0.15, 6: 0.14, 7: 0.13, 8: 0.12,
                             9: 0.11, 10: 0.10}


def repetition_signals(
    docs,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Per-document Gopher REPETITION signals (Rae et al. 2021 App. A
    — the n-gram half of the rule set; the line-based half needs
    multi-line documents): for n = 2..4 the character share of the
    single most frequent word n-gram, for n = 5..10 the character
    share of all DUPLICATED word n-grams. Character mass of a gram =
    its length excluding separator spaces; denominator = total token
    characters. Every quantity is an integer ratio evaluated as ONE
    double division of identical integers in any engine — bit-exact
    cross-engine, no rounding contract needed for the flags.

    Shape: the raw documents are hash-repartitioned by id FIRST (the
    only full-width shuffle: ~1x corpus bytes), then one explode
    emits all 9 gram sizes in one pass (~9 rows per token), one
    (doc, n, gram) hash-agg counts, and ONE per-(doc, n) conditional
    aggregate computes both the top-gram and the duplicated-mass
    signal before the per-doc pivot. Every grouping key set contains
    the doc id, so all of it runs exchange-free on the id
    partitioning — without the up-front repartition the (doc, n,
    gram) agg would shuffle the exploded gram STRINGS instead
    (Σ n = 54x the corpus's token characters for n=2..10), the
    engine's largest row-amplification shuffle. Ties for the top gram
    break to the lexicographically smallest. Docs with fewer than n
    tokens have no n-grams: their share is 0 (rule passes trivially).

    Returns (id_col, top2_share..top4_share, dup5_share..dup10_share,
    repetition_ok) with shares rounded to 6 decimals for display; the
    ``repetition_ok`` flag is computed from the UNROUNDED ratios
    against REPETITION_*_THRESHOLDS.
    """
    from pyspark.sql import functions as F

    ns_top = sorted(REPETITION_TOP_THRESHOLDS)
    ns_dup = sorted(REPETITION_DUP_THRESHOLDS)
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != ""
    )
    # The up-front id repartition is UNCONDITIONAL (it replaces the
    # Σn = 54× gram-string shuffle — see the docstring), but when the
    # input is single-split the partition count must be pinned
    # explicitly: AQE's coalescer has a 1 MB minPartitionSize floor,
    # so a count-less repartition of a kilobyte-scale corpus collapses
    # right back to ONE post-shuffle partition and the whole 9-gram
    # explode+agg runs on one task (r16; measured 5.5 s vs 2.4 s at
    # sf0.1). On a parallel scan the count-less form stands and AQE
    # right-sizes it.
    try:
        _pin = (
            docs.rdd.getNumPartitions()
            < docs.sparkSession.sparkContext.defaultParallelism
        )
    except Exception:  # pragma: no cover — never sink the caller
        _pin = False
    _projected = docs.select(
        F.col(id_col).alias("_id"),
        toks.alias("_ts"),
    )
    base = (
        _projected.repartition(
            docs.sparkSession.sparkContext.defaultParallelism, "_id"
        )
        if _pin
        else _projected.repartition("_id")
    ).select(
        "_id",
        "_ts",
        F.aggregate(
            F.transform("_ts", lambda t: F.length(t)),
            F.lit(0),
            lambda a, x: a + x,
        ).alias("_total"),
    )
    # sequence(1, 0) DESCENDS in Spark (emitting slice start 0), so a
    # doc with fewer than n tokens must short-circuit to an empty
    # array. The per-n lambda comes from a factory, NOT a `n=n`
    # default arg: F.transform introspects the lambda's arity and a
    # two-parameter signature is the (element, index) form — the
    # default arg would silently receive the array INDEX.
    def _gram_struct(n: int):
        return lambda i: F.struct(
            F.lit(n).alias("n"),
            F.concat_ws(" ", F.slice("_ts", i, n)).alias("gram"),
        )

    gram_arrays = [
        F.when(
            F.size("_ts") >= n,
            F.transform(
                F.sequence(F.lit(1), F.size("_ts") - (n - 1)),
                _gram_struct(n),
            ),
        ).otherwise(
            F.array().cast("array<struct<n:int,gram:string>>")
        )
        for n in ns_top + ns_dup
    ]
    grams = base.select(
        "_id",
        "_total",
        F.explode(F.flatten(F.array(*gram_arrays))).alias("_g"),
    ).select(
        "_id",
        "_total",
        F.col("_g.n").alias("_n"),
        F.col("_g.gram").alias("_gram"),
    )
    cnt = grams.groupBy("_id", "_total", "_n", "_gram").agg(
        F.count(F.lit(1)).alias("_cnt")
    ).withColumn(
        "_mass",
        F.col("_cnt")
        * F.length(F.replace(F.col("_gram"), F.lit(" "), F.lit(""))),
    )
    # ONE conditional pass over the (doc, n, gram) counts computes both
    # signal kinds — the former two-branch form (top-filter + dup-filter
    # unioned) re-executed the whole explode+count subtree once per
    # branch. A dup-n group whose grams are all singletons sums to NULL,
    # exactly matching the row the dup branch used to drop (the per-doc
    # pivot coalesces both to 0.0).
    long = (
        cnt.groupBy("_id", "_total", "_n")
        .agg(
            F.min(
                F.struct(
                    (-F.col("_cnt")).alias("nc"),
                    F.col("_gram").alias("g"),
                    F.col("_mass").alias("m"),
                )
            ).alias("_w"),
            F.sum(F.when(F.col("_cnt") >= 2, F.col("_mass"))).alias("_dm"),
        )
        .select(
            "_id",
            "_n",
            (
                F.when(F.col("_n").isin(ns_top), F.col("_w.m")).otherwise(
                    F.col("_dm")
                )
                / F.greatest("_total", F.lit(1))
            ).alias("_share"),
        )
    )
    wide = long.groupBy("_id").agg(
        *[
            F.coalesce(
                F.max(F.when(F.col("_n") == n, F.col("_share"))), F.lit(0.0)
            ).alias(f"_s{n}")
            for n in ns_top + ns_dup
        ]
    )
    ok = None
    for n in ns_top:
        c = F.col(f"_s{n}") <= REPETITION_TOP_THRESHOLDS[n]
        ok = c if ok is None else (ok & c)
    for n in ns_dup:
        c = F.col(f"_s{n}") <= REPETITION_DUP_THRESHOLDS[n]
        ok = ok & c
    out_cols = [
        (F.round(F.col(f"_s{n}"), 6) + F.lit(0.0)).alias(
            f"top{n}_share" if n in REPETITION_TOP_THRESHOLDS
            else f"dup{n}_share"
        )
        for n in ns_top + ns_dup
    ]
    # LEFT join back so zero-token docs keep a row (all shares 0, ok)
    return (
        docs.select(F.col(id_col))
        .join(wide.withColumnRenamed("_id", id_col), id_col, "left")
        .select(
            id_col,
            *[
                F.coalesce(c, F.lit(0.0)).alias(a)
                for c, a in zip(
                    out_cols,
                    [
                        f"top{n}_share" if n in REPETITION_TOP_THRESHOLDS
                        else f"dup{n}_share"
                        for n in ns_top + ns_dup
                    ],
                )
            ],
            F.coalesce(ok, F.lit(True)).alias("repetition_ok"),
        )
    )
