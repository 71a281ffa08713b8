"""Distributed Bloom filter as a first-class DataFrame operator.

The 100 TB pattern this enables: decontamination / blocklist /
membership checks against a BOUNDED reference set (eval-suite n-grams,
banned URLs, known-duplicate fingerprints) over an unbounded training
corpus. Broadcasting the reference set as a hash relation costs
per-entry string storage and a hash-probe per row; a Bloom filter
compresses the same membership test to ~1.2 bytes/entry at 1 % false
positives, lives entirely inside whole-stage codegen (bit math on an
array<long> column — no join, no shuffle on the corpus side), and the
false positives are removed by an exact verify join that now probes
only the survivors. The final answer is EXACT; the bloom is purely a
candidate-pruning stage, the same contract as LSH banding in
operators/dedup.py.

Construction is fully distributed: k hash positions per element
(xxhash64 with per-probe seeds), one narrow aggregation whose shuffle
carries at most ``num_bits/64`` (word_index, or-mask) rows — kilobytes
— then a single-row dense ``array<long>`` bitmap assembled with
map_from_entries + transform. No element ever reaches the driver.

Reference intent: the reference's filtering surface (SURVEY §2.2) plus
the decontamination note at queries/text.py:decontaminate_training_docs —
"at 100 TB swap the broadcast for a bloom filter of the benchmark
grams and keep the same plan". This operator is that swap.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _shiftleft1(bits: Column) -> Column:
    """``1L << bits`` with a COLUMN shift amount (the Python
    ``F.shiftleft`` wrapper only accepts a literal count; the SQL
    function takes expressions for both operands)."""
    return F.call_function("shiftleft", F.lit(1).cast("long"), bits)


def _positions(value: Column, num_bits: int, num_hashes: int) -> list[Column]:
    """k bit positions for ``value``: pmod(xxhash64(value, seed_i), m).

    Seeding via a second literal hash input gives k independent hash
    functions from one xxhash64 kernel (the standard Kirsch-Mitzenmacher
    construction would also do; k distinct seeds is simpler and equally
    codegen-friendly).
    """
    return [
        F.pmod(F.xxhash64(value, F.lit(i)), F.lit(num_bits))
        for i in range(num_hashes)
    ]


def build_bloom(
    df: DataFrame,
    col: str,
    num_bits: int = 1 << 17,
    num_hashes: int = 3,
    out_col: str = "bloom",
) -> DataFrame:
    """Build a Bloom filter over ``df[col]`` as a ONE-ROW DataFrame with
    a dense ``array<long>`` bitmap column ``out_col`` (length
    ``num_bits/64``), suitable for ``F.broadcast(...).crossJoin``.

    Plan shape: explode each element to its k (word_index, bit) pairs,
    ``bit_or`` the per-word masks (partial aggregation map-side, so the
    shuffle carries ≤ num_bits/64 rows TOTAL regardless of input size),
    then densify the sparse word list into a fixed-length array in a
    single projection. Size the filter with ~10 bits/element for ≈1 %
    false positives at k=3.
    """
    if num_bits % 64 != 0:
        raise ValueError("num_bits must be a multiple of 64")
    num_words = num_bits // 64
    pos = df.select(
        F.explode(F.array(*_positions(F.col(col), num_bits, num_hashes))).alias(
            "_pos"
        )
    )
    words = pos.select(
        (F.col("_pos") / 64).cast("int").alias("_w"),
        _shiftleft1((F.col("_pos") % 64).cast("int")).alias("_m"),
    ).groupBy("_w").agg(F.bit_or("_m").alias("_mask"))
    # densify: one row, map lookup per word index (num_words² work on
    # exactly one row — microseconds for any sane filter size)
    return words.groupBy().agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("_w", "_mask")))
        ).alias("_sparse")
    ).select(
        F.transform(
            F.sequence(F.lit(0), F.lit(num_words - 1)),
            # try_element_at: a word no element hashed into is simply
            # absent from the map — ANSI element_at would raise on the
            # missing key, and the filter must densify it to 0L
            lambda i: F.coalesce(
                F.try_element_at(F.col("_sparse"), i.cast("int")),
                F.lit(0).cast("long"),
            ),
        ).alias(out_col)
    )


def bloom_contains(
    bitmap: Column | str,
    value: Column,
    num_bits: int = 1 << 17,
    num_hashes: int = 3,
) -> Column:
    """Membership predicate against a ``build_bloom`` bitmap column.

    Pure codegen bit math — k element_at + AND per row, no join. False
    positive rate ≈ (1 - e^(-k·n/m))^k; zero false negatives, so
    ``filter(bloom_contains(...))`` is a safe candidate prefilter for
    an exact downstream verify.
    """
    bm = F.col(bitmap) if isinstance(bitmap, str) else bitmap
    checks = []
    for p in _positions(value, num_bits, num_hashes):
        word = F.element_at(bm, (p / 64).cast("int") + 1)
        mask = _shiftleft1((p % 64).cast("int"))
        checks.append(word.bitwiseAND(mask) != 0)
    out = checks[0]
    for c in checks[1:]:
        out = out & c
    return out
