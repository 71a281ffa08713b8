"""Frequent-items (heavy hitters) at scale: Misra-Gries candidates +
exact verify pass.

The 100 TB shape: a single `groupBy(item).count()` over a 100 TB token
stream shuffles every distinct item; when the interesting output is
only the items above a frequency threshold, that shuffle is almost all
waste. The classic two-pass exact answer:

1. **Candidate pass** — each partition maintains a Misra-Gries summary
   with ``k`` counters (Misra & Gries 1982; mergeable per Agarwal et
   al., "Mergeable Summaries", PODS 2012). MG guarantees every item
   with partition frequency > n_p/(k+1) survives the partition's
   summary; by pigeonhole, any item with GLOBAL frequency > n/(k+1)
   exceeds that bound in at least one partition, so the union of
   per-partition survivors is a superset of all global heavy hitters.
   Output is ≤ k rows per partition — kilobytes, not a shuffle of the
   vocabulary.
2. **Verify pass** — exact counts for the candidate set only (a
   broadcast semi-join prunes the re-scan), filtered at the caller's
   threshold ``n/k`` (> n/(k+1), so the guarantee covers it). The
   result is EXACT and deterministic — partitioning only affects which
   non-heavy candidates get pruned in pass 2.

Reference intent: SURVEY §2 lists distinct-agg/HLL sketch surface; this
is the frequency-sketch sibling (count-min/MG family) with an exact
gate contract instead of an estimate.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mg_candidates(df: DataFrame, col: str, k: int = 100) -> DataFrame:
    """Per-partition Misra-Gries survivors for ``df[col]`` with ``k``
    counters: ``(item, lb)`` rows, ≤ k per partition, where ``lb`` is
    the MG lower-bound counter (true partition count ≥ lb ≥ true
    partition count − n_p/(k+1)).

    Vectorized: each Arrow batch collapses to ``value_counts`` first,
    then merges into the running summary with the weighted-MG step
    (add counts; if > k counters, subtract the (k+1)-th largest and
    drop non-positive) — the mergeable-summaries form of the classic
    one-at-a-time decrement, same guarantee.
    """

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        for pdf in batches:
            vc = pdf[col].value_counts()
            for item, cnt in vc.items():
                counters[item] = counters.get(item, 0) + int(cnt)
            if len(counters) > k:
                # weighted decrement: (k+1)-th largest count
                sub = sorted(counters.values(), reverse=True)[k]
                counters = {
                    i: c - sub for i, c in counters.items() if c - sub > 0
                }
        yield pd.DataFrame(
            {col: list(counters.keys()), "lb": list(counters.values())}
        )

    field = df.schema[col].dataType.simpleString()
    return df.select(col).mapInPandas(part, schema=f"{col} {field}, lb long")


def exact_heavy_hitters(
    df: DataFrame, col: str, k: int = 100, count_alias: str = "cnt"
) -> DataFrame:
    """Items of ``df[col]`` with exact count > n/k, computed without
    shuffling the full distinct domain.

    Returns the result frame ``(col, cnt)``. Pass 1 (mg_candidates)
    yields a driver-size candidate set; pass 2 re-scans the input with
    a broadcast semi-join on candidates, aggregates exact counts (the
    shuffle now carries only candidate items), and filters at the
    n/k threshold computed from a single-row global count joined in
    by broadcast.
    """
    cands = mg_candidates(df, col, k).select(col).distinct()
    total = df.agg(F.count(F.lit(1)).alias("_n"))
    return (
        df.join(F.broadcast(cands), on=col, how="leftsemi")
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias(count_alias))
        .join(F.broadcast(total))
        .filter(F.col(count_alias) > F.col("_n") / k)
        .drop("_n")
    )


# --------------------------------------------------------------------------
# Count-min sketch: the additive sibling of the MG summary above —
# bounded-memory frequency ESTIMATES for every item (MG answers "which
# items are heavy"; CMS answers "roughly how often is item X" for any X).
# --------------------------------------------------------------------------


def _cms_pos(item, r: int, width: int):
    """Row-r hash position: md5-prefix integer mod width. md5 is used
    (not xxhash64) so the identical sketch is constructible in ANSI
    SQL on any engine — the cross-engine idiom verified byte-exact in
    queries.weighted_sample_per_lang."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(item, F.lit(f"#{r}"))), 1, 8), 16, 10
        ).cast("long")
        % width
    )


def cms_build(
    df: DataFrame, col: str, width: int = 1024, depth: int = 4
) -> DataFrame:
    """Build a count-min sketch (Cormode & Muthukrishnan 2005) over
    ``df[col]`` as a SPARSE (r, c, cnt) DataFrame — ≤ width·depth rows
    regardless of input size, produced by one explode (×depth) + one
    hash-agg with map-side partials.

    CMS is ADDITIVE: sketches of disjoint corpus parts merged by
    summing cells equal the sketch of the union exactly (``cms_merge``
    — the property that lets 1000 executors sketch 100 TB
    independently and reduce kilobytes)."""
    pairs = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"),
                        _cms_pos(F.col(col), r, width).alias("c"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("p")
    )
    return pairs.groupBy(
        F.col("p.r").alias("r"), F.col("p.c").alias("c")
    ).agg(F.count(F.lit(1)).alias("cnt"))


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge CMS sketches built with identical (width, depth): cells
    add. Exactly equals the sketch of the concatenated inputs."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("r", "c").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    probe_col: str = "probe",
    width: int = 1024,
    depth: int = 4,
) -> DataFrame:
    """Point-frequency estimates for ``probes[probe_col]``: min over
    the depth rows of the probed cells. Guarantees (pytest-pinned):
    estimate >= true count always (cells only over-count), and
    estimate <= true + εN with probability 1-δ for ε=e/width,
    δ=e^-depth. The sketch is ≤ width·depth rows, so the probe join
    broadcasts."""
    probed = probes.select(
        F.col(probe_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"),
                        _cms_pos(F.col(probe_col), r, width).alias("c"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("p"),
    ).select(probe_col, F.col("p.r").alias("r"), F.col("p.c").alias("c"))
    return (
        probed.join(F.broadcast(sketch), ["r", "c"], "left")
        .groupBy(probe_col)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("cms_count"))
    )
