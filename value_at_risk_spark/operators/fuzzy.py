"""Fuzzy (edit-distance) joins via deletion-neighborhood blocking —
the SymSpell idea (Garbe's symmetric-delete algorithm) as a DataFrame
operator.

Matching strings within edit distance 1 by brute force is an O(N·M)
cross join with a Levenshtein kernel per pair — hopeless at corpus
scale. The symmetric-delete trick: every string's depth-1 deletion
neighborhood ({s} ∪ {s minus one char}) has the property that two
strings within edit distance 1 (substitution, insertion, or deletion)
ALWAYS share a neighborhood key — substitution pairs share the
deletion at the differing position; insert/delete pairs share the
shorter string itself. So candidates come from a plain equi-join on
the key (shuffle-partitioned, broadcastable when one side is small)
and the exact Levenshtein predicate runs ONLY on collisions — the
same candidates-then-verify contract as LSH banding in
operators/dedup.

Reference intent: SURVEY §2.3's join family — the approximate-string
sibling of the equi/as-of joins, used for entity resolution and
near-duplicate key matching in curation pipelines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def deletion_keys(col: Column | str) -> Column:
    """Depth-1 deletion neighborhood as an array: the string itself
    plus every single-character deletion (distinct — repeated chars
    collapse)."""
    c = F.col(col) if isinstance(col, str) else col
    dels = F.transform(
        F.sequence(F.lit(1), F.length(c)),
        lambda i: F.concat(
            F.substring(c, 1, i.cast("int") - 1),
            c.substr(i.cast("int") + 1, F.length(c)),
        ),
    )
    return F.array_distinct(F.concat(F.array(c), dels))


def fuzzy_join_dist1(
    left: DataFrame,
    right: DataFrame,
    col: str,
    out_left: str = "name_a",
    out_right: str = "name_b",
) -> DataFrame:
    """All (left, right) string pairs with Levenshtein distance EXACTLY
    1 (equal strings are not matches — distance-0 pairs are the job of
    exact dedup). Complete recall by the deletion-key guarantee;
    exactness by the verify filter. Output distinct (out_left,
    out_right) pairs."""
    a = left.select(F.col(col).alias(out_left)).distinct().select(
        out_left, F.explode(deletion_keys(out_left)).alias("_k")
    )
    b = right.select(F.col(col).alias(out_right)).distinct().select(
        out_right, F.explode(deletion_keys(out_right)).alias("_k")
    )
    return (
        a.join(b, "_k")
        .filter(F.col(out_left) != F.col(out_right))
        .select(out_left, out_right)
        .distinct()
        .filter(F.levenshtein(F.col(out_left), F.col(out_right)) == 1)
    )
