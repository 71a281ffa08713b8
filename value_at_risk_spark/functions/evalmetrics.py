"""Classifier evaluation metrics as DataFrame operators.

A data-curation loop constantly evaluates cheap classifiers (language
ID, quality filters, toxicity gates) against labeled samples; at corpus
scale the evaluation itself must be a distributed reduction, not a
driver-side sklearn call. The report here reduces the (gold, pred)
stream to one confusion-cell aggregate — at most |classes|² rows leave
the shuffle regardless of input size — and derives per-class
precision/recall/F1 from the tiny cell table with equi-joins only.

Reference intent: the reference's model-scoring surface (SURVEY §2.8,
02_var_model.py wsse scoring); this is the categorical sibling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def confusion_cells(
    df: DataFrame, gold: str = "gold", pred: str = "pred"
) -> DataFrame:
    """(gold, pred, n) cell counts — ONE scan, map-side partials."""
    return df.groupBy(
        F.col(gold).alias("gold"), F.col(pred).alias("pred")
    ).agg(F.count(F.lit(1)).alias("n"))


def classification_report(
    df: DataFrame,
    gold: str = "gold",
    pred: str = "pred",
    round_to: int = 6,
) -> DataFrame:
    """Per-class (label, support, tp, pred_n, precision, recall, f1).

    All heavy lifting is the single confusion-cell aggregate; support /
    predicted-count / true-positive reductions and the final full-outer
    stitch run on ≤ |classes|² rows. Precision is NULL for classes never
    predicted, recall NULL for classes with no support (try_divide), F1
    NULL when either is — the convention that doesn't silently invent
    zeros for undefined ratios.
    """
    cells = confusion_cells(df, gold, pred)
    support = cells.groupBy(F.col("gold").alias("label")).agg(
        F.sum("n").alias("support")
    )
    pred_n = cells.groupBy(F.col("pred").alias("label")).agg(
        F.sum("n").alias("pred_n")
    )
    tp = (
        cells.filter(F.col("gold") == F.col("pred"))
        .select(F.col("gold").alias("label"), F.col("n").alias("tp"))
    )
    base = (
        support.join(pred_n, "label", "full_outer")
        .join(tp, "label", "full_outer")
        .select(
            "label",
            F.coalesce("support", F.lit(0)).cast("long").alias("support"),
            F.coalesce("tp", F.lit(0)).cast("long").alias("tp"),
            F.coalesce("pred_n", F.lit(0)).cast("long").alias("pred_n"),
        )
    )
    precision = F.try_divide(F.col("tp"), F.col("pred_n"))
    recall = F.try_divide(F.col("tp"), F.col("support"))
    f1 = F.try_divide(2 * precision * recall, precision + recall)
    r = lambda c: F.round(c, round_to) + F.lit(0.0)  # noqa: E731
    return base.select(
        "label",
        "support",
        "tp",
        "pred_n",
        r(precision).alias("precision"),
        r(recall).alias("recall"),
        r(f1).alias("f1"),
    )
