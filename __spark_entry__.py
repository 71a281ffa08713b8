"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship VaR query at sf0.001 (smoke, rows>0).
``queries()`` — every implemented operator from SURVEY.md §2 + the
north-star dedup/similarity/text surface (value_at_risk_spark.queries).
``oracle_sql()`` — DuckDB twins for every SQL-expressible query;
rows-only entries (seeded RNG / hash-family LSH / mapInPandas
plumbing) intentionally have no oracle per the driver contract.
"""

from __future__ import annotations

import glob
import json
import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# robust to drivers that import this file without /root/repo on sys.path
_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from value_at_risk_spark.queries import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: portfolio VaR-99 + expected shortfall per series over
    the orders-as-market daily log-return frame (sf0.001)."""
    return QUERIES["expected_shortfall_99"](spark, "/root/testdata/sf0.001")


def _gate_ledger() -> dict[str, tuple[int, bool, bool]]:
    """Map query name -> (most recent driver-gate round that recorded a
    row for it, whether that latest row PASSED, whether that row was
    ROWS-ONLY — ``err == "no_oracle"``), from committed
    ``CORRECTNESS_r*.json`` files.

    A row passes when the oracle compare hash-matched, or — for
    rows-only queries by driver contract (``err == "no_oracle"``) —
    when the Spark side produced a row count at all.  Anything else
    (exception recorded in ``err``, hash/rows mismatch) is a failure,
    and failures must rotate to the FRONT of the gate window: a query
    whose latest official row is red is the opposite of "recently
    covered".

    Past gates each ran only the FIRST 50 entries of ``queries()`` in
    dict order, so ordering decides coverage.  Deterministic under
    missing files: no gate files simply means every query is
    never-gated and the base QUERIES dict order stands.
    """
    ledger: dict[str, tuple[int, bool]] = {}
    for path in sorted(glob.glob(os.path.join(_REPO_ROOT, "CORRECTNESS_r*.json"))):
        base = os.path.basename(path)
        digits = "".join(ch for ch in base if ch.isdigit())
        rnd = int(digits) if digits else 0
        try:
            with open(path) as fh:
                rows = json.load(fh)
        except (OSError, ValueError):
            continue
        for name, row in rows.items():
            rows_only = isinstance(row, dict) and row.get("err") == "no_oracle"
            if not isinstance(row, dict):
                passed = False
            elif rows_only:
                passed = row.get("spark_rows") is not None
            else:
                passed = (
                    row.get("err") is None
                    and row.get("hash_match") is True
                    and row.get("rows_match") is True
                )
            prev = ledger.get(name)
            if prev is None or rnd >= prev[0]:
                ledger[name] = (rnd, passed, rows_only)
    return ledger


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Gate-window ordering (the driver runs only the first ~50 entries):
    #   1. queries whose LATEST official row is a failure — a red row in
    #      the cumulative ledger must be re-gated before anything else;
    #   2. an INTERLEAVE of never-gated queries (oracle-eligible before
    #      rows-only, so a truncating gate spends its budget on
    #      hash-comparable coverage first) with previously-green
    #      queries, least-recently gated first: every 5th post-failed
    #      slot is reserved for the OLDEST green row, so stale greens
    #      (e.g. the flagship's r04 vintage) re-verify continuously
    #      instead of waiting for the fresh backlog to fully drain.
    # The rotation means old green rows don't stand forever: every
    # round the truncating window re-verifies the longest-unchecked
    # slice, so a regression in an already-gated query is caught within
    # a few rounds instead of never — and a known-red row is caught
    # NEXT round, not whenever its vintage comes back around.
    ledger = _gate_ledger()
    failed = [k for k in QUERIES if k in ledger and not ledger[k][1]]
    failed.sort(key=lambda k: ledger[k][0])  # stable: ties keep dict order
    fresh_oracle = [k for k in QUERIES if k not in ledger and k in ORACLES]
    # GRADUATED: last gated rows-only but NOW oracle-backed — the
    # contract changed, so the green row in the ledger never verified
    # the hash; re-gate alongside never-gated oracle coverage
    graduated = [
        k
        for k in QUERIES
        if k in ledger and ledger[k][1] and ledger[k][2] and k in ORACLES
    ]
    graduated.sort(key=lambda k: ledger[k][0])
    fresh_rows = [k for k in QUERIES if k not in ledger and k not in ORACLES]
    fresh = [*fresh_oracle, *graduated, *fresh_rows]
    graduated_set = set(graduated)
    green = [
        k
        for k in QUERIES
        if k in ledger and ledger[k][1] and k not in graduated_set
    ]
    green.sort(key=lambda k: ledger[k][0])
    ordered = [*failed]
    fi = gi = slot = 0
    while fi < len(fresh) or gi < len(green):
        green_slot = slot % 5 == 4
        if (green_slot and gi < len(green)) or fi >= len(fresh):
            ordered.append(green[gi])
            gi += 1
        else:
            ordered.append(fresh[fi])
            fi += 1
        slot += 1
    return {k: QUERIES[k] for k in ordered}


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
