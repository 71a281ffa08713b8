"""Registry-wide physical-plan hygiene lint (ratchet form).

Builds EVERY registered query's DataFrame at a small SF and scans the
physical plan text for the silent scale killers:

- ``BatchEvalPython`` — a row-at-a-time Python UDF. The engine's
  contract is Arrow-vectorized Python only (ArrowEvalPython /
  MapInPandas / FlatMapGroupsInPandas are fine). Forbidden outright,
  no allowlist.
- ``CartesianProduct`` — a true unbroadcast cartesian. The registry
  has ZERO today (every unkeyed join Catalyst plans is a
  BroadcastNestedLoopJoin with a bounded build side); forbidden
  outright so one can never appear silently.
- ``BroadcastNestedLoopJoin`` — ratcheted, not forbidden: the
  registry's 38 instances are all the scalar-broadcast idiom (a
  keyless global aggregate — ``HashAggregate(keys=[])`` under a
  ``BroadcastExchange IdentityBroadcastMode`` — crossed into the big
  side: O(N) at any scale; spot-verified). Each query's BNLJ COUNT is
  pinned in ``tools/plan_baseline.json``; a count above baseline
  means a NEW unkeyed join appeared — e.g. a join key lost in a
  refactor silently turning an equi-join into a cross — and the lint
  fails. Counts below baseline auto-tighten on --update.

Plan construction only (executedPlan() plans, does not run), though
driver-side training collects inside query builders (k-means seeds,
ANN codebooks, BPE merges) do execute small jobs — hence sf0.001.

Usage:
  python3 tools/plan_lint.py [sf_dir] [names...]   # lint (exit 1 on fail)
  python3 tools/plan_lint.py --update [sf_dir]     # rewrite baseline
Wired into pytest via tests/test_plans.py (subset) and run over the
full registry before each round's closure sweep.
"""

from __future__ import annotations

import json
import os
import sys

BASELINE_PATH = os.path.join(os.path.dirname(__file__), "plan_baseline.json")
FORBIDDEN = ("BatchEvalPython", "CartesianProduct")
RATCHETED = "BroadcastNestedLoopJoin"


def _plans(spark, sf_dir: str, names=None):
    from value_at_risk_spark.queries import QUERIES

    for name, fn in sorted(QUERIES.items()):
        if names and name not in names:
            continue
        try:
            df = fn(spark, sf_dir)
            yield name, df._jdf.queryExecution().executedPlan().toString()
        except Exception as ex:  # noqa: BLE001 — surface, don't mask
            yield name, f"__PLAN_CONSTRUCTION_FAILED__ {ex!r}"


def lint(spark, sf_dir: str, names=None) -> list[tuple[str, str]]:
    with open(BASELINE_PATH) as f:
        baseline = json.load(f)
    bad: list[tuple[str, str]] = []
    for name, plan in _plans(spark, sf_dir, names):
        if plan.startswith("__PLAN_CONSTRUCTION_FAILED__"):
            bad.append((name, plan[:220]))
            continue
        for tok in FORBIDDEN:
            if tok in plan:
                bad.append((name, f"forbidden operator: {tok}"))
        n = plan.count(RATCHETED)
        allowed = baseline.get(name, 0)
        if n > allowed:
            frag = next(
                line.strip() for line in plan.splitlines() if RATCHETED in line
            )
            bad.append(
                (
                    name,
                    f"{RATCHETED} count {n} > baseline {allowed} "
                    f"(new unkeyed join?): {frag[:140]}",
                )
            )
    return bad


def update_baseline(spark, sf_dir: str) -> dict:
    counts = {}
    for name, plan in _plans(spark, sf_dir):
        if plan.startswith("__PLAN_CONSTRUCTION_FAILED__"):
            raise RuntimeError(f"{name}: {plan[:220]}")
        n = plan.count(RATCHETED)
        if n:
            counts[name] = n
    with open(BASELINE_PATH, "w") as f:
        json.dump(counts, f, indent=1, sort_keys=True)
        f.write("\n")
    return counts


def main() -> int:
    sys.path.insert(0, "/root/repo")
    from value_at_risk_spark.session import get_spark

    argv = sys.argv[1:]
    update = "--update" in argv
    argv = [a for a in argv if a != "--update"]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.001"
    names = set(argv[1:]) or None
    spark = get_spark("plan-lint")
    if update:
        counts = update_baseline(spark, sf_dir)
        print(f"baseline updated: {len(counts)} queries carry a BNLJ")
        return 0
    bad = lint(spark, sf_dir, names)
    for name, why in bad:
        print(f"LINT {name}: {why}")
    print(f"{len(bad)} violations")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
