"""Regenerate the corpus-keyed golden VALUES oracles (r14).

Three gate queries are ORACLE-pinned as golden literals keyed on a
corpus fingerprint (so one SQL string holds at every SF):
``mc_simulate_market`` / ``mc_portfolio_var`` (key = COUNT(orders))
and ``compression_ratio_scores`` (key = SUM(LENGTH(text)) — sf0.001
and sf0.01 share a 500-doc count but not content). If the driver's
fixtures ever change, run this and paste the printed VALUES rows into
the corresponding ``@query`` oracle strings in
value_at_risk_spark/queries/ — no archaeology required.

``var_pipeline_end_to_end`` (key = COUNT(orders)) joined the list in
r16 — the composed pipeline's quarterly summary is seeded-RNG + rounded
handoffs, reproduced bit-for-bit across fresh processes before pinning.
(The OPQ rotation golden has its own tool: tools/regen_opq_golden.py.)

Usage: python tools/regen_goldens.py [sf_dir ...]
Defaults to the three standard fixture dirs.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from value_at_risk_spark.queries import QUERIES  # noqa: E402
from value_at_risk_spark.session import get_spark  # noqa: E402


def main() -> None:
    dirs = sys.argv[1:] or [
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    ]
    spark = get_spark("regen-goldens")
    con = duckdb.connect()
    mc_rows, cr_rows = [], []
    pv_rows = []
    vp_rows = []
    for d in dirs:
        okey = con.sql(
            f"SELECT COUNT(*) FROM read_parquet('{d}/orders.parquet')"
        ).fetchone()[0]
        dkey = con.sql(
            "SELECT SUM(LENGTH(text)) FROM "
            f"read_parquet('{d}/documents.parquet')"
        ).fetchone()[0]
        for r in sorted(
            tuple(x) for x in QUERIES["mc_simulate_market"](spark, d).collect()
        ):
            mc_rows.append(f"  ({okey}, {', '.join(map(str, r))}),")
        for r in QUERIES["mc_portfolio_var"](spark, d).collect():
            pv_rows.append(
                f"  ({okey}, DATE '{r.date}', {r.var_99}, {r.shortfall}),"
            )
        for r in sorted(
            tuple(x)
            for x in QUERIES["compression_ratio_scores"](spark, d).collect()
        ):
            lang, n, m, p10, p90 = r
            cr_rows.append(f"  ({dkey}, '{lang}', {n}, {m}, {p10}, {p90}),")
        for r in sorted(
            tuple(x)
            for x in QUERIES["var_pipeline_end_to_end"](spark, d).collect()
        ):
            q, n, av, ar, tb, mz = r
            vp_rows.append(
                f"  ({okey}, DATE '{q}', {n}, {av!r}, {ar!r}, {tb}, {mz}),"
            )
    print("-- mc_simulate_market g(k, trial_id, f0..f4):")
    print("\n".join(mc_rows))
    print("-- mc_portfolio_var g(k, date, var_99, shortfall):")
    print("\n".join(pv_rows))
    print("-- compression_ratio_scores "
          "g(k, lang, n_docs, mean_ratio, p10_ratio, p90_ratio):")
    print("\n".join(cr_rows))
    print("-- var_pipeline_end_to_end g(k, quarter, n_dates, avg_var_99, "
          "avg_return, total_breaches, max_zone):")
    print("\n".join(vp_rows))


if __name__ == "__main__":
    main()
