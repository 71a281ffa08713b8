"""Local pre-flight for the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at the given sf dir, then compares row count, column names, and
order-insensitive values (sorted columns, sorted rows, rounded doubles).

Usage: python tools/check_oracle.py [sf_dir] [name ...]
"""

from __future__ import annotations

import math
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

from value_at_risk_spark.queries import ORACLES, QUERIES  # noqa: E402
from value_at_risk_spark.session import get_spark  # noqa: E402
from value_at_risk_spark.sources.registry import TABLES  # noqa: E402


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        v = round(v, 6)
        return 0.0 if v == 0 else v
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


def _norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out, key=lambda t: tuple(str(x) for x in t))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    n_pass = n_fail = 0
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = [c.lower() for c in sdf.columns]
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in ORACLES:
            print(f"rows  {name}: {len(srows)} rows (rows-only, {time.time()-t0:.1f}s)")
            if not srows:
                print(f"WARN  {name}: 0 rows")
            continue
        try:
            res = con.sql(ORACLES[name])
            dcols = [c.lower() for c in res.columns]
            drows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            n_fail += 1
            continue
        sc, sr = _norm_rows(scols, srows)
        dc, dr = _norm_rows(dcols, drows)
        if sc != dc:
            print(f"FAIL  {name}: columns {sc} vs {dc}")
            n_fail += 1
        elif len(sr) != len(dr):
            print(f"FAIL  {name}: rowcount {len(sr)} vs {len(dr)}")
            n_fail += 1
        elif sr != dr:
            bad = sum(1 for a, b in zip(sr, dr) if a != b)
            print(f"FAIL  {name}: {bad}/{len(sr)} rows differ")
            for a, b in list(zip(sr, dr))[:200]:
                if a != b:
                    print(f"      spark={a}")
                    print(f"      duck ={b}")
                    break
            n_fail += 1
        else:
            print(f"PASS  {name}: {len(sr)} rows ({time.time()-t0:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} pass / {n_fail} fail "
          f"/ {len([q for q in QUERIES if q not in ORACLES])} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
