"""Local pre-flight for the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at the given sf dir, then compares row count, column names, and
order-insensitive values (sorted columns, sorted rows, rounded doubles).

Usage: python tools/check_oracle.py [sf_dir] [name ...]
       python tools/check_oracle.py --json SWEEP.json [sf_dir] [name ...]

``--json OUT`` additionally writes a machine-readable sweep artifact:
one record per query — {status: pass|fail|rows_only, rows, secs, and
detail on failure} — so a full local sweep is auditable per round
(the committed ``SWEEP_r{N}.json`` files) instead of resting on
commit-message claims.
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


def _canon_duck_type(t: str) -> str:
    """Collapse a DuckDB type string into a comparison class shared
    with ``_canon_spark_type``.  The driver's gate hashes TYPED values
    (Arrow), so a DuckDB HUGEINT (Arrow decimal128(38,0)) against a
    Spark BIGINT (Arrow int64) red-lights the hash even when every
    value is equal — the exact bug that kept two queries gate-red for
    three rounds.  ``int128`` deliberately maps to its own class: no
    Spark type can ever match it."""
    t = t.upper().strip()
    if t.startswith("DECIMAL"):
        return "decimal"
    if t.endswith("[]"):
        return "list"
    if t.startswith("STRUCT") or t.startswith("MAP"):
        return "struct"
    if t in ("HUGEINT", "UHUGEINT"):
        return "int128"
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
        return "int"
    if t in ("FLOAT", "REAL", "DOUBLE"):
        return "float"
    if t in ("VARCHAR", "TEXT", "STRING"):
        return "str"
    if t == "BOOLEAN":
        return "bool"
    if t == "DATE":
        return "date"
    if t.startswith("TIMESTAMP"):
        return "timestamp"
    if t == "BLOB":
        return "binary"
    return t.lower()


def _canon_spark_type(simple: str) -> str:
    s = simple.lower()
    if s.startswith("decimal"):
        return "decimal"
    if s.startswith("array"):
        return "list"
    if s.startswith("struct") or s.startswith("map"):
        return "struct"
    if s in ("tinyint", "smallint", "int", "bigint", "long", "integer"):
        return "int"
    if s in ("float", "double"):
        return "float"
    if s == "string":
        return "str"
    if s == "boolean":
        return "bool"
    if s == "date":
        return "date"
    if s.startswith("timestamp"):
        return "timestamp"
    if s == "binary":
        return "binary"
    return s


def _type_parity(sdf, rel) -> list[str]:
    """Column-by-column type-class parity between a Spark result and
    its DuckDB oracle relation (planner types — no execution).  Returns
    human-readable violations; empty means the typed-value hash cannot
    mismatch on type alone."""
    spark_types = {
        f.name.lower(): _canon_spark_type(f.dataType.simpleString())
        for f in sdf.schema.fields
    }
    bad = []
    for col, dtype in zip(rel.columns, rel.types):
        dcanon = _canon_duck_type(str(dtype))
        scanon = spark_types.get(col.lower())
        if scanon is None:
            continue  # column-name mismatch is reported separately
        if dcanon == "int128":
            bad.append(
                f"{col}: oracle {dtype} (Arrow decimal128) vs spark "
                f"{scanon} — CAST the oracle aggregate to BIGINT"
            )
        elif dcanon != scanon:
            bad.append(f"{col}: oracle {dtype}({dcanon}) vs spark {scanon}")
    return bad


def _retime(row: dict, fn, spark, sf_dir: str, extra_runs: int = 2) -> None:
    """Single-run sweep timings > 5 s proved too noisy to distinguish
    regression from a noisy neighbor (the box's documented 2-3x
    variance produced a phantom 2x 'regression' in r11) — re-run the
    Spark side and record the MEDIAN plus every sample, stamping the
    first run 'cold' (any scratch/index builds happen there) and the
    re-runs 'warm'."""
    runs = [row["secs"]]
    for _ in range(extra_runs):
        t0 = time.time()
        try:
            fn(spark, sf_dir).collect()
        except Exception:  # noqa: BLE001 — keep the first run's verdict
            break
        runs.append(round(time.time() - t0, 1))
    row["secs_runs"] = runs  # runs[0] is cold, the rest warm
    row["secs"] = sorted(runs)[len(runs) // 2]
    row["timing"] = f"median-of-{len(runs)}, first-run-cold"


def main():
    argv = list(sys.argv[1:])
    json_out = None
    if argv and argv[0] == "--json":
        json_out = argv[1]
        argv = argv[2:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    from value_at_risk_spark.operators import annindex

    n_pass = n_fail = 0
    report: dict[str, dict] = {}
    # pq/ivfpq/opq timings are bimodal (train vs load-from-cache);
    # stamp which mode each row measured so sweep numbers are readable
    cache_modes: dict[str, str] = {}
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        annindex.BUILD_EVENTS.clear()
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = [c.lower() for c in sdf.columns]
            srows = [tuple(r) for r in sdf.collect()]
            if annindex.BUILD_EVENTS:
                cache_modes[name] = (
                    "cold"
                    if any(m == "cold" for _, m in annindex.BUILD_EVENTS)
                    else "warm"
                )
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            report[name] = {"status": "fail", "detail": f"spark error: {e}"}
            n_fail += 1
            continue
        if name not in ORACLES:
            secs = round(time.time() - t0, 1)
            print(f"rows  {name}: {len(srows)} rows (rows-only, {secs}s)")
            report[name] = {
                "status": "rows_only" if srows else "fail",
                "rows": len(srows),
                "secs": secs,
            }
            if json_out and secs > 5.0:
                _retime(report[name], fn, spark, sf_dir)
            if not srows:
                print(f"WARN  {name}: 0 rows")
                report[name]["detail"] = "rows-only query returned 0 rows"
                n_fail += 1
            continue
        try:
            res = con.sql(ORACLES[name])
            parity = _type_parity(sdf, res)
            dcols = [c.lower() for c in res.columns]
            drows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            report[name] = {"status": "fail", "detail": f"duckdb error: {e}"}
            n_fail += 1
            continue
        if parity:
            print(f"FAIL  {name}: type parity: {'; '.join(parity)}")
            report[name] = {
                "status": "fail",
                "detail": f"type parity: {'; '.join(parity)}",
            }
            n_fail += 1
            continue
        sc, sr = _norm_rows(scols, srows)
        dc, dr = _norm_rows(dcols, drows)
        secs = round(time.time() - t0, 1)
        if sc != dc:
            print(f"FAIL  {name}: columns {sc} vs {dc}")
            report[name] = {"status": "fail", "detail": f"columns {sc} vs {dc}"}
            n_fail += 1
        elif len(sr) != len(dr):
            print(f"FAIL  {name}: rowcount {len(sr)} vs {len(dr)}")
            report[name] = {
                "status": "fail",
                "detail": f"rowcount {len(sr)} vs {len(dr)}",
            }
            n_fail += 1
        elif sr != dr:
            bad = sum(1 for a, b in zip(sr, dr) if a != b)
            print(f"FAIL  {name}: {bad}/{len(sr)} rows differ")
            report[name] = {
                "status": "fail",
                "detail": f"{bad}/{len(sr)} rows differ",
            }
            for a, b in list(zip(sr, dr))[:200]:
                if a != b:
                    print(f"      spark={a}")
                    print(f"      duck ={b}")
                    break
            n_fail += 1
        else:
            print(f"PASS  {name}: {len(sr)} rows ({secs}s)")
            report[name] = {"status": "pass", "rows": len(sr), "secs": secs}
            n_pass += 1
            if json_out and secs > 5.0:
                _retime(report[name], fn, spark, sf_dir)
    for name, mode in cache_modes.items():
        if name in report:
            report[name]["ann_cache"] = mode
    print(f"\n{n_pass} pass / {n_fail} fail "
          f"/ {len([q for q in QUERIES if q not in ORACLES])} rows-only")
    if json_out:
        import json

        summary = {
            "sf_dir": sf_dir,
            "n_pass": n_pass,
            "n_fail": n_fail,
            "n_rows_only": sum(
                1 for r in report.values() if r["status"] == "rows_only"
            ),
            "n_queries": len(report),
            "queries": report,
        }
        with open(json_out, "w") as fh:
            json.dump(summary, fh, indent=1, sort_keys=True)
        print(f"wrote {json_out}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
