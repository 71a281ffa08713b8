"""Driver-local small frames as literal plans (SURVEY §2.1 S2).

``spark.createDataFrame(rows)`` plans a ``Scan ExistingRDD`` over a
pickled Python RDD: every action that touches it (including every
re-build of a broadcast) round-trips through a Python worker. For the
small dimension/config frames this engine broadcasts into hot joins
(instrument specs, portfolio weights — the reference's driver-side
pandas lifts at ``configure_notebook.py:30-38``), that is pure
overhead: measured ~8s per action on local[32] vs ~0.2s for the same
1-row frame planned as literals.

``local_frame`` builds the frame as a ``VALUES`` logical plan instead —
fully JVM-side, constant-folded by Catalyst, broadcast-cacheable, and
never touching a Python worker.
"""

from __future__ import annotations

import datetime as _dt
import math

from pyspark.sql import DataFrame, SparkSession


def _sql_literal(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, str):
        return "'" + v.replace("\\", "\\\\").replace("'", "\\'") + "'"
    if isinstance(v, _dt.datetime):
        return f"TIMESTAMP '{v.isoformat(sep=' ')}'"
    if isinstance(v, _dt.date):
        return f"DATE '{v.isoformat()}'"
    if isinstance(v, float):
        if not math.isfinite(v):  # repr() would render invalid SQL ('nanD')
            name = "NaN" if math.isnan(v) else ("Infinity" if v > 0 else "-Infinity")
            return f"CAST('{name}' AS DOUBLE)"
        return repr(v) + "D"  # double literal, full precision
    if isinstance(v, int):
        return f"{v}L"
    if isinstance(v, (list, tuple)):
        return "array(" + ", ".join(_sql_literal(x) for x in v) + ")"
    raise TypeError(f"local_frame: unsupported literal type {type(v)!r}")


def _split_ddl(schema: str) -> list[str]:
    """Split a DDL column list on TOP-LEVEL commas only, so parameterized
    and nested types (``decimal(10,2)``, ``map<string,int>``,
    ``struct<a:int,b:string>``) keep their internal commas."""
    cols: list[str] = []
    depth = 0
    cur: list[str] = []
    for ch in schema:
        if ch in "(<":
            depth += 1
        elif ch in ")>":
            depth -= 1
        if ch == "," and depth == 0:
            cols.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if "".join(cur).strip():
        cols.append("".join(cur).strip())
    return cols


def local_frame(spark: SparkSession, rows: list[tuple], schema: str) -> DataFrame:
    """Small local rows → DataFrame via a VALUES plan (no Python RDD).

    ``schema`` is a DDL string ("a string, b double"); values are cast
    to the declared types so the result schema is exact. Intended for
    frames small enough to broadcast — configs, instrument dims, seeds.
    """
    cols = _split_ddl(schema)
    names = [c.split()[0] for c in cols]
    types = [" ".join(c.split()[1:]) for c in cols]
    if not rows:
        casts = ", ".join(
            f"CAST(NULL AS {t}) AS {n}" for n, t in zip(names, types)
        )
        return spark.sql(f"SELECT {casts}").limit(0)
    values = ", ".join(
        "(" + ", ".join(_sql_literal(v) for v in row) + ")" for row in rows
    )
    casts = ", ".join(
        f"CAST({n} AS {t}) AS {n}" for n, t in zip(names, types)
    )
    alias_cols = ", ".join(names)
    return spark.sql(
        f"SELECT {casts} FROM (VALUES {values}) AS t({alias_cols})"
    )
