"""Regenerate the corpus-keyed GOLDEN OPQ rotation
(value_at_risk_spark/queries/_goldens_opq.py) — the r16 graduation
artifact for ``opq_pq_ann_topk``.

The rotation is an eigh over the corpus covariance: deterministic
given the fixture (embedding_covariance's fold is value-sorted, the
driver-side eigh is pure LAPACK on fixed input) but with no SQL twin.
The graduation therefore pins R — quantized to 6 decimals, keyed by a
content-sensitive integer corpus fingerprint — as golden literals the
DuckDB oracle selects by key and then REPLAYS the entire downstream
pipeline from (rotate → pq_fit → encode → reconstruct → re-rank, the
pq_ann_topk CTE machinery). A numpy/LAPACK change, fixture change, or
trainer regression reds the gate row honestly; run this tool and
commit the regenerated module to re-pin.

Usage: python tools/regen_opq_golden.py [sf_dir ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "value_at_risk_spark",
    "queries",
    "_goldens_opq.py",
)

# MUST match the key subquery in queries/vector._opq_oracle_sql
# (CAST to DOUBLE[] first — the float32 parquet column floors
# differently at boundary values under float arithmetic)
KEY_SQL = (
    "SELECT CAST(SUM(CAST(FLOOR(ABS(v[1]) * 100000) AS BIGINT))"
    " AS BIGINT) FROM (SELECT CAST(embedding AS DOUBLE[]) AS v"
    " FROM read_parquet('{path}'))"
)


def main() -> None:
    from pyspark.sql import functions as F

    from value_at_risk_spark.operators.similarity import opq_rotation
    from value_at_risk_spark.session import get_spark

    dirs = sys.argv[1:] or [
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    ]
    spark = get_spark("regen-opq-golden")
    con = duckdb.connect()
    rotations: dict[int, list[list[float]]] = {}
    for d in dirs:
        key = con.sql(
            KEY_SQL.format(path=f"{d}/embeddings.parquet")
        ).fetchone()[0]
        e = spark.read.parquet(f"{d}/embeddings.parquet").select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double")).alias(
                "embedding"
            ),
        )
        rotations[int(key)] = opq_rotation(e, m=4, dim=64, quantize=6)
        print(f"# {d}: key={key}", file=sys.stderr)
    with open(OUT, "w") as f:
        f.write(
            '"""GOLDEN OPQ rotations, corpus-keyed (GENERATED — do not\n'
            "edit by hand; regenerate with tools/regen_opq_golden.py).\n"
            "Key = the integer corpus fingerprint\n"
            "SUM(FLOOR(ABS(embedding[1]) * 1e5)); value = the 6-decimal\n"
            "quantized parametric-OPQ rotation (row i = component dealt\n"
            'to output position i) for that fixture corpus."""\n\n'
            "OPQ_ROTATIONS: dict[int, list[list[float]]] = {\n"
        )
        for key in sorted(rotations):
            f.write(f"    {key}: [\n")
            for row in rotations[key]:
                f.write(f"        {row!r},\n")
            f.write("    ],\n")
        f.write("}\n")
    print(f"wrote {OUT} ({len(rotations)} corpora)")


if __name__ == "__main__":
    raise SystemExit(main())
