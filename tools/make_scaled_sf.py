"""Build a ~N×-scaled copy of a fixture SF dir for perf spot runs.

PERF ONLY, never correctness: fact tables (lineitem, orders, events,
documents, embeddings) are replicated N times with primary keys shifted
by a large stride so uniqueness and PK→FK joins survive (l_orderkey
follows o_orderkey's shift); dimension tables are copied verbatim.
Scaled documents therefore contain N exact copies of every text — a
dupe-heavy corpus, which is exactly what dedup looks like at scale.

Usage: python tools/make_scaled_sf.py [src_sf_dir] [out_dir] [replicas]
Defaults: /root/testdata/sf0.1 /tmp/sf_scaled 10
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from value_at_risk_spark.session import get_spark  # noqa: E402
from value_at_risk_spark.sources.registry import Registry  # noqa: E402

STRIDE = 10**9
# fact table -> key columns shifted per replica (uniqueness + join keys)
FACTS = {
    "orders": ["o_orderkey"],
    "lineitem": ["l_orderkey"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
DIMS = ("region", "nation", "customer", "supplier", "part")


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf_scaled"
    replicas = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    spark = get_spark("make_scaled_sf")
    reg_in, reg_out = Registry(src), Registry(out)
    for name in DIMS:
        reg_out.write(reg_in.read(spark, name), name)
    for name, keys in FACTS.items():
        base = reg_in.read(spark, name)
        scaled = None
        for i in range(replicas):
            rep = base
            for k in keys:
                rep = rep.withColumn(k, F.col(k) + F.lit(i * STRIDE))
            scaled = rep if scaled is None else scaled.unionByName(rep)
        reg_out.write(scaled, name)
        print(f"{name}: {base.count()} -> {scaled.count()} rows", flush=True)


if __name__ == "__main__":
    main()
