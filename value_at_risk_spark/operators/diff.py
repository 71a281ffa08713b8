"""Snapshot diff — dataset-version comparison as a DataFrame operator.

Corpus curation is iterative: crawls refresh, filters re-run, and every
downstream consumer asks the same question — what changed between
corpus v1 and v2? The scalable answer never compares payloads directly:
each side reduces to (id, fingerprint) — md5/xxhash64 of the content,
computed in codegen during the scan — and ONE full-outer shuffle join
on the id classifies every row as added / removed / modified /
unchanged. Payload bytes stay in storage; the join carries 16-byte
fingerprints.

Reference intent: the reference's MERGE/SCD2 surface (operators/
merge.py) handles applying changes; this is the read-side complement
that DETECTS them between table versions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    fingerprint: Column | str = "text",
) -> DataFrame:
    """Classify every id across two snapshots.

    ``fingerprint`` is a column (or column name) whose md5 stands in
    for content equality — pass a concat/struct-hash for multi-column
    payloads. Output: (id, status) with status in added / removed /
    modified / unchanged — one full-outer hash join on the id, each
    side pre-reduced to (id, 16-byte digest) during its scan.
    """
    fp = F.md5(F.col(fingerprint) if isinstance(fingerprint, str) else fingerprint)
    a = old.select(F.col(id_col).alias("_ida"), fp.alias("_ha"))
    b = new.select(F.col(id_col).alias("_idb"), fp.alias("_hb"))
    return a.join(b, a["_ida"] == b["_idb"], "full_outer").select(
        F.coalesce("_ida", "_idb").alias(id_col),
        F.when(F.col("_ida").isNull(), "added")
        .when(F.col("_idb").isNull(), "removed")
        .when(F.col("_ha") != F.col("_hb"), "modified")
        .otherwise("unchanged")
        .alias("status"),
    )
