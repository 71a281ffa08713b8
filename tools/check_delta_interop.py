#!/usr/bin/env python3
"""Third-party interop evidence for the native delta log.

The format (sources/deltalog.py, sources/dv.py) claims conformance to
the PUBLIC Delta transaction-log protocol (delta.io PROTOCOL.md) —
this tool checks that claim with every independent implementation the
environment offers, and records an artifact (INTEROP_r{N}.json):

arm A — independent DELTA reader: DuckDB's `delta` extension
  (`delta_scan`) opened against natively-written tables, row counts +
  aggregates compared to `read_delta`. The extension needs a network
  download; when unavailable the arm records SKIPPED (not passed).

arm B — independent PARQUET reader over the log's file lists: DuckDB
  (a from-scratch C++ parquet implementation, not Spark's Java one)
  reads exactly the ACTIVE data files our log enumerates and must
  reproduce `read_delta`'s row counts and sums; for DV tables the raw
  foreign read must exceed the masked read by exactly the committed
  cardinality. This proves the data plane (parquet files, Hive
  partition encoding, url-encoded add.path) is consumable by a second
  engine given the log's manifest.

arm C — structural spec conformance (always runs): commit naming,
  single-action JSON lines, url-encoded relative add.path,
  string-typed partitionValues, protocol/metaData required fields,
  checkpoint parquet action columns + _last_checkpoint, DV descriptor
  fields, z85 alphabet + the ZeroMQ RFC-32 published test vector
  ("HelloWorld"), DV bin magic/version/CRC-32 recomputed with zlib,
  CDF _change_data readability.

Usage: python3 tools/check_delta_interop.py [sf_dir] [out.json]
"""
from __future__ import annotations

import json
import os
import re
import shutil
import struct
import sys
import tempfile
import zlib

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RESULTS: dict[str, dict] = {}


def record(check: str, status: str, detail: str = "") -> None:
    RESULTS[check] = {"status": status, "detail": detail}
    print(f"{status:7s} {check}" + (f": {detail}" if detail else ""))


def _duckdb_delta_ext():
    import duckdb

    con = duckdb.connect()
    try:
        con.execute("INSTALL delta")
        con.execute("LOAD delta")
        return con
    except Exception as e:  # offline: the extension is a download
        record(
            "duckdb_delta_extension",
            "SKIP",
            f"unavailable in this environment: {type(e).__name__}",
        )
        return None


def build_tables(spark, sf_dir: str, root: str) -> dict[str, dict]:
    """Natively-written tables covering each table feature; returns
    {name: {path, features...}}."""
    from pyspark.sql import functions as F

    from value_at_risk_spark.sources.deltalog import (
        checkpoint_delta,
        delete_from_delta,
        rename_delta_column,
        update_delta,
        widen_column_type,
        write_delta,
    )

    sup = spark.read.parquet(os.path.join(sf_dir, "supplier.parquet")).select(
        "s_suppkey", "s_nationkey", "s_acctbal"
    )
    out: dict[str, dict] = {}

    p = os.path.join(root, "plain")
    write_delta(spark, sup.filter(F.col("s_suppkey") % 2 == 0), p)
    write_delta(spark, sup.filter(F.col("s_suppkey") % 2 == 1), p)
    out["plain"] = {"path": p}

    p = os.path.join(root, "partitioned")
    write_delta(spark, sup, p, partition_by=["s_nationkey"])
    out["partitioned"] = {"path": p}

    p = os.path.join(root, "checkpointed")
    for k in range(4):
        write_delta(spark, sup.filter(F.col("s_suppkey") % 4 == k), p)
    checkpoint_delta(p)
    write_delta(spark, sup.limit(0), p)  # a post-checkpoint tail commit
    out["checkpointed"] = {"path": p, "checkpoint": True}

    p = os.path.join(root, "v2checkpointed")
    write_delta(
        spark, sup, p, configuration={"delta.checkpointPolicy": "v2"}
    )
    write_delta(spark, sup.limit(0), p)
    checkpoint_delta(p)
    out["v2checkpointed"] = {"path": p, "checkpoint": True, "v2": True}

    p = os.path.join(root, "dv")
    write_delta(
        spark,
        sup,
        p,
        configuration={"delta.enableDeletionVectors": "true"},
    )
    r = delete_from_delta(spark, p, "s_acctbal < 0")
    assert r["files_rewritten"] == 0, "fixture must be merge-on-read"
    out["dv"] = {"path": p, "dv": True, "deleted": r["rows_deleted"]}

    p = os.path.join(root, "cdf")
    write_delta(
        spark, sup, p, configuration={"delta.enableChangeDataFeed": "true"}
    )
    update_delta(
        spark, p, "s_nationkey = 3", {"s_acctbal": "s_acctbal + 1.0"}
    )
    out["cdf"] = {"path": p, "cdf": True}

    p = os.path.join(root, "mapped")
    write_delta(
        spark,
        sup,
        p,
        partition_by=["s_nationkey"],
        configuration={"delta.columnMapping.mode": "name"},
    )
    rename_delta_column(p, "s_acctbal", "acct_bal")
    out["mapped"] = {"path": p, "mapped": True}

    p = os.path.join(root, "widened")
    narrow = sup.withColumn(
        "s_suppkey", F.col("s_suppkey").cast("int")
    ).withColumn("s_acctbal", F.col("s_acctbal").cast("float"))
    write_delta(spark, narrow, p)
    widen_column_type(p, "s_suppkey", "long")
    widen_column_type(p, "s_acctbal", "double")
    write_delta(
        spark,
        narrow.withColumn("s_suppkey", F.col("s_suppkey").cast("long") + 100000)
        .withColumn("s_acctbal", F.col("s_acctbal").cast("double")),
        p,
    )
    out["widened"] = {"path": p, "widened": True}
    return out


def arm_a_delta_scan(spark, tables: dict[str, dict]) -> None:
    con = _duckdb_delta_ext()
    if con is None:
        for name in tables:
            record(f"delta_scan:{name}", "SKIP", "extension unavailable")
        return
    from value_at_risk_spark.sources.deltalog import read_delta

    for name, t in tables.items():
        try:
            foreign = con.execute(
                f"SELECT COUNT(*) FROM delta_scan('{t['path']}')"
            ).fetchone()[0]
            ours = read_delta(spark, t["path"]).count()
            record(
                f"delta_scan:{name}",
                "PASS" if foreign == ours else "FAIL",
                f"duckdb={foreign} native={ours}",
            )
        except Exception as e:
            record(f"delta_scan:{name}", "FAIL", f"{type(e).__name__}: {e}")


def arm_b_foreign_parquet(spark, tables: dict[str, dict]) -> None:
    """DuckDB (independent parquet impl) reads the exact file list our
    log publishes and must reproduce the native scan."""
    import duckdb
    from urllib.parse import unquote

    from value_at_risk_spark.sources.deltalog import read_delta, snapshot

    con = duckdb.connect()
    for name, t in tables.items():
        try:
            snap = snapshot(t["path"])
            files = [
                os.path.join(t["path"], unquote(rel))
                for rel in sorted(snap.files)
            ]
            missing = [f for f in files if not os.path.exists(f)]
            if missing:
                record(
                    f"foreign_parquet:{name}", "FAIL",
                    f"log references missing files: {missing[:3]}",
                )
                continue
            fl = ", ".join(f"'{f}'" for f in files)
            # hive_partitioning reconstructs partition columns from the
            # url-DECODED dir names — the same contract add.path encodes
            raw = con.execute(
                f"SELECT COUNT(*) FROM read_parquet([{fl}], "
                "hive_partitioning=true, union_by_name=true)"
            ).fetchone()[0]
            ours_df = read_delta(spark, t["path"])
            ours = ours_df.count()
            if t.get("dv"):
                ok = raw == ours + t["deleted"]
                detail = (
                    f"raw={raw} masked={ours} deleted={t['deleted']} "
                    "(raw - masked == committed DV cardinality)"
                )
            else:
                ok = raw == ours
                detail = f"duckdb={raw} native={ours}"
                # value-level: sum the first double col both sides
                dcol = next(
                    (
                        f.name
                        for f in ours_df.schema.fields
                        if f.dataType.simpleString() == "double"
                    ),
                    None,
                )
                if ok and dcol is not None and not t.get("mapped"):
                    fsum = con.execute(
                        f"SELECT ROUND(SUM({dcol}), 2) FROM "
                        f"read_parquet([{fl}], hive_partitioning=true, "
                        "union_by_name=true)"
                    ).fetchone()[0]
                    from pyspark.sql import functions as F

                    nsum = ours_df.agg(
                        F.round(F.sum(dcol), 2)
                    ).first()[0]
                    ok = abs(float(fsum) - float(nsum)) < 1e-6
                    detail += f"; sum({dcol}) duckdb={fsum} native={nsum}"
            record(
                f"foreign_parquet:{name}", "PASS" if ok else "FAIL", detail
            )
        except Exception as e:
            record(
                f"foreign_parquet:{name}", "FAIL",
                f"{type(e).__name__}: {e}",
            )


_ACTION_KEYS = {
    "txn", "add", "remove", "metaData", "protocol", "cdc",
    "commitInfo", "domainMetadata", "checkpointMetadata", "sidecar",
}
_Z85_RE = re.compile(
    r"^[0-9a-zA-Z.\-:+=^!/*?&<>()\[\]{}@%$#]+$"
)


def arm_c_structural(tables: dict[str, dict]) -> None:
    from urllib.parse import unquote

    from value_at_risk_spark.sources import dv as dvmod

    # z85: the ZeroMQ RFC-32 published test vector
    vec = bytes([0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B])
    ok = (
        dvmod.z85_encode(vec) == "HelloWorld"
        and dvmod.z85_decode("HelloWorld") == vec
    )
    record(
        "z85_rfc32_vector", "PASS" if ok else "FAIL",
        "encode/decode of the published 'HelloWorld' vector",
    )

    for name, t in tables.items():
        path = t["path"]
        log = os.path.join(path, "_delta_log")
        problems: list[str] = []
        commits = sorted(
            f for f in os.listdir(log) if f.endswith(".json")
            and not f.startswith("_")
        )
        want = [f"{i:020d}.json" for i in range(len(commits))]
        if commits != want:
            problems.append(f"commit names {commits} != {want}")
        for c in commits:
            with open(os.path.join(log, c)) as fh:
                for ln, line in enumerate(fh):
                    if not line.strip():
                        continue
                    try:
                        act = json.loads(line)
                    except ValueError:
                        problems.append(f"{c}:{ln} not JSON")
                        continue
                    keys = set(act)
                    if len(keys) != 1 or not keys <= _ACTION_KEYS:
                        problems.append(f"{c}:{ln} action keys {keys}")
                    if "add" in act:
                        a = act["add"]
                        rel = a["path"]
                        if rel.startswith("/") or "://" in rel:
                            problems.append(f"{c}:{ln} add.path not relative")
                        if not os.path.exists(
                            os.path.join(path, unquote(rel))
                        ):
                            problems.append(
                                f"{c}:{ln} add.path does not resolve"
                            )
                        pv = a.get("partitionValues")
                        if not isinstance(pv, dict) or any(
                            v is not None and not isinstance(v, str)
                            for v in pv.values()
                        ):
                            problems.append(
                                f"{c}:{ln} partitionValues not map[str,str]"
                            )
                        if not isinstance(a.get("size"), int) or not (
                            isinstance(a.get("modificationTime"), int)
                        ):
                            problems.append(f"{c}:{ln} add size/mtime types")
                        if "dataChange" not in a:
                            problems.append(f"{c}:{ln} add missing dataChange")
                        dv = a.get("deletionVector")
                        if dv is not None:
                            for k in (
                                "storageType", "pathOrInlineDv",
                                "sizeInBytes", "cardinality",
                            ):
                                if k not in dv:
                                    problems.append(
                                        f"{c}:{ln} DV missing {k}"
                                    )
                            if dv.get("storageType") not in ("u", "i", "p"):
                                problems.append(
                                    f"{c}:{ln} DV storageType "
                                    f"{dv.get('storageType')}"
                                )
                            if dv.get("storageType") == "u" and not (
                                _Z85_RE.match(dv["pathOrInlineDv"])
                            ):
                                problems.append(
                                    f"{c}:{ln} DV path not z85 alphabet"
                                )
                    if "protocol" in act:
                        pr = act["protocol"]
                        if not isinstance(
                            pr.get("minReaderVersion"), int
                        ) or not isinstance(pr.get("minWriterVersion"), int):
                            problems.append(f"{c}:{ln} protocol versions")
                        if pr.get("minWriterVersion") == 7 and not isinstance(
                            pr.get("writerFeatures"), list
                        ):
                            problems.append(
                                f"{c}:{ln} wv7 without writerFeatures"
                            )
                    if "metaData" in act:
                        md = act["metaData"]
                        for k in (
                            "id", "format", "schemaString",
                            "partitionColumns",
                        ):
                            if k not in md:
                                problems.append(f"{c}:{ln} metaData no {k}")
                        try:
                            json.loads(md.get("schemaString", ""))
                        except ValueError:
                            problems.append(
                                f"{c}:{ln} schemaString not JSON"
                            )
        record(
            f"log_structure:{name}",
            "FAIL" if problems else "PASS",
            "; ".join(problems[:4]) or f"{len(commits)} commits clean",
        )

        if t.get("checkpoint"):
            _check_checkpoint(path, log, name)
        if t.get("dv"):
            _check_dv_bins(path, log, name)
        if t.get("cdf"):
            _check_cdf_files(path, name)


def _check_checkpoint(path: str, log: str, name: str) -> None:
    import pyarrow.parquet as pq

    problems: list[str] = []
    lc = os.path.join(log, "_last_checkpoint")
    if not os.path.exists(lc):
        problems.append("no _last_checkpoint")
    else:
        hint = json.load(open(lc))
        if not isinstance(hint.get("version"), int) or not isinstance(
            hint.get("size"), int
        ):
            problems.append(f"_last_checkpoint fields {hint}")
        cps = [
            f for f in os.listdir(log)
            if ".checkpoint" in f and f.endswith(".parquet")
        ]
        if not cps:
            problems.append("no checkpoint parquet")
        for cp in cps:
            # pyarrow: an independent parquet reader for the CHECKPOINT
            tbl = pq.read_table(os.path.join(log, cp))
            cols = set(tbl.schema.names)
            missing = {"add", "metaData", "protocol", "txn"} - cols
            if missing:
                problems.append(f"{cp} missing action columns {missing}")
            n_actions = sum(
                1
                for c in (
                    "add", "metaData", "protocol", "txn",
                    "domainMetadata", "checkpointMetadata",
                )
                if c in cols
                for v in tbl.column(c).to_pylist()
                if v is not None
            )
            if hint.get("v2Checkpoint"):
                # v2: file actions live in sidecars named by the
                # manifest — each must be pyarrow-readable and their
                # add rows count toward _last_checkpoint.size
                if "sidecar" not in cols:
                    problems.append(f"{cp} v2 manifest without sidecar col")
                    continue
                for sc in tbl.column("sidecar").to_pylist():
                    if sc is None:
                        continue
                    sp = os.path.join(log, "_sidecars", sc["path"])
                    if not os.path.exists(sp):
                        problems.append(f"sidecar {sc['path']} missing")
                        continue
                    stbl = pq.read_table(sp)
                    n_actions += sum(
                        1
                        for v in stbl.column("add").to_pylist()
                        if v is not None
                    )
            if (
                hint.get("size") is not None
                and "parts" not in hint
                and n_actions != hint["size"]
            ):
                problems.append(
                    f"{cp} action rows {n_actions} != "
                    f"_last_checkpoint.size {hint['size']}"
                )
    record(
        f"checkpoint_structure:{name}",
        "FAIL" if problems else "PASS",
        "; ".join(problems[:3]) or "pyarrow-read checkpoint conforms",
    )


def _check_dv_bins(path: str, log: str, name: str) -> None:
    from value_at_risk_spark.sources import dv as dvmod

    problems: list[str] = []
    checked = 0
    for c in sorted(os.listdir(log)):
        if not c.endswith(".json"):
            continue
        with open(os.path.join(log, c)) as fh:
            for line in fh:
                if '"deletionVector"' not in line:
                    continue
                act = json.loads(line)
                a = act.get("add") or act.get("remove") or {}
                desc = a.get("deletionVector")
                if not desc or desc["storageType"] != "u":
                    continue
                bin_path = dvmod.dv_abs_path(path, desc)
                if bin_path is None or not os.path.exists(bin_path):
                    problems.append(f"{c}: DV bin missing")
                    continue
                raw = open(bin_path, "rb").read()
                if raw[0] != 1:
                    problems.append(f"{c}: DV format version {raw[0]} != 1")
                off = desc["offset"]
                (size,) = struct.unpack_from(">i", raw, off)
                data = raw[off + 4 : off + 4 + size]
                (crc,) = struct.unpack_from(">I", raw, off + 4 + size)
                if zlib.crc32(data) & 0xFFFFFFFF != crc:
                    problems.append(f"{c}: DV CRC-32 mismatch")
                (magic,) = struct.unpack_from("<i", data, 0)
                if magic != dvmod.MAGIC_NUMBER:
                    problems.append(f"{c}: DV magic {magic}")
                vals = dvmod.deserialize_rbm_array(data)
                if len(vals) != desc["cardinality"]:
                    problems.append(
                        f"{c}: cardinality {desc['cardinality']} != "
                        f"decoded {len(vals)}"
                    )
                checked += 1
    record(
        f"dv_bin_structure:{name}",
        "FAIL" if problems or not checked else "PASS",
        "; ".join(problems[:3])
        or f"{checked} DV bins: version/magic/CRC-32/cardinality conform",
    )


def _check_cdf_files(path: str, name: str) -> None:
    import duckdb

    cd = os.path.join(path, "_change_data")
    problems: list[str] = []
    if not os.path.isdir(cd):
        problems.append("no _change_data dir")
    else:
        files = [
            os.path.join(r, f)
            for r, _d, fs in os.walk(cd)
            for f in fs
            if f.endswith(".parquet")
        ]
        if not files:
            problems.append("no cdc parquet files")
        con = duckdb.connect()
        for f in files:
            cols = [
                r[0]
                for r in con.execute(
                    f"DESCRIBE SELECT * FROM read_parquet('{f}')"
                ).fetchall()
            ]
            if "_change_type" not in cols:
                problems.append(f"{os.path.basename(f)} no _change_type")
    record(
        f"cdf_structure:{name}",
        "FAIL" if problems else "PASS",
        "; ".join(problems[:3]) or "cdc parquet readable by duckdb",
    )


def _pq_write(path: str, cols: dict, schema=None) -> int:
    """Write a small parquet data file with pyarrow (NOT through the
    engine's writer) and return its size."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pa.table(cols, schema=schema)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    pq.write_table(t, path)
    return os.stat(path).st_size


def _log_write(table: str, version: int, actions: list[dict]) -> None:
    log = os.path.join(table, "_delta_log")
    os.makedirs(log, exist_ok=True)
    with open(os.path.join(log, f"{version:020d}.json"), "w") as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")


def _meta(schema_fields: list[dict], part_cols=None, conf=None) -> dict:
    return {
        "metaData": {
            "id": "foreign-fixture",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": json.dumps(
                {"type": "struct", "fields": schema_fields}
            ),
            "partitionColumns": part_cols or [],
            "configuration": conf or {},
        }
    }


def _plain_fields(*nts) -> list[dict]:
    return [
        {"name": n, "type": t, "nullable": True, "metadata": {}}
        for n, t in nts
    ]


def arm_d_foreign_fixtures(spark, root: str) -> None:
    """arm D — spec-derived FOREIGN-SHAPED fixtures, read by the
    native reader. A genuinely foreign engine (delta-rs, delta-spark,
    DuckDB's delta extension) is unavailable in this environment
    (network-blocked), so these fixtures are authored DIRECTLY from
    PROTOCOL.md with pyarrow + hand-written JSON — never through this
    engine's writer — using representational choices our writer does
    not emit (inline and absolute-path DV descriptors, multi-part
    checkpoints with no surviving JSON commits, checkpoint rows with
    foreign *_parsed extra columns, misleading file column names under
    field-id mapping, a custom materialized row-id column name,
    foreign-ordered stats JSON with unknown extra keys). PASS means
    the READER consumes layouts it has never produced — the inverse
    direction of arms A-C's writer-side checks."""
    import numpy as np

    from value_at_risk_spark.sources import dv as dvmod
    from value_at_risk_spark.sources.deltalog import (
        read_delta,
        read_delta_row_ids,
    )

    # --- 1. inline DV (storageType "i") ---------------------------------
    try:
        t = os.path.join(root, "fix_inline_dv")
        size = _pq_write(
            os.path.join(t, "part-0.parquet"),
            {"id": list(range(10)), "v": [float(i) for i in range(10)]},
        )
        data = dvmod.serialize_rbm_array(np.array([1, 3], dtype=np.uint64))
        pad = (-len(data)) % 4
        desc = {
            "storageType": "i",
            "pathOrInlineDv": dvmod.z85_encode(data + b"\x00" * pad),
            "offset": None,
            "sizeInBytes": len(data),
            "cardinality": 2,
        }
        _log_write(t, 0, [
            {"commitInfo": {"timestamp": 0, "operation": "WRITE"}},
            {"protocol": {
                "minReaderVersion": 3, "minWriterVersion": 7,
                "readerFeatures": ["deletionVectors"],
                "writerFeatures": ["deletionVectors"],
            }},
            _meta(_plain_fields(("id", "long"), ("v", "double"))),
            {"add": {
                "path": "part-0.parquet", "partitionValues": {},
                "size": size, "modificationTime": 0, "dataChange": True,
                "deletionVector": desc,
            }},
        ])
        got = sorted(r.id for r in read_delta(spark, t).collect())
        assert got == [i for i in range(10) if i not in (1, 3)], got
        record("foreign_fixture_read:inline_dv", "PASS", "8 rows masked")
    except Exception as e:  # noqa: BLE001
        record("foreign_fixture_read:inline_dv", "FAIL", f"{e!r}"[:200])

    # --- 2. absolute-path DV (storageType "p"), foreign bin bytes -------
    try:
        t = os.path.join(root, "fix_abs_dv")
        size = _pq_write(
            os.path.join(t, "part-0.parquet"),
            {"id": list(range(6))},
        )
        data = dvmod.serialize_rbm_array(np.array([0, 5], dtype=np.uint64))
        dv_abs = os.path.join(root, "external_dv.bin")
        with open(dv_abs, "wb") as fh:  # format: ver byte @0, then @off
            fh.write(b"\x01")
            fh.write(struct.pack(">i", len(data)))
            fh.write(data)
            fh.write(struct.pack(">I", zlib.crc32(data) & 0xFFFFFFFF))
        _log_write(t, 0, [
            {"commitInfo": {"timestamp": 0, "operation": "WRITE"}},
            {"protocol": {
                "minReaderVersion": 3, "minWriterVersion": 7,
                "readerFeatures": ["deletionVectors"],
                "writerFeatures": ["deletionVectors"],
            }},
            _meta(_plain_fields(("id", "long"))),
            {"add": {
                "path": "part-0.parquet", "partitionValues": {},
                "size": size, "modificationTime": 0, "dataChange": True,
                "deletionVector": {
                    "storageType": "p", "pathOrInlineDv": dv_abs,
                    "offset": 1, "sizeInBytes": len(data),
                    "cardinality": 2,
                },
            }},
        ])
        got = sorted(r.id for r in read_delta(spark, t).collect())
        assert got == [1, 2, 3, 4], got
        record("foreign_fixture_read:abs_path_dv", "PASS", "masked via p")
    except Exception as e:  # noqa: BLE001
        record("foreign_fixture_read:abs_path_dv", "FAIL", f"{e!r}"[:200])

    # --- 3. 'name' mapping, physical partition dir key ------------------
    try:
        t = os.path.join(root, "fix_mapped_name")
        size = _pq_write(
            os.path.join(t, "pcol-7aa=5", "part-0.parquet"),
            {"col-xy.z": [1, 2, 3], "col-w w": [1.5, 2.5, 3.5]},
        )
        fields = [
            {"name": "id", "type": "long", "nullable": True,
             "metadata": {"delta.columnMapping.id": 1,
                          "delta.columnMapping.physicalName": "col-xy.z"}},
            {"name": "val", "type": "double", "nullable": True,
             "metadata": {"delta.columnMapping.id": 2,
                          "delta.columnMapping.physicalName": "col-w w"}},
            {"name": "part", "type": "integer", "nullable": True,
             "metadata": {"delta.columnMapping.id": 3,
                          "delta.columnMapping.physicalName": "pcol-7aa"}},
        ]
        _log_write(t, 0, [
            {"commitInfo": {"timestamp": 0, "operation": "WRITE"}},
            {"protocol": {
                "minReaderVersion": 2, "minWriterVersion": 5,
            }},
            {**_meta(fields, part_cols=["part"],
                     conf={"delta.columnMapping.mode": "name",
                           "delta.columnMapping.maxColumnId": "3"})},
            {"add": {
                "path": "pcol-7aa%3D5/part-0.parquet",
                "partitionValues": {"pcol-7aa": "5"},
                "size": size, "modificationTime": 0, "dataChange": True,
            }},
        ])
        rows = sorted(
            (r.id, r.val, r.part)
            for r in read_delta(spark, t).collect()
        )
        assert rows == [(1, 1.5, 5), (2, 2.5, 5), (3, 3.5, 5)], rows
        record(
            "foreign_fixture_read:mapped_name_partitioned", "PASS",
            "physical cols + physical partition key resolved",
        )
    except Exception as e:  # noqa: BLE001
        record(
            "foreign_fixture_read:mapped_name_partitioned", "FAIL",
            f"{e!r}"[:200],
        )

    # --- 4. 'id' mapping, misleading file column names ------------------
    try:
        import pyarrow as pa

        t = os.path.join(root, "fix_mapped_id")
        schema = pa.schema([
            pa.field("totally_wrong", pa.int64(),
                     metadata={b"PARQUET:field_id": b"1"}),
            pa.field("also_wrong", pa.float64(),
                     metadata={b"PARQUET:field_id": b"2"}),
        ])
        size = _pq_write(
            os.path.join(t, "part-0.parquet"),
            {"totally_wrong": [7, 8], "also_wrong": [0.5, 1.5]},
            schema=schema,
        )
        fields = [
            {"name": "id", "type": "long", "nullable": True,
             "metadata": {"delta.columnMapping.id": 1,
                          "delta.columnMapping.physicalName": "col-a"}},
            {"name": "v", "type": "double", "nullable": True,
             "metadata": {"delta.columnMapping.id": 2,
                          "delta.columnMapping.physicalName": "col-b"}},
        ]
        _log_write(t, 0, [
            {"commitInfo": {"timestamp": 0, "operation": "WRITE"}},
            {"protocol": {
                "minReaderVersion": 3, "minWriterVersion": 7,
                "readerFeatures": ["columnMapping"],
                "writerFeatures": ["columnMapping"],
            }},
            {**_meta(fields,
                     conf={"delta.columnMapping.mode": "id",
                           "delta.columnMapping.maxColumnId": "2"})},
            {"add": {
                "path": "part-0.parquet", "partitionValues": {},
                "size": size, "modificationTime": 0, "dataChange": True,
            }},
        ])
        rows = sorted((r.id, r.v) for r in read_delta(spark, t).collect())
        assert rows == [(7, 0.5), (8, 1.5)], rows
        record(
            "foreign_fixture_read:mapped_id_wrong_names", "PASS",
            "resolved by field id, not name",
        )
    except Exception as e:  # noqa: BLE001
        record(
            "foreign_fixture_read:mapped_id_wrong_names", "FAIL",
            f"{e!r}"[:200],
        )

    # --- 4b. 'name' mapping with NESTED physical names ------------------
    try:
        import pyarrow as pa

        t = os.path.join(root, "fix_mapped_nested")
        size = _pq_write(
            os.path.join(t, "part-0.parquet"),
            {
                "col-s": pa.array(
                    [
                        {"n.x y": 10, "n z": "u"},
                        {"n.x y": 20, "n z": "v"},
                    ],
                    type=pa.struct(
                        [("n.x y", pa.int64()), ("n z", pa.string())]
                    ),
                ),
                "col-l": pa.array(
                    [[{"q 1": 1.5}], [{"q 1": 2.5}]],
                    type=pa.list_(pa.struct([("q 1", pa.float64())])),
                ),
            },
        )
        fields = [
            {"name": "s", "nullable": True,
             "metadata": {"delta.columnMapping.id": 1,
                          "delta.columnMapping.physicalName": "col-s"},
             "type": {"type": "struct", "fields": [
                 {"name": "a", "type": "long", "nullable": True,
                  "metadata": {"delta.columnMapping.id": 2,
                               "delta.columnMapping.physicalName":
                                   "n.x y"}},
                 {"name": "b", "type": "string", "nullable": True,
                  "metadata": {"delta.columnMapping.id": 3,
                               "delta.columnMapping.physicalName":
                                   "n z"}},
             ]}},
            {"name": "lst", "nullable": True,
             "metadata": {"delta.columnMapping.id": 4,
                          "delta.columnMapping.physicalName": "col-l"},
             "type": {"type": "array", "containsNull": True,
                      "elementType": {"type": "struct", "fields": [
                          {"name": "p", "type": "double",
                           "nullable": True,
                           "metadata": {
                               "delta.columnMapping.id": 5,
                               "delta.columnMapping.physicalName":
                                   "q 1"}},
                      ]}}},
        ]
        _log_write(t, 0, [
            {"commitInfo": {"timestamp": 0, "operation": "WRITE"}},
            {"protocol": {
                "minReaderVersion": 2, "minWriterVersion": 5,
            }},
            {**_meta(fields,
                     conf={"delta.columnMapping.mode": "name",
                           "delta.columnMapping.maxColumnId": "5"})},
            {"add": {
                "path": "part-0.parquet", "partitionValues": {},
                "size": size, "modificationTime": 0, "dataChange": True,
            }},
        ])
        got = read_delta(spark, t)
        assert got.schema["s"].dataType.fieldNames() == ["a", "b"]
        assert got.schema["lst"].dataType.elementType.fieldNames() == ["p"]
        rows = sorted(
            (r.s.a, r.s.b, r.lst[0].p) for r in got.collect()
        )
        assert rows == [(10, "u", 1.5), (20, "v", 2.5)], rows
        record(
            "foreign_fixture_read:mapped_nested_struct", "PASS",
            "nested physical names (dots/spaces) renamed logically",
        )
    except Exception as e:  # noqa: BLE001
        record(
            "foreign_fixture_read:mapped_nested_struct", "FAIL",
            f"{e!r}"[:200],
        )

    # --- 5. multi-part checkpoint, no JSON commits ----------------------
    try:
        import pyarrow as pa
        import pyarrow.parquet as pq

        t = os.path.join(root, "fix_multipart_cp")
        size = _pq_write(
            os.path.join(t, "part-0.parquet"), {"id": [1, 2, 3]}
        )
        log = os.path.join(t, "_delta_log")
        os.makedirs(log)
        # explicit Arrow schema: partitionValues/configuration as
        # map<string,string> like real checkpoints (inference would
        # type an empty dict as a zero-field struct, unwritable)
        smap = pa.map_(pa.string(), pa.string())
        proto_schema = pa.schema([
            pa.field("protocol", pa.struct([
                pa.field("minReaderVersion", pa.int32()),
                pa.field("minWriterVersion", pa.int32()),
            ])),
            pa.field("metaData", pa.struct([
                pa.field("id", pa.string()),
                pa.field("format", pa.struct(
                    [pa.field("provider", pa.string())]
                )),
                pa.field("schemaString", pa.string()),
                pa.field("partitionColumns", pa.list_(pa.string())),
                pa.field("configuration", smap),
            ])),
        ])
        proto_t = pa.table(
            {
                "protocol": [
                    {"minReaderVersion": 1, "minWriterVersion": 2},
                    None,
                ],
                "metaData": [
                    None,
                    {"id": "mp", "format": {"provider": "parquet"},
                     "schemaString": json.dumps({
                         "type": "struct",
                         "fields": _plain_fields(("id", "long"))}),
                     "partitionColumns": [], "configuration": []},
                ],
            },
            schema=proto_schema,
        )
        adds_schema = pa.schema([
            pa.field("add", pa.struct([
                pa.field("path", pa.string()),
                pa.field("partitionValues", smap),
                pa.field("size", pa.int64()),
                pa.field("modificationTime", pa.int64()),
                pa.field("dataChange", pa.bool_()),
                # foreign writers add *_parsed columns — must be ignored
                pa.field("partitionValues_parsed", pa.struct(
                    [pa.field("__dummy", pa.string())]
                )),
            ])),
        ])
        adds_t = pa.table(
            {
                "add": [{
                    "path": "part-0.parquet", "partitionValues": [],
                    "size": size, "modificationTime": 0,
                    "dataChange": True,
                    "partitionValues_parsed": {"__dummy": None},
                }],
            },
            schema=adds_schema,
        )
        pq.write_table(
            proto_t,
            os.path.join(
                log, f"{3:020d}.checkpoint.{1:010d}.{2:010d}.parquet"
            ),
        )
        pq.write_table(
            adds_t,
            os.path.join(
                log, f"{3:020d}.checkpoint.{2:010d}.{2:010d}.parquet"
            ),
        )
        with open(os.path.join(log, "_last_checkpoint"), "w") as fh:
            json.dump({"version": 3, "size": 3, "parts": 2}, fh)
        got = sorted(r.id for r in read_delta(spark, t).collect())
        assert got == [1, 2, 3], got
        record(
            "foreign_fixture_read:multipart_checkpoint_bootstrap",
            "PASS", "2-part checkpoint, zero JSON commits",
        )
    except Exception as e:  # noqa: BLE001
        record(
            "foreign_fixture_read:multipart_checkpoint_bootstrap",
            "FAIL", f"{e!r}"[:200],
        )

    # --- 6. row tracking: foreign materialized column name --------------
    try:
        t = os.path.join(root, "fix_rowtrack")
        s1 = _pq_write(
            os.path.join(t, "fresh.parquet"), {"id": [10, 11]}
        )
        s2 = _pq_write(
            os.path.join(t, "rewritten.parquet"),
            {"id": [20, 21], "_weird_rid_col": [900, 901]},
        )
        _log_write(t, 0, [
            {"commitInfo": {"timestamp": 0, "operation": "WRITE"}},
            # rowTracking is a WRITER feature per the spec: readers
            # that don't understand row ids can still read the data
            {"protocol": {
                "minReaderVersion": 1, "minWriterVersion": 7,
                "writerFeatures": ["rowTracking", "domainMetadata"],
            }},
            _meta(
                _plain_fields(("id", "long")),
                conf={
                    "delta.enableRowTracking": "true",
                    "delta.rowTracking.materializedRowIdColumnName":
                        "_weird_rid_col",
                },
            ),
            {"domainMetadata": {
                "domain": "delta.rowTracking",
                "configuration": json.dumps({"rowIdHighWaterMark": 901}),
                "removed": False,
            }},
            {"add": {"path": "fresh.parquet", "partitionValues": {},
                     "size": s1, "modificationTime": 0,
                     "dataChange": True, "baseRowId": 0,
                     "defaultRowCommitVersion": 0}},
            {"add": {"path": "rewritten.parquet", "partitionValues": {},
                     "size": s2, "modificationTime": 0,
                     "dataChange": True, "baseRowId": 100,
                     "defaultRowCommitVersion": 0}},
        ])
        rid = {
            r.id: r.row_id
            for r in read_delta_row_ids(spark, t).collect()
        }
        assert rid == {10: 0, 11: 1, 20: 900, 21: 901}, rid
        record(
            "foreign_fixture_read:rowtracking_foreign_matcol", "PASS",
            "fresh=base+pos, rewritten=materialized column",
        )
    except Exception as e:  # noqa: BLE001
        record(
            "foreign_fixture_read:rowtracking_foreign_matcol", "FAIL",
            f"{e!r}"[:200],
        )

    # --- 7. foreign stats JSON: extra keys, unusual order ---------------
    try:
        t = os.path.join(root, "fix_stats")
        sizes = []
        for i, lo in enumerate((0, 100)):
            sizes.append(_pq_write(
                os.path.join(t, f"part-{i}.parquet"),
                {"id": list(range(lo, lo + 10))},
            ))
        stats = [
            # delta-rs-style order + unknown extra keys
            json.dumps({
                "nullCount": {"id": 0},
                "maxValues": {"id": 9},
                "minValues": {"id": 0},
                "numRecords": 10,
                "tightBounds": True,
                "someFutureKey": {"x": 1},
            }),
            json.dumps({
                "numRecords": 10,
                "minValues": {"id": 100},
                "maxValues": {"id": 109},
                "nullCount": {"id": 0},
            }),
        ]
        _log_write(t, 0, [
            {"commitInfo": {"timestamp": 0, "operation": "WRITE"}},
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
            _meta(_plain_fields(("id", "long"))),
            *[{"add": {
                "path": f"part-{i}.parquet", "partitionValues": {},
                "size": sizes[i], "modificationTime": 0,
                "dataChange": True, "stats": stats[i],
            }} for i in range(2)],
        ])
        pruned = read_delta(
            spark, t, stats_filters=[("id", ">=", 100)]
        )
        assert pruned.count() == 10
        assert read_delta(spark, t).count() == 20
        record(
            "foreign_fixture_read:foreign_stats_pruning", "PASS",
            "extra keys ignored, pruning exact",
        )
    except Exception as e:  # noqa: BLE001
        record(
            "foreign_fixture_read:foreign_stats_pruning", "FAIL",
            f"{e!r}"[:200],
        )

    # --- 8. typeWidening: foreign change history, narrow files ----------
    try:
        import pyarrow as pa

        from value_at_risk_spark.sources.deltalog import (
            snapshot,
            widen_column_type,
            write_delta,
        )

        t = os.path.join(root, "fix_widened")
        size = _pq_write(
            os.path.join(t, "narrow.parquet"),
            {"id": [1, 2, 3], "v": [1.5, 2.5, 3.5]},
            schema=pa.schema(
                [("id", pa.int32()), ("v", pa.float32())]
            ),
        )
        fields = [
            # foreign history carries tableVersion (the -preview shape)
            # and an unknown future key — the reader must tolerate both
            {"name": "id", "type": "long", "nullable": True,
             "metadata": {"delta.typeChanges": [
                 {"fromType": "integer", "toType": "long",
                  "tableVersion": 0, "someFutureKey": True},
             ]}},
            {"name": "v", "type": "float", "nullable": True,
             "metadata": {}},
        ]
        _log_write(t, 0, [
            {"commitInfo": {"timestamp": 0, "operation": "WRITE"}},
            {"protocol": {
                "minReaderVersion": 3, "minWriterVersion": 7,
                "readerFeatures": ["typeWidening-preview"],
                "writerFeatures": ["typeWidening-preview"],
            }},
            _meta(fields),
            {"add": {"path": "narrow.parquet", "partitionValues": {},
                     "size": size, "modificationTime": 0,
                     "dataChange": True}},
        ])
        got = read_delta(spark, t)
        assert got.schema["id"].dataType.simpleString() == "bigint"
        assert sorted(r.id for r in got.collect()) == [1, 2, 3]
        # the native writer CONTINUES the table: widen v and append
        # wide rows beside the foreign narrow file
        widen_column_type(t, "v", "double")
        write_delta(
            spark,
            spark.createDataFrame([(2**40, 9.25)], "id long, v double"),
            t,
        )
        rows = {(r.id, r.v) for r in read_delta(spark, t).collect()}
        assert (2**40, 9.25) in rows and len(rows) == 4, rows
        sch = json.loads(snapshot(t).metadata["schemaString"])
        vch = next(f for f in sch["fields"] if f["name"] == "v")
        assert vch["metadata"]["delta.typeChanges"] == [
            {"fromType": "float", "toType": "double"}
        ]
        record(
            "foreign_fixture_read:typewidening_foreign_history", "PASS",
            "narrow files upcast; widen continues foreign history",
        )
    except Exception as e:  # noqa: BLE001
        record(
            "foreign_fixture_read:typewidening_foreign_history", "FAIL",
            f"{e!r}"[:200],
        )

    # --- 9. vacuumProtocolCheck declared by a foreign writer ------------
    try:
        from value_at_risk_spark.sources.deltalog import (
            vacuum_delta,
            write_delta,
        )

        t = os.path.join(root, "fix_vpc")
        size = _pq_write(
            os.path.join(t, "v0.parquet"), {"id": [1, 2, 3]}
        )
        _log_write(t, 0, [
            {"commitInfo": {"timestamp": 0, "operation": "WRITE"}},
            {"protocol": {
                "minReaderVersion": 3, "minWriterVersion": 7,
                "readerFeatures": ["vacuumProtocolCheck"],
                "writerFeatures": ["vacuumProtocolCheck"],
            }},
            _meta(_plain_fields(("id", "long"))),
            {"add": {"path": "v0.parquet", "partitionValues": {},
                     "size": size, "modificationTime": 0,
                     "dataChange": True}},
        ])
        assert read_delta(spark, t).count() == 3
        write_delta(
            spark,
            spark.createDataFrame([(9,)], "id long"),
            t,
            mode="overwrite",
        )
        deleted = vacuum_delta(t, retention_seconds=0.0)
        assert "v0.parquet" in deleted, deleted
        assert [r.id for r in read_delta(spark, t).collect()] == [9]
        record(
            "foreign_fixture_read:vacuum_protocol_check", "PASS",
            "declared table writable; vacuum ran post-check",
        )
    except Exception as e:  # noqa: BLE001
        record(
            "foreign_fixture_read:vacuum_protocol_check", "FAIL",
            f"{e!r}"[:200],
        )

    # --- 9b. allowColumnDefaults declared by a foreign writer -----------
    try:
        from value_at_risk_spark.sources.delta_sql import delta_sql

        t = os.path.join(root, "fix_defaults")
        size = _pq_write(
            os.path.join(t, "v0.parquet"),
            {"k": [1], "status": ["old"]},
        )
        fields = [
            {"name": "k", "type": "long", "nullable": True,
             "metadata": {}},
            {"name": "status", "type": "string", "nullable": True,
             # foreign default with an extra unknown metadata key
             "metadata": {"CURRENT_DEFAULT": "'pending'",
                          "someFutureKey": 1}},
        ]
        _log_write(t, 0, [
            {"commitInfo": {"timestamp": 0, "operation": "WRITE"}},
            {"protocol": {
                "minReaderVersion": 1, "minWriterVersion": 7,
                "writerFeatures": ["allowColumnDefaults"],
            }},
            _meta(fields),
            {"add": {"path": "v0.parquet", "partitionValues": {},
                     "size": size, "modificationTime": 0,
                     "dataChange": True}},
        ])
        delta_sql(spark, f"INSERT INTO delta.`{t}` (k) VALUES (2)")
        got = {
            r.k: r.status for r in read_delta(spark, t).collect()
        }
        assert got == {1: "old", 2: "pending"}, got
        record(
            "foreign_fixture_read:column_defaults", "PASS",
            "foreign CURRENT_DEFAULT honored on INSERT",
        )
    except Exception as e:  # noqa: BLE001
        record(
            "foreign_fixture_read:column_defaults", "FAIL",
            f"{e!r}"[:200],
        )

    # --- 10. suspended foreign row tracking -> mid-life enablement ------
    try:
        from value_at_risk_spark.sources.deltalog import (
            set_table_properties,
            write_delta,
        )

        t = os.path.join(root, "fix_rt_suspended")
        s1 = _pq_write(os.path.join(t, "a.parquet"), {"id": [1, 2]})
        s2 = _pq_write(os.path.join(t, "b.parquet"), {"id": [3, 4]})
        # the 'suspended' state the spec describes: the feature is
        # declared and adds carry ids under the recorded watermark,
        # but delta.enableRowTracking is absent
        _log_write(t, 0, [
            {"commitInfo": {"timestamp": 0, "operation": "WRITE"}},
            {"protocol": {
                "minReaderVersion": 1, "minWriterVersion": 7,
                "writerFeatures": ["rowTracking", "domainMetadata"],
            }},
            _meta(
                _plain_fields(("id", "long")),
                conf={
                    "delta.rowTracking.materializedRowIdColumnName":
                        "_foreign_rid",
                },
            ),
            {"domainMetadata": {
                "domain": "delta.rowTracking",
                "configuration": json.dumps({"rowIdHighWaterMark": 149}),
                "removed": False,
            }},
            {"add": {"path": "a.parquet", "partitionValues": {},
                     "size": s1, "modificationTime": 0,
                     "dataChange": True, "baseRowId": 0,
                     "defaultRowCommitVersion": 0,
                     "stats": json.dumps({"numRecords": 2})}},
            {"add": {"path": "b.parquet", "partitionValues": {},
                     "size": s2, "modificationTime": 0,
                     "dataChange": True, "baseRowId": 148,
                     "defaultRowCommitVersion": 0,
                     "stats": json.dumps({"numRecords": 2})}},
        ])
        set_table_properties(t, {"delta.enableRowTracking": "true"})
        rid = {
            r.id: r.row_id
            for r in read_delta_row_ids(spark, t).collect()
        }
        # foreign ids PRESERVED (within the watermark: no backfill)
        assert rid == {1: 0, 2: 1, 3: 148, 4: 149}, rid
        # new writes carve ABOVE the foreign watermark
        write_delta(spark, spark.createDataFrame([(5,)], "id long"), t)
        rid2 = {
            r.id: r.row_id
            for r in read_delta_row_ids(spark, t).collect()
        }
        assert rid2[5] > 149 and all(rid2[k] == rid[k] for k in rid)
        record(
            "foreign_fixture_read:rowtracking_suspended_enable", "PASS",
            "foreign ids kept; enablement carved above watermark",
        )
    except Exception as e:  # noqa: BLE001
        record(
            "foreign_fixture_read:rowtracking_suspended_enable", "FAIL",
            f"{e!r}"[:200],
        )


def arm_e_foreign_binary_probe() -> None:
    """arm E — bytes a FOREIGN writer actually produced (r13 verdict
    #5). Arm D's fixtures are hand-authored to spec; the residual gap
    is tables written by real delta-rs / delta-spark binaries. Those
    need a package source: probe whether any network window exists
    (PyPI for delta-rs wheels, Maven for delta-spark jars) and either
    (a) record the explicit env-blocked row the brief asks for, or
    (b) flag that vendoring just became possible so the next round
    commits golden foreign tables (DV + mapped + v2-checkpoint +
    row-tracking variants)."""
    try:
        import importlib.util

        if importlib.util.find_spec("deltalake") is not None:
            record(
                "foreign_binary_read:deltalake",
                "FAIL",
                "delta-rs IS importable but no golden tables are "
                "vendored — vendor them now",
            )
            return
    except Exception:  # noqa: BLE001
        pass
    import urllib.request

    reachable = []
    for name, url in (
        ("pypi", "https://pypi.org/simple/deltalake/"),
        ("maven", "https://repo1.maven.org/maven2/"),
    ):
        try:
            urllib.request.urlopen(url, timeout=5)
            reachable.append(name)
        except Exception:  # noqa: BLE001
            pass
    if reachable:
        record(
            "foreign_binary_read:vendor_window_open",
            "FAIL",
            f"network to {reachable} reachable — fetch delta-rs and "
            "vendor foreign golden tables this round",
        )
    else:
        record(
            "foreign_binary_read:env_blocked",
            "SKIP",
            "no foreign delta writer importable and no network to "
            "PyPI/Maven (DNS resolution fails) — real foreign bytes "
            "cannot be produced in this container; arm D's "
            "spec-authored fixtures remain the reader-side evidence",
        )


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else None
    from value_at_risk_spark.session import get_spark

    spark = get_spark()
    root = tempfile.mkdtemp(prefix="delta_interop_")
    try:
        tables = build_tables(spark, sf_dir, root)
        arm_a_delta_scan(spark, tables)
        arm_b_foreign_parquet(spark, tables)
        arm_c_structural(tables)
        arm_d_foreign_fixtures(spark, root)
        arm_e_foreign_binary_probe()
    finally:
        shutil.rmtree(root, ignore_errors=True)
    fails = [k for k, v in RESULTS.items() if v["status"] == "FAIL"]
    passes = [k for k, v in RESULTS.items() if v["status"] == "PASS"]
    skips = [k for k, v in RESULTS.items() if v["status"] == "SKIP"]
    print(f"{len(passes)} pass / {len(fails)} fail / {len(skips)} skip")
    if out:
        with open(out, "w") as fh:
            json.dump(RESULTS, fh, indent=1, sort_keys=True)
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
