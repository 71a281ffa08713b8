"""PySpark Python Data Source over the native delta log.

Registers the ``deltalog`` format with Spark's Python Data Source API
(public since Spark 4.0), so the native transaction log
(sources/deltalog.py) plugs into the ordinary reader surfaces:

- ``spark.read.format("deltalog").load(path)`` — batch snapshot read,
  one input partition per active data file, Arrow RecordBatches
  straight off the parquet footers (zero row-at-a-time Python);
  ``option("versionAsOf", n)`` time-travels.
- ``spark.readStream.format("deltalog").load(path)`` — a Structured
  Streaming SOURCE: version numbers are the offsets, the first batch
  is the current snapshot, every subsequent micro-batch is exactly the
  rows appended by new commits (OPTIMIZE's dataChange:false rewrites
  are invisible), and the checkpoint's offset log gives end-to-end
  exactly-once with any idempotent sink. This is the consumer half of
  streaming/sinks.DeltaTxnSink.

The streaming reader uses SimpleDataSourceStreamReader — reads happen
on the driver, which Spark documents as the lightweight-rate path; the
batch reader is the distributed path (one task per file). Reference
tie: the reference streams FROM Delta tables via
``spark.readStream.format('delta')`` (config/configure_notebook.py:
18-27); this is that surface on the native log.
"""

from __future__ import annotations

import os
from typing import Iterator, Tuple
from urllib.parse import unquote

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    DataSourceStreamArrowWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType


def _required_path(options: dict) -> str:
    path = options.get("path")
    if not path:
        raise ValueError(
            "deltalog data source requires a path: "
            ".format('deltalog').load('/table/dir')"
        )
    return path


def _arrow_schema(schema: StructType):
    from pyspark.sql.pandas.types import to_arrow_schema

    return to_arrow_schema(schema)


def _field_id_of(field) -> int | None:
    """The ``PARQUET:field_id`` of a pyarrow field, or None."""
    raw = (field.metadata or {}).get(b"PARQUET:field_id")
    if raw is None:
        return None
    try:
        return int(raw)
    except (TypeError, ValueError):
        return None


def _child_index(struct_type, pj_field: dict, by_id: bool) -> int:
    """Resolve one declared child inside a file struct type: by
    PARQUET field id in 'id' mode (names are not trustworthy there —
    a file whose children carry no ids at all fails LOUD, never
    name-matched), by physical name in 'name' mode. -1 = child absent
    (nested ADD COLUMN evolution -> null-fill)."""
    if not by_id:
        return struct_type.get_field_index(pj_field["name"])
    want = (pj_field.get("metadata") or {}).get("parquet.field.id")
    if want is None:
        # a declared field with NO delta.columnMapping.id in an
        # 'id'-mode schemaString is spec-invalid — null-filling here
        # would silently misread; fail loud like read_delta's path
        raise ValueError(
            "columnMapping.mode=id: declared field "
            f"{pj_field.get('name')!r} carries no "
            "delta.columnMapping.id — cannot resolve by field id"
        )
    any_id = False
    for i in range(struct_type.num_fields):
        fid = _field_id_of(struct_type.field(i))
        if fid is not None:
            any_id = True
            if fid == want:
                return i
    if not any_id and struct_type.num_fields:
        raise ValueError(
            "columnMapping.mode=id: file struct carries no parquet "
            "field ids — cannot resolve children (name matching is "
            "forbidden in 'id' mode)"
        )
    return -1


def _mapped_rebuild(arr, pj, t, by_id: bool = False):
    """File column -> declared type on a COLUMN-MAPPED table: nested
    children resolve BY PHYSICAL NAME ('name' mode) or BY PARQUET
    FIELD ID ('id' mode) against the schemaString's physical twin
    (``pj``, a field json), missing children null-fill (nested
    ADD/DROP COLUMN evolution — the files keep dropped physical
    columns and lack added ones), and the rebuilt arrays take the
    declared LOGICAL names. pyarrow's own ``cast`` binds struct
    fields by name so it cannot perform the rename, and a purely
    positional rebuild would misalign values after a nested drop+add
    — hence resolve, then rename. ``pj['type']`` and ``t`` pair
    positionally: both derive from the same schemaString field
    list."""
    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    # pj is either a FIELD json ({"name","type",...} — unwrap) or a
    # bare TYPE json ({"type":"struct"/"array"/"map",...} — only
    # field jsons carry "name")
    pj_type = pj["type"] if isinstance(pj, dict) and "name" in pj else pj
    if pa.types.is_struct(t):
        fields_json = pj_type["fields"]
        if len(fields_json) != t.num_fields:
            raise ValueError(
                "column-mapped nested read: declared struct and its "
                "physical twin disagree on field count — corrupt "
                "schemaString?"
            )
        kids = []
        n = len(arr)
        for i in range(t.num_fields):
            tf = t.field(i)
            idx = (
                _child_index(arr.type, fields_json[i], by_id)
                if pa.types.is_struct(arr.type)
                else -1
            )
            if idx >= 0:
                kids.append(
                    _mapped_rebuild(
                        arr.field(idx), fields_json[i], tf.type, by_id
                    )
                )
            else:
                kids.append(pa.nulls(n, type=tf.type))
        return pa.StructArray.from_arrays(
            kids,
            fields=[t.field(i) for i in range(t.num_fields)],
            mask=arr.is_null() if arr.null_count else None,
        )
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        vals = _mapped_rebuild(
            arr.values, pj_type["elementType"], t.value_type, by_id
        )
        return pa.ListArray.from_arrays(
            arr.offsets,
            vals,
            mask=arr.is_null() if arr.null_count else None,
        )
    if pa.types.is_map(t):
        keys = _mapped_rebuild(
            arr.keys, pj_type["keyType"], t.key_type, by_id
        )
        items = _mapped_rebuild(
            arr.items, pj_type["valueType"], t.item_type, by_id
        )
        offsets = arr.offsets
        if arr.null_count:
            # MapArray.from_arrays accepts no mask kwarg (unlike
            # ListArray) and .offsets drops the validity bitmap — a
            # null OFFSET entry is the documented way to mark a null
            # map; rebuild the offsets with Nones at invalid slots
            valid = arr.is_valid().to_pylist()
            raw = offsets.to_pylist()
            offsets = pa.array(
                [
                    raw[i] if i >= len(valid) or valid[i] else None
                    for i in range(len(raw))
                ],
                type=pa.int32(),
            )
        return pa.MapArray.from_arrays(offsets, keys, items).cast(t)
    return arr.cast(t)


def _col_to(arr, field_type, phys_field_json, by_id: bool = False):
    """File column -> declared type: plain ``cast`` normally; the
    resolve-and-rename rebuild on column-mapped tables whose complex
    columns hide physical nested names (``phys_field_json`` = the
    column's physical twin field json, None when unmapped)."""
    import pyarrow as pa

    if phys_field_json is not None and (
        pa.types.is_struct(field_type)
        or pa.types.is_list(field_type)
        or pa.types.is_large_list(field_type)
        or pa.types.is_map(field_type)
    ):
        return _mapped_rebuild(arr, phys_field_json, field_type, by_id)
    return arr.cast(field_type)


def _phys_field_map(snap) -> dict | None:
    """``{"mode": 'name'|'id', "fields": {logical top name ->
    physical twin field json}}`` for a column-mapped snapshot (what
    the batch builders resolve file columns and nested children by —
    'id' mode resolves by parquet field id). None when the table is
    unmapped."""
    import json as _json

    from value_at_risk_spark.sources.deltalog import (
        _cm_mode,
        _phys_field_json,
    )

    mode = _cm_mode(snap)
    if mode == "none":
        return None
    return {
        "mode": mode,
        "fields": {
            f["name"]: _phys_field_json(f, keep_ids=True)
            for f in _json.loads(snap.metadata["schemaString"])["fields"]
        },
    }


def _resolve_file_column(tbl, pf: dict, by_id: bool):
    """Top-level file column for a physical twin field json, or None
    (schema evolution -> null-fill). 'id' mode resolves by parquet
    field id and fails LOUD on files carrying no ids at all."""
    if not by_id:
        if pf["name"] in tbl.schema.names:
            return tbl.column(pf["name"])
        return None
    want = (pf.get("metadata") or {}).get("parquet.field.id")
    if want is None:
        raise ValueError(
            "columnMapping.mode=id: declared column "
            f"{pf.get('name')!r} carries no delta.columnMapping.id "
            "— cannot resolve by field id"
        )
    any_id = False
    for i, f in enumerate(tbl.schema):
        fid = _field_id_of(f)
        if fid is not None:
            any_id = True
            if fid == want:
                return tbl.column(i)
    if not any_id and len(tbl.schema):
        raise ValueError(
            "columnMapping.mode=id: data file carries no parquet "
            "field ids — cannot resolve columns (name matching is "
            "forbidden in 'id' mode)"
        )
    return None


def _file_to_batches(
    abs_path: str,
    part_values: dict,
    schema: StructType,
    partition_columns: list[str],
    row_groups: list[int] | None = None,
    phys_map: dict | None = None,
    dv_deleted=None,
    row_offset: int = 0,
):
    """One data file -> Arrow RecordBatches in the declared column
    order, with partition columns materialized as constant arrays cast
    from their Hive string values by the TABLE schema (never
    re-inferred). ``phys_map`` (column-mapped tables): logical top
    name -> physical twin field json — file columns resolve by its
    physical names (nested children included via _mapped_rebuild).
    ``dv_deleted`` (sorted uint64 physical row indexes) masks
    deletion-vector rows out of the batch; ``row_offset`` is the
    physical index of this slice's first row (non-zero for row-group
    splits)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    want = _arrow_schema(schema)
    if row_groups is None:
        tbl = pq.read_table(abs_path)
    else:
        tbl = pq.ParquetFile(abs_path).read_row_groups(row_groups)
    if dv_deleted is not None and len(dv_deleted):
        import numpy as np

        from value_at_risk_spark.sources.dv import keep_mask

        mask = keep_mask(
            np.arange(row_offset, row_offset + tbl.num_rows, dtype=np.uint64),
            dv_deleted,
        )
        tbl = tbl.filter(pa.array(mask))
    n = tbl.num_rows
    by_id = phys_map is not None and phys_map["mode"] == "id"
    cols = []
    for field in want:
        # column-mapped tables: the file and partitionValues carry the
        # PHYSICAL name; the emitted schema stays logical
        pf = (phys_map["fields"] if phys_map else {}).get(field.name)
        src = pf["name"] if pf is not None else field.name
        if src in partition_columns:
            raw = part_values.get(src)
            if raw is None:
                arr = pa.nulls(n, type=field.type)
            else:
                arr = pa.array([raw] * n, type=pa.string()).cast(field.type)
        else:
            raw_col = (
                _resolve_file_column(tbl, pf, by_id)
                if pf is not None
                else (
                    tbl.column(field.name)
                    if field.name in tbl.schema.names
                    else None
                )
            )
            if raw_col is not None:
                arr = _col_to(raw_col, field.type, pf, by_id)
            else:
                # schema evolution: files written before a
                # merge_schema / ADD COLUMNS lack the column —
                # null-fill like read_delta (parquet's additive
                # evolution), never KeyError
                arr = pa.nulls(n, type=field.type)
        cols.append(arr)
    out = pa.table(cols, schema=want)
    yield from out.to_batches()


class _DeltaFilePartition(InputPartition):
    def __init__(
        self,
        abs_path: str,
        part_values: dict,
        row_groups: list[int] | None = None,
        dv_deleted=None,
        row_offset: int = 0,
    ):
        self.abs_path = abs_path
        self.part_values = part_values
        self.row_groups = row_groups  # None = whole file
        # deletion vector: sorted uint64 deleted PHYSICAL row indexes
        # (decoded once on the driver — compact, rides the pickled
        # partition descriptor) + this slice's first physical row
        self.dv_deleted = dv_deleted
        self.row_offset = row_offset


class _DeltaCdfPartition(InputPartition):
    """One change-data file of one commit: ``kind`` is 'cdc' (the
    _change_type column is IN the file) or 'insert'/'delete' (derived
    from an add/remove — the constant _change_type)."""

    def __init__(
        self,
        abs_path: str,
        part_values: dict,
        kind: str,
        version: int,
        ts_ms: int,
        dv_deleted=None,
    ):
        self.abs_path = abs_path
        self.part_values = part_values
        self.kind = kind
        self.version = version
        self.ts_ms = ts_ms
        # the file VERSION's deletion vector: rows it masks were not
        # logically present, so derived inserts/deletes exclude them
        self.dv_deleted = dv_deleted


def _cdf_file_to_batches(
    part: "_DeltaCdfPartition",
    out_schema: StructType,
    partition_columns: list[str],
    phys_map: dict | None = None,
):
    """One change file -> Arrow batches in the CDF output schema:
    data columns from the file, partition columns from the log's
    partitionValues, _change_type from the file (cdc) or the
    partition's constant kind, _commit_version/_commit_timestamp as
    constants (epoch-micros cast, so the session tz never touches
    the stored instant). ``phys_map`` (column-mapped tables, 'name'
    mode): data/cdc files and partitionValues carry PHYSICAL names —
    logical top name -> physical twin field json; the emitted schema
    stays logical (the CDF metadata columns are unmapped)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    want = _arrow_schema(out_schema)
    tbl = pq.read_table(part.abs_path)
    dvd = getattr(part, "dv_deleted", None)
    if dvd is not None and len(dvd):
        import numpy as np

        from value_at_risk_spark.sources.dv import keep_mask

        tbl = tbl.filter(
            pa.array(keep_mask(np.arange(tbl.num_rows, dtype=np.uint64), dvd))
        )
    n = tbl.num_rows
    cols = []
    for field in want:
        if field.name == "_commit_version":
            arr = pa.array([part.version] * n, type=pa.int64()).cast(
                field.type
            )
        elif field.name == "_commit_timestamp":
            arr = pa.array(
                [part.ts_ms * 1000] * n, type=pa.int64()
            ).cast(field.type)
        elif field.name == "_change_type" and part.kind != "cdc":
            arr = pa.array([part.kind] * n, type=field.type)
        else:
            pf = (phys_map["fields"] if phys_map else {}).get(field.name)
            by_id = phys_map is not None and phys_map["mode"] == "id"
            src = pf["name"] if pf is not None else field.name
            if src in partition_columns:
                raw = part.part_values.get(src)
                if raw is None:
                    arr = pa.nulls(n, type=field.type)
                else:
                    arr = pa.array([raw] * n, type=pa.string()).cast(
                        field.type
                    )
            else:
                raw_col = (
                    _resolve_file_column(tbl, pf, by_id)
                    if pf is not None
                    else (
                        tbl.column(field.name)
                        if field.name in tbl.schema.names
                        else None
                    )
                )
                if raw_col is not None:
                    arr = _col_to(raw_col, field.type, pf, by_id)
                else:
                    # pre-schema-evolution change files lack the column
                    arr = pa.nulls(n, type=field.type)
        cols.append(arr)
    yield from pa.table(cols, schema=want).to_batches()


def _cdf_partitions_for_range(
    path: str, from_v: int, to_v: int
) -> list[_DeltaCdfPartition]:
    """Flatten a _change_plan into per-file CDF partitions (the batch
    reader's split; also the stream reader's per-batch file list)."""
    from value_at_risk_spark.sources.deltalog import _change_plan
    from value_at_risk_spark.sources.dv import read_dv

    parts: list[_DeltaCdfPartition] = []
    for entry in _change_plan(path, from_v, to_v):
        v, ts = entry["version"], entry["ts_ms"]
        for kind, rels in (
            ("cdc", entry["cdc_files"]),
            ("insert", entry["add_files"]),
            ("delete", entry["rm_files"]),
        ):
            for e in rels:
                rel, pv = e[0], e[1]
                desc = e[2] if len(e) > 2 else None
                parts.append(
                    _DeltaCdfPartition(
                        os.path.normpath(
                            os.path.join(path, unquote(rel))
                        ),
                        pv,
                        kind,
                        v,
                        ts,
                        dv_deleted=(
                            read_dv(path, desc) if desc else None
                        ),
                    )
                )
    return parts


def _cdf_requested(options: dict) -> bool:
    v = options.get("readchangefeed") or options.get("readChangeFeed")
    return isinstance(v, str) and v.strip().lower() == "true"


class _DeltaCdfBatchReader(DataSourceReader):
    """Batch Change Data Feed read —
    ``spark.read.format("deltalog").option("readChangeFeed", "true")
    .option("startingVersion", n)[.option("endingVersion", m)]`` —
    one input partition per CHANGE file of each commit in range (cdc
    files, or derived add/remove files), so parallelism scales with
    the changed-file count and a version's cost is bounded by ITS
    changes, never the table. The distributed twin of
    deltalog.table_changes with identical semantics (same
    _change_plan)."""

    def __init__(self, options: dict, schema: StructType):
        from value_at_risk_spark.sources.deltalog import (
            delta_versions,
            snapshot,
        )

        self._path = _required_path(options)
        if options.get("versionAsOf") is not None:
            raise ValueError(
                "deltalog: readChangeFeed and versionAsOf are mutually "
                "exclusive (use startingVersion/endingVersion)"
            )
        sv = options.get("startingversion") or options.get(
            "startingVersion"
        )
        if sv is None:
            raise ValueError(
                "deltalog: readChangeFeed batch reads require "
                "option('startingVersion', n)"
            )
        ev = options.get("endingversion") or options.get("endingVersion")
        versions = delta_versions(self._path)
        if not versions:
            raise ValueError(
                f"deltalog: not a delta table (no _delta_log commits) "
                f"at {self._path}"
            )
        self._from_v = int(sv)
        self._to_v = int(ev) if ev is not None else versions[-1]
        self._schema = schema
        # partition layout AT THE END OF THE RANGE being read, not the
        # tip: a later repartitioning must not re-shape older changes
        end_snap = snapshot(
            self._path, version=min(self._to_v, versions[-1])
        )
        from value_at_risk_spark.sources.deltalog import (
            _cm_mode,
            _column_mapping,
            _physicalized,
        )

        # mapped tables (r13): change files and partitionValues carry
        # PHYSICAL names; emit logical through the physical-twin map
        # ('name' mode resolves nested children by physical name,
        # 'id' mode by parquet field id — _resolve_file_column)
        self._l2p = _column_mapping(end_snap)
        self._phys_map = (
            _phys_field_map(end_snap) if self._l2p is not None else None
        )
        self._partition_columns = (
            _physicalized(end_snap, self._l2p).partition_columns
            if self._l2p is not None
            else end_snap.partition_columns
        )

    def partitions(self):
        return _cdf_partitions_for_range(
            self._path, self._from_v, self._to_v
        )

    def read(self, partition):
        yield from _cdf_file_to_batches(
            partition, self._schema, self._partition_columns,
            phys_map=self._phys_map,
        )


class _DeltaMultiFilePartition(InputPartition):
    """A bin-packed group of small files read by one task."""

    def __init__(self, files: list[_DeltaFilePartition]):
        self.files = files


def _hive_value_str(v) -> str | None:
    """A filter value in the string form _stage/Spark write into
    ``add.partitionValues``; None = unrepresentable (don't push).
    Timestamps use Spark's space-separated offset-free form (the
    session is pinned UTC; a tz-aware value is converted first) —
    isoformat's 'T'+offset would match no stored partition value and
    silently prune EVERY file."""
    import datetime

    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (int, str)):
        return str(v)
    if isinstance(v, datetime.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        out = v.strftime("%Y-%m-%d %H:%M:%S")
        if v.microsecond:
            out += f".{v.microsecond:06d}".rstrip("0")
        return out
    if isinstance(v, datetime.date):
        return v.isoformat()
    return None


class _DeltaBatchReader(DataSourceReader):
    """One input partition per active data file — the natural Delta
    split: parallelism scales with the file count, partition values
    ride in the partition descriptor (from the LOG, not the paths), so
    workers never list directories. Catalyst predicates arrive via
    pushFilters and prune FILES at the log level (partition values +
    footer stats); every filter is returned as residual because the
    kept files still contain non-matching rows."""

    def __init__(self, options: dict, schema: StructType):
        from value_at_risk_spark.sources.deltalog import snapshot

        self._path = _required_path(options)
        v = options.get("versionAsOf")
        self._snap = snapshot(self._path, int(v) if v is not None else None)
        from value_at_risk_spark.sources.deltalog import (
            _cm_mode,
            _column_mapping,
            _physicalized,
        )

        # mapped tables: 'name' mode resolves file columns by
        # physical name, 'id' mode by parquet field id (files lacking
        # ids fail LOUD in _resolve_file_column, never name-matched)
        self._l2p = _column_mapping(self._snap)
        self._phys_map = (
            _phys_field_map(self._snap) if self._l2p is not None else None
        )
        if self._l2p is not None:
            self._snap = _physicalized(self._snap, self._l2p)
        self._schema = schema
        self._partition_columns = self._snap.partition_columns
        self._partition_filters: dict[str, list] = {}
        self._stats_filters: list[tuple] = []

    def pushFilters(self, filters):
        from pyspark.sql.datasource import (
            EqualTo,
            GreaterThan,
            GreaterThanOrEqual,
            In,
            IsNull,
            LessThan,
            LessThanOrEqual,
        )

        ops = {
            EqualTo: "=",
            GreaterThan: ">",
            GreaterThanOrEqual: ">=",
            LessThan: "<",
            LessThanOrEqual: "<=",
        }
        part_set = set(self._partition_columns)
        for f in filters:
            attr = getattr(f, "attribute", None)
            if not attr or len(attr) != 1:
                continue
            col = attr[0]
            if self._l2p:
                col = self._l2p.get(col, col)  # filters arrive logical
            if col in part_set:
                vals = None
                if isinstance(f, EqualTo):
                    vals = [_hive_value_str(f.value)]
                elif isinstance(f, In):
                    vals = [_hive_value_str(v) for v in f.value]
                elif isinstance(f, IsNull):
                    vals = [None]
                if vals is not None and all(
                    v is not None or isinstance(f, IsNull) for v in vals
                ):
                    # AND semantics: intersect with any earlier filter
                    prev = self._partition_filters.get(col)
                    self._partition_filters[col] = (
                        vals
                        if prev is None
                        else [v for v in vals if v in prev]
                    )
            else:
                if (
                    type(f) in ops
                    and isinstance(f.value, (int, float, str))
                    and not isinstance(f.value, bool)
                ):
                    self._stats_filters.append((col, ops[type(f)], f.value))
                if isinstance(f, EqualTo):
                    # generated-column partition pruning: an equality
                    # on the SOURCE column of a generated partition
                    # column implies an equality on the partition
                    # value (Delta's own optimization for the
                    # date-partition-from-timestamp layout) —
                    # independent of the stats branch, whose
                    # numeric/str gate excludes timestamp values
                    self._derive_generated_partition(col, f.value, part_set)
        # file-level pruning only: Spark must still evaluate every
        # predicate on the surviving rows
        return filters

    def _derive_generated_partition(self, col, value, part_set) -> None:
        """If a partition column is GENERATED from ``col`` by one of
        the derivable expression shapes, an EqualTo on ``col`` prunes
        at the partition layer too — the whole point of partitioning a
        100 TB table by day(ts) while queries filter on ts. Only
        shapes whose value we can compute driver-side are derived;
        anything else is simply not pruned (never wrong, just less
        selective)."""
        import datetime
        import re as _re

        from value_at_risk_spark.sources.deltalog import (
            table_generated_columns,
        )

        colp = _re.escape(col)  # delta allows '.'/'+' in column names

        def _as_dt(v):
            if isinstance(v, datetime.datetime):
                # tz-aware values arrive as UTC instants; the
                # generation expression evaluated in the writer's
                # session tz (pinned UTC by session.py) — normalize
                # so the derived partition value matches
                if v.tzinfo is not None:
                    v = v.astimezone(datetime.timezone.utc).replace(
                        tzinfo=None
                    )
                return v
            if isinstance(v, datetime.date):
                return datetime.datetime(v.year, v.month, v.day)
            if isinstance(v, str):
                try:
                    return datetime.datetime.fromisoformat(v)
                except ValueError:
                    return None
            return None

        for g, expr in table_generated_columns(self._snap).items():
            gp = self._l2p.get(g, g) if self._l2p else g
            if gp not in part_set or gp in self._partition_filters:
                continue
            e = expr.strip()
            out = None
            m = _re.match(
                rf"^(?:CAST\s*\(\s*{colp}\s+AS\s+DATE\s*\)|"
                rf"to_date\s*\(\s*{colp}\s*\))$",
                e,
                _re.IGNORECASE,
            )
            if m:
                dt = _as_dt(value)
                out = dt.date().isoformat() if dt else None
            if out is None:
                m = _re.match(
                    rf"^(year|month|day)\s*\(\s*{colp}\s*\)$",
                    e,
                    _re.IGNORECASE,
                )
                if m:
                    dt = _as_dt(value)
                    if dt:
                        out = str(getattr(dt, m.group(1).lower()))
            if out is None:
                m = _re.match(
                    rf"^substring\s*\(\s*{colp}\s*,\s*1\s*,\s*(\d+)\s*\)$",
                    e,
                    _re.IGNORECASE,
                )
                if m and isinstance(value, str):
                    out = value[: int(m.group(1))]
            if out is not None:
                self._partition_filters[gp] = [out]

    def partitions(self):
        from value_at_risk_spark.sources.deltalog import _pruned_active

        active = _pruned_active(
            self._snap,
            self._partition_filters or None,
            self._stats_filters or None,
        )
        from value_at_risk_spark.sources.dv import read_dv

        parts = []
        for rel in active:
            pv = self._snap.files[rel].get("partitionValues") or {}
            if not isinstance(pv, dict):
                pv = dict(pv)
            desc = self._snap.files[rel].get("deletionVector")
            parts.append(
                _DeltaFilePartition(
                    os.path.normpath(
                        os.path.join(self._path, unquote(rel))
                    ),
                    pv,
                    dv_deleted=(
                        read_dv(self._path, desc) if desc else None
                    ),
                )
            )
        # many SMALL files drown the scan in per-task Python worker
        # overhead — bin-pack them into ~128 MB input partitions using
        # the add.size the log already carries (no file I/O at all)
        if len(parts) > 256:
            target = 128 << 20
            sizes = [
                int(self._snap.files[rel].get("size") or 1)
                for rel in active
            ]
            packed: list[_DeltaFilePartition] = []
            bucket: list[_DeltaFilePartition] = []
            bucket_bytes = 0
            for p, sz in zip(parts, sizes):
                bucket.append(p)
                bucket_bytes += sz
                if bucket_bytes >= target:
                    packed.append(_DeltaMultiFilePartition(bucket))
                    bucket, bucket_bytes = [], 0
            if bucket:
                packed.append(_DeltaMultiFilePartition(bucket))
            return packed
        # few big files starve the cluster at one task per file —
        # split by parquet row group (a driver-side footer read per
        # file, so only when the file count is small enough that the
        # extra metadata reads are trivially bounded)
        if 0 < len(parts) <= 64:
            import pyarrow.parquet as pq

            split = []
            for p in parts:
                try:
                    md = pq.ParquetFile(p.abs_path).metadata
                    ngr = md.num_row_groups
                except Exception:
                    ngr = 1
                if ngr <= 1:
                    split.append(p)
                else:
                    # each row-group slice needs its first PHYSICAL row
                    # index so a deletion vector still lines up
                    offset = 0
                    for g in range(ngr):
                        split.append(
                            _DeltaFilePartition(
                                p.abs_path,
                                p.part_values,
                                [g],
                                dv_deleted=p.dv_deleted,
                                row_offset=offset,
                            )
                        )
                        offset += md.row_group(g).num_rows
            parts = split
        return parts

    def read(self, partition):
        subs = (
            partition.files
            if isinstance(partition, _DeltaMultiFilePartition)
            else [partition]
        )
        for sub in subs:
            yield from _file_to_batches(
                sub.abs_path,
                sub.part_values,
                self._schema,
                self._partition_columns,
                getattr(sub, "row_groups", None),
                self._phys_map,
                getattr(sub, "dv_deleted", None),
                getattr(sub, "row_offset", 0),
            )


def _added_files_between(path: str, from_v: int, to_v: int):
    """(abs_path, partitionValues) for every data-changing add in
    commits (from_v, to_v] — the streaming delta. Data-removing
    commits raise (append-only streaming contract, same as
    read_delta_changes); cleaned commits raise (the change record is
    gone)."""
    import json

    from value_at_risk_spark.sources.deltalog import (
        _commit_path,
        _json_versions,
    )

    jsons = set(_json_versions(path))
    out = []
    for v in range(from_v + 1, to_v + 1):
        if v not in jsons:
            raise ValueError(
                f"deltalog stream: commit {v} was cleaned from the log; "
                "its changes are no longer recoverable"
            )
        with open(_commit_path(path, v)) as fh:
            for line in fh:
                if not line.strip():
                    continue
                a = json.loads(line)
                if a.get("remove") and a["remove"].get("dataChange", True):
                    raise ValueError(
                        f"deltalog stream: version {v} removes data "
                        "(overwrite/restore/DML) — not expressible as "
                        "appended rows"
                    )
                add = a.get("add")
                if add and add.get("deletionVector"):
                    # a DV-carrying add is a data REMOVAL in disguise
                    raise ValueError(
                        f"deltalog stream: version {v} attaches a "
                        "deletion vector — not expressible as appended "
                        "rows"
                    )
                if add and add.get("dataChange", True):
                    pv = add.get("partitionValues") or {}
                    out.append(
                        (
                            os.path.normpath(
                                os.path.join(path, unquote(add["path"]))
                            ),
                            dict(pv) if not isinstance(pv, dict) else pv,
                        )
                    )
    return out


class _DeltaStreamReader(SimpleDataSourceStreamReader):
    """Structured Streaming source over the native log. Offsets are
    {"version": n}: the initial batch snapshots the table as of the
    stream's start, then each micro-batch carries exactly the rows
    added by commits in (start, tip]. readBetweenOffsets re-reads a
    range deterministically from the immutable log, which is what
    makes checkpoint recovery exactly-once.

    Scale knobs (the same levers Delta's own source exposes):

    - ``option("startingVersion", n | "latest")`` — skip the initial
      table snapshot and consume only commits AFTER n (or after the
      tip at stream start). At 100 TB the snapshot batch is the whole
      table through the driver; a tailing consumer should start at
      the tip.
    - ``option("maxVersionsPerBatch", n)`` — cap each micro-batch at
      n commits, so a consumer catching up after downtime drains the
      backlog in bounded batches instead of one giant one.
    - ``option("readChangeFeed", "true")`` — emit the Change Data
      Feed instead of appended rows: table columns + _change_type /
      _commit_version / _commit_timestamp per commit (cdc actions
      preferred, add/remove derivation otherwise — same _change_plan
      as table_changes), so DML commits stream as row-level changes
      instead of raising. Without startingVersion a CDF stream tails
      from the CURRENT tip (Delta's own default for CDF streams);
      with it, this source's AFTER-n offset semantics apply in CDF
      mode too (the batch CDF reader, like table_changes, is
      inclusive of startingVersion)."""

    def __init__(self, options: dict, schema: StructType):
        from value_at_risk_spark.sources.deltalog import (
            _cm_mode,
            _column_mapping,
            _physicalized,
            snapshot as _snap_fn,
        )

        self._path = _required_path(options)
        self._schema = schema
        self._cdf = _cdf_requested(options)
        snap0 = _snap_fn(self._path)
        # mapped tables (r13): physicalize like the batch DS reader —
        # files and partitionValues carry physical names; emitted rows
        # stay logical via the physical-twin map ('id' mode resolves
        # by parquet field id in _resolve_file_column)
        self._l2p = _column_mapping(snap0)
        self._phys_map = (
            _phys_field_map(snap0) if self._l2p is not None else None
        )
        self._part_cols = (
            _physicalized(snap0, self._l2p).partition_columns
            if self._l2p is not None
            else snap0.partition_columns
        )
        sv = options.get("startingversion") or options.get(
            "startingVersion"
        )
        if sv is None:
            # CDF streams tail from the tip by default — the "initial
            # whole-table snapshot" batch has no change-typed meaning
            self._starting = snap0.version if self._cdf else None
        elif str(sv).lower() == "latest":
            from value_at_risk_spark.sources.deltalog import delta_versions

            vs = delta_versions(self._path)
            self._starting = vs[-1] if vs else -1
        else:
            self._starting = int(sv)
        mv = options.get("maxversionsperbatch") or options.get(
            "maxVersionsPerBatch"
        )
        self._max_versions = int(mv) if mv is not None else None
        if self._max_versions is not None and self._max_versions < 1:
            raise ValueError("maxVersionsPerBatch must be >= 1")

    def initialOffset(self) -> dict:
        if self._starting is not None:
            return {"version": self._starting}
        return {"version": -1}

    def _rows_for_files(self, files) -> Iterator[Tuple]:
        # partitioning cannot change under this append-only stream
        # (overwrites are rejected) — re-snapshotting the whole log
        # per micro-batch just for this list grows driver latency
        # with table history for nothing
        part_cols = self._part_cols
        names = [f.name for f in self._schema.fields]
        for entry in files:
            abs_path, pv = entry[0], entry[1]
            dv_deleted = entry[2] if len(entry) > 2 else None
            for batch in _file_to_batches(
                abs_path, pv, self._schema, part_cols,
                phys_map=self._phys_map, dv_deleted=dv_deleted,
            ):
                for row in batch.to_pylist():
                    yield tuple(row[n] for n in names)

    def _snapshot_files(self, version: int):
        from value_at_risk_spark.sources.deltalog import snapshot
        from value_at_risk_spark.sources.dv import read_dv

        snap = snapshot(self._path, version)
        out = []
        for rel in sorted(snap.files):
            pv = snap.files[rel].get("partitionValues") or {}
            if not isinstance(pv, dict):
                pv = dict(pv)
            desc = snap.files[rel].get("deletionVector")
            out.append(
                (
                    os.path.normpath(
                        os.path.join(self._path, unquote(rel))
                    ),
                    pv,
                    read_dv(self._path, desc) if desc else None,
                )
            )
        return out

    def _files_between(self, start_v: int, end_v: int):
        if end_v <= start_v:
            return []
        if start_v < 0:
            # initial load: the full snapshot at end_v (adds-only replay
            # of history could double rows rewritten by OPTIMIZE)
            return self._snapshot_files(end_v)
        return _added_files_between(self._path, start_v, end_v)

    def _rows_for_cdf(self, start_v: int, end_v: int) -> Iterator[Tuple]:
        if end_v <= start_v:
            # degenerate same-offset range (e.g. availableNow with
            # startingVersion == tip): nothing to emit, not an error
            return
        names = [f.name for f in self._schema.fields]
        for part in _cdf_partitions_for_range(
            self._path, start_v + 1, end_v
        ):
            for batch in _cdf_file_to_batches(
                part, self._schema, self._part_cols,
                phys_map=self._phys_map,
            ):
                for row in batch.to_pylist():
                    yield tuple(row[n] for n in names)

    def read(self, start: dict) -> Tuple[Iterator[Tuple], dict]:
        from value_at_risk_spark.sources.deltalog import delta_versions

        versions = delta_versions(self._path)
        tip = versions[-1] if versions else -1
        start_v = int(start["version"])
        if tip <= start_v:
            return iter(()), start
        if self._max_versions is not None and start_v >= 0:
            # bounded catch-up: never more than N commits per batch
            # (the initial snapshot batch is version-atomic and exempt)
            tip = min(tip, start_v + self._max_versions)
        end = {"version": tip}
        # a LIST ITERATOR, not a generator: Spark's prefetch cache both
        # copy.copies the returned iterator (generators can't) and
        # next()s it (bare lists can't) — iter(list) satisfies both
        if self._cdf:
            rows = list(self._rows_for_cdf(start_v, tip))
        else:
            rows = list(
                self._rows_for_files(self._files_between(start_v, tip))
            )
        return iter(rows), end

    def readBetweenOffsets(
        self, start: dict, end: dict
    ) -> Iterator[Tuple]:
        s_v, e_v = int(start["version"]), int(end["version"])
        if self._cdf:
            return iter(list(self._rows_for_cdf(s_v, e_v)))
        return iter(
            list(self._rows_for_files(self._files_between(s_v, e_v)))
        )

    def commit(self, end: dict) -> None:
        pass


class DeltaLogDataSource(DataSource):
    """``deltalog`` format for spark.read / spark.readStream — see the
    module docstring. Register once per session with
    :func:`register_deltalog_source`."""

    @classmethod
    def name(cls) -> str:
        return "deltalog"

    def schema(self) -> StructType:
        from pyspark.sql.types import StructField

        from value_at_risk_spark.sources.deltalog import snapshot

        path = _required_path(self.options)
        v = self.options.get("versionAsOf")
        raw = snapshot(path, int(v) if v is not None else None).schema
        # strip field METADATA at EVERY nesting level (column-mapping
        # ids/physicalNames, identity specs): it's writer-side
        # bookkeeping, and the streaming runner asserts Arrow schema
        # equality — metadata does not survive the Python->Arrow->JVM
        # round-trip, so a mapped table's stream would die on that
        # assert (nested metadata included — it rides the dataType)
        from value_at_risk_spark.sources.deltalog import (
            _clean_field_json,
            _field_from_json,
        )

        base = StructType(
            [
                _field_from_json(_clean_field_json(f.jsonValue()))
                for f in raw.fields
            ]
        )
        if _cdf_requested(self.options):
            from pyspark.sql.types import (
                LongType,
                StringType,
                StructField,
                TimestampType,
            )

            return StructType(
                [
                    *base.fields,
                    StructField("_change_type", StringType()),
                    StructField("_commit_version", LongType()),
                    StructField("_commit_timestamp", TimestampType()),
                ]
            )
        return base

    def reader(self, schema: StructType) -> DataSourceReader:
        if _cdf_requested(self.options):
            return _DeltaCdfBatchReader(self.options, schema)
        return _DeltaBatchReader(self.options, schema)

    def simpleStreamReader(
        self, schema: StructType
    ) -> SimpleDataSourceStreamReader:
        return _DeltaStreamReader(self.options, schema)

    def writer(self, schema: StructType, overwrite: bool):
        return _DeltaBatchWriter(self.options, schema, overwrite)

    def streamWriter(self, schema: StructType, overwrite: bool):
        return _DeltaStreamWriter(self.options, schema, overwrite)


def register_deltalog_source(spark) -> None:
    """Idempotently register the ``deltalog`` format on a session.
    Python-side filter pushdown is opt-in in Spark (and a reader that
    implements pushFilters is REJECTED while the flag is off), so
    registration enables it."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(DeltaLogDataSource)


def _refuse_nullable_into_required(path: str, null_checks: list) -> None:
    """This writer's tasks cannot run the runtime NOT NULL invariant
    check (no session at staging time), so a statically-nullable frame
    targeting required columns is refused up front — write through
    write_delta, which proves the invariant before committing."""
    if null_checks:
        raise ValueError(
            f"delta table at {path}: column(s) {null_checks} are NOT "
            "NULL but the incoming frame is statically nullable — the "
            "deltalog data source writer cannot run the runtime "
            "invariant check; use write_delta"
        )


def _refuse_constrained(path: str) -> None:
    """Protocol writer-version discipline: this writer stages data in
    tasks that cannot evaluate SQL CHECK constraints, so a constrained
    table is refused up front (exactly what minWriterVersion exists
    for) — write through write_delta, which enforces them."""
    from value_at_risk_spark.sources.deltalog import (
        delta_versions,
        snapshot,
        table_constraints,
        table_generated_columns,
        table_identity_columns,
    )

    if not delta_versions(path):
        return
    snap = snapshot(path)
    if table_identity_columns(snap) or table_generated_columns(snap):
        raise ValueError(
            f"delta table at {path} has generated/identity column "
            "invariants the deltalog data source writer cannot "
            "compute — use write_delta (refusing BEFORE any task "
            "launches)"
        )
    if table_constraints(snap):
        raise ValueError(
            f"delta table at {path} has CHECK constraints the "
            "deltalog data source writer cannot enforce — use "
            "write_delta"
        )


def _fid_type(pa_type, type_json):
    """Rebuild a pyarrow type with ``PARQUET:field_id`` metadata from
    the schemaString's physical twin at every nesting level — what
    makes pyarrow's ParquetWriter emit the field ids 'id'-mode readers
    resolve by (to_arrow_schema drops Spark-side field metadata)."""
    import pyarrow as pa

    if pa.types.is_struct(pa_type):
        return pa.struct(
            [
                _fid_field(pa_type.field(i), type_json["fields"][i])
                for i in range(pa_type.num_fields)
            ]
        )
    if pa.types.is_list(pa_type) or pa.types.is_large_list(pa_type):
        vf = pa_type.value_field
        return pa.list_(
            pa.field(
                vf.name,
                _fid_type(vf.type, type_json["elementType"]),
                vf.nullable,
            )
        )
    if pa.types.is_map(pa_type):
        return pa.map_(
            _fid_type(pa_type.key_type, type_json["keyType"]),
            _fid_type(pa_type.item_type, type_json["valueType"]),
        )
    return pa_type


def _fid_field(pa_field, f_json):
    import pyarrow as pa

    md = dict(pa_field.metadata or {})
    fid = (f_json.get("metadata") or {}).get("parquet.field.id")
    if fid is not None:
        md[b"PARQUET:field_id"] = str(fid).encode()
    return pa.field(
        pa_field.name,
        _fid_type(pa_field.type, f_json.get("type")),
        pa_field.nullable,
        metadata=md or None,
    )


def _mapped_write_pack(snap) -> dict | None:
    """Everything a mapped DS WRITE task needs, picklable: per-column
    (clean logical json, physical twin json with ids) pairs — the
    rename source and target — plus the logical->physical partition
    name map. None when unmapped."""
    import json as _json

    from value_at_risk_spark.sources.deltalog import (
        _clean_field_json,
        _cm_mode,
        _phys_field_json,
    )

    if _cm_mode(snap) == "none":
        return None
    fields = _json.loads(snap.metadata["schemaString"])["fields"]
    pairs = {
        f["name"]: (
            _clean_field_json(f),
            _phys_field_json(f, keep_ids=True),
        )
        for f in fields
    }
    return {
        "pairs": pairs,
        "part_phys": {
            name: pj["name"] for name, (_, pj) in pairs.items()
        },
    }


def _mapped_pack_if_table(path: str) -> dict | None:
    """_mapped_write_pack of the current snapshot, or None when the
    table does not exist yet (stream sinks create on first batch) or
    is unmapped."""
    from value_at_risk_spark.sources.deltalog import (
        delta_versions,
        snapshot,
    )

    if not delta_versions(path):
        return None
    return _mapped_write_pack(snapshot(path))


class _AddsMessage(WriterCommitMessage):
    """Per-task commit message: the add actions for the files this
    task staged (paths relative to the table root, protocol-encoded)."""

    def __init__(self, adds: list):
        self.adds = adds


def _hive_segment(col: str, val) -> str:
    from urllib.parse import quote as _q

    if val is None:
        return f"{col}=__HIVE_DEFAULT_PARTITION__"
    return f"{col}={_q(_hive_value_str(val) or str(val), safe='')}"


def _write_task_files(
    batch_iterator,
    table_path: str,
    stage_rel: str,
    schema: StructType,
    part_cols: list[str],
    mapped: dict | None = None,
):
    """Executor half of the Python Data Source write, Arrow end to
    end: each incoming RecordBatch is split by partition value with
    vectorized kernels (group_by for the distinct combos, compute
    masks for the split — no per-row Python), and streamed into one
    open ParquetWriter per partition key, so task memory is bounded by
    a batch, not the task's data. ``mapped`` (_mapped_write_pack):
    column-mapped targets — staged files carry PHYSICAL names (nested
    included, via the name-resolving rebuild) and parquet field ids;
    partition dirs and partitionValues use physical names; the split
    itself runs on the incoming LOGICAL columns. Returns protocol add
    actions with footer stats, the same payload as deltalog._stage."""
    import uuid as _uuid
    from urllib.parse import quote as _q

    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from value_at_risk_spark.sources.deltalog import (
        _field_from_json,
        _file_stats,
    )

    data_fields = [f for f in schema.fields if f.name not in part_cols]
    data_names = [f.name for f in data_fields]
    if mapped is not None:
        pairs = mapped["pairs"]
        phys_struct = StructType(
            [_field_from_json(pairs[n][1]) for n in data_names]
        )
        base_arrow = _arrow_schema(phys_struct)
        data_schema = pa.schema(
            [
                _fid_field(base_arrow.field(i), pairs[n][1])
                for i, n in enumerate(data_names)
            ]
        )

        def _to_phys(tbl: "pa.Table") -> "pa.Table":
            # logical batch -> physical file layout: resolve children
            # by the CLEAN logical json (names match the incoming
            # batch exactly — Spark's writer contract), rename to the
            # physical arrow field types
            return pa.table(
                {
                    data_schema.field(i).name: _mapped_rebuild(
                        tbl.column(n), pairs[n][0], data_schema.field(i).type
                    )
                    for i, n in enumerate(data_names)
                }
            ).cast(data_schema)

        dir_cols = [mapped["part_phys"][c] for c in part_cols]
    else:
        data_schema = _arrow_schema(StructType(data_fields))

        def _to_phys(tbl: "pa.Table") -> "pa.Table":
            return tbl.select(data_names).cast(data_schema)

        dir_cols = list(part_cols)
    task_id = _uuid.uuid4().hex[:12]
    writers: dict[tuple, tuple] = {}  # key -> (ParquetWriter, rel, full)
    # Spark hands ~10k-row Arrow batches; writing each as its own row
    # group would produce footers with hundreds of tiny groups (bad
    # for scan/skip efficiency), so buffer per key and flush in
    # ~64 MB / 1M-row chunks — Delta-sized row groups
    pending: dict[tuple, list] = {}
    pending_bytes: dict[tuple, int] = {}
    FLUSH_BYTES = 64 << 20
    FLUSH_ROWS = 1 << 20

    def _writer_for(key: tuple):
        got = writers.get(key)
        if got is not None:
            return got[0]
        segs = [_hive_segment(c, v) for c, v in zip(dir_cols, key)]
        rel_dir = "/".join([stage_rel, *segs]) if segs else stage_rel
        abs_dir = os.path.join(table_path, *rel_dir.split("/"))
        os.makedirs(abs_dir, exist_ok=True)
        name = f"part-{task_id}-{len(writers):05d}.parquet"
        full = os.path.join(abs_dir, name)
        w = pq.ParquetWriter(full, data_schema)
        writers[key] = (w, f"{rel_dir}/{name}", full)
        return w

    def _push(key: tuple, sub) -> None:
        buf = pending.setdefault(key, [])
        buf.append(sub)
        pending_bytes[key] = pending_bytes.get(key, 0) + sub.nbytes
        if (
            pending_bytes[key] >= FLUSH_BYTES
            or sum(t.num_rows for t in buf) >= FLUSH_ROWS
        ):
            _flush(key)

    def _flush(key: tuple) -> None:
        buf = pending.pop(key, None)
        if not buf:
            return
        pending_bytes.pop(key, None)
        _writer_for(key).write_table(pa.concat_tables(buf))

    for batch in batch_iterator:
        tbl = pa.Table.from_batches([batch])
        if not part_cols:
            _push((), _to_phys(tbl))
            continue
        for combo in tbl.group_by(part_cols).aggregate([]).to_pylist():
            mask = None
            for c in part_cols:
                v = combo[c]
                col = tbl[c]
                cond = (
                    pc.is_null(col)
                    if v is None
                    else pc.equal(col, pa.scalar(v, type=col.type))
                )
                mask = cond if mask is None else pc.and_(mask, cond)
            sub = _to_phys(tbl.filter(mask))
            _push(tuple(combo[c] for c in part_cols), sub)

    for key in list(pending):
        _flush(key)
    adds: list[dict] = []
    for key, (w, rel, full) in writers.items():
        w.close()
        st = os.stat(full)
        adds.append(
            {
                "add": {
                    "path": _q(rel, safe="/"),
                    "partitionValues": {
                        # canonical strings ('true', space-separated
                        # timestamps) — str() would store 'True' /
                        # isoformat and split the logical partition
                        # from write_delta's layout and reader pushdown
                        c: (
                            None
                            if v is None
                            else (_hive_value_str(v) or str(v))
                        )
                        for c, v in zip(dir_cols, key)
                    },
                    "size": st.st_size,
                    "modificationTime": int(st.st_mtime * 1000),
                    "dataChange": True,
                    "stats": _file_stats(full),
                }
            }
        )
    return _AddsMessage(adds)


def _unlink_staged(table_path: str, messages) -> None:
    for m in messages:
        if m is None:
            continue
        for a in m.adds:
            try:
                os.unlink(os.path.join(table_path, unquote(a["add"]["path"])))
            except OSError:
                pass


class _DeltaBatchWriter(DataSourceArrowWriter):
    """df.write.format('deltalog'): tasks stage parquet directly (no
    second shuffle through an intermediate format), the driver
    publishes ONE atomic commit from the collected add actions —
    task-parallel data writes, metadata-only commit, exactly Delta's
    write shape. Schema/partition validation runs at planning time so
    a mismatch fails before any task launches."""

    def __init__(self, options: dict, schema: StructType, overwrite: bool):
        import uuid as _uuid

        from value_at_risk_spark.sources.deltalog import (
            _validate_write_schema,
        )

        self._path = _required_path(options)
        self._schema = schema
        self._mode = "overwrite" if overwrite else "append"
        part_opt = options.get("partitionby") or options.get("partitionBy")
        partition_by = (
            [c.strip() for c in part_opt.split(",") if c.strip()]
            if part_opt
            else None
        )
        os.makedirs(self._path, exist_ok=True)
        self._part_cols, self._new_metadata, null_checks = (
            _validate_write_schema(
                self._path, schema, partition_by, merge_schema=False,
                mapped_ok=True,
            )
        )
        _refuse_nullable_into_required(self._path, null_checks)
        _refuse_constrained(self._path)  # fail before any task launches
        self._mapped = _mapped_pack_if_table(self._path)
        self._stage_rel = f"stage-dsw-{os.getpid()}-{_uuid.uuid4().hex[:8]}"

    def write(self, iterator):
        return _write_task_files(
            iterator,
            self._path,
            self._stage_rel,
            self._schema,
            self._part_cols,
            mapped=self._mapped,
        )

    def commit(self, messages) -> None:
        from value_at_risk_spark.sources.deltalog import commit_staged_adds

        # tasks staged under the PLANNING-time mapping state; a MAPPED
        # table whose mapping changed since would misread those files —
        # conflict instead of publishing them. (The unmapped->mapped
        # direction needs no extra replay here: commit_staged_adds is
        # called with mapped_ok=False then, and its tip re-validation
        # refuses mapped tables loudly.)
        if self._mapped is not None and (
            _mapped_pack_if_table(self._path) != self._mapped
        ):
            _unlink_staged(self._path, messages)
            raise ValueError(
                f"deltalog write at {self._path}: the table's column-"
                "mapping state changed between planning and commit"
            )
        adds = [a for m in messages if m is not None for a in m.adds]
        commit_staged_adds(
            self._path,
            adds,
            self._schema,
            mode=self._mode,
            part_cols=self._part_cols,
            new_metadata=self._new_metadata,
            mapped_ok=self._mapped is not None,
        )

    def abort(self, messages) -> None:
        _unlink_staged(self._path, messages)


class _DeltaStreamWriter(DataSourceStreamArrowWriter):
    """writeStream.format('deltalog'): each micro-batch commits
    atomically with the protocol's txn action keyed on
    (option 'appId', batchId) — a replayed batch after failure
    recovery publishes nothing and its staged files are unlinked, so
    the sink is exactly-once end to end (the declarative twin of
    streaming/sinks.DeltaTxnSink)."""

    def __init__(self, options: dict, schema: StructType, overwrite: bool):
        from value_at_risk_spark.sources.deltalog import (
            _validate_write_schema,
        )

        self._path = _required_path(options)
        self._schema = schema
        self._mode = "overwrite" if overwrite else "append"
        self._app_id = options.get("appid") or options.get(
            "appId", "deltalog_stream_writer"
        )
        part_opt = options.get("partitionby") or options.get("partitionBy")
        self._partition_by = (
            [c.strip() for c in part_opt.split(",") if c.strip()]
            if part_opt
            else None
        )
        os.makedirs(self._path, exist_ok=True)
        # the table may not exist until the first batch commits; the
        # per-batch commit re-validates, this is the fail-fast pass
        from value_at_risk_spark.sources.deltalog import delta_versions

        if delta_versions(self._path):
            pc_, _, null_checks = _validate_write_schema(
                self._path, schema, self._partition_by, merge_schema=False,
                mapped_ok=True,
            )
            _refuse_nullable_into_required(self._path, null_checks)
            _refuse_constrained(self._path)
            self._part_cols = pc_
        else:
            self._part_cols = list(self._partition_by or [])
        self._mapped = _mapped_pack_if_table(self._path)

    def write(self, iterator):
        import uuid as _uuid

        # partition columns were resolved ONCE on the driver at init
        # (they cannot change under this sink; the per-batch commit
        # re-validates and conflicts if the table moved) — previously
        # EVERY task of EVERY micro-batch replayed the whole log here
        stage_rel = f"stage-dsw-{os.getpid()}-{_uuid.uuid4().hex[:8]}"
        return _write_task_files(
            iterator, self._path, stage_rel, self._schema,
            self._part_cols, mapped=self._mapped,
        )

    def commit(self, messages, batchId: int) -> None:
        from value_at_risk_spark.sources.deltalog import (
            _validate_write_schema,
            commit_staged_adds,
            delta_versions,
        )

        adds = [a for m in messages if m is not None for a in m.adds]
        # only MAPPED sinks pay the extra log replay per micro-batch:
        # an unmapped sink commits with mapped_ok=False, whose tip
        # re-validation already refuses a table that became mapped
        if self._mapped is not None and (
            _mapped_pack_if_table(self._path) != self._mapped
        ):
            _unlink_staged(self._path, messages)
            raise ValueError(
                f"deltalog stream write at {self._path}: the table's "
                "column-mapping state changed under the running sink"
            )
        if delta_versions(self._path):
            part_cols, new_metadata, null_checks = _validate_write_schema(
                self._path, self._schema, self._partition_by, False,
                mapped_ok=True,
            )
            _refuse_nullable_into_required(self._path, null_checks)
        else:
            part_cols, new_metadata = list(self._partition_by or []), None
        v = commit_staged_adds(
            self._path,
            adds,
            self._schema,
            mode=self._mode,
            part_cols=part_cols,
            txn={"appId": self._app_id, "version": batchId},
            new_metadata=new_metadata,
            mapped_ok=self._mapped is not None,
        )
        if v == -1:  # replayed batch: the txn dedup dropped it
            _unlink_staged(self._path, messages)

    def abort(self, messages, batchId: int) -> None:
        _unlink_staged(self._path, messages)
