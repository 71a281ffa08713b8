"""SQL text surface for the native delta log.

The reference drives its Delta tables through SQL statements —
``OPTIMIZE ... ZORDER BY (date, ticker)`` after the Monte-Carlo write
(``/root/reference/03_var_monte_carlo.py:162``), DML and MERGE over
the market tables (``config/configure_notebook.py:18-27``) — so a
user porting those workloads needs the TEXT form, not just the
function calls. ``delta_sql(spark, stmt)`` parses the Delta-SQL
statement shapes those workloads use and dispatches to the native-log
implementations, with tables addressed as ``delta.`/path``` exactly
like delta-spark's path syntax:

- ``SELECT ... FROM delta.`/p` [VERSION AS OF n | TIMESTAMP AS OF
  'ts'] ...`` — every ``delta.`path``` reference is swapped for a
  snapshot temp view and the rest of the text is handed to Catalyst
  verbatim (joins between delta tables and registered views work);
  ``TABLE_CHANGES(delta.`/p`, from[, to])`` relations read the
  Change Data Feed (deltalog.table_changes) — bounds are versions
  (bare integers) or timestamps ('...' / fractional epoch); a START
  timestamp resolves to the first commit at-or-AFTER it, an END to
  the last commit at-or-before (Delta's asymmetric CDF rule);
- ``DELETE FROM delta.`/p` WHERE cond``;
- ``UPDATE delta.`/p` SET c = expr[, ...] [WHERE cond]``;
- ``MERGE INTO delta.`/p` [AS] t USING view [AS] s ON t.k = s.k
  [AND ...]`` with the full clause grammar: ordered ``WHEN MATCHED
  [AND cond] THEN UPDATE SET a = expr, ... | UPDATE SET * | DELETE``,
  ``WHEN NOT MATCHED [AND cond] THEN INSERT * | INSERT (cols) VALUES
  (exprs)``, ``WHEN NOT MATCHED BY SOURCE [AND cond] THEN UPDATE SET
  ... | DELETE`` (the upsert-star form keeps the cheap
  anti-join + union plan);
- ``INSERT INTO | OVERWRITE delta.`/p` [(cols)] SELECT ... | VALUES
  ...`` — positional binding; unlisted columns fill their
  CURRENT_DEFAULT when one is set, else NULL;
- ``CREATE TABLE delta.`/p` [USING DELTA] [PARTITIONED BY (...)]
  [TBLPROPERTIES ('k'='v', ...)] AS SELECT ...`` (CTAS; refuses an
  existing table);
- ``OPTIMIZE delta.`/p` [WHERE part = 'v' [AND ...]] [MIN FILE SIZE n]
  [ZORDER BY (c1, c2)]``;
- ``VACUUM delta.`/p` [RETAIN n HOURS] [DRY RUN]`` — DRY RUN lists
  the candidates as (path) rows without deleting;
- ``REORG [TABLE] delta.`/p` APPLY (PURGE)`` — materialize deletion
  vectors;
- ``RESTORE [TABLE] delta.`/p` TO VERSION AS OF n |
  TO TIMESTAMP AS OF 'ts'``;
- ``DESCRIBE HISTORY delta.`/p``` — returned as a DataFrame;
- ``SHOW TBLPROPERTIES delta.`/p` [('key')]`` — (key, value) rows;
- ``CREATE TABLE delta.`/dst` SHALLOW CLONE delta.`/src`
  [VERSION AS OF n]``;
- ``ALTER TABLE delta.`/p` ADD CONSTRAINT name CHECK (expr)`` /
  ``DROP CONSTRAINT name`` /
  ``SET TBLPROPERTIES ('k'='v', ...)`` /
  ``RENAME COLUMN old TO new`` (column-mapped tables) /
  ``ALTER COLUMN col TYPE bigint`` (lossless widening only) /
  ``ALTER COLUMN col SET DEFAULT expr`` / ``DROP DEFAULT``
  (allowColumnDefaults — INSERTs omitting the column fill it).

Anything else raises ValueError with the unsupported text — loud,
never silently re-interpreted. Statements that mutate return the
underlying function's result (dict/int/list); queries return a
DataFrame.
"""

from __future__ import annotations

import re
import uuid

from pyspark.sql import DataFrame, SparkSession

_DELTA_REF = re.compile(r"delta\.`([^`]+)`", re.IGNORECASE)


def _mask_literals(text: str) -> tuple[str, list[str]]:
    """Replace single-quoted SQL string literals ('' escapes included)
    with ``\\x00<idx>\\x00`` placeholders so STRUCTURAL parsing —
    comma splits, keyword boundaries, alias rewrites — never fires
    inside a literal ("'a,b'" must not split a VALUES list; "'WHEN
    MATCHED'" must not start a clause). ``_unmask`` restores them on
    the extracted fragments."""
    out: list[str] = []
    lits: list[str] = []
    i, n = 0, len(text)
    while i < n:
        ch = text[i]
        if ch == "'":
            j = i + 1
            while j < n:
                if text[j] == "'":
                    if j + 1 < n and text[j + 1] == "'":
                        j += 2
                        continue
                    break
                j += 1
            if j >= n:
                raise ValueError(
                    f"delta_sql: unterminated string literal in {text!r}"
                )
            lits.append(text[i : j + 1])
            out.append(f"\x00{len(lits) - 1}\x00")
            i = j + 1
        else:
            out.append(ch)
            i += 1
    return "".join(out), lits


def _unmask(text: str, lits: list[str]) -> str:
    return re.sub(
        "\x00(\\d+)\x00", lambda m: lits[int(m.group(1))], text
    )


def _unquote_prop(token: str, lits: list[str]) -> str:
    """A TBLPROPERTIES key/value token: either a masked '...' literal
    (unquoted, '' escapes collapsed) or a bare identifier."""
    token = token.strip()
    lm = re.fullmatch(r"\x00(\d+)\x00", token)
    if lm:
        raw = lits[int(lm.group(1))]
        return raw[1:-1].replace("''", "'")
    return token


def _parse_tblproperties(
    src: str, lits: list[str], what: str
) -> dict[str, str]:
    """The ('k'='v', ...) list of a CTAS / CREATE TABLE statement
    (masked text), shared so the validation and unquoting cannot
    drift between the two branches."""
    conf: dict[str, str] = {}
    for part in _split_top_commas(src):
        k, eq, v = part.partition("=")
        if not eq or not k.strip() or not v.strip():
            raise ValueError(
                f"delta_sql {what}: bad TBLPROPERTIES item "
                f"{part.strip()!r}"
            )
        conf[_unquote_prop(k, lits)] = _unquote_prop(v, lits)
    return conf


def _split_top_commas(text: str) -> list[str]:
    """Split on commas at paren depth 0 (call on MASKED text — string
    literals are already placeholders, so their commas/parens are
    invisible here)."""
    depth, buf, out = 0, "", []
    for ch in text:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            out.append(buf)
            buf = ""
        else:
            buf += ch
    if buf.strip():
        out.append(buf)
    return out


# SQL type names -> schemaString primitive names, shared by ALTER
# COLUMN TYPE / ADD COLUMNS / CONVERT PARTITIONED BY
_SQL_TO_SCHEMA_TYPE = {
    "tinyint": "byte", "smallint": "short", "int": "integer",
    "integer": "integer", "bigint": "long", "long": "long",
    "float": "float", "real": "float", "double": "double",
    "string": "string", "boolean": "boolean", "date": "date",
    "timestamp": "timestamp",
}


def _parse_partition_predicate(text: str) -> dict[str, list[str]]:
    """``OPTIMIZE ... WHERE`` predicate -> partition_filters: AND-ed
    conjunctions of ``col = 'v'`` / ``col = n`` / ``col IN (...)``
    over PARTITION columns only (real OPTIMIZE WHERE accepts exactly
    that). Anything else raises — loud, never re-interpreted as a
    row-level filter."""
    out: dict[str, list[str]] = {}
    for clause in re.split(r"\s+AND\s+", text.strip(), flags=re.IGNORECASE):
        m = re.match(
            r"^(\w+)\s*=\s*(?:'([^']*)'|(\S+))$", clause.strip()
        )
        if m:
            out.setdefault(m.group(1), []).append(
                m.group(2) if m.group(2) is not None else m.group(3)
            )
            continue
        m = re.match(
            r"^(\w+)\s+IN\s*\(([^)]+)\)$", clause.strip(), re.IGNORECASE
        )
        if m:
            vals = [
                v.strip().strip("'") for v in m.group(2).split(",")
            ]
            out.setdefault(m.group(1), []).extend(vals)
            continue
        raise ValueError(
            "delta_sql OPTIMIZE WHERE: only partition predicates "
            f"(col = value / col IN (...), AND-ed) are supported: "
            f"{clause!r}"
        )
    return out


def _one_path(stmt: str, context: str) -> str:
    refs = _DELTA_REF.findall(stmt)
    if len(refs) != 1:
        raise ValueError(
            f"delta_sql {context}: expected exactly one delta.`path` "
            f"reference, found {len(refs)}"
        )
    return refs[0]


def delta_sql(spark: SparkSession, stmt: str):
    from value_at_risk_spark.sources import deltalog as dl

    s = stmt.strip().rstrip(";").strip()
    head = s.split(None, 1)[0].upper() if s else ""

    if head == "SELECT" or head == "WITH":
        # table_changes(delta.`/p`, from[, to]) relations become CDF
        # views first, so the generic substitution below never sees
        # their inner delta.`path`
        def _cdf_bound(path: str, raw: str, start: bool) -> int:
            # quoted or fractional bound = a timestamp; bare integer =
            # a version. Delta's CDF rule is ASYMMETRIC: a START
            # timestamp resolves to the first commit at-or-AFTER it
            # (changes before the asked instant are never included),
            # an END timestamp to the last commit at-or-before it —
            # the TIMESTAMP AS OF rule.
            if raw.startswith("'"):
                ts = raw[1:-1]
            elif "." in raw:
                ts = float(raw)
            else:
                return int(raw)
            if start:
                return dl.version_at_or_after_timestamp(path, ts)
            return dl.version_at_timestamp(path, ts)

        def _cdf_sub(m: re.Match) -> str:
            view = f"delta_cdf_{uuid.uuid4().hex[:8]}"
            path = m.group(1)
            dl.table_changes(
                spark,
                path,
                _cdf_bound(path, m.group(2), start=True),
                (
                    _cdf_bound(path, m.group(3), start=False)
                    if m.group(3)
                    else None
                ),
            ).createOrReplaceTempView(view)
            return view

        _B = r"(\d+(?:\.\d+)?|'[^']*')"
        s = re.sub(
            r"TABLE_CHANGES\s*\(\s*delta\.`([^`]+)`\s*,\s*" + _B
            + r"(?:\s*,\s*" + _B + r")?\s*\)",
            _cdf_sub,
            s,
            flags=re.IGNORECASE,
        )

        # swap every remaining delta.`path` [VERSION AS OF n |
        # TIMESTAMP AS OF 'ts'] for a snapshot view
        def _sub(m: re.Match) -> str:
            path = m.group(1)
            rest = s[m.end():]
            vm = re.match(
                r"\s+VERSION\s+AS\s+OF\s+(\d+)", rest, re.IGNORECASE
            )
            tm = re.match(
                r"\s+TIMESTAMP\s+AS\s+OF\s+(?:'([^']+)'|(\d+(?:\.\d+)?))",
                rest,
                re.IGNORECASE,
            )
            version = int(vm.group(1)) if vm else None
            ts = None
            if tm is not None:
                ts = tm.group(1) if tm.group(1) else float(tm.group(2))
            view = f"delta_{uuid.uuid4().hex[:8]}"
            dl.read_delta(
                spark, path, version=version, timestamp=ts
            ).createOrReplaceTempView(view)
            return view

        out = []
        pos = 0
        for m in _DELTA_REF.finditer(s):
            out.append(s[pos:m.start()])
            out.append(_sub(m))
            pos = m.end()
            vm = re.match(
                r"\s+(?:VERSION\s+AS\s+OF\s+\d+"
                r"|TIMESTAMP\s+AS\s+OF\s+(?:'[^']+'|\d+(?:\.\d+)?))",
                s[pos:],
                re.IGNORECASE,
            )
            if vm:
                pos += vm.end()  # the view already pins the version
        out.append(s[pos:])
        return spark.sql("".join(out))

    if head == "DELETE":
        m = re.match(
            r"DELETE\s+FROM\s+delta\.`[^`]+`\s+WHERE\s+(.+)$",
            s,
            re.IGNORECASE | re.DOTALL,
        )
        if not m:
            raise ValueError(f"delta_sql: unsupported DELETE shape: {stmt!r}")
        return dl.delete_from_delta(
            spark, _one_path(s, "DELETE"), m.group(1).strip()
        )

    if head == "UPDATE":
        ms, lits = _mask_literals(s)
        m = re.match(
            r"UPDATE\s+delta\.`[^`]+`\s+SET\s+(.+?)"
            r"(?:\s+WHERE\s+(.+))?$",
            ms,
            re.IGNORECASE | re.DOTALL,
        )
        if not m:
            raise ValueError(f"delta_sql: unsupported UPDATE shape: {stmt!r}")
        sets: dict[str, str] = {}
        for p in _split_top_commas(m.group(1)):
            col, eq, expr = p.partition("=")
            if not eq:
                raise ValueError(
                    f"delta_sql: bad SET assignment {p.strip()!r}"
                )
            sets[col.strip()] = _unmask(expr.strip(), lits)
        cond = _unmask((m.group(2) or "1=1").strip(), lits)
        return dl.update_delta(spark, _one_path(s, "UPDATE"), cond, sets)

    if head == "MERGE":
        # structural parsing runs on LITERAL-MASKED text: commas,
        # WHEN/THEN keywords, and alias-looking prefixes inside
        # '...' strings must be invisible to it
        ms, lits = _mask_literals(s)
        m = re.match(
            r"MERGE\s+INTO\s+delta\.`[^`]+`\s+(?:AS\s+)?(\w+)\s+"
            r"USING\s+(\w+)\s+(?:AS\s+)?(\w+)\s+ON\s+(.+?)\s+"
            r"(WHEN\s+.+)$",
            ms,
            re.IGNORECASE | re.DOTALL,
        )
        if not m:
            raise ValueError(
                "delta_sql: unsupported MERGE shape (MERGE INTO "
                "delta.`p` t USING view s ON t.k = s.k WHEN ...): "
                f"{stmt!r}"
            )
        t_alias, source, s_alias, on, when_text = m.groups()
        if t_alias.lower() == s_alias.lower():
            raise ValueError(
                "delta_sql MERGE: target and source aliases must differ"
            )
        keys = []
        for clause in re.split(r"\s+AND\s+", on, flags=re.IGNORECASE):
            em = re.match(
                rf"\s*(?:{t_alias}|{s_alias})\.(\w+)\s*=\s*"
                rf"(?:{t_alias}|{s_alias})\.(\w+)\s*$",
                clause,
                re.IGNORECASE,
            )
            if not em or em.group(1).lower() != em.group(2).lower():
                raise ValueError(
                    f"delta_sql MERGE: ON must be t.k = s.k equalities, "
                    f"got {clause.strip()!r}"
                )
            keys.append(em.group(1))

        # ONE-PASS alias rewrite onto the engine's fixed t./s. planes:
        # sequential substitution would cascade when the user's source
        # alias is literally 't' (target refs rewritten to 't.' would
        # then be re-rewritten to 's.')
        _alias_pat = re.compile(
            rf"\b({re.escape(t_alias)}|{re.escape(s_alias)})\.",
            re.IGNORECASE,
        )

        def _norm(expr: str) -> str:
            return _unmask(
                _alias_pat.sub(
                    lambda am: "t."
                    if am.group(1).lower() == t_alias.lower()
                    else "s.",
                    expr,
                ),
                lits,
            )

        def _target_col(raw: str, what: str) -> str:
            col = re.sub(
                rf"^(?:{re.escape(t_alias)}|{re.escape(s_alias)})\.",
                "",
                raw.strip(),
                flags=re.IGNORECASE,
            )
            if "." in col:
                raise NotImplementedError(
                    f"delta_sql MERGE: nested {what} target {raw.strip()!r}"
                    " is not supported — assign the whole struct"
                )
            return col

        def _set_map(text: str) -> dict:
            sets: dict[str, str] = {}
            for p in _split_top_commas(text):
                col, eq, expr = p.partition("=")
                if not eq:
                    raise ValueError(
                        f"delta_sql MERGE: bad SET assignment {p.strip()!r}"
                    )
                sets[_target_col(col, "SET")] = _norm(expr.strip())
            return sets

        matched: list[dict] = []
        not_matched: list[dict] = []
        by_source: list[dict] = []
        # clause boundaries: WHEN immediately followed by [NOT]
        # MATCHED (a CASE WHEN never is, and literals are masked)
        parts = re.split(
            r"\bWHEN\s+(?=(?:NOT\s+)?MATCHED\b)",
            when_text,
            flags=re.IGNORECASE,
        )
        upsert_star = True
        for part in parts:
            part = part.strip()
            if not part:
                continue
            # the action alternation anchors the FINAL 'THEN': a CASE
            # WHEN ... THEN inside the AND-condition cannot satisfy
            # 'THEN UPDATE SET/DELETE/INSERT', so the greedy condition
            # backtracks to the real clause boundary
            cm = re.match(
                r"(NOT\s+MATCHED(?:\s+BY\s+SOURCE)?|MATCHED)\s*"
                r"(?:AND\s+(.+)\s+)?THEN\s+"
                r"(UPDATE\s+SET\s+.+|DELETE$|INSERT\s+.+)",
                part,
                re.IGNORECASE | re.DOTALL,
            )
            if not cm:
                raise ValueError(
                    f"delta_sql MERGE: unsupported clause {part!r}"
                )
            kind = re.sub(r"\s+", " ", cm.group(1).upper())
            cond = _norm(cm.group(2).strip()) if cm.group(2) else None
            action = cm.group(3).strip()
            clause: dict = {}
            if cond is not None:
                clause["condition"] = cond
                upsert_star = False
            am = re.match(
                r"UPDATE\s+SET\s+(\*|.+)$", action, re.IGNORECASE | re.DOTALL
            )
            if am and kind in ("MATCHED", "NOT MATCHED BY SOURCE"):
                spec = am.group(1).strip()
                clause["update"] = "*" if spec == "*" else _set_map(spec)
                if spec != "*":
                    upsert_star = False
            elif re.fullmatch(r"DELETE", action, re.IGNORECASE) and kind in (
                "MATCHED",
                "NOT MATCHED BY SOURCE",
            ):
                clause["delete"] = True
                upsert_star = False
            elif kind == "NOT MATCHED":
                im = re.match(
                    r"INSERT\s+(\*|\(([^)]+)\)\s+VALUES\s*\((.+)\))$",
                    action,
                    re.IGNORECASE | re.DOTALL,
                )
                if not im:
                    raise ValueError(
                        f"delta_sql MERGE: unsupported INSERT form "
                        f"{action!r}"
                    )
                if im.group(1).strip() == "*":
                    clause["insert"] = "*"
                else:
                    cols = [
                        _target_col(c, "INSERT")
                        for c in im.group(2).split(",")
                    ]
                    vals = _split_top_commas(im.group(3))
                    if len(cols) != len(vals):
                        raise ValueError(
                            "delta_sql MERGE: INSERT column/value "
                            "count mismatch"
                        )
                    clause["insert"] = {
                        c: _norm(v.strip()) for c, v in zip(cols, vals)
                    }
                    upsert_star = False
            else:
                raise ValueError(
                    f"delta_sql MERGE: action {action!r} is not valid "
                    f"for WHEN {kind}"
                )
            if kind == "MATCHED":
                matched.append(clause)
            elif kind == "NOT MATCHED":
                not_matched.append(clause)
            else:
                by_source.append(clause)
                upsert_star = False
        from value_at_risk_spark.operators.merge import (
            merge_into_delta_native,
        )

        if (
            upsert_star
            and len(matched) == 1
            and matched[0].get("update") == "*"
            and len(not_matched) == 1
            and not_matched[0].get("insert") == "*"
            and not by_source
        ):
            # the classic upsert-star form keeps the cheap
            # anti-join + union plan
            return merge_into_delta_native(
                spark, _one_path(s, "MERGE"), spark.table(source), keys
            )
        return merge_into_delta_native(
            spark,
            _one_path(s, "MERGE"),
            spark.table(source),
            keys,
            matched=matched or None,
            not_matched=not_matched or None,
            not_matched_by_source=by_source or None,
        )

    if head == "OPTIMIZE":
        m = re.match(
            r"OPTIMIZE\s+delta\.`[^`]+`"
            r"(?:\s+WHERE\s+(.+?))?"
            r"(?:\s+MIN\s+FILE\s+SIZE\s+(\d+))?"
            r"(?:\s+ZORDER\s+BY\s+\(([^)]+)\))?$",
            s,
            re.IGNORECASE,
        )
        if not m:
            raise ValueError(
                f"delta_sql: unsupported OPTIMIZE shape: {stmt!r}"
            )
        zcols = (
            [c.strip() for c in m.group(3).split(",")] if m.group(3) else None
        )
        return dl.optimize_delta(
            spark,
            _one_path(s, "OPTIMIZE"),
            zorder_by=zcols,
            min_file_size=int(m.group(2)) if m.group(2) else None,
            partition_filters=(
                _parse_partition_predicate(m.group(1))
                if m.group(1)
                else None
            ),
        )

    if head == "VACUUM":
        m = re.match(
            r"VACUUM\s+delta\.`[^`]+`"
            r"(?:\s+RETAIN\s+(\d+)\s+HOURS)?"
            r"(\s+DRY\s+RUN)?$",
            s,
            re.IGNORECASE,
        )
        if not m:
            raise ValueError(f"delta_sql: unsupported VACUUM shape: {stmt!r}")
        # no RETAIN clause -> the table's own
        # delta.deletedFileRetentionDuration property (or 1h default)
        retention = float(m.group(1)) * 3600.0 if m.group(1) else None
        paths = dl.vacuum_delta(
            _one_path(s, "VACUUM"),
            retention_seconds=retention,
            dry_run=bool(m.group(2)),
        )
        if m.group(2):
            # DRY RUN surfaces the candidate list as a DataFrame,
            # like Delta's own form
            return spark.createDataFrame(
                [(p,) for p in paths], "path string"
            )
        return paths

    if head == "REORG":
        m = re.match(
            r"REORG\s+(?:TABLE\s+)?delta\.`[^`]+`\s+"
            r"APPLY\s+\(\s*PURGE\s*\)$",
            s,
            re.IGNORECASE,
        )
        if not m:
            raise ValueError(
                f"delta_sql: unsupported REORG shape: {stmt!r}"
            )
        return dl.purge_deletion_vectors(spark, _one_path(s, "REORG"))

    if head == "RESTORE":
        m = re.match(
            r"RESTORE\s+(?:TABLE\s+)?delta\.`[^`]+`\s+"
            r"TO\s+VERSION\s+AS\s+OF\s+(\d+)$",
            s,
            re.IGNORECASE,
        )
        if m:
            return dl.restore_delta(
                spark, _one_path(s, "RESTORE"), int(m.group(1))
            )
        m = re.match(
            r"RESTORE\s+(?:TABLE\s+)?delta\.`[^`]+`\s+"
            r"TO\s+TIMESTAMP\s+AS\s+OF\s+(?:'([^']+)'|(\d+(?:\.\d+)?))$",
            s,
            re.IGNORECASE,
        )
        if not m:
            raise ValueError(
                f"delta_sql: unsupported RESTORE shape: {stmt!r}"
            )
        ts = m.group(1) if m.group(1) else float(m.group(2))
        path = _one_path(s, "RESTORE")
        # the same as-of resolution SELECT ... TIMESTAMP AS OF uses
        return dl.restore_delta(
            spark, path, dl.version_at_timestamp(path, ts)
        )

    if head == "SHOW":
        m = re.match(
            r"SHOW\s+TBLPROPERTIES\s+delta\.`[^`]+`"
            r"(?:\s*\(\s*'([^']+)'\s*\))?$",
            s,
            re.IGNORECASE,
        )
        if not m:
            raise ValueError(
                f"delta_sql: unsupported SHOW shape: {stmt!r}"
            )
        snap_sp = dl.snapshot(_one_path(s, "SHOW TBLPROPERTIES"))
        props = dict(snap_sp.metadata.get("configuration") or {})
        if m.group(1) is not None:
            # single-key form returns just that row (missing key ->
            # empty result, Spark's own SHOW TBLPROPERTIES behavior
            # for delta paths)
            props = (
                {m.group(1): props[m.group(1)]}
                if m.group(1) in props
                else {}
            )
        return spark.createDataFrame(
            sorted(props.items()), "key string, value string"
        )

    if head == "DESCRIBE":
        m = re.match(
            r"DESCRIBE\s+DETAIL\s+delta\.`[^`]+`$", s, re.IGNORECASE
        )
        if m:
            return dl.describe_detail(_one_path(s, "DESCRIBE DETAIL"))
        m = re.match(
            r"DESCRIBE\s+HISTORY\s+delta\.`[^`]+`$", s, re.IGNORECASE
        )
        if not m:
            raise ValueError(
                f"delta_sql: unsupported DESCRIBE shape: {stmt!r}"
            )
        hist = dl.delta_history(_one_path(s, "DESCRIBE HISTORY"))
        return spark.createDataFrame(
            [
                (
                    int(h["version"]),
                    h.get("operation"),
                    str(h.get("operationParameters") or {}),
                )
                for h in hist
            ],
            "version long, operation string, operation_parameters string",
        )

    if head == "INSERT":
        # INSERT INTO (append) / INSERT OVERWRITE with a SELECT or
        # VALUES tail; an optional column list fills the rest with
        # NULLs. SQL INSERT binds columns BY POSITION.
        ms, lits = _mask_literals(s)
        m = re.match(
            r"INSERT\s+(INTO|OVERWRITE)\s+delta\.`([^`]+)`\s*"
            r"(?:\(([^)]*)\)\s*)?"
            r"((?:SELECT|WITH|VALUES)\s+.+)$",
            ms,
            re.IGNORECASE | re.DOTALL,
        )
        if not m:
            raise ValueError(
                f"delta_sql: unsupported INSERT shape: {stmt!r}"
            )
        mode = "append" if m.group(1).upper() == "INTO" else "overwrite"
        # the path comes from the INSERT clause itself — the SELECT
        # tail may legitimately reference OTHER delta tables
        path = m.group(2)
        cols = (
            [c.strip() for c in m.group(3).split(",")]
            if m.group(3)
            else None
        )
        tail = _unmask(m.group(4).strip(), lits)
        if tail.split(None, 1)[0].upper() == "VALUES":
            src = spark.sql(tail)
        else:
            src = delta_sql(spark, tail)
        snap_ins = dl.snapshot(path)
        schema = snap_ins.schema
        targets = cols if cols is not None else [f.name for f in schema.fields]
        known = {f.name: f for f in schema.fields}
        bad = [c for c in targets if c not in known]
        if bad:
            raise ValueError(f"delta_sql INSERT: unknown column(s) {bad}")
        if len(set(targets)) != len(targets):
            raise ValueError(
                "delta_sql INSERT: duplicate target column(s) in "
                f"{targets}"
            )
        if len(src.columns) != len(targets):
            raise ValueError(
                f"delta_sql INSERT: {len(src.columns)} values for "
                f"{len(targets)} target column(s)"
            )
        from pyspark.sql import functions as _F

        # TRUE positional binding: rename the source columns to
        # position tokens first — name-keyed selection would break on
        # duplicate source column names (SELECT k, k, v is valid SQL)
        src = src.toDF(*[f"_ins_c{i}" for i in range(len(src.columns))])
        by_target = {
            t: f"_ins_c{i}" for i, t in enumerate(targets)
        }
        # columns with their own generation contract stay ABSENT when
        # unlisted — write_delta computes identity values and
        # validates generated ones itself; a forced NULL would fail
        # those invariants
        auto = set(dl.table_identity_columns(snap_ins)) | set(
            dl.table_generated_columns(snap_ins)
        )
        defaults = dl.table_default_columns(snap_ins)
        out_cols = []
        for f in schema.fields:
            if f.name in by_target:
                out_cols.append(
                    _F.col(by_target[f.name]).cast(f.dataType).alias(f.name)
                )
            elif f.name in auto:
                continue
            elif f.name in defaults:
                # allowColumnDefaults: an INSERT that omits the column
                # fills its CURRENT_DEFAULT (constant-foldable,
                # validated at SET DEFAULT time), never NULL
                out_cols.append(
                    _F.expr(defaults[f.name])
                    .cast(f.dataType)
                    .alias(f.name)
                )
            else:
                out_cols.append(_F.lit(None).cast(f.dataType).alias(f.name))
        frame = src.select(*out_cols)
        return dl.write_delta(spark, frame, path, mode=mode)

    if head == "CONVERT":
        m = re.match(
            r"CONVERT\s+TO\s+DELTA\s+parquet\.`([^`]+)`"
            r"(?:\s+PARTITIONED\s+BY\s*\(([^)]+)\))?$",
            s,
            re.IGNORECASE,
        )
        if not m:
            raise ValueError(
                f"delta_sql: unsupported CONVERT shape: {stmt!r}"
            )
        pschema = None
        if m.group(2):
            pschema = {}
            for part in m.group(2).split(","):
                cm = re.match(r"^\s*(\w+)\s+(\w+)\s*$", part)
                if not cm:
                    raise ValueError(
                        "delta_sql CONVERT: PARTITIONED BY needs "
                        f"'name TYPE' items, got {part.strip()!r}"
                    )
                t_ = _SQL_TO_SCHEMA_TYPE.get(cm.group(2).lower())
                if t_ is None:
                    raise ValueError(
                        f"delta_sql CONVERT: unsupported type "
                        f"{cm.group(2)!r}"
                    )
                pschema[cm.group(1)] = t_
        return dl.convert_to_delta(spark, m.group(1), pschema)

    if head == "CREATE":
        m = re.match(
            r"CREATE\s+TABLE\s+delta\.`([^`]+)`\s+SHALLOW\s+CLONE\s+"
            r"delta\.`([^`]+)`(?:\s+VERSION\s+AS\s+OF\s+(\d+))?$",
            s,
            re.IGNORECASE,
        )
        if m:
            return dl.shallow_clone(
                m.group(2),
                m.group(1),
                int(m.group(3)) if m.group(3) else None,
            )
        # CTAS: CREATE TABLE delta.`p` [USING DELTA] [PARTITIONED BY
        # (...)] [TBLPROPERTIES ('k'='v',...)] AS SELECT ...
        ms, lits = _mask_literals(s)
        m = re.match(
            r"CREATE\s+TABLE\s+delta\.`([^`]+)`"
            r"(?:\s+USING\s+DELTA)?"
            r"(?:\s+PARTITIONED\s+BY\s*\(([^)]+)\))?"
            r"(?:\s+TBLPROPERTIES\s*\((.*?)\))?"
            r"\s+AS\s+((?:SELECT|WITH)\s+.+)$",
            ms,
            re.IGNORECASE | re.DOTALL,
        )
        if m:
            part_by = (
                [c.strip() for c in m.group(2).split(",")]
                if m.group(2)
                else None
            )
            conf: dict[str, str] = {}
            if m.group(3):
                conf = _parse_tblproperties(m.group(3), lits, "CTAS")
                if not conf:
                    raise ValueError(
                        "delta_sql CTAS: no 'k'='v' pairs in "
                        f"TBLPROPERTIES: {stmt!r}"
                    )
            if dl.delta_versions(m.group(1)):
                raise ValueError(
                    f"delta_sql CTAS: delta table already exists at "
                    f"{m.group(1)} (write_delta would APPEND — refuse "
                    "instead)"
                )
            frame = delta_sql(spark, _unmask(m.group(4).strip(), lits))
            return dl.write_delta(
                spark,
                frame,
                m.group(1),
                partition_by=part_by,
                configuration=conf or None,
            )
        # schema-defining CREATE TABLE (no AS SELECT): column defs
        # with optional GENERATED ALWAYS AS IDENTITY / AS (expr) and
        # NOT NULL — creates an EMPTY v0; identity/generated values
        # are computed by write_delta on later writes. The column list
        # is extracted by a BALANCED-paren scan (a greedy regex would
        # swallow the PARTITIONED BY/TBLPROPERTIES tails; a lazy one
        # would stop inside a nested identity/generation paren).
        mh = re.match(
            r"CREATE\s+TABLE\s+delta\.`([^`]+)`\s*\(", ms, re.IGNORECASE
        )
        if mh:
            depth, i = 1, mh.end()
            while i < len(ms) and depth:
                if ms[i] == "(":
                    depth += 1
                elif ms[i] == ")":
                    depth -= 1
                i += 1
            if depth:
                raise ValueError(
                    f"delta_sql CREATE TABLE: unbalanced parens: "
                    f"{stmt!r}"
                )
            coldefs = ms[mh.end():i - 1]
            tail = ms[i:].strip()
            tm = re.match(
                r"(?:USING\s+DELTA)?"
                r"(?:\s*PARTITIONED\s+BY\s*\(([^)]+)\))?"
                r"(?:\s*TBLPROPERTIES\s*\((.*?)\))?$",
                tail,
                re.IGNORECASE | re.DOTALL,
            )
            if not tm:
                raise ValueError(
                    f"delta_sql CREATE TABLE: unsupported tail "
                    f"{tail!r}"
                )
            path, part_src, prop_src = mh.group(1), tm.group(1), tm.group(2)
            if dl.delta_versions(path):
                raise ValueError(
                    f"delta_sql CREATE TABLE: delta table already "
                    f"exists at {path}"
                )
            ddl_parts: list[str] = []
            gen_cols: dict[str, str] = {}
            id_cols: dict[str, dict] = {}
            def_cols: dict[str, str] = {}
            for part in _split_top_commas(coldefs):
                part = _unmask(part.strip(), lits)
                # type token admits parameterized types (decimal(10,2),
                # varchar(32)); NOT NULL parses on either side of
                # DEFAULT — both orders are legal SQL (r13 advice)
                cm = re.match(
                    r"^(\w+)\s+(\w+(?:\s*\(\s*\d+\s*(?:,\s*\d+)?\s*\))?)"
                    r"(?:\s+GENERATED\s+ALWAYS\s+AS\s+"
                    r"(?:(IDENTITY)(?:\s*\(\s*START\s+WITH\s+(-?\d+)"
                    r"(?:\s+INCREMENT\s+BY\s+(-?\d+))?\s*\))?"
                    r"|\((.+)\)))?"
                    r"(\s+NOT\s+NULL)?"
                    r"(?:\s+DEFAULT\s+(.+?))?"
                    r"(\s+NOT\s+NULL)?$",
                    part,
                    re.IGNORECASE | re.DOTALL,
                )
                if not cm:
                    raise ValueError(
                        "delta_sql CREATE TABLE: bad column def "
                        f"{part!r}"
                    )
                name, typ = cm.group(1), cm.group(2).lower()
                # char/varchar surface as plain string in a frame
                # (Spark does not preserve the length attribute), the
                # same lowering delta-spark applies at the table level
                if re.match(r"^(?:var)?char\s*\(", typ):
                    typ = "string"
                sch_t = _SQL_TO_SCHEMA_TYPE.get(typ, typ)
                ddl_parts.append(
                    f"{name} {sch_t}"
                    + (" NOT NULL" if cm.group(7) or cm.group(9) else "")
                )
                if cm.group(3):  # IDENTITY
                    id_cols[name] = {
                        "start": int(cm.group(4) or 1),
                        "step": int(cm.group(5) or 1),
                    }
                elif cm.group(6):  # GENERATED ALWAYS AS (expr)
                    gen_cols[name] = cm.group(6).strip()
                if cm.group(8):  # DEFAULT expr
                    if cm.group(3) or cm.group(6):
                        raise ValueError(
                            "delta_sql CREATE TABLE: DEFAULT cannot "
                            f"combine with GENERATED on {name!r}"
                        )
                    def_cols[name] = cm.group(8).strip()
            part_by = (
                [c.strip() for c in part_src.split(",")]
                if part_src
                else None
            )
            conf = {}
            if prop_src:
                conf = _parse_tblproperties(prop_src, lits, "CREATE TABLE")
            empty = spark.createDataFrame([], ", ".join(ddl_parts))
            # DEFAULT clauses land IN the v0 commit (write_delta
            # validates them first — no half-created table when a
            # later default fails)
            return dl.write_delta(
                spark,
                empty,
                path,
                partition_by=part_by,
                configuration=conf or None,
                generated_columns=gen_cols or None,
                identity_columns=id_cols or None,
                column_defaults=def_cols or None,
            )

    if head == "ALTER":
        m = re.match(
            r"ALTER\s+TABLE\s+delta\.`[^`]+`\s+ADD\s+CONSTRAINT\s+"
            r"(\w+)\s+CHECK\s*\((.+)\)$",
            s,
            re.IGNORECASE | re.DOTALL,
        )
        if m:
            return dl.add_check_constraint(
                spark, _one_path(s, "ALTER"), m.group(1), m.group(2).strip()
            )
        m = re.match(
            r"ALTER\s+TABLE\s+delta\.`[^`]+`\s+DROP\s+CONSTRAINT\s+(\w+)$",
            s,
            re.IGNORECASE,
        )
        if m:
            return dl.drop_check_constraint(
                spark, _one_path(s, "ALTER"), m.group(1)
            )
        m = re.match(
            r"ALTER\s+TABLE\s+delta\.`[^`]+`\s+SYNC\s+IDENTITY$",
            s,
            re.IGNORECASE,
        )
        if m:
            return dl.sync_identity(spark, _one_path(s, "ALTER"))
        m = re.match(
            r"ALTER\s+TABLE\s+delta\.`[^`]+`\s+RENAME\s+COLUMN\s+"
            r"([\w.]+)\s+TO\s+(\w+)$",
            s,
            re.IGNORECASE,
        )
        if m:
            return dl.rename_delta_column(
                _one_path(s, "ALTER"), m.group(1), m.group(2)
            )
        m = re.match(
            r"ALTER\s+TABLE\s+delta\.`[^`]+`\s+DROP\s+COLUMN\s+([\w.]+)$",
            s,
            re.IGNORECASE,
        )
        if m:
            return dl.drop_delta_column(_one_path(s, "ALTER"), m.group(1))
        m = re.match(
            r"ALTER\s+TABLE\s+delta\.`[^`]+`\s+ALTER\s+COLUMN\s+"
            r"(\w+)\s+SET\s+DEFAULT\s+(.+)$",
            s,
            re.IGNORECASE | re.DOTALL,
        )
        if m:
            return dl.set_column_default(
                spark,
                _one_path(s, "ALTER"),
                m.group(1),
                m.group(2).strip(),
            )
        m = re.match(
            r"ALTER\s+TABLE\s+delta\.`[^`]+`\s+ALTER\s+COLUMN\s+"
            r"(\w+)\s+DROP\s+DEFAULT$",
            s,
            re.IGNORECASE,
        )
        if m:
            return dl.set_column_default(
                spark, _one_path(s, "ALTER"), m.group(1), None
            )
        m = re.match(
            r"ALTER\s+TABLE\s+delta\.`[^`]+`\s+ALTER\s+COLUMN\s+"
            r"([\w.]+)\s+TYPE\s+(\w+)$",
            s,
            re.IGNORECASE,
        )
        if m:
            # widen_column_type validates the transition itself
            t = _SQL_TO_SCHEMA_TYPE.get(
                m.group(2).lower(), m.group(2).lower()
            )
            return dl.widen_column_type(_one_path(s, "ALTER"), m.group(1), t)
        m = re.match(
            r"ALTER\s+TABLE\s+delta\.`[^`]+`\s+ADD\s+COLUMNS?\s*"
            r"\(?\s*(.+?)\s*\)?$",
            s,
            re.IGNORECASE,
        )
        if m and not re.match(
            r"ALTER\s+TABLE\s+delta\.`[^`]+`\s+ADD\s+CONSTRAINT",
            s,
            re.IGNORECASE,
        ):
            cols: dict[str, str] = {}
            for part in m.group(1).split(","):
                cm = re.match(r"^\s*(\w+)\s+(\w+)\s*$", part)
                if not cm:
                    raise ValueError(
                        f"delta_sql: unsupported ADD COLUMNS item "
                        f"{part.strip()!r} (scalar 'name TYPE' only — "
                        "complex types via add_delta_columns)"
                    )
                t = _SQL_TO_SCHEMA_TYPE.get(cm.group(2).lower())
                if t is None:
                    raise ValueError(
                        f"delta_sql: unsupported ADD COLUMNS type "
                        f"{cm.group(2)!r}"
                    )
                cols[cm.group(1)] = t
            return dl.add_delta_columns(_one_path(s, "ALTER"), cols)
        m = re.match(
            r"ALTER\s+TABLE\s+delta\.`[^`]+`\s+SET\s+TBLPROPERTIES\s*"
            r"\((.+)\)$",
            s,
            re.IGNORECASE | re.DOTALL,
        )
        if m:
            props: dict[str, str] = {}
            for pm in re.finditer(
                r"'([^']+)'\s*=\s*'([^']*)'", m.group(1)
            ):
                props[pm.group(1)] = pm.group(2)
            if not props:
                raise ValueError(
                    f"delta_sql: no 'k'='v' pairs in TBLPROPERTIES: "
                    f"{stmt!r}"
                )
            return dl.set_table_properties(_one_path(s, "ALTER"), props)
        raise ValueError(f"delta_sql: unsupported ALTER shape: {stmt!r}")

    raise ValueError(f"delta_sql: unsupported statement: {stmt!r}")
