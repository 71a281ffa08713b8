"""Plan-hygiene regression tests: the physical plans we want, not just
the answers (the scale contract — pushdown, pruning, broadcast)."""

from __future__ import annotations

import io
import contextlib

from value_at_risk_spark.queries import QUERIES


def _plan(spark, name, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    p = _plan(spark, "filter_project", sf_dir)
    assert "PushedFilters" in p
    assert "GreaterThanOrEqual(l_shipdate" in p
    assert "LessThan(l_shipdate" in p


def test_column_pruning(spark, sf_dir):
    p = _plan(spark, "var99_by_series", sf_dir)
    # only the three needed orders columns are read
    read = [ln for ln in p.splitlines() if "ReadSchema" in ln][0]
    assert "o_totalprice" in read and "o_orderdate" in read
    assert "o_custkey" not in read and "o_orderstatus" not in read


def test_dimension_joins_broadcast(spark, sf_dir):
    p = _plan(spark, "join_revenue_by_nation", sf_dir)
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_topn_is_take_ordered(spark, sf_dir):
    p = _plan(spark, "top10_orders", sf_dir)
    assert "TakeOrderedAndProject" in p


def test_csv_json_roundtrip(spark, sf_dir, tmp_path):
    from value_at_risk_spark.sources.registry import (
        Registry,
        read_csv,
        read_json,
        write_csv,
        write_json,
    )

    nation = Registry(sf_dir).read(spark, "nation")
    cpath = str(tmp_path / "nation_csv")
    jpath = str(tmp_path / "nation_json")
    write_csv(nation, cpath)
    write_json(nation, jpath)
    c = read_csv(
        spark, cpath, "n_nationkey int, n_name string, n_regionkey int"
    )
    j = read_json(
        spark, jpath, "n_nationkey int, n_name string, n_regionkey int"
    )
    base = {(r.n_nationkey, r.n_name, r.n_regionkey) for r in nation.collect()}
    assert {(r.n_nationkey, r.n_name, r.n_regionkey) for r in c.collect()} == base
    assert {(r.n_nationkey, r.n_name, r.n_regionkey) for r in j.collect()} == base
