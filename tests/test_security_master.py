"""Security-master construction + PIT/auto-resolve tests (FIXTURES.md §1
required cases; reference master/security_master.py continuity semantics)."""

import datetime as dt

from pyspark.sql import Row

from us_equity_datalake_spark.equity.security_master import (
    build_security_master,
    normalize_symbol,
    resolve_auto,
    resolve_pit,
)

D = dt.date.fromisoformat


NH_SCHEMA = (
    "permno int, symbol string, company string, cik string, cusip string, "
    "start_date date, end_date date"
)


def nh(permno, symbol, company, start, end, cik=None, cusip=None):
    return Row(permno=permno, symbol=symbol, company=company, cik=cik, cusip=cusip,
               start_date=D(start), end_date=D(end))


def _master(spark):
    rows = [
        # FB -> META: same permno keeps the same security_id (case a)
        nh(10001, "FB", "Facebook Inc", "2012-05-18", "2022-06-08", cik="0001326801"),
        nh(10001, "META", "Meta Platforms", "2022-06-09", "2026-12-31", cik="0001326801"),
        # delisted ABCD, unrelated later sid also normalizing to ABCD (case b)
        nh(20002, "ABCD", "Alpha Beta Corp", "2010-01-01", "2015-06-30"),
        nh(30003, "ABCD", "Abc Dot Com", "2018-01-01", "2026-12-31", cik="0000555555"),
        # two sids sharing symbol XY with disjoint windows (case d)
        nh(40004, "XY", "Xylem Old", "2005-01-01", "2009-12-31"),
        nh(50005, "XY", "Xy New", "2016-01-01", "2026-12-31"),
    ]
    return build_security_master(spark.createDataFrame(rows, NH_SCHEMA))


def test_symbol_change_keeps_sid(spark):
    m = {(r["symbol"]): r for r in _master(spark).collect()}
    assert m["FB"]["security_id"] == m["META"]["security_id"]  # security_master.py:766


def test_different_permnos_get_distinct_ids(spark):
    rows = _master(spark).collect()
    by_permno = {}
    for r in rows:
        by_permno.setdefault(r["permno"], set()).add(r["security_id"])
    assert all(len(v) == 1 for v in by_permno.values())
    assert len({next(iter(v)) for v in by_permno.values()}) == 5
    assert min(r["security_id"] for r in rows) == 1001  # ids start above base 1000


def test_pit_resolution_exact(spark):
    master = _master(spark)
    facts = spark.createDataFrame([Row(symbol="FB", date=D("2021-12-31")),
                                   Row(symbol="META", date=D("2023-01-15"))])
    out = {r["symbol"]: r for r in resolve_pit(facts, master).collect()}
    assert out["FB"]["security_id"] == out["META"]["security_id"]


def test_pit_no_match_outside_interval(spark):
    master = _master(spark)
    facts = spark.createDataFrame([Row(symbol="META", date=D("2021-12-31"))])
    out = resolve_pit(facts, master).collect()
    assert len(out) == 1 and out[0]["security_id"] is None  # left join preserves


def test_auto_resolve_meta_before_rename(spark):
    """get_security_id('META','2021-12-31') auto-resolves to FB's sid
    (crsp_ticks.py:119-124 example — FIXTURES.md invariant 1)."""
    master = _master(spark)
    queries = spark.createDataFrame([Row(symbol="META", date=D("2021-12-31"))])
    out = resolve_auto(queries, master).collect()
    fb_sid = {r["symbol"]: r["security_id"] for r in master.collect()}["FB"]
    assert out[0]["security_id"] == fb_sid
    assert out[0]["temporal_distance"] > 0


def test_auto_resolve_temporal_distance_tiebreak(spark):
    """Probe between XY's two disjoint windows resolves to the closer one."""
    master = _master(spark)
    # 2014-01-01: 4 years after old window end (2009-12-31), 2 years before new start
    queries = spark.createDataFrame([Row(symbol="XY", date=D("2014-01-01"))])
    out = resolve_auto(queries, master).collect()
    new_sid = {r["company"]: r["security_id"] for r in master.collect()}["Xy New"]
    assert out[0]["security_id"] == new_sid


def test_auto_resolve_no_candidates_preserved(spark):
    master = _master(spark)
    queries = spark.createDataFrame([Row(symbol="ZZZZ", date=D("2020-01-01"))])
    out = resolve_auto(queries, master).collect()
    assert len(out) == 1 and out[0]["security_id"] is None


def test_normalize_symbol_formats(spark):
    df = spark.createDataFrame([Row(s="BRK.B"), Row(s="BRK-B"), Row(s="brkb")])
    vals = {r[0] for r in df.select(normalize_symbol(df.s)).collect()}
    assert vals == {"BRKB"}  # CRSP == Nasdaq == SEC format (security_master.py:103)
