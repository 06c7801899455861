"""Driver-contract guards: the grading surface (queries / oracle_sql /
registration order) must stay structurally sound — a typo'd priority name or
a query that silently loses its oracle should fail here, not in the driver's
round-end grading."""


def test_every_query_has_an_oracle():
    import __spark_entry__ as m

    qs, oracles = m.queries(), m.oracle_sql()
    missing = [n for n in qs if n not in oracles]
    assert not missing, f"rows-only queries (weaker grading): {missing}"
    stray = [n for n in oracles if n not in qs]
    assert not stray, f"oracles without queries: {stray}"


def test_grading_priority_is_unique_and_registered():
    from us_equity_datalake_spark.plans import REGISTRY, _GRADING_PRIORITY

    assert len(_GRADING_PRIORITY) == len(set(_GRADING_PRIORITY)), "duplicate priority entries"
    missing = [n for n in _GRADING_PRIORITY if n not in REGISTRY]
    assert not missing, f"priority names not registered: {missing}"


def test_registration_order_puts_priority_first():
    import __spark_entry__ as m
    from us_equity_datalake_spark.plans import _GRADING_PRIORITY

    names = list(m.queries())
    assert names[: len(_GRADING_PRIORITY)] == _GRADING_PRIORITY
    # the driver grades the FIRST 50 — they must all be priority picks
    assert len(_GRADING_PRIORITY) >= 50 or len(names) <= 50


def test_oracle_sql_is_nonempty_text():
    import __spark_entry__ as m

    for name, sql in m.oracle_sql().items():
        assert isinstance(sql, str) and sql.strip(), name
