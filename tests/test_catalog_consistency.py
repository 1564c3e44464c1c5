"""Catalog bookkeeping invariants — the hand-maintained structures the
driver's certification gate depends on must stay mutually consistent.
No Spark session needed; pure registry checks."""


def test_priority_list_is_exactly_the_registry():
    # _DRIVER_PRIORITY is rebuilt by hand each round and IS the
    # certification mechanism (the driver certifies ~50/round in this
    # order). A name missing from it silently demotes that query to
    # the unordered tail past the driver cap; a ghost name wastes a
    # slot. Both directions must hold exactly.
    from goconnect_spark.queries import _DRIVER_PRIORITY, ALL_MODULES

    registry = set()
    for m in ALL_MODULES:
        registry |= m.QUERIES.keys()
    prio = list(_DRIVER_PRIORITY)
    assert len(prio) == len(set(prio)), "duplicate names in _DRIVER_PRIORITY"
    assert set(prio) - registry == set(), "ghost names in _DRIVER_PRIORITY"
    assert registry - set(prio) == set(), "queries missing a priority slot"


def test_every_query_has_an_oracle():
    # since round 7 the catalog is 100% oracle-gated; a new entry
    # without a DuckDB twin reverts the driver gate to rows-only
    from goconnect_spark.queries import all_oracles, all_queries

    qs, os_ = all_queries(), all_oracles()
    assert set(qs) == set(os_), set(qs) ^ set(os_)


def test_bench_headline_names_resolve():
    import bench
    from goconnect_spark.queries import all_queries

    qs = all_queries()
    missing = [n for n in bench.HEADLINE if n not in qs]
    assert not missing, missing
    assert set(bench.HEADLINE31) <= set(bench.HEADLINE)
