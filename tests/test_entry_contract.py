"""Driver-contract invariants for __spark_entry__.py — the bookkeeping
that decides which queries the driver's 50-row correctness window
actually checks. Broken rotation silently drops queries from the hard
signal, so it is pinned here."""

from __future__ import annotations

import __spark_entry__ as entry

from pgdedupe_spark import registry


def test_ordering_covers_registry_exactly_once():
    names = list(entry.queries())
    assert len(names) == len(set(names)), "duplicate names in ordering"
    expected = set(registry.QUERIES) - entry._BENCH_ONLY - registry.PYTEST_ONLY
    assert set(names) == expected, (
        set(names) ^ expected
    )


def test_pytest_only_rows_stay_registered_with_oracles():
    """Demoted saturated rows (VERDICT r5 #3) must keep their DuckDB
    oracle coverage — they left the driver window, not the test suite.
    The ONLY exceptions are the engine-hash signature tiers in
    PYTEST_ONLY_NO_ORACLE (rows-only by construction), each of which must
    name a portable-hash twin that IS oracle-backed and driver-eligible,
    so the algorithm family never loses its hash check."""
    for name in registry.PYTEST_ONLY:
        assert name in registry.QUERIES, name
        if name in registry.PYTEST_ONLY_NO_ORACLE:
            twin = registry.PYTEST_ONLY_NO_ORACLE[name]
            assert twin in registry.ORACLES, (name, twin)
            assert twin in set(entry._PRIORITY) | set(entry._TAIL), (name, twin)
        else:
            assert name in registry.ORACLES, name
    assert set(registry.PYTEST_ONLY_NO_ORACLE) <= registry.PYTEST_ONLY
    assert not (registry.PYTEST_ONLY & entry._BENCH_ONLY)
    assert not (registry.PYTEST_ONLY & set(entry._PRIORITY))
    assert not (registry.PYTEST_ONLY & set(entry._TAIL))


def test_window_is_exactly_fifty():
    """The driver checks the FIRST 50 queries; the priority list must fill
    the window exactly — a 51st priority entry silently falls out."""
    names = list(entry.queries())
    assert len(names) >= 50
    in_priority = [n for n in entry._PRIORITY if n in registry.QUERIES]
    assert len(in_priority) == 50, len(in_priority)
    assert names[:50] == in_priority


def test_driver_eligible_docstrings_dont_claim_pytest_only():
    """VERDICT r7 #3: three late-r7 promotions kept docstrings saying
    'Registered PYTEST_ONLY from birth — window full' after moving into
    the driver rotation. A driver-eligible query's docstring must not
    claim PYTEST_ONLY status — stale claims hide schema-contract bugs
    (the j14 array<string> incident) from review."""
    for name in list(entry._PRIORITY) + list(entry._TAIL):
        fn = registry.QUERIES.get(name)
        if fn is None:
            continue
        doc = fn.__doc__ or ""
        assert "PYTEST_ONLY" not in doc, (
            f"{name} is driver-eligible but its docstring claims PYTEST_ONLY"
        )


def test_every_oracle_has_a_query():
    oracles = entry.oracle_sql()
    queries = entry.queries()
    assert set(oracles) <= set(queries)
    # bench-only queries never appear in the driver ordering
    assert not (entry._BENCH_ONLY & set(queries))


def test_bench_headline_is_registered():
    import bench

    missing = [n for n in bench.HEADLINE if n not in registry.QUERIES]
    assert not missing, missing
    missing24 = [n for n in bench.LEGACY24 if n not in bench.HEADLINE]
    assert not missing24, missing24
