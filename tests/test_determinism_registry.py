"""Registry-wide determinism gate: every registered query, run twice in the
same session at sf0.001, must produce identical row multisets. The oracle
compare (sf0.01) catches cross-engine drift; this catches run-to-run
nondeterminism — which the rows-only approximate queries (minhash / simhash
/ LSH / IVF) have no oracle to catch, and which the reference's
reproducibility test treats as a hard failure (SURVEY §2.7 D13)."""

from __future__ import annotations

import os

import pytest

from pgdedupe_spark import registry
from tests.oracle_utils import _norm

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _rows(df):
    # multiset (Counter), not a sort: rollup subtotal rows contain NULLs,
    # which Python cannot order against strings.
    # Wall-clock columns are exempt by convention: bench probes carry
    # in-band timings suffixed `_sec` (and `scaleup_factor`, a ratio of
    # two of them) that are nondeterministic by construction — every
    # SUBSTANTIVE probe output (row counts, ok-flags, join census,
    # rounds) remains under the gate.
    from collections import Counter

    keep = [
        c for c in df.columns
        if not c.endswith("_sec") and not c.endswith("scaleup_factor")
    ]
    return Counter(
        tuple(_norm(v) for v in row) for row in df.select(*keep).collect()
    )


@pytest.mark.parametrize("name", sorted(registry.QUERIES))
def test_query_is_deterministic(spark, name):
    fn = registry.QUERIES[name]
    first = _rows(fn(spark, SF_DIR))
    second = _rows(fn(spark, SF_DIR))
    assert first == second, f"{name}: row multisets differ between identical runs"
